"""D51: DSIR importance selection — hashed-unigram log-likelihood
ratios under target-vs-raw bag models, integer micro-nat exact."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.pipeline import (
    dsir_log_ratios,
    dsir_select,
    dsir_weights,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # target domain talks about cooking; raw background about engines
    rows = [
        Row(doc_id=i, domain="cook",
            text="bake the flour sugar butter oven whisk")
        for i in range(5)
    ] + [
        Row(doc_id=10 + i, domain="web",
            text="engine torque piston valve crankshaft rpm")
        for i in range(20)
    ] + [
        # a web doc that READS like the target — DSIR should surface it
        Row(doc_id=99, domain="web",
            text="bake sugar butter oven flour whisk bake"),
    ]
    return spark.createDataFrame(rows)


def test_target_like_docs_rank_first(spark, corpus):
    picked = dsir_select(
        corpus, F.col("domain") == "cook", 6
    ).collect()
    ids = [r["doc_id"] for r in picked]
    # the target docs and the target-like impostor beat every engine doc
    assert set(ids) == {0, 1, 2, 3, 4, 99}
    # identical texts tie and break by doc_id ascending
    assert ids[:5] == [0, 1, 2, 3, 4] or ids[0] == 99


def _py_weights(rows, target_domains, hex_chars=2):
    B = 16 ** hex_chars

    def buckets(text):
        ws = [w for w in text.strip().lower().split() if w]
        return [
            hashlib.md5(w.encode()).hexdigest()[:hex_chars] for w in ws
        ]

    raw, tgt = Counter(), Counter()
    for r in rows:
        bs = buckets(r["text"])
        raw.update(bs)
        if r["source"] in target_domains:
            tgt.update(bs)
    nr, nt = sum(raw.values()), sum(tgt.values())
    lam = {
        b: math.floor(
            (
                math.log(tgt.get(b, 0) + 1)
                - math.log(nt + B)
                - math.log(raw[b] + 1)
                + math.log(nr + B)
            )
            * 1_000_000
        )
        for b in raw
    }
    out = {}
    for r in rows:
        bs = buckets(r["text"])
        if bs:
            out[r["doc_id"]] = sum(lam[b] for b in bs)
    return out


def test_matches_python_reference_on_fixture(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "text")
        .filter(F.col("doc_id") < 150)
    )
    got = {
        r["doc_id"]: r["weight_micro"]
        for r in dsir_weights(
            docs, F.col("source").isin("src1", "src3")
        ).collect()
    }
    ref = _py_weights(docs.collect(), {"src1", "src3"})
    assert got == ref and ref


def test_empty_target_degrades_to_rarity_score(spark, corpus):
    # no row matches: ct=0 everywhere — finite scores, no error
    w = dsir_weights(corpus, F.lit(False)).collect()
    assert len(w) == 26
    assert all(r["weight_micro"] is not None for r in w)


def test_zero_token_docs_absent(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="   "), Row(doc_id=1, text="words here")]
    )
    got = {r["doc_id"] for r in dsir_weights(df, F.lit(True)).collect()}
    assert got == {1}


def test_validation(spark, corpus):
    with pytest.raises(ValueError, match="hex_chars"):
        dsir_weights(corpus, F.lit(True), hex_chars=0)
    with pytest.raises(ValueError, match="k must be"):
        dsir_select(corpus, F.lit(True), 0)


def test_deterministic_across_partitioning(spark, corpus):
    pred = F.col("domain") == "cook"
    a = sorted(map(tuple, dsir_weights(
        corpus.repartition(2), pred).collect()))
    b = sorted(map(tuple, dsir_weights(
        corpus.repartition(9), pred).collect()))
    assert a == b and a


def test_plan_topk_heap_no_cartesian(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    out = dsir_select(docs, F.col("source") == "src1", 50)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    # the limit is a per-partition heap merge, not a global sort
    assert "TakeOrderedAndProject" in p, p


def test_ratio_relation_bounded_by_bucket_count(spark, corpus):
    lam = dsir_log_ratios(corpus, F.col("domain") == "cook", hex_chars=1)
    assert lam.count() <= 16
