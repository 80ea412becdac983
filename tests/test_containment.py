"""D49: exact n-gram containment pairs — the near-subset detector
(quotes, aggregator pages, boilerplate-wrapped reposts) that
resemblance-based Jaccard structurally misses."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.dedup import (
    gram_containment_pairs,
    ngram_jaccard_pairs,
)


@pytest.fixture(scope="module")
def quoted(spark):
    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"filler{i}" for i in range(60))
    return spark.createDataFrame(
        [
            Row(doc_id=0, text=quote),                      # the article
            Row(doc_id=1, text=filler + " " + quote),       # aggregator
            Row(doc_id=2, text="entirely unrelated words about spark"),
        ]
    )


def test_containment_catches_what_jaccard_misses(spark, quoted):
    cont = {(r["id_a"], r["id_b"]): r["containment"] for r in
            gram_containment_pairs(quoted, shingle_n=2,
                                   threshold=0.5).collect()}
    # every bigram of doc 0 appears in doc 1 -> containment 1.0
    assert cont == {(0, 1): 1.0}
    # the same pair is INVISIBLE to resemblance at any useful threshold
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(quoted, "doc_id", "text", shingle_n=2,
                               allow_quadratic=True).collect()}
    assert jac[(0, 1)] < 0.15


def test_containment_matches_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 60)
    got = {(r["id_a"], r["id_b"]): r["containment"] for r in
           gram_containment_pairs(docs, shingle_n=2,
                                  threshold=0.3).collect()}

    def grams(t, n=2):
        w = t.strip().split()
        if len(w) < n:
            return {" ".join(w)}
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    rows = {r["doc_id"]: grams(r["text"]) for r in docs.collect()}
    ref = {}
    ids = sorted(rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(rows[a] & rows[b])
            if inter == 0:
                continue
            c = inter / min(len(rows[a]), len(rows[b]))
            if c >= 0.3:
                ref[(a, b)] = round(c, 4)
    assert got == ref and ref  # fixture has near-dup families


def test_containment_hot_gram_cap_under_removal_only(spark):
    # a boilerplate bigram shared by all docs; real overlap only in 0/1
    rows = [
        Row(doc_id=0, text="hot gram alpha beta gamma delta"),
        Row(doc_id=1, text="hot gram alpha beta gamma other"),
    ] + [
        Row(doc_id=10 + i, text=f"hot gram unique{i} word{i} end{i}")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    full = {(r["id_a"], r["id_b"]): r["containment"] for r in
            gram_containment_pairs(df, shingle_n=2,
                                   threshold=0.4).collect()}
    capped = {(r["id_a"], r["id_b"]): r["containment"] for r in
              gram_containment_pairs(df, shingle_n=2, threshold=0.4,
                                     max_gram_docs=5).collect()}
    # the cap only ever LOWERS containment / drops pairs
    assert set(capped) <= set(full)
    for k, v in capped.items():
        assert v <= full[k]
    # the genuinely-overlapping pair survives the cap (its non-hot
    # grams alone clear the threshold)
    assert (0, 1) in capped


def test_containment_validation_and_determinism(spark, quoted):
    with pytest.raises(ValueError, match="threshold > 0"):
        gram_containment_pairs(quoted, threshold=0.0)
    a = sorted(map(tuple, gram_containment_pairs(
        quoted.repartition(2), shingle_n=2, threshold=0.5
    ).collect()))
    b = sorted(map(tuple, gram_containment_pairs(
        quoted.repartition(7), shingle_n=2, threshold=0.5
    ).collect()))
    assert a == b and a


def test_containment_plan_no_cartesian(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = gram_containment_pairs(docs, shingle_n=2, threshold=0.5)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
