"""D52: the Gopher/MassiveText word-level quality-rule vector — each
rule an auditable boolean, keep = conjunction, one codegen projection."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.text import (
    GOPHER_REQUIRED_WORDS,
    gopher_quality_rules,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and that dog have "
    "been with the other dogs of this yard since early spring time"
)


def _rules(spark, rows, **kw):
    df = spark.createDataFrame(rows)
    return {r["doc_id"]: r.asDict() for r in
            gopher_quality_rules(df, **kw).collect()}


def test_each_rule_fires_independently(spark):
    out = _rules(
        spark,
        [
            Row(doc_id=0, text=GOOD),
            Row(doc_id=1, text="too short"),                  # word count
            Row(doc_id=2, text=" ".join(["a"] * 25)),          # mean len < 3
            Row(doc_id=3, text=" ".join(["the##tag"] * 20 + ["of"] * 5)),
            Row(doc_id=4, text=" ".join(["1234"] * 24 + ["the"])),  # alpha
            Row(doc_id=5, text=" ".join(f"word{i}" for i in range(25))),
        ],
        min_words=20,
        max_words=60,
        min_required_hits=2,
    )
    assert out[0]["keep"] is True
    assert out[1]["r_word_count"] is False and out[1]["keep"] is False
    assert out[2]["r_mean_word_len"] is False and out[2]["keep"] is False
    assert out[3]["r_symbol_ratio"] is False and out[3]["keep"] is False
    assert out[4]["r_alpha_ratio"] is False and out[4]["keep"] is False
    # doc 5 has zero required words
    assert out[5]["r_required_words"] is False and out[5]["keep"] is False


def test_required_hits_count_distinct_types(spark):
    # 'the' repeated 30x is still ONE required-word type
    out = _rules(
        spark,
        [Row(doc_id=0, text=" ".join(["the"] * 30))],
        min_words=1,
        min_mean_word_len=1.0,
        min_required_hits=2,
    )
    assert out[0]["required_hits"] == 1
    assert out[0]["r_required_words"] is False


def test_empty_doc_fails_closed(spark):
    out = _rules(spark, [Row(doc_id=0, text="   ")], min_words=1)
    r = out[0]
    assert r["n_words"] == 0 and r["keep"] is False
    assert r["mean_word_len"] is None and r["alpha_ratio"] is None


def test_matches_python_reference_on_fixture(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 150)
    )
    got = {
        r["doc_id"]: (
            r["n_words"], r["mean_word_len"], r["required_hits"],
            r["keep"],
        )
        for r in gopher_quality_rules(
            docs, min_words=30, max_words=60, min_required_hits=1
        ).collect()
    }

    ref = {}
    for r in docs.collect():
        ws = r["text"].strip().split()
        n = len(ws)
        mean = sum(len(w) for w in ws) / n
        sym = sum(1 for w in ws if "#" in w or "..." in w) / n
        alpha = sum(1 for w in ws if any(c.isalpha() for c in w)) / n
        hits = len({w.lower() for w in ws} & set(GOPHER_REQUIRED_WORDS))
        keep = (
            30 <= n <= 60 and 3.0 <= mean <= 10.0 and sym <= 0.1
            and alpha >= 0.8 and hits >= 1
        )
        import math

        ref[r["doc_id"]] = (
            n, math.floor(mean * 10000) / 10000, hits, keep,
        )
    assert got == ref and any(k[-1] for k in ref.values())


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text=GOOD)])
    with pytest.raises(ValueError, match="min_required_hits"):
        gopher_quality_rules(df, min_required_hits=99)


def test_plan_is_one_projection_zero_exchanges(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = gopher_quality_rules(docs)
    p = out._jdf.queryExecution().executedPlan().toString()
    # every metric is array math over the tokenized column — the whole
    # operator must stay a shuffle-free scan+project
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_null_text_fails_closed_like_empty(spark):
    # ADVICE r10: NULL text must fail every rule (keep=false), not
    # propagate NULL through r_word_count / required_hits / keep.
    df = spark.createDataFrame(
        [(0, None), (1, GOOD)], "doc_id int, text string"
    )
    got = {r["doc_id"]: r.asDict()
           for r in gopher_quality_rules(df, min_words=1).collect()}
    r = got[0]
    assert r["n_words"] == 0
    assert r["r_word_count"] is False
    assert r["required_hits"] == 0
    assert r["r_required_words"] is False
    assert r["keep"] is False
    assert got[1]["keep"] is True
