"""D69: feature hashing (the hashing trick) — vocabulary-free sparse
document features with signed sums for collision unbiasedness."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.text import hashed_features


def _py_features(docs, hex_chars=2):
    out = {}
    for d, t in docs:
        for tok in t.strip().lower().split():
            if not tok:
                continue
            h = hashlib.md5(tok.encode()).hexdigest()
            b = h[:hex_chars]
            sign = 1 if int(h[hex_chars], 16) % 2 == 0 else -1
            k = (d, b)
            n, s = out.get(k, (0, 0))
            out[k] = (n + 1, s + sign)
    return out


def _run(spark, docs, **kw):
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs]
    )
    return {
        (r["doc_id"], r["bucket"]): (r["n_tokens"], r["signed_sum"])
        for r in hashed_features(df, **kw).collect()
    }


def test_matches_hashlib_reference(spark):
    docs = [
        (1, "the quick brown fox the fox"),
        (2, "THE Quick brown"),  # lowercased: same buckets as doc 1
        (3, ""),
    ]
    got = _run(spark, docs)
    assert got == _py_features(docs)
    # same token always lands in the same bucket across docs
    fox_bucket = hashlib.md5(b"fox").hexdigest()[:2]
    assert (1, fox_bucket) in got
    # empty doc contributes nothing
    assert not any(d == 3 for d, _ in got)


def test_repeated_token_counts_accumulate(spark):
    docs = [(1, "x x x x x")]
    got = _run(spark, docs)
    ((_, b), (n, s)) = next(iter(got.items()))
    assert n == 5 and abs(s) == 5  # one token: all signs identical


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="a")])
    with pytest.raises(ValueError, match="hex_chars"):
        hashed_features(df, hex_chars=0)
    with pytest.raises(ValueError, match="hex_chars"):
        hashed_features(df, hex_chars=9)


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = [(r["doc_id"], r["text"]) for r in df.collect()]
    got = {
        (r["doc_id"], r["bucket"]): (r["n_tokens"], r["signed_sum"])
        for r in hashed_features(df).collect()
    }
    assert got == _py_features(docs) and got


def test_plan_single_keyed_aggregate_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = hashed_features(df)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1, p  # one (doc,bucket) shuffle
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "CartesianProduct" not in p, p
