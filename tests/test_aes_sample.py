"""D57: A-ES exact-size weighted sampling without replacement —
ln(u)/weight keys, content-addressed uniforms, top-k selection."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.scale import weighted_sample_exact_k


def _py_key(key, w, salt="aes"):
    u32 = int(
        hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8], 16
    )
    return math.log((u32 + 1) / 4294967296.0) / w


def test_matches_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    got = [
        r["doc_id"]
        for r in weighted_sample_exact_k(
            docs, "n_chars", 50, key_col="doc_id"
        ).collect()
    ]
    rows = docs.collect()
    ref = sorted(
        rows, key=lambda r: (-_py_key(r["doc_id"], r["n_chars"]),
                             r["doc_id"])
    )[:50]
    assert sorted(got) == sorted(r["doc_id"] for r in ref)
    assert len(got) == 50


def test_heavier_rows_win_more_often(spark):
    # 200 heavy (w=100) + 200 light (w=1): the k=100 winners should be
    # overwhelmingly heavy — deterministic given the md5 draws
    rows = [Row(id=i, w=100.0) for i in range(200)] + [
        Row(id=1000 + i, w=1.0) for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    got = weighted_sample_exact_k(df, "w", 100, key_col="id").collect()
    heavy = sum(1 for r in got if r["id"] < 1000)
    assert heavy > 90


def test_without_replacement_exact_size(spark):
    df = spark.createDataFrame([Row(id=i, w=1.0) for i in range(30)])
    got = weighted_sample_exact_k(df, "w", 10, key_col="id").collect()
    ids = [r["id"] for r in got]
    assert len(ids) == len(set(ids)) == 10
    # k >= n returns everything exactly once
    all_ = weighted_sample_exact_k(df, "w", 99, key_col="id").collect()
    assert sorted(r["id"] for r in all_) == list(range(30))


def test_nonpositive_and_null_weights_drop(spark):
    df = spark.createDataFrame(
        [Row(id=0, w=5.0), Row(id=1, w=0.0), Row(id=2, w=-1.0),
         Row(id=3, w=None)]
    )
    got = weighted_sample_exact_k(df, "w", 10, key_col="id").collect()
    assert [r["id"] for r in got] == [0]


def test_deterministic_across_partitioning(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    a = sorted(
        r["doc_id"]
        for r in weighted_sample_exact_k(
            docs.repartition(2), "n_chars", 40, key_col="doc_id"
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in weighted_sample_exact_k(
            docs.repartition(13), "n_chars", 40, key_col="doc_id"
        ).collect()
    )
    assert a == b and a


def test_validation(spark):
    df = spark.createDataFrame([Row(id=0, w=1.0)])
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample_exact_k(df, "w", 0, key_col="id")


def test_plan_topk_heap(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    out = weighted_sample_exact_k(docs, "n_chars", 100, key_col="doc_id")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p, p
    assert "Exchange" not in p, p  # heaps merge at the driver, k rows
