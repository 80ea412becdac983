"""D54: length-bucketed batch assignment — sorted batching so padded
batches pad to their own max, with exact padding-waste accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.pipeline import (
    length_bucket_batches,
    padding_waste_report,
)


@pytest.fixture(scope="module")
def mixed(spark):
    # 40 short docs (3 words) + 40 long docs (90 words)
    rows = [
        Row(doc_id=i, text="a b c") for i in range(40)
    ] + [
        Row(doc_id=100 + i, text=" ".join(f"w{j}" for j in range(90)))
        for i in range(40)
    ]
    return spark.createDataFrame(rows)


def test_similar_lengths_batch_together(spark, mixed):
    out = length_bucket_batches(
        mixed, bucket_width=16, batch_size=8, n_shards=2
    ).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], set()).add(r["doc_id"])
    # shorts (3 toks -> bucket 0) never share a bucket with longs (90
    # toks -> bucket 5)
    assert by_bucket[0] == set(range(40))
    assert by_bucket[5] == {100 + i for i in range(40)}


def test_batches_fill_to_batch_size(spark, mixed):
    rep = padding_waste_report(
        mixed, bucket_width=16, batch_size=8, n_shards=2
    ).collect()
    for r in rep:
        assert 1 <= r["n_rows"] <= 8
        assert r["padding_waste"] == (
            r["n_rows"] * r["max_toks"] - r["sum_toks"]
        )
    # equal-length docs inside a bucket => zero padding everywhere
    assert all(r["padding_waste"] == 0 for r in rep)


def test_bucketing_beats_unbucketed_padding(spark):
    # varied lengths: bucketed batching must strictly cut total waste
    rows = [
        Row(doc_id=i, text=" ".join("w" for _ in range(3 + (i * 7) % 80)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    bucketed = sum(
        r["padding_waste"]
        for r in padding_waste_report(
            df, bucket_width=8, batch_size=16, n_shards=2
        ).collect()
    )
    unbucketed = sum(
        r["padding_waste"]
        for r in padding_waste_report(
            df, bucket_width=10_000, batch_size=16, n_shards=2
        ).collect()
    )
    assert bucketed < unbucketed / 2


def test_deterministic_and_partition_independent(spark, mixed):
    a = sorted(map(tuple, length_bucket_batches(
        mixed.repartition(2), batch_size=8).collect()))
    b = sorted(map(tuple, length_bucket_batches(
        mixed.repartition(13), batch_size=8).collect()))
    assert a == b and a


def test_validation(spark, mixed):
    with pytest.raises(ValueError, match=">= 1"):
        length_bucket_batches(mixed, batch_size=0)


def test_plan_single_sharded_window(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = padding_waste_report(docs)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert p.count("Window [") == 1, p
    # the window partition key must include the shard (anti-funnel)
    assert "bucket" in p and "shard" in p, p
