"""D46: largest-remainder integer quota allocation + exact-total
stratified sampling — the deterministic exact-count counterpart of
D44's probabilistic temperature mixing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.scale import quota_allocate, quota_sample


def _reference_alloc(counts: dict, total: int, alpha: float,
                     quant: int = 1_000_000) -> dict:
    """Pure-Python Hamilton's method, the independent arithmetic twin."""
    wq = {k: math.floor(n ** alpha * quant) for k, n in counts.items()}
    s = sum(wq.values())
    base = {k: (total * w) // s for k, w in wq.items()}
    rem = {k: (total * w) % s for k, w in wq.items()}
    leftover = total - sum(base.values())
    order = sorted(counts, key=lambda k: (-rem[k], k))
    bonus = set(order[:leftover])
    return {
        k: min(counts[k], base[k] + (1 if k in bonus else 0))
        for k in counts
    }


def _mkdf(spark, counts: dict):
    rows, i = [], 0
    for k, n in counts.items():
        for _ in range(n):
            rows.append(Row(id=i, g=k))
            i += 1
    return spark.createDataFrame(rows)


def test_allocation_matches_reference_and_sums_exactly(spark):
    counts = {"a": 900, "b": 100, "c": 37, "d": 1}
    df = _mkdf(spark, counts)
    for alpha, total in ((1.0, 500), (0.5, 300), (0.0, 10), (0.5, 917)):
        got = {r["g"]: r["quota"] for r in quota_allocate(
            df, "g", total, alpha=alpha
        ).collect()}
        ref = _reference_alloc(counts, total, alpha)
        assert got == ref, (alpha, total)
        if all(ref[k] < counts[k] for k in counts):
            assert sum(got.values()) == total


def test_quota_sample_exact_total_and_monotonic(spark):
    counts = {"a": 400, "b": 100, "c": 60}
    df = _mkdf(spark, counts)
    small = quota_sample(df, "g", 100, key_col="id", alpha=0.5)
    big = quota_sample(df, "g", 200, key_col="id", alpha=0.5)
    assert small.count() == 100
    assert big.count() == 200
    # nested: a larger budget strictly extends a smaller one
    s_ids = {r["id"] for r in small.collect()}
    b_ids = {r["id"] for r in big.collect()}
    assert s_ids < b_ids


def test_quota_sample_capacity_cap_stated_not_silent(spark):
    counts = {"tiny": 5, "big": 500}
    df = _mkdf(spark, counts)
    alloc = {r["g"]: r for r in quota_allocate(
        df, "g", 400, alpha=0.0  # equal weights -> 200 each, tiny caps
    ).collect()}
    assert alloc["tiny"]["quota"] == 5       # capacity, not 200
    assert alloc["big"]["quota"] == 200      # NOT silently topped up
    kept = quota_sample(df, "g", 400, key_col="id", alpha=0.0)
    assert kept.count() == 205               # shortfall visible


def test_quota_sample_deterministic_across_partitionings(spark):
    df = _mkdf(spark, {"a": 300, "b": 77, "c": 23})
    a = sorted(r["id"] for r in quota_sample(
        df.repartition(3), "g", 150, key_col="id", alpha=0.5
    ).collect())
    b = sorted(r["id"] for r in quota_sample(
        df.repartition(17), "g", 150, key_col="id", alpha=0.5
    ).collect())
    assert a == b and len(a) == 150


def test_quota_upweights_tail_vs_proportional(spark):
    """The alpha<1 point: the tail stratum gets MORE than its
    proportional share, the head less — with exact integer totals."""
    counts = {"head": 900, "tail": 100}
    df = _mkdf(spark, counts)
    prop = {r["g"]: r["quota"] for r in quota_allocate(
        df, "g", 200, alpha=1.0
    ).collect()}
    temp = {r["g"]: r["quota"] for r in quota_allocate(
        df, "g", 200, alpha=0.5
    ).collect()}
    assert prop["tail"] == 20 and prop["head"] == 180
    assert temp["tail"] > prop["tail"]
    assert temp["head"] + temp["tail"] == 200


def test_quota_validation_and_null_strata(spark):
    df = _mkdf(spark, {"a": 10}).unionByName(
        _mkdf(spark, {"b": 1}).withColumn("g", F.lit(None).cast("string"))
    )
    with pytest.raises(ValueError, match="total"):
        quota_allocate(df, "g", 0)
    with pytest.raises(ValueError, match="alpha"):
        quota_allocate(df, "g", 5, alpha=-0.1)
    with pytest.raises(ValueError, match="weight_quant"):
        quota_allocate(df, "g", 5, weight_quant=0)
    # NULL strata dropped from allocation AND sample
    assert quota_allocate(df, "g", 5).count() == 1
    assert quota_sample(df, "g", 5, key_col="id").filter(
        F.col("g").isNull()
    ).count() == 0


def test_quota_sample_plan_single_data_exchange(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    out = quota_sample(docs, "lang", 200, key_col="doc_id", alpha=0.5)
    p = out._jdf.queryExecution().executedPlan().toString()
    # the allocation side must come back broadcast, never sort-merge
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
