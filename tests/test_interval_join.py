"""D27 tests: bucketized interval-overlap join — exactness vs a
brute-force cross product, dedup-free single emission, the span guard,
NULL-bound semantics, timestamp bounds, and the no-nested-loop plan
pin."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.asof import interval_join


def _mk(spark, n, key_mod, seed, prefix):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        s = float(rnd.randint(0, 600))
        rows.append(
            Row(
                **{
                    f"{prefix}_id": i,
                    "k": i % key_mod,
                    f"{prefix}s": s,
                    f"{prefix}e": s + rnd.randint(0, 50),
                }
            )
        )
    return rows, spark.createDataFrame(rows)


@pytest.mark.parametrize("bucket_width", [7, 32, 1000])
def test_matches_brute_force_at_any_bucket_width(spark, bucket_width):
    L, ldf = _mk(spark, 90, 3, 1, "l")
    R, rdf = _mk(spark, 110, 3, 2, "r")
    got = interval_join(
        ldf, rdf, left_start="ls", left_end="le",
        right_start="rs", right_end="re", on=["k"],
        bucket_width=bucket_width,
    )
    pairs = [(r.l_id, r.r_id) for r in got.collect()]
    want = {
        (a.l_id, b.r_id)
        for a in L
        for b in R
        if a.k == b.k and a.ls <= b.re and b.rs <= a.le
    }
    assert set(pairs) == want
    assert len(pairs) == len(want), "a pair was emitted in >1 bucket"


def test_no_keys_pure_interval_overlap(spark):
    L, ldf = _mk(spark, 40, 1, 3, "l")
    R, rdf = _mk(spark, 40, 1, 4, "r")
    ldf, rdf = ldf.drop("k"), rdf.drop("k")
    got = interval_join(
        ldf, rdf, left_start="ls", left_end="le",
        right_start="rs", right_end="re", bucket_width=64,
    )
    want = {
        (a.l_id, b.r_id) for a in L for b in R if a.ls <= b.re and b.rs <= a.le
    }
    assert {(r.l_id, r.r_id) for r in got.collect()} == want


def test_null_bounds_drop_like_the_sql_predicate(spark):
    ldf = spark.createDataFrame(
        [Row(l_id=1, ls=0.0, le=10.0), Row(l_id=2, ls=None, le=10.0)]
    )
    rdf = spark.createDataFrame([Row(r_id=1, rs=5.0, re=6.0)])
    got = interval_join(
        ldf, rdf, left_start="ls", left_end="le",
        right_start="rs", right_end="re", bucket_width=8,
    )
    assert [(r.l_id, r.r_id) for r in got.collect()] == [(1, 1)]


def test_timestamp_bounds_and_boundary_touch(spark):
    # closed intervals: touching endpoints DO match (<=), across a
    # bucket boundary (width 3600, intervals meet exactly at an hour)
    ldf = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", "2024-01-01 11:00:00")],
        "l_id: string, ls: string, le: string",
    ).select("l_id", F.col("ls").cast("timestamp_ntz"), F.col("le").cast("timestamp_ntz"))
    rdf = spark.createDataFrame(
        [("b", "2024-01-01 11:00:00", "2024-01-01 12:00:00"),
         ("c", "2024-01-01 11:00:01", "2024-01-01 12:00:00")],
        "r_id: string, rs: string, re: string",
    ).select("r_id", F.col("rs").cast("timestamp_ntz"), F.col("re").cast("timestamp_ntz"))
    got = interval_join(
        ldf, rdf, left_start="ls", left_end="le",
        right_start="rs", right_end="re", bucket_width=3600,
    )
    assert sorted((r.l_id, r.r_id) for r in got.collect()) == [("a", "b")]


def test_span_guard_fails_loud_not_oom(spark):
    ldf = spark.createDataFrame([Row(l_id=1, ls=0.0, le=1e8)])
    rdf = spark.createDataFrame([Row(r_id=1, rs=5.0, re=6.0)])
    with pytest.raises(Exception, match="buckets"):
        interval_join(
            ldf, rdf, left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            bucket_width=1, max_span_buckets=64,
        ).count()


def test_rejects_colliding_payload_columns_and_bad_width(spark):
    ldf = spark.createDataFrame([Row(l_id=1, ls=0.0, le=1.0, x=1)])
    rdf = spark.createDataFrame([Row(r_id=1, rs=0.0, re=1.0, x=2)])
    with pytest.raises(ValueError, match="disjoint"):
        interval_join(
            ldf, rdf, left_start="ls", left_end="le",
            right_start="rs", right_end="re", bucket_width=10,
        )
    with pytest.raises(ValueError, match="positive"):
        interval_join(
            ldf.drop("x"), rdf.drop("x"), left_start="ls", left_end="le",
            right_start="rs", right_end="re", bucket_width=0,
        )


def test_plan_is_an_equi_join_not_a_nested_loop(spark):
    """The whole point: the physical plan must be a shuffle/broadcast
    HASH or sort-merge join on the bucket key — never the
    BroadcastNestedLoopJoin the declarative overlap predicate plans
    (every executor re-scans one entire side at 100 TB)."""
    _, ldf = _mk(spark, 50, 3, 5, "l")
    _, rdf = _mk(spark, 50, 3, 6, "r")
    got = interval_join(
        ldf, rdf, left_start="ls", left_end="le",
        right_start="rs", right_end="re", on=["k"], bucket_width=32,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert any(
        j in plan
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    ), plan
