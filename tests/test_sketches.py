"""HLL distinct-count sketches: accuracy vs exact, lossless merge
(shard-union estimate == single-pass estimate), parquet round-trip of
the binary sketch column."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.operators.sketches import (
    distinct_sketches,
    merge_sketch_estimates,
)


def test_sketch_estimate_within_hll_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    est = merge_sketch_estimates(
        distinct_sketches(ev, "user_id", ["event_type"]), ["event_type"]
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact"), F.count("*").alias("n_rows")
    )
    joined = est.join(exact, "event_type").collect()
    assert len(joined) == 5
    for r in joined:
        # lg_k=12 → ~1.6% RSE; 5% is a >3-sigma gate
        assert abs(r.approx_distinct - r.exact) <= max(1, 0.05 * r.exact), r
        assert r.n_rows == r[4]  # exact row counts agree


def test_shard_merge_equals_single_pass(spark, sf_dir):
    """The reason sketches exist: day-sharded sketches unioned to the
    month must give the IDENTICAL estimate a full re-scan would — HLL
    union over fixed lg_k loses nothing."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    per_day = distinct_sketches(ev, "user_id", ["day", "event_type"])
    monthly_from_shards = merge_sketch_estimates(per_day, ["event_type"])
    single_pass = merge_sketch_estimates(
        distinct_sketches(ev, "user_id", ["event_type"]), ["event_type"]
    )
    a = {r.event_type: r.approx_distinct for r in monthly_from_shards.collect()}
    b = {r.event_type: r.approx_distinct for r in single_pass.collect()}
    assert a == b


def test_sketch_parquet_roundtrip_and_global_rollup(spark, sf_dir, tmp_path):
    """Persist shard sketches, read them back, roll up with NO group
    cols — the incremental-analytics loop a nightly job runs."""
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "sketches")
    distinct_sketches(ev, "user_id", ["day"]).write.parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["sketch"] == "binary"
    total = merge_sketch_estimates(back, []).collect()[0]
    exact = ev.select(F.count_distinct("user_id")).collect()[0][0]
    assert abs(total.approx_distinct - exact) <= max(1, 0.05 * exact)
    assert total.n_rows == ev.count()


def test_sketch_agg_plan_is_partial_final(spark, sf_dir):
    """The shuffle must carry partial sketch state, not raw keys: plan
    shows a two-phase HashAggregate around one Exchange."""
    ev = load_table(spark, sf_dir, "events")
    df = distinct_sketches(ev, "user_id", ["event_type"])
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "hll_sketch_agg" in p, p
