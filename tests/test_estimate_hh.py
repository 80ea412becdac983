"""Operator tests for D33 (sampled estimates with CIs,
operators/estimate.py) and D34 (certified exact heavy hitters,
operators/heavyhitters.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.estimate import estimate_group_stats
from mysql2parquet_spark.operators.heavyhitters import heavy_hitters


# ---------------------------------------------------------------- D33

def _rows(spark, n, group="g"):
    return spark.range(n).select(
        F.lit(group).alias("grp"),
        F.col("id").alias("rid"),
        (F.col("id") % 10).cast("double").alias("val"),
    )


def test_estimate_full_fraction_is_exact(spark):
    # fraction=1.0 keeps everything: estimates ARE the exact values and
    # every CI is 0 ((1-p) = 0) — the estimator degrades gracefully to
    # the exact profile.
    df = _rows(spark, 1000)
    out = estimate_group_stats(
        df, ["grp"], key_col="rid", value_col="val", fraction=1.0
    ).collect()[0]
    assert out["n_sample"] == 1000
    assert out["count_est"] == 1000.0
    assert out["count_ci"] == 0.0
    assert out["sum_est"] == pytest.approx(sum(i % 10 for i in range(1000)))
    assert out["sum_ci"] == 0.0


def test_estimate_covers_truth_within_ci(spark):
    # statistical sanity on the DETERMINISTIC sample: truth inside
    # est +/- CI at z=1.96 for count and sum (fixed md5 sample, so this
    # is a reproducible assertion, not a flaky one).
    n = 20000
    df = _rows(spark, n)
    out = estimate_group_stats(
        df, ["grp"], key_col="rid", value_col="val", fraction=1.0 / 8
    ).collect()[0]
    assert abs(out["count_est"] - n) <= out["count_ci"]
    true_sum = sum(i % 10 for i in range(n))
    assert abs(out["sum_est"] - true_sum) <= out["sum_ci"]
    # the sample is ~n/8
    assert 0.8 * n / 8 <= out["n_sample"] <= 1.2 * n / 8


def test_estimate_sample_is_nested(spark):
    # monotone thresholds: the f=1/16 sample is a strict subset of the
    # f=1/4 sample under the same salt — growing a profile never
    # reshuffles membership.
    df = _rows(spark, 5000)
    small = estimate_group_stats(
        df, ["grp"], key_col="rid", fraction=1.0 / 16
    ).collect()[0]["n_sample"]
    big = estimate_group_stats(
        df, ["grp"], key_col="rid", fraction=1.0 / 4
    ).collect()[0]["n_sample"]
    assert small <= big


def test_estimate_null_keys_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [Row(grp="g", rid=None, val=1.0), Row(grp="g", rid=1, val=2.0)]
    )
    out = estimate_group_stats(
        df, ["grp"], key_col="rid", value_col="val", fraction=1.0
    ).collect()[0]
    assert out["n_sample"] == 1  # NULL key has no content address
    with pytest.raises(ValueError):
        estimate_group_stats(df, ["grp"], key_col="rid", fraction=0.0)
    with pytest.raises(ValueError):
        estimate_group_stats(df, ["grp"], key_col="rid", fraction=1e-9)
    with pytest.raises(ValueError):
        estimate_group_stats(df, ["grp"], key_col="rid", z=-1.0)


def test_estimate_count_only_schema(spark):
    df = _rows(spark, 100)
    out = estimate_group_stats(df, ["grp"], key_col="rid", fraction=0.5)
    assert out.columns == ["grp", "n_sample", "count_est", "count_ci"]


def test_estimate_plan_one_exchange_no_udf(spark):
    # the whole operator must be a codegen filter + one partial-agg
    # exchange — a Python eval or a second exchange would defeat the
    # "profile 100 TB for p of the cost" contract.
    df = _rows(spark, 1000)
    out = estimate_group_stats(
        df, ["grp"], key_col="rid", value_col="val", fraction=0.25
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    assert "partial_count" in p or "partial" in p, p


# ---------------------------------------------------------------- D34

def _skewed(spark):
    # heavy keys h0..h4 with counts 600..200, tail keys t0..t199 with 3
    rows = []
    for i in range(5):
        rows += [(f"h{i}",)] * (600 - 100 * i)
    for i in range(200):
        rows += [(f"t{i}",)] * 3
    return spark.createDataFrame(rows, ["k"]).repartition(8)


def test_heavy_hitters_matches_exact_topk_and_certifies(spark):
    df = _skewed(spark)
    got = heavy_hitters(df, "k", k=5, m=64).collect()
    want = (
        df.groupBy("k").count()
        .orderBy(F.col("count").desc(), "k")
        .limit(5)
        .collect()
    )
    assert [(r["k"], r["n_exact"]) for r in got] == [
        (r["k"], r["count"]) for r in want
    ]
    # N = 2600, kth = 200 > 2600/65 = 40 -> provably exact
    assert all(r["certified"] for r in got)


def test_heavy_hitters_uncertified_on_flat_data(spark):
    # 400 keys x 5 rows, m=8: the k-th count (5) can never beat
    # N/(m+1) = 2000/9 — the operator must SAY so, not guess.
    df = spark.createDataFrame(
        [(f"k{i % 400}",) for i in range(2000)], ["k"]
    ).repartition(4)
    got = heavy_hitters(df, "k", k=3, m=8).collect()
    assert len(got) == 3
    assert not any(r["certified"] for r in got)


def test_heavy_hitters_candidate_guarantee_small_m(spark):
    # even with an aggressively small counter budget, the certified
    # answer (when certified) equals the exact top-k: h0/h1 dominate.
    rows = [("h0",)] * 500 + [("h1",)] * 400 + [
        (f"t{i}",) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["k"]).repartition(6)
    got = heavy_hitters(df, "k", k=2, m=4).collect()
    assert [(r["k"], r["n_exact"]) for r in got] == [("h0", 500), ("h1", 400)]
    # N = 1000, kth = 400 > 1000/5 -> certified despite m=4
    assert all(r["certified"] for r in got)


def test_heavy_hitters_null_keys_ignored(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [(None,)] * 50 + [("b",)] * 3, ["k"]
    )
    got = heavy_hitters(df, "k", k=2, m=16).collect()
    assert [(r["k"], r["n_exact"]) for r in got] == [("a", 5), ("b", 3)]
    # ADVICE r8: the certificate's N must count KEYED rows only. With
    # the 50 NULLs wrongly included, N/(m+1) = 58/17 > 3 and the
    # provably-exact answer would come back certified=false; the true
    # threshold is 8/17.
    assert all(r["certified"] for r in got)


def test_heavy_hitters_validation(spark):
    df = spark.createDataFrame([("a",)], ["k"])
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", k=0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", k=10, m=5)


def test_heavy_hitters_no_full_cardinality_exchange(spark, sf_dir):
    """The exact-verify aggregate must sit ABOVE the broadcast
    semi-join (candidates prune before partial aggregation), and the
    full stream must never hash-exchange on the raw key without the
    semi-join: every hashpartitioning exchange in the plan is over the
    post-semi-join (candidate-only) stream or the tiny summary."""
    from mysql2parquet_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    out = heavy_hitters(ev, "user_id", k=10, m=256)
    p = out._jdf.queryExecution().explainString(
        out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple")
    )
    # the MG pass ran eagerly at the summary localCheckpoint, so the
    # serving plan consumes its materialized blocks (ExistingRDD) —
    # the full stream appears only under the semi-join
    assert "Scan ExistingRDD" in p, p[:3000]
    assert "LeftSemi" in p, p[:3000]
    # candidate filter feeds the aggregate: the partial agg appears
    # above the semi join in tree order (parents print first)
    agg_pos = p.index("partial_count")
    semi_pos = p.index("LeftSemi")
    assert agg_pos < semi_pos, p[:3000]
    assert "TakeOrderedAndProject" in p, p[:3000]


def test_heavy_hitters_partitioning_invariant(spark, sf_dir):
    """The per-partition MG candidate SET depends on partitioning, but
    the certified answer must not: any key with global count > N/(m+1)
    is a candidate under EVERY partitioning (weighted pigeonhole), and
    certified=true proves the computed k-th count beats every possible
    non-candidate — so two wildly different partitionings must emit
    identical rows."""
    from mysql2parquet_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    a = sorted(
        (r["user_id"], r["n_exact"], r["certified"])
        for r in heavy_hitters(ev.repartition(2), "user_id", k=10,
                               m=256).collect()
    )
    b = sorted(
        (r["user_id"], r["n_exact"], r["certified"])
        for r in heavy_hitters(ev.repartition(16), "user_id", k=10,
                               m=256).collect()
    )
    assert a == b
    assert all(cert for _, _, cert in a)
