"""Unit gates for operators/drift.py (+ key_skew_profile): planted
distributions with known divergence behavior, merge-invariance against
the histogram sidecar contract, and determinism of the lumped tail."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.drift import (
    categorical_drift,
    drift_report,
    histogram_drift,
)
from mysql2parquet_spark.operators.scale import key_skew_profile
from mysql2parquet_spark.operators.sketches import (
    histogram_merge,
    histogram_sketch,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def _cats(spark, cs):
    return spark.createDataFrame([(c,) for c in cs], "c string")


def test_identical_histograms_zero_drift(spark):
    df = _vals(spark, [1, 2, 3, 50, 99] * 20)
    h = histogram_sketch(df, "v", [], lo=0.0, hi=100.0, bins=10)
    row = histogram_drift(h, h).collect()[0]
    assert row.psi == 0.0 and row.js_div == 0.0 and row.tv_dist == 0.0
    assert row.verdict == "stable"
    assert row.n_a == row.n_b == 100


def test_shifted_histogram_drifts(spark):
    a = _vals(spark, [5] * 100)
    b = _vals(spark, [95] * 100)
    ha = histogram_sketch(a, "v", [], lo=0.0, hi=100.0, bins=10)
    hb = histogram_sketch(b, "v", [], lo=0.0, hi=100.0, bins=10)
    row = histogram_drift(ha, hb).collect()[0]
    assert row.psi > 0.25 and row.verdict == "drifted"
    assert row.tv_dist == pytest.approx(1.0, abs=1e-4)  # disjoint supports
    assert 0.0 < row.js_div <= math.log(2) + 1e-9


def test_histogram_drift_metric_values(spark):
    # 75/25 vs 25/75 over two bins: shares known exactly, so the
    # closed-form PSI/JS/TV must match to the rounding contract.
    a = _vals(spark, [10] * 75 + [90] * 25)
    b = _vals(spark, [10] * 25 + [90] * 75)
    ha = histogram_sketch(a, "v", [], lo=0.0, hi=100.0, bins=2)
    hb = histogram_sketch(b, "v", [], lo=0.0, hi=100.0, bins=2)
    row = histogram_drift(ha, hb).collect()[0]
    psi = 2 * (0.75 - 0.25) * (math.log(0.75) - math.log(0.25))
    js = 0.5 * 2 * (
        0.75 * math.log(0.75 / 0.5) + 0.25 * math.log(0.25 / 0.5)
    )
    assert row.psi == pytest.approx(psi, abs=1e-6)
    assert row.js_div == pytest.approx(js, abs=1e-6)
    assert row.tv_dist == pytest.approx(0.5, abs=1e-6)


def test_one_sided_bin_is_finite(spark):
    # a cell present on one side only must contribute a finite term
    # (eps clamp), never ±inf/NaN
    a = _vals(spark, [5] * 99 + [95])
    b = _vals(spark, [5] * 100)
    ha = histogram_sketch(a, "v", [], lo=0.0, hi=100.0, bins=10)
    hb = histogram_sketch(b, "v", [], lo=0.0, hi=100.0, bins=10)
    row = histogram_drift(ha, hb).collect()[0]
    assert math.isfinite(row.psi) and math.isfinite(row.js_div)
    assert row.psi > 0.0


def test_histogram_drift_grouped(spark):
    df = spark.createDataFrame(
        [("g1", 5.0), ("g1", 5.0), ("g2", 5.0), ("g2", 95.0)],
        "g string, v double",
    )
    h = histogram_sketch(df, "v", ["g"], lo=0.0, hi=100.0, bins=10)
    # compare against a copy of itself: both groups zero-drift, keyed
    out = {r.g: r for r in histogram_drift(h, h, ["g"]).collect()}
    assert set(out) == {"g1", "g2"}
    assert all(r.psi == 0.0 and r.verdict == "stable" for r in out.values())


def test_drift_on_merged_shards_equals_single_pass(spark):
    # the sidecar contract: drift(merge(shard sketches), ref) must
    # equal drift(single-pass sketch, ref)
    xs = list(range(100))
    full = _vals(spark, xs)
    s1 = _vals(spark, xs[:50])
    s2 = _vals(spark, xs[50:])
    ref = histogram_sketch(_vals(spark, [x * 0.9 for x in xs]), "v", [], lo=0.0, hi=100.0, bins=8)
    single = histogram_sketch(full, "v", [], lo=0.0, hi=100.0, bins=8)
    merged = histogram_merge(
        histogram_sketch(s1, "v", [], lo=0.0, hi=100.0, bins=8).unionByName(
            histogram_sketch(s2, "v", [], lo=0.0, hi=100.0, bins=8)
        ),
        [],
    )
    r_single = histogram_drift(single, ref).collect()[0]
    r_merged = histogram_drift(merged, ref).collect()[0]
    assert r_single == r_merged


def test_categorical_identical_and_shifted(spark):
    a = _cats(spark, ["x"] * 80 + ["y"] * 20)
    same = categorical_drift(a, a, "c").collect()[0]
    assert same.psi == 0.0 and same.verdict == "stable"

    b = _cats(spark, ["x"] * 20 + ["y"] * 80)
    row = categorical_drift(a, b, "c").collect()[0]
    assert row.psi > 0.25 and row.verdict == "drifted"
    assert row.n_a == row.n_b == 100


def test_categorical_null_bucket_counts(spark):
    a = spark.createDataFrame([("x",), ("x",), (None,), (None,)], "c string")
    b = spark.createDataFrame([("x",), ("x",), ("x",), ("x",)], "c string")
    row = categorical_drift(a, b, "c").collect()[0]
    # 50% null-rate vs 0% is drift, not an ignored bucket
    assert row.psi > 0.25 and row.verdict == "drifted"


def test_categorical_tail_lumps_to_other(spark):
    # 2 hot cats + 10 rare ones, top_k=2: rare mass must fold into
    # __other__ on BOTH sides identically (deterministic), leaving a
    # zero-drift verdict for identical inputs
    cats = ["hot1"] * 40 + ["hot2"] * 40 + [f"rare{i}" for i in range(10)]
    a = _cats(spark, cats)
    row = categorical_drift(a, a, "c", top_k=2).collect()[0]
    assert row.psi == 0.0 and row.n_a == 90


def test_new_category_detected(spark):
    a = _cats(spark, ["x"] * 100)
    b = _cats(spark, ["x"] * 50 + ["NEW_SOURCE"] * 50)
    row = categorical_drift(a, b, "c").collect()[0]
    assert row.psi > 0.25 and row.verdict == "drifted"


def test_drift_report_tall_shape(spark):
    df = spark.createDataFrame(
        [(1.0, "x"), (2.0, "y")] * 10, "v double, c string"
    )
    rep = drift_report(
        df, df, numeric_cols={"v": (0.0, 10.0)}, cat_cols=["c"]
    )
    rows = {(r["column"], r.kind): r for r in rep.collect()}
    assert set(rows) == {("v", "numeric"), ("c", "categorical")}
    assert all(r.psi == 0.0 for r in rows.values())
    assert rep.columns == [
        "column", "kind", "n_a", "n_b", "psi", "js_div", "tv_dist", "verdict"
    ]


def test_drift_report_requires_columns(spark):
    df = _vals(spark, [1.0])
    with pytest.raises(ValueError, match="at least one column"):
        drift_report(df, df)


# --- key_skew_profile ------------------------------------------------------


def test_skew_profile_flags_hot_key(spark):
    rows = [("hot",)] * 90 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "k string")
    prof = key_skew_profile(df, ["k"], top_k=3).collect()
    assert [r.rank for r in prof] == [1, 2, 3]
    top = prof[0]
    assert top.k == "hot" and top.cnt == 90
    assert top.share == pytest.approx(0.9, abs=1e-6)
    # 11 keys, 100 rows -> avg 100/11; hot key is 9.9x average
    assert top.skew_x_avg == pytest.approx(90 / (100 / 11), abs=1e-4)
    assert top.salt_hint == 10
    # uniform keys sit at ~0.11x average, salt_hint 1
    assert prof[1].salt_hint == 1


def test_skew_profile_uniform_keys_near_one(spark):
    df = spark.createDataFrame([(i % 8,) for i in range(800)], "k int")
    prof = key_skew_profile(df, ["k"], top_k=8).collect()
    assert len(prof) == 8
    assert all(r.skew_x_avg == pytest.approx(1.0, abs=1e-6) for r in prof)
    assert all(r.salt_hint == 1 for r in prof)
    # deterministic tie-break: equal counts rank by key value
    assert [r.k for r in prof] == list(range(8))


def test_skew_profile_topk_plan_uses_heap_not_global_sort(spark):
    df = spark.createDataFrame([(i % 8,) for i in range(80)], "k int")
    counts_plan = (
        key_skew_profile(df, ["k"], top_k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in counts_plan


# --- category sketch (sidecar) + count_drift ------------------------------


def test_category_sketch_topk_other_null(spark):
    from mysql2parquet_spark.operators.sketches import category_sketch

    rows = (
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 10 + [("d",)] * 5
        + [(None,)] * 5
    )
    df = spark.createDataFrame(rows, "c string")
    out = {r.cat: r.cnt for r in category_sketch(df, "c", top_k=2).collect()}
    # exact counts for the named top-k, the tail folded, nulls counted
    assert out == {"a": 50, "b": 30, "__other__": 20}
    df2 = spark.createDataFrame(rows[:95], "c string")  # drop the nulls
    out2 = {r.cat: r.cnt for r in
            category_sketch(df2, "c", top_k=4).collect()}
    assert out2 == {"a": 50, "b": 30, "c": 10, "d": 5}
    # __null__ appears when nulls exist and k covers it
    out3 = {r.cat: r.cnt for r in
            category_sketch(df, "c", top_k=10).collect()}
    assert out3["__null__"] == 5


def test_category_sketch_multi_one_scan_and_determinism(spark):
    from mysql2parquet_spark.operators.sketches import category_sketch_multi

    df = spark.createDataFrame(
        [("x", 1), ("x", 1), ("y", 2)], "a string, b int"
    )
    out = category_sketch_multi(df, [("a", 5), ("b", 1)])
    rows = {(r["column"], r.cat): r.cnt for r in out.collect()}
    assert rows == {
        ("a", "x"): 2, ("a", "y"): 1,
        ("b", "1"): 2, ("b", "2"): 1,
    } or rows == {
        ("a", "x"): 2, ("a", "y"): 1,
        ("b", "1"): 2, ("b", "__other__"): 1,
    }
    # per-column k applies: b with k=1 keeps only its hottest category
    assert ("b", "1") in rows and rows.get(("b", "2"), None) in (None, 1)
    # one scan: the top and __other__ branches both hang off the SAME
    # count aggregation — its exchange is reused, not recomputed (so the
    # source is read once; at 100 TB the scan count is the cost)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan, plan


def test_category_sketch_drift_consumption(spark):
    from mysql2parquet_spark.operators.drift import count_drift
    from mysql2parquet_spark.operators.sketches import category_sketch_multi

    a = spark.createDataFrame([("x",)] * 80 + [("y",)] * 20, "c string")
    b = spark.createDataFrame([("x",)] * 20 + [("y",)] * 80, "c string")
    sa = category_sketch_multi(a, [("c", 10)])
    sb = category_sketch_multi(b, [("c", 10)])
    row = count_drift(sa, sb, ["column"]).collect()[0]
    assert row["column"] == "c" and row.verdict == "drifted"
    same = count_drift(sa, sa, ["column"]).collect()[0]
    assert same.psi == 0.0 and same.verdict == "stable"


def test_category_sketch_validates(spark):
    import pytest as _pytest

    from mysql2parquet_spark.operators.sketches import category_sketch_multi

    df = spark.createDataFrame([("x",)], "c string")
    with _pytest.raises(ValueError, match="k >= 1"):
        category_sketch_multi(df, [("c", 0)])
    with _pytest.raises(ValueError, match="requires specs"):
        category_sketch_multi(df, [])


# --- join_explosion_estimate ----------------------------------------------


def test_join_explosion_exact_cardinality(spark):
    from mysql2parquet_spark.operators.scale import join_explosion_estimate

    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k int")
    b = spark.createDataFrame([(1,), (1,), (1,), (2,), (9,)], "k int")
    r = join_explosion_estimate(a, b, ["k"]).collect()[0]
    # key 1: 2x3=6, key 2: 1x1=1, key 3/9 unmatched
    assert r.output_rows == 7 == a.join(b, "k").count()
    assert r.matched_keys == 2 and r.rows_a == 4 and r.rows_b == 5
    assert r.explosion_x == pytest.approx(7 / 5, abs=1e-6)
    assert r.top_key_rows == 7


def test_join_explosion_flags_many_to_many(spark):
    from mysql2parquet_spark.operators.scale import join_explosion_estimate

    hot = spark.createDataFrame([("h",)] * 100, "k string")
    r = join_explosion_estimate(hot, hot, ["k"]).collect()[0]
    assert r.output_rows == 10000 and r.explosion_x == 100.0
    assert r.top_key_rows == 10000


def test_join_explosion_top_k_partial(spark):
    from mysql2parquet_spark.operators.scale import join_explosion_estimate

    a = spark.createDataFrame([(i,) for i in range(10) for _ in range(i + 1)], "k int")
    r = join_explosion_estimate(a, a, ["k"], top_k=2).collect()[0]
    # products are (i+1)^2; top 2 keys contribute 100 + 81
    assert r.top_key_rows == 181
    assert r.output_rows == sum((i + 1) ** 2 for i in range(10))
