"""HLL distinct-count sketches: accuracy vs exact, lossless merge
(shard-union estimate == single-pass estimate), parquet round-trip of
the binary sketch column."""

from __future__ import annotations

import pytest
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


# ---------------------------------------------------------------------------
# Count-min frequency sketches
# ---------------------------------------------------------------------------

from mysql2parquet_spark.operators.sketches import (
    cms_estimate,
    cms_merge,
    cms_sketch,
)


def _freq_df(spark, pairs):
    """pairs: (key, count) → one row per occurrence."""
    rows = [(k,) for k, n in pairs for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_undercounts_and_bounds_overcount(spark):
    pairs = [(f"key{i}", (i % 7) + 1) for i in range(200)]
    df = _freq_df(spark, pairs)
    sk = cms_sketch(df, "k", [], width=256)
    keys = spark.createDataFrame([(k,) for k, _ in pairs], "k string")
    est = {r.k: r.approx_count for r in cms_estimate(sk, keys, "k", width=256).collect()}
    true = dict(pairs)
    n_total = sum(true.values())
    # ε = e/width; allow 3× the single-cell bound for the min-of-depth
    bound = int(3 * 2.718 / 256 * n_total) + 1
    for k, t in true.items():
        assert est[k] >= t, f"undercount for {k}: {est[k]} < {t}"
        assert est[k] <= t + bound, f"overcount for {k}: {est[k]} vs {t}+{bound}"


def test_cms_absent_key_estimates_zero_when_cells_empty(spark):
    df = _freq_df(spark, [("only", 3)])
    sk = cms_sketch(df, "k", [])
    keys = spark.createDataFrame([("only",), ("ghost",)], "k string")
    est = {r.k: r.approx_count for r in cms_estimate(sk, keys, "k").collect()}
    assert est["only"] == 3
    # with one distinct stored key, a probe key collides in ALL 5 depths
    # with probability ~(1/2048)^5 — the zero-cell path must fire
    assert est["ghost"] == 0


def test_cms_merge_equals_single_pass(spark):
    """Element-wise cell sums: sketch(A) ⊕ sketch(B) == sketch(A∪B)
    EXACTLY — the invariant that makes shard sketches roll up without
    re-scanning raw data."""
    a = _freq_df(spark, [("x", 5), ("y", 2)]).withColumn("shard", F.lit("a"))
    b = _freq_df(spark, [("x", 1), ("z", 4)]).withColumn("shard", F.lit("b"))
    both = a.unionByName(b)
    per_shard = cms_sketch(both, "k", ["shard"])
    merged = cms_merge(per_shard, [])
    single = cms_sketch(both, "k", [])
    m = {(r.d, r.pos): r.cnt for r in merged.collect()}
    s = {(r.d, r.pos): r.cnt for r in single.collect()}
    assert m == s


def test_cms_sketch_size_capped_by_geometry(spark):
    """10k rows of high-cardinality keys: the sketch row count stays
    ≤ depth×width no matter the cardinality — the whole point vs an
    exact per-key aggregate."""
    df = spark.range(10_000).select(F.concat(F.lit("u"), F.col("id")).alias("k"))
    sk = cms_sketch(df, "k", [], depth=4, width=64)
    assert sk.count() <= 4 * 64


def test_cms_estimate_broadcasts_sketch_not_keys(spark):
    """Plan pin for the join direction: the geometry-capped sketch is
    the broadcast build side; the (potentially corpus-sized) key side
    streams."""
    df = _freq_df(spark, [("x", 3), ("y", 1)])
    sk = cms_sketch(df, "k", [])
    keys = spark.createDataFrame([("x",), ("y",)], "k string")
    est = cms_estimate(sk, keys, "k")
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_cms_rejects_bad_geometry(spark):
    df = _freq_df(spark, [("x", 1)])
    with pytest.raises(ValueError, match="geometry"):
        cms_sketch(df, "k", [], depth=0)


def test_cms_on_events_matches_exact_counts(spark, sf_dir):
    """Real-data accuracy gate (the sf0.001 twin of the rows-only
    driver query): event_type cardinality (5) is far below width 2048,
    so collisions across all 5 depths are ~impossible — estimates must
    equal exact counts here."""
    ev = load_table(spark, sf_dir, "events")
    sk = cms_sketch(ev, "event_type", [])
    keys = ev.select("event_type").dropDuplicates(["event_type"])
    est = {
        r.event_type: r.approx_count
        for r in cms_estimate(sk, keys, "event_type").collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert est == exact


# ---------------------------------------------------------------------------
# Mergeable equi-width histograms
# ---------------------------------------------------------------------------

from mysql2parquet_spark.operators.sketches import (
    histogram_merge,
    histogram_quantile,
    histogram_sketch,
)


def test_histogram_merge_equals_single_pass(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.dayofmonth("ts"))
    per_day = histogram_sketch(ev, "value", ["day"], lo=0.0, hi=1000.0)
    merged = histogram_merge(per_day, [])
    single = histogram_sketch(ev, "value", [], lo=0.0, hi=1000.0)
    m = {r.bin: r.cnt for r in merged.collect()}
    s = {r.bin: r.cnt for r in single.collect()}
    assert m == s


def test_histogram_quantile_within_bin_width(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    lo, hi, bins = 0.0, 1000.0, 256
    sk = histogram_sketch(ev, "value", [], lo=lo, hi=hi, bins=bins)
    qs = [0.1, 0.5, 0.9, 0.99]
    est = {r.q: r.est for r in histogram_quantile(sk, qs, [], lo=lo, hi=hi, bins=bins).collect()}
    exact = ev.agg(
        F.expr(f"percentile(value, array({','.join(map(str, qs))}))").alias("p")
    ).collect()[0].p
    width = (hi - lo) / bins
    for q, ex in zip(qs, exact):
        assert abs(est[q] - ex) <= width + 1e-9, (q, est[q], ex)


def test_histogram_quantile_per_group(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    lo, hi, bins = 0.0, 1000.0, 128
    sk = histogram_sketch(ev, "value", ["event_type"], lo=lo, hi=hi, bins=bins)
    med = histogram_quantile(sk, [0.5], ["event_type"], lo=lo, hi=hi, bins=bins)
    rows = med.collect()
    assert len(rows) == 5  # one median per event type
    exact = {
        r.event_type: r.m
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    for r in rows:
        assert abs(r.est - exact[r.event_type]) <= (hi - lo) / bins + 1e-9


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-50.0,), (0.0,), (99.0,), (500.0,)], "v double")
    sk = histogram_sketch(df, "v", [], lo=0.0, hi=100.0, bins=10)
    cells = {r.bin: r.cnt for r in sk.collect()}
    assert cells == {0: 2, 9: 2}  # -50 clamps to bin 0; 500 to bin 9
    assert sum(cells.values()) == 4  # nothing lost


def test_histogram_rejects_bad_geometry(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="geometry"):
        histogram_sketch(df, "v", [], lo=5.0, hi=5.0)
    sk = histogram_sketch(df, "v", [], lo=0.0, hi=10.0)
    with pytest.raises(ValueError, match="quantiles"):
        histogram_quantile(sk, [1.5], [], lo=0.0, hi=10.0)


def test_histogram_extreme_outlier_clamps_to_top_bin(spark):
    """Review finding: a value overflowing int32 after binning must land
    in the TOP edge bin (documented clamp), not wrap negative into bin 0."""
    df = spark.createDataFrame([(1e12,), (5.0,)], "v double")
    sk = histogram_sketch(df, "v", [], lo=0.0, hi=1000.0, bins=256)
    cells = {r.bin: r.cnt for r in sk.collect()}
    assert cells == {255: 1, 1: 1}


def test_cms_estimate_refuses_per_group_sketch(spark):
    """Review finding: a per-group sketch would min() across groups and
    silently undercount — fail fast instead."""
    df = _freq_df(spark, [("x", 3)]).withColumn("shard", F.lit("a"))
    grouped = cms_sketch(df, "k", ["shard"])
    keys = spark.createDataFrame([("x",)], "k string")
    with pytest.raises(ValueError, match="single-group"):
        cms_estimate(grouped, keys, "k")


# ---------------------------------------------------------------------------
# Property tests: the sketch guarantees hold for ARBITRARY multisets
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    freqs=st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=4),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=12,
    )
)
def test_cms_never_undercounts_property(spark, freqs):
    """Count-min's one-sided error is structural: for ANY multiset,
    est(k) >= true(k), and merge == single pass."""
    pairs = list(freqs.items())
    df = _freq_df(spark, pairs)
    sk = cms_sketch(df, "k", [], depth=3, width=32)  # small geometry: collisions certain
    keys = spark.createDataFrame([(k,) for k in freqs], "k string")
    est = {
        r.k: r.approx_count
        for r in cms_estimate(sk, keys, "k", depth=3, width=32).collect()
    }
    for k, t in freqs.items():
        assert est[k] >= t, (k, est[k], t)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.floats(min_value=-50.0, max_value=150.0, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    split=st.integers(min_value=0, max_value=40),
)
def test_histogram_shard_merge_property(spark, vals, split):
    """For ANY values (including out-of-range) and ANY shard split,
    merged shard histograms == the single-pass histogram, and total
    counts are conserved."""
    split = min(split, len(vals))
    a = [(v, "a") for v in vals[:split]]
    b = [(v, "b") for v in vals[split:]]
    df = spark.createDataFrame(a + b, "v double, shard string")
    per_shard = histogram_sketch(df, "v", ["shard"], lo=0.0, hi=100.0, bins=16)
    merged = {r.bin: r.cnt for r in histogram_merge(per_shard, []).collect()}
    single = {
        r.bin: r.cnt
        for r in histogram_sketch(df, "v", [], lo=0.0, hi=100.0, bins=16).collect()
    }
    assert merged == single
    assert sum(merged.values()) == len(vals)


# ---------------------------------------------------------------------------
# KMV sketches (distinct counts with set algebra)
# ---------------------------------------------------------------------------

from mysql2parquet_spark.operators.sketches import (  # noqa: E402
    kmv_estimate,
    kmv_merge,
    kmv_overlap,
    kmv_sketch,
)


def _kmv_rows(df):
    return sorted(r["hv"] for r in df.collect())


def test_kmv_merge_equals_single_pass(spark, sf_dir):
    """Shard sketches merged ≡ one sketch over the unioned data — the
    same contract every mergeable family pins (hash-deterministic, so
    the comparison is exact row equality, not estimate proximity)."""
    ev = load_table(spark, sf_dir, "events")
    shards = ev.withColumn("shard", F.col("event_id") % 4)
    per_shard = kmv_sketch(shards, "user_id", ["shard"], k=128)
    merged = kmv_merge(per_shard, [], k=128)
    single = kmv_sketch(ev, "user_id", [], k=128)
    assert _kmv_rows(merged) == _kmv_rows(single)


def test_kmv_estimate_within_error(spark, sf_dir):
    """(k-1)/u_k estimator: relative error within 4/sqrt(k-2) (≈4σ) of
    the exact distinct count on real data."""
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    k = 512
    est = kmv_estimate(kmv_sketch(ev, "user_id", [], k=k), [], k=k).collect()[0][
        "approx_distinct"
    ]
    assert abs(est - exact) / exact < 4.0 / (k - 2) ** 0.5, (est, exact)


def test_kmv_small_group_is_exact(spark):
    """A group with fewer than k distinct keys keeps every hash, so its
    estimate is the exact count."""
    df = spark.createDataFrame(
        [(g, f"k{i}") for g in ("a", "b") for i in range(g == "b" and 7 or 3)],
        "g string, key string",
    )
    out = {
        r["g"]: r["approx_distinct"]
        for r in kmv_estimate(
            kmv_sketch(df, "key", ["g"], k=64), ["g"], k=64
        ).collect()
    }
    assert out == {"a": 3.0, "b": 7.0}


def test_kmv_duplicate_keys_do_not_consume_slots(spark):
    """Heavy duplication must not evict distinct hashes from the k
    minima (dense_rank, not row_number): 50 copies of each of 20 keys
    with k=16 still yields 16 distinct retained hashes."""
    df = spark.createDataFrame(
        [(f"k{i % 20}",) for i in range(1000)], "key string"
    )
    sk = kmv_sketch(df, "key", [], k=16)
    rows = _kmv_rows(sk)
    assert len(rows) == 16 and len(set(rows)) == 16


def test_kmv_overlap_estimates_planted_jaccard(spark):
    """Planted overlap: |A|=4000, |B|=4000, |A∩B|=2000 → J=1/3.
    Tolerances are ~5σ of each estimator (σ_J = sqrt(J(1-J)/k) ≈ 0.021
    at k=512; intersection compounds the jaccard and union noise) —
    and the hash seed is fixed, so the observed errors are DETERMINISTIC;
    these gates also lock the estimator against regressions."""
    a = spark.createDataFrame([(f"k{i}",) for i in range(4000)], "key string")
    b = spark.createDataFrame(
        [(f"k{i}",) for i in range(2000, 6000)], "key string"
    )
    k = 512
    out = kmv_overlap(
        kmv_sketch(a, "key", [], k=k),
        kmv_sketch(b, "key", [], k=k),
        k=k,
    ).collect()[0]
    assert abs(out["jaccard"] - 1 / 3) < 0.11  # ~5σ_J
    assert abs(out["approx_union"] - 6000) / 6000 < 0.12  # ~4.5σ of n/sqrt(k-2)
    assert abs(out["approx_intersection"] - 2000) / 2000 < 0.35  # compound


def test_kmv_overlap_disjoint_and_identical(spark):
    """Degenerate overlaps: disjoint corpora estimate J=0; identical
    corpora estimate J=1 exactly (every union minimum is in both)."""
    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(500)], "key string")
    k = 256
    ska, skb = (kmv_sketch(d, "key", [], k=k) for d in (a, b))
    assert kmv_overlap(ska, skb, k=k).collect()[0]["jaccard"] == 0.0
    same = kmv_overlap(ska, ska, k=k).collect()[0]
    assert same["jaccard"] == 1.0


def test_kmv_overlap_refuses_grouped_sketch(spark):
    df = spark.createDataFrame([("g", "k"),], "g string, key string")
    sk = kmv_sketch(df, "key", ["g"], k=64)
    flat = kmv_sketch(df, "key", [], k=64)
    with pytest.raises(ValueError, match="single-group"):
        kmv_overlap(sk, flat, k=64)


def test_kmv_parquet_roundtrip(spark, sf_dir, tmp_path):
    """The nightly-artifact contract: persist per-shard sketches,
    read back, merge — estimate unchanged vs in-memory path."""
    ev = load_table(spark, sf_dir, "events")
    shards = ev.withColumn("shard", F.col("event_id") % 3)
    per_shard = kmv_sketch(shards, "user_id", ["shard"], k=128)
    path = str(tmp_path / "kmv")
    per_shard.write.parquet(path)
    back = spark.read.parquet(path)
    est_disk = kmv_estimate(kmv_merge(back, [], k=128), [], k=128).collect()[0][
        "approx_distinct"
    ]
    est_mem = kmv_estimate(
        kmv_merge(per_shard, [], k=128), [], k=128
    ).collect()[0]["approx_distinct"]
    assert est_disk == est_mem


def test_kmv_sketch_plan_prunes_map_side(spark, sf_dir):
    """The scale contract: dense_rank(k) over raw rows must run through
    WindowGroupLimit so each map task keeps a bounded k-heap and the
    exchange carries ≤ k candidates per group per task — without it the
    window sorts every corpus row per group."""
    ev = load_table(spark, sf_dir, "events")
    for groups in (["event_type"], []):
        plan = (
            kmv_sketch(ev, "user_id", groups)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan, (groups, plan[:1500])


def test_kmv_rejects_tiny_k(spark):
    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError, match="k >= 8"):
        kmv_sketch(df, "key", [], k=4)


# ---------------------------------------------------------------------------
# Bloom membership sketches
# ---------------------------------------------------------------------------

from mysql2parquet_spark.operators.sketches import (  # noqa: E402
    bloom_contains,
    bloom_merge,
    bloom_sketch,
)


def test_bloom_never_false_negative(spark, sf_dir):
    """Every key the filter saw must probe maybe_present=true — the
    membership contract deletion-proofing incremental ingest relies on."""
    ev = load_table(spark, sf_dir, "events")
    sk = bloom_sketch(ev, "user_id", [])
    probed = bloom_contains(sk, ev.select("user_id").distinct(), "user_id")
    assert probed.filter(~F.col("maybe_present")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    """10k present keys in a 2^20-bit filter: absent keys must probe
    true at well under 1% (theory ~1e-5 at this load; 1% is huge slack)."""
    present = spark.createDataFrame(
        [(f"in{i}",) for i in range(10_000)], "key string"
    )
    absent = spark.createDataFrame(
        [(f"out{i}",) for i in range(10_000)], "key string"
    )
    sk = bloom_sketch(present, "key", [])
    fp = (
        bloom_contains(sk, absent, "key")
        .filter(F.col("maybe_present"))
        .count()
    )
    assert fp < 100, fp


def test_bloom_merge_equals_single_pass(spark, sf_dir):
    """Shard filters OR-merged ≡ one filter over the unioned data —
    exact row equality (hash-deterministic)."""
    ev = load_table(spark, sf_dir, "events")
    shards = ev.withColumn("shard", F.col("event_id") % 4)
    merged = bloom_merge(bloom_sketch(shards, "user_id", ["shard"]), [])
    single = bloom_sketch(ev, "user_id", [])
    assert sorted(r["pos"] for r in merged.collect()) == sorted(
        r["pos"] for r in single.collect()
    )


def test_bloom_size_capped_by_geometry(spark):
    """Row count never exceeds min(k·n, m): tiny geometry saturates at
    m rows no matter how many keys pour in."""
    df = spark.createDataFrame([(f"k{i}",) for i in range(5_000)], "key string")
    sk = bloom_sketch(df, "key", [], m=256, k=4)
    assert sk.count() <= 256


def test_bloom_probe_broadcasts_sketch_not_keys(spark, sf_dir):
    """Scale contract: the geometry-capped sketch broadcasts; the
    (arbitrarily large) key side must not shuffle for the lookup."""
    ev = load_table(spark, sf_dir, "events")
    sk = bloom_merge(bloom_sketch(ev, "user_id", []), [])
    plan = (
        bloom_contains(sk, ev.select("user_id"), "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan[:1500]


def test_bloom_contains_refuses_grouped_sketch(spark):
    df = spark.createDataFrame([("g", "k")], "g string, key string")
    grouped = bloom_sketch(df, "key", ["g"])
    with pytest.raises(ValueError, match="single-group"):
        bloom_contains(grouped, df.select("key"), "key")


def test_bloom_rejects_bad_geometry(spark):
    df = spark.createDataFrame([("k",)], "key string")
    with pytest.raises(ValueError, match="bad bloom geometry"):
        bloom_sketch(df, "key", [], m=16)
    with pytest.raises(ValueError, match="bad bloom geometry"):
        bloom_sketch(df, "key", [], k=0)


def test_bloom_parquet_roundtrip_cross_export_probe(spark, sf_dir, tmp_path):
    """The nightly pattern end-to-end: persist night-1's filter, read it
    back, probe night-2's keys — exactly the already-ingested keys probe
    true (plus a bounded-FPR fringe; here geometry makes it zero)."""
    ev = load_table(spark, sf_dir, "events")
    n1 = ev.filter(F.col("event_id") % 2 == 0)
    n2 = ev.filter(F.col("event_id") % 2 == 1)
    path = str(tmp_path / "bloom")
    bloom_sketch(n1, "user_id", []).write.parquet(path)
    back = spark.read.parquet(path)
    probed = bloom_contains(back, n2.select("user_id").distinct(), "user_id")
    seen = {r[0] for r in n1.select("user_id").distinct().collect()}
    for row in probed.collect():
        if row["user_id"] in seen:
            assert row["maybe_present"]


# ---------------------------------------------------------------------------
# KMV / Bloom property tests
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    keys=st.lists(
        st.text(alphabet="abcdefghij", min_size=1, max_size=5),
        min_size=1,
        max_size=60,
    ),
    split=st.integers(min_value=0, max_value=60),
)
def test_kmv_shard_merge_property(spark, keys, split):
    """For ANY key multiset and ANY shard split, merged shard KMV
    sketches == the single-pass sketch (exact row equality), and a
    small-cardinality input estimates its exact distinct count."""
    split = min(split, len(keys))
    rows = [(k, "a") for k in keys[:split]] + [
        (k, "b") for k in keys[split:]
    ]
    df = spark.createDataFrame(rows, "key string, shard string")
    per_shard = kmv_sketch(df, "key", ["shard"], k=16)
    merged = sorted(r["hv"] for r in kmv_merge(per_shard, [], k=16).collect())
    single = sorted(
        r["hv"] for r in kmv_sketch(df, "key", [], k=16).collect()
    )
    assert merged == single
    n_distinct = len(set(keys))
    if n_distinct < 16:
        est = kmv_estimate(
            kmv_merge(per_shard, [], k=16), [], k=16
        ).collect()[0]["approx_distinct"]
        assert est == float(n_distinct)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    present=st.sets(
        st.text(alphabet="abcdefghij", min_size=1, max_size=5),
        min_size=1,
        max_size=40,
    ),
    split=st.integers(min_value=0, max_value=40),
)
def test_bloom_no_false_negative_property(spark, present, split):
    """For ANY key set and ANY shard split: every present key probes
    true against the merged filter, and merge == single pass."""
    keys = sorted(present)
    split = min(split, len(keys))
    rows = [(k, "a") for k in keys[:split]] + [
        (k, "b") for k in keys[split:]
    ]
    df = spark.createDataFrame(rows, "key string, shard string")
    merged = bloom_merge(
        bloom_sketch(df, "key", ["shard"], m=512, k=3), []
    )
    single = bloom_sketch(df, "key", [], m=512, k=3)
    assert sorted(r["pos"] for r in merged.collect()) == sorted(
        r["pos"] for r in single.collect()
    )
    probe = spark.createDataFrame([(k,) for k in keys], "key string")
    out = bloom_contains(merged, probe, "key", m=512, k=3)
    assert out.filter(~F.col("maybe_present")).count() == 0


def test_bloom_contains_tolerates_duplicated_sketch_rows(spark):
    """A raw union of shard sidecars (no bloom_merge) carries duplicate
    positions; the probe must still honor the no-false-negative
    contract instead of overcounting hits past k."""
    keys = spark.createDataFrame([(f"k{i}",) for i in range(200)], "key string")
    sk = bloom_sketch(keys, "key", [], m=4096, k=3)
    doubled = sk.unionByName(sk)  # every position twice
    out = bloom_contains(doubled, keys, "key", m=4096, k=3)
    assert out.filter(~F.col("maybe_present")).count() == 0


# ---------------------------------------------------------------------------
# Multi-column (one-scan) sidecar builders ≡ per-column unions
# ---------------------------------------------------------------------------

from mysql2parquet_spark.operators.sketches import (  # noqa: E402
    bloom_sketch_multi,
    cms_sketch_multi,
    distinct_sketches_multi,
    histogram_sketch_multi,
    kmv_sketch_multi,
)


def _tagged_union(spark, builders):
    out = None
    for col_name, df in builders:
        d = df.select(F.lit(col_name).alias("column"), "*")
        out = d if out is None else out.unionByName(d)
    return out


def test_multi_builders_equal_per_column_unions(spark, sf_dir):
    """The writer's one-scan contract: every multi-column family builder
    produces EXACTLY the per-column union (native-type hashing preserved
    through the fused explode), so sidecars built either way merge and
    probe identically."""
    ev = load_table(spark, sf_dir, "events").limit(4000)
    cols = ["user_id", "event_type"]

    def rows(df):
        return sorted(map(tuple, df.collect()))

    multi = cms_sketch_multi(ev, cols, depth=3, width=64)
    single = _tagged_union(
        spark,
        [(c, cms_sketch(ev, c, [], depth=3, width=64)) for c in cols],
    )
    assert rows(multi) == rows(single)

    multi = kmv_sketch_multi(ev, cols, k=64)
    single = _tagged_union(
        spark, [(c, kmv_sketch(ev, c, [], k=64)) for c in cols]
    )
    assert rows(multi) == rows(single)

    multi = bloom_sketch_multi(ev, cols, m=2048, k=3)
    single = _tagged_union(
        spark, [(c, bloom_sketch(ev, c, [], m=2048, k=3)) for c in cols]
    )
    assert rows(multi) == rows(single)

    specs = [("user_id", 0.0, 2000.0), ("value", -10.0, 1000.0)]
    multi = histogram_sketch_multi(ev, specs, bins=32)
    single = None
    for c, lo, hi in specs:
        d = histogram_sketch(ev, c, [], lo=lo, hi=hi, bins=32).select(
            F.lit(c).alias("column"),
            F.lit(lo).alias("lo"),
            F.lit(hi).alias("hi"),
            F.lit(32).alias("bins"),
            "bin",
            "cnt",
        )
        single = d if single is None else single.unionByName(d)
    assert rows(multi) == rows(single)

    # HLL: estimates (sketch blobs may differ byte-wise only if update
    # order mattered — it does not for HLL state, but compare through
    # the estimate to stay implementation-honest) + exact n_rows
    multi = distinct_sketches_multi(ev, cols)
    est_m = {
        r["column"]: (r["approx_distinct"], r["n_rows"])
        for r in merge_sketch_estimates(multi, ["column"]).collect()
    }
    for c in cols:
        est_s = merge_sketch_estimates(
            distinct_sketches(ev, c, []).select(
                F.lit(c).alias("column"), "sketch", "n_rows"
            ),
            ["column"],
        ).collect()[0]
        assert est_m[c] == (est_s["approx_distinct"], est_s["n_rows"])


def test_multi_builders_single_scan_plan(spark, sf_dir):
    """The point of the multi variants: one parquet scan regardless of
    column count (the per-column union scans once per column)."""
    ev = load_table(spark, sf_dir, "events")
    for df in (
        cms_sketch_multi(ev, ["user_id", "event_type"], depth=3, width=64),
        kmv_sketch_multi(ev, ["user_id", "event_type"], k=64),
        bloom_sketch_multi(ev, ["user_id", "event_type"], m=2048, k=3),
        distinct_sketches_multi(ev, ["user_id", "event_type"]),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") == 1, plan[:1200]
