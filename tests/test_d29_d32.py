"""Operator-level tests for the D29-D32 surfaces (VERDICT r7 ask #2):
winsorize / robust_scale (operators/numeric.py), k-step path mining
(operators/sequences.py), SemDeDup semantic dedup
(operators/similarity.py::semantic_dedup), and curriculum ordering
(operators/pipeline.py::curriculum_order).

These cover exactly the edges the registered fixture queries miss —
NULL values/tokens/ids (ADVICE r7 #1-#3), IQR=0 groups, the
``approx=True`` bounds path, DataFrame-seeded semantic_dedup, and the
position = global-ROW_NUMBER property of curriculum_order.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.numeric import (
    robust_scale,
    winsorize,
    winsorize_report,
)
from mysql2parquet_spark.operators.pipeline import curriculum_order
from mysql2parquet_spark.operators.sequences import path_kgrams, top_paths
from mysql2parquet_spark.operators.similarity import semantic_dedup


# ---------------------------------------------------------------- D29

def _vals(spark, values, group="g"):
    return spark.createDataFrame(
        [Row(g=group, v=float(x) if x is not None else None) for x in values]
    )


def test_winsorize_clamps_into_band(spark):
    # 1..100: p05=5.95, p95=95.05 under the lo+frac*(hi-lo) rule both
    # engines share; 1 clamps up, 100 clamps down, 50 passes through.
    df = _vals(spark, range(1, 101))
    out = winsorize(df, "v", ["g"], lo=0.05, hi=0.95)
    got = {r["v"]: r["v_w"] for r in out.collect()}
    assert got[1.0] == pytest.approx(5.95)
    assert got[100.0] == pytest.approx(95.05)
    assert got[50.0] == 50.0


def test_winsorize_null_value_stays_null(spark):
    # ADVICE r7 #1: Spark F.least/F.greatest SKIP nulls, so an
    # unguarded clamp turns NULL into p_lo — fabricated data. The
    # guard must keep NULL in -> NULL out.
    df = _vals(spark, [10, 20, 30, 40, None])
    out = winsorize(df, "v", ["g"], lo=0.25, hi=0.75)
    null_rows = out.filter(F.col("v").isNull()).collect()
    assert len(null_rows) == 1
    assert null_rows[0]["v_w"] is None
    # and non-null rows are still clamped (the guard didn't disable it)
    assert out.filter(F.col("v_w") > F.col("v")).count() == 1  # 10 -> p25


def test_winsorize_report_counts_and_null_blindness(spark):
    # NULL values must count in neither n_clip_lo nor n_clip_hi and
    # not in n_rows (COUNT(value) skips NULL on both engines).
    df = _vals(spark, list(range(1, 101)) + [None])
    rep = winsorize_report(df, "v", ["g"], lo=0.05, hi=0.95).collect()[0]
    assert rep["n_rows"] == 100
    assert rep["n_clip_lo"] == 5   # 1..5 < 5.95
    assert rep["n_clip_hi"] == 5   # 96..100 > 95.05
    assert rep["p_lo"] == pytest.approx(5.95)


def test_winsorize_bad_band_raises(spark):
    df = _vals(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        winsorize(df, "v", ["g"], lo=0.9, hi=0.1)


def test_robust_scale_median_iqr(spark):
    # 1..9: median 5, q1 3, q3 7, IQR 4 -> value 9 scales to 1.0
    df = _vals(spark, range(1, 10))
    out = robust_scale(df, "v", ["g"])
    got = {r["v"]: r["v_rs"] for r in out.collect()}
    assert got[9.0] == pytest.approx(1.0)
    assert got[5.0] == pytest.approx(0.0)
    assert got[1.0] == pytest.approx(-1.0)


def test_robust_scale_constant_group_yields_null(spark):
    # IQR=0 must surface as NULL, never +/-inf or a divide error.
    df = _vals(spark, [7, 7, 7, 7])
    out = robust_scale(df, "v", ["g"]).collect()
    assert all(r["v_rs"] is None for r in out)


def test_robust_scale_null_value_stays_null(spark):
    df = _vals(spark, [1, 2, 3, 4, 5, None])
    row = robust_scale(df, "v", ["g"]).filter(F.col("v").isNull()).collect()
    assert len(row) == 1 and row[0]["v_rs"] is None


def test_winsorize_approx_path_bounds_are_sane(spark):
    # approx=True swaps F.percentile for percentile_approx (t-digest,
    # bounded state). The sketch is exact for small inputs at accuracy
    # 10000, so the clamp band must bracket the data like the exact
    # path; assert bounds land inside [min, max] and ordering holds.
    df = _vals(spark, range(1, 101))
    out = winsorize(df, "v", ["g"], lo=0.05, hi=0.95, approx=True)
    w = [r["v_w"] for r in out.collect()]
    assert min(w) >= 1.0 and max(w) <= 100.0
    assert min(w) > 1.0 and max(w) < 100.0  # something actually clipped
    exact = winsorize(df, "v", ["g"], lo=0.05, hi=0.95)
    # t-digest at accuracy 10000 on 100 points: same clipped COUNT
    n_changed_a = out.filter(F.col("v") != F.col("v_w")).count()
    n_changed_e = exact.filter(F.col("v") != F.col("v_w")).count()
    assert abs(n_changed_a - n_changed_e) <= 2


# ---------------------------------------------------------------- D30

def _events(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, ts=t, event_id=i, event_type=ty)
         for (u, t, i, ty) in rows]
    )


def test_path_kgrams_basic_and_short_streams_dropped(spark):
    ev = _events(spark, [
        ("u1", 1, 1, "a"), ("u1", 2, 2, "b"), ("u1", 3, 3, "c"),
        ("u1", 4, 4, "d"),
        ("u2", 1, 5, "x"), ("u2", 2, 6, "y"),   # only 2 events: no 3-gram
    ])
    got = sorted(
        r["path"]
        for r in path_kgrams(ev, "user_id", ["ts", "event_id"],
                             "event_type", k=3).collect()
    )
    assert got == ["a>b>c", "b>c>d"]


def test_path_kgrams_null_token_midstream_dropped(spark):
    # ADVICE r7 #2: a NULL token mid-stream makes lead(k-1) non-null
    # while an earlier step is NULL; concat_ws silently skips it and a
    # last-lead-only gate would emit the truncated "a>c" as a 2-gram
    # alias. Every gram touching the NULL position must be dropped.
    ev = _events(spark, [
        ("u1", 1, 1, "a"), ("u1", 2, 2, None), ("u1", 3, 3, "c"),
        ("u1", 4, 4, "d"), ("u1", 5, 5, "e"),
    ])
    got = sorted(
        r["path"]
        for r in path_kgrams(ev, "user_id", ["ts", "event_id"],
                             "event_type", k=3).collect()
    )
    assert got == ["c>d>e"]  # a>_>c, _>c>d dropped entirely


def test_path_kgrams_k1_rejected(spark):
    ev = _events(spark, [("u1", 1, 1, "a")])
    with pytest.raises(ValueError):
        path_kgrams(ev, "user_id", ["ts"], "event_type", k=1)


def test_top_paths_counts_and_tiebreak(spark):
    ev = _events(spark, [
        # u1 walks a>b>c twice (a b c a b c -> includes overlapping walks)
        ("u1", 1, 1, "a"), ("u1", 2, 2, "b"), ("u1", 3, 3, "c"),
        ("u1", 4, 4, "a"), ("u1", 5, 5, "b"), ("u1", 6, 6, "c"),
        # u2 walks a>b>c once
        ("u2", 1, 7, "a"), ("u2", 2, 8, "b"), ("u2", 3, 9, "c"),
    ])
    got = top_paths(ev, "user_id", ["ts", "event_id"], "event_type",
                    k=3, top=3).collect()
    assert got[0]["path"] == "a>b>c"
    assert got[0]["n_walks"] == 3
    assert got[0]["n_entities"] == 2
    # ties (all 1-walk paths) break on path ASC — deterministic LIMIT
    rest = [r["path"] for r in got[1:]]
    assert rest == sorted(rest)


# ---------------------------------------------------------------- D31

def _emb(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows]
    )


def test_semantic_dedup_pairs_only_within_cluster(spark):
    # Two orthogonal clusters; near-dups exist in each, and vectors 3/13
    # are cross-cluster-similar to NOTHING in their own cell.
    emb = _emb(spark, [
        (1, [1.0, 0.0]), (2, [0.99, 0.01]),        # cluster of seed 1
        (11, [0.0, 1.0]), (12, [0.01, 0.99]),      # cluster of seed 11
        (3, [0.7, -0.7]),                          # lone in seed-1 cell
    ])
    losers = semantic_dedup(
        emb, seeds=[(1, [1.0, 0.0]), (11, [0.0, 1.0])], threshold=0.9
    ).collect()
    got = {(r["vec_id"], r["centroid_id"]) for r in losers}
    assert got == {(2, 1), (12, 11)}  # keep-lowest-id; 3 survives


def test_semantic_dedup_default_seeds_deterministic(spark):
    emb = _emb(spark, [
        (1, [1.0, 0.0]), (2, [0.99, 0.01]), (3, [0.0, 1.0]),
        (4, [0.01, 0.99]), (5, [-1.0, 0.0]),
    ])
    a = {r["vec_id"] for r in
         semantic_dedup(emb, num_seeds=2, threshold=0.9).collect()}
    b = {r["vec_id"] for r in
         semantic_dedup(emb, num_seeds=2, threshold=0.9).collect()}
    assert a == b  # lowest-id codebook -> identical run to run
    # explicit seeds equal to the lowest-id rows reproduce the default
    c = {r["vec_id"] for r in semantic_dedup(
        emb, seeds=[(1, [1.0, 0.0]), (2, [0.99, 0.01])], threshold=0.9
    ).collect()}
    assert a == c


def test_semantic_dedup_dataframe_seeds(spark):
    emb = _emb(spark, [
        (1, [1.0, 0.0]), (2, [0.99, 0.01]), (11, [0.0, 1.0]),
        (12, [0.01, 0.99]),
    ])
    seed_df = spark.createDataFrame(
        [Row(centroid_id=0, embedding=[1.0, 0.0]),
         Row(centroid_id=1, embedding=[0.0, 1.0])]
    )
    losers = semantic_dedup(emb, seeds=seed_df, threshold=0.9).collect()
    got = {(r["vec_id"], r["centroid_id"]) for r in losers}
    assert got == {(2, 0), (12, 1)}


def test_semantic_dedup_zero_norm_rows_never_pair(spark):
    # zero vectors have undefined cosine: they must neither crash the
    # assignment (coalesce to -inf) nor emit pairs (NULL cosine fails
    # the threshold), even when two of them share a cluster.
    emb = _emb(spark, [
        (1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 0.0]),
    ])
    losers = semantic_dedup(
        emb, seeds=[(0, [1.0, 0.0])], threshold=0.1
    ).collect()
    assert {r["vec_id"] for r in losers} == set()


def test_semantic_dedup_empty_seed_set_raises(spark):
    emb = _emb(spark, [(1, [1.0, 0.0])])
    with pytest.raises(ValueError):
        semantic_dedup(emb, seeds=[], threshold=0.5)


# ---------------------------------------------------------------- D32

def test_curriculum_position_is_global_row_number(spark):
    # Property: the distributed salted-prefix construction must equal
    # ROW_NUMBER() OVER (ORDER BY band, md5(id||':'||seed), id) exactly
    # — the single-task window Spark would plan naively is the ORACLE
    # here, run on the same engine for a bit-identical compare.
    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("band")
    )
    got = curriculum_order(df, "doc_id", "band", seed="s8")
    w = Window.orderBy(
        "band", F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":s8"))),
        "doc_id",
    )
    want = df.select(
        "doc_id", "band", F.row_number().over(w).alias("position")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_curriculum_salt_chars_do_not_change_order(spark):
    # the salt is a PREFIX of the sort key: 16^salt_chars partitions
    # change the physical grouping, never the total order.
    df = spark.range(300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 2).alias("band")
    )
    a = curriculum_order(df, "doc_id", "band", salt_chars=1)
    b = curriculum_order(df, "doc_id", "band", salt_chars=3)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_curriculum_null_id_raises(spark):
    # ADVICE r7 #3: NULL ids used to vanish through the inner offset
    # join — silent row loss in an epoch-ordering operator. Now the
    # in-plan guard raises.
    df = spark.createDataFrame(
        [Row(doc_id="a", band=0), Row(doc_id=None, band=0)]
    )
    with pytest.raises(Exception, match="NULL id or band"):
        curriculum_order(df, "doc_id", "band").collect()


def test_curriculum_null_band_raises(spark):
    df = spark.createDataFrame(
        [Row(doc_id="a", band=0), Row(doc_id="b", band=None)]
    )
    with pytest.raises(Exception, match="NULL id or band"):
        curriculum_order(df, "doc_id", "band").collect()


def test_curriculum_bands_order_before_shuffle(spark):
    # easy band rows all rank before hard band rows, and within a band
    # the md5 order differs from doc_id order (it's actually shuffled).
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, 0).otherwise(1).alias("band"),
    )
    rows = curriculum_order(df, "doc_id", "band").collect()
    pos = {r["doc_id"]: (r["band"], r["position"]) for r in rows}
    max_easy = max(p for b, p in pos.values() if b == 0)
    min_hard = min(p for b, p in pos.values() if b == 1)
    assert max_easy < min_hard
    easy_by_pos = [d for d, (b, p) in
                   sorted(pos.items(), key=lambda kv: kv[1][1]) if b == 0]
    assert easy_by_pos != sorted(easy_by_pos)  # within-band shuffle real
