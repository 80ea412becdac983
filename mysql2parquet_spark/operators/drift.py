"""Distribution-drift detection between two corpus versions.

The nightly-export user (the reference's audience — ``main.go:87-165``
publishes one parquet snapshot per run) needs to know when tonight's
data stopped looking like last night's: an upstream schema change, a
broken filter, a new traffic source. This module answers that with
three standard divergences — PSI (population stability index), Jensen-
Shannon, and total variation — computed two ways:

- ``histogram_drift``: from two HISTOGRAM SKETCHES (the row-form
  ``(group…, bin, cnt)`` sidecars ``sketches.histogram_sketch``
  writes). At 100 TB this is the whole point: the comparison reads two
  few-KB artifacts, never the data. Requires identical bin geometry on
  both sides (same lo/hi/bins — the same contract histogram_merge
  already imposes on shards).
- ``categorical_drift``: from the raw tables, for low-cardinality
  string columns. One partial-aggregated scan per side; the shuffle
  carries |categories| rows, and categories beyond ``top_k`` (by
  combined count) lump into ``__other__`` so a high-cardinality column
  can't explode the report.

``drift_report`` runs both over a column spec and returns one tall
report ``(column, kind, n_a, n_b, psi, js_div, tv_dist, verdict)``
with the standard PSI verdict bands (<0.1 stable, <0.25 moderate,
else drifted).

Math notes (shared by both paths, and by the SQL oracle used in
tests): per-cell shares are clamped to ``eps`` before the log terms —
``sa = greatest(cnt_a / tot_a, eps)`` — so a cell present on one side
only contributes a large-but-finite term instead of ±inf. Identical
inputs give exactly psi = js = tv = 0 (ln(1) terms), so "no drift" is
a stable exact value, not an approximation. All three metrics are
computed in ONE aggregation over the joined cells; everything is
JVM-side built-ins (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PSI_STABLE = 0.1
PSI_MODERATE = 0.25


def _verdict(psi: Column) -> Column:
    return (
        F.when(psi < F.lit(PSI_STABLE), F.lit("stable"))
        .when(psi < F.lit(PSI_MODERATE), F.lit("moderate"))
        .otherwise(F.lit("drifted"))
    )


def _divergences(cells: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold tagged cells ``(group…, cell, cnt_a, cnt_b)`` into one row
    per group: ``n_a, n_b, psi, js_div, tv_dist, verdict``.

    One window (per-group totals over the CELLS — ≤ bins/top_k rows per
    group, never the data) + one aggregation. Outputs round to 6
    decimals so the doubles compare exactly across engines.
    """
    tot = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy(F.lit(1))
    with_tot = cells.withColumn("_tot_a", F.sum("cnt_a").over(tot)).withColumn(
        "_tot_b", F.sum("cnt_b").over(tot)
    )
    eps = F.lit(1e-6)
    sa = F.greatest(F.col("cnt_a") / F.col("_tot_a"), eps)
    sb = F.greatest(F.col("cnt_b") / F.col("_tot_b"), eps)
    m = (sa + sb) / F.lit(2.0)
    psi_term = (sa - sb) * (F.log(sa) - F.log(sb))
    js_term = (sa * (F.log(sa) - F.log(m)) + sb * (F.log(sb) - F.log(m))) / F.lit(2.0)
    tv_term = F.abs(sa - sb) / F.lit(2.0)
    out = (
        with_tot.groupBy(*group_cols)
        .agg(
            F.max("_tot_a").cast("long").alias("n_a"),
            F.max("_tot_b").cast("long").alias("n_b"),
            F.round(F.sum(psi_term), 6).alias("psi"),
            F.round(F.sum(js_term), 6).alias("js_div"),
            F.round(F.sum(tv_term), 6).alias("tv_dist"),
        )
        .withColumn("verdict", _verdict(F.col("psi")))
    )
    return out


def _align(
    a: DataFrame, b: DataFrame, key_cols: list[str], cnt_col: str
) -> DataFrame:
    """Union-align two count tables on ``key_cols`` → one row per key
    with ``cnt_a``/``cnt_b`` (0 where absent). Union + re-aggregate
    instead of a full-outer join: one shuffle, no null-key juggling."""
    tag_a = a.select(*key_cols, F.col(cnt_col).alias("_cnt"), F.lit(1).alias("_side"))
    tag_b = b.select(*key_cols, F.col(cnt_col).alias("_cnt"), F.lit(2).alias("_side"))
    return (
        tag_a.unionByName(tag_b)
        .groupBy(*key_cols)
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_side") == 1, F.col("_cnt"))), F.lit(0)
            ).cast("double").alias("cnt_a"),
            F.coalesce(
                F.sum(F.when(F.col("_side") == 2, F.col("_cnt"))), F.lit(0)
            ).cast("double").alias("cnt_b"),
        )
    )


def histogram_drift(
    hist_a: DataFrame, hist_b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Drift metrics between two histogram SKETCHES (row form
    ``(group…, bin, cnt)`` from ``sketches.histogram_sketch`` — e.g.
    two nightly ``_sidecars/hist_*`` artifacts).

    Both sketches MUST share bin geometry (identical lo/hi/bins — the
    histogram_merge contract); bins are compared by id, so no geometry
    parameters are needed here. Cost is proportional to the SKETCH
    (groups × bins rows), not the data: comparing two 100 TB nights is
    a KB-scale job. Returns one row per group:
    ``group…, n_a, n_b, psi, js_div, tv_dist, verdict``.
    """
    return count_drift(hist_a, hist_b, group_cols, key_col="bin")


def count_drift(
    counts_a: DataFrame,
    counts_b: DataFrame,
    group_cols: list[str] | None = None,
    *,
    key_col: str = "cat",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Drift metrics between two pre-aggregated COUNT tables keyed by
    ``key_col`` — the consumer for ``sketches.category_sketch_multi``
    sidecars ``(column, cat, cnt)`` (pass ``group_cols=["column"]``),
    and the shared core the histogram path specializes with
    ``key_col="bin"``. A key present on one side only gets count 0 on
    the other (its eps-clamped term is the drift signal). For category
    sidecars that asymmetry includes the top-k sets themselves: a
    category inside A's top-k but folded into B's ``__other__``
    compares against 0 — biasing drift UPWARD, which is the honest
    direction (diverging top-k sets are themselves drift)."""
    group_cols = group_cols or []
    cells = _align(counts_a, counts_b, [*group_cols, key_col], cnt_col)
    return _divergences(cells, group_cols)


def categorical_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    *,
    top_k: int = 100,
) -> DataFrame:
    """Drift metrics for a categorical column, from the raw tables.

    One partial-aggregated ``groupBy(col).count()`` scan per side (the
    exchange carries |categories| rows per map task), then the two
    count tables align and fold exactly like histogram cells. Only the
    ``top_k`` categories by combined count keep their identity; the
    tail lumps into ``__other__``. The top-k selection is
    ``orderBy().limit()`` — TakeOrderedAndProject (per-task heaps),
    never a global rank window, so a high-cardinality column (user ids)
    costs one extra pass over the count cells, not a single-partition
    sort of them; the k survivors broadcast back (genuinely bounded by
    ``top_k``). Ties break by category value, so the report is
    deterministic. NULL categories count as the literal ``__null__``
    bucket — a NULL-rate shift IS drift.

    Returns ONE row: ``n_a, n_b, psi, js_div, tv_dist, verdict``.
    """
    ca = df_a.groupBy(F.coalesce(F.col(col).cast("string"), F.lit("__null__")).alias("cat")).count()
    cb = df_b.groupBy(F.coalesce(F.col(col).cast("string"), F.lit("__null__")).alias("cat")).count()
    cells = _align(ca, cb, ["cat"], "count")
    top = (
        cells.orderBy(F.desc(F.col("cnt_a") + F.col("cnt_b")), F.asc("cat"))
        .limit(top_k)
        .select("cat", F.lit(1).alias("_keep"))
    )
    lumped = (
        cells.join(F.broadcast(top), "cat", "left")
        .withColumn(
            "cell",
            F.when(F.col("_keep") == 1, F.col("cat")).otherwise(
                F.lit("__other__")
            ),
        )
        .groupBy("cell")
        .agg(F.sum("cnt_a").alias("cnt_a"), F.sum("cnt_b").alias("cnt_b"))
    )
    return _divergences(lumped, [])


def drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    *,
    numeric_cols: dict[str, tuple[float, float]] | None = None,
    cat_cols: list[str] | None = None,
    bins: int = 32,
    top_k: int = 100,
) -> DataFrame:
    """One tall drift report over a column spec:
    ``(column, kind, n_a, n_b, psi, js_div, tv_dist, verdict)``.

    ``numeric_cols`` maps column → (lo, hi) histogram geometry (domain
    knowledge, same contract as ``histogram_sketch``); ``cat_cols``
    lists categorical columns. Numeric columns sketch each side first
    (one scan per side per column at this layer — batch callers at
    100 TB should build multi-column sidecars via
    ``histogram_sketch_multi`` once and feed ``histogram_drift``
    directly; this wrapper is the ad-hoc/interactive face). The final
    report is a union of per-column one-row frames — driver-side plan
    glue over bounded metadata, no data collect.
    """
    from mysql2parquet_spark.operators.sketches import histogram_sketch

    numeric_cols = numeric_cols or {}
    cat_cols = cat_cols or []
    if not numeric_cols and not cat_cols:
        raise ValueError("drift_report needs at least one column")
    parts: list[DataFrame] = []
    for c, (lo, hi) in sorted(numeric_cols.items()):
        ha = histogram_sketch(df_a, c, [], lo=lo, hi=hi, bins=bins)
        hb = histogram_sketch(df_b, c, [], lo=lo, hi=hi, bins=bins)
        parts.append(
            histogram_drift(ha, hb).select(
                F.lit(c).alias("column"), F.lit("numeric").alias("kind"), "*"
            )
        )
    for c in cat_cols:
        parts.append(
            categorical_drift(df_a, df_b, c, top_k=top_k).select(
                F.lit(c).alias("column"), F.lit("categorical").alias("kind"), "*"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def wasserstein_drift(
    docs: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group WASSERSTEIN-1 distance to the pool (D97 — the earth
    mover's distance on the line: W₁(A, B) = ∫|CDF_A − CDF_B| dx,
    Vallender 1974's closed form; the drift metric PSI/JS/TV cannot
    be: those are BIN-WISE and blind to HOW FAR mass moved — a +10
    shift and a +1000 shift of the same mass score identically once
    they leave the bin, while W₁ reports the actual transport cost in
    the column's own units).

    One row per group: ``(group, n_docs, w1_milli)`` where
    ``w1_milli = floor(1000·W₁(group, pool))`` against the pooled
    distribution of all non-NULL-group rows.

    Exactness — the entire computation is INTEGER (not even one
    mirrored double division): on the pool's sorted distinct support
    x₁<…<x_m, with cumulative counts cumA over the group (size N_A)
    and cumB over the pool (size N_B),

        W₁·N_A·N_B = Σᵢ |N_B·cumAᵢ − N_A·cumBᵢ| · (xᵢ₊₁ − xᵢ)

    and ``w1_milli = (1000·Σ) div (N_A·N_B)`` — int64 throughout
    (bound: N_B·cumA ≤ N_B·N_A, times the support span; overflows
    past ~10⁹·span, stated — sample first at that scale).

    Scale shape: the data-scale work is TWO value-keyed count
    aggregates (per-group and pool, map-side combined); everything
    after runs on the |groups|·|support| grid — value-bounded, not
    data-bounded (an integer measurement column has bounded support;
    for a near-continuous double column, bucket first with
    ``sketches.histogram_sketch`` and run W₁ on the bins). The grid
    cross join broadcasts the bounded support list; the per-group
    cumulative is a window over the aggregated grid.
    """
    base = docs.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_x")
    )
    vals = base.select("_x").distinct()
    pool = base.groupBy("_x").agg(F.count(F.lit(1)).alias("_cb"))
    srcs = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("_na")
    )
    per = base.groupBy("_g", "_x").agg(
        F.count(F.lit(1)).alias("_ca")
    )
    nb = base.agg(F.count(F.lit(1)).cast("long").alias("_nb"))
    grid = (
        srcs.crossJoin(F.broadcast(vals))
        .join(per, ["_g", "_x"], "left")
        .join(F.broadcast(pool), "_x")
        .crossJoin(F.broadcast(nb))
        .select(
            "_g",
            "_x",
            "_na",
            "_nb",
            F.coalesce(F.col("_ca"), F.lit(0)).alias("_ca"),
            "_cb",
        )
    )
    w = Window.partitionBy("_g").orderBy(F.col("_x").asc())
    cum = grid.select(
        "_g",
        "_x",
        "_na",
        "_nb",
        F.sum("_ca")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_cuma"),
        F.sum("_cb")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_cumb"),
        F.lead("_x").over(w).alias("_nx"),
    )
    terms = cum.filter(F.col("_nx").isNotNull()).select(
        "_g",
        "_na",
        "_nb",
        (
            F.abs(
                F.col("_nb") * F.col("_cuma")
                - F.col("_na") * F.col("_cumb")
            )
            * (F.col("_nx") - F.col("_x"))
        ).alias("_t"),
    )
    agg = terms.groupBy("_g").agg(
        F.max("_na").alias("_na"),
        F.max("_nb").alias("_nb"),
        F.sum("_t").cast("long").alias("_isum"),
    )
    return agg.select(
        F.col("_g").alias(group_col),
        F.col("_na").cast("long").alias("n_docs"),
        F.expr("(_isum * 1000) div (_na * _nb)")
        .cast("long")
        .alias("w1_milli"),
    )
