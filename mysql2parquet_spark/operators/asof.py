"""As-of (time-travel) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with
``right_ts <= left_ts`` per key (backward as-of, tolerance-free), the
semantics of pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` / kdb ``aj``.

Spark-first implementation — NOT a Pandas-UDF port: union both sides
tagged, one window per key ordered by (ts, side) carrying a
last-non-null struct of the right payload, then keep left rows. Cost is
ONE shuffle on the key + a sort within partitions — the same cost as a
regular sort-merge join, and it scales to arbitrarily many rows per key
(a per-group pandas merge_asof would materialize whole groups in
Python). At equal timestamps the right row is visible to the left row
(inclusive match).

Right side must be unique per (key, right_ts) — ambiguous same-instant
rows have no defined winner in any as-of engine; dedupe first
(operators.dedup.exact_dedup) for deterministic results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_matched",
) -> DataFrame:
    """Backward as-of left join.

    Output: every ``left`` row plus ``<right_ts><suffix>`` and
    ``<col><suffix>`` for each of ``right_cols`` — null when no right
    row precedes the left row for that key.
    """
    payload = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),  # right sorts first at equal ts → inclusive
        payload.alias("_rv"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "_rv_filled", F.last("_rv", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("_side") == 1).drop("_t", "_side", "_rv")
    out = out.withColumn(
        f"{right_ts}{suffix}", F.col(f"_rv_filled.{right_ts}")
    )
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_rv_filled.{c}"))
    return out.drop("_rv_filled")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    bucket_width: int,
    max_span_buckets: int = 4096,
) -> DataFrame:
    """Interval OVERLAP join — pairs of rows whose closed intervals
    ``[start, end]`` intersect (optionally also matching equality keys
    ``on``) — as an EQUI-join Spark can shuffle-partition, not the
    O(|L|·|R|) theta join a naive ``l.join(r, overlap_cond)`` plans
    (BroadcastNestedLoopJoin: every executor scans one whole side).

    The classic bucketization: each interval lands in every
    ``bucket_width``-second time bucket it touches (``sequence`` +
    ``explode`` — boilerplate-free, whole-stage codegen), the join is
    equi on ``on + [bucket]``, and the true overlap predicate
    (``l_start <= r_end AND r_start <= l_end``) filters the bucket
    collisions. A pair sharing k buckets must appear ONCE, not k times:
    instead of a dedup shuffle, each pair is emitted only in its FIRST
    COMMON bucket — ``bucket == floor(sec(greatest(l_start, r_start)) /
    width)`` — which both intervals provably contain, so the output is
    exact with zero distinct pass.

    Scale posture: shuffle volume is rows × avg buckets-per-interval,
    so ``bucket_width`` should sit near the TYPICAL interval length
    (spans ≈ 1-2 buckets); a mis-sized width silently multiplies the
    exchange, so every row carries an executor-side ``assert_true`` cap
    (``max_span_buckets``) that fails the job loudly instead. Rows with
    NULL bounds drop out (a NULL sequence explodes to nothing) exactly
    as the SQL overlap predicate rejects them. Timestamp and
    timestamp_ntz bounds bucket on their UTC epoch seconds; numeric
    bounds bucket as-is — bucketing only needs monotone truncation, the
    emitted pairs compare on the ORIGINAL columns.

    The reference delegates all joins to MySQL (/root/reference/
    main.go:106), which plans this shape as a nested loop too — this
    operator exists for the 100 TB posture, where "works on 60k rows"
    nested loops do not.
    """
    on = list(on or [])
    dup = (set(left.columns) & set(right.columns)) - set(on)
    if dup:
        raise ValueError(
            f"interval_join needs disjoint payload columns — rename {sorted(dup)}"
        )
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    def sec(df: DataFrame, c: str):
        dt = df.schema[c].dataType.simpleString()
        col = F.col(c)
        if dt.startswith("timestamp"):
            return col.cast("timestamp").cast("long")
        return F.floor(col).cast("long")

    def buckets(df: DataFrame, s: str, e: str) -> DataFrame:
        b0 = F.floor(sec(df, s) / bucket_width).cast("long")
        b1 = F.floor(sec(df, e) / bucket_width).cast("long")
        # the guard must FEED the bucket expression — a free-standing
        # assert column is elided by column pruning, and a
        # when(assert.isNull(), b1).otherwise(b1) collapses because both
        # branches are identical (SimplifyConditionals). raise_error in
        # the otherwise keeps the branches distinct, so the check
        # survives optimization and fires BEFORE the explode can OOM.
        b1_checked = F.when(
            b1 - b0 < F.lit(max_span_buckets), b1
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"interval spans >= {max_span_buckets} buckets — raise "
                    "bucket_width (shuffle volume is rows x buckets/interval)"
                )
            ).cast("long")
        )
        return df.withColumn("_b", F.explode(F.sequence(b0, b1_checked)))

    l_exp = buckets(left, left_start, left_end)
    r_exp = buckets(right, right_start, right_end)
    first_common = F.floor(
        F.greatest(sec(left, left_start), sec(right, right_start))
        / bucket_width
    ).cast("long")
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    return (
        l_exp.join(r_exp, on + ["_b"], "inner")
        .filter((F.col("_b") == first_common) & overlap)
        .drop("_b")
    )
