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
