"""Time-series resampling: gap-filled downsampling over event streams.

The hypertable-style operator family (continuous-aggregate rollups with
gap fill) re-expressed as plain DataFrame ops:

- ``resample_locf``: regularize an irregular event stream onto a fixed
  grid, forward-filling gaps with the last observation (LOCF) — the
  shape every dashboard / feature-store export needs ("value as of each
  hour", including hours with no events).
- ``ohlc``: open/high/low/close + count per bucket — the classic
  downsample that preserves intra-bucket extremes.

Both are exact and deterministic (intra-bucket order ties break on an
id column), so the whole output is oracle-checkable; values pass
through raw with no float arithmetic.

Scale shape: everything is keyed windows and aggregates — one exchange
on (key, bucket) for the intra-bucket rank/agg (the window and the
groupBy share the partitioning, so Catalyst plans ONE exchange), one
tiny per-key bounds agg, and the fill window runs over the GRID (slots
x keys — orders of magnitude smaller than the event stream). The grid
explode is per-key bounded metadata, never a driver-side loop; dense
grids (years of 1-second slots) scale linearly in output size, which is
the operator's contract, not a plan defect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNITS = {"minute": "1 minute", "hour": "1 hour", "day": "1 day"}


def _slot(ts_col: str, unit: str):
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}: {unit!r}")
    return F.date_trunc(unit, F.col(ts_col))


def resample_locf(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    unit: str = "hour",
) -> DataFrame:
    """Per key: one row per ``unit`` slot from the key's first to last
    observation, carrying the slot's CLOSING value (last by ``ts``,
    ``id_col`` tiebreak) forward across empty slots. Output columns:
    key cols, ``slot_start`` (formatted), ``n_obs`` (0 for gaps),
    ``value_locf``, ``gap_filled``."""
    keys = [F.col(c) for c in key_cols]
    ranked = df.select(
        *keys,
        _slot(ts_col, unit).alias("_slot"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(value_col).alias("_v"),
    ).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy(*key_cols, "_slot").orderBy(
                F.desc("_ts"), F.desc("_id")
            )
        ),
    )
    obs = ranked.groupBy(*key_cols, "_slot").agg(
        F.count(F.lit(1)).alias("_n"),
        F.max(F.when(F.col("_rn") == 1, F.col("_v"))).alias("_close"),
    )
    bounds = obs.groupBy(*key_cols).agg(
        F.min("_slot").alias("_lo"), F.max("_slot").alias("_hi")
    )
    grid = bounds.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {_UNITS[unit]}"))
        ).alias("_slot"),
    )
    joined = grid.join(obs, [*key_cols, "_slot"], "left")
    fill = (
        Window.partitionBy(*key_cols)
        .orderBy("_slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *key_cols,
        F.date_format("_slot", "yyyy-MM-dd HH:mm:ss").alias("slot_start"),
        F.coalesce(F.col("_n"), F.lit(0)).alias("n_obs"),
        F.last("_close", ignorenulls=True).over(fill).alias("value_locf"),
        (F.coalesce(F.col("_n"), F.lit(0)) == 0).alias("gap_filled"),
    )


def ohlc(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    unit: str = "hour",
) -> DataFrame:
    """Open/high/low/close downsample per (key, slot). Open = first
    value by (ts, id), close = last; high/low are plain extremes. Only
    observed slots appear (compose with ``resample_locf`` for gap
    semantics)."""
    keys = [F.col(c) for c in key_cols]
    base = df.select(
        *keys,
        _slot(ts_col, unit).alias("_slot"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(value_col).alias("_v"),
    )
    w = Window.partitionBy(*key_cols, "_slot")
    ranked = base.select(
        "*",
        F.row_number()
        .over(w.orderBy(F.asc("_ts"), F.asc("_id")))
        .alias("_rn_open"),
        F.row_number()
        .over(w.orderBy(F.desc("_ts"), F.desc("_id")))
        .alias("_rn_close"),
    )
    return (
        ranked.groupBy(*key_cols, "_slot")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.max(F.when(F.col("_rn_open") == 1, F.col("_v"))).alias("open"),
            F.max("_v").alias("high"),
            F.min("_v").alias("low"),
            F.max(F.when(F.col("_rn_close") == 1, F.col("_v"))).alias("close"),
        )
        .select(
            *key_cols,
            F.date_format("_slot", "yyyy-MM-dd HH:mm:ss").alias("slot_start"),
            "n_obs",
            "open",
            "high",
            "low",
            "close",
        )
    )
