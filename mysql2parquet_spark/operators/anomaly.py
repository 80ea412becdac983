"""Anomaly flagging over event streams — the monitoring half of the
nightly pipeline (drift says "the distribution moved"; this says
"these specific rows/windows are outliers").

Two detectors, both single-shuffle window plans (one exchange on the
partition key, then sorted frames — the B16-B18 execution shape, so
the 100 TB behavior is already pinned by the window-family plan tests):

- ``rolling_zscore``: per-key rolling mean/stddev over the trailing N
  rows (the row itself EXCLUDED from its own baseline — a spike must
  not dilute the statistics that judge it), flag |z| above a
  threshold. Frames are ROWS-bounded so the state per key is O(N).
- ``window_count_anomaly``: tumbling-window event counts per key,
  flagged against the key's own trailing-window history — volume
  spikes/droughts rather than value outliers. Composes the B32
  windowed-agg shape with a ROWS frame over the per-window counts
  (two shuffles total: one for the count agg, one for the history
  window).

Both emit the baseline (mean/stddev) beside the flag so a consumer can
rank by severity; both are deterministic (no sampling, no RNG) and
null-safe (a NULL value is never an anomaly — it is a quality-rule
matter, ``operators/constraints.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    order_col: str,
    *,
    lookback: int = 50,
    min_history: int = 10,
    threshold: float = 3.0,
    round_to: int = 4,
) -> DataFrame:
    """Per-key rolling z-score outlier flags.

    For each row: baseline mean/stddev over the previous ``lookback``
    rows of its key (ROWS BETWEEN lookback PRECEDING AND 1 PRECEDING —
    the current row never contributes to its own baseline). Rows with
    fewer than ``min_history`` prior observations carry a NULL z and
    are never flagged (a 3-row history cannot indict anything);
    zero-stddev baselines likewise yield NULL z (a first deviation
    from a constant series is flagged by ``is_anomaly`` only via the
    explicit constant-break rule below — comparing against 0 stddev is
    division noise, not evidence).

    Output: input columns + ``base_mean, base_std, zscore, is_anomaly``.
    ``is_anomaly`` is true when |z| >= threshold, or when the baseline
    is constant (std = 0, full min_history) and the value differs from
    it. One shuffle on the key; state per key is O(lookback).

    SCALE NOTE — key cardinality is the parallelism: each key's series
    sorts and scans inside one task (per-key ordered processing is
    inherently sequential), and Spark recomputes bounded-frame
    aggregates per row (O(lookback) per row — stddev has no retractable
    form). Right-sized uses are high-cardinality keys (per-user,
    per-device) or PRE-AGGREGATED series; for raw low-cardinality
    telemetry, reduce first — ``window_count_anomaly`` turns a 100 TB
    event firehose into a |keys| × |windows| series before any frame
    runs.
    """
    if lookback < 2 or min_history < 2 or min_history > lookback:
        raise ValueError(
            f"need 2 <= min_history <= lookback, got "
            f"min_history={min_history} lookback={lookback}"
        )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col)
    n_hist = F.count(v).over(w)
    mean = F.avg(v).over(w)
    # population stddev of the BASELINE window (the baseline is the
    # whole population being compared against, not a sample of one)
    std = F.coalesce(F.stddev_pop(v).over(w), F.lit(0.0))
    enough = n_hist >= F.lit(min_history)
    z = F.when(
        enough & (std > 0) & v.isNotNull(), (v - mean) / std
    )
    constant_break = (
        enough & (std == 0) & v.isNotNull() & (v != mean)
    )
    return (
        df.withColumn("base_mean", F.round(F.when(enough, mean), round_to))
        .withColumn("base_std", F.round(F.when(enough, std), round_to))
        .withColumn("zscore", F.round(z, round_to))
        .withColumn(
            "is_anomaly",
            F.coalesce(
                (F.abs(z) >= F.lit(threshold)) | constant_break, F.lit(False)
            ),
        )
    )


def window_count_anomaly(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    window: str = "1 hour",
    lookback: int = 24,
    min_history: int = 6,
    threshold: float = 3.0,
    round_to: int = 4,
) -> DataFrame:
    """Volume anomalies: tumbling-window event counts per key, each
    window z-scored against the key's previous ``lookback`` windows
    (PRESENT windows only — an empty window produces no row, so a
    drought shows up as the NEXT window's baseline shift; a stricter
    gap-filling variant belongs to the streaming layer where the clock
    is explicit).

    Output: ``key…, window_start, n_events, base_mean, base_std,
    zscore, is_anomaly``. Two exchanges: the count aggregation and the
    history window — both keyed, both skew-tolerant (a hot key's
    history frame is still O(lookback))."""
    counts = (
        df.groupBy(*key_cols, F.window(ts_col, window).alias("_w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *key_cols,
            F.col("_w.start").alias("window_start"),
            "n_events",
        )
    )
    flagged = rolling_zscore(
        counts,
        "n_events",
        key_cols,
        "window_start",
        lookback=lookback,
        min_history=min_history,
        threshold=threshold,
        round_to=round_to,
    )
    return flagged
