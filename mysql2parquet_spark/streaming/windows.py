"""Shared window/session/dedup builders — one definition, two execution
modes. Each function takes any DataFrame with (ts, user_id, event_type,
event_id, value) columns; pass a batch table for oracle checks or a
streaming source (after ``withWatermark``) for incremental execution.

Window starts are emitted as formatted strings so batch results are
hash-comparable with a DuckDB oracle (timestamps stringify identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.dedup import exact_dedup

_FMT = "yyyy-MM-dd HH:mm:ss"


def _dsum_value() -> F.Column:
    """Exact decimal sum of the 2-dp ``value`` column → double (order-
    independent, reproducible across engines and cluster sizes)."""
    return F.sum(F.col("value").cast("decimal(18,2)")).cast("double")


def tumbling_counts(events: DataFrame, width: str) -> DataFrame:
    """Tumbling-window count/sum per event_type (B32).

    Streaming: incremental state per (window, type); with a watermark the
    state is bounded and windows finalize. Batch: plain hash agg.
    """
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            _dsum_value().alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def hourly_rollup(events: DataFrame, fine: str = "10 minutes") -> DataFrame:
    """CHAINED windowed aggregation (hypertable-style rollup): fine
    tumbling windows re-aggregated into hourly buckets — two stateful
    operators in one streaming query (supported since Spark 3.5: the
    engine propagates the watermark through the first aggregate when
    both group on aligned event-time windows).

    The fine aggregate does the heavy lifting incrementally (state per
    10-min window × type); the hourly layer then sums a 6-row-per-hour
    stream — the standard cost shape for serving multiple rollup
    resolutions off one pipeline without re-reading the source. Decimal
    re-aggregation keeps the hourly sums exact. Streaming requires
    append mode + a watermark on ``ts`` (test harness supplies it);
    batch runs as-is for the oracle face.
    """
    fine_agg = events.groupBy(
        F.window("ts", fine).alias("w"), "event_type"
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
    )
    # Re-window on the window STRUCT itself (not w.start): the struct
    # carries the event-time marker forward, which is what lets the
    # second stateful aggregate accept the watermark in streaming mode.
    return (
        fine_agg.groupBy(
            F.window(F.col("w"), "1 hour").alias("h"), "event_type"
        )
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_dec").cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("h.start", _FMT).alias("hour_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, width: str, slide: str) -> DataFrame:
    """Sliding-window count/sum per event_type (B32) — each event belongs
    to width/slide windows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            _dsum_value().alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def session_windows(events: DataFrame, gap: str) -> DataFrame:
    """Per-(user, session) aggregate using session_window (B33): a session
    closes after ``gap`` of inactivity."""
    return events.groupBy(
        F.session_window("ts", gap).alias("sw"), "user_id"
    ).agg(
        F.count("*").alias("cnt"),
        _dsum_value().alias("sum_value"),
    )


def session_stats_per_user(events: DataFrame, gap: str) -> DataFrame:
    """Session stats rolled up per user: number of sessions and the size
    of the largest one. Batch-oracle-checkable (the oracle rebuilds
    sessions with the lag/cumsum idiom)."""
    s = session_windows(events, gap)
    return s.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("cnt").alias("max_session_events"),
    )


def stateful_dedup_batch(events: DataFrame) -> DataFrame:
    """Batch face of streaming dedup (B35): one row per (user_id,
    event_type), keeping the earliest event_id. The streaming face is
    ``streaming_dedup`` below."""
    kept = exact_dedup(
        events.select("user_id", "event_type", "event_id"),
        ["user_id", "event_type"],
        "event_id",
    )
    return kept.select(
        "user_id", "event_type", F.col("event_id").alias("first_event_id")
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup with bounded state: dropDuplicates within the
    watermark horizon. (Streaming keeps the FIRST arrival; the batch
    face above pins the same semantics to min event_id so it is
    deterministic and oracle-checkable.)"""
    return events.withWatermark("ts", watermark).dropDuplicates(
        ["user_id", "event_type"]
    )


def purchase_view_interval_join(
    purchases: DataFrame,
    views: DataFrame,
    *,
    max_gap: str = "2 hours",
    purchase_watermark: str = "1 hour",
    view_watermark: str = "3 hours",
) -> DataFrame:
    """Stream-stream interval join (B31/B34): each purchase joined to the
    views of the same user within the preceding ``max_gap``.

    In streaming mode both sides MUST carry watermarks — the view-side
    watermark plus the interval bound lets Spark expire buffered view
    state (otherwise the join buffers forever). The same expression runs
    on batch DataFrames for oracle-style equivalence checks.

    Disorder semantics are pinned by ``tests/test_stream_join.py``:
    in-order replay loses nothing (multibatch test), out-of-order replay
    with watermarks exceeding the disorder loses nothing (zero-loss
    test), and under-sized watermarks drop EXACTLY the late arrivals —
    never pre-watermark state, never spurious pairs (loss-accounting
    test). File-source replay order follows part-file mtimes, so the
    tests stamp mtimes explicitly rather than assuming write order.
    """
    p = purchases.select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    v = views.select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    if p.isStreaming:
        p = p.withWatermark("p_ts", purchase_watermark)
        v = v.withWatermark("v_ts", view_watermark)
    return p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {max_gap}")),
        "inner",
    ).select("p_id", "p_user", "v_id")


def enrich_with_dimension(
    facts: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_cols: tuple[str, ...] = ("c_mktsegment",),
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join (B31): attach slowly-changing
    dimension attributes to a fact stream.

    With ``broadcast_dim=True`` (default) the dimension side carries an
    explicit ``broadcast`` hint — stream-static joins with a broadcast
    static side are STATELESS (no watermark needed, no join state to
    expire): each micro-batch hash-probes the broadcast table map-side,
    and the alternative (shuffled stream-static join) re-shuffles every
    micro-batch on the key. The hint is a CONTRACT that the projected
    dim (dim_key + dim_cols) fits in executor memory; for a dimension
    that grows with the fact population (hundreds of millions of users
    at 100 TB) pass ``broadcast_dim=False`` and let Catalyst/AQE pick
    the strategy instead — a forced hint there is an executor OOM AQE
    cannot override. Left join keeps facts with no dimension row (NULL
    attributes), matching warehouse enrichment semantics. The same
    expression runs on a batch ``facts`` table for oracle checks.
    """
    d = dim.select(F.col(dim_key).alias(fact_key), *dim_cols)
    if broadcast_dim:
        d = F.broadcast(d)
    return facts.join(d, on=fact_key, how=how)


def enriched_segment_counts(
    facts: DataFrame, dim: DataFrame, width: str
) -> DataFrame:
    """Tumbling-window activity per customer market segment — the
    composed stream-static-enrich → windowed-agg pipeline. Unmatched
    facts aggregate under a NULL segment (kept deliberately: silent
    inner-join drops hide dimension gaps at scale)."""
    e = enrich_with_dimension(facts, dim)
    return (
        e.groupBy(
            F.window("ts", width).alias("w"),
            F.col("c_mktsegment").alias("segment"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"), _dsum_value().alias("sum_value"))
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "segment",
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def running_value_per_user(events: DataFrame) -> DataFrame:
    """Batch analytic used in tests: cumulative value per user (B18 over
    the events shape)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )
