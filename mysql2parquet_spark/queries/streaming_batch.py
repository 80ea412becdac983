"""B30-B35 — the UDF surface and the batch-checkable faces of the
streaming operators.

Structured Streaming transformations are identical expressions over an
unbounded table, so each streaming operator is declared here over the
batch ``events`` table with a DuckDB oracle; the SAME builders run under
``readStream`` in mysql2parquet_spark/streaming/ with watermarks, tested
via the in-memory sink in tests/test_streaming.py (no oracle possible
there — SURVEY.md §5.2).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.queries import register
from mysql2parquet_spark.streaming.windows import (
    session_stats_per_user,
    sliding_counts,
    stateful_dedup_batch,
    tumbling_counts,
)


def T(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "stream_tumbling_batch",
    """
    SELECT strftime(time_bucket(INTERVAL '10 minutes', ts),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    "B32: tumbling window aggregation — window() over the batch table; "
    "identical expression runs under readStream with a watermark.",
)
def stream_tumbling_batch(spark, sf_dir):
    return tumbling_counts(T(spark, sf_dir, "events"), "10 minutes")


@register(
    "stream_sliding_batch",
    """
    WITH buckets AS (
      SELECT time_bucket(INTERVAL '10 minutes', ts) AS w, event_type, value
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '10 minutes', ts, INTERVAL '5 minutes') AS w,
             event_type, value
      FROM events
    )
    SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM buckets GROUP BY 1, 2
    """,
    "B32: sliding window (10 min window, 5 min slide) — every event lands "
    "in two windows; oracle materializes both phase-shifted bucketings.",
)
def stream_sliding_batch(spark, sf_dir):
    return sliding_counts(T(spark, sf_dir, "events"), "10 minutes", "5 minutes")


@register(
    "stream_session_batch",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '60 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           COUNT(DISTINCT session_id) AS n_sessions,
           CAST(MAX(cnt) AS BIGINT) AS max_session_events
    FROM (SELECT user_id, session_id, COUNT(*) AS cnt, SUM(value) AS sv
          FROM sessions GROUP BY user_id, session_id)
    GROUP BY user_id
    """,
    "B33: session windows (60-min gap) — session_window() on Spark; the "
    "oracle reconstructs sessions via the classic lag/cumsum idiom.",
)
def stream_session_batch(spark, sf_dir):
    return session_stats_per_user(T(spark, sf_dir, "events"), "60 minutes")


@register(
    "stream_dedup_batch",
    """
    SELECT user_id, event_type, event_id AS first_event_id FROM (
      SELECT user_id, event_type, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    "B35: stateful dedup — batch face of dropDuplicates-with-watermark; "
    "deterministic first-event keeper (min event_id).",
)
def stream_dedup_batch(spark, sf_dir):
    return stateful_dedup_batch(T(spark, sf_dir, "events"))


@register(
    "stream_rollup_batch",
    """
    WITH fine AS (
      SELECT time_bucket(INTERVAL '10 minutes', ts) AS w, event_type,
             COUNT(*) AS cnt, SUM(CAST(value AS DECIMAL(18,2))) AS sum_dec
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(time_bucket(INTERVAL '1 hour', w), '%Y-%m-%d %H:%M:%S')
             AS hour_start,
           event_type,
           CAST(SUM(cnt) AS BIGINT) AS cnt,
           CAST(SUM(sum_dec) AS DOUBLE) AS sum_value
    FROM fine GROUP BY 1, 2
    """,
    "B32/B34: chained windowed rollup — 10-min tumbling aggregates "
    "re-aggregated hourly (two stateful operators in one streaming "
    "query, watermark propagated through the first; hypertable-style "
    "multi-resolution serving). Decimal re-aggregation keeps hourly "
    "sums exact.",
)
def stream_rollup_batch(spark, sf_dir):
    from mysql2parquet_spark.streaming.windows import hourly_rollup

    return hourly_rollup(T(spark, sf_dir, "events"))


@register(
    "stream_enrich_batch",
    """
    SELECT strftime(time_bucket(INTERVAL '10 minutes', e.ts),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           c.c_mktsegment AS segment,
           e.event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2, 3
    """,
    "B31: stream-static enrichment — facts joined to a BROADCAST "
    "dimension (stateless per micro-batch, no watermark/state), then "
    "tumbling-window counts per market segment. Identical expression "
    "runs under readStream (tests/test_streaming.py).",
)
def stream_enrich_batch(spark, sf_dir):
    from mysql2parquet_spark.streaming.windows import enriched_segment_counts

    return enriched_segment_counts(
        T(spark, sf_dir, "events"),
        T(spark, sf_dir, "customer"),
        "10 minutes",
    )


# --------------------------------------------------------------------------
# B30 — UDF surface
# --------------------------------------------------------------------------

@register(
    "udf_pandas",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue_udf
    FROM lineitem WHERE l_quantity >= 45
    """,
    "B30: vectorized scalar pandas UDF (Arrow batches) — identical IEEE "
    "double arithmetic as the SQL oracle, proving the Python fast path "
    "is value-exact.",
)
def udf_pandas(spark, sf_dir):
    @pandas_udf(DoubleType())
    def revenue(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    li = T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue("l_extendedprice", "l_discount").alias("revenue_udf"),
    )


@register(
    "udf_grouped",
    """
    SELECT user_id, event_id,
           ROUND((value - AVG(value) OVER (PARTITION BY user_id))
                 / NULLIF(STDDEV_SAMP(value) OVER (PARTITION BY user_id), 0), 2)
             + 0 AS zscore
    FROM events
    """,
    "B30: grouped-map applyInPandas (per-group normalization) — the "
    "custom-operator escape hatch; oracle is the window-function form.",
)
def udf_grouped(spark, sf_dir):
    e = T(spark, sf_dir, "events").select("user_id", "event_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)
        z = (pdf["value"] - pdf["value"].mean()) / std if std and std > 0 else None
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "zscore": (
                    z.round(2) + 0.0
                    if z is not None
                    else pd.Series([None] * len(pdf))
                ),
            }
        )

    return e.groupBy("user_id").applyInPandas(
        zscore, "user_id bigint, event_id bigint, zscore double"
    )
