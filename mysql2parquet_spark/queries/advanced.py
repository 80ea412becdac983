"""Advanced relational surface: as-of join (custom operator), recursive
CTEs (MySQL 8 WITH RECURSIVE parity — native in Spark 4), pivot, and the
remaining analytic window functions."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table, register_tables
from mysql2parquet_spark.operators.asof import asof_join
from mysql2parquet_spark.operators.dedup import exact_dedup
from mysql2parquet_spark.queries import register


def T(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "join_asof",
    """
    WITH views AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
           v.event_id AS view_event_id
    FROM purchases p
    ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    "Custom operator: backward as-of join (most recent prior view per "
    "purchase) — union + last-non-null window, ONE shuffle, no Python; "
    "oracle is DuckDB's native ASOF JOIN.",
)
def join_asof(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    views = exact_dedup(
        e.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "event_id"
        ),
        ["user_id", "ts"],
        "event_id",
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    res = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id"],
    )
    return res.select(
        "event_id",
        "user_id",
        F.date_format("ts_matched", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "view_ts"
        ),
        F.col("event_id_matched").alias("view_event_id"),
    )


_RECURSIVE_SQL = """
    WITH RECURSIVE seq(n) AS (
      SELECT 1
      UNION ALL
      SELECT n + 1 FROM seq WHERE n < 10
    )
    SELECT s.n AS bucket,
           CAST(COUNT(o_orderkey) AS BIGINT) AS order_cnt
    FROM seq s LEFT JOIN orders ON o_orderkey % 10 = s.n - 1
    GROUP BY s.n
"""


@register(
    "subquery_recursive",
    _RECURSIVE_SQL,
    "B29/MySQL-8 parity: WITH RECURSIVE (native in Spark 4) — the SAME "
    "SQL text runs on Spark SQL and DuckDB.",
)
def subquery_recursive(spark, sf_dir):
    register_tables(spark, sf_dir, only=["orders"])
    return spark.sql(_RECURSIVE_SQL)


@register(
    "agg_pivot",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS status_o
    FROM lineitem GROUP BY l_returnflag
    """,
    "B12: pivot (long→wide) — groupBy().pivot() with explicit values so "
    "the plan needs no extra value-discovery pass; oracle is the "
    "conditional-aggregation form.",
)
def agg_pivot(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .count()
    )
    return out.select(
        "l_returnflag",
        F.coalesce("F", F.lit(0)).alias("status_f"),
        F.coalesce("O", F.lit(0)).alias("status_o"),
    )


@register(
    "window_analytic",
    """
    SELECT o_orderkey, o_custkey,
           ROUND(FIRST_VALUE(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
             AS first_price,
           ROUND(LAST_VALUE(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS last_price,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS second_price,
           CAST(NTILE(4) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT)
             AS quartile
    FROM orders
    """,
    "B16/B17: FIRST/LAST/NTH_VALUE + NTILE — explicit full frames where "
    "the default running frame would change semantics.",
)
def window_analytic(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(wfull), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(wfull), 2).alias(
            "second_price"
        ),
        F.ntile(4).over(w).alias("quartile"),
    )
