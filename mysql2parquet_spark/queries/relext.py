"""Relational-surface extensions (round-1 widening pass).

MySQL 8 accepts every shape here through the reference's raw-query
passthrough (/root/reference/main.go:106), so each needs a native Spark
owner: FULL OUTER JOIN, GROUP BY GROUPING SETS, scalar subqueries, and
the distribution window functions (PERCENT_RANK / CUME_DIST).

Scale notes inline: full outer joins shuffle both sides on the key (no
broadcast path exists for FULL OUTER — Spark would lose unmatched rows
of the streamed side), grouping sets expand to one aggregate per set
with a single shuffle via Expand, and the scalar subquery becomes a
1-row broadcast so the big side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.queries import register


def T(spark: SparkSession, sf_dir: str, name: str):
    return load_table(spark, sf_dir, name)


@register(
    "join_full",
    """
    WITH urgent AS (
      SELECT o_custkey, COUNT(*) AS urgent_cnt
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
    ),
    finished AS (
      SELECT o_custkey, COUNT(*) AS f_cnt
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    )
    SELECT COALESCE(u.o_custkey, f.o_custkey) AS custkey,
           COALESCE(urgent_cnt, 0) AS urgent_cnt,
           COALESCE(f_cnt, 0) AS f_cnt
    FROM urgent u FULL OUTER JOIN finished f ON u.o_custkey = f.o_custkey
    """,
    "B6-B11 completion: FULL OUTER JOIN — unmatched rows survive on BOTH "
    "sides (customers with only urgent orders, customers with only "
    "finished orders). Shuffle-hash/sort-merge on the key; both inputs "
    "are pre-aggregated so the join sees one row per key (no skew).",
)
def join_full(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("urgent_cnt"))
    )
    finished = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("f_cnt"))
    )
    u, f = urgent.alias("u"), finished.alias("f")
    return f.join(
        u, F.col("u.o_custkey") == F.col("f.o_custkey"), "full_outer"
    ).select(
        F.coalesce("u.o_custkey", "f.o_custkey").alias("custkey"),
        F.coalesce("urgent_cnt", F.lit(0)).alias("urgent_cnt"),
        F.coalesce("f_cnt", F.lit(0)).alias("f_cnt"),
    )


@register(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    "B13 completion: GROUP BY GROUPING SETS — arbitrary set list (not "
    "just the rollup/cube lattices), disambiguated by GROUPING() flags. "
    "Spark plans ONE Expand + one shuffled aggregate, so n sets cost one "
    "pass over the input, not n.",
)
def agg_grouping_sets(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


@register(
    "subquery_scalar",
    """
    SELECT c_custkey, c_name,
           CAST(CAST(c_acctbal AS DECIMAL(18,2))
                - (SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2))
                   FROM customer) AS DOUBLE) AS above_avg
    FROM customer
    WHERE c_acctbal > (SELECT AVG(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer)
    """,
    "B29 completion: uncorrelated scalar subquery in WHERE and SELECT — "
    "the aggregate reduces to ONE row, broadcast to every partition of "
    "the outer scan; the big side never shuffles. Decimal avg keeps the "
    "threshold bit-identical across engines.",
)
def subquery_scalar(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    avg1 = c.agg(
        F.avg(bal).alias("avg_bal"),
        F.avg(bal).cast("decimal(18,2)").alias("avg_bal_2dp"),
    )
    return (
        c.join(F.broadcast(avg1))
        .filter(bal > F.col("avg_bal"))
        .select(
            "c_custkey",
            "c_name",
            (bal - F.col("avg_bal_2dp")).cast("double").alias("above_avg"),
        )
    )


@register(
    "window_percent",
    """
    SELECT o_orderkey, o_custkey,
           ROUND(PERCENT_RANK() OVER
                 (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey), 6)
             AS pct_rank,
           ROUND(CUME_DIST() OVER
                 (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey), 6)
             AS cume
    FROM orders
    """,
    "B16-B18 completion: distribution window functions (PERCENT_RANK, "
    "CUME_DIST) — exact rational ranks, deterministic via the unique "
    "o_orderkey tie-break; one shuffle on the partition key, both "
    "functions share a single Window operator.",
)
def window_percent(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
