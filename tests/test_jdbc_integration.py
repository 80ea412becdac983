"""Real JDBC integration without a MySQL server: Spark ships embedded
Derby, so the A2/A3 source path (connection, partitioned range reads,
predicate pushdown, round-trip fidelity) runs against an actual JDBC
database. The `query=` full-pushdown option itself needs a dialect with
bare derived-table aliases (MySQL/Postgres) — Derby rejects Spark's
`(...) SPARK_GEN_SUBQ_0` wrapping — so that path runs end-to-end against
DuckDB's JDBC driver instead (test_jdbc_query_pushdown.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, sf_dir, tmp_path_factory):
    url = f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    (
        orders.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "orders")
        .option("driver", DRIVER)
        # generic dialect maps StringType to CLOB, which Derby can't
        # compare against literals (breaks pushdown) — pin VARCHAR
        .option("createTableColumnTypes", "o_orderstatus VARCHAR(8)")
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_roundtrip_values(spark, sf_dir, derby_url):
    back = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "orders")
        .option("driver", DRIVER)
        .load()
    )
    want = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    assert back.count() == want.count()
    got_sum = back.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s")
    ).first().s
    want_sum = want.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s")
    ).first().s
    assert got_sum == want_sum


def test_jdbc_partitioned_read(spark, sf_dir, derby_url):
    """The reference reads through ONE cursor (main.go:87-110); our
    partitioned read splits the key range across parallel cursors."""
    hi = (
        load_table(spark, sf_dir, "orders")
        .agg(F.max("o_orderkey"))
        .first()[0]
    )
    part = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "orders")
        .option("driver", DRIVER)
        .option("partitionColumn", "o_orderkey")
        .option("lowerBound", "0")
        .option("upperBound", str(hi + 1))
        .option("numPartitions", "4")
        .load()
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == load_table(spark, sf_dir, "orders").count()


def test_jdbc_filter_pushdown(spark, derby_url):
    df = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "orders")
        .option("driver", DRIVER)
        .load()
        .filter(F.col("o_orderstatus") == "F")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderstatus" in plan.split(
        "PushedFilters"
    )[1][:200]
    assert df.count() > 0
