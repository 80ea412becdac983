"""MySQL-dialect contract, pinned WITHOUT a live server (the sandbox has
none — documented limitation): (1) the exact option map our io layer
hands Spark's jdbc source for MySQL URLs, and (2) the exact SQL strings
Spark's MySQLDialect generates on connect. A future live-MySQL run
depends on precisely these; if an upgrade or refactor changes any of
them, this test names the drift."""

from __future__ import annotations

import pytest

from mysql2parquet_spark.io import MYSQL_DRIVER_CLASS, jdbc_options

MYSQL_URL = "jdbc:mysql://db.example:3306/shop"


def test_table_read_option_matrix():
    opts = jdbc_options(MYSQL_URL, table="users", user="u", password="p")
    assert opts == {
        "url": MYSQL_URL,
        "user": "u",
        "password": "p",
        "fetchsize": "10000",
        "driver": MYSQL_DRIVER_CLASS,  # pinned, not driver-manager-scanned
        "dbtable": "users",
    }


def test_query_pushdown_with_set_prelude_option_matrix():
    """The reference's contract: raw SQL verbatim (main.go:106) plus the
    SET session prelude (main.go:41-47) -> query + sessionInitStatement."""
    opts = jdbc_options(
        MYSQL_URL,
        query="SELECT id, name FROM users WHERE active = 1",
        session_init="SET SESSION net_read_timeout=600",
    )
    assert opts["query"] == "SELECT id, name FROM users WHERE active = 1"
    assert opts["sessionInitStatement"] == "SET SESSION net_read_timeout=600"
    assert "dbtable" not in opts
    assert opts["driver"] == MYSQL_DRIVER_CLASS


def test_partitioned_cursor_option_matrix():
    opts = jdbc_options(
        MYSQL_URL,
        table="orders",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=64,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "64"


def test_non_mysql_url_gets_no_driver_inference():
    opts = jdbc_options("jdbc:derby:memory:testdb", table="t")
    assert "driver" not in opts


def test_explicit_driver_wins_over_inference():
    opts = jdbc_options(MYSQL_URL, table="t", driver="org.example.Driver")
    assert opts["driver"] == "org.example.Driver"


def test_query_and_table_are_exclusive():
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_options(MYSQL_URL)
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_options(MYSQL_URL, query="SELECT 1", table="t")
    with pytest.raises(ValueError, match="partitioned"):
        jdbc_options(MYSQL_URL, query="SELECT 1", partition_column="id")


def test_spark_mysql_dialect_generated_sql(spark):
    """Pin the SQL Spark's MySQLDialect itself emits — identifier
    quoting and the probe queries sent on connect. These are the exact
    strings a live server would receive."""
    dialects = spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects
    d = dialects.get(MYSQL_URL)
    assert "MySQLDialect" in d.getClass().getName()
    assert d.quoteIdentifier("col") == "`col`"
    assert d.quoteIdentifier("we`ird") == "`we``ird`"
    # Spark 4.x MySQLDialect probes existence with WHERE 1=0, not LIMIT 1
    assert (
        d.getTableExistsQuery("shop.users")
        == "SELECT 1 FROM shop.users WHERE 1=0"
    )
    assert (
        d.getSchemaQuery("shop.users") == "SELECT * FROM shop.users WHERE 1=0"
    )
    assert d.getLimitClause(10) == "LIMIT 10"
    # Derby URL routes to a DIFFERENT dialect — the matrix really is per-URL
    assert "MySQL" not in dialects.get("jdbc:derby:memory:x").getClass().getName()
