"""End-to-end test of the `query=` FULL-pushdown JDBC path (reference
main.go:106 — ``db.Query(*fQuery)`` verbatim) against a real SQL engine.

Derby can't run this path (it rejects Spark's bare ``(...) SPARK_GEN_SUBQ``
derived-table alias), but the DuckDB JDBC driver — present in the local
coursier cache, same 1.0.0 storage format as the python module — accepts
MySQL/Postgres-style bare aliases, so the exact Spark mechanics (schema
probe ``SELECT * FROM (q) SPARK_GEN_SUBQ_0 WHERE 1=0`` + the aliased data
read) run for real. The driver jar must be on the JVM classpath at
startup, so the session runs in a subprocess. Skips if the jar is absent.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

_JAR_GLOB = os.path.expanduser("~/.cache/coursier/**/duckdb_jdbc*.jar")


def _find_jar() -> str | None:
    hits = sorted(glob.glob(_JAR_GLOB, recursive=True))
    return hits[-1] if hits else None


_SCRIPT = r"""
import sys

jar, sf_dir, db_path = sys.argv[1:4]
sys.path.insert(0, ".")

import duckdb

con = duckdb.connect(db_path)
con.execute(
    "CREATE TABLE orders AS SELECT o_orderkey, o_custkey, o_totalprice, "
    f"o_orderstatus FROM read_parquet('{sf_dir}/orders.parquet')"
)
con.close()

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table, read_jdbc

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.jars", jar)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
url = f"jdbc:duckdb:{db_path}"
orders = load_table(spark, sf_dir, "orders")

# The reference contract: the user's SQL goes to the engine VERBATIM and
# the engine computes it — filter, aggregate, and all (main.go:106).
q = (
    "SELECT o_orderstatus, COUNT(*) AS cnt, "
    "CAST(SUM(o_totalprice) AS DOUBLE) AS total "
    "FROM orders WHERE o_totalprice > 1000 GROUP BY o_orderstatus"
)
got = {
    r.o_orderstatus: (r.cnt, round(float(r.total), 2))
    for r in read_jdbc(spark, url, query=q, driver="org.duckdb.DuckDBDriver").collect()
}
want = {
    r.o_orderstatus: (r.cnt, round(float(r.total), 2))
    for r in orders.filter(F.col("o_totalprice") > 1000)
    .groupBy("o_orderstatus")
    .agg(F.count("*").alias("cnt"), F.sum("o_totalprice").alias("total"))
    .collect()
}
assert got == want, (got, want)

# sessionInitStatement: the reference's documented SET prelude
# (main.go:41-47) must execute on the session before the query runs.
one = read_jdbc(
    spark,
    url,
    query="SELECT COUNT(*) AS n FROM orders",
    session_init="SET threads=1",
    driver="org.duckdb.DuckDBDriver",
).first()
assert one.n == orders.count()

print("QUERY_PUSHDOWN_OK")
spark.stop()
"""


@pytest.mark.skipif(_find_jar() is None, reason="duckdb_jdbc jar not cached")
def test_query_option_full_pushdown_end_to_end(sf_dir, tmp_path):
    jar = _find_jar()
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, jar, sf_dir, str(tmp_path / "q.duckdb")],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "QUERY_PUSHDOWN_OK" in proc.stdout
