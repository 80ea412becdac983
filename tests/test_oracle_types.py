"""Registry-wide oracle result-TYPE lint (VERDICT r6 ask #2).

The r6 red row (``quality_report``) was an ORACLE-side bug the value
mirror could not see: DuckDB promotes ``SUM(BIGINT)`` to HUGEINT, the
UNION ALL promoted the whole column, and the driver's Arrow export saw
decimal128(38,0) vs Spark's int64 — ``rows ✓ / schema ✓ / hash ✗``
while the local ``fetchall()`` path coerced HUGEINT→int and stayed
green. Two permanent guards close the class:

1. This lint BINDS every registered oracle (no execution — DuckDB
   resolves result types at plan time) and fails on any
   HUGEINT/UHUGEINT result column. The fix at the query site is
   ``CAST(... AS BIGINT)``.
2. The parity mirror and driver sim now fetch oracles through
   ``canon.fetch_oracle_arrow`` (the driver's own coercion path), so
   any FUTURE oracle-relation-type drift that Arrow exports differently
   than ``fetchall()`` coerces is a local hash mismatch, not a
   driver-only surprise.

A planted HUGEINT fixture keeps the lint itself honest.
"""

from __future__ import annotations

import pytest

from mysql2parquet_spark.canon import (
    fetch_oracle_arrow,
    lint_oracle_types,
    type_class,
)
from mysql2parquet_spark.queries import REGISTRY, _load

_load()

ORACLED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_binds_without_banned_types(duck, name):
    bad = lint_oracle_types(duck, REGISTRY[name].oracle)
    assert not bad, (
        f"{name}: oracle result carries driver-hostile types {bad} — "
        "DuckDB HUGEINT Arrow-exports as decimal128(38,0), which can "
        "only hash-FAIL against any Spark integer column. CAST the "
        "aggregate to BIGINT in the oracle SQL."
    )


def test_lint_catches_planted_hugeint(duck):
    """SUM over BIGINT is the exact promotion that produced the r6 red
    row; the lint must flag it, and must pass the cast-fixed form."""
    bad = lint_oracle_types(
        duck, "SELECT SUM(o_orderkey) AS s FROM orders"
    )
    assert bad and "HUGEINT" in bad[0]
    assert not lint_oracle_types(
        duck, "SELECT CAST(SUM(o_orderkey) AS BIGINT) AS s FROM orders"
    )


def test_arrow_fetch_sees_hugeint_as_decimal(duck):
    """The coercion-blindness proof: fetchall() shows the planted
    HUGEINT as a plain int (invisible drift); the Arrow path the
    driver uses shows Decimal. The mirror/sim now use the Arrow path."""
    sql = "SELECT SUM(o_orderkey) AS s FROM orders"
    coerced = duck.execute(sql).fetchall()[0][0]
    assert type_class(coerced) == "int"  # the old blindness
    cols, rows = fetch_oracle_arrow(duck, sql)
    assert cols == ["s"]
    assert type_class(rows[0][0]) == "decimal"  # what the driver hashes
