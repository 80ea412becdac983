"""Local mirror of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle, compare row count, column names,
and an order-insensitive value hash (values stringified with float
normalization, rows sorted). Rows-only queries just assert they execute
and return a stable schema.
"""

from __future__ import annotations

import math

import pytest

from mysql2parquet_spark.queries import REGISTRY, _load

_load()


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = ["|".join(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


ORACLE_CASES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_CASES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, duck, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    rel = duck.execute(q.oracle)
    dcols = [c[0] for c in rel.description]
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    # A 0-row parity proves nothing (both engines agreeing on "nothing"
    # is vacuous — bit us in r2 with pipeline_curate's 0.5 quality gate).
    # Every oracled query must compare real values at the test SF.
    assert len(drows) > 0, f"{name}: oracle returned 0 rows — vacuous parity"
    sc = _canon([tuple(r) for r in srows], scols)
    dc = _canon(drows, dcols)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_executes(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
