"""Local mirror of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle, compare row count, column names,
per-column value TYPE classes, and an order-insensitive value hash.
Rows-only queries just assert they execute and return a stable schema.

Strictness contract (VERDICT r4 ask #7): the old mirror stringified
cells, so a Spark ``Decimal('1.50')`` and a DuckDB ``1.5`` float could
compare equal here while the driver's canonicalizer hash-FAILed the
same query (``agg_salted``, CORRECTNESS_r04; ``embedding_quantize``'s
unhashable lists in r3 were the same blindness). Cells are now tagged
with a type class (int / float / decimal / str / bool / date /
timestamp / bytes / list) before hashing — decimals compare as
``Decimal`` with no str round-trip, and a float-vs-decimal or
int-vs-float column mismatch is a hard failure even when the numeric
values are identical. ``test_mirror_canonicalizer_is_type_strict``
plants exactly the agg_salted failure shape to keep this gate honest.

The canonicalizer itself lives in ``mysql2parquet_spark.canon`` so the
pre-flight sim (``scripts/driver_sim.py``) shares the EXACT same code
path — VERDICT r5 found the sim still stringifying after the mirror
was cured, which is the one divergence this layout makes impossible.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from mysql2parquet_spark.canon import (
    canon as _canon,
    column_type_classes as _column_type_classes,
    fetch_oracle_arrow as _fetch_oracle_arrow,
    norm_cell as _norm_cell,
)
from mysql2parquet_spark.queries import REGISTRY, _load

_load()


ORACLE_CASES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_CASES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, duck, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    # Arrow fetch, not fetchall(): fetchall coerces HUGEINT→int and hides
    # the oracle-type drift the driver hash-FAILs (quality_report, r6).
    dcols, drows = _fetch_oracle_arrow(duck, q.oracle)

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    # A 0-row parity proves nothing (both engines agreeing on "nothing"
    # is vacuous — bit us in r2 with pipeline_curate's 0.5 quality gate).
    # Every oracled query must compare real values at the test SF.
    assert len(drows) > 0, f"{name}: oracle returned 0 rows — vacuous parity"
    # Pairwise dtype gate: every column must carry the same value type
    # class on both engines (shape bugs die here, before the hash).
    stypes = _column_type_classes([tuple(r) for r in srows], scols)
    dtypes = _column_type_classes(drows, dcols)
    type_mismatch = {
        c: (sorted(stypes[c]), sorted(dtypes[c]))
        for c in scols
        if stypes[c] != dtypes[c]
    }
    assert not type_mismatch, (
        f"{name}: per-column value-type classes differ "
        f"(spark, duckdb): {type_mismatch}"
    )
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


def test_mirror_canonicalizer_is_type_strict():
    """Plant the exact agg_salted r4 failure: bit-identical money values,
    one side Decimal, the other float. The old stringifying mirror
    passed this; the driver did not. The mirror must now flag it."""
    spark_like = [("F", Decimal("1233170551.74"))]
    oracle_like = [("F", 1233170551.74)]
    cols = ["o_orderstatus", "total"]
    st = _column_type_classes(spark_like, cols)
    dt = _column_type_classes(oracle_like, cols)
    assert st["total"] != dt["total"], (
        "mirror failed to distinguish Decimal from float — the r4 "
        "agg_salted blindness is back"
    )
    assert _canon(spark_like, cols) != _canon(oracle_like, cols)
    # And identical shapes still pass, exponent-insensitively.
    assert _norm_cell(Decimal("1.50")) == _norm_cell(Decimal("1.5"))
    assert _norm_cell(1.50) == _norm_cell(1.5)
    # int vs float is likewise a shape difference, not an equality.
    assert _norm_cell(5) != _norm_cell(5.0)
