"""Type-strict result canonicalizer shared by the local mirror
(``tests/test_oracle_parity.py``) and the pre-flight driver simulation
(``scripts/driver_sim.py``).

Mirrors the external driver's hashing behavior (VERDICT r4 ask #7 /
r5 "What's wrong" #2): cells are tagged with a type class before
hashing, so a Spark ``Decimal('1.50')`` never compares equal to a
DuckDB float ``1.5`` even though a ``str()`` round-trip would make
them identical — exactly the ``agg_salted`` shape drift the real
driver hash-FAILs. One implementation, two consumers: a strictness fix
here reaches both gates at once instead of curing the mirror and
leaving the sim blind (the r5 finding).
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

__all__ = [
    "type_class",
    "norm_cell",
    "canon",
    "column_type_classes",
    "fetch_oracle_arrow",
    "lint_oracle_types",
]


def type_class(v) -> str:
    """Coarse value-type class used for per-column shape comparison."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, Decimal):
        return "decimal"
    if isinstance(v, bytes):
        return "bytes"
    if isinstance(v, datetime.datetime):
        return "timestamp"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, (list, tuple)):
        return "list"
    return "str"


def norm_cell(v) -> str:
    """Type-tagged canonical form. The tag makes cross-type equality
    impossible: ``f:1.5`` never equals ``d:1.5`` — mirroring the
    driver's observed behavior of hashing a decimal column differently
    from a float column with identical values."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        s = f"{v:.6f}".rstrip("0").rstrip(".")
        return f"f:{s or '0'}"
    if isinstance(v, Decimal):
        # No str/float round-trip: normalize the exponent only, so
        # Decimal('1.50') == Decimal('1.5') but never equals float 1.5.
        return f"d:{v.normalize()}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"dt:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return f"s:{v}"


def canon(rows, colnames) -> list[str]:
    """Order-insensitive canonical row strings: columns sorted by name,
    rows sorted lexicographically — the driver's compare contract."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = ["|".join(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def fetch_oracle_arrow(con, sql: str):
    """Fetch a DuckDB oracle result THROUGH ARROW — the driver's path.

    ``fetchall()`` coerces DuckDB relation types before our type-tagged
    canonicalizer ever sees them: HUGEINT becomes a plain Python int and
    the drift is invisible locally, while the external driver exports the
    same relation via Arrow (HUGEINT → decimal128(38,0) → Decimal) and
    hash-FAILs against Spark's int64 — exactly the ``quality_report`` red
    row in CORRECTNESS_r06, the second round in a row a gate was cured
    one layer short of the driver. Fetching through ``.arrow()`` makes the
    mirror and the sim see the SAME value shapes the driver hashes, so
    the whole coercion-blindness class is closed rather than one symptom.

    Returns ``(colnames, rows)`` with rows as tuples of Python values in
    Arrow's (driver-faithful) coercion: decimal128 → Decimal, int64 →
    int, timestamp → datetime, list → list.
    """
    tbl = con.execute(sql).arrow()
    cols = list(tbl.column_names)
    pycols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = list(zip(*pycols)) if pycols else []
    return cols, rows


_BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")


def lint_oracle_types(con, sql: str) -> list[str]:
    """Bind (not execute) an oracle and return its offending result
    types: any HUGEINT/UHUGEINT column. DuckDB promotes ``SUM(BIGINT)``
    to HUGEINT, which Arrow-exports as decimal128(38,0) — a shape no
    Spark query produces, so such an oracle can only ever hash-FAIL at
    the driver. The fix at the query site is
    ``CAST(... AS BIGINT)`` (join_explosion / quality_report pattern)."""
    rel = con.sql(sql)
    bad = []
    for name, t in zip(rel.columns, rel.types):
        ts = str(t).upper()
        if any(b in ts for b in _BANNED_ORACLE_TYPES):
            bad.append(f"{name}: {ts}")
    return bad


def column_type_classes(rows, colnames) -> dict[str, set]:
    """Observed non-null type classes per column name."""
    out: dict[str, set] = {c: set() for c in colnames}
    for r in rows:
        for c, v in zip(colnames, r):
            tc = type_class(v)
            if tc != "null":
                out[c].add(tc)
    return out
