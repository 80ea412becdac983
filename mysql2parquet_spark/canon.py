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

__all__ = ["type_class", "norm_cell", "canon", "column_type_classes"]


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


def column_type_classes(rows, colnames) -> dict[str, set]:
    """Observed non-null type classes per column name."""
    out: dict[str, set] = {c: set() for c in colnames}
    for r in rows:
        for c, v in zip(colnames, r):
            tc = type_class(v)
            if tc != "null":
                out[c].add(tc)
    return out
