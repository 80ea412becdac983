"""Vector math over ``array<float>`` columns with built-in higher-order
functions — stays in the JVM (Tungsten), no Python boundary, scales to any
row count because it is a per-row projection (no shuffle).

Accumulation is in DOUBLE (each float element cast before multiply/add,
left-to-right fold) so results are deterministic and match an oracle that
does the same double-precision fold.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Double-precision dot product of two array<numeric> columns."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL/zero-norm inputs yield NULL (guarded
    division), matching SQL division-by-zero → NULL via nullif."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
