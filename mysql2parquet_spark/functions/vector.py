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


def dot_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """``dot`` with the fold UNROLLED for a known vector width: the
    identical left-to-right double accumulation (0.0 + p0 + p1 + …, so
    results are bit-identical to ``dot`` — same IEEE order, same
    rounding) expressed as 2·dim primitive multiply/adds that
    whole-stage codegen compiles, instead of a higher-order-function
    fold (HOFs are CodegenFallback: interpreted, one boxed object per
    element — measured ~10× slower on 64-dim pair joins). Rows where
    either array is NOT exactly ``dim`` wide fall back to the fold
    (``F.get`` would NULL-pad a short-but-equal-width pair that the
    zip fold scores, so the guard keeps ragged inputs bit-identical
    too). Use when the width is known driver-side (a collected
    codebook, a literal query vector); ``dot`` stays the general form.
    """
    av, bv = _c(a), _c(b)
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(av, F.lit(i)).cast("double") * F.get(
            bv, F.lit(i)
        ).cast("double")
    return F.when(
        (F.size(av) == dim) & (F.size(bv) == dim), acc
    ).otherwise(dot(av, bv))


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


def quantize_int8(a: Column | str) -> Column:
    """Symmetric int8 quantization → array<bigint> in [-127, 127]:
    ``q[i] = floor(x[i] * 127 / max|x| + 0.5)`` (half-up, identical
    closed form in any engine — no engine-specific ROUND semantics).
    All-zero vectors quantize to all zeros instead of dividing by zero.

    Math is entirely in IEEE double (each float element cast before any
    arithmetic), so the result is bit-deterministic. Both the element
    array and the scale are bound as lambda variables via single-element
    ``zip_with`` — naming the scale expression inside the per-element
    lambda would re-evaluate the array_max per element (O(d²) per row).
    """
    xd = F.transform(_c(a), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(_c(a), lambda x: F.abs(x.cast("double"))))

    def build(v: Column, s: Column) -> Column:
        zeros = F.transform(v, lambda x: F.lit(0).cast("bigint"))
        q = F.transform(
            v,
            lambda x: F.floor(x * F.lit(127.0) / s + F.lit(0.5)).cast(
                "bigint"
            ),
        )
        return F.when(s == F.lit(0.0), zeros).otherwise(q)

    return F.zip_with(F.array(xd), F.array(scale), build)[0]
