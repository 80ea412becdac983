"""Differentially-private count release (D40): grouped counts with
discrete-Laplace (two-sided-geometric) noise — the privacy gate for
PUBLISHING aggregates, completing the D28 family (k-anonymity /
l-diversity gate what may leave the warehouse row-wise; this gates
what a released STATISTIC reveals).

Mechanism (public: Ghosh, Roughgarden & Sundararajan 2009 — the
discrete Laplace / geometric mechanism is optimal for integer counts):
release ``count + (G1 - G2)`` where ``G1, G2`` are iid
Geometric(1 - alpha) failure counts with ``alpha = exp(-eps/Δ)``.
``G1 - G2`` is exactly two-sided-geometric noise, the integer analogue
of Laplace(Δ/eps), and the release is eps-DP for sensitivity Δ.
Integer noise keeps the output hash-stable (no float formatting
drift) and is what real census-style releases use.

Spark shape: ONE group-keyed exchange (the count aggregate); the noise
is a per-group codegen projection — ``u = conv(md5-prefix)/2^32`` per
draw, ``G = floor(ln(u)/ln(alpha))`` — no UDF, no second pass, no
driver work. Every expression is engine-portable, so the DuckDB oracle
reproduces the release bit-for-bit.

Determinism caveat, stated loudly: the geometric draws are
CONTENT-ADDRESSED (md5 of group ‖ seed — the engine's sampler
contract), which makes releases reproducible and testable, but a
PUBLISHED release must use fresh physical randomness for the seed and
must never re-release the same statistic under a new seed (each
re-release spends additional budget; eps composes additively). The
operator computes the mechanism; budget accounting is the caller's.

The unit of protection is one ROW's presence per group (Δ = 1). When
an entity can contribute many rows, pass ``entity_col``: the count
becomes distinct-entity participation per group (one extra pre-agg
exchange), bounding each entity's contribution to 1 per group.
Cross-group composition caveat (ADVICE r9): that bound is PER GROUP —
an entity appearing in k different groups affects k released counts,
so the grouped release as a whole is only k·eps-DP for that entity
under sequential composition (group counts are not a partition of the
protected units). Each per-group statistic is eps-DP; if the release
must be eps-DP PER ENTITY overall, either bound group participation
upstream (keep each entity's first group only — one window) or divide
the budget by the participation bound before calling.

The reference has no aggregation surface (/root/reference/main.go:106
delegates to MySQL); this is pipeline north-star coverage like D28.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _geometric(u, alpha: float):
    """Geometric(1 - alpha) failure count from a uniform u in (0, 1):
    floor(ln(u) / ln(alpha)) — the inverse-CDF draw."""
    return F.floor(F.log(u) / F.lit(math.log(alpha))).cast("long")


def _uniform(key, tag: str, seed: str):
    """Content-addressed uniform in (0,1): first 8 md5 hex chars of
    (key ‖ tag ‖ seed) → 32-bit integer, offset by 0.5 so the draw is
    never exactly 0 (ln(0)) or 1. Same idiom as the md5 samplers."""
    v = F.conv(
        F.substring(F.md5(F.concat(key, F.lit(f":{tag}:{seed}"))), 1, 8),
        16,
        10,
    ).cast("double")
    return (v + F.lit(0.5)) / F.lit(float(1 << 32))


def dp_group_counts(
    df: DataFrame,
    group_col: str,
    *,
    epsilon: float,
    seed: str,
    sensitivity: int = 1,
    entity_col: str | None = None,
) -> DataFrame:
    """eps-DP noisy counts per group. Columns: ``group_col``,
    ``n_noisy`` (true count + two-sided-geometric noise, clamped at 0
    — a released count is never negative), ``epsilon``. The guarantee
    is PER STATISTIC: with ``entity_col``, an entity spanning k groups
    is only k·eps-protected across the whole release (see the module
    doc's composition caveat).

    NULL groups are dropped (a NULL is not a releasable category, and
    it has no content address — the sampler contract). Groups absent
    from the data are absent from the release; callers releasing over
    a PUBLIC category list should left-join that list first so absence
    itself does not signal zero (the standard known-domain caveat).
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0: {epsilon}")
    if sensitivity < 1:
        raise ValueError(f"sensitivity must be >= 1: {sensitivity}")
    alpha = math.exp(-epsilon / sensitivity)
    keyed = df.filter(F.col(group_col).isNotNull())
    if entity_col is not None:
        counts = keyed.groupBy(group_col).agg(
            F.count_distinct(F.col(entity_col)).alias("_n")
        )
    else:
        counts = keyed.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("_n")
        )
    key = F.col(group_col).cast("string")
    noise = _geometric(_uniform(key, "dp1", seed), alpha) - _geometric(
        _uniform(key, "dp2", seed), alpha
    )
    return counts.select(
        group_col,
        F.greatest(F.col("_n") + noise, F.lit(0)).alias("n_noisy"),
        F.lit(float(epsilon)).alias("epsilon"),
    )
