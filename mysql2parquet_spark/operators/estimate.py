"""Sampled profiling estimates with closed-form error bars (D33).

The D19 profilers (key skew, join explosion) are EXACT — they scan
everything. At 100 TB you usually want the answer before you pay for
the scan: "roughly how many rows per segment, what does value sum to,
± what?". This module profiles on a deterministic content-addressed
sample and reports each estimate WITH its confidence interval, so the
caller knows whether ±2% or ±40% came back.

Design:

- **Deterministic sample, not rand().** Keep a row iff the first 6 hex
  chars of ``md5(key || ':' || salt)`` sort below a threshold — the
  same contract as the md5 samplers in ``operators/scale.py``:
  membership is a pure function of row content (stable across engines,
  reruns, partitionings, cluster sizes), the sample at fraction f is a
  superset of any f' < f, and a SQL engine reproduces it exactly
  (DuckDB md5() emits identical lowercase hex), which is what makes
  the ORACLE exact instead of statistical. Resolution 1/16^6 (~6e-8).
- **Closed-form estimators.** Under per-row Bernoulli(p) inclusion:
  ``count_est = n/p``, ``sum_est = s/p`` (Horvitz-Thompson), with
  ``Var(count_est) = N(1-p)/p`` estimated by ``n(1-p)/p^2`` and
  ``Var(sum_est)`` estimated by ``ss(1-p)/p^2`` (ss = sample sum of
  squares). CI half-widths are ``z * sqrt(var)``. All arithmetic is
  derivable from three JVM aggregates (count, sum, sum of squares), so
  the whole operator is one codegen filter + one partial-agg exchange
  carrying |groups| rows — the sample never moves as rows.
- **p is exact by construction**: the threshold is an integer number
  of 16^6 buckets, so ``p = round(fraction * 16^6) / 16^6`` and both
  engines scale by the same rational. At p = 1/16, 1/p = 16 exactly.

At 100 TB: the scan reads p of the data (the md5 filter runs inside
the scan stage), the exchange carries |groups| rows, and the error
bars tell you when p was too small — re-run with 4x the fraction and
the old sample is a subset of the new (nested samples), so nothing
about the estimate jumps discontinuously.

The reference exports rows without profiling them
(/root/reference/main.go:106-203); this is a pipeline north-star
surface like D19, which it complements (estimate first, exact scan if
the decision is close).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 16 ** 6  # 6 hex chars of md5 — resolution ~6e-8


def _sample_pred(key_col: str, salt: str, n_buckets: int):
    """Keep-predicate + exact inclusion probability for the nested
    deterministic sample (fixed-width lowercase hex compares
    lexicographically = numerically in every engine)."""
    bucket = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))),
        1,
        6,
    )
    thr = "zzzzzz" if n_buckets >= _BUCKETS else f"{n_buckets:06x}"
    return bucket < F.lit(thr), n_buckets / _BUCKETS


def estimate_group_stats(
    df: DataFrame,
    group_cols: list[str],
    *,
    key_col: str,
    value_col: str | None = None,
    fraction: float = 1.0 / 16,
    salt: str = "est",
    z: float = 1.96,
) -> DataFrame:
    """Per-group count (and optionally sum/mean of ``value_col``)
    estimated from a deterministic ``fraction`` sample, each with its
    ±CI half-width.

    Columns: group cols, ``n_sample``, ``count_est``, ``count_ci``;
    with ``value_col`` also ``sum_est``, ``sum_ci``, ``mean_est``
    (the self-normalizing sample mean; its CI is ``sum_ci/count_est``
    to first order — report the pieces, not a pretend-exact ratio CI).
    Estimates/CIs are ROUND(x, 4) doubles so two engines agree at the
    hash level; ``count_est`` is exact-rational (n * 1/p).

    Groups with no sampled row are ABSENT (an estimator cannot
    distinguish a small group from an empty one — the CI of nothing is
    not zero; callers needing every group run the exact D19 profile).
    NULL sampling keys are dropped like every md5 sampler (no content
    address). ``fraction`` must give at least one bucket.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction outside (0,1]: {fraction}")
    n_buckets = int(round(fraction * _BUCKETS))
    if n_buckets < 1:
        raise ValueError(
            f"fraction {fraction} is below the 1/{_BUCKETS} resolution"
        )
    if z <= 0:
        raise ValueError(f"z must be > 0: {z}")
    pred, p = _sample_pred(key_col, salt, n_buckets)
    inv_p = 1.0 / p
    var_scale = (1.0 - p) * inv_p * inv_p  # (1-p)/p^2

    sampled = df.filter(F.col(key_col).isNotNull()).filter(pred)
    aggs = [F.count(F.lit(1)).alias("_n")]
    if value_col is not None:
        v = F.col(value_col).cast("double")
        aggs += [
            F.sum(v).alias("_s"),
            F.sum(v * v).alias("_ss"),
        ]
    g = sampled.groupBy(*group_cols).agg(*aggs)

    out = g.select(
        *group_cols,
        F.col("_n").alias("n_sample"),
        F.round(F.col("_n") * F.lit(inv_p), 4).alias("count_est"),
        F.round(
            F.lit(z) * F.sqrt(F.col("_n") * F.lit(var_scale)), 4
        ).alias("count_ci"),
        *(
            [
                F.round(F.col("_s") * F.lit(inv_p), 4).alias("sum_est"),
                F.round(
                    F.lit(z) * F.sqrt(F.col("_ss") * F.lit(var_scale)), 4
                ).alias("sum_ci"),
                F.round(F.col("_s") / F.col("_n"), 4).alias("mean_est"),
            ]
            if value_col is not None
            else []
        ),
    )
    return out


def poisson_thresholds_u32(k_max: int = 12) -> list[int]:
    """Poisson(1) CDF quantized to the 32-bit integer grid (the D44
    discipline): ``t_k = floor(CDF(k) · 2³²)``. A uniform u32 maps to
    the weight ``w = |{k : u ≥ t_k}|`` — the inverse-CDF draw as pure
    integer comparisons, engine-exact. ``k_max=12`` puts the residual
    tail mass below the grid's resolution (CDF(12|λ=1) ≈ 1 − 1e-13)."""
    import math

    acc, fact = 0.0, 1
    out = []
    for k in range(k_max + 1):
        if k:
            fact *= k
        acc += 1.0 / fact
        out.append(min(int(math.exp(-1.0) * acc * 4294967296.0),
                       4294967295))
    return out


def poisson_bootstrap_ci(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    key_col: str,
    replicas: int = 32,
    lo: float = 0.05,
    hi: float = 0.95,
    salt: str = "boot",
    ndigits: int = 4,
) -> DataFrame:
    """One-pass Poisson bootstrap (D56 — Chamandy et al. 2012,
    "Estimating Uncertainty for Massive Data Streams"): per-group mean
    with a bootstrap confidence interval computed WITHOUT resampling
    passes. Each row carries ``replicas`` independent Poisson(1)
    weights — the streaming-safe surrogate for multinomial bootstrap
    resampling — so every replica's weighted mean accumulates in the
    SAME single aggregation; the CI is read off the sorted replica
    means at the ``lo``/``hi`` quantile indices.

    Weights are CONTENT-ADDRESSED (window ``r % 4`` of
    md5(key:r//4:salt) is replica r's 8-hex uniform, compared against
    the integer-quantized Poisson CDF ``poisson_thresholds_u32`` as
    fixed-width hex — lexicographic = numeric), so the whole release
    is deterministic across engines, runs, and partitionings — no
    RNG, oracle-exact weight for every (row, replica).

    Returns ``group_cols + (n_rows, mean, ci_lo, ci_hi)``. A replica
    whose total weight lands 0 (probability e^-n — only tiny groups)
    contributes no mean; indices are taken over the surviving sorted
    means: ``lo_idx = floor(lo·(m−1))``, ``hi_idx = ceil(hi·(m−1))``.

    Scale shape: ONE group-keyed exchange. The shuffle rows widen by
    2·replicas doubles (the partial sums) — constant per group per
    partition, independent of data volume; the per-row cost is
    ``replicas/4`` md5 calls + 13·replicas fixed-width string
    compares, all inside whole-stage codegen. This is the textbook trade of the one-pass
    bootstrap: B× column width instead of B× passes.
    """
    if replicas < 2:
        raise ValueError(f"replicas must be >= 2: {replicas}")
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1: {lo}, {hi}")
    hex_ts = [f"{t:08x}" for t in poisson_thresholds_u32()]
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(value_col)).alias("_sv"),
    ]
    # Per-row cost discipline (both lessons from the r10 tail sweep,
    # 40.8 s → ~2 s at sf0.1):
    # 1. NOT a higher-order array filter — HOF lambdas evaluate
    #    interpreted per row and block whole-stage codegen; the
    #    threshold test is a flat chain of primitive compares.
    # 2. ONE md5 per FOUR replicas — an md5 digest is 32 hex chars =
    #    four independent 8-hex uniforms, so replica r reads window
    #    r%4 of digest r//4; and the compare stays on the HEX STRING
    #    against fixed-width hex thresholds (lexicographic = numeric
    #    for same-width lowercase hex — the estimate.py sampler
    #    contract), so no base conversion runs at all.
    digests = [
        F.md5(
            F.concat(
                F.col(key_col).cast("string"), F.lit(f":{b}:{salt}")
            )
        )
        for b in range((replicas + 3) // 4)
    ]
    for r in range(replicas):
        h = F.substring(digests[r // 4], 1 + 8 * (r % 4), 8)
        w = sum(
            ((h >= F.lit(t)).cast("int") for t in hex_ts[1:]),
            (h >= F.lit(hex_ts[0])).cast("int"),
        )
        aggs.append(
            F.sum(w.cast("double") * F.col(value_col)).alias(f"_s{r}")
        )
        aggs.append(F.sum(w).alias(f"_w{r}"))
    g = df.groupBy(*group_cols).agg(*aggs)
    means = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        F.col(f"_w{r}") > 0,
                        F.col(f"_s{r}") / F.col(f"_w{r}").cast("double"),
                    )
                    for r in range(replicas)
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    m = F.size(means)
    lo_i = F.floor(F.lit(float(lo)) * (m - F.lit(1)).cast("double")).cast(
        "int"
    )
    hi_i = F.ceil(F.lit(float(hi)) * (m - F.lit(1)).cast("double")).cast(
        "int"
    )
    # A group where EVERY replica drew weight 0 (probability e^-B per
    # replica; ~13.5% for a singleton at the replicas=2 floor) has an
    # empty means array — lo_i would be -1 and element_at(means, 0)
    # throws. Such a group carries no bootstrap information: emit NULL
    # CIs instead of failing the whole job (ADVICE r10).
    return g.select(
        *group_cols,
        F.col("_n").alias("n_rows"),
        F.round(F.col("_sv") / F.col("_n").cast("double"), ndigits).alias(
            "mean"
        ),
        F.when(
            m > 0,
            F.round(F.element_at(means, lo_i + F.lit(1)), ndigits),
        ).alias("ci_lo"),
        F.when(
            m > 0,
            F.round(F.element_at(means, hi_i + F.lit(1)), ndigits),
        ).alias("ci_hi"),
    )
