"""Mergeable distinct-count sketches (Apache DataSketches HLL, exposed
through Spark's ``hll_sketch_agg`` / ``hll_union_agg`` built-ins).

The 100 TB problem this solves: "distinct users per day" is cheap, but
"distinct users this month/quarter" re-scans every day's raw events —
COUNT(DISTINCT) does not roll up. An HLL sketch DOES: each shard (day,
partition, export run) persists a few-KB binary sketch next to its
data, and any coarser rollup is a union of sketches — kilobytes moved,
zero raw re-scan, and the merged estimate is IDENTICAL to the estimate
a single pass over the union would have produced (HLL union is exact
over sketch state for a fixed ``lg_k``; pinned in tests).

Everything is JVM aggregate functions — no Python in the path. The
reference delegates all aggregation to MySQL (main.go:106), which has
no mergeable-sketch story at all; this is engine-native capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: log2 of the sketch register count. 12 → 4096 registers ≈ 1.6%
#: relative standard error and ~2-4 KB per sketch. One fixed default so
#: independently-produced shard sketches are always mergeable (unions
#: of mixed lg_k silently degrade to the coarser sketch).
DEFAULT_LG_K = 12


def distinct_sketches(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Per-group HLL sketch of ``key_col`` (+ exact row count).

    One partial+final hash aggregate — the shuffle carries one sketch
    (a few KB) per group per map task, never the keys themselves. The
    output is the shard-level artifact to persist alongside the shard's
    parquet: ``group_cols…, sketch binary, n_rows``.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def merge_sketch_estimates(
    sketches: DataFrame, rollup_cols: list[str]
) -> DataFrame:
    """Roll shard sketches up to ``rollup_cols`` granularity.

    Input is a (persisted) ``distinct_sketches`` output — kilobytes per
    shard — so this aggregation is driver-trivial at any corpus scale.
    ``approx_distinct`` is the estimate of the UNIONED sketch state,
    not a sum of per-shard estimates (distincts deduplicate across
    shards); ``n_rows`` sums exactly.
    """
    g = (
        sketches.groupBy(*rollup_cols)
        if rollup_cols
        else sketches.groupBy()
    )
    return g.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )
