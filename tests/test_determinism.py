"""Cross-cluster-size determinism: the same query must return the SAME
values whether it runs with 3 shuffle partitions or 64 (stand-in for
local[2] vs a 1000-executor cluster — partition count is the lever that
reorders partial aggregation). Catches order-dependent double sums and
partition-order-dependent survivors, the classic at-scale
irreproducibility bugs. Values compare after the driver's own %.6f
float normalization."""

from __future__ import annotations

import pytest

from mysql2parquet_spark.queries import REGISTRY, _load
from tests.test_oracle_parity import _canon

_load()

# Hash-sensitive shapes: money sums, double stats/corr, float-vector
# averages, dedup survivors, quality scoring.
CASES = [
    "agg_group",
    "agg_stats",
    "agg_corr",
    "embedding_centroids",
    "dedup_exact",
    "pipeline_curate",
    "text_bm25",        # decimal-summed per-term double contributions
    "pipeline_pack",    # running-sum window binning
    "embedding_quantize",  # double closed-form rounding
    "events_anomaly",   # windowed-count z-scores (r7 reduce-first shape)
    "text_classifier_nb",  # r12 D75: micro-nat log-odds integer sums
    "text_lm3_score",   # r12 D76: micro-nat backoff integer sums
    "events_attribution",  # r12 D78: as-of credit + decimal revenue
    "text_source_kl",   # r12 D79: nano-nat KL integer sums
    "text_burstiness",  # r12 D81: integer moment sums + top-k rank
    "events_sessions",  # r12 D84: gaps-and-islands + decimal totals
]


@pytest.mark.parametrize("name", CASES)
def test_values_invariant_to_partitioning(spark, sf_dir, name):
    q = REGISTRY[name].fn
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        df_a = q(spark, sf_dir)
        a = _canon([tuple(r) for r in df_a.collect()], df_a.columns)
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        df_b = q(spark, sf_dir)
        b = _canon([tuple(r) for r in df_b.collect()], df_b.columns)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b, f"{name}: values depend on partitioning"
