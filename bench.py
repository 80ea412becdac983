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
    "topk_similarity",    # Tier C cosine top-k
    "ann_ivf_topk",       # Tier C IVF ANN (k-means + cell probe)
    "text_quality",       # Tier C text scoring
    "tpch_q3_shape",      # composite: filtered 3-way join + grouped top-k
    "tpch_q6",            # composite: pushdown scan-filter-aggregate
    "tpch_q10_shape",     # composite: 4-way join + grouped top-20
    "pipeline_curate",    # capstone: dedup -> quality -> lang -> report
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

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("agg_group")  # warmup: JIT, codegen, parquet footer caches

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run(name), 3)

    # The reference's actual workload (main.go: extract -> parquet file):
    # full lineitem scan -> parquet write, distributed writer.
    import tempfile

    from mysql2parquet_spark.io import load_table, write_parquet

    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        write_parquet(load_table(spark, SF_DIR, "lineitem"), f"{td}/out")
        timings["export_parquet"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or "0.1"
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
