"""Round-closing tail sweep (a standing ritual — VERDICT r6 ask #7).

Times EVERY registered query not in the bench headline at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), one cold run each
through the no-op sink. The winnow multiply-evaluation defect hid for
two rounds precisely because only the 48 headline entries were timed;
this sweep is what caught it. Interpreting the output:

- First-run costs (Python worker spawn, codegen) inflate cold walls by
  ~4 s for Arrow-UDF queries — the calibration row re-times a headline
  query cold so the session's cold-start tax is measured, not guessed.
- The signature to hunt is a query whose wall is a LARGE MULTIPLE of
  its relatives' (same tables, same shape family): that's a plan
  defect (re-evaluation, one-split scan, lost group-limit), not noise.
  `.explain("formatted")` it and look for repeated expression subtrees
  and single-task stages.

Usage: python scripts/tail_sweep.py [sf_dir]
Appends nothing; paste findings into docs/BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from bench import HEADLINE
    from mysql2parquet_spark.queries import all_queries
    from mysql2parquet_spark.session import get_spark

    spark = get_spark(
        "mysql2parquet_spark-tailsweep",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, SF).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    run("agg_group")  # session warmup: JIT, codegen, parquet footers
    # Cold-start calibration: a known-cheap headline query timed cold
    # in THIS session; its excess over its headline min-of-2 number is
    # the session's first-run tax, to subtract mentally from the tail.
    calib = run("filter_like")

    tail = sorted(n for n in qs if n not in HEADLINE and n != "filter_like")
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in tail:
        try:
            timings[name] = run(name)
        except Exception as e:  # keep sweeping; a red cell is a finding
            errors[name] = str(e)[:200]

    out = {
        "sweep": "registered-not-headline",
        "sf_dir": SF,
        "n": len(tail),
        "calibration_filter_like_cold": calib,
        "total": round(sum(timings.values()), 3),
        "slowest": dict(
            sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
        ),
        "errors": errors,
        "timings": dict(sorted(timings.items())),
    }
    print(json.dumps(out))
    spark.stop()
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
