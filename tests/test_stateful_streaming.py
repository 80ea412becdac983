"""applyInPandasWithState (B35): custom per-key state across
micro-batches, checked against the batch aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.streaming.sources import run_to_memory, stream_events
from mysql2parquet_spark.streaming.stateful import running_totals_per_user


def test_running_totals_match_batch(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    got = run_to_memory(
        running_totals_per_user(stream), "stateful_totals", output_mode="update"
    )
    # update mode re-emits a row per (user, batch); the LAST emission per
    # user must equal the batch aggregate. With availableNow over one
    # file there is one batch, so take rows as-is.
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
    )
    got_map = {r.user_id: (r.n_events, r.total_value) for r in got.collect()}
    want_map = {r.user_id: (r.n_events, r.total_value) for r in want.collect()}
    assert set(got_map) == set(want_map)
    for uid, (n, tot) in want_map.items():
        gn, gtot = got_map[uid]
        assert gn == n
        assert abs(gtot - tot) < 0.02  # float accumulation in pandas path
