"""foreachBatch sink (B31): merge-dedup semantics a plain file sink
can't express — each micro-batch upserts into a keyed parquet target."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.operators.dedup import exact_dedup
from mysql2parquet_spark.streaming.sources import foreach_batch_sink, stream_events


def test_foreach_batch_merge_dedup(spark, sf_dir, tmp_path):
    out = str(tmp_path / "merged")

    def merge(batch_df, batch_id):
        incoming = batch_df.select("user_id", "event_type", "event_id")
        try:
            existing = batch_df.sparkSession.read.parquet(out)
            combined = existing.unionByName(incoming)
        except Exception:
            combined = incoming
        deduped = exact_dedup(combined, ["user_id", "event_type"], "event_id")
        deduped.coalesce(1).write.mode("overwrite").parquet(out + "_tmp")
        batch_df.sparkSession.read.parquet(out + "_tmp").write.mode(
            "overwrite"
        ).parquet(out)

    q = foreach_batch_sink(
        stream_events(spark, sf_dir), str(tmp_path / "ckpt"), merge
    )
    # availableNow isn't set by the helper; run until the source drains
    q.processAllAvailable()
    q.stop()

    merged = spark.read.parquet(out)
    want = (
        exact_dedup(
            load_table(spark, sf_dir, "events").select(
                "user_id", "event_type", "event_id"
            ),
            ["user_id", "event_type"],
            "event_id",
        )
    )
    got = {(r.user_id, r.event_type, r.event_id) for r in merged.collect()}
    exp = {(r.user_id, r.event_type, r.event_id) for r in want.collect()}
    assert got == exp
