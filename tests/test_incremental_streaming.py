"""True multi-batch incremental execution: the events table split into
several files, maxFilesPerTrigger=1 → state must carry across
micro-batches, and the final result must equal the batch run."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.streaming import windows as W
from mysql2parquet_spark.streaming.sources import stream_events_path


@pytest.fixture(scope="module")
def multi_file_events_dir(spark, sf_dir, tmp_path_factory):
    """events split into 5 parquet files (raw long ts preserved, like
    the source data)."""
    out = str(tmp_path_factory.mktemp("events_parts"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")  # ts stays long
    raw.repartition(5).write.mode("overwrite").parquet(out)
    assert len(glob.glob(out + "/part-*.parquet")) == 5
    return out


def _stream(spark, directory):
    return stream_events_path(spark, directory, max_files_per_trigger=1)


def test_multibatch_tumbling_equals_batch(spark, sf_dir, multi_file_events_dir):
    stream = _stream(spark, multi_file_events_dir)
    q = (
        W.tumbling_counts(stream, "10 minutes")
        .writeStream.format("memory")
        .queryName("mb_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    assert n_batches >= 5  # one micro-batch per file minimum
    got = sorted(map(str, spark.table("mb_tumbling").collect()))
    want = sorted(
        map(
            str,
            W.tumbling_counts(
                load_table(spark, sf_dir, "events"), "10 minutes"
            ).collect(),
        )
    )
    assert got == want


def test_multibatch_stateful_dedup_first_arrival(spark, multi_file_events_dir):
    """dropDuplicates across micro-batches: later batches must not
    re-emit keys already seen in earlier batches."""
    stream = _stream(spark, multi_file_events_dir)
    q = (
        W.streaming_dedup(stream, watermark="100 days")
        .select("user_id", "event_type")
        .writeStream.format("memory")
        .queryName("mb_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [(r.user_id, r.event_type) for r in spark.table("mb_dedup").collect()]
    assert len(rows) == len(set(rows)), "duplicate key emitted across batches"
