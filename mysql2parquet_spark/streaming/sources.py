"""Streaming sources and sinks (B31).

The engine's streaming ingestion mirrors its batch io: file-based
sources (parquet/json/csv directories — the standard landing-zone
pattern), the rate source for tests/backpressure tuning, and Kafka via
the standard connector options (format("kafka") — connector jar not
bundled in this container, so construction is gated).

Sinks: memory (tests), parquet via direct writeStream (exactly-once via
checkpoint), and foreachBatch for sinks needing batch-only features
(e.g. JDBC write-back, dedup-merge).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def events_schema(ts_is_ns: bool) -> T.StructType:
    """The events table schema for an explicit-schema (streaming) read.
    ``ts_is_ns`` selects the physical timestamp encoding — see
    ``_events_ts_is_ns``."""
    ts_type = T.LongType() if ts_is_ns else T.TimestampNTZType()
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


# Historical fixed schema (ts = TIMESTAMP(NANOS) read as long). Prefer
# stream_events_path/read_events_path, which probe the file's actual
# encoding — driver-generated testdata has shipped events.ts as NANOS in
# some rounds and MICROS in others, and a mismatched schema silently
# double-applies the ns→µs conversion (1970 windows).
EVENTS_SCHEMA = events_schema(True)


def _events_ts_is_ns(spark: SparkSession, probe_path: str) -> bool:
    """Probe a parquet footer through the BATCH reader: TIMESTAMP(NANOS)
    surfaces as bigint under the nanosAsLong conf, TIMESTAMP(MICROS) as
    a native (NTZ) timestamp. The stream schema must match the physical
    file — streaming has no such auto-detection, so we borrow batch's.

    An empty/not-yet-populated source (no footer to probe — the consumer
    defined the stream before the producer's first file) falls back to
    the historical NANOS encoding so the stream can still be defined;
    pass ``ts_is_ns`` explicitly to stream_events_path when the producer
    writes MICROS and may start late."""
    from pyspark.errors import AnalysisException

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(probe_path).schema
    except AnalysisException:
        return True
    for f in schema.fields:
        if f.name == "ts":
            return f.dataType.simpleString() == "bigint"
    raise ValueError(f"no ts column in {probe_path}")


def _event_time(col: str, ts_is_ns: bool):
    """Event-time column → TIMESTAMP (LTZ, watermark-compatible): ns
    longs convert with integer-µs truncation; native NTZ just casts."""
    return _ns_to_ntz_ltz(col) if ts_is_ns else F.col(col).cast("timestamp")


def stream_events_path(
    spark: SparkSession,
    directory: str,
    *,
    probe_path: str | None = None,
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
    ts_is_ns: bool | None = None,
) -> DataFrame:
    """Events-shaped parquet under ``directory`` as a file stream, with
    the ts encoding probed from the actual file(s). ``probe_path`` (a
    concrete file/dir the batch reader can open) defaults to
    ``directory`` — pass it when ``glob`` narrows the stream to a subset
    the bare directory read would not match. ``ts_is_ns`` overrides the
    probe for sources that are empty at stream-definition time (the
    probe then assumes the historical NANOS encoding)."""
    if ts_is_ns is None:
        ts_is_ns = _events_ts_is_ns(spark, probe_path or directory)
    reader = spark.readStream.schema(events_schema(ts_is_ns))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.parquet(directory)
    return df.withColumn("ts", _event_time("ts", ts_is_ns))


def read_events_path(spark: SparkSession, path: str) -> DataFrame:
    """Batch face of ``stream_events_path`` — identical schema and
    event-time (LTZ) typing, for stream≡batch comparisons."""
    ts_is_ns = _events_ts_is_ns(spark, path)
    df = spark.read.schema(events_schema(ts_is_ns)).parquet(path)
    return df.withColumn("ts", _event_time("ts", ts_is_ns))


def stream_events(
    spark: SparkSession, sf_dir: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The events table as a file stream — the streaming face of
    io.load_table(spark, sf_dir, 'events'). Same ns→µs semantics, so
    every shared builder (streaming/windows.py) produces results
    comparable with its batch run."""
    return stream_events_path(
        spark,
        sf_dir,
        probe_path=os.path.join(sf_dir, "events.parquet"),
        glob="events.parquet",
        max_files_per_trigger=max_files_per_trigger,
    )


def _ns_to_ntz_ltz(col: str):
    """ns epoch → TIMESTAMP for streaming sources.

    Watermarks demand TIMESTAMP (LTZ) — EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    rejects NTZ. Batch io stays NTZ for session-tz-independent oracles;
    the streaming engine's event-time clock is inherently zoned. Run
    streaming sessions in UTC (session.get_spark default) so stream and
    batch results align."""
    from mysql2parquet_spark.io import _ns_to_ntz

    return _ns_to_ntz(col).cast("timestamp")


def stream_rate(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Rate source → the events shape (synthetic load for harness and
    backpressure testing)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 50).alias("user_id"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
                (F.col("value") % 3 + 1).cast("int"),
            ).alias("event_type"),
            (F.col("value") % 100 / 4.0).alias("value"),
            F.to_json(F.struct((F.col("value") % 97).alias("k"))).alias("props"),
        )
    )


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source construction (connector jar required at runtime)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def run_to_memory(
    df: DataFrame, name: str, *, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming query to completion of available data into an
    in-memory table; returns the result as a batch DataFrame. Test/REPL
    helper — production sinks below."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def stream_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    *,
    output_mode: str = "append",
    partition_by: list[str] | None = None,
):
    """Parquet streaming sink with exactly-once checkpointing — the
    streaming face of io.write_parquet. Returns the StreamingQuery."""
    w = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w.start()


def foreach_batch_sink(df: DataFrame, checkpoint: str, fn):
    """foreachBatch escape hatch: ``fn(batch_df, batch_id)`` runs with
    full batch capabilities (JDBC writes, merges, dedup against existing
    data). Exactly-once when ``fn`` is idempotent per batch_id."""
    return (
        df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .start()
    )
