"""Structured Streaming harness tests (SURVEY.md §5.2 point: streaming
state/watermarks have no DuckDB oracle → batch-equivalence testing).

Each test runs a shared builder (streaming/windows.py) over the events
FILE STREAM with trigger availableNow and compares against the same
builder over the batch table — proving the operators are genuinely
incremental, not just batch code that happens to compile."""

from __future__ import annotations

import uuid

import pytest

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.streaming import windows as W
from mysql2parquet_spark.streaming.sources import (
    run_to_memory,
    stream_events,
    stream_to_parquet,
)


def _canon(df):
    return sorted(map(str, df.collect()))


@pytest.fixture()
def batch_events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _mem_name() -> str:
    return "m" + uuid.uuid4().hex[:10]


def test_tumbling_stream_equals_batch(spark, sf_dir, batch_events):
    stream = stream_events(spark, sf_dir)
    got = run_to_memory(W.tumbling_counts(stream, "10 minutes"), _mem_name())
    want = W.tumbling_counts(batch_events, "10 minutes")
    assert _canon(got) == _canon(want)


def test_sliding_stream_equals_batch(spark, sf_dir, batch_events):
    stream = stream_events(spark, sf_dir)
    got = run_to_memory(
        W.sliding_counts(stream, "10 minutes", "5 minutes"), _mem_name()
    )
    want = W.sliding_counts(batch_events, "10 minutes", "5 minutes")
    assert _canon(got) == _canon(want)


def test_session_stream_equals_batch(spark, sf_dir, batch_events):
    """Single-stage session aggregation streams incrementally; chaining a
    second stateful agg (the per-user rollup) is a batch-face op — Spark
    rejects multi-stateful chains without watermark staging."""
    from pyspark.sql import functions as F

    def flatten(df):
        return df.select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("s"),
            "cnt",
            "sum_value",
        )

    stream = stream_events(spark, sf_dir)
    got = run_to_memory(flatten(W.session_windows(stream, "60 minutes")), _mem_name())
    want = flatten(W.session_windows(batch_events, "60 minutes"))
    assert _canon(got) == _canon(want)


def test_watermarked_tumbling_runs(spark, sf_dir):
    """Watermark + append mode: only finalized windows are emitted; with
    availableNow over a finite source the final watermark passes every
    window, so append-mode output matches the batch aggregation minus
    nothing — but Spark emits appendable windows only after a NEXT
    trigger advances the watermark, so we assert the query runs and
    emits a subset."""
    stream = stream_events(spark, sf_dir).withWatermark("ts", "10 minutes")
    got = run_to_memory(
        W.tumbling_counts(stream, "10 minutes"), _mem_name(), output_mode="append"
    )
    want = W.tumbling_counts(
        load_table(spark, sf_dir, "events"), "10 minutes"
    )
    got_rows = set(map(str, got.collect()))
    want_rows = set(map(str, want.collect()))
    assert got_rows.issubset(want_rows)


def test_streaming_dedup_bounded_state(spark, sf_dir, batch_events):
    """dropDuplicates within the watermark horizon: every emitted key is
    unique and the key set matches the batch distinct exactly (finite
    replay, all data within horizon)."""
    stream = stream_events(spark, sf_dir)
    got = run_to_memory(
        W.streaming_dedup(stream, watermark="100 days").select(
            "user_id", "event_type"
        ),
        _mem_name(),
        output_mode="append",
    )
    keys = [(r.user_id, r.event_type) for r in got.collect()]
    assert len(keys) == len(set(keys))
    want = set(
        (r.user_id, r.event_type)
        for r in batch_events.select("user_id", "event_type").distinct().collect()
    )
    assert set(keys) == want


def test_chained_window_rollup_streams(spark, sf_dir, batch_events):
    """CHAINED stateful aggregation (10-min windows re-aggregated into
    hourly buckets) runs as ONE streaming query — two stateful operators
    with watermark propagation through the first aggregate. Append-mode
    output is a subset of (and consistent with) the batch rollup; every
    emitted hourly row matches the batch value exactly."""
    stream = stream_events(spark, sf_dir).withWatermark("ts", "10 minutes")
    got = run_to_memory(
        W.hourly_rollup(stream), _mem_name(), output_mode="append"
    )
    want = W.hourly_rollup(batch_events)
    got_rows = set(map(str, got.collect()))
    want_rows = set(map(str, want.collect()))
    assert got_rows.issubset(want_rows)
    # chaining must not degrade to empty output on a multi-hour corpus
    assert len(got_rows) > 0


def test_stream_static_enrich_equals_batch(spark, sf_dir, batch_events):
    """Stream-static enrichment (broadcast dimension, stateless) under
    readStream produces exactly the batch result; the streaming plan
    carries a BroadcastHashJoin, not a shuffled join."""
    dim = load_table(spark, sf_dir, "customer")
    stream = stream_events(spark, sf_dir)
    enriched = W.enriched_segment_counts(stream, dim, "10 minutes")
    got = run_to_memory(enriched, _mem_name())
    want = W.enriched_segment_counts(batch_events, dim, "10 minutes")
    assert _canon(got) == _canon(want)


def test_stream_static_enrich_keeps_unmatched_facts(spark):
    """Facts with no dimension row survive the left enrichment with NULL
    attributes — dimension gaps must be visible, not dropped."""
    facts = spark.createDataFrame(
        [(1, 10), (2, 99)], "event_id: long, user_id: long"
    )
    dim = spark.createDataFrame(
        [(10, "BUILDING")], "c_custkey: long, c_mktsegment: string"
    )
    out = {
        (r.event_id, r.c_mktsegment)
        for r in W.enrich_with_dimension(facts, dim).collect()
    }
    assert out == {(1, "BUILDING"), (2, None)}
    plan = (
        W.enrich_with_dimension(facts, dim)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_parquet_stream_sink_roundtrip(spark, sf_dir, tmp_path):
    """File-stream → transform → parquet streaming sink with checkpoint;
    the landed data re-reads to the same row count as the source."""
    stream = stream_events(spark, sf_dir).where("event_type = 'purchase'")
    q = stream_to_parquet(
        stream,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    # processAllAvailable blocks exactly until every available input
    # file is processed; the old awaitTermination(120) burned the full
    # 120 s because a file stream never self-terminates (r15 suite-wall
    # fix — same assertion, same landed data).
    q.processAllAvailable()
    q.stop()
    landed = spark.read.parquet(str(tmp_path / "out"))
    want = (
        load_table(spark, sf_dir, "events")
        .where("event_type = 'purchase'")
        .count()
    )
    assert landed.count() == want


def test_stream_definable_on_empty_source_dir(spark, tmp_path):
    """The consumer may define the stream before the producer's first
    file lands: an empty source dir must not make stream definition
    throw (probe falls back to the historical NANOS encoding; an
    explicit ts_is_ns overrides it)."""
    from mysql2parquet_spark.streaming.sources import stream_events_path

    empty = tmp_path / "landing"
    empty.mkdir()
    df = stream_events_path(spark, str(empty), max_files_per_trigger=1)
    assert df.isStreaming
    assert df.schema["ts"].dataType.simpleString() == "timestamp"

    df2 = stream_events_path(spark, str(empty), ts_is_ns=False)
    assert df2.isStreaming
