"""Stream-stream interval join + remaining source coverage (rate source,
binaryFile source)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.operators.multimodal import extract_features
from mysql2parquet_spark.streaming.sources import (
    run_to_memory,
    stream_events,
    stream_rate,
)
from mysql2parquet_spark.streaming.windows import purchase_view_interval_join


def test_stream_stream_join_equals_batch(spark, sf_dir):
    batch = load_table(spark, sf_dir, "events")
    bp = batch.filter(F.col("event_type") == "purchase")
    bv = batch.filter(F.col("event_type") == "view")
    want = sorted(
        map(str, purchase_view_interval_join(bp, bv).collect())
    )

    sp = stream_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    sv = stream_events(spark, sf_dir).filter(F.col("event_type") == "view")
    got_df = run_to_memory(
        purchase_view_interval_join(sp, sv), "ssjoin", output_mode="append"
    )
    got = sorted(map(str, got_df.collect()))
    assert got == want


def _write_ts_slices(spark, sf_dir, out: str, n: int = 6) -> list:
    """Write ``events`` as ``n`` ts-range-sliced part-files and stamp
    STRICTLY ASCENDING mtimes in ts-range order.  Spark's file stream
    source replays files ordered by modification time; the parallel
    parquet write gives most part-files identical mtimes, so without the
    stamping the replay order of the slices is arbitrary (which would
    falsify any "in-order replay" premise).  ``repartitionByRange`` makes
    part-0000k the k-th ts range, so stamping in filename order = event-
    time order."""
    import glob
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw.repartitionByRange(n, "ts").write.mode("overwrite").parquet(out)
    parts = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(parts) == n
    base = int(time.time()) - 3600
    for i, f in enumerate(parts):
        os.utime(f, (base + 10 * i, base + 10 * i))
    return parts


def test_stream_stream_join_multibatch_incremental(spark, sf_dir, tmp_path):
    """Stream-stream join state must carry ACROSS micro-batches: with
    maxFilesPerTrigger=1 a purchase and its matching view usually arrive
    in different batches, so any per-batch-only join would drop pairs.
    Result must equal the single-batch run (which equals batch).

    The slices replay in event-time order (ascending mtimes stamped by
    ``_write_ts_slices``), so the watermark never legitimately drops
    rows — any mismatch vs batch is a real state-carry bug, not late
    data."""
    from mysql2parquet_spark.streaming.sources import stream_events_path

    out = str(tmp_path / "events_parts")
    _write_ts_slices(spark, sf_dir, out, 6)

    def stream():
        return stream_events_path(spark, out, max_files_per_trigger=1)

    sp = stream().filter(F.col("event_type") == "purchase")
    sv = stream().filter(F.col("event_type") == "view")
    q = (
        purchase_view_interval_join(sp, sv)
        .writeStream.format("memory")
        .queryName("ssjoin_mb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 6  # really ran multi-batch

    batch = load_table(spark, sf_dir, "events")
    want = sorted(
        map(
            str,
            purchase_view_interval_join(
                batch.filter(F.col("event_type") == "purchase"),
                batch.filter(F.col("event_type") == "view"),
            ).collect(),
        )
    )
    got = sorted(map(str, spark.table("ssjoin_mb").collect()))
    assert got == want

    # BOUNDED STATE (B34's at-scale promise): as the watermark advances
    # across batches, the join must EVICT buffered rows — without this a
    # 100 TB stream buffers forever. The in-order replay moves the
    # watermark every batch, so evictions must show in the state metrics.
    removed = sum(
        op.numRowsRemoved
        for pr in q.recentProgress
        for op in (pr.stateOperators or [])
    )
    assert removed > 0, "watermark advanced but no join state was evicted"


def test_stream_stream_join_out_of_order_zero_loss(spark, sf_dir, tmp_path):
    """Mirrored disorder test (B34): slices delivered OUT of event-time
    order, but with watermarks sized to exceed the total disorder (40
    days > the 30-day event span), so nothing may be dropped — result
    must equal batch exactly."""
    from mysql2parquet_spark.streaming.sources import stream_events_path

    out = str(tmp_path / "events_ooo")
    parts = _write_ts_slices(spark, sf_dir, out, 6)
    # Re-stamp in a fixed shuffled order: delivery 3,0,5,1,4,2.
    import os

    base = int(time.time()) - 3600
    for rank, idx in enumerate([3, 0, 5, 1, 4, 2]):
        os.utime(parts[idx], (base + 10 * rank, base + 10 * rank))

    def stream():
        return stream_events_path(spark, out, max_files_per_trigger=1)

    sp = stream().filter(F.col("event_type") == "purchase")
    sv = stream().filter(F.col("event_type") == "view")
    q = (
        purchase_view_interval_join(
            sp, sv, purchase_watermark="40 days", view_watermark="40 days"
        )
        .writeStream.format("memory")
        .queryName("ssjoin_ooo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 6

    batch = load_table(spark, sf_dir, "events")
    want = sorted(
        map(
            str,
            purchase_view_interval_join(
                batch.filter(F.col("event_type") == "purchase"),
                batch.filter(F.col("event_type") == "view"),
            ).collect(),
        )
    )
    got = sorted(map(str, spark.table("ssjoin_ooo").collect()))
    assert got == want


def test_stream_stream_join_late_loss_accounting(spark, sf_dir, tmp_path):
    """Loss-accounting variant (B34): slices delivered in REVERSE event-
    time order with the default small watermarks.  After batch 1 (the
    latest slice) the watermark has advanced past every earlier slice,
    so those arrivals are late.  Pin the semantics:

    - no spurious pairs (got ⊆ batch result);
    - every pair joinable from the first-delivered slice alone IS
      emitted (state existed before any watermark advanced);
    - loss actually occurred (the drops are real, not vacuous)."""
    from mysql2parquet_spark.streaming.sources import stream_events_path

    out = str(tmp_path / "events_rev")
    parts = _write_ts_slices(spark, sf_dir, out, 6)
    import os

    base = int(time.time()) - 3600
    for rank, idx in enumerate(reversed(range(6))):  # deliver 5,4,...,0
        os.utime(parts[idx], (base + 10 * rank, base + 10 * rank))

    def stream():
        return stream_events_path(spark, out, max_files_per_trigger=1)

    sp = stream().filter(F.col("event_type") == "purchase")
    sv = stream().filter(F.col("event_type") == "view")
    q = (
        purchase_view_interval_join(sp, sv)
        .writeStream.format("memory")
        .queryName("ssjoin_rev")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = load_table(spark, sf_dir, "events")
    want = set(
        map(
            str,
            purchase_view_interval_join(
                batch.filter(F.col("event_type") == "purchase"),
                batch.filter(F.col("event_type") == "view"),
            ).collect(),
        )
    )
    # Pairs joinable from the first-delivered slice (latest ts range) alone.
    from mysql2parquet_spark.streaming.sources import read_events_path

    last_slice = read_events_path(spark, parts[5])
    want_first_batch = set(
        map(
            str,
            purchase_view_interval_join(
                last_slice.filter(F.col("event_type") == "purchase"),
                last_slice.filter(F.col("event_type") == "view"),
            ).collect(),
        )
    )
    got = set(map(str, spark.table("ssjoin_rev").collect()))
    assert got <= want  # no spurious pairs
    assert want_first_batch <= got  # pre-watermark state fully joined
    assert got < want  # late arrivals really were dropped


def test_rate_source_produces_events_shape(spark):
    stream = stream_rate(spark, rows_per_second=200)
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_probe")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.table("rate_probe").count()
            if n >= 50:
                break
            time.sleep(1)
        assert n >= 50
        row = spark.table("rate_probe").first()
        assert set(spark.table("rate_probe").columns) == {
            "event_id", "ts", "user_id", "event_type", "value", "props",
        }
        assert row.event_type in {"view", "click", "purchase"}
    finally:
        q.stop()


def test_binary_file_source_feeds_multimodal(spark, tmp_path):
    """spark.read.format('binaryFile') → the multimodal feature path —
    the ingestion story for real image/audio payloads (C5)."""
    d = tmp_path / "assets"
    d.mkdir()
    payloads = {f"img_{i}.bin": bytes([i * 7 % 256] * (100 + i)) for i in range(5)}
    for name, data in payloads.items():
        (d / name).write_bytes(data)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(d))
    )
    assets = files.select(
        F.xxhash64("path").alias("asset_id"),
        F.col("content"),
        F.lit("application/octet-stream").alias("media_type"),
    )
    feats = extract_features(assets).collect()
    assert len(feats) == 5
    sizes = sorted(r.n_bytes for r in feats)
    assert sizes == sorted(len(v) for v in payloads.values())
    for r in feats:
        assert abs(sum(r.features) - 1.0) < 1e-9
