"""D36 streaming near-dup curation: multi-batch file stream through the
persisted band store, exactly-once, with the family's survivor
invariant checked over the FINAL accepted corpus."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.dedup import minhash_band_store
from mysql2parquet_spark.streaming.neardup import (
    accepted_docs,
    read_band_store,
    streaming_neardup_sink,
)

_SIG = dict(shingle_n=2, num_hashes=16, bands=4)


@pytest.fixture(scope="module")
def doc_stream_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("doc_parts"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.repartition(4).write.mode("overwrite").parquet(out)
    assert len(glob.glob(out + "/part-*.parquet")) == 4
    return out


def _run(spark, doc_stream_dir, tmp_path, tag):
    out = str(tmp_path / f"accepted_{tag}")
    store = str(tmp_path / f"store_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(doc_stream_dir)
    )
    q = streaming_neardup_sink(
        stream,
        out_dir=out,
        store_dir=store,
        checkpoint=ckpt,
        threshold=0.5,
        max_band_width=None,  # exact collision set for the invariant
        **_SIG,
    )
    q.processAllAvailable()
    q.stop()
    return out, store, ckpt


def test_streaming_neardup_multibatch(spark, doc_stream_dir, tmp_path):
    out, store, ckpt = _run(spark, doc_stream_dir, tmp_path, "a")

    inp = spark.read.parquet(doc_stream_dir)
    acc = accepted_docs(spark, out)
    n_in, n_acc = inp.count(), acc.count()
    assert 0 < n_acc <= n_in
    # accepted is a subset of the input, ids unique
    assert acc.select("doc_id").distinct().count() == n_acc
    assert acc.join(inp, "doc_id", "left_anti").count() == 0

    # the family survivor invariant: NO two accepted docs collide at
    # >= threshold (a colliding later doc would have been dropped by
    # the store probe; a colliding batch-mate by the smaller-id rule)
    from mysql2parquet_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    bands = minhash_band_store(acc, **_SIG)
    a = bands.select("band_idx", "band_key", F.col("doc").alias("a"),
                     F.col("sig").alias("sa"))
    b = bands.select("band_idx", "band_key", F.col("doc").alias("b"),
                     F.col("sig").alias("sb"))
    agree = sum(
        (F.col("sa")[i] == F.col("sb")[i]).cast("int")
        for i in range(_SIG["num_hashes"])
    ) / F.lit(float(_SIG["num_hashes"]))
    colliding = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .filter(agree >= 0.5)
    )
    assert colliding.count() == 0

    # the store holds exactly the accepted docs' band rows
    st = read_band_store(spark, store, acc)
    assert (
        st.select("doc").distinct().count() == n_acc
    )

    # state carried ACROSS batches: some doc was dropped by a collision
    # with a doc accepted in an EARLIER batch (not its own) — otherwise
    # this test only exercises within-batch dedup. The fixture corpus
    # has cross-partition near-dups by construction; guard that.
    per_batch_in = {
        int(p.split("batch=")[1]): spark.read.parquet(p).count()
        for p in glob.glob(out + "/batch=*")
    }
    assert len(per_batch_in) == 4  # one commit per file
    assert n_acc < n_in  # something was dropped somewhere


def test_streaming_neardup_restart_is_idempotent(
    spark, doc_stream_dir, tmp_path
):
    out, store, ckpt = _run(spark, doc_stream_dir, tmp_path, "b")
    before = {r.doc_id for r in accepted_docs(spark, out).collect()}
    # restart with the SAME checkpoint: no new files -> no new batches,
    # accepted set unchanged
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(doc_stream_dir)
    )
    q = streaming_neardup_sink(
        stream,
        out_dir=out,
        store_dir=store,
        checkpoint=ckpt,
        threshold=0.5,
        max_band_width=None,
        **_SIG,
    )
    q.processAllAvailable()
    q.stop()
    after = {r.doc_id for r in accepted_docs(spark, out).collect()}
    assert before == after


def test_replay_after_store_write_crash_is_lossless(
    spark, doc_stream_dir, tmp_path
):
    """Crash-window replay contract (ADVICE r8, high): a batch whose
    store partition was written but whose checkpoint never committed is
    REPLAYED on restart — the replay must not probe its own prior band
    rows (it would see signature agreement 1.0 with itself and rewrite
    both partitions empty, silently losing accepted docs)."""
    from mysql2parquet_spark.streaming.neardup import fold_batch

    out = str(tmp_path / "acc")
    store = str(tmp_path / "st")
    files = sorted(glob.glob(doc_stream_dir + "/part-*.parquet"))
    params = dict(out_dir=out, store_dir=store, threshold=0.5,
                  max_band_width=None, **_SIG)
    for i, f in enumerate(files[:3]):
        fold_batch(spark.read.parquet(f), i, **params)
    accepted_before = {
        r.doc_id for r in accepted_docs(spark, out).collect()
    }
    store_docs_before = read_band_store(
        spark, store, spark.read.parquet(files[0])
    ).select("doc").distinct().count()
    assert accepted_before and store_docs_before

    # simulate the crash: batch 2's partitions are on disk (the loop
    # above wrote them) but "the checkpoint never committed" — the
    # stream replays batch_id=2 with the same input
    fold_batch(spark.read.parquet(files[2]), 2, **params)

    accepted_after = {
        r.doc_id for r in accepted_docs(spark, out).collect()
    }
    store_docs_after = read_band_store(
        spark, store, spark.read.parquet(files[0])
    ).select("doc").distinct().count()
    assert accepted_after == accepted_before
    assert store_docs_after == store_docs_before


def test_read_band_store_raises_on_corrupt_store(spark, sf_dir, tmp_path):
    """A COMMITTED partition (its _SUCCESS marker exists) that cannot
    be read must raise (ADVICE r8, medium) — silently returning an
    empty store would disable the entire dedup history for the batch
    and accept duplicates."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bad = tmp_path / "store" / "batch=0" / "part-00000.parquet"
    bad.parent.mkdir(parents=True)
    bad.write_bytes(b"PAR1 this is not a parquet footer")
    (bad.parent / "_SUCCESS").write_bytes(b"")
    with pytest.raises(Exception):
        read_band_store(spark, str(tmp_path / "store"), docs).collect()


def test_first_batch_store_write_crash_replays_clean(
    spark, doc_stream_dir, tmp_path
):
    """ADVICE r9: a crash during the very FIRST batch's store write
    leaves store_dir existing with only uncommitted task files — no
    committed footers. The replay must treat that as the empty-store
    case (and then rewrite both partitions), not die on 'unable to
    infer schema'."""
    from mysql2parquet_spark.streaming.neardup import fold_batch

    out = str(tmp_path / "acc")
    store = tmp_path / "st"
    # crash residue: the partition dir + a half-written task file, no
    # _SUCCESS marker anywhere
    junk = store / "batch=0" / "_temporary" / "0" / "task" / "part-0"
    junk.parent.mkdir(parents=True)
    junk.write_bytes(b"PAR1 partial task output, never committed")

    files = sorted(glob.glob(doc_stream_dir + "/part-*.parquet"))
    batch0 = spark.read.parquet(files[0])
    params = dict(out_dir=out, store_dir=str(store), threshold=0.5,
                  max_band_width=None, **_SIG)
    fold_batch(batch0, 0, **params)  # the replay — must not raise

    accepted = {r.doc_id for r in accepted_docs(spark, out).collect()}
    assert accepted  # batch 0 was folded with an empty history
    # the store now has a genuinely committed batch=0 partition
    st = read_band_store(spark, str(store), batch0)
    assert st.select("doc").distinct().count() == len(accepted)


def test_read_band_store_empty_schema_matches_builder(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    empty = read_band_store(spark, str("/nonexistent/x"), docs)
    built = minhash_band_store(docs.limit(5))
    assert empty.schema == built.schema
    assert empty.count() == 0
