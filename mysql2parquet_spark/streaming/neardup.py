"""Streaming near-dup curation (D36): a document stream deduplicated
against everything ever accepted, via the persisted LSH band store.

This is the streaming face of D25's ``incremental_minhash_dedup``: the
nightly-crawl shape ("drop paraphrase-level copies of anything already
accepted on ANY previous night") running continuously. Structured
Streaming's built-in ``dropDuplicates`` state can't express near-dup
(state would need the full signature index and a similarity probe), so
the right composition is ``foreachBatch`` + the band store:

- per micro-batch: probe the store (bucket-pruned equi-join on
  (band_idx, band_key)), drop batch docs that collide with history or
  with a smaller-id batch-mate (the family keeper contract), append
  survivors to the accepted output AND their band rows to the store;
- state is the on-disk store, not executor memory — restarts resume
  from the checkpoint and the store is exactly as the last committed
  batch left it;
- exactly-once: each batch writes into ``batch=<id>`` partitions with
  ``overwrite`` — a replayed batch id rewrites its own partitions
  byte-identically instead of duplicating them. The probe reads only
  ``batch < batch_id`` store partitions, so a crash between the store
  write and the checkpoint commit cannot make the replay see (and be
  deduplicated against) its own half-committed band rows.

Scale posture inherited from D25: the store is written partitioned (at
scale: bucketed) by the band keys, so a batch's probe prunes to the
colliding buckets; ``max_band_width`` caps boilerplate-band fan-out
(under-removal-only). The accepted corpus is never re-mined — only its
KB-per-thousand-docs band rows participate.

The reference has no streaming surface (/root/reference/main.go is a
one-shot export); this is pipeline north-star coverage like B31-B35.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.dedup import (
    incremental_minhash_dedup,
    minhash_band_store,
)


def _path_exists(spark, path: str) -> bool:
    """Hadoop-FS existence check (no exception-shape guessing)."""
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _has_committed_batch(spark, store_dir: str) -> bool:
    """True iff at least one ``batch=*`` partition finished its write
    (its ``_SUCCESS`` marker exists).

    A crash during the very FIRST batch's store write leaves
    ``store_dir`` existing but holding only uncommitted task files —
    existence alone would then route the replay into
    ``spark.read.parquet`` with no committed footers ("unable to infer
    schema"), failing the replay-after-crash-at-ANY-point contract
    (ADVICE r9). Checking for a committed partition marker keeps that
    case on the empty-store path while corrupt footers inside a
    COMMITTED partition still raise. (Relies on Hadoop's default
    ``_SUCCESS`` markers; the store writer never disables them.)
    """
    jvm = spark._jvm
    jsc = spark._jsc
    root = jvm.org.apache.hadoop.fs.Path(store_dir)
    fs = root.getFileSystem(jsc.hadoopConfiguration())
    for st in fs.listStatus(root):
        if not st.isDirectory():
            continue
        name = st.getPath().getName()
        if not name.startswith("batch="):
            continue
        marker = jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
        if fs.exists(marker):
            return True
    return False


def read_band_store(
    spark, store_dir: str, like: DataFrame, *, before_batch: int | None = None
) -> DataFrame:
    """The current store, or an empty one with the correct schema (from
    the same builder that writes it — no hand-maintained schema to
    drift) when no batch has committed yet.

    ``before_batch`` is the exactly-once guard: a micro-batch replayed
    after a crash-between-store-write-and-checkpoint-commit must never
    probe its OWN prior ``batch=<id>`` partition (it would observe
    signature agreement 1.0 with itself, drop every doc, and overwrite
    the partition with empty data). Passing the current batch id keeps
    only strictly-earlier history via the ``batch`` partition column —
    partition pruning, not a data scan. A missing store path AND a
    store path with no committed ``batch=*`` partition (the
    crash-during-first-store-write residue — only uncommitted task
    files on disk) both fall back to empty; any other read failure
    (corrupt footer inside a committed partition, permissions) raises
    rather than silently disabling dedup history.
    """
    if not _path_exists(spark, store_dir) or not _has_committed_batch(
        spark, store_dir
    ):
        return minhash_band_store(like.limit(0))
    store = spark.read.parquet(store_dir)
    if before_batch is not None:
        store = store.filter(F.col("batch") < F.lit(int(before_batch)))
    return store.select("band_idx", "band_key", "doc", "sig")


def fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    out_dir: str,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    max_band_width: int | None = 16,
) -> None:
    """One micro-batch of the curation fold (module-level so the
    crash-replay contract is testable without a streaming harness).

    Probes only ``batch < batch_id`` history (see ``read_band_store``),
    then overwrites this batch's own ``batch=<id>`` partitions in the
    accepted output and the band store — a replay after a crash at ANY
    point in this function rewrites both partitions with the same data
    it would have written the first time.
    """
    spark = batch_df.sparkSession
    store = read_band_store(
        spark, store_dir, batch_df, before_batch=batch_id
    )
    survivors = incremental_minhash_dedup(
        batch_df,
        store,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        max_band_width=max_band_width,
    )
    # the batch is re-used twice (survivor write + band build):
    # pin it so the dedup joins don't recompute per action
    survivors = survivors.localCheckpoint(eager=True)
    survivors.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
    minhash_band_store(
        survivors,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
    ).write.mode("overwrite").parquet(f"{store_dir}/batch={batch_id}")


def streaming_neardup_sink(
    stream_docs: DataFrame,
    *,
    out_dir: str,
    store_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    max_band_width: int | None = 16,
):
    """Start the streaming near-dup curation query. Accepted docs land
    under ``out_dir/batch=<id>/``, their band rows under
    ``store_dir/batch=<id>/``. Returns the StreamingQuery.

    Signature params are pinned here and MUST NOT change for the life
    of the store (a store probed with different shingle/hash params is
    silently meaningless — same contract as ``incremental_minhash_dedup``).
    """

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            batch_df,
            batch_id,
            out_dir=out_dir,
            store_dir=store_dir,
            id_col=id_col,
            text_col=text_col,
            shingle_n=shingle_n,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
            max_band_width=max_band_width,
        )

    return (
        stream_docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def accepted_docs(spark, out_dir: str) -> DataFrame:
    """Everything accepted so far (the ``batch`` partition column is
    dropped — it is commit bookkeeping, not data)."""
    return spark.read.parquet(out_dir).drop("batch")
