"""Capstone integration: the training-data pipeline operators composed
end-to-end and MATERIALIZED — curate → pack into training sequences →
land range-clustered parquet → re-read. Each operator is oracle- or
invariant-tested on its own; this pins that they compose (schemas line
up, assignments survive a write/read cycle, the landed layout is the
one the serving path expects)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table, write_clustered
from mysql2parquet_spark.operators.pipeline import curate_corpus, pack_sequences


def test_pipeline_end_to_end_materialized(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    curated = curate_corpus(
        docs, min_quality=0.2, languages=["en", "es", "de", "fr", "zh"]
    )
    n_curated = curated.count()
    assert 0 < n_curated <= docs.count()

    packed = pack_sequences(curated, budget=512, n_shards=4)
    with_text = packed.join(curated.select("doc_id", "text", "lang"), "doc_id")
    assert with_text.count() == n_curated  # no doc lost or duplicated

    out = str(tmp_path / "training_corpus")
    write_clustered(with_text, out, cluster_by=["shard", "bin"], n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == n_curated
    assert set(back.columns) >= {"doc_id", "shard", "bin", "n_toks", "text"}

    # bins stay dense per shard after the round trip
    per_shard = (
        back.groupBy("shard")
        .agg(F.max("bin").alias("mx"), F.count_distinct("bin").alias("nd"))
        .collect()
    )
    assert len(per_shard) == 4
    for r in per_shard:
        assert r.nd == r.mx + 1, f"shard {r.shard}: bins not dense"

    # landed layout: several files, each owning a narrow (shard, bin) range
    n_files = back.select(F.input_file_name()).distinct().count()
    assert n_files > 1


# --------------------------------------------------------------------------
# shuffle_shards: determinism across partitionings, shard balance,
# payload carry-through
# --------------------------------------------------------------------------

def test_shuffle_shards_deterministic_across_partitionings(spark, sf_dir):
    from mysql2parquet_spark.operators.pipeline import shuffle_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    a = shuffle_shards(docs.repartition(1), seed=7, n_shards=8)
    b = shuffle_shards(docs.repartition(13), seed=7, n_shards=8)
    ra = sorted((r.doc_id, r.shard, r.pos) for r in a.collect())
    rb = sorted((r.doc_id, r.shard, r.pos) for r in b.collect())
    assert ra == rb  # seed-reproducible order at any cluster size

    # a different seed must actually reshuffle
    c = shuffle_shards(docs, seed=8, n_shards=8)
    rc = sorted((r.doc_id, r.shard, r.pos) for r in c.collect())
    assert rc != ra


def test_shuffle_shards_balance_and_payload(spark, sf_dir):
    from mysql2parquet_spark.operators.pipeline import shuffle_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    n = docs.count()
    out = shuffle_shards(docs, seed=42, n_shards=8)
    assert set(out.columns) == {"doc_id", "lang", "shard", "pos"}  # payload kept
    sizes = {r.shard: r.n for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert len(sizes) == 8 and sum(sizes.values()) == n
    # md5 is uniform: no shard more than 2x the ideal share at 500 docs
    assert max(sizes.values()) <= 2 * (n / 8)
    # pos is a permutation of 1..size within each shard
    chk = out.groupBy("shard").agg(
        F.min("pos").alias("lo"), F.max("pos").alias("hi"),
        F.count_distinct("pos").alias("d"), F.count("*").alias("n"),
    )
    for r in chk.collect():
        assert (r.lo, r.hi, r.d) == (1, r.n, r.n)


def test_shuffle_shards_duplicate_ids_still_total_order(spark):
    """Duplicate ids hash identically — the (id, shard, pos) MULTISET
    must stay deterministic across partitionings. (Which payload row of
    a duplicate group gets which pos is NOT guaranteed — they tie on the
    whole sort key; the docstring tells callers to dedup first if
    payload→pos stability matters.)"""
    from mysql2parquet_spark.operators.pipeline import shuffle_shards

    dup = spark.createDataFrame(
        [(i % 5, f"p{i}") for i in range(40)], "doc_id int, payload string"
    )
    a = sorted(
        (r.doc_id, r.shard, r.pos)
        for r in shuffle_shards(dup.repartition(2), seed=1, n_shards=4).collect()
    )
    b = sorted(
        (r.doc_id, r.shard, r.pos)
        for r in shuffle_shards(dup.repartition(7), seed=1, n_shards=4).collect()
    )
    assert a == b
