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
