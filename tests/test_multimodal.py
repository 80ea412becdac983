"""Multimodal plumbing tests (C5): binary payload columns + Arrow-batched
feature extraction via mapInPandas. Codecs are stubbed (container has no
PIL/librosa); the DISTRIBUTED path — schema, batching, partitioning —
is real and exercised here."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.operators.multimodal import (
    byte_histogram,
    decode_audio,
    decode_image,
    extract_features,
    text_as_binary_assets,
)


def test_asset_table_schema(spark, sf_dir):
    assets = text_as_binary_assets(load_table(spark, sf_dir, "documents"))
    got = {f.name: f.dataType.simpleString() for f in assets.schema.fields}
    assert got == {
        "asset_id": "bigint",
        "content": "binary",
        "media_type": "string",
        "meta": "struct<n_chars:bigint,lang:string>",
    }


def test_feature_extraction_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assets = text_as_binary_assets(docs)
    feats = extract_features(assets, bins=16)
    rows = feats.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert r.media_type == "text/plain"
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-9  # normalized histogram
    # n_bytes equals utf-8 length of the text payload
    joined = feats.join(docs, feats.asset_id == docs.doc_id).select(
        "n_bytes", F.length(F.encode("text", "utf-8")).alias("want")
    )
    assert joined.filter(F.col("n_bytes") != F.col("want")).count() == 0


def test_feature_extraction_partitioned(spark, sf_dir):
    """The mapInPandas path must produce identical results regardless of
    partitioning — no per-partition state leakage."""
    assets = text_as_binary_assets(load_table(spark, sf_dir, "documents"))
    one = extract_features(assets.coalesce(1)).collect()
    many = extract_features(assets.repartition(7)).collect()
    key = lambda r: r.asset_id  # noqa: E731
    assert sorted(one, key=key) == sorted(many, key=key)


def test_byte_histogram_deterministic_and_empty():
    assert byte_histogram(b"") == [0.0] * 16
    h = byte_histogram(bytes(range(256)))
    assert len(h) == 16 and all(abs(x - 1 / 16) < 1e-9 for x in h)
    assert byte_histogram(b"abc") == byte_histogram(b"abc")


def test_codec_stubs_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")
