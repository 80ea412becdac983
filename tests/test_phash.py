"""D47: perceptual-hash image near-dup — DCT pHash over binary image
columns, exact and Hamming-banded dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.multimodal import (
    encode_bmp_gray,
    synth_bmp_assets,
)
from mysql2parquet_spark.operators.phash import (
    phash64,
    phash_dedup,
    with_phash,
)


def _pattern(gid: int, size: int = 16, mod: int = 181):
    import hashlib

    out: list[int] = []
    blk = 0
    while len(out) < size * size:
        out.extend(hashlib.md5(f"phash-pat:{gid}:{blk}".encode()).digest())
        blk += 1
    return [
        [out[y * size + x] % mod for x in range(size)] for y in range(size)
    ]


def test_phash_brightness_invariance_exact():
    """The module-doc claim, verified: pixel+b shifts integer luma by
    exactly b (the 256-total weights), which moves only the DCT DC
    coefficient — excluded — so the hash is BIT-identical."""
    base = _pattern(7)
    h0 = phash64(encode_bmp_gray(base), "image/bmp")
    for b in (1, 30, 74):
        shifted = [[v + b for v in row] for row in base]
        assert phash64(encode_bmp_gray(shifted), "image/bmp") == h0


def test_phash_codec_agnostic():
    """Same pixels through the BMP and PNG codecs hash identically
    (both decode to the same RGB rows)."""
    from tests.test_multimodal import make_png

    base = _pattern(3)
    bmp = encode_bmp_gray(base)
    png = make_png([[(v, v, v) for v in row] for row in base])
    assert phash64(bmp, "image/bmp") == phash64(png, "image/png")


def test_phash_separates_different_images():
    hs = {
        phash64(encode_bmp_gray(_pattern(g)), "image/bmp")
        for g in range(40)
    }
    assert len(hs) == 40


def test_with_phash_batch_matches_single(spark):
    """The batched einsum DCT must be bit-identical to the per-row
    reference, and undecodable rows degrade to NULL."""
    rows = [
        Row(asset_id=g, content=bytearray(encode_bmp_gray(_pattern(g))),
            media_type="image/bmp")
        for g in range(8)
    ]
    rows.append(Row(asset_id=99, content=bytearray(b"not an image"),
                    media_type="image/bmp"))
    rows.append(Row(asset_id=100, content=bytearray(b"plain text"),
                    media_type="text/plain"))
    df = spark.createDataFrame(rows)
    got = {r["asset_id"]: r["phash"] for r in with_phash(df).collect()}
    for g in range(8):
        assert got[g] == phash64(encode_bmp_gray(_pattern(g)), "image/bmp")
    assert got[99] is None and got[100] is None


def test_exact_dedup_finds_planted_clusters(spark):
    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    assets = synth_bmp_assets(docs, groups=10)
    losers = phash_dedup(with_phash(assets), mode="exact")
    got = {r["asset_id"]: r["keeper"] for r in losers.collect()}
    # every asset except the 10 group minima is a loser; keeper = the
    # group's min id = id % 10
    assert len(got) == 190
    for aid, keeper in got.items():
        assert keeper == aid % 10
    # NULL hashes survive: a corrupt row never appears in the losers
    broken = spark.createDataFrame(
        [Row(asset_id=7_000, content=bytearray(b"x"),
             media_type="image/bmp")]
    )
    both = assets.unionByName(broken)
    got2 = {r["asset_id"] for r in
            phash_dedup(with_phash(both), mode="exact").collect()}
    assert 7_000 not in got2


def test_hamming_dedup_on_synthetic_hashes(spark):
    """Banded Hamming mode, checked on constructed signatures: ≤
    max_hamming flips are caught through the 4×16 pigeonhole, farther
    pairs are not, keeper is the smallest in-range witness."""
    base = 0x0123_4567_89AB_CDEF
    rows = [
        Row(asset_id=1, phash=base),
        Row(asset_id=2, phash=base ^ 0b101),          # distance 2 from 1
        Row(asset_id=3, phash=base ^ (1 << 63)),      # distance 1 from 1
        Row(asset_id=4, phash=base ^ 0xF000_0000_0000_000F
            if base ^ 0xF000_0000_0000_000F < (1 << 63)
            else (base ^ 0xF000_0000_0000_000F) - (1 << 64)),  # distance 8
        Row(asset_id=5, phash=None),                  # undecodable
    ]
    # normalize to signed longs
    rows = [
        Row(asset_id=r.asset_id,
            phash=(r.phash - (1 << 64)
                   if r.phash is not None and r.phash >= (1 << 63)
                   else r.phash))
        for r in rows
    ]
    df = spark.createDataFrame(rows, "asset_id long, phash long")
    got = {r["asset_id"]: r["keeper"] for r in phash_dedup(
        df, mode="hamming", max_hamming=2
    ).collect()}
    assert got == {2: 1, 3: 1}  # 4 is out of range, 5 has no hash
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_dedup(df, mode="hamming", max_hamming=4)
    with pytest.raises(ValueError, match="unknown mode"):
        phash_dedup(df, mode="fuzzy")


def test_phash_dedup_deterministic_across_partitionings(spark):
    docs = spark.range(300).select(F.col("id").alias("doc_id"))
    a = sorted(map(tuple, phash_dedup(
        with_phash(synth_bmp_assets(docs.repartition(3), groups=12))
    ).collect()))
    b = sorted(map(tuple, phash_dedup(
        with_phash(synth_bmp_assets(docs.repartition(17), groups=12))
    ).collect()))
    assert a == b and len(a) == 288


def test_phash_dedup_plans(spark):
    docs = spark.range(100).select(F.col("id").alias("doc_id"))
    hashed = with_phash(synth_bmp_assets(docs, groups=5))
    exact = phash_dedup(hashed, mode="exact")
    p = exact._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    # one hash-keyed window exchange carries the whole exact mode
    assert p.count("Exchange") <= 1, p
    near = phash_dedup(hashed, mode="hamming", max_hamming=2)
    p2 = near._jdf.queryExecution().executedPlan().toString()
    # candidates come from the (band, chunk) EQUI-join — any hash join
    # strategy qualifies (AQE broadcasts the small fixture side; at
    # scale it sort-merges on the chunk key), a cartesian never does
    assert "CartesianProduct" not in p2
    assert "BroadcastNestedLoopJoin" not in p2
    assert ("SortMergeJoin" in p2 or "ShuffledHashJoin" in p2
            or "BroadcastHashJoin" in p2), p2
    assert "bit_count" in p2  # codegen verify, not a UDF
