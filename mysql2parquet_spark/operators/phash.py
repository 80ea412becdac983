"""Perceptual-hash image near-duplication (D47): DCT-based pHash over
binary image columns + Hamming-banded dedup — the C5 multimodal
plumbing joined to the C2 near-dup family, for the image side of a
training corpus (re-encoded, brightness-shifted, or resampled copies
of the same picture that exact byte dedup can never see).

Hash (public recipe — the classic pHash construction, Zauner 2010
lineage): decode → integer luma → nearest-neighbor resample to 32×32 →
2-D DCT-II → keep the top-left 8×8 low-frequency block → threshold
each coefficient against the MEDIAN of the 63 AC coefficients (DC bit
forced 0) → 64-bit signature. Two invariances are EXACT by
construction, not approximate:

- brightness shift: the integer luma is ``(77R + 150G + 29B) >> 8``
  and 77+150+29 = 256, so ``pixel + b`` becomes ``luma + b`` exactly;
  a constant shift moves ONLY the DCT DC coefficient, and the DC bit
  is excluded — the hash is bit-identical.
- the hash depends only on coefficient ORDER vs the median, so any
  positive rescale of the AC spectrum preserves it.

Spark shape: hashing is ONE ``mapInPandas`` stage — decode/resample
per row (stdlib codecs from ``operators/multimodal``), then the DCT
for the WHOLE Arrow batch as a single numpy einsum over the stacked
32×32 luma tensor (BLAS, not per-image Python loops). Downstream the
signature is an 8-byte long: exact dedup is a hash-keyed window (the
C1 machinery), near dedup pigeonholes the 64 bits into four 16-bit
chunks — Hamming distance ≤ 3 guarantees at least one identical chunk
— so candidates come from a chunk equi-join and verification is
``bit_count(a ^ b)``, pure codegen (the D21/SimHash recipe; never
O(n²)).

The reference exports blobs untouched (/root/reference/main.go:106);
this is pipeline north-star coverage like C5/C2.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_SIZE = 32  # resample edge
_BLOCK = 8  # low-frequency block edge

PHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), True),
        StructField("media_type", StringType(), True),
        StructField("phash", LongType(), True),  # NULL = undecodable
    ]
)


def _luma_matrix(content: bytes, media_type: str):
    """Decode + NN-resample to 32×32 integer luma (numpy uint16).

    Luma = (77R + 150G + 29B) >> 8 (the 256-total integer weights —
    what makes brightness shifts move luma EXACTLY, see module doc);
    single-channel and gray+alpha images use the gray channel, RGBA
    ignores alpha.
    """
    import numpy as np

    from mysql2parquet_spark.operators.multimodal import decode_any_image

    w, h, c, rows = decode_any_image(media_type, content)
    full = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, w, c)
    # numpy NN resample with resize_image_nn's exact index kernel
    # (min(n-1, (i*n)//out)) — bit-identical pixels, vectorized
    ys = np.minimum(h - 1, (np.arange(_SIZE) * h) // _SIZE)
    xs = np.minimum(w - 1, (np.arange(_SIZE) * w) // _SIZE)
    px = full[np.ix_(ys, xs)]
    if c >= 3:
        r = px[:, :, 0].astype(np.uint32)
        g = px[:, :, 1].astype(np.uint32)
        b = px[:, :, 2].astype(np.uint32)
        return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint16)
    return px[:, :, 0].astype(np.uint16)


def _dct_matrix():
    import numpy as np

    n = _SIZE
    k = np.arange(n).reshape(-1, 1).astype(np.float64)
    x = np.arange(n).reshape(1, -1).astype(np.float64)
    d = np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    d[0, :] *= 1.0 / np.sqrt(2.0)
    return d * np.sqrt(2.0 / n)  # orthonormal DCT-II


def _pack_bits(bits) -> int:
    """64 bools (raster order, bit 0 = MSB) → SIGNED 64-bit int (the
    Spark long wrap, same convention as the SimHash packing)."""
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def phash64(content: bytes, media_type: str = "image/png") -> int:
    """Single-image pHash (the per-row reference implementation; the
    distributed stage batches the DCT — bit-identical, tested)."""
    import numpy as np

    g = _luma_matrix(content, media_type).astype(np.float64)
    d = _dct_matrix()
    coef = d @ g @ d.T
    block = coef[:_BLOCK, :_BLOCK].reshape(-1)
    med = float(np.median(block[1:]))  # 63 AC coefficients, odd count
    bits = block > med
    bits[0] = False  # DC carries only brightness — excluded
    return _pack_bits(bits.tolist())


def with_phash(
    assets: DataFrame,
    *,
    id_col: str = "asset_id",
    content_col: str = "content",
    media_type_col: str = "media_type",
) -> DataFrame:
    """Arrow-batched pHash stage (ONE mapInPandas): rows decode with
    the stdlib codecs, the DCT runs ONCE per batch as a stacked einsum
    (BLAS over a (batch, 32, 32) tensor — the PQ/SimHash vectorization
    contract). Undecodable / non-image rows degrade to NULL phash
    (never a job abort — the extract_features contract)."""
    import numpy as np

    d = _dct_matrix()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mts, lumas, ok = [], [], [], []
            for i, mt, b in zip(
                pdf[id_col], pdf[media_type_col], pdf[content_col]
            ):
                ids.append(i)
                mts.append(mt)
                try:
                    lumas.append(
                        _luma_matrix(bytes(b), mt).astype(np.float64)
                    )
                    ok.append(True)
                except Exception:
                    lumas.append(np.zeros((_SIZE, _SIZE)))
                    ok.append(False)
            hashes: list[int | None] = [None] * len(ids)
            if any(ok):
                g = np.stack(lumas)  # (B, 32, 32)
                coef = np.einsum("ij,bjk,lk->bil", d, g, d)
                block = coef[:, :_BLOCK, :_BLOCK].reshape(len(ids), -1)
                med = np.median(block[:, 1:], axis=1, keepdims=True)
                bits = block > med
                bits[:, 0] = False
                for r in range(len(ids)):
                    if ok[r]:
                        hashes[r] = _pack_bits(bits[r].tolist())
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media_type": mts,
                    "phash": pd.array(hashes, dtype="Int64"),
                }
            )

    return assets.select(
        F.col(id_col).alias(id_col),
        F.col(content_col).alias(content_col),
        F.col(media_type_col).alias(media_type_col),
    ).mapInPandas(run, PHASH_SCHEMA)


def phash_dedup(
    hashed: DataFrame,
    *,
    id_col: str = "asset_id",
    hash_col: str = "phash",
    mode: str = "exact",
    max_hamming: int = 2,
) -> DataFrame:
    """Loser set over pHash signatures: one row ``(id_col, keeper)``
    per asset that duplicates a smaller-id asset (keep-lowest-id, the
    family's survivor rule). NULL hashes (undecodable rows) are never
    deduplicated — they pass through as survivors.

    ``mode="exact"``: identical 64-bit signature — ONE hash-keyed
    window exchange, ``keeper`` = the cluster's min id (transitive by
    construction).

    ``mode="hamming"``: signatures within ``max_hamming`` bits.
    Pigeonhole blocking — the 64 bits split into four 16-bit chunks,
    distance ≤ 3 forces ≥ 1 identical chunk — so candidates are a
    chunk equi-join (never O(n²); requires ``max_hamming <= 3``) and
    the verify is codegen ``bit_count(a ^ b)``. ``keeper`` = the
    smallest-id witness within range (pairwise rule — near-Hamming is
    not transitive; chain clustering is the D24 CC composition).
    """
    sig = hashed.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col), F.col(hash_col)
    )
    if mode == "exact":
        w = Window.partitionBy(hash_col).orderBy(F.col(id_col).asc())
        return (
            sig.withColumn("keeper", F.min(id_col).over(w))
            .filter(F.col(id_col) != F.col("keeper"))
            .select(id_col, "keeper")
        )
    if mode != "hamming":
        raise ValueError(f"unknown mode: {mode}")
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            "hamming mode needs 0 <= max_hamming <= 3 (the 4x16-bit "
            f"pigeonhole bound): {max_hamming}"
        )
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col(hash_col), 16 * i).bitwiseAND(
                F.lit(0xFFFF)
            )
            for i in range(4)
        ]
    )
    banded = sig.select(
        id_col, hash_col, F.posexplode(chunks).alias("band", "chunk")
    )
    a = banded.select(
        F.col(id_col).alias("_ida"),
        F.col(hash_col).alias("_ha"),
        "band",
        "chunk",
    )
    b = banded.select(
        F.col(id_col).alias("_idb"),
        F.col(hash_col).alias("_hb"),
        "band",
        "chunk",
    )
    pairs = (
        a.join(b, ["band", "chunk"])
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(
            F.bit_count(
                F.col("_ha").bitwiseXOR(F.col("_hb"))
            )
            <= max_hamming
        )
        .groupBy(F.col("_idb").alias(id_col))
        .agg(F.min("_ida").alias("keeper"))
    )
    return pairs.select(id_col, "keeper")
