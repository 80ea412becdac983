"""Bloom-pruned join: a semi-join runtime filter with BOUNDED state.

The 100 TB problem this solves: a fact⋈dim equi-join where the dim
side's key set is too large to broadcast as rows (hundreds of millions
of distinct keys × wide key payloads) but the fact side is still
mostly NON-matching — the classic "join wastes its shuffle moving rows
that match nothing" shape. Spark's own runtime bloom filters
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) cover the
planner-visible cases; this operator is the explicit, composable form
for when the build side is an arbitrary DataFrame (a fingerprint
store, an accepted-history snapshot) and the caller wants the prune as
a first-class step it can test, size, and reuse.

Shape (all sizes bounded and independent of key cardinality):

1. **Hash JVM-side.** Both sides compute ``xxhash64`` over the key
   columns inside whole-stage codegen — Python never sees a key, only
   two int64s per row.
2. **Build = one scan + KB..MB of state.** ``mapInPandas`` folds each
   build-side partition into one ``num_bits/8``-byte numpy bit array;
   the per-partition partials (n_partitions × that) are OR-merged on
   the driver — an annotated bounded-metadata collect, same class as
   the k×dim centroid pull in similarity.py — and rebroadcast once.
3. **Probe = Arrow-vectorized, zero shuffle.** A pandas UDF tests the
   k double-hashed bit positions for a whole Arrow batch in numpy; the
   fact side is filtered BEFORE its join exchange, so the shuffle
   moves only candidates.
4. **Verify exactly.** Survivors run the ordinary equi-join. Bloom
   filters have NO false negatives, so for ``inner``/``left_semi``
   joins the output is bit-identical to the unpruned join — false
   positives are just rows the verify join discards. That makes the
   whole operator oracle-checkable against the plain join.

``how`` is restricted to inner/left_semi: pruning the fact side would
CHANGE a left/full outer join's result (unmatched fact rows must
survive those), so the operator refuses rather than silently corrupt.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_H1 = "_bloom_h1"
_H2 = "_bloom_h2"
_H2_SALT = "m2p-bloom-h2"


def _with_hashes(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Two independent 64-bit key hashes, computed JVM-side.

    ``xxhash64`` is Spark-native (codegen, no Python). The second hash
    prepends a literal salt column so the two streams are decorrelated;
    the probe ORs h2 with 1 so double hashing never degenerates to a
    single stuck position.
    """
    return df.withColumn(_H1, F.xxhash64(*key_cols)).withColumn(
        _H2, F.xxhash64(F.lit(_H2_SALT), *key_cols)
    )


def _positions(h1: np.ndarray, h2: np.ndarray, i: int, num_bits: int) -> np.ndarray:
    """Bit position i via double hashing, uint64 wraparound arithmetic.

    Identical formula on build and probe is the only requirement;
    numpy's defined uint64 overflow gives that deterministically.
    """
    return (h1 + np.uint64(i) * h2) % np.uint64(num_bits)


def build_bloom(
    df: DataFrame, key_cols: list[str], *, num_bits: int = 1 << 23, num_hashes: int = 5
) -> bytes:
    """Fold a DataFrame's keys into one ``num_bits``-bit Bloom filter.

    One scan; each partition yields a single ``num_bits/8``-byte
    partial (mapInPandas, numpy bit ops), OR-merged driver-side. The
    collect is bounded metadata — n_partitions × num_bits/8 bytes,
    never keys or rows — the same annotated class as similarity.py's
    centroid pull.
    """
    nb, k = int(num_bits), int(num_hashes)
    if nb < 8 or k < 1:
        raise ValueError(f"need num_bits >= 8 and num_hashes >= 1, got {nb}/{k}")
    hashed = _with_hashes(df, key_cols).select(_H1, _H2)

    def fold(batches):
        bits = np.zeros(nb // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if pdf.empty:
                continue
            seen = True
            h1 = pdf[_H1].to_numpy().astype(np.uint64)
            h2 = pdf[_H2].to_numpy().astype(np.uint64) | np.uint64(1)
            for i in range(k):
                pos = _positions(h1, h2, i, nb)
                np.bitwise_or.at(
                    bits,
                    (pos >> np.uint64(3)).astype(np.int64),
                    (np.uint64(1) << (pos & np.uint64(7))).astype(np.uint8),
                )
        if seen:
            yield pd.DataFrame({"bloom": [bits.tobytes()]})

    partials = hashed.mapInPandas(fold, schema="bloom binary").collect()  # bounded-metadata
    merged = np.zeros(nb // 8, dtype=np.uint8)
    for row in partials:
        merged |= np.frombuffer(row.bloom, dtype=np.uint8)
    return merged.tobytes()


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    *,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` with the fact side Bloom-pruned before
    its shuffle. Output is EXACTLY the plain join's (no false
    negatives; false positives die in the verify join), so the oracle
    for any query built on this is the unpruned join.
    """
    allowed = {"inner", "left_semi", "leftsemi", "semi"}
    if how not in allowed:
        raise ValueError(
            f"bloom_prune_join supports how in {sorted(allowed)} — '{how}' "
            "would drop unmatched fact rows an outer join must keep"
        )
    nb, k = int(num_bits), int(num_hashes)
    bloom = build_bloom(dim.select(*on), on, num_bits=nb, num_hashes=k)
    bv = fact.sparkSession.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bits = np.frombuffer(bv.value, dtype=np.uint8)
        a = h1.to_numpy().astype(np.uint64)
        b = h2.to_numpy().astype(np.uint64) | np.uint64(1)
        keep = np.ones(len(a), dtype=bool)
        for i in range(k):
            pos = _positions(a, b, i, nb)
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            keep &= ((byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1) > 0
        return pd.Series(keep)

    # The probe IS deterministic, but Catalyst's InferFiltersFromConstraints
    # mirrors a deterministic filter through the equi-join onto the DIM
    # side — a second Arrow probe over every build row that is true by
    # construction (its keys set those very bits): pure Python-eval cost,
    # plan-visible as a duplicate ArrowEvalPython under the build branch.
    # asNondeterministic() pins the filter to the fact side it was
    # written on (pinned in tests/test_bloom_advisor.py).
    might_contain = might_contain.asNondeterministic()

    pruned = (
        _with_hashes(fact, on)
        .filter(might_contain(F.col(_H1), F.col(_H2)))
        .drop(_H1, _H2)
    )
    return pruned.join(dim, on, how)
