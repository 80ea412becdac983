"""Hashing / sketching expression builders for dedup operators.

All JVM-side built-ins: ``F.hash`` (Murmur3, seedable by mixing a literal
column), ``xxhash64``, ``md5``. No Python in the per-row path — at 100 TB
these run inside whole-stage codegen as pure projections.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str, pattern: str = r"\s+") -> Column:
    """Whitespace tokenizer → array<string>."""
    return F.split(F.trim(_c(text)), pattern)


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles of a text column → array<string>.

    Built from built-ins only: tokenize, then for each start offset i join
    tokens[i, i+n). Documents shorter than n tokens yield a single shingle
    of all their tokens (so they still participate in dedup).
    """
    toks = tokens(text)
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), n_sh - F.lit(1))
    return F.transform(
        idx,
        lambda i: F.array_join(F.slice(toks, i + F.lit(1), F.lit(n)), " "),
    )


def seeded_hash(col: Column | str, seed: int) -> Column:
    """Murmur3 32-bit hash of ``col`` mixed with a seed literal.

    ``F.hash(seed_lit, col)`` folds the seed into the hash state, giving an
    independent-enough family for minhash."""
    return F.hash(F.lit(seed), _c(col))


def _seeded_hasher(seed: int):
    # NB: a closure, not `lambda s, j=j: ...` — PySpark's higher-order
    # functions dispatch on lambda ARITY, so a defaulted second parameter
    # would be bound to the (element, index) lambda variable instead.
    return lambda s: seeded_hash(s, seed)


def minhash_signature(shingle_arr: Column | str, num_hashes: int = 32) -> Column:
    """MinHash signature: array of ``num_hashes`` ints, element j =
    min over shingles of hash_j(shingle). Pure projection — scales
    linearly, no shuffle."""
    arr = _c(shingle_arr)
    return F.array(
        *[
            F.array_min(F.transform(arr, _seeded_hasher(j)))
            for j in range(num_hashes)
        ]
    )


def band_hashes(signature: Column | str, bands: int, rows_per_band: int) -> Column:
    """LSH banding: split the signature into ``bands`` groups of
    ``rows_per_band`` and hash each group → array<int> of band keys.
    Two docs sharing ANY band key become a candidate pair."""
    sig = _c(signature)
    return F.array(
        *[
            F.hash(
                F.lit(b),
                F.array_join(
                    F.transform(
                        F.slice(sig, b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                ),
            )
            for b in range(bands)
        ]
    )


def simhash64(token_arr: Column | str) -> Column:
    """64-bit SimHash of a token array, built-ins only.

    Each token hashes to 64 bits (xxhash64); for each bit position the
    weighted sum of ±1 votes is computed and the sign becomes the output
    bit. Expressed as: for bit k, count tokens with bit k set vs total;
    bit k of result = (2*count_set > n_tokens).
    """
    toks = _c(token_arr)
    h = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(toks)

    def bit_test(k: int):
        mask = F.shiftleft(F.lit(1).cast("bigint"), k)
        return lambda x: x.bitwiseAND(mask) != F.lit(0)

    bits = [
        F.when(
            F.lit(2) * F.size(F.filter(h, bit_test(k))) > n,
            F.shiftleft(F.lit(1).cast("bigint"), k),
        ).otherwise(F.lit(0).cast("bigint"))
        for k in range(64)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def hamming64(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two int64 simhashes via bit_count(xor)."""
    return F.bit_count(_c(a).bitwiseXOR(_c(b)))
