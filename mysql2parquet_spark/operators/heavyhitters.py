"""Certified exact heavy hitters (D34): top-k most frequent keys
WITHOUT the full-cardinality exchange.

The plain ``GROUP BY key ORDER BY count DESC LIMIT k`` is exact but its
exchange carries one row per DISTINCT key — at 100 TB of crawl data
keyed by URL or document fingerprint that is billions of rows of
shuffle for an answer of size k. The classic two-pass fix:

1. **Candidates** — one pass of per-partition Misra-Gries summaries
   (``m`` counters, batch-vectorized over Arrow batches inside
   ``mapInPandas``; counters persist across the partition's batches).
   MG's guarantee: every key whose count within partition i exceeds
   ``N_i/(m+1)`` survives partition i's summary. By weighted
   pigeonhole, every key with GLOBAL count > ``N/(m+1)`` must exceed
   that local bound somewhere, so the union of partition summaries
   (≤ m rows per partition — bounded metadata, not data) is a
   guaranteed SUPERSET of every sufficiently-heavy key.
2. **Exact verify** — second scan counts ONLY the candidates (a
   broadcast semi-join feeds the aggregate, so the exchange carries at
   most |candidates| partial rows per task), then top-k under the
   total (count DESC, key ASC) order via a TakeOrderedAndProject heap.
3. **Certificate** — the result is provably the exact global top-k iff
   the k-th exact count strictly exceeds ``N/(m+1)`` (no non-candidate
   can beat it). The boolean rides on every output row; ``certified =
   false`` means "increase m and re-run", never a silently-wrong
   answer.

Scale shape: two scans (column-pruned to the key), ZERO full-stream
exchanges — the only shuffled relations are the candidate set and the
1-row certificate. NULL keys are ignored (a NULL is not a key; same
contract as the md5 samplers). The reference has no aggregation surface
at all (/root/reference/main.go:106 delegates to MySQL); this is
pipeline north-star coverage like D9/D19.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    *,
    k: int,
    m: int | None = None,
) -> DataFrame:
    """Exact top-``k`` keys by frequency with a correctness certificate.

    Columns: ``key_col``, ``n_exact`` (exact count), ``certified``
    (true iff the k-th count > N/(m+1), i.e. the two-pass answer is
    provably identical to the full GROUP BY — see module doc).

    ``m`` (default ``max(8k, 256)``) is the Misra-Gries counter budget
    PER PARTITION: memory is O(m) per task, candidate volume is at most
    m × partitions rows. Larger m certifies flatter distributions at
    the cost of a bigger (still tiny) candidate set.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    m = m if m is not None else max(8 * k, 256)
    if m < k:
        raise ValueError(f"m ({m}) must be >= k ({k})")

    key_field = df.schema[key_col]
    mg_schema = StructType(
        [
            StructField(key_col, key_field.dataType, True),
            StructField("_pn", LongType(), False),
        ]
    )

    def mg_partition(batches):
        import pandas as pd

        counters: "pd.Series | None" = None
        total = 0
        for pdf in batches:
            # N counts KEYED rows only (ADVICE r8): len(pdf) would add
            # NULL-key rows that value_counts drops, inflating the
            # N/(m+1) certificate threshold — conservative-only, but it
            # could report certified=false on a provably-exact run and
            # it contradicts the "NULL keys are ignored" contract.
            total += int(pdf[key_col].notna().sum())
            vc = pdf[key_col].value_counts()  # dropna=True: NULLs out
            counters = vc if counters is None else counters.add(
                vc, fill_value=0
            )
            if len(counters) > m:
                # batched MG decrement: subtract the (m+1)-th largest
                # count from everyone, drop the non-positive — each
                # key's stored count falls at most N_i/(m+1) below its
                # true partition count, which is exactly the guarantee
                # the certificate consumes.
                s = counters.sort_values(ascending=False)
                delta = s.iloc[m]
                counters = s.iloc[: m + 1] - delta
                counters = counters[counters > 0]
        keys = [] if counters is None else list(counters.index)
        yield pd.DataFrame(
            {
                key_col: keys + [None],
                "_pn": [0] * len(keys) + [total],
            }
        )

    summary = df.select(key_col).mapInPandas(mg_partition, mg_schema)
    # one tiny materialization feeds BOTH the candidate set and N; at
    # most (m+1) x partitions rows by construction. localCheckpoint
    # (not persist) so the blocks are released with the plan instead of
    # pinning a cache entry nobody unpersists (ADVICE r8) — and the
    # candidate/N consumers start from a flat lineage.
    summary = summary.localCheckpoint(eager=True)
    candidates = (
        summary.filter(F.col(key_col).isNotNull()).select(key_col).distinct()
    )
    total_n = summary.filter(F.col(key_col).isNull()).agg(
        F.sum("_pn").alias("_N")
    )

    exact = (
        df.filter(F.col(key_col).isNotNull())
        .join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    topk = exact.orderBy(F.col("n_exact").desc(), key_col).limit(k)
    cert = (
        topk.agg(F.min("n_exact").alias("_kth"))
        .crossJoin(F.broadcast(total_n))
        .select(
            (
                F.col("_kth").cast("double")
                > F.col("_N").cast("double") / F.lit(float(m + 1))
            ).alias("certified")
        )
    )
    return topk.crossJoin(F.broadcast(cert))
