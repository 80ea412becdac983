"""Product quantization for embedding columns (D37): 4-32× vector
compression with table-lookup (ADC) scoring — the memory-side scale
path that completes the C3 similarity family (brute exact → LSH/IVF
probe pruning → PQ compressed residency).

At 100 TB an embedding column dominates storage and scan cost: 64
float64 dims = 512 B/row. PQ (Jégou, Douze, Schmid 2011 — public)
splits each vector into ``m`` subspaces, k-means-quantizes each
subspace independently, and stores only the m one-byte code indices:
64 dims → 8 bytes at m=8/k≤256. Query scoring never decodes — an
asymmetric distance computation (ADC) table of m×k partial dot
products is built ONCE per query driver-side (bounded metadata), and
each row's score is m table lookups.

Spark shapes:

- **train** — one ``kmeans_lite`` per subspace over the SLICED vectors
  (the engine's audited Lloyd's loop: sampled train set, flat lineage
  per iteration, k×dim_sub metadata between iterations). m small
  driver-sequenced trainings; the corpus is scanned m× at train time
  only (train once, amortize forever — the ivf_build contract).
- **encode** — ONE Arrow projection: the m×k×dim_sub codebook tensor
  closes over a pandas UDF; each batch argmins all subspaces with
  numpy matmuls (the ivf_assign arrow path, per subspace). Zero
  shuffles, plan-pinned in tests.
- **score/topk** — ONE Arrow projection over the codes (numpy fancy
  indexing into the per-query ADC table) + a TakeOrderedAndProject
  heap. The full-precision column never participates; at scale the
  codes table is what stays hot.

Approximate by construction (quantization error), so the registered
query is rows-only; tests gate recall against ``brute_force_topk`` and
pin encode determinism across partitionings.

The reference exports embedding-free rows (/root/reference/main.go);
this is Tier C3 north-star coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.similarity import (
    collect_centroids,
    kmeans_lite,
)


def pq_train(
    emb: DataFrame,
    *,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction: float = 1.0,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train the PQ codebook: ``m`` independent k-means quantizers over
    the vector's m equal slices. Returns ``codebooks[s][c] = centroid c
    of subspace s`` — m×k×(dim/m) bounded METADATA (the persistable
    artifact), not data.

    ``dim`` defaults to the first row's length; it must divide by m.
    """
    if dim is None:
        first = emb.select(vec_col).first()  # bounded-metadata: 1 vector
        if first is None:
            raise ValueError("pq_train: empty corpus")
        dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    train = (
        emb.sample(fraction=train_fraction, seed=seed)
        if train_fraction < 1.0
        else emb
    )
    codebooks: list[list[list[float]]] = []
    for s in range(m):
        sliced = train.select(
            id_col, F.slice(vec_col, s * sub + 1, sub).alias(vec_col)
        )
        cents_df = kmeans_lite(
            sliced, k=k, iters=iters, id_col=id_col, vec_col=vec_col
        )
        cents = collect_centroids(cents_df, vec_col=vec_col)
        # kmeans_lite ids are 0..k-1 already; keep positional order
        codebooks.append([v for _, v in sorted(cents)])
    return codebooks


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to its m subspace code indices. ONE Arrow
    projection (numpy argmin-by-L2 per subspace, batched matmul), zero
    shuffles. Columns: ``id_col``, ``codes array<int>``.

    Determinism: L2 ties break to the SMALLEST centroid index
    (np.argmin contract), a pure function of (vector, codebook) — so
    codes are identical under any partitioning.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    cb = [np.asarray(c, dtype=np.float64) for c in codebooks]  # m×k×sub
    sub = cb[0].shape[1]
    sq = [(c * c).sum(axis=1) for c in cb]  # hoisted |c|^2 per subspace

    @pandas_udf("array<int>")
    def enc(vecs):
        import pandas as pd

        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray(list(vecs), dtype=np.float64)  # b×dim
        out = np.empty((mat.shape[0], m), dtype=np.int32)
        for s in range(m):
            x = mat[:, s * sub : (s + 1) * sub]  # b×sub
            # argmin ||x-c||^2 = argmin |c|^2 - 2 x.c (|x|^2 constant/row)
            d = sq[s][None, :] - 2.0 * (x @ cb[s].T)
            out[:, s] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return emb.select(id_col, enc(F.col(vec_col)).alias("codes"))


def pq_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    metric: str = "l2",
    exclude_id=None,
) -> DataFrame:
    """Approximate top-k by ADC: the m×k distance table is built ONCE
    driver-side from (query, codebooks) — bounded metadata — and each
    row costs m numpy table lookups. Columns: ``id_col``, ``score``
    (negated L2² so higher = closer, or the dot product for
    ``metric='dot'``); top-k under (score DESC, id ASC)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    cb = [np.asarray(c, dtype=np.float64) for c in codebooks]
    sub = cb[0].shape[1]
    q = np.asarray(query_vec, dtype=np.float64)
    if q.shape[0] != m * sub:
        raise ValueError(f"query dim {q.shape[0]} != {m * sub}")
    if metric == "l2":
        table = np.stack(
            [((cb[s] - q[s * sub : (s + 1) * sub]) ** 2).sum(axis=1)
             for s in range(m)]
        )  # m×k partial squared distances
        sign = -1.0
    elif metric == "dot":
        table = np.stack(
            [cb[s] @ q[s * sub : (s + 1) * sub] for s in range(m)]
        )
        sign = 1.0
    else:
        raise ValueError(f"unknown metric: {metric}")

    @pandas_udf("double")
    def adc(code_col):
        import pandas as pd

        if len(code_col) == 0:
            return pd.Series([], dtype=float)
        c = np.asarray(list(code_col), dtype=np.int64)  # b×m
        s = table[np.arange(m)[None, :], c].sum(axis=1)
        return pd.Series(sign * s)

    scored = codes.select(id_col, adc(F.col("codes")).alias("score"))
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(
        F.col("score").desc(), F.col(id_col)
    ).limit(k).withColumn("score", F.round("score", 4))
