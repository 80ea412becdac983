"""Spark ML-based LSH variants (alternative engines for the hand-rolled
operators in dedup.py / similarity.py — same API shape, pick per
workload).

- minhash_lsh_ml: HashingTF token vectors → pyspark.ml MinHashLSH →
  approxSimilarityJoin. The ML implementation stores OR-amplified hash
  tables; distCol is exact Jaccard DISTANCE over the hashed feature sets.
- brp_lsh_ml: BucketedRandomProjectionLSH for euclidean ANN over
  embeddings.

Both are distributed join-based (no collect); the hand-rolled versions
in dedup.py stay preferable when you need custom banding or deterministic
signatures, the ML ones when you want OR-amplification out of the box.
"""

from __future__ import annotations

from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    HashingTF,
    MinHashLSH,
)
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql2parquet_spark.functions.hashing import shingles


def minhash_lsh_ml(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 3,
    num_features: int = 1 << 18,
    num_hash_tables: int = 8,
    max_jaccard_distance: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidate pairs via Spark ML MinHashLSH.

    Returns (id_a, id_b, jaccard_dist) with id_a < id_b. The HashingTF
    stage maps shingles into a sparse indicator vector (set semantics);
    approxSimilarityJoin blocks on the OR-amplified hash tables, so the
    join touches colliding buckets only — same scale posture as the
    hand-rolled band join.
    """
    sh = df.select(
        F.col(id_col).alias("doc"),
        shingles(text_col, shingle_n).alias("sh"),
    )
    tf = HashingTF(
        inputCol="sh", outputCol="features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(sh)
    mh = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, max_jaccard_distance, distCol="jaccard_dist"
    )
    return (
        pairs.select(
            F.col("datasetA.doc").alias("id_a"),
            F.col("datasetB.doc").alias("id_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def brp_ann_ml(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate k-NN by euclidean distance via
    BucketedRandomProjectionLSH (for unit-norm embeddings, euclidean
    ordering == cosine ordering)."""
    feats = corpus.select(
        id_col, array_to_vector(F.col(vec_col).cast("array<double>")).alias("v")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="v",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = brp.fit(feats)
    from pyspark.ml.linalg import Vectors

    return model.approxNearestNeighbors(
        feats, Vectors.dense(query_vec), k, distCol="euclid_dist"
    ).select(id_col, F.round("euclid_dist", 4).alias("euclid_dist"))
