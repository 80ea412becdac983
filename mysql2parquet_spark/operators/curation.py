"""Quality-aware duplicate-cluster resolution (D38): pick WHICH copy
survives a dup cluster, instead of hard-wiring keep-lowest-id.

Every dedup family in the engine (C1/C2/D21/D24/D25/D31) emits loser
sets under the keep-lowest-id rule — the right default for a
DETERMINISTIC curation contract, but real pipelines usually want the
BEST copy of a duplicated document (longest, highest quality score,
most recent crawl), not the first-crawled one. This operator is the
missing last step: given any cluster assignment (an exact-dup content
key, a connected-components cluster id from ``operators/graph.py``, a
SemDeDup cell — anything), resolve each cluster to one survivor under
a declared strategy.

Spark shape: ONE window over the cluster key — a single
``cluster_col``-keyed exchange regardless of strategy, no join, no
second pass (the ROW_NUMBER-over-partition idiom every SQL engine
shares, so the oracle is exact). At 100 TB the exchange carries the
full relation once; when the cluster key is already the partition
layout (e.g. content-keyed bucketing from ``io.write_parquet``), AQE
elides the shuffle entirely.

Determinism contract: every strategy ends its ORDER BY with
``id_col ASC``, so ties (equal scores, duplicated texts) resolve
identically on every run, partitioning, and engine.

The reference exports rows as-is (/root/reference/main.go:106); this
is Tier C / LLM-pipeline north-star coverage like C1-C2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STRATEGIES = ("best", "first", "last")


def resolve_clusters(
    df: DataFrame,
    *,
    cluster_col: str,
    id_col: str,
    score_col: str | None = None,
    strategy: str = "best",
) -> DataFrame:
    """One survivor per ``cluster_col`` group, all original columns.

    - ``strategy="best"``: highest ``score_col`` wins (ties → smallest
      ``id_col``) — quality-aware curation; requires ``score_col``.
    - ``strategy="first"``: smallest ``id_col`` wins — the family's
      keep-lowest-id rule, for parity with the dedup loser sets.
    - ``strategy="last"``: largest ``id_col`` wins — freshest-crawl
      semantics when ids are ingest-ordered.

    NULL scores lose to every non-NULL score (``desc_nulls_last``) but
    a cluster of only-NULL scores still keeps exactly one row — the
    operator never drops a cluster outright.
    """
    if strategy not in STRATEGIES:
        raise ValueError(
            f"unknown strategy {strategy!r}; one of {STRATEGIES}"
        )
    if strategy == "best":
        if score_col is None:
            raise ValueError("strategy='best' requires score_col")
        order = [
            F.col(score_col).desc_nulls_last(),
            F.col(id_col).asc(),
        ]
    elif strategy == "first":
        order = [F.col(id_col).asc()]
    else:
        order = [F.col(id_col).desc()]
    w = Window.partitionBy(cluster_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cluster_losers(
    df: DataFrame,
    *,
    cluster_col: str,
    id_col: str,
    score_col: str | None = None,
    strategy: str = "best",
) -> DataFrame:
    """The complement view: ``(id_col, cluster_col)`` of every row a
    resolution would DROP — the shape the dedup families emit, so a
    quality-aware pass can slot into any existing anti-join pipeline."""
    if strategy not in STRATEGIES:
        raise ValueError(
            f"unknown strategy {strategy!r}; one of {STRATEGIES}"
        )
    if strategy == "best":
        if score_col is None:
            raise ValueError("strategy='best' requires score_col")
        order = [
            F.col(score_col).desc_nulls_last(),
            F.col(id_col).asc(),
        ]
    elif strategy == "first":
        order = [F.col(id_col).asc()]
    else:
        order = [F.col(id_col).desc()]
    w = Window.partitionBy(cluster_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select(id_col, cluster_col)
    )
