"""End-to-end corpus curation — the composition the individual operators
exist for: dedup → quality gate → language filter → stats. One
declarative plan: Catalyst fuses the projections, the only shuffles are
the dedup key exchange and the final rollup.

At 100 TB this pipeline is: one scan of the corpus, one hash-partition
on the md5 fingerprint (constant-width key), per-row quality/lang
scoring inside whole-stage codegen, and a tiny aggregation — no
intermediate materialization unless the caller writes checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.dedup import fingerprint_dedup
from mysql2parquet_spark.operators.text import with_quality_score


def curate_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    languages: list[str] | None = None,
    lang_col: str = "lang",
) -> DataFrame:
    """Curated document set: content-deduped (md5, min-id survivor),
    quality-scored and thresholded, language-filtered."""
    out = fingerprint_dedup(docs, text_col, id_col)
    out = with_quality_score(out, text_col)
    out = out.filter(F.col("quality") >= min_quality)
    if languages:
        out = out.filter(F.col(lang_col).isin(*languages))
    return out


def pack_sequences(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Greedy sequential packing: assign documents to fixed token-budget
    bins — the standard pre-training data-prep step (concatenate docs
    into ~budget-token training sequences).

    Distributed shape: shard docs (deterministic ``id % n_shards``),
    then ONE window per shard — each doc's bin is the budget-quotient of
    the running token count at the doc's START. No driver coordination,
    no iteration: bin boundaries are pure window arithmetic, so the
    assignment is reproducible at any cluster size and oracle-checkable
    in SQL. A doc longer than the budget occupies its own bin(s), as in
    real packers. At 100 TB: one shuffle on the shard key; each shard's
    window is a streaming running sum (no per-group materialization).
    """
    tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    shard = (F.col(id_col) % n_shards).alias("shard")
    sized = docs.select(F.col(id_col), shard, tok.alias("n_toks"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_toks").over(w) - F.col("n_toks")
    return sized.select(
        id_col,
        "shard",
        "n_toks",
        F.floor(start / F.lit(float(budget))).cast("bigint").alias("bin"),
    )


def curation_report(curated: DataFrame, *, group_col: str = "lang") -> DataFrame:
    """Per-group corpus statistics of a curated set."""
    return curated.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.round(F.avg(F.col("n_tokens").cast("double")), 2).alias("avg_tokens"),
        F.sum("n_tokens").alias("total_tokens"),
    )
