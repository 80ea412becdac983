"""Text-analysis operators for training-data pipelines.

All pure JVM projections (split/filter/aggregate higher-order functions)
— at 100 TB these pipeline inside one whole-stage-codegen scan with zero
shuffle; only the final per-group aggregations exchange data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mysql2parquet_spark.functions.hashing import tokens

# Tiny built-in stopword lists for the language-ID heuristic. Real
# pipelines plug in their own; the operator only needs "a set per lang".
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "zu", "den", "ist", "ein"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que"],
}


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_hits(text: Column | str, words: list[str]) -> Column:
    """Number of tokens that are in ``words``."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def with_token_stats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-document token statistics: count, distinct ratio, mean token
    length — the building blocks of quality scoring."""
    toks = tokens(text_col)
    n = F.size(toks)
    return df.withColumns(
        {
            "n_tokens": n,
            "distinct_ratio": F.round(
                F.size(F.array_distinct(toks)).cast("double") / n.cast("double"), 4
            ),
            "mean_token_len": F.round(
                F.aggregate(
                    toks,
                    F.lit(0.0),
                    lambda acc, t: acc + F.length(t).cast("double"),
                )
                / n.cast("double"),
                4,
            ),
        }
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: favors mid-length docs with
    diverse tokens (Gopher-rules-flavored, simplified to deterministic
    arithmetic). quality = min(n_tokens/100, 1) * distinct_ratio."""
    out = with_token_stats(df, text_col)
    return out.withColumn(
        "quality",
        F.round(
            F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0))
            * F.col("distinct_ratio"),
            4,
        ),
    )


def with_lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio score per language + argmax prediction.

    ``lang_pred`` is the language with the highest stopword-hit ratio,
    'und' (undetermined) when no stopwords hit at all. Ties break by
    language code order for determinism.
    """
    n = token_count(text_col).cast("double")
    out = df
    for lang, words in STOPWORDS.items():
        out = out.withColumn(
            f"score_{lang}",
            F.round(stopword_hits(text_col, words).cast("double") / n, 4),
        )
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties (applied last)
        pred = F.when(
            (best > 0) & (F.col(f"score_{lang}") == best), lang
        ).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def term_frequencies(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus-wide term frequency: explode tokens → count. The one
    genuinely shuffling text op; partial aggregation keeps the exchange
    at |vocab| per task."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= min_count)
    )
