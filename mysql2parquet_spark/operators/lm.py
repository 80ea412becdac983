"""Bigram language-model quality scoring (D48): per-document
cross-entropy against an add-k-smoothed bigram model — the CCNet-style
quality signal (Wenzek et al. 2020: rank crawl text by LM perplexity
against a trusted reference; low = fluent, high = gibberish/boilerplate
soup) that D14's curation and D44/D46's mixing consume as a score.

Model (public, textbook): P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V)
with V the training vocabulary size. A document's score is the average
negative log-probability of its bigrams (nats/bigram — monotone in
perplexity). Train and score relations may differ (score a crawl
against a curated reference) or coincide (self-scoring, the registered
query: outliers under a corpus's OWN statistics are the ones to
inspect).

Exactness across engines (the D43/D46 recipe): each bigram's
log-probability is quantized ONCE to integer micro-nats
(``floor(ln(p)·10⁶)``), so the per-document sum a shuffle reorders is
64-bit integer arithmetic — order-independent — and the final score is
one division of exact integers. ln is evaluated on the same rational
number by both engines (counts are integers; the D40 release pins the
same cross-engine ln contract).

Scale shape: tokenize+bigram is a zero-shuffle projection
(slice+zip, no window); unigram and bigram counts are ONE keyed
partial-agg exchange each over vocabulary-bounded relations; scoring
joins the exploded bigrams to the two count relations by gram key
(equi-joins — at 100 TB the model relations are the small sides and
AQE broadcasts them; nothing is ever collected) and reduces per doc.
V rides as a broadcast 1-row relation, never a driver scalar.

The reference exports text untouched (/root/reference/main.go:106);
this is pipeline north-star coverage like C4/D14.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql2parquet_spark.functions.hashing import tokens

_QUANT = 1_000_000  # micro-nats: integer-exact shuffle sums


def doc_bigrams(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2) bigram relation — lowercased whitespace tokens,
    consecutive pairs via slice+zip (zero shuffle, no window). Documents
    with fewer than two tokens contribute no rows."""
    toks = tokens(F.lower(F.col(text_col)))
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    return (
        docs.select(F.col(id_col), F.explode(pairs).alias("_bg"))
        .select(
            id_col,
            F.col("_bg.0").alias("w1"),
            F.col("_bg.1").alias("w2"),
        )
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )


def bigram_model(
    train: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the count relations: (unigram c(w1), bigram c(w1,w2),
    1-row vocabulary size V). Each is one keyed partial-agg exchange;
    V counts distinct FIRST-position words (the conditioning events —
    what the smoothing denominator needs)."""
    bg = doc_bigrams(train, id_col=id_col, text_col=text_col)
    uni = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bi = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    return uni, bi, vocab


def lm_score(
    docs: DataFrame,
    *,
    train: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
    ndigits: int = 4,
) -> DataFrame:
    """Per-document bigram cross-entropy: ``id_col``, ``n_bigrams``,
    ``score`` (avg negative log-prob in nats, ROUND ``ndigits``; lower
    = more fluent under the model). Documents with no bigram are
    absent (they have no cross-entropy — filter short docs upstream).

    ``train=None`` self-scores against the corpus's own statistics.
    Unseen bigrams back off through the add-k smoothing: an unseen
    continuation costs ln((c1+kV)/k) nats, an unseen conditioning word
    ln(V) — no -inf, every document scores. A DEGENERATE model — the
    training corpus has zero bigrams, so V = 0 and the smoothing
    denominator is exactly 0 — yields ``score = NULL`` per document
    via ``try_divide`` (the r11 division-sweep contract) instead of
    an ANSI DIVIDE_BY_ZERO abort.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0: {k}")
    uni, bi, vocab = bigram_model(
        train if train is not None else docs,
        id_col=id_col,
        text_col=text_col,
    )
    bg = doc_bigrams(docs, id_col=id_col, text_col=text_col)
    joined = (
        bg.join(bi, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))  # 1-row vocabulary-size relation
    )
    p = F.try_divide(
        F.coalesce(F.col("c2"), F.lit(0)) + F.lit(float(k)),
        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(k)) * F.col("v"),
    )
    lq = F.floor(F.log(p) * F.lit(_QUANT)).cast("long")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(lq).alias("_sumq"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(
                -F.col("_sumq")
                / (F.col("n_bigrams") * F.lit(float(_QUANT))),
                ndigits,
            ).alias("score"),
        )
    )
