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


def doc_trigrams(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2, w3) trigram relation — lowercased whitespace
    tokens, consecutive triples via slice+zip (zero shuffle, no
    window; the doc_bigrams pattern one order up). Documents with
    fewer than three tokens contribute no rows."""
    toks = tokens(F.lower(F.col(text_col)))
    n2 = F.greatest(F.size(toks) - 2, F.lit(0))
    triples = F.arrays_zip(
        F.slice(toks, 1, n2),
        F.slice(toks, 2, n2),
        F.slice(toks, 3, n2),
    )
    return (
        docs.select(F.col(id_col), F.explode(triples).alias("_tg"))
        .select(
            id_col,
            F.col("_tg.0").alias("w1"),
            F.col("_tg.1").alias("w2"),
            F.col("_tg.2").alias("w3"),
        )
        .filter(
            (F.col("w1") != "") & (F.col("w2") != "") & (F.col("w3") != "")
        )
    )


def lm3_score(
    docs: DataFrame,
    *,
    train: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    ndigits: int = 4,
    as_micro: bool = False,
) -> DataFrame:
    """Per-document TRIGRAM cross-entropy under STUPID BACKOFF (D76 —
    Brants et al. 2007, "Large Language Models in Machine Translation":
    at web scale, skip discount estimation entirely and back off with a
    fixed penalty α; the standard α = 0.4 default is the paper's).
    Columns: ``id_col``, ``n_trigrams``, ``score`` (average negative
    log-score in nats, ROUND ``ndigits``; lower = more fluent). The
    published CCNet-recipe upgrade over D48's bigram add-k model
    (VERDICT r11 ask #6): a trigram context separates fluent
    collocations from locally-plausible word salad that bigrams pass.

    The backoff chain — each level is the train-corpus MLE, penalized
    α per level skipped::

        S(w3|w1,w2) = c(w1w2w3)/c(w1w2)            if c(w1w2w3) > 0
                    = α · c(w2w3)/c(w2)            elif c(w2w3) > 0
                    = α² · (c(w3)+1)/(N+V)         otherwise

    The final level is add-1 smoothed (Brants' S(w) = c(w)/N leaves
    unseen WORDS at zero; the +1 floor keeps every token scoreable —
    no −inf — stated, not hidden). Seen-branch denominators are
    provably positive (a trigram seen in train implies its (w1,w2)
    bigram was seen; same one level down), so the only degenerate
    division is an EMPTY train corpus (N = V = 0), which yields
    ``score = NULL`` via ``try_divide`` — the r11 division-sweep
    contract, matching ``lm_score``.

    Exactness: each trigram's ln S quantizes ONCE to integer
    micro-nats, so per-document sums are order-independent int64
    arithmetic (the D48 recipe) and the score hash-matches any engine.

    Scale shape: tokenize+trigram is a zero-shuffle slice+zip
    projection; the model is FOUR keyed partial-agg exchanges over
    vocabulary-bounded relations (trigram, bigram, unigram counts +
    the 1-row (N, V) total); scoring joins the exploded trigrams to
    the count relations by gram key (equi-joins — the model relations
    are the small sides at 100 TB and AQE broadcasts them) and
    reduces per doc. Documents with no trigram are absent (no
    cross-entropy — the D48 contract).

    ``train=None`` self-scores. NOTE: under self-scoring every scored
    trigram was seen, so the backoff never fires and the model reduces
    to pure trigram MLE — pass a held-out ``train`` split (the
    registered query trains on two sources) to exercise the chain.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1]: {alpha}")
    tr = train if train is not None else docs
    tg_train = doc_trigrams(tr, id_col=id_col, text_col=text_col)
    tri = tg_train.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c123")
    )
    bg_train = doc_bigrams(tr, id_col=id_col, text_col=text_col)
    # bi and uni are each JOINED TWICE below (the (w1,w2)/(w2,w3)
    # backoff lookups; the w2/w3 unigram lookups), so each reference
    # re-runs the train-side tokenize+gram pass — but they are
    # deliberately NOT pin_shared-ed: the duplicate branches run as
    # INDEPENDENT PARALLEL STAGES of the one final job, while eager
    # checkpoints serialize them into extra driver-blocking jobs
    # (measured r14: pinning bi+uni took text_lm3_score 1.31 → 2.82 s
    # min-of-5 in back-to-back quiet windows). Redundant-but-parallel
    # beats materialized-but-serial until cores saturate; at real
    # cluster scale the model aggregates are vocabulary-bounded and
    # cheap next to the corpus scan either way.
    bi = bg_train.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("cb")
    )
    uni_toks = (
        tr.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("w")
        )
        .filter(F.col("w") != "")
    )
    uni = uni_toks.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    totals = uni.agg(
        F.sum("cu").alias("n_tok"),
        F.count(F.lit(1)).alias("v"),
    )
    tg = doc_trigrams(docs, id_col=id_col, text_col=text_col)
    joined = (
        tg.join(tri, ["w1", "w2", "w3"], "left")
        .join(
            bi.select(
                F.col("w1").alias("_b1"),
                F.col("w2").alias("_b2"),
                F.col("cb").alias("c12"),
            ),
            (F.col("w1") == F.col("_b1")) & (F.col("w2") == F.col("_b2")),
            "left",
        )
        .drop("_b1", "_b2")
        .join(
            bi.select(
                F.col("w1").alias("_c2"),
                F.col("w2").alias("_c3"),
                F.col("cb").alias("c23"),
            ),
            (F.col("w2") == F.col("_c2")) & (F.col("w3") == F.col("_c3")),
            "left",
        )
        .drop("_c2", "_c3")
        .join(
            uni.select(F.col("w").alias("_u2"), F.col("cu").alias("c2")),
            F.col("w2") == F.col("_u2"),
            "left",
        )
        .drop("_u2")
        .join(
            uni.select(F.col("w").alias("_u3"), F.col("cu").alias("c3")),
            F.col("w3") == F.col("_u3"),
            "left",
        )
        .drop("_u3")
        .crossJoin(F.broadcast(totals))  # 1-row (N, V) relation
    )
    a = float(alpha)
    s = (
        F.when(
            F.col("c123").isNotNull(),
            F.col("c123").cast("double")
            / F.col("c12").cast("double"),
        )
        .when(
            F.col("c23").isNotNull(),
            F.lit(a)
            * F.col("c23").cast("double")
            / F.col("c2").cast("double"),
        )
        .otherwise(
            F.lit(a * a)
            * F.try_divide(
                F.coalesce(F.col("c3"), F.lit(0)).cast("double")
                + F.lit(1.0),
                (F.col("n_tok") + F.col("v")).cast("double"),
            )
        )
    )
    lq = F.floor(F.log(s) * F.lit(float(_QUANT))).cast("long")
    sums = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.sum(lq).alias("_sumq"),
    )
    if as_micro:
        # D101 face: the per-doc AVERAGE cross-entropy kept on the
        # integer micro-nat grid — ``(-Σlq) div n_trigrams`` (every lq
        # is ≤ 0, so the negated sum is a non-negative int64) — for
        # exact relative gates (score·N < Σscores) that a
        # ROUND-4 double average cannot support order-independently.
        return sums.select(
            id_col,
            "n_trigrams",
            F.expr("(-_sumq) div n_trigrams")
            .cast("long")
            .alias("ce_micro"),
        )
    return sums.select(
        id_col,
        "n_trigrams",
        F.round(
            -F.col("_sumq")
            / (F.col("n_trigrams") * F.lit(float(_QUANT))),
            ndigits,
        ).alias("score"),
    )
