"""D48: bigram-LM cross-entropy quality scoring (the CCNet-style
perplexity signal) — parity against a pure-Python reference model."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.lm import (
    bigram_model,
    doc_bigrams,
    lm_score,
)

_QUANT = 1_000_000


def _ref_scores(train_texts: dict, score_texts: dict, k: float = 1.0):
    """Independent arithmetic twin: same model, same quantization."""
    def bgs(t):
        w = t.strip().lower().split()
        return [(w[i], w[i + 1]) for i in range(len(w) - 1)
                if w[i] and w[i + 1]]

    c1: dict = {}
    c2: dict = {}
    for t in train_texts.values():
        for a, b in bgs(t):
            c1[a] = c1.get(a, 0) + 1
            c2[(a, b)] = c2.get((a, b), 0) + 1
    v = len(c1)
    out = {}
    for i, t in score_texts.items():
        pairs = bgs(t)
        if not pairs:
            continue
        s = 0
        for a, b in pairs:
            p = (c2.get((a, b), 0) + k) / (c1.get(a, 0) + k * v)
            s += math.floor(math.log(p) * _QUANT)
        out[i] = (len(pairs), round(-s / (len(pairs) * _QUANT), 4))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    texts = {
        0: "the cat sat on the mat",
        1: "the cat sat on the hat",
        2: "the dog sat on the mat",
        3: "zx qv ww pp gg hh jj kk",
        4: "one",          # no bigram — absent from scores
        5: "   ",          # whitespace only — absent
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    return texts, df


def test_self_score_matches_reference(spark, corpus):
    texts, df = corpus
    got = {r["doc_id"]: (r["n_bigrams"], r["score"])
           for r in lm_score(df).collect()}
    assert got == _ref_scores(texts, texts)
    assert 4 not in got and 5 not in got


def test_gibberish_scores_worse_than_fluent(spark, corpus):
    texts, df = corpus
    got = {r["doc_id"]: r["score"] for r in lm_score(df).collect()}
    # docs 0-2 share most bigrams; doc 3's are all singletons
    assert got[3] > max(got[0], got[1], got[2])


def test_train_vs_score_split_and_backoff(spark, corpus):
    """Scoring a relation the model never saw: unseen bigrams and
    unseen conditioning words back off through add-k — finite scores,
    matching the reference bit-for-bit."""
    texts, df = corpus
    new = {10: "the cat sat quietly", 11: "entirely novel words here"}
    ndf = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in new.items()]
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["score"])
           for r in lm_score(ndf, train=df).collect()}
    assert got == _ref_scores(texts, new)
    assert all(math.isfinite(s) for _, s in got.values())
    # fully-novel text must score strictly worse than in-domain text
    assert got[11][1] > got[10][1]


def test_lm_deterministic_across_partitionings(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = sorted(map(tuple, lm_score(docs.repartition(3)).collect()))
    b = sorted(map(tuple, lm_score(docs.repartition(17)).collect()))
    assert a == b and a


def test_lm_validation_and_model_shapes(spark, corpus):
    _, df = corpus
    with pytest.raises(ValueError, match="k must be"):
        lm_score(df, k=0)
    uni, bi, vocab = bigram_model(df)
    assert vocab.collect()[0]["v"] == uni.count()
    # bigram marginals are consistent: Σ_w2 c(w1,w2) == c(w1)
    marg = bi.groupBy("w1").agg(F.sum("c2").alias("m"))
    j = marg.join(uni, "w1").filter(F.col("m") != F.col("c1"))
    assert j.count() == 0


def test_lm_plan_no_cartesian_no_udf(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = lm_score(docs)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    # the only nested-loop side is the 1-row vocabulary relation
    assert p.count("BroadcastNestedLoopJoin") <= 1, p
    assert "Python" not in p, p  # pure codegen — zero UDFs


def test_degenerate_empty_train_yields_null_scores(spark):
    # a training corpus with zero bigrams (every doc < 2 tokens) has
    # V = 0 and a smoothing denominator of exactly 0: the try_divide
    # contract scores every document NULL instead of aborting with an
    # ANSI DIVIDE_BY_ZERO (the r11 division sweep).
    from pyspark.sql import Row

    from mysql2parquet_spark.operators.lm import lm_score

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="the quick brown fox")]
    )
    train = spark.createDataFrame([Row(doc_id=9, text="solo")])
    got = lm_score(docs, train=train).collect()
    assert len(got) == 1
    assert got[0]["n_bigrams"] == 3
    assert got[0]["score"] is None
