"""D76: trigram stupid-backoff cross-entropy scoring (Brants et al.
2007) — the CCNet-recipe upgrade over the D48 bigram model."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.lm import lm3_score


def _py_lm3(docs, train, alpha=0.4):
    """{doc_id: (n_trigrams, score)} twin of lm3_score."""

    def toks(t):
        return [w for w in t.strip().lower().split() if w]

    tri: Counter = Counter()
    bi: Counter = Counter()
    uni: Counter = Counter()
    for _, t in train:
        ws = toks(t)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
        tri.update(zip(ws, ws[1:], ws[2:]))
    n_tok, v = sum(uni.values()), len(uni)
    out = {}
    for d, t in docs:
        ws = toks(t)
        tgs = list(zip(ws, ws[1:], ws[2:]))
        if not tgs:
            continue
        sq = 0
        dead = False
        for w1, w2, w3 in tgs:
            if (w1, w2, w3) in tri:
                s = tri[(w1, w2, w3)] / bi[(w1, w2)]
            elif (w2, w3) in bi:
                s = alpha * bi[(w2, w3)] / uni[w2]
            else:
                if n_tok + v == 0:
                    dead = True
                    break
                s = alpha * alpha * ((uni.get(w3, 0) + 1.0) / (n_tok + v))
            sq += math.floor(math.log(s) * 1_000_000)
        out[d] = (
            len(tgs),
            None if dead else round(-sq / (len(tgs) * 1_000_000.0), 4),
        )
    return out


def _run(spark, docs, train):
    ddf = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in docs])
    tdf = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in train]
    )
    got = lm3_score(ddf, train=tdf).collect()
    return {r["doc_id"]: (r["n_trigrams"], r["score"]) for r in got}


TRAIN = [
    (100, "the quick brown fox jumps over the lazy dog"),
    (101, "the quick brown cat sleeps on the warm mat"),
    (102, "a slow green turtle walks under the old bridge"),
]


def test_all_three_backoff_levels_fire(spark):
    docs = [
        # pure trigram hits (a training sentence)
        (0, "the quick brown fox jumps"),
        # trigram miss, bigram hit: "quick brown" seen, "brown dog" not
        # as trigram context ("quick brown dog" unseen, "brown dog"
        # unseen bigram -> unigram level for that one)
        (1, "the quick brown dog"),
        # full OOV -> unigram floor only
        (2, "zz yy xx ww"),
    ]
    got = _run(spark, docs, TRAIN)
    ref = _py_lm3(docs, TRAIN)
    assert got == ref
    # fluency ordering: seen text scores lower (better) than word salad
    assert got[0][1] < got[1][1] < got[2][1]


def test_short_docs_absent(spark):
    docs = [(0, "one two"), (1, "solo"), (2, " ")]
    got = _run(spark, docs, TRAIN)
    assert got == {}


def test_matches_twin_on_fixture_split(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    rows = [(r["doc_id"], r["text"], r["source"]) for r in df.collect()]
    train = [(d, t) for d, t, s in rows if s in ("src1", "src3")]
    docs = [(d, t) for d, t, _ in rows]
    got = _run(spark, docs, train)
    ref = _py_lm3(docs, train)
    assert got == ref


def test_degenerate_empty_train_yields_null_scores(spark):
    # train with zero tokens: N = V = 0 -> the unigram-floor division
    # is 0/0 -> NULL score via try_divide (the r11 division sweep)
    docs = [(0, "a b c d")]
    train = [(9, " ")]
    got = _run(spark, docs, train)
    assert got == {0: (2, None)}


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="a b c")])
    with pytest.raises(ValueError, match="alpha"):
        lm3_score(df, alpha=0.0)


def test_plan_no_cartesian_no_python(spark, sf_dir):
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    train = df.filter(F.col("source").isin("src1", "src3")).select(
        "doc_id", "text"
    )
    out = lm3_score(df.select("doc_id", "text"), train=train)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
