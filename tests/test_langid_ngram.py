"""D87: Cavnar-Trenkle character-n-gram language ID — out-of-place
rank distance over trigram profiles."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.text import ngram_langid


def _py_langid(rows, profile_size=100, doc_profile_size=50):
    def tri(t):
        t = t.strip().lower()
        return [t[i: i + 3] for i in range(len(t) - 2)]

    lang_counts: dict = {}
    for _, lang, t in rows:
        if lang is None or len(t.strip()) < 3:
            continue
        lang_counts.setdefault(lang, Counter()).update(tri(t))

    def profile(counter, k):
        ranked = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))
        return {g: i + 1 for i, (g, _) in enumerate(ranked[:k])}

    lp = {L: profile(c, profile_size) for L, c in lang_counts.items()}
    out = {}
    for d, _, t in rows:
        if len(t.strip()) < 3:
            continue
        dp = profile(Counter(tri(t)), doc_profile_size)
        scored = []
        for L, prof in lp.items():
            dist = sum(
                abs(dr - prof[g]) if g in prof else profile_size
                for g, dr in dp.items()
            )
            scored.append((dist, L))
        dist, lang = min(scored)
        out[d] = (lang, dist)
    return out


def _run(spark, rows):
    df = spark.createDataFrame(
        [Row(doc_id=d, lang=lang, text=t) for d, lang, t in rows]
    )
    got = ngram_langid(df).collect()
    return {r["doc_id"]: (r["lang_pred"], r["dist"]) for r in got}


PLANTED = [
    (0, "en", "the quick brown fox jumps over the lazy dog again and again"),
    (1, "en", "this is another english sentence with the usual words in it"),
    (2, "de", "der schnelle braune fuchs springt ueber den faulen hund immer"),
    (3, "de", "dies ist noch ein deutscher satz mit den ueblichen woertern"),
    (4, "fr", "le renard brun rapide saute par dessus le chien paresseux"),
    (5, "fr", "ceci est une autre phrase francaise avec les mots habituels"),
]


def test_planted_multilingual_corpus_classified(spark):
    # unlabeled probes in each language
    rows = PLANTED + [
        (10, None, "the dog jumps over the english fox with more words"),
        (11, None, "der hund springt ueber den deutschen fuchs mit worten"),
        (12, None, "le chien saute par dessus le renard avec des mots"),
    ]
    got = _run(spark, rows)
    ref = _py_langid(rows)
    assert got == ref
    assert got[10][0] == "en"
    assert got[11][0] == "de"
    assert got[12][0] == "fr"
    # labeled docs classify as their own language (self-train)
    for d, lang, _ in PLANTED:
        assert got[d][0] == lang


def test_short_docs_absent_null_labels_still_classified(spark):
    rows = PLANTED + [(20, None, "ab"), (21, None, " ")]
    got = _run(spark, rows)
    assert 20 not in got and 21 not in got


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    rows = [(r["doc_id"], r["lang"], r["text"]) for r in df.collect()]
    got = {
        r["doc_id"]: (r["lang_pred"], r["dist"])
        for r in ngram_langid(df).collect()
    }
    assert got == _py_langid(rows)


def test_all_null_labels_emit_und(spark):
    # Zero trained profiles (every label NULL): trigram-bearing docs
    # must survive as lang_pred='und' with NULL dist, not vanish
    # (VERDICT r12 probe P1 / ask #4).
    df = spark.createDataFrame(
        [
            (0, None, "the quick brown fox jumps over the lazy dog"),
            (1, None, "der schnelle braune fuchs springt ueber den hund"),
            (2, None, "ab"),  # no trigram -> absent per the D48 contract
        ],
        "doc_id bigint, lang string, text string",
    )
    got = {
        r["doc_id"]: (r["lang_pred"], r["dist"])
        for r in ngram_langid(df).collect()
    }
    assert got == {0: ("und", None), 1: ("und", None)}


def test_empty_train_frame_emits_und(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=d, lang=lang, text=t) for d, lang, t in PLANTED]
    )
    empty_train = docs.filter("doc_id < 0")
    got = {
        r["doc_id"]: (r["lang_pred"], r["dist"])
        for r in ngram_langid(docs, train=empty_train).collect()
    }
    assert got == {d: ("und", None) for d, _, _ in PLANTED}
    df = spark.createDataFrame([Row(doc_id=0, lang="en", text="abcd")])
    with pytest.raises(ValueError, match="profile_size"):
        ngram_langid(df, profile_size=0)
    with pytest.raises(ValueError, match="doc_profile_size"):
        ngram_langid(df, doc_profile_size=0)


def test_plan_no_cartesian_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    out = ngram_langid(df)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
