"""D82: Flesch-Kincaid readability scoring — vowel-group syllable
proxy, mirrored double trees."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.text import readability_report


def _syl(word):
    marked = re.sub(r"[aeiouy]+", "#", word)
    return max(1, marked.count("#"))


def _py_read(docs):
    out = {}
    for d, t in docs:
        if t is None:
            continue
        ws = [w for w in t.strip().lower().split() if w]
        if not ws:
            continue
        n_w = len(ws)
        n_s = max(1, len(re.findall(r"[.!?]+", t)))
        n_y = sum(_syl(w) for w in ws)
        wps, spw = n_w / n_s, n_y / n_w
        fk = math.floor((0.39 * wps + 11.8 * spw - 15.59) * 1e6) / 1e6
        ease = (
            math.floor((206.835 - 1.015 * wps - 84.6 * spw) * 1e6) / 1e6
        )
        out[d] = (n_s, n_w, n_y, round(fk, 6), round(ease, 6))
    return out


def _run(spark, docs):
    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in docs])
    got = readability_report(df).collect()
    return {
        r["doc_id"]: (
            r["n_sentences"],
            r["n_words"],
            r["n_syllables"],
            r["fk_grade"],
            r["flesch_ease"],
        )
        for r in got
    }


def test_simple_vs_complex_text_ordering(spark):
    docs = [
        (0, "The cat sat. The dog ran. It was fun."),
        (
            1,
            "Notwithstanding institutional considerations, "
            "the organizational infrastructure necessitates "
            "comprehensive reevaluation of administrative procedures.",
        ),
    ]
    got = _run(spark, docs)
    ref = _py_read(docs)
    assert got == ref
    # simple sentences: lower grade, higher ease
    assert got[0][3] < got[1][3]
    assert got[0][4] > got[1][4]


def test_counting_rules(spark):
    docs = [
        (0, "hello world."),     # 2 words, 1 sentence
        (1, "no terminator"),    # min 1 sentence
        (2, "Hi!! Wow?! Ok."),   # punctuation runs: 3 sentences
        (3, " "),                # zero words -> absent
        (4, "rhythm"),           # no aeiouy... wait: y counts -> 1
    ]
    got = _run(spark, docs)
    ref = _py_read(docs)
    assert got == ref
    assert got[0][0] == 1 and got[0][1] == 2
    assert got[1][0] == 1
    assert got[2][0] == 3
    assert 3 not in got
    assert got[4][2] == 1  # 'rhythm': the y-group counts one


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = [(r["doc_id"], r["text"]) for r in df.collect()]
    got = _run(spark, docs)
    assert got == _py_read(docs)


def test_plan_zero_shuffle_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = readability_report(df)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
