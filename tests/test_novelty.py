"""D63: per-document n-gram novelty — fraction of a doc's distinct
n-grams whose first corpus occurrence (min doc_id) is this doc."""

from __future__ import annotations

import math

from pyspark.sql import Row

from mysql2parquet_spark.operators.text import ngram_novelty


def _py_novelty(docs, n):
    toks = {d: t.strip().split() for d, t in docs}
    grams = {
        d: {
            " ".join(t[i: i + n])
            for i in range(len(t) - n + 1)
        }
        for d, t in toks.items()
    }
    first = {}
    for d in sorted(grams):
        for g in grams[d]:
            if g not in first or d < first[g]:
                first[g] = d
    out = {}
    for d, gs in grams.items():
        novel = sum(1 for g in gs if first[g] == d)
        nov = (
            math.floor(novel / len(gs) * 10_000) / 10_000 if gs else None
        )
        out[d] = (len(gs), novel, nov)
    return out


def _run(spark, docs, n=3):
    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in docs])
    return {
        r["doc_id"]: (
            r["n_distinct_grams"], r["n_novel_grams"], r["novelty"]
        )
        for r in ngram_novelty(df, n=n).collect()
    }


def test_copy_scores_zero_original_scores_one(spark):
    orig = " ".join(f"w{i}" for i in range(10))
    docs = [
        (1, orig),                       # everything first-seen here
        (2, orig),                       # verbatim copy: novelty 0
        (3, " ".join(f"x{i}" for i in range(10))),  # disjoint: 1.0
    ]
    got = _run(spark, docs, n=3)
    assert got == _py_novelty(docs, 3)
    assert got[1] == (8, 8, 1.0)
    assert got[2] == (8, 0, 0.0)
    assert got[3] == (8, 8, 1.0)


def test_partial_overlap_and_short_docs(spark):
    a = "a1 a2 a3 a4"
    docs = [
        (1, a + " a5"),
        (2, a + " b1 b2"),   # shares the grams inside `a`, adds its own
        (3, "too short"),    # < n tokens: 0 grams, NULL novelty
    ]
    got = _run(spark, docs, n=3)
    ref = _py_novelty(docs, 3)
    assert got == ref
    assert got[3] == (0, 0, None)
    assert 0.0 < got[2][2] < 1.0


def test_id_order_is_the_before_relation(spark):
    # the same pair reversed flips which doc is "novel"
    t = " ".join(f"s{i}" for i in range(6))
    g1 = _run(spark, [(1, t), (2, t)], n=3)
    g2 = _run(spark, [(2, t), (1, t)], n=3)
    assert g1[1][2] == 1.0 and g1[2][2] == 0.0
    assert g2 == g1  # ordering comes from ids, not input order


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = [(r["doc_id"], r["text"]) for r in df.collect()]
    got = {
        r["doc_id"]: (
            r["n_distinct_grams"], r["n_novel_grams"], r["novelty"]
        )
        for r in ngram_novelty(df, n=3).collect()
    }
    assert got == _py_novelty(docs, 3)
    assert len(got) == len(docs)


def test_plan_no_cartesian_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    p = (
        ngram_novelty(df, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
