"""D83: per-source vocabulary-composition (lexical richness) report."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import Row

from mysql2parquet_spark.operators.text import vocab_composition_report


def _py_vocab(rows):
    per_src: dict = {}
    for s, t in rows:
        if s is None:
            continue
        c = per_src.setdefault(s, Counter())
        c.update(w for w in t.strip().lower().split() if w)
    spread: Counter = Counter()
    for c in per_src.values():
        spread.update(c.keys())

    def q(num, den):
        return round(math.floor(num / den * 1_000_000) / 1_000_000.0, 6)

    out = {}
    for s, c in per_src.items():
        n_tok, vocab = sum(c.values()), len(c)
        hapax = sum(1 for v in c.values() if v == 1)
        excl = sum(1 for w in c if spread[w] == 1)
        out[s] = (
            n_tok,
            vocab,
            hapax,
            excl,
            q(vocab, n_tok),
            q(hapax, vocab),
            q(excl, vocab),
        )
    return out


def _run(spark, rows):
    df = spark.createDataFrame(
        [
            Row(doc_id=i, source=s, text=t)
            for i, (s, t) in enumerate(rows)
        ]
    )
    got = vocab_composition_report(df).collect()
    return {
        r["source"]: (
            r["n_tokens"],
            r["vocab"],
            r["hapax"],
            r["exclusive_terms"],
            r["ttr"],
            r["hapax_ratio"],
            r["exclusive_ratio"],
        )
        for r in got
    }


def test_composition_semantics(spark):
    rows = [
        ("a", "x x y z"),        # vocab 3, hapax y,z = 2
        ("b", "x q"),            # q exclusive; x shared
        (None, "dropped"),
    ]
    got = _run(spark, rows)
    ref = _py_vocab(rows)
    assert got == ref
    assert set(got) == {"a", "b"}
    a = got["a"]
    assert a[0] == 4 and a[1] == 3 and a[2] == 2
    assert a[3] == 2  # y, z exclusive to a
    b = got["b"]
    assert b[3] == 1  # q only


def test_novel_vs_redundant_source(spark):
    common = " ".join(f"w{j}" for j in range(30))
    rows = [
        ("pool1", common),
        ("pool2", common),
        ("novel", " ".join(f"n{j}" for j in range(30))),
        ("copycat", common),
    ]
    got = _run(spark, rows)
    assert got["novel"][6] == 1.0  # fully exclusive vocabulary
    assert got["copycat"][6] == 0.0  # fully shared


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    rows = [(r["source"], r["text"]) for r in df.collect()]
    got = _run(spark, rows)
    assert got == _py_vocab(rows)


def test_plan_no_cartesian_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    out = vocab_composition_report(df)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
