"""D81: per-term burstiness (dispersion index) report — Poisson filler
vs topical burst."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.text import burstiness_report


def _py_burst(docs, top_v=100):
    per_doc: dict = {}
    for d, t in docs:
        c = Counter(w for w in t.strip().lower().split() if w)
        for w, n in c.items():
            per_doc.setdefault(w, []).append(n)
    n_docs = len(docs)
    stats = []
    for w, cs in per_doc.items():
        freq, sc2 = sum(cs), sum(c * c for c in cs)
        stats.append((w, freq, sc2, len(cs)))
    stats.sort(key=lambda s: (-s[1], s[0]))
    out = []
    for rank, (w, freq, sc2, nd) in enumerate(stats[:top_v], 1):
        vq = math.floor((sc2 / freq - freq / n_docs) * 1_000_000)
        out.append((rank, w, freq, nd, round(vq / 1_000_000.0, 6)))
    return out


def _run(spark, docs, top_v=100):
    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in docs])
    got = burstiness_report(df, top_v=top_v).collect()
    return sorted(
        (r["rank"], r["term"], r["freq"], r["n_docs"], r["vmr"])
        for r in got
    )


def test_bursty_vs_poisson_separation(spark):
    # "filler" appears once in every doc (VMR ~ 1 - 1·f/N ~ low);
    # "topic" appears 10x in one doc only (VMR >> 1)
    docs = [(i, "filler " + ("topic " * 10 if i == 0 else "x")) for i in range(20)]
    got = _run(spark, docs)
    ref = _py_burst(docs)
    assert got == sorted(ref)
    vmr = {t: v for _, t, _, _, v in got}
    assert vmr["topic"] > 5.0
    assert vmr["filler"] < 1.0


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = [(r["doc_id"], r["text"]) for r in df.collect()]
    got = _run(spark, docs)
    assert got == sorted(_py_burst(docs))


def test_rank_is_freq_desc_term_asc(spark):
    docs = [(0, "b b a a c")]
    got = _run(spark, docs, top_v=3)
    assert [(r, t) for r, t, _, _, _ in got] == [(1, "a"), (2, "b"), (3, "c")]


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="x")])
    with pytest.raises(ValueError, match="top_v"):
        burstiness_report(df, top_v=0)


def test_plan_topk_heap_bounded_window(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = burstiness_report(df, top_v=100)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p, p
    assert p.index("Window") < p.index("TakeOrderedAndProject"), p
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
