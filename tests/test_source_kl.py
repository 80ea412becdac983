"""D79: per-source lexical KL-divergence report over smoothed
hashed-unigram distributions."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.text import source_kl_report


def _py_kl(rows, hex_chars=2, k=1.0):
    B = 16**hex_chars
    sb: dict = {}
    for src, t in rows:
        if src is None:
            continue
        c = sb.setdefault(src, Counter())
        for w in t.strip().lower().split():
            if w:
                c[hashlib.md5(w.encode()).hexdigest()[:hex_chars]] += 1
    corpus: Counter = Counter()
    for c in sb.values():
        corpus.update(c)
    t_tot = sum(corpus.values())
    out = {}
    for src, c in sb.items():
        ts = sum(c.values())
        kq = 0
        for i in range(B):
            b = format(i, f"0{hex_chars}x")
            p = (c.get(b, 0) + k) / (ts + k * B)
            q = (corpus.get(b, 0) + k) / (t_tot + k * B)
            kq += math.floor(p * math.log(p / q) * 1e9)
        out[src] = (ts, round(kq / 1e9, 9))
    return out


def _run(spark, rows):
    df = spark.createDataFrame(
        [Row(doc_id=i, source=s, text=t) for i, (s, t) in enumerate(rows)]
    )
    got = source_kl_report(df).collect()
    return {r["source"]: (r["n_tokens"], r["kl"]) for r in got}


def test_identical_sources_share_equal_small_kl(spark):
    # identical sources carry an EQUAL kl — not zero: add-k smoothing
    # at different sample sizes (source ts vs pool t) leaves a
    # size-dependent offset, the documented baseline to compare
    # against, not subtract
    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [("a", text), ("b", text), ("c", text)]
    got = _run(spark, rows)
    ref = _py_kl(rows)
    assert got == ref
    kls = {kl for _, kl in got.values()}
    assert len(kls) == 1  # same distribution + same size -> same kl
    assert kls.pop() < 0.05  # far below any real divergence


def test_divergent_source_ranks_highest(spark):
    # KL(source || corpus) measures distance from the POOL — so the
    # divergent source must be small next to it (a source dominating
    # the pool's mass for its own buckets is genuinely near the pool)
    common = " ".join(f"w{j % 20}" for j in range(200))
    rows = [("a", common), ("b", common), ("weird", "zz xx yy zz xx yy")]
    got = _run(spark, rows)
    ref = _py_kl(rows)
    assert got == ref
    assert got["weird"][1] > got["a"][1]
    assert got["weird"][1] > 0.5


def test_null_sources_excluded(spark):
    rows = [("a", "x y z"), (None, "p q r")]
    got = _run(spark, rows)
    assert set(got) == {"a"}


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    rows = [(r["source"], r["text"]) for r in df.collect()]
    got = {
        r["source"]: (r["n_tokens"], r["kl"])
        for r in source_kl_report(df).collect()
    }
    assert got == _py_kl(rows)


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, source="a", text="x")])
    with pytest.raises(ValueError, match="hex_chars"):
        source_kl_report(df, hex_chars=0)
    with pytest.raises(ValueError, match="k must"):
        source_kl_report(df, k=0.0)


def test_plan_no_cartesian_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    out = source_kl_report(df)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
