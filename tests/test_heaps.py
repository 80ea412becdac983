"""D72: Heaps'-law vocabulary-growth curve with a quantized log-log
exponent fit — the corpus-saturation trend."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.text import heaps_growth


def _py_curve(docs, n_buckets):
    lo = min(d for d, _ in docs)
    m = max(d for d, _ in docs) - lo + 1

    def bucket(i):
        return min(
            n_buckets - 1, math.floor((i - lo) * n_buckets / m)
        )

    n_docs = [0] * n_buckets
    n_tokens = [0] * n_buckets
    first: dict = {}
    for d, t in docs:
        b = bucket(d)
        n_docs[b] += 1
        toks = [w for w in t.strip().lower().split() if w]
        n_tokens[b] += len(toks)
        for w in set(toks):
            if w not in first or d < first[w]:
                first[w] = d
    new_terms = [0] * n_buckets
    for w, d in first.items():
        new_terms[bucket(d)] += 1
    rows, ct, cv = [], 0, 0
    for b in range(n_buckets):
        if n_docs[b] == 0:
            continue
        ct += n_tokens[b]
        cv += new_terms[b]
        rows.append((b, n_docs[b], n_tokens[b], new_terms[b], ct, cv))
    pts = [(r[4], r[5]) for r in rows if r[4] > 0 and r[5] > 0]
    xs = [math.floor(math.log(x) * 1_000_000) for x, _ in pts]
    ys = [math.floor(math.log(y) * 1_000_000) for _, y in pts]
    v = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    den = v * sxx - sx * sx
    beta = round((v * sxy - sx * sy) / den, 6) if den else None
    return rows, beta


def _run(spark, docs, n_buckets=10):
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs]
    )
    got = heaps_growth(df, n_buckets=n_buckets).collect()
    rows = sorted(
        (r["bucket"], r["n_docs"], r["n_tokens"], r["new_terms"],
         r["cum_tokens"], r["cum_vocab"])
        for r in got
    )
    betas = {r["heaps_beta"] for r in got}
    assert len(betas) == 1
    return rows, betas.pop()


def test_saturating_corpus_has_flat_tail(spark):
    # all docs reuse the same 5 words: vocabulary stops growing after
    # the first bucket -> beta near 0
    docs = [(i, "alpha beta gamma delta eps") for i in range(40)]
    rows, beta = _run(spark, docs, n_buckets=8)
    ref_rows, ref_beta = _py_curve(docs, 8)
    assert rows == sorted(ref_rows) and beta == ref_beta
    assert rows[0][5] == 5 and rows[-1][5] == 5  # cum vocab flat
    assert abs(beta) < 0.05


def test_fresh_corpus_grows_linearly(spark):
    # every doc contributes entirely new words -> beta near 1
    docs = [
        (i, " ".join(f"w{i}_{j}" for j in range(6))) for i in range(40)
    ]
    rows, beta = _run(spark, docs, n_buckets=8)
    ref_rows, ref_beta = _py_curve(docs, 8)
    assert rows == sorted(ref_rows) and beta == ref_beta
    assert beta > 0.95


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="a")])
    with pytest.raises(ValueError, match="n_buckets"):
        heaps_growth(df, n_buckets=1)


def test_degenerate_single_fit_point_yields_null_beta(spark):
    # one document -> one (cum_tokens, cum_vocab) point -> the
    # least-squares denominator v*sxx - sx^2 is exactly 0. Under ANSI
    # mode a plain division aborts with DIVIDE_BY_ZERO (the r11 weak);
    # the try_divide contract returns beta = NULL and keeps the curve.
    docs = [(0, "alpha beta gamma")]
    rows, beta = _run(spark, docs, n_buckets=4)
    ref_rows, ref_beta = _py_curve(docs, 4)
    assert rows == sorted(ref_rows)
    assert beta is None and ref_beta is None
    assert rows[0][4] == 3 and rows[0][5] == 3


def test_degenerate_equal_x_points_yields_null_beta(spark):
    # two buckets with usable points but IDENTICAL cum_tokens (the
    # second bucket adds zero tokens because its docs are empty):
    # both quantized ln(cum_tokens) are equal -> denominator 0 -> NULL.
    docs = [(0, "alpha beta"), (1, " "), (2, " "), (3, " ")]
    rows, beta = _run(spark, docs, n_buckets=2)
    ref_rows, ref_beta = _py_curve(docs, 2)
    assert rows == sorted(ref_rows)
    assert beta is None and ref_beta is None


def test_offset_id_space_spreads_buckets(spark):
    # ADVICE r11: ids starting at a large offset must NOT collapse
    # into the last bucket — bucketing normalizes by (id - min_id).
    docs = [
        (1_000_000 + i, " ".join(f"w{i}_{j}" for j in range(4)))
        for i in range(32)
    ]
    rows, beta = _run(spark, docs, n_buckets=8)
    ref_rows, ref_beta = _py_curve(docs, 8)
    assert rows == sorted(ref_rows) and beta == ref_beta
    assert [r[0] for r in rows] == list(range(8))  # all 8 buckets hit
    assert beta is not None and beta > 0.95


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = [(r["doc_id"], r["text"]) for r in df.collect()]
    rows, beta = _run(spark, docs, n_buckets=20)
    ref_rows, ref_beta = _py_curve(docs, 20)
    assert rows == sorted(ref_rows)
    assert beta == ref_beta


def test_plan_bounded_fit_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = heaps_growth(df, n_buckets=20)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
