"""D65: Zipf rank-frequency report with an integer-quantized
least-squares log-log slope — the corpus-health diagnostic."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.text import zipf_report


def _py_zipf(texts, top_v):
    cnt = Counter()
    for t in texts:
        cnt.update(w for w in t.strip().lower().split() if w)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    rows = [(i + 1, t, f) for i, (t, f) in enumerate(ranked)]
    xs = [math.floor(math.log(r) * 1_000_000) for r, _, _ in rows]
    ys = [math.floor(math.log(f) * 1_000_000) for _, _, f in rows]
    v = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = v * sxx - sx * sx
    slope = round((v * sxy - sx * sy) / den, 6) if den else None
    return rows, slope


def _run(spark, texts, top_v=100):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = zipf_report(df, top_v=top_v).collect()
    rows = sorted(
        (r["rank"], r["term"], r["freq"]) for r in got
    )
    slopes = {r["zipf_slope"] for r in got}
    assert len(slopes) == 1
    return rows, slopes.pop()


def test_ideal_zipf_fits_minus_one(spark):
    # term w_r appears round(1000/r) times: slope ~ -1
    texts = [
        " ".join(
            f"w{r:03d}" for r in range(1, 51)
            for _ in range(round(1000 / r))
        )
    ]
    rows, slope = _run(spark, texts, top_v=50)
    ref_rows, ref_slope = _py_zipf(texts, 50)
    assert rows == sorted(ref_rows)
    assert slope == ref_slope
    assert -1.05 < slope < -0.95


def test_uniform_corpus_is_flat(spark):
    texts = ["u1 u2 u3 u4 u5 u6 u7 u8" for _ in range(10)]
    rows, slope = _run(spark, texts, top_v=8)
    assert slope == 0.0
    assert [f for _, _, f in rows] == [10] * 8


def test_ties_break_by_term_ascending(spark):
    texts = ["b b a a c"]
    rows, _ = _run(spark, texts, top_v=3)
    assert rows == [(1, "a", 2), (2, "b", 2), (3, "c", 1)]


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="x y")])
    with pytest.raises(ValueError, match="top_v"):
        zipf_report(df, top_v=1)


def test_degenerate_single_term_yields_null_slope(spark):
    # a corpus with ONE distinct term produces a single rank point:
    # the least-squares denominator is exactly 0 and the slope is
    # NULL under the try_divide contract (never an ANSI
    # DIVIDE_BY_ZERO abort — the r11 division sweep).
    texts = ["solo solo solo", "solo"]
    rows, slope = _run(spark, texts, top_v=5)
    ref_rows, ref_slope = _py_zipf(texts, 5)
    assert rows == sorted(ref_rows) == [(1, "solo", 4)]
    assert slope is None and ref_slope is None


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    texts = [r["text"] for r in df.collect()]
    got = zipf_report(df, top_v=100).collect()
    rows = sorted((r["rank"], r["term"], r["freq"]) for r in got)
    ref_rows, ref_slope = _py_zipf(texts, 100)
    assert rows == sorted(ref_rows)
    assert {r["zipf_slope"] for r in got} == {ref_slope}


def test_plan_topk_heap_before_bounded_window(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    p = (
        zipf_report(df, top_v=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the single-task rank window runs AFTER the top-k heap
    assert "TakeOrderedAndProject" in p, p
    assert p.index("Window") < p.index("TakeOrderedAndProject"), p
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
