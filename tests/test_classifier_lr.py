"""D86: gradient-trained logistic-regression classifier — integer
micro-logit training, bit-exact Python twin."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.classifier import lr_classifier_score


def _py_lr(docs, is_target, hex_chars=2, epochs=2, lr=0.5):
    def buckets(t):
        return Counter(
            hashlib.md5(w.encode()).hexdigest()[:hex_chars]
            for w in t.strip().lower().split()
            if w
        )

    dc = {d: buckets(t) for d, t in docs}
    dc = {d: c for d, c in dc.items() if c}
    y = {d: 1.0 if is_target(d, t) else 0.0 for d, t in docs if d in dc}
    n = len(dc)
    w: dict = {b: 0 for d in dc for b in dc[d]}
    bq = 0
    for _ in range(epochs):
        r = {}
        for d, c in dc.items():
            z = sum(cnt * w[b] for b, cnt in c.items()) + bq
            p = 1.0 / (1.0 + math.exp(-(z / 1_000_000.0)))
            r[d] = p - y[d]
        g: Counter = Counter()
        for d, c in dc.items():
            for b, cnt in c.items():
                g[b] += math.floor(r[d] * cnt * 1_000_000)
        for b in w:
            w[b] -= math.floor(lr * g[b] / n)
        gb = sum(math.floor(r[d] * 1_000_000) for d in dc)
        bq -= math.floor(lr * gb / n)
    out = {}
    for d, c in dc.items():
        z = sum(cnt * w[b] for b, cnt in c.items()) + bq
        out[d] = (sum(c.values()), z, z > 0)
    return out


def _run(spark, docs, is_target, **kw):
    df = spark.createDataFrame(
        [
            Row(doc_id=d, text=t, is_t=bool(is_target(d, t)))
            for d, t in docs
        ]
    )
    got = lr_classifier_score(df, F.col("is_t"), **kw).collect()
    return {
        r["doc_id"]: (r["n_tokens"], r["score_micro"], r["pred_target"])
        for r in got
    }


def test_separable_corpus_learns(spark):
    docs = [(i, " ".join(f"good{j}" for j in range(8))) for i in range(6)]
    docs += [
        (i + 10, " ".join(f"bad{j}" for j in range(8))) for i in range(6)
    ]
    is_t = lambda d, t: d < 10  # noqa: E731
    got = _run(spark, docs, is_t, epochs=3)
    ref = _py_lr(docs, is_t, epochs=3)
    assert got == ref
    for i in range(6):
        assert got[i][2] is True, got[i]
        assert got[i + 10][2] is False, got[i + 10]


def test_matches_python_twin(spark):
    docs = [
        (0, "alpha beta gamma alpha"),
        (1, "beta delta"),
        (2, "gamma gamma epsilon"),
        (3, "zeta beta alpha"),
        (4, " "),  # zero tokens -> absent
        (5, "delta zeta epsilon"),
    ]
    is_t = lambda d, t: d % 2 == 0  # noqa: E731
    got = _run(spark, docs, is_t)
    ref = _py_lr(docs, is_t)
    assert got == ref
    assert 4 not in got


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    src = {r["doc_id"]: r["source"] for r in df.collect()}
    docs = [(r["doc_id"], r["text"]) for r in df.select("doc_id", "text").collect()]
    is_t = lambda d, t: src[d] in ("src1", "src3")  # noqa: E731
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_micro"], r["pred_target"])
        for r in lr_classifier_score(
            df, F.col("source").isin("src1", "src3")
        ).collect()
    }
    assert got == _py_lr(docs, is_t)


def test_training_is_partitioning_independent(spark):
    docs = [(i, f"w{i % 7} w{(i + 1) % 7} common") for i in range(40)]
    is_t = lambda d, t: d % 3 == 0  # noqa: E731
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t, is_t=bool(is_target)) for (d, t), is_target
         in ((x, is_t(*x)) for x in docs)]
    )
    a = sorted(
        (r["doc_id"], r["score_micro"])
        for r in lr_classifier_score(
            df.repartition(3), F.col("is_t")
        ).collect()
    )
    b = sorted(
        (r["doc_id"], r["score_micro"])
        for r in lr_classifier_score(
            df.repartition(17), F.col("is_t")
        ).collect()
    )
    assert a == b


def test_prob_micro_matches_twin_and_bounds(spark):
    # D89: prob_micro = floor(sigmoid(score/1e6)*1e6) — Python twin +
    # the [0, 1e6] grid bound.
    from mysql2parquet_spark.operators.classifier import with_prob_micro

    docs = [
        (0, "alpha beta gamma alpha"),
        (1, "beta delta"),
        (2, "gamma gamma epsilon"),
        (3, "zeta beta alpha"),
        (5, "delta zeta epsilon"),
    ]
    is_t = lambda d, t: d % 2 == 0  # noqa: E731
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t, is_t=bool(is_t(d, t))) for d, t in docs]
    )
    out = with_prob_micro(
        lr_classifier_score(df, F.col("is_t"))
    ).collect()
    ref = _py_lr(docs, is_t)
    for r in out:
        z = ref[r["doc_id"]][1]
        expect = math.floor(
            (1.0 / (1.0 + math.exp(-(z / 1_000_000.0)))) * 1_000_000.0
        )
        assert r["prob_micro"] == expect
        assert 0 <= r["prob_micro"] <= 1_000_000


def test_prob_micro_preserves_ranking_under_calibration(spark):
    # VERDICT r12 ask #6: score_calibrate (D42 percent_rank) over
    # prob_micro must rank documents identically to the raw logit —
    # the sigmoid is strictly monotone and percent_rank is
    # rank-only, so the composition is order-isomorphic.
    from mysql2parquet_spark.operators.classifier import with_prob_micro
    from mysql2parquet_spark.operators.numeric import (
        quantile_normalize_global,
    )

    docs = [(i, " ".join(f"good{j}" for j in range(8))) for i in range(6)]
    docs += [
        (i + 10, " ".join(f"bad{j}" for j in range(4))) for i in range(6)
    ]
    docs += [(30, "good0 bad1 good2 bad3"), (31, "good1 good2 bad0")]
    is_t = lambda d, t: d < 10  # noqa: E731
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t, is_t=bool(is_t(d, t))) for d, t in docs]
    )
    scored = with_prob_micro(
        lr_classifier_score(df, F.col("is_t"), epochs=3)
    )
    rows = scored.collect()
    by_score = sorted(rows, key=lambda r: (r["score_micro"], r["doc_id"]))
    by_prob = sorted(rows, key=lambda r: (r["prob_micro"], r["doc_id"]))
    assert [r["doc_id"] for r in by_score] == [
        r["doc_id"] for r in by_prob
    ]
    cal = {
        r["doc_id"]: r["calibrated"]
        for r in quantile_normalize_global(scored, "prob_micro").collect()
    }
    calz = {
        r["doc_id"]: r["calibrated"]
        for r in quantile_normalize_global(scored, "score_micro").collect()
    }
    assert cal == calz  # identical percent_ranks either way


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="x", is_t=True)])
    with pytest.raises(ValueError, match="epochs"):
        lr_classifier_score(df, F.col("is_t"), epochs=0)
    with pytest.raises(ValueError, match="lr must"):
        lr_classifier_score(df, F.col("is_t"), lr=0.0)
    with pytest.raises(ValueError, match="hex_chars"):
        lr_classifier_score(df, F.col("is_t"), hex_chars=5)
