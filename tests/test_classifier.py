"""D75: trained quality classifier — closed-form Naive Bayes over
hashed unigram features, the fastText-style corpus filter."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.classifier import nb_classifier_score


def _py_nb(docs, is_target, hex_chars=2, k=1.0):
    """(doc_id, text, is_t) rows -> {doc_id: (n_tokens, score, pred)}."""
    B = 16**hex_chars
    ct: Counter = Counter()
    cn: Counter = Counter()
    n1 = n0 = 0

    def buckets(t):
        return [
            hashlib.md5(w.encode()).hexdigest()[:hex_chars]
            for w in t.strip().lower().split()
            if w
        ]

    for d, t in docs:
        if is_target(d, t):
            n1 += 1
            ct.update(buckets(t))
        else:
            n0 += 1
            cn.update(buckets(t))
    t1, t0 = sum(ct.values()), sum(cn.values())
    lam = {
        b: math.floor(
            (
                math.log(ct[b] + k)
                - math.log(t1 + k * B)
                - math.log(cn[b] + k)
                + math.log(t0 + k * B)
            )
            * 1_000_000
        )
        for b in set(ct) | set(cn)
    }
    prior = math.floor(
        (math.log(n1 + k) - math.log(n0 + k)) * 1_000_000
    )
    out = {}
    for d, t in docs:
        bs = buckets(t)
        if not bs:
            continue
        s = prior + sum(lam[b] for b in bs)
        out[d] = (len(bs), s, s > 0)
    return out


def _run(spark, docs, is_target):
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t, is_t=bool(is_target(d, t))) for d, t in docs]
    )
    got = nb_classifier_score(df, F.col("is_t")).collect()
    return {
        r["doc_id"]: (r["n_tokens"], r["score_micro"], r["pred_target"])
        for r in got
    }


def test_separable_corpus_classifies_correctly(spark):
    # target docs use vocab A, raw docs vocab B: every doc must be
    # classified to its own class, and a mixed doc leans to its
    # majority vocabulary
    docs = [(i, " ".join(f"good{j}" for j in range(10))) for i in range(5)]
    docs += [
        (i + 10, " ".join(f"bad{j}" for j in range(10))) for i in range(5)
    ]
    # mixed docs are labeled NEGATIVE at self-training (d < 10 is the
    # label), so they need a clear majority vocabulary to overcome
    # their own contamination of the negative bag plus the prior
    docs.append(
        (20, " ".join(f"good{j}" for j in range(7)) + " bad0")
    )
    docs.append((21, " ".join(f"bad{j}" for j in range(7)) + " good0"))
    got = _run(spark, docs, lambda d, t: d < 10)
    for i in range(5):
        assert got[i][2] is True
        assert got[i + 10][2] is False
    assert got[20][2] is True and got[21][2] is False
    assert got[20][1] > 0 > got[21][1]


def test_matches_python_twin(spark):
    docs = [
        (0, "alpha beta gamma alpha"),
        (1, "beta delta"),
        (2, "gamma gamma epsilon"),
        (3, "zeta beta alpha"),
        (4, "  "),  # zero tokens -> absent
        (5, "delta zeta"),
    ]
    is_t = lambda d, t: d % 2 == 0  # noqa: E731
    got = _run(spark, docs, is_t)
    ref = _py_nb(docs, is_t)
    assert got == ref
    assert 4 not in got


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_micro"], r["pred_target"])
        for r in nb_classifier_score(
            df, F.col("source").isin("src1", "src3")
        ).collect()
    }
    rows = [
        (r["doc_id"], r["text"], r["source"]) for r in df.collect()
    ]
    ref = _py_nb(
        [(d, t) for d, t, _ in rows],
        lambda d, t: dict((x, s) for x, _, s in rows)[d]
        in ("src1", "src3"),
    )
    assert got == ref


def test_empty_class_degrades_smoothly(spark):
    # every doc is target: the negative bag is empty (T0 = 0) and all
    # its probabilities collapse to the uniform k/(kB) floor — scores
    # stay finite, no division anywhere
    docs = [(0, "a b c"), (1, "c d")]
    got = _run(spark, docs, lambda d, t: True)
    assert set(got) == {0, 1}
    assert all(isinstance(v[1], int) for v in got.values())


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="x", is_t=True)])
    with pytest.raises(ValueError, match="hex_chars"):
        nb_classifier_score(df, F.col("is_t"), hex_chars=9)
    with pytest.raises(ValueError, match="k must"):
        nb_classifier_score(df, F.col("is_t"), k=0.0)


def test_plan_bounded_model_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    out = nb_classifier_score(df, F.col("source").isin("src1", "src3"))
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # the model relations reach the doc-bucket relation as broadcasts
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, p
