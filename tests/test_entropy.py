"""D64: per-document character entropy — the low-information filter,
with integer micro-nat quantization for order-independent sums."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import Row

from mysql2parquet_spark.operators.text import char_entropy


def _py_entropy(docs):
    out = {}
    for d, t in docs:
        cnt = Counter(t)
        n = sum(cnt.values())
        if n == 0:
            out[d] = (0, 0, None)
            continue
        s = sum(
            math.floor(c * math.log(c) * 1_000_000) for c in cnt.values()
        )
        h = round(math.log(n) - s / 1_000_000 / n, 4)
        out[d] = (n, len(cnt), h)
    return out


def _run(spark, docs):
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs]
    )
    return {
        r["doc_id"]: (r["n_chars"], r["n_distinct_chars"], r["entropy"])
        for r in char_entropy(df).collect()
    }


def test_spam_scores_low_language_scores_high(spark):
    docs = [
        (1, "aaaaaaaaaaaaaaaaaaaa"),           # one char: H = 0
        (2, "abababababababababab"),           # two chars: H = ln 2
        (3, "The quick brown fox jumps over the lazy dog."),
    ]
    got = _run(spark, docs)
    assert got == _py_entropy(docs)
    assert got[1][2] == 0.0
    assert abs(got[2][2] - math.log(2)) < 1e-3
    assert got[3][2] > got[2][2] > got[1][2]


def test_empty_doc_reports_null_not_silent(spark):
    docs = [(1, ""), (2, "xy")]
    got = _run(spark, docs)
    assert got[1] == (0, 0, None)
    assert got[2][0] == 2 and got[2][1] == 2


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = [(r["doc_id"], r["text"]) for r in df.collect()]
    got = {
        r["doc_id"]: (r["n_chars"], r["n_distinct_chars"], r["entropy"])
        for r in char_entropy(df).collect()
    }
    assert got == _py_entropy(docs)
    assert len(got) == len(docs)


def test_partitioning_never_changes_answers(spark, sf_dir):
    # integer micro-nat sums are order-independent: 2 vs 16 partitions
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = sorted(
        map(tuple, char_entropy(df.repartition(2)).collect())
    )
    b = sorted(
        map(tuple, char_entropy(df.repartition(16)).collect())
    )
    assert a == b


def test_plan_shape_two_keyed_aggregates_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    p = char_entropy(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # map-side combine before the (doc,char) exchange
    assert "partial_count" in p or "HashAggregate" in p, p
