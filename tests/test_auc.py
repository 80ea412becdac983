"""D96: exact ranking AUC (Mann-Whitney identity) — Python twin +
canonical-value and partitioning-independence tests."""

from __future__ import annotations

import math

from mysql2parquet_spark.operators.numeric import exact_auc


def _py_auc(pairs):
    pos = sorted(s for s, y in pairs if y)
    neg = sorted(s for s, y in pairs if not y)
    p, n = len(pos), len(neg)
    if p == 0 or n == 0:
        return (p + n, p, n, None)
    num2 = 0
    for s in pos:
        below = sum(1 for t in neg if t < s)
        ties = sum(1 for t in neg if t == s)
        num2 += 2 * below + ties
    return (p + n, p, n, math.floor(num2 / (2 * p * n) * 1_000_000.0))


def _run(spark, pairs, **kw):
    df = spark.createDataFrame(
        [(int(s), bool(y)) for s, y in pairs],
        "score_micro bigint, y boolean",
    )
    r = exact_auc(df, "score_micro", "y", **kw).collect()[0]
    return (r["n_docs"], r["n_pos"], r["n_neg"], r["auc_micro"])


def test_matches_python_twin(spark):
    pairs = [
        (10, True),
        (9, True),
        (9, False),  # tie across classes: half credit
        (5, False),
        (5, True),
        (1, False),
        (1, False),
    ]
    assert _run(spark, pairs) == _py_auc(pairs)


def test_perfect_and_inverted_separation(spark):
    perfect = [(100 + i, True) for i in range(5)] + [
        (i, False) for i in range(5)
    ]
    assert _run(spark, perfect)[3] == 1_000_000
    inverted = [(i, True) for i in range(5)] + [
        (100 + i, False) for i in range(5)
    ]
    assert _run(spark, inverted)[3] == 0


def test_all_tied_is_half(spark):
    pairs = [(7, True)] * 4 + [(7, False)] * 6
    assert _run(spark, pairs)[3] == 500_000


def test_single_class_is_null(spark):
    got = _run(spark, [(1, True), (2, True)])
    assert got == (2, 2, 0, None)


def test_partitioning_independent(spark):
    import random

    rng = random.Random(13)
    pairs = [
        (rng.randrange(-50, 50), rng.random() < 0.4) for _ in range(400)
    ]
    ref = _py_auc(pairs)
    assert _run(spark, pairs) == ref
    assert _run(spark, pairs, num_partitions=3) == ref
    assert _run(spark, pairs, num_partitions=17) == ref
