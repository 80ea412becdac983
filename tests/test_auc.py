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


def test_numeric_01_labels_match_boolean_path(spark):
    """ADVICE r13: the standard integer 0/1 label encoding must be
    accepted (normalized once via a boolean cast) and value-identical
    to the boolean path — the same contract the sibling
    calibration_report/pr_curve_report faces already honor."""
    pairs = [(5, True), (3, False), (4, True), (1, False), (4, False)]
    ref = _run(spark, pairs)
    df = spark.createDataFrame(
        [(int(s), 1 if y else 0) for s, y in pairs],
        "score_micro bigint, y int",
    )
    r = exact_auc(df, "score_micro", "y").collect()[0]
    got = (r["n_docs"], r["n_pos"], r["n_neg"], r["auc_micro"])
    assert got == ref
    # double-typed 0.0/1.0 labels too
    dfd = spark.createDataFrame(
        [(int(s), 1.0 if y else 0.0) for s, y in pairs],
        "score_micro bigint, y double",
    )
    rd = exact_auc(dfd, "score_micro", "y").collect()[0]
    assert (rd["n_docs"], rd["n_pos"], rd["n_neg"], rd["auc_micro"]) == ref
