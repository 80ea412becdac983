"""D95: Cohen's kappa agreement between two classifiers — Python twin
+ canonical-value tests."""

from __future__ import annotations

import math

from mysql2parquet_spark.operators.classifier import classifier_agreement


def _py_kappa(pairs):
    n = len(pairs)
    n11 = sum(1 for a, b in pairs if a and b)
    n10 = sum(1 for a, b in pairs if a and not b)
    n01 = sum(1 for a, b in pairs if not a and b)
    n00 = sum(1 for a, b in pairs if not a and not b)
    e = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    agree = math.floor((n11 + n00) / n * 1_000_000.0)
    den = n * n - e
    kappa = (
        math.floor((n * (n11 + n00) - e) / den * 1_000_000.0)
        if den != 0
        else None
    )
    if kappa is None:
        band = "undefined"
    elif kappa < 0:
        band = "poor"
    elif kappa <= 200_000:
        band = "slight"
    elif kappa <= 400_000:
        band = "fair"
    elif kappa <= 600_000:
        band = "moderate"
    elif kappa <= 800_000:
        band = "substantial"
    else:
        band = "almost_perfect"
    return (n, n11, n10, n01, n00, agree, kappa, band)


def _run(spark, pairs):
    a = spark.createDataFrame(
        [(i, bool(pa)) for i, (pa, _) in enumerate(pairs)],
        "doc_id bigint, pred_target boolean",
    )
    b = spark.createDataFrame(
        [(i, bool(pb)) for i, (_, pb) in enumerate(pairs)],
        "doc_id bigint, pred_target boolean",
    )
    r = classifier_agreement(a, b).collect()[0]
    return (
        r["n_docs"],
        r["n11"],
        r["n10"],
        r["n01"],
        r["n00"],
        r["agree_micro"],
        r["kappa_micro"],
        r["band"],
    )


def test_matches_python_twin(spark):
    pairs = [
        (True, True),
        (True, False),
        (False, True),
        (False, False),
        (True, True),
        (False, False),
        (True, True),
        (False, True),
    ]
    assert _run(spark, pairs) == _py_kappa(pairs)


def test_perfect_agreement_is_kappa_one(spark):
    pairs = [(True, True)] * 5 + [(False, False)] * 5
    got = _run(spark, pairs)
    assert got[5] == 1_000_000  # raw agreement
    assert got[6] == 1_000_000  # kappa
    assert got[7] == "almost_perfect"


def test_constant_rater_kappa_undefined(spark):
    # both raters always say True: pe = 1, denominator 0 -> NULL kappa
    pairs = [(True, True)] * 6
    got = _run(spark, pairs)
    assert got[5] == 1_000_000
    assert got[6] is None
    assert got[7] == "undefined"


def test_chance_level_agreement_is_kappa_zero(spark):
    # independent 50/50 raters, perfectly balanced confusion: kappa = 0
    pairs = [(True, True), (True, False), (False, True), (False, False)]
    got = _run(spark, pairs)
    assert got[6] == 0
    assert got[7] == "slight"


def test_systematic_disagreement_is_negative(spark):
    pairs = [(True, False)] * 5 + [(False, True)] * 5
    got = _run(spark, pairs)
    assert got[6] < 0
    assert got[7] == "poor"
