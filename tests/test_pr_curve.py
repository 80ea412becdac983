"""D99: precision/recall/F1 threshold sweep — all-integer Python twin
+ monotonicity/edge contracts."""

from __future__ import annotations

import pytest

from mysql2parquet_spark.operators.classifier import pr_curve_report

_THR = tuple(range(100_000, 1_000_000, 100_000))


def _py_pr(pairs, thresholds=_THR):
    np_ = sum(y for _, y in pairs)
    out = {}
    for t in thresholds:
        pp = sum(1 for p, _ in pairs if p >= t)
        tp = sum(y for p, y in pairs if p >= t)
        out[t] = (
            pp,
            tp,
            (tp * 1_000_000) // pp if pp > 0 else None,
            (tp * 1_000_000) // np_ if np_ > 0 else None,
            (2 * tp * 1_000_000) // (pp + np_) if pp + np_ > 0 else None,
        )
    return out


def _run(spark, pairs, **kw):
    df = spark.createDataFrame(
        [(int(p), bool(y)) for p, y in pairs],
        "prob_micro bigint, y boolean",
    )
    got = pr_curve_report(df, "y", **kw).collect()
    return {
        r["thr_micro"]: (
            r["n_pred_pos"],
            r["tp"],
            r["precision_micro"],
            r["recall_micro"],
            r["f1_micro"],
        )
        for r in got
    }


PAIRS = [
    (950_000, 1),
    (900_000, 1),
    (850_000, 0),
    (700_000, 1),
    (400_000, 0),
    (350_000, 1),
    (200_000, 0),
    (50_000, 0),
]


def test_matches_python_twin(spark):
    assert _run(spark, PAIRS) == _py_pr(PAIRS)


def test_recall_monotone_nonincreasing_in_threshold(spark):
    got = _run(spark, PAIRS)
    recalls = [got[t][3] for t in sorted(got)]
    assert recalls == sorted(recalls, reverse=True)


def test_no_positives_recall_null(spark):
    pairs = [(800_000, 0), (300_000, 0)]
    got = _run(spark, pairs)
    for t, (pp, tp, prec, rec, f1) in got.items():
        assert rec is None
        assert tp == 0


def test_empty_prediction_precision_null(spark):
    pairs = [(50_000, 1), (60_000, 0)]
    got = _run(spark, pairs)
    assert got[900_000] == (0, 0, None, 0, 0)


def test_threshold_validation(spark):
    df = spark.createDataFrame(
        [(500_000, True)], "prob_micro bigint, y boolean"
    )
    with pytest.raises(ValueError, match="thresholds"):
        pr_curve_report(df, "y", thresholds=())
