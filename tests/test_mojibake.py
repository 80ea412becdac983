"""D91: encoding-noise / mojibake gate — Python twin + contract
tests."""

from __future__ import annotations

import math
import re

from mysql2parquet_spark.operators.text import with_encoding_noise

_CTRL = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_NONASCII = re.compile("[^\x00-\x7f]")


def _py_noise(t, max_ratio_micro=50_000):
    n = len(t)
    n_repl = t.count("�")
    n_ctrl = len(_CTRL.findall(t))
    n_na = len(_NONASCII.findall(t))
    ratio = math.floor(n_na / n * 1_000_000.0) if n > 0 else None
    keep = (
        n_repl == 0
        and n_ctrl == 0
        and (ratio is None or ratio <= max_ratio_micro)
    )
    return (n_repl, n_ctrl, n_na, ratio, keep)


ROWS = [
    (0, "clean ascii text with tabs\tand newlines\nkept"),
    (1, "decode casualty �� here"),
    (2, "stray control\x07char"),
    (3, "naïve café résumé"),  # real accents: non-ASCII but no markers
    (4, ""),  # empty: ratio NULL, keep True
    (5, "ü" * 60 + "x" * 40),  # 60% non-ASCII: over the 5% gate
]


def test_matches_python_twin(spark):
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (
            r["n_replacement"],
            r["n_control"],
            r["n_nonascii"],
            r["nonascii_ratio_micro"],
            r["keep"],
        )
        for r in with_encoding_noise(df).collect()
    }
    assert got == {d: _py_noise(t) for d, t in ROWS}


def test_gate_semantics(spark):
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    keep = {
        r["doc_id"]: r["keep"] for r in with_encoding_noise(df).collect()
    }
    assert keep[0] is True  # tabs/newlines are NOT control noise
    assert keep[1] is False  # replacement chars
    assert keep[2] is False  # BEL
    assert keep[3] is False  # 3/18 non-ASCII > 5% default Latin prior
    assert keep[4] is True  # empty text is vacuously clean
    assert keep[5] is False
    # a mostly-ASCII doc with trace accents passes a looser gate
    loose = {
        r["doc_id"]: r["keep"]
        for r in with_encoding_noise(
            df, max_nonascii_ratio_micro=400_000
        ).collect()
    }
    assert loose[3] is True
    assert loose[5] is False


def test_plan_zero_shuffle_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    p = (
        with_encoding_noise(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
