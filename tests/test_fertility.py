"""D93: per-source tokenizer-fertility report — Python twin +
contract tests."""

from __future__ import annotations

import math
import re

from mysql2parquet_spark.operators.text import (
    BPE_ISH_PATTERN,
    fertility_report,
)

ROWS = [
    (0, "srcA", "the quick brown fox"),
    (1, "srcA", "hello, world! it's 2026."),
    (2, "srcB", "internationalization uncharacteristically"),
    (3, "srcB", "a b c d e f"),
    (4, None, "dropped row"),  # NULL source excluded (D40 rule)
]


def _py_fertility(rows):
    agg: dict = {}
    for _, src, t in rows:
        if src is None:
            continue
        ch = len(t)
        ws = len(t.strip().split(" "))
        bpe = len(re.findall(BPE_ISH_PATTERN, t))
        d = agg.setdefault(src, [0, 0, 0, 0])
        d[0] += 1
        d[1] += ch
        d[2] += ws
        d[3] += bpe
    out = {}
    for src, (n, ch, ws, bpe) in agg.items():
        out[src] = (
            n,
            ch,
            ws,
            bpe,
            math.floor(bpe / ws * 1_000_000.0),
            math.floor(ch / bpe * 1_000_000.0),
        )
    return out


def test_matches_python_twin(spark):
    df = spark.createDataFrame(
        ROWS, "doc_id bigint, source string, text string"
    )
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_chars"],
            r["n_ws_tokens"],
            r["n_bpe_tokens"],
            r["bpe_per_word_micro"],
            r["chars_per_bpe_micro"],
        )
        for r in fertility_report(df).collect()
    }
    assert got == _py_fertility(ROWS)
    assert None not in got


def test_fertility_orders_sources_sensibly(spark):
    # punctuation-dense text fragments into more BPE-ish tokens per
    # word than plain prose — its fertility must read higher
    df = spark.createDataFrame(
        [
            (0, "plain", "the quick brown fox jumps over the lazy dog"),
            (1, "dense", "a,b.c!d?e;f:g(h)i[j]k{l}m"),
        ],
        "doc_id bigint, source string, text string",
    )
    got = {
        r["source"]: r["bpe_per_word_micro"]
        for r in fertility_report(df).collect()
    }
    assert got["dense"] > got["plain"]


def test_plan_single_exchange_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "text"
    )
    out = fertility_report(df)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
