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
        # whitespace words: \s+ split of trimmed text; EMPTY text has
        # zero words, not the phantom token a bare split emits
        ws = len(t.strip().split()) if t.strip() else 0
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
            math.floor(bpe / ws * 1_000_000.0) if ws else None,
            math.floor(ch / bpe * 1_000_000.0) if bpe else None,
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


def test_all_empty_source_reports_null_ratios_not_crash(spark):
    """VERDICT r13 'What's wrong' #1 (probes P5/P8): a source whose
    documents carry zero BPE tokens must REPORT (zero counts, NULL
    ratios via try_divide), not abort with ANSI DIVIDE_BY_ZERO — and
    empty documents must not count a phantom whitespace word."""
    rows = [
        (0, "s", ""),          # empty: 0 words, 0 BPE tokens
        (1, "s", "   "),       # whitespace-only: same
        (2, None, "hello world"),  # NULL source excluded
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
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
    assert got == _py_fertility(rows)
    assert got["s"] == (2, 3, 0, 0, None, None)


def test_mixed_source_empty_docs_do_not_inflate_word_count(spark):
    """The phantom-word half of the D93 fix: 'hello world' + '' is 2
    whitespace words, not 3."""
    rows = [(0, "s", "hello world"), (1, "s", "")]
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
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
    assert got == _py_fertility(rows)
    assert got["s"][2] == 2


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
