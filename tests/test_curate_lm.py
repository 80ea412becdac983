"""D101: perplexity-gated curation (the CCNet selection) — planted
fluency fixture + degenerate contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2parquet_spark.operators.pipeline import curate_with_lm

# Trusted prose with a repeated fluent pattern the LM can learn.
_TRUSTED = [
    "the quick brown fox jumps over the lazy dog near the river",
    "the quick brown fox runs over the lazy dog near the bridge",
    "the old brown dog walks over the quiet bridge near the river",
    "the lazy brown dog sleeps near the quiet river by the bridge",
]
# Raw fluent docs reuse the trusted trigrams (ground truth: KEEP).
_FLUENT = [
    "the quick brown fox jumps over the lazy dog near the bridge",
    "the old brown dog sleeps near the quiet river by the bridge",
]
# Word salad over the SAME vocabulary — every trigram unseen, so the
# double-alpha unigram floor prices it (ground truth: DROP).
_SALAD = [
    "fox the bridge lazy near quick river dog the over brown jumps",
    "dog river the brown quiet fox by near sleeps old the walks",
]


def _fixture(spark):
    rows = [(i, "trusted", t) for i, t in enumerate(_TRUSTED)]
    rows += [(10 + i, "raw", t) for i, t in enumerate(_FLUENT)]
    rows += [(20 + i, "raw", t) for i, t in enumerate(_SALAD)]
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )


def test_lm_gate_keeps_fluent_drops_salad(spark):
    docs = _fixture(spark)
    kept = {
        r["doc_id"]
        for r in curate_with_lm(
            docs, F.col("source") == "trusted"
        ).collect()
    }
    assert set(range(10, 12)) <= kept  # fluent raw docs kept
    assert not (set(range(20, 22)) & kept)  # word salad dropped


def test_output_is_all_integer(spark):
    docs = _fixture(spark)
    out = curate_with_lm(docs, F.col("source") == "trusted")
    types = dict(out.dtypes)
    assert types["n_trigrams"] == "bigint"
    assert types["ce_micro"] == "bigint"
    assert out.columns == ["doc_id", "source", "n_trigrams", "ce_micro"]


def test_short_docs_absent(spark):
    docs = _fixture(spark).union(
        _fixture(spark).sparkSession.createDataFrame(
            [(30, "raw", "two words")],
            "doc_id bigint, source string, text string",
        )
    )
    kept = {
        r["doc_id"]
        for r in curate_with_lm(
            docs, F.col("source") == "trusted"
        ).collect()
    }
    assert 30 not in kept  # no trigram -> absent (the D76 contract)


def test_empty_trusted_slice_keeps_nothing(spark):
    docs = _fixture(spark)
    out = curate_with_lm(docs, F.lit(False))
    assert out.count() == 0
