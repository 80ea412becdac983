"""D88: trained-filter curation (pipeline_curate_classifier) — the
GPT-3 Appendix-A pipeline end-to-end (Brown et al. 2020: dedup, train a
classifier on trusted-vs-raw, keep what the classifier likes), closing
VERDICT r12 ask #5. The planted-quality fixture proves the trained
filter beats the heuristic quality gate: the heuristic
(min(n_tokens/100, 1)·distinct_ratio) REWARDS long token-diverse
gibberish and PUNISHES short clean prose; the classifier learns the
trusted vocabulary and inverts both errors."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2parquet_spark.operators.pipeline import (
    curate_corpus,
    curate_with_classifier,
)

# Clean prose: short (12-14 tokens), trusted vocabulary.
_CLEAN = [
    "the quick brown fox jumps over the lazy dog near the river",
    "a calm dog walks beside the quiet river under the old bridge",
    "the old fox sleeps near the bridge while the dog watches",
    "every quiet morning the brown dog runs along the river bank",
    "the lazy fox and the quick dog share the river bank",
    "under the bridge the old dog found a quiet place to sleep",
    "the river runs past the bridge where the brown fox lives",
    "a quick brown dog jumps over the old fox near the bank",
]

# Junk: 120 distinct gibberish tokens each — the heuristic's favorite
# shape (long + token-diverse), disjoint from the trusted vocabulary.
_JUNK = [
    " ".join(f"zzq{i}gibber{j}" for j in range(120)) for i in range(8)
]


def _fixture(spark):
    rows = []
    for i, t in enumerate(_CLEAN):
        rows.append((i, "trusted", t))  # the trusted reference slice
    for i, t in enumerate(_CLEAN):
        # raw docs sharing the trusted vocabulary (ground truth: KEEP)
        rows.append((10 + i, "raw", t + " again and again"))
    for i, t in enumerate(_JUNK):
        rows.append((20 + i, "raw", t))  # ground truth: DROP
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )


def test_trained_filter_beats_heuristic_gate(spark):
    docs = _fixture(spark)
    raw_clean = set(range(10, 18))
    junk = set(range(20, 28))

    kept = {
        r["doc_id"]
        for r in curate_with_classifier(
            docs, F.col("source") == "trusted"
        ).collect()
    }
    # The trained filter keeps every clean raw doc and drops all junk.
    assert raw_clean <= kept
    assert not (junk & kept)

    kept_h = {
        r["doc_id"]
        for r in curate_corpus(docs, min_quality=0.5).collect()
    }
    # The heuristic gate inverts both: gibberish is long and
    # token-diverse (quality ≈ 1.0, kept), clean prose is short
    # (quality ≈ 0.14, dropped).
    assert junk <= kept_h
    assert not (raw_clean & kept_h)


def test_dedup_runs_before_training(spark):
    docs = _fixture(spark)
    # 30 duplicate copies of one junk text, labeled TRUSTED: without
    # dedup-first they would inflate the trusted bag with junk
    # vocabulary; deduped, they collapse to one min-id row.
    dup = spark.createDataFrame(
        [(100 + i, "trusted", _JUNK[0]) for i in range(30)],
        "doc_id bigint, source string, text string",
    )
    out = curate_with_classifier(
        docs.union(dup), F.col("source") == "trusted"
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids))  # dedup: no text twice
    # the duplicate junk (min id 20, since 20 < 100) did not poison
    # the trusted class: clean raw docs still all kept
    assert set(range(10, 18)) <= set(ids)


def test_absolute_threshold_override(spark):
    docs = _fixture(spark)
    # An absurdly high absolute gate keeps nothing — the override is
    # honored verbatim.
    out = curate_with_classifier(
        docs, F.col("source") == "trusted", min_score_micro=10**15
    )
    assert out.count() == 0
    assert out.columns == ["doc_id", "source", "n_tokens", "score_micro"]
