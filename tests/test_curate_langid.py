"""D90: curation with the TRAINED language gate
(pipeline_curate_langid) — VERDICT r12 ask #7. The fixture plants a
language OUTSIDE the stopword heuristic's hand-curated lists (en / es /
de / fr): the heuristic misroutes it ('und' or an accidental stopword
collision), while the D87 Cavnar-Trenkle profiles — self-trained on the
corpus's own labels — classify it, including the UNLABELED probes the
metadata gate can never recover."""

from __future__ import annotations

from mysql2parquet_spark.operators.pipeline import (
    curate_corpus,
    curate_corpus_langid,
)
from mysql2parquet_spark.operators.text import (
    ngram_langid,
    with_lang_scores,
)

# Pseudo-Finnish: no en/es/de/fr stopword appears anywhere.
_XX = [
    "talo metsa jarvi kivi vesi ranta koski niemi saari lampi talo",
    "metsa polku kivi vesi jarvi ranta talo saari koski lampi polku",
    "jarvi ranta saari lampi kivi metsa koski talo vesi polku kivi",
    "vesi koski lampi talo ranta jarvi metsa saari polku kivi talo",
]
_EN = [
    "the quick brown fox jumps over the lazy dog in the morning",
    "a calm dog walks beside the quiet river and the old bridge",
    "the old fox sleeps near the bridge and it is a quiet day",
    "every morning the brown dog runs to the river and the bank",
]


def _fixture(spark):
    rows = [(i, "en", t) for i, t in enumerate(_EN)]
    rows += [(4 + i, "xx", t) for i, t in enumerate(_XX)]
    # unlabeled probes — one per language
    rows += [
        (10, None, "the dog jumps over the fox and runs to the river"),
        (11, None, "kivi jarvi talo metsa ranta vesi koski saari lampi"),
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string"
    )


def test_heuristic_misroutes_trained_does_not(spark):
    docs = _fixture(spark)
    heur = {
        r["doc_id"]: r["lang_pred"]
        for r in with_lang_scores(docs).collect()
    }
    # the stopword heuristic cannot name a language outside its lists
    assert heur[11] != "xx"
    trained = {
        r["doc_id"]: r["lang_pred"] for r in ngram_langid(docs).collect()
    }
    assert trained[11] == "xx"
    assert trained[10] == "en"
    for d in range(4, 8):
        assert trained[d] == "xx"


def test_curate_langid_recovers_unlabeled_probe(spark):
    docs = _fixture(spark)
    kept = {
        r["doc_id"]
        for r in curate_corpus_langid(
            docs, min_quality=0.0, languages=["xx"]
        ).collect()
    }
    # the trained gate keeps every xx doc INCLUDING the unlabeled probe
    assert kept == {4, 5, 6, 7, 11}
    # the metadata gate drops the unlabeled probe (lang IS NULL)
    kept_meta = {
        r["doc_id"]
        for r in curate_corpus(
            docs, min_quality=0.0, languages=["xx"]
        ).collect()
    }
    assert 11 not in kept_meta


def test_report_columns_present(spark):
    docs = _fixture(spark)
    out = curate_corpus_langid(docs, min_quality=0.0, languages=["xx"])
    for c in ("quality", "n_tokens", "lang_pred"):
        assert c in out.columns
