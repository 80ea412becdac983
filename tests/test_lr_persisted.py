"""D100: persisted LR model — round-trip parity with the inline face
and the zero-training-job serving pin."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.classifier import (
    lr_classifier_score,
    lr_model_build,
    lr_model_score,
)

DOCS = [
    (0, True, "good alpha beta good gamma"),
    (1, True, "good beta delta good"),
    (2, False, "bad zeta eta theta bad"),
    (3, False, "bad iota kappa bad bad"),
    (4, True, "good gamma delta"),
    (5, False, "bad theta iota"),
]


def _df(spark):
    return spark.createDataFrame(
        [Row(doc_id=d, is_t=y, text=t) for d, y, t in DOCS]
    )


def test_persisted_scores_bit_identical_to_inline(spark, tmp_path):
    df = _df(spark)
    inline = {
        r["doc_id"]: (r["n_tokens"], r["score_micro"], r["pred_target"])
        for r in lr_classifier_score(
            df, F.col("is_t"), epochs=3, lr=0.5
        ).collect()
    }
    path = str(tmp_path / "lrm")
    lr_model_build(df, F.col("is_t"), path, epochs=3, lr=0.5)
    served = {
        r["doc_id"]: (r["n_tokens"], r["score_micro"], r["pred_target"])
        for r in lr_model_score(spark, path, df).collect()
    }
    assert served == inline


def test_serving_runs_zero_training_jobs(spark, tmp_path):
    df = _df(spark)
    path = str(tmp_path / "lrm")
    lr_model_build(df, F.col("is_t"), path)
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    # Constructing the serving plan fires only bounded METADATA jobs:
    # the 1-row meta-sidecar read plus parquet footer/schema probes
    # (<=4 observed). Accidental retraining is unmistakable by
    # contrast — the eager per-epoch localCheckpoints fire far more
    # (>=6 for 2 epochs) plus the token-scan aggregates.
    out = lr_model_score(spark, path, df)
    mid = set(tracker.getJobIdsForGroup(None))
    assert len(mid - before) <= 4, "plan construction retrained"
    rows = out.collect()
    assert len(rows) == len(DOCS)


def test_meta_sidecar_pins_feature_space(spark, tmp_path):
    df = _df(spark)
    path = str(tmp_path / "lrm")
    lr_model_build(df, F.col("is_t"), path, hex_chars=3)
    inline = {
        r["doc_id"]: r["score_micro"]
        for r in lr_classifier_score(
            df, F.col("is_t"), hex_chars=3
        ).collect()
    }
    served = {
        r["doc_id"]: r["score_micro"]
        for r in lr_model_score(spark, path, df).collect()
    }
    # serving picked hex_chars=3 from the sidecar, not a default
    assert served == inline


def test_scores_new_documents_without_retraining(spark, tmp_path):
    df = _df(spark)
    path = str(tmp_path / "lrm")
    lr_model_build(df, F.col("is_t"), path, epochs=3)
    fresh = spark.createDataFrame(
        [
            Row(doc_id=100, text="good alpha gamma"),
            Row(doc_id=101, text="bad theta kappa"),
        ]
    )
    got = {
        r["doc_id"]: r["pred_target"]
        for r in lr_model_score(spark, path, fresh).collect()
    }
    assert got[100] is True
    assert got[101] is False
