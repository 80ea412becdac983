"""r14 optimization pins: the shared classifier_features() relation and
the label_out ride-along produce BIT-IDENTICAL results to the separate
two-pass / join-back compositions they replace (guide §2.1/§2.4 — fewer
scans and shuffles, same arithmetic)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.classifier import (
    classifier_features,
    lr_classifier_score,
    nb_classifier_score,
)

DOCS = [
    ("d1", "alpha beta beta gamma", "src1"),
    ("d2", "alpha alpha delta", "src2"),
    ("d3", "beta gamma gamma gamma epsilon", "src3"),
    ("d4", "delta delta", "src2"),
    ("d5", "", "src1"),          # zero tokens: absent from every face
    ("d6", "zeta eta theta", None),  # NULL label
]


def _frame(spark):
    return spark.createDataFrame(
        [Row(doc_id=d, text=t, source=s) for d, t, s in DOCS]
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_shared_features_bit_identical(spark):
    d = _frame(spark)
    is_t = F.col("source").isin("src1", "src3")
    feats = classifier_features(d, is_t)
    nb_sep = nb_classifier_score(d, is_t)
    nb_shared = nb_classifier_score(d, is_t, features=feats)
    assert _rows(nb_sep) == _rows(nb_shared)
    lr_sep = lr_classifier_score(d, is_t, epochs=2, lr=0.5)
    lr_shared = lr_classifier_score(
        d, is_t, epochs=2, lr=0.5, features=feats
    )
    assert _rows(lr_sep) == _rows(lr_shared)


def test_label_out_matches_join_back(spark):
    d = _frame(spark).filter(F.col("source").isNotNull())
    is_t = F.col("source").isin("src1", "src3")
    via_label = lr_classifier_score(
        d, is_t, epochs=2, lr=0.5, label_out="y"
    )
    via_join = lr_classifier_score(d, is_t, epochs=2, lr=0.5).join(
        d.select("doc_id", is_t.alias("y")), "doc_id"
    )
    assert _rows(via_label.select("doc_id", "score_micro", "y")) == _rows(
        via_join.select("doc_id", "score_micro", "y")
    )


def test_label_out_null_source_is_false(spark):
    """A NULL label coerces to false in label_out — the same coercion
    training applies (when(pred, 1).otherwise(0)) and the same CASE
    semantics the SQL oracles use (NULL never matches WHEN y)."""
    d = _frame(spark)
    is_t = F.col("source").isin("src1", "src3")
    got = {
        r["doc_id"]: r["y"]
        for r in lr_classifier_score(
            d, is_t, epochs=2, lr=0.5, label_out="y"
        ).collect()
    }
    assert got["d6"] is False
    assert got["d1"] is True and got["d2"] is False


def test_shared_features_single_tokenize_plan(spark):
    """The agreement composition's purpose: with features= supplied,
    neither face re-tokenizes — no explode/split of the text column
    appears in either scoring plan."""
    d = _frame(spark)
    is_t = F.col("source").isin("src1", "src3")
    feats = classifier_features(d, is_t)
    for df in (
        nb_classifier_score(d, is_t, features=feats),
        lr_classifier_score(d, is_t, epochs=2, lr=0.5, features=feats),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Generate explode" not in plan
