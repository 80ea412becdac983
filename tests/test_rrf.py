"""D59: reciprocal-rank fusion — rank-only combining of top-k lists,
integer-quantized reciprocals, engine-exact consensus order."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.similarity import (
    rrf_fuse,
    topk_ranking,
)


def _ranking(spark, ordered_ids):
    return spark.createDataFrame(
        [Row(doc_id=d, rank=i + 1) for i, d in enumerate(ordered_ids)]
    )


def test_consensus_beats_single_list_winners(spark):
    # doc 5 is 2nd in all three lists; each list's #1 appears only once
    r1 = _ranking(spark, [101, 5, 7, 8])
    r2 = _ranking(spark, [102, 5, 8, 9])
    r3 = _ranking(spark, [103, 5, 9, 7])
    out = rrf_fuse([r1, r2, r3]).collect()
    assert out[0]["doc_id"] == 5 and out[0]["n_lists"] == 3
    # the three singleton winners tie exactly and break by id
    singles = [r["doc_id"] for r in out if r["n_lists"] == 1
               and r["rrf_micro"] == out[1]["rrf_micro"]]
    assert 101 in [r["doc_id"] for r in out]


def test_scores_match_python_reference(spark):
    r1 = _ranking(spark, [1, 2, 3])
    r2 = _ranking(spark, [3, 1, 4])
    got = {r["doc_id"]: (r["rrf_micro"], r["n_lists"])
           for r in rrf_fuse([r1, r2]).collect()}

    def rr(rank):
        return math.floor(1e9 / (60 + rank))

    ref = {
        1: (rr(1) + rr(2), 2),
        2: (rr(2), 1),
        3: (rr(3) + rr(1), 2),
        4: (rr(3), 1),
    }
    assert got == ref


def test_topk_ranking_bounded_and_tiebroken(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, s=float(i % 3)) for i in range(20)]
    )
    r = topk_ranking(df, "s", 5).collect()
    assert [x["rank"] for x in r] == [1, 2, 3, 4, 5]
    # ties on s=2.0 break by doc_id ascending
    assert [x["doc_id"] for x in r] == [2, 5, 8, 11, 14]
    # ascending mode flips the order
    ra = topk_ranking(df, "s", 3, ascending=True).collect()
    assert [x["doc_id"] for x in ra] == [0, 3, 6]


def test_fusion_is_rank_only(spark):
    # scaling scores by 1000x changes nothing — only ranks enter
    df1 = spark.createDataFrame(
        [Row(doc_id=i, s=float(i)) for i in range(10)]
    )
    df2 = df1.withColumn("s", F.col("s") * 1000.0)
    a = rrf_fuse([topk_ranking(df1, "s", 5)]).collect()
    b = rrf_fuse([topk_ranking(df2, "s", 5)]).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_validation(spark):
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])
    df = spark.createDataFrame([Row(doc_id=0, s=1.0)])
    with pytest.raises(ValueError, match="k must be"):
        topk_ranking(df, "s", 0)
    with pytest.raises(ValueError, match="k_const"):
        rrf_fuse([topk_ranking(df, "s", 1)], k_const=0)


def test_plan_bounded_window_after_topk(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    out = topk_ranking(docs, "n_chars", 100)
    p = out._jdf.queryExecution().executedPlan().toString()
    # the heap top-k runs BEFORE the single-task rank window, so the
    # window's input is k rows by construction
    assert "TakeOrderedAndProject" in p, p
    assert p.index("Window") < p.index("TakeOrderedAndProject"), p


def test_top_k_zero_rejected_not_unlimited(spark):
    # ADVICE r10: top_k=0 must raise, not silently mean "no limit";
    # negative values are equally invalid.
    df = spark.createDataFrame(
        [Row(doc_id=i, s=float(i)) for i in range(10)]
    )
    r = topk_ranking(df, "s", 5)
    with pytest.raises(ValueError, match="top_k"):
        rrf_fuse([r], top_k=0)
    with pytest.raises(ValueError, match="top_k"):
        rrf_fuse([r], top_k=-3)
    assert len(rrf_fuse([r], top_k=2).collect()) == 2
