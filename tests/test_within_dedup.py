"""D60: within-document repeated-segment removal — keep first
occurrence per doc, reassemble in order; no corpus statistic needed."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.dedup import within_doc_segment_dedup


def test_nav_block_repeats_removed_in_order(spark):
    page = "nav menu\nintro text\nnav menu\nbody text\nnav menu\nfooter"
    df = spark.createDataFrame([Row(doc_id=0, text=page)])
    (r,) = within_doc_segment_dedup(df).collect()
    assert r["text"] == "nav menu\nintro text\nbody text\nfooter"
    assert (r["n_kept"], r["n_dropped"]) == (4, 2)


def test_no_cross_document_effect(spark):
    # the SAME line in two docs is untouched — only within-doc repeats go
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="shared line\nalpha"),
            Row(doc_id=1, text="shared line\nbeta"),
        ]
    )
    out = {r["doc_id"]: r for r in within_doc_segment_dedup(df).collect()}
    assert out[0]["text"] == "shared line\nalpha"
    assert out[1]["text"] == "shared line\nbeta"
    assert all(r["n_dropped"] == 0 for r in out.values())


def test_every_doc_survives(spark):
    # even an all-repeats doc keeps its first segment
    df = spark.createDataFrame([Row(doc_id=0, text="x\nx\nx")])
    (r,) = within_doc_segment_dedup(df).collect()
    assert (r["text"], r["n_kept"], r["n_dropped"]) == ("x", 1, 2)


def test_matches_python_reference_on_fixture(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 100)
    )
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_dropped"])
        for r in within_doc_segment_dedup(docs, sep=" ").collect()
    }
    ref = {}
    for r in docs.collect():
        seen, kept = set(), []
        words = r["text"].split(" ")
        for w in words:
            if w not in seen:
                seen.add(w)
                kept.append(w)
        ref[r["doc_id"]] = (
            " ".join(kept), len(kept), len(words) - len(kept),
        )
    assert got == ref and ref


def test_deterministic_across_partitioning(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = sorted(map(tuple, within_doc_segment_dedup(
        docs.repartition(2), sep=" ").collect()))
    b = sorted(map(tuple, within_doc_segment_dedup(
        docs.repartition(9), sep=" ").collect()))
    assert a == b and a


def test_plan_no_window_no_cartesian(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    p = within_doc_segment_dedup(docs, sep=" ")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in p, p
    # first-occurrence keeper is a group-min aggregate, never a window
    assert "Window" not in p, p
