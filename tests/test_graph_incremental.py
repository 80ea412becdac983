"""D41 incremental connected components: folding edge batches into a
standing assignment must equal the full recompute, while untouched
components bypass the fixpoint entirely."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.graph import (
    connected_components,
    gram_star_edges,
    incremental_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _cc(df):
    return sorted((r["v"], r["component"]) for r in df.collect())


def test_matches_full_recompute_handmade(spark):
    # standing graph: {1,2,3} and {10,11}; batch bridges 3-10 and adds
    # a brand-new component {20,21}
    old = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    assign = connected_components(old)
    batch = _edges(spark, [(3, 10), (20, 21)])
    got = _cc(incremental_components(assign, batch))
    want = _cc(connected_components(old.unionByName(batch)))
    assert got == want
    comp = dict(got)
    assert comp[11] == 1  # the bridge merged both into min id 1
    assert comp[21] == 20  # the new component labeled by its own min


def test_untouched_component_passes_through_anti_join(spark):
    old = _edges(spark, [(1, 2), (10, 11), (100, 101)])
    assign = connected_components(old)
    batch = _edges(spark, [(2, 3)])  # touches only component 1
    out = incremental_components(assign, batch)
    got = _cc(out)
    assert (10, 10) in got and (11, 10) in got and (3, 1) in got
    # the untouched branch is an anti-join on the touched-component
    # set, not a re-run of the loop over those rows
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in p, p


def test_chained_batches_equal_full(spark, sf_dir):
    """The crawl shape on real fixture data: components over the
    shared-gram graph of the first 250 docs, then fold the remaining
    docs' edges — must hash-equal CC over the full graph."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cut = 250
    hist_edges = gram_star_edges(docs.filter(F.col("doc_id") < cut))
    all_edges = gram_star_edges(docs)
    new_edges = all_edges.filter(
        (F.col("src") >= cut) | (F.col("dst") >= cut)
    )
    assign = connected_components(hist_edges)
    got = _cc(incremental_components(assign, new_edges))
    want = _cc(connected_components(all_edges))
    assert got == want
    assert got  # non-trivial: the fixture has cross-cut duplicates


def test_new_only_batch_and_empty_assign(spark):
    # empty standing assignment: the fold IS the batch CC
    empty = connected_components(_edges(spark, [(1, 2)])).limit(0)
    batch = _edges(spark, [(5, 6), (6, 7)])
    got = _cc(incremental_components(empty, batch))
    assert got == [(5, 5), (6, 5), (7, 5)]


def test_deterministic_across_partitionings(spark):
    old = _edges(spark, [(i, i + 1) for i in range(0, 40, 2)])
    assign = connected_components(old)
    batch = _edges(spark, [(1, 2), (21, 22), (39, 0)])
    a = _cc(incremental_components(assign.repartition(3), batch.repartition(5)))
    b = _cc(incremental_components(assign.repartition(11), batch.repartition(2)))
    assert a == b
