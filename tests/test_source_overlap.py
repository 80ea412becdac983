"""D66: cross-source duplicate-overlap matrix — which feeds mirror
each other, measured on document fingerprints before any pairwise
document dedup."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.dedup import source_overlap_matrix


def _py_matrix(rows, fingerprint):
    fps = {}
    for _, text, src in rows:
        if fingerprint == "exact":
            f = text
        else:
            f = " ".join(sorted(set(text.strip().split())))
        fps.setdefault(src, set()).add(f)
    out = {}
    srcs = sorted(fps)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            c = len(fps[sa] & fps[sb])
            if not c:
                continue
            na, nb = len(fps[sa]), len(fps[sb])
            out[(sa, sb)] = (
                na, nb, c,
                math.floor(c / (na + nb - c) * 10_000) / 10_000,
                math.floor(c / min(na, nb) * 10_000) / 10_000,
            )
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t, source=s) for d, t, s in rows]
    )
    return {
        (r["source_a"], r["source_b"]): (
            r["n_a"], r["n_b"], r["n_common"],
            r["jaccard"], r["containment"],
        )
        for r in source_overlap_matrix(df, **kw).collect()
    }


def test_mirror_and_disjoint_sources(spark):
    rows = [
        (1, "alpha beta gamma", "s1"),
        (2, "delta epsilon", "s1"),
        (3, "alpha beta gamma", "s2"),   # mirror of doc 1
        (4, "delta epsilon", "s2"),      # mirror of doc 2
        (5, "zeta eta", "s3"),           # disjoint
    ]
    got = _run(spark, rows, fingerprint="exact")
    assert got == _py_matrix(rows, "exact")
    assert got[("s1", "s2")] == (2, 2, 2, 1.0, 1.0)
    assert ("s1", "s3") not in got  # zero-overlap pairs absent


def test_bow_catches_shuffled_mirrors_exact_does_not(spark):
    rows = [
        (1, "one two three", "s1"),
        (2, "three two one", "s2"),       # shuffled mirror
        (3, "three two two one", "s3"),   # repetition-normalized too
    ]
    assert _run(spark, rows, fingerprint="exact") == {}
    bow = _run(spark, rows, fingerprint="bow")
    assert set(bow) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert bow[("s1", "s2")] == (1, 1, 1, 1.0, 1.0)


def test_within_source_duplicates_count_once(spark):
    rows = [
        (1, "same text here", "s1"),
        (2, "same text here", "s1"),  # within-source dup: one fp
        (3, "same text here", "s2"),
        (4, "other words now", "s2"),
    ]
    got = _run(spark, rows, fingerprint="exact")
    assert got[("s1", "s2")] == (1, 2, 1, 0.5, 1.0)


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="x", source="s")])
    with pytest.raises(ValueError, match="fingerprint"):
        source_overlap_matrix(df, fingerprint="simhash")


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    rows = [
        (r["doc_id"], r["text"], r["source"]) for r in df.collect()
    ]
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_a"], r["n_b"], r["n_common"],
            r["jaccard"], r["containment"],
        )
        for r in source_overlap_matrix(df, fingerprint="bow").collect()
    }
    assert got == _py_matrix(rows, "bow") and got


def test_plan_no_cartesian_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    p = (
        source_overlap_matrix(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
