"""D53: content-defined chunking — boundaries are a pure function of
local word content, so chunk-level dedup survives prepend/insert edits
that shift every fixed-width window."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.dedup import (
    cdc_chunk_dup_stats,
    cdc_chunks,
)


def _is_boundary(w, hexes=("0", "1"), salt="cdc"):
    return hashlib.md5(f"{w}:{salt}".encode()).hexdigest()[0] in hexes


def _py_chunks(text, hexes=("0", "1")):
    out, cur = [], []
    for w in text.strip().split():
        cur.append(w)
        if _is_boundary(w, hexes):
            out.append(" ".join(cur))
            cur = []
    if cur:
        out.append(" ".join(cur))
    return out


def test_chunks_match_python_reference(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 80)
    )
    got = {}
    for r in cdc_chunks(docs).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk"]
    ref = {
        r["doc_id"]: dict(enumerate(_py_chunks(r["text"])))
        for r in docs.collect()
    }
    assert got == ref and ref


def test_chunks_reassemble_to_the_token_stream(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 40)
    )
    got = {}
    for r in sorted(
        cdc_chunks(docs).collect(), key=lambda r: (r["doc_id"], r["chunk_id"])
    ):
        got.setdefault(r["doc_id"], []).append(r["chunk"])
    for r in docs.collect():
        assert " ".join(got[r["doc_id"]]) == " ".join(r["text"].split())


def test_prepend_resyncs_chunks(spark):
    base = " ".join(f"w{i}" for i in range(400))
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=base),
            Row(doc_id=1, text="zzz_prepended_header " + base),
        ]
    )
    chunks = {}
    for r in cdc_chunks(df).collect():
        chunks.setdefault(r["doc_id"], set()).add(r["chunk"])
    shared = chunks[0] & chunks[1]
    # CDC resynchronizes after the first boundary: almost every chunk
    # of the original reappears verbatim in the prepended copy
    assert len(shared) >= len(chunks[0]) - 1 and len(chunks[0]) > 10
    # and the dup report sees the copy as ~fully duplicated
    stats = {
        r["doc_id"]: r for r in cdc_chunk_dup_stats(df).collect()
    }
    assert stats[1]["n_dup_chunks"] >= stats[1]["n_chunks"] - 2


def test_expected_chunk_length_tracks_boundary_probability(spark):
    text = " ".join(f"tok{i}" for i in range(3000))
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    n_wide = cdc_chunks(df, boundary_hexes=("0",)).count()       # p=1/16
    n_narrow = cdc_chunks(
        df, boundary_hexes=tuple("01234567")
    ).count()                                                     # p=1/2
    assert n_narrow > 2 * n_wide
    assert abs(n_wide - 3000 / 16) < 3000 / 16  # loose sanity band


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="a b c")])
    with pytest.raises(ValueError, match="boundary_hexes"):
        cdc_chunks(df, boundary_hexes=())
    with pytest.raises(ValueError, match="boundary_hexes"):
        cdc_chunks(df, boundary_hexes=("X",))


def test_deterministic_across_partitioning(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = sorted(map(tuple, cdc_chunk_dup_stats(
        docs.repartition(2)).collect()))
    b = sorted(map(tuple, cdc_chunk_dup_stats(
        docs.repartition(11)).collect()))
    assert a == b and a


def test_plan_one_window_no_cartesian(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    p = cdc_chunk_dup_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    # the chunk relation is pinned once (localCheckpoint), so the stats
    # plan reuses it — the explode+window subtree must NOT replay per
    # side of the count join
    assert "Window" not in p, p
    # the chunking plan itself carries exactly one Window (prefix sum)
    pc = cdc_chunks(docs)._jdf.queryExecution().executedPlan().toString()
    assert pc.count("Window [") == 1, pc
