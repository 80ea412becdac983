"""D50: corpus-frequent segment removal — the C4/RefinedWeb line dedup
(ban segments occurring >= min_count times corpus-wide, reassemble the
survivors in order)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.dedup import frequent_segment_removal

BOILER = "accept cookies to continue"


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text=f"{BOILER}\nunique alpha\nunique beta"),
            Row(doc_id=1, text=f"unique gamma\n{BOILER}\nunique delta"),
            Row(doc_id=2, text=f"unique epsilon\n{BOILER}"),
            # doc 3 is ONLY boilerplate — must vanish entirely
            Row(doc_id=3, text=BOILER),
            Row(doc_id=4, text="never repeated\nlines at all"),
        ]
    )


def test_c4_line_dedup_semantics(spark, pages):
    out = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_dropped"])
        for r in frequent_segment_removal(pages, min_count=3).collect()
    }
    # the 4x boilerplate line is gone from every survivor, order kept
    assert out[0] == ("unique alpha\nunique beta", 2, 1)
    assert out[1] == ("unique gamma\nunique delta", 2, 1)
    assert out[2] == ("unique epsilon", 1, 1)
    assert out[4] == ("never repeated\nlines at all", 2, 0)
    # the all-boilerplate doc disappears (survivors-only contract)
    assert 3 not in out


def test_min_count_gates_the_ban(spark, pages):
    # at min_count=5 nothing repeats often enough — all docs intact
    out = {
        r["doc_id"]: r["n_dropped"]
        for r in frequent_segment_removal(pages, min_count=5).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0}


def test_within_doc_repeats_count_globally(spark):
    # one doc repeating its own footer 3x bans it alone (C4 counts
    # occurrences, not distinct docs)
    df = spark.createDataFrame(
        [Row(doc_id=0, text="footer\nbody one\nfooter\nbody two\nfooter")]
    )
    (r,) = frequent_segment_removal(df, min_count=3).collect()
    assert (r["text"], r["n_kept"], r["n_dropped"]) == (
        "body one\nbody two", 2, 3,
    )


def test_matches_python_reference_on_fixture(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 120)
    )
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_dropped"])
        for r in frequent_segment_removal(
            docs, sep=" the ", min_count=2
        ).collect()
    }

    rows = {r["doc_id"]: r["text"].split(" the ") for r in docs.collect()}
    from collections import Counter

    freq = Counter(s for segs in rows.values() for s in segs)
    ref = {}
    for did, segs in rows.items():
        kept = [s for s in segs if freq[s] < 2]
        if kept:
            ref[did] = (" the ".join(kept), len(kept), len(segs) - len(kept))
    assert got == ref and ref


def test_deterministic_across_partitioning(spark, pages):
    a = sorted(
        map(tuple, frequent_segment_removal(
            pages.repartition(1), min_count=3).collect())
    )
    b = sorted(
        map(tuple, frequent_segment_removal(
            pages.repartition(7), min_count=3).collect())
    )
    assert a == b and a


def test_min_count_validation(spark, pages):
    with pytest.raises(ValueError, match="min_count"):
        frequent_segment_removal(pages, min_count=1)


def test_plan_no_cartesian_no_window(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = frequent_segment_removal(docs, sep=" the ", min_count=2)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    # reassembly is an agg on collected (pos, seg) structs — no Window
    # (a window would serialize each doc group through a sort stage)
    assert "Window" not in p, p
