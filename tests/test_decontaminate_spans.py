"""D71: span-level benchmark decontamination — cut only the leaked
spans, keep the rest of the document."""

from __future__ import annotations

from pyspark.sql import Row

from mysql2parquet_spark.operators.dedup import remove_matching_spans


def _py_removed(train, needles, k):
    needle_grams = set()
    for _, t in needles:
        toks = t.strip().split()
        for i in range(len(toks) - k + 1):
            needle_grams.add(" ".join(toks[i: i + k]))
    out = {}
    for d, t in train:
        toks = t.strip().split()
        covered = set()
        for i in range(len(toks) - k + 1):
            if " ".join(toks[i: i + k]) in needle_grams:
                covered.update(range(i + 1, i + k + 1))
        kept = [w for j, w in enumerate(toks, 1) if j not in covered]
        out[d] = (" ".join(kept), len(kept), len(toks) - len(kept))
    return out


def _run(spark, train, needles, k=3):
    tdf = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in train]
    )
    ndf = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in needles]
    )
    return {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_removed"])
        for r in remove_matching_spans(tdf, ndf, k=k).collect()
    }


def test_cuts_the_leaked_span_keeps_the_rest(spark):
    bench = "what is the capital of france"
    train = [
        (1, "intro words " + bench + " trailing content here"),
        (2, "completely unrelated document text"),
    ]
    needles = [(900, bench)]
    got = _run(spark, train, needles, k=3)
    assert got == _py_removed(train, needles, 3)
    assert got[1] == ("intro words trailing content here", 5, 6)
    assert got[2][2] == 0  # untouched


def test_fully_contaminated_doc_comes_back_empty(spark):
    bench = "a b c d e"
    train = [(1, bench)]
    got = _run(spark, train, [(9, bench)], k=3)
    assert got[1] == ("", 0, 5)


def test_matches_python_twin_on_fixture_eval_slice(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    from pyspark.sql import functions as F

    train = d.filter(F.col("doc_id") % 100 != 0)
    holdout = d.filter(F.col("doc_id") % 100 == 0)
    t_rows = [(r["doc_id"], r["text"]) for r in train.collect()]
    n_rows = [(r["doc_id"], r["text"]) for r in holdout.collect()]
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_removed"])
        for r in remove_matching_spans(train, holdout, k=3).collect()
    }
    assert got == _py_removed(t_rows, n_rows, 3)
    assert len(got) == len(t_rows)      # one row per train doc, always
    assert any(v[2] > 0 for v in got.values())  # contamination exists


def test_plan_needle_side_broadcast_no_python(spark, sf_dir):
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    train = d.filter(F.col("doc_id") % 100 != 0)
    holdout = d.filter(F.col("doc_id") % 100 == 0)
    out = remove_matching_spans(train, holdout, k=3)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # the gram membership probe is a broadcast semi-join (map-side)
    assert "BroadcastHashJoin" in p and "LeftSemi" in p, p


def test_needles_with_different_id_column(spark):
    # ADVICE r11: a benchmark table whose id column is named
    # differently (or absent) must work — needle ids are a fan-out
    # spread key only and never reach the output.
    train = [(1, "a b c d e"), (2, "x y z w v")]
    tdf = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in train]
    )
    # explicit needle_id_col
    ndf_named = spark.createDataFrame(
        [Row(bench_id=7, text="b c d")]
    )
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_removed"])
        for r in remove_matching_spans(
            tdf, ndf_named, k=3, needle_id_col="bench_id"
        ).collect()
    }
    assert got[1] == ("a e", 2, 3)
    assert got[2] == ("x y z w v", 5, 0)
    # no usable id column at all -> synthesized internally
    ndf_bare = spark.createDataFrame([Row(text="b c d")])
    got2 = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_removed"])
        for r in remove_matching_spans(tdf, ndf_bare, k=3).collect()
    }
    assert got2 == got
