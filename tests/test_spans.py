"""D62: maximal duplicated-span report + span removal — adjacent
duplicated k-windows merged into the longest repeated substrings
(the Lee et al. 2021 ExactSubstr approximation), plus the trim face
that removes ALL occurrences of covered tokens."""

from __future__ import annotations

from pyspark.sql import Row

from mysql2parquet_spark.operators.dedup import (
    duplicated_spans,
    remove_duplicated_spans,
)


def _py_spans(docs, k, min_docs):
    toks = {d: t.strip().split() for d, t in docs}
    gram_docs: dict[str, set] = {}
    for d, t in toks.items():
        for i in range(len(t) - k + 1):
            g = " ".join(t[i: i + k])
            gram_docs.setdefault(g, set()).add(d)
    spans = []
    for d, t in toks.items():
        hits = [
            i + 1
            for i in range(len(t) - k + 1)
            if len(gram_docs[" ".join(t[i: i + k])]) >= min_docs
        ]
        start = prev = None
        for p in hits:
            if start is None:
                start = prev = p
            elif p == prev + 1:
                prev = p
            else:
                spans.append((d, start, prev + k - 1, prev - start + k))
                start = prev = p
        if start is not None:
            spans.append((d, start, prev + k - 1, prev - start + k))
    return sorted(spans)


def _py_removed(docs, k, min_docs):
    toks = {d: t.strip().split() for d, t in docs}
    covered: dict = {d: set() for d in toks}
    for d, s, e, _ in _py_spans(docs, k, min_docs):
        covered[d].update(range(s, e + 1))
    out = {}
    for d, t in toks.items():
        kept = [w for i, w in enumerate(t, 1) if i not in covered[d]]
        out[d] = (" ".join(kept), len(kept), len(t) - len(kept))
    return out


def _spans(spark, docs, **kw):
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs]
    )
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_spans(df, **kw).collect()
    )


def test_planted_shared_run_recovered_exactly(spark):
    # docs 1 and 2 share a 12-token run; doc 3 is all-unique filler.
    shared = " ".join(f"s{i}" for i in range(12))
    docs = [
        (1, "a1 a2 a3 " + shared + " a4 a5"),
        (2, "b1 " + shared + " b2 b3 b4 b5"),
        (3, " ".join(f"u{i}" for i in range(20))),
    ]
    got = _spans(spark, docs, k=4, min_docs=2)
    # doc 1: shared run occupies token positions 4..15; doc 2: 2..13
    assert got == [(1, 4, 15, 12), (2, 2, 13, 12)]
    assert got == _py_spans(docs, 4, 2)


def test_two_islands_stay_separate_beyond_k(spark):
    # two shared 5-token runs separated by >= k unique tokens: two
    # span rows each; the k-quantization contract (runs overlapping
    # within k-1 tokens would merge) is pinned by the Python twin.
    r1 = " ".join(f"x{i}" for i in range(5))
    r2 = " ".join(f"y{i}" for i in range(5))
    docs = [
        (1, r1 + " g1 g2 g3 g4 g5 " + r2),
        (2, r1 + " h1 h2 h3 h4 h5 " + r2),
    ]
    got = _spans(spark, docs, k=4, min_docs=2)
    assert got == _py_spans(docs, 4, 2)
    assert len(got) == 4  # 2 spans per doc
    assert {(s, e) for _, s, e, _ in got if _ == 1 or True} >= {
        (1, 5), (11, 15)
    }


def test_short_docs_and_no_dups_emit_nothing(spark):
    docs = [(1, "one two three"), (2, "four five six")]
    assert _spans(spark, docs, k=4, min_docs=2) == []


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = [(r["doc_id"], r["text"]) for r in df.collect()]
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_spans(df, k=8, min_docs=2).collect()
    )
    assert got == _py_spans(docs, 8, 2) and got


def test_remove_cuts_all_occurrences_and_keeps_empty_docs(spark):
    shared = " ".join(f"s{i}" for i in range(8))
    docs = [
        (1, "a1 a2 " + shared + " a3"),
        (2, shared),           # fully duplicated -> text ''
        (3, "c1 c2 c3 c4 c5"),  # untouched
    ]
    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in docs])
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_removed"])
        for r in remove_duplicated_spans(df, k=4, min_docs=2).collect()
    }
    assert got == _py_removed(docs, 4, 2)
    assert got[1] == ("a1 a2 a3", 3, 8)
    assert got[2] == ("", 0, 8)       # removed, not vanished
    assert got[3] == ("c1 c2 c3 c4 c5", 5, 0)


def test_remove_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = [(r["doc_id"], r["text"]) for r in df.collect()]
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_removed"])
        for r in remove_duplicated_spans(df, k=8, min_docs=2).collect()
    }
    assert got == _py_removed(docs, 8, 2)
    assert len(got) == len(docs)  # one row per input doc, always
    assert any(v[2] > 0 for v in got.values())


def test_plan_no_cartesian_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    for out in (
        duplicated_spans(df, k=8, min_docs=2),
        remove_duplicated_spans(df, k=8, min_docs=2),
    ):
        p = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p, p
        assert "BroadcastNestedLoopJoin" not in p, p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
