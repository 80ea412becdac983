"""D35 BPE trainer/tokenizer tests. Training is not SQL-expressible
(iterative argmax state), so the oracle here is a pure-Python REFERENCE
implementation of the published algorithm (Sennrich et al. 2016) run on
the same word-frequency relation — the kmeans/JPEG precedent for
non-SQL ops: bit-equal against a sequential reference in pytest, rows-
only at the driver."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.bpe import (
    _EOW,
    _PRETOKEN_RE,
    bpe_token_frequencies,
    bpe_tokenize,
    bpe_train,
    word_frequencies,
)


# ---------------------------------------------------------- reference

def _ref_merge_word(syms, l, r, m):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
            out.append(m)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(word_freqs: dict[str, int], num_merges: int):
    vocab = {tuple(list(w) + [_EOW]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + f
                )
        if not pairs:
            break
        # max count, ties to the lexicographically SMALLEST pair —
        # the trainer's (n DESC, l ASC, r ASC) order
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        l, r = best
        m = l + r
        vocab = {
            (_ref_merge_word(s, l, r, m) if l in s and r in s else s): f
            for s, f in vocab.items()
        }
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


# ---------------------------------------------------------------- train

def test_bpe_train_matches_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    wf = {
        r["word"]: r["freq"]
        for r in word_frequencies(docs).collect()
    }
    got = bpe_train(docs, num_merges=20, loop_partitions=4)
    want = _ref_train(wf, 20)
    assert got == want


def test_bpe_train_handles_quote_symbols(spark):
    # pre-tokens include single quote/punct symbols; they must survive
    # the merge machinery (symbols ride as lit Columns, never SQL text)
    docs = _docs(spark, ["don't don't don't can't", "it's it's"])
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert "'" in wf
    got = bpe_train(docs, num_merges=8)
    want = _ref_train(wf, 8)
    assert got == want
    assert any("'" in l or "'" in r for l, r in got)  # quote merged


def test_bpe_train_deterministic_ties(spark):
    # equal-count pairs must break lexicographically, identically on
    # every run/partitioning
    docs = _docs(spark, ["ab cd ab cd", "ab cd"])
    a = bpe_train(docs, num_merges=4)
    b = bpe_train(docs.repartition(7), num_merges=4)
    assert a == b
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert a == _ref_train(wf, 4)


def test_bpe_train_validation(spark):
    docs = _docs(spark, ["x"])
    with pytest.raises(ValueError):
        bpe_train(docs, num_merges=0)


def test_bpe_train_hybrid_paths_identical(spark, sf_dir):
    """The r8 VERDICT crossover: the driver-side incremental trainer
    (default when |distinct words| fits) and the distributed merge loop
    (forced with driver_threshold=0) must learn IDENTICAL merges on
    the same corpus — and both must match the naive reference."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    local = bpe_train(docs, num_merges=20)  # default: driver-side
    dist = bpe_train(
        docs, num_merges=20, loop_partitions=4, driver_threshold=0
    )
    assert local == dist
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert local == _ref_train(wf, 20)


def test_bpe_train_driver_side_zero_loop_jobs(spark):
    """Below the threshold, training must cost ONE word-frequency
    count + ONE collect — no per-merge Spark jobs (the whole point of
    the hybrid: a 50k-merge vocab must not mean ~100k cluster jobs)."""
    docs = _docs(spark, ["the cat sat on the mat the cat"] * 3)
    sc = spark.sparkContext

    def jobs(n_merges, tag):
        group = f"bpe-hybrid-{tag}"
        sc.setJobGroup(group, group)
        try:
            merges = bpe_train(docs, num_merges=n_merges)
        finally:
            sc.setJobGroup(None, None)
        assert merges
        return len(sc.statusTracker().getJobIdsForGroup(group))

    # the word-freq count + collect cost a fixed handful of jobs (AQE
    # runs stage-wise); the merge loop must add ZERO more — 6x the
    # merges, identical job count
    assert jobs(5, "a") == jobs(30, "b")


# ------------------------------------------------------------- tokenize

def test_bpe_tokenize_lossless_and_merged(spark):
    texts = ["the cat sat on the mat", "the mat the cat"]
    docs = _docs(spark, texts)
    merges = bpe_train(docs, num_merges=10)
    out = {r["doc_id"]: r for r in
           bpe_tokenize(docs, merges).collect()}
    pat = re.compile(_PRETOKEN_RE)
    for i, t in enumerate(texts):
        toks = out[i]["tokens"]
        # lossless: stripping the EOW markers reconstructs the
        # pre-token stream exactly
        rejoined = "".join(toks).split(_EOW)
        assert [x for x in rejoined if x] == pat.findall(t)
        assert out[i]["n_tokens"] == len(toks)
    # "the" occurs 4x — its full merge must exist and be used
    assert any(tok == "the" + _EOW for r in out.values()
               for tok in r["tokens"])


def test_bpe_tokenize_unseen_word_falls_back_to_chars(spark):
    docs = _docs(spark, ["aaa aaa"])
    merges = bpe_train(docs, num_merges=3)
    new = _docs(spark, ["zq"])
    toks = bpe_tokenize(new, merges).collect()[0]["tokens"]
    assert toks == ["z", "q", _EOW] or toks == ["z", "q" + _EOW]


def test_bpe_tokenize_memo_cap_reset_is_lossless(spark):
    """ADVICE r8: the per-worker memo is bounded. memo_cap=1 forces a
    reset on every new word — output must be identical to the
    unbounded path (the cap changes cache behavior, never results)."""
    texts = ["the cat sat on the mat", "the mat the cat", "a b c a b"]
    docs = _docs(spark, texts)
    merges = bpe_train(docs, num_merges=10)
    capped = {r["doc_id"]: list(r["tokens"]) for r in
              bpe_tokenize(docs, merges, memo_cap=1).collect()}
    full = {r["doc_id"]: list(r["tokens"]) for r in
            bpe_tokenize(docs, merges).collect()}
    assert capped == full
    with pytest.raises(ValueError, match="memo_cap"):
        bpe_tokenize(docs, merges, memo_cap=0)


def test_bpe_token_frequencies_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    merges = bpe_train(docs, num_merges=10)
    out = bpe_token_frequencies(docs, merges, top=15)
    rows = out.collect()
    assert out.columns == ["token", "n", "n_docs"]
    assert len(rows) <= 15
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(r["n_docs"] <= r["n"] for r in rows)


def test_bpe_tokenize_plan_is_single_projection(spark):
    docs = _docs(spark, ["a b c"])
    merges = [("a", _EOW)]
    out = bpe_tokenize(docs, merges)
    p = out._jdf.queryExecution().explainString(
        out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple")
    )
    assert "Exchange" not in p, p
    assert p.count("ArrowEvalPython") == 1, p
