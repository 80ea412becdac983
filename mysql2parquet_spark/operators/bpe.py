"""Distributed BPE tokenizer training + application (D35).

Token counting elsewhere in the engine is regex-based (C4); a training
pipeline eventually needs the real thing: byte-pair-encoding merges
learned FROM the corpus (Sennrich et al. 2016 — public algorithm), then
applied to tokenize/count. The classic formulation is sequential; the
distributed shape that survives 100 TB:

1. **Word-frequency relation, not the corpus.** Pre-tokenize (the
   standard whitespace+punctuation splitter) and count distinct words:
   one corpus scan + one |distinct words|-row exchange. Zipf makes this
   relation orders of magnitude smaller than the corpus, and EVERYTHING
   iterative happens on it — the corpus is never touched again during
   training.
2. **Merge loop on the bounded relation.** Each iteration: explode each
   word's symbol array into adjacent pairs weighted by word frequency,
   partial-agg count, take the argmax pair (ONE row to the driver —
   bounded metadata, the kmeans_lite loop contract), then rewrite the
   symbol arrays of the words that CONTAIN the pair (everyone else
   passes through untouched). The relation is persisted and re-persisted
   every few merges (lineage would otherwise grow linearly like the CC
   pointer-doubling chain — same checkpoint discipline).
3. **Tokenize = Arrow UDF + broadcast ranks.** Applying a trained merge
   table is embarrassingly parallel: the ranks dict (vocab-bounded
   metadata) closes over a pandas UDF; each batch tokenizes its docs
   with a per-word memo cache (Zipf again: a batch re-sees the same
   words constantly). Greedy lowest-rank-first application — the
   standard BPE apply.

Determinism: pair-count ties break on the pair's lexicographic order,
so the merge sequence is a pure function of the word-frequency relation;
training is reproducible across partitionings and engines. Training is
NOT SQL-expressible (iterative argmax state), so the registered query is
rows-only; tests/test_bpe.py instead proves the distributed trainer
BIT-EQUAL to a pure-Python reference implementation on the fixture (the
kmeans/JPEG precedent: non-SQL ops get a reference oracle in pytest).

The reference exports text columns untouched
(/root/reference/main.go:106-203); this surface exists for the
training pipeline the engine targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the standard GPT-2-style-ish pre-tokenizer, simplified to what the
# fixture corpus needs: runs of letters, runs of digits, or a single
# non-space symbol. Public, engine-portable regex.
_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_EOW = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The |distinct words|-row relation BPE trains on: ``(word, freq)``.
    One corpus scan (regexp_extract_all + explode, codegen) and one
    word-keyed partial-agg exchange."""
    words = docs.select(
        F.explode(
            # pattern as a lit Column — never spliced through the SQL
            # string parser (backslash classes survive verbatim)
            F.regexp_extract_all(F.col(text_col), F.lit(_PRETOKEN_RE), 0)
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _merge_word(syms: list[str], l: str, r: str, m: str) -> list[str]:
    """Left-to-right non-overlapping glue of every adjacent (l, r) —
    the same order the distributed aggregate-fold rewrite applies."""
    out, i = [], 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == l and syms[i + 1] == r:
            out.append(m)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_driver_side(
    word_freqs: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Driver-side BPE trainer with INCREMENTAL pair-count maintenance
    (the subword-nmt shape, public algorithm): a pair → word-ids
    inverted index makes each merge touch only the words that contain
    the winning pair, subtracting their old adjacencies and adding the
    rewritten ones — O(touched positions) per merge instead of a full
    vocabulary rescan, which is what makes a 32k-50k-merge production
    vocab tractable in one process. Bit-equal to the distributed loop
    (same position-weighted counts, same (n DESC, l ASC, r ASC)
    argmax, same left-first glue) — proven in tests/test_bpe.py.
    """
    words: list[list] = [
        [list(w) + [_EOW], f] for w, f in word_freqs.items()
    ]
    pair_counts: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, f) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + f
            index.setdefault(p, set()).add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # max count, ties to the lexicographically smallest pair —
        # identical to the distributed (n DESC, p.l, p.r) orderBy
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        l, r = best
        m = l + r
        for wi in index.pop(best, set()):
            syms, f = words[wi]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                c = pair_counts.get(p)
                if c is not None:
                    if c - f <= 0:
                        del pair_counts[p]
                    else:
                        pair_counts[p] = c - f
                ids = index.get(p)
                if ids is not None:
                    ids.discard(wi)
                    if not ids:
                        del index[p]
            new = _merge_word(syms, l, r, m)
            words[wi][0] = new
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + f
                index.setdefault(p, set()).add(wi)
    return merges


def bpe_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 50,
    loop_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    driver_threshold: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list ``[(left, right), ...]`` — vocab-bounded METADATA
    (the artifact you'd persist next to the dataset), not data.

    HYBRID execution (the r8 VERDICT fix): the corpus is scanned
    exactly once either way (``word_frequencies`` — one scan + one
    word-keyed exchange), and the iterative merge loop runs on
    whichever side the Zipf-BOUNDED word relation fits. When
    |distinct words| <= ``driver_threshold`` the relation is collected
    and trained driver-side with incremental pair-count maintenance —
    a 50k-merge production vocab is ~50k dict updates per merge, not
    ~100k sequential cluster jobs. Above the threshold the distributed
    loop below takes over. Crossover rule: a distinct-word row is a
    short string + a long (~100 B); the default 1M-word threshold is
    ~100 MB of driver heap — far below any realistic driver, while
    2 Spark jobs × num_merges only wins when the relation genuinely
    cannot fit (multi-billion-type vocabularies). Both paths are
    BIT-EQUAL on the same corpus (tests/test_bpe.py); set
    ``driver_threshold=0`` to force the distributed loop.

    Distributed loop cost: each merge is one pair-count aggregate over
    the exploded word-symbol relation (|words| × avg symbols rows into
    a partial agg, |distinct pairs| across the exchange) + one argmax
    row to the driver + one array rewrite on affected words. Each
    generation is pinned with ``localCheckpoint(eager=True)``
    (``checkpoint_dir`` switches to reliable ``checkpoint()`` for
    cluster jobs — the connected_components contract): the rewrite
    references its input column several times, so an unpinned chain
    compounds expression size per merge (the CollapseProject blowup
    class — observed as a plan-tree-string OOM at merge ~14 before
    pinning). ``loop_partitions`` coalesces the word relation for the
    loop: when |distinct words| is small relative to the cluster,
    per-iteration task overhead dominates and a handful of partitions
    is faster; leave None for vocabularies above the threshold.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1: {num_merges}")
    if checkpoint_dir is not None:
        docs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _pin(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    wf = word_frequencies(docs, text_col)
    if driver_threshold > 0:
        # ONE capped collect decides the path AND fetches the relation
        # (r14): CollectLimit(threshold+1) never moves more than
        # threshold+1 rows to the driver — the same OOM guard the old
        # persist+count+collect pair enforced, minus one full pass and
        # the persist round-trip. A truncated result (threshold+1 rows)
        # means the vocabulary is over budget; fall through to the
        # distributed loop.
        rows = wf.limit(driver_threshold + 1).collect()  # bounded-metadata: <= threshold+1 rows
        if len(rows) <= driver_threshold:
            freqs = {r["word"]: r["freq"] for r in rows}
            return _train_driver_side(freqs, num_merges)
    if loop_partitions is not None:
        wf = wf.coalesce(loop_partitions)

    # symbol arrays: characters + end-of-word marker
    prev = _pin(
        wf.select(
            "freq",
            F.concat(
                F.split(F.col("word"), ""), F.array(F.lit(_EOW))
            ).alias("syms"),
        )
    )

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = prev.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1), "
                    "(s, i) -> struct(s AS l, syms[i + 1] AS r))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.l"), F.col("p.r"))
            .limit(1)
            .collect()  # bounded-metadata: the single argmax pair
        )
        if not top:
            break
        left, right = top[0]["p"]["l"], top[0]["p"]["r"]
        merges.append((left, right))
        merged = left + right
        # rewrite ONLY words containing the pair; aggregate-fold walks
        # the symbol array left-to-right gluing (left, right) — the
        # same greedy left-first non-overlapping order the sequential
        # algorithm uses. Symbols ride as lit() Columns, never spliced
        # into a SQL string (pre-tokens include quote characters).
        has_pair = F.arrays_overlap(
            F.col("syms"), F.array(F.lit(left))
        ) & F.arrays_overlap(F.col("syms"), F.array(F.lit(right)))

        def _make_fold(_l: str, _r: str, _m: str):
            def fold(acc, s):
                glue = (
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(_l))
                    & (s == F.lit(_r))
                )
                return F.when(
                    glue,
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - 1),
                        F.array(F.lit(_m)),
                    ),
                ).otherwise(F.concat(acc, F.array(s)))

            return fold

        rewrite = F.aggregate(
            "syms",
            F.expr("cast(array() as array<string>)"),
            _make_fold(left, right, merged),
        )
        prev = _pin(
            prev.withColumn(
                "syms", F.when(has_pair, rewrite).otherwise(F.col("syms"))
            )
        )
    return merges


def _apply_merges(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Sequential greedy BPE apply (lowest-rank pair first) — the
    reference semantics for one word; used per-batch under a memo."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # merge EVERY occurrence of that pair, left to right (matches
        # the trainer's left-first fold)
        l, r = syms[best], syms[best + 1]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    memo_cap: int = 200_000,
) -> DataFrame:
    """Tokenize the corpus with a trained merge list. Returns
    ``(id_col, tokens array<string>, n_tokens)``. Zero shuffles — one
    Arrow-batched projection; the ranks dict is vocab-bounded metadata
    closed over the UDF, and a per-executor word memo exploits Zipf
    (most words repeat, so each distinct word is merged once per
    executor, not once per occurrence). The memo is CAPPED at
    ``memo_cap`` distinct words and reset when full (ADVICE r8: a
    Python worker lives for many tasks, so an unbounded dict on a
    high-cardinality corpus grows for the worker's lifetime and can
    OOM executors; Zipf means a modest cap keeps nearly all the hit
    rate — the head of the distribution re-fills the memo in the
    first few batches after a reset)."""
    import re

    import pandas as pd  # noqa: F811 — needed in scope for the UDF hints
    from pyspark.sql.functions import pandas_udf

    if memo_cap < 1:
        raise ValueError(f"memo_cap must be >= 1: {memo_cap}")
    ranks = {pair: i for i, pair in enumerate(merges)}
    pat = re.compile(_PRETOKEN_RE)
    memo: dict[str, list[str]] = {}

    @pandas_udf("array<string>")
    def tok(texts):
        def one(t):
            if t is None:
                return []
            out = []
            for w in pat.findall(t):
                got = memo.get(w)
                if got is None:
                    got = _apply_merges(w, ranks)
                    if len(memo) >= memo_cap:
                        memo.clear()
                    memo[w] = got
                out.extend(got)
            return out

        return texts.map(one)

    return docs.select(
        id_col,
        tok(F.col(text_col)).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens"))


def bpe_token_frequencies(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top: int = 50,
) -> DataFrame:
    """Corpus-wide token frequency table under a trained vocab — the
    "what does my tokenizer actually emit" audit. Columns: ``token``,
    ``n`` (total occurrences), ``n_docs``; top-N under the total
    (n DESC, token ASC) order via a TakeOrderedAndProject heap."""
    toks = bpe_tokenize(docs, merges, text_col=text_col, id_col=id_col)
    per_doc = toks.select(
        id_col, F.explode("tokens").alias("token")
    ).groupBy("token", id_col).agg(F.count(F.lit(1)).alias("_n"))
    counts = per_doc.groupBy("token").agg(
        F.sum("_n").alias("n"), F.count(F.lit(1)).alias("n_docs")
    )
    return counts.orderBy(F.col("n").desc(), "token").limit(top)
