"""Quality tests for the approximate Tier C operators — the checks the
hash-oracle gate can't express: recall vs the exact answer, estimator
error bounds, and semantic invariants on synthetic near-duplicates."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    """Synthetic corpus with PLANTED near-duplicates: pairs (i, i+100)
    share ~90% of tokens; everything else is disjoint vocab."""
    rows = []
    for i in range(100):
        base = [f"tok{i}_{j}" for j in range(30)]
        rows.append((i, " ".join(base)))
        mutated = list(base)
        mutated[0] = "CHANGED"
        mutated[15] = "ALSO_CHANGED"
        rows.append((i + 100, " ".join(mutated)))
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_minhash_finds_planted_dups(docs):
    cand = dedup.minhash_candidates(docs, "doc_id", "text", shingle_n=3)
    found = {
        (r.id_a, r.id_b)
        for r in cand.filter(F.col("est_jaccard") >= 0.3).collect()
    }
    planted = {(i, i + 100) for i in range(100)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"minhash recall {recall}"
    # no cross-pair pollution: disjoint docs must not collide strongly
    false_pairs = found - planted
    assert len(false_pairs) <= 2


def test_minhash_estimates_track_exact_jaccard(docs):
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs.filter(F.col("doc_id").isin([0, 100, 1, 101])),
            "doc_id",
            "text",
            shingle_n=3,
            allow_quadratic=True,
        ).collect()
    }
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_candidates(
            docs.filter(F.col("doc_id").isin([0, 100, 1, 101])),
            "doc_id",
            "text",
            shingle_n=3,
        ).collect()
    }
    for pair, e in est.items():
        if pair in exact:
            assert abs(e - exact[pair]) < 0.25, (pair, e, exact[pair])


def test_minhash_dedup_keeps_min_id(docs):
    kept = dedup.minhash_dedup(docs, "doc_id", "text", threshold=0.5)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # survivors: all originals (0..99); most mutated copies dropped
    assert set(range(100)) <= ids
    dropped = set(range(100, 200)) - ids
    assert len(dropped) >= 90


def test_minhash_dedup_verified_exact_precision(docs):
    """The two-stage dedup may only drop a doc whose EXACT jaccard with
    a smaller-id partner clears the threshold — verify every drop
    against the ground-truth all-pairs jaccard (precision == 1.0 by
    construction; an estimate-based dedup cannot promise this)."""
    thr = 0.5
    kept = dedup.minhash_dedup_verified(docs, "doc_id", "text", threshold=thr)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    dropped = {r.doc_id for r in docs.select("doc_id").collect()} - kept_ids

    truth = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=thr,
        allow_quadratic=True,  # 200-doc fixture: ground truth only
    )
    justified = {r.id_b for r in truth.collect()}
    assert dropped, "fixture should contain verified near-dups"
    assert dropped <= justified, (
        f"docs dropped without an exact >=thr partner: {dropped - justified}"
    )
    # recall sanity: most planted mutations verify above threshold
    planted_losers = set(range(100, 200)) & justified
    assert len(dropped & planted_losers) >= 0.9 * len(planted_losers)


def test_pack_sequences_bins_are_dense_and_budget_true(spark, sf_dir):
    """Packing invariants: per shard, bins start at 0 and are dense
    (every training sequence slot gets filled in order), and each doc's
    bin equals the budget-quotient of its running start offset."""
    from mysql2parquet_spark.operators.pipeline import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, budget=512, n_shards=8).collect()
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == 8
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        start = 0
        bins = set()
        for r in rows:
            assert r.bin == start // 512, (shard, r.doc_id)
            bins.add(r.bin)
            start += r.n_toks
        assert bins == set(range(max(bins) + 1))  # dense from 0


def test_contamination_report_flags_planted_leak(spark):
    """A train doc that copies eval text is flagged with the full distinct
    3-gram count; disjoint-vocab docs are absent; the eval membership
    probe is a broadcast join (no shuffle on the big exploded side)."""
    from mysql2parquet_spark.operators.pipeline import contamination_report

    eval_docs = spark.createDataFrame(
        [(1000, "alpha beta gamma delta epsilon zeta")],
        "doc_id: long, text: string",
    )
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # verbatim leak
            (2, "xx beta gamma delta yy zz"),  # one shared 3-gram
            (3, "totally disjoint vocabulary here now"),  # clean
        ],
        "doc_id: long, text: string",
    )
    rep = contamination_report(train, eval_docs, n=3)
    got = {r.doc_id: r.n_hit_grams for r in rep.collect()}
    assert got == {1: 4, 2: 1}  # 6 tokens -> 4 distinct 3-grams
    assert "BroadcastHashJoin" in rep._jdf.queryExecution().executedPlan().toString()


def test_chunk_documents_tiles_exactly(spark, sf_dir):
    """Chunks tile each doc: starts advance by the stride, every chunk is
    1..window tokens, the last chunk ends exactly at the doc length, and
    only the last chunk may be shorter than the window."""
    from mysql2parquet_spark.operators.pipeline import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    W, S = 64, 48
    rows = chunk_documents(docs, window=W, stride=S).collect()
    n_toks = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_toks)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = n_toks[doc_id]
        for i, c in enumerate(chunks):
            assert c.chunk_idx == i
            assert c.chunk_start == i * S + 1
            assert 1 <= c.chunk_len <= W
            if i < len(chunks) - 1:
                assert c.chunk_len == W
        last = chunks[-1]
        assert last.chunk_start + last.chunk_len - 1 == n
        # minimal cover: one fewer chunk would leave the tail uncovered
        if len(chunks) > 1:
            assert (len(chunks) - 2) * S + W < n


def test_quantize_int8_bounds_and_reconstruction(spark, sf_dir):
    """Every non-zero vector quantizes with max|q|=127 (the scale element
    saturates), all values within [-127,127], and dequantization error is
    within half a quantum; all-zero vectors map to zeros."""
    from mysql2parquet_spark.functions.vector import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    rows = (
        emb.select("vec_id", "embedding", quantize_int8("embedding").alias("q8"))
        .collect()
    )
    assert rows
    for r in rows:
        s = max(abs(float(x)) for x in r.embedding)
        assert max(abs(q) for q in r.q8) == (127 if s > 0 else 0)
        for x, q in zip(r.embedding, r.q8):
            assert abs(q) <= 127
            if s > 0:
                assert abs(float(x) - q * s / 127.0) <= s / 127.0 * 0.5 + 1e-9

    zero = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id: long, embedding: array<float>"
    )
    assert zero.select(quantize_int8("embedding").alias("q")).first().q == [0, 0, 0]


def test_chunk_and_quantize_have_no_shuffle(spark, sf_dir):
    """Both ops are pure per-row projections — an Exchange in their plans
    would be a scale regression."""
    from mysql2parquet_spark.functions.vector import quantize_int8
    from mysql2parquet_spark.operators.pipeline import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    for df in (
        chunk_documents(docs),
        emb.select("vec_id", quantize_int8("embedding").alias("q8")),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_connected_components_beats_one_pass_on_chains(spark):
    """Pairs (1,5),(5,3): doc 3 has no smaller DIRECT partner, so
    one-pass min-id dedup keeps BOTH 1 and 3 from one duplicate
    cluster; component labels converge to the true minimum."""
    ids = spark.createDataFrame([(1,), (3,), (5,), (9,)], "doc_id: long")
    pairs = spark.createDataFrame(
        [(1, 5), (3, 5)], "id_a: long, id_b: long"
    )
    comp = dedup.connected_components_min_label(
        ids, pairs, id_col="doc_id"
    )
    got = {r.doc_id: r.label for r in comp.collect()}
    assert got == {1: 1, 3: 1, 5: 1, 9: 9}  # one cluster + an isolate


def test_minhash_dedup_cc_one_rep_per_cluster(docs):
    """Component-exact dedup keeps exactly the min-id doc of every
    near-dup cluster — on the planted fixture (i, i+100) that is all
    originals and no mutated copy, same as the one-pass answer here
    (clusters are monotone pairs), proving CC agrees where one-pass is
    already right."""
    kept = dedup.minhash_dedup_cc(docs, "doc_id", "text", threshold=0.5)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert set(range(100)) <= ids
    assert len(set(range(100, 200)) - ids) >= 90


def test_minhash_hot_band_cap_survives_identical_corpus(spark):
    """10k identical docs share every band key — uncapped, each band
    bucket is 10k wide and the candidate join goes quadratic (10⁸ pairs).
    With the hot-band cap the pair count is bounded by cap×n and dedup
    still keeps exactly the min-id copy."""
    text = "the same boilerplate sentence repeated across the corpus"
    df = spark.createDataFrame(
        [(i, text) for i in range(10_000)], "doc_id: long, text: string"
    )
    cand = dedup.minhash_candidates(df, "doc_id", "text", max_band_width=4)
    n_pairs = cand.count()
    assert n_pairs <= 4 * 10_000  # bounded by cap, nowhere near n²/2
    kept = dedup.minhash_dedup(
        df, "doc_id", "text", threshold=0.9, max_band_width=4
    )
    assert [r.doc_id for r in kept.collect()] == [0]  # min-id survivor only


def test_simhash_arrow_fold_parity(spark, sf_dir):
    """The Arrow-vectorized majority vote must be BIT-IDENTICAL to the
    pure-JVM fold — same candidate pairs, same hamming distances."""
    docs = load_table(spark, sf_dir, "documents")
    arrow = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_candidates(
            docs, "doc_id", "text", method="arrow"
        ).collect()
    }
    fold = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_candidates(
            docs, "doc_id", "text", method="fold"
        ).collect()
    }
    assert arrow == fold and len(arrow) > 0


def test_simhash_planted_dups_low_hamming(spark):
    """SimHash needs tighter dups than MinHash to score: with short
    all-unique-token docs every bit majority is slim, so we plant 1
    changed token in 50 (98% overlap) and expect small hamming. An
    identical pair must collide at hamming 0."""
    rows = []
    for i in range(50):
        base = [f"w{i}_{j}" for j in range(50)]
        rows.append((i, " ".join(base)))
        mutated = list(base)
        mutated[25] = "CHANGED"
        rows.append((i + 100, " ".join(mutated)))
    rows.append((999, rows[0][1]))  # exact copy of doc 0
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    cand = dedup.simhash_candidates(df, "doc_id", "text", max_hamming=10)
    found = {(r.id_a, r.id_b): r.hamming for r in cand.collect()}
    assert found.get((0, 999)) == 0  # identical docs -> identical simhash
    planted = {(i, i + 100) for i in range(50)}
    recall = len(set(found) & planted) / len(planted)
    assert recall >= 0.7, f"simhash recall {recall}"


def test_lsh_topk_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    exact = {r.vec_id for r in similarity.brute_force_topk(emb, q, k=10).collect()}
    # multi-probe stand-in: fewer planes -> bigger buckets -> higher recall
    approx = {
        r.vec_id
        for r in similarity.lsh_topk(emb, q, k=10, dim=64, num_planes=2).collect()
    }
    assert len(exact & approx) >= 3  # same bucket quadrant captures several
    # every approx score must be a real cosine from the corpus (sanity)
    assert len(approx) == 10


def test_ivf_assign_covers_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = similarity.ivf_assign(emb, cents)
    assert assigned.count() == emb.count()  # exactly one cell per vector
    n_cells = assigned.select("centroid_id").distinct().count()
    assert n_cells == 8


def test_ml_minhash_lsh_agrees_with_handrolled(docs):
    pytest.importorskip("pyspark.ml")
    from mysql2parquet_spark.operators.ml_lsh import minhash_lsh_ml

    pairs = minhash_lsh_ml(
        docs, "doc_id", "text", max_jaccard_distance=0.6
    )
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, i + 100) for i in range(100)}
    assert len(found & planted) / len(planted) >= 0.9


def test_cosine_pairs_threshold_semantics(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),     # identical -> cos 1.0
        (3, [0.0, 1.0]),     # orthogonal -> cos 0.0
        (4, [0.6, 0.8]),     # cos(1,4)=0.6
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    got = {
        (r.id_a, r.id_b): r.cos_sim
        for r in similarity.cosine_pairs(
            df, threshold=0.5, allow_quadratic=True
        ).collect()
    }
    assert got[(1, 2)] == 1.0
    assert (1, 3) not in got
    assert abs(got[(1, 4)] - 0.6) < 1e-9


def test_quadratic_pair_ops_require_optin(spark):
    """Scale guard: unblocked all-pairs operators must refuse to run."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id: long, embedding: array<float>"
    )
    with pytest.raises(ValueError, match="quadratic"):
        similarity.cosine_pairs(df, threshold=0.5)
    docs = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="quadratic"):
        dedup.ngram_jaccard_pairs(docs, "doc_id", "text")


def test_cosine_pairs_blocked_variant_subsets_quadratic(spark):
    """block_dim= LSH blocking must return a SUBSET of the exact pairs
    (recall < 1 allowed, precision exact) and plan an equi-join."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [0.0, 1.0]),
        (4, [0.6, 0.8]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs(
            df, threshold=0.5, allow_quadratic=True
        ).collect()
    }
    blocked = similarity.cosine_pairs(df, threshold=0.5, block_dim=2)
    got = {(r.id_a, r.id_b) for r in blocked.collect()}
    assert got <= exact
    assert (1, 2) in got  # identical vectors always share every bucket
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_random_projection_properties(spark, sf_dir):
    """Seeded projection is deterministic across partitionings, roughly
    norm-preserving in aggregate (1/sqrt(out_dim) scaling), genuinely
    shuffle-free, and keeps identical inputs identical."""
    from mysql2parquet_spark.operators.similarity import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    a = {
        r.vec_id: tuple(r.projected)
        for r in random_projection(emb.repartition(3), 16).collect()
    }
    b = {
        r.vec_id: tuple(r.projected)
        for r in random_projection(emb.repartition(11), 16).collect()
    }
    assert a == b  # partitioning- and run-independent (same seed)
    assert len(next(iter(a.values()))) == 16

    import math

    norms_in = {
        r.vec_id: math.sqrt(sum(float(x) ** 2 for x in r.embedding))
        for r in emb.collect()
    }
    ratios = [
        math.sqrt(sum(x * x for x in v)) / norms_in[k]
        for k, v in a.items()
        if norms_in[k] > 0
    ]
    mean_sq = sum(r * r for r in ratios) / len(ratios)
    assert 0.7 < mean_sq < 1.3  # E[ratio^2] = 1 under JL scaling

    plan = (
        random_projection(emb, 16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan

    dup = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [1.0] * 64)], "vec_id: long, embedding: array<float>"
    )
    out = {r.vec_id: tuple(r.projected) for r in random_projection(dup, 8).collect()}
    assert out[1] == out[2]


def test_new_operator_parameter_guards(spark):
    """Bad parameters fail fast with clear errors instead of producing
    NULL-riddled or empty results deep in a job."""
    from mysql2parquet_spark.operators.pipeline import (
        chunk_documents,
        pack_sequences,
    )
    from mysql2parquet_spark.operators.similarity import random_projection
    from mysql2parquet_spark.operators.text import bm25_scores

    df = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(df, budget=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, window=8, stride=9)
    with pytest.raises(ValueError, match="term"):
        bm25_scores(df, [])
    emb_empty = spark.createDataFrame([], "vec_id: long, embedding: array<float>")
    with pytest.raises(ValueError, match="non-empty"):
        random_projection(emb_empty, 8)
    emb1 = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id: long, embedding: array<float>"
    )
    with pytest.raises(ValueError, match="out_dim"):
        random_projection(emb1, 0)


def test_embedding_dedup_drops_planted_near_dups(spark):
    """Planted paraphrase-style duplicates (same direction, tiny noise /
    different norm) must drop; orthogonal vectors must survive. Cosine is
    norm-invariant, so a scaled copy is a perfect dup."""
    from mysql2parquet_spark.operators.dedup import embedding_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0, 0.0]),      # scaled copy of 0 -> dup
        (2, [0.999, 0.001, 0.0, 0.0]),  # near-copy of 0 -> dup
        (3, [0.0, 1.0, 0.0, 0.0]),      # orthogonal -> survives
        (4, [0.0, 0.0, 1.0, 0.0]),      # orthogonal -> survives
    ]
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    kept = embedding_dedup(e, threshold=0.95, allow_quadratic=True)
    assert sorted(r.vec_id for r in kept.collect()) == [0, 3, 4]

    # blocked path: same result when blocking happens to co-locate dups
    blocked = e.withColumn(
        "blk", (F.col("embedding")[0] >= 0.5).cast("int")
    )
    kept_b = embedding_dedup(blocked, threshold=0.95, block_col="blk")
    assert sorted(r.vec_id for r in kept_b.collect()) == [0, 3, 4]

    # no silent quadratic: unblocked without consent raises
    import pytest as _pytest

    with _pytest.raises(ValueError, match="quadratic"):
        embedding_dedup(e, threshold=0.95).collect()


# --------------------------------------------------------------------------
# incremental dedup (batch vs accumulated fingerprint store)
# --------------------------------------------------------------------------

def test_incremental_dedup_nightly_flow(spark, tmp_path):
    """Three 'nights' of batches against a parquet fingerprint store:
    in-batch dups collapse to the min id, cross-night dups are dropped
    entirely, and the store accumulates exactly the accepted prints —
    re-running a night against the grown store accepts nothing."""
    store = str(tmp_path / "fp_store")
    nights = [
        [(1, "alpha"), (2, "beta"), (3, "alpha")],       # 3 dups 1 in-batch
        [(10, "beta"), (11, "gamma"), (12, "gamma")],    # beta seen; 12 dups 11
        [(20, "alpha"), (21, "delta")],                  # alpha seen
    ]
    expected_survivors = [{1, 2}, {11}, {21}]
    seen_empty = spark.createDataFrame([], "fp string")
    for i, batch_rows in enumerate(nights):
        batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
        if i == 0:
            seen = seen_empty
        else:
            seen = spark.read.parquet(store)
        accepted = dedup.incremental_dedup(batch, seen)
        got = {r.doc_id for r in accepted.collect()}
        assert got == expected_survivors[i], f"night {i}"
        dedup.accepted_fingerprints(accepted).write.mode(
            "append" if i else "overwrite"
        ).parquet(store)
    # replaying any night accepts nothing (all fingerprints now seen)
    for batch_rows in nights:
        batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
        again = dedup.incremental_dedup(batch, spark.read.parquet(store))
        assert again.count() == 0
    # store holds exactly the distinct accepted prints
    assert spark.read.parquet(store).distinct().count() == 4


def test_incremental_dedup_keeps_fp_and_payload(spark):
    batch = spark.createDataFrame(
        [(5, "x", "en"), (6, "y", "fr")], "doc_id long, text string, lang string"
    )
    seen = spark.createDataFrame([], "fp string")
    out = dedup.incremental_dedup(batch, seen)
    assert set(out.columns) == {"doc_id", "text", "lang", "fp"}
    assert out.count() == 2


# --------------------------------------------------------------------------
# budget-weighted corpus mixing
# --------------------------------------------------------------------------

def _mix_fixture(spark):
    rows = []
    for s, n in (("a", 40), ("b", 40), ("c", 40)):
        for i in range(n):
            rows.append((hash((s, i)) % 100000 + (0 if s == "a" else 100000 if s == "b" else 200000), s, 100))
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


def test_mix_corpus_budget_and_proportions(spark):
    from mysql2parquet_spark.operators.pipeline import mix_corpus

    docs = _mix_fixture(spark)
    out = mix_corpus(docs, {"a": 2.0, "b": 1.0, "c": 1.0}, budget=4000)
    sizes = {
        r.source: r.total
        for r in out.groupBy("source").agg(F.sum("n_chars").alias("total")).collect()
    }
    # shares: a=2000, b=1000, c=1000; fixed 100-char docs land exactly
    assert sizes == {"a": 2000, "b": 1000, "c": 1000}
    # greedy prefix: each source overshoots its share by at most one doc
    out2 = mix_corpus(docs, {"a": 1.0}, budget=1050)
    total_a = out2.agg(F.sum("n_chars")).collect()[0][0]
    assert 1050 <= total_a <= 1150  # boundary doc included, nothing more


def test_mix_corpus_deterministic_and_drops_unknown_sources(spark):
    from mysql2parquet_spark.operators.pipeline import mix_corpus

    docs = _mix_fixture(spark)
    w = {"a": 1.0, "b": 3.0}
    a = mix_corpus(docs, w, budget=2000)
    b = mix_corpus(docs.repartition(7), w, budget=2000)
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )
    assert a.filter(F.col("source") == "c").count() == 0
    # different seed = different (but valid) selection
    c = mix_corpus(docs, w, budget=2000, seed=7)
    assert {r.doc_id for r in c.collect()} != {r.doc_id for r in a.collect()}


def test_mix_corpus_validation(spark):
    from mysql2parquet_spark.operators.pipeline import mix_corpus

    docs = _mix_fixture(spark)
    with pytest.raises(ValueError, match="budget"):
        mix_corpus(docs, {"a": 1.0}, budget=0)
    with pytest.raises(ValueError, match="weights"):
        mix_corpus(docs, {}, budget=100)
    with pytest.raises(ValueError, match="positive"):
        mix_corpus(docs, {"a": 0.0}, budget=100)


def test_mix_corpus_budget_monotone_nesting(spark):
    """Growing the budget under the same seed/weights only ADDS docs —
    the selection at budget B1 < B2 is a strict subset of B2's (the md5
    order is budget-independent, so a mixture can be grown for a longer
    training run without invalidating what was already selected —
    mirrors the nested-subsets contract of stratified sampling)."""
    from mysql2parquet_spark.operators.pipeline import mix_corpus

    docs = _mix_fixture(spark)
    w = {"a": 2.0, "b": 1.0}
    prev: set = set()
    for budget in (300, 900, 2100, 6000):
        sel = {r.doc_id for r in mix_corpus(docs, w, budget=budget).collect()}
        assert prev <= sel, f"budget {budget} dropped earlier selections"
        assert len(sel) > len(prev)
        prev = sel


# --------------------------------------------------------------------------
# incremental NEAR-dup (batch vs gram index / persisted LSH band store)
# --------------------------------------------------------------------------

def test_gram_jaccard_indexed_matches_array_intersect_path(docs):
    """The inverted-index exact jaccard must agree pair-for-pair with
    the array-intersect implementation above threshold (they are two
    plans for the same math)."""
    ref = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", shingle_n=2, threshold=0.3,
            allow_quadratic=True,
        ).collect()
    }
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.gram_jaccard_pairs_indexed(
            docs, None, shingle_n=2, threshold=0.3, self_pairs=True,
        ).collect()
    }
    assert got == ref and len(got) >= 100  # the planted (i, i+100) pairs


def test_incremental_jaccard_dedup_history_wins(spark):
    batch = spark.createDataFrame(
        [
            (30, "the quick brown fox jumps over the lazy dog today"),
            (31, "completely unrelated text about spark shuffles and joins"),
            (32, "completely unrelated text about spark shuffles and planning"),
        ],
        "doc_id long, text string",
    )
    accepted = spark.createDataFrame(
        # near-dup of batch doc 30 (one token differs)
        [(5, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    out = dedup.incremental_jaccard_dedup(
        batch, accepted, shingle_n=2, threshold=0.5
    )
    got = {r.doc_id for r in out.collect()}
    # 30 drops (history wins); 32 drops (in-batch near-dup of 31, larger id)
    assert got == {31}


def test_incremental_jaccard_empty_history_is_in_batch_only(spark):
    batch = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (9, "nothing in common with the others at all"),
        ],
        "doc_id long, text string",
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = dedup.incremental_jaccard_dedup(batch, empty, shingle_n=2, threshold=0.5)
    assert {r.doc_id for r in out.collect()} == {1, 9}


def test_gram_jaccard_indexed_requires_positive_threshold(spark):
    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.gram_jaccard_pairs_indexed(d, None, threshold=0.0, self_pairs=True)


def test_gram_jaccard_heavy_gram_cap_underestimates_only(spark):
    """max_gram_docs drops boilerplate grams from the index: capped
    jaccard can only be <= the exact value (under-removal bias), and
    pairs sharing ONLY boilerplate disappear."""
    rows = [(i, "BOILER PLATE HEADER unique%d tail%d" % (i, i)) for i in range(6)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.gram_jaccard_pairs_indexed(
            d, None, shingle_n=2, threshold=0.05, self_pairs=True
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.gram_jaccard_pairs_indexed(
            d, None, shingle_n=2, threshold=0.05, self_pairs=True,
            max_gram_docs=3,
        ).collect()
    }
    assert exact  # boilerplate makes every pair overlap
    assert set(capped) <= set(exact)
    for k, v in capped.items():
        assert v <= exact[k] + 1e-9


def test_incremental_minhash_dedup_probe_flow(docs, spark, tmp_path):
    """Persisted band-store flow: history = the base docs (ids < 100),
    batch = their planted near-dups (ids >= 100) plus one fresh doc.
    The probe must drop nearly every planted near-dup (history wins;
    LSH is probabilistic — at 8 bands x 4 rows a ~0.76-jaccard pair
    misses all bands with p~4%, so a couple of deterministic misses are
    the operator working as specified, not a bug) and accept the fresh
    doc; replaying the batch after appending accepted rows accepts
    nothing (every accepted doc now self-collides at agreement 1.0)."""
    store_path = str(tmp_path / "band_store")
    history = docs.filter(F.col("doc_id") < 100)
    dedup.minhash_band_store(history, shingle_n=2).write.parquet(store_path)

    fresh = spark.createDataFrame(
        [(999, " ".join(f"FRESH{j}" for j in range(30)))],
        "doc_id long, text string",
    )
    batch = docs.filter(F.col("doc_id") >= 100).unionByName(fresh)
    store = spark.read.parquet(store_path)
    out = dedup.incremental_minhash_dedup(
        batch, store, shingle_n=2, threshold=0.5
    )
    got = {r.doc_id for r in out.collect()}
    assert 999 in got, "fresh doc must survive the probe"
    missed = got - {999}
    assert len(missed) <= 5, f"LSH recall too low; survivors: {sorted(got)}"
    # append the accepted doc's bands; replay accepts nothing
    dedup.minhash_band_store(
        batch.join(out.select("doc_id"), "doc_id", "left_semi"),
        shingle_n=2,
    ).write.mode("append").parquet(store_path)
    again = dedup.incremental_minhash_dedup(
        batch, spark.read.parquet(store_path), shingle_n=2, threshold=0.5
    )
    assert again.count() == 0
