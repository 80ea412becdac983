"""Sparse TF-IDF document similarity via an inverted index (D43): the
sparse-vector complement of the dense ANN family (C3) — "find me docs
like this one" when the representation is terms, not embeddings.

Why it earns a place next to BM25 (C4) and the dense paths (D37 etc.):
BM25 scores docs against a QUERY TERM LIST; this ranks docs against
DOCS, pairing exclusively through shared terms (the gram-index
contract from D25 — two documents with no term in common never meet),
with each document reduced to its ``top_terms`` strongest TF-IDF
entries first. That per-DOC cap bounds the signature relation; it does
NOT bound per-TERM posting length — hot terms (boilerplate present in
every doc's top terms) need the explicit ``max_posting_docs`` cap on
the pairing side (see ``tfidf_topk_similar``).

Exactness across engines is engineered, not hoped for: TF-IDF weights
are QUANTIZED to 64-bit integers (``round(tf·idf·10⁶)``) before any
aggregation, so every sum a shuffle reorders is integer arithmetic —
order-independent — and the only floating point left is one
sqrt/division over identical integers on both engines. That is what
lets a float-cosine ranking hash-match a DuckDB oracle bit-for-bit.
Overflow safety is ENFORCED, not assumed: the raw quantized weight is
unbounded (a doc repeating one term ~3000× at idf ~ln(N) already puts
``wq² ~ 2⁶³``, and Spark wraps longs silently in non-ANSI mode), so
every weight is clamped to ``_WQ_CAP = 10⁷`` — then
``norm2 ≤ top_terms·10¹⁴`` and every dot ≤ ``top_terms·10¹⁴``, both
≪ 2⁶³ for any ``top_terms`` up to ~9×10⁴. The clamp only engages on
pathological term repetition; rankings below the cap are unchanged.

Scale shape: tokenize+count is one (doc, term) exchange; document
frequency is one term-keyed aggregate; the signature cap is a
WindowGroupLimit; the pair stage is a term-keyed equi-join whose
output is bounded by Σ_term |postings|² over CAPPED postings; top-k
serves through one more window. N (corpus size) rides as a broadcast
1-row relation — never a driver scalar in the plan.

Public method: TF-IDF with sklearn's smooth idf ``ln((N+1)/(df+1))+1``
(Salton & Buckley 1988 lineage; the reference has no text surface —
/root/reference/main.go:106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mysql2parquet_spark.functions.hashing import tokens

_QUANT = 1_000_000  # fixed-point scale for integer-exact weight sums
# Clamp for the quantized weight: keeps wq² (norm/dot summands) at
# 10¹⁴ ≪ 2⁶³ no matter how often a document repeats one term. Mirrored
# verbatim (LEAST) in every oracle that reproduces the quantization.
_WQ_CAP = 10_000_000


def tfidf_signatures(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_terms: int = 16,
) -> DataFrame:
    """Per-document sparse signature: the ``top_terms`` highest-TF-IDF
    terms with integer-quantized weights and the signature's squared
    L2 norm. Columns: ``id_col``, ``term``, ``wq`` (long), ``norm2``
    (long). Deterministic: the cap orders by (wq DESC, term ASC)."""
    if top_terms < 1:
        raise ValueError(f"top_terms must be >= 1: {top_terms}")
    terms = docs.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    # NOT pinned despite three consumers (document-frequency aggregate,
    # corpus-size count, weighted join): tf is an AGGREGATE output, so
    # a checkpoint here freezes the AQE-coalesced partitioning and
    # serializes every consumer (measured r14: similarity_tfidf
    # 1.52 → 1.81 s with the pin; lazy recompute re-parallelizes).
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    ndocs = tf.select(id_col).distinct().agg(
        F.count(F.lit(1)).alias("_n")
    )
    idf = F.log(
        (F.col("_n") + F.lit(1.0)) / (F.col("_df") + F.lit(1.0))
    ) + F.lit(1.0)
    weighted = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))  # 1-row corpus-size relation
        .select(
            id_col,
            "term",
            F.least(
                F.round(F.col("_tf") * idf * F.lit(_QUANT)).cast("long"),
                F.lit(_WQ_CAP),
            ).alias("wq"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("wq").desc(), F.col("term").asc()
    )
    capped = (
        weighted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_terms)
        .drop("_rn")
    )
    norms = Window.partitionBy(id_col)
    return capped.withColumn(
        "norm2", F.sum(F.col("wq") * F.col("wq")).over(norms)
    )


def tfidf_topk_similar(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_terms: int = 16,
    k: int = 5,
    query_pred=None,
    max_posting_docs: int | None = None,
) -> DataFrame:
    """Top-``k`` most similar documents per query document by cosine
    over the capped TF-IDF signatures. ``query_pred`` (a boolean
    Column) restricts the QUERY side — the corpus side always pairs in
    full; zero-overlap pairs never materialize (they share no term).
    Columns: ``qid``, ``nid``, ``sim`` (ROUND 4; higher = closer);
    top-k under (sim DESC, nid ASC) per qid.

    ``query_pred``'s id list is BROADCAST for the semi-join prune, so
    its contract is a FEW probe docs (the "more like this" shape). For
    an all-pairs / corpus-scale query side, pass ``query_pred=None`` —
    and set ``max_posting_docs``. The per-DOC ``top_terms`` cap bounds
    the signature relation, NOT per-TERM posting length: a term inside
    every document's top-``top_terms`` (boilerplate headers, license
    strings, templated text — exactly what LLM training corpora
    contain) builds an n-row posting list whose term self-join is
    O(n²). ``max_posting_docs`` drops terms whose CAPPED-signature
    posting list exceeds it from the PAIRING side only (norms keep the
    full signature), bounding pair fan-out at
    Σ_term min(|postings|, cap)² — the ``max_gram_docs`` recipe from
    the D25 gram index. Under-removal-only: pairs that shared ONLY
    hot terms lose that dot-product mass and may rank lower or drop;
    a term every document carries no discriminating signal anyway
    (its idf is minimal). Default ``None`` = off, for small corpora or
    broadcast-pruned query sides.
    """
    # NOT pinned despite feeding both pair-join sides: the signature
    # relation ends in window/aggregate shapes, so a checkpoint
    # freezes the AQE-coalesced partitioning (measured r14 REGRESSION,
    # see tfidf_signatures) — recompute per side stays parallel.
    sig = tfidf_signatures(
        docs, id_col=id_col, text_col=text_col, top_terms=top_terms
    )
    # r15 re-test of the r14 pin (VERDICT r14 ask #5): pinning AFTER an
    # explicit term-keyed repartition (scale-correct frozen layout) was
    # ALSO a measured regression — interleaved A/B min-of-5, 4×SF/8c
    # saturated: off 3.25 s vs term-pin 4.52 s (4/5 paired reps worse);
    # sf0.1/32c mixed (3.07 vs 3.49 min). The signature relation
    # carries term strings, so the checkpoint write costs more than the
    # duplicated recompute even with cores saturated. Recompute stays.
    if max_posting_docs is not None:
        if max_posting_docs < 1:
            raise ValueError(
                f"max_posting_docs must be >= 1: {max_posting_docs}"
            )
        # Posting length over the CAPPED signatures (the relation that
        # joins); hot terms leave the pairing side, norm2 is untouched.
        cold = (
            sig.groupBy("term")
            .agg(F.count(F.lit(1)).alias("_pd"))
            .filter(F.col("_pd") <= max_posting_docs)
            .select("term")
        )
        sig = sig.join(cold, "term", "left_semi")
    a = sig.select(
        F.col(id_col).alias("qid"),
        "term",
        F.col("wq").alias("_wa"),
        F.col("norm2").alias("_na"),
    )
    if query_pred is not None:
        qdocs = docs.filter(query_pred).select(
            F.col(id_col).alias("qid")
        )
        a = a.join(F.broadcast(qdocs), "qid", "left_semi")
    b = sig.select(
        F.col(id_col).alias("nid"),
        "term",
        F.col("wq").alias("_wb"),
        F.col("norm2").alias("_nb"),
    )
    pairs = (
        a.join(b, "term")
        .filter(F.col("qid") != F.col("nid"))
        .groupBy("qid", "nid", "_na", "_nb")
        .agg(F.sum(F.col("_wa") * F.col("_wb")).alias("_dot"))
    )
    # integer dot / (sqrt · sqrt): both engines divide identical longs
    sim = F.col("_dot") / (
        F.sqrt(F.col("_na").cast("double"))
        * F.sqrt(F.col("_nb").cast("double"))
    )
    w = Window.partitionBy("qid").orderBy(
        sim.desc(), F.col("nid").asc()
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("qid", "nid", F.round(sim, 4).alias("sim"))
    )
