"""Scale-posture tests: salting preserves semantics and spreads hot
keys; bucketed tables join with zero exchanges; partitioned writes
prune at read time."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table, write_bucketed, write_parquet
from mysql2parquet_spark.operators.scale import (
    salted_group_count,
    salted_join,
)


def test_salted_group_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag, r.cnt, round(r.q, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"), F.sum("l_quantity").alias("q"))
        .collect()
    }
    salted = {
        (r.l_returnflag, r.cnt, round(r.q, 2))
        for r in salted_group_count(
            li, ["l_returnflag"], agg_exprs={"q": "l_quantity"}
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    plain = o.join(c, "custkey").count()
    assert salted_join(o, c, "custkey").count() == plain


def test_salted_left_join_keeps_unmatched(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter("c_acctbal > 5000")  # partial dim -> some orders unmatched
        .withColumnRenamed("c_custkey", "custkey")
    )
    plain = o.join(c, "custkey", "left")
    salted = salted_join(o, c, "custkey", how="left")
    assert salted.count() == plain.count()
    assert (
        salted.filter("c_name IS NULL").count()
        == plain.filter("c_name IS NULL").count()
    )


def test_salted_anti_join_matches_plain(spark, sf_dir):
    """left_anti is sound under salting (the small side carries EVERY
    salt, so a big row matches iff its key exists) — mirror of the
    left-join test: same survivors as the unsalted anti join."""
    o = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter("c_acctbal > 5000")
        .withColumnRenamed("c_custkey", "custkey")
    )
    plain = {r.o_orderkey for r in o.join(c, "custkey", "left_anti").collect()}
    salted = {
        r.o_orderkey
        for r in salted_join(o, c, "custkey", how="left_anti").collect()
    }
    assert salted == plain and len(plain) > 0


def test_salted_join_rejects_outer_variants(spark, sf_dir):
    """right/full-outer would duplicate each unmatched small-side key
    once per salt bucket — the operator must refuse, not silently
    return salt_buckets× rows."""
    import pytest

    o = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="salt bucket"):
            salted_join(o, c, "custkey", how=how)


def test_bucketed_join_no_shuffle(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    # disable auto-broadcast so the test proves bucketing (not broadcast)
    # removed the exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(o, "b_orders", bucket_by="o_custkey", num_buckets=8)
        write_bucketed(c, "b_customer", bucket_by="o_custkey", num_buckets=8)
        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        want = o.join(c, "o_custkey").count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_parquet(o, out, partition_by=["o_year"])
    back = spark.read.parquet(out).filter(F.col("o_year") == 1997)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_year" in plan
    want = o.filter(F.col("o_year") == 1997).count()
    assert back.count() == want


def test_stratified_sample_rates_nesting_and_edges(spark, sf_dir):
    """Kept fraction tracks the target per stratum, smaller fractions are
    SUBSETS of larger ones (same salt), fraction 1.0 keeps everything,
    unlisted strata drop, and the op adds no shuffle."""
    from mysql2parquet_spark.operators.scale import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    totals = {r.lang: r.cnt for r in docs.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}

    frac = {"en": 0.5, "de": 0.25}
    kept = stratified_sample(docs, "lang", frac, key_col="doc_id")
    got = {r.lang: r.cnt for r in kept.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    assert set(got) <= set(frac)  # unlisted strata dropped
    for lang, f in frac.items():
        if totals.get(lang, 0) >= 40:
            rate = got.get(lang, 0) / totals[lang]
            assert abs(rate - f) < 0.25, (lang, rate)

    # nesting: quarter-sample ids are a subset of half-sample ids
    half = {r.doc_id for r in stratified_sample(
        docs, "lang", {"en": 0.5}, key_col="doc_id").select("doc_id").collect()}
    quarter = {r.doc_id for r in stratified_sample(
        docs, "lang", {"en": 0.25}, key_col="doc_id").select("doc_id").collect()}
    assert quarter and quarter < half

    # fraction 1.0 keeps every row of the stratum (the "100" hex trap)
    all_en = stratified_sample(docs, "lang", {"en": 1.0}, key_col="doc_id")
    assert all_en.count() == totals["en"]

    plan = (
        stratified_sample(docs, "lang", frac, key_col="doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_aqe_splits_skewed_join_partition(spark):
    """At 100 TB one hot join key turns a shuffle partition into a
    straggler. The engine session ships with AQE skew-join enabled
    (session.py); this pins that the runtime re-plan actually fires:
    with a 90%-hot key and sub-partition advisory sizes, the executed
    plan must show SortMergeJoin(skew=true) fed by a skewed
    AQEShuffleRead — and the split must not change the join result."""
    from pyspark.sql import functions as F

    keys = (
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    saved = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set(keys[0], "1.0")
        spark.conf.set(keys[1], "4096")  # hot partition ≫ 4 KB at this scale
        spark.conf.set(keys[2], "4096")
        spark.conf.set(keys[3], "-1")  # force SMJ: broadcast would hide skew
        fact = spark.range(60_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 500)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(500).select(
            F.col("id").alias("k"),
            F.concat(F.lit("n"), F.col("id")).alias("name"),
        )
        j = fact.join(dim, "k")
        # materialize j ITSELF so its AdaptiveSparkPlan finalizes — an
        # action on a derived frame (count/write) runs a different
        # QueryExecution and leaves j's plan isFinalPlan=false
        assert len(j.collect()) == 60_000  # every key has exactly one dim row
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "AQEShuffleRead coalesced and skewed" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_sample_n_per_group_quota_and_nesting(spark, sf_dir):
    """Exact quotas, deterministic membership, and monotone nesting:
    the n=5 selection is a strict subset of n=20 per stratum."""
    from mysql2parquet_spark.operators.scale import sample_n_per_group

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    s20 = sample_n_per_group(d, "lang", 20, key_col="doc_id")
    s5 = sample_n_per_group(d, "lang", 5, key_col="doc_id")
    sizes = {r.lang: r.n for r in s20.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    truth = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(20, truth[lang])
    ids5 = {r.doc_id for r in s5.collect()}
    ids20 = {r.doc_id for r in s20.collect()}
    assert ids5 < ids20
    # repartitioning the input must not change membership
    again = {
        r.doc_id
        for r in sample_n_per_group(d.repartition(13), "lang", 20, key_col="doc_id").collect()
    }
    assert again == ids20


def test_sample_n_per_group_uses_window_group_limit(spark, sf_dir):
    """Scale pin: the rank<=n filter pushes below the per-partition
    sort (WindowGroupLimit) so each task keeps a bounded heap instead
    of fully sorting every stratum."""
    from mysql2parquet_spark.operators.scale import sample_n_per_group

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    plan = sample_n_per_group(d, "lang", 10, key_col="doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:1500]


def test_sample_weighted_rate_determinism_and_monotonicity(spark, sf_dir):
    from mysql2parquet_spark.operators.scale import sample_weighted

    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .withColumn("w", (F.col("doc_id") % 100) / 100.0)  # spread over [0,1)
    )
    kept = sample_weighted(d, "w", key_col="doc_id")
    n, expected = kept.count(), d.agg(F.sum(
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col("w")))
    )).collect()[0][0]
    # binomial-ish: within 5 sigma of the expected keep mass
    import math

    assert abs(n - expected) <= 5 * math.sqrt(expected) + 1
    # determinism under repartitioning
    ids = {r.doc_id for r in kept.collect()}
    again = {
        r.doc_id
        for r in sample_weighted(d.repartition(17), "w", key_col="doc_id").collect()
    }
    assert ids == again
    # monotone in the weight: doubling weights only ADDS rows
    boosted = sample_weighted(
        d.withColumn("w", F.col("w") * 2), "w", key_col="doc_id"
    )
    assert ids <= {r.doc_id for r in boosted.collect()}
    # weight >= 1 keeps everything; <= 0 keeps nothing
    assert sample_weighted(
        d.withColumn("w", F.lit(1.5)), "w", key_col="doc_id"
    ).count() == d.count()
    assert sample_weighted(
        d.withColumn("w", F.lit(0.0)), "w", key_col="doc_id"
    ).count() == 0


def test_sample_n_per_group_drops_null_keys_deterministically(spark):
    """Review finding: NULL keys tied at rank 1 (NULL md5 + NULL
    tiebreak) and crowded out real rows nondeterministically — they
    are dropped like in the md5-threshold samplers."""
    from mysql2parquet_spark.operators.scale import sample_n_per_group

    rows = [(None, "a"), (None, "a"), (None, "a"), (1, "a"), (2, "a")]
    df = spark.createDataFrame(rows, "id bigint, blk string")
    got = {r.id for r in sample_n_per_group(df, "blk", 2, key_col="id").collect()}
    assert got == {1, 2}


def test_sample_weighted_nan_and_null_keep_nothing(spark):
    """Review finding: least(1, greatest(0, NaN)) = 1.0 — a 0/0 quality
    score silently kept every junk row. NaN/NULL weights keep none."""
    from mysql2parquet_spark.operators.scale import sample_weighted

    df = spark.createDataFrame(
        [(1, float("nan")), (2, None), (3, 1.0)], "id bigint, w double"
    )
    got = {r.id for r in sample_weighted(df, "w", key_col="id").collect()}
    assert got == {3}


def test_assign_split_group_disjoint_and_deterministic(spark, sf_dir):
    """The leakage contract: splitting documents BY SOURCE puts every
    row of a source in exactly one split (near-dups within a source can
    never straddle train/eval), and the assignment is a pure function
    of the key — identical across partitionings and repeated runs."""
    from mysql2parquet_spark.operators.scale import assign_split

    docs = load_table(spark, sf_dir, "documents")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_split(docs, ["source"], fr)
    # group-disjoint: each source maps to exactly one split
    per_src = out.groupBy("source").agg(
        F.countDistinct("split").alias("k")
    )
    assert per_src.filter(F.col("k") != 1).count() == 0
    # deterministic across cluster shapes
    a = sorted(map(tuple, out.select("doc_id", "split").collect()))
    b = sorted(
        map(
            tuple,
            assign_split(docs.repartition(7), ["source"], fr)
            .select("doc_id", "split")
            .collect(),
        )
    )
    assert a == b
    # every row got a label from the spec
    assert out.filter(~F.col("split").isin(*fr)).count() == 0


def test_assign_split_fractions_approximate_at_key_level(spark):
    """Row-level split over many distinct keys lands near the requested
    fractions (md5 uniformity): 10k keys at 75/25 within ±3%."""
    from mysql2parquet_spark.operators.scale import assign_split

    df = spark.range(10_000).withColumnRenamed("id", "k")
    out = assign_split(df, ["k"], {"train": 0.75, "val": 0.25})
    got = {
        r["split"]: r["count"]
        for r in out.groupBy("split").count().collect()
    }
    assert abs(got["train"] / 10_000 - 0.75) < 0.03
    assert abs(got["val"] / 10_000 - 0.25) < 0.03


def test_assign_split_no_shuffle_and_validation(spark, sf_dir):
    """A split label is one codegen projection — no Exchange in the
    plan; bad specs are rejected loudly."""
    import pytest as _pytest

    from mysql2parquet_spark.operators.scale import assign_split

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        assign_split(docs, ["source"], {"a": 0.5, "b": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    with _pytest.raises(ValueError, match="sum to 1"):
        assign_split(docs, ["source"], {"a": 0.5, "b": 0.4})
    with _pytest.raises(ValueError, match="in \\(0, 1\\]"):
        assign_split(docs, ["source"], {"a": 1.5, "b": -0.5})
    with _pytest.raises(ValueError, match="at least one key"):
        assign_split(docs, [], {"a": 1.0})
    with _pytest.raises(ValueError, match="at least one split"):
        assign_split(docs, ["source"], {})


def test_assign_split_stable_under_data_growth(spark):
    """Content-addressing means adding new keys never moves existing
    ones: the split of keys 0..999 is unchanged when 1000 more appear."""
    from mysql2parquet_spark.operators.scale import assign_split

    fr = {"train": 0.9, "val": 0.1}
    small = spark.range(1_000).withColumnRenamed("id", "k")
    big = spark.range(2_000).withColumnRenamed("id", "k")
    a = sorted(
        map(tuple, assign_split(small, ["k"], fr).collect())
    )
    b = sorted(
        map(
            tuple,
            assign_split(big, ["k"], fr).filter(F.col("k") < 1_000).collect(),
        )
    )
    assert a == b
