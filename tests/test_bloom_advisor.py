"""D26 tests: the join-strategy advisor's decision ladder and the
Bloom-pruned join's exactness + actually-prunes guarantees."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.operators.bloomjoin import (
    bloom_prune_join,
    build_bloom,
)
from mysql2parquet_spark.operators.scale import join_strategy_advice


def _advise(spark, a_rows, b_rows, **kw):
    a = spark.createDataFrame([Row(k=k) for k in a_rows])
    b = spark.createDataFrame([Row(k=k) for k in b_rows])
    return join_strategy_advice(a, b, ["k"], **kw).collect()[0]


def test_advisor_broadcasts_the_smaller_fitting_side(spark):
    r = _advise(spark, list(range(100)) * 3, list(range(50)),
                broadcast_max_rows=60)
    assert r.strategy == "broadcast_b"
    assert r.salt_buckets == 0
    # flip the sides -> broadcast_a
    r2 = _advise(spark, list(range(50)), list(range(100)) * 3,
                 broadcast_max_rows=60)
    assert r2.strategy == "broadcast_a"


def test_advisor_flags_many_to_many_as_pre_aggregate(spark):
    # 10 keys x 30 copies on EACH side -> 9000 output rows from 300-row
    # inputs (explosion 30x): no physical strategy fixes that join.
    dup = [k for k in range(10) for _ in range(30)]
    r = _advise(spark, dup, dup, broadcast_max_rows=10)
    assert r.strategy == "pre_aggregate"
    assert r.output_rows == 10 * 30 * 30
    assert r.explosion_x == 30.0
    assert r.salt_buckets == 0


def test_advisor_salts_a_hot_key_with_the_flattening_bucket_count(spark):
    # side A: one key holds 900 of 1000 rows over 101 keys ->
    # max_skew ~ 90.9; 1:1 side B keeps explosion at ~1.
    hot = [0] * 900 + list(range(1, 101))
    r = _advise(spark, hot, list(range(101)), broadcast_max_rows=50)
    assert r.strategy == "salted"
    assert r.max_skew_a == pytest.approx(900 / (1000 / 101), rel=1e-6)
    # ceil(max skew) -- the bucket count that flattens the hot key
    assert r.salt_buckets == 91
    assert r.explosion_x <= 1.0


def test_advisor_leaves_uniform_joins_alone(spark):
    r = _advise(spark, list(range(200)) * 2, list(range(200)),
                broadcast_max_rows=100)
    assert r.strategy == "shuffle"
    assert r.salt_buckets == 0
    assert r.max_skew_a == 1.0 and r.max_skew_b == 1.0


def test_advisor_broadcast_wins_over_skew_and_explosion(spark):
    # ladder order: a side that FITS is broadcast even when skewed --
    # a broadcast join has no shuffle for skew to melt.
    hot = [0] * 900 + list(range(1, 101))
    r = _advise(spark, hot, list(range(5)), broadcast_max_rows=10)
    assert r.strategy == "broadcast_b"


def test_bloom_prune_join_bit_identical_to_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey")
    )
    pruned = bloom_prune_join(li, dim, ["l_orderkey"], num_bits=1 << 16)
    plain = li.join(dim, ["l_orderkey"])
    assert pruned.exceptAll(plain).count() == 0
    assert plain.exceptAll(pruned).count() == 0


def test_bloom_prune_actually_prunes_before_the_join(spark, sf_dir):
    """The probe filter must remove non-candidate fact rows pre-join:
    with a selective dim, the pruned fact is far smaller than the fact
    table (false-positive rate bounds the excess)."""
    from mysql2parquet_spark.operators.bloomjoin import (
        _H1,
        _H2,
        _with_hashes,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    n_fact = li.count()
    n_match = li.join(dim, ["l_orderkey"], "left_semi").count()
    assert n_match < n_fact * 0.3  # fixture precondition: selective dim

    bloom = build_bloom(dim, ["l_orderkey"], num_bits=1 << 16, num_hashes=5)
    bv = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        from mysql2parquet_spark.operators.bloomjoin import _positions

        bits = np.frombuffer(bv.value, dtype=np.uint8)
        a = h1.to_numpy().astype(np.uint64)
        b = h2.to_numpy().astype(np.uint64) | np.uint64(1)
        keep = np.ones(len(a), dtype=bool)
        for i in range(5):
            pos = _positions(a, b, i, 1 << 16)
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            keep &= ((byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1) > 0
        return pd.Series(keep)

    survivors = (
        _with_hashes(li, ["l_orderkey"])
        .filter(probe(F.col(_H1), F.col(_H2)))
        .count()
    )
    # every true match survives (no false negatives) ...
    assert survivors >= n_match
    # ... and the filter did real work: survivors are candidates, not
    # the whole table (generous bound >> the expected fp rate)
    assert survivors < n_fact * 0.6


def test_bloom_prune_left_semi_and_how_validation(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    semi = bloom_prune_join(
        li, dim, ["l_orderkey"], num_bits=1 << 16, how="left_semi"
    )
    plain = li.join(dim, ["l_orderkey"], "left_semi")
    assert semi.exceptAll(plain).count() == 0
    assert plain.exceptAll(semi).count() == 0
    with pytest.raises(ValueError, match="outer join"):
        bloom_prune_join(li, dim, ["l_orderkey"], how="left")


def test_bloom_probe_runs_once_and_only_on_the_fact_side(spark, sf_dir):
    """Plan pin: exactly ONE ArrowEvalPython in the physical plan.
    Catalyst's InferFiltersFromConstraints mirrors a deterministic
    filter through the equi-join onto the dim side — a second Arrow
    probe over every build row that is true by construction (its keys
    set those very bits). The probe is marked nondeterministic to pin
    it to the fact branch; a regression doubles Python eval cost
    silently (values stay identical)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey")
    )
    joined = bloom_prune_join(li, dim, ["l_orderkey"], num_bits=1 << 16)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan


def test_build_bloom_is_deterministic_and_merge_independent(spark):
    """Same keys -> same bytes, regardless of partitioning (the driver
    OR-merge is order- and split-insensitive), so a persisted bloom is
    reproducible."""
    rows = [Row(k=i, s=f"key-{i}") for i in range(500)]
    one = spark.createDataFrame(rows).coalesce(1)
    many = spark.createDataFrame(rows).repartition(7)
    b1 = build_bloom(one, ["k", "s"], num_bits=1 << 12)
    b2 = build_bloom(many, ["k", "s"], num_bits=1 << 12)
    assert b1 == b2
    assert any(b != 0 for b in b1)
    with pytest.raises(ValueError):
        build_bloom(one, ["k"], num_bits=4)
