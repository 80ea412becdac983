"""Accuracy gates for the approximate aggregates — rows-only in the
oracle gate, so their quality is pinned here instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderstatus: r.d
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    approx = {
        r.o_orderstatus: r.d
        for r in o.groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", 0.01).alias("d"))
        .collect()
    }
    for k, e in exact.items():
        assert abs(approx[k] - e) / e < 0.05, (k, approx[k], e)


def test_approx_percentile_within_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
    ).collect()
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact < 0.02, r
