"""D28 tests: k-anonymity suppression, the violation reports, and the
one-exchange plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.operators.privacy import (
    k_anonymity_report,
    l_diversity_report,
    suppress_small_groups,
)


def _people(spark):
    rows = [
        # zip 10001 / age-band 3: 3 rows (k=3 keeps) — sensitive varied
        Row(pid=1, zip="10001", band=3, dx="flu"),
        Row(pid=2, zip="10001", band=3, dx="cold"),
        Row(pid=3, zip="10001", band=3, dx="flu"),
        # zip 10002 / band 3: 2 rows (k=3 suppresses)
        Row(pid=4, zip="10002", band=3, dx="flu"),
        Row(pid=5, zip="10002", band=3, dx="asthma"),
        # zip 10003 / band 5: 4 rows but HOMOGENEOUS dx (l=2 flags)
        Row(pid=6, zip="10003", band=5, dx="flu"),
        Row(pid=7, zip="10003", band=5, dx="flu"),
        Row(pid=8, zip="10003", band=5, dx="flu"),
        Row(pid=9, zip="10003", band=5, dx="flu"),
        # NULL quasi value: its own group of 1 (suppressed at k=3)
        Row(pid=10, zip=None, band=3, dx="cold"),
    ]
    return spark.createDataFrame(rows)


def test_suppression_keeps_exactly_the_k_groups(spark):
    df = _people(spark)
    kept = suppress_small_groups(df, ["zip", "band"], k=3)
    assert {r.pid for r in kept.collect()} == {1, 2, 3, 6, 7, 8, 9}
    # schema passes through unchanged (no helper column leaks)
    assert kept.columns == df.columns
    # suppressed output is k-anonymous by construction
    assert k_anonymity_report(kept, ["zip", "band"], k=3).count() == 0


def test_kanon_report_names_the_violating_groups(spark):
    rep = {
        (r.zip, r.band): r.group_size
        for r in k_anonymity_report(_people(spark), ["zip", "band"], k=3).collect()
    }
    assert rep == {("10002", 3): 2, (None, 3): 1}


def test_ldiversity_flags_homogeneous_groups(spark):
    rep = {
        (r.zip, r.band): (r.group_size, r.distinct_sensitive)
        for r in l_diversity_report(
            _people(spark), ["zip", "band"], "dx", l=2
        ).collect()
    }
    # 10003/5 is 4 rows of one dx — k-anonymous at k=3, still leaking;
    # the two singleton-ish groups are trivially non-diverse too
    assert rep[("10003", 5)] == (4, 1)
    assert (None, 3) in rep
    # the varied group passes
    assert ("10001", 3) not in rep


def test_ldiversity_nulls_excluded_like_count_distinct(spark):
    rows = [
        Row(pid=1, zip="z", dx=None),
        Row(pid=2, zip="z", dx=None),
        Row(pid=3, zip="z", dx="flu"),
    ]
    rep = l_diversity_report(
        spark.createDataFrame(rows), ["zip"], "dx", l=2
    ).collect()
    assert len(rep) == 1 and rep[0].distinct_sensitive == 1


def test_validation_errors(spark):
    df = _people(spark)
    with pytest.raises(ValueError, match="not in frame"):
        suppress_small_groups(df, ["nope"], k=3)
    with pytest.raises(ValueError, match=">= 1"):
        suppress_small_groups(df, ["zip"], k=0)
    with pytest.raises(ValueError, match=">= 1"):
        l_diversity_report(df, ["zip"], "dx", l=0)


def test_suppression_is_one_exchange(spark, sf_dir):
    """The release gate must cost ONE quasi-keyed shuffle — a
    groupBy-count + join-back shape would exchange the table twice
    (and once more for the join's other side) at 100 TB."""
    c = load_table(spark, sf_dir, "customer")
    out = suppress_small_groups(c, ["c_nationkey", "c_mktsegment"], k=3)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1, p
    assert "Join" not in p, p


def test_entity_aware_suppression_catches_repeated_entity(spark):
    """VERDICT r7 #3: one entity contributing k rows to a quasi-group
    passes the ROW-count gate while identifying a single person. The
    entity variant must suppress that group; the row variant (the
    documented row=entity default) keeps it — demonstrating why
    event-shaped tables must pass entity_col."""
    rows = [
        # group A: 3 rows, ONE entity -> row-k-anon at k=3, 1 entity
        Row(pid=1, zip="a", dx="flu"),
        Row(pid=1, zip="a", dx="flu"),
        Row(pid=1, zip="a", dx="cold"),
        # group B: 3 rows, 3 entities -> anonymous under both gates
        Row(pid=2, zip="b", dx="flu"),
        Row(pid=3, zip="b", dx="cold"),
        Row(pid=4, zip="b", dx="flu"),
    ]
    df = spark.createDataFrame(rows)
    by_rows = suppress_small_groups(df, ["zip"], k=3)
    assert by_rows.count() == 6  # over-permissive: group A passes
    by_entity = suppress_small_groups(df, ["zip"], k=3, entity_col="pid")
    assert {r.zip for r in by_entity.collect()} == {"b"}


def test_entity_aware_suppression_excludes_null_entities(spark):
    # NULL entities are not identifiable people; ANSI COUNT(DISTINCT)
    # drops them and so must the gate: 2 real entities + 1 NULL < k=3.
    rows = [
        Row(pid=1, zip="a", dx="x"),
        Row(pid=2, zip="a", dx="y"),
        Row(pid=None, zip="a", dx="z"),
        Row(pid=5, zip="b", dx="x"),
        Row(pid=6, zip="b", dx="y"),
        Row(pid=7, zip="b", dx="z"),
    ]
    df = spark.createDataFrame(rows)
    out = suppress_small_groups(df, ["zip"], k=3, entity_col="pid")
    assert {r.zip for r in out.collect()} == {"b"}


def test_entity_aware_report_counts_entities(spark):
    rows = [
        Row(pid=1, zip="a"), Row(pid=1, zip="a"), Row(pid=1, zip="a"),
        Row(pid=2, zip="b"), Row(pid=3, zip="b"), Row(pid=4, zip="b"),
    ]
    df = spark.createDataFrame(rows)
    rep = k_anonymity_report(df, ["zip"], k=3, entity_col="pid").collect()
    assert len(rep) == 1
    assert rep[0].zip == "a" and rep[0].group_size == 1
    # row-count report sees nothing wrong — the documented default gap
    assert k_anonymity_report(df, ["zip"], k=3).count() == 0


def test_entity_aware_suppression_is_one_exchange(spark, sf_dir):
    """The entity variant must keep the single quasi-keyed exchange:
    both windows (ordered dense_rank + unordered max) share the
    partition key, so Spark reuses one shuffle + one sort."""
    c = load_table(spark, sf_dir, "customer")
    out = suppress_small_groups(
        c, ["c_nationkey", "c_mktsegment"], k=3, entity_col="c_custkey"
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1, p
    assert "Join" not in p, p
