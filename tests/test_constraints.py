"""Constraint validation (operators/constraints.py): every rule type on
data with PLANTED violations, the lazy all-rules report, and the
broadcast shape of the referential check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql2parquet_spark.operators.constraints import (
    accepted_values_violations,
    not_null_violations,
    referential_violations,
    unique_violations,
    validate,
)


@pytest.fixture
def dirty(spark):
    rows = [
        (1, "a", 10.0, "F"),
        (2, None, 20.0, "O"),   # null name
        (2, "b", -5.0, "F"),    # duplicate id=2 AND negative amount
        (3, "c", 30.0, "X"),    # bad status
        (None, "d", 40.0, "O"),  # null id
    ]
    return spark.createDataFrame(rows, "id bigint, name string, amt double, st string")


@pytest.fixture
def parents(spark):
    return spark.createDataFrame([(1,), (2,)], "pid bigint")


def test_not_null(dirty):
    got = {r.name for r in not_null_violations(dirty, ["id", "name"]).collect()}
    assert got == {None, "d"}  # row with null name + row with null id


def test_unique(dirty):
    got = {(r.id, r.n_rows) for r in unique_violations(dirty, ["id"]).collect()}
    assert got == {(2, 2)}


def test_accepted_values(dirty):
    got = {r.id for r in accepted_values_violations(dirty, "st", ["F", "O"]).collect()}
    assert got == {3}


def test_referential_orphans_and_null_fk(dirty, parents):
    orphans = referential_violations(dirty, parents, [("id", "pid")])
    # id=3 has no parent; NULL id is NOT an orphan (SQL FK semantics)
    assert {r.id for r in orphans.collect()} == {3}
    plan = orphans._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_validate_report_counts(dirty, parents):
    report = validate(
        dirty,
        [
            {"type": "not_null", "cols": ["id", "name"]},
            {"type": "unique", "cols": ["id"]},
            {"type": "accepted_values", "col": "st", "values": ["F", "O"]},
            {"type": "expression", "name": "amt_positive", "expr": "amt > 0"},
            {"type": "referential", "parent": "p", "on": [("id", "pid")]},
        ],
        tables={"p": parents},
    )
    got = {r.rule: r.violations for r in report.collect()}
    assert got == {
        "not_null(id,name)": 2,
        "unique(id)": 2,  # total rows in violating key groups
        "accepted_values(st)": 1,
        "amt_positive": 1,
        "referential(id)": 1,
    }


def test_validate_clean_data_is_all_zero(spark, sf_dir):
    from mysql2parquet_spark.io import load_table

    c = load_table(spark, sf_dir, "customer")
    report = validate(
        c,
        [
            {"type": "not_null", "cols": ["c_custkey"]},
            {"type": "unique", "cols": ["c_custkey"]},
        ],
    )
    assert report.filter(F.col("violations") > 0).isEmpty()


def test_validate_rejects_unknown_and_empty(dirty):
    with pytest.raises(ValueError, match="unknown rule type"):
        validate(dirty, [{"type": "nope"}])
    with pytest.raises(ValueError, match="at least one rule"):
        validate(dirty, [])


def test_referential_missing_parent_is_clean_error(dirty, parents):
    """Review finding: a referential rule whose parent isn't supplied
    must raise the same ValueError style as every other bad rule, not
    a raw TypeError/KeyError from the tables lookup."""
    rule = [{"type": "referential", "parent": "p", "on": [("id", "pid")]}]
    with pytest.raises(ValueError, match="parent table 'p'"):
        validate(dirty, rule)  # tables omitted entirely
    with pytest.raises(ValueError, match="parent table 'p'"):
        validate(dirty, rule, tables={"other": parents})


def test_row_local_rules_fuse_into_one_scan(dirty):
    """Ten row-local rules must cost ONE pass over the table — the plan
    contains a single scan of the input, not ten."""
    rules = [
        {"type": "expression", "name": f"r{i}", "expr": f"amt > {i}"}
        for i in range(8)
    ] + [
        {"type": "not_null", "cols": ["id"]},
        {"type": "accepted_values", "col": "st", "values": ["F", "O"]},
    ]
    report = validate(dirty, rules)
    plan = report._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1, plan
    got = {r.rule: r.violations for r in report.collect()}
    assert len(got) == 10 and got["not_null(id)"] == 1


def test_heavy_rules_still_scan_separately_but_fused_stay_one(dirty, parents):
    """unique + referential need their own shapes; the row-local block
    stays a single scan beside them."""
    rules = [
        {"type": "not_null", "cols": ["id"]},
        {"type": "expression", "name": "amt_pos", "expr": "amt > 0"},
        {"type": "unique", "cols": ["id"]},
        {"type": "referential", "parent": "p", "on": [("id", "pid")]},
    ]
    report = validate(dirty, rules, tables={"p": parents})
    plan = report._jdf.queryExecution().optimizedPlan().toString()
    # one fused row-local scan + one for unique + two for the anti-join
    # (child + parent) = 4 logical scans of RDD-backed inputs
    assert plan.count("LogicalRDD") == 4, plan
    got = {r.rule: r.violations for r in report.collect()}
    assert got == {
        "not_null(id)": 1,
        "amt_pos": 1,
        "unique(id)": 2,
        "referential(id)": 1,
    }


def test_rule_names_with_quotes_and_backslashes(dirty):
    """Review finding: names are interpolated into stack() — quotes AND
    backslashes must escape (Spark SQL literals honor backslash
    escapes by default)."""
    rules = [
        {"type": "expression", "name": "it's a trap\\", "expr": "amt > 0"},
        {"type": "expression", "name": "plain", "expr": "amt IS NOT NULL"},
    ]
    got = {r.rule: r.violations for r in validate(dirty, rules).collect()}
    assert got == {"it's a trap\\": 1, "plain": 0}
