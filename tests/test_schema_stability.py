"""Every declared query must return an IDENTICAL schema at different
scale factors — the driver's smoke contract ('runs and produces ≥0 rows
with a stable schema'). Catches schema drift from data-dependent typing
(pivot value discovery, inferred nullability, etc.)."""

from __future__ import annotations

import pytest

from mysql2parquet_spark.queries import REGISTRY, _load

_load()

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_schema_stable_across_sf(spark, name):
    q = REGISTRY[name]
    sa = q.fn(spark, SF_A).schema.simpleString()
    sb = q.fn(spark, SF_B).schema.simpleString()
    assert sa == sb, f"{name}: schema differs across scale factors"
