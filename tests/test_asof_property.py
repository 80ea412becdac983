"""Property test: asof_join must agree with pandas merge_asof (backward,
inclusive) on arbitrary generated inputs — the independent reference
implementation for the custom operator."""

from __future__ import annotations

import pandas as pd
import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mysql2parquet_spark.operators.asof import asof_join

ts_strategy = st.integers(min_value=0, max_value=1_000)
key_strategy = st.integers(min_value=0, max_value=3)


@given(
    left=st.lists(st.tuples(key_strategy, ts_strategy), min_size=1, max_size=40),
    right=st.lists(st.tuples(key_strategy, ts_strategy), min_size=1, max_size=40),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    # unique (key, ts) on the right — as-of requires it (see operator doc)
    right = list({(k, t): (k, t) for k, t in right}.values())
    left_rows = [(i, k, t) for i, (k, t) in enumerate(left)]
    right_rows = [(1000 + i, k, t, t * 10) for i, (k, t) in enumerate(right)]

    ldf = spark.createDataFrame(left_rows, "lid: long, k: int, t: long")
    rdf = spark.createDataFrame(right_rows, "rid: long, k: int, t: long, v: long")
    got = {
        r.lid: (r.t_matched, r.v_matched)
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="t", right_ts="t", right_cols=["v"]
        ).collect()
    }

    lpd = pd.DataFrame(left_rows, columns=["lid", "k", "t"]).sort_values("t")
    rpd = pd.DataFrame(
        right_rows, columns=["rid", "k", "t", "v"]
    ).sort_values("t")
    merged = pd.merge_asof(
        lpd, rpd, on="t", by="k", direction="backward", suffixes=("", "_r")
    )
    want = {
        int(row.lid): (
            None if pd.isna(row.v) else int(row.t),  # placeholder, fixed below
            None if pd.isna(row.v) else int(row.v),
        )
        for row in merged.itertuples()
    }
    # pandas drops the right-side ts under on="t"; reconstruct from v = t*10
    want = {
        lid: ((None, None) if v is None else (v // 10, v))
        for lid, (_, v) in want.items()
    }

    assert set(got) == set(want)
    for lid, (wt, wv) in want.items():
        gt, gv = got[lid]
        assert gv == wv, (lid, got[lid], (wt, wv))
        assert gt == wt


def test_asof_empty_right(spark):
    ldf = spark.createDataFrame([(1, 1, 5)], "lid: long, k: int, t: long")
    rdf = spark.createDataFrame([], "rid: long, k: int, t: long, v: long")
    out = asof_join(
        ldf, rdf, on=["k"], left_ts="t", right_ts="t", right_cols=["v"]
    ).collect()
    assert len(out) == 1 and out[0].v_matched is None
