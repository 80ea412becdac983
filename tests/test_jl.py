"""D80: JL ±1 sign projection with content-addressed signs — the
exact-contract face of the projection family."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from mysql2parquet_spark.operators.similarity import (
    jl_sign_projection,
    jl_signs,
)


def _py_project(vecs, out_dims=16, in_dims=64, salt="jl"):
    signs = jl_signs(out_dims, in_dims, salt)
    out = {}
    for vid, v in vecs:
        for j in range(out_dims):
            out[(vid, j)] = sum(
                math.floor(float(x) * s * 1e6)
                for x, s in zip(v, signs[j])
            )
    return out


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vecs = [(r["vec_id"], list(r["embedding"])) for r in df.collect()]
    got = {
        (r["vec_id"], r["pos"]): r["v_micro"]
        for r in jl_sign_projection(df, 16, in_dims=64).collect()
    }
    assert got == _py_project(vecs)


def test_sign_matrix_is_balanced_and_deterministic(spark):
    s1 = jl_signs(16, 64)
    s2 = jl_signs(16, 64)
    assert s1 == s2  # pure function of (salt, j, i)
    flat = [x for row in s1 for x in row]
    assert set(flat) == {-1, 1}
    # md5 parity is near-balanced
    pos = flat.count(1)
    assert 0.4 < pos / len(flat) < 0.6


def test_distance_preservation_controlled_geometry(spark):
    # the JL property this exists for: planted NEAR pairs must stay
    # closer than FAR pairs after projection (controlled geometry —
    # fixture embeddings are near-equidistant, so rank correlation
    # there is weak by nature, not by defect)
    import random

    rng = random.Random(7)
    rows = []
    for g in range(8):
        base = [rng.gauss(0, 1) for _ in range(64)]
        near = [x + rng.gauss(0, 0.05) for x in base]
        rows.append((g * 2, base))
        rows.append((g * 2 + 1, near))
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows]
    )
    proj: dict = {}
    for r in jl_sign_projection(df, 16, in_dims=64).collect():
        proj.setdefault(r["vec_id"], {})[r["pos"]] = r["v_micro"] / 1e6

    def d_proj(a, b):
        return math.sqrt(
            sum((proj[a][j] - proj[b][j]) ** 2 for j in range(16))
        )

    near_ds = [d_proj(g * 2, g * 2 + 1) for g in range(8)]
    far_ds = [d_proj(g * 2, ((g + 1) % 8) * 2) for g in range(8)]
    assert max(near_ds) < min(far_ds), (near_ds, far_ds)


def test_validation(spark):
    df = spark.createDataFrame([Row(vec_id=0, embedding=[1.0, 2.0])])
    with pytest.raises(ValueError, match="out_dims"):
        jl_sign_projection(df, 0)
    with pytest.raises(ValueError, match="in_dims"):
        jl_sign_projection(df, 4, in_dims=0)


def test_plan_zero_shuffle_no_python(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = jl_sign_projection(df, 16, in_dims=64)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
