"""D67: per-label embedding-space health — mean squared norm, centroid
squared norm, and the concentration (anisotropy) ratio."""

from __future__ import annotations

from pyspark.sql import Row

from mysql2parquet_spark.operators.similarity import (
    embedding_health_report,
)


def _py_report(rows):
    by_label: dict = {}
    for _, vec, lab in rows:
        by_label.setdefault(lab, []).append(vec)
    out = {}
    for lab, vecs in by_label.items():
        sqs = [
            round(sum(float(x) * float(x) for x in v), 6) for v in vecs
        ]
        msn = round(sum(sqs) / len(sqs), 6)
        dim = len(vecs[0])
        cent = [
            round(sum(float(v[d]) for v in vecs) / len(vecs), 6)
            for d in range(dim)
        ]
        csn = round(sum(c * c for c in cent), 6)
        out[lab] = (
            len(vecs), msn, csn, round(csn / msn, 4)
        )
    return out


def _run(spark, rows):
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v, label=lab) for i, v, lab in rows]
    )
    return {
        r["label"]: (
            r["n_vecs"], r["mean_sq_norm"], r["centroid_sq_norm"],
            r["concentration"],
        )
        for r in embedding_health_report(df).collect()
    }


def test_collapsed_scores_one_symmetric_scores_zero(spark):
    collapsed = [(i, [2.0, 0.0, 0.0], "c") for i in range(8)]
    # symmetric pairs around the origin: centroid cancels exactly
    symmetric = [
        (100, [1.0, 1.0, 0.0], "s"),
        (101, [-1.0, -1.0, 0.0], "s"),
        (102, [0.0, 1.0, 1.0], "s"),
        (103, [0.0, -1.0, -1.0], "s"),
    ]
    got = _run(spark, collapsed + symmetric)
    assert got == _py_report(collapsed + symmetric)
    assert got["c"] == (8, 4.0, 4.0, 1.0)
    assert got["s"][3] == 0.0


def test_partial_concentration_in_between(spark):
    rows = [
        (1, [1.0, 0.0], "m"),
        (2, [1.0, 0.2], "m"),
        (3, [1.0, -0.2], "m"),
        (4, [-0.5, 0.0], "m"),  # one dissenter pulls the centroid in
    ]
    got = _run(spark, rows)
    assert got == _py_report(rows)
    assert 0.0 < got["m"][3] < 1.0


def test_matches_python_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = [
        (r["vec_id"], list(r["embedding"]), r["label"])
        for r in df.collect()
    ]
    got = {
        r["label"]: (
            r["n_vecs"], r["mean_sq_norm"], r["centroid_sq_norm"],
            r["concentration"],
        )
        for r in embedding_health_report(df).collect()
    }
    assert got == _py_report(rows)
    assert len(got) == len({lab for _, _, lab in rows})


def test_plan_no_cartesian_no_python_no_vector_shuffle(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_health_report(df)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
