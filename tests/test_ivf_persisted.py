"""IVF persisted-index contract (C3 at-scale path): train on a sample,
write the corpus hive-partitioned by centroid_id, and serve probes from
the persisted layout with PARTITION PRUNING — the plan must show a
PartitionFilters entry on centroid_id, proving whole cells are skipped
at the scan (at 100 TB this is the difference between reading nprobe/k
of the corpus and reading all of it)."""

from __future__ import annotations

import glob
import os
import re

import pytest

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.operators import similarity


@pytest.fixture(scope="module")
def ivf_index(spark, sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("ivf") / "index")
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.ivf_build(
        emb, idx, k=4, iters=2, train_fraction=0.5
    )
    return idx, cents


def test_build_writes_partitioned_layout(spark, sf_dir, ivf_index):
    idx, cents = ivf_index
    cells = glob.glob(os.path.join(idx, "data", "centroid_id=*"))
    assert 1 < len(cells) <= 4  # hive layout, one dir per populated cell
    # centroids persisted alongside, k x dim
    persisted = spark.read.parquet(f"{idx}/centroids")
    assert persisted.count() == cents.count() <= 4
    # every corpus row landed in exactly one cell
    n = spark.read.parquet(f"{idx}/data").count()
    assert n == load_table(spark, sf_dir, "embeddings").count()


def test_probe_plan_prunes_partitions(spark, sf_dir, ivf_index):
    idx, _ = ivf_index
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [  # bounded-metadata: the query vector
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    probe = similarity.ivf_probe(spark, idx, qvec, k=10, nprobe=2, exclude_id=0)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    p = probe._jdf.queryExecution().explainString(jmode)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", p)
    assert m, f"no PartitionFilters in plan:\n{p}"
    assert "centroid_id" in m.group(1), p  # pruning ON the cell column
    # and the probe really reads a subset: pruned scan lists < all cells
    assert probe.count() == 10


def test_probe_recall_vs_exact(spark, sf_dir, ivf_index):
    idx, _ = ivf_index
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0)
    qvec = [float(x) for x in qrow.select("embedding").first()[0]]

    exact = similarity.brute_force_topk(
        emb.select("vec_id", "embedding"),
        qrow.select("vec_id", "embedding"),
        k=10,
    )
    want = {r.vec_id for r in exact.collect()}
    got = {
        r.vec_id
        for r in similarity.ivf_probe(
            spark, idx, qvec, k=10, nprobe=2, exclude_id=0
        ).collect()
    }
    recall = len(got & want) / len(want)
    assert recall >= 0.5, f"IVF persisted recall {recall} (nprobe=2 of 4 cells)"


def test_registered_persisted_query_runs(spark, sf_dir):
    from mysql2parquet_spark.queries import REGISTRY, _load

    _load()
    df = REGISTRY["ann_ivf_persisted"].fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 10
    assert df.columns == ["vec_id", "cos_sim"]
    scores = [r.cos_sim for r in rows]
    assert scores == sorted(scores, reverse=True)
