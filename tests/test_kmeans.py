"""kmeans_lite: convergence on separable synthetic clusters + IVF
composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2parquet_spark.operators.similarity import ivf_assign, kmeans_lite


def _clustered(spark, n_per=30):
    """3 well-separated clusters on coordinate axes in 4-D."""
    rows = []
    centers = [(10.0, 0.0, 0.0, 0.0), (0.0, 10.0, 0.0, 0.0), (0.0, 0.0, 10.0, 0.0)]
    i = 0
    for ci, c in enumerate(centers):
        for j in range(n_per):
            jitter = ((j % 5) - 2) * 0.1
            rows.append((i, [c[0] + jitter, c[1], c[2], c[3] + jitter]))
            i += 1
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


def test_kmeans_recovers_clusters(spark):
    df = _clustered(spark)
    cents = kmeans_lite(df, k=3, iters=4)
    rows = cents.collect()
    assert len(rows) == 3
    # each centroid should be dominated by exactly one axis (~10.0)
    dominant = sorted(
        max(range(4), key=lambda d: r.embedding[d]) for r in rows
    )
    assert dominant == [0, 1, 2]
    for r in rows:
        assert abs(max(r.embedding) - 10.0) < 0.5


def test_ivf_assign_is_pure_projection(spark):
    """The coarse-quantizer assignment must be a zero-shuffle projection:
    centroids inline as literals, argmax via array_max — at 100 TB any
    Exchange here would shuffle the whole corpus once per call."""
    df = _clustered(spark)
    cents = [(0, [10.0, 0.0, 0.0, 0.0]), (1, [0.0, 10.0, 0.0, 0.0])]
    assigned = ivf_assign(df, cents)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert assigned.count() == df.count()


def test_kmeans_plan_depth_constant_in_iters(spark):
    """Lineage must NOT grow with iteration count: centroids round-trip
    through the driver as bounded metadata, so iteration i never
    re-executes iterations 1..i-1."""
    df = _clustered(spark)
    sizes = []
    for iters in (1, 4):
        cents = kmeans_lite(df, k=3, iters=iters)
        assigned = ivf_assign(df, cents)
        sizes.append(len(assigned._jdf.queryExecution().executedPlan().toString()))
    # identical plan shape regardless of how many iterations trained it
    assert abs(sizes[0] - sizes[1]) < 200, sizes


def test_ivf_assign_arrow_and_fold_agree(spark):
    """The vectorized Arrow path and the pure-JVM fold path must produce
    identical assignments, including tie-breaks (equidistant rows) and
    degenerate zero-norm rows."""
    df = _clustered(spark)
    extra = spark.createDataFrame(
        [
            (900, [0.0, 0.0, 0.0, 0.0]),   # zero norm -> centroid 0
            (901, [1.0, 1.0, 0.0, 0.0]),   # exactly between centroids 0/1
        ],
        "vec_id: long, embedding: array<double>",
    )
    df = df.unionByName(extra)
    cents = [
        (0, [10.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 10.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 10.0, 0.0]),
    ]
    arrow = {
        r.vec_id: r.centroid_id
        for r in ivf_assign(df, cents).select("vec_id", "centroid_id").collect()
    }
    fold = {
        r.vec_id: r.centroid_id
        for r in ivf_assign(df, cents, method="fold")
        .select("vec_id", "centroid_id")
        .collect()
    }
    assert arrow == fold
    assert arrow[900] == 0 and arrow[901] == 0  # ties -> smallest id


def test_kmeans_assignment_partitions_cleanly(spark):
    df = _clustered(spark)
    cents = kmeans_lite(df, k=3, iters=4)
    assigned = ivf_assign(df, cents)
    # members of the same true cluster land in the same cell
    cells = (
        assigned.withColumn("true_cluster", (F.col("vec_id") / 30).cast("int"))
        .groupBy("true_cluster")
        .agg(F.countDistinct("centroid_id").alias("n_cells"))
        .collect()
    )
    assert all(r.n_cells == 1 for r in cells)
