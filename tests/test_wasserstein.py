"""D97: per-group Wasserstein-1 drift vs the pool — integer-exact
Python twin + transport-cost semantics tests."""

from __future__ import annotations

from mysql2parquet_spark.operators.drift import wasserstein_drift


def _py_w1(rows):
    base = [(g, x) for g, x in rows if g is not None]
    support = sorted({x for _, x in base})
    nb = len(base)
    out = {}
    for g in sorted({g for g, _ in base}):
        mine = [x for gg, x in base if gg == g]
        na = len(mine)
        isum = 0
        cuma = cumb = 0
        for i, x in enumerate(support[:-1]):
            cuma += sum(1 for v in mine if v == x)
            cumb += sum(1 for _, v in base if v == x)
            isum += abs(nb * cuma - na * cumb) * (support[i + 1] - x)
        out[g] = (na, (isum * 1000) // (na * nb))
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "source string, n_chars bigint")
    got = wasserstein_drift(df, "n_chars", "source").collect()
    return {r["source"]: (r["n_docs"], r["w1_milli"]) for r in got}


def test_matches_python_twin(spark):
    rows = [("a", v) for v in (10, 12, 12, 15, 30)]
    rows += [("b", v) for v in (10, 11, 40, 40)]
    rows += [(None, 999)]  # NULL group excluded from pool and report
    assert _run(spark, rows) == _py_w1(rows)


def test_identical_distribution_is_zero(spark):
    rows = [("a", v) for v in (5, 7, 9)] + [("b", v) for v in (5, 7, 9)]
    got = _run(spark, rows)
    assert got["a"][1] == 0
    assert got["b"][1] == 0


def test_w1_sees_shift_magnitude_where_binwise_cannot(spark):
    # same mass leaves the pool mode either way; W1 charges the
    # DISTANCE it moved — a +100 shift must cost ~10x a +10 shift
    common = [("pool", 100)] * 20
    near = common + [("near", 110)] * 20
    far = common + [("far", 200)] * 20
    g_near = _run(spark, near)["near"][1]
    g_far = _run(spark, far)["far"][1]
    assert g_far > 5 * g_near
    assert _py_w1(near)["near"][1] == g_near
    assert _py_w1(far)["far"][1] == g_far


def test_matches_twin_on_fixture(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "n_chars"
    )
    rows = [(r["source"], r["n_chars"]) for r in df.collect()]
    assert _run(spark, rows) == _py_w1(rows)
