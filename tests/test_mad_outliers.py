"""D92: median/MAD robust outlier report — Decimal-exact Python twin +
robustness contract tests."""

from __future__ import annotations

from decimal import Decimal

from mysql2parquet_spark.operators.numeric import mad_outlier_report


def _py_mad(rows, z_milli=3500):
    groups: dict = {}
    nulls: dict = {}
    for g, v in rows:
        if v is None:
            nulls[g] = nulls.get(g, 0) + 1
        else:
            groups.setdefault(g, []).append(
                Decimal(str(v)).quantize(Decimal("0.01"))
            )
    out = {}
    for g, vs in groups.items():
        vs.sort()
        n = len(vs)
        lo, hi = (n + 1) // 2, (n + 2) // 2
        med2 = vs[lo - 1] + vs[hi - 1]
        dev2 = sorted(abs(2 * v - med2) for v in vs)
        mad4 = dev2[lo - 1] + dev2[hi - 1]
        n_out = sum(
            1 for v in vs if 1349 * abs(2 * v - med2) > z_milli * mad4
        )
        out[g] = (
            n,
            nulls.get(g, 0),
            float(med2),
            float(mad4),
            n_out,
        )
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "grp string, value double")
    got = mad_outlier_report(df, "value", ["grp"], **kw).collect()
    return {
        r["grp"]: (
            r["n_rows"],
            r["n_null"],
            r["median_x2"],
            r["mad_x4"],
            r["n_outliers"],
        )
        for r in got
    }


def test_matches_decimal_twin(spark):
    rows = [("a", v) for v in (1.0, 2.5, 2.5, 3.0, 100.0, None)]
    rows += [("b", v) for v in (10.0, 11.0, 12.0, 13.0)]  # even n
    assert _run(spark, rows) == _py_mad(rows)


def test_robust_to_the_outlier_it_flags(spark):
    # the 100.0 outlier must not move the gate: median/MAD of group a
    # are set by the inliers, and exactly the one wild row flags
    rows = [("a", v) for v in (1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 100.0)]
    got = _run(spark, rows)
    n, _, med2, mad4, n_out = got["a"]
    assert med2 == 2 * 3.0  # median 3.0 — set by the inliers
    assert n_out == 1
    # mean/stddev would have been dragged: sanity-check the contrast
    vals = [1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 100.0]
    mean = sum(vals) / len(vals)
    assert mean > 16  # the plain mean IS dragged


def test_zero_mad_degeneracy_flags_non_median(spark):
    # >half the group tied at the median -> MAD = 0 -> every
    # non-median value flags (documented degeneracy)
    rows = [("a", v) for v in (5.0, 5.0, 5.0, 5.0, 7.0, 3.0)]
    got = _run(spark, rows)
    assert got["a"][3] == 0.0  # mad_x4
    assert got["a"][4] == 2


def test_cutoff_override(spark):
    rows = [("a", v) for v in (1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 9.0)]
    strict = _run(spark, rows, z_milli=1000)
    loose = _run(spark, rows, z_milli=10000)
    assert strict["a"][4] >= loose["a"][4]
