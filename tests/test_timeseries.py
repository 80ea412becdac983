"""resample_locf / ohlc semantics on planted irregular series."""

from __future__ import annotations

import datetime as dt

import pytest


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, key string, value double"
    )


def t(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


def test_locf_fills_planted_gap(spark):
    from mysql2parquet_spark.operators.timeseries import resample_locf

    rows = [
        (1, t(0, 10), "a", 1.0),
        (2, t(0, 50), "a", 2.0),  # hour 0 close = 2.0
        # hours 1-2 empty -> gap-filled with 2.0
        (3, t(3, 0), "a", 9.0),
    ]
    out = resample_locf(
        _df(spark, rows), key_cols=["key"], ts_col="ts",
        value_col="value", id_col="event_id", unit="hour",
    ).collect()
    by_slot = {r.slot_start: r for r in out}
    assert len(out) == 4  # hours 0..3, no grid beyond observed bounds
    assert by_slot["2024-03-01 00:00:00"].value_locf == 2.0
    assert by_slot["2024-03-01 00:00:00"].n_obs == 2
    assert not by_slot["2024-03-01 00:00:00"].gap_filled
    for h in ("2024-03-01 01:00:00", "2024-03-01 02:00:00"):
        assert by_slot[h].value_locf == 2.0
        assert by_slot[h].n_obs == 0 and by_slot[h].gap_filled
    assert by_slot["2024-03-01 03:00:00"].value_locf == 9.0


def test_locf_close_tiebreaks_on_id(spark):
    from mysql2parquet_spark.operators.timeseries import resample_locf

    # same timestamp: higher event_id wins the close
    rows = [(1, t(5), "a", 1.0), (2, t(5), "a", 7.0)]
    out = resample_locf(
        _df(spark, rows), key_cols=["key"], ts_col="ts",
        value_col="value", id_col="event_id", unit="hour",
    ).collect()
    assert len(out) == 1 and out[0].value_locf == 7.0


def test_locf_keys_independent(spark):
    from mysql2parquet_spark.operators.timeseries import resample_locf

    # key b's fill never leaks into key a's gap
    rows = [
        (1, t(0), "a", 1.0), (2, t(2), "a", 3.0),
        (3, t(0), "b", 100.0),
    ]
    out = resample_locf(
        _df(spark, rows), key_cols=["key"], ts_col="ts",
        value_col="value", id_col="event_id", unit="hour",
    ).collect()
    a_rows = sorted(
        (r for r in out if r.key == "a"), key=lambda r: r.slot_start
    )
    assert [r.value_locf for r in a_rows] == [1.0, 1.0, 3.0]
    assert [r.value_locf for r in out if r.key == "b"] == [100.0]


def test_locf_rejects_unknown_unit(spark):
    from mysql2parquet_spark.operators.timeseries import resample_locf

    with pytest.raises(ValueError, match="unit"):
        resample_locf(
            _df(spark, [(1, t(0), "a", 1.0)]), key_cols=["key"],
            unit="fortnight",
        ).collect()


def test_ohlc_endpoints_and_extremes(spark):
    from mysql2parquet_spark.operators.timeseries import ohlc

    rows = [
        (1, t(9, 0), "a", 5.0),   # open
        (2, t(9, 20), "a", 9.0),  # high
        (3, t(9, 40), "a", 1.0),  # low
        (4, t(9, 59), "a", 4.0),  # close
    ]
    out = ohlc(
        _df(spark, rows), key_cols=["key"], ts_col="ts",
        value_col="value", id_col="event_id", unit="hour",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.open, r.high, r.low, r.close, r.n_obs) == (5.0, 9.0, 1.0, 4.0, 4)


def test_ohlc_single_obs_slot_all_equal(spark):
    from mysql2parquet_spark.operators.timeseries import ohlc

    out = ohlc(
        _df(spark, [(1, t(4), "a", 3.5)]), key_cols=["key"], ts_col="ts",
        value_col="value", id_col="event_id", unit="hour",
    ).collect()
    r = out[0]
    assert r.open == r.high == r.low == r.close == 3.5


def test_ohlc_no_grid_only_observed_slots(spark):
    from mysql2parquet_spark.operators.timeseries import ohlc

    rows = [(1, t(0), "a", 1.0), (2, t(5), "a", 2.0)]
    out = ohlc(
        _df(spark, rows), key_cols=["key"], ts_col="ts",
        value_col="value", id_col="event_id", unit="hour",
    ).collect()
    assert len(out) == 2  # hours 1-4 absent: ohlc never fabricates slots
