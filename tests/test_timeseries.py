"""Unit tests pinning the o1/o2 time-series semantics on hand fixtures:
forward-fill carry, NULL before first observation, at-instant inclusion,
and OHLC first/last determinism."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from scopus_spark.queries import timeseries


def _ev(spark, rows):
    # rows: (event_id, minute, user_id, value)
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, 0, m), u, v, "x", "{}")
            for (i, m, u, v) in rows
        ],
        "event_id long, ts timestamp, user_id long, value double,"
        " event_type string, props string",
    )


def test_ffill_carries_and_leading_null(spark, tmp_path, monkeypatch):
    # Events at :07 and :21 for user 1. 6h grid collapses to one row here,
    # so exercise the internals directly on a minute-level rendering:
    ev = _ev(spark, [(1, 7, 1, 10.0), (2, 21, 1, 20.0)])
    dedup = timeseries._events_dedup_from(ev)
    grid = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, m)) for m in (0, 7, 15, 30)],
        "user_id long, bucket_ts timestamp",
    )
    out = {
        r["bucket_ts"].minute: (r["last_value"], r["last_event_ts"])
        for r in timeseries.forward_fill(dedup, grid).collect()
    }
    assert out[0] == (None, None)  # before first observation
    assert out[7][0] == 10.0  # at-instant event included (>= semantics)
    assert out[15][0] == 10.0  # carried forward
    assert out[30][0] == 20.0
    assert out[30][1] == dt.datetime(2024, 1, 1, 0, 21)


def test_ffill_dedup_tie_break_by_event_id(spark):
    # two events at the SAME (user, ts): the higher event_id must win
    ev = _ev(spark, [(5, 10, 1, 111.0), (9, 10, 1, 222.0)])
    dedup = timeseries._events_dedup_from(ev)
    rows = dedup.collect()
    assert len(rows) == 1 and rows[0]["value"] == 222.0


def test_ohlc_first_last_by_time_not_value(spark, sf_dir):
    ohlc = dict(
        (r["user_id"], r)
        for r in timeseries.o2_ohlc_rollup(spark, sf_dir)
        .filter(F.col("bucket_ts") == dt.datetime(2024, 1, 1))
        .collect()
    )
    # invariants: low <= open/close <= high, n_events >= 1
    for r in ohlc.values():
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["n_events"] >= 1
