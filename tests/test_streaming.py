"""Streaming-semantics tests (SURVEY §5.2.4): batch/stream equivalence for
i1–i3/i6, scripted-micro-batch watermark + dedup semantics for i4/i5, and
applyInPandasWithState for i7.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scopus_spark import registry
from scopus_spark.catalog import load_table, table
from scopus_spark.queries import streaming as sq
from scopus_spark.streaming.harness import EVENTS_STREAM_SCHEMA, StreamRig
from tests.conftest import SMOKE_SF_DIR

QUERIES = registry.all_queries()


def _rows_set(rows, cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


@pytest.mark.parametrize(
    "builder,key,cols",
    [
        (sq.tumbling_1h, "i1", ["win_start", "event_type", "n_events", "sum_value"]),
        (sq.sliding_1h_15m, "i2", ["win_start", "event_type", "n_events"]),
        (sq.session_30m, "i3", ["sess_start", "sess_end", "user_id", "n_events"]),
    ],
)
def test_stream_batch_equivalence(spark, builder, key, cols):
    """The same plan over readStream(availableNow, complete mode) must equal
    the batch result on sf0.001 events."""
    rig = StreamRig(spark)
    try:
        rig.drop_file(load_table(spark, SMOKE_SF_DIR, "events"))
        streamed = rig.run(builder, output_mode="complete")
    finally:
        rig.cleanup()
    batch = builder(load_table(spark, SMOKE_SF_DIR, "events")).collect()
    assert _rows_set(streamed, cols) == _rows_set(batch, cols)


def test_i6_stream_static_join_equivalence(spark):
    customers = table(spark, SMOKE_SF_DIR, "customer")
    rig = StreamRig(spark)
    try:
        rig.drop_file(load_table(spark, SMOKE_SF_DIR, "events"))
        streamed = rig.run(
            lambda s: sq.enrich_with_customers(s, customers), output_mode="append"
        )
    finally:
        rig.cleanup()
    batch = QUERIES["i6"](spark, SMOKE_SF_DIR).collect()
    cols = ["event_id", "user_id", "c_name", "c_mktsegment", "value"]
    assert _rows_set(streamed, cols) == _rows_set(batch, cols)


def _mk_events(spark, rows):
    """rows: list of (event_id, ts_str, user_id, type, value)."""
    data = [
        (eid, dt.datetime.fromisoformat(ts), uid, et, val, '{"k": 1}')
        for eid, ts, uid, et, val in rows
    ]
    return spark.createDataFrame(data, EVENTS_STREAM_SCHEMA)


def test_i4_watermark_drops_late_rows(spark):
    """Scripted micro-batches: batch 1 sets the watermark; a batch-2 row
    older than (max_ts - 10m) must be dropped from its window's count."""
    rig = StreamRig(spark)
    build = lambda s: sq.tumbling_1h(s.withWatermark("ts", "10 minutes"))  # noqa: E731
    try:
        rig.drop_file(
            _mk_events(
                spark,
                [
                    (1, "2024-01-01 10:05:00", 1, "click", 1.0),
                    (2, "2024-01-01 12:00:00", 1, "click", 1.0),  # advances WM to 11:50
                ],
            )
        )
        rig.run(build, output_mode="update")
        # batch 2: one late row (10:30 < WM 11:50 → dropped), one on-time row
        rig.drop_file(
            _mk_events(
                spark,
                [
                    (3, "2024-01-01 10:30:00", 1, "click", 1.0),  # LATE — dropped
                    (4, "2024-01-01 12:10:00", 1, "click", 1.0),  # on time
                ],
            )
        )
        out2 = rig.run(build, output_mode="update")
    finally:
        rig.cleanup()
    by_window = {
        (r.win_start, r.event_type): r.n_events for r in out2
    }
    ten = dt.datetime(2024, 1, 1, 10)
    twelve = dt.datetime(2024, 1, 1, 12)
    # the 10:00 window must NOT be re-emitted/updated by the late row
    assert (ten, "click") not in by_window, out2
    # the 12:00 window grew to 2 (event 2 from batch1 + event 4)
    assert by_window.get((twelve, "click")) == 2, out2


def test_i5_dedup_within_watermark(spark):
    """dropDuplicatesWithinWatermark: a duplicate event_id arriving within
    the watermark window is suppressed."""
    rig = StreamRig(spark)
    build = lambda s: (  # noqa: E731
        s.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    try:
        rig.drop_file(
            _mk_events(
                spark,
                [
                    (1, "2024-01-01 10:00:00", 1, "click", 1.0),
                    (2, "2024-01-01 10:01:00", 1, "view", 1.0),
                ],
            )
        )
        out1 = rig.run(build, output_mode="append")
        rig.drop_file(
            _mk_events(
                spark,
                [
                    (1, "2024-01-01 10:02:00", 1, "click", 1.0),  # dup — dropped
                    (3, "2024-01-01 10:03:00", 1, "purchase", 1.0),
                ],
            )
        )
        out2 = rig.run(build, output_mode="append")
    finally:
        rig.cleanup()
    assert sorted(r.event_id for r in out1) == [1, 2]
    assert sorted(r.event_id for r in out2) == [3]


def test_i7_stateful_running_sum_stream(spark):
    """applyInPandasWithState running sum must equal the batch window
    running sum after processing scripted batches in order."""
    out_schema = "user_id long, event_id long, running_value double"
    state_schema = "total double"

    def running(key, pdf_iter, state):
        total = state.get[0] if state.exists else 0.0
        rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, r in pdf.iterrows():
                total = round(total + float(r["value"]), 2)
                rows.append((key[0], int(r["event_id"]), total))
        state.update((total,))
        yield pd.DataFrame(rows, columns=["user_id", "event_id", "running_value"])

    def build(s):
        return s.groupBy("user_id").applyInPandasWithState(
            running, out_schema, state_schema, "update",
            "NoTimeout",
        )

    rig = StreamRig(spark)
    try:
        rig.drop_file(
            _mk_events(
                spark,
                [
                    (1, "2024-01-01 10:00:00", 1, "click", 1.5),
                    (2, "2024-01-01 10:05:00", 1, "click", 2.25),
                    (3, "2024-01-01 10:06:00", 2, "view", 4.0),
                ],
            )
        )
        out1 = rig.run(build, output_mode="update")
        rig.drop_file(
            _mk_events(spark, [(4, "2024-01-01 11:00:00", 1, "click", 1.0)])
        )
        out2 = rig.run(build, output_mode="update")
    finally:
        rig.cleanup()
    got = {r.event_id: r.running_value for r in out1 + out2}
    assert got == {1: 1.5, 2: 3.75, 3: 4.0, 4: 4.75}


def test_i8_stream_stream_join(spark):
    """Stream-stream interval join with watermarks on both sides must match
    the batch join over the same scripted input."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "purchase", 1.0),
        (2, "2024-01-01 10:20:00", 1, "error", 1.0),    # within 1h of 1
        (3, "2024-01-01 12:00:00", 1, "error", 1.0),    # outside
        (4, "2024-01-01 10:30:00", 2, "purchase", 1.0),
        (5, "2024-01-01 10:40:00", 2, "error", 1.0),    # within 1h of 4
        (6, "2024-01-01 13:00:00", 9, "view", 1.0),     # advances watermark
    ]

    def build(s):
        s = s.withWatermark("ts", "10 minutes")
        return sq.purchase_error_pairs(s)

    rig = StreamRig(spark)
    try:
        rig.drop_file(_mk_events(spark, rows))
        streamed = rig.run(build, output_mode="append")
    finally:
        rig.cleanup()
    batch = sq.purchase_error_pairs(_mk_events(spark, rows)).collect()
    cols = ["p_id", "e_id", "user_id"]
    assert _rows_set(streamed, cols) == _rows_set(batch, cols)
    assert _rows_set(batch, cols) == [(1, 2, 1), (4, 5, 2)]


def test_streaming_file_sink_roundtrip(spark):
    """writeStream -> parquet file sink -> batch re-read: the streaming
    OUTPUT side (exactly-once file sink with checkpoint manifest)."""
    import tempfile

    from scopus_spark.catalog import load_table

    out = tempfile.mkdtemp(prefix="scopus_sink_")
    rig = StreamRig(spark)
    try:
        rig.drop_file(load_table(spark, SMOKE_SF_DIR, "events"))
        stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(rig.input_dir)
        q = (
            stream.select("event_id", "user_id", "value")
            .writeStream.format("parquet")
            .option("path", f"{out}/data")
            .option("checkpointLocation", f"{out}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        written = spark.read.parquet(f"{out}/data")
        src = load_table(spark, SMOKE_SF_DIR, "events")
        assert written.count() == src.count()
        assert set(written.columns) == {"event_id", "user_id", "value"}
    finally:
        rig.cleanup()
        import shutil

        shutil.rmtree(out, ignore_errors=True)


def test_i9_processor_constructs_without_protobuf():
    """The TWS processor definition must be buildable on any environment
    (only streaming EXECUTION needs the protobuf wire protocol)."""
    from scopus_spark.streaming import tws

    proc = tws.make_user_summary_processor()
    assert hasattr(proc, "handleInputRows") and hasattr(proc, "init")
    assert "last_ts timestamp" in tws.OUTPUT_SCHEMA


def test_i9_transform_with_state(spark):
    """transformWithStateInPandas per-user summary must equal the batch
    aggregate after scripted micro-batches. The TWS Python worker speaks
    protobuf to the JVM state server; the vendored pure-python runtime
    (scopus_spark/_vendor, armed in conftest before the JVM starts) makes
    this executable even though the container ships no google.protobuf."""
    from scopus_spark._vendor import ensure_protobuf

    assert ensure_protobuf(), "vendored protobuf runtime failed to arm"
    from scopus_spark.streaming import tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", tws.ROCKSDB_PROVIDER
    )
    try:
        rig = StreamRig(spark)
        try:
            rig.drop_file(
                _mk_events(
                    spark,
                    [
                        (1, "2024-01-01 10:00:00", 1, "click", 1.5),
                        (2, "2024-01-01 10:05:00", 1, "view", 2.25),
                        (3, "2024-01-01 10:06:00", 2, "view", 4.0),
                    ],
                )
            )
            rig.run(tws.user_summary_stream, output_mode="update")
            rig.drop_file(
                _mk_events(
                    spark, [(4, "2024-01-01 11:00:00", 1, "click", 9.0)]
                )
            )
            out = rig.run(tws.user_summary_stream, output_mode="update")
        finally:
            rig.cleanup()
        got = {r.user_id: (r.n_events, r.n_types, r.max_value) for r in out}
        assert got[1] == (3, 2, 9.0)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_i10_timer_sessions(spark):
    """EVENT-TIME TIMERS must close a session when the watermark passes
    last_event + gap, with NO new input for that key in the closing batch
    — the semantics only registerTimer/handleExpiredTimer can express.
    Scripted: u1's 10:00-10:10 burst closes only after later events push
    the watermark past 10:40; the 12:00 event stays buffered (open)."""
    from scopus_spark._vendor import ensure_protobuf

    assert ensure_protobuf()
    from scopus_spark.streaming import tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", tws.ROCKSDB_PROVIDER
    )
    try:
        rig = StreamRig(spark)
        try:
            out = []
            rig.drop_file(
                _mk_events(
                    spark,
                    [
                        (1, "2024-01-01 10:00:00", 1, "click", 1.0),
                        (2, "2024-01-01 10:10:00", 1, "view", 2.0),
                    ],
                )
            )
            out += rig.run(tws.session_timer_stream, output_mode="append")
            # batch 2 carries the event that will advance the watermark
            rig.drop_file(
                _mk_events(spark, [(3, "2024-01-01 12:00:00", 1, "click", 4.0)])
            )
            out += rig.run(tws.session_timer_stream, output_mode="append")
            # batch 3: watermark (from batch 2) is now 11:50 > 10:40 -> the
            # timer fires and the first session emits; 12:00 stays open
            # (batch 3's own event only pushes the watermark to 12:10,
            # still before the open session's 12:30 close instant)
            rig.drop_file(
                _mk_events(spark, [(4, "2024-01-01 12:20:00", 2, "view", 9.0)])
            )
            out += rig.run(tws.session_timer_stream, output_mode="append")
            # batch 4 pushes the watermark only to 12:25 — STILL before the
            # open session's close; it must stay buffered
            rig.drop_file(
                _mk_events(spark, [(5, "2024-01-01 12:35:00", 2, "view", 1.0)])
            )
            out += rig.run(tws.session_timer_stream, output_mode="append")
        finally:
            rig.cleanup()
        sessions = {
            (r.user_id, str(r.sess_start), r.n_events, r.sum_value) for r in out
        }
        assert (1, "2024-01-01 10:00:00", 2, 3.0) in sessions, sessions
        # the open 12:00 session must NOT have emitted
        assert not any(s[1].startswith("2024-01-01 12:00") for s in sessions)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_i11_left_outer_emission_timing(spark):
    """Stream-stream LEFT OUTER interval join: the null-padded row for an
    unmatched purchase must emit EXACTLY when the watermark passes
    p_ts + 1h (the interval upper bound) — not before, not twice.

    Two subtleties this scenario pins:
    - Watermark-advancing events must pass one of the join sides' filters
      (purchase/error): Catalyst pushes the event_type filters BELOW the
      EventTimeWatermark node, so a 'view' row never reaches the event-time
      stats collector and does NOT advance the watermark. We advance with
      'error' rows from an unrelated user.
    - Each availableNow run appends a trailing no-data batch carrying the
      watermark computed from the run's own data, so state eviction (and
      the outer-row emission it triggers) happens within the SAME
      rig.run() call whose data advanced the watermark past the window.
    """
    build = lambda s: sq.purchase_error_pairs_outer(  # noqa: E731
        s.withWatermark("ts", "10 minutes")
    )
    cols = ["p_id", "e_id", "user_id"]
    rig = StreamRig(spark)
    try:
        # batch 1: one matched purchase, one unmatched purchase (match
        # window closes 10:05 + 1h = 11:05), and a watermark-advancing
        # error from an unrelated user (11:00 - 10m -> WM 10:50 < 11:05).
        # The INNER match emits; the unmatched purchase must NOT -- the
        # watermark has not passed its window yet ("not before").
        rig.drop_file(
            _mk_events(
                spark,
                [
                    (1, "2024-01-01 10:00:00", 1, "purchase", 1.0),
                    (2, "2024-01-01 10:20:00", 1, "error", 1.0),
                    (3, "2024-01-01 10:05:00", 2, "purchase", 1.0),  # no error ever
                    (4, "2024-01-01 11:00:00", 9, "error", 1.0),     # WM -> 10:50
                ],
            )
        )
        out1 = rig.run(build, output_mode="append")
        assert _rows_set(out1, cols) == [(1, 2, 1)], _rows_set(out1, cols)
        # batch 2: error 11:30 -> WM 11:20 > 11:05; the run's trailing
        # no-data batch evicts purchase 3's state and the null-padded row
        # emits NOW, exactly once.
        rig.drop_file(
            _mk_events(spark, [(5, "2024-01-01 11:30:00", 9, "error", 1.0)])
        )
        out2 = rig.run(build, output_mode="append")
        assert _rows_set(out2, cols) == [(3, None, 2)], _rows_set(out2, cols)
        # batch 3: nothing left in state to emit -- no duplicate outer row.
        rig.drop_file(
            _mk_events(spark, [(6, "2024-01-01 12:30:00", 9, "error", 1.0)])
        )
        out3 = rig.run(build, output_mode="append")
        assert _rows_set(out3, cols) == [], _rows_set(out3, cols)
    finally:
        rig.cleanup()


def test_i12_full_outer_emission_timing(spark):
    """Stream-stream FULL OUTER interval join: BOTH sides' null-padded
    rows must emit exactly when the watermark passes the last instant the
    row could still match — purchases at p_ts + 1h (the interval upper
    bound), errors at e_ts (their candidate purchases all precede them) —
    not before, not twice.

    Same watermark mechanics as the i11 test (event_type filters are
    pushed below EventTimeWatermark, so only purchase/error rows advance
    the watermark; each availableNow run's trailing no-data batch applies
    the watermark its own data computed). The watermark-advancing errors
    here are themselves join inputs that later emit as unmatched — the
    scenario accounts for every one of them."""
    build = lambda s: sq.purchase_error_pairs_full(  # noqa: E731
        s.withWatermark("ts", "10 minutes")
    )
    cols = ["p_id", "e_id", "user_id"]
    rig = StreamRig(spark)
    try:
        # batch 1: a matched pair (u1), an unmatched purchase (u2, window
        # closes 10:05+1h = 11:05), an unmatched error (u3 at 10:10,
        # evictable once WM > 10:10), and a WM-advancing error (u9 at
        # 11:00 -> WM 10:50). The trailing no-data batch evicts the u3
        # error (10:10 < 10:50) and its right-padded row emits in THIS
        # run; purchase 3 (11:05 > 10:50) and error 5 (11:00 > 10:50)
        # stay in state.
        rig.drop_file(
            _mk_events(
                spark,
                [
                    (1, "2024-01-01 10:00:00", 1, "purchase", 1.0),
                    (2, "2024-01-01 10:20:00", 1, "error", 1.0),
                    (3, "2024-01-01 10:05:00", 2, "purchase", 1.0),  # no error ever
                    (4, "2024-01-01 10:10:00", 3, "error", 1.0),     # no purchase ever
                    (5, "2024-01-01 11:00:00", 9, "error", 1.0),     # WM -> 10:50
                ],
            )
        )
        rows1 = {tuple(r[c] for c in cols) for r in rig.run(build, output_mode="append")}
        assert rows1 == {(None, 4, 3), (1, 2, 1)}, rows1
        # batch 2: error 12:30 (u9) -> WM 12:20. Evicts purchase 3
        # (11:05 < 12:20) AND the previous WM-advancer error 5
        # (11:00 < 12:20, u9 has no purchases) -- both outer rows emit
        # now, exactly once each.
        rig.drop_file(
            _mk_events(spark, [(6, "2024-01-01 12:30:00", 9, "error", 1.0)])
        )
        rows2 = {tuple(r[c] for c in cols) for r in rig.run(build, output_mode="append")}
        assert rows2 == {(None, 5, 9), (3, None, 2)}, rows2
        # batch 3: WM 13:20 evicts error 6; no earlier row may re-emit.
        rig.drop_file(
            _mk_events(spark, [(7, "2024-01-01 13:30:00", 9, "error", 1.0)])
        )
        rows3 = {tuple(r[c] for c in cols) for r in rig.run(build, output_mode="append")}
        assert rows3 == {(None, 6, 9)}, rows3
    finally:
        rig.cleanup()


def test_i13_right_outer_emission_timing(spark):
    """Stream-stream RIGHT OUTER interval join: only the error side
    null-pads, and its row emits exactly when the watermark passes e_ts
    (candidate purchases all precede an error). Same scenario as the i12
    test — here the unmatched purchase must NEVER surface."""
    build = lambda s: sq.purchase_error_pairs_right(  # noqa: E731
        s.withWatermark("ts", "10 minutes")
    )
    cols = ["p_id", "e_id", "user_id"]
    rig = StreamRig(spark)
    try:
        rig.drop_file(
            _mk_events(
                spark,
                [
                    (1, "2024-01-01 10:00:00", 1, "purchase", 1.0),
                    (2, "2024-01-01 10:20:00", 1, "error", 1.0),
                    (3, "2024-01-01 10:05:00", 2, "purchase", 1.0),  # no error ever
                    (4, "2024-01-01 10:10:00", 3, "error", 1.0),     # no purchase ever
                    (5, "2024-01-01 11:00:00", 9, "error", 1.0),     # WM -> 10:50
                ],
            )
        )
        rows1 = {tuple(r[c] for c in cols) for r in rig.run(build, output_mode="append")}
        assert rows1 == {(1, 2, 1), (None, 4, 3)}, rows1
        # WM 12:20: error 5 (u9, unmatched) evicts and null-pads; purchase
        # 3's window closing must emit NOTHING on the right-outer side.
        rig.drop_file(
            _mk_events(spark, [(6, "2024-01-01 12:30:00", 9, "error", 1.0)])
        )
        rows2 = {tuple(r[c] for c in cols) for r in rig.run(build, output_mode="append")}
        assert rows2 == {(None, 5, 9)}, rows2
        rig.drop_file(
            _mk_events(spark, [(7, "2024-01-01 13:30:00", 9, "error", 1.0)])
        )
        rows3 = {tuple(r[c] for c in cols) for r in rig.run(build, output_mode="append")}
        assert rows3 == {(None, 6, 9)}, rows3
    finally:
        rig.cleanup()
