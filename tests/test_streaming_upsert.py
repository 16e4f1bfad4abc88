"""Streaming -> keyed-upsert sink integration (SURVEY §2.I + upsert op):
scripted micro-batches MERGEd into a partitioned parquet table via
foreachBatch; the table must hold the latest version per key after every
batch, and replaying a batch must be a no-op (idempotent sink contract)."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

from scopus_spark.streaming.harness import StreamRig
from scopus_spark.streaming.sinks import foreach_batch_upsert, latest_per_key


def _mk_events(spark, rows):
    # (event_id, ts, user_id, event_type, value, props)
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, 0, 0, s), u, et, v, "{}")
            for (i, s, u, et, v) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _state(spark, path):
    return {
        (r["user_id"], r["event_type"]): r["value"]
        for r in spark.read.parquet(path).collect()
    }


def test_latest_per_key_picks_max_order(spark):
    df = _mk_events(spark, [(1, 1, 10, "a", 1.0), (2, 5, 10, "a", 2.0), (3, 3, 10, "a", 9.0)])
    out = latest_per_key(df, ["user_id", "event_type"], "ts").collect()
    assert len(out) == 1 and out[0]["value"] == 2.0  # ts=5 wins, not max value


def test_stream_upsert_two_batches(spark):
    target = os.path.join(tempfile.mkdtemp(prefix="scopus_upsert_"), "tbl")
    rig = StreamRig(spark)
    sink = foreach_batch_upsert(
        target, key_cols=["user_id", "event_type"],
        partition_col="event_type", order_col="ts",
    )
    try:
        # batch 1: users 1,2 in partition "click"; user 3 in "view"
        rig.drop_file(
            _mk_events(
                spark,
                [(1, 1, 1, "click", 1.0), (2, 2, 2, "click", 2.0), (3, 3, 3, "view", 3.0)],
            )
        )
        stream = spark.readStream.schema(rig.schema).parquet(rig.input_dir)
        q = (
            stream.writeStream.outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", rig.checkpoint_dir)
            .foreachBatch(sink)
            .start()
        )
        q.awaitTermination()
        assert _state(spark, target) == {
            (1, "click"): 1.0, (2, "click"): 2.0, (3, "view"): 3.0,
        }

        # batch 2: update user 2, insert user 4 (click); "view" untouched
        rig.drop_file(
            _mk_events(spark, [(4, 9, 2, "click", 20.0), (5, 8, 4, "click", 4.0)])
        )
        q = (
            stream.writeStream.outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", rig.checkpoint_dir)
            .foreachBatch(sink)
            .start()
        )
        q.awaitTermination()
        assert _state(spark, target) == {
            (1, "click"): 1.0, (2, "click"): 20.0,
            (3, "view"): 3.0, (4, "click"): 4.0,
        }
    finally:
        rig.cleanup()
        shutil.rmtree(os.path.dirname(target), ignore_errors=True)


def test_upsert_sink_idempotent_on_replay(spark):
    """foreachBatch may replay a batch on failure recovery — the sink must
    converge to the same table state."""
    target = os.path.join(tempfile.mkdtemp(prefix="scopus_upsert_"), "tbl")
    sink = foreach_batch_upsert(
        target, key_cols=["user_id", "event_type"],
        partition_col="event_type", order_col="ts",
    )
    batch = _mk_events(spark, [(1, 1, 1, "click", 1.0), (2, 2, 2, "view", 5.0)])
    try:
        sink(batch, 0)
        first = _state(spark, target)
        sink(batch, 0)  # replay
        assert _state(spark, target) == first
    finally:
        shutil.rmtree(os.path.dirname(target), ignore_errors=True)


def test_stream_jdbc_upsert_two_batches(spark):
    """Streaming CDC into the RDBMS terminal stage: scripted micro-batches
    keyed-upserted into embedded Derby via foreachBatch; the table must
    hold the latest version per key after every batch, and replaying a
    batch's content must be idempotent."""
    from scopus_spark.sources.jdbc import DERBY_DRIVER, derby_url, read_jdbc
    from scopus_spark.streaming.sinks import foreach_batch_jdbc_upsert

    tmp = tempfile.mkdtemp(prefix="scopus_derby_stream_")
    url = derby_url(f"{tmp}/db")
    table = "event_state"
    sink = foreach_batch_jdbc_upsert(
        url, table, DERBY_DRIVER,
        key_cols=["user_id", "event_type"], order_col="ts",
    )

    def db_state():
        return {
            (r["user_id"], r["event_type"]): r["value"]
            for r in read_jdbc(spark, url, table, DERBY_DRIVER).collect()
        }

    rig = StreamRig(spark)
    try:
        rig.drop_file(
            _mk_events(
                spark,
                [(1, 1, 1, "click", 1.0), (2, 2, 2, "click", 2.0), (3, 3, 3, "view", 3.0)],
            )
        )
        stream = spark.readStream.schema(rig.schema).parquet(rig.input_dir)
        q = (
            stream.writeStream.outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", rig.checkpoint_dir)
            .foreachBatch(sink)
            .start()
        )
        q.awaitTermination()
        assert db_state() == {
            (1, "click"): 1.0, (2, "click"): 2.0, (3, "view"): 3.0,
        }

        # batch 2: update user 2, insert user 4
        batch2 = [(4, 9, 2, "click", 20.0), (5, 8, 4, "click", 4.0)]
        rig.drop_file(_mk_events(spark, batch2))
        q = (
            stream.writeStream.outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", rig.checkpoint_dir)
            .foreachBatch(sink)
            .start()
        )
        q.awaitTermination()
        expected = {
            (1, "click"): 1.0, (2, "click"): 20.0,
            (3, "view"): 3.0, (4, "click"): 4.0,
        }
        assert db_state() == expected

        # retry contract: re-applying the same batch content is a no-op
        sink(_mk_events(spark, batch2), 99)
        assert db_state() == expected
    finally:
        rig.cleanup()
        shutil.rmtree(tmp, ignore_errors=True)


def _mk_cdc(spark, rows):
    # (event_id, ts_second, user_id, event_type, value, op)
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, 0, 0, s), u, et, v, op)
            for (i, s, u, et, v, op) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, op string",
    )


def test_cdc_sink_applies_tombstones(spark):
    """The op-envelope sink: latest-wins collapse THEN tombstone split —
    deletes remove keys, an insert-then-delete in one batch deletes, a
    later batch can re-insert a deleted key."""
    target = os.path.join(tempfile.mkdtemp(prefix="scopus_cdc_"), "tbl")
    sink = foreach_batch_upsert(
        target, key_cols=["user_id", "event_type"],
        partition_col="event_type", order_col="ts", op_col="op",
    )
    try:
        # batch 1: three upserts; key (3,view) inserted then tombstoned
        sink(
            _mk_cdc(spark, [
                (1, 1, 1, "click", 1.0, "U"),
                (2, 2, 2, "click", 2.0, "U"),
                (3, 3, 3, "view", 3.0, "U"),
                (4, 4, 3, "view", 0.0, "D"),
            ]),
            0,
        )
        assert _state(spark, target) == {(1, "click"): 1.0, (2, "click"): 2.0}

        # batch 2: delete (1,click), update (2,click), re-insert (3,view)
        sink(
            _mk_cdc(spark, [
                (5, 9, 1, "click", 0.0, "D"),
                (6, 8, 2, "click", 20.0, "U"),
                (7, 7, 3, "view", 30.0, "U"),
            ]),
            1,
        )
        assert _state(spark, target) == {(2, "click"): 20.0, (3, "view"): 30.0}

        # replay batch 2 -> identical state (idempotent incl. deletes)
        sink(
            _mk_cdc(spark, [
                (5, 9, 1, "click", 0.0, "D"),
                (6, 8, 2, "click", 20.0, "U"),
                (7, 7, 3, "view", 30.0, "U"),
            ]),
            1,
        )
        assert _state(spark, target) == {(2, "click"): 20.0, (3, "view"): 30.0}
    finally:
        shutil.rmtree(os.path.dirname(target), ignore_errors=True)


def test_jdbc_upsert_never_collects_keys():
    """The JDBC sink's delete must be set-based (stage + DELETE…EXISTS):
    collecting the delta's keys to the driver makes the driver the choke
    point on a hot batch. Pin the source free of any collect()."""
    import inspect

    from scopus_spark.streaming.sinks import foreach_batch_jdbc_upsert

    src = inspect.getsource(foreach_batch_jdbc_upsert)
    assert ".collect()" not in src, src
    assert "WHERE EXISTS" in src


def test_streaming_continuous_aggregate_ohlc(spark, tmp_path):
    """Streaming -> continuous aggregate: a foreachBatch sink that MERGEs
    each micro-batch into the materialized OHLC rollup
    (operators/rollup.incremental_ohlc) must leave the table equal to a
    full batch recompute over everything streamed — the Structured
    Streaming rendering of a continuous aggregate."""
    from scopus_spark.operators import rollup

    target = str(tmp_path / "ohlc")

    def sink(batch_df, _batch_id):
        rollup.incremental_ohlc(target, batch_df)

    rig = StreamRig(spark)
    all_rows = [
        (1, 1, 1, "click", 5.0),
        (2, 2, 1, "click", 9.0),
        (3, 3, 2, "view", 1.0),
    ]
    batch2 = [
        (4, 4, 1, "click", 2.0),   # same bucket as events 1-2
        (5, 50, 1, "click", 7.0),  # same day, later in the bucket
    ]
    try:
        rig.drop_file(_mk_events(spark, all_rows))
        stream = spark.readStream.schema(rig.schema).parquet(rig.input_dir)
        for _ in range(2):
            q = (
                stream.writeStream.outputMode("append")
                .trigger(availableNow=True)
                .option("checkpointLocation", rig.checkpoint_dir)
                .foreachBatch(sink)
                .start()
            )
            q.awaitTermination()
            if _ == 0:
                rig.drop_file(_mk_events(spark, batch2))
        got = {
            (r.user_id, r.bucket_ts, r.open, r.high, r.low, r.close, r.n_events)
            for r in rollup.read_rollup(spark, target).collect()
        }
        full = {
            (r.user_id, r.bucket_ts, r.open, r.high, r.low, r.close, r.n_events)
            for r in rollup.ohlc_state(
                _mk_events(spark, all_rows + batch2)
            ).select(
                "user_id", "bucket_ts", "open", "high", "low", "close", "n_events"
            ).collect()
        }
        assert got == full
    finally:
        rig.cleanup()


def test_jdbc_upsert_sweeps_crash_orphan_staging(spark):
    """A driver that dies between staging CREATE and the finally-DROP
    leaves an orphan scratch table. With a deterministic stream_name tag,
    a restart derives the SAME staging namespace and reclaims the orphan
    on its first batch instead of accumulating scratch tables forever."""
    import hashlib

    from scopus_spark.sources.jdbc import DERBY_DRIVER, derby_url, read_jdbc
    from scopus_spark.streaming.sinks import foreach_batch_jdbc_upsert

    tmp = tempfile.mkdtemp(prefix="scopus_derby_orphan_")
    url = derby_url(f"{tmp}/db")
    table = "orphan_state"
    name = "ckpt://orphan-stream"
    tag = hashlib.sha1(name.encode()).hexdigest()[:8].upper()
    orphan = f"{table}_STG_{tag}_7"

    def table_names():
        jvm = spark._jvm
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            rs = conn.getMetaData().getTables(None, None, "%", None)
            out = set()
            while rs.next():
                out.add(rs.getString("TABLE_NAME"))
            return out
        finally:
            conn.close()

    try:
        # simulate the crashed prior run's leftover scratch table
        jvm = spark._jvm
        conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
        try:
            st = conn.createStatement()
            st.executeUpdate(f'CREATE TABLE "{orphan}" ("user_id" BIGINT)')
            st.close()
        finally:
            conn.close()
        assert orphan in table_names()

        sink = foreach_batch_jdbc_upsert(
            url, table, DERBY_DRIVER,
            key_cols=["user_id", "event_type"], order_col="ts",
            stream_name=name,
        )
        sink(_mk_events(spark, [(1, 1, 1, "click", 1.0)]), 0)
        names = table_names()
        assert orphan not in names, names          # orphan reclaimed
        assert not any(n.startswith(f"{table.upper()}_STG") for n in names), names
        got = {
            (r["user_id"], r["event_type"]): r["value"]
            for r in read_jdbc(spark, url, table, DERBY_DRIVER).collect()
        }
        assert got == {(1, "click"): 1.0}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
