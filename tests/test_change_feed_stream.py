"""ChangeFeedConsumer (i17): the change feed as a checkpointed
micro-batch streaming source.

Contracts:
- two passes with a MERGE landing between them: pass 2 emits ONLY the
  merge's delta (no re-emission of pass 1's commits);
- the concatenation of all passes' emissions equals the batch
  read_changes over the same total range (stream ≡ batch);
- at-least-once: a sink that fails does NOT advance the marker — the
  next poll replays the SAME commit range;
- caught-up consumers poll None (no empty micro-batches).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scopus_spark.operators.manifest import VersionedTable
from scopus_spark.streaming.table_source import ChangeFeedConsumer


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, b long")


def _snap(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_between_passes_emits_only_delta(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    c = ChangeFeedConsumer(t, str(tmp_path / "ckpt"))

    got1 = c.poll(spark)
    assert got1 is not None
    df1, from1, to1 = got1
    assert (from1, to1) == (0, 1)
    p1 = df1.localCheckpoint(eager=True)
    c.commit(to1)

    # merge lands BETWEEN the passes: update k=1, delete k=2, insert k=3
    t.merge(
        _df(spark, [(1, "a2", 0), (3, "c", 1)]),
        key_cols=["k"],
        partition_col="b",
        deletes=_df(spark, [(2, "b", 1)]).select("k", "b"),
    )

    got2 = c.poll(spark)
    df2, from2, to2 = got2
    assert (from2, to2) == (1, 2)
    p2 = df2.localCheckpoint(eager=True)
    c.commit(to2)

    assert _snap(p1.select("k", "_change_type", "_commit_version")) == [
        (1, "insert", 1),
        (2, "insert", 1),
    ]
    assert _snap(p2.select("k", "v", "_change_type", "_commit_version")) == [
        (1, "a", "update_preimage", 2),
        (1, "a2", "update_postimage", 2),
        (2, "b", "delete", 2),
        (3, "c", "insert", 2),
    ]

    # stream ≡ batch: concatenated emissions equal read_changes(0, 2)
    assert _snap(p1.unionByName(p2)) == _snap(t.read_changes(spark, 0, 2))

    # caught up
    assert c.poll(spark) is None


def test_failed_sink_replays_same_range(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    c = ChangeFeedConsumer(t, str(tmp_path / "ckpt"))

    with pytest.raises(RuntimeError, match="sink down"):
        c.run_available(
            spark, lambda df, f, v: (_ for _ in ()).throw(
                RuntimeError("sink down")
            )
        )
    assert c.consumed_version() == 0  # marker did NOT advance

    seen = {}

    def ok_sink(df, from_v, to_v):
        seen["range"] = (from_v, to_v)
        seen["rows"] = df.count()

    assert c.run_available(spark, ok_sink) == 1
    assert seen["range"] == (0, 1)  # the SAME range, replayed
    assert seen["rows"] == 1
    assert c.run_available(spark, ok_sink) is None  # now caught up


def test_max_commits_chunks_the_backlog(spark, tmp_path):
    """A consumer far behind consumes in bounded chunks (one plan per at
    most max_commits commits), each chunk checkpointed before the next —
    the rate-limited backfill shape."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(0, "a", 0)]), "b")
    for i in range(1, 6):
        t.append(_df(spark, [(i, f"a{i}", i % 2)]))  # backlog: v2..v6
    c = ChangeFeedConsumer(t, str(tmp_path / "ckpt"))
    ranges = []

    def sink(df, from_v, to_v):
        ranges.append((from_v, to_v, df.count()))

    assert c.run_available(spark, sink, max_commits=2) == 6
    assert [(f, t_) for f, t_, _ in ranges] == [(0, 2), (2, 4), (4, 6)]
    assert sum(n for _, _, n in ranges) == 6  # every insert exactly once
    assert c.consumed_version() == 6
