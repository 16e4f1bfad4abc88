"""apply_changes_to_table / replication_sink (a33): exactly-once CDC
table-to-table replication over the change feed.

Contracts:
- a source history of create -> merge(+deletes) -> deletion-vector
  delete replicates to an identical end state;
- commits apply in source order within one batch;
- a REPLAYED batch (the consumer's at-least-once window: sink ran but
  the marker write was lost) re-applies as manifest no-ops — the
  replica's version does not advance and rows do not double;
- the source's deletion-vector commit applies as replica delete_keys
  (merge-on-read), mirroring the op kind, not just the rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scopus_spark.operators.manifest import VersionedTable
from scopus_spark.streaming.table_source import (
    ChangeFeedConsumer,
    replication_sink,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, b long")


def _snap(df):
    return sorted((r.k, r.v, r.b) for r in df.collect())


def _setup(spark, tmp_path):
    src = VersionedTable(str(tmp_path / "src"))
    src.write_initial(
        _df(spark, [(1, "a", 1), (2, "b", 0), (3, "c", 1), (4, "d", 0)]),
        "b",
    )
    src.merge(  # v2: update 1, insert 5, delete 2
        _df(spark, [(1, "a2", 1), (5, "e", 1)]),
        key_cols=["k"],
        partition_col="b",
        deletes=_df(spark, [(2, "b", 0)]).select("k", "b"),
    )
    src.delete_keys(  # v3: deletion-vector commit
        spark.createDataFrame([(3, 1)], "k long, b long"), key_cols=["k"]
    )
    rep = VersionedTable(str(tmp_path / "rep"))
    con = ChangeFeedConsumer(src, str(tmp_path / "ckpt"))
    sink = replication_sink(
        rep, key_cols=["k"], partition_col="b", stream_name="t"
    )
    return src, rep, con, sink


def test_full_history_replicates_to_identical_state(spark, tmp_path):
    src, rep, con, sink = _setup(spark, tmp_path)
    con.run_available(spark, sink)  # one batch spanning v1..v3
    assert _snap(rep.read(spark)) == _snap(src.read(spark))
    assert _snap(rep.read(spark)) == [(1, "a2", 1), (4, "d", 0), (5, "e", 1)]
    # the source's DV commit applied as a replica DV commit (op parity)
    ops = [rep.commit_info(v)["op"] for v in range(1, rep.version() + 1)]
    assert ops[-1] == "delete"


def test_replayed_batch_is_noop(spark, tmp_path):
    src, rep, con, sink = _setup(spark, tmp_path)
    got = con.poll(spark)
    df, from_v, to_v = got
    sink(df, from_v, to_v)  # sink succeeded...
    v_after = rep.version()
    state = _snap(rep.read(spark))
    # ...but the marker write was lost: the next trigger REPLAYS v1..v3
    assert con.consumed_version() == 0
    con.run_available(spark, sink)
    assert rep.version() == v_after  # all three commits no-op'd by token
    assert _snap(rep.read(spark)) == state
    assert con.consumed_version() == to_v


def test_incremental_second_pass_applies_only_new_commits(spark, tmp_path):
    src, rep, con, sink = _setup(spark, tmp_path)
    con.run_available(spark, sink)
    v_mid = rep.version()
    src.merge(_df(spark, [(6, "f", 0)]), key_cols=["k"], partition_col="b")
    con.run_available(spark, sink)
    assert rep.version() == v_mid + 1  # exactly one new replica commit
    assert _snap(rep.read(spark)) == _snap(src.read(spark))


def test_backfill_coalesces_same_op_runs(spark, tmp_path):
    """A far-behind replica catching up across an 18-commit mixed
    backfill applies ONE replica commit per same-op run (5 runs here),
    never O(commits) — and still lands the exact source state,
    exactly-once under replay (the r9 verdict's apply-loop fix).

    r11 (verify-window budget): the history was 50 commits; coalescing
    is per same-op RUN and run-length-independent, so 4-commit runs
    exercise exactly the same property (every run still > 1 commit) at
    a third of the staging cost (~125 s -> ~45 s of suite time)."""
    src = VersionedTable(str(tmp_path / "src"))
    src.write_initial(
        _df(spark, [(k, f"v{k}", k % 2) for k in range(20)]), "b"
    )  # v1
    for i in range(4):  # v2..v5: merge run (updates + inserts)
        k = i % 20
        src.merge(
            _df(spark, [(k, f"u{i}", k % 2), (50 + i, "new", i % 2)]),
            key_cols=["k"],
            partition_col="b",
        )
    for k in (0, 1, 2):  # v6..v8: delete-only run
        src.delete_keys(
            spark.createDataFrame([(k, k % 2)], "k long, b long"),
            key_cols=["k"],
        )
    for i in range(4):  # v9..v12: merge run
        src.merge(
            _df(spark, [(100 + i, "x", i % 2)]),
            key_cols=["k"],
            partition_col="b",
        )
    for k in (3, 4):  # v13..v14: delete-only run
        src.delete_keys(
            spark.createDataFrame([(k, k % 2)], "k long, b long"),
            key_cols=["k"],
        )
    for i in range(4):  # v15..v18: merge run (re-insert a deleted key too)
        src.merge(
            _df(spark, [(3, f"back{i}", 1), (200 + i, "y", i % 2)]),
            key_cols=["k"],
            partition_col="b",
        )
    assert src.version() == 18

    rep = VersionedTable(str(tmp_path / "rep"))
    con = ChangeFeedConsumer(src, str(tmp_path / "ckpt"))
    sink = replication_sink(
        rep, key_cols=["k"], partition_col="b", stream_name="bf"
    )
    con.run_available(spark, sink)  # one batch spanning all 50 commits
    # 5 same-op runs -> exactly 5 replica commits
    assert rep.version() == 5
    ops = [rep.commit_info(v)["op"] for v in range(1, 6)]
    assert ops == ["create", "delete", "merge", "delete", "merge"]
    assert _snap(rep.read(spark)) == _snap(src.read(spark))

    # replay the whole window: tokens make every run a no-op
    state = _snap(rep.read(spark))
    con2 = ChangeFeedConsumer(src, str(tmp_path / "ckpt2"))
    con2.run_available(spark, sink)
    assert rep.version() == 5
    assert _snap(rep.read(spark)) == state
