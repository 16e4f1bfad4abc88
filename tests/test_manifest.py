"""operators/manifest.VersionedTable — snapshot-isolated commits
(VERDICT r6 item 6). Contracts: atomic pointer-swap commits, readers pin
exactly one snapshot even while a writer commits the next, MERGE
semantics equal the upsert tier (replace/insert/delete-wins), vacuum
never touches retained snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from scopus_spark.operators.manifest import VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, b long")


def _snap(df):
    return sorted((r.k, r.v, r.b) for r in df.collect())


def test_initial_write_and_read(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    assert not t.exists() and t.version() == 0
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    assert t.exists() and t.version() == 1
    assert _snap(t.read(spark)) == [(1, "a", 0), (2, "b", 1)]
    # manifest-pruned partition read
    assert _snap(t.read(spark, partition_values=[1])) == [(2, "b", 1)]


def test_merge_replace_insert_delete_wins(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1), (3, "c", 0)]), "b")
    deletes = spark.createDataFrame([(3, 0)], "k long, b long")
    # k=1 replaced, k=4 inserted, k=3 deleted, k=5 in BOTH delta and
    # deletes -> delete wins
    v = t.merge(
        _df(spark, [(1, "A", 0), (4, "d", 1), (5, "e", 0)]),
        key_cols=["k"],
        partition_col="b",
        deletes=deletes.unionByName(
            spark.createDataFrame([(5, 0)], "k long, b long")
        ),
    )
    assert v == 2 and t.version() == 2
    assert _snap(t.read(spark)) == [(1, "A", 0), (2, "b", 1), (4, "d", 1)]


def test_concurrent_reader_pins_snapshot(spark, tmp_path):
    """THE snapshot-isolation contract: a reader that resolved version N
    keeps seeing exactly N's rows while (and after) the writer commits
    N+1 — never a partition twice, never a missing one."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    pinned = t.read(spark)  # reader resolves the pointer HERE
    want_v1 = _snap(pinned)
    t.merge(
        _df(spark, [(1, "CHANGED", 0), (9, "new", 1)]),
        key_cols=["k"],
        partition_col="b",
    )
    # iterate the pinned frame AFTER the commit landed
    assert _snap(pinned) == want_v1 == [(1, "a", 0), (2, "b", 1)]
    # a fresh resolve sees version 2
    assert _snap(t.read(spark)) == [(1, "CHANGED", 0), (2, "b", 1), (9, "new", 1)]


def test_partition_emptied_by_deletes_leaves_snapshot(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    t.merge(
        spark.createDataFrame([], "k long, v string, b long"),
        key_cols=["k"],
        partition_col="b",
        deletes=spark.createDataFrame([(1, 0)], "k long, b long"),
    )
    assert _snap(t.read(spark)) == [(2, "b", 1)]
    assert _snap(t.read(spark, partition_values=[0])) == []


def test_vacuum_keeps_retained_snapshots_working(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    t.merge(_df(spark, [(1, "v2", 0)]), key_cols=["k"], partition_col="b")
    t.merge(_df(spark, [(1, "v3", 0)]), key_cols=["k"], partition_col="b")
    removed = t.vacuum(keep_last=1)
    assert removed, "old commit dirs must actually be reclaimed"
    assert _snap(t.read(spark)) == [(1, "v3", 0)]
    assert t.version() == 3


def test_merge_creates_table_when_missing(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    v = t.merge(_df(spark, [(1, "a", 0)]), key_cols=["k"], partition_col="b")
    assert v == 1
    assert _snap(t.read(spark)) == [(1, "a", 0)]


def test_time_travel_reads_any_retained_version(spark, tmp_path):
    import pytest

    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "v1", 0)]), "b")
    t.merge(_df(spark, [(1, "v2", 0), (2, "x", 1)]), key_cols=["k"], partition_col="b")
    assert _snap(t.read(spark, at_version=1)) == [(1, "v1", 0)]
    assert _snap(t.read(spark, at_version=2)) == [(1, "v2", 0), (2, "x", 1)]
    assert _snap(t.read(spark)) == _snap(t.read(spark, at_version=2))
    with pytest.raises(ValueError, match="does not exist"):
        t.read(spark, at_version=9)
    # vacuumed versions are gone and say so
    t.vacuum(keep_last=1)
    with pytest.raises(ValueError, match="vacuumed|does not exist"):
        t.read(spark, at_version=1)


def test_commit_token_makes_merge_exactly_once(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    d = _df(spark, [(2, "b", 1)])
    v1 = t.merge(d, key_cols=["k"], partition_col="b", commit_token="s:7")
    # replay of the same batch: no-op, same version, no duplicate rows
    v2 = t.merge(d, key_cols=["k"], partition_col="b", commit_token="s:7")
    assert v1 == v2 == t.version()
    assert _snap(t.read(spark)) == [(1, "a", 0), (2, "b", 1)]
    # a NEW token applies normally
    v3 = t.merge(
        _df(spark, [(3, "c", 0)]), key_cols=["k"], partition_col="b",
        commit_token="s:8",
    )
    assert v3 == v1 + 1


def test_versioned_streaming_sink_replay_is_noop(spark, tmp_path):
    from scopus_spark.streaming.sinks import foreach_batch_versioned_upsert

    target = str(tmp_path / "t")
    sink = foreach_batch_versioned_upsert(
        target, key_cols=["k"], partition_col="b", order_col="seq",
        stream_name="s1",
    )
    batch = spark.createDataFrame(
        [(1, "x", 0, 1), (1, "y", 0, 2), (2, "z", 1, 1)],
        "k long, v string, b long, seq long",
    )
    sink(batch, 0)
    v_after = VersionedTable(target).version()
    sink(batch, 0)  # foreachBatch retry
    t = VersionedTable(target)
    assert t.version() == v_after
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert got == [(1, "y"), (2, "z")]  # latest-per-key collapse held


def test_compact_consolidates_fragmented_partitions(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    # fragmentation staged deliberately: r10 commits cluster rows by
    # dir unless the caller opts out, so a fragmented dir now needs
    # cluster=False (the layout-deliberate escape hatch)
    wide = spark.createDataFrame(
        [(i, f"v{i}", i % 2) for i in range(40)], "k long, v string, b long"
    ).repartition(8)
    t.write_initial(wide, "b", cluster=False)
    before = t._read_manifest()["partitions"]
    assert t._n_files(before["0"]) > 1
    want = _snap(t.read(spark))
    v = t.compact(spark)
    after = t._read_manifest()["partitions"]
    assert v == t.version() == 2
    assert t._n_files(after["0"]) == 1 and t._n_files(after["1"]) == 1
    assert _snap(t.read(spark)) == want  # content preserved exactly
    assert t.vacuum(keep_last=1)  # fragments reclaimable
    assert _snap(t.read(spark)) == want
    # already-compact table: compact is a no-op commit-wise
    assert t.compact(spark) == t.version()


def test_schema_evolution_adds_nullable_column(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    delta = spark.createDataFrame(
        [(3, "c", 0, 99)], "k long, v string, b long, extra long"
    )
    t.merge(delta, key_cols=["k"], partition_col="b",
            allow_schema_evolution=True)
    rows = {r.k: r.extra for r in t.read(spark).collect()}
    # pre-evolution rows surface NULL for the added column
    assert rows == {1: None, 2: None, 3: 99}
    # a reader pinned BEFORE the evolution keeps the old schema
    assert "extra" not in t.read(spark, at_version=1).columns


def test_schema_evolution_refuses_type_change(spark, tmp_path):
    import pytest

    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    bad = spark.createDataFrame([(2, 7, 0)], "k long, v long, b long")
    with pytest.raises(ValueError, match="cannot change column 'v'"):
        t.merge(bad, key_cols=["k"], partition_col="b",
                allow_schema_evolution=True)


def test_append_concatenates_without_rewrite(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    dirs_before = set(t.data_dirs())
    t.append(_df(spark, [(2, "b", 0), (3, "c", 1)]))
    dirs_after = set(t.data_dirs())
    # append never rewrites: every old dir survives verbatim
    assert dirs_before <= dirs_after
    assert _snap(t.read(spark)) == [(1, "a", 0), (2, "b", 0), (3, "c", 1)]
    # exactly-once token: a replayed append is a no-op
    v = t.append(_df(spark, [(9, "z", 0)]), commit_token="batch-1")
    assert t.append(_df(spark, [(9, "z", 0)]), commit_token="batch-1") == v
    assert [r.k for r in t.read(spark).collect()].count(9) == 1


def test_stats_pruning_skips_disjoint_dirs_keeps_statless(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(
        _df(spark, [(1, "a", 0), (2, "b", 0)]), "b", stats_cols=["k"]
    )
    t.append(_df(spark, [(100, "c", 0), (101, "d", 0)]))
    all_dirs = t.data_dirs()
    pruned = t.data_dirs(prune=("k", 90, 200))
    assert len(pruned) < len(all_dirs)
    # rows are still exact after the residual filter
    got = t.read(spark, prune=("k", 90, 200)).filter(
        F.col("k").between(90, 200)
    )
    assert sorted(r.k for r in got.collect()) == [100, 101]
    # a dir without stats for the column must never be skipped
    assert t.data_dirs(prune=("nope", 0, 1)) == all_dirs


def test_compact_preserves_stats_pruning(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(
        _df(spark, [(1, "a", 0), (2, "b", 1)]), "b", stats_cols=["k"]
    )
    t.append(_df(spark, [(50, "c", 0)]))
    t.append(_df(spark, [(900, "d", 0)]))
    t.compact(spark)
    # compaction merged partition 0's dirs; stats must cover the new dir
    got = t.read(spark, prune=("k", 800, 1000)).filter(
        F.col("k").between(800, 1000)
    )
    assert [r.k for r in got.collect()] == [900]
    # partition 1 (k=2 only, stats [2,2]) prunes away entirely
    assert all(
        "__part=1" not in d for d in t.data_dirs(prune=("k", 800, 1000))
    )


def test_write_initial_token_seeds_replay_window(spark, tmp_path):
    """A streaming retry of the CREATE batch must be a no-op: the token
    recorded at write_initial is recognized by the append that replays
    the same batch."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(
        _df(spark, [(1, "a", 0)]), "b", commit_token="s:0"
    )
    v = t.version()
    assert t.append(_df(spark, [(1, "a", 0)]), commit_token="s:0") == v
    assert [r.k for r in t.read(spark).collect()] == [1]


def test_append_is_schema_strict(spark, tmp_path):
    import pytest

    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    bad = spark.createDataFrame([(2, 0)], "k long, b long")  # missing v
    with pytest.raises(ValueError, match="schema-strict"):
        t.append(bad)


def test_repeated_partition_values_scan_once(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    got = _snap(t.read(spark, partition_values=[1, 1, 1]))
    assert got == [(2, "b", 1)]  # not tripled
    assert t.data_dirs(partition_values=[1, 1]) == t.data_dirs(
        partition_values=[1]
    )
