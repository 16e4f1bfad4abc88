"""VersionedTable.evolve_partitioning — Iceberg-style partition-spec
evolution (a37).

Contracts:
- evolution is METADATA-ONLY: no data file moves; existing dirs become
  the legacy set, new commits lay data out under the new column;
- reads (full, partition-pruned, time-travel) stay exact on mixed-spec
  tables: legacy dirs scan with a row-level partition filter;
- merge after evolve rewrites only touched CURRENT-spec partitions and
  suppresses replaced/deleted keys' legacy copies with O(churn)
  tombstones — legacy files are never rewritten;
- delete_keys after evolve kills keys living in legacy dirs;
- a later merge folding a touched partition's tombstones cannot
  resurrect legacy rows (the __legacy__ bucket never folds);
- a FULL compact migrates everything under the current spec and clears
  the legacy set + tombstones; a partial compact defragments without
  duplicating legacy rows;
- OCC: appends/merges whose base predates a concurrent evolution
  conflict; evolve validates the new column;
- vacuum never reclaims live legacy dirs; after migration it does;
- the change feed is exact across evolution (evolve = zero logical
  rows; post-evolve merges emit legacy pre-images).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from scopus_spark.operators.manifest import CommitConflict, VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, b long, g long")


def _row(k, v):
    return (k, v, k % 2, k % 3)


def _snap(df):
    return sorted((r.k, r.v, r.b, r.g) for r in df.collect())


def _data_files(root):
    out = set()
    for dirpath, _, files in os.walk(os.path.join(root, "data")):
        out.update(
            os.path.join(dirpath, f)
            for f in files
            if f.endswith(".parquet")
        )
    return out


BASE = [_row(k, f"v{k}") for k in range(1, 7)]


def _evolved(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, BASE), "b")  # v1 under spec b
    t.evolve_partitioning("g")  # v2: spec g
    return t


def test_evolve_is_metadata_only_and_reads_stay_exact(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, BASE), "b")
    before = _data_files(t.root)
    v = t.evolve_partitioning("g")
    assert v == 2
    assert _data_files(t.root) == before  # not a byte moved
    assert t.partition_col() == "g"
    assert _snap(t.read(spark)) == sorted(BASE)
    assert _snap(t.read(spark, at_version=1)) == sorted(BASE)
    # new data lands under the new spec; both read together
    t.append(_df(spark, [_row(10, "ten")]))
    assert _snap(t.read(spark)) == sorted(BASE + [_row(10, "ten")])
    # pruned read under the NEW spec: legacy rows row-filter correctly
    assert _snap(t.read(spark, partition_values=[1])) == sorted(
        r for r in BASE + [_row(10, "ten")] if r[3] == 1
    )


def test_evolve_validates(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, BASE), "b")
    with pytest.raises(ValueError, match="not in the table schema"):
        t.evolve_partitioning("nope")
    with pytest.raises(ValueError, match="already partitioned"):
        t.evolve_partitioning("b")


def test_merge_after_evolve_never_rewrites_legacy(spark, tmp_path):
    t = _evolved(spark, tmp_path)
    legacy_files = _data_files(t.root)
    t.merge(  # update k=2 (legacy copy!), insert k=9, delete k=3
        _df(spark, [_row(2, "two2"), _row(9, "nine")]),
        key_cols=["k"],
        partition_col="g",
        deletes=_df(spark, [_row(3, "v3")]).select("k", "g"),
    )
    assert legacy_files <= _data_files(t.root)  # legacy untouched
    want = sorted(
        [_row(2, "two2"), _row(9, "nine")]
        + [r for r in BASE if r[0] not in (2, 3)]
    )
    assert _snap(t.read(spark)) == want
    # partition-pruned reads agree
    got = sorted(
        x
        for pv in (0, 1, 2)
        for x in _snap(t.read(spark, partition_values=[pv]))
    )
    assert got == want
    # time travel to the pre-merge snapshot still exact
    assert _snap(t.read(spark, at_version=2)) == sorted(BASE)


def test_merge_requires_current_partition_col(spark, tmp_path):
    t = _evolved(spark, tmp_path)
    with pytest.raises(ValueError, match="current partition column"):
        t.merge(
            _df(spark, [_row(2, "x")]), key_cols=["k"], partition_col="b"
        )


def test_delete_keys_after_evolve_kills_legacy_rows(spark, tmp_path):
    t = _evolved(spark, tmp_path)
    t.delete_keys(
        spark.createDataFrame([(2, 2 % 3), (5, 5 % 3)], "k long, g long"),
        key_cols=["k"],
    )
    assert _snap(t.read(spark)) == sorted(
        r for r in BASE if r[0] not in (2, 5)
    )
    assert _snap(t.read(spark, partition_values=[2 % 3])) == sorted(
        r for r in BASE if r[0] not in (2, 5) and r[3] == 2 % 3
    )


def test_later_merge_fold_does_not_resurrect_legacy(spark, tmp_path):
    """delete_keys then a merge touching the same NEW-spec partition:
    folding that partition's tombstone entries must not resurrect the
    legacy copies (they stay covered via the __legacy__ bucket)."""
    t = _evolved(spark, tmp_path)
    # k=1 and k=4 share g=1; delete k=1 (tombstone on legacy dirs)
    t.delete_keys(
        spark.createDataFrame([(1, 1)], "k long, g long"), key_cols=["k"]
    )
    # merge touches partition g=1 (update k=4) — folds g=1's entries
    t.merge(
        _df(spark, [_row(4, "four2")]), key_cols=["k"], partition_col="g"
    )
    got = _snap(t.read(spark))
    assert _row(1, "v1") not in got  # still deleted
    assert _row(4, "four2") in got
    assert got == sorted(
        [_row(4, "four2")] + [r for r in BASE if r[0] not in (1, 4)]
    )


def test_full_compact_migrates_partial_defragments(spark, tmp_path):
    t = _evolved(spark, tmp_path)
    t.merge(
        _df(spark, [_row(2, "two2"), _row(9, "nine")]),
        key_cols=["k"],
        partition_col="g",
        deletes=_df(spark, [_row(3, "v3")]).select("k", "g"),
    )
    want = _snap(t.read(spark))
    # partial compact: current-spec defrag only, no duplication
    t.compact(spark, partition_values=[0, 2])
    assert _snap(t.read(spark)) == want
    assert t._read_manifest().get("legacy_dirs")  # legacy still there
    # FULL compact = migration
    t.compact(spark)
    m = t._read_manifest()
    assert m.get("legacy_dirs") == []
    assert m.get("tombstones") in ({}, None)
    assert m.get("legacy_specs") == ["b"]  # history retained
    assert _snap(t.read(spark)) == want
    # vacuum now reclaims the retired dirs; reads stay exact
    t.vacuum(keep_last=1)
    assert _snap(t.read(spark)) == want


def test_vacuum_protects_live_legacy_dirs(spark, tmp_path):
    t = _evolved(spark, tmp_path)
    t.merge(
        _df(spark, [_row(2, "two2")]), key_cols=["k"], partition_col="g"
    )
    t.vacuum(keep_last=1)
    assert _snap(t.read(spark)) == sorted(
        [_row(2, "two2")] + [r for r in BASE if r[0] != 2]
    )


def test_occ_append_and_merge_conflict_with_racing_evolve(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, BASE), "b")

    orig = t._write_commit_data
    fired = {"n": 0}

    def _wcd(*a, **kw):
        if fired["n"] == 0:
            fired["n"] = 1
            VersionedTable(t.root).evolve_partitioning("g")
        return orig(*a, **kw)

    t._write_commit_data = _wcd
    with pytest.raises(CommitConflict, match="evolved"):
        t.append(_df(spark, [_row(20, "x")]))
    t._write_commit_data = orig

    t2 = VersionedTable(str(tmp_path / "t2"))
    t2.write_initial(_df(spark, BASE), "b")
    orig2 = t2._write_commit_data
    fired2 = {"n": 0}

    def _wcd2(*a, **kw):
        if fired2["n"] == 0:
            fired2["n"] = 1
            VersionedTable(t2.root).evolve_partitioning("g")
        return orig2(*a, **kw)

    t2._write_commit_data = _wcd2
    with pytest.raises(CommitConflict, match="evolved"):
        t2.merge(
            _df(spark, [_row(2, "x")]), key_cols=["k"], partition_col="b"
        )
    t2._write_commit_data = orig2


def test_change_feed_exact_across_evolution(spark, tmp_path):
    t = _evolved(spark, tmp_path)  # v1 create, v2 evolve
    t.merge(  # v3: update k=2, insert k=9, delete k=3
        _df(spark, [_row(2, "two2"), _row(9, "nine")]),
        key_cols=["k"],
        partition_col="g",
        deletes=_df(spark, [_row(3, "v3")]).select("k", "g"),
    )
    ch = sorted(
        (r._commit_version, r._change_type, r.k, r.v)
        for r in t.read_changes(spark, 1).collect()
    )
    assert ch == [
        (3, "delete", 3, "v3"),
        (3, "insert", 9, "nine"),
        (3, "update_postimage", 2, "two2"),
        (3, "update_preimage", 2, "v2"),
    ]
    # replaying the feed onto a replica lands the source state
    from scopus_spark.streaming.table_source import (
        ChangeFeedConsumer,
        replication_sink,
    )

    rep = VersionedTable(str(tmp_path / "rep"))
    con = ChangeFeedConsumer(t, str(tmp_path / "ckpt"))
    con.run_available(
        spark,
        replication_sink(
            rep, key_cols=["k"], partition_col="b", stream_name="pe"
        ),
    )
    assert _snap(rep.read(spark)) == _snap(t.read(spark))


def test_double_evolution_stacks(spark, tmp_path):
    """b -> g -> back to b: two legacy generations coexist; reads stay
    exact and a full compact folds both."""
    t = _evolved(spark, tmp_path)
    t.append(_df(spark, [_row(10, "ten")]))  # lands under g
    t.evolve_partitioning("b")  # v4: back to b; g-dirs become legacy too
    t.append(_df(spark, [_row(11, "eleven")]))  # lands under b
    want = sorted(BASE + [_row(10, "ten"), _row(11, "eleven")])
    assert _snap(t.read(spark)) == want
    assert t._read_manifest()["legacy_specs"] == ["b", "g"]
    assert _snap(t.read(spark, partition_values=[0])) == sorted(
        r for r in want if r[2] == 0
    )
    t.compact(spark)
    assert t._read_manifest().get("legacy_dirs") == []
    assert _snap(t.read(spark)) == want
