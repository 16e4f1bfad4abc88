"""Named branches over VersionedTable (a38) — multi-commit
write-audit-publish.

Contracts:
- create_branch is metadata-only; branch commits (append/merge/delete/
  compact) are INVISIBLE to main until merge_branch;
- a branch is a full table: read / time travel / change feed work;
- merge_branch publishes the branch's partition state in ONE atomic
  commit, and the merged state equals the same commits applied to main
  directly;
- OCC: a main commit since the base touching a branch-touched partition
  conflicts; disjoint main commits compose; schema evolution composes
  additively;
- tombstones created on the branch carry into main (merge-on-read);
- drop_branch reclaims branch-only data dirs, never main's (incl. dirs
  a merge_branch just made live);
- vacuum on main never reclaims dirs a live branch references;
  retention/ref ops refuse to run on a branch ref.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from scopus_spark.operators.manifest import CommitConflict, VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, b long")


def _snap(df):
    return sorted((r.k, r.v, r.b) for r in df.collect())


BASE = [(1, "a", 1), (2, "b", 0), (3, "c", 1), (4, "d", 0)]


def _table(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, BASE), "b")
    return t


def test_branch_commits_invisible_until_merge(spark, tmp_path):
    t = _table(spark, tmp_path)
    br = t.create_branch("audit")
    br.append(_df(spark, [(9, "nine", 1)]))
    br.merge(
        _df(spark, [(2, "b2", 0)]), key_cols=["k"], partition_col="b"
    )
    # main untouched; branch reads its own state
    assert t.version() == 1
    assert _snap(t.read(spark)) == sorted(BASE)
    assert _snap(br.read(spark)) == sorted(
        [(1, "a", 1), (2, "b2", 0), (3, "c", 1), (4, "d", 0), (9, "nine", 1)]
    )
    v = t.merge_branch("audit")
    assert v == 2  # ONE main commit for two branch commits
    assert _snap(t.read(spark)) == _snap(br.read(spark))
    assert t.commit_info(2)["op"] == "branch_merge"


def test_branch_merge_equals_direct_application(spark, tmp_path):
    """The a38 contract: branch-merged state ≡ the same commits applied
    to main directly."""
    t = _table(spark, tmp_path)
    br = t.create_branch("b1")
    br.append(_df(spark, [(10, "x", 0)]))
    br.delete_keys(
        spark.createDataFrame([(3, 1)], "k long, b long"), key_cols=["k"]
    )
    br.merge(
        _df(spark, [(1, "a2", 1), (11, "y", 1)]),
        key_cols=["k"],
        partition_col="b",
    )
    t.merge_branch("b1", drop=True)

    direct = VersionedTable(str(tmp_path / "direct"))
    direct.write_initial(_df(spark, BASE), "b")
    direct.append(_df(spark, [(10, "x", 0)]))
    direct.delete_keys(
        spark.createDataFrame([(3, 1)], "k long, b long"), key_cols=["k"]
    )
    direct.merge(
        _df(spark, [(1, "a2", 1), (11, "y", 1)]),
        key_cols=["k"],
        partition_col="b",
    )
    assert _snap(t.read(spark)) == _snap(direct.read(spark))
    assert t.list_branches() == []  # dropped


def test_branch_tombstones_carry_to_main(spark, tmp_path):
    t = _table(spark, tmp_path)
    br = t.create_branch("del")
    br.delete_keys(
        spark.createDataFrame([(2, 0)], "k long, b long"), key_cols=["k"]
    )
    t.merge_branch("del")
    assert _snap(t.read(spark)) == sorted(
        r for r in BASE if r[0] != 2
    )
    # merge-on-read: main can keep deleting with the same keys
    t.delete_keys(
        spark.createDataFrame([(4, 0)], "k long, b long"), key_cols=["k"]
    )
    assert _snap(t.read(spark)) == sorted(
        r for r in BASE if r[0] not in (2, 4)
    )


def test_disjoint_main_commits_compose_conflicting_ones_raise(
    spark, tmp_path
):
    t = _table(spark, tmp_path)
    br = t.create_branch("feat")
    br.merge(
        _df(spark, [(1, "branch", 1)]), key_cols=["k"], partition_col="b"
    )
    # main advances on the OTHER partition: composes
    t.merge(
        _df(spark, [(2, "main", 0)]), key_cols=["k"], partition_col="b"
    )
    t.merge_branch("feat")
    got = _snap(t.read(spark))
    assert (1, "branch", 1) in got and (2, "main", 0) in got

    br2 = t.create_branch("feat2")
    br2.merge(
        _df(spark, [(1, "b2", 1)]), key_cols=["k"], partition_col="b"
    )
    t.merge(  # main touches the SAME partition after the base
        _df(spark, [(3, "m2", 1)]), key_cols=["k"], partition_col="b"
    )
    with pytest.raises(CommitConflict, match="re-branch"):
        t.merge_branch("feat2")
    t.drop_branch("feat2")


def test_additive_schema_evolution_composes_across_merge(spark, tmp_path):
    t = _table(spark, tmp_path)
    br = t.create_branch("schema")
    br.merge(
        _df(spark, [(5, "e", 1)]).withColumn("extra", F.lit(7)),
        key_cols=["k"],
        partition_col="b",
        allow_schema_evolution=True,
    )
    t.merge(  # disjoint partition on main, old schema
        _df(spark, [(6, "f", 0)]), key_cols=["k"], partition_col="b"
    )
    t.merge_branch("schema")
    rows = sorted(
        (r.k, r.v, r.b, r.extra) for r in t.read(spark).collect()
    )
    assert (5, "e", 1, 7) in rows
    assert (6, "f", 0, None) in rows  # main's files NULL-fill


def test_drop_branch_reclaims_only_branch_data(spark, tmp_path):
    t = _table(spark, tmp_path)

    def _commit_ids():
        return set(os.listdir(os.path.join(t.root, "data")))

    before = _commit_ids()
    br = t.create_branch("tmp")
    br.append(_df(spark, [(30, "z", 0)]))
    assert len(_commit_ids()) == len(before) + 1
    reclaimed = t.drop_branch("tmp")
    assert len(reclaimed) == 1
    assert _commit_ids() == before
    assert _snap(t.read(spark)) == sorted(BASE)
    # merged branches keep their dirs (now main's data)
    br2 = t.create_branch("keep")
    br2.append(_df(spark, [(31, "w", 1)]))
    t.merge_branch("keep")
    assert t.drop_branch("keep") == []
    assert (31, "w", 1) in _snap(t.read(spark))


def test_vacuum_protects_branch_dirs_and_refuses_on_branch(spark, tmp_path):
    t = _table(spark, tmp_path)
    br = t.create_branch("live")
    br.merge(
        _df(spark, [(2, "b2", 0)]), key_cols=["k"], partition_col="b"
    )
    # main compacts + vacuums aggressively; the branch must survive
    t.merge(
        _df(spark, [(1, "a2", 1)]), key_cols=["k"], partition_col="b"
    )
    t.vacuum(keep_last=1)
    assert (2, "b2", 0) in _snap(br.read(spark))
    with pytest.raises(ValueError, match="main ref"):
        br.vacuum()
    with pytest.raises(ValueError, match="main ref"):
        br.create_branch("nested")


def test_change_feed_rebaselines_at_branch_merge(spark, tmp_path):
    t = _table(spark, tmp_path)
    br = t.create_branch("cdc")
    br.append(_df(spark, [(40, "q", 0)]))
    t.merge_branch("cdc", drop=True)  # v2
    t.append(_df(spark, [(41, "r", 1)]))  # v3
    with pytest.raises(ValueError, match="branch_merge"):
        t.read_changes(spark, 1).collect()
    # consumers re-baseline AT the merge and stream on
    ch = sorted(
        (r.k, r._change_type, r._commit_version)
        for r in t.read_changes(spark, 2).collect()
    )
    assert ch == [(41, "insert", 3)]


def test_branch_handle_validation(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="no branch"):
        t.branch("ghost")
    t.create_branch("dup")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("dup")
    with pytest.raises(ValueError, match="bad branch name"):
        VersionedTable(t.root, ref="../escape")
