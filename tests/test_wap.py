"""Write-audit-publish staged commits (a35).

Contracts:
- a staged batch is INVISIBLE to read()/version() until published;
  read_staged() sees exactly the batch (the audit surface);
- publish folds it in as a normal append (one metadata CAS), removes
  the staging record, and the change feed reports plain inserts at the
  publish version;
- discard reclaims the staged data dirs without trace;
- vacuum during a pending audit protects staged dirs;
- publish rebases across intervening appends; a schema change since
  staging conflicts;
- publish is exactly-once under a commit token.
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


def test_staged_invisible_until_publish(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    sid = t.stage_append(_df(spark, [(2, "b", 1), (3, "c", 0)]))
    assert t.version() == 1
    assert _snap(t.read(spark)) == [(1, "a", 0)]  # invisible
    assert _snap(t.read_staged(spark, sid)) == [(2, "b", 1), (3, "c", 0)]
    v = t.publish_staged(sid)
    assert v == 2
    assert _snap(t.read(spark)) == [(1, "a", 0), (2, "b", 1), (3, "c", 0)]
    assert not os.path.isfile(t._staged_path(sid))
    # the published commit is a plain append in the change feed
    ch = sorted(
        (r.k, r._change_type, r._commit_version)
        for r in t.read_changes(spark, 1, 2).collect()
    )
    assert ch == [(2, "insert", 2), (3, "insert", 2)]


def test_discard_reclaims_without_trace(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    before = set(os.listdir(os.path.join(t.root, "data")))
    sid = t.stage_append(_df(spark, [(9, "bad", 1)]))
    t.discard_staged(sid)
    assert set(os.listdir(os.path.join(t.root, "data"))) == before
    assert t.version() == 1
    with pytest.raises(ValueError, match="published or discarded"):
        t.read_staged(spark, sid)


def test_vacuum_protects_pending_staged_dirs(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    t.merge(_df(spark, [(1, "a2", 0)]), key_cols=["k"], partition_col="b")
    sid = t.stage_append(_df(spark, [(2, "b", 1)]))
    t.vacuum(keep_last=1)  # drops v1's superseded dirs...
    assert _snap(t.read_staged(spark, sid)) == [(2, "b", 1)]  # ...not staged
    t.publish_staged(sid)
    assert _snap(t.read(spark)) == [(1, "a2", 0), (2, "b", 1)]


def test_publish_rebases_across_append_and_conflicts_on_schema(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    sid = t.stage_append(_df(spark, [(2, "b", 1)]))
    t.append(_df(spark, [(3, "c", 0)]))  # lands during the audit
    t.publish_staged(sid)
    assert _snap(t.read(spark)) == [(1, "a", 0), (2, "b", 1), (3, "c", 0)]

    sid2 = t.stage_append(_df(spark, [(4, "d", 0)]))
    t.merge(  # schema evolves during the audit
        _df(spark, [(1, "a", 0)]).withColumn("extra", F.lit(1)),
        key_cols=["k"],
        partition_col="b",
        allow_schema_evolution=True,
    )
    with pytest.raises(CommitConflict, match="staged"):
        t.publish_staged(sid2)
    t.discard_staged(sid2)


def test_publish_token_exactly_once(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    sid = t.stage_append(_df(spark, [(2, "b", 1)]))
    v = t.publish_staged(sid, commit_token="wap:1")
    # a retry that somehow still holds the id: token short-circuits
    sid2 = t.stage_append(_df(spark, [(2, "b", 1)]))
    assert t.publish_staged(sid2, commit_token="wap:1") == v
    assert t.version() == v
    assert _snap(t.read(spark)) == [(1, "a", 0), (2, "b", 1)]


def test_replayed_publish_reclaims_redundant_staged_dirs(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    sid = t.stage_append(_df(spark, [(2, "b", 1)]))
    t.publish_staged(sid, commit_token="wap:1")
    n_live = len(os.listdir(os.path.join(t.root, "data")))
    sid2 = t.stage_append(_df(spark, [(2, "b", 1)]))  # the replay's copy
    t.publish_staged(sid2, commit_token="wap:1")  # no-op publish
    assert len(os.listdir(os.path.join(t.root, "data"))) == n_live


def test_discard_after_crashed_publish_keeps_live_data(spark, tmp_path):
    """publish_staged swaps the pointer, THEN removes the staging
    record; a crash between the two orphans the record while its dirs
    are live table data. A later discard_staged must drop only the
    record — never the dirs (the r9 ADVICE data-loss window)."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    sid = t.stage_append(_df(spark, [(2, "b", 1)]))
    with open(t._staged_path(sid)) as fh:
        rec = fh.read()
    t.publish_staged(sid)
    # simulate the crash window: the staging record survived the publish
    with open(t._staged_path(sid), "w") as fh:
        fh.write(rec)
    t.discard_staged(sid)
    assert not os.path.isfile(t._staged_path(sid))
    assert _snap(t.read(spark)) == [(1, "a", 0), (2, "b", 1)]


def test_replayed_publish_after_crash_keeps_live_data(spark, tmp_path):
    """Same crash window, token-replay path: a retried publish of the
    ORIGINAL staged id must not reclaim the now-live dirs."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    sid = t.stage_append(_df(spark, [(2, "b", 1)]))
    with open(t._staged_path(sid)) as fh:
        rec = fh.read()
    v = t.publish_staged(sid, commit_token="wap:crash")
    with open(t._staged_path(sid), "w") as fh:
        fh.write(rec)
    assert t.publish_staged(sid, commit_token="wap:crash") == v
    assert not os.path.isfile(t._staged_path(sid))
    assert _snap(t.read(spark)) == [(1, "a", 0), (2, "b", 1)]
