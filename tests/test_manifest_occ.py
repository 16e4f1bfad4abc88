"""VersionedTable optimistic concurrency + change feed (round 8).

Contracts under test:
- two writers appending concurrently both land (no lost update; version
  lineage stays linear, every parent == version-1);
- a merge racing a commit that touched the same partitions raises
  CommitConflict instead of silently discarding it;
- disjoint-partition merges rebase and both survive;
- compact racing an append rebases the appended rows back in;
- read_changes streams the exact logical delta (insert / delete /
  update_pre/postimage) of the commits in range, skips compactions, and
  reads only delta directories;
- merge(allow_schema_evolution=True) refuses a delta missing existing
  columns (the silent-NULL-fill hazard);
- manifest stats survive string partition values that hive inference
  would re-type ('01' -> 1).
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from scopus_spark.operators.manifest import CommitConflict, VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, b long")


def _snap(df):
    return sorted((r.k, r.v, r.b) for r in df.collect())


def test_two_writer_append_race_loses_nothing(spark, tmp_path):
    """Interleaved appends from two threads: both batches visible, one
    linear version chain (the round-7 lost-update hole)."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(0, "base", 0)]), "b")
    errs: list[Exception] = []

    def w(lo: int):
        try:
            for i in range(3):
                VersionedTable(str(tmp_path / "t")).append(
                    _df(spark, [(lo + i, f"w{lo}", (lo + i) % 2)])
                )
        except Exception as e:  # pragma: no cover - surfaced by assert
            errs.append(e)

    t1, t2 = threading.Thread(target=w, args=(10,)), threading.Thread(
        target=w, args=(20,)
    )
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    assert t.version() == 7  # 1 create + 6 appends, none lost
    got = {r.k for r in t.read(spark).collect()}
    assert got == {0, 10, 11, 12, 20, 21, 22}
    # lineage is linear: every manifest's parent is version-1
    for v in range(2, 8):
        assert t._read_manifest(v)["parent"] == v - 1


def test_merge_conflict_on_overlapping_partitions(spark, tmp_path):
    """A merge based on v1 must refuse to commit after another merge
    touched the same partition."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    m1 = t._read_manifest()
    # simulate: our merge pre-reads v1 now; a rival lands first
    t.merge(_df(spark, [(1, "rival", 0)]), key_cols=["k"], partition_col="b")
    assert t.version() == 2
    # our merge also rewrites partition 0 -> stale rewrite -> conflict
    with pytest.raises(CommitConflict):
        # replay the race: monkey-path the base read by using a handle
        # whose _read_manifest was taken at v1 is not possible from the
        # public API, so drive the same code path via version check:
        # merge() re-reads latest itself, so to force the conflict we
        # interleave with a hook below.
        _merge_with_stale_base(t, spark, m1)
    # the rival's update survived
    assert ("rival" in {r.v for r in t.read(spark).collect()})


def _merge_with_stale_base(t, spark, stale_manifest):
    """Drive merge() while forcing its initial manifest read to return a
    stale snapshot — the timing a real race produces."""
    real = t._read_manifest
    calls = {"n": 0}

    def fake(at_version=None):
        if at_version is None and calls["n"] == 0:
            calls["n"] += 1
            return stale_manifest
        return real(at_version)

    t._read_manifest = fake
    try:
        t.merge(
            _df(spark, [(1, "ours", 0)]), key_cols=["k"], partition_col="b"
        )
    finally:
        t._read_manifest = real


def test_merge_rebases_across_disjoint_partitions(spark, tmp_path):
    """Merges touching DISJOINT partitions both land: the second rebases
    onto the first instead of conflicting or overwriting."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    m1 = t._read_manifest()
    t.merge(_df(spark, [(1, "first", 0)]), key_cols=["k"], partition_col="b")

    real = t._read_manifest
    calls = {"n": 0}

    def fake(at_version=None):
        if at_version is None and calls["n"] == 0:
            calls["n"] += 1
            return m1
        return real(at_version)

    t._read_manifest = fake
    try:
        t.merge(
            _df(spark, [(2, "second", 1)]), key_cols=["k"], partition_col="b"
        )
    finally:
        t._read_manifest = real
    assert _snap(t.read(spark)) == [(1, "first", 0), (2, "second", 1)]
    assert t.version() == 3


def test_compact_rebases_concurrent_append(spark, tmp_path):
    """compact() based on v1 commits after an append landed: the
    appended rows must survive the rebase."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(
        _df(spark, [(1, "a", 0), (2, "b", 0)]).repartition(4), "b"
    )
    m1 = t._read_manifest()
    t.append(_df(spark, [(3, "late", 0)]))

    real = t._read_manifest
    calls = {"n": 0}

    def fake(at_version=None):
        if at_version is None and calls["n"] == 0:
            calls["n"] += 1
            return m1
        return real(at_version)

    t._read_manifest = fake
    try:
        t.compact(spark)
    finally:
        t._read_manifest = real
    assert _snap(t.read(spark)) == [(1, "a", 0), (2, "b", 0), (3, "late", 0)]


def test_change_feed_append_and_merge(spark, tmp_path):
    """read_changes emits the logical delta only: inserts from appends,
    insert/delete/update pairs from merges, nothing from compactions."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(
        _df(spark, [(1, "a", 0), (2, "b", 1), (3, "c", 0)]), "b"
    )  # v1
    t.append(_df(spark, [(4, "d", 1)]))  # v2
    t.merge(  # v3: update k=1, insert k=5, delete k=3
        _df(spark, [(1, "A", 0), (5, "e", 0)]),
        key_cols=["k"],
        partition_col="b",
        deletes=spark.createDataFrame([(3, 0)], "k long, b long"),
    )
    t.compact(spark)  # v4: layout only

    ch = t.read_changes(spark, 1, 4)
    got = sorted(
        (r.k, r.v, r._change_type, r._commit_version) for r in ch.collect()
    )
    assert got == [
        (1, "A", "update_postimage", 3),
        (1, "a", "update_preimage", 3),
        (3, "c", "delete", 3),
        (4, "d", "insert", 2),
        (5, "e", "insert", 3),
    ]
    # survivors of the touched partition (none here besides k=1/3/5 in
    # b=0... k=2 untouched partition) never appear
    assert 2 not in {g[0] for g in got}
    # empty range
    assert t.read_changes(spark, 4, 4).count() == 0


def test_change_feed_reads_only_delta_dirs(spark, tmp_path):
    """The feed's scan set is the commits' added+replaced directories —
    a full-corpus directory never enters the plan."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(
        _df(spark, [(i, "x", i % 4) for i in range(40)]), "b"
    )
    t.append(_df(spark, [(100, "new", 0)]))  # touches partition 0 only
    m2 = t._read_manifest(2)
    assert set(m2["added"]) == {"0"}
    # O(delta): the one appended dir, not the 4 base partitions
    n_dirs = sum(len(ds) for ds in m2["added"].values())
    assert n_dirs == 1
    got = [(r.k, r._change_type) for r in t.read_changes(spark, 1).collect()]
    assert got == [(100, "insert")]


def test_schema_evolution_rejects_missing_old_columns(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    bad = spark.createDataFrame([(2, 1, "extra")], "k long, b long, nu string")
    with pytest.raises(ValueError, match="missing existing table columns"):
        t.merge(
            bad, key_cols=["k"], partition_col="b",
            allow_schema_evolution=True,
        )


def test_change_feed_spans_schema_evolution(spark, tmp_path):
    """Pre-images from before an additive evolution surface NULL in the
    evolved column; the feed still aligns on the final schema."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    evolved = spark.createDataFrame(
        [(1, "a2", 0, "tagged")], "k long, v string, b long, tag string"
    )
    t.merge(
        evolved, key_cols=["k"], partition_col="b",
        allow_schema_evolution=True,
    )
    rows = {
        (r._change_type): (r.k, r.v, r.tag)
        for r in t.read_changes(spark, 1).collect()
    }
    assert rows["update_preimage"] == (1, "a", None)
    assert rows["update_postimage"] == (1, "a2", "tagged")


def test_stats_survive_retypeable_string_partition_values(spark, tmp_path):
    """'01' as a string partition value must keep its stats keyed by the
    directory name '01', not inference-re-typed to 1 (ADVICE r7)."""
    t = VersionedTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "01"), (2, "01"), (9, "true")], "k long, p string"
    )
    t.write_initial(df, "p", stats_cols=["k"])
    m = t._read_manifest()
    assert set(m["partitions"]) == {"01", "true"}
    recorded = {
        d: s["k"] for d, s in m["stats"].items()
    }
    # every directory carries stats (nothing silently dropped)
    all_dirs = {d for ds in m["partitions"].values() for d in ds}
    assert set(recorded) == all_dirs
    # and pruning on them actually skips the disjoint directory
    pruned = t.data_dirs(prune=("k", 8, 10))
    assert pruned == m["partitions"]["true"]


def test_write_initial_race_raises(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    with pytest.raises(CommitConflict):
        VersionedTable(str(tmp_path / "t")).write_initial(
            _df(spark, [(2, "b", 0)]), "b"
        )


def test_history_lineage(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    # cluster=False leaves per-task files so compact() below has
    # fragmentation to consolidate (r10: clustered commits make a
    # fresh small table already-compact, and compact() would no-op)
    t.write_initial(
        _df(spark, [(1, "a", 0), (2, "b", 1)]).repartition(4),
        "b",
        cluster=False,
    )
    t.append(_df(spark, [(3, "c", 0)]))
    # merge touches partition 1 only, so partition 0 still holds its
    # create + append dirs (2 files) and compact() has work to do
    t.merge(_df(spark, [(2, "B", 1)]), key_cols=["k"], partition_col="b")
    t.compact(spark)
    h = {r.version: r for r in t.history(spark).collect()}
    assert [h[v].op for v in sorted(h)] == [
        "create", "append", "merge", "compact"
    ]
    assert all(h[v].parent == v - 1 for v in sorted(h))
    t.vacuum(keep_last=2)
    assert sorted(r.version for r in t.history(spark).collect()) == [3, 4]


def test_live_thread_disjoint_merges_both_land(spark, tmp_path):
    """Two REAL threads merging disjoint partitions concurrently: both
    commits land (one rebases), no lost update, content correct."""
    import threading

    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    errs: list[Exception] = []

    def m(k, v, b):
        try:
            VersionedTable(str(tmp_path / "t")).merge(
                _df(spark, [(k, v, b)]), key_cols=["k"], partition_col="b"
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=m, args=(1, "left", 0))
    t2 = threading.Thread(target=m, args=(2, "right", 1))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    assert t.version() == 3
    assert _snap(t.read(spark)) == [(1, "left", 0), (2, "right", 1)]


def test_change_feed_accumulates_across_commits(spark, tmp_path):
    """Two merges + one append: the feed carries each commit's logical
    delta tagged with its version."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    t.merge(_df(spark, [(1, "a2", 0)]), key_cols=["k"], partition_col="b")
    t.append(_df(spark, [(3, "c", 1)]))
    t.merge(_df(spark, [(1, "a3", 0)]), key_cols=["k"], partition_col="b")
    got = sorted(
        (r._commit_version, r._change_type, r.k, r.v)
        for r in t.read_changes(spark, 1).collect()
    )
    assert got == [
        (2, "update_postimage", 1, "a2"),
        (2, "update_preimage", 1, "a"),
        (3, "insert", 3, "c"),
        (4, "update_postimage", 1, "a3"),
        (4, "update_preimage", 1, "a2"),
    ]


def test_merge_rebases_across_concurrent_compact(spark, tmp_path):
    """A compact is content-preserving, so a merge based on the
    pre-compact snapshot may still commit: its rewrite derives from
    content equal to the compacted output."""
    t = VersionedTable(str(tmp_path / "t"))
    # cluster=False keeps the repartition(4) fragmentation so compact()
    # actually produces v2 (r10: clustered commits no-op it)
    t.write_initial(
        _df(spark, [(1, "a", 0), (2, "b", 0)]).repartition(4),
        "b",
        cluster=False,
    )
    m1 = t._read_manifest()
    t.compact(spark)  # v2 rewrites partition 0

    real = t._read_manifest
    calls = {"n": 0}

    def fake(at_version=None):
        if at_version is None and calls["n"] == 0:
            calls["n"] += 1
            return m1
        return real(at_version)

    t._read_manifest = fake
    try:
        t.merge(  # based on v1, touches the compacted partition
            _df(spark, [(1, "A", 0)]), key_cols=["k"], partition_col="b"
        )
    finally:
        t._read_manifest = real
    assert t.version() == 3
    assert _snap(t.read(spark)) == [(1, "A", 0), (2, "b", 0)]


def test_change_feed_vacuumed_preimages_fail_loudly(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    t.merge(_df(spark, [(1, "a2", 0)]), key_cols=["k"], partition_col="b")
    t.vacuum(keep_last=1)  # drops v1 and the merge's replaced dirs
    with pytest.raises(ValueError, match="vacuumed"):
        t.read_changes(spark, 1, 2).collect()


def _live_and_on_disk(t):
    """(dirs any manifest references, dirs actually under data/)."""
    import json
    import os

    referenced: set[str] = set()
    for name in os.listdir(t._manifest_dir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(t._manifest_dir, name)) as fh:
            m = json.load(fh)
        for ds in m["partitions"].values():
            referenced.update(ds)
        for ds in m.get("tombstones", {}).values():
            referenced.update(ds)
    on_disk = set()
    data = os.path.join(t.root, "data")
    for commit in os.listdir(data):
        cdir = os.path.join(data, commit)
        leaves = [n for n in os.listdir(cdir) if n.startswith("__part=")]
        if not leaves:
            on_disk.add(os.path.join("data", commit))  # empty commit dir
        for n in leaves:
            on_disk.add(os.path.join("data", commit, n))
    return referenced, on_disk


def test_conflicted_merge_reclaims_orphan_commit_dir(spark, tmp_path):
    """ADVICE r8: a merge that loses the race must rmtree its just-written
    data/<commit>/ dirs — otherwise every conflicted retry permanently
    leaks a rewrite of the touched partitions (no manifest references the
    dirs, so vacuum can never reclaim them)."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    m1 = t._read_manifest()
    t.merge(_df(spark, [(1, "rival", 0)]), key_cols=["k"], partition_col="b")
    with pytest.raises(CommitConflict):
        _merge_with_stale_base(t, spark, m1)
    referenced, on_disk = _live_and_on_disk(t)
    assert on_disk <= referenced, f"orphans leaked: {on_disk - referenced}"


def test_write_initial_race_reclaims_orphan_commit_dir(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    with pytest.raises(CommitConflict):
        t.write_initial(_df(spark, [(9, "z", 0)]), "b")
    referenced, on_disk = _live_and_on_disk(t)
    assert on_disk <= referenced


def test_append_token_replay_race_reclaims_dirs(spark, tmp_path):
    """A replayed append whose token check only fires INSIDE the lock
    (the pre-check raced the original commit) is a no-op that must also
    reclaim the redundant copy it wrote."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    m1 = t._read_manifest()  # pre-token snapshot
    t.append(_df(spark, [(2, "b", 0)]), commit_token="tok")
    v = t.version()

    real = t._read_manifest
    calls = {"n": 0}

    def fake(at_version=None):
        if at_version is None and calls["n"] == 0:
            calls["n"] += 1
            return m1  # replayer's pre-check misses the token
        return real(at_version)

    t._read_manifest = fake
    try:
        assert t.append(_df(spark, [(2, "b", 0)]), commit_token="tok") == v
    finally:
        t._read_manifest = real
    assert t.version() == v
    referenced, on_disk = _live_and_on_disk(t)
    assert on_disk <= referenced


def test_vacuumed_rebase_history_surfaces_as_commit_conflict(spark, tmp_path):
    """ADVICE r8: a concurrent vacuum that drops manifests an in-flight
    writer would rebase across must surface as CommitConflict ('re-run'),
    never a raw FileNotFoundError/ValueError mid-rebase."""
    import os

    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    t.merge(_df(spark, [(1, "x", 0)]), key_cols=["k"], partition_col="b")
    t.merge(_df(spark, [(2, "y", 1)]), key_cols=["k"], partition_col="b")
    os.remove(os.path.join(t._manifest_dir, "v000002.json"))  # "vacuumed"
    with pytest.raises(CommitConflict, match="vacuumed"):
        t._commits_between(1, 3)


def test_public_schema_accessor(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    names = [f.name for f in t.schema().fields]
    assert names == ["k", "v", "b"]
    t.merge(
        _df(spark, [(1, "a", 0)]).withColumn("extra", F.lit(1)),
        key_cols=["k"],
        partition_col="b",
        allow_schema_evolution=True,
    )
    assert [f.name for f in t.schema()] == ["k", "v", "b", "extra"]
    assert [f.name for f in t.schema(at_version=1)] == ["k", "v", "b"]
