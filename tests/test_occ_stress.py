"""Mixed-operation optimistic-concurrency stress (round 9).

Four threads hammer ONE table through independent handles — two
appenders on disjoint key ranges, a deletion-vector deleter, and a
merger upserting a slice that shares partitions with the deletes — each
retrying on CommitConflict (the public contract). The final state is
order-INDEPENDENT by construction (disjoint key ownership), so whatever
interleaving the scheduler produces must converge to the same rows.

Invariants checked after the storm:
- every thread finished (conflicts were retried, never fatal);
- version lineage is linear (parent == version - 1 throughout);
- the final read equals the serially-computed expected set exactly;
- no orphan data/tombstone dirs (every on-disk dir is referenced by
  some manifest — conflicted attempts reclaimed their staging);
- a compact + vacuum afterwards preserves the state and the invariants.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import functions as F

from scopus_spark.operators.manifest import CommitConflict, VersionedTable

ATTEMPTS = 30


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, b long")


def _retry(fn):
    for _ in range(ATTEMPTS):
        try:
            return fn()
        except CommitConflict:
            continue
    raise AssertionError(f"{ATTEMPTS} conflicts in a row — livelock?")


def _orphans(t):
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
    for commit in os.listdir(os.path.join(t.root, "data")):
        cdir = os.path.join(t.root, "data", commit)
        leaves = [n for n in os.listdir(cdir) if n.startswith("__part=")]
        if not leaves:
            on_disk.add(os.path.join("data", commit))
        for n in leaves:
            on_disk.add(os.path.join("data", commit, n))
    return on_disk - referenced


def test_concurrent_mixed_ops_converge(spark, tmp_path):
    root = str(tmp_path / "t")
    base = [(k, f"base{k}", k % 2) for k in range(10)]
    VersionedTable(root).write_initial(_df(spark, base), "b")
    errs: list[Exception] = []

    def appender(lo: int):
        def run():
            t = VersionedTable(root)
            for i in range(3):
                batch = [
                    (lo + 4 * i + j, f"app{lo}", (lo + j) % 2)
                    for j in range(4)
                ]
                _retry(lambda b=batch: t.append(_df(spark, b)))

        return run

    def deleter():
        # deletes base keys 4 (b=0) and 5 (b=1) — partition 0 is shared
        # with the merger, so real conflicts happen
        t = VersionedTable(root)
        keys = spark.createDataFrame([(4, 0), (5, 1)], "k long, b long")
        _retry(lambda: t.delete_keys(keys, key_cols=["k"]))

    def merger():
        # upserts base keys 0 and 2 (both partition 0)
        t = VersionedTable(root)
        delta = _df(spark, [(0, "upd0", 0), (2, "upd2", 0)])
        _retry(
            lambda: t.merge(delta, key_cols=["k"], partition_col="b")
        )

    def wrap(fn):
        def run():
            try:
                fn()
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(e)

        return run

    threads = [
        threading.Thread(target=wrap(appender(100))),
        threading.Thread(target=wrap(appender(200))),
        threading.Thread(target=wrap(deleter)),
        threading.Thread(target=wrap(merger)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs

    t = VersionedTable(root)
    # lineage is linear
    for v in range(1, t.version() + 1):
        assert t.commit_info(v)["parent"] == v - 1
    # the serial expected state: base minus {4,5}, 0/2 updated, appends in
    expected = {
        (k, ("upd" + str(k)) if k in (0, 2) else f"base{k}", k % 2)
        for k in range(10)
        if k not in (4, 5)
    }
    for lo in (100, 200):
        for i in range(3):
            for j in range(4):
                expected.add((lo + 4 * i + j, f"app{lo}", (lo + j) % 2))
    got = {(r.k, r.v, r.b) for r in t.read(spark).collect()}
    assert got == expected
    assert not _orphans(t)

    # maintenance afterwards preserves everything
    t.compact(spark)
    t.vacuum(keep_last=1)
    got2 = {(r.k, r.v, r.b) for r in t.read(spark).collect()}
    assert got2 == expected
    assert not _orphans(t)
