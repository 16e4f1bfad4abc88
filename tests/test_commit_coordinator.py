"""CommitCoordinator seam (VERDICT r8 item 6): the flock critical
section is behind an interface — exclusive(table) + swap_or_conflict
(expected-version -> publish-or-CommitConflict) — so a catalog CAS can
slot in without touching rebase logic.

Contracts:
- a fake CAS-style coordinator (no-op exclusivity, version-checked
  swap) drives the SAME mutators correctly in the no-race case;
- an injected mid-commit conflict (the swap loses after a clean rebase)
  surfaces as CommitConflict, reclaims the staged commit dir, and a
  plain re-run succeeds;
- the default LocalFlockCoordinator still enforces expected-version
  (the invariant both impls share).
"""

from __future__ import annotations

import contextlib
import json
import os

import pytest

from scopus_spark.operators.manifest import (
    CommitConflict,
    CommitCoordinator,
    VersionedTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, b long")


def _snap(df):
    return sorted((r.k, r.v, r.b) for r in df.collect())


class CasCoordinator(CommitCoordinator):
    """CAS-shaped coordinator: exclusivity is a no-op (like an object
    store), correctness rides entirely on the version-conditioned swap.
    ``fail_next`` injects one lost CAS even when the rebase was clean —
    the failure mode a real catalog produces when another writer's
    publish lands between our re-read and our conditional-put."""

    def __init__(self):
        self.fail_next = False
        self.swaps = 0

    def exclusive(self, table):
        return contextlib.nullcontext()

    def swap_or_conflict(self, table, manifest, expected_version):
        if self.fail_next:
            self.fail_next = False
            raise CommitConflict("injected CAS loss: publish raced")
        current = table.version()
        if current != expected_version:
            raise CommitConflict(
                f"CAS: expected v{expected_version}, at v{current}"
            )
        self.swaps += 1
        return table._commit(manifest)


def _orphans(t):
    referenced: set[str] = set()
    for name in os.listdir(t._manifest_dir):
        if name.endswith(".json"):
            with open(os.path.join(t._manifest_dir, name)) as fh:
                m = json.load(fh)
            for ds in m["partitions"].values():
                referenced.update(ds)
            for ds in m.get("tombstones", {}).values():
                referenced.update(ds)
    on_disk = set()
    for commit in os.listdir(os.path.join(t.root, "data")):
        for leaf in os.listdir(os.path.join(t.root, "data", commit)):
            if leaf.startswith("__part="):
                on_disk.add(os.path.join("data", commit, leaf))
    return on_disk - referenced


def test_mutators_run_through_cas_coordinator(spark, tmp_path):
    coord = CasCoordinator()
    t = VersionedTable(str(tmp_path / "t"), coordinator=coord)
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1)]), "b")
    t.append(_df(spark, [(3, "c", 0)]))
    t.merge(_df(spark, [(1, "a2", 0)]), key_cols=["k"], partition_col="b")
    t.delete_keys(
        spark.createDataFrame([(2, 1)], "k long, b long"), key_cols=["k"]
    )
    t.compact(spark)
    assert coord.swaps == 5
    assert _snap(t.read(spark)) == [(1, "a2", 0), (3, "c", 0)]


def test_injected_cas_loss_reclaims_and_retry_succeeds(spark, tmp_path):
    coord = CasCoordinator()
    t = VersionedTable(str(tmp_path / "t"), coordinator=coord)
    t.write_initial(_df(spark, [(1, "a", 0), (2, "b", 1)]), "b")

    coord.fail_next = True  # the NEXT publish loses its CAS
    with pytest.raises(CommitConflict, match="injected CAS loss"):
        t.merge(
            _df(spark, [(1, "a2", 0)]), key_cols=["k"], partition_col="b"
        )
    assert t.version() == 1  # nothing published
    assert not _orphans(t)  # the staged rewrite was reclaimed

    # the public retry contract: re-run against the current snapshot
    t.merge(_df(spark, [(1, "a2", 0)]), key_cols=["k"], partition_col="b")
    assert t.version() == 2
    assert _snap(t.read(spark)) == [(1, "a2", 0), (2, "b", 1)]


def test_flock_coordinator_checks_expected_version(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write_initial(_df(spark, [(1, "a", 0)]), "b")
    with pytest.raises(CommitConflict, match="expected v0"):
        t.coordinator.swap_or_conflict(
            t, t._read_manifest() | {"version": 99}, expected_version=0
        )
