"""Snapshot-isolated versioned parquet tables — an Iceberg-lite manifest
layer over the incremental tier (VERDICT r6 item 6).

The stage-and-swap MERGE (operators/upsert.py) is correct for a single
writer, but a reader racing the partition-directory swap can list a
partition twice (old parked + new live) or not at all (between the two
renames). Production table formats fix this with IMMUTABLE DATA FILES +
an atomic metadata pointer, and that is exactly the shape here:

- Every commit writes NEW data directories under ``root/data/<commit>/``
  and never mutates or deletes a file any existing manifest references.
- A manifest (``root/_manifests/v%06d.json``) lists the EXACT data
  directories of one snapshot, per partition value, plus the schema.
- Commit = write the next manifest file, then atomically swap the
  ``root/_current`` pointer (``os.replace`` — POSIX-atomic). Readers
  resolve the pointer ONCE and from then on see precisely that
  snapshot's files, no matter how many commits land meanwhile.
- Old snapshots stay readable until an explicit ``vacuum`` drops the
  manifests and any data directories only they reference.

The partition column is stored INSIDE the data files as a normal column
(the hive-style ``__part=<val>`` directory name is just file layout);
readers get the column without partition discovery, so a manifest's
directory list can mix commits freely — the same reason Iceberg keeps
partition data in metadata rather than in path conventions.

At 100 TB the pointer swap becomes the catalog's atomic
compare-and-swap; everything else (immutable files, manifest pruning by
partition value, snapshot-pinned readers) is already the at-scale shape.
Single-writer contract like upsert.py: concurrent WRITERS need a lock or
CAS the filesystem cannot provide — readers need nothing.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_PART_DIR = "__part"
# Replay-detection memory: how many recent commit tokens each manifest
# carries. Streaming retries only ever replay the LAST batch, so a small
# window is already generous; bounded so manifests never grow with history.
_TOKEN_WINDOW = 128


def _partition_dir(val) -> str:
    return str(val)


class VersionedTable:
    """Handle to one snapshot-isolated table rooted at ``root``."""

    def __init__(self, root: str):
        self.root = root
        self._manifest_dir = os.path.join(root, "_manifests")
        self._pointer = os.path.join(root, "_current")

    # -- metadata ------------------------------------------------------------

    def exists(self) -> bool:
        return os.path.isfile(self._pointer)

    def version(self) -> int:
        return self._read_manifest()["version"] if self.exists() else 0

    def _read_manifest(self, at_version: int | None = None) -> dict:
        if at_version is None:
            with open(self._pointer) as fh:
                name = fh.read().strip()
        else:
            name = f"v{at_version:06d}.json"
            if not os.path.isfile(os.path.join(self._manifest_dir, name)):
                raise ValueError(
                    f"snapshot v{at_version} does not exist (or was "
                    f"vacuumed) under {self.root}"
                )
        with open(os.path.join(self._manifest_dir, name)) as fh:
            return json.load(fh)

    def _commit(self, manifest: dict) -> int:
        """Write the manifest file, then atomically swap the pointer."""
        os.makedirs(self._manifest_dir, exist_ok=True)
        version = manifest["version"]
        name = f"v{version:06d}.json"
        path = os.path.join(self._manifest_dir, name)
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)
        ptmp = f"{self._pointer}.tmp-{uuid.uuid4().hex[:8]}"
        with open(ptmp, "w") as fh:
            fh.write(name)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(ptmp, self._pointer)  # THE commit point (atomic)
        return version

    # -- data ----------------------------------------------------------------

    def _write_commit_data(
        self, df: DataFrame, partition_col: str
    ) -> dict[str, list[str]]:
        """Write df as immutable files under data/<commit>/ and return
        {partition value (as dir string): [relative data dirs]}."""
        commit_id = uuid.uuid4().hex[:12]
        commit_dir = os.path.join(self.root, "data", commit_id)
        (
            df.withColumn(_PART_DIR, F.col(partition_col))
            .write.partitionBy(_PART_DIR)
            .parquet(commit_dir)
        )
        out: dict[str, list[str]] = {}
        prefix = f"{_PART_DIR}="
        for name in os.listdir(commit_dir):
            if name.startswith(prefix):
                out[name[len(prefix):]] = [
                    os.path.join("data", commit_id, name)
                ]
        return out

    def write_initial(self, df: DataFrame, partition_col: str) -> int:
        """Create the table (snapshot v1) from df."""
        parts = self._write_commit_data(df, partition_col)
        return self._commit(
            {
                "version": 1,
                "parent": 0,
                "partition_col": partition_col,
                "schema": df.schema.json(),
                "partitions": parts,
            }
        )

    def read(
        self,
        spark: SparkSession,
        partition_values: list | None = None,
        at_version: int | None = None,
    ) -> DataFrame:
        """A DataFrame pinned to the CURRENT snapshot — or, with
        ``at_version``, TIME TRAVEL to any retained older snapshot
        (immutable data files make every un-vacuumed version fully
        readable forever). Optionally pruned to the given partition
        values via manifest metadata — no directory listing of untouched
        partitions ever happens."""
        m = self._read_manifest(at_version)
        parts = m["partitions"]
        if partition_values is not None:
            keys = [_partition_dir(v) for v in partition_values]
            dirs = [d for k in keys for d in parts.get(k, [])]
        else:
            dirs = [d for ds in parts.values() for d in ds]
        schema = StructType.fromJson(json.loads(m["schema"]))
        if not dirs:
            return spark.createDataFrame([], schema)
        return spark.read.parquet(
            *[os.path.join(self.root, d) for d in dirs]
        ).select(*[f.name for f in schema.fields])

    # -- MERGE ---------------------------------------------------------------

    def merge(
        self,
        delta: DataFrame,
        key_cols: list[str],
        partition_col: str,
        deletes: DataFrame | None = None,
        commit_token: str | None = None,
    ) -> int:
        """MERGE delta into a new snapshot: replaced/deleted keys drop
        out, new keys insert, delete-wins on overlap (upsert.py
        semantics). Touched partitions get NEW data directories; the new
        manifest carries untouched partitions' entries forward
        unchanged, so the commit's write cost is O(touched), and every
        pre-existing reader keeps its pinned snapshot intact.

        CONTRACT (same as upsert.py): partition_col must be a pure
        function of key_cols, or an updated key's old row survives in a
        partition the merge never reads.

        ``commit_token`` makes the merge EXACTLY-ONCE under replay: the
        manifest remembers the last _TOKEN_WINDOW applied tokens, and a
        merge whose token was already applied is a no-op returning the
        current version — the foreachBatch retry contract without
        relying on content idempotence (streaming/sinks threads
        '<stream>:<batch_id>' through here).
        """
        if not self.exists():
            if deletes is not None:
                delta = delta.join(
                    deletes.select(*key_cols), key_cols, "left_anti"
                )
            return self._commit(
                {
                    "version": 1,
                    "parent": 0,
                    "partition_col": partition_col,
                    "schema": delta.schema.json(),
                    "partitions": self._write_commit_data(
                        delta, partition_col
                    ),
                    "tokens": [commit_token] if commit_token else [],
                }
            )
        spark = delta.sparkSession
        m = self._read_manifest()
        if commit_token is not None and commit_token in m.get("tokens", []):
            return m["version"]  # replayed batch: already applied
        drop_keys = delta.select(*key_cols)
        touched_src = delta.select(partition_col)
        if deletes is not None:
            drop_keys = drop_keys.unionByName(deletes.select(*key_cols))
            touched_src = touched_src.unionByName(
                deletes.select(partition_col)
            )
            delta = delta.join(
                deletes.select(*key_cols), key_cols, "left_anti"
            )
        touched = [r[0] for r in touched_src.distinct().collect()]
        if not touched:
            return m["version"]
        existing = self.read(spark, partition_values=touched)
        survivors = existing.join(drop_keys, key_cols, "left_anti")
        merged = survivors.unionByName(delta)
        new_parts = self._write_commit_data(merged, partition_col)

        parts = dict(m["partitions"])
        for val in touched:
            key = _partition_dir(val)
            new_dirs = new_parts.get(key)
            if new_dirs is None:
                # deletes emptied the partition — it leaves the snapshot
                parts.pop(key, None)
            else:
                parts[key] = new_dirs
        tokens = list(m.get("tokens", []))
        if commit_token is not None:
            tokens = (tokens + [commit_token])[-_TOKEN_WINDOW:]
        return self._commit(
            {
                "version": m["version"] + 1,
                "parent": m["version"],
                "partition_col": partition_col,
                "schema": m["schema"],
                "partitions": parts,
                "tokens": tokens,
            }
        )

    # -- layout maintenance ----------------------------------------------------

    def _n_files(self, rel_dirs: list[str]) -> int:
        return sum(
            1
            for d in rel_dirs
            for f in os.listdir(os.path.join(self.root, d))
            if f.endswith(".parquet")
        )

    def compact(
        self, spark: SparkSession, partition_values: list | None = None
    ) -> int:
        """Rewrite fragmented partitions (default: every partition whose
        data directories hold >1 parquet file — the small-files debt a
        wide-task merge write accumulates) into fresh single-file
        directories and commit the result as a new snapshot.
        Content-preserving by construction (same rows, new files); pinned
        readers of older snapshots are untouched; reclaim the superseded
        fragments with vacuum()."""
        m = self._read_manifest()
        parts = m["partitions"]
        if partition_values is None:
            targets = [
                k for k, ds in parts.items() if self._n_files(ds) > 1
            ]
        else:
            targets = [
                _partition_dir(v)
                for v in partition_values
                if _partition_dir(v) in parts
            ]
        if not targets:
            return m["version"]
        pc = m["partition_col"]
        df = self.read(spark, partition_values=targets).repartition(
            F.col(pc)
        )
        new_parts = self._write_commit_data(df, pc)
        merged = dict(parts)
        merged.update(new_parts)
        return self._commit(
            {
                "version": m["version"] + 1,
                "parent": m["version"],
                "partition_col": pc,
                "schema": m["schema"],
                "partitions": merged,
                "tokens": list(m.get("tokens", [])),
            }
        )

    # -- retention -----------------------------------------------------------

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Drop manifests older than the newest ``keep_last`` and delete
        data directories ONLY they reference. Never touches anything a
        retained manifest lists, so pinned readers of retained snapshots
        are unaffected. Returns the removed data dirs (relative)."""
        if not self.exists():
            return []
        # ignore stale .tmp-* leftovers from a crashed commit attempt —
        # only fsync'd, os.replace'd manifests count
        names = sorted(
            n for n in os.listdir(self._manifest_dir) if n.endswith(".json")
        )
        with open(self._pointer) as fh:
            current = fh.read().strip()
        # retention is relative to the current pointer, not lexically
        # newer uncommitted manifests (there are none under the
        # single-writer contract, but be strict anyway)
        names = [n for n in names if n <= current]
        keep, drop = names[-keep_last:], names[:-keep_last]
        if current not in keep:
            keep.append(current)
        referenced: set[str] = set()
        for n in keep:
            with open(os.path.join(self._manifest_dir, n)) as fh:
                for ds in json.load(fh)["partitions"].values():
                    referenced.update(ds)
        removed: list[str] = []
        for n in drop:
            path = os.path.join(self._manifest_dir, n)
            with open(path) as fh:
                for ds in json.load(fh)["partitions"].values():
                    for d in ds:
                        if d not in referenced:
                            shutil.rmtree(
                                os.path.join(self.root, d),
                                ignore_errors=True,
                            )
                            removed.append(d)
                            referenced.add(d)  # only rmtree once
            os.remove(path)
        return removed
