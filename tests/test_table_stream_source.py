"""VersionedTable as a streaming source (i16): a checkpointed file-
stream consumer tails an append-only table with MANIFEST-DRIVEN
discovery (streaming/table_source.AppendStreamSource) — the second
pass's load path must cover ONLY the directories the new commit added
(O(delta) listing, the VERDICT r8 fix), the second pass must read only
those files (no reprocessing), and the final aggregate equals the batch
recompute. Non-append commits in the window are refused loudly."""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from scopus_spark.operators.manifest import VersionedTable
from scopus_spark.streaming.table_source import AppendStreamSource


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long, b long")


def _run_pass(spark, vt, src, ckpt, name):
    path, upto = src.new_load_path()
    if path is None:
        return 0, None
    q = (
        spark.readStream.schema(vt.schema())
        .option("pathGlobFilter", "*.parquet")
        .parquet(path)
        .groupBy("b")
        .agg(F.sum("v").cast("long").alias("total"))
        .writeStream.outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.awaitTermination()
    src.mark_consumed(upto)
    return sum(p["numInputRows"] for p in q.recentProgress), path


def test_second_pass_reads_only_new_commit(spark, tmp_path):
    root = str(tmp_path / "t")
    vt = VersionedTable(root)
    vt.write_initial(_df(spark, [(i, 10, i % 2) for i in range(6)]), "b")
    vt.append(_df(spark, [(10 + i, 100, i % 2) for i in range(4)]))
    ckpt = str(tmp_path / "ckpt")
    src = AppendStreamSource(vt, ckpt)
    name = f"tbl_{uuid.uuid4().hex[:8]}"

    n1, path1 = _run_pass(spark, vt, src, ckpt, name)
    assert n1 == 10  # commits 1+2
    assert src.consumed_version() == 2

    vt.append(_df(spark, [(20 + i, 1000, i % 2) for i in range(3)]))
    n2, path2 = _run_pass(spark, vt, src, ckpt, name)
    assert n2 == 3  # ONLY the new commit's rows — incremental, no replay

    # O(delta) DISCOVERY: the second pass's load path names exactly the
    # one commit directory v3 added — never a whole-table glob
    v3_dirs = {
        d for ds in vt.commit_info(3)["added"].values() for d in ds
    }
    v3_commit_ids = {d.split(os.sep)[1] for d in v3_dirs}
    assert len(v3_commit_ids) == 1
    (cid,) = v3_commit_ids
    assert path2 == os.path.join(root, "data", cid, "*")
    # and the first pass's path covered exactly commits 1+2's ids
    ids12 = {
        d.split(os.sep)[1]
        for v in (1, 2)
        for ds in vt.commit_info(v)["added"].values()
        for d in ds
    }
    assert sorted(ids12) == sorted(
        path1.split(os.sep)[-2].strip("{}").split(",")
    )

    got = {r.b: r.total for r in spark.table(name).collect()}
    want = {
        r.b: r.total
        for r in vt.read(spark)
        .groupBy("b")
        .agg(F.sum("v").cast("long").alias("total"))
        .collect()
    }
    assert got == want

    # caught up: no new commits -> no pass
    n3, path3 = _run_pass(spark, vt, src, ckpt, name)
    assert (n3, path3) == (0, None)


def test_append_source_refuses_rewrite_commits(spark, tmp_path):
    """A merge in the unconsumed window rewrites rows already consumed
    into new files — the file stream would double-count, so the source
    raises and points at the change-feed consumer."""
    root = str(tmp_path / "t")
    vt = VersionedTable(root)
    vt.write_initial(_df(spark, [(1, 10, 0), (2, 20, 1)]), "b")
    ckpt = str(tmp_path / "ckpt")
    src = AppendStreamSource(vt, ckpt)
    path, upto = src.new_load_path()
    assert path is not None
    src.mark_consumed(upto)
    vt.merge(_df(spark, [(1, 11, 0)]), key_cols=["k"], partition_col="b")
    with pytest.raises(ValueError, match="ChangeFeedConsumer"):
        src.new_load_path()


def test_all_empty_commit_window_advances_marker(spark, tmp_path):
    """Commits that added zero dirs: new_load_path returns None AND
    persists the marker past them itself — callers only mark_consumed
    after running a non-None path, so without this every later trigger
    would re-read those commits' manifests forever (r9 ADVICE)."""
    root = str(tmp_path / "t")
    vt = VersionedTable(root)
    vt.write_initial(_df(spark, [(1, 10, 0)]), "b")
    src = AppendStreamSource(vt, str(tmp_path / "ckpt"))
    path, upto = src.new_load_path()
    assert path is not None
    src.mark_consumed(upto)

    empty = spark.createDataFrame([], "k long, v long, b long")
    vt.append(empty)  # a commit that added no dirs
    path, upto = src.new_load_path()
    assert path is None
    # the source advanced the durable marker past the empty window
    assert src.consumed_version() == vt.version()

    # and a later real append is discovered from there, alone
    vt.append(_df(spark, [(2, 20, 1)]))
    path, upto = src.new_load_path()
    assert path is not None
    v3_ids = {
        d.split(os.sep)[1]
        for ds in vt.commit_info(vt.version())["added"].values()
        for d in ds
    }
    (cid,) = v3_ids
    assert path == os.path.join(root, "data", cid, "*")
