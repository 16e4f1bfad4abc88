"""VersionedTable as a streaming source (i16): a checkpointed file-
stream consumer tails an append-only table — the second pass must read
ONLY the files the new commit added (no reprocessing), and the final
aggregate equals the batch recompute."""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from scopus_spark.operators.manifest import VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long, b long")


def _run_pass(spark, vt, root, ckpt, name):
    sch = StructType.fromJson(json.loads(vt._read_manifest()["schema"]))
    q = (
        spark.readStream.schema(sch)
        .option("pathGlobFilter", "*.parquet")
        .parquet(os.path.join(root, "data", "*", "*"))
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
    return sum(p["numInputRows"] for p in q.recentProgress)


def test_second_pass_reads_only_new_commit(spark, tmp_path):
    root = str(tmp_path / "t")
    vt = VersionedTable(root)
    vt.write_initial(_df(spark, [(i, 10, i % 2) for i in range(6)]), "b")
    vt.append(_df(spark, [(10 + i, 100, i % 2) for i in range(4)]))
    ckpt = str(tmp_path / "ckpt")
    name = f"tbl_{uuid.uuid4().hex[:8]}"

    n1 = _run_pass(spark, vt, root, ckpt, name)
    assert n1 == 10  # commits 1+2

    vt.append(_df(spark, [(20 + i, 1000, i % 2) for i in range(3)]))
    n2 = _run_pass(spark, vt, root, ckpt, name)
    assert n2 == 3  # ONLY the new commit's rows — incremental, no replay

    got = {r.b: r.total for r in spark.table(name).collect()}
    want = {
        r.b: r.total
        for r in vt.read(spark)
        .groupBy("b")
        .agg(F.sum("v").cast("long").alias("total"))
        .collect()
    }
    assert got == want
