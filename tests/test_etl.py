"""Snapshot-extraction pipeline fidelity (scopus_spark/etl.py)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from scopus_spark import etl
from scopus_spark.catalog import table
from tests.conftest import SMOKE_SF_DIR


def test_extract_roundtrip_reconstructs_documents(spark):
    """render -> extract -> normalized tables must rebuild the original
    documents exactly (the reference pipeline's correctness criterion:
    no field lost between snapshot and relational schema)."""
    with tempfile.TemporaryDirectory(prefix="scopus_etl_") as tmp:
        snap, out = f"{tmp}/snap", f"{tmp}/out"
        etl.render_snapshot(spark, SMOKE_SF_DIR, snap)
        tables = etl.extract_snapshot(spark, snap, out)

        docs = table(spark, SMOKE_SF_DIR, "documents")
        records = spark.read.parquet(f"{out}/records")
        terms = spark.read.parquet(f"{out}/record_terms")

        # parent table: exact row parity
        assert records.count() == docs.count()
        assert (
            records.join(
                docs, ["doc_id", "lang", "source", "n_chars"], "inner"
            ).count()
            == docs.count()
        )

        # child table: terms in position order rebuild the text
        rebuilt = (
            terms.groupBy("doc_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("pos"), F.col("term")))
                        ),
                        lambda s: s.term,
                    ),
                    " ",
                ).alias("text")
            )
        )
        mismatches = (
            rebuilt.alias("r")
            .join(docs.alias("d"), "doc_id")
            .filter(F.col("r.text") != F.col("d.text"))
            .count()
        )
        assert mismatches == 0


def test_merge_snapshot_incremental_load(spark):
    """Delta snapshot MERGE: changed docs replace (including SHRINKING
    term lists — no stale tails), new docs insert, untouched docs survive
    byte-identical; replay is a no-op."""
    import datetime as _dt

    with tempfile.TemporaryDirectory(prefix="scopus_etl_merge_") as tmp:
        snap, out, delta_sf, delta_snap = (
            f"{tmp}/snap", f"{tmp}/out", f"{tmp}/delta_sf", f"{tmp}/delta_snap",
        )
        etl.render_snapshot(spark, SMOKE_SF_DIR, snap)
        etl.extract_snapshot(spark, snap, out)
        docs = table(spark, SMOKE_SF_DIR, "documents")
        n0 = docs.count()

        # delta: doc 0 re-delivered with a SHORTER text + changed lang,
        # plus one brand-new doc
        new_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        delta_docs = spark.createDataFrame(
            [(0, "tiny text", "zz", "delta", 9), (new_id, "brand new doc", "en", "delta", 13)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        delta_docs.write.parquet(f"{delta_sf}/documents.parquet")
        etl.render_snapshot(spark, delta_sf, delta_snap)
        etl.merge_snapshot(spark, delta_snap, out)

        records = spark.read.parquet(f"{out}/records")
        terms = spark.read.parquet(f"{out}/record_terms")
        assert records.count() == n0 + 1
        doc0 = records.filter(F.col("doc_id") == 0).collect()[0]
        assert doc0["lang"] == "zz" and doc0["source"] == "delta"
        # term list replaced wholesale: exactly the 2 new tokens, no tails
        t0 = sorted(
            (r["pos"], r["term"])
            for r in terms.filter(F.col("doc_id") == 0).collect()
        )
        assert t0 == [(0, "tiny"), (1, "text")]
        assert terms.filter(F.col("doc_id") == new_id).count() == 3
        # untouched doc intact
        before = docs.filter(F.col("doc_id") == 1).collect()[0]
        after = records.filter(F.col("doc_id") == 1).collect()[0]
        assert before["lang"] == after["lang"] and before["n_chars"] == after["n_chars"]

        # replay idempotence (fresh reads: the rewrite invalidates any
        # DataFrame whose file listing predates it)
        n_terms = terms.count()
        etl.merge_snapshot(spark, delta_snap, out)
        assert spark.read.parquet(f"{out}/records").count() == n0 + 1
        assert spark.read.parquet(f"{out}/record_terms").count() == n_terms
