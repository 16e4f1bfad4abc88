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
