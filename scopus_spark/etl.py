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


# record_terms is partitioned by a bounded hash bucket of its parent key so
# incremental merges rewrite at most N_TERM_BUCKETS partitions, never the
# whole child table.
N_TERM_BUCKETS = 16


def _normalize(raw: DataFrame) -> dict[str, DataFrame]:
    """Nested XML records -> the normalized relational tables.

    Both tables carry doc_bucket = pmod(doc_id, 16) and are partitioned by
    it: a merge's partition column MUST be a pure function of the merge key
    (a re-delivered doc can change lang — partitioning by lang would leave
    its old row stranded in an untouched partition).
    """
    records = raw.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.pmod("doc_id", F.lit(N_TERM_BUCKETS)).alias("doc_bucket"),
    )
    record_terms = raw.select(
        "doc_id", F.explode(F.col("terms.term")).alias("t")
    ).select(
        "doc_id",
        F.col("t._pos").alias("pos"),
        F.col("t._VALUE").alias("term"),
        F.pmod("doc_id", F.lit(N_TERM_BUCKETS)).alias("doc_bucket"),
    )
    return {"records": records, "record_terms": record_terms}


def _read_snapshot(spark: SparkSession, xml_dir: str) -> DataFrame:
    return (
        spark.read.format("xml")
        .option("rowTag", "record")
        .schema(RECORD_SCHEMA)
        .load(xml_dir)
    )


def extract_snapshot(
    spark: SparkSession, xml_dir: str, out_dir: str
) -> dict[str, DataFrame]:
    """XML snapshot -> normalized relational tables, written as parquet.

    Returns the table DataFrames (records, record_terms) for further
    composition (e.g. a JDBC load via sources/jdbc.write_jdbc). Layout is
    merge-ready: both tables hive-partitioned by the doc_id hash bucket
    (see _normalize for why NOT by lang).
    """
    tables = _normalize(_read_snapshot(spark, xml_dir))
    tables["records"].write.mode("overwrite").partitionBy("doc_bucket").parquet(
        f"{out_dir}/records"
    )
    # partition the 1:N child table by a bounded key for pruned scans
    tables["record_terms"].write.mode("overwrite").partitionBy("doc_bucket").parquet(
        f"{out_dir}/record_terms"
    )
    return tables


def merge_snapshot(
    spark: SparkSession, xml_dir: str, target_dir: str
) -> dict[str, DataFrame]:
    """Incremental load: MERGE a delta snapshot into extracted tables.

    The reference pipeline re-loads vendor delta snapshots into the live
    schema [U — SURVEY §3.1 step 2]; here that is two keyed upserts
    (operators/upsert.py):

    - records: key doc_id — changed docs replace their row, new docs
      insert; only the touched doc_id buckets rewrite.
    - record_terms: key doc_id as a *group* key — an anti-join on doc_id
      drops ALL old terms of re-delivered docs (a doc's term list may
      shrink, so per-(doc,pos) upsert would leave stale tails), then the
      delta's terms insert; only touched doc_id buckets rewrite.

    Idempotent: replaying the same delta rewrites the same partitions to
    the same content.
    """
    from scopus_spark.operators.upsert import upsert_partitioned

    tables = _normalize(_read_snapshot(spark, xml_dir))
    upsert_partitioned(
        f"{target_dir}/records", tables["records"], ["doc_id"], "doc_bucket"
    )
    upsert_partitioned(
        f"{target_dir}/record_terms", tables["record_terms"], ["doc_id"], "doc_bucket"
    )
    return tables
