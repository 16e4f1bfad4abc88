"""Snapshot-extraction ETL — the reference's core lifecycle, Spark-first.

The scopus reference's primary entry point is a CLI that walks a corpus of
ZIP archives of XML snapshot records, extracts fields, and loads a
NORMALIZED relational schema into an RDBMS (SURVEY §3.1 [U]; mount empty
§0.1). This module is that pipeline on Spark:

    ZIP-of-XML corpus --binaryFile scan--> (archive, member, xml string)
      --from_xml--> nested records DataFrame
      --explode/select--> normalized tables (records, record_terms,
                          author_links, authors, affiliations,
                          citation_edges)
      --write--> partitioned parquet (and/or JDBC via sources/jdbc.py)

Differences from the reference by design: the per-archive multiprocessing
fan-out becomes Spark's per-file task parallelism over the binaryFile
scan (one task per archive — the natural unit, since ZIP is not
splittable); per-member XML parsing happens JVM-side via from_xml after a
single Arrow-batched unzip pass. The CSV-staging + bulk-load step becomes
a direct partitioned columnar write.

The normalized fan-out mirrors the reference's relational schema
(SURVEY §1.1 [U]): publications (records), per-position terms, the
author–paper link table, author and affiliation dimensions, and the
citation edge table that queries/graph.py consumes.

CLI:  python -m scopus_spark extract --input <xml_dir_or_zip_dir> --output <out>
      python -m scopus_spark render-snapshot --sf-dir <dir> --output <xml_dir>
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# One <record> per document. Nested children model the reference's
# document shape: positional terms (abstract tokens), the author list,
# the per-record affiliation list, and outbound citation references.
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
        T.StructField(
            "authors",
            T.StructType(
                [
                    T.StructField(
                        "author",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("auid", T.LongType()),
                                    T.StructField("name", T.StringType()),
                                    T.StructField("seq", T.LongType()),
                                    T.StructField("afid", T.LongType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
        T.StructField(
            "affiliations",
            T.StructType(
                [
                    T.StructField(
                        "affiliation",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("afid", T.LongType()),
                                    T.StructField("country", T.StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
        T.StructField(
            "references",
            T.StructType([T.StructField("ref", T.ArrayType(T.LongType()))]),
        ),
        T.StructField("pubyear", T.LongType()),
        T.StructField("issn", T.StringType()),
        T.StructField(
            "subjects",
            T.StructType([T.StructField("subject", T.ArrayType(T.StringType()))]),
        ),
    ]
)


# --- deterministic enrichment (render side) ----------------------------------
# The driver corpus (documents.parquet) has no author/citation data, so the
# snapshot renderer synthesizes them with pure-arithmetic formulas that a
# DuckDB oracle reproduces exactly — the extraction fidelity checks
# (a10-a12, n5) hash real extracted tables against these formulas.

AUID_MOD = 997     # distinct-author universe
AFID_MOD = 53      # distinct-affiliation universe
COUNTRY_MOD = 7
SUBJ_MOD = 40      # subject-code universe
PUBYEAR_BASE = 1990
PUBYEAR_SPAN = 30


def _subject_codes(doc_id: Column) -> Column:
    """1 + doc_id%2 subject codes; code = 'SUBJ_' || (doc_id*11 + k*5) % 40."""
    return F.transform(
        F.sequence(F.lit(0).cast("long"), F.pmod(doc_id, F.lit(2)).cast("long")),
        lambda k: F.concat(
            F.lit("SUBJ_"),
            F.pmod(doc_id * 11 + k * 5, F.lit(SUBJ_MOD)).cast("string"),
        ),
    )


def _author_structs(doc_id: Column) -> Column:
    """1 + doc_id%3 authors; auid = (doc_id*7 + seq*13) % 997."""
    return F.transform(
        F.sequence(F.lit(0).cast("long"), F.pmod(doc_id, F.lit(3)).cast("long")),
        lambda seq: F.struct(
            F.pmod(doc_id * 7 + seq * 13, F.lit(AUID_MOD)).alias("auid"),
            F.concat(
                F.lit("author_"),
                F.pmod(doc_id * 7 + seq * 13, F.lit(AUID_MOD)).cast("string"),
            ).alias("name"),
            seq.alias("seq"),
            F.pmod(F.pmod(doc_id * 7 + seq * 13, F.lit(AUID_MOD)), F.lit(AFID_MOD)).alias(
                "afid"
            ),
        ),
    )


def _affiliation_structs(authors: Column) -> Column:
    """Distinct afids of the record's authors; country = 'C' || afid%7."""
    return F.transform(
        F.array_sort(F.array_distinct(F.transform(authors, lambda a: a["afid"]))),
        lambda afid: F.struct(
            afid.alias("afid"),
            F.concat(F.lit("C"), F.pmod(afid, F.lit(COUNTRY_MOD)).cast("string")).alias(
                "country"
            ),
        ),
    )


def _reference_ids(doc_id: Column, n_docs: Column) -> Column:
    """doc_id%4 outbound citations; cited = (doc_id*17 + j*29 + 1) % n_docs."""
    n_refs = F.pmod(doc_id, F.lit(4)).cast("long")
    refs = F.transform(
        F.sequence(F.lit(0).cast("long"), n_refs - 1),
        lambda j: F.pmod(doc_id * 17 + j * 29 + 1, n_docs),
    )
    return F.when(n_refs > 0, refs).otherwise(F.array().cast("array<long>"))


def _nested_records(docs: DataFrame) -> DataFrame:
    """documents table -> the nested record shape the XML snapshot carries."""
    n_row = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    authors = _author_structs(F.col("doc_id"))
    return docs.crossJoin(F.broadcast(n_row)).select(
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
        F.struct(authors.alias("author")).alias("authors"),
        F.struct(_affiliation_structs(authors).alias("affiliation")).alias(
            "affiliations"
        ),
        F.struct(
            _reference_ids(F.col("doc_id"), F.col("n_docs")).alias("ref")
        ).alias("references"),
        (F.lit(PUBYEAR_BASE) + F.pmod("doc_id", F.lit(PUBYEAR_SPAN))).alias(
            "pubyear"
        ),
        F.concat(F.lit("issn_"), F.col("source")).alias("issn"),
        F.struct(_subject_codes(F.col("doc_id")).alias("subject")).alias("subjects"),
    )


def render_snapshot(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Render the documents table as an XML snapshot directory (test/demo
    stand-in for the vendor corpus; one multi-record file per task)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (
        _nested_records(docs)
        .write.mode("overwrite")
        .format("xml")
        .option("rowTag", "record")
        .option("rootTag", "snapshot")
        .save(out_dir)
    )


def render_snapshot_zips(
    spark: SparkSession, sf_dir: str, zip_dir: str, docs_per_archive: int = 64
) -> None:
    """Render the documents table as the vendor delivery shape: a directory
    of ZIP archives, each holding one XML file per record.

    Per-record XML is produced distributed (to_xml); records are grouped
    into archives by doc_id range and each archive is written by the
    executor that owns its group. Local-mode note: executors write to the
    local filesystem; a cluster deployment would target shared storage.
    """
    import os

    os.makedirs(zip_dir, exist_ok=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rendered = _nested_records(docs).select(
        (F.col("doc_id") / docs_per_archive).cast("long").alias("archive_no"),
        F.concat(F.lit("record_"), F.col("doc_id").cast("string"), F.lit(".xml")).alias(
            "member"
        ),
        F.to_xml(
            F.struct(
                "doc_id", "lang", "source", "n_chars", "terms", "authors",
                "affiliations", "references", "pubyear", "issn", "subjects",
            ),
            {"rowTag": "record"},
        ).alias("xml"),
    )
    grouped = rendered.groupBy("archive_no").agg(
        F.sort_array(F.collect_list(F.struct("member", "xml"))).alias("members")
    )

    def write_archive(row):
        import zipfile

        path = os.path.join(zip_dir, f"archive_{row.archive_no:06d}.zip")
        # compresslevel=1: these are staging archives consumed only by
        # extract_snapshot_zips; the decompressed XML (all any reader
        # sees) is byte-identical at every level, and level 1 halves
        # the render's deflate CPU (r10 measure) for a modest size cost.
        with zipfile.ZipFile(
            path, "w", zipfile.ZIP_DEFLATED, compresslevel=1
        ) as zf:
            for m in row.members:
                zf.writestr(m.member, m.xml)

    grouped.foreach(write_archive)


# record_terms is partitioned by a bounded hash bucket of its parent key so
# incremental merges rewrite at most N_TERM_BUCKETS partitions, never the
# whole child table.
N_TERM_BUCKETS = 16

# Written by extract_snapshot / extract_snapshot_zips, read by the fidelity
# queries and any downstream JDBC load.
TABLE_NAMES = (
    "records",
    "record_terms",
    "author_links",
    "authors",
    "affiliations",
    "citation_edges",
    "subject_codes",
    "sources",
)


def _normalize(raw: DataFrame) -> dict[str, DataFrame]:
    """Nested XML records -> the normalized relational schema.

    Fact-side tables carry doc_bucket = pmod(doc_id, 16) and are
    partitioned by it: a merge's partition column MUST be a pure function
    of the merge key (a re-delivered doc can change lang — partitioning by
    lang would leave its old row stranded in an untouched partition).
    Dimension tables (authors, affiliations) are global distincts — tiny
    relative to the corpus (bounded id universes), rebuilt per load.
    """
    bucket = F.pmod("doc_id", F.lit(N_TERM_BUCKETS)).alias("doc_bucket")
    records = raw.select(
        "doc_id", "lang", "source", "n_chars", "pubyear", "issn", bucket
    )
    record_terms = raw.select(
        "doc_id", F.explode(F.col("terms.term")).alias("t")
    ).select(
        "doc_id",
        F.col("t._pos").alias("pos"),
        F.col("t._VALUE").alias("term"),
        bucket,
    )
    author_links = raw.select(
        "doc_id", F.explode(F.col("authors.author")).alias("a")
    ).select(
        "doc_id",
        F.col("a.seq").alias("seq"),
        F.col("a.auid").alias("auid"),
        F.col("a.name").alias("name"),
        F.col("a.afid").alias("afid"),
        bucket,
    )
    authors = author_links.select("auid", "name", "afid").distinct()
    affiliations = (
        raw.select(F.explode(F.col("affiliations.affiliation")).alias("af"))
        .select(F.col("af.afid").alias("afid"), F.col("af.country").alias("country"))
        .distinct()
    )
    citation_edges = raw.select(
        F.col("doc_id").alias("citing_doc_id"),
        F.explode(F.col("references.ref")).alias("cited_doc_id"),
    ).select(
        "citing_doc_id",
        "cited_doc_id",
        F.pmod("citing_doc_id", F.lit(N_TERM_BUCKETS)).alias("doc_bucket"),
    )
    subject_codes = raw.select(
        "doc_id", F.explode(F.col("subjects.subject")).alias("code")
    ).select("doc_id", "code", bucket)
    sources = raw.select("source", "issn").distinct()
    return {
        "records": records,
        "record_terms": record_terms,
        "author_links": author_links,
        "authors": authors,
        "affiliations": affiliations,
        "citation_edges": citation_edges,
        "subject_codes": subject_codes,
        "sources": sources,
    }


def _read_snapshot(spark: SparkSession, xml_dir: str) -> DataFrame:
    return (
        spark.read.format("xml")
        .option("rowTag", "record")
        .schema(RECORD_SCHEMA)
        .load(xml_dir)
    )


def _read_snapshot_zips(spark: SparkSession, zip_dir: str) -> DataFrame:
    """ZIP corpus -> nested records DataFrame.

    binaryFile scan (one task per archive; ZIP is not splittable, so the
    archive is the parallelism unit exactly as in the reference's
    per-archive worker pool), Arrow-batched unzip in mapInPandas, then
    JVM-side from_xml with the explicit schema. No driver-side I/O.
    """

    def expand(batches):
        import io
        import zipfile

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    for name in sorted(zf.namelist()):
                        if name.endswith(".xml"):
                            rows.append((path, name, zf.read(name).decode("utf-8")))
            yield pd.DataFrame(rows, columns=["archive", "member", "xml"])

    members = (
        spark.read.format("binaryFile")
        .load(f"{zip_dir}/*.zip")
        .select("path", "content")
        .mapInPandas(expand, "archive string, member string, xml string")
    )
    return members.select(F.from_xml("xml", RECORD_SCHEMA).alias("r")).select("r.*")


def _write_tables(tables: dict[str, DataFrame], out_dir: str) -> None:
    for name, df in tables.items():
        writer = df.write.mode("overwrite")
        if "doc_bucket" in df.columns:
            writer = writer.partitionBy("doc_bucket")
        writer.parquet(f"{out_dir}/{name}")


def _materialize_raw(
    spark: SparkSession, raw: DataFrame, out_dir: str, name: str = "_raw_nested"
) -> DataFrame:
    """Parse the snapshot ONCE: stage the nested records as parquet and
    return a frame reading that. _write_tables fans the normalized schema
    out into 8 independent writes, each its own Spark action — without
    this the whole upstream (binaryFile scan -> Arrow unzip -> from_xml)
    re-ran PER TABLE (8x; a10's 55 s at sf0.1 in the r10 measure). The
    staged copy is columnar, so each table write prunes to just the
    nested block it explodes."""
    stage = f"{out_dir}/{name}"
    raw.write.mode("overwrite").parquet(stage)
    return spark.read.parquet(stage)


def extract_snapshot(
    spark: SparkSession, xml_dir: str, out_dir: str
) -> dict[str, DataFrame]:
    """XML snapshot directory -> normalized relational tables as parquet.

    Returns the table DataFrames for further composition (e.g. a JDBC load
    via sources/jdbc.write_jdbc). Fact tables hive-partitioned by the
    doc_id hash bucket (see _normalize for why NOT by lang).
    """
    raw = _materialize_raw(spark, _read_snapshot(spark, xml_dir), out_dir)
    tables = _normalize(raw)
    _write_tables(tables, out_dir)
    return tables


def extract_snapshot_zips(
    spark: SparkSession, zip_dir: str, out_dir: str
) -> dict[str, DataFrame]:
    """ZIP-of-XML corpus (the reference's real input shape) -> normalized
    relational tables as parquet. Same contract as extract_snapshot."""
    raw = _materialize_raw(
        spark, _read_snapshot_zips(spark, zip_dir), out_dir
    )
    tables = _normalize(raw)
    _write_tables(tables, out_dir)
    return tables


def merge_snapshot(
    spark: SparkSession, xml_dir: str, target_dir: str
) -> dict[str, DataFrame]:
    """Incremental load: MERGE a delta snapshot into extracted tables.

    The reference pipeline re-loads vendor delta snapshots into the live
    schema [U — SURVEY §3.1 step 2]; here that is keyed upserts
    (operators/upsert.py):

    - records: key doc_id — changed docs replace their row, new docs
      insert; only the touched doc_id buckets rewrite.
    - record_terms / author_links / citation_edges: key doc_id as a
      *group* key — an anti-join on doc_id drops ALL old child rows of
      re-delivered docs (a doc's lists may shrink, so per-(doc,pos)
      upsert would leave stale tails), then the delta's rows insert;
      only touched doc_id buckets rewrite.

    Dimension tables (authors, affiliations) are global distincts over
    bounded id universes; they are rebuilt by the next full extract rather
    than merged (append-only distinct would need dedup anyway).

    Idempotent: replaying the same delta rewrites the same partitions to
    the same content.
    """
    from scopus_spark.operators.upsert import upsert_partitioned

    # delta parsed once (the extract_snapshot rationale): five keyed
    # upserts below each act on a _normalize view of the delta
    tables = _normalize(
        _materialize_raw(
            spark,
            _read_snapshot(spark, xml_dir),
            target_dir,
            name="_raw_nested_delta",
        )
    )
    upsert_partitioned(
        f"{target_dir}/records", tables["records"], ["doc_id"], "doc_bucket"
    )
    upsert_partitioned(
        f"{target_dir}/record_terms", tables["record_terms"], ["doc_id"], "doc_bucket"
    )
    upsert_partitioned(
        f"{target_dir}/author_links", tables["author_links"], ["doc_id"], "doc_bucket"
    )
    upsert_partitioned(
        f"{target_dir}/citation_edges",
        tables["citation_edges"],
        ["citing_doc_id"],
        "doc_bucket",
    )
    upsert_partitioned(
        f"{target_dir}/subject_codes", tables["subject_codes"], ["doc_id"], "doc_bucket"
    )
    return tables
