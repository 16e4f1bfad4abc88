"""operators/dedup.substring_dedup — duplicate-SPAN removal (j52).

Contracts: later occurrences of a shared >=5-token span are cut at
exactly their extent (host doc survives), the first occurrence is kept
verbatim, a fully-duplicated doc reduces to the empty string, and the
transform is idempotent on the real corpus (re-running on its own
output removes nothing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scopus_spark.operators.dedup import substring_dedup

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_later_occurrence_cut_at_extent(spark):
    span = "alpha beta gamma delta epsilon zeta"  # 6 tokens = 2 grams
    d = _docs(
        spark,
        [
            (1, f"{span} tail1 tail2"),
            (2, f"head1 head2 {span} tail3 tail4"),
        ],
    )
    out = {r.doc_id: r for r in substring_dedup(d).collect()}
    # first occurrence (doc 1) untouched
    assert out[1].n_removed == 0
    assert out[1].clean_text == f"{span} tail1 tail2"
    # later occurrence loses exactly the 6 span tokens, keeps the rest
    assert out[2].n_removed == 6
    assert out[2].clean_text == "head1 head2 tail3 tail4"


def test_full_duplicate_reduces_to_empty(spark):
    text = "one two three four five six seven"
    d = _docs(spark, [(1, text), (2, text)])
    out = {r.doc_id: r for r in substring_dedup(d).collect()}
    assert out[1].clean_text == text and out[1].n_removed == 0
    assert out[2].clean_text == "" and out[2].n_removed == 7


def test_short_docs_pass_through(spark):
    d = _docs(spark, [(1, "a b c"), (2, "a b c")])  # < 5 tokens: no grams
    out = {r.doc_id: r for r in substring_dedup(d).collect()}
    assert out[1].n_removed == 0 and out[2].n_removed == 0
    assert out[2].clean_text == "a b c"


def test_idempotent_on_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    once = substring_dedup(docs).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = substring_dedup(once)
    assert twice.filter(F.col("n_removed") > 0).count() == 0
