"""operators/dedup.paragraph_dedup — corpus-wide paragraph dedup (j47,
the C4 recipe step). Contracts: global first occurrence wins, reassembly
preserves order, and the operation is IDEMPOTENT (re-running on its own
clean output removes nothing)."""

from __future__ import annotations

from scopus_spark.operators.dedup import paragraph_dedup


def _mk(spark, docs, par_tokens=3):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r.doc_id: (r.n_pars, r.n_removed, r.clean_text)
        for r in paragraph_dedup(df, par_tokens=par_tokens).collect()
    }


def test_first_occurrence_wins_and_reassembly_ordered(spark):
    # doc 1 owns "a b c"; doc 2 repeats it twice around its own paragraph
    got = _mk(
        spark,
        [(1, "a b c x y z"), (2, "a b c q r s a b c")],
        par_tokens=3,
    )
    assert got[1] == (2, 0, "a b c x y z")
    # doc 2: pars = [a b c][q r s][a b c] -> both copies dropped (doc 1
    # owns the hash), survivor order preserved
    assert got[2] == (3, 2, "q r s")


def test_within_doc_repeat_keeps_first_copy(spark):
    got = _mk(spark, [(7, "p p p p p p")], par_tokens=3)
    # [p p p][p p p]: first copy kept, second dropped
    assert got[7] == (2, 1, "p p p")


def test_fully_duplicated_doc_reassembles_empty(spark):
    got = _mk(spark, [(1, "a b c"), (2, "a b c")], par_tokens=3)
    assert got[1] == (1, 0, "a b c")
    assert got[2] == (1, 1, "")


def test_idempotent_on_real_corpus(spark, sf_dir):
    from scopus_spark.catalog import table

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    once = paragraph_dedup(d, par_tokens=20)
    assert once.agg({"n_removed": "sum"}).collect()[0][0] > 0
    again = paragraph_dedup(
        once.filter("clean_text <> ''").select(
            "doc_id", once.clean_text.alias("text")
        ),
        par_tokens=20,
    )
    assert again.agg({"n_removed": "sum"}).collect()[0][0] == 0
