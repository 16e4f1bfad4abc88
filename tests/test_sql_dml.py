"""SQL DML front-end (sql_dml.SqlDml) over VersionedTable — the a36
surface.

Contracts:
- MERGE INTO with UPDATE / DELETE / INSERT / NOT MATCHED BY SOURCE
  clauses equals the relational spec, committed as ONE merge commit;
- first-match-wins across WHEN clauses; NULL conditions count false;
- matched rows no clause claims survive untouched;
- ANSI cardinality: a source matching one target row twice raises;
- INSERT with a column list NULL-fills unlisted columns and must set
  key + partition columns; INSERT * maps by name;
- UPDATE/DELETE statements dispatch to merge / delete_keys (DELETE is
  merge-on-read: tombstones only, no file rewrite);
- key/partition columns cannot be assigned; ON must equate exactly the
  registered keys; unregistered targets and parse errors raise;
- OCC: a concurrent merge touching the same partitions makes the SQL
  statement raise CommitConflict (the statement is one OCC commit);
- string literals containing keywords ('WHEN MATCHED', parens) never
  confuse the parser.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from scopus_spark.operators.manifest import CommitConflict, VersionedTable
from scopus_spark.sql_dml import DmlParseError, SqlDml


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, b long")


def _snap(df):
    return sorted((r.k, r.v, r.b) for r in df.collect())


BASE = [(1, "a", 1), (2, "b", 0), (3, "c", 1), (4, "d", 0)]


def _table(spark, tmp_path, name="t"):
    vt = VersionedTable(str(tmp_path / name))
    vt.write_initial(_df(spark, BASE), "b")
    dml = SqlDml(spark)
    dml.register("tgt", vt, key_cols=["k"])
    return vt, dml


def test_merge_update_insert_delete_clauses(spark, tmp_path):
    vt, dml = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "B2", "U"), (3, None, "D"), (9, "new", "I")],
        "k long, v string, op string",
    )
    src.createOrReplaceTempView("src_cdc")
    v = dml.sql(
        """
        MERGE INTO tgt AS t USING src_cdc AS s
        ON t.k = s.k
        WHEN MATCHED AND s.op = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v, b) VALUES (s.k, s.v, s.k % 2)
        """
    )
    assert v == 2  # ONE commit
    assert _snap(vt.read(spark)) == [
        (1, "a", 1),
        (2, "B2", 0),
        (4, "d", 0),
        (9, "new", 1),
    ]


def test_merge_subquery_source_and_not_matched_by_source(spark, tmp_path):
    """Full snapshot sync in one statement: upserts + inserts + delete
    of target rows absent from the source."""
    vt, dml = _table(spark, tmp_path)
    spark.createDataFrame(
        [(1, "a"), (3, "C3"), (5, "e")], "k long, v string"
    ).createOrReplaceTempView("snapshot_b")
    dml.sql(
        """
        MERGE INTO tgt t
        USING (SELECT k, v FROM snapshot_b) s
        ON t.k = s.k
        WHEN MATCHED AND t.v <> s.v THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v, b) VALUES (s.k, s.v, s.k % 2)
        WHEN NOT MATCHED BY SOURCE THEN DELETE
        """
    )
    assert _snap(vt.read(spark)) == [(1, "a", 1), (3, "C3", 1), (5, "e", 1)]


def test_merge_first_match_wins_and_unclaimed_rows_survive(spark, tmp_path):
    vt, dml = _table(spark, tmp_path)
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "k long, v string"
    ).createOrReplaceTempView("src_fm")
    dml.sql(
        """
        MERGE INTO tgt t USING src_fm s ON t.k = s.k
        WHEN MATCHED AND s.k = 1 THEN UPDATE SET v = 'first'
        WHEN MATCHED AND s.k = 1 THEN UPDATE SET v = 'second'
        WHEN MATCHED AND s.k = 99 THEN DELETE
        """
    )
    # k=1 took the FIRST clause; k=2 matched but no clause claimed it
    assert _snap(vt.read(spark)) == [
        (1, "first", 1),
        (2, "b", 0),
        (3, "c", 1),
        (4, "d", 0),
    ]


def test_merge_cardinality_violation_raises(spark, tmp_path):
    vt, dml = _table(spark, tmp_path)
    spark.createDataFrame(
        [(2, "p"), (2, "q")], "k long, v string"
    ).createOrReplaceTempView("src_dup")
    with pytest.raises(ValueError, match="more than once"):
        dml.sql(
            "MERGE INTO tgt t USING src_dup s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v"
        )
    assert vt.version() == 1  # nothing committed


def test_merge_insert_star_and_null_fill(spark, tmp_path):
    vt, dml = _table(spark, tmp_path)
    spark.createDataFrame(
        [(7, "seven", 1)], "k long, v string, b long"
    ).createOrReplaceTempView("src_star")
    dml.sql(
        "MERGE INTO tgt t USING src_star s ON t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert (7, "seven", 1) in _snap(vt.read(spark))
    # column-list insert NULL-fills v
    spark.createDataFrame([(8,)], "k long").createOrReplaceTempView(
        "src_nf"
    )
    dml.sql(
        "MERGE INTO tgt t USING src_nf s ON t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT (k, b) VALUES (s.k, s.k % 2)"
    )
    assert (8, None, 0) in _snap(vt.read(spark))


def test_merge_requires_key_and_partition_in_insert(spark, tmp_path):
    vt, dml = _table(spark, tmp_path)
    spark.createDataFrame([(8,)], "k long").createOrReplaceTempView(
        "src_bad"
    )
    with pytest.raises(ValueError, match="key/partition"):
        dml.sql(
            "MERGE INTO tgt t USING src_bad s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)"
        )


def test_update_statement(spark, tmp_path):
    vt, dml = _table(spark, tmp_path)
    v = dml.sql("UPDATE tgt SET v = upper(v) WHERE b = 1")
    assert v == 2
    assert _snap(vt.read(spark)) == [
        (1, "A", 1),
        (2, "b", 0),
        (3, "C", 1),
        (4, "d", 0),
    ]


def test_delete_statement_is_merge_on_read(spark, tmp_path):
    vt, dml = _table(spark, tmp_path)

    def _files():
        out = set()
        for dp, _, fs in os.walk(os.path.join(vt.root, "data")):
            out.update(
                os.path.join(dp, f) for f in fs if f.endswith(".parquet")
            )
        return out

    before = _files()
    v = dml.sql("DELETE FROM tgt WHERE v IN ('b', 'c')")
    assert v == 2
    assert before <= _files()  # no rewrite: tombstones only
    assert _snap(vt.read(spark)) == [(1, "a", 1), (4, "d", 0)]
    # and the registered read view refreshed
    assert sorted(
        (r.k, r.v, r.b) for r in dml.sql("SELECT * FROM tgt").collect()
    ) == [(1, "a", 1), (4, "d", 0)]


def test_key_partition_assignment_and_on_mismatch_refused(spark, tmp_path):
    vt, dml = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="key/partition"):
        dml.sql("UPDATE tgt SET k = k + 1")
    with pytest.raises(ValueError, match="key/partition"):
        dml.sql("UPDATE tgt SET b = 0")
    spark.createDataFrame(
        [(1, "x", 0)], "k long, v string, b long"
    ).createOrReplaceTempView("src_on")
    with pytest.raises(ValueError, match="key columns"):
        dml.sql(
            "MERGE INTO tgt t USING src_on s ON t.v = s.v "
            "WHEN MATCHED THEN UPDATE SET v = s.v"
        )
    with pytest.raises(DmlParseError, match="conjunction"):
        dml.sql(
            "MERGE INTO tgt t USING src_on s ON t.k > s.k "
            "WHEN MATCHED THEN DELETE"
        )
    with pytest.raises(ValueError, match="not a registered"):
        dml.sql("DELETE FROM nope WHERE 1 = 1")


def test_string_literals_do_not_confuse_parser(spark, tmp_path):
    vt, dml = _table(spark, tmp_path)
    spark.createDataFrame(
        [(2, "WHEN MATCHED THEN (")], "k long, v string"
    ).createOrReplaceTempView("src_lit")
    dml.sql(
        "MERGE INTO tgt t USING src_lit s ON t.k = s.k "
        "WHEN MATCHED AND s.v = 'WHEN MATCHED THEN (' "
        "THEN UPDATE SET v = concat(s.v, ' :)')"
    )
    assert (2, "WHEN MATCHED THEN ( :)", 0) in _snap(vt.read(spark))


def test_merge_occ_conflict_propagates(spark, tmp_path):
    """The SQL statement is one OCC commit: a concurrent merge landing
    on the same partitions between parse and commit conflicts."""
    vt, dml = _table(spark, tmp_path)
    spark.createDataFrame(
        [(2, "sql-side")], "k long, v string"
    ).createOrReplaceTempView("src_occ")

    # fire a concurrent writer INSIDE the statement's merge, after it
    # read its base manifest but before its commit lock — the window
    # _write_commit_data occupies
    orig_wcd = vt._write_commit_data
    fired = {"done": False}

    def _wcd(*a, **kw):
        if not fired["done"]:
            fired["done"] = True
            VersionedTable(vt.root).merge(
                _df(spark, [(6, "raced", 0)]),
                key_cols=["k"],
                partition_col="b",
            )
        return orig_wcd(*a, **kw)

    vt._write_commit_data = _wcd
    with pytest.raises(CommitConflict):
        dml.sql(
            "MERGE INTO tgt t USING src_occ s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v"
        )
    vt._write_commit_data = orig_wcd
    # the racer's commit is intact; a re-run against the new snapshot lands
    dml.sql(
        "MERGE INTO tgt t USING src_occ s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v"
    )
    got = _snap(vt.read(spark))
    assert (2, "sql-side", 0) in got and (6, "raced", 0) in got


def test_update_delete_without_where_cover_whole_table(spark, tmp_path):
    vt, dml = _table(spark, tmp_path)
    dml.sql("UPDATE tgt SET v = 'all'")
    assert {r.v for r in vt.read(spark).collect()} == {"all"}
    dml.sql("DELETE FROM tgt")
    assert vt.read(spark).count() == 0
