"""Local mirror of the driver's DuckDB-oracle comparison.

The driver runs each queries()[k] on Spark and oracle_sql()[k] on DuckDB over
the same parquet, then compares row count + schema + order-insensitive
value-hash (SURVEY §0.3). This harness reproduces that check locally so a
mismatch is caught (with a readable diff) before the driver sees it.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from scopus_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v: Any) -> Any:
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # both sides round per C3 already; this only folds -0.0/ulp noise
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _rowset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(canon, key=repr)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Assert the Spark DataFrame and the DuckDB result match (driver-style).

    ``spark_df`` may also be a pre-collected ``(columns, rows)`` pair from
    the session result cache (r11) — the compare logic is identical."""
    if isinstance(spark_df, tuple):
        s_cols, s_rows = spark_df
    else:
        s_cols = spark_df.columns
        s_rows = [tuple(r) for r in spark_df.collect()]

    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), (
        f"column-name mismatch:\n spark={sorted(s_cols)}\n duck ={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row-count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )

    s_set = _rowset(s_cols, s_rows)
    d_set = _rowset(d_cols, d_rows)
    if s_set != d_set:
        diffs = [
            (a, b) for a, b in zip(s_set, d_set) if a != b
        ][:5]
        raise AssertionError(
            "value mismatch (first 5 differing sorted rows):\n"
            + "\n".join(f" spark={a}\n duck ={b}" for a, b in diffs)
        )
