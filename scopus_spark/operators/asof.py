"""Generic as-of join (SURVEY §2.C c16) — the time-series join Spark has
no native operator for (DuckDB/Polars/kdb ship one; Spark composes it).

Backward as-of semantics: for each left row, attach the single right row
with the greatest right_ts <= left_ts within the same key (ties at the
exact boundary instant match, mirroring DuckDB's ``ASOF JOIN ... ON
l.ts >= r.ts``), NULLs when no prior right row exists.

Composition instead of a join: a raw non-equi join on (key, ts-range) is
quadratic per key; sort-merge-asof needs co-partitioned ordered sides.
The Spark-native shape is union + ONE per-key time-ordered window with
``last(payload, ignorenulls=True)``: each side shuffles once on the key,
the window scans each partition once, and skew is bounded by the hottest
key (the same bound any per-key operator has). The right payload rides as
ONE struct column, so the window state is a single value regardless of
how many columns are attached.

Caller contract: right_ts values must be unique per key (pre-dedup with
max_by — queries/joins.py c16 shows the shape); otherwise which same-ts
right row wins is nondeterministic (DuckDB ASOF has the same caveat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join; returns all left columns plus
    ``prefix+col`` for each of right_cols (NULL when no match)."""
    l2 = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    # _side orders right rows BEFORE left rows at an equal timestamp, so a
    # boundary-instant right row is visible to the frame: >= semantics.
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = (
        u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out = picked.select(
        "_l.*",
        *[F.col("_m")[c].alias(f"{prefix}{c}") for c in right_cols],
    )
    return out
