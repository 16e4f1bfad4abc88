"""SURVEY §2.K — Python UDF / pandas UDF / UDTF surface (k1–k6).

The Python boundary is the engine's main perf cliff (SURVEY §3.2): k1 is
row-at-a-time pickle (declared, but documented as the slow path); k2–k6 ride
Arrow record batches (10-100x faster). None of these appear in the engine's
relational hot paths — they exist for user extensibility, exactly like the
reference's per-record Python extraction hooks [U].
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from scopus_spark.catalog import table
from scopus_spark.registry import register


# --- k1: scalar Python UDF (row-at-a-time) ------------------------------------
@register(
    "k1",
    oracle="""
    SELECT p_partkey,
           replace(lower(p_name), ' ', '-') AS slug
    FROM part
    """,
)
def k1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (pickle boundary). Kept off hot paths —
    declared here to cover the surface; k2 shows the vectorized way."""

    @F.udf(StringType())
    def slugify(name: str) -> str:
        return name.lower().replace(" ", "-")

    p = table(spark, sf_dir, "part")
    return p.select("p_partkey", slugify("p_name").alias("slug"))


# --- k2: vectorized pandas UDF, Series -> Series --------------------------------
@register(
    "k2",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(ln(l_extendedprice + 1), 4) AS log_price
    FROM lineitem
    """,
)
def k2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized Series->Series UDF (numpy log1p batch-at-a-time)."""
    import numpy as np

    @F.pandas_udf(DoubleType())
    def log1p_price(s: pd.Series) -> pd.Series:
        return np.log1p(s)

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(log1p_price("l_extendedprice"), 4).alias("log_price"),
    )


# --- k3: grouped-map applyInPandas (per-group z-score) ----------------------------
@register(
    "k3",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round((c_acctbal - avg(c_acctbal) OVER seg)
                 / stddev_samp(c_acctbal) OVER seg, 4) AS bal_z
    FROM customer
    WINDOW seg AS (PARTITION BY c_mktsegment)
    """,
)
def k3_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment z-score via applyInPandas: each group arrives as one
    pandas DataFrame (Arrow). pandas std() is ddof=1 == stddev_samp.
    Scale note: a group must fit in one worker's memory — fine for bounded
    segments; for unbounded keys use the window formulation (the oracle)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        pdf = pdf[["c_custkey", "c_mktsegment"]].copy()
        pdf["bal_z"] = ((bal - bal.mean()) / bal.std(ddof=1)).round(4)
        return pdf

    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(
        zscore, "c_custkey long, c_mktsegment string, bal_z double"
    )


# --- k4: grouped-agg pandas UDAF (weighted mean) -------------------------------------
@register(
    "k4",
    oracle="""
    SELECT o_orderpriority,
           round(sum(o_totalprice * (o_orderkey % 7 + 1))
                 / sum(o_orderkey % 7 + 1), 4) AS w_mean_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def k4_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    o = table(spark, sf_dir, "orders")
    weight = (F.col("o_orderkey") % 7 + 1).cast("double")
    return o.groupBy("o_orderpriority").agg(
        F.round(weighted_mean(F.col("o_totalprice"), weight), 4).alias(
            "w_mean_price"
        )
    )


# --- k5: mapInPandas batch-iterator transform ------------------------------------------
@register(
    "k5",
    oracle="""
    SELECT event_id, user_id, value * 2 AS dvalue
    FROM events
    WHERE value > 100
    """,
)
def k5_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter+project in one Arrow-batch pass — the mapInPandas shape used
    by the multimodal decode operators (operators/multimodal.py)."""
    from collections.abc import Iterator

    def flt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[pdf["value"] > 100]
            yield pd.DataFrame(
                {
                    "event_id": out["event_id"],
                    "user_id": out["user_id"],
                    "dvalue": out["value"] * 2,
                }
            )

    e = table(spark, sf_dir, "events")
    return e.select("event_id", "user_id", "value").mapInPandas(
        flt, "event_id long, user_id long, dvalue double"
    )


# --- k6: Python UDTF (one row in -> N rows out) --------------------------------------------
@register(
    "k6",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           unnest(range(1, least(len(w), 5) + 1))    AS word_no,
           unnest(list_slice(w, 1, least(len(w), 5))) AS word
    FROM t
    """,
)
def k6_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF: explode each doc into its first 5 (word_no,
    word) rows, invoked via LATERAL join in SQL (entry point E2)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word_no bigint, word string")
    class FirstWords:
        def eval(self, text: str):
            for i, word in enumerate(text.split(" ")[:5]):
                yield i + 1, word

    spark.udtf.register("first_words", FirstWords)
    table(spark, sf_dir, "documents")  # ensure view
    return spark.sql(
        "SELECT d.doc_id, fw.word_no, fw.word "
        "FROM documents d, LATERAL first_words(d.text) fw"
    )


# --- k7: mapInArrow (Arrow-native batch transform) ----------------------------------
@register(
    "k7",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    WHERE l_quantity >= 45
    """,
)
def k7_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy tier of the Python boundary — batches
    arrive as pyarrow RecordBatches (no pandas conversion, no pickling).
    The arithmetic runs in Arrow compute kernels, whose float64 ops are
    IEEE-identical to both engines' (C3: emitted raw). The filter is
    applied Spark-side BEFORE the Python boundary so the scan still
    prunes/pushes down."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def charge_batches(batches):
        for b in batches:
            price = b.column("l_extendedprice")
            disc = b.column("l_discount")
            tax = b.column("l_tax")
            charge = pc.multiply(
                pc.multiply(price, pc.subtract(pa.scalar(1.0), disc)),
                pc.add(pa.scalar(1.0), tax),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), charge],
                ["l_orderkey", "l_linenumber", "charge"],
            )

    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")
    )
    return li.mapInArrow(
        charge_batches, "l_orderkey long, l_linenumber int, charge double"
    )


# --- k8: iterator pandas UDF (amortized per-partition initialization) --------------
@register(
    "k8",
    oracle="""
    SELECT doc_id,
           md5('model-v1:' || text) AS scored
    FROM documents
    """,
)
def k8_iterator_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF — the batch-inference shape: the
    expensive initialization (loading a model, opening a tokenizer)
    happens ONCE per partition, outside the batch loop, then every Arrow
    batch streams through the initialized state. A plain Series->Series
    UDF (k2) re-enters Python per batch with no init hook; at 100 TB
    with a multi-GB model the iterator form is the difference between
    one load per executor-core and one per batch. The 'model' here is a
    deterministic md5 scorer (no model weights ship in this container),
    so the oracle reproduces the exact output."""
    import hashlib
    from typing import Iterator

    from pyspark.sql.types import StringType

    def score(batches):
        # one-time per-partition "model load" — amortized across batches
        model_prefix = "model-v1:"
        for s in batches:
            yield s.map(
                lambda t: hashlib.md5((model_prefix + t).encode()).hexdigest()
            )

    # real annotation objects: this module's `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf cannot
    # infer the iterator signature from
    score.__annotations__ = {
        "batches": Iterator[pd.Series],
        "return": Iterator[pd.Series],
    }
    score = F.pandas_udf(StringType())(score)

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", score("text").alias("scored"))


# --- k9: mapInArrow — the zero-pandas Arrow batch API ---------------------------------
@register(
    "k9",
    oracle="""
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(length(text) AS BIGINT) AS measured_chars,
           length(text) = n_chars AS len_agrees
    FROM documents
    """,
)
def k9_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the LOWEST-overhead Python batch API: raw
    pyarrow.RecordBatch in, RecordBatch out, no pandas materialization at
    all (mapInPandas pays Arrow->pandas->Arrow per batch; for
    numeric/string columnar compute pyarrow.compute kernels run directly
    on the Arrow buffers, C++-vectorized, zero-copy). The batch here
    recomputes each document's length with pa.compute.utf8_length and
    audits it against the stored n_chars column — a pure columnar kernel,
    no Python per-row code anywhere.

    Scale: pure map work — no shuffle, executor-parallel, and the Arrow
    batch size rides spark.sql.execution.arrow.maxRecordsPerBatch exactly
    like the pandas tiers (k2-k8); the saved pandas conversion is ~30-50%
    of UDF overhead on wide string batches. Declared as the k-family's
    floor: k1 row-UDF > k2 pandas > k9 arrow in per-row cost."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def measure(batches):
        for batch in batches:
            t = batch.column(batch.schema.get_field_index("text"))
            measured = pc.cast(pc.utf8_length(t), pa.int64())
            n_chars = pc.cast(
                batch.column(batch.schema.get_field_index("n_chars")), pa.int64()
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    n_chars,
                    measured,
                    pc.equal(measured, n_chars),
                ],
                names=["doc_id", "n_chars", "measured_chars", "len_agrees"],
            )

    d = table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    return d.mapInArrow(
        measure,
        "doc_id bigint, n_chars bigint, measured_chars bigint, len_agrees boolean",
    )


def _count_followups(odf: pd.DataFrame, edf: pd.DataFrame) -> int:
    """Sum over orders of |events in [od, od + 1 day)| — interval
    counting via searchsorted on the SORTED event timestamps:
    O((n_o + n_e)·log n_e) time, O(n_e) memory. The obvious
    broadcast-matrix formulation is O(n_o·n_e) BYTES on one Python
    worker — a 10^5 x 10^5 hot key would materialize ~10 GB of bools;
    this form handles it in two binary-search passes (pinned by
    tests/test_udfs_kernels.py on a synthetic hot key)."""
    import numpy as np

    od = odf["od"].to_numpy(dtype="datetime64[us]")
    ts = np.sort(edf["ts"].to_numpy(dtype="datetime64[us]"))
    day = np.timedelta64(1, "D")
    lo = np.searchsorted(ts, od, side="left")
    hi = np.searchsorted(ts, od + day, side="left")
    return int((hi - lo).sum())


# --- k10: cogrouped applyInPandas (two-sided per-key alignment) -----------------------
@register(
    "k10",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS user_id, o_orderdate AS od FROM orders
      WHERE o_custkey <= 200
    ),
    e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE user_id <= 200
    ),
    k AS (SELECT DISTINCT user_id FROM o UNION SELECT DISTINCT user_id FROM e)
    SELECT k.user_id,
           CAST(coalesce((SELECT count(*) FROM o WHERE o.user_id = k.user_id), 0) AS BIGINT)
             AS n_orders,
           CAST(coalesce((SELECT count(*) FROM e WHERE e.user_id = k.user_id), 0) AS BIGINT)
             AS n_events,
           CAST(coalesce((SELECT count(*)
                          FROM o JOIN e ON o.user_id = e.user_id
                                        AND e.ts >= o.od
                                        AND e.ts < o.od + INTERVAL 1 DAY
                          WHERE o.user_id = k.user_id), 0) AS BIGINT)
             AS n_followups
    FROM k
    """,
)
def k10_cogrouped_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUPED applyInPandas — the two-sided Python boundary the
    k-family lacked: orders and events cogroup on user_id and each key's
    TWO pandas frames arrive together, the shape custom cross-source
    alignment logic (as-of matching, trajectory stitching, label
    attachment) actually needs. The kernel counts, per user, events
    landing within 1 day after any of the user's orders — searchsorted
    interval counting over the sorted event timestamps
    (_count_followups: O((n_o+n_e)·log) time, O(n) memory, hot-key
    safe) — plus both side counts
    (keys present on only one side arrive with an EMPTY opposite frame,
    exercised deliberately: user_id <= 200 overlaps only partially
    across the two tables). The oracle recomputes relationally, so the
    hash gate proves cogroup semantics (key union, empty sides, no row
    loss), not just the arithmetic.

    Scale: one shuffle per side on the cogroup key; per-key state is
    one user's rows on each side (the bounded-entity argument of
    k3/o8). The relational form (c15's binned interval join) is the
    planner-friendly path — k10 declares the API for kernels Catalyst
    cannot express."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 200)
        .select(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("od"))
    )
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 200)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    )

    def align(key, odf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
        n_orders = len(odf)
        n_events = len(edf)
        n_follow = _count_followups(odf, edf) if n_orders and n_events else 0
        return pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_orders": [n_orders],
                "n_events": [n_events],
                "n_followups": [n_follow],
            }
        )

    return (
        o.groupBy("user_id")
        .cogroup(e.groupBy("user_id"))
        .applyInPandas(
            align,
            "user_id long, n_orders long, n_events long, n_followups long",
        )
    )


# --- k11: cogrouped applyInArrow (two-sided, zero-pandas Arrow tier) ------------------
@register(
    "k11",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS user_id, o_orderdate AS od FROM orders
      WHERE o_custkey <= 200
    ),
    e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE user_id <= 200
    ),
    k AS (SELECT DISTINCT user_id FROM o UNION SELECT DISTINCT user_id FROM e)
    SELECT k.user_id,
           CAST(coalesce((SELECT count(*) FROM o WHERE o.user_id = k.user_id), 0) AS BIGINT)
             AS n_orders,
           CAST(coalesce((SELECT count(*) FROM e WHERE e.user_id = k.user_id), 0) AS BIGINT)
             AS n_events,
           CAST(coalesce((SELECT count(*)
                          FROM o JOIN e ON o.user_id = e.user_id
                                        AND e.ts >= o.od
                                        AND e.ts < o.od + INTERVAL 1 DAY
                          WHERE o.user_id = k.user_id), 0) AS BIGINT)
             AS n_followups
    FROM k
    """,
)
def k11_cogrouped_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUPED applyInArrow (Spark 4's arrow-native two-sided grouped
    API, the r9 verdict's missing №6) — k10's cross-source alignment
    shape with ZERO pandas materialization: each cogroup key's orders
    and events arrive as two raw pyarrow.Tables (k9's zero-copy tier,
    two-sided), the kernel counts follow-up events within 1 day of any
    order via numpy searchsorted over the Arrow buffers
    (O((n_o+n_e)·log), hot-key safe — never an O(n_o·n_e) matrix), and
    the SAME oracle as k10 pins that the arrow tier returns
    bit-identical results to the pandas tier (key union, empty
    one-sided groups, no row loss). This completes the Python-boundary
    matrix: k1 row UDF / k2-k8 pandas / k9 mapInArrow /
    k10 cogroup-pandas / k11 cogroup-arrow.

    Scale: one shuffle per side on the cogroup key, per-key state one
    entity's rows; the arrow tier saves the Arrow->pandas->Arrow
    round-trip per cogroup (~30-50% of boundary overhead on wide
    batches)."""
    import numpy as np
    import pyarrow as pa

    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 200)
        .select(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("od"))
    )
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 200)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    )

    def align(key, left: "pa.Table", right: "pa.Table") -> "pa.Table":
        n_orders = left.num_rows
        n_events = right.num_rows
        if n_orders and n_events:
            od = (
                left.column("od")
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
            )
            ts = np.sort(
                right.column("ts")
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
            )
            day = np.timedelta64(1, "D")
            n_follow = int(
                (
                    np.searchsorted(ts, od + day, side="left")
                    - np.searchsorted(ts, od, side="left")
                ).sum()
            )
        else:
            n_follow = 0
        return pa.Table.from_pydict(
            {
                "user_id": pa.array([key[0].as_py()], type=pa.int64()),
                "n_orders": pa.array([n_orders], type=pa.int64()),
                "n_events": pa.array([n_events], type=pa.int64()),
                "n_followups": pa.array([n_follow], type=pa.int64()),
            }
        )

    return (
        o.groupBy("user_id")
        .cogroup(e.groupBy("user_id"))
        .applyInArrow(
            align,
            "user_id long, n_orders long, n_events long, n_followups long",
        )
    )
