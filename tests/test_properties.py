"""Property-based spot checks (SURVEY §5.2.5, hypothesis).

Algebraic invariants that hold for ANY input — run against generated
mini-tables and the real corpus where cheap.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from scopus_spark import registry
from scopus_spark.catalog import table
from scopus_spark.operators.similarity import as_double, cosine

QUERIES = registry.all_queries()

ROWS = st.lists(
    st.tuples(
        st.integers(0, 5),                      # key
        st.integers(-100, 100),                 # value
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(a=ROWS, b=ROWS)
@_SETTINGS
def test_union_all_count_additive(spark, a, b):
    da = spark.createDataFrame(a, "k int, v int")
    db = spark.createDataFrame(b, "k int, v int")
    assert da.unionAll(db).count() == len(a) + len(b)


@given(rows=ROWS)
@_SETTINGS
def test_semi_anti_partition_left(spark, rows):
    left = spark.createDataFrame(rows, "k int, v int")
    right = spark.createDataFrame([(r[0],) for r in rows if r[0] % 2 == 0], "k int")
    semi = left.join(right, "k", "left_semi")
    anti = left.join(right, "k", "left_anti")
    assert semi.count() + anti.count() == left.count()
    assert semi.intersect(anti).count() == 0


@given(rows=ROWS)
@_SETTINGS
def test_except_subset_of_left(spark, rows):
    left = spark.createDataFrame(rows, "k int, v int").distinct()
    right = spark.createDataFrame(rows[: len(rows) // 2], "k int, v int")
    diff = left.subtract(right)
    assert diff.count() <= left.count()
    assert diff.subtract(left).count() == 0


@given(rows=ROWS)
@_SETTINGS
def test_row_number_is_group_permutation(spark, rows):
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], "k int, v int, uid int"
    )
    w = Window.partitionBy("k").orderBy(F.col("v").asc(), F.col("uid").asc())
    rn = df.select("k", F.row_number().over(w).alias("rn"))
    per_group = rn.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rn").alias("lo"),
        F.max("rn").alias("hi"),
        F.countDistinct("rn").alias("nd"),
    )
    for r in per_group.collect():
        assert (r.lo, r.hi, r.nd) == (1, r.n, r.n)


def test_cosine_self_is_one(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings").limit(20)
    sims = e.select(
        F.round(cosine(as_double(), as_double()), 9).alias("c")
    ).collect()
    assert all(abs(r.c - 1.0) < 1e-9 for r in sims)


def test_jaccard_pairs_symmetric_bounded(spark, sf_dir):
    """j2 emits each unordered pair once (doc_a<doc_b) with 0<jaccard<=1."""
    for r in QUERIES["j2"](spark, sf_dir).collect():
        assert r.doc_a < r.doc_b
        assert 0.0 < r.jaccard <= 1.0


def test_collect_list_order_invariant(spark):
    rows = [(1, 3), (1, 1), (1, 2), (2, 9)]
    df1 = spark.createDataFrame(rows, "k int, v int")
    df2 = spark.createDataFrame(list(reversed(rows)), "k int, v int")
    get = lambda df: {  # noqa: E731
        r.k: r.vs
        for r in df.groupBy("k")
        .agg(F.sort_array(F.collect_list("v")).alias("vs"))
        .collect()
    }
    assert get(df1) == get(df2)
