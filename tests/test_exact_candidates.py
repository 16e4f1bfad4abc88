"""Round-3 scale plans for j2/j4 must stay EXACT while dropping the
quadratic joins (VERDICT r2 items 3-4).

j2: prefix-filtered near-dup == brute-force shingle self-join, and the
physical plan carries the candidate/verify architecture (no cartesian).
j4: IVF bound-pruned 1-NN == brute-force all-pairs argmax, and the
physical plan contains only cell_id equi-joins + 1-row broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from scopus_spark import registry
from scopus_spark.catalog import table
from scopus_spark.operators.text import word_shingles

QUERIES = registry.all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_j2_matches_bruteforce_shingle_join(spark, sf_dir):
    fast = QUERIES["j2"](spark, sf_dir)
    d = table(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.explode(word_shingles("text")).alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_inter") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter"))
    brute = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.8)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
    assert _rows(fast) == _rows(brute)


def test_j2_plan_is_candidate_verify(spark, sf_dir):
    plan = _plan(QUERIES["j2"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    # the verify stage recomputes exact Jaccard from full sorted sets
    assert "array_intersect" in plan, plan


def test_j4_matches_bruteforce_allpairs(spark, sf_dir):
    fast = QUERIES["j4"](spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform(emb, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    en = e.select("vec_id", "label", emb.alias("emb"), norm.alias("nrm"))
    a, b = en.alias("a"), en.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.emb"), F.col("b.emb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    cos = F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6)
    pairs = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("a.label").alias("label_a"),
        F.col("b.vec_id").alias("nn_id"),
        F.col("b.label").alias("label_b"),
        cos.alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("nn_id").asc()
    )
    brute = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "nn_id",
            "cos_sim",
            (F.col("label_a") == F.col("label_b")).alias("label_match"),
        )
    )
    assert _rows(fast) == _rows(brute)


def test_j4_plan_has_no_cartesian(spark, sf_dir):
    plan = _plan(QUERIES["j4"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "cell_id" in plan, plan


def test_j31_matches_bruteforce_knn_join(spark, sf_dir):
    """The bound-pruned k-NN join equals the brute-force query x corpus
    cross product at every rank, ties included."""
    from scopus_spark.queries.sampling import _bucket

    fast = QUERIES["j31"](spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform(emb, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    en = e.select(
        "vec_id", "label", emb.alias("emb"), norm.alias("nrm"),
        _bucket(F.col("vec_id")).alias("bucket"),
    )
    q = en.filter(F.col("bucket") >= 90).alias("a")
    c = en.filter(F.col("bucket") < 90).alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.emb"), F.col("b.emb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    cos = F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6)
    pairs = q.crossJoin(c).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("a.label").alias("label_a"),
        F.col("b.vec_id").alias("nn_id"),
        F.col("b.label").alias("label_b"),
        cos.alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("nn_id").asc()
    )
    brute = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "vec_id",
            "nn_id",
            F.col("rn").cast("long").alias("rank"),
            "cos_sim",
            (F.col("label_a") == F.col("label_b")).alias("label_match"),
        )
    )
    assert _rows(fast) == _rows(brute)


def test_j31_plan_has_no_cartesian(spark, sf_dir):
    plan = _plan(QUERIES["j31"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "cell_id" in plan, plan


def test_j31_plan_build_schedules_zero_jobs(spark, sf_dir):
    """The declared-lazy contract (VERDICT round-5 item 4): constructing
    the j31 k-NN join DataFrame must schedule NO Spark jobs — n_cells is
    sized from the base table's column-pruned count estimate and the
    centroid checkpoints are lazy (eager=False), so the first action is
    the query itself, not a hidden plan-build pass over the corpus."""
    sc = spark.sparkContext
    sc.setJobGroup("j31_plan_build", "plan construction")
    try:
        df = QUERIES["j31"](spark, sf_dir)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
    jobs = sc.statusTracker().getJobIdsForGroup("j31_plan_build")
    assert list(jobs) == [], f"plan build scheduled jobs: {list(jobs)}"
    assert df.limit(1).count() >= 0  # the lazily-built plan still executes


def test_j28_plan_build_runs_no_count_jobs(spark, sf_dir, monkeypatch):
    """VERDICT r6 item 3: j28's prelude legitimately WRITES the index
    (jobs), but must never size n_cells by counting the corpus — the row
    count comes from parquet footers (catalog.row_count_estimate), the
    j31 pattern. Any DataFrame.count() during construction is the
    anti-pattern coming back."""
    from pyspark.sql import DataFrame

    calls: list[str] = []
    real_count = DataFrame.count

    def spy(self):
        calls.append("count")
        return real_count(self)

    monkeypatch.setattr(DataFrame, "count", spy)
    df = QUERIES["j28"](spark, sf_dir)
    monkeypatch.undo()
    assert calls == [], f"plan build ran DataFrame.count() {len(calls)}x"
    assert df.limit(1).count() >= 0
