"""SURVEY §2.O (added during build, round 1) — dataset sampling & splitting
(m1–m4): the train/val/test plumbing of a training-data pipeline.

Everything HASH-checked is *content-hash* driven (md5 of the stable row
key), never RNG driven: at 100 TB a split must be (a) reproducible across
runs/engines, (b) stable under repartitioning, and (c) assignable map-side
with zero shuffle — properties seeded RNG sampling does not give you
(Spark's sample() is per-partition-seeded, so the sampled *set* changes
with the file split layout even for a fixed seed). The seeded variant is
still part of the surface (m3) with rows-level checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scopus_spark.catalog import table
from scopus_spark.queries.pipeline import J14_QUALITY_SQL
from scopus_spark.registry import register

# Deterministic bucket in [0, 100): top 60 bits of md5 of the key, mod 100.
# DuckDB equivalent: ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT % 100
_BUCKET_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100"


def _bucket(key: Column) -> Column:
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "long"
    ) % 100


# --- m1: deterministic hash split ----------------------------------------------------
@register(
    "m1",
    oracle=f"""
    SELECT CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
                WHEN {_BUCKET_SQL} < 90 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           count(*) AS n_docs,
           count(DISTINCT doc_id) AS n_distinct
    FROM documents
    GROUP BY 1, 2
    """,
)
def m1_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split by content hash of the stable key.
    Assignment is a map-side expression — no shuffle, no RNG state; a doc
    lands in the same split on every engine, every run, any partitioning.
    """
    d = table(spark, sf_dir, "documents")
    split = (
        F.when(_bucket(F.col("doc_id")) < 80, "train")
        .when(_bucket(F.col("doc_id")) < 90, "val")
        .otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("doc_id").alias("n_distinct"),
        )
    )


# --- m2: stratified exact-fraction sample -------------------------------------------
@register(
    "m2",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT doc_id, lang FROM ranked WHERE rn <= ceil(n * 0.1)
    """,
)
def m2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly ceil(10%) of each language stratum, chosen by hash order —
    a deterministic stratified sample (per-stratum quotas are exact, unlike
    Bernoulli sampling). One window shuffle on the stratum key; at scale
    skewed strata are handled by AQE since the window partitions by lang
    only."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    return ranked.filter(F.col("rn") <= F.ceil(F.col("n") * 0.1)).select(
        "doc_id", "lang"
    )


# --- m3: seeded Bernoulli sample (rows-level check) ---------------------------------
@register("m3")  # no oracle: RNG streams are engine-specific by design
def m3_seeded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native seeded Bernoulli sample (sample(fraction, seed)) —
    declared for API surface; the set it draws is a function of the seed
    AND the partition layout, which is exactly why the HASH-checked splits
    (m1/m2) are the production path. Unit tests assert the fraction lands
    in a tolerance band and that a fixed layout + seed reproduces itself."""
    d = table(spark, sf_dir, "documents")
    return d.sample(fraction=0.2, seed=42).select("doc_id", "lang")


# --- m4: deterministic class rebalance ----------------------------------------------
@register(
    "m4",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ),
    mx AS (SELECT max(n) AS m FROM counts)
    SELECT lang,
           n AS n_before,
           CAST(floor(m / n) AS BIGINT) AS rep_factor,
           n * CAST(floor(m / n) AS BIGINT) AS n_after
    FROM counts, mx
    """,
)
def m4_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minority-class oversampling by whole-copy replication: each language
    is replicated floor(max_class/n) times toward balance. The Spark side
    actually MATERIALIZES the replicas (explode over a sequence — map-side
    fan-out, no shuffle until the audit count) and reports the audited
    per-class row counts; the oracle computes the same audit arithmetically.
    Deterministic, unlike RNG oversampling."""
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    mx = counts.agg(F.max("n_before").alias("m"))
    plan = counts.crossJoin(F.broadcast(mx)).select(
        "lang",
        "n_before",
        F.floor(F.col("m") / F.col("n_before")).cast("long").alias("rep_factor"),
    )
    replicated = d.select("doc_id", "lang").join(
        F.broadcast(plan), "lang"
    ).select(
        "lang",
        "n_before",
        "rep_factor",
        F.explode(F.sequence(F.lit(1), F.col("rep_factor"))).alias("copy_no"),
    )
    return replicated.groupBy("lang", "n_before", "rep_factor").agg(
        F.count(F.lit(1)).alias("n_after")
    )


# --- m5: deterministic temperature upsampling (quality-weighted repetition) ----------
@register(
    "m5",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, quality_score FROM ({J14_QUALITY_SQL})
    ),
    w AS (
      SELECT doc_id, quality_score,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  AS DOUBLE) / 1152921504606846976.0 AS u,
             4.0 * quality_score AS wt
      FROM q
    ),
    n AS (
      SELECT doc_id, quality_score,
             CAST(floor(wt) + CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END
                  AS BIGINT) AS n_copies
      FROM w
    )
    SELECT doc_id, quality_score, n_copies,
           CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy_no
    FROM n WHERE n_copies > 0
    """,
)
def m5_temperature_upsampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic temperature upsampling — the data-mixture weighting
    step of a training recipe: each document repeated in the output
    n_copies ∝ its quality weight (here 4x the j14 composite), with the
    fractional part resolved by the doc's md5-uniform draw instead of an
    RNG. floor(w) guaranteed copies + one stochastic-rounding copy gives
    an UNBIASED expected count while staying reproducible under any
    partitioning, retry, or cluster size — the property rand()-based
    sampling cannot give (the m3 argument, extended from keep/drop to
    repetition counts). Fan-out is map-side sequence+explode, bounded by
    the weight cap; no shuffle anywhere."""
    from scopus_spark.queries.pipeline import j14_quality_score

    q = j14_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(1152921504606846976.0)
    )
    wt = 4.0 * F.col("quality_score")
    n = (
        F.floor(wt)
        + F.when(u < wt - F.floor(wt), F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    counted = q.select("doc_id", "quality_score", n.alias("n_copies")).filter(
        F.col("n_copies") > 0
    )
    return counted.select(
        "doc_id",
        "quality_score",
        "n_copies",
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.col("n_copies"))
        ).alias("copy_no"),
    )


# --- m6: exact-k-per-stratum deterministic sample -------------------------------------
@register(
    "m6",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS stratum_n
      FROM documents
    )
    SELECT doc_id, lang, source,
           CAST(rk AS INT) AS rk,
           CAST(stratum_n AS BIGINT) AS stratum_n
    FROM ranked WHERE rk <= 20
    """,
)
def m6_exact_k_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-k stratified sample — the eval-set builder m1/m2 can't
    express: m1's hash split gives each doc an independent Bernoulli
    bucket (stratum sizes only EXPECTED, never exact); here every lang
    stratum yields EXACTLY min(k, n) rows, chosen by md5(doc_id) priority
    order — the distributed analogue of a per-stratum reservoir, with no
    RNG state, reproducible on any engine/partitioning (both engines
    compare the same md5 hex lexicographically; doc_id breaks ties).
    stratum_n rides along so the sampling RATE per stratum is auditable.

    Scale: ONE shuffle on the stratum key, and Catalyst pushes rk<=20
    into the window sort as a per-partition top-k (the e1 rank-pushdown,
    asserted there) — per-stratum state is k rows, never the stratum.
    For strata too hot for one task, pre-aggregate a per-partition top-k
    by the same priority first (associative, like j23's two-level
    cumsum); the declared composition stays identical."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("stratum_n"),
        )
        .filter(F.col("rk") <= 20)
    )


# --- m7: leakage-free temporal split with embargo gap --------------------------------
_M7_TRAIN_END = "2024-01-21 00:00:00"
_M7_TEST_START = "2024-01-24 00:00:00"


@register(
    "m7",
    oracle=f"""
    SELECT CASE WHEN ts < TIMESTAMP '{_M7_TRAIN_END}' THEN 'train'
                ELSE 'test' END AS split,
           event_type,
           CAST(count(*) AS BIGINT)                AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           min(ts) AS t_min,
           max(ts) AS t_max
    FROM events
    WHERE ts < TIMESTAMP '{_M7_TRAIN_END}'
       OR ts >= TIMESTAMP '{_M7_TEST_START}'
    GROUP BY 1, 2
    """,
)
def m7_temporal_embargo_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split with an EMBARGO gap — the split m1-m6
    cannot express: when the model will be used on FUTURE data, a hash
    split leaks (train and test interleave in time, and features built
    from trailing windows straddle the boundary). The fix is the
    quant-finance purged split: train strictly before T_train_end, test
    strictly after T_test_start, and the embargo band between them
    (here 3 days — sized to the longest feature lookback, e.g. o1/o6's
    rolling windows) DROPPED so no trailing aggregate computed on a train
    row can overlap a test row's window. The per-split t_min/t_max ride
    along as the audit: max(train.t_max) < min(test.t_min) minus the gap
    is checked in tests/test_sampling.py.

    Scale: split assignment is a map-side predicate on the partition
    column a 100 TB event lake is laid out on (dt=...), so Catalyst prunes
    whole partitions per side — neither a shuffle nor an RNG draw anywhere;
    the audit agg exchanges <= 2 * n_event_types rows."""
    ev = table(spark, sf_dir, "events")
    train_end = F.lit(_M7_TRAIN_END).cast("timestamp")
    test_start = F.lit(_M7_TEST_START).cast("timestamp")
    kept = ev.filter((F.col("ts") < train_end) | (F.col("ts") >= test_start))
    split = F.when(F.col("ts") < train_end, "train").otherwise("test")
    return kept.groupBy(split.alias("split"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.min("ts").alias("t_min"),
        F.max("ts").alias("t_max"),
    )


# --- m8: rolling-origin cross-validation splits ------------------------------------
_M8_FOLDS = [
    (1, "2024-01-11", "2024-01-16"),
    (2, "2024-01-16", "2024-01-21"),
    (3, "2024-01-21", "2024-01-26"),
]


@register(
    "m8",
    oracle="""
    WITH folds(fold, train_end, test_end) AS (
      VALUES (CAST(1 AS BIGINT), TIMESTAMP '2024-01-11', TIMESTAMP '2024-01-16'),
             (CAST(2 AS BIGINT), TIMESTAMP '2024-01-16', TIMESTAMP '2024-01-21'),
             (CAST(3 AS BIGINT), TIMESTAMP '2024-01-21', TIMESTAMP '2024-01-26')
    )
    SELECT f.fold,
           CASE WHEN e.ts < f.train_end THEN 'train' ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT)                AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           min(e.ts) AS t_min,
           max(e.ts) AS t_max
    FROM events e JOIN folds f ON e.ts < f.test_end
    GROUP BY 1, 2
    """,
)
def m8_rolling_origin_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (expanding-window) cross-validation splits — the
    forecast-evaluation protocol (Tashman 2000) m7's single purged split
    generalizes to: fold f trains on everything before its origin and
    tests on the next 5-day horizon; origins roll forward so every fold
    respects causality and later folds subsume earlier training data.
    Output = the per-(fold, split) audit (counts, user reach, time
    bounds) a training run records before fitting anything.

    Scale: fold assignment is a range predicate against a 3-row
    broadcast fold table (BroadcastNestedLoopJoin by design — the
    bounded-dim exception, plan-audit allow-listed); each event fans out
    to at most n_folds rows. On a dt-partitioned event lake every
    fold's predicate prunes partitions; no RNG, no shuffle beyond the
    audit agg's <= 2 * n_folds * n_types rows. Re-derive folds from the
    immutable log per run (m7's lineage argument) rather than
    materializing split tables."""
    ev = table(spark, sf_dir, "events")
    folds = spark.createDataFrame(
        _M8_FOLDS, "fold long, train_end string, test_end string"
    ).select(
        "fold",
        F.col("train_end").cast("timestamp").alias("train_end"),
        F.col("test_end").cast("timestamp").alias("test_end"),
    )
    joined = ev.join(
        F.broadcast(folds), ev.ts < folds.test_end
    )
    split = F.when(F.col("ts") < F.col("train_end"), "train").otherwise(
        "test"
    )
    return joined.groupBy("fold", split.alias("split")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.min("ts").alias("t_min"),
        F.max("ts").alias("t_max"),
    )


# --- m9: weighted sampling without replacement (Efraimidis-Spirakis) -----------------
# Deterministic uniform in (0, 1]: top-60-bit md5 integer h ∈ [0, 2^60),
# u = (h + 1) / 2^60. The int64→double rounding of (h + 1) is the same
# IEEE round-to-nearest on both engines and the 2^60 divisor is a power of
# two (exact scaling), so u is bit-identical across engines.
_M9_K = 50
_M9_U_SQL = (
    "((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)"
    " / 1152921504606846976.0)"
)


@register(
    "m9",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             -ln({_M9_U_SQL}) / CAST(n_chars + 1 AS DOUBLE) AS pri
      FROM documents
    )
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (ORDER BY pri, doc_id) AS rn
      FROM keyed
    ) WHERE rn <= {_M9_K}
    """,
)
def m9_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling without replacement (Efraimidis-Spirakis 2006,
    the exponential-clocks form): each doc draws a deterministic uniform
    u from the md5 of its stable key and gets priority -ln(u)/w with
    w = n_chars + 1; the k smallest priorities are the sample. This is
    distributionally exactly weighted sampling without replacement, yet —
    because u is content-hash-derived, not RNG state — the chosen SET is
    reproducible across engines, runs, and any partition layout (the m1
    argument applied to weighted draws: data-mixture sampling at 100 TB
    must be replayable).

    Scale: priority is a map-side expression; selection is a global
    top-k = TakeOrderedAndProject (no global sort materialization, the
    f2 shape). ln() is evaluated on bit-identical doubles on both
    engines; keys are only ordered by (never emitted), so a last-ulp
    libm divergence could matter only if two docs' priorities collide
    within ~1e-16 relative — measure-zero for hash-spread inputs, and
    the oracle gate would catch it."""
    d = table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(1152921504606846976.0)
    pri = -F.log(u) / (F.col("n_chars") + F.lit(1)).cast("double")
    return (
        d.select("doc_id", "lang", "n_chars", pri.alias("pri"))
        .orderBy("pri", "doc_id")
        .limit(_M9_K)
        .select("doc_id", "lang", "n_chars")
    )


# --- m10: temperature-scaled source mixture weights (data-mixture planning) -----------
_M10_ALPHA = 0.7
_M10_BUDGET = 1_000_000


@register(
    "m10",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_docs, n_chars,
             exp({_M10_ALPHA} * ln(CAST(n_docs AS DOUBLE))) AS raw_w
      FROM s
    ),
    z AS (SELECT CAST(sum(CAST(raw_w AS DECIMAL(38,18))) AS DOUBLE) AS z
          FROM w)
    SELECT w.source, w.n_docs, w.n_chars,
           round(w.raw_w / z.z, 6) + 0.0 AS mix_weight,
           CAST(floor({_M10_BUDGET} * (round(w.raw_w / z.z, 6) + 0.0))
                AS BIGINT) AS token_budget
    FROM w CROSS JOIN z
    """,
)
def m10_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-SCALED DATA-MIXTURE PLANNING — the multilingual /
    multi-source sampling recipe (exponentiated-count smoothing,
    alpha = 0.7 as in XLM-R / mT5): per source, weight ∝ n_docs^alpha,
    normalized, plus the integer token budget a 1M-token training epoch
    would allocate. Alpha < 1 upsamples the tail sources and downsamples
    the head — the knob every multi-corpus pretraining mix is tuned
    with; this emits the exact plan a sampler (m1/m9's machinery)
    executes. No RNG: the op is pure aggregation arithmetic, so it is
    HASH-gated — n^alpha is written exp(alpha·ln n) IDENTICALLY in both
    engines (one libm exp + one libm ln on the same doubles), and the
    weight surfaces rounded.

    Scale: one partial-aggregated groupBy(source) (bounded key space) +
    a 1-row normalizer broadcast — the same shape at any corpus size."""
    d = table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    raw_w = F.exp(F.lit(_M10_ALPHA) * F.log(F.col("n_docs").cast("double")))
    w = s.withColumn("raw_w", raw_w)
    # order-insensitive normalizer: the double sum would depend on
    # partition order; summing through DECIMAL(38,18) is exact, so both
    # engines (and any partitioning) agree bit-for-bit (the n6 trick)
    z = w.agg(
        F.sum(F.col("raw_w").cast("decimal(38,18)"))
        .cast("double")
        .alias("z")
    )
    return w.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_chars",
        (F.round(F.col("raw_w") / F.col("z"), 6) + F.lit(0.0)).alias(
            "mix_weight"
        ),
        # budget rides the ROUNDED ratio (round-before-compare, the repo
        # hash-gate convention): floor of budget * an UNROUNDED exp/ln
        # quotient could flip across engines' libm when the product lands
        # within 1 ulp of an integer (ADVICE r8). round(x, 6) yields the
        # identical double on both engines (mix_weight already rides it),
        # so budget * it and the floor are bit-identical too.
        F.floor(
            F.lit(_M10_BUDGET)
            * (F.round(F.col("raw_w") / F.col("z"), 6) + F.lit(0.0))
        )
        .cast("long")
        .alias("token_budget"),
    )
