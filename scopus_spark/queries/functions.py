"""SURVEY §2.H — scalar function families (h1–h10).

Every function used here was cross-verified Spark↔DuckDB in the survey
session (convention C6); dialect gaps are handled exactly as C6 prescribes
(manual initcap, explicit regex group index, 'g' flag on DuckDB
regexp_replace, explicit casts where return types differ).

All map-side: no shuffle, whole-stage-codegen'd, scale-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.registry import register


# --- h1: string basics -------------------------------------------------------
@register(
    "h1",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                        AS name_upper,
           lower(p_brand)                                       AS brand_lower,
           CAST(length(p_name) AS INT)                          AS name_len,
           trim('  ' || p_name || '  ')                         AS name_trim,
           ltrim('xx' || p_name, 'x')                           AS name_ltrim,
           rtrim(p_name || 'yy', 'y')                           AS name_rtrim,
           substring(p_name, 1, 5)                              AS name_sub,
           concat(p_brand, ':', p_type)                         AS brand_type,
           concat_ws('-', p_brand, p_type, CAST(p_size AS VARCHAR)) AS brand_type_size,
           lpad(CAST(p_size AS VARCHAR), 4, '0')                AS size_lpad,
           rpad(p_brand, 12, '.')                               AS brand_rpad,
           repeat('ab', 3)                                      AS rep_ab,
           reverse(p_name)                                      AS name_rev,
           replace(p_name, ' ', '_')                            AS name_snake,
           split_part(p_name, ' ', 1)                           AS first_word,
           translate(p_name, 'aeiou', 'AEIOU')                  AS name_vowels,
           concat(upper(substring(split_part(p_name,' ',1),1,1)),
                  lower(substring(split_part(p_name,' ',1),2)))  AS first_word_initcap
    FROM part
    """,
)
def h1_string_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    first_word = F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias(
            "name_trim"
        ),
        F.ltrim(F.concat(F.lit("xx"), F.col("p_name")), F.lit("x")).alias("name_ltrim"),
        F.rtrim(F.concat(F.col("p_name"), F.lit("yy")), F.lit("y")).alias("name_rtrim"),
        F.substring("p_name", 1, 5).alias("name_sub"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.concat_ws(
            "-", F.col("p_brand"), F.col("p_type"), F.col("p_size").cast("string")
        ).alias("brand_type_size"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_lpad"),
        F.rpad("p_brand", 12, ".").alias("brand_rpad"),
        F.repeat(F.lit("ab"), 3).alias("rep_ab"),
        F.reverse("p_name").alias("name_rev"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        first_word.alias("first_word"),
        F.translate(F.col("p_name"), "aeiou", "AEIOU").alias("name_vowels"),
        # manual initcap (C6: DuckDB 1.0 lacks initcap)
        F.concat(
            F.upper(F.substring(first_word, 1, 1)),
            F.lower(F.substring(first_word, 2, 1000)),
        ).alias("first_word_initcap"),
    )


# --- h3: regex family --------------------------------------------------------
@register(
    "h3",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 1)   AS adj,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2)   AS noun,
           regexp_replace(p_name, '[aeiou]', '*', 'g')      AS name_starred,
           regexp_matches(p_type, '^[A-Z]+$')               AS type_allcaps
    FROM part
    """,
)
def h3_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 1).alias("adj"),
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("noun"),
        # Spark replaces all matches by default; DuckDB needs the 'g' flag (C6)
        F.regexp_replace("p_name", "[aeiou]", "*").alias("name_starred"),
        F.col("p_type").rlike("^[A-Z]+$").alias("type_allcaps"),
    )


# --- h4: date/time extraction -------------------------------------------------
@register(
    "h4",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                      AS o_year,
           CAST(month(o_orderdate) AS INT)                     AS o_month,
           CAST(day(o_orderdate) AS INT)                       AS o_day,
           CAST(quarter(o_orderdate) AS INT)                   AS o_quarter,
           CAST(date_trunc('day',   o_orderdate) AS TIMESTAMP) AS trunc_day,
           CAST(date_trunc('week',  o_orderdate) AS TIMESTAMP) AS trunc_week,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS trunc_month
    FROM orders
    """,
)
def h4_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.date_trunc("day", "o_orderdate").alias("trunc_day"),
        F.date_trunc("week", "o_orderdate").alias("trunc_week"),
        F.date_trunc("month", "o_orderdate").alias("trunc_month"),
    )


# --- h5: date/time arithmetic --------------------------------------------------
@register(
    "h5",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since_95,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP)  AS plus3m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)           AS month_end,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)                     AS as_date,
           CAST(epoch(o_orderdate) AS BIGINT)                            AS epoch_s,
           CAST(to_timestamp(epoch(o_orderdate)) AS TIMESTAMP)           AS from_epoch
    FROM orders
    """,
)
def h5_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        # DATE results ship as midnight TIMESTAMPs (representation policy R1:
        # Spark date -> pandas object(datetime.date) but DuckDB DATE ->
        # datetime64 — a driver dtype-tag mismatch; timestamp agrees on both).
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3m"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.to_date("o_orderdate").cast("timestamp").alias("as_date"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.timestamp_seconds(F.unix_timestamp("o_orderdate")).alias("from_epoch"),
    )


# --- h6: math ------------------------------------------------------------------
@register(
    "h6",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 2)                      AS price_r2,
           abs(l_extendedprice - 30000)                   AS abs_dev,
           CAST(ceil(l_extendedprice) AS BIGINT)          AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT)         AS price_floor,
           sqrt(l_quantity)                               AS qty_sqrt,
           round(pow(l_discount + 1, 2), 4)               AS disc_sq,
           round(ln(l_extendedprice), 4)                  AS price_ln,
           round(log10(l_extendedprice), 4)               AS price_log10,
           fmod(l_quantity, 7.0)                          AS qty_mod7,
           CAST(sign(l_extendedprice - 30000) AS DOUBLE)  AS dev_sign,
           round(exp(l_discount), 4)                      AS disc_exp
    FROM lineitem
    """,
)
def h6_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price_r2"),
        F.abs(F.col("l_extendedprice") - 30000).alias("abs_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.pow(F.col("l_discount") + 1, 2), 4).alias("disc_sq"),
        F.round(F.log(F.col("l_extendedprice")), 4).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 4).alias("price_log10"),
        # l_quantity >= 0 so pmod == fmod here (C6)
        F.pmod(F.col("l_quantity"), F.lit(7.0)).alias("qty_mod7"),
        F.signum(F.col("l_extendedprice") - 30000).alias("dev_sign"),
        F.round(F.exp("l_discount"), 4).alias("disc_exp"),
    )


# --- h10: hash/crypto ------------------------------------------------------------
@register(
    "h10",
    oracle="""
    SELECT doc_id,
           sha256(text) AS text_sha256,
           md5(text)    AS text_md5,
           sha256(concat(lang, '|', source)) AS meta_sha256
    FROM documents
    """,
)
def h10_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.col("text")).alias("text_md5"),
        F.sha2(F.concat(F.col("lang"), F.lit("|"), F.col("source")), 256).alias(
            "meta_sha256"
        ),
    )


# --- h2: split + explode (word counts over documents.text) -------------------
@register(
    "h2",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    """,
)
def h2_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + explode + count — the canonical text fan-out. At 100 TB
    the explode multiplies rows ~100x; the downstream agg is map-side
    combined so the shuffle carries only distinct words per partition."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- h7: array / higher-order functions over embeddings ----------------------
@register(
    "h7",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT)                                   AS dim,
           CAST(embedding[1] AS DOUBLE)                                  AS first_1,
           CAST(embedding[2] AS DOUBLE)                                  AS first_2,
           CAST(embedding[3] AS DOUBLE)                                  AS first_3,
           round(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                               x -> abs(x)), 'sum'), 4)  AS l1_norm,
           list_max(CAST(embedding AS DOUBLE[]))                         AS max_comp,
           list_min(CAST(embedding AS DOUBLE[]))                         AS min_comp,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS INT) AS n_pos,
           list_contains([1, 2, 3], label)                               AS label_in_123
    FROM embeddings
    """,
)
def h7_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The leading-slice probe is emitted as three scalar DOUBLE columns, not
    # an array column (representation policy R1 — harness hashability).
    e = table(spark, sf_dir, "embeddings")
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        emb.getItem(0).alias("first_1"),
        emb.getItem(1).alias("first_2"),
        emb.getItem(2).alias("first_3"),
        F.round(
            F.aggregate(
                F.transform(emb, lambda x: F.abs(x)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("l1_norm"),
        F.array_max(emb).alias("max_comp"),
        F.array_min(emb).alias("min_comp"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.array_contains(F.array(F.lit(1), F.lit(2), F.lit(3)), F.col("label")).alias(
            "label_in_123"
        ),
    )


# --- h8: map construction/access (compared as exploded rows, C6/h8 note) ------
@register(
    "h8",
    oracle="""
    SELECT doc_id, 'lang' AS k, lang AS v, lang AS lang_val FROM documents
    UNION ALL
    SELECT doc_id, 'source' AS k, source AS v, lang AS lang_val FROM documents
    """,
)
def h8_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map type exercised Spark-side (create_map/element_at/explode); the
    oracle produces the identical exploded (k,v) rows relationally — map
    ordering never reaches the hash (SURVEY h8 strategy)."""
    d = table(spark, sf_dir, "documents")
    mp = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.explode(mp).alias("k", "v"),
        F.element_at(mp, "lang").alias("lang_val"),
    )


# --- h9: JSON extraction (events.props) ----------------------------------------
@register(
    "h9",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k_get,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY k_get
    """,
)
def h9_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k_get = F.get_json_object("props", "$.k").cast("int").alias("k_get")
    return (
        e.select(k_get, "value", F.from_json("props", "k INT").alias("j"))
        .withColumn("k_schema", F.col("j.k"))
        .groupBy("k_get")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(9,2)")).cast("double").alias("sum_value"),
        )
    )


# --- h11: bitwise function family ------------------------------------------------
@register(
    "h11",
    oracle="""
    SELECT event_id,
           user_id & 255                       AS and_mask,
           user_id | 4096                      AS or_mask,
           xor(user_id, 1365)                  AS xor_mask,
           user_id << 3                        AS shifted_left,
           user_id >> 2                        AS shifted_right,
           CAST(bit_count(user_id) AS INTEGER) AS n_bits
    FROM events
    WHERE event_id % 7 = 0
    """,
)
def h11_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: AND/OR/XOR masks, shifts, popcount — the primitive
    layer under the SimHash/banding operators (§2.L), exercised directly.
    Two's-complement int64 semantics agree across engines on these
    non-negative ids; all map-side codegen."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    u = F.col("user_id")
    return e.select(
        "event_id",
        u.bitwiseAND(F.lit(255)).alias("and_mask"),
        u.bitwiseOR(F.lit(4096)).alias("or_mask"),
        u.bitwiseXOR(F.lit(1365)).alias("xor_mask"),
        F.shiftleft(u, 3).alias("shifted_left"),
        F.shiftright(u, 2).alias("shifted_right"),
        F.bit_count(u).alias("n_bits"),
    )


# --- h12: temporal series generation (sequence + explode) --------------------------
@register(
    "h12",
    oracle="""
    SELECT o_orderkey,
           unnest(generate_series(o_orderdate,
                                  o_orderdate + INTERVAL 4 DAY,
                                  INTERVAL 1 DAY)) AS day
    FROM orders
    WHERE o_orderkey % 200 = 0
    """,
)
def h12_date_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row temporal series fan-out: each order expanded to its 5-day
    window (sequence + explode) — the calendar-densification primitive
    (gap filling, SCD snapshots). Inclusive endpoints verified equal to
    DuckDB generate_series. Map-side fan-out; at scale the explosion
    factor is the constant 5, not data-dependent."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 200 == 0)
    series = F.sequence(
        F.col("o_orderdate"),
        F.col("o_orderdate") + F.expr("INTERVAL 4 DAY"),
        F.expr("INTERVAL 1 DAY"),
    )
    return o.select("o_orderkey", F.explode(series).alias("day"))


# --- h13: null-preserving fan-out (explode_outer) ----------------------------------
@register(
    "h13",
    oracle="""
    SELECT d.doc_id, u.word
    FROM documents d
    LEFT JOIN (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), w -> w LIKE 'b%'))
               AS word
      FROM documents
    ) u ON d.doc_id = u.doc_id
    """,
)
def h13_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: fan out each doc's b-words but KEEP docs with none as
    a (doc_id, NULL) row — the left-join-preserving explode a feature
    pipeline needs so sparse features don't silently drop documents. The
    oracle states the same semantics as an actual LEFT JOIN on the
    unnested rows."""
    d = table(spark, sf_dir, "documents")
    bwords = F.filter(F.split("text", " "), lambda w: w.startswith("b"))
    return d.select("doc_id", F.explode_outer(bwords).alias("word"))


# --- h15: array set-operations family ----------------------------------------------
@register(
    "h15",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_slice(string_split(text, ' '), 1, 6) AS a,
             list_slice(string_split(text, ' '), 4, 9) AS b
      FROM documents
    )
    SELECT doc_id,
           -- coalesce: DuckDB array_to_string([]) is NULL, Spark array_join is ''
           coalesce(array_to_string(list_sort(list_distinct(list_intersect(a, b))),
                                    '|'), '')               AS a_intersect_b,
           coalesce(array_to_string(list_sort(list_distinct(a || b)), '|'), '')
                                                            AS a_union_b,
           coalesce(array_to_string(list_sort(list_distinct(
             list_filter(a, x -> NOT list_contains(b, x)))), '|'), '')
                                                            AS a_except_b,
           coalesce(array_to_string(flatten([a, b]), '|'), '') AS a_concat_b,
           len(a)                                           AS n_a
    FROM t
    """,
)
def h15_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (intersect/union/except/flatten) over overlapping
    token slices. Set-valued outputs are sort_array-wrapped on both sides
    (C5: Spark preserves first-argument order, DuckDB doesn't — only the
    set is the contract) and emitted as '|'-joined strings (representation
    policy R1 — no array-typed result columns). All map-side expressions."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = d.select(
        "doc_id",
        F.slice(toks, 1, 6).alias("a"),
        F.slice(toks, 4, 6).alias("b"),
    )
    return t.select(
        "doc_id",
        F.array_join(F.sort_array(F.array_intersect("a", "b")), "|").alias(
            "a_intersect_b"
        ),
        F.array_join(F.sort_array(F.array_union("a", "b")), "|").alias("a_union_b"),
        F.array_join(F.sort_array(F.array_except("a", "b")), "|").alias("a_except_b"),
        F.array_join(F.flatten(F.array("a", "b")), "|").alias("a_concat_b"),
        F.size("a").alias("n_a"),
    )


# --- h16: URL parsing family (web-corpus analysis) ----------------------------------
@register(
    "h16",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.org/docs/' || lang
             || '?id=' || CAST(doc_id AS VARCHAR) || '&ref=corpus' AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, 'https?://([^/]+)', 1)          AS host,
           regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1)    AS path,
           regexp_extract(url, '\\?(.*)$', 1)                  AS query,
           regexp_extract(url, '[?&]id=([^&]*)', 1)            AS id_param,
           regexp_extract(url,
             'https?://(?:[^/.]+\\.)?([^/.]+\\.[^/.]+)(?:/|$)', 1)
                                                               AS reg_domain
    FROM u
    """,
)
def h16_url_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL analysis — the first pass over any web corpus (domain quality
    filters, per-site caps, dedup by canonical URL). URLs are built
    deterministically from row fields, then dissected with Spark's native
    parse_url (HOST/PATH/QUERY/param) plus a registered-domain regex; the
    oracle states identical semantics as RE2-compatible regexes. All
    map-side."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("lang"),
        F.lit("?id="),
        F.col("doc_id").cast("string"),
        F.lit("&ref=corpus"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("id_param"),
        F.regexp_extract(
            "url", r"https?://(?:[^/.]+\.)?([^/.]+\.[^/.]+)(?:/|$)", 1
        ).alias("reg_domain"),
    )


# --- h17: string-distance family (fuzzy matching surface) ---------------------------
@register(
    "h17",
    oracle="""
    SELECT doc_id,
           CAST(levenshtein(source, lang) AS INT)                 AS lev_source_lang,
           CAST(levenshtein(substr(text, 1, 12), source) AS INT)  AS lev_prefix_source,
           CAST(levenshtein(source, 'src1') AS INT)               AS lev_to_src1,
           (levenshtein(source, 'src1')
              <= CAST(greatest(length(source), 4) / 4 AS INT))    AS near_src1
    FROM documents
    """,
)
def h17_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance family — the fuzzy-match primitive an author/affiliation
    disambiguation pass runs (the reference's corpus carries free-text
    names; near-match on edit distance is the standard blocking-verify
    step). Pure map-side JVM expressions; both engines implement classic
    Levenshtein so values hash exactly. The banded threshold column shows
    the length-relative cutoff shape used in record linkage."""
    d = table(spark, sf_dir, "documents")
    lev_to_src1 = F.levenshtein("source", F.lit("src1"))
    return d.select(
        "doc_id",
        F.levenshtein("source", "lang").alias("lev_source_lang"),
        F.levenshtein(F.substring("text", 1, 12), F.col("source")).alias(
            "lev_prefix_source"
        ),
        lev_to_src1.alias("lev_to_src1"),
        (
            lev_to_src1
            <= (F.greatest(F.length("source"), F.lit(4)) / 4).cast("int")
        ).alias("near_src1"),
    )


# --- h18: VARIANT semi-structured type (Spark 4 open JSON type) ---------------------
@register(
    "h18",
    oracle="""
    WITH j AS (
      SELECT event_id,
             '{"meta": {"type": "' || event_type || '", "user": ' ||
             CAST(user_id AS VARCHAR) || '}, "vals": [' ||
             CAST(value AS VARCHAR) || ', ' || CAST(value * 2 AS VARCHAR) ||
             '], "props": ' || props || '}' AS js
      FROM events
    )
    SELECT event_id,
           json_extract_string(js, '$.meta.type')            AS meta_type,
           CAST(json_extract(js, '$.meta.user') AS BIGINT)   AS meta_user,
           CAST(json_extract(js, '$.vals[1]') AS DOUBLE)     AS val2,
           CAST(json_extract(js, '$.props.k') AS INT)        AS prop_k
    FROM j
    """,
)
def h18_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT (the open semi-structured type): a nested JSON doc is
    built deterministically from event fields, parsed ONCE into a variant,
    then path-extracted with typed variant_get — the modern replacement
    for repeated get_json_object string re-parsing (one binary-encoded
    parse, O(1) typed path reads). Oracle reads the identical JSON with
    DuckDB's JSON type. Scale: parse + extraction are map-side;
    variant binary encoding keeps per-row parse cost once no matter how
    many paths are read."""
    e = table(spark, sf_dir, "events")
    js = F.concat(
        F.lit('{"meta": {"type": "'), F.col("event_type"), F.lit('", "user": '),
        F.col("user_id").cast("string"), F.lit('}, "vals": ['),
        F.col("value").cast("string"), F.lit(", "),
        (F.col("value") * 2).cast("string"), F.lit('], "props": '),
        F.col("props"), F.lit("}"),
    )
    v = F.parse_json(js)
    return e.select(
        "event_id",
        F.variant_get(v, "$.meta.type", "string").alias("meta_type"),
        F.variant_get(v, "$.meta.user", "long").alias("meta_user"),
        F.variant_get(v, "$.vals[1]", "double").alias("val2"),
        F.variant_get(v, "$.props.k", "int").alias("prop_k"),
    )


# --- h19: regexp_extract_all (multi-match extraction) -------------------------------
@register(
    "h19",
    oracle="""
    SELECT p_partkey,
           array_to_string(regexp_extract_all(p_name, '([aeiou]+)', 1), '|')
             AS vowel_runs,
           array_to_string(regexp_extract_all(p_type || '-' || p_brand,
                                              '([A-Za-z]+)', 1), '|')
             AS word_runs,
           CAST(len(regexp_extract_all(p_name, '([aeiou]+)', 1)) AS INT)
             AS n_vowel_runs
    FROM part
    """,
)
def h19_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match regex extraction: every vowel run / word run per row
    (the tokenizer-adjacent primitive get-all-matches, vs h3's single
    group). Arrays are '|'-joined per representation policy R1. Map-side;
    both engines use the same leftmost-first match enumeration."""
    p = table(spark, sf_dir, "part")
    vowels = F.regexp_extract_all("p_name", F.lit("([aeiou]+)"), 1)
    words = F.regexp_extract_all(
        F.concat(F.col("p_type"), F.lit("-"), F.col("p_brand")),
        F.lit("([A-Za-z]+)"),
        1,
    )
    return p.select(
        "p_partkey",
        F.array_join(vowels, "|").alias("vowel_runs"),
        F.array_join(words, "|").alias("word_runs"),
        F.size(vowels).alias("n_vowel_runs"),
    )


# --- h20: map function family --------------------------------------------------------
@register(
    "h20",
    oracle="""
    WITH vals AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) * 2 AS qty2,
             CAST(round(l_extendedprice * 100) AS BIGINT) * 2 AS cents2
      FROM lineitem
      WHERE l_linenumber = 1
    )
    SELECT l_orderkey,
           concat_ws(',',
             CASE WHEN cents2 > 5000 THEN 'cents=' || cents2 END,
             CASE WHEN qty2   > 5000 THEN 'qty='   || qty2   END)
             AS kept_entries,
           CAST(2 AS INT) AS n_keys
    FROM vals
    """,
)
def h20_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function family: create_map → transform_values (double every
    value) → map_filter (keep entries > 5000) → map_entries rendered as a
    key-sorted 'k=v' string (maps can't cross the hashable surface — R1),
    plus map_keys cardinality. Values are BIGINT so the string rendering
    is engine-identical (double→string formatting differs between Java 17
    and DuckDB). All map-side; the oracle recomputes the pipeline as
    per-key CASE arithmetic."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    m = F.create_map(
        F.lit("qty"),
        F.col("l_quantity").cast("long"),
        F.lit("cents"),
        F.round(F.col("l_extendedprice") * 100).cast("long"),
    )
    doubled = F.transform_values(m, lambda _k, v: v * 2)
    kept = F.map_filter(doubled, lambda _k, v: v > 5000)
    rendered = F.array_join(
        F.sort_array(
            F.transform(
                F.map_entries(kept),
                lambda e: F.concat(e.key, F.lit("="), e.value.cast("string")),
            )
        ),
        ",",
    )
    return li.select(
        "l_orderkey",
        rendered.alias("kept_entries"),
        F.size(F.map_keys(doubled)).alias("n_keys"),
    )


# --- h14: conditional & null-handling family -------------------------------------
@register(
    "h14",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           coalesce(nullif(l_returnflag, 'N'), l_linestatus) AS flag_or_status,
           nullif(l_tax, 0.0)                                AS tax_nz,
           coalesce(nullif(l_tax, 0.0), -1.0)                AS tax_or_sentinel,
           CASE WHEN nullif(l_tax, 0.0) IS NOT NULL
                THEN 'taxed' ELSE 'untaxed' END              AS tax_label,
           least(l_discount, l_tax)                          AS disc_tax_min,
           greatest(l_quantity, 25.0)                        AS qty_floor25,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'bulk' END                              AS qty_band,
           IF(l_discount > 0.05, 'deep', 'shallow')          AS disc_class
    FROM lineitem
    """,
)
def h14_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional & null-handling scalar family — coalesce / nullif /
    nvl2-shaped CASE / least / greatest / banded CASE / if. Pure
    row-local projections: whole-stage-codegen'd, shuffle-free, trivially
    scale-safe; every output copies an input value or a literal (no float
    arithmetic), so cross-engine equality is exact."""
    li = table(spark, sf_dir, "lineitem")
    tax_nz = F.nullif(F.col("l_tax"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(
            F.nullif(F.col("l_returnflag"), F.lit("N")), F.col("l_linestatus")
        ).alias("flag_or_status"),
        tax_nz.alias("tax_nz"),
        F.coalesce(tax_nz, F.lit(-1.0)).alias("tax_or_sentinel"),
        F.nvl2(tax_nz, F.lit("taxed"), F.lit("untaxed")).alias("tax_label"),
        F.least("l_discount", "l_tax").alias("disc_tax_min"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_floor25"),
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("bulk")
        .alias("qty_band"),
        F.when(F.col("l_discount") > 0.05, "deep")
        .otherwise("shallow")
        .alias("disc_class"),
    )


# --- h21: edit-distance fuzzy matching (entity normalization shape) ------------------
@register(
    "h21",
    oracle="""
    WITH s AS (SELECT DISTINCT source FROM documents)
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(levenshtein(a.source, b.source) AS BIGINT) AS edit_dist
    FROM s a JOIN s b ON a.source < b.source
    WHERE levenshtein(a.source, b.source) <= 1
    """,
)
def h21_fuzzy_source_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching over the distinct source registry —
    the entity-normalization step of bibliographic ETL (venue/affiliation
    strings arrive in near-duplicate spellings; the reference corpus's
    disambiguation problem in miniature). The distinct-value table is
    small by construction (a registry, not the corpus), so the pair space
    is a broadcast self-join of distinct values — at 100 TB the distinct
    step is the only corpus-scale work (one partial-agg shuffle) and the
    quadratic part stays bounded by registry cardinality. For registries
    too large for that, the j2 prefix-filter machinery applies unchanged
    with character shingles."""
    s = table(spark, sf_dir, "documents").select("source").distinct()
    a, b = s.alias("a"), s.alias("b")
    lev = F.levenshtein(F.col("a.source"), F.col("b.source"))
    return (
        a.join(F.broadcast(b), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            lev.cast("long").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 1)
    )


# --- h22: blocked fuzzy candidate pairs over the part-name registry -----------------
# Shared with n10's oracle (the ER closure must run over EXACTLY these
# edges, so the pair definition lives once). Blocking: each name emits two
# keys — its lowercased 3-char prefix and suffix — and only names sharing
# a key are compared. An edit confined to the middle of the string leaves
# both keys intact; edits touching one end still share the other key. The
# quadratic comparison is bounded per block instead of registry-wide.
H22_PAIRS_SQL = """
    WITH s AS (SELECT DISTINCT p_name FROM part),
    k AS (
      SELECT p_name, lower(left(p_name, 3)) AS bkey FROM s
      UNION
      SELECT p_name, lower(right(p_name, 3)) AS bkey FROM s
    ),
    cand AS (
      SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      FROM k a JOIN k b ON a.bkey = b.bkey AND a.p_name < b.p_name
    )
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 2
"""


def blocked_fuzzy_pairs(parts: DataFrame) -> DataFrame:
    """(name_a, name_b, edit_dist) fuzzy-match candidates over the distinct
    part-name registry, generated through prefix/suffix blocking. Shared by
    h22 (the pair surface) and n10 (the ER closure over these edges)."""
    s = parts.select("p_name").distinct()
    keys = s.select(
        "p_name",
        F.explode(
            F.array(
                F.lower(F.expr("left(p_name, 3)")),
                F.lower(F.expr("right(p_name, 3)")),
            )
        ).alias("bkey"),
    ).distinct()
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(
            F.broadcast(b),
            (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"), F.col("b.p_name").alias("name_b")
        )
        .distinct()
    )
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return cand.select(
        "name_a", "name_b", lev.cast("long").alias("edit_dist")
    ).filter(F.col("edit_dist") <= 2)


@register("h22", oracle=H22_PAIRS_SQL)
def h22_blocked_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-keyed fuzzy pair generation — the candidate stage of entity
    resolution (h21 compared the whole registry pairwise; h22 adds the
    blocking step that makes the pair space survive a large registry).
    Each distinct name emits its lowercased 3-char prefix and suffix as
    blocking keys; only names sharing a key are Levenshtein-compared, and
    pairs within edit distance 2 survive. At 100 TB the distinct step is
    the only corpus-scale work (one partial-agg shuffle); the key
    explosion doubles the registry (bounded), the per-block self-join is
    broadcast (registries fit executors by construction), and the
    quadratic cost is per-block, not global. Misses only pairs whose
    edits touch BOTH string ends — the recall/efficiency trade every
    blocking scheme makes, stated here instead of hidden.

    tests/test_entity_resolution.py property-checks: every pair shares a
    blocking key, symmetry-free orientation (name_a < name_b), and
    edit_dist ∈ [1, 2]."""
    return blocked_fuzzy_pairs(table(spark, sf_dir, "part"))


# --- h23: HTML text extraction (web-corpus boilerplate strip) ------------------------
@register(
    "h23",
    oracle=r"""
    SELECT doc_id,
           source || ' #' || CAST(doc_id AS VARCHAR) AS title,
           'example.org' AS domain,
           '/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path,
           trim(regexp_replace(text || ' <tag> & "q" more', '\s+', ' ', 'g'))
             AS body
    FROM documents
    """,
)
def h23_html_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML text extraction — the first transform over any crawled web
    corpus: strip boilerplate (head), drop tags, decode entities,
    normalize whitespace, and keep the link targets. Each document is
    rendered to an HTML page IN-PLAN (title in <head>, entity-escaped
    body in <p>, one <a href>) and then extracted back with pure JVM
    string/regex expressions; the oracle computes the expected fields
    directly from `documents`, so the hash gate proves extraction exactly
    inverts rendering — including the entity round-trip, which the
    appended ` <tag> & "q"` marker forces through &lt;/&amp;/&quot;
    escaping on every row (the corpus text itself is entity-free).

    Scale: map-side only — no shuffle, whole-stage codegen; at 100 TB
    this is the canonical embarrassingly-parallel scan-transform-write
    pass (WARC -> clean text), and staying in Catalyst expressions (not a
    Python UDF) keeps it JVM-side."""
    d = table(spark, sf_dir, "documents")
    raw_body = F.concat(F.col("text"), F.lit(' <tag> & "q"'))
    esc = F.replace(
        F.replace(
            F.replace(
                F.replace(raw_body, F.lit("&"), F.lit("&amp;")),
                F.lit("<"),
                F.lit("&lt;"),
            ),
            F.lit(">"),
            F.lit("&gt;"),
        ),
        F.lit('"'),
        F.lit("&quot;"),
    )
    html = F.concat(
        F.lit("<html><head><title>"),
        F.col("source"),
        F.lit(" #"),
        F.col("doc_id").cast("string"),
        F.lit("</title></head>\n<body><p>"),
        esc,
        F.lit('</p>\n<a href="https://example.org/'),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit('">more</a></body></html>'),
    )
    title = F.regexp_extract(html, r"<title>([^<]*)</title>", 1)
    href = F.regexp_extract(html, r'href="([^"]*)"', 1)
    domain = F.regexp_extract(href, r"https://([^/]+)/", 1)
    path = F.regexp_extract(href, r"https://[^/]+(/.*)", 1)
    no_head = F.regexp_replace(html, r"<head>.*</head>", " ")
    no_tags = F.regexp_replace(no_head, r"<[^>]+>", " ")
    unesc = F.replace(
        F.replace(
            F.replace(
                F.replace(no_tags, F.lit("&quot;"), F.lit('"')),
                F.lit("&lt;"),
                F.lit("<"),
            ),
            F.lit("&gt;"),
            F.lit(">"),
        ),
        F.lit("&amp;"),
        F.lit("&"),
    )
    body = F.trim(F.regexp_replace(unesc, r"\s+", " "))
    return d.select(
        "doc_id",
        title.alias("title"),
        domain.alias("domain"),
        path.alias("path"),
        body.alias("body"),
    )
