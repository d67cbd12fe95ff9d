"""Scalar function queries (SURVEY.md §2.B scalar surface).

The reference delegates its entire scalar library to DataFusion
(reference: datafusion-flight-sql-server/src/service.rs:171); these queries
pin the Spark↔ANSI equivalence for each function family: string, regex,
date/time, math, conditional, cast, array/list, explode/unnest, JSON.

Portability notes baked into the queries (engine-semantics deltas):
- double→int casts: Spark truncates, DuckDB rounds → go through FLOOR.
- transcendental fns (ln, sqrt) are rounded to 6 decimals (libm results may
  differ in the last ulp across engines).
- all computed integers are cast to BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.queries.catalog import query, tables


@query(
    "fn_string",
    oracle="""
        SELECT c_custkey,
               UPPER(c_mktsegment) AS seg_upper,
               LOWER(c_name) AS name_lower,
               CAST(LENGTH(c_name) AS BIGINT) AS name_len,
               SUBSTRING(c_name, 1, 8) AS name_prefix,
               CONCAT(c_mktsegment, ':', c_name) AS tagged,
               REPLACE(c_name, 'Customer#', 'C') AS short_name,
               CAST(STRPOS(c_name, '#') AS BIGINT) AS hash_pos,
               SPLIT_PART(c_name, '#', 2) AS name_id,
               LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
               REVERSE(c_mktsegment) AS seg_rev,
               CAST(LEVENSHTEIN(c_mktsegment, 'BUILDING') AS BIGINT) AS lev,
               TRIM(CONCAT('  ', c_mktsegment, '  ')) AS trimmed
        FROM customer
    """,
    doc="String function family: upper/lower/length/substring/concat/"
    "replace/strpos/split_part/lpad/reverse/levenshtein/trim (delegated "
    "surface; all JVM builtins — whole-stage codegen, no UDFs).",
    tags=("function", "string"),
)
def q_fn_string(spark: SparkSession, sf: str) -> DataFrame:
    c = tables(spark, sf)["customer"]
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C")).alias("short_name"),
        F.instr("c_name", "#").cast("bigint").alias("hash_pos"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_id"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).cast("bigint").alias("lev"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias("trimmed"),
    )


@query(
    "fn_regex",
    oracle="""
        SELECT c_custkey,
               regexp_extract(c_name, '([0-9]+)', 1) AS digits,
               regexp_replace(c_name, '[0-9]+', 'N') AS masked,
               regexp_matches(c_name, '^Customer#0*[0-9]+$') AS well_formed
        FROM customer
    """,
    doc="Regex family: extract/replace/match (delegated surface). Patterns "
    "restricted to the Java-regex ∩ RE2 common subset.",
    tags=("function", "regex"),
)
def q_fn_regex(spark: SparkSession, sf: str) -> DataFrame:
    c = tables(spark, sf)["customer"]
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "[0-9]+", "N").alias("masked"),
        F.col("c_name").rlike("^Customer#0*[0-9]+$").alias("well_formed"),
    )


@query(
    "fn_datetime",
    oracle="""
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate,
               CAST(year(o_orderdate) AS BIGINT) AS oyear,
               CAST(month(o_orderdate) AS BIGINT) AS omonth,
               CAST(day(o_orderdate) AS BIGINT) AS oday,
               CAST(quarter(o_orderdate) AS BIGINT) AS oquarter,
               CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
               CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS plus30,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                    AS BIGINT) AS days_since,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
        FROM orders
    """,
    doc="Date/time family: year/month/day/quarter extract, date_trunc, "
    "date arithmetic, datediff, last_day (delegated surface).",
    tags=("function", "datetime"),
)
def q_fn_datetime(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        od.cast("date").cast("string").alias("odate"),
        F.year(od).cast("bigint").alias("oyear"),
        F.month(od).cast("bigint").alias("omonth"),
        F.dayofmonth(od).cast("bigint").alias("oday"),
        F.quarter(od).cast("bigint").alias("oquarter"),
        F.date_trunc("month", od).cast("date").cast("string").alias("month_start"),
        F.date_add(od.cast("date"), 30).cast("string").alias("plus30"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
        F.last_day(od.cast("date")).cast("string").alias("month_end"),
    )


@query(
    "fn_date_bin",
    oracle="""
        SELECT CAST(time_bucket(INTERVAL '15 minutes', ts) AS VARCHAR)
                   AS bucket_start,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1
    """,
    doc="Fixed-width time bucketing (DataFusion date_bin / DuckDB "
    "time_bucket): events counted into 15-minute bins. Spark side is the "
    "groupBy(window(ts, ...)) form — same epoch-aligned bins for widths "
    "that divide a day (Spark's origin is the unix epoch, DuckDB's "
    "2000-01-01; both land on midnight for sub-day divisors). Scale: "
    "single partial-aggregated shuffle, bins computed row-local.",
    tags=("function", "datetime"),
)
def q_fn_date_bin(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"]
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("string").alias("bucket_start"),
            "n_events",
        )
    )


@query(
    "fn_math",
    oracle="""
        SELECT o_orderkey,
               ABS(o_totalprice - 100000.0) AS abs_diff,
               ROUND(o_totalprice, -2) AS rounded,
               CAST(CEIL(o_totalprice) AS BIGINT) AS ceiled,
               CAST(FLOOR(o_totalprice) AS BIGINT) AS floored,
               ROUND(SQRT(o_totalprice), 6) AS sq,
               ROUND(LN(o_totalprice), 6) AS lg,
               CAST(o_orderkey % 7 AS BIGINT) AS md,
               o_totalprice * 2.0 + 1.0 AS affine
        FROM orders
    """,
    doc="Math family: abs/round/ceil/floor/sqrt/ln/modulo/arithmetic "
    "(delegated surface). Transcendentals rounded to 6 dp for cross-engine "
    "ulp stability.",
    tags=("function", "math"),
)
def q_fn_math(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(tp - 100000.0).alias("abs_diff"),
        F.round(tp, -2).alias("rounded"),
        F.ceil(tp).alias("ceiled"),
        F.floor(tp).alias("floored"),
        F.round(F.sqrt(tp), 6).alias("sq"),
        F.round(F.log(tp), 6).alias("lg"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("md"),
        (tp * 2.0 + 1.0).alias("affine"),
    )


@query(
    "fn_conditional",
    oracle="""
        SELECT o_orderkey,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
               GREATEST(o_totalprice, 150000.0) AS hi,
               LEAST(o_totalprice, 150000.0) AS lo,
               CASE o_orderpriority WHEN '1-URGENT' THEN 1
                                    WHEN '2-HIGH' THEN 2
                                    ELSE 9 END AS prio_rank,
               IF(o_totalprice > 200000, 'big', 'small') AS size_label
        FROM orders
    """,
    doc="Conditional family: coalesce/nullif/greatest/least/simple CASE/IF "
    "(delegated surface).",
    tags=("function", "conditional"),
)
def q_fn_conditional(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(150000.0)).alias("hi"),
        F.least(F.col("o_totalprice"), F.lit(150000.0)).alias("lo"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .otherwise(9)
        .cast("bigint")
        .alias("prio_rank"),
        F.when(F.col("o_totalprice") > 200000, "big").otherwise("small").alias("size_label"),
    )


@query(
    "fn_cast",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderkey AS VARCHAR) AS key_str,
               CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
               TRY_CAST(o_orderstatus AS INTEGER) AS bad_int,
               CAST(TRY_CAST('1995-03-15' AS DATE) AS VARCHAR) AS lit_date,
               CAST(o_totalprice > 150000 AS BOOLEAN) AS is_big
        FROM orders
    """,
    doc="CAST / TRY_CAST matrix (delegated surface). double→int goes "
    "through FLOOR: Spark truncates, DuckDB rounds — FLOOR aligns them.",
    tags=("function", "cast"),
)
def q_fn_cast(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.floor(F.col("o_totalprice")).cast("bigint").alias("price_int"),
        F.expr("try_cast(o_orderstatus AS INT)").alias("bad_int"),
        F.lit("1995-03-15").cast("date").cast("string").alias("lit_date"),
        (F.col("o_totalprice") > 150000).alias("is_big"),
    )


@query(
    "fn_array",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               string_split(text, ' ')[1] AS first_word,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
               array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], '-')
                   AS top3_sorted,
               list_contains(string_split(text, ' '), 'spark') AS has_spark
        FROM documents
    """,
    doc="Array/list family: split, size, element access, distinct, sort, "
    "slice, join, contains (delegated surface; arrays reduced to scalars "
    "for portable hashing).",
    tags=("function", "array"),
)
def q_fn_array(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    words = F.split(F.col("text"), " ")
    uniq_sorted = F.array_sort(F.array_distinct(words))
    return d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_uniq"),
        F.array_join(F.slice(uniq_sorted, 1, 3), "-").alias("top3_sorted"),
        F.array_contains(words, "spark").alias("has_spark"),
    )


@query(
    "fn_explode",
    oracle="""
        SELECT w AS word, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY w
    """,
    doc="explode ≙ UNNEST: word frequency over documents (delegated "
    "surface).",
    tags=("function", "array"),
)
def q_fn_explode(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "fn_json",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
        FROM events
    """,
    doc="JSON field access: get_json_object ≙ json_extract_string "
    "(delegated surface).",
    tags=("function", "json"),
)
def q_fn_json(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"]
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
    )


@query(
    "fn_struct",
    oracle="""
        SELECT n_nationkey,
               struct_pack(name := n_name, region := n_regionkey).name AS s_name,
               struct_pack(name := n_name, region := n_regionkey).region AS s_region
        FROM nation
    """,
    doc="Struct construction + field access (delegated surface; Spark "
    "named_struct / col.field).",
    tags=("function", "struct"),
)
def q_fn_struct(spark: SparkSession, sf: str) -> DataFrame:
    n = tables(spark, sf)["nation"]
    s = F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
    return n.select(
        "n_nationkey",
        s.getField("name").alias("s_name"),
        s.getField("region").alias("s_region"),
    )


@query(
    "fn_map",
    oracle="""
        SELECT n_nationkey,
               n_name AS name_val,
               CAST(n_regionkey AS VARCHAR) AS region_val,
               CAST(2 AS BIGINT) AS map_size,
               'name,region' AS key_list,
               TRUE AS has_name,
               FALSE AS has_phone
        FROM nation
    """,
    doc="Map function family (delegated surface: map construction, "
    "element_at, map_keys/map_values, cardinality, map_contains_key). The "
    "map is built from literal keys, so the ANSI oracle states the "
    "statically-known results directly — the Spark side exercises the real "
    "map ops; the comparison pins their values.",
    tags=("function", "map"),
)
def q_fn_map(spark: SparkSession, sf: str) -> DataFrame:
    n = tables(spark, sf)["nation"]
    m = F.create_map(
        F.lit("name"),
        F.col("n_name"),
        F.lit("region"),
        F.col("n_regionkey").cast("string"),
    )
    return n.select(
        "n_nationkey",
        F.element_at(m, "name").alias("name_val"),
        F.element_at(m, "region").alias("region_val"),
        F.size(m).cast("bigint").alias("map_size"),
        F.array_join(F.map_keys(m), ",").alias("key_list"),
        F.array_contains(F.map_keys(m), "name").alias("has_name"),
        F.array_contains(F.map_keys(m), "phone").alias("has_phone"),
    )


@query(
    "fn_string_distance",
    oracle="""
        SELECT c_custkey,
               CAST(levenshtein(c_name, c_mktsegment) AS BIGINT) AS lev,
               split_part(c_name, '#', 2) AS cust_num,
               CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_id,
               rpad(c_mktsegment, 12, '.') AS seg_padded
        FROM customer
    """,
    doc="String-distance and structured-string functions from the "
    "delegated scalar surface (SURVEY.md §2.B scalar list): levenshtein "
    "(edit distance — the cheap fuzzy-match primitive), split_part, "
    "strpos/instr, lpad/rpad. All JVM built-ins, row-local, "
    "codegen-friendly; identical 1-based semantics in both engines.",
    tags=("function", "string"),
)
def q_fn_string_distance(spark: SparkSession, sf: str) -> DataFrame:
    c = tables(spark, sf)["customer"]
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", "c_mktsegment").cast("bigint").alias("lev"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_num"),
        F.instr(F.col("c_name"), "#").cast("bigint").alias("hash_pos"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_id"),
        F.rpad(F.col("c_mktsegment"), 12, ".").alias("seg_padded"),
    )


@query(
    "fn_bitwise",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderkey & 255 AS BIGINT) AS band,
               CAST(o_orderkey | 4096 AS BIGINT) AS bor,
               CAST(xor(o_orderkey, 1365) AS BIGINT) AS bxor,
               CAST(o_orderkey << 3 AS BIGINT) AS shl,
               CAST(o_orderkey >> 2 AS BIGINT) AS shr,
               CAST(~o_orderkey AS BIGINT) AS bnot
        FROM orders
    """,
    doc="Bitwise scalar surface (delegated: AND/OR/XOR/shifts/NOT reach "
    "DataFusion through service.rs:171 unmodified). Row-local JVM integer "
    "ops in whole-stage codegen; the idiom behind bucket masks, bloom "
    "probes, and flag fields at scale.",
    tags=("function", "bitwise"),
)
def q_fn_bitwise(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("band"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("bor"),
        k.bitwiseXOR(F.lit(1365)).cast("bigint").alias("bxor"),
        F.shiftleft(k, 3).cast("bigint").alias("shl"),
        F.shiftright(k, 2).cast("bigint").alias("shr"),
        F.bitwise_not(k).cast("bigint").alias("bnot"),
    )


@query(
    "agg_bitwise",
    oracle="""
        SELECT o_orderpriority,
               CAST(bit_and(o_custkey) AS BIGINT) AS all_mask,
               CAST(bit_or(o_custkey) AS BIGINT) AS any_mask,
               CAST(bit_xor(o_custkey) AS BIGINT) AS parity_mask
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Bitwise aggregates (bit_and/bit_or/bit_xor — delegated agg "
    "surface). Associative+commutative, so partial aggregation is exact "
    "and order-independent: unlike float sums these need no decimal "
    "discipline to hash-match a single-threaded oracle.",
    tags=("agg", "bitwise"),
)
def q_agg_bitwise(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.bit_and("o_custkey").cast("bigint").alias("all_mask"),
        F.bit_or("o_custkey").cast("bigint").alias("any_mask"),
        F.bit_xor("o_custkey").cast("bigint").alias("parity_mask"),
    )


@query(
    "fn_url",
    oracle="""
        SELECT doc_id,
               'https' AS proto,
               source || '.example.com' AS host,
               '/docs/' || CAST(doc_id AS VARCHAR) AS path,
               'lang=' || lang AS query,
               lang AS lang_param
        FROM documents
    """,
    doc="URL parsing (Spark parse_url over a deterministically synthesized "
    "URL — the fixtures carry no URL column): protocol/host/path/query "
    "extraction plus a named query parameter, the normalization step "
    "before host-level dedup or per-domain quotas in a crawl pipeline. "
    "Row-local JVM built-in. The oracle reconstructs each component from "
    "the same parts the URL was built from, so the check validates "
    "Spark's parser against ground truth rather than a second parser.",
    tags=("function", "string", "url"),
)
def q_fn_url(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "fn_hash_encode",
    oracle="""
        SELECT doc_id,
               md5(text) AS h_md5,
               sha256(text) AS h_sha256,
               base64(encode(text)) AS b64,
               lower(hex(encode(substr(text, 1, 8)))) AS head_hex
        FROM documents
    """,
    doc="Hashing and binary encodings from the delegated scalar surface: "
    "md5, sha2-256, base64, hex over utf-8 payload bytes — the digest "
    "primitives every content-addressed dedup/cache key path relies on. "
    "Row-local, codegen; Spark emits uppercase hex so it is lowercased "
    "to the common form both engines agree on.",
    tags=("function", "hash"),
)
def q_fn_hash_encode(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    t = F.col("text")
    return d.select(
        "doc_id",
        F.md5(t).alias("h_md5"),
        F.sha2(t, 256).alias("h_sha256"),
        # Spark's base64 emits MIME-chunked output (CRLF every 76 chars) on
        # some builds regardless of spark.sql.legacy.chunkBase64String.enabled;
        # strip separators to the canonical RFC 4648 form DuckDB produces.
        F.translate(F.base64(F.encode(t, "utf-8")), "\r\n", "").alias("b64"),
        F.lower(F.hex(F.encode(F.substring(t, 1, 8), "utf-8"))).alias(
            "head_hex"
        ),
    )


@query(
    "fn_try",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(NULL AS DOUBLE) AS div_zero,
               FLOOR((l_extendedprice / l_quantity) * 1000000) / 1000000
                   AS div_ok,
               TRY_CAST(l_returnflag AS INT) AS cast_bad,
               TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INT) AS cast_ok,
               CASE WHEN l_orderkey <= 0
                    THEN 9223372036854775807 + l_orderkey
                    ELSE CAST(NULL AS BIGINT) END AS add_overflow
        FROM lineitem
    """,
    doc="Error-safe ANSI arithmetic (try_divide / try_add / try_cast): "
    "NULL instead of runtime failure for division by zero, bigint "
    "overflow, and malformed casts — what keeps a 1000-executor job from "
    "dying on one bad row under ANSI mode. Row-local, codegen'd; the "
    "oracle pins the NULL-producing cases as typed NULL literals where "
    "DuckDB would raise instead of yielding NULL.",
    tags=("function", "ansi"),
)
def q_fn_try(spark: SparkSession, sf: str) -> DataFrame:
    li = tables(spark, sf)["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity"))
        .alias("div_zero"),
        # floor-truncate instead of round: ROUND ties resolve half-up in
        # Spark but half-even in DuckDB; floor is tie-free
        (F.floor(F.try_divide("l_extendedprice", "l_quantity") * 1000000)
         / 1000000).alias("div_ok"),
        F.col("l_returnflag").try_cast("int").alias("cast_bad"),
        F.col("l_linenumber").cast("string").try_cast("int").alias("cast_ok"),
        # literal written in SQL so it parses as a BIGINT (a python-int lit
        # this large round-trips as DOUBLE and would never overflow)
        F.expr("try_add(9223372036854775807L, l_orderkey)").alias(
            "add_overflow"
        ),
    )


@query(
    "fn_variant",
    oracle="""
        SELECT event_id,
               CAST(props->>'k' AS BIGINT) AS k,
               CAST(NULL AS BIGINT) AS missing,
               (props->>'k') IS NOT NULL AS has_k
        FROM events
    """,
    doc="Semi-structured VARIANT columns (Spark 4): parse_json once into "
    "the binary variant encoding, then typed path extraction with "
    "variant_get / try_variant_get (missing path -> NULL, no error). At "
    "100 TB variant beats re-parsing JSON strings per access: the parse "
    "cost is paid once per row and extractions are O(path) over the "
    "binary form; shredded parquet writes can push them to the scan. "
    "Oracle uses DuckDB's JSON path operators over the same payload.",
    tags=("function", "json", "variant"),
)
def q_fn_variant(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"]
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing"),
        F.variant_get(v, "$.k", "bigint").isNotNull().alias("has_k"),
    )


@query(
    "fn_mask",
    oracle="""
        SELECT c_custkey,
               regexp_replace(regexp_replace(regexp_replace(c_name,
                   '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
                   AS masked,
               substring(c_name, 1, 9) ||
               regexp_replace(regexp_replace(regexp_replace(
                   substring(c_name, 10),
                   '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
                   AS partial
        FROM customer
    """,
    doc="Data masking for PII-bearing columns (Spark 4 mask() builtin: "
    "uppercase->X, lowercase->x, digit->n, punctuation kept): full-column "
    "masking plus the keep-prefix partial-reveal form "
    "(concat(prefix, mask(rest))) used for last-4-digits-style display. "
    "Complements text_redact's regex entity redaction with column-level "
    "shape-preserving masking — the view layer a governed 100 TB "
    "warehouse puts between raw PII and analysts. Row-local, "
    "whole-stage-codegen; the oracle reproduces mask() with "
    "character-class regexp_replace chains.",
    tags=("functions", "privacy"),
)
def q_fn_mask(spark: SparkSession, sf: str) -> DataFrame:
    c = tables(spark, sf)["customer"]
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked"),
        F.concat(
            F.substring("c_name", 1, 9),
            F.mask(F.expr("substring(c_name, 10)")),
        ).alias("partial"),
    )


@query(
    "fn_posexplode",
    oracle="""
        WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a
                     FROM documents),
        u AS (SELECT doc_id,
                     generate_subscripts(a, 1) AS idx1,
                     unnest(a) AS word
              FROM arr)
        SELECT doc_id, CAST(idx1 - 1 AS BIGINT) AS pos, word
        FROM u WHERE word <> ''
    """,
    doc="posexplode ≙ UNNEST WITH ORDINALITY: token position within each "
    "document (the order-preserving explode a sequence pipeline needs — "
    "plain explode loses position). Oracle zips DuckDB's "
    "generate_subscripts with unnest; positions aligned 0-based.",
    tags=("function", "array"),
)
def q_fn_posexplode(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    return (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "word")
    )
