"""Relational operator queries (SURVEY.md §2.B).

Covers every operator family the reference's own tests exercise (scans,
projections, filters, joins, aggregation, having, order/limit — reference:
datafusion-flight-sql-server/tests/integration_test.rs:86-328,
tests/state_test.rs:5-17, tests/schema_metadata_test.rs:121-126) plus the
delegated surface a Flight SQL client can reach through
``create_logical_plan`` (service.rs:171): outer/semi/anti/cross/theta joins,
set operations, rollup/cube/grouping sets, subqueries (scalar, IN, EXISTS,
correlated), and TPC-H-shaped analytical queries.

Implementations are DataFrame-API-first: Catalyst handles pushdown, pruning,
join strategy (broadcast for the dimension tables), and partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.queries.catalog import query, tables

DEC = "decimal(18,2)"
DEC4 = "decimal(18,4)"


def dec(c, scale: int = 2) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Scans & projections
# ---------------------------------------------------------------------------


@query(
    "scan_star",
    oracle="SELECT * FROM region",
    doc="Full scan, SELECT * (parity: integration_test.rs:86-113).",
    tags=("scan",),
)
def q_scan_star(spark: SparkSession, sf: str) -> DataFrame:
    return tables(spark, sf)["region"].select("*")


@query(
    "scan_projection",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal AS balance
        FROM customer
    """,
    doc="Column projection + alias (parity: schema_metadata_test.rs:89; "
    "ReadSchema should contain only the three columns).",
    tags=("scan", "projection"),
)
def q_scan_projection(spark: SparkSession, sf: str) -> DataFrame:
    c = tables(spark, sf)["customer"]
    return c.select("c_custkey", "c_name", F.col("c_acctbal").alias("balance"))


# ---------------------------------------------------------------------------
# Filters / predicates
# ---------------------------------------------------------------------------


@query(
    "filter_compare",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem
        WHERE l_quantity > 45 AND l_discount >= 0.05
    """,
    doc="Comparison predicates + conjunction (parity: "
    "integration_test.rs:125, state_test.rs:12). Filter must appear in "
    "PushedFilters of the parquet scan.",
    tags=("filter",),
)
def q_filter_compare(spark: SparkSession, sf: str) -> DataFrame:
    l = tables(spark, sf)["lineitem"]
    return l.filter((F.col("l_quantity") > 45) & (F.col("l_discount") >= 0.05)).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount"
    )


@query(
    "filter_predicates",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 200000 THEN 'big'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'small' END AS bucket
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_totalprice BETWEEN 1000 AND 300000
          AND (o_orderstatus LIKE 'F%' OR o_orderstatus = 'O')
          AND o_custkey IS NOT NULL
          AND NOT (o_orderkey < 0)
    """,
    doc="Full scalar predicate algebra: IN, BETWEEN, LIKE, IS NULL, OR, NOT,"
    " CASE (delegated surface, service.rs:171).",
    tags=("filter",),
)
def q_filter_predicates(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    return (
        o.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_totalprice").between(1000, 300000)
            & (F.col("o_orderstatus").like("F%") | (F.col("o_orderstatus") == "O"))
            & F.col("o_custkey").isNotNull()
            & ~(F.col("o_orderkey") < 0)
        ).select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 200000, "big")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("small")
            .alias("bucket"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "join_inner",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    doc="Inner equi-join (parity: integration_test.rs:305-327). Customer "
    "side broadcasts at small SF; at scale AQE picks SMJ/shuffled-hash.",
    tags=("join",),
)
def q_join_inner(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    c, o = t["customer"], t["orders"]
    return c.join(o, c.c_custkey == o.o_custkey, "inner").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_left",
    oracle="""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c
        LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 150000) o
          ON c.c_custkey = o.o_custkey
    """,
    doc="Left outer join against a derived table (parity: state_test.rs:10 "
    "+ schema_metadata_test.rs:121-126 derived-table join).",
    tags=("join",),
)
def q_join_left(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    big = t["orders"].filter(F.col("o_totalprice") > 150000)
    return t["customer"].join(big, F.col("c_custkey") == F.col("o_custkey"), "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@query(
    "join_right",
    oracle="""
        SELECT c.c_name, o.o_orderkey
        FROM (SELECT * FROM customer WHERE c_acctbal > 5000) c
        RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    doc="Right outer join (delegated surface).",
    tags=("join",),
)
def q_join_right(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    rich = t["customer"].filter(F.col("c_acctbal") > 5000)
    return rich.join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "right").select(
        "c_name", "o_orderkey"
    )


@query(
    "join_full",
    oracle="""
        SELECT c.c_custkey, o.o_orderkey
        FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
        FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
          ON c.c_custkey = o.o_custkey
    """,
    doc="Full outer join (delegated surface).",
    tags=("join",),
)
def q_join_full(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    c = t["customer"].filter(F.col("c_acctbal") > 9000)
    o = t["orders"].filter(F.col("o_totalprice") > 300000)
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "full").select(
        "c_custkey", "o_orderkey"
    )


@query(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    """,
    doc="Left semi join ≙ EXISTS (delegated surface).",
    tags=("join",),
)
def q_join_semi(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    big = t["orders"].filter(F.col("o_totalprice") > 250000)
    return t["customer"].join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left anti join ≙ NOT EXISTS (delegated surface).",
    tags=("join",),
)
def q_join_anti(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    return t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
        SELECT r.r_name, n.n_name
        FROM region r CROSS JOIN nation n
    """,
    doc="Cross join (delegated surface) — tiny dims only; at scale a cross "
    "join must be blocked/banded (see dedup/similarity operators).",
    tags=("join",),
)
def q_join_cross(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    return t["region"].crossJoin(t["nation"]).select("r_name", "n_name")


@query(
    "join_theta",
    oracle="""
        SELECT r.r_regionkey, n.n_nationkey
        FROM region r JOIN nation n ON r.r_regionkey < n.n_regionkey
    """,
    doc="Non-equi (theta) join → BroadcastNestedLoopJoin (delegated "
    "surface).",
    tags=("join",),
)
def q_join_theta(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    r, n = t["region"], t["nation"]
    return r.join(n, r.r_regionkey < n.n_regionkey).select("r_regionkey", "n_nationkey")


@query(
    "join_derived",
    oracle="""
        SELECT u.c_name AS name, o.o_orderkey AS order_id, o.o_totalprice AS amount
        FROM customer u
        JOIN (SELECT * FROM orders WHERE o_totalprice > 25) o
          ON u.c_custkey = o.o_custkey
        WHERE u.c_acctbal > 0
    """,
    doc="Join against a subquery-derived table with aliases (parity: "
    "schema_metadata_test.rs:121-126).",
    tags=("join",),
)
def q_join_derived(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    o = t["orders"].filter(F.col("o_totalprice") > 25)
    u = t["customer"].filter(F.col("c_acctbal") > 0)
    return u.join(o, u.c_custkey == o.o_custkey).select(
        F.col("c_name").alias("name"),
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").alias("amount"),
    )


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@query(
    "agg_count_star",
    oracle="SELECT COUNT(*) AS count FROM lineitem",
    doc="Ungrouped COUNT(*) with alias (parity: integration_test.rs:271-295 "
    "— result schema is one column named `count`).",
    tags=("agg",),
)
def q_agg_count_star(spark: SparkSession, sf: str) -> DataFrame:
    return tables(spark, sf)["lineitem"].agg(F.count(F.lit(1)).alias("count"))


@query(
    "agg_group_multi",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price,
               CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="Multi-key GROUP BY with count/sum/min/max (parity: "
    "state_test.rs:8-13 + delegated agg surface). Partial (map-side) "
    "aggregation is automatic in Catalyst. The exact price sum runs as "
    "fixed-point cents in the hot path (long-backed; Spark's "
    "SUM(DECIMAL(18,2)) accumulator is DECIMAL(28,2) = per-row "
    "BigDecimal, measured 2.5x slower) with one exact decimal "
    "scale-shift + double cast per group.",
    tags=("agg",),
)
def q_agg_group_multi(spark: SparkSession, sf: str) -> DataFrame:
    l = tables(spark, sf)["lineitem"]
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        (
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("decimal(38,0)")
            * F.lit("0.01").cast("decimal(2,2)")
        ).cast("double").alias("sum_price"),
    )


@query(
    "agg_having",
    oracle="""
        SELECT o_custkey, COUNT(*) AS order_count
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) > 12
    """,
    doc="GROUP BY + HAVING on the aggregate (parity: state_test.rs:14).",
    tags=("agg",),
)
def q_agg_having(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .filter(F.col("order_count") > 12)
    )


@query(
    "agg_distinct",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="DISTINCT aggregates (delegated surface).",
    tags=("agg",),
)
def q_agg_distinct(spark: SparkSession, sf: str) -> DataFrame:
    l = tables(spark, sf)["lineitem"]
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


@query(
    "agg_stats",
    oracle="""
        SELECT l_returnflag,
               CAST((CAST(COUNT(*) AS DOUBLE) * SUM(q * q) - SUM(q) * SUM(q))
                    / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1)) AS DOUBLE) AS var_qty,
               SQRT(CAST((CAST(COUNT(*) AS DOUBLE) * SUM(q * q) - SUM(q) * SUM(q))
                    / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1)) AS DOUBLE)) AS stddev_qty
        FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
        GROUP BY l_returnflag
    """,
    doc="Sample variance / stddev computed from exact integer sums so the "
    "result is order-independent and engine-portable (delegated "
    "stddev/var_samp surface, expressed shuffle-free as one aggregation).",
    tags=("agg",),
)
def q_agg_stats(spark: SparkSession, sf: str) -> DataFrame:
    l = tables(spark, sf)["lineitem"].withColumn("q", F.col("l_quantity").cast("bigint"))
    agg = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("q") * F.col("q")).alias("sxx"),
        F.sum("q").alias("sx"),
    )
    nd = F.col("n").cast("double")
    var = (nd * F.col("sxx") - F.col("sx") * F.col("sx")) / (nd * (F.col("n") - 1))
    return agg.select(
        "l_returnflag",
        var.cast("double").alias("var_qty"),
        F.sqrt(var.cast("double")).alias("stddev_qty"),
    )


@query(
    "agg_percentile",
    oracle="""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
               ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
               ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles / median per group (DataFusion 53 "
    "exposes median + approx_percentile_cont on the delegated surface; "
    "Spark's percentile() is the exact continuous-quantile analogue and "
    "DuckDB quantile_cont the oracle — both interpolate at p*(n-1)). "
    "Rounded to 6 decimals for cross-engine float parity. Scale note: "
    "exact percentile holds the group's values; at 100 TB swap in "
    "approx_percentile (t-digest, mergeable partial aggs) per group.",
    tags=("agg",),
)
def q_agg_percentile(spark: SparkSession, sf: str) -> DataFrame:
    l = tables(spark, sf)["lineitem"]
    return l.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5D)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9D)"), 6).alias("p90_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.25D)"), 6).alias(
            "p25_price"
        ),
    )


#: approx_percentile accuracy: guarantees rank error <= 1/ACC, so the
#: returned element's true rank lies within p ± 1/ACC of the target.
_APPROX_PCT_ACC = 1000


@query(
    "agg_percentile_approx",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               TRUE AS p50_in_bound,
               TRUE AS p90_in_bound
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="approx_percentile (mergeable quantile sketch, partial aggregation "
    "— the 100 TB scale path agg_percentile's docstring promises): sketch "
    "outputs are engine-specific, so like agg_approx_distinct the checkable "
    "contract is the ERROR BOUND — approx_percentile(p, acc=1000) "
    "guarantees rank error <= 1/acc, so the returned element must lie "
    "between the exact continuous quantiles at p ∓ 2/acc; both engines "
    "agree the bound holds (TRUE). The exact-percentile columns exist only "
    "to evaluate the bound; the production artifact is the approx "
    "aggregation alone, whose partial-agg plan shape (no per-group value "
    "buffers in the exchange) is pinned by "
    "tests/test_plan_shapes.py::test_approx_percentile_partial_agg.",
    tags=("agg", "approx"),
)
def q_agg_percentile_approx(spark: SparkSession, sf: str) -> DataFrame:
    l = tables(spark, sf)["lineitem"]
    acc = _APPROX_PCT_ACC
    eps = 2.0 / acc
    agg = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.expr(f"approx_percentile(l_quantity, 0.5D, {acc})").alias("ap50"),
        F.expr(f"approx_percentile(l_quantity, 0.9D, {acc})").alias("ap90"),
        F.expr(f"percentile(l_quantity, {0.5 - eps}D)").alias("lo50"),
        F.expr(f"percentile(l_quantity, {0.5 + eps}D)").alias("hi50"),
        F.expr(f"percentile(l_quantity, {0.9 - eps}D)").alias("lo90"),
        F.expr(f"percentile(l_quantity, {0.9 + eps}D)").alias("hi90"),
    )
    slack = 1e-6
    return agg.select(
        "l_returnflag",
        "n_rows",
        (
            (F.col("ap50") >= F.col("lo50") - slack)
            & (F.col("ap50") <= F.col("hi50") + slack)
        ).alias("p50_in_bound"),
        (
            (F.col("ap90") >= F.col("lo90") - slack)
            & (F.col("ap90") <= F.col("hi90") + slack)
        ).alias("p90_in_bound"),
    ).orderBy("l_returnflag")


@query(
    "agg_bool",
    oracle="""
        SELECT o_orderstatus,
               bool_and(o_totalprice > 1000) AS all_over_1k,
               bool_or(o_totalprice > 400000) AS any_over_400k,
               CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT)
                   AS n_urgent
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="Boolean aggregates (delegated surface): bool_and / bool_or / "
    "count_if per group — all partial-aggregatable JVM builtins.",
    tags=("agg",),
)
def q_agg_bool(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
    )


@query(
    "agg_mode",
    oracle="""
        WITH wc AS (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c
                    FROM orders GROUP BY o_orderstatus, o_orderpriority)
        SELECT o_orderstatus,
               MAX(struct_pack(c := c, o_orderpriority := o_orderpriority))
                   .o_orderpriority AS mode_priority,
               CAST(MAX(struct_pack(c := c,
                                    o_orderpriority := o_orderpriority))
                   .c AS BIGINT) AS mode_count
        FROM wc
        GROUP BY o_orderstatus
    """,
    doc="Exact per-group mode with a deterministic tie-break: the modal "
    "o_orderpriority per order status, ties broken toward the lexically "
    "larger value so the struct-max argmax is total. Spark's built-in "
    "mode() is non-deterministic on ties, so the portable form is count + "
    "max(struct(c, value)) — both stages partial-aggregate map-side (no "
    "window, no per-group buffers), the same scale shape as "
    "dedup_exact_keepbest. Shuffle: (status, priority) counts then a "
    "status-keyed argmax.",
    tags=("agg",),
)
def q_agg_mode(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    wc = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("c")
    )
    best = F.max(F.struct(F.col("c"), F.col("o_orderpriority")))
    return wc.groupBy("o_orderstatus").agg(
        best.getField("o_orderpriority").alias("mode_priority"),
        best.getField("c").cast("bigint").alias("mode_count"),
    )


@query(
    "agg_rollup",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP hierarchy totals (delegated surface).",
    tags=("agg",),
)
def q_agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("total"),
    )


@query(
    "agg_cube",
    oracle=f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two dimensions (delegated surface).",
    tags=("agg",),
)
def q_agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    l = tables(spark, sf)["lineitem"]
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="GROUPING SETS (delegated surface) — via Spark SQL.",
    tags=("agg",),
)
def q_agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_approx_distinct",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_parts,
               TRUE AS within_bound
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="approx_count_distinct (HLL, rsd=0.05) — the sketch estimate itself "
    "is engine-specific, so the checkable contract is the ERROR BOUND: the "
    "query emits the exact distinct count plus a boolean asserting the HLL "
    "estimate is within 3x the requested relative standard deviation (plus "
    "an absolute slack of 5 for tiny groups). DuckDB reproduces the exact "
    "count and the expected-TRUE bound column, so rows+schema+hash all "
    "verify. At scale the approx path is the one you'd run (partial-agg "
    "HLL sketches merge map-side; no per-group distinct-set shuffle).",
    tags=("agg", "approx"),
)
def q_agg_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    l = tables(spark, sf)["lineitem"]
    rsd = 0.05
    agg = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd).alias("approx_parts"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= F.greatest(F.lit(5.0), F.col("exact_parts") * (3 * rsd))
        ).alias("within_bound"),
    ).orderBy("l_returnflag")


@query(
    "agg_hll_rollup",
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS within_bound
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Hierarchical distinct-count rollup via mergeable HLL sketches "
    "(Spark 4 Apache DataSketches builtins): per-(day, event_type) "
    "hll_sketch_agg sketches are UNIONED up to per-event_type totals with "
    "hll_union_agg — the continuous-aggregate pattern where fine-grain "
    "sketches are persisted once and every coarser rollup is a sketch "
    "merge, never a re-scan of raw data (at 100 TB the daily sketches are "
    "KBs; re-counting distincts over a year is a full-corpus shuffle). "
    "The estimate is engine-specific, so like agg_approx_distinct the "
    "checkable contract is the ERROR BOUND: |merged estimate - exact| <= "
    "max(5, 5% of exact), with the exact side computed only as the "
    "verification twin. DuckDB reproduces the exact counts and the "
    "expected-TRUE bound.",
    tags=("agg", "approx", "sketch"),
)
def q_agg_hll_rollup(spark: SparkSession, sf: str) -> DataFrame:
    ev = tables(spark, sf)["events"]
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    rolled = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_users")
    )
    return (
        rolled.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= F.greatest(F.lit(5.0), F.col("exact_users") * 0.05)
            ).alias("within_bound"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k
# ---------------------------------------------------------------------------


@query(
    "topk",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    doc="ORDER BY + LIMIT fused to top-k (parity: state_test.rs:15-16; "
    "Catalyst plans TakeOrderedAndProject — no full sort). Tie-break on "
    "o_orderkey makes the selected set deterministic.",
    tags=("sort",),
)
def q_topk(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "set_union_all",
    oracle="""
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
    """,
    doc="UNION ALL (delegated surface).",
    tags=("setop",),
)
def q_set_union_all(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    a = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    b = t["orders"].filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("k")
    )
    return a.unionByName(b)


@query(
    "set_union_distinct",
    oracle="""
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
    """,
    doc="UNION (distinct) (delegated surface).",
    tags=("setop",),
)
def q_set_union_distinct(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    a = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    b = t["orders"].filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("k")
    )
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    oracle="""
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
    """,
    doc="INTERSECT (delegated surface).",
    tags=("setop",),
)
def q_set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    a = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    b = t["orders"].filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("k")
    )
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
    """,
    doc="EXCEPT (delegated surface).",
    tags=("setop",),
)
def q_set_except(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    a = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    b = t["orders"].filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("k")
    )
    # subtract == EXCEPT DISTINCT: drops a row entirely when it appears on the
    # right, regardless of multiplicities (exceptAll().distinct() would keep a
    # row whose left count merely exceeds its right count).
    return a.subtract(b)


# ---------------------------------------------------------------------------
# Subqueries
# ---------------------------------------------------------------------------


@query(
    "subquery_scalar",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT 0.9 * MAX(o_totalprice) FROM orders)
    """,
    doc="Uncorrelated scalar subquery (delegated surface). MAX is exact so "
    "the threshold is engine-portable.",
    tags=("subquery",),
)
def q_subquery_scalar(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT 0.9 * MAX(o_totalprice) FROM orders)
        """
    )


@query(
    "subquery_in",
    oracle="""
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
    doc="IN subquery → semi join after decorrelation (delegated surface).",
    tags=("subquery",),
)
def q_subquery_in(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        """
    )


@query(
    "subquery_exists",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    doc="Correlated EXISTS (delegated surface; Catalyst decorrelates).",
    tags=("subquery",),
)
def q_subquery_exists(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        """
    )


@query(
    "subquery_correlated_scalar",
    oracle="""
        SELECT c_custkey,
               (SELECT MAX(o_totalprice) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS max_order
        FROM customer c
    """,
    doc="Correlated scalar subquery in the projection (delegated surface).",
    tags=("subquery",),
)
def q_subquery_correlated_scalar(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT MAX(o_totalprice) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS max_order
        FROM customer c
        """
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped analytical queries (flagship bench set)
# ---------------------------------------------------------------------------


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS {DEC}) * CAST(1 - l_discount AS {DEC}))
                    AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(CAST(l_extendedprice AS {DEC}) * CAST(1 - l_discount AS {DEC})
                             AS {DEC4}) * CAST(1 + l_tax AS {DEC})) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary — the flagship scan+filter+groupBy-agg. "
    "Exactness discipline: the hot path sums FIXED-POINT INTEGERS (cents "
    "recovered via round(x*100); products are exact 4dp/6dp integers), "
    "because Spark's SUM(DECIMAL(18,2)) accumulates into DECIMAL(28,2) "
    "whose >18-digit precision leaves the long-backed fast path for "
    "per-row BigDecimal — measured 2.5x slower at 38M rows. The integer "
    "sums convert to the oracle's decimal values ONCE per group (exact "
    "decimal scale-shift, then one correctly-rounded cast to double), so "
    "results stay bit-identical to DuckDB's decimal sums. Overflow: the "
    "6dp charge term sums as a (DIV 1e6, MOD 1e6) hi/lo pair recombined "
    "exactly in decimal, good to ~1e19 rows x 1e6 units — int64-safe far "
    "past 100 TB; the 2dp sums carry 100x more headroom than the raw "
    "values.",
    tags=("tpch", "agg"),
)
def q_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    l = tables(spark, sf)["lineitem"]

    def cents(c) -> Column:
        return F.round(F.col(c) * 100).cast("bigint")

    x6 = cents("l_extendedprice") * (100 - cents("l_discount")) * (
        100 + cents("l_tax")
    )  # exact charge in 1e-6 units (<= ~4e10 per row)
    x6_lo = x6 % 1000000
    # (x6 - lo) is an exact multiple of 1e6 below 2^53, so the double
    # division is exact — no DIV operator in the Column API
    x6_hi = ((x6 - x6_lo) / 1000000).cast("bigint")

    def to_dbl(col: Column, shift: str) -> Column:
        # exact decimal scale-shift, then ONE correctly-rounded cast
        return (col.cast("decimal(38,0)") * F.lit(shift).cast(
            f"decimal({len(shift) - 2},{len(shift) - 2})"
        )).cast("double")

    cnt = F.count(F.lit(1))
    g = (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("s_qty"),
            F.sum(cents("l_extendedprice")).alias("s2"),
            F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias("s4"),
            F.sum(x6_hi).alias("s6_hi"),
            F.sum(x6_lo).alias("s6_lo"),
            F.sum(cents("l_discount")).alias("sd"),
            cnt.alias("cnt"),
        )
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.col("s_qty").alias("sum_qty"),
        to_dbl(F.col("s2"), "0.01").alias("sum_base_price"),
        to_dbl(F.col("s4"), "0.0001").alias("sum_disc_price"),
        (
            (
                F.col("s6_hi").cast("decimal(38,0)") * 1000000
                + F.col("s6_lo").cast("decimal(38,0)")
            )
            * F.lit("0.000001").cast("decimal(6,6)")
        ).cast("double").alias("sum_charge"),
        (F.col("s_qty").cast("double") / F.col("cnt")).alias("avg_qty"),
        (to_dbl(F.col("s2"), "0.01") / F.col("cnt")).alias("avg_price"),
        (to_dbl(F.col("sd"), "0.01") / F.col("cnt")).alias("avg_disc"),
        F.col("cnt").alias("count_order"),
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
        SELECT l.l_orderkey,
               CAST(SUM(CAST(l.l_extendedprice AS {DEC}) * CAST(1 - l.l_discount AS {DEC}))
                    AS DOUBLE) AS revenue,
               CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority — selective dim filter, two joins, "
    "grouped revenue, top-k. No forced broadcast: the filtered customer side "
    "is sf-proportional, AQE promotes it at runtime when small; the lineitem "
    "filter is pushed to the scan.",
    tags=("tpch", "join", "agg"),
)
def q_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
    l = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    rev4 = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    # Selective side first: date-filtered orders ⋈ BUILDING customers
    # compose to ~1/10 of orders BEFORE lineitem sees the join, so the
    # expensive orderkey join's build side is small (AQE promotes it to a
    # runtime broadcast when it fits; no hint — both inputs are
    # sf-proportional and a forced broadcast OOMs at scale). Lineitem
    # crosses the join as (orderkey, exact 1e-4-unit revenue) only.
    oc = o.select("o_orderkey", "o_custkey", "o_orderdate").join(
        c.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "o_orderdate")
    return (
        l.select("l_orderkey", rev4.alias("rev4"))
        .join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            (
                F.sum("rev4").cast("decimal(38,0)")
                * F.lit("0.0001").cast("decimal(4,4)")
            ).cast("double").alias("revenue")
        )
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("date").cast("string").alias("orderdate")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier",
    oracle=f"""
        SELECT n.n_name,
               CAST(SUM(CAST(l.l_extendedprice AS {DEC}) * CAST(1 - l.l_discount AS {DEC}))
                    AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
    """,
    doc="TPC-H Q5 star join across six tables. Join ORDER is the plan: "
    "the region filter propagates through nation->supplier FIRST, so "
    "lineitem is reduced ~5x by the (AQE-broadcast at bench scale, "
    "shuffle at 100 TB) supplier join before the expensive orderkey "
    "join, which then carries only three narrow integer columns per "
    "side; orders pre-joins customer (constant 25-nation payload) the "
    "same way. Catalyst has no CBO stats on raw parquet, so this "
    "filter-reducing order is declared explicitly — the same order "
    "DuckDB's optimizer derives. Revenue sums as exact fixed-point 1e-4 "
    "units (long-backed) with one decimal scale-shift per group; "
    "region/nation joins are hinted broadcasts (constant size at any "
    "SF), all sf-proportional joins are left to AQE.",
    tags=("tpch", "join", "agg"),
)
def q_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    r = t["region"].filter(F.col("r_name") == "ASIA")
    n = t["nation"].join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    s = t["supplier"].join(n, F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    rev4 = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    l_asia = (
        t["lineitem"]
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "s_nationkey", "n_name", rev4.alias("rev4"))
    )
    o_cust = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
    )
    return (
        l_asia.join(
            o_cust,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            (
                F.sum("rev4").cast("decimal(38,0)")
                * F.lit("0.0001").cast("decimal(4,4)")
            ).cast("double").alias("revenue")
        )
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
        SELECT CAST(SUM(CAST(l_extendedprice AS {DEC}) * CAST(l_discount AS {DEC}))
                    AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecasting-revenue change: pure scan + conjunctive "
    "filter + ungrouped sum — the pushdown stress test (every predicate "
    "reaches the parquet scan, no shuffle at all beyond the final "
    "single-row agg).",
    tags=("tpch", "agg"),
)
def q_tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    l = tables(spark, sf)["lineitem"]
    revenue = dec("l_extendedprice") * dec("l_discount")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@query(
    "tpch_q14_promo_effect",
    oracle=f"""
        SELECT 100.00 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                        THEN CAST(l.l_extendedprice AS {DEC})
                             * CAST(1 - l.l_discount AS {DEC})
                        ELSE CAST(0 AS {DEC4}) END) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice AS {DEC})
                       * CAST(1 - l.l_discount AS {DEC})) AS DOUBLE)
               AS promo_revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
    """,
    doc="TPC-H Q14 promotion effect: date-filtered lineitem joined to part, "
    "conditional aggregation ratio. Part is sf-proportional — no broadcast "
    "hint, AQE decides.",
    tags=("tpch", "join", "agg"),
)
def q_tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    rev = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast(DEC4)
    )
    return (
        l.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            # divide in DOUBLE after the exact decimal sums — decimal
            # division scale rules differ between engines at the last ulp
            (F.lit(100.00) * F.sum(promo).cast("double") / F.sum(rev).cast("double"))
            .alias("promo_revenue")
        )
    )


@query(
    "tpch_q18_large_volume",
    oracle=f"""
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS orderdate,
               CAST(o.o_totalprice AS DOUBLE) AS totalprice,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 150
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    doc="TPC-H Q18 large-volume customer: HAVING-filtered IN-subquery over "
    "the fact table (rewritten to a semi-join by both engines), 3-way join, "
    "grouped quantities, top-k by price.",
    tags=("tpch", "join", "agg", "subquery"),
)
def q_tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    l = t["lineitem"].join(big, "l_orderkey", "left_semi")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "tpch_q19_discounted",
    oracle=f"""
        SELECT CAST(SUM(CAST(l.l_extendedprice AS {DEC})
                        * CAST(1 - l.l_discount AS {DEC})) AS DOUBLE) AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 21)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 30
               AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 45
               AND l.l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 discounted-revenue shape (adapted to the fixture's "
    "reduced part schema: brand/size/quantity instead of container/"
    "shipmode): disjunction of conjunctive range predicates across both "
    "join sides — exercises OR-predicate pushdown and join-condition "
    "factoring.",
    tags=("tpch", "join", "agg"),
)
def q_tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    rev = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 45)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               CAST(SUM(CAST(l.l_extendedprice AS {DEC}) * CAST(1 - l.l_discount AS {DEC}))
                    AS DOUBLE) AS revenue,
               n.n_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 returned-item reporting — join + group + top-k by "
    "revenue. Plan shape (round-6 A/B at 64x, idle host, interleaved): "
    "the R-filtered lineitem joins orders DIRECTLY as (orderkey, exact "
    "1e-4-unit bigint) rows via a SHUFFLED HASH join (hinted: Catalyst "
    "prefers sort-merge, but sorting ~13M narrow probe rows is the "
    "measured bottleneck — 6.2 s SMJ vs 2.1 s SHJ at 64x, 0.7x the "
    "DuckDB oracle; the build side is two ints per order, bounded per "
    "partition at any scale by the orderkey shuffle width). The "
    "previous per-order pre-aggregation was measured OFF: with ~1.3 "
    "R-lineitems per order it bought 25% row reduction for a full extra "
    "9.6M-group exchange (A/B: no gain even under SMJ). Customer/nation "
    "dims join AFTER the custkey aggregation, one row per customer; "
    "exact fixed-point sums scale-shift to the oracle's decimal once "
    "per output row; top-20 fuses to TakeOrderedAndProject.",
    tags=("tpch", "join", "agg"),
)
def q_tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    rev4 = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    per_cust = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", rev4.alias("rev4"))
        .join(
            t["orders"].select("o_orderkey", "o_custkey").hint("shuffle_hash"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(
            (
                F.sum("rev4").cast("decimal(38,0)")
                * F.lit("0.0001").cast("decimal(4,4)")
            ).cast("double").alias("revenue")
        )
    )
    return (
        per_cust.join(
            t["customer"], F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 order-priority checking, adapted to the fixture's reduced "
    "lineitem schema (no commit/receipt dates): 'late' = a lineitem shipped "
    "more than 30 days after the order date. Correlated EXISTS against the "
    "fact table -> left-semi join with a cross-table predicate.",
    tags=("tpch", "subquery", "agg"),
)
def q_tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(volume) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
                   CAST(l.l_extendedprice AS {DEC})
                     * CAST(1 - l.l_discount AS {DEC}) AS volume
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                   AND TIMESTAMP '1997-12-31 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 volume shipping: 6-way join (two roles for nation), "
    "disjunctive cross-nation predicate, per-year revenue. The two nation "
    "dims are tiny in every TPC-H scaling model -> AQE broadcasts them; "
    "lineitem-orders-customer are shuffle joins on their keys.",
    tags=("tpch", "join", "agg"),
)
def q_tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    l = t["lineitem"].filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    volume = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    return (
        t["supplier"]
        .join(l, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(volume).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN nation = 'NATION_7' THEN volume
                        ELSE CAST(0 AS {DEC4}) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        FROM (
            SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(l.l_extendedprice AS {DEC})
                     * CAST(1 - l.l_discount AS {DEC}) AS volume,
                   n2.n_name AS nation
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
            JOIN region r ON n1.n_regionkey = r.r_regionkey
            JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                    AND TIMESTAMP '1997-12-31 00:00:00'
              AND p.p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
    """,
    doc="TPC-H Q8 national market share: 8-way join spanning every "
    "dimension, conditional-share ratio per year. Divisions run in DOUBLE "
    "after exact decimal sums (engine decimal-division scales differ).",
    tags=("tpch", "join", "agg"),
)
def q_tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    o = t["orders"].filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    volume = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    nat_volume = F.when(F.col("nation") == "NATION_7", volume).otherwise(
        F.lit(0).cast(DEC4)
    )
    return (
        t["part"]
        .filter(F.col("p_type") == "ECONOMY")
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (F.sum(nat_volume).cast("double") / F.sum(volume).cast("double")).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 customer order-count distribution, adapted to the "
    "fixture's reduced orders schema (priority filter instead of the "
    "o_comment NOT LIKE): outer join with an ON-clause predicate (must not "
    "degrade to inner), COUNT over nullable keys, then a second aggregation "
    "over the first's result — two shuffles, both on narrow keys.",
    tags=("tpch", "join", "agg"),
)
def q_tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    o = t["orders"].filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
    return (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(l_extendedprice AS {DEC})
                       * CAST(1 - l_discount AS {DEC})) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name,
               CAST(r.total_revenue AS DOUBLE) AS total_revenue
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 top supplier: quarterly revenue 'view' reused twice "
    "(per-supplier revenue + its global max) — a scalar aggregate subquery "
    "over an aggregate. The max comparison runs on the EXACT decimal sums; "
    "only the output is cast to double.",
    tags=("tpch", "subquery", "agg"),
)
def q_tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q17_small_quantity",
    oracle=f"""
        SELECT CAST(SUM(CAST(l.l_extendedprice AS {DEC})) AS DOUBLE) / 7.0
               AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#2' AND p.p_size < 10
          AND l.l_quantity < (
              SELECT 0.2 * AVG(CAST(l2.l_quantity AS DOUBLE))
              FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
    doc="TPC-H Q17 small-quantity-order revenue, adapted to the fixture's "
    "part schema (brand+size instead of brand+container): correlated AVG "
    "subquery over the fact table — decorrelated into a per-part aggregate "
    "joined back on partkey (one extra narrow shuffle, no re-scan per row).",
    tags=("tpch", "subquery", "agg"),
)
def q_tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    part = t["part"].filter((F.col("p_brand") == "Brand#2") & (F.col("p_size") < 10))
    per_part = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg((F.lit(0.2) * F.avg(F.col("l_quantity").cast("double"))).alias("qty_cut"))
    )
    return (
        t["lineitem"]
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("p_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "tpch_q21_suppliers_waiting",
    oracle="""
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND n.n_name = 'NATION_1'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
    """,
    doc="TPC-H Q21 suppliers who kept orders waiting, adapted lateness "
    "predicate (shipped >60 days after order date; fixture has no commit/"
    "receipt dates): EXISTS + correlated NOT EXISTS against the fact table "
    "-> left-semi then left-anti join, both hash-partitioned on l_orderkey.",
    tags=("tpch", "subquery", "join", "agg"),
)
def q_tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    l1 = (
        t["supplier"]
        .join(t["lineitem"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_1")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("s_name", "l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = t["lineitem"].select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    some_other = l1.join(
        l2,
        (F.col("x_orderkey") == F.col("l_orderkey"))
        & (F.col("x_suppkey") != F.col("l_suppkey")),
        "left_semi",
    )
    no_other_late = some_other.join(
        l2,
        (F.col("x_orderkey") == F.col("l_orderkey"))
        & (F.col("x_suppkey") != F.col("l_suppkey"))
        & (F.col("x_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_anti",
    )
    return (
        no_other_late.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


@query(
    "tpch_q22_global_sales",
    oracle="""
        SELECT c.c_nationkey AS cntrycode,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer c
        WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
          AND c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_acctbal > 0.00
                               AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY c.c_nationkey
        ORDER BY cntrycode
    """,
    doc="TPC-H Q22 global sales opportunity, adapted country code "
    "(c_nationkey instead of the fixture-absent phone prefix) and lapse "
    "window (no orders since 1999, Q22's 'no orders in 7 years' shape): "
    "scalar AVG subquery (broadcast single row), anti-join against the "
    "date-filtered orders, grouped balances.",
    tags=("tpch", "subquery", "join", "agg"),
)
def q_tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    codes = [1, 3, 5, 7, 9, 11, 13]
    eligible = t["customer"].filter(F.col("c_nationkey").isin(codes))
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.00).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        eligible.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"]
            .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
            .select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
        WITH offers AS (
            SELECT l_partkey AS o_partkey, l_suppkey AS o_suppkey,
                   MIN(l_extendedprice) AS supply_cost
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        ), eu AS (
            SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'
        )
        SELECT eu.s_acctbal, eu.s_name, eu.n_name, p.p_partkey, p.p_name,
               o.supply_cost
        FROM part p
        JOIN offers o ON o.o_partkey = p.p_partkey
        JOIN eu ON eu.s_suppkey = o.o_suppkey
        WHERE p.p_size = 15 AND p.p_type = 'SMALL'
          AND o.supply_cost = (
              SELECT MIN(o2.supply_cost)
              FROM offers o2 JOIN eu e2 ON e2.s_suppkey = o2.o_suppkey
              WHERE o2.o_partkey = p.p_partkey)
        ORDER BY eu.s_acctbal DESC, eu.n_name, eu.s_name, p.p_partkey
        LIMIT 100
    """,
    doc="TPC-H Q2 minimum-cost supplier, adapted to the fixture (no "
    "partsupp): the part-supplier offer relation is derived from lineitem "
    "(supply cost = MIN observed sale price — MIN over doubles is "
    "order-independent, so exact across engines). Correlated MIN subquery "
    "decorrelated into a per-part aggregate joined back on partkey; the "
    "region-filtered supplier dim stays broadcast-size at every SF.",
    tags=("tpch", "subquery", "join"),
)
def q_tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    offers = (
        t["lineitem"]
        .groupBy(
            F.col("l_partkey").alias("o_partkey"),
            F.col("l_suppkey").alias("o_suppkey"),
        )
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    eu = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_offers = offers.join(
        F.broadcast(eu), F.col("o_suppkey") == F.col("s_suppkey")
    )
    best = eu_offers.groupBy(F.col("o_partkey").alias("b_partkey")).agg(
        F.min("supply_cost").alias("best_cost")
    )
    p = t["part"].filter((F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
    return (
        p.join(eu_offers, F.col("p_partkey") == F.col("o_partkey"))
        .join(
            best,
            (F.col("p_partkey") == F.col("b_partkey"))
            & (F.col("supply_cost") == F.col("best_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
        SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        FROM (
            SELECT n.n_name AS nation,
                   CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(l.l_extendedprice AS {DEC})
                     * CAST(1 - l.l_discount AS {DEC}) AS amount
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE p.p_name LIKE '%bolt%'
        ) profit
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 product-type profit, adapted to the fixture (no partsupp "
    "supply cost: amount = discounted revenue): 5-way join with a LIKE "
    "pushdown on part, per-nation-per-year exact decimal sums. The "
    "name-filtered part side prunes the fact scan through the join; nation "
    "is broadcast at every SF.",
    tags=("tpch", "join", "agg"),
)
def q_tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    amount = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    return (
        t["part"]
        .filter(F.col("p_name").like("%bolt%"))
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
        WITH stock AS (
            SELECT l.l_partkey AS partkey,
                   SUM(CAST(l.l_extendedprice AS {DEC})) AS value
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_3'
            GROUP BY l.l_partkey
        )
        SELECT partkey, CAST(value AS DOUBLE) AS value
        FROM stock
        WHERE CAST(value AS DOUBLE) >
              (SELECT CAST(SUM(value) AS DOUBLE) * 0.001 FROM stock)
        ORDER BY value DESC, partkey
    """,
    doc="TPC-H Q11 important stock, adapted to the fixture (no partsupp: "
    "per-part 'value' = exact decimal revenue sum through NATION_3 "
    "suppliers). The grouped CTE is reused for both the per-part values and "
    "the global threshold — Spark computes it once per branch; the scalar "
    "threshold is a single-row broadcast cross join. Threshold comparison "
    "runs in DOUBLE derived from exact decimal sums on both engines.",
    tags=("tpch", "subquery", "agg"),
)
def q_tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    nat_sup = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    stock = (
        t["lineitem"]
        .join(F.broadcast(nat_sup), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(dec("l_extendedprice")).alias("value"))
    )
    threshold = stock.agg(
        (F.sum("value").cast("double") * F.lit(0.001)).alias("cutoff")
    )
    return (
        stock.join(F.broadcast(threshold))
        .filter(F.col("value").cast("double") > F.col("cutoff"))
        .select("partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "partkey")
    )


@query(
    "tpch_q12_shipping_priority_class",
    oracle="""
        SELECT l.l_linestatus AS shipclass,
               COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS high_line_count,
               COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS low_line_count
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        GROUP BY shipclass
        ORDER BY shipclass
    """,
    doc="TPC-H Q12 shipping modes & order priority, adapted to the fixture "
    "(no l_shipmode/commit/receipt dates: classes come from l_linestatus, "
    "'late' = shipped >60 days after order date). Conditional COUNT "
    "aggregation over a cross-table join predicate; date range pushed to "
    "the lineitem scan.",
    tags=("tpch", "join", "agg"),
)
def q_tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_linestatus").alias("shipclass"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("shipclass")
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT pr.pr_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey AS pr_partkey, l_suppkey AS pr_suppkey
              FROM lineitem) pr
        JOIN part p ON p.p_partkey = pr.pr_partkey
        WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 36)
          AND pr.pr_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 parts/supplier relationship, adapted to the fixture (the "
    "part-supplier relation is DISTINCT (l_partkey, l_suppkey) from "
    "lineitem; the 'complaints' supplier exclusion becomes negative account "
    "balance). NOT IN over a non-null key -> left-anti join; COUNT(DISTINCT) "
    "per 3-attribute group.",
    tags=("tpch", "join", "agg", "subquery"),
)
def q_tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    pr = (
        t["lineitem"]
        .select(
            F.col("l_partkey").alias("pr_partkey"),
            F.col("l_suppkey").alias("pr_suppkey"),
        )
        .distinct()
    )
    bad = (
        t["supplier"]
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("pr_suppkey"))
    )
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 36)
    )
    return (
        pr.join(F.broadcast(bad), "pr_suppkey", "left_anti")
        .join(p, F.col("pr_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("pr_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q20_potential_promotion",
    oracle=f"""
        WITH small_parts AS (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        ), shipped AS (
            SELECT l.l_suppkey AS suppkey,
                   SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                             AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                            THEN CAST(l.l_quantity AS {DEC})
                            ELSE CAST(0 AS {DEC}) END) AS qty_1996,
                   SUM(CAST(l.l_quantity AS {DEC})) AS qty_total
            FROM lineitem l
            JOIN small_parts sp ON sp.p_partkey = l.l_partkey
            GROUP BY l.l_suppkey
        )
        SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_2', 'NATION_4', 'NATION_6')
          AND s.s_suppkey IN (
              SELECT suppkey FROM shipped
              WHERE CAST(qty_1996 AS DOUBLE) > 0.15 * CAST(qty_total AS DOUBLE))
        ORDER BY s.s_name
    """,
    doc="TPC-H Q20 potential part promotion, adapted to the fixture (no "
    "partsupp availqty: a supplier is 'promotable' when its 1996 shipped "
    "quantity of small-named parts exceeds 15% of its all-time shipped "
    "quantity of those parts). Nested IN subqueries -> semi-join chain; "
    "quantity sums are exact decimals, the ratio compare runs in DOUBLE.",
    tags=("tpch", "subquery", "join"),
)
def q_tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    small = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    in_96 = (
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        t["lineitem"]
        .join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                F.when(in_96, dec("l_quantity")).otherwise(F.lit(0).cast(DEC))
            ).alias("qty_1996"),
            F.sum(dec("l_quantity")).alias("qty_total"),
        )
    )
    promotable = shipped.filter(
        F.col("qty_1996").cast("double") > F.lit(0.15) * F.col("qty_total").cast("double")
    ).select(F.col("suppkey").alias("s_suppkey"))
    return (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].filter(
                    F.col("n_name").isin("NATION_2", "NATION_4", "NATION_6")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(promotable, "s_suppkey", "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_name")
    )


_PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)


@query(
    "agg_pivot",
    oracle="""
        SELECT o_orderstatus,
               CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS p1,
               CAST(count_if(o_orderpriority = '2-HIGH') AS BIGINT) AS p2,
               CAST(count_if(o_orderpriority = '3-MEDIUM') AS BIGINT) AS p3,
               CAST(count_if(o_orderpriority = '4-NOT SPECIFIED') AS BIGINT)
                   AS p4,
               CAST(count_if(o_orderpriority = '5-LOW') AS BIGINT) AS p5
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="Pivot (long-to-wide counts): Spark's groupBy().pivot() with the "
    "value list supplied explicitly — one shuffle, no second pass to "
    "discover pivot values (the implicit-values form runs an extra "
    "distinct job and is unbounded-width at scale). Oracle states the "
    "equivalent conditional aggregation, which is also the shape "
    "DataFusion users write since SQL has no PIVOT there.",
    tags=("agg", "pivot"),
)
def q_agg_pivot(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    wide = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", list(_PRIORITIES))
        .count()
    )
    return wide.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0))
            .cast("bigint")
            .alias(f"p{i + 1}")
            for i, p in enumerate(_PRIORITIES)
        ],
    )


@query(
    "cte_recursive",
    oracle="""
        WITH RECURSIVE decay(rk, bal, step) AS (
            SELECT n_regionkey AS rk,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
                       AS bal,
                   0 AS step
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_regionkey
            UNION ALL
            SELECT rk, bal * 0.5, step + 1 FROM decay
            WHERE bal * 0.5 >= 1000
        )
        SELECT CAST(rk AS BIGINT) AS rk,
               CAST(step AS BIGINT) AS step,
               ROUND(bal, 4) AS bal
        FROM decay
    """,
    doc="Recursive CTE (Spark 4 WITH RECURSIVE, delegated surface — a "
    "DataFusion client can submit recursive CTEs through service.rs:171 "
    "since DataFusion 28): per-region account-balance halving schedule "
    "until a floor, an iterate-until-converged computation inexpressible "
    "in non-recursive SQL. Seeded from a decimal-exact aggregate; the "
    "step multiplies by 0.5 (exact in binary floating point), so every "
    "engine produces bit-identical DOUBLEs at every depth. Recursion "
    "depth is data-independent of corpus size (log of the seed), so the "
    "plan's iteration count stays bounded at 100 TB.",
    tags=("cte", "recursion"),
)
def q_cte_recursive(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        """
        WITH RECURSIVE decay(rk, bal, step) AS (
            SELECT n_regionkey AS rk,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
                       AS bal,
                   0 AS step
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_regionkey
            UNION ALL
            SELECT rk, bal * 0.5, step + 1 FROM decay
            WHERE bal * 0.5 >= 1000
        )
        SELECT CAST(rk AS BIGINT) AS rk,
               CAST(step AS BIGINT) AS step,
               ROUND(bal, 4) AS bal
        FROM decay
        """
    )


@query(
    "agg_corr_regr",
    oracle="""
        WITH s AS (SELECT l_returnflag,
                          CAST(COUNT(*) AS DOUBLE) AS nd,
                          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                               AS DOUBLE) AS sx,
                          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                               AS DOUBLE) AS sy,
                          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                                   * CAST(l_quantity AS DECIMAL(18,2)))
                               AS DOUBLE) AS sxx,
                          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                                   * CAST(l_extendedprice AS DECIMAL(18,2)))
                               AS DOUBLE) AS syy,
                          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                                   * CAST(l_extendedprice AS DECIMAL(18,2)))
                               AS DOUBLE) AS sxy
                   FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag,
               ROUND((sxy - sx * sy / nd) / nd, 6) AS covar_pop,
               ROUND((sxy - sx * sy / nd) / (nd - 1), 6) AS covar_samp,
               ROUND((nd * sxy - sx * sy)
                     / SQRT((nd * sxx - sx * sx) * (nd * syy - sy * sy)),
                     6) AS corr,
               ROUND((nd * sxy - sx * sy) / (nd * sxx - sx * sx), 6)
                   AS slope,
               ROUND((sy - (nd * sxy - sx * sy) / (nd * sxx - sx * sx) * sx)
                     / nd, 6) AS intercept
        FROM s
    """,
    doc="Correlation / covariance / linear regression per group "
    "(delegated surface: corr, covar_pop/samp, regr_slope/intercept). "
    "NOT the built-in aggregates: their streaming co-moment updates "
    "accumulate in partition order, so a distributed run and a "
    "single-thread oracle disagree in the last bits. Instead the five "
    "exact decimal power sums (n, Σx, Σy, Σx², Σy², Σxy) are computed "
    "order-independently, then every statistic is derived with one "
    "identical DOUBLE formula in both engines — the numerically-stable "
    "AND reproducible shape for 100 TB (partial-aggregatable sums, one "
    "shuffle of |groups| rows).",
    tags=("agg", "stats"),
)
def q_agg_corr_regr(spark: SparkSession, sf: str) -> DataFrame:
    li = tables(spark, sf)["lineitem"]
    xd = F.col("l_quantity").cast("decimal(18,2)")
    yd = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("nd"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
    )
    nd, sx, sy = F.col("nd"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        F.round((sxy - sx * sy / nd) / nd, 6).alias("covar_pop"),
        F.round((sxy - sx * sy / nd) / (nd - 1), 6).alias("covar_samp"),
        F.round(
            (nd * sxy - sx * sy)
            / F.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)),
            6,
        ).alias("corr"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / nd, 6).alias("intercept"),
    )


@query(
    "agg_listagg",
    oracle="""
        SELECT r_name,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    doc="Ordered string aggregation (Spark 4 listagg WITHIN GROUP; "
    "DuckDB/Postgres string_agg ORDER BY — delegated surface either "
    "way). The explicit ORDER BY inside the aggregate is what makes a "
    "concatenation deterministic on a distributed engine: without it the "
    "result depends on partition arrival order.",
    tags=("agg", "string"),
)
def q_agg_listagg(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        """
        SELECT r_name,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
                   AS nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@query(
    "agg_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
               l_quantity AS val FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
    doc="UNPIVOT / melt — wide-to-long reshaping, the inverse of agg_pivot. "
    "Spark's native unpivot (Expand node: one pass over the input emitting "
    "4 rows per input row, no join and no shuffle) vs the oracle's "
    "4-way UNION ALL, which scans the table 4 times — the Expand form is "
    "the 100 TB-honest plan.",
    tags=("agg", "reshape"),
)
def q_agg_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    li = tables(spark, sf)["lineitem"]
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    ).withColumn("metric", F.replace(F.col("metric"), F.lit("l_"), F.lit("")))


@query(
    "join_lateral",
    oracle="""
        SELECT n.n_name, l.c_custkey, l.c_acctbal
        FROM nation n, LATERAL (
            SELECT c_custkey, c_acctbal
            FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) l
    """,
    doc="Correlated LATERAL join: top-2 customers by account balance per "
    "nation, written as a per-row dependent subquery. Catalyst "
    "decorrelates it into the same join + ranked-window plan as "
    "window_topk_per_group — no per-nation re-execution survives into the "
    "physical plan, which is what makes the construct safe at 100 TB "
    "(a naive nested-loop would run the inner query once per outer row).",
    tags=("join", "subquery"),
)
def q_join_lateral(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        """
        SELECT n.n_name, l.c_custkey, l.c_acctbal
        FROM nation n, LATERAL (
            SELECT c_custkey, c_acctbal
            FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) l
        """
    )


@query(
    "agg_filter_clause",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
                    FILTER (WHERE o_totalprice > 150000) AS DOUBLE)
                   AS big_total
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="SQL-standard FILTER clause on aggregates: per-group conditional "
    "counts/sums in ONE pass over the input — the idiom that replaces N "
    "self-joins or N scans for N conditions. Catalyst folds each FILTER "
    "into the aggregate's accumulator condition, keeping partial "
    "aggregation map-side; groups with no qualifying rows yield NULL "
    "sums in both engines. Decimal-cast sum for order-independence.",
    tags=("agg",),
)
def q_agg_filter_clause(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
                    FILTER (WHERE o_totalprice > 150000) AS DOUBLE)
                   AS big_total
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@query(
    "agg_array",
    oracle="""
        SELECT n_regionkey,
               CAST(len(list(n_name)) AS BIGINT) AS n_nations,
               array_to_string(list_sort(list(n_name)), ',') AS nations,
               array_to_string(list_sort(list(DISTINCT substr(n_name, 1, 1))),
                               ',') AS initials
        FROM nation
        GROUP BY n_regionkey
    """,
    doc="Array aggregation (collect_list / array_agg + collect_set) with "
    "the determinism discipline a distributed engine needs: the collected "
    "array is sorted before use because collection order is "
    "partition-arrival order — array_sort(collect_list(..)) is the only "
    "stable contract. Rows stay one-per-group (no explode), so the "
    "shuffle carries |groups| rows however wide the arrays get; arrays "
    "reduced to joined scalars for portable hashing (repo convention, "
    "cf. fn_array).",
    tags=("agg", "array"),
)
def q_agg_array(spark: SparkSession, sf: str) -> DataFrame:
    n = tables(spark, sf)["nation"]
    return n.groupBy("n_regionkey").agg(
        F.size(F.collect_list("n_name")).cast("bigint").alias("n_nations"),
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
            "nations"
        ),
        F.array_join(
            F.array_sort(F.collect_set(F.substring("n_name", 1, 1))), ","
        ).alias("initials"),
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
        SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts
        FROM lineitem
        GROUP BY l_suppkey
    """,
    doc="EXACT distinct counting via mergeable bitmaps (Spark 4 bitmap_* "
    "aggregates): values bucket into 32k-bit bitmap segments keyed by "
    "bitmap_bucket_number, each segment OR-merges associatively map-side, "
    "and bitmap_count sums per group. Unlike approx_count_distinct this "
    "is exact, and unlike COUNT(DISTINCT) the partial state is a fixed "
    "4KB segment per bucket instead of a shuffle of every distinct value "
    "— the same persist-partials-then-merge rollup contract as the HLL "
    "sketch path (tests/test_sketches.py), verified here against the "
    "plain COUNT(DISTINCT) oracle.",
    tags=("agg", "sketch"),
)
def q_agg_bitmap_distinct(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        """
        SELECT l_suppkey, SUM(seg_cnt) AS n_parts
        FROM (
            SELECT l_suppkey,
                   bitmap_count(bitmap_construct_agg(
                       bitmap_bit_position(l_partkey))) AS seg_cnt
            FROM lineitem
            GROUP BY l_suppkey, bitmap_bucket_number(l_partkey)
        )
        GROUP BY l_suppkey
        """
    )


@query(
    "agg_bitmap_intersect",
    oracle="""
        WITH v AS (SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR)
                              AS day, user_id
                   FROM events WHERE event_type = 'view'),
             p AS (SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR)
                              AS day, user_id
                   FROM events WHERE event_type = 'purchase'),
             b AS (SELECT day, COUNT(*) AS n_both
                   FROM (SELECT DISTINCT day, user_id FROM v
                         INTERSECT
                         SELECT DISTINCT day, user_id FROM p)
                   GROUP BY day)
        SELECT d.day,
               CAST(d.n_view AS BIGINT) AS n_view,
               CAST(d.n_purchase AS BIGINT) AS n_purchase,
               CAST(COALESCE(b.n_both, 0) AS BIGINT) AS n_both
        FROM (SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR)
                         AS day,
                     COUNT(DISTINCT CASE WHEN event_type = 'view'
                                         THEN user_id END) AS n_view,
                     COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                         THEN user_id END) AS n_purchase
              FROM events
              WHERE event_type IN ('view', 'purchase')
              GROUP BY 1) d
        LEFT JOIN b ON d.day = b.day
    """,
    doc="EXACT audience-overlap counting via mergeable bitmaps: per day, "
    "how many users both viewed AND purchased. Spark 4 has bitmap OR "
    "merges but no bitmap AND, so the intersection comes from "
    "inclusion-exclusion — per (day, bitmap bucket): |view| + |purchase| "
    "- |view OR purchase|, each side a conditional "
    "bitmap_construct_agg whose 4KB segments partial-aggregate map-side; "
    "bucket counts then sum per day. One pass over the events, fixed-size "
    "partial state — at 100 TB the alternative (a distinct-pair self-join "
    "per day) shuffles the raw stream twice. The oracle computes the "
    "same overlap independently via INTERSECT, so the identity itself is "
    "cross-checked, not assumed.",
    tags=("agg", "sketch"),
)
def q_agg_bitmap_intersect(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        """
        SELECT day,
               CAST(SUM(v_cnt) AS BIGINT) AS n_view,
               CAST(SUM(p_cnt) AS BIGINT) AS n_purchase,
               CAST(SUM(v_cnt + p_cnt - u_cnt) AS BIGINT) AS n_both
        FROM (
            SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS STRING) AS day,
                   bitmap_count(bitmap_construct_agg(
                       CASE WHEN event_type = 'view'
                            THEN bitmap_bit_position(user_id) END))
                       AS v_cnt,
                   bitmap_count(bitmap_construct_agg(
                       CASE WHEN event_type = 'purchase'
                            THEN bitmap_bit_position(user_id) END))
                       AS p_cnt,
                   bitmap_count(bitmap_construct_agg(
                       CASE WHEN event_type IN ('view', 'purchase')
                            THEN bitmap_bit_position(user_id) END))
                       AS u_cnt
            FROM events
            WHERE event_type IN ('view', 'purchase')
            GROUP BY CAST(CAST(date_trunc('day', ts) AS DATE) AS STRING),
                     bitmap_bucket_number(user_id)
        )
        GROUP BY day
        """
    )


@query(
    "agg_minmax_by",
    oracle="""
        WITH mx AS (
            SELECT l_suppkey, l_orderkey AS max_order,
                   l_extendedprice AS max_price
            FROM (SELECT l_suppkey, l_orderkey, l_extendedprice,
                         ROW_NUMBER() OVER
                           (PARTITION BY l_suppkey
                            ORDER BY l_extendedprice DESC, l_orderkey DESC)
                           AS rn
                  FROM lineitem)
            WHERE rn = 1
        ),
        mn AS (
            SELECT l_suppkey, l_orderkey AS min_order,
                   l_extendedprice AS min_price
            FROM (SELECT l_suppkey, l_orderkey, l_extendedprice,
                         ROW_NUMBER() OVER
                           (PARTITION BY l_suppkey
                            ORDER BY l_extendedprice ASC, l_orderkey ASC)
                           AS rn
                  FROM lineitem)
            WHERE rn = 1
        )
        SELECT mx.l_suppkey, max_order, max_price, min_order, min_price
        FROM mx JOIN mn ON mx.l_suppkey = mn.l_suppkey
    """,
    doc="Argument-extremum aggregates (max_by / min_by, a.k.a. "
    "arg_max/arg_min): the order line carrying each supplier's "
    "highest/lowest extended price in ONE partial-aggregatable pass — no "
    "window, no self-join, shuffle carries one struct per group. Ordering "
    "keys are (price, orderkey) structs so ties resolve deterministically "
    "on any engine (max_by on the bare price would be partition-arrival-"
    "dependent); the oracle replicates that exact tie-break with ranked "
    "windows, which is also what the operator replaces at scale.",
    tags=("agg",),
)
def q_agg_minmax_by(spark: SparkSession, sf: str) -> DataFrame:
    li = tables(spark, sf)["lineitem"]
    return li.groupBy("l_suppkey").agg(
        F.expr(
            "max_by(l_orderkey, struct(l_extendedprice, l_orderkey))"
        ).alias("max_order"),
        F.max("l_extendedprice").alias("max_price"),
        F.expr(
            "min_by(l_orderkey, struct(l_extendedprice, l_orderkey))"
        ).alias("min_order"),
        F.min("l_extendedprice").alias("min_price"),
    )
