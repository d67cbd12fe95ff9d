"""Window function queries (SURVEY.md §2.B window surface).

Not exercised in the reference's own code — fully delegated through
``create_logical_plan`` (reference: datafusion-flight-sql-server/src/
service.rs:171); DataFusion 53 and Spark share the full SQL-standard window
surface 1:1 (ranking, analytic, aggregates-over-windows, ROWS frames).

Determinism discipline: ranking windows order by a unique key combination
(value + key tie-break); rank/dense_rank over non-unique orders are
deterministic by definition (ties share ranks). Running sums go through
decimal casts (exact per-frame arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.queries.catalog import query, tables
from datafusion_flight_sql_server_spark.queries.relational import dec


@query(
    "window_rank",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn,
               CAST(RANK() OVER (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC) AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC) AS BIGINT) AS drnk,
               CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile
        FROM customer
    """,
    doc="Ranking windows: row_number/rank/dense_rank/ntile (delegated "
    "surface). One shuffle on the partition key serves all four functions.",
    tags=("window",),
)
def q_window_rank(spark: SparkSession, sf: str) -> DataFrame:
    c = tables(spark, sf)["customer"]
    unique = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    tied = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(unique).cast("bigint").alias("rn"),
        F.rank().over(tied).cast("bigint").alias("rnk"),
        F.dense_rank().over(tied).cast("bigint").alias("drnk"),
        F.ntile(4).over(unique).cast("bigint").alias("quartile"),
    )


@query(
    "window_analytic",
    oracle="""
        SELECT o_orderkey, o_custkey,
               LAG(o_totalprice) OVER w AS prev_price,
               LEAD(o_totalprice) OVER w AS next_price,
               FIRST_VALUE(o_totalprice) OVER w AS first_price,
               LAST_VALUE(o_totalprice) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_price,
               NTH_VALUE(o_totalprice, 2) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Analytic windows: lag/lead/first_value/last_value/nth_value with "
    "explicit full frames for the from-the-end/positional ones (delegated "
    "surface).",
    tags=("window",),
)
def q_window_analytic(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
    )


@query(
    "window_running",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS running_total,
               CAST(COUNT(*) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS running_n
        FROM orders
    """,
    doc="Aggregates over a running ROWS frame (delegated surface); decimal "
    "cast keeps the per-frame sums exact across engines.",
    tags=("window",),
)
def q_window_running(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("running_n"),
    )


@query(
    "window_topk_per_group",
    oracle="""
        SELECT c_mktsegment, c_custkey, c_acctbal
        FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                     ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal DESC, c_custkey) AS rn
              FROM customer)
        WHERE rn <= 3
    """,
    doc="Top-K per group via ranking window — the canonical OLAP pattern "
    "(single shuffle; no self-join).",
    tags=("window",),
)
def q_window_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    c = tables(spark, sf)["customer"]
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
    )


@query(
    "window_distribution",
    oracle="""
        SELECT c_custkey,
               c_nationkey,
               CAST(FLOOR(PERCENT_RANK() OVER w * 1000000 + 0.5) AS BIGINT)
                   AS pct_rank_micros,
               CAST(FLOOR(CUME_DIST() OVER w * 1000000 + 0.5) AS BIGINT)
                   AS cume_micros,
               CAST(NTILE(4) OVER w AS BIGINT) AS quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    doc="Distribution window functions (delegated surface): percent_rank / "
    "cume_dist / ntile over a per-nation total order (tie-broken on the key "
    "so bucket boundaries are engine-stable). Fractions are emitted as "
    "BIGINT micros via floor(x*1e6+0.5) rather than ROUND(double, 6): the "
    "ratios k/n are bit-identical IEEE doubles in both engines, and "
    "mul/add/floor are all IEEE-exact, so the micros match everywhere — "
    "while ROUND on a double that sits on the .5 ulp boundary (e.g. "
    "cume_dist = 0.5203125 at sf0.1) disagrees between Spark's "
    "BigDecimal(HALF_UP on shortest repr) and DuckDB's binary rounding.",
    tags=("window",),
)
def q_window_distribution(spark: SparkSession, sf: str) -> DataFrame:
    c = tables(spark, sf)["customer"]
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.percent_rank().over(w) * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("pct_rank_micros"),
        F.floor(F.cume_dist().over(w) * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("cume_micros"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@query(
    "window_range_frame",
    oracle="""
        -- floor-divided whole seconds: DuckDB epoch() returns FRACTIONAL
        -- seconds (a BIGINT cast would round, Spark truncates); integer
        -- epoch_us // 1e6 floors identically in both engines
        SELECT event_id, user_id,
               epoch_us(ts) // 1000000 AS ep,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER
                   (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
                    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS trailing_1h_sum,
               CAST(COUNT(*) OVER
                   (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
                    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS trailing_1h_n
        FROM events
    """,
    doc="RANGE-frame window (delegated surface, completes the ROWS/RANGE "
    "frame row): per-user trailing one-hour sum/count over event time — "
    "the trailing-window feature shape of training pipelines. RANGE "
    "includes all peers of the boundary values, so same-second ties "
    "aggregate identically in any execution order — deterministic without "
    "a unique tie-break. Exact decimal sums cast to DOUBLE.",
    tags=("window", "events"),
)
def q_window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"]
    ep = F.expr("unix_micros(ts) div 1000000")
    w = (
        W.partitionBy("user_id")
        .orderBy(ep)
        .rangeBetween(-3600, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        ep.cast("bigint").alias("ep"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("trailing_1h_sum"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("trailing_1h_n"),
    )


@query(
    "window_ignore_nulls",
    oracle="""
        WITH e AS (SELECT event_id, user_id,
                          CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ep,
                          CASE WHEN event_type = 'purchase'
                               THEN ROUND(value, 6) END AS purchase_amt
                   FROM events)
        SELECT event_id, user_id, ep,
               last_value(purchase_amt IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ep, event_id)
                   AS last_purchase,
               lead(purchase_amt IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ep, event_id)
                   AS next_purchase
        FROM e
    """,
    doc="IGNORE NULLS analytic windows (delegated surface): per user, "
    "carry the last seen purchase amount forward (LOCF) and look ahead "
    "to the next one — the standard sparse-signal densification over an "
    "event stream. One shuffle on user_id serves both windows; ordering "
    "by (epoch, event_id) is a total order so ties cannot reorder "
    "between engines. Spark SQL text because the DataFrame lead/lag API "
    "has no ignorenulls flag (F.last does; lead does not).",
    tags=("window",),
)
def q_window_ignore_nulls(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        """
        WITH e AS (SELECT event_id, user_id,
                          unix_micros(ts) div 1000000 AS ep,
                          CASE WHEN event_type = 'purchase'
                               THEN ROUND(value, 6) END AS purchase_amt
                   FROM events)
        SELECT event_id, user_id, ep,
               last_value(purchase_amt) IGNORE NULLS
                   OVER (PARTITION BY user_id ORDER BY ep, event_id)
                   AS last_purchase,
               lead(purchase_amt) IGNORE NULLS
                   OVER (PARTITION BY user_id ORDER BY ep, event_id)
                   AS next_purchase
        FROM e
        """
    )


@query(
    "window_moving_median",
    oracle="""
        SELECT event_id, user_id,
               vals[(len(vals) + 1) // 2] AS med
        FROM (SELECT event_id, user_id,
                     list_sort(list(value) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) AS vals
              FROM events)
    """,
    doc="Exact moving median: per user, the lower median of the trailing "
    "20 event values — the robust-center analogue of event_anomaly's "
    "trailing z-score (medians shrug off the outliers that wreck a "
    "trailing mean). Spark has no exact median window aggregate, so the "
    "portable form collects the frame (collect_list OVER the 20-row "
    "frame), sorts the tiny array row-locally, and SELECTS the middle "
    "element — no arithmetic on the values at all, so cross-engine "
    "exactness is trivial (an element either matches or the frame was "
    "wrong). Scale: one (user_id) window; per-row state is a bounded "
    "20-element array (the frame size is the knob), far cheaper than a "
    "per-group full sort.",
    tags=("window", "events"),
)
def q_window_moving_median(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        """
        SELECT event_id, user_id,
               element_at(vals, CAST((size(vals) + 1) div 2 AS INT)) AS med
        FROM (SELECT event_id, user_id,
                     sort_array(collect_list(value) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) AS vals
              FROM events)
        """
    )
