"""Source-registration and parameter-binding queries.

Covers the engine surfaces the reference exercises outside plain parquet
scans: CSV registration with header+inference (reference:
examples/flight-sql.rs:25-27, examples/test.csv), in-memory MemTable
registration (tests/integration_test.rs:17-58), and ``$n``/``$name``
placeholder binding (service.rs:1157-1192) — each as a driver-checkable
catalog query with a DuckDB oracle.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.engine.registry import (
    register_csv,
    register_json,
    register_memtable,
)
from datafusion_flight_sql_server_spark.plans.params import bind_sql
from datafusion_flight_sql_server_spark.queries.catalog import query, tables

#: Repo-local clone of the reference's example CSV (examples/test.csv).
_CSV_PATH = str(Path(__file__).resolve().parents[2] / "examples" / "test.csv")

#: Repo-local line-delimited JSON example (same shape family as the CSV).
_JSON_PATH = str(Path(__file__).resolve().parents[2] / "examples" / "test.jsonl")


@query(
    "scan_csv",
    oracle=f"""
        SELECT foo, CAST(bar AS BIGINT) AS bar
        FROM read_csv('{_CSV_PATH}', header=true)
        ORDER BY foo
    """,
    doc="CSV registration with header + schema inference (parity: "
    "register_csv, reference examples/flight-sql.rs:25-27 over "
    "examples/test.csv). BIGINT casts align the two engines' integer "
    "inference.",
    tags=("source",),
)
def q_scan_csv(spark: SparkSession, sf: str) -> DataFrame:
    df = register_csv(spark, "example_csv", _CSV_PATH)
    return df.select("foo", F.col("bar").cast("bigint").alias("bar")).orderBy("foo")


@query(
    "scan_json",
    oracle=f"""
        SELECT CAST(id AS BIGINT) AS id, name,
               CAST(score AS DOUBLE) AS score
        FROM read_json_auto('{_JSON_PATH}')
        ORDER BY id
    """,
    doc="Line-delimited JSON registration with schema inference (parity: "
    "any embedder-registered provider on the wrapped session, reference "
    "service.rs:140-141; the JSON analogue of register_csv). Casts align "
    "the engines' inferred integer/float types; nulls in both value "
    "columns round-trip.",
    tags=("source",),
)
def q_scan_json(spark: SparkSession, sf: str) -> DataFrame:
    df = register_json(spark, "example_json", _JSON_PATH)
    return df.select(
        F.col("id").cast("bigint").alias("id"),
        "name",
        F.col("score").cast("double").alias("score"),
    ).orderBy("id")


@query(
    "scan_memtable",
    oracle="""
        SELECT CAST(id AS BIGINT) AS id, name
        FROM (VALUES (1, 'Alice'), (2, 'Bob'), (3, 'Charlie')) AS t(id, name)
    """,
    doc="In-memory table registration (parity: MemTable, reference "
    "tests/integration_test.rs:17-58 users fixture) — createDataFrame + temp "
    "view scan.",
    tags=("source",),
)
def q_scan_memtable(spark: SparkSession, sf: str) -> DataFrame:
    df = register_memtable(
        spark,
        "users_mem",
        [(1, "Alice"), (2, "Bob"), (3, "Charlie")],
        "id INT NOT NULL, name STRING NOT NULL",
    )
    return df.select(F.col("id").cast("bigint").alias("id"), "name")


@query(
    "param_bind_positional",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 150000 AND o_orderpriority = '1-URGENT'
    """,
    doc="Positional $n placeholder binding (parity: record_to_param_values "
    "positional path, reference service.rs:1178-1186): $1/$2 rewritten to "
    "Spark named args and bound from a positional list.",
    tags=("params",),
)
def q_param_bind_positional(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return bind_sql(
        spark,
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > $1 AND o_orderpriority = $2
        """,
        [150000, "1-URGENT"],
    )


@query(
    "param_bind_named",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_mktsegment = 'BUILDING' AND c_acctbal >= 1000
    """,
    doc="Named $name placeholder binding (parity: record_to_param_values "
    "named path, reference service.rs:1187-1191).",
    tags=("params",),
)
def q_param_bind_named(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return bind_sql(
        spark,
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_mktsegment = $segment AND c_acctbal >= $min_bal
        """,
        {"segment": "BUILDING", "min_bal": 1000},
    )
