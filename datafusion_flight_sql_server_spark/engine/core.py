"""Engine facade — the ``FlightSqlSessionContext`` analogue.

Bundles a SparkSession with the statement gate and exposes the same query
lifecycle the reference exposes on its wrapped ``SessionContext`` (reference:
datafusion-flight-sql-server/src/service.rs:153-191):

- ``sql_to_plan``   ≙ ``sql_to_logical_plan`` (service.rs:170-175): parse +
  analyze + gate, returning a lazy DataFrame (Spark's logical plan handle).
- ``execute``       ≙ ``execute_sql``/``execute_logical_plan``
  (service.rs:177-191): returns the DataFrame whose Arrow batches the caller
  streams.
- catalog enumeration ≙ ``do_get_catalogs``/``schemas``/``tables``/
  ``table_types`` (service.rs:616-731), materialized as DataFrames with the
  Flight SQL metadata result schemas.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

from datafusion_flight_sql_server_spark.plans.gate import SQLOptions
from datafusion_flight_sql_server_spark.plans.params import bind_sql


class Engine:
    def __init__(self, spark: SparkSession, options: SQLOptions | None = None):
        self.spark = spark
        self.options = options or SQLOptions()

    # -- query lifecycle ----------------------------------------------------

    def sql_to_plan(self, sql: str, params=None) -> DataFrame:
        """Parse + analyze + gate. Lazy — no job is triggered.

        Parity: service.rs:170-175 (plan + ``SQLOptions::verify_plan``).
        """
        self.options.verify(self.spark, sql)
        return bind_sql(self.spark, sql, params)

    def execute(self, sql: str, params=None) -> DataFrame:
        """Gate + plan; execution happens when the caller consumes batches.

        Parity: service.rs:177-191 (``execute_stream`` — streaming pull
        model; Spark's DataFrame is equally pull-based at collection time).
        """
        return self.sql_to_plan(sql, params)

    def new_session(self) -> "Engine":
        """Per-request isolated session (shared JVM/catalog, own temp views).

        Parity: per-request ``SessionState`` mint (service.rs:133-151,
        session.rs:16-31). ``spark.newSession()`` is the cheap clone.
        """
        return Engine(self.spark.newSession(), self.options)

    # -- catalog metadata (Flight SQL result shapes) -------------------------

    _CATALOGS_SCHEMA = T.StructType([T.StructField("catalog_name", T.StringType(), False)])
    _SCHEMAS_SCHEMA = T.StructType(
        [
            T.StructField("catalog_name", T.StringType(), True),
            T.StructField("db_schema_name", T.StringType(), False),
        ]
    )
    _TABLES_SCHEMA = T.StructType(
        [
            T.StructField("catalog_name", T.StringType(), True),
            T.StructField("db_schema_name", T.StringType(), True),
            T.StructField("table_name", T.StringType(), False),
            T.StructField("table_type", T.StringType(), False),
        ]
    )
    _TABLE_TYPES_SCHEMA = T.StructType([T.StructField("table_type", T.StringType(), False)])

    def get_catalogs(self) -> DataFrame:
        """Catalog names (parity: do_get_catalogs, service.rs:616-636)."""
        names = sorted(c.name for c in self.spark.catalog.listCatalogs())
        return self.spark.createDataFrame(
            [Row(catalog_name=n) for n in names], self._CATALOGS_SCHEMA
        )

    def get_db_schemas(
        self, catalog: str | None = None, db_schema_filter_pattern: str | None = None
    ) -> DataFrame:
        """Database/schema names with LIKE-pattern filter (parity:
        do_get_schemas, service.rs:638-663)."""
        current = self.spark.catalog.currentCatalog()
        rows = [
            Row(catalog_name=current, db_schema_name=d.name)
            for d in self.spark.catalog.listDatabases()
        ]
        if catalog is not None:
            rows = [r for r in rows if r.catalog_name == catalog]
        if db_schema_filter_pattern is not None:
            rows = [
                r
                for r in rows
                if _sql_like(r.db_schema_name, db_schema_filter_pattern)
            ]
        return self.spark.createDataFrame(rows, self._SCHEMAS_SCHEMA)

    def get_tables(
        self,
        catalog: str | None = None,
        db_schema_filter_pattern: str | None = None,
        table_name_filter_pattern: str | None = None,
        table_types: list[str] | None = None,
    ) -> DataFrame:
        """catalog × schema × table × type (parity: do_get_tables,
        service.rs:665-706). Temp views surface with type TEMPORARY,
        matching the reference's TableType mapping (service.rs:716-722)."""
        current = self.spark.catalog.currentCatalog()
        rows = []
        for t in self.spark.catalog.listTables():
            ttype = _table_type(t)
            rows.append(
                Row(
                    catalog_name=t.catalog or current,
                    db_schema_name=(t.namespace[0] if t.namespace else None),
                    table_name=t.name,
                    table_type=ttype,
                )
            )
        if catalog is not None:
            rows = [r for r in rows if r.catalog_name == catalog]
        if db_schema_filter_pattern is not None:
            rows = [
                r
                for r in rows
                if r.db_schema_name is not None
                and _sql_like(r.db_schema_name, db_schema_filter_pattern)
            ]
        if table_name_filter_pattern is not None:
            rows = [r for r in rows if _sql_like(r.table_name, table_name_filter_pattern)]
        if table_types:
            rows = [r for r in rows if r.table_type in table_types]
        rows.sort(key=lambda r: (r.catalog_name or "", r.db_schema_name or "", r.table_name))
        return self.spark.createDataFrame(rows, self._TABLES_SCHEMA)

    def get_table_types(self) -> DataFrame:
        """Static table-type list (parity: do_get_table_types,
        service.rs:708-731 — Base/View/Temporary)."""
        return self.spark.createDataFrame(
            [Row(table_type=t) for t in ("BASE TABLE", "VIEW", "TEMPORARY")],
            self._TABLE_TYPES_SCHEMA,
        )

    def table_schema(self, table: str):
        """Schema probe used by the federation client (parity:
        table-provider/src/lib.rs:91-101 — ``select * from {t} limit 1``)."""
        return self.spark.sql(f"SELECT * FROM {table} LIMIT 1").schema


def _table_type(t) -> str:
    if getattr(t, "isTemporary", False):
        return "TEMPORARY"
    if (t.tableType or "").upper() == "VIEW":
        return "VIEW"
    return "BASE TABLE"


def _sql_like(value: str, pattern: str) -> bool:
    """SQL LIKE pattern match (% and _), as the Flight SQL filters expect."""
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.fullmatch("".join(out), value) is not None
