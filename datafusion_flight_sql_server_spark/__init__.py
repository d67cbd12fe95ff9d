"""PySpark-native analytics engine with the capabilities of
datafusion-contrib/datafusion-flight-sql-server.

The reference (v0.4.16) is a stateless Arrow Flight SQL server over a
DataFusion ``SessionContext`` (reference:
datafusion-flight-sql-server/src/service.rs:194-1014). This package is the
same architecture re-expressed Spark-first:

- ``engine``   — SparkSession factory + table registry + Engine facade
                 (the ``SessionContext`` analogue, service.rs:133-191).
- ``plans``    — statement gating (SQLOptions, service.rs:92-101,172-173),
                 parameter binding (service.rs:1123-1192), plan-only schema
                 derivation (service.rs:1032-1105).
- ``protocol`` — wire-compatible protobuf ticket/handle codecs
                 (state.rs:12-120).
- ``server``   — Arrow Flight server exposing the Flight SQL command set
                 (service.rs:194-1014) over pyarrow.flight.
- ``client``   — Flight SQL client executor + Spark DataSource, the
                 analogue of datafusion-flight-sql-table-provider.
- ``queries``  — the declared operator catalog (SURVEY.md §2) with DuckDB
                 oracle SQL for the correctness harness.
- ``operators``/``functions``/``streaming`` — north-star extension
                 operators (dedup, similarity search, text analysis,
                 multimodal, event-time windows) beyond the reference.
"""

from datafusion_flight_sql_server_spark.engine.session import build_session, stop_session
from datafusion_flight_sql_server_spark.engine.core import Engine, SQLOptions

__all__ = ["build_session", "stop_session", "Engine", "SQLOptions"]
__version__ = "0.1.0"
