from datafusion_flight_sql_server_spark.engine.session import build_session, stop_session
from datafusion_flight_sql_server_spark.engine.registry import register_sf_tables, TABLES
from datafusion_flight_sql_server_spark.engine.core import Engine, SQLOptions

__all__ = [
    "build_session",
    "stop_session",
    "register_sf_tables",
    "TABLES",
    "Engine",
    "SQLOptions",
]
