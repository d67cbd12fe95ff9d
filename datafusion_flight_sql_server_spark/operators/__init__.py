from datafusion_flight_sql_server_spark.operators import dedup

__all__ = ["dedup"]
