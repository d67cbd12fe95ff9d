from datafusion_flight_sql_server_spark.functions import text, vector

__all__ = ["text", "vector"]
