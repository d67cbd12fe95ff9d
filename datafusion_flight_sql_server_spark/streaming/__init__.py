from datafusion_flight_sql_server_spark.streaming import sessionize, windows

__all__ = ["sessionize", "windows"]
