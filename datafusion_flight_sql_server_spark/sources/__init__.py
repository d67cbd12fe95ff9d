"""Foreign-source connectors.

``flight_table`` is the federation path: a Spark Python DataSource reading a
remote Flight SQL server's tables (the reference's table-provider crate
re-expressed as a Spark V2 source).
"""

from datafusion_flight_sql_server_spark.sources.flight_table import (
    FlightSQLDataSource,
)

__all__ = ["FlightSQLDataSource"]
