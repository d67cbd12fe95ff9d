"""End-to-end Flight SQL round trip — the Spark analogue of the reference
example (reference: datafusion-flight-sql-server/examples/flight-sql.rs):

1. a "remote" engine registers the example CSV and serves Flight SQL;
2. a client executes ad-hoc SQL over the wire;
3. a prepared statement binds an Arrow-encoded parameter;
4. a second, "local" SparkSession federates the remote table through the
   ``flightsql`` Spark DataSource (the table-provider crate's role) and
   joins it with local data.

Run: ``python examples/flight_sql.py``
"""

from __future__ import annotations

import threading
from pathlib import Path

import pyarrow as pa

REPO = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(REPO))

from datafusion_flight_sql_server_spark import Engine, build_session
from datafusion_flight_sql_server_spark.client import FlightSQLExecutor
from datafusion_flight_sql_server_spark.engine.registry import register_csv
from datafusion_flight_sql_server_spark.server import FlightSqlServer
from datafusion_flight_sql_server_spark.sources import FlightSQLDataSource


def main() -> None:
    spark = build_session(app_name="flight-sql-example")
    spark.sparkContext.setLogLevel("ERROR")

    # -- remote side: register the reference example's CSV, serve ----------
    register_csv(spark, "test", str(REPO / "examples" / "test.csv"))
    # binding happens in the constructor; port 0 = ephemeral
    server = FlightSqlServer(Engine(spark), location="grpc://0.0.0.0:0")
    threading.Thread(target=server.serve, daemon=True).start()
    uri = f"grpc://localhost:{server.port}"
    print(f"serving Flight SQL at {uri}")

    # -- ad-hoc SQL over the wire (flight-sql.rs:57-63) --------------------
    client = FlightSQLExecutor(uri)
    print(client.execute("SELECT * FROM test").to_pandas(), "\n")

    # -- prepared statement with Arrow-encoded params ----------------------
    prepared = client.prepare("SELECT foo, bar FROM test WHERE bar > $1")
    prepared.bind(
        pa.RecordBatch.from_pydict({"$1": pa.array([1], pa.int64())})
    )
    print(prepared.execute().to_pandas(), "\n")

    # -- federation: the remote table as a Spark table ---------------------
    spark.dataSource.register(FlightSQLDataSource)
    remote = (
        spark.read.format("flightsql")
        .option("uri", uri)
        .option("table", "test")
        .load()
    )
    remote.show()

    client.close()
    server.shutdown()


if __name__ == "__main__":
    main()
