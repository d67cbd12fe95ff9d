"""Bearer-auth Flight SQL server — the Spark analogue of the reference
example (reference: datafusion-flight-sql-server/examples/
bearer_auth_flight_sql.rs): boot a server with bearer-token middleware,
show a valid token succeeding and a bad/missing token rejected before any
handler runs.

Run: ``python examples/bearer_auth_flight_sql.py``
"""

from __future__ import annotations

import sys
import threading
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyarrow.flight as fl

from datafusion_flight_sql_server_spark import Engine, build_session
from datafusion_flight_sql_server_spark.client import FlightSQLExecutor
from datafusion_flight_sql_server_spark.engine.registry import register_memtable
from datafusion_flight_sql_server_spark.server import (
    BearerAuthMiddlewareFactory,
    FlightSqlServer,
)

TOKEN = "super-secret-token"  # bearer_auth_flight_sql.rs:137


def main() -> None:
    spark = build_session(app_name="bearer-auth-example")
    spark.sparkContext.setLogLevel("ERROR")
    register_memtable(
        spark,
        "users",
        [(1, "Alice"), (2, "Bob"), (3, "Charlie")],
        "id INT NOT NULL, name STRING NOT NULL",
    )

    server = FlightSqlServer(
        Engine(spark),
        location="grpc://0.0.0.0:0",
        middleware={"auth": BearerAuthMiddlewareFactory(TOKEN)},
    )
    threading.Thread(target=server.serve, daemon=True).start()
    uri = f"grpc://localhost:{server.port}"
    print(f"serving bearer-auth Flight SQL at {uri}")

    # valid token → accepted (bearer_auth_flight_sql.rs:137-192)
    ok = FlightSQLExecutor(uri, token=TOKEN)
    print(ok.execute("SELECT COUNT(*) AS n FROM users").to_pandas())
    ok.close()

    # wrong token → rejected before any handler (rs:194-238)
    bad = FlightSQLExecutor(uri, token="wrong")
    try:
        bad.execute("SELECT 1 AS one")
        raise SystemExit("expected FlightUnauthenticatedError")
    except fl.FlightUnauthenticatedError:
        print("wrong token rejected: OK")
    finally:
        bad.close()

    server.shutdown()


if __name__ == "__main__":
    main()
