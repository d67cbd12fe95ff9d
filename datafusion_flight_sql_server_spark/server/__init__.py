"""Arrow Flight SQL server over the Spark-backed Engine.

The reference's serving crate re-expressed on ``pyarrow.flight``
(reference: datafusion-flight-sql-server/src/service.rs:109-131 serve,
194-1014 service surface). ``serve``/``serve_with_port`` mirror
``FlightSqlService::serve``/``serve_with_listener``.
"""

from __future__ import annotations

from datafusion_flight_sql_server_spark.server.auth import (
    BearerAuthMiddleware,
    BearerAuthMiddlewareFactory,
)
from datafusion_flight_sql_server_spark.server.service import (
    FlightSqlServer,
    FlightSqlServiceConfig,
    GET_CATALOGS_SCHEMA,
    GET_DB_SCHEMAS_SCHEMA,
    GET_TABLES_SCHEMA,
    GET_TABLE_TYPES_SCHEMA,
)
from datafusion_flight_sql_server_spark.server.session import (
    SessionStateProvider,
    StaticSessionStateProvider,
)


def serve(engine, address: str = "0.0.0.0:50051", **kwargs) -> None:
    """Boot and block (parity: service.rs:109-116 ``serve``)."""
    server = FlightSqlServer(engine, location=f"grpc://{address}", **kwargs)
    server.serve()


def serve_with_port(engine, port: int = 0, **kwargs) -> FlightSqlServer:
    """Bind (port 0 = ephemeral) and return the server without blocking —
    the pre-bound-listener pattern (parity: service.rs:118-131
    ``serve_with_listener``); call ``.serve()`` / ``.shutdown()`` yourself.
    """
    return FlightSqlServer(engine, location=f"grpc://0.0.0.0:{port}", **kwargs)


__all__ = [
    "BearerAuthMiddleware",
    "BearerAuthMiddlewareFactory",
    "FlightSqlServer",
    "FlightSqlServiceConfig",
    "GET_CATALOGS_SCHEMA",
    "GET_DB_SCHEMAS_SCHEMA",
    "GET_TABLES_SCHEMA",
    "GET_TABLE_TYPES_SCHEMA",
    "SessionStateProvider",
    "StaticSessionStateProvider",
    "serve",
    "serve_with_port",
]
