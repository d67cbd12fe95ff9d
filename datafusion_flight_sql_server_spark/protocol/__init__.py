"""Wire protocol: protobuf codecs for Flight SQL commands, tickets, handles.

Pure-Python wire-format implementation (no google.protobuf dependency),
byte-compatible with the reference's prost-encoded messages
(reference: datafusion-flight-sql-server/src/state.rs:12-120) and Arrow's
public FlightSql.proto field numbering.
"""

from datafusion_flight_sql_server_spark.protocol.flightsql import (
    ActionClosePreparedStatementRequest,
    ActionCreatePreparedStatementRequest,
    ActionCreatePreparedStatementResult,
    CommandGetCatalogs,
    CommandGetDbSchemas,
    CommandGetTables,
    CommandGetTableTypes,
    CommandPreparedStatementQuery,
    CommandStatementQuery,
    DoPutPreparedStatementResult,
    ProtobufAny,
    TicketStatementQuery,
)
from datafusion_flight_sql_server_spark.protocol.state import CommandTicket, QueryHandle

__all__ = [
    "ActionClosePreparedStatementRequest",
    "ActionCreatePreparedStatementRequest",
    "ActionCreatePreparedStatementResult",
    "CommandGetCatalogs",
    "CommandGetDbSchemas",
    "CommandGetTables",
    "CommandGetTableTypes",
    "CommandPreparedStatementQuery",
    "CommandStatementQuery",
    "CommandTicket",
    "DoPutPreparedStatementResult",
    "ProtobufAny",
    "QueryHandle",
    "TicketStatementQuery",
]
