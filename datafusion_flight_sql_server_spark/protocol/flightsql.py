"""Arrow Flight SQL protocol messages (wire-compatible subset).

Field numbers and names follow Arrow's public ``FlightSql.proto``; the
``Any`` wrapper follows ``google/protobuf/any.proto``. These are the messages
the reference server actually exchanges (reference:
datafusion-flight-sql-server/src/service.rs:209-941) plus the stub-path
commands it answers with NOT_IMPLEMENTED.

Each message is a small dataclass with ``encode() -> bytes`` and
``decode(bytes) -> Self``, plus ``pack()``/``unpack_command()`` helpers for
the ``Any`` envelope used in tickets, FlightDescriptor commands and DoAction
bodies.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field, fields as dc_fields
from typing import ClassVar

from datafusion_flight_sql_server_spark.protocol.wire import (
    Field,
    decode_message,
    encode_message,
)

TYPE_URL_PREFIX = "type.googleapis.com/arrow.flight.protocol.sql."


class Message:
    """Base: subclasses declare ``FIELDS`` matching their dataclass fields."""

    FIELDS: ClassVar[tuple[Field, ...]] = ()

    def encode(self) -> bytes:
        values = {f.name: getattr(self, f.name) for f in dc_fields(self)}
        return encode_message(self.FIELDS, values)

    @classmethod
    def decode(cls, data: bytes):
        return cls(**decode_message(cls.FIELDS, data))

    @classmethod
    def type_url(cls) -> str:
        return TYPE_URL_PREFIX + cls.__name__

    def pack(self) -> "ProtobufAny":
        return ProtobufAny(type_url=self.type_url(), value=self.encode())


@dataclass
class ProtobufAny(Message):
    """google.protobuf.Any: type_url = 1, value = 2."""

    FIELDS = (
        Field(1, "type_url", "string"),
        Field(2, "value", "bytes"),
    )
    type_url: str = ""
    value: bytes = b""

    def unpack_command(self) -> "Message":
        """Resolve the packed command by type_url (the reference's
        ``Command::try_from(Any)``, service.rs dispatch)."""
        name = self.type_url.rsplit(".", 1)[-1] if self.type_url else ""
        cls = COMMAND_TYPES.get(name)
        if cls is None:
            raise ValueError(f"unknown Flight SQL command type: {self.type_url!r}")
        return cls.decode(self.value)


# --- statement / prepared-statement commands -------------------------------


@dataclass
class CommandStatementQuery(Message):
    FIELDS = (
        Field(1, "query", "string"),
        Field(2, "transaction_id", "bytes"),
    )
    query: str = ""
    transaction_id: bytes | None = None


@dataclass
class CommandPreparedStatementQuery(Message):
    FIELDS = (Field(1, "prepared_statement_handle", "bytes"),)
    prepared_statement_handle: bytes = b""


@dataclass
class CommandStatementUpdate(Message):
    FIELDS = (
        Field(1, "query", "string"),
        Field(2, "transaction_id", "bytes"),
    )
    query: str = ""
    transaction_id: bytes | None = None


@dataclass
class CommandPreparedStatementUpdate(Message):
    FIELDS = (Field(1, "prepared_statement_handle", "bytes"),)
    prepared_statement_handle: bytes = b""


@dataclass
class TicketStatementQuery(Message):
    FIELDS = (Field(1, "statement_handle", "bytes"),)
    statement_handle: bytes = b""


@dataclass
class SubstraitPlan(Message):
    """FlightSql.proto SubstraitPlan: serialized plan + producer version."""

    FIELDS = (
        Field(1, "plan", "bytes"),
        Field(2, "version", "string"),
    )
    plan: bytes = b""
    version: str | None = None


@dataclass
class CommandStatementSubstraitPlan(Message):
    """FlightSql.proto CommandStatementSubstraitPlan (the command the
    reference consumes at service.rs:349-386; our server consumes the
    read/project/fetch subset via plans/substrait.py)."""

    FIELDS = (
        Field(1, "plan", "message", message_type=SubstraitPlan),
        Field(2, "transaction_id", "bytes"),
    )
    plan: SubstraitPlan | None = None
    transaction_id: bytes | None = None


# --- metadata commands -----------------------------------------------------


@dataclass
class CommandGetCatalogs(Message):
    FIELDS = ()


@dataclass
class CommandGetDbSchemas(Message):
    FIELDS = (
        Field(1, "catalog", "string"),
        Field(2, "db_schema_filter_pattern", "string"),
    )
    catalog: str | None = None
    db_schema_filter_pattern: str | None = None


@dataclass
class CommandGetTables(Message):
    FIELDS = (
        Field(1, "catalog", "string"),
        Field(2, "db_schema_filter_pattern", "string"),
        Field(3, "table_name_filter_pattern", "string"),
        Field(4, "table_types", "string", repeated=True),
        Field(5, "include_schema", "bool"),
    )
    catalog: str | None = None
    db_schema_filter_pattern: str | None = None
    table_name_filter_pattern: str | None = None
    table_types: list[str] = dc_field(default_factory=list)
    include_schema: bool | None = None


@dataclass
class CommandGetTableTypes(Message):
    FIELDS = ()


@dataclass
class CommandGetSqlInfo(Message):
    FIELDS = (Field(1, "info", "varint", repeated=True),)
    info: list[int] = dc_field(default_factory=list)


@dataclass
class CommandGetPrimaryKeys(Message):
    FIELDS = (
        Field(1, "catalog", "string"),
        Field(2, "db_schema", "string"),
        Field(3, "table", "string"),
    )
    catalog: str | None = None
    db_schema: str | None = None
    table: str = ""


@dataclass
class CommandGetExportedKeys(Message):
    FIELDS = (
        Field(1, "catalog", "string"),
        Field(2, "db_schema", "string"),
        Field(3, "table", "string"),
    )
    catalog: str | None = None
    db_schema: str | None = None
    table: str = ""


@dataclass
class CommandGetImportedKeys(Message):
    FIELDS = (
        Field(1, "catalog", "string"),
        Field(2, "db_schema", "string"),
        Field(3, "table", "string"),
    )
    catalog: str | None = None
    db_schema: str | None = None
    table: str = ""


@dataclass
class CommandGetCrossReference(Message):
    FIELDS = (
        Field(1, "pk_catalog", "string"),
        Field(2, "pk_db_schema", "string"),
        Field(3, "pk_table", "string"),
        Field(4, "fk_catalog", "string"),
        Field(5, "fk_db_schema", "string"),
        Field(6, "fk_table", "string"),
    )
    pk_catalog: str | None = None
    pk_db_schema: str | None = None
    pk_table: str = ""
    fk_catalog: str | None = None
    fk_db_schema: str | None = None
    fk_table: str = ""


@dataclass
class CommandGetXdbcTypeInfo(Message):
    FIELDS = (Field(1, "data_type", "varint"),)
    data_type: int | None = None


# --- actions ---------------------------------------------------------------


@dataclass
class ActionCreatePreparedStatementRequest(Message):
    FIELDS = (
        Field(1, "query", "string"),
        Field(2, "transaction_id", "bytes"),
    )
    query: str = ""
    transaction_id: bytes | None = None


@dataclass
class ActionCreatePreparedStatementResult(Message):
    FIELDS = (
        Field(1, "prepared_statement_handle", "bytes"),
        Field(2, "dataset_schema", "bytes"),
        Field(3, "parameter_schema", "bytes"),
    )
    prepared_statement_handle: bytes = b""
    dataset_schema: bytes = b""
    parameter_schema: bytes = b""


@dataclass
class ActionClosePreparedStatementRequest(Message):
    FIELDS = (Field(1, "prepared_statement_handle", "bytes"),)
    prepared_statement_handle: bytes = b""


@dataclass
class DoPutPreparedStatementResult(Message):
    FIELDS = (Field(1, "prepared_statement_handle", "bytes"),)
    prepared_statement_handle: bytes | None = None


@dataclass
class DoPutUpdateResult(Message):
    FIELDS = (Field(1, "record_count", "varint"),)
    record_count: int = 0

    @classmethod
    def decode(cls, data: bytes):
        from datafusion_flight_sql_server_spark.protocol.wire import varint_to_signed64

        raw = decode_message(cls.FIELDS, data)
        count = raw["record_count"]
        # int64 on the wire: -1 arrives as 2^64-1 (service.rs DoPut update
        # returns -1 so CREATE TABLE/SET "succeed")
        return cls(record_count=varint_to_signed64(count) if count is not None else 0)


COMMAND_TYPES: dict[str, type[Message]] = {
    cls.__name__: cls
    for cls in (
        CommandStatementQuery,
        CommandPreparedStatementQuery,
        CommandStatementUpdate,
        CommandPreparedStatementUpdate,
        CommandStatementSubstraitPlan,
        TicketStatementQuery,
        CommandGetCatalogs,
        CommandGetDbSchemas,
        CommandGetTables,
        CommandGetTableTypes,
        CommandGetSqlInfo,
        CommandGetPrimaryKeys,
        CommandGetExportedKeys,
        CommandGetImportedKeys,
        CommandGetCrossReference,
        CommandGetXdbcTypeInfo,
        ActionCreatePreparedStatementRequest,
        ActionCreatePreparedStatementResult,
        ActionClosePreparedStatementRequest,
        DoPutPreparedStatementResult,
        DoPutUpdateResult,
    )
}
