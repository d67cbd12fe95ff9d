"""Substrait front-end tests: the read/filter/project/sort/fetch subset
executes, and everything outside it is rejected by name.

The container has no Substrait producer library, so these tests carry their
own tiny producer built on the repo's protobuf wire codec, with field
numbers from the public substrait.io protos (plan.proto / algebra.proto /
type.proto) — independent constants from the consumer's, so a wrong field
number on either side fails the round-trip rather than cancelling out.

Reference parity: service.rs:349-386 (GetFlightInfo substrait),
service.rs:274-303 (DoGet re-plan); our consumer is plans/substrait.py.
"""

from __future__ import annotations

import os
import threading

import pyarrow.flight as fl
import pytest

from datafusion_flight_sql_server_spark.client import FlightSQLExecutor
from datafusion_flight_sql_server_spark.engine.core import Engine
from datafusion_flight_sql_server_spark.engine.registry import register_memtable
from datafusion_flight_sql_server_spark.plans.substrait import (
    SubstraitMalformed,
    SubstraitUnsupported,
    substrait_to_sql,
)
from datafusion_flight_sql_server_spark.protocol.flightsql import (
    CommandStatementSubstraitPlan,
    SubstraitPlan,
)
from datafusion_flight_sql_server_spark.protocol.wire import encode_varint
from datafusion_flight_sql_server_spark.server import (
    FlightSqlServer,
    FlightSqlServiceConfig,
)


# -- minimal test-side Substrait producer ------------------------------------


def _len_field(num: int, payload: bytes) -> bytes:
    return encode_varint((num << 3) | 2) + encode_varint(len(payload)) + payload


def _varint_field(num: int, value: int) -> bytes:
    return encode_varint((num << 3) | 0) + encode_varint(value)


def _string_field(num: int, value: str) -> bytes:
    return _len_field(num, value.encode("utf-8"))


def named_struct(names: list[str]) -> bytes:
    return b"".join(_string_field(1, n) for n in names)


def read_rel(table: list[str], columns: list[str], extra: bytes = b"") -> bytes:
    named_table = b"".join(_string_field(1, n) for n in table)
    return (
        _len_field(2, named_struct(columns))  # base_schema
        + _len_field(7, named_table)  # named_table
        + extra
    )


def field_ref(index: int) -> bytes:
    struct_field = _varint_field(1, index)
    segment = _len_field(2, struct_field)  # ReferenceSegment.struct_field
    reference = _len_field(1, segment)  # FieldReference.direct_reference
    return _len_field(2, reference)  # Expression.selection


def project_rel(input_rel: bytes, expr_indexes: list[int], emit: list[int] | None) -> bytes:
    body = _len_field(2, input_rel)
    for i in expr_indexes:
        body += _len_field(3, field_ref(i))
    if emit is not None:
        emit_msg = b"".join(_varint_field(1, i) for i in emit)
        body = _len_field(1, _len_field(2, emit_msg)) + body  # RelCommon.emit
    return body


def literal(kind: str, value) -> bytes:
    """Expression.literal for the consumed subset (field numbers from
    algebra.proto Literal)."""
    return _len_field(1, literal_bare(kind, value))  # Expression.literal


def literal_bare(kind: str, value) -> bytes:
    """Bare Literal message payload (no Expression wrapper)."""
    import struct as _struct

    if kind == "boolean":
        body = _varint_field(1, 1 if value else 0)
    elif kind == "i32":
        body = _varint_field(5, value & ((1 << 64) - 1))
    elif kind == "i64":
        body = _varint_field(7, value & ((1 << 64) - 1))
    elif kind == "fp64":
        body = encode_varint((11 << 3) | 1) + _struct.pack("<d", value)
    elif kind == "string":
        body = _string_field(12, value)
    elif kind == "binary":
        body = _len_field(13, value)
    elif kind == "timestamp":  # deprecated naive micros-since-epoch arm
        body = _varint_field(14, value & ((1 << 64) - 1))
    elif kind == "date":
        body = _varint_field(16, value & ((1 << 64) - 1))
    elif kind == "fixed_char":
        body = _string_field(21, value)
    elif kind == "var_char":  # VarChar{value=1, length=2}
        body = _len_field(
            22, _string_field(1, value) + _varint_field(2, len(value))
        )
    elif kind == "decimal":  # (unscaled, precision, scale)
        unscaled, precision, scale = value
        body = _len_field(
            24,
            _len_field(1, unscaled.to_bytes(16, "little", signed=True))
            + _varint_field(2, precision)
            + _varint_field(3, scale),
        )
    elif kind == "null":  # value = serialized Type message
        body = _len_field(29, value)
    elif kind == "precision_timestamp":  # (precision, value)
        precision, ticks = value
        body = _len_field(
            34,
            _varint_field(1, precision)
            + _varint_field(2, ticks & ((1 << 64) - 1)),
        )
    elif kind == "interval_ym":  # (years, months)
        years, months = value
        body = _len_field(
            19,
            _varint_field(1, years & ((1 << 64) - 1))
            + _varint_field(2, months & ((1 << 64) - 1)),
        )
    elif kind == "interval_ds":  # (days, seconds, precision, subseconds)
        days, seconds, precision, subseconds = value
        msg = _varint_field(1, days & ((1 << 64) - 1)) + _varint_field(
            2, seconds & ((1 << 64) - 1)
        )
        if precision is not None:
            msg += _varint_field(4, precision)
        if subseconds:
            msg += _varint_field(5, subseconds & ((1 << 64) - 1))
        body = _len_field(20, msg)
    elif kind == "list":  # value = list of bare Literal payloads
        body = _len_field(30, b"".join(_len_field(1, v) for v in value))
    elif kind == "empty_list":  # value = serialized Type.List message
        body = _len_field(31, value)
    else:  # pragma: no cover - test bug
        raise AssertionError(kind)
    return body


def scalar_fn(anchor: int, args: list[bytes]) -> bytes:
    """Expression.scalar_function with FunctionArgument.value args."""
    body = _varint_field(1, anchor)
    for a in args:
        body += _len_field(4, _len_field(3, a))
    return _len_field(3, body)


def scalar_fn_enums(anchor: int, enums: list[str], args: list[bytes]) -> bytes:
    """Expression.scalar_function with leading FunctionArgument.enum args."""
    body = _varint_field(1, anchor)
    for e in enums:
        body += _len_field(4, _string_field(1, e))
    for a in args:
        body += _len_field(4, _len_field(3, a))
    return _len_field(3, body)


def extension_function(anchor: int, name: str) -> bytes:
    """Plan.extensions entry declaring a function anchor."""
    ext_fn = _varint_field(2, anchor) + _string_field(3, name)
    return _len_field(2, _len_field(3, ext_fn))  # Plan.extensions[..].extension_function


def filter_rel(input_rel: bytes, condition: bytes) -> bytes:
    return _len_field(2, input_rel) + _len_field(3, condition)


def sort_rel(input_rel: bytes, sorts: list[tuple[int, int]]) -> bytes:
    body = _len_field(2, input_rel)
    for col_idx, direction in sorts:
        sf = _len_field(1, field_ref(col_idx)) + _varint_field(2, direction)
        body += _len_field(3, sf)
    return body


def fetch_rel(input_rel: bytes, count: int, offset: int = 0) -> bytes:
    body = _len_field(2, input_rel)
    if offset:
        body += _varint_field(3, offset)
    body += _varint_field(4, count)
    return body


def rel(kind: int, body: bytes) -> bytes:
    return _len_field(kind, body)


def plan_bytes(
    rel_msg: bytes,
    root_names: list[str] | None = None,
    extensions: bytes = b"",
) -> bytes:
    if root_names is None:
        plan_rel = _len_field(1, rel_msg)  # PlanRel.rel
    else:
        root = _len_field(1, rel_msg) + b"".join(
            _string_field(2, n) for n in root_names
        )
        plan_rel = _len_field(2, root)  # PlanRel.root
    return extensions + _len_field(3, plan_rel)  # Plan.relations


USERS_READ = rel(1, read_rel(["users"], ["id", "name"]))


# -- unit: translation -------------------------------------------------------


class TestTranslate:
    def test_read_only(self):
        sql = substrait_to_sql(plan_bytes(USERS_READ))
        assert sql == "SELECT `id`, `name` FROM `users`"

    def test_root_names_alias(self):
        sql = substrait_to_sql(plan_bytes(USERS_READ, ["user_id", "user_name"]))
        assert sql == (
            "SELECT `id` AS `user_id`, `name` AS `user_name` FROM `users`"
        )

    def test_project_emit_remap(self):
        # project [name] over (id, name): combined = (id, name, name),
        # emit [2] keeps only the expression output — DataFusion's shape
        p = rel(7, project_rel(USERS_READ, [1], emit=[2]))
        assert substrait_to_sql(plan_bytes(p)) == "SELECT `name` FROM `users`"

    def test_fetch_limit(self):
        p = rel(3, fetch_rel(rel(7, project_rel(USERS_READ, [0], [2])), 2))
        assert substrait_to_sql(plan_bytes(p)) == (
            "SELECT `id` FROM `users` LIMIT 2"
        )

    def test_multipart_table_name(self):
        r = rel(1, read_rel(["spark_catalog", "default", "users"], ["id"]))
        assert substrait_to_sql(plan_bytes(r)) == (
            "SELECT `id` FROM `spark_catalog`.`default`.`users`"
        )

    def test_rejects_join(self):
        join_body = _len_field(2, USERS_READ) + _len_field(3, USERS_READ)
        with pytest.raises(SubstraitUnsupported, match="join"):
            substrait_to_sql(plan_bytes(rel(6, join_body)))

    def test_filter_rel_comparison(self):
        cond = scalar_fn(1, [field_ref(0), literal("i64", 5)])
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, cond)),
            extensions=extension_function(1, "gt:any_any"),
        )
        assert (
            substrait_to_sql(p)
            == "SELECT `id`, `name` FROM `users` WHERE (`id` > 5)"
        )

    def test_filter_and_or_not_null_string(self):
        cond = scalar_fn(
            3,
            [
                scalar_fn(1, [field_ref(1), literal("string", "bo'b")]),
                scalar_fn(2, [field_ref(0)]),
            ],
        )
        exts = (
            extension_function(1, "equal:any_any")
            + extension_function(2, "is_not_null:any")
            + extension_function(3, "and:bool")
        )
        p = plan_bytes(rel(2, filter_rel(USERS_READ, cond)), extensions=exts)
        assert substrait_to_sql(p) == (
            "SELECT `id`, `name` FROM `users` "
            "WHERE ((`name` = 'bo''b') AND (`id` IS NOT NULL))"
        )

    def test_read_filter_consumed(self):
        cond = scalar_fn(7, [field_ref(0), literal("i32", 3)])
        r = rel(1, read_rel(["users"], ["id", "name"], extra=_len_field(3, cond)))
        p = plan_bytes(r, extensions=extension_function(7, "lt:any_any"))
        assert (
            substrait_to_sql(p)
            == "SELECT `id`, `name` FROM `users` WHERE (`id` < 3)"
        )

    def test_sort_directions(self):
        p = plan_bytes(rel(5, sort_rel(USERS_READ, [(0, 4), (1, 1)])))
        assert substrait_to_sql(p) == (
            "SELECT `id`, `name` FROM `users` "
            "ORDER BY `id` DESC NULLS LAST, `name` ASC NULLS FIRST"
        )

    def test_filter_above_fetch_composes(self):
        # filter-after-limit has no single-SELECT form: the fetched input
        # finishes as a derived table (semantics in TestClauseComposition)
        cond = scalar_fn(1, [field_ref(0), literal("i64", 5)])
        inner = rel(3, fetch_rel(USERS_READ, 5))
        p = plan_bytes(
            rel(2, filter_rel(inner, cond)),
            extensions=extension_function(1, "gt:any_any"),
        )
        sql = substrait_to_sql(p)
        assert "LIMIT 5) AS" in sql and "WHERE (`id` > 5)" in sql

    def test_unknown_function_name_rejected(self):
        cond = scalar_fn(1, [field_ref(0), literal("i64", 5)])
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, cond)),
            extensions=extension_function(1, "regexp_match:str_str"),
        )
        with pytest.raises(SubstraitUnsupported, match="'regexp_match'"):
            substrait_to_sql(p)

    def test_undeclared_anchor_rejected(self):
        cond = scalar_fn(9, [field_ref(0), literal("i64", 5)])
        p = plan_bytes(rel(2, filter_rel(USERS_READ, cond)))
        with pytest.raises(SubstraitUnsupported, match="anchor 9"):
            substrait_to_sql(p)

    def test_rejects_empty_virtual_table(self):
        # literal virtual tables are consumed (TestVirtualTable); an empty
        # one (no rows) is malformed rather than silently zero-row
        body = _len_field(2, named_struct(["a"])) + _len_field(5, b"")
        with pytest.raises(SubstraitMalformed, match="no rows"):
            substrait_to_sql(plan_bytes(rel(1, body)))

    def test_rejects_undeclared_projection_function(self):
        # computed projections are consumed, but an anchor with no
        # extension declaration still fails by name
        scalar_fn = _len_field(3, _varint_field(1, 0))  # Expression.scalar_function
        p = rel(7, _len_field(2, USERS_READ) + _len_field(3, scalar_fn))
        with pytest.raises(SubstraitUnsupported, match="anchor 0"):
            substrait_to_sql(plan_bytes(p))

    def test_fetch_count_minus_one_means_no_limit(self):
        # the spec's count=-1 ("return all records"): no LIMIT clause
        p = rel(3, fetch_rel(USERS_READ, -1 & ((1 << 64) - 1)))
        assert (
            substrait_to_sql(plan_bytes(p))
            == "SELECT `id`, `name` FROM `users`"
        )

    def test_fetch_offset_translates(self):
        p = rel(3, fetch_rel(USERS_READ, 5, offset=3))
        assert (
            substrait_to_sql(plan_bytes(p))
            == "SELECT `id`, `name` FROM `users` LIMIT 5 OFFSET 3"
        )

    def test_rejects_multiple_relations(self):
        two = plan_bytes(USERS_READ) + plan_bytes(USERS_READ)
        with pytest.raises(SubstraitUnsupported, match="1 plan relation"):
            substrait_to_sql(two)

    def test_malformed_bytes(self):
        with pytest.raises(SubstraitMalformed):
            substrait_to_sql(b"\xde\xad\xbe\xef")
        with pytest.raises(SubstraitMalformed):
            substrait_to_sql(b"")

    def test_out_of_range_field_ref(self):
        p = rel(7, project_rel(USERS_READ, [9], [2]))
        with pytest.raises(SubstraitUnsupported, match="out of range"):
            substrait_to_sql(plan_bytes(p))


# -- integration: over real TCP ---------------------------------------------


@pytest.fixture(scope="module")
def substrait_server(spark):
    register_memtable(
        spark,
        "users",
        [(1, "Alice"), (2, "Bob"), (3, "Charlie")],
        "id INT NOT NULL, name STRING NOT NULL",
    )
    register_memtable(
        spark,
        "orders",
        [(100, 1, 50), (101, 2, 75), (102, 1, 100), (103, 3, 25)],
        "order_id INT NOT NULL, user_id INT NOT NULL, amount INT NOT NULL",
    )
    srv = FlightSqlServer(Engine(spark), location="grpc://0.0.0.0:0")
    threading.Thread(target=srv.serve, daemon=True).start()
    yield srv
    srv.shutdown()


def _substrait_command(p: bytes) -> CommandStatementSubstraitPlan:
    return CommandStatementSubstraitPlan(plan=SubstraitPlan(plan=p, version="0.1"))


class TestOverWire:
    def test_project_limit_round_trip(self, substrait_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            p = plan_bytes(
                rel(3, fetch_rel(rel(7, project_rel(USERS_READ, [1], [2])), 2)),
                ["who"],
            )
            info = ex.flight_info(_substrait_command(p))
            assert [f.name for f in info.schema] == ["who"]
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            assert table.num_rows == 2
            assert set(table.column("who").to_pylist()) <= {
                "Alice", "Bob", "Charlie"
            }
        finally:
            ex.close()

    def test_phase_split_aggregate_round_trip(self, substrait_server):
        # the distributed producer shape: partial sums/counts per user
        # merged by a second aggregate — result must equal the one-phase
        # GROUP BY (orders fixture: user 1 -> 150/2, 2 -> 75/1, 3 -> 25/1)
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            orders = rel(
                1, read_rel(["orders"], ["order_id", "user_id", "amount"])
            )
            inner = rel(4, aggregate_rel(
                orders, [1],
                [
                    measure(agg_function(1, [2], phase=1)),  # partial sum
                    measure(agg_function(2, [], phase=1)),   # partial count
                ],
            ))
            outer = rel(4, aggregate_rel(
                inner, [0],
                [
                    measure(agg_function(1, [1], phase=4)),
                    measure(agg_function(2, [2], phase=4)),
                ],
            ))
            p = plan_bytes(
                outer, ["user_id", "total", "n"],
                extensions=extension_function(1, "sum:i64")
                + extension_function(2, "count:"),
            )
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            got = sorted(
                zip(
                    table.column("user_id").to_pylist(),
                    table.column("total").to_pylist(),
                    table.column("n").to_pylist(),
                )
            )
            assert got == [(1, 150, 2), (2, 75, 1), (3, 25, 1)]
        finally:
            ex.close()

    def test_phase_split_avg_stddev_distinct_round_trip(self, substrait_server):
        """Round-8 struct-/set-state phase splits execute end-to-end: a
        per-(user, order) partial stage merged by a final stage must equal
        the one-phase aggregate (orders fixture: user 1 → amounts [50, 100],
        user 2 → [75], user 3 → [25])."""
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            orders = rel(
                1, read_rel(["orders"], ["order_id", "user_id", "amount"])
            )
            # partial per (user_id, order_id): one state row per order —
            # the merge stage must genuinely combine states for user 1
            inner = rel(4, aggregate_rel(
                orders, [1, 0],
                [
                    measure(agg_function(1, [2], phase=1)),  # avg state
                    measure(agg_function(2, [2], phase=1)),  # stddev state
                    measure(agg_function(3, [2], invocation=2, phase=1)),
                ],
            ))
            # inner output: (user_id, order_id, avg_0, std_dev_1, count_2)
            outer = rel(4, aggregate_rel(
                inner, [0],
                [
                    measure(agg_function(1, [2], phase=4)),
                    measure(agg_function(2, [3], phase=4)),
                    measure(agg_function(3, [4], invocation=2, phase=4)),
                ],
            ))
            p = plan_bytes(
                outer, ["user_id", "mean", "sd", "nd"],
                extensions=extension_function(1, "avg:i64")
                + extension_function(2, "std_dev:fp64")
                + extension_function(3, "count:"),
            )
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            got = sorted(
                zip(
                    table.column("user_id").to_pylist(),
                    table.column("mean").to_pylist(),
                    table.column("sd").to_pylist(),
                    table.column("nd").to_pylist(),
                )
            )
            assert [g[0] for g in got] == [1, 2, 3]
            assert [g[1] for g in got] == [75.0, 75.0, 25.0]
            # stddev_samp([50,100]) = sqrt(1250); single-row groups → NULL
            assert got[0][2] == pytest.approx(1250 ** 0.5)
            assert got[1][2] is None and got[2][2] is None
            assert [g[3] for g in got] == [2, 1, 1]
        finally:
            ex.close()

    def test_phase_split_avg_all_null_group_yields_null(
        self, substrait_server, spark
    ):
        """ADVICE r8: the avg merge phase guards SUM(count) > 0 — an
        all-NULL group must come back NULL, not raise DIVIDE_BY_ZERO
        under ANSI or return a bogus value. Executed through the SQL the
        consumer renders (translate + run on the live session)."""
        register_memtable(
            spark,
            "null_amounts",
            [(1, None), (1, None), (2, 5)],
            "grp INT NOT NULL, amt INT",
        )
        inner = rel(4, aggregate_rel(
            rel(1, read_rel(["null_amounts"], ["grp", "amt"])),
            [0],
            [measure(agg_function(1, [1], phase=1))],
        ))
        outer = rel(4, aggregate_rel(
            inner, [0],
            [measure(agg_function(1, [1], phase=4))],
        ))
        p = plan_bytes(
            outer, ["grp", "mean"],
            extensions=extension_function(1, "avg:i32"),
        )
        sql = substrait_to_sql(p)
        rows = {r["grp"]: r["mean"] for r in spark.sql(sql).collect()}
        assert rows[1] is None  # all-NULL group: NULL, no /0
        assert rows[2] == 5.0

    def test_phase_split_stddev_cancellation_clamped(
        self, substrait_server, spark
    ):
        """ADVICE r8: near-constant data around 1e8 makes the parallel-
        variance identity cancel to m2 = -4.0 in fp64 (verified
        numerically); unclamped, VAR goes negative and SQRT returns NaN
        where one-phase STDDEV_SAMP gives ~0. The GREATEST clamp must
        floor it at 0."""
        register_memtable(
            spark,
            "wcancel",
            [(1, 1, 1e8 + 0.1), (1, 2, 1e8 + 0.4), (1, 3, 1e8 + 0.1)],
            "grp INT NOT NULL, sub INT NOT NULL, x DOUBLE NOT NULL",
        )
        inner = rel(4, aggregate_rel(
            rel(1, read_rel(["wcancel"], ["grp", "sub", "x"])),
            [0, 1],
            [measure(agg_function(1, [2], phase=1))],
        ))
        outer = rel(4, aggregate_rel(
            inner, [0],
            [measure(agg_function(1, [2], phase=4))],
        ))
        p = plan_bytes(
            outer, ["grp", "sd"],
            extensions=extension_function(1, "std_dev:fp64"),
        )
        sql = substrait_to_sql(p)
        [row] = spark.sql(sql).collect()
        assert row["sd"] is not None
        assert row["sd"] == row["sd"], "NaN leaked through the clamp"
        assert 0.0 <= row["sd"] < 1.0  # true stddev ~0.17; clamp floors at 0

    def test_phase_split_distinct_sum_avg_round_trip(self, substrait_server):
        """Round 9 (VERDICT r8 #5): two-stage DISTINCT sum/avg — the one
        residual a distributed DataFusion producer actually emits — must
        match the one-phase values. Partial per (user, order) so user 1's
        merge genuinely unions two singleton sets; the duplicate amounts
        across users (none here) and the fold types come from the
        extension signatures (sum:i64 → BIGINT accumulator)."""
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            orders = rel(
                1, read_rel(["orders"], ["order_id", "user_id", "amount"])
            )
            inner = rel(4, aggregate_rel(
                orders, [1, 0],
                [
                    measure(agg_function(1, [2], invocation=2, phase=1)),
                    measure(agg_function(2, [2], invocation=2, phase=1)),
                ],
            ))
            # inner output: (user_id, order_id, sum_set, avg_set)
            outer = rel(4, aggregate_rel(
                inner, [0],
                [
                    measure(agg_function(1, [2], invocation=2, phase=4)),
                    measure(agg_function(2, [3], invocation=2, phase=4)),
                ],
            ))
            p = plan_bytes(
                outer, ["user_id", "dsum", "davg"],
                extensions=extension_function(1, "sum:i64")
                + extension_function(2, "avg:i64"),
            )
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            got = sorted(
                zip(
                    table.column("user_id").to_pylist(),
                    table.column("dsum").to_pylist(),
                    table.column("davg").to_pylist(),
                )
            )
            # one-phase truth: user 1 → amounts {50, 100}, 2 → {75},
            # 3 → {25}
            assert got == [(1, 150, 75.0), (2, 75, 75.0), (3, 25, 25.0)]
        finally:
            ex.close()

    def test_phase_split_distinct_avg_decimal_round_trip(
        self, spark, substrait_server
    ):
        """Round 10: two-stage DISTINCT sum/avg over a DECIMAL column
        matches Spark's one-phase SUM/AVG(DISTINCT) bit-for-bit — the
        fold runs in the exact DECIMAL(28,2) accumulator and the final
        division mirrors Average's typing. Duplicate amounts appear in
        BOTH partial groups of grp 1 so the merge genuinely dedups
        across sets."""
        from decimal import Decimal as D

        register_memtable(
            spark,
            "prices",
            [
                (1, 1, D("10.50")), (1, 1, D("20.25")),
                (1, 2, D("10.50")), (1, 2, D("5.00")),
                (2, 1, D("7.77")),
            ],
            "grp INT NOT NULL, sub INT NOT NULL, "
            "amount DECIMAL(18,2) NOT NULL",
        )
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            prices = rel(1, read_rel(["prices"], ["grp", "sub", "amount"]))
            inner = rel(4, aggregate_rel(
                prices, [0, 1],
                [
                    measure(agg_function(1, [2], invocation=2, phase=1)),
                    measure(agg_function(2, [2], invocation=2, phase=1)),
                ],
            ))
            # inner output: (grp, sub, sum_set, avg_set)
            outer = rel(4, aggregate_rel(
                inner, [0],
                [
                    measure(agg_function(1, [2], invocation=2, phase=4)),
                    measure(agg_function(2, [3], invocation=2, phase=4)),
                ],
            ))
            p = plan_bytes(
                outer, ["grp", "dsum", "davg"],
                extensions=extension_function(1, "sum:dec<18,2>")
                + extension_function(2, "avg:dec<18,2>"),
            )
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            got = sorted(
                zip(
                    table.column("grp").to_pylist(),
                    table.column("dsum").to_pylist(),
                    table.column("davg").to_pylist(),
                )
            )
            truth = sorted(
                tuple(r)
                for r in spark.sql(
                    "SELECT grp, SUM(DISTINCT amount) AS dsum, "
                    "AVG(DISTINCT amount) AS davg "
                    "FROM prices GROUP BY grp"
                ).collect()
            )
            assert got == truth
            # grp 1 distinct set {10.50, 20.25, 5.00}: exact values
            assert got[0] == (1, D("35.75"), D("11.916667"))
            assert got[1] == (2, D("7.77"), D("7.770000"))
        finally:
            ex.close()

    def test_unsupported_plan_rejected_over_wire(self, substrait_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            # NotImplementedError maps to ArrowNotImplementedError (itself a
            # NotImplementedError) client-side — same shape as the server's
            # other stubs (test_unimplemented_action)
            join_body = _len_field(2, USERS_READ) + _len_field(3, USERS_READ)
            with pytest.raises(NotImplementedError, match="join"):
                ex.flight_info(_substrait_command(plan_bytes(rel(6, join_body))))
            # server survived
            assert ex.execute("SELECT 1 AS x").num_rows == 1
        finally:
            ex.close()

    def test_garbage_plan_bytes_over_wire(self, substrait_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            # protobuf garbage either fails to parse (INTERNAL FlightError)
            # or parses to an empty plan (NOT_IMPLEMENTED) — both clean
            with pytest.raises((fl.FlightError, NotImplementedError)):
                ex.flight_info(_substrait_command(b"\x00garbage"))
            with pytest.raises((fl.FlightError, NotImplementedError)):
                ex.flight_info(_substrait_command(b"\xde\xad\xbe\xef"))
            assert ex.execute("SELECT 1 AS x").num_rows == 1
        finally:
            ex.close()

    def test_filtered_sorted_scan_round_trip(self, substrait_server):
        """A filter+sort+fetch plan executes through the full wire stack
        and returns exactly the predicate-matching rows in order."""
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            cond = scalar_fn(1, [field_ref(0), literal("i64", 1)])
            filtered = rel(2, filter_rel(USERS_READ, cond))
            ordered = rel(5, sort_rel(filtered, [(0, 4)]))  # id DESC NULLS LAST
            p = plan_bytes(
                rel(3, fetch_rel(ordered, 10)),
                extensions=extension_function(1, "gt:any_any"),
            )
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            assert table.column("id").to_pylist() == [3, 2]
            assert table.column("name").to_pylist() == ["Charlie", "Bob"]
        finally:
            ex.close()


# -- aggregate subset (round 4) ----------------------------------------------


def agg_function(
    anchor: int, arg_indexes: list[int], invocation: int = 0, phase: int = 0
) -> bytes:
    """AggregateFunction: function_reference=1, phase=4, invocation=6,
    arguments=7 (FunctionArgument.value)."""
    body = _varint_field(1, anchor)
    if phase:
        body += _varint_field(4, phase)
    if invocation:
        body += _varint_field(6, invocation)
    for i in arg_indexes:
        body += _len_field(7, _len_field(3, field_ref(i)))
    return body


def measure(fn_body: bytes, flt: bytes | None = None) -> bytes:
    m = _len_field(1, fn_body)
    if flt is not None:
        m += _len_field(2, flt)
    return m


def aggregate_rel(
    input_rel: bytes,
    group_indexes: list[int],
    measures: list[bytes],
    use_refs: bool = False,
    emit: list[int] | None = None,
) -> bytes:
    body = _len_field(2, input_rel)
    if group_indexes:
        if use_refs:
            # newer shape: Grouping.expression_references into the
            # rel-level grouping_expressions (field 5)
            grouping = b"".join(
                _varint_field(2, i) for i in range(len(group_indexes))
            )
            body += _len_field(3, grouping)
            for gi in group_indexes:
                body += _len_field(5, field_ref(gi))
        else:
            grouping = b"".join(
                _len_field(1, field_ref(gi)) for gi in group_indexes
            )
            body += _len_field(3, grouping)
    for m in measures:
        body += _len_field(4, m)
    if emit is not None:
        emit_msg = b"".join(_varint_field(1, i) for i in emit)
        body = _len_field(1, _len_field(2, emit_msg)) + body
    return body


ORDERS_READ = rel(1, read_rel(["orders"], ["cust", "amount"]))


class TestAggregateTranslate:
    def test_group_by_sum_count(self):
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ,
                [0],
                [measure(agg_function(1, [1])), measure(agg_function(2, []))],
            )),
            extensions=extension_function(1, "sum:fp64")
            + extension_function(2, "count:"),
        )
        assert substrait_to_sql(p) == (
            "SELECT `cust` AS `cust`, SUM(`amount`) AS `sum_0`, "
            "COUNT(*) AS `count_1` FROM `orders` GROUP BY `cust`"
        )

    def test_grouping_reference_form_matches_inline(self):
        exts = extension_function(1, "min:fp64")
        a = plan_bytes(
            rel(4, aggregate_rel(ORDERS_READ, [0], [measure(agg_function(1, [1]))])),
            extensions=exts,
        )
        b = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0], [measure(agg_function(1, [1]))], use_refs=True
            )),
            extensions=exts,
        )
        assert substrait_to_sql(a) == substrait_to_sql(b)

    def test_distinct_and_filter_clause(self):
        flt = scalar_fn(2, [field_ref(1), literal("i64", 0)])
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ,
                [0],
                [measure(agg_function(1, [1], invocation=2), flt=flt)],
            )),
            extensions=extension_function(1, "count:any")
            + extension_function(2, "gt:any_any"),
        )
        assert substrait_to_sql(p) == (
            "SELECT `cust` AS `cust`, COUNT(DISTINCT `amount`) "
            "FILTER (WHERE (`amount` > 0)) AS `count_0` "
            "FROM `orders` GROUP BY `cust`"
        )

    def test_global_aggregate_no_group_by(self):
        p = plan_bytes(
            rel(4, aggregate_rel(ORDERS_READ, [], [measure(agg_function(1, [1]))])),
            extensions=extension_function(1, "avg:fp64"),
        )
        assert substrait_to_sql(p) == (
            "SELECT AVG(`amount`) AS `avg_0` FROM `orders`"
        )

    def test_having_and_root_names(self):
        # filter ABOVE the aggregate = HAVING over rendered expressions;
        # RelRoot names rename the outputs
        agg = rel(4, aggregate_rel(
            ORDERS_READ, [0], [measure(agg_function(1, [1]))]
        ))
        cond = scalar_fn(2, [field_ref(1), literal("i64", 100)])
        p = plan_bytes(
            rel(2, filter_rel(agg, cond)),
            ["customer", "total"],
            extensions=extension_function(1, "sum:fp64")
            + extension_function(2, "gt:any_any"),
        )
        assert substrait_to_sql(p) == (
            "SELECT `cust` AS `customer`, SUM(`amount`) AS `total` "
            "FROM `orders` GROUP BY `cust` HAVING (SUM(`amount`) > 100)"
        )

    def test_sort_above_aggregate_uses_rendered_expr(self):
        agg = rel(4, aggregate_rel(
            ORDERS_READ, [0], [measure(agg_function(1, [1]))]
        ))
        p = plan_bytes(
            rel(5, sort_rel(agg, [(1, 4)])),  # by measure, DESC NULLS LAST
            ["customer", "total"],
            extensions=extension_function(1, "sum:fp64"),
        )
        assert substrait_to_sql(p) == (
            "SELECT `cust` AS `customer`, SUM(`amount`) AS `total` "
            "FROM `orders` GROUP BY `cust` "
            "ORDER BY SUM(`amount`) DESC NULLS LAST"
        )

    def test_emit_remap_measure_only(self):
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0], [measure(agg_function(1, [1]))], emit=[1]
            )),
            extensions=extension_function(1, "max:fp64"),
        )
        assert substrait_to_sql(p) == (
            "SELECT MAX(`amount`) AS `max_0` FROM `orders` GROUP BY `cust`"
        )

    def test_unknown_aggregate_rejected(self):
        p = plan_bytes(
            rel(4, aggregate_rel(ORDERS_READ, [0], [measure(agg_function(1, [1]))])),
            extensions=extension_function(1, "approx_quantile:fp64"),
        )
        with pytest.raises(SubstraitUnsupported, match="approx_quantile"):
            substrait_to_sql(p)

    def test_grouping_sets_translate(self):
        # two sets {cust} and {amount}: union schema (cust, amount), the
        # appended grouping_set_id decodes GROUPING_ID masks back to the
        # spec's set indexes (round 5 — previously rejected)
        body = _len_field(2, ORDERS_READ)
        for gi in (0, 1):
            body += _len_field(3, _len_field(1, field_ref(gi)))
        body += _len_field(4, measure(agg_function(1, [1])))
        p = plan_bytes(
            rel(4, body), extensions=extension_function(1, "sum:fp64")
        )
        sql = substrait_to_sql(p)
        assert "GROUP BY GROUPING SETS ((`cust`), (`amount`))" in sql
        assert (
            "(CASE GROUPING_ID(`cust`, `amount`) WHEN 1 THEN 0 "
            "WHEN 2 THEN 1 END) AS `grouping_set_id`" in sql
        )

    def test_duplicate_grouping_sets_rejected(self):
        body = _len_field(2, ORDERS_READ)
        for _ in range(2):  # the SAME set twice — masks collide
            body += _len_field(3, _len_field(1, field_ref(0)))
        body += _len_field(4, measure(agg_function(1, [1])))
        p = plan_bytes(
            rel(4, body), extensions=extension_function(1, "sum:fp64")
        )
        with pytest.raises(SubstraitUnsupported, match="duplicate grouping"):
            substrait_to_sql(p)

    def test_partial_phase_sum_renders(self):
        # round 6 (VERDICT r5 #5): INITIAL_TO_INTERMEDIATE sum — the
        # intermediate state IS the sum, so the partial stage unparses
        # to a plain SUM
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [1], phase=1))],
            )),
            extensions=extension_function(1, "sum:fp64"),
        )
        assert "SUM(`amount`)" in substrait_to_sql(p)

    def test_phase_split_pair_translates(self):
        # the distributed shape: Aggregate(INTERMEDIATE_TO_RESULT) above
        # Aggregate(INITIAL_TO_INTERMEDIATE); count's merge is SUM over
        # the partial counts, sum merges with itself
        inner = rel(4, aggregate_rel(
            ORDERS_READ, [0],
            [
                measure(agg_function(1, [1], phase=1)),   # partial sum
                measure(agg_function(2, [], phase=1)),    # partial count(*)
            ],
        ))
        # inner output: (cust, sum_0, count_1) — merge on all groups
        outer = rel(4, aggregate_rel(
            inner, [0],
            [
                measure(agg_function(1, [1], phase=4)),   # SUM(partial sums)
                measure(agg_function(2, [2], phase=4)),   # SUM(partial counts)
            ],
        ))
        p = plan_bytes(
            outer,
            extensions=extension_function(1, "sum:fp64")
            + extension_function(2, "count:"),
        )
        sql = substrait_to_sql(p)
        assert "SUM(`sum_0`)" in sql
        assert "SUM(`count_1`)" in sql  # merge-phase count = SUM
        assert ") AS" in sql  # inner aggregate finished as derived table

    def test_partial_phase_avg_renders_struct_state(self):
        # round 8: avg's INITIAL_TO_INTERMEDIATE state is the (sum, count)
        # pair — rendered as a NAMED_STRUCT measure
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [1], phase=1))],
            )),
            extensions=extension_function(1, "avg:fp64"),
        )
        sql = substrait_to_sql(p)
        assert "NAMED_STRUCT('sum', SUM(`amount`)" in sql
        assert "'count', COUNT(`amount`)" in sql

    def test_merge_phase_avg_divides_summed_state(self):
        # INTERMEDIATE_TO_RESULT avg over a struct-state column
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [1], phase=4))],
            )),
            extensions=extension_function(1, "avg:fp64"),
        )
        sql = substrait_to_sql(p)
        assert "SUM(`amount`.`sum`) / SUM(`amount`.`count`)" in sql
        # zero-count guard (ADVICE r8): an all-NULL group must yield NULL,
        # not an ANSI DIVIDE_BY_ZERO error
        assert "CASE WHEN SUM(`amount`.`count`) > 0" in sql

    def test_partial_phase_stddev_renders_welford_state(self):
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [1], phase=1))],
            )),
            extensions=extension_function(1, "std_dev:fp64"),
        )
        sql = substrait_to_sql(p)
        assert "NAMED_STRUCT('n', COUNT(`amount`)" in sql
        assert "VAR_POP(CAST(`amount` AS DOUBLE))" in sql

    def test_merge_phase_variance_parallel_identity(self):
        # m2 merge: Σm2 + Σn·mean² − (Σn·mean)²/Σn, sample divisor n−1
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [1], phase=4))],
            )),
            extensions=extension_function(1, "variance:fp64"),
        )
        sql = substrait_to_sql(p)
        assert "SUM(`amount`.`m2`)" in sql
        assert "SUM(`amount`.`n` * `amount`.`mean` * `amount`.`mean`)" in sql
        assert "- 1)" in sql  # sample form
        # cancellation clamp (ADVICE r8): the identity subtracts two
        # near-equal sums, so FP can leave m2 a tiny negative on
        # near-constant data — SQRT would then return NaN where
        # single-phase STDDEV_SAMP returns ~0
        assert "GREATEST((SUM(`amount`.`m2`)" in sql

    def test_partial_phase_distinct_count_renders_set_state(self):
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [1], invocation=2, phase=1))],
            )),
            extensions=extension_function(1, "count:"),
        )
        assert "COLLECT_SET(`amount`)" in substrait_to_sql(p)

    def test_merge_phase_distinct_count_unions_sets(self):
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [1], invocation=2, phase=4))],
            )),
            extensions=extension_function(1, "count:"),
        )
        sql = substrait_to_sql(p)
        assert "ARRAY_DISTINCT(FLATTEN(COLLECT_LIST(`amount`)))" in sql
        assert "CAST(SIZE(" in sql

    def test_partial_phase_distinct_sum_renders_set_state(self):
        # round 9 (VERDICT r8 #5): DISTINCT sum/avg phase-split when the
        # extension declaration's compound name carries the argument type
        # — the declared intermediate List<T> element type
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [1], invocation=2, phase=1))],
            )),
            extensions=extension_function(1, "sum:fp64"),
        )
        assert "COLLECT_SET(`amount`)" in substrait_to_sql(p)

    def test_merge_phase_distinct_sum_folds_with_declared_type(self):
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [1], invocation=2, phase=4))],
            )),
            extensions=extension_function(1, "sum:i64"),
        )
        sql = substrait_to_sql(p)
        assert "ARRAY_DISTINCT(FLATTEN(COLLECT_LIST(`amount`)))" in sql
        # integral accumulator recovered from the i64 signature; seeded
        # by the first element so an empty set folds to NULL, not 0
        assert "AS BIGINT" in sql and "TRY_ELEMENT_AT" in sql
        assert "AGGREGATE(SLICE(" in sql

    def test_merge_phase_distinct_avg_divides_fold_by_size(self):
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [1], invocation=2, phase=4))],
            )),
            extensions=extension_function(1, "avg:fp64"),
        )
        sql = substrait_to_sql(p)
        assert "AS DOUBLE" in sql and "CASE WHEN SIZE(" in sql

    def test_distinct_sum_decimal_signature_widens_like_spark(self):
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [1], invocation=2, phase=4))],
            )),
            extensions=extension_function(1, "sum:dec<18,2>"),
        )
        assert "DECIMAL(28,2)" in substrait_to_sql(p)

    def test_distinct_sum_without_signature_still_rejected(self):
        # a bare-name declaration gives no element type to fold with —
        # the rejection stays, naming the missing signature
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [1], invocation=2, phase=1))],
            )),
            extensions=extension_function(1, "sum"),
        )
        with pytest.raises(SubstraitUnsupported, match="compound"):
            substrait_to_sql(p)

    def test_merge_phase_distinct_avg_decimal_folds_exactly(self):
        # round 10: DISTINCT avg of decimal folds in the exact
        # DECIMAL(p+10,s) accumulator and divides in Spark's own AVG
        # typing — count cast to DECIMAL(20,0), result cast to the
        # bounded (p+4, s+4) type — instead of rejecting
        pd = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [1], invocation=2, phase=4))],
            )),
            extensions=extension_function(1, "avg:dec<18,2>"),
        )
        sql = substrait_to_sql(pd)
        assert "DECIMAL(28,2)" in sql  # the exact fold accumulator
        assert "AS DECIMAL(20,0)" in sql  # Average's count cast
        assert "AS DECIMAL(22,6)" in sql  # bounded (p+4, s+4) result
        assert "AS DOUBLE" not in sql  # never a lossy double fold

    def test_distinct_avg_decimal_result_type_bounds(self):
        from datafusion_flight_sql_server_spark.plans.substrait import (
            _distinct_avg_result_type,
        )
        assert _distinct_avg_result_type("dec<18,2>") == "DECIMAL(22,6)"
        # precision saturates at 38, scale stays <= precision
        assert _distinct_avg_result_type("dec<38,10>") == "DECIMAL(38,14)"
        assert _distinct_avg_result_type("dec<38,38>") == "DECIMAL(38,38)"
        # bare dec defaults to Substrait's (38,18) reading
        assert _distinct_avg_result_type("dec") == "DECIMAL(38,22)"
        assert _distinct_avg_result_type("i64") is None
        assert _distinct_avg_result_type(None) is None

    def test_merge_phase_count_star_malformed(self):
        # INTERMEDIATE_TO_RESULT count without the partial-count column
        # cannot be COUNT(*) — that would recount rows, not merge
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [], phase=4))],
            )),
            extensions=extension_function(1, "count:"),
        )
        with pytest.raises(SubstraitMalformed, match="partial-count"):
            substrait_to_sql(p)

    def test_project_above_aggregate_composes(self):
        # the aggregate finishes as a derived table; the projection's
        # field refs address its output columns
        agg = rel(4, aggregate_rel(
            ORDERS_READ, [0], [measure(agg_function(1, [1]))]
        ))
        p = plan_bytes(
            rel(7, project_rel(agg, [0], None)),
            extensions=extension_function(1, "sum:fp64"),
        )
        sql = substrait_to_sql(p)
        assert "GROUP BY" in sql and ") AS" in sql

    def test_empty_aggregate_malformed(self):
        p = plan_bytes(rel(4, _len_field(2, ORDERS_READ)))
        with pytest.raises(SubstraitMalformed, match="no groupings"):
            substrait_to_sql(p)


class TestAggregateOverWire:
    def test_group_count_round_trip(self, substrait_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            users = rel(1, read_rel(["users"], ["id", "name"]))
            p = plan_bytes(
                rel(4, aggregate_rel(users, [1], [measure(agg_function(1, []))])),
                ["who", "n"],
                extensions=extension_function(1, "count:"),
            )
            info = ex.flight_info(_substrait_command(p))
            assert [f.name for f in info.schema] == ["who", "n"]
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            got = dict(zip(table.column("who").to_pylist(), table.column("n").to_pylist()))
            assert got == {"Alice": 1, "Bob": 1, "Charlie": 1}
        finally:
            ex.close()


# -- join / set / computed-projection subset (round 4, late) ------------------


def join_rel(
    left: bytes,
    right: bytes,
    expr: bytes | None,
    jtype: int,
    post: bytes | None = None,
    emit: list[int] | None = None,
) -> bytes:
    """JoinRel: common=1, left=2, right=3, expression=4, post_join_filter=5,
    type=6."""
    body = _len_field(2, left) + _len_field(3, right)
    if expr is not None:
        body += _len_field(4, expr)
    if post is not None:
        body += _len_field(5, post)
    body += _varint_field(6, jtype)
    if emit is not None:
        emit_msg = b"".join(_varint_field(1, i) for i in emit)
        body = _len_field(1, _len_field(2, emit_msg)) + body
    return body


def cross_rel(left: bytes, right: bytes) -> bytes:
    return _len_field(2, left) + _len_field(3, right)


def set_rel(inputs: list[bytes], op: int) -> bytes:
    """SetRel: common=1, inputs=2 (repeated), op=3."""
    body = b"".join(_len_field(2, i) for i in inputs)
    body += _varint_field(3, op)
    return body


FULL_ORDERS_READ = rel(1, read_rel(["orders"], ["order_id", "user_id", "amount"]))
EQ_EXT = extension_function(1, "equal:any_any")


class TestJoinSetProjectTranslate:
    def test_inner_equi_join(self):
        # users(id, name) JOIN orders(order_id, user_id, amount)
        # ON id = user_id — the join expression indexes left++right
        cond = scalar_fn(1, [field_ref(0), field_ref(3)])
        p = plan_bytes(
            rel(6, join_rel(USERS_READ, FULL_ORDERS_READ, cond, 1)),
            extensions=EQ_EXT,
        )
        assert substrait_to_sql(p) == (
            "SELECT `id`, `name`, `order_id`, `user_id`, `amount` FROM "
            "(SELECT `t0`.`id` AS `id`, `t0`.`name` AS `name`, "
            "`t1`.`order_id` AS `order_id`, `t1`.`user_id` AS `user_id`, "
            "`t1`.`amount` AS `amount` FROM "
            "(SELECT `id`, `name` FROM `users`) AS `t0` INNER JOIN "
            "(SELECT `order_id`, `user_id`, `amount` FROM `orders`) AS `t1` "
            "ON (`t0`.`id` = `t1`.`user_id`)) AS `j`"
        )

    def test_left_semi_emits_left_only(self):
        cond = scalar_fn(1, [field_ref(0), field_ref(3)])
        p = plan_bytes(
            rel(6, join_rel(USERS_READ, FULL_ORDERS_READ, cond, 5)),
            extensions=EQ_EXT,
        )
        sql = substrait_to_sql(p)
        assert "LEFT SEMI JOIN" in sql
        assert "`amount`" not in sql.split(" FROM ")[0]

    def test_self_join_dedups_output_names(self):
        cond = scalar_fn(1, [field_ref(0), field_ref(2)])
        p = plan_bytes(
            rel(6, join_rel(USERS_READ, USERS_READ, cond, 1)),
            extensions=EQ_EXT,
        )
        sql = substrait_to_sql(p)
        assert "AS `id_1`" in sql and "AS `name_1`" in sql

    def test_post_join_filter_renders_where(self):
        cond = scalar_fn(1, [field_ref(0), field_ref(3)])
        post = scalar_fn(2, [field_ref(4), literal("i64", 30)])
        p = plan_bytes(
            rel(6, join_rel(USERS_READ, FULL_ORDERS_READ, cond, 3, post=post)),
            extensions=EQ_EXT + extension_function(2, "gt:any_any"),
        )
        sql = substrait_to_sql(p)
        assert "LEFT OUTER JOIN" in sql
        assert "WHERE (`t1`.`amount` > 30)" in sql

    def test_filter_above_join_is_where(self):
        cond = scalar_fn(1, [field_ref(0), field_ref(3)])
        j = rel(6, join_rel(USERS_READ, FULL_ORDERS_READ, cond, 1))
        flt = scalar_fn(2, [field_ref(4), literal("i64", 60)])
        p = plan_bytes(
            rel(2, filter_rel(j, flt)),
            extensions=EQ_EXT + extension_function(2, "gt:any_any"),
        )
        sql = substrait_to_sql(p)
        assert sql.endswith("WHERE (`amount` > 60)")
        assert "HAVING" not in sql

    def test_aggregate_above_join_composes(self):
        cond = scalar_fn(1, [field_ref(0), field_ref(3)])
        j = rel(6, join_rel(USERS_READ, FULL_ORDERS_READ, cond, 1))
        p = plan_bytes(
            rel(4, aggregate_rel(j, [1], [measure(agg_function(2, [4]))])),
            extensions=EQ_EXT + extension_function(2, "sum:i64"),
        )
        sql = substrait_to_sql(p)
        assert sql.startswith("SELECT `name` AS `name`, SUM(`amount`) AS `sum_0` FROM (")
        assert sql.endswith("GROUP BY `name`")

    def test_unsupported_join_type_rejected(self):
        cond = scalar_fn(1, [field_ref(0), field_ref(3)])
        p = plan_bytes(
            rel(6, join_rel(USERS_READ, FULL_ORDERS_READ, cond, 11)),
            extensions=EQ_EXT,
        )
        with pytest.raises(SubstraitUnsupported, match="join type 11"):
            substrait_to_sql(p)

    def test_join_without_expression_rejected(self):
        p = plan_bytes(rel(6, join_rel(USERS_READ, FULL_ORDERS_READ, None, 1)))
        with pytest.raises(SubstraitUnsupported, match="join expression"):
            substrait_to_sql(p)

    def test_cross_rel(self):
        p = plan_bytes(rel(12, cross_rel(USERS_READ, USERS_READ)))
        sql = substrait_to_sql(p)
        assert "CROSS JOIN" in sql
        assert "AS `id_1`" in sql

    def test_union_all(self):
        p = plan_bytes(rel(8, set_rel([USERS_READ, USERS_READ], 6)))
        assert substrait_to_sql(p) == (
            "SELECT `id`, `name` FROM ((SELECT `id`, `name` FROM `users`) "
            "UNION ALL (SELECT `id`, `name` FROM `users`)) AS `s`"
        )

    def test_set_ops_map(self):
        # spec multiplicity table: MINUS_PRIMARY=1, INTERSECTION_MULTISET=4,
        # UNION_DISTINCT=5, MINUS_PRIMARY_ALL=7, INTERSECTION_MULTISET_ALL=8
        for op, kw in ((1, "EXCEPT"), (4, "INTERSECT"), (5, "UNION"),
                       (7, "EXCEPT ALL"), (8, "INTERSECT ALL")):
            sql = substrait_to_sql(
                plan_bytes(rel(8, set_rel([USERS_READ, USERS_READ], op)))
            )
            assert f") {kw} (" in sql

    def test_presence_set_ops_render_exists(self):
        # MINUS_MULTISET (2) / INTERSECTION_PRIMARY (3) keep every primary
        # copy — rendered as null-safe whole-row [NOT] EXISTS, not EXCEPT/
        # INTERSECT (which are DISTINCT operations)
        sql2 = substrait_to_sql(
            plan_bytes(rel(8, set_rel([USERS_READ, USERS_READ], 2)))
        )
        assert "WHERE NOT EXISTS (SELECT 1 FROM" in sql2
        assert "`t0`.`id` <=> `t1`.`id`" in sql2
        sql3 = substrait_to_sql(
            plan_bytes(rel(8, set_rel([USERS_READ, USERS_READ], 3)))
        )
        assert "WHERE EXISTS (SELECT 1 FROM" in sql3
        assert "EXCEPT" not in sql3 and "INTERSECT" not in sql3

    def test_set_arity_rejected(self):
        p = plan_bytes(rel(8, set_rel([USERS_READ], 6)))
        with pytest.raises(SubstraitUnsupported, match="1 inputs"):
            substrait_to_sql(p)

    def test_computed_projection(self):
        # project add(id, 1) with emit keeping only the computed column
        expr = scalar_fn(1, [field_ref(0), literal("i64", 1)])
        body = _len_field(2, USERS_READ) + _len_field(3, expr)
        emit_msg = _varint_field(1, 2)
        body = _len_field(1, _len_field(2, emit_msg)) + body
        p = plan_bytes(rel(7, body), extensions=extension_function(1, "add:i64_i64"))
        assert substrait_to_sql(p) == (
            "SELECT `expr0` FROM (SELECT (`id` + 1) AS `expr0` "
            "FROM `users`) AS `p`"
        )

    def test_filter_above_computed_projection_is_where(self):
        expr = scalar_fn(1, [field_ref(0), literal("i64", 1)])
        body = _len_field(2, USERS_READ) + _len_field(3, expr)
        flt = scalar_fn(2, [field_ref(2), literal("i64", 2)])
        p = plan_bytes(
            rel(2, filter_rel(rel(7, body), flt)),
            extensions=extension_function(1, "multiply:i64_i64")
            + extension_function(2, "gte:any_any"),
        )
        sql = substrait_to_sql(p)
        assert "WHERE (`expr0` >= 2)" in sql and "HAVING" not in sql

    def test_negate_and_arithmetic_render(self):
        expr = scalar_fn(
            1,
            [scalar_fn(2, [field_ref(0)]), literal("i64", 3)],
        )
        body = _len_field(2, USERS_READ) + _len_field(3, expr)
        p = plan_bytes(
            rel(7, body),
            extensions=extension_function(1, "subtract:i64_i64")
            + extension_function(2, "negate:i64"),
        )
        assert "((- `id`) - 3)" in substrait_to_sql(p)


class TestJoinSetProjectOverWire:
    def test_join_round_trip_four_rows(self, substrait_server):
        """Reference parity: the join scenario asserts exactly 4 rows
        (reference: tests/integration_test.rs:297-328), here arriving as a
        Substrait JoinRel instead of SQL text."""
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            users = rel(1, read_rel(["users"], ["id", "name"]))
            orders = rel(1, read_rel(["orders"], ["order_id", "user_id", "amount"]))
            cond = scalar_fn(1, [field_ref(0), field_ref(3)])
            p = plan_bytes(
                rel(6, join_rel(users, orders, cond, 1)),
                extensions=extension_function(1, "equal:any_any"),
            )
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            assert table.num_rows == 4
            assert set(table.column_names) == {
                "id", "name", "order_id", "user_id", "amount"
            }
        finally:
            ex.close()

    def test_union_all_round_trip(self, substrait_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            users = rel(1, read_rel(["users"], ["id", "name"]))
            p = plan_bytes(rel(8, set_rel([users, users], 6)))
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            assert table.num_rows == 6
        finally:
            ex.close()

    def test_computed_projection_round_trip(self, substrait_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            users = rel(1, read_rel(["users"], ["id", "name"]))
            expr = scalar_fn(1, [field_ref(0), literal("i64", 100)])
            body = _len_field(2, users) + _len_field(3, expr)
            emit_msg = _varint_field(1, 2)
            body = _len_field(1, _len_field(2, emit_msg)) + body
            p = plan_bytes(
                rel(7, body),
                ["shifted"],
                extensions=extension_function(1, "add:i64_i64"),
            )
            info = ex.flight_info(_substrait_command(p))
            assert [f.name for f in info.schema] == ["shifted"]
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            assert sorted(table.column("shifted").to_pylist()) == [101, 102, 103]
        finally:
            ex.close()


# -- cast expressions + date literals (round 4, late) -------------------------


def cast_expr(target_type: bytes, inp: bytes, behavior: int = 0) -> bytes:
    """Expression.cast: type=1, input=2, failure_behavior=3."""
    body = _len_field(1, target_type) + _len_field(2, inp)
    if behavior:
        body += _varint_field(3, behavior)
    return _len_field(11, body)


def type_arm(num: int, payload: bytes = b"") -> bytes:
    return _len_field(num, payload)


class TestCastTranslate:
    def test_cast_to_bigint_try_default(self):
        expr = cast_expr(type_arm(7), field_ref(0))
        body = _len_field(2, USERS_READ) + _len_field(3, expr)
        emit_msg = _varint_field(1, 2)
        body = _len_field(1, _len_field(2, emit_msg)) + body
        sql = substrait_to_sql(plan_bytes(rel(7, body)))
        assert "TRY_CAST(`id` AS BIGINT)" in sql

    def test_cast_throw_is_plain_cast(self):
        expr = cast_expr(type_arm(12), field_ref(0), behavior=2)
        body = _len_field(2, USERS_READ) + _len_field(3, expr)
        emit_msg = _varint_field(1, 2)
        body = _len_field(1, _len_field(2, emit_msg)) + body
        sql = substrait_to_sql(plan_bytes(rel(7, body)))
        assert "CAST(`id` AS STRING)" in sql
        assert "TRY_CAST" not in sql

    def test_cast_decimal_parameters(self):
        # Decimal message: scale=1, precision=2
        dec = _varint_field(1, 2) + _varint_field(2, 18)
        expr = cast_expr(type_arm(24, dec), field_ref(0))
        body = _len_field(2, USERS_READ) + _len_field(3, expr)
        emit_msg = _varint_field(1, 2)
        body = _len_field(1, _len_field(2, emit_msg)) + body
        sql = substrait_to_sql(plan_bytes(rel(7, body)))
        assert "TRY_CAST(`id` AS DECIMAL(18,2))" in sql

    def test_cast_in_filter_condition(self):
        cond = scalar_fn(
            1, [cast_expr(type_arm(7), field_ref(0)), literal("i64", 2)]
        )
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, cond)),
            extensions=extension_function(1, "gte:any_any"),
        )
        assert substrait_to_sql(p) == (
            "SELECT `id`, `name` FROM `users` "
            "WHERE (TRY_CAST(`id` AS BIGINT) >= 2)"
        )

    def test_unsupported_cast_arm_rejected(self):
        expr = cast_expr(type_arm(33), field_ref(0))  # interval_compound
        body = _len_field(2, USERS_READ) + _len_field(3, expr)
        with pytest.raises(SubstraitUnsupported, match="type arm 33"):
            substrait_to_sql(plan_bytes(rel(7, body)))

    def test_date_literal(self):
        # 8035 days after 1970-01-01 = 1992-01-01
        date_lit = _len_field(1, _varint_field(16, 8035))
        cond = scalar_fn(1, [field_ref(0), date_lit])
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, cond)),
            extensions=extension_function(1, "gt:any_any"),
        )
        assert "(`id` > DATE '1992-01-01')" in substrait_to_sql(p)


class TestCastOverWire:
    def test_cast_projection_round_trip(self, substrait_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            users = rel(1, read_rel(["users"], ["id", "name"]))
            expr = cast_expr(type_arm(12), field_ref(0))  # id -> string
            body = _len_field(2, users) + _len_field(3, expr)
            emit_msg = _varint_field(1, 2)
            body = _len_field(1, _len_field(2, emit_msg)) + body
            p = plan_bytes(rel(7, body), ["id_str"])
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            assert sorted(table.column("id_str").to_pylist()) == ["1", "2", "3"]
        finally:
            ex.close()

    def test_cast_timestamp_and_binary_arms(self):
        # type.proto: binary=13, timestamp=14 (NTZ), timestamp_tz=29
        for arm, ty in ((13, "BINARY"), (14, "TIMESTAMP_NTZ"), (29, "TIMESTAMP")):
            expr = cast_expr(type_arm(arm), field_ref(1))
            body = _len_field(2, USERS_READ) + _len_field(3, expr)
            emit_msg = _varint_field(1, 2)
            body = _len_field(1, _len_field(2, emit_msg)) + body
            sql = substrait_to_sql(plan_bytes(rel(7, body)))
            assert f"TRY_CAST(`name` AS {ty})" in sql


class TestFuzz:
    def test_random_bytes_never_crash_differently(self):
        """Arbitrary bytes must map to the two declared error types (or
        translate, for byte strings that happen to decode) — never an
        IndexError/KeyError/UnicodeDecodeError escaping the consumer."""
        import random

        rng = random.Random(42)
        outcomes = {"malformed": 0, "unsupported": 0, "sql": 0}
        for size in list(range(0, 24)) + [64, 256]:
            for _ in range(40):
                blob = bytes(rng.randrange(256) for _ in range(size))
                try:
                    substrait_to_sql(blob)
                    outcomes["sql"] += 1
                except SubstraitMalformed:
                    outcomes["malformed"] += 1
                except SubstraitUnsupported:
                    outcomes["unsupported"] += 1
        assert outcomes["malformed"] + outcomes["unsupported"] > 0

    def test_truncations_of_valid_plan_never_crash_differently(self):
        """Every prefix truncation of a real join+filter plan fails with a
        declared error type (or translates, for prefixes that parse)."""
        cond = scalar_fn(1, [field_ref(0), field_ref(3)])
        p = plan_bytes(
            rel(6, join_rel(USERS_READ, FULL_ORDERS_READ, cond, 1)),
            extensions=extension_function(1, "equal:any_any"),
        )
        for cut in range(len(p)):
            try:
                substrait_to_sql(p[:cut])
            except (SubstraitMalformed, SubstraitUnsupported):
                pass


def if_then(clauses: list[tuple[bytes, bytes]], els: bytes | None) -> bytes:
    """Expression.if_then: ifs=1 (IfClause: if=1, then=2), else=2."""
    body = b""
    for cond, then in clauses:
        body += _len_field(1, _len_field(1, cond) + _len_field(2, then))
    if els is not None:
        body += _len_field(2, els)
    return _len_field(6, body)


class TestIfThenTranslate:
    def test_case_when_projection(self):
        expr = if_then(
            [(scalar_fn(1, [field_ref(0), literal("i64", 2)]),
              literal("string", "big"))],
            literal("string", "small"),
        )
        body = _len_field(2, USERS_READ) + _len_field(3, expr)
        emit_msg = _varint_field(1, 2)
        body = _len_field(1, _len_field(2, emit_msg)) + body
        p = plan_bytes(
            rel(7, body), extensions=extension_function(1, "gte:any_any")
        )
        assert substrait_to_sql(p) == (
            "SELECT `expr0` FROM (SELECT (CASE WHEN (`id` >= 2) THEN 'big' "
            "ELSE 'small' END) AS `expr0` FROM `users`) AS `p`"
        )

    def test_multi_clause_and_nested(self):
        expr = if_then(
            [
                (scalar_fn(1, [field_ref(0), literal("i64", 3)]),
                 literal("i64", 30)),
                (scalar_fn(1, [field_ref(0), literal("i64", 2)]),
                 literal("i64", 20)),
            ],
            scalar_fn(2, [field_ref(0), literal("i64", 1)]),
        )
        body = _len_field(2, USERS_READ) + _len_field(3, expr)
        p = plan_bytes(
            rel(7, body),
            extensions=extension_function(1, "gte:any_any")
            + extension_function(2, "add:i64_i64"),
        )
        sql = substrait_to_sql(p)
        assert "WHEN (`id` >= 3) THEN 30 WHEN (`id` >= 2) THEN 20" in sql
        assert "ELSE (`id` + 1) END" in sql

    def test_missing_else_malformed(self):
        expr = if_then(
            [(scalar_fn(1, [field_ref(0), literal("i64", 2)]),
              literal("i64", 1))],
            None,
        )
        body = _len_field(2, USERS_READ) + _len_field(3, expr)
        p = plan_bytes(
            rel(7, body), extensions=extension_function(1, "gte:any_any")
        )
        with pytest.raises(SubstraitMalformed, match="else"):
            substrait_to_sql(p)

    def test_case_when_round_trip(self, substrait_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            users = rel(1, read_rel(["users"], ["id", "name"]))
            expr = if_then(
                [(scalar_fn(1, [field_ref(0), literal("i64", 2)]),
                  literal("string", "big"))],
                literal("string", "small"),
            )
            body = _len_field(2, users) + _len_field(3, expr)
            emit_msg = _varint_field(1, 2)
            body = _len_field(1, _len_field(2, emit_msg)) + body
            p = plan_bytes(
                rel(7, body),
                ["bucket"],
                extensions=extension_function(1, "gte:any_any"),
            )
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            assert sorted(table.column("bucket").to_pylist()) == [
                "big", "big", "small"
            ]
        finally:
            ex.close()


class TestScalarWidening:
    def test_like_and_coalesce(self):
        cond = scalar_fn(1, [field_ref(1), literal("string", "A%")])
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, cond)),
            extensions=extension_function(1, "like:str_str"),
        )
        assert "WHERE (`name` LIKE 'A%')" in substrait_to_sql(p)

        expr = scalar_fn(2, [field_ref(1), literal("string", "?")])
        body = _len_field(2, USERS_READ) + _len_field(3, expr)
        p2 = plan_bytes(
            rel(7, body), extensions=extension_function(2, "coalesce:any")
        )
        assert "COALESCE(`name`, '?')" in substrait_to_sql(p2)

    def test_stddev_variance_aggregates(self):
        p = plan_bytes(
            rel(4, aggregate_rel(
                ORDERS_READ, [0],
                [measure(agg_function(1, [1])), measure(agg_function(2, [1]))],
            )),
            extensions=extension_function(1, "std_dev:fp64")
            + extension_function(2, "variance:fp64"),
        )
        sql = substrait_to_sql(p)
        assert "STDDEV_SAMP(`amount`) AS `std_dev_0`" in sql
        assert "VAR_SAMP(`amount`) AS `variance_1`" in sql


# -- round 5: window functions, subqueries, typed divide ---------------------


def typed_scalar_fn(anchor: int, args: list[bytes], output_type_arm: int) -> bytes:
    """scalar_fn with a declared output_type (ScalarFunction field 3 —
    field 5 is options; only AggregateFunction has output_type=5)."""
    body = _varint_field(1, anchor)
    body += _len_field(3, _len_field(output_type_arm, b""))
    for a in args:
        body += _len_field(4, _len_field(3, a))
    return _len_field(3, body)


BOUND_UNBOUNDED = _len_field(4, b"")
BOUND_CURRENT = _len_field(3, b"")


def bound_preceding(offset: int) -> bytes:
    return _len_field(1, _varint_field(1, offset))


def window_fn(
    anchor: int,
    args: tuple = (),
    partitions: tuple = (),
    sorts: tuple = (),
    bounds: tuple | None = None,
    invocation: int = 0,
) -> bytes:
    """Expression.window_function (field numbers from algebra.proto:
    function_reference=1, partitions=2, sorts=3, upper=4, lower=5,
    arguments=9, invocation=10, bounds_type=12)."""
    body = _varint_field(1, anchor)
    for p_expr in partitions:
        body += _len_field(2, p_expr)
    for col_idx, direction in sorts:
        sf = _len_field(1, field_ref(col_idx)) + _varint_field(2, direction)
        body += _len_field(3, sf)
    if bounds is not None:
        bounds_type, lower, upper = bounds
        if bounds_type:
            body += _varint_field(12, bounds_type)
        if upper is not None:
            body += _len_field(4, upper)
        if lower is not None:
            body += _len_field(5, lower)
    for a in args:
        body += _len_field(9, _len_field(3, a))
    if invocation:
        body += _varint_field(10, invocation)
    return _len_field(5, body)


def scalar_subquery(rel_msg: bytes) -> bytes:
    return _len_field(12, _len_field(1, _len_field(1, rel_msg)))


def in_subquery(needles: list[bytes], haystack_rel: bytes) -> bytes:
    body = b"".join(_len_field(1, n) for n in needles)
    body += _len_field(2, haystack_rel)
    return _len_field(12, _len_field(2, body))


def exists_subquery(rel_msg: bytes) -> bytes:
    body = _varint_field(1, 1) + _len_field(2, rel_msg)  # PREDICATE_OP_EXISTS
    return _len_field(12, _len_field(3, body))


def outer_field_ref(index: int, steps_out: int = 1) -> bytes:
    """Correlated field reference (FieldReference.outer_reference, field 5)."""
    struct_field = _varint_field(1, index)
    segment = _len_field(2, struct_field)
    reference = (
        _len_field(1, segment) + _len_field(5, _varint_field(1, steps_out))
    )
    return _len_field(2, reference)


def computed_project(input_rel: bytes, exprs: list[bytes], emit: list[int] | None) -> bytes:
    body = _len_field(2, input_rel)
    for e in exprs:
        body += _len_field(3, e)
    if emit is not None:
        emit_msg = b"".join(_varint_field(1, i) for i in emit)
        body = _len_field(1, _len_field(2, emit_msg)) + body
    return body


class TestWindowTranslate:
    def test_windowed_stddev_renders(self):
        w = window_fn(1, args=(field_ref(0),), partitions=(field_ref(1),))
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [w], [2])),
            extensions=extension_function(1, "std_dev:fp64"),
        )
        assert "STDDEV_SAMP(`id`) OVER (PARTITION BY `name`)" in substrait_to_sql(p)

    def test_row_number_partition_order(self):
        w = window_fn(1, partitions=(field_ref(1),), sorts=((0, 2),))
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [w], [2])),
            extensions=extension_function(1, "row_number:"),
        )
        assert substrait_to_sql(p) == (
            "SELECT `expr0` FROM (SELECT ROW_NUMBER() OVER (PARTITION BY "
            "`name` ORDER BY `id` ASC NULLS LAST) AS `expr0` "
            "FROM `users`) AS `p`"
        )

    def test_windowed_sum_rows_frame(self):
        w = window_fn(
            1,
            args=(field_ref(0),),
            sorts=((0, 2),),
            bounds=(1, BOUND_UNBOUNDED, BOUND_CURRENT),
        )
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [w], [2])),
            extensions=extension_function(1, "sum:i64"),
        )
        sql = substrait_to_sql(p)
        assert (
            "SUM(`id`) OVER (ORDER BY `id` ASC NULLS LAST ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND CURRENT ROW)" in sql
        )

    def test_lag_with_preceding_range(self):
        w = window_fn(
            1,
            args=(field_ref(0),),
            sorts=((0, 2),),
            bounds=(2, bound_preceding(3), BOUND_CURRENT),
        )
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [w], [2])),
            extensions=extension_function(1, "lag:any"),
        )
        sql = substrait_to_sql(p)
        assert "LAG(`id`) OVER (ORDER BY `id` ASC NULLS LAST " in sql
        assert "RANGE BETWEEN 3 PRECEDING AND CURRENT ROW" in sql

    def test_count_star_window(self):
        w = window_fn(1, partitions=(field_ref(1),))
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [w], [2])),
            extensions=extension_function(1, "count:"),
        )
        assert "COUNT(*) OVER (PARTITION BY `name`)" in substrait_to_sql(p)

    def test_unset_bounds_with_order_is_partition_total(self):
        # Round-6 fix (ADVICE r5): BOTH bounds unset defaults to the
        # substrait start..end-of-partition frame; without an explicit
        # frame Spark's ORDER BY default (RANGE ..CURRENT ROW) would
        # silently render a running sum instead of the partition total.
        w = window_fn(1, args=(field_ref(0),), sorts=((0, 2),))
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [w], [2])),
            extensions=extension_function(1, "sum:i64"),
        )
        assert (
            "SUM(`id`) OVER (ORDER BY `id` ASC NULLS LAST ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)" in substrait_to_sql(p)
        )

    def test_unset_bounds_last_value_sees_partition_end(self):
        w = window_fn(
            1, args=(field_ref(0),), partitions=(field_ref(1),), sorts=((0, 2),)
        )
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [w], [2])),
            extensions=extension_function(1, "last_value:any"),
        )
        assert (
            "LAST_VALUE(`id`) OVER (PARTITION BY `name` ORDER BY `id` ASC "
            "NULLS LAST ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED "
            "FOLLOWING)" in substrait_to_sql(p)
        )

    def test_unset_bounds_ranking_fn_keeps_no_frame(self):
        # ranking/offset functions reject explicit frames in Spark and are
        # frame-insensitive — no frame clause may appear
        w = window_fn(1, args=(field_ref(0),), sorts=((0, 2),))
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [w], [2])),
            extensions=extension_function(1, "lag:any"),
        )
        sql = substrait_to_sql(p)
        assert "LAG(`id`) OVER (ORDER BY `id` ASC NULLS LAST)" in sql
        assert "BETWEEN" not in sql

    def test_bounds_without_type_rejected(self):
        w = window_fn(
            1, sorts=((0, 2),), bounds=(0, BOUND_UNBOUNDED, BOUND_CURRENT)
        )
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [w], [2])),
            extensions=extension_function(1, "row_number:"),
        )
        with pytest.raises(SubstraitUnsupported, match="bounds_type"):
            substrait_to_sql(p)

    def test_distinct_window_rejected(self):
        w = window_fn(1, args=(field_ref(0),), invocation=2)
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [w], [2])),
            extensions=extension_function(1, "sum:i64"),
        )
        with pytest.raises(SubstraitUnsupported, match="DISTINCT window"):
            substrait_to_sql(p)

    def test_unknown_window_function_rejected(self):
        w = window_fn(1, args=(field_ref(0),))
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [w], [2])),
            extensions=extension_function(1, "mystery_fn:any"),
        )
        with pytest.raises(SubstraitUnsupported, match="mystery_fn"):
            substrait_to_sql(p)


ORDERS_FOR_SUB = rel(1, read_rel(["orders"], ["order_id", "user_id", "amount"]))


class TestSubqueryTranslate:
    def test_scalar_subquery_in_filter(self):
        agg = rel(
            4,
            aggregate_rel(ORDERS_FOR_SUB, [], [measure(agg_function(2, [2]))]),
        )
        cond = scalar_fn(1, [field_ref(0), scalar_subquery(agg)])
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, cond)),
            extensions=extension_function(1, "gt:any_any")
            + extension_function(2, "avg:i64"),
        )
        sql = substrait_to_sql(p)
        assert "WHERE (`id` > (SELECT AVG(`amount`) AS `avg_0` FROM `orders`))" in sql

    def test_in_subquery_filter(self):
        haystack = rel(7, computed_project(ORDERS_FOR_SUB, [field_ref(1)], [3]))
        cond = in_subquery([field_ref(0)], haystack)
        p = plan_bytes(rel(2, filter_rel(USERS_READ, cond)))
        sql = substrait_to_sql(p)
        assert "WHERE (`id` IN (SELECT `user_id` FROM `orders`))" in sql

    def test_exists_subquery_filter(self):
        cond = exists_subquery(ORDERS_FOR_SUB)
        p = plan_bytes(rel(2, filter_rel(USERS_READ, cond)))
        sql = substrait_to_sql(p)
        assert "WHERE EXISTS (SELECT `order_id`, `user_id`, `amount` FROM `orders`)" in sql

    def test_correlated_exists_renders_qualified_outer_ref(self):
        inner_cond = scalar_fn(1, [field_ref(1), outer_field_ref(0)])
        inner = rel(2, filter_rel(ORDERS_FOR_SUB, inner_cond))
        cond = exists_subquery(inner)
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, cond)),
            extensions=extension_function(1, "equal:any_any"),
        )
        sql = substrait_to_sql(p)
        # the outer FROM gains a pinned alias and the inner predicate
        # references it, qualified
        assert "FROM `users` AS `__o1`" in sql
        assert "(`user_id` = `__o1`.`id`)" in sql

    def test_unique_set_predicate_rejected(self):
        body = _varint_field(1, 2) + _len_field(2, ORDERS_FOR_SUB)
        cond = _len_field(12, _len_field(3, body))
        p = plan_bytes(rel(2, filter_rel(USERS_READ, cond)))
        with pytest.raises(SubstraitUnsupported, match="EXISTS only"):
            substrait_to_sql(p)


class TestTypedDivide:
    def test_integer_divide_renders_div(self):
        expr = typed_scalar_fn(1, [field_ref(0), literal("i64", 2)], 7)  # i64
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [expr], [2])),
            extensions=extension_function(1, "divide:i64_i64"),
        )
        assert "(`id` DIV 2)" in substrait_to_sql(p)

    def test_float_divide_renders_slash(self):
        expr = typed_scalar_fn(1, [field_ref(0), literal("fp64", 2.0)], 11)
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [expr], [2])),
            extensions=extension_function(1, "divide:fp64_fp64"),
        )
        assert "(`id` / 2.0)" in substrait_to_sql(p)

    def test_untyped_divide_defaults_to_float(self):
        expr = scalar_fn(1, [field_ref(0), literal("i64", 2)])
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [expr], [2])),
            extensions=extension_function(1, "divide:i64_i64"),
        )
        assert "(`id` / 2)" in substrait_to_sql(p)


class TestDedupAliases:
    def test_suffix_probe_loops_past_existing_names(self):
        from datafusion_flight_sql_server_spark.plans.substrait import (
            _dedup_aliases,
        )

        assert _dedup_aliases(["a", "a", "a_1"]) == ["a", "a_2", "a_1"]
        assert _dedup_aliases(["a", "a_1", "a", "a"]) == [
            "a", "a_1", "a_2", "a_3",
        ]


class TestWindowSubqueryOverWire:
    def test_row_number_round_trip(self, substrait_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            users = rel(1, read_rel(["users"], ["id", "name"]))
            w = window_fn(1, sorts=((0, 2),))
            p = plan_bytes(
                rel(7, computed_project(users, [w], [0, 2])),
                ["id", "rn"],
                extensions=extension_function(1, "row_number:"),
            )
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            got = sorted(
                zip(
                    table.column("id").to_pylist(),
                    table.column("rn").to_pylist(),
                )
            )
            assert got == [(1, 1), (2, 2), (3, 3)]
        finally:
            ex.close()

    def test_in_subquery_round_trip(self, substrait_server):
        # users with an order above 60: Bob (75) and Alice (100)
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            users = rel(1, read_rel(["users"], ["id", "name"]))
            orders = rel(
                1, read_rel(["orders"], ["order_id", "user_id", "amount"])
            )
            big = rel(
                2,
                filter_rel(
                    orders, scalar_fn(1, [field_ref(2), literal("i64", 60)])
                ),
            )
            haystack = rel(7, computed_project(big, [field_ref(1)], [3]))
            cond = in_subquery([field_ref(0)], haystack)
            p = plan_bytes(
                rel(2, filter_rel(users, cond)),
                extensions=extension_function(1, "gt:any_any"),
            )
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            assert sorted(table.column("name").to_pylist()) == ["Alice", "Bob"]
        finally:
            ex.close()

    def test_minus_multiset_round_trip(self, substrait_server):
        # users EXCEPT-multiset users = empty (every row present in secondary)
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            users = rel(1, read_rel(["users"], ["id", "name"]))
            p = plan_bytes(rel(8, set_rel([users, users], 2)))
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            assert table.num_rows == 0
        finally:
            ex.close()


class TestGroupingSetsAndMultiUnion:
    def test_multi_input_union_all_translate(self):
        p = plan_bytes(rel(8, set_rel([USERS_READ, USERS_READ, USERS_READ], 6)))
        sql = substrait_to_sql(p)
        assert sql.count("UNION ALL") == 2

    def test_multi_input_minus_and_intersect_fold(self, spark):
        # EXCEPT/INTERSECT chains left-fold to the spec's multi-input
        # multiplicities; verify values, not just shape
        register_memtable(
            spark,
            "seta", [(1,), (2,), (3,), (4,)], "id INT NOT NULL",
        )
        setb = rel(1, read_rel(["setb"], ["id"]))
        setc = rel(1, read_rel(["setc"], ["id"]))
        seta = rel(1, read_rel(["seta"], ["id"]))
        register_memtable(spark, "setb", [(2,)], "id INT NOT NULL")
        register_memtable(spark, "setc", [(3,)], "id INT NOT NULL")
        p = plan_bytes(rel(8, set_rel([seta, setb, setc], 1)))
        sql = substrait_to_sql(p)
        assert sql.count("EXCEPT") == 2
        assert sorted(r[0] for r in spark.sql(sql).collect()) == [1, 4]
        p = plan_bytes(rel(8, set_rel([seta, seta, seta], 4)))
        got = sorted(r[0] for r in spark.sql(substrait_to_sql(p)).collect())
        assert got == [1, 2, 3, 4]

    def test_multi_input_presence_still_rejected(self):
        p = plan_bytes(rel(8, set_rel([USERS_READ, USERS_READ, USERS_READ], 2)))
        with pytest.raises(SubstraitUnsupported, match="3 inputs"):
            substrait_to_sql(p)

    def test_grouping_sets_round_trip(self, substrait_server):
        # users grouped by GROUPING SETS ((name), ()): 3 per-name rows with
        # set id 0 plus one grand-total row with set id 1
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            users = rel(1, read_rel(["users"], ["id", "name"]))
            body = _len_field(2, users)
            body += _len_field(3, _len_field(1, field_ref(1)))  # {name}
            body += _len_field(3, b"")  # {} — grand total
            body += _len_field(4, measure(agg_function(1, [])))  # count(*)
            p = plan_bytes(
                rel(4, body),
                ["name", "n", "set_id"],
                extensions=extension_function(1, "count:"),
            )
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            got = sorted(
                zip(
                    (v or "" for v in table.column("name").to_pylist()),
                    table.column("n").to_pylist(),
                    table.column("set_id").to_pylist(),
                )
            )
            assert got == [
                ("", 3, 1),
                ("Alice", 1, 0),
                ("Bob", 1, 0),
                ("Charlie", 1, 0),
            ]
        finally:
            ex.close()

    def test_three_way_union_round_trip(self, substrait_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            users = rel(1, read_rel(["users"], ["id", "name"]))
            p = plan_bytes(rel(8, set_rel([users, users, users], 6)))
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            assert table.num_rows == 9
        finally:
            ex.close()


# -- ConsistentPartitionWindowRel (rel arm 17) -------------------------------


def window_rel_fn(anchor: int, args: tuple = (), bounds: tuple | None = None) -> bytes:
    """WindowRelFunction body: WindowFunction fields minus partitions/sorts."""
    body = _varint_field(1, anchor)
    if bounds is not None:
        bounds_type, lower, upper = bounds
        if bounds_type:
            body += _varint_field(12, bounds_type)
        if upper is not None:
            body += _len_field(4, upper)
        if lower is not None:
            body += _len_field(5, lower)
    for a in args:
        body += _len_field(9, _len_field(3, a))
    return body


def window_rel(
    input_rel: bytes,
    fns: list[bytes],
    partitions: tuple = (),
    sorts: tuple = (),
    emit: list[int] | None = None,
) -> bytes:
    """ConsistentPartitionWindowRel: common=1, input=2, window_functions=3,
    partition_expressions=4, sorts=5."""
    body = _len_field(2, input_rel)
    for fn in fns:
        body += _len_field(3, fn)
    for p_expr in partitions:
        body += _len_field(4, p_expr)
    for col_idx, direction in sorts:
        sf = _len_field(1, field_ref(col_idx)) + _varint_field(2, direction)
        body += _len_field(5, sf)
    if emit is not None:
        emit_msg = b"".join(_varint_field(1, i) for i in emit)
        body = _len_field(1, _len_field(2, emit_msg)) + body
    return body


class TestConsistentPartitionWindowRel:
    def test_translate_shared_partition_order(self):
        p = plan_bytes(
            rel(17, window_rel(
                USERS_READ,
                [window_rel_fn(1)],
                partitions=(field_ref(1),),
                sorts=((0, 2),),
            )),
            extensions=extension_function(1, "row_number:"),
        )
        sql = substrait_to_sql(p)
        assert (
            "ROW_NUMBER() OVER (PARTITION BY `name` "
            "ORDER BY `id` ASC NULLS LAST) AS `window0`" in sql
        )
        assert sql.startswith("SELECT `id`, `name`, `window0` FROM (")

    def test_translate_frame_merges_after_order(self):
        p = plan_bytes(
            rel(17, window_rel(
                USERS_READ,
                [window_rel_fn(
                    1, args=(field_ref(0),),
                    bounds=(1, BOUND_UNBOUNDED, BOUND_CURRENT),
                )],
                sorts=((0, 2),),
            )),
            extensions=extension_function(1, "sum:i64"),
        )
        sql = substrait_to_sql(p)
        assert (
            "SUM(`id`) OVER (ORDER BY `id` ASC NULLS LAST ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND CURRENT ROW) AS `window0`" in sql
        )

    def test_rel_level_order_unset_bounds_is_partition_total(self):
        # Round-6 fix (ADVICE r5): sorts live at the REL level here, so the
        # unset-bounds partition-total default must fire off the rel's
        # ORDER BY, not the (absent) per-function sorts.
        p = plan_bytes(
            rel(17, window_rel(
                USERS_READ,
                [window_rel_fn(1, args=(field_ref(0),))],
                sorts=((0, 2),),
            )),
            extensions=extension_function(1, "sum:i64"),
        )
        assert (
            "SUM(`id`) OVER (ORDER BY `id` ASC NULLS LAST ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS `window0`"
            in substrait_to_sql(p)
        )

    def test_round_trip_rank_per_partition(self, substrait_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            orders = rel(
                1, read_rel(["orders"], ["order_id", "user_id", "amount"])
            )
            w = rel(17, window_rel(
                orders,
                [window_rel_fn(1)],
                partitions=(field_ref(1),),
                sorts=((2, 4),),  # amount DESC NULLS LAST
                emit=[0, 1, 3],
            ))
            p = plan_bytes(
                w, ["order_id", "user_id", "rk"],
                extensions=extension_function(1, "row_number:"),
            )
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            got = sorted(
                zip(
                    table.column("order_id").to_pylist(),
                    table.column("rk").to_pylist(),
                )
            )
            # user 1 has orders 100 (50) and 102 (100): 102 ranks first
            assert got == [(100, 2), (101, 1), (102, 1), (103, 1)]
        finally:
            ex.close()


class TestReviewFixes:
    def test_window_in_filter_rejected(self):
        # a window function in WHERE would render SQL Spark rejects at
        # analysis — refuse with the NOT_IMPLEMENTED contract instead
        w = window_fn(1, sorts=((0, 2),))
        cond = scalar_fn(2, [w, literal("i64", 5)])
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, cond)),
            extensions=extension_function(1, "row_number:")
            + extension_function(2, "lte:any_any"),
        )
        with pytest.raises(SubstraitUnsupported, match="projection"):
            substrait_to_sql(p)

    def test_window_above_fetch_wraps_input(self):
        # Project(window) above Fetch(2): the window must see the 2 fetched
        # rows, so the limited input renders as a derived table first
        fetched = rel(3, fetch_rel(USERS_READ, 2))
        w = window_fn(1, sorts=((0, 2),))
        p = plan_bytes(
            rel(7, computed_project(fetched, [w], [2])),
            extensions=extension_function(1, "row_number:"),
        )
        sql = substrait_to_sql(p)
        # the limit is INSIDE the derived table the window selects from,
        # not a trailing clause applied after the window
        assert "LIMIT 2) AS" in sql
        assert not sql.endswith("LIMIT 2")

    def test_unset_upper_bound_defaults_to_partition_end(self):
        # spec: an unset upper bound is the END of the partition
        w = window_fn(
            1,
            args=(field_ref(0),),
            sorts=((0, 2),),
            bounds=(1, BOUND_CURRENT, None),
        )
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [w], [2])),
            extensions=extension_function(1, "sum:i64"),
        )
        sql = substrait_to_sql(p)
        assert "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING" in sql

    def test_divide_with_options_not_misread_as_integral(self):
        # a FunctionOption in field 5 must NOT be parsed as output_type
        body = _varint_field(1, 1)
        body += _len_field(4, _len_field(3, field_ref(0)))
        body += _len_field(4, _len_field(3, literal("fp64", 2.0)))
        # options (field 5): FunctionOption{name=1, preference=2}
        body += _len_field(5, _string_field(1, "rounding") + _string_field(2, "TIE_TO_EVEN"))
        expr = _len_field(3, body)
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [expr], [2])),
            extensions=extension_function(1, "divide:fp64_fp64"),
        )
        assert "(`id` / 2.0)" in substrait_to_sql(p)


class TestClauseComposition:
    """Clause pairs the single-SELECT accumulator can't merge now finish
    the inner relation as a derived table instead of rejecting the plan
    (DataFusion's producer emits these shapes routinely)."""

    def test_filter_above_fetch(self, spark):
        p = plan_bytes(
            rel(2, filter_rel(
                rel(3, fetch_rel(rel(5, sort_rel(USERS_READ, [(0, 2)])), 3)),
                scalar_fn(1, [field_ref(0), literal("i64", 1)]),
            )),
            extensions=extension_function(1, "gt:any_any"),
        )
        sql = substrait_to_sql(p)
        assert "LIMIT 3) AS" in sql and sql.rstrip().endswith("> 1)")
        spark.range(10).selectExpr("id", "CAST(id AS STRING) AS name") \
            .createOrReplaceTempView("users")
        got = sorted(r[0] for r in spark.sql(sql).collect())
        assert got == [2]  # first 3 ids by id ASC, then id > 1

    def test_sort_above_fetch_orders_fetched_rows(self, spark):
        # top-3 by id ASC, then re-sorted DESC: must be [2,1,0], not the
        # top-3 of a DESC sort ([9,8,7])
        p = plan_bytes(
            rel(5, sort_rel(
                rel(3, fetch_rel(rel(5, sort_rel(USERS_READ, [(0, 2)])), 3)),
                [(0, 4)],
            )),
        )
        sql = substrait_to_sql(p)
        assert "LIMIT 3) AS" in sql
        spark.range(10).selectExpr("id", "CAST(id AS STRING) AS name") \
            .createOrReplaceTempView("users")
        got = [r[0] for r in spark.sql(sql).collect()]
        assert got == [2, 1, 0]

    def test_nested_fetch(self):
        p = plan_bytes(
            rel(3, fetch_rel(rel(3, fetch_rel(USERS_READ, 5)), 2)),
        )
        sql = substrait_to_sql(p)
        assert "LIMIT 5) AS" in sql and sql.rstrip().endswith("LIMIT 2")

    def test_project_above_aggregate(self, spark):
        # SUM(amount) per cust, then a computed projection over the
        # aggregate's output (total * 2)
        agg = rel(4, aggregate_rel(
            ORDERS_READ, [0], [measure(agg_function(1, [1]))],
        ))
        double = scalar_fn(2, [field_ref(1), literal("i64", 2)])
        p = plan_bytes(
            rel(7, computed_project(agg, [double], [0, 2])),
            extensions=extension_function(1, "sum:i64")
            + extension_function(2, "multiply:i64_i64"),
        )
        sql = substrait_to_sql(p)
        spark.sql(
            "SELECT * FROM VALUES ('a', 1), ('a', 2), ('b', 5) "
            "AS t(cust, amount)"
        ).createOrReplaceTempView("orders")
        got = sorted(tuple(r) for r in spark.sql(sql).collect())
        assert got == [("a", 6), ("b", 10)]

    def test_offset_without_count(self, spark):
        p = plan_bytes(rel(3, fetch_rel(
            rel(5, sort_rel(USERS_READ, [(0, 2)])),
            -1 & ((1 << 64) - 1),
            offset=4,
        )))
        sql = substrait_to_sql(p)
        assert "OFFSET 4" in sql and "LIMIT" not in sql
        spark.range(6).selectExpr("id", "CAST(id AS STRING) AS name") \
            .createOrReplaceTempView("users")
        got = sorted(r[0] for r in spark.sql(sql).collect())
        assert got == [4, 5]


class TestCorrelatedSubqueries:
    """Correlated subqueries render as alias-qualified correlated SQL
    (outer_reference steps_out resolves through the _CorrelationLevel
    chain; the enclosing FROM gets a pinned `__oN` alias only when a
    correlated reference actually used it)."""

    def test_uncorrelated_plans_keep_their_sql(self):
        # no correlation -> no alias pinning, byte-identical to before
        inner = rel(2, filter_rel(
            ORDERS_FOR_SUB,
            scalar_fn(1, [field_ref(2), literal("i64", 10)]),
        ))
        cond = exists_subquery(inner)
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, cond)),
            extensions=extension_function(1, "gt:any_any"),
        )
        sql = substrait_to_sql(p)
        assert "__o" not in sql and "FROM `users` WHERE EXISTS" in sql

    def test_correlated_exists_executes(self, spark):
        inner_cond = scalar_fn(1, [field_ref(1), outer_field_ref(0)])
        inner = rel(2, filter_rel(ORDERS_FOR_SUB, inner_cond))
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, exists_subquery(inner))),
            extensions=extension_function(1, "equal:any_any"),
        )
        sql = substrait_to_sql(p)
        spark.sql("SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'c') "
                  "AS t(id, name)").createOrReplaceTempView("users")
        spark.sql("SELECT * FROM VALUES (10, 1, 5.0), (11, 3, 7.0) "
                  "AS t(order_id, user_id, amount)"
                  ).createOrReplaceTempView("orders")
        got = sorted(r[0] for r in spark.sql(sql).collect())
        assert got == [1, 3]  # users with at least one order

    def test_self_correlated_exists_pins_alias(self, spark):
        # EXISTS over the SAME table: without the pinned alias the inner
        # scan would shadow the outer reference
        inner_cond = scalar_fn(
            1, [field_ref(0), outer_field_ref(0)]
        )  # inner.id < outer.id
        inner = rel(2, filter_rel(USERS_READ, inner_cond))
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, exists_subquery(inner))),
            extensions=extension_function(1, "lt:any_any"),
        )
        sql = substrait_to_sql(p)
        assert "AS `__o1`" in sql and "`__o1`.`id`" in sql
        spark.sql("SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'c') "
                  "AS t(id, name)").createOrReplaceTempView("users")
        got = sorted(r[0] for r in spark.sql(sql).collect())
        assert got == [2, 3]  # rows with a smaller id present

    def test_correlated_scalar_in_projection_executes(self, spark):
        # per-user order total: aggregate subquery correlated through an
        # AggregateRel(Filter(Read)) tree
        inner_cond = scalar_fn(1, [field_ref(1), outer_field_ref(0)])
        filtered = rel(2, filter_rel(ORDERS_FOR_SUB, inner_cond))
        agg = rel(4, aggregate_rel(filtered, [], [
            measure(agg_function(2, [2])),
        ]))
        sub = scalar_subquery(agg)
        p = plan_bytes(
            rel(7, computed_project(USERS_READ, [sub], [0, 2])),
            extensions=extension_function(1, "equal:any_any")
            + extension_function(2, "sum:fp64"),
        )
        sql = substrait_to_sql(p)
        spark.sql("SELECT * FROM VALUES (1, 'a'), (2, 'b') "
                  "AS t(id, name)").createOrReplaceTempView("users")
        spark.sql("SELECT * FROM VALUES (10, 1, 5.0), (11, 1, 7.0), "
                  "(12, 2, 1.0) AS t(order_id, user_id, amount)"
                  ).createOrReplaceTempView("orders")
        got = sorted(tuple(r) for r in spark.sql(sql).collect())
        assert got == [(1, 12.0), (2, 1.0)]

    def test_steps_out_beyond_depth_rejected(self):
        inner_cond = scalar_fn(1, [field_ref(1), outer_field_ref(0, 3)])
        inner = rel(2, filter_rel(ORDERS_FOR_SUB, inner_cond))
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, exists_subquery(inner))),
            extensions=extension_function(1, "equal:any_any"),
        )
        with pytest.raises(SubstraitUnsupported, match="steps_out"):
            substrait_to_sql(p)


class TestCorrelationThroughRelScopes:
    """Round-6 late: the correlation chain threads through EVERY relation
    scope — a correlated subquery whose body is a join/set/window, or
    whose outer reference sits in a ReadRel filter or join condition,
    consumes and executes (Spark 4 decorrelates all of these; verified
    empirically before this landed). Parity target: DataFusion's native
    consumer handles arbitrary outer-reference placement
    (service.rs:1018-1029)."""

    def _views(self, spark):
        spark.sql(
            "SELECT * FROM VALUES (1,'a'),(2,'b'),(3,'c') AS t(id,name)"
        ).createOrReplaceTempView("users")
        spark.sql(
            "SELECT * FROM VALUES (10,1,5.0),(11,3,7.0) "
            "AS t(order_id,user_id,amount)"
        ).createOrReplaceTempView("orders")
        spark.sql(
            "SELECT * FROM VALUES (1,2.0),(2,3.0) AS t(uid,paid)"
        ).createOrReplaceTempView("payments")

    def test_outer_ref_in_join_condition_executes(self, spark):
        # EXISTS (orders JOIN payments ON user_id = uid AND user_id = o.id)
        payments = rel(1, read_rel(["payments"], ["uid", "paid"]))
        cond = scalar_fn(3, [
            scalar_fn(1, [field_ref(1), field_ref(3)]),
            scalar_fn(1, [field_ref(1), outer_field_ref(0)]),
        ])
        body = rel(6, join_rel(ORDERS_FOR_SUB, payments, cond, 1))
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, exists_subquery(body))),
            extensions=extension_function(1, "equal:any_any")
            + extension_function(3, "and:bool"),
        )
        sql = substrait_to_sql(p)
        self._views(spark)
        got = sorted(r[0] for r in spark.sql(sql).collect())
        assert got == [1]  # only user 1's order joins to a payment

    def test_outer_ref_in_set_branches_executes(self, spark):
        # EXISTS ((orders WHERE user_id = o.id) INTERSECT
        #         (orders WHERE amount > 6.0)) — whole-row intersection
        lb = rel(2, filter_rel(
            ORDERS_FOR_SUB,
            scalar_fn(1, [field_ref(1), outer_field_ref(0)]),
        ))
        rb = rel(2, filter_rel(
            ORDERS_FOR_SUB,
            scalar_fn(2, [field_ref(2), literal("fp64", 6.0)]),
        ))
        body = rel(8, set_rel([lb, rb], 4))  # INTERSECTION_MULTISET
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, exists_subquery(body))),
            extensions=extension_function(1, "equal:any_any")
            + extension_function(2, "gt:any_any"),
        )
        sql = substrait_to_sql(p)
        self._views(spark)
        got = sorted(r[0] for r in spark.sql(sql).collect())
        assert got == [3]  # only user 3's order clears the amount bar

    def test_outer_ref_in_read_filter_executes(self, spark):
        # the shape DataFusion's optimizer emits after pushing a correlated
        # predicate into the scan: ReadRel.filter = user_id = o.id
        cond = scalar_fn(1, [field_ref(1), outer_field_ref(0)])
        pushed = rel(1, read_rel(
            ["orders"], ["order_id", "user_id", "amount"],
            extra=_len_field(3, cond),
        ))
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, exists_subquery(pushed))),
            extensions=extension_function(1, "equal:any_any"),
        )
        sql = substrait_to_sql(p)
        self._views(spark)
        got = sorted(r[0] for r in spark.sql(sql).collect())
        assert got == [1, 3]

    def test_outer_ref_below_window_body_executes(self, spark):
        # correlated filter feeding a window rel inside the subquery
        filtered = rel(2, filter_rel(
            ORDERS_FOR_SUB,
            scalar_fn(1, [field_ref(1), outer_field_ref(0)]),
        ))
        body = rel(17, window_rel(
            filtered, [window_rel_fn(2)], sorts=((0, 2),),
        ))
        p = plan_bytes(
            rel(2, filter_rel(USERS_READ, exists_subquery(body))),
            extensions=extension_function(1, "equal:any_any")
            + extension_function(2, "row_number:"),
        )
        sql = substrait_to_sql(p)
        self._views(spark)
        got = sorted(r[0] for r in spark.sql(sql).collect())
        assert got == [1, 3]

    def test_subquery_in_join_condition_correlates_left_input(self, spark):
        # Round 8: the join sides DO have stable aliases (t0/t1 derived
        # tables), so an EXISTS inside the join condition can correlate
        # against the join's own LEFT schema — steps_out=1 resolves to the
        # pre-rendered qualified column. users ⋈ orders ON id = user_id
        # AND EXISTS(payments WHERE uid = t0.id): users 1,2 have payments;
        # only users 1,3 have orders → the correlated EXISTS keeps user 1.
        users_left = rel(1, read_rel(["users"], ["id", "name"]))
        payments = rel(1, read_rel(["payments"], ["uid", "paid"]))
        nested = rel(2, filter_rel(
            payments,
            scalar_fn(1, [field_ref(0), outer_field_ref(0)]),
        ))
        cond = scalar_fn(3, [
            scalar_fn(1, [field_ref(0), field_ref(3)]),  # id = user_id
            exists_subquery(nested),
        ])
        body = rel(6, join_rel(users_left, ORDERS_FOR_SUB, cond, 1))
        p = plan_bytes(
            body,
            extensions=extension_function(1, "equal:any_any")
            + extension_function(3, "and:bool"),
        )
        sql = substrait_to_sql(p)
        assert "`t0`.`id`" in sql  # left-side correlated reference
        self._views(spark)
        rows = spark.sql(sql).collect()
        assert sorted(r["id"] for r in rows) == [1]

    def test_subquery_in_join_condition_right_ref_rejected(self):
        # Spark rejects correlated references to the join's RIGHT input
        # in join predicates at analysis — named rejection at translate
        # time instead (index 2 = first right column here)
        nested = rel(2, filter_rel(
            USERS_READ,
            scalar_fn(1, [field_ref(0), outer_field_ref(2)]),
        ))
        cond = exists_subquery(nested)
        body = rel(6, join_rel(USERS_READ, ORDERS_FOR_SUB, cond, 1))
        p = plan_bytes(
            body, extensions=extension_function(1, "equal:any_any")
        )
        with pytest.raises(SubstraitUnsupported, match="LEFT input"):
            substrait_to_sql(p)

    def test_post_join_filter_correlates_both_sides(self, spark):
        # the post filter is a WHERE over the joined rows — correlated
        # references to BOTH sides execute there (right-side index 2 =
        # orders.order_id)
        payments = rel(1, read_rel(["payments"], ["uid", "paid"]))
        users_left = rel(1, read_rel(["users"], ["id", "name"]))
        nested = rel(2, filter_rel(
            payments,
            scalar_fn(1, [field_ref(0), outer_field_ref(3)]),
        ))
        cond = scalar_fn(1, [field_ref(0), field_ref(3)])  # id = user_id
        body = rel(6, join_rel(
            users_left, ORDERS_FOR_SUB, cond, 1,
            post=exists_subquery(nested),
        ))
        p = plan_bytes(
            body, extensions=extension_function(1, "equal:any_any")
        )
        sql = substrait_to_sql(p)
        assert "`t1`.`user_id`" in sql  # right-side ref in the WHERE
        self._views(spark)
        rows = spark.sql(sql).collect()
        # join: users 1,3 have orders; post EXISTS(payments.uid=user_id)
        # keeps user 1 only (uid 3 has no payment)
        assert sorted(r["id"] for r in rows) == [1]


def virtual_table_read(col_names: list[str], rows: list[list[bytes]]) -> bytes:
    """ReadRel with VirtualTable values (Literal.Struct rows)."""
    body = _len_field(2, named_struct(col_names))
    vt = b"".join(
        _len_field(1, b"".join(_len_field(1, lit) for lit in row))
        for row in rows
    )
    body += _len_field(5, vt)
    return rel(1, body)


class TestVirtualTable:
    def test_values_read_executes(self, spark):
        def lit_bytes(kind, v):
            # raw Literal message bytes (the helper returns Expression)
            return literal(kind, v)[2:]  # strip Expression field-1 header

        r = virtual_table_read(
            ["id", "name"],
            [
                [lit_bytes("i64", 1), lit_bytes("string", "a")],
                [lit_bytes("i64", 2), lit_bytes("string", "b")],
            ],
        )
        p = plan_bytes(rel(7, project_rel(r, [0], [2])))
        sql = substrait_to_sql(p)
        assert "VALUES (1, 'a'), (2, 'b') AS `v`(`id`, `name`)" in sql
        got = sorted(row[0] for row in spark.sql(sql).collect())
        assert got == [1, 2]

    def test_expression_rows_rejected(self):
        body = _len_field(2, named_struct(["x"])) + _len_field(
            5, _len_field(2, b"")
        )
        with pytest.raises(SubstraitUnsupported, match="literal values"):
            substrait_to_sql(plan_bytes(rel(1, body)))


def mask_projection(indexes: list[int]) -> bytes:
    """ReadRel.projection (field 4): MaskExpression{select=1
    StructSelect{struct_items=1 repeated StructItem{field=1}}}."""
    items = b"".join(
        _len_field(1, _varint_field(1, i) if i else b"") for i in indexes
    )
    return _len_field(4, _len_field(1, items))


class TestReadMask:
    def test_flat_mask_narrows_output(self, spark):
        r = rel(1, read_rel(["users"], ["id", "name"], extra=mask_projection([1])))
        sql = substrait_to_sql(plan_bytes(r))
        assert sql == "SELECT `name` FROM `users`"

    def test_mask_with_filter_on_unmasked_schema(self, spark):
        cond = scalar_fn(1, [field_ref(0), literal("i64", 1)])
        body = read_rel(["users"], ["id", "name"], extra=mask_projection([1]))
        body += _len_field(3, cond)  # ReadRel.filter references BASE schema
        p = plan_bytes(
            rel(1, body), extensions=extension_function(1, "gt:any_any")
        )
        sql = substrait_to_sql(p)
        assert "SELECT `name` FROM `users` WHERE (`id` > 1)" == sql
        spark.sql("SELECT * FROM VALUES (1, 'a'), (2, 'b') AS t(id, name)"
                  ).createOrReplaceTempView("users")
        assert [r[0] for r in spark.sql(sql).collect()] == ["b"]

    def test_nested_mask_without_types_rejected(self):
        # a nested selection cannot resolve subfield names without the
        # NamedStruct.struct type tree
        items = _len_field(1, _varint_field(1, 0) + _len_field(2, b""))
        mask = _len_field(4, _len_field(1, items))
        r = rel(1, read_rel(["users"], ["id", "name"], extra=mask))
        with pytest.raises(SubstraitUnsupported, match="struct types"):
            substrait_to_sql(plan_bytes(r))

    def test_mask_index_out_of_range_malformed(self):
        r = rel(1, read_rel(["users"], ["id", "name"], extra=mask_projection([5])))
        with pytest.raises(SubstraitMalformed, match="out of range"):
            substrait_to_sql(plan_bytes(r))


def t_type(arm: int, body: bytes = b"") -> bytes:
    """Type message with a single oneof arm."""
    return _len_field(arm, body)


def t_struct(children: list[bytes]) -> bytes:
    """Type.struct (arm 25): Struct{types=1 repeated Type}."""
    return t_type(25, b"".join(_len_field(1, c) for c in children))


def t_list(elem: bytes) -> bytes:
    """Type.list (arm 27): List{type=1}."""
    return t_type(27, _len_field(1, elem))


def typed_named_struct(names: list[str], types: list[bytes]) -> bytes:
    """NamedStruct{names=1 (flat depth-first), struct=2 Type.Struct}."""
    body = b"".join(_string_field(1, n) for n in names)
    body += _len_field(2, b"".join(_len_field(1, t) for t in types))
    return body


def typed_read_rel(table: str, names: list[str], types: list[bytes],
                   extra: bytes = b"") -> bytes:
    return (
        _len_field(2, typed_named_struct(names, types))
        + _len_field(7, _string_field(1, table))
        + extra
    )


def select_struct(items: list[tuple[int, bytes | None]]) -> bytes:
    """StructSelect bytes from [(field index, child Select bytes | None)]."""
    out = b""
    for idx, child in items:
        item = _varint_field(1, idx) if idx else b""
        if child is not None:
            item += _len_field(2, child)
        out += _len_field(1, item)
    return out


def nested_mask(items: list[tuple[int, bytes | None]],
                maintain: bool = True) -> bytes:
    """ReadRel.projection with nested child selections."""
    body = _len_field(1, select_struct(items))
    if maintain:
        body += _varint_field(2, 1)
    return _len_field(4, body)


PEOPLE_NAMES = ["id", "person", "name", "age", "score"]
PEOPLE_TYPES = [
    t_type(7),  # id: i64
    t_struct([t_type(12), t_type(7)]),  # person: struct<name, age>
    t_type(7),  # score: i64
]


class TestNestedSchemaAndMask:
    """Round-6 late: typed NamedStruct schemas (names flatten depth-first
    over nested structs) and nested MaskExpression selections — the
    residual the round-5 verdict listed after partial aggregate phases."""

    def _people(self, spark):
        spark.sql(
            "SELECT * FROM VALUES "
            "(1, named_struct('name','ann','age',30), 10), "
            "(2, named_struct('name','bob','age',40), 3) "
            "AS t(id, person, score)"
        ).createOrReplaceTempView("people")

    def test_field_refs_index_top_level_columns(self, spark):
        # names = 5 flat entries but only 3 top-level columns: field_ref(2)
        # must hit `score`, not the flattened `name`
        cond = scalar_fn(1, [field_ref(2), literal("i64", 5)])
        r = rel(1, typed_read_rel(
            "people", PEOPLE_NAMES, PEOPLE_TYPES, extra=_len_field(3, cond)
        ))
        p = plan_bytes(r, extensions=extension_function(1, "gt:any_any"))
        sql = substrait_to_sql(p)
        assert "`score` > 5" in sql
        self._people(spark)
        got = [row[0] for row in spark.sql(sql).collect()]
        assert got == [1]

    def test_nested_mask_renders_named_struct(self, spark):
        # keep id and person.age only (struct wrapper maintained)
        child = _len_field(1, select_struct([(1, None)]))  # Select.struct
        r = rel(1, typed_read_rel(
            "people", PEOPLE_NAMES, PEOPLE_TYPES,
            extra=nested_mask([(0, None), (1, child)], maintain=True),
        ))
        sql = substrait_to_sql(plan_bytes(r))
        assert "NAMED_STRUCT('age', `person`.`age`) AS `person`" in sql
        self._people(spark)
        rows = spark.sql(sql).collect()
        assert [(row.id, row.person.age) for row in rows] == [(1, 30), (2, 40)]
        assert rows[0].person.asDict() == {"age": 30}

    def test_singular_selection_collapses_without_maintain(self, spark):
        child = _len_field(1, select_struct([(1, None)]))
        r = rel(1, typed_read_rel(
            "people", PEOPLE_NAMES, PEOPLE_TYPES,
            extra=nested_mask([(0, None), (1, child)], maintain=False),
        ))
        sql = substrait_to_sql(plan_bytes(r))
        assert "`person`.`age` AS `person`" in sql
        self._people(spark)
        assert [tuple(row) for row in spark.sql(sql).collect()] == [
            (1, 30), (2, 40),
        ]

    def test_multi_subfield_selection_keeps_mask_order(self, spark):
        # age before name — NAMED_STRUCT follows the mask's order
        child = _len_field(1, select_struct([(1, None), (0, None)]))
        r = rel(1, typed_read_rel(
            "people", PEOPLE_NAMES, PEOPLE_TYPES,
            extra=nested_mask([(1, child)], maintain=False),
        ))
        sql = substrait_to_sql(plan_bytes(r))
        assert (
            "NAMED_STRUCT('age', `person`.`age`, 'name', `person`.`name`)"
            in sql
        )
        self._people(spark)
        rows = spark.sql(sql).collect()
        assert rows[0].person.asDict() == {"age": 30, "name": "ann"}

    def test_list_child_selection_rejected(self):
        child = _len_field(2, b"")  # Select.list arm
        r = rel(1, typed_read_rel(
            "people", PEOPLE_NAMES, PEOPLE_TYPES,
            extra=nested_mask([(1, child)]),
        ))
        with pytest.raises(SubstraitUnsupported, match="struct selections"):
            substrait_to_sql(plan_bytes(r))

    def test_nested_mask_into_scalar_field_malformed(self):
        child = _len_field(1, select_struct([(0, None)]))
        r = rel(1, typed_read_rel(
            "people", PEOPLE_NAMES, PEOPLE_TYPES,
            extra=nested_mask([(0, child)]),  # id is not a struct
        ))
        with pytest.raises(SubstraitMalformed, match="non-struct"):
            substrait_to_sql(plan_bytes(r))

    def test_list_nested_struct_consumes_names(self):
        # tags: list<struct<k, v>> — k and v consume names but are not
        # addressable columns; field_ref(2) is `score`
        names = ["id", "tags", "k", "v", "score"]
        types = [
            t_type(7),
            t_list(t_struct([t_type(12), t_type(12)])),
            t_type(7),
        ]
        cond = scalar_fn(1, [field_ref(2), literal("i64", 5)])
        r = rel(1, typed_read_rel(
            "tagged", names, types, extra=_len_field(3, cond)
        ))
        p = plan_bytes(r, extensions=extension_function(1, "gt:any_any"))
        sql = substrait_to_sql(p)
        assert "`score` > 5" in sql and "`k`" not in sql

    def test_name_count_mismatch_malformed(self):
        r = rel(1, typed_read_rel(
            "people", ["id", "person"], PEOPLE_TYPES  # 2 names, 5 fields
        ))
        with pytest.raises(SubstraitMalformed, match="names"):
            substrait_to_sql(plan_bytes(r))

    def test_relroot_names_flatten_over_nested_output(self, spark):
        # RelRoot.names is flat depth-first like NamedStruct.names: 5 names
        # alias the 3 top-level columns; nested names must match the
        # column's subfields and are consumed, not treated as columns
        r = rel(1, typed_read_rel("people", PEOPLE_NAMES, PEOPLE_TYPES))
        sql = substrait_to_sql(plan_bytes(
            r, root_names=["pk", "who", "name", "age", "pts"]
        ))
        assert "`id` AS `pk`" in sql and "`person` AS `who`" in sql
        assert "`score` AS `pts`" in sql
        self._people(spark)
        rows = spark.sql(sql).collect()
        assert rows[0].who.name == "ann" and rows[0].pts == 10

    def test_relroot_nested_rename_rebuilds_named_struct(self, spark):
        # round 10 (VERDICT r9 #4): a nested-field rename in RelRoot.names
        # rebuilds the struct via NAMED_STRUCT instead of rejecting —
        # person.name surfaces as who.nom with values intact
        r = rel(1, typed_read_rel("people", PEOPLE_NAMES, PEOPLE_TYPES))
        sql = substrait_to_sql(plan_bytes(
            r, root_names=["pk", "who", "nom", "age", "pts"]
        ))
        assert "NAMED_STRUCT('nom', `person`.`name`, 'age'," in sql
        self._people(spark)
        rows = spark.sql(sql).collect()
        assert [(row.pk, row.who.nom, row.who.age, row.pts) for row in rows] \
            == [(1, "ann", 30, 10), (2, "bob", 40, 3)]
        # field order and nullability of the untouched sibling kept
        assert rows[0].who.asDict() == {"nom": "ann", "age": 30}

    def test_relroot_nested_rename_null_struct_stays_null(self, spark):
        spark.sql(
            "SELECT * FROM VALUES "
            "(1, named_struct('name','ann','age',30), 10), "
            "(2, CAST(NULL AS STRUCT<name: STRING, age: INT>), 3) "
            "AS t(id, person, score)"
        ).createOrReplaceTempView("people_null")
        r = rel(1, typed_read_rel("people_null", PEOPLE_NAMES, PEOPLE_TYPES))
        sql = substrait_to_sql(plan_bytes(
            r, root_names=["pk", "who", "nom", "age", "pts"]
        ))
        rows = {row.pk: row.who for row in spark.sql(sql).collect()}
        assert rows[2] is None  # NOT a fabricated struct of NULLs
        assert rows[1].nom == "ann"

    def test_relroot_nested_rename_through_mask_and_filter(self, spark):
        # rename survives the tracked pipeline: nested mask (keep the
        # struct via maintain) + filter, then rename age -> years
        child = _len_field(1, select_struct([(1, None)]))
        r = rel(1, typed_read_rel(
            "people", PEOPLE_NAMES, PEOPLE_TYPES,
            extra=nested_mask([(0, None), (1, child)], maintain=True),
        ))
        sql = substrait_to_sql(plan_bytes(
            r, root_names=["pk", "who", "years"]
        ))
        assert "NAMED_STRUCT('years'" in sql
        self._people(spark)
        assert [
            (row.pk, row.who.years) for row in spark.sql(sql).collect()
        ] == [(1, 30), (2, 40)]

    def test_relroot_rename_under_list_element_still_rejected(self):
        # k/v live under tags: list<struct<k,v>> — not field-addressable;
        # renaming them keeps a named rejection
        names = ["id", "tags", "k", "v", "score"]
        types = [
            t_type(7),
            t_list(t_struct([t_type(12), t_type(12)])),
            t_type(7),
        ]
        r = rel(1, typed_read_rel("tagged", names, types))
        with pytest.raises(SubstraitUnsupported, match="element struct"):
            substrait_to_sql(plan_bytes(
                r, root_names=["id", "tags", "k2", "v", "score"]
            ))

    def test_relroot_nested_rename_over_wire(self, spark, substrait_server):
        self._people(spark)
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            p = plan_bytes(
                rel(1, typed_read_rel("people", PEOPLE_NAMES, PEOPLE_TYPES)),
                root_names=["pk", "who", "nom", "age", "pts"],
            )
            info = ex.flight_info(_substrait_command(p))
            assert [f.name for f in info.schema] == ["pk", "who", "pts"]
            who = info.schema.field("who").type
            assert [who.field(i).name for i in range(who.num_fields)] == [
                "nom",
                "age",
            ]
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            got = sorted(
                (r["pk"], r["who"]["nom"], r["who"]["age"], r["pts"])
                for r in table.to_pylist()
            )
            assert got == [(1, "ann", 30, 10), (2, "bob", 40, 3)]
        finally:
            ex.close()

    def test_relroot_names_after_nested_mask(self, spark):
        # after masking person down to {age}, the flattened root names are
        # [top, top, age] — consumption follows the MASKED layout
        child = _len_field(1, select_struct([(1, None)]))
        r = rel(1, typed_read_rel(
            "people", PEOPLE_NAMES, PEOPLE_TYPES,
            extra=nested_mask([(0, None), (1, child)], maintain=True),
        ))
        sql = substrait_to_sql(plan_bytes(
            r, root_names=["pk", "who", "age"]
        ))
        assert "AS `pk`" in sql and "AS `who`" in sql
        self._people(spark)
        assert [
            (row.pk, row.who.age) for row in spark.sql(sql).collect()
        ] == [(1, 30), (2, 40)]

    def test_relroot_name_count_mismatch_stays_malformed(self):
        r = rel(1, typed_read_rel("people", PEOPLE_NAMES, PEOPLE_TYPES))
        # too few: exhausted mid-struct
        with pytest.raises(SubstraitMalformed, match="RelRoot"):
            substrait_to_sql(plan_bytes(r, root_names=["a", "b"]))
        # too many: excess names after consumption
        with pytest.raises(SubstraitMalformed, match="RelRoot"):
            substrait_to_sql(plan_bytes(
                r, root_names=["a", "b", "name", "age", "e", "f", "g"]
            ))


def sorted_agg_function(anchor: int, arg_indexes: list[int],
                        sep: bytes | None = None,
                        sorts: list[tuple[int, int]] = ()) -> bytes:
    """AggregateFunction with sorts (field 3) and an optional literal
    separator second argument."""
    body = _varint_field(1, anchor)
    for col, direction in sorts:
        sf = _len_field(1, field_ref(col)) + _varint_field(2, direction)
        body += _len_field(3, sf)
    for i in arg_indexes:
        body += _len_field(7, _len_field(3, field_ref(i)))
    if sep is not None:
        body += _len_field(7, _len_field(3, sep))
    return body


class TestSortedStringAgg:
    def test_listagg_within_group_executes(self, spark):
        # string_agg(name, ',') ordered by id DESC per single group
        agg = rel(4, aggregate_rel(
            USERS_READ, [],
            [measure(sorted_agg_function(
                1, [1], sep=literal("string", ","), sorts=[(0, 4)]
            ))],
        ))
        p = plan_bytes(agg, extensions=extension_function(1, "string_agg:str_str"))
        sql = substrait_to_sql(p)
        assert "LISTAGG(`name`, ',') WITHIN GROUP (ORDER BY `id` DESC NULLS LAST)" in sql
        spark.sql("SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'c') "
                  "AS t(id, name)").createOrReplaceTempView("users")
        assert spark.sql(sql).collect()[0][0] == "c,b,a"

    def test_sorts_on_other_aggregates_still_rejected(self):
        agg = rel(4, aggregate_rel(
            USERS_READ, [],
            [measure(sorted_agg_function(1, [0], sorts=[(0, 2)]))],
        ))
        p = plan_bytes(agg, extensions=extension_function(1, "sum:i64"))
        with pytest.raises(SubstraitUnsupported, match="sorted aggregate"):
            substrait_to_sql(p)

    def test_non_literal_separator_rejected(self):
        agg = rel(4, aggregate_rel(
            USERS_READ, [],
            [measure(sorted_agg_function(1, [1, 0]))],  # col as separator
        ))
        p = plan_bytes(agg, extensions=extension_function(1, "string_agg:str_str"))
        with pytest.raises(SubstraitUnsupported, match="separator"):
            substrait_to_sql(p)


# -- literal widening + IN-lists (round 5) ----------------------------------


def singular_or_list(value: bytes, options: list[bytes]) -> bytes:
    """Expression.singular_or_list (algebra.proto field 8)."""
    body = _len_field(1, value) + b"".join(_len_field(2, o) for o in options)
    return _len_field(8, body)


def multi_or_list(values: list[bytes], records: list[list[bytes]]) -> bytes:
    """Expression.multi_or_list (field 9); each record is a field list."""
    body = b"".join(_len_field(1, v) for v in values)
    for rec in records:
        body += _len_field(2, b"".join(_len_field(1, x) for x in rec))
    return _len_field(9, body)


class TestLiteralWideningTranslate:
    def _filter_sql(self, cond: bytes, exts: bytes = b"") -> str:
        return substrait_to_sql(
            plan_bytes(rel(2, filter_rel(USERS_READ, cond)), extensions=exts)
        )

    def test_singular_or_list(self):
        cond = singular_or_list(
            field_ref(0), [literal("i64", 1), literal("i64", 3)]
        )
        assert self._filter_sql(cond) == (
            "SELECT `id`, `name` FROM `users` WHERE (`id` IN (1, 3))"
        )

    def test_multi_or_list(self):
        cond = multi_or_list(
            [field_ref(0), field_ref(1)],
            [
                [literal("i64", 1), literal("string", "Alice")],
                [literal("i64", 2), literal("string", "Bob")],
            ],
        )
        assert self._filter_sql(cond) == (
            "SELECT `id`, `name` FROM `users` WHERE ((`id`, `name`) IN "
            "((1, 'Alice'), (2, 'Bob')))"
        )

    def test_multi_or_list_arity_mismatch_rejected(self):
        cond = multi_or_list(
            [field_ref(0), field_ref(1)], [[literal("i64", 1)]]
        )
        with pytest.raises(SubstraitMalformed, match="arity"):
            self._filter_sql(cond)

    def test_decimal_literal(self):
        cond = scalar_fn(
            1, [field_ref(0), literal("decimal", (1995, 6, 2))]
        )
        assert self._filter_sql(
            cond, extension_function(1, "gt:any_any")
        ) == (
            "SELECT `id`, `name` FROM `users` WHERE "
            "(`id` > CAST(19.95 AS DECIMAL(6,2)))"
        )

    def test_negative_decimal_literal(self):
        cond = scalar_fn(
            1, [field_ref(0), literal("decimal", (-1995, 6, 2))]
        )
        assert "CAST(-19.95 AS DECIMAL(6,2))" in self._filter_sql(
            cond, extension_function(1, "gt:any_any")
        )

    def test_decimal_scale_zero_and_small_value(self):
        cond = scalar_fn(1, [field_ref(0), literal("decimal", (7, 10, 0))])
        assert "CAST(7 AS DECIMAL(10,0))" in self._filter_sql(
            cond, extension_function(1, "gt:any_any")
        )
        cond = scalar_fn(1, [field_ref(0), literal("decimal", (3, 4, 3))])
        assert "CAST(0.003 AS DECIMAL(4,3))" in self._filter_sql(
            cond, extension_function(1, "gt:any_any")
        )

    def test_timestamp_literal_micros(self):
        # 2024-03-05 06:07:08.000009 UTC = 1709618828000009 micros
        cond = scalar_fn(
            1, [field_ref(0), literal("timestamp", 1709618828000009)]
        )
        assert "TIMESTAMP '2024-03-05 06:07:08.000009'" in self._filter_sql(
            cond, extension_function(1, "gt:any_any")
        )

    def test_precision_timestamp_millis(self):
        cond = scalar_fn(
            1, [field_ref(0), literal("precision_timestamp", (3, 1709618828123))]
        )
        assert "TIMESTAMP '2024-03-05 06:07:08.123000'" in self._filter_sql(
            cond, extension_function(1, "gt:any_any")
        )

    def test_precision_timestamp_nanos_rejected(self):
        cond = scalar_fn(
            1, [field_ref(0), literal("precision_timestamp", (9, 1))]
        )
        with pytest.raises(SubstraitUnsupported, match="precision"):
            self._filter_sql(cond, extension_function(1, "gt:any_any"))

    def test_binary_literal(self):
        cond = scalar_fn(1, [field_ref(1), literal("binary", b"\x01\xab")])
        assert "X'01AB'" in self._filter_sql(
            cond, extension_function(1, "equal:any_any")
        )

    def test_var_char_and_fixed_char_literals(self):
        cond = scalar_fn(
            1, [field_ref(1), literal("var_char", "bo'b")]
        )
        assert "'bo''b'" in self._filter_sql(
            cond, extension_function(1, "equal:any_any")
        )
        cond = scalar_fn(1, [field_ref(1), literal("fixed_char", "ab")])
        assert "'ab'" in self._filter_sql(
            cond, extension_function(1, "equal:any_any")
        )

    def test_typed_null_literal(self):
        p = rel(
            7,
            computed_project(
                USERS_READ, [literal("null", _len_field(12, b""))], [2]
            ),
        )
        assert substrait_to_sql(plan_bytes(p)) == (
            "SELECT `expr0` FROM (SELECT CAST(NULL AS STRING) AS `expr0` "
            "FROM `users`) AS `p`"
        )


class TestLiteralWideningOverWire:
    def test_in_list_filter_round_trip(self, substrait_server, spark):
        # earlier tests may have replaced the shared `users` temp view
        register_memtable(
            spark,
            "users",
            [(1, "Alice"), (2, "Bob"), (3, "Charlie")],
            "id INT NOT NULL, name STRING NOT NULL",
        )
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            cond = singular_or_list(
                field_ref(0), [literal("i64", 1), literal("i64", 3)]
            )
            p = plan_bytes(rel(2, filter_rel(USERS_READ, cond)))
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            assert sorted(table.column("name").to_pylist()) == [
                "Alice", "Charlie",
            ]
        finally:
            ex.close()


class TestPlainScalarFns:
    def _project_sql(self, expr: bytes, exts: bytes) -> str:
        p = rel(7, computed_project(USERS_READ, [expr], [2]))
        return substrait_to_sql(plan_bytes(p, extensions=exts))

    def test_string_functions_render(self):
        e = scalar_fn(1, [field_ref(1)])
        sql = self._project_sql(e, extension_function(1, "upper:str"))
        assert "UPPER(`name`)" in sql
        e = scalar_fn(
            1, [field_ref(1), literal("i64", 2), literal("i64", 3)]
        )
        sql = self._project_sql(e, extension_function(1, "substring:str_i64"))
        assert "SUBSTRING(`name`, 2, 3)" in sql

    def test_concat_variadic_and_math(self):
        e = scalar_fn(1, [field_ref(1), literal("string", "!"), field_ref(1)])
        sql = self._project_sql(e, extension_function(1, "concat:str"))
        assert "CONCAT(`name`, '!', `name`)" in sql
        e = scalar_fn(2, [field_ref(0), literal("i64", 2)])
        sql = substrait_to_sql(
            plan_bytes(
                rel(7, computed_project(USERS_READ, [scalar_fn(2, [field_ref(0), literal("i64", 2)])], [2])),
                extensions=extension_function(2, "power:fp64_fp64"),
            )
        )
        assert "POWER(`id`, 2)" in sql

    def test_arity_violation_is_malformed(self):
        e = scalar_fn(1, [field_ref(1)])
        with pytest.raises(SubstraitMalformed, match="arguments"):
            self._project_sql(e, extension_function(1, "power:fp64_fp64"))

    def test_unknown_function_still_named_rejection(self):
        e = scalar_fn(1, [field_ref(1)])
        with pytest.raises(SubstraitUnsupported, match="no_such_fn"):
            self._project_sql(e, extension_function(1, "no_such_fn:str"))

    def test_executes_on_spark(self, spark):
        register_memtable(
            spark,
            "users",
            [(1, "Alice"), (2, "Bob"), (3, "Charlie")],
            "id INT NOT NULL, name STRING NOT NULL",
        )
        e = scalar_fn(1, [field_ref(1)])
        sql = self._project_sql(e, extension_function(1, "upper:str"))
        got = sorted(r[0] for r in spark.sql(sql).collect())
        assert got == ["ALICE", "BOB", "CHARLIE"]


class TestAggWidening:
    def test_bool_and_median_approx_render(self, spark):
        agg = rel(4, aggregate_rel(
            USERS_READ, [],
            [measure(agg_function(1, [0])), measure(agg_function(2, [0]))],
        ))
        p = plan_bytes(
            agg,
            extensions=extension_function(1, "median:i64")
            + extension_function(2, "approx_count_distinct:any"),
        )
        sql = substrait_to_sql(p)
        assert "MEDIAN(`id`)" in sql
        assert "APPROX_COUNT_DISTINCT(`id`)" in sql
        register_memtable(
            spark,
            "users",
            [(1, "Alice"), (2, "Bob"), (3, "Charlie")],
            "id INT NOT NULL, name STRING NOT NULL",
        )
        row = spark.sql(sql).collect()[0]
        assert float(row[0]) == 2.0 and int(row[1]) == 3


# -- switch / nested-list expressions ---------------------------------------


def switch_expr(match: bytes, clauses: list[tuple[bytes, bytes]],
                els: bytes | None = None) -> bytes:
    """Expression.switch_expression (field 7 per algebra.proto — verified
    against the descriptor embedded in libarrow_substrait): match=3,
    ifs=1 (IfValue{if=1 bare Literal, then=2}), else=2. Clause keys are
    BARE Literal payloads (literal_bare), thens are Expressions."""
    body = _len_field(3, match)
    for lit_payload, then in clauses:
        body += _len_field(1, _len_field(1, lit_payload) + _len_field(2, then))
    if els is not None:
        body += _len_field(2, els)
    return _len_field(7, body)


def nested_list(values: list[bytes]) -> bytes:
    """Expression.nested (field 13) with the list arm (field 4)."""
    lst = b"".join(_len_field(1, v) for v in values)
    return _len_field(13, _len_field(4, lst))


class TestSwitchAndNested:
    def _project_sql(self, expr: bytes, exts: bytes = b"") -> str:
        p = rel(7, computed_project(USERS_READ, [expr], [2]))
        return substrait_to_sql(plan_bytes(p, extensions=exts))

    def test_switch_with_else(self, spark):
        e = switch_expr(
            field_ref(1),
            [(literal_bare("string", "Alice"), literal("i64", 1))],
            literal("i64", 0),
        )
        sql = self._project_sql(e)
        assert "(CASE `name` WHEN 'Alice' THEN 1 ELSE 0 END)" in sql
        register_memtable(
            spark,
            "users",
            [(1, "Alice"), (2, "Bob"), (3, "Charlie")],
            "id INT NOT NULL, name STRING NOT NULL",
        )
        assert sorted(r[0] for r in spark.sql(sql).collect()) == [0, 0, 1]

    def test_switch_without_else(self):
        e = switch_expr(
            field_ref(1),
            [(literal_bare("string", "Bob"), literal("i64", 7))],
        )
        assert "(CASE `name` WHEN 'Bob' THEN 7 END)" in self._project_sql(e)

    def test_nested_list_constructor(self, spark):
        e = nested_list([field_ref(0), literal("i64", 9)])
        sql = self._project_sql(e)
        assert "ARRAY(`id`, 9)" in sql

    def test_list_literal_and_empty_list(self):
        e = literal("list", [literal_bare("i64", 4), literal_bare("i64", 5)])
        assert "ARRAY(4, 5)" in self._project_sql(e)
        e = literal("empty_list", _len_field(1, _len_field(7, b"")))
        assert "CAST(ARRAY() AS ARRAY<BIGINT>)" in self._project_sql(e)

    def test_null_of_list_type(self):
        ty = _len_field(27, _len_field(1, _len_field(12, b"")))
        e = literal("null", ty)
        assert "CAST(NULL AS ARRAY<STRING>)" in self._project_sql(e)


class TestExtractAndIntervals:
    def _project_sql(self, expr: bytes, exts: bytes = b"") -> str:
        p = rel(7, computed_project(USERS_READ, [expr], [2]))
        return substrait_to_sql(plan_bytes(p, extensions=exts))

    def test_extract_component_renders(self):
        e = scalar_fn_enums(1, ["YEAR"], [field_ref(0)])
        sql = self._project_sql(e, extension_function(1, "extract:req_ts"))
        assert "CAST(EXTRACT(YEAR FROM `id`) AS BIGINT)" in sql

    def test_extract_indexing_one_accepted(self):
        e = scalar_fn_enums(1, ["DAY_OF_YEAR", "ONE"], [field_ref(0)])
        sql = self._project_sql(e, extension_function(1, "extract:req_ts"))
        assert "CAST(EXTRACT(DOY FROM `id`) AS BIGINT)" in sql

    def test_extract_indexing_zero_rejected(self):
        e = scalar_fn_enums(1, ["DAY_OF_YEAR", "ZERO"], [field_ref(0)])
        with pytest.raises(SubstraitUnsupported, match="indexing"):
            self._project_sql(e, extension_function(1, "extract:req_ts"))

    def test_extract_engine_dependent_component_rejected(self):
        e = scalar_fn_enums(1, ["ISO_WEEK"], [field_ref(0)])
        with pytest.raises(SubstraitUnsupported, match="ISO_WEEK"):
            self._project_sql(e, extension_function(1, "extract:req_ts"))

    def test_enum_arg_on_other_function_rejected(self):
        e = scalar_fn_enums(1, ["SOME_MODE"], [field_ref(0)])
        with pytest.raises(SubstraitUnsupported, match="enum"):
            self._project_sql(e, extension_function(1, "round:fp64"))

    def test_interval_year_to_month_renders(self):
        e = literal("interval_ym", (1, 2))
        assert "INTERVAL '1-2' YEAR TO MONTH" in self._project_sql(e)
        e = literal("interval_ym", (-1, -2))
        assert "INTERVAL '-1-2' YEAR TO MONTH" in self._project_sql(e)

    def test_interval_day_to_second_renders(self):
        e = literal("interval_ds", (1, 3723, None, 0))  # 1d 01:02:03
        assert (
            "INTERVAL '1 01:02:03' DAY TO SECOND" in self._project_sql(e)
        )
        e = literal("interval_ds", (0, -5, 3, -250))  # -5.25 s at millis
        assert (
            "INTERVAL '-0 00:00:05.250000' DAY TO SECOND"
            in self._project_sql(e)
        )

    def test_interval_subseconds_without_precision_malformed(self):
        e = literal("interval_ds", (0, 0, None, 7))
        with pytest.raises(SubstraitMalformed, match="precision"):
            self._project_sql(e)

    def test_extract_and_interval_execute_on_spark(self, spark):
        register_memtable(
            spark,
            "users",
            [(1, "Alice"), (2, "Bob"), (3, "Charlie")],
            "id INT NOT NULL, name STRING NOT NULL",
        )
        e = scalar_fn_enums(1, ["YEAR"], [literal("date", 19_000)])
        sql = self._project_sql(
            e,
            extension_function(1, "extract:req_date")
            + extension_function(2, "add:date_i32"),
        )
        got = {r[0] for r in spark.sql(sql).collect()}
        assert got == {2022}  # 19000 days from epoch = 2022-01-08
        # interval literal arithmetic executes: ts + INTERVAL DAY TO SECOND
        add_e = scalar_fn(
            2,
            [
                literal("timestamp", 86_400_000_000),
                literal("interval_ds", (1, 0, None, 0)),
            ],
        )
        sql = self._project_sql(
            add_e, extension_function(2, "add:ts_iday")
        )
        got = {str(r[0]) for r in spark.sql(sql).collect()}
        assert got == {"1970-01-03 00:00:00"}


class TestRound5ReviewFixes:
    def _project_sql(self, expr: bytes, exts: bytes = b"") -> str:
        p = rel(7, computed_project(USERS_READ, [expr], [2]))
        return substrait_to_sql(plan_bytes(p, extensions=exts))

    def _round_with_option(self, pref: str) -> bytes:
        body = _varint_field(1, 1)
        body += _len_field(4, _len_field(3, field_ref(0)))
        body += _len_field(
            5, _string_field(1, "rounding") + _string_field(2, pref)
        )
        return _len_field(3, body)

    def test_round_option_tie_away_consumed(self):
        sql = self._project_sql(
            self._round_with_option("TIE_AWAY_FROM_ZERO"),
            extension_function(1, "round:fp64"),
        )
        assert "ROUND(`id`)" in sql

    def test_round_option_tie_to_even_rejected(self):
        # Spark ROUND is HALF_UP; silently rendering a TIE_TO_EVEN pin
        # would return wrong VALUES at .5 — reject by name instead
        with pytest.raises(SubstraitUnsupported, match="rounding"):
            self._project_sql(
                self._round_with_option("TIE_TO_EVEN"),
                extension_function(1, "round:fp64"),
            )

    def test_least_propagates_nulls(self, spark):
        # substrait least/greatest are the NULL-PROPAGATING variants;
        # Spark's LEAST skips nulls, so the render wraps a null gate
        e = scalar_fn(1, [field_ref(0), literal("i64", 5)])
        sql = self._project_sql(e, extension_function(1, "least:any_any"))
        assert "CASE WHEN" in sql and "IS NULL" in sql and "LEAST" in sql
        register_memtable(
            spark, "users", [(None, "a"), (7, "b")], "id INT, name STRING"
        )
        got = sorted(
            (r[0] is None) for r in spark.sql(sql).collect()
        )
        assert got == [False, True]  # NULL row stays NULL, 7 -> 5

    def test_least_skip_null_is_plain(self):
        e = scalar_fn(1, [field_ref(0), literal("i64", 5)])
        sql = self._project_sql(
            e, extension_function(1, "least_skip_null:any_any")
        )
        assert "LEAST(`id`, 5)" in sql and "CASE WHEN" not in sql

    def test_offset_only_fetch_survives_window_rel(self):
        # an accumulated standalone OFFSET below a
        # ConsistentPartitionWindowRel must wrap into the derived table,
        # not silently vanish (round-5 review bug)
        fetched = rel(3, fetch_rel(USERS_READ, (1 << 64) - 1, offset=5))
        w = window_rel(fetched, [window_rel_fn(1)], sorts=((0, 2),))
        p = plan_bytes(
            rel(17, w), extensions=extension_function(1, "row_number:")
        )
        sql = substrait_to_sql(p)
        assert "OFFSET 5" in sql
        assert "OFFSET 5) AS" in sql  # inside the wrapped input

    def test_correlated_exists_over_values_read(self, spark):
        # pinning the correlation alias on a VALUES relation must wrap it
        # in a derived table — a second trailing AS is a parse error
        def lit_bytes(kind, v):
            return literal(kind, v)[2:]

        vt = virtual_table_read(
            ["id", "name"],
            [
                [lit_bytes("i64", 1), lit_bytes("string", "Alice")],
                [lit_bytes("i64", 9), lit_bytes("string", "Nobody")],
            ],
        )
        inner = rel(
            2,
            filter_rel(
                USERS_READ, scalar_fn(1, [field_ref(0), outer_field_ref(0)])
            ),
        )
        cond = exists_subquery(inner)
        p = plan_bytes(
            rel(2, filter_rel(vt, cond)),
            extensions=extension_function(1, "equal:any_any"),
        )
        sql = substrait_to_sql(p)
        register_memtable(
            spark,
            "users",
            [(1, "Alice"), (2, "Bob")],
            "id INT NOT NULL, name STRING NOT NULL",
        )
        got = [r[0] for r in spark.sql(sql).collect()]
        assert got == [1]  # only the VALUES row with a users match


def nested_struct(values: list[bytes]) -> bytes:
    """Expression.nested (field 13) with the struct arm (field 3)."""
    st = b"".join(_len_field(1, v) for v in values)
    return _len_field(13, _len_field(3, st))


def nested_map(pairs: list[tuple[bytes, bytes]]) -> bytes:
    """Expression.nested (field 13) with the map arm (field 5)."""
    body = b"".join(
        _len_field(1, _len_field(1, k) + _len_field(2, v)) for k, v in pairs
    )
    return _len_field(13, _len_field(5, body))


class TestNestedStructMap:
    def _project_sql(self, expr: bytes, exts: bytes = b"") -> str:
        p = rel(7, computed_project(USERS_READ, [expr], [2]))
        return substrait_to_sql(plan_bytes(p, extensions=exts))

    def test_struct_constructor_renders_and_executes(self, spark):
        e = nested_struct([field_ref(0), literal("string", "x")])
        sql = self._project_sql(e)
        assert "STRUCT(`id`, 'x')" in sql
        register_memtable(
            spark, "users", [(1, "Alice")], "id INT NOT NULL, name STRING NOT NULL"
        )
        row = spark.sql(sql).collect()[0][0]
        assert (row[0], row[1]) == (1, "x")

    def test_map_constructor_renders_and_executes(self, spark):
        e = nested_map(
            [
                (literal("string", "a"), field_ref(0)),
                (literal("string", "b"), literal("i64", 9)),
            ]
        )
        sql = self._project_sql(e)
        assert "MAP('a', `id`, 'b', 9)" in sql
        register_memtable(
            spark, "users", [(1, "Alice")], "id INT NOT NULL, name STRING NOT NULL"
        )
        m = spark.sql(sql).collect()[0][0]
        assert m == {"a": 1, "b": 9}

    def test_empty_struct_malformed(self):
        with pytest.raises(SubstraitMalformed, match="struct"):
            self._project_sql(_len_field(13, _len_field(3, b"")))

    def test_empty_map_rejected_by_name(self):
        with pytest.raises(SubstraitUnsupported, match="map"):
            self._project_sql(_len_field(13, _len_field(5, b"")))


class TestConsumerFuzz:
    def test_random_bytes_raise_only_typed_errors(self):
        # total-function contract: arbitrary bytes must produce
        # SubstraitMalformed / SubstraitUnsupported (mapped to clean Flight
        # errors), never an uncaught UnicodeDecodeError / struct.error /
        # IndexError from deep inside the decoder
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st_

        @given(st_.binary(max_size=300))
        @settings(
            max_examples=300,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        def run(data):
            try:
                substrait_to_sql(data)
            except (SubstraitMalformed, SubstraitUnsupported):
                pass

        run()

    def test_mutated_real_plan_bytes_raise_only_typed_errors(self):
        # bit-flip VALID plans of several shapes at every byte offset —
        # mutations reach deep decoder paths plain random bytes rarely
        # touch (this corpus found the scalar-where-message and the
        # int()-of-bytes crashes)
        w = window_fn(1, sorts=((0, 2),))
        corpus = [
            plan_bytes(
                rel(7, computed_project(USERS_READ, [w], [2])),
                extensions=extension_function(1, "row_number:"),
            ),
            plan_bytes(
                rel(4, aggregate_rel(
                    USERS_READ, [0], [measure(agg_function(1, [0]))]
                )),
                extensions=extension_function(1, "sum:i64"),
            ),
            plan_bytes(
                rel(2, filter_rel(
                    USERS_READ,
                    singular_or_list(
                        field_ref(0),
                        [literal("decimal", (12345, 10, 2)),
                         literal("interval_ds", (1, 2, 3, 4)),
                         literal("var_char", "héllo")],
                    ),
                )),
            ),
            plan_bytes(
                rel(7, computed_project(
                    USERS_READ,
                    [scalar_fn_enums(1, ["YEAR"], [literal("date", 19000)])],
                    [2],
                )),
                extensions=extension_function(1, "extract:req_date"),
            ),
            # round-6 late: typed nested schema + nested mask selection —
            # mutations reach _schema_tree / _mask_parts decode paths
            plan_bytes(rel(1, typed_read_rel(
                "people", PEOPLE_NAMES, PEOPLE_TYPES,
                extra=nested_mask(
                    [(0, None),
                     (1, _len_field(1, select_struct([(1, None)])))],
                    maintain=False,
                ),
            ))),
            # round-6 late: correlated EXISTS over a join body — mutations
            # reach the outer-reference threading through join scopes
            plan_bytes(
                rel(2, filter_rel(USERS_READ, exists_subquery(
                    rel(6, join_rel(
                        ORDERS_FOR_SUB, USERS_READ,
                        scalar_fn(1, [field_ref(1), outer_field_ref(0)]),
                        1,
                    )),
                ))),
                extensions=extension_function(1, "equal:any_any"),
            ),
            # round 8: struct-state phase-split pair — mutations reach
            # _render_phase_split and the phase/invocation decode
            plan_bytes(
                rel(4, aggregate_rel(
                    rel(4, aggregate_rel(
                        ORDERS_READ, [0],
                        [
                            measure(agg_function(1, [1], phase=1)),
                            measure(
                                agg_function(2, [1], invocation=2, phase=1)
                            ),
                        ],
                    )),
                    [0],
                    [
                        measure(agg_function(1, [1], phase=4)),
                        measure(agg_function(2, [2], invocation=2, phase=4)),
                    ],
                )),
                extensions=extension_function(1, "avg:fp64")
                + extension_function(2, "count:"),
            ),
            # round 8: extension_table read — mutations reach the Any
            # type_url/value decode (no handler registered, so the valid
            # plan itself raises Unsupported — exactly the contract)
            plan_bytes(
                extension_table_read(
                    ["a", "b"], "type.example.com/T", b"\x08\x01"
                )
            ),
        ]
        # XOR 0xFF flips whole bytes; XOR 0x02 flips LEN<->VARINT wire
        # types on key bytes (0x08^0x02=0x0A), reaching the
        # scalar-where-bytes / bytes-where-scalar decode paths a full-byte
        # flip cannot (round-5 second review found exactly those holes)
        for p in corpus:
            for mask in (0xFF, 0x02, 0x07):
                for i in range(len(p)):
                    mutated = (
                        bytes(p[:i]) + bytes([p[i] ^ mask]) + bytes(p[i + 1:])
                    )
                    try:
                        substrait_to_sql(mutated)
                    except (SubstraitMalformed, SubstraitUnsupported):
                        pass


def local_files_read(
    col_names: list[str],
    uris: list[str],
    fmt_field: int = 9,
    split: bytes = b"",
) -> bytes:
    """ReadRel with LocalFiles items (uri_file arm, empty format options)."""
    body = _len_field(2, named_struct(col_names))
    items = b""
    for u in uris:
        item = _string_field(3, u) + _len_field(fmt_field, b"") + split
        items += _len_field(1, item)
    body += _len_field(6, items)
    return rel(1, body)


from tests.conftest import SF_SMALL as _SF_SMALL

REGION_PARQUET = f"{_SF_SMALL}/region.parquet"


class TestLocalFiles:
    def test_single_parquet_file_translates_and_executes(self, spark):
        r = local_files_read(["r_regionkey", "r_name"], [REGION_PARQUET])
        sql = substrait_to_sql(plan_bytes(r))
        assert f"FROM parquet.`{REGION_PARQUET}`" in sql
        rows = spark.sql(sql).collect()
        assert len(rows) == 5 and {"r_regionkey", "r_name"} == set(
            rows[0].asDict()
        )

    def test_multiple_files_union_all_by_declared_schema(self, spark):
        r = local_files_read(
            ["r_regionkey"], [REGION_PARQUET, REGION_PARQUET]
        )
        sql = substrait_to_sql(plan_bytes(r))
        assert "UNION ALL" in sql
        assert spark.sql(sql).count() == 10

    def test_byte_range_split_rejected(self):
        r = local_files_read(
            ["r_regionkey"], [REGION_PARQUET], split=_varint_field(7, 100)
        )
        with pytest.raises(SubstraitUnsupported, match="byte-range"):
            substrait_to_sql(plan_bytes(r))

    def _split_items(self, uri: str, ranges: list[tuple[int, int]]) -> bytes:
        items = b""
        for start, length in ranges:
            item = (
                _string_field(3, uri)
                + _len_field(9, b"")
                + _varint_field(7, start)
                + _varint_field(8, length)
            )
            items += _len_field(1, item)
        return rel(1, _len_field(2, named_struct(["r_regionkey"]))
                   + _len_field(6, items))

    def test_whole_file_split_coverage_merges_and_executes(self, spark):
        # a distributed producer's per-task splits tile the file exactly:
        # they ARE one whole-file read (round-6 late; relations are
        # unordered so per-split emission order is irrelevant)
        import os

        size = os.path.getsize(REGION_PARQUET)
        cut = size // 2
        r = self._split_items(
            REGION_PARQUET, [(cut, size - cut), (0, cut)]  # out of order
        )
        sql = substrait_to_sql(plan_bytes(r))
        assert f"FROM parquet.`{REGION_PARQUET}`" in sql
        assert "UNION ALL" not in sql  # merged, not double-read
        assert spark.sql(sql).count() == 5

    def test_partial_split_coverage_rejected(self):
        import os

        size = os.path.getsize(REGION_PARQUET)
        r = self._split_items(REGION_PARQUET, [(0, size - 1)])
        with pytest.raises(SubstraitUnsupported, match="cover"):
            substrait_to_sql(plan_bytes(r))

    def test_overlapping_splits_rejected(self):
        import os

        size = os.path.getsize(REGION_PARQUET)
        r = self._split_items(REGION_PARQUET, [(0, size), (0, size)])
        with pytest.raises(SubstraitUnsupported, match="tile"):
            substrait_to_sql(plan_bytes(r))

    def test_ranged_remote_uri_rejected(self):
        r = self._split_items("s3://bucket/x.parquet", [(0, 10)])
        with pytest.raises(SubstraitUnsupported, match="stat-able"):
            substrait_to_sql(plan_bytes(r))

    def test_unsupported_format_rejected(self):
        r = local_files_read(["r_regionkey"], [REGION_PARQUET], fmt_field=10)
        with pytest.raises(SubstraitUnsupported, match="format"):
            substrait_to_sql(plan_bytes(r))

    def test_missing_schema_rejected(self):
        r = local_files_read([], [REGION_PARQUET])
        with pytest.raises(SubstraitUnsupported, match="base schema"):
            substrait_to_sql(plan_bytes(r))

    def test_backtick_path_malformed(self):
        r = local_files_read(["a"], ["/tmp/evil`.parquet"])
        with pytest.raises(SubstraitMalformed, match="backtick"):
            substrait_to_sql(plan_bytes(r))

    def test_allowlist_roots_enforced(self):
        # Round-6 hardening (ADVICE r5 low): local_files is an arbitrary-
        # read primitive; a roots tuple restricts it, None (library
        # default) leaves it open, () denies everything.
        r = plan_bytes(local_files_read(["r_regionkey"], [REGION_PARQUET]))
        assert "FROM parquet." in substrait_to_sql(r)  # None = unrestricted
        with pytest.raises(SubstraitUnsupported, match="allowlist"):
            substrait_to_sql(r, local_files_roots=())
        assert "FROM parquet." in substrait_to_sql(
            r, local_files_roots=(_SF_SMALL,)
        )
        with pytest.raises(SubstraitUnsupported, match="allowlist"):
            substrait_to_sql(r, local_files_roots=("/somewhere/else",))
        # prefix must end on a path boundary: /root/testdata/sf0.001-evil
        # must not match the /root/testdata/sf0.001 root
        evil_sibling = plan_bytes(
            local_files_read(["a"], [f"{_SF_SMALL}-evil/x.parquet"])
        )
        with pytest.raises(SubstraitUnsupported, match="allowlist"):
            substrait_to_sql(evil_sibling, local_files_roots=(_SF_SMALL,))
        # .. segments cannot escape an allowed root
        dotdot = plan_bytes(
            local_files_read(["a"], [f"{_SF_SMALL}/../../etc/passwd"])
        )
        with pytest.raises(SubstraitUnsupported, match="allowlist"):
            substrait_to_sql(dotdot, local_files_roots=(_SF_SMALL,))
        # file:// scheme resolves against the same roots
        scheme = plan_bytes(
            local_files_read(["r_regionkey"], [f"file://{REGION_PARQUET}"])
        )
        assert "FROM parquet." in substrait_to_sql(
            scheme, local_files_roots=(_SF_SMALL,)
        )
        # Hadoop Path.toString emits the single-slash file:/x form — it
        # must resolve against the same roots (r6 review fix)
        single = plan_bytes(
            local_files_read(["r_regionkey"], [f"file:{REGION_PARQUET}"])
        )
        assert "FROM parquet." in substrait_to_sql(
            single, local_files_roots=(_SF_SMALL,)
        )
        # a configured root of "/" is the explicit allow-all opt-in, not a
        # silent deny (r6 review fix); an empty-string root stays inert
        assert "FROM parquet." in substrait_to_sql(
            r, local_files_roots=("/",)
        )
        with pytest.raises(SubstraitUnsupported, match="allowlist"):
            substrait_to_sql(r, local_files_roots=("",))

    def test_allowlist_symlink_escape_rejected(self, tmp_path):
        # Round-8 hardening (VERDICT r7 #7): the prefix compare runs on
        # realpath-canonicalized paths, so a symlink planted under an
        # allowed root cannot read outside it.
        import shutil

        root = tmp_path / "allowed"
        root.mkdir()
        shutil.copy(REGION_PARQUET, root / "region.parquet")
        outside = tmp_path / "outside"
        outside.mkdir()
        shutil.copy(REGION_PARQUET, outside / "secret.parquet")
        (root / "link").symlink_to(outside)
        escape = plan_bytes(
            local_files_read(["a"], [f"{root}/link/secret.parquet"])
        )
        with pytest.raises(SubstraitUnsupported, match="allowlist"):
            substrait_to_sql(escape, local_files_roots=(str(root),))
        # a genuine file under the root still resolves
        fine = plan_bytes(
            local_files_read(["r_regionkey"], [f"{root}/region.parquet"])
        )
        assert "FROM parquet." in substrait_to_sql(
            fine, local_files_roots=(str(root),)
        )
        # and a symlinked ROOT allows files reached through its real path
        # (both sides canonicalize)
        alias = tmp_path / "alias"
        alias.symlink_to(root)
        assert "FROM parquet." in substrait_to_sql(
            fine, local_files_roots=(str(alias),)
        )

    def test_allowlist_renders_canonical_path(self, tmp_path):
        # TOCTOU closure (ADVICE r8 medium): the allowlist checks the
        # realpath at translate time but the stateless ticket executes at
        # DoGet — so the SQL must read the CANONICAL path, not the
        # original symlink, or the link could be retargeted outside the
        # root between check and execution.
        import shutil

        root = tmp_path / "allowed"
        root.mkdir()
        shutil.copy(REGION_PARQUET, root / "real.parquet")
        (root / "inlink.parquet").symlink_to(root / "real.parquet")
        via_link = plan_bytes(
            local_files_read(["r_regionkey"], [f"{root}/inlink.parquet"])
        )
        sql = substrait_to_sql(via_link, local_files_roots=(str(root),))
        real = os.path.realpath(f"{root}/real.parquet")
        assert f"FROM parquet.`{real}`" in sql
        assert "inlink" not in sql
        # unrestricted library use (roots=None) keeps the caller's path
        sql_lib = substrait_to_sql(via_link)
        assert "inlink.parquet" in sql_lib

    def test_allowlist_remote_authority_rejected(self):
        # file://host/x names ANOTHER machine's filesystem — no local root
        # can meaningfully allow it; only the localhost authority (and the
        # no-authority forms) resolve
        remote = plan_bytes(
            local_files_read(["a"], [f"file://evil-host{REGION_PARQUET}"])
        )
        with pytest.raises(SubstraitUnsupported, match="allowlist"):
            substrait_to_sql(remote, local_files_roots=(_SF_SMALL,))
        with pytest.raises(SubstraitUnsupported, match="allowlist"):
            substrait_to_sql(remote, local_files_roots=("/",))
        localhost = plan_bytes(
            local_files_read(
                ["r_regionkey"], [f"file://localhost{REGION_PARQUET}"]
            )
        )
        assert "FROM parquet." in substrait_to_sql(
            localhost, local_files_roots=(_SF_SMALL,)
        )

    def test_server_denies_local_files_by_default(self, substrait_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            p = plan_bytes(
                local_files_read(["r_regionkey", "r_name"], [REGION_PARQUET])
            )
            with pytest.raises(NotImplementedError, match="allowlist"):
                ex.flight_info(_substrait_command(p))
            assert ex.execute("SELECT 1 AS x").num_rows == 1  # server alive
        finally:
            ex.close()

    def test_orc_file_executes(self, spark):
        # the orc leg of the format map, over a real ORC rewrite of region
        import glob
        import tempfile
        from pathlib import Path

        out = str(Path(tempfile.gettempdir()) / "sgraft_lf_orc_region")
        spark.read.parquet(REGION_PARQUET).coalesce(1).write.mode(
            "overwrite"
        ).orc(out)
        orc_file = glob.glob(f"{out}/part-*.orc")[0]
        r = local_files_read(["r_regionkey", "r_name"], [orc_file], fmt_field=11)
        sql = substrait_to_sql(plan_bytes(r))
        assert f"FROM orc.`{orc_file}`" in sql
        assert spark.sql(sql).count() == 5



class TestWireTypeConfusion:
    """Round-5 second-review repros: wrong-wire-type fields must reject as
    SubstraitMalformed — int(b"123") would silently ASCII-parse a
    length-delimited payload into a fabricated number."""

    def test_bytes_field_index_rejected(self):
        # FieldReference whose StructField.field is length-delimited b"1"
        bad_ref = _len_field(  # Expression.selection
            2,
            _len_field(  # FieldReference.direct_reference
                1,
                _len_field(  # ReferenceSegment.struct_field
                    2, _string_field(1, "1")  # StructField.field as BYTES
                ),
            ),
        )
        cond = scalar_fn(1, [bad_ref, literal("i64", 5)])
        q = plan_bytes(
            rel(2, filter_rel(USERS_READ, cond)),
            extensions=extension_function(1, "gt:any_any"),
        )
        with pytest.raises(SubstraitMalformed, match="varint"):
            substrait_to_sql(q)

    def test_bytes_precision_timestamp_value_rejected(self):
        # PrecisionTimestamp.value encoded length-delimited b"123" must not
        # become TIMESTAMP ...123000
        body = _varint_field(1, 6) + _string_field(2, "123")
        e = _len_field(1, _len_field(34, body))
        p = plan_bytes(rel(7, computed_project(USERS_READ, [e], [2])))
        with pytest.raises(SubstraitMalformed, match="varint"):
            substrait_to_sql(p)

    def test_varint_schema_names_rejected(self):
        # NamedStruct.names as wire-type varint must reject, not crash
        schema = _varint_field(1, 5)
        body = _len_field(2, schema) + _len_field(
            7, _string_field(1, "users")
        )
        with pytest.raises(SubstraitMalformed, match="wire type"):
            substrait_to_sql(plan_bytes(rel(1, body)))

    def test_truncated_packed_grouping_refs_rejected(self):
        # packed expression_references with a dangling continuation byte
        grouping = _len_field(2, b"\x85")  # Grouping.expression_references
        body = _len_field(2, USERS_READ) + _len_field(
            3, _len_field(1, field_ref(0)) + grouping
        )
        with pytest.raises((SubstraitMalformed, SubstraitUnsupported)):
            substrait_to_sql(plan_bytes(rel(4, body)))

    def test_value_fabricating_literal_arms_rejected(self):
        def project(expr_payload: bytes) -> bytes:
            e = _len_field(1, expr_payload)  # Expression.literal
            return plan_bytes(rel(7, computed_project(USERS_READ, [e], [2])))

        # boolean encoded length-delimited: bool(b"\x00") is True
        with pytest.raises(SubstraitMalformed, match="wire type"):
            substrait_to_sql(project(_len_field(1, b"\x00")))
        # string encoded as varint: str(53) would fabricate '53'
        with pytest.raises(SubstraitMalformed, match="wire type"):
            substrait_to_sql(project(_varint_field(12, 53)))
        # binary encoded as varint: would fabricate X''
        with pytest.raises(SubstraitMalformed, match="wire type"):
            substrait_to_sql(project(_varint_field(13, 7)))
        # precision_timestamp with EMPTY length-delimited value: the
        # `or 0` default must not fabricate the epoch
        body = _varint_field(1, 6) + _len_field(2, b"")
        with pytest.raises(SubstraitMalformed, match="varint"):
            substrait_to_sql(project(_len_field(34, body)))

    def test_extension_anchor_and_name_wire_types_rejected(self):
        # anchor as bytes b"123" must not ASCII-parse to anchor 123
        ext = _len_field(2, _len_field(3, _string_field(2, "123") + _string_field(3, "gt:any_any")))
        cond = scalar_fn(123, [field_ref(0), literal("i64", 5)])
        p = plan_bytes(rel(2, filter_rel(USERS_READ, cond)), extensions=ext)
        with pytest.raises(SubstraitMalformed, match="varint"):
            substrait_to_sql(p)
        # name as varint must not leak AttributeError
        ext = _len_field(
            2, _len_field(3, _varint_field(2, 1) + _varint_field(3, 9))
        )
        p = plan_bytes(rel(2, filter_rel(USERS_READ, cond)), extensions=ext)
        with pytest.raises(SubstraitMalformed, match="wire type"):
            substrait_to_sql(p)

    def test_packed_field_fixed_wire_type_rejected(self):
        # emit output_mapping entry with a fixed32 wire type must reject,
        # not silently decode as an empty mapping
        emit_msg = encode_varint((1 << 3) | 5) + b"\x01\x00\x00\x00"
        body = _len_field(1, _len_field(2, emit_msg)) + _len_field(
            2, USERS_READ
        ) + _len_field(3, field_ref(0))
        with pytest.raises(SubstraitMalformed, match="wire type"):
            substrait_to_sql(plan_bytes(rel(7, body)))


# -- extension_table (round 8): embedder-registered resolvers -----------------


def extension_table_read(col_names: list[str], type_url: str, value: bytes) -> bytes:
    """ReadRel with an extension_table read type (field 8): detail is a
    google.protobuf.Any{type_url=1, value=2}."""
    any_msg = _string_field(1, type_url) + _len_field(2, value)
    body = _len_field(2, named_struct(col_names)) + _len_field(
        8, _len_field(1, any_msg)
    )
    return rel(1, body)


class TestExtensionTable:
    """The reference reaches extension tables through DataFusion
    TableProviders its embedder registered (service.rs:1018-1029 delegates
    to the native consumer). Spark analogue: per-type_url resolvers map
    the opaque Any payload to a FROM-able SQL fragment; no resolver = the
    named rejection (and the Flight server's default)."""

    URL = "type.example.com/RegionTable"

    def test_rejected_without_handler(self):
        r = extension_table_read(["r_regionkey"], self.URL, b"x")
        with pytest.raises(SubstraitUnsupported, match="no registered resolver"):
            substrait_to_sql(plan_bytes(r))
        with pytest.raises(SubstraitUnsupported, match="no registered resolver"):
            substrait_to_sql(
                plan_bytes(r),
                extension_table_handlers={"type.example.com/Other": lambda *a: "t"},
            )

    def test_resolver_translates_and_executes(self, spark):
        seen = {}

        def resolver(url, value, cols):
            seen["args"] = (url, bytes(value), list(cols))
            return f"parquet.`{REGION_PARQUET}`"

        r = extension_table_read(
            ["r_regionkey", "r_name"], self.URL, b"\x01\x02"
        )
        sql = substrait_to_sql(
            plan_bytes(r), extension_table_handlers={self.URL: resolver}
        )
        assert f"FROM parquet.`{REGION_PARQUET}`" in sql
        assert seen["args"] == (self.URL, b"\x01\x02", ["r_regionkey", "r_name"])
        out = spark.sql(sql)
        # declared schema binds BY NAME: two columns, five regions
        assert out.columns == ["r_regionkey", "r_name"]
        assert out.count() == 5

    def test_declared_schema_narrows_wider_relation(self, spark):
        # the resolved relation has 3 columns; the declared base schema
        # picks two by NAME, so downstream field refs index correctly
        r = extension_table_read(["r_name", "r_regionkey"], self.URL, b"")
        sql = substrait_to_sql(
            plan_bytes(rel(3, fetch_rel(r, 2))),
            extension_table_handlers={
                self.URL: lambda u, v, c: f"parquet.`{REGION_PARQUET}`"
            },
        )
        out = spark.sql(sql)
        assert out.columns == ["r_name", "r_regionkey"]
        assert out.count() == 2

    def test_bad_resolver_return_is_malformed(self):
        r = extension_table_read(["a"], self.URL, b"")
        with pytest.raises(SubstraitMalformed, match="FROM-able"):
            substrait_to_sql(
                plan_bytes(r),
                extension_table_handlers={self.URL: lambda *a: None},
            )

    def test_missing_base_schema_rejected(self):
        any_msg = _string_field(1, self.URL) + _len_field(2, b"")
        body = _len_field(8, _len_field(1, any_msg))  # no base_schema
        with pytest.raises(SubstraitUnsupported, match="base schema"):
            substrait_to_sql(
                plan_bytes(rel(1, body)),
                extension_table_handlers={self.URL: lambda *a: "t"},
            )

    def test_over_wire_with_server_config(self, spark):
        # a dedicated server whose config registers the resolver — the
        # full GetFlightInfo(substrait) -> DoGet path resolves the
        # extension table
        srv = FlightSqlServer(
            Engine(spark),
            location="grpc://0.0.0.0:0",
            config=FlightSqlServiceConfig(
                substrait_extension_tables={
                    self.URL: lambda u, v, c: f"parquet.`{REGION_PARQUET}`"
                }
            ),
        )
        threading.Thread(target=srv.serve, daemon=True).start()
        ex = FlightSQLExecutor(f"grpc://localhost:{srv.port}")
        try:
            p = plan_bytes(
                extension_table_read(["r_regionkey", "r_name"], self.URL, b"")
            )
            info = ex.flight_info(_substrait_command(p))
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            assert table.num_rows == 5
            assert table.schema.names == ["r_regionkey", "r_name"]
        finally:
            ex.close()
            srv.shutdown()

    def test_default_server_still_rejects(self, substrait_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{substrait_server.port}")
        try:
            p = plan_bytes(extension_table_read(["a"], self.URL, b""))
            with pytest.raises(NotImplementedError, match="resolver"):
                ex.flight_info(_substrait_command(p))
        finally:
            ex.close()
