"""Flight SQL server integration tests — over real TCP.

Ports every scenario of the reference's integration suite
(reference: datafusion-flight-sql-server/tests/integration_test.rs:77-328)
plus the schema-metadata config scenarios
(tests/schema_metadata_test.rs:80-179) and the bearer-auth example's
accept/reject pair (examples/bearer_auth_flight_sql.rs:137-238), using this
repo's own Flight SQL client as the FlightSqlServiceClient analogue.

Fixtures mirror integration_test.rs:17-58: users(id,name) ×3 and
orders(order_id,user_id,amount) ×4 as registered in-memory tables.
"""

from __future__ import annotations

import threading

import pandas as pd
import pyarrow as pa
import pyarrow.flight as fl
import pytest

from datafusion_flight_sql_server_spark.client import FlightSQLExecutor
from datafusion_flight_sql_server_spark.engine.core import Engine
from datafusion_flight_sql_server_spark.engine.registry import register_memtable
from datafusion_flight_sql_server_spark.server import (
    BearerAuthMiddlewareFactory,
    FlightSqlServer,
    FlightSqlServiceConfig,
)


def _register_fixtures(spark):
    # integration_test.rs:17-58 fixtures
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


@pytest.fixture(scope="module")
def server(spark):
    _register_fixtures(spark)
    engine = Engine(spark)
    srv = FlightSqlServer(engine, location="grpc://0.0.0.0:0")
    thread = threading.Thread(target=srv.serve, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def client(server):
    ex = FlightSQLExecutor(f"grpc://localhost:{server.port}")
    yield ex
    ex.close()


class TestIntegration:
    def test_basic_query_execution(self, client):
        # integration_test.rs:77-114: SELECT * FROM users → 2 cols, 3 rows
        table = client.execute("SELECT * FROM users")
        assert table.num_columns == 2
        assert table.schema.field(0).name == "id"
        assert table.schema.field(1).name == "name"
        assert table.num_rows == 3

    def test_query_with_filter(self, client):
        # integration_test.rs:116-146: WHERE id > 1 → 2 rows
        table = client.execute("SELECT * FROM users WHERE id > 1")
        assert table.num_rows == 2

    def test_datafusion_dialect_constructs_execute(self, client):
        # Migration evidence: the DataFusion-dialect constructs a reference
        # user's SQL most commonly leans on — pg-style `::` casts, ILIKE,
        # `position(x IN y)`, and `||` concat — are shared by Spark 4's
        # parser, so those statements run unchanged through this server.
        t = client.execute(
            "SELECT id::STRING || '!' AS tag, position('a' IN name) AS p "
            "FROM users WHERE name ILIKE 'A%'"
        )
        assert t.num_rows == 1 and t.column("tag").to_pylist() == ["1!"]

    def test_explain_passes_the_query_gate(self, client):
        # EXPLAIN is read-only introspection: DataFusion's verify_plan
        # admits Explain plans under deny-all SQLOptions, and so does this
        # gate (ExplainCommand matches no DDL/DML/statement fragment)
        t = client.execute("EXPLAIN SELECT id FROM users WHERE id > 1")
        assert t.num_rows >= 1
        # real plan text must come back, not an empty command result
        text = "\n".join(t.column(0).to_pylist())
        assert "Physical Plan" in text and "Filter" in text

    def test_prepared_statement_creation(self, client):
        # integration_test.rs:148-171: dataset schema 2 fields, parameter
        # schema 1 field for SELECT * FROM users WHERE id = $1
        prepared = client.prepare("SELECT * FROM users WHERE id = $1")
        assert prepared.dataset_schema is not None
        assert len(prepared.dataset_schema) == 2
        assert prepared.parameter_schema is not None
        assert len(prepared.parameter_schema) == 1
        # plan-typed parameter (service.rs:1085-1105 parity): id is INT, so
        # $1 must come back int32, not the string default
        assert prepared.parameter_schema.field(0).type == pa.int32()
        prepared.close()

    def test_prepared_statement_promoted_comparison_types_int32(self, client):
        # Round 6 (H3 closure, VERDICT r5 #6): a placeholder the comparison
        # regex can't see (function-wrapped column) types from the
        # comparison's cast-STRIPPED sibling — the column type int32, not
        # the string-promotion bigint (service.rs:1085-1105 parity)
        prepared = client.prepare("SELECT * FROM users WHERE abs(id) = $1")
        assert prepared.parameter_schema is not None
        assert prepared.parameter_schema.field(0).type == pa.int32()
        prepared.close()

    def test_get_schemas(self, client):
        # integration_test.rs:173-205: GetDbSchemas non-empty
        table = client.get_db_schemas()
        assert table.num_rows > 0
        assert table.schema.field("db_schema_name").type == pa.utf8()

    def test_get_tables(self, client):
        # integration_test.rs:207-245: GetTables include_schema=true
        table = client.get_tables(include_schema=True)
        assert table.num_rows > 0
        names = set(table.column("table_name").to_pylist())
        assert {"users", "orders"} <= names
        # every table_schema cell is a valid IPC schema message
        idx = table.column("table_name").to_pylist().index("users")
        users_schema = pa.ipc.read_schema(
            pa.BufferReader(table.column("table_schema").to_pylist()[idx])
        )
        assert [f.name for f in users_schema] == ["id", "name"]

    def test_invalid_query(self, client):
        # integration_test.rs:247-260: nonexistent table fails
        with pytest.raises(fl.FlightError):
            client.execute("SELECT * FROM nonexistent_table")

    def test_query_with_aggregation(self, client):
        # integration_test.rs:262-295: COUNT(*) alias → 1 col named count
        table = client.execute("SELECT COUNT(*) as count FROM users")
        assert table.num_columns == 1
        assert table.schema.field(0).name == "count"
        assert table.column("count").to_pylist() == [3]

    def test_query_with_join(self, client):
        # integration_test.rs:297-328: 4-row join
        table = client.execute(
            "SELECT u.name, o.amount FROM users u "
            "JOIN orders o ON u.id = o.user_id ORDER BY o.order_id"
        )
        assert table.num_rows == 4
        assert table.column("name").to_pylist() == ["Alice", "Bob", "Alice", "Charlie"]

    def test_prepared_statement_bind_and_execute(self, client):
        # round-trip beyond the reference's create-only test: bind $1=1 and
        # execute (service.rs:810-862 + 238-273 path)
        prepared = client.prepare("SELECT name FROM users WHERE id = $1")
        batch = pa.RecordBatch.from_pydict({"$1": pa.array([1], pa.int32())})
        prepared.bind(batch)
        table = prepared.execute()
        assert table.column("name").to_pylist() == ["Alice"]
        prepared.close()

    def test_get_catalogs_and_table_types(self, client):
        # service.rs:616-636, 708-731
        catalogs = client.get_catalogs()
        assert catalogs.num_rows >= 1
        types = client.get_table_types()
        assert types.column("table_type").to_pylist() == [
            "BASE TABLE",
            "VIEW",
            "TEMPORARY",
        ]

    def test_get_tables_filter_pattern(self, client):
        # builder filter-pattern behavior (service.rs:665-706)
        table = client.get_tables(table_name_filter_pattern="use%")
        assert set(table.column("table_name").to_pylist()) == {"users"}

    def test_filter_pattern_spec_edges(self, client):
        # Flight SQL spec pattern corners vs the reference builder's
        # semantics (service.rs:648-706): '%' matches zero-or-more, '_'
        # exactly one, and an EMPTY pattern is a PRESENT filter that
        # matches only empty names (absent pattern = no filtering). The
        # wire codec must keep empty-present distinct from absent
        # (proto3 optional presence) for this to reach the server.
        all_tables = set(
            client.get_tables().column("table_name").to_pylist()
        )
        assert {"users", "orders"} <= all_tables
        # '%' alone matches everything (zero-or-more)
        pct = set(
            client.get_tables(table_name_filter_pattern="%")
            .column("table_name")
            .to_pylist()
        )
        assert pct == all_tables
        # '_' matches exactly one character: 6 underscores -> 'orders'
        # but not 'users' (5 chars)
        six = set(
            client.get_tables(table_name_filter_pattern="______")
            .column("table_name")
            .to_pylist()
        )
        assert "orders" in six and "users" not in six
        # empty pattern: present filter, matches no (non-empty) name
        empty = client.get_tables(table_name_filter_pattern="")
        assert empty.num_rows == 0
        # regex metacharacters in the pattern are literals: 'use.s' must
        # NOT match 'users'
        dot = client.get_tables(table_name_filter_pattern="use.s")
        assert dot.num_rows == 0
        # same edges through GetDbSchemas
        schemas_all = client.get_db_schemas().num_rows
        assert schemas_all > 0
        assert (
            client.get_db_schemas(db_schema_filter_pattern="%").num_rows
            == schemas_all
        )
        assert (
            client.get_db_schemas(db_schema_filter_pattern="").num_rows == 0
        )

    def test_schema_probe(self, client):
        # table-provider/src/lib.rs:91-101: plan-only probe, no DoGet
        schema = client.get_table_schema("users")
        assert [f.name for f in schema] == ["id", "name"]

    def test_table_names_inference(self, client):
        # past-parity: lib.rs:85-89 leaves this stubbed; ours asks GetTables
        names = client.table_names()
        assert {"users", "orders"} <= set(names)
        assert names == sorted(names)

    def test_unimplemented_action(self, client):
        # stub parity (service.rs:943-1011) — surfaces as gRPC UNIMPLEMENTED,
        # which pyarrow maps to ArrowNotImplementedError client-side
        with pytest.raises(pa.lib.ArrowNotImplementedError):
            list(client._client.do_action(fl.Action("BeginTransaction", b"")))

    def test_streamed_multibatch_delivery(self, spark, client):
        # streamed delivery (service.rs:186-191): a result larger than one
        # batch arrives as multiple record batches, same values
        register_memtable(
            spark,
            "bignums",
            [(i,) for i in range(5000)],
            "n INT NOT NULL",
        )
        reader = client._client.do_get(
            client.flight_info(
                __import__(
                    "datafusion_flight_sql_server_spark.protocol.flightsql",
                    fromlist=["CommandStatementQuery"],
                ).CommandStatementQuery(query="SELECT n FROM bignums ORDER BY n")
            ).endpoints[0].ticket,
            client._options,
        )
        batches = [chunk.data for chunk in reader]
        assert sum(b.num_rows for b in batches) == 5000


class TestSchemaMetadata:
    """schema_metadata_test.rs:80-179 — per-field table_name metadata."""

    @pytest.fixture(scope="class")
    def meta_server(self, spark):
        _register_fixtures(spark)
        engine = Engine(spark)
        srv = FlightSqlServer(
            engine,
            location="grpc://0.0.0.0:0",
            config=FlightSqlServiceConfig(schema_with_metadata=True),
        )
        threading.Thread(target=srv.serve, daemon=True).start()
        yield srv
        srv.shutdown()

    @pytest.fixture(scope="class")
    def meta_client(self, meta_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{meta_server.port}")
        yield ex
        ex.close()

    def test_simple_projection_metadata(self, meta_client):
        # schema_metadata_test.rs:80-111: SELECT id, name FROM users
        info = meta_client.flight_info(
            _cmd("SELECT id, name FROM users")
        )
        for field in info.schema:
            assert field.metadata[b"table_name"] == b"users"

    def test_join_subquery_alias_metadata(self, meta_client):
        # schema_metadata_test.rs:113-179: aliases through subquery + join
        sql = (
            "SELECT u.id, u.name, o.amount FROM users u "
            "JOIN (SELECT * FROM orders WHERE amount > 25) o ON u.id = o.user_id"
        )
        info = meta_client.flight_info(_cmd(sql))
        by_name = {f.name: f.metadata[b"table_name"] for f in info.schema}
        assert by_name["id"] == b"u"
        assert by_name["name"] == b"u"
        assert by_name["amount"] == b"o"

    def test_metadata_off_by_default(self, client):
        info = client.flight_info(_cmd("SELECT id FROM users"))
        field = info.schema.field("id")
        assert not field.metadata or b"table_name" not in field.metadata

    def test_advertised_schema_is_hydrated_and_matches_stream(self, client):
        # service.rs:1072-1082 routes the schema through an empty
        # FlightDataEncoder so the ADVERTISED schema reflects dictionary
        # hydration (dictionary<_, T> fields advertise as T, matching what
        # DoGet actually delivers). Spark's Arrow export never emits
        # dictionary fields, so the advertised schema is hydrated by
        # construction — this pins the same observable contract: no
        # dictionary types, and FlightInfo schema == DoGet stream schema,
        # field for field, on a string-heavy result (strings are where
        # dictionary encoding would appear).
        sql = "SELECT name, id FROM users ORDER BY id"
        info = client.flight_info(_cmd(sql))
        for field in info.schema:
            assert not pa.types.is_dictionary(field.type)
        reader = client._client.do_get(
            info.endpoints[0].ticket, client._options
        )
        table = reader.read_all()
        assert [(f.name, f.type) for f in table.schema] == [
            (f.name, f.type) for f in info.schema
        ]


class TestBearerAuth:
    """examples/bearer_auth_flight_sql.rs:137-238 accept/reject."""

    @pytest.fixture(scope="class")
    def auth_server(self, spark):
        _register_fixtures(spark)
        engine = Engine(spark)
        srv = FlightSqlServer(
            engine,
            location="grpc://0.0.0.0:0",
            middleware={"auth": BearerAuthMiddlewareFactory("secret-token")},
        )
        threading.Thread(target=srv.serve, daemon=True).start()
        yield srv
        srv.shutdown()

    def test_valid_token_accepted(self, auth_server):
        ex = FlightSQLExecutor(
            f"grpc://localhost:{auth_server.port}", token="secret-token"
        )
        table = ex.execute("SELECT COUNT(*) AS n FROM users")
        assert table.column("n").to_pylist() == [3]
        ex.close()

    def test_missing_token_rejected(self, auth_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{auth_server.port}")
        with pytest.raises(fl.FlightUnauthenticatedError):
            ex.execute("SELECT 1 AS one")
        ex.close()

    def test_wrong_token_rejected(self, auth_server):
        ex = FlightSQLExecutor(
            f"grpc://localhost:{auth_server.port}", token="wrong"
        )
        with pytest.raises(fl.FlightUnauthenticatedError):
            ex.execute("SELECT 1 AS one")
        ex.close()


class TestServerSideUdf:
    """UDF surface parity (SURVEY §2.B): no wire-level registration — the
    embedder pre-registers functions on the session the server wraps
    (reference: session.rs:9-12, service.rs:140-141). Spark analogue:
    ``spark.udf.register`` on the served SparkSession; any Flight SQL
    client can then call the function by name."""

    def test_pre_registered_pandas_udf_via_flight(self, spark, client):
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def doubled(v: pd.Series) -> pd.Series:
            return v * 2

        spark.udf.register("doubled", doubled)
        table = client.execute(
            "SELECT order_id, doubled(amount) AS amount2 "
            "FROM orders ORDER BY order_id"
        )
        assert table.column("amount2").to_pylist() == [100, 150, 200, 50]

    def test_pre_registered_udtf_via_flight(self, spark, client):
        """Table functions follow the same embedder-side policy: a Spark 4
        Python UDTF registered on the served session is callable from any
        Flight SQL client in the FROM clause."""
        from pyspark.sql.functions import udtf

        @udtf(returnType="n int, sq int")
        class Squares:
            def eval(self, start: int, stop: int):
                for n in range(start, stop):
                    yield n, n * n

        spark.udtf.register("squares", Squares)
        table = client.execute("SELECT * FROM squares(1, 5) ORDER BY n")
        assert table.column("n").to_pylist() == [1, 2, 3, 4]
        assert table.column("sq").to_pylist() == [1, 4, 9, 16]


def _cmd(sql: str):
    from datafusion_flight_sql_server_spark.protocol.flightsql import (
        CommandStatementQuery,
    )

    return CommandStatementQuery(query=sql)


class TestExplainOverWire:
    def test_explain_select_returns_plan_text(self, client):
        # DataFusion serves EXPLAIN through the same statement path; so do
        # we — the gate admits it (read-only) and the plan text streams
        # back as an ordinary single-column result
        table = client.execute("EXPLAIN SELECT id FROM users WHERE id > 1")
        assert table.num_rows >= 1
        text = " ".join(str(v) for v in table.column(0).to_pylist())
        assert "Filter" in text or "Physical Plan" in text


class TestCatalogSqlOverWire:
    """DataFusion admits SHOW TABLES / DESCRIBE through the plain statement
    path (they plan as information_schema queries, not gated Statements);
    Spark's equivalents must flow through the same DoGet pipeline, while
    session-mutating statements (SET and friends) stay rejected by the
    gate (SQLOptions.allow_statements=False default, gate.py)."""

    def test_show_tables_lists_fixtures(self, client):
        table = client.execute("SHOW TABLES")
        names = set(table.column("tableName").to_pylist())
        assert {"users", "orders"} <= names

    def test_describe_table_returns_columns(self, client):
        table = client.execute("DESCRIBE users")
        cols = set(table.column("col_name").to_pylist())
        assert {"id", "name"} <= cols

    def test_set_statement_rejected(self, client):
        with pytest.raises(fl.FlightError):
            client.execute("SET spark.sql.shuffle.partitions=1")


class TestGetSqlInfo:
    def test_sql_info_minimal_fill(self, client):
        # parity-plus (reference stubs GetSqlInfo, service.rs:518-530):
        # name/version/arrow-version/read-only rows, spec dense-union schema
        table = client.get_sql_info()
        assert table.num_rows == 4
        ids = table.column("info_name").to_pylist()
        assert ids == [0, 1, 2, 3]
        values = table.column("value").to_pylist()
        assert values[0] == "datafusion-flight-sql-server-spark"
        assert values[3] is True  # read-only: DML answers are stubs

    def test_sql_info_filter(self, client):
        table = client.get_sql_info([1])
        assert table.num_rows == 1
        assert table.column("info_name").to_pylist() == [1]


class TestScaleServing:
    """Serving-layer scale checks (round-2 review items #2 and #7):
    Arrow-native streaming of a large DoGet and isolation under concurrent
    clients. The reference streams batch-at-a-time (service.rs:186-236);
    round 2's pylist re-encode capped DoGet at driver-CPU row-decode speed —
    these tests pin the executor-side IPC path end-to-end over TCP."""

    def test_large_result_streams_arrow_batches(self, spark, client):
        # ≥1M rows through DoGet: values intact, delivered as multiple
        # bounded batches (never one giant batch), no per-row Python decode
        # on the serving path (pinned separately in
        # tests/test_plans.py::TestExecuteStream::test_arrow_path_engaged).
        n = 1_000_000
        spark.range(0, n).createOrReplaceTempView("bigrange")
        table = client.execute("SELECT id FROM bigrange")
        assert table.num_rows == n
        import pyarrow.compute as pc

        assert pc.sum(table.column("id")).as_py() == n * (n - 1) // 2
        assert len(table.column("id").chunks) > 1

    def test_concurrent_clients_isolated(self, server):
        # N parallel DoGets, each its own TCP client and its own filter
        # constant: every stream must return exactly its own answer
        # (per-request session mint, service.rs:133-151 / server A2-A3)
        import concurrent.futures

        def run(k: int):
            ex = FlightSQLExecutor(f"grpc://localhost:{server.port}")
            try:
                t = ex.execute(
                    f"SELECT id, {k} AS tag FROM users WHERE id <= {k % 3 + 1}"
                )
                return k, t.num_rows, set(t.column("tag").to_pylist())
            finally:
                ex.close()

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
            results = list(pool.map(run, range(16)))
        for k, rows, tags in results:
            assert rows == k % 3 + 1
            assert tags == {k}

    def test_concurrent_temp_view_isolation(self, server):
        # Same name, different per-session content: each prepared session
        # must see only its own registration (SessionStateProvider contract)
        import concurrent.futures

        def run(k: int):
            ex = FlightSQLExecutor(f"grpc://localhost:{server.port}")
            try:
                t = ex.execute(f"SELECT amount FROM orders WHERE user_id = {k % 3 + 1}")
                return sorted(t.column("amount").to_pylist())
            finally:
                ex.close()

        expect = {1: [50, 100], 2: [75], 3: [25]}
        with concurrent.futures.ThreadPoolExecutor(max_workers=6) as pool:
            results = list(pool.map(run, range(12)))
        for k, amounts in zip(range(12), results):
            assert amounts == expect[k % 3 + 1]


class TestMalformedInputs:
    """Wire robustness: garbage and truncated protobuf payloads must map to
    clean Flight errors (the reference's blanket INTERNAL mapping,
    service.rs:1107-1121), never take the server down. Each case runs a
    valid query afterwards to prove the server survived."""

    def test_garbage_ticket_rejected_cleanly(self, client):
        with pytest.raises(fl.FlightError):
            client._client.do_get(
                fl.Ticket(b"\xde\xad\xbe\xef" * 5), client._options
            ).read_all()
        assert client.execute("SELECT 1 AS x").num_rows == 1

    def test_empty_ticket_rejected_cleanly(self, client):
        with pytest.raises(fl.FlightError):
            client._client.do_get(fl.Ticket(b""), client._options).read_all()
        assert client.execute("SELECT 1 AS x").num_rows == 1

    def test_garbage_descriptor_rejected_cleanly(self, client):
        with pytest.raises(fl.FlightError):
            client._client.get_flight_info(
                fl.FlightDescriptor.for_command(b"\x00\xff\x13garbage"),
                client._options,
            )
        assert client.execute("SELECT 1 AS x").num_rows == 1

    def test_truncated_prepared_handle_rejected_cleanly(self, client):
        from datafusion_flight_sql_server_spark.protocol.flightsql import (
            CommandPreparedStatementQuery,
        )

        bad = CommandPreparedStatementQuery(prepared_statement_handle=b"\x01")
        with pytest.raises(fl.FlightError):
            client.flight_info(bad)
        assert client.execute("SELECT 1 AS x").num_rows == 1

    def test_unknown_action_rejected_cleanly(self, client):
        # UNIMPLEMENTED surfaces as ArrowNotImplementedError client-side
        # (same mapping as test_unimplemented_action)
        with pytest.raises((fl.FlightError, pa.lib.ArrowNotImplementedError)):
            list(
                client._client.do_action(
                    fl.Action("NoSuchAction", b""), client._options
                )
            )
        assert client.execute("SELECT 1 AS x").num_rows == 1


class TestMultiEndpoint:
    """Opt-in multi-endpoint DoGet (round-3 review item #6): with
    ``result_endpoints > 1`` the server stages the result partition-tagged
    and returns one FlightEndpoint per bucket, so big results stream over
    parallel DoGet calls instead of one driver-side iterator. The default
    stays single-endpoint (reference parity); the reference's own client
    merges multi-endpoint FlightInfos (table-provider/src/lib.rs:43-53),
    as do ours and the flightsql DataSource."""

    SQL = "SELECT id, grp FROM wide_result"
    N = 200_000

    @pytest.fixture(scope="class")
    def multi_server(self, spark):
        _register_fixtures(spark)
        spark.range(0, self.N).selectExpr(
            "id", "CAST(id % 97 AS INT) AS grp"
        ).repartition(8, "grp").createOrReplaceTempView("wide_result")
        srv = FlightSqlServer(
            Engine(spark),
            location="grpc://0.0.0.0:0",
            config=FlightSqlServiceConfig(result_endpoints=4),
        )
        threading.Thread(target=srv.serve, daemon=True).start()
        yield srv
        srv.shutdown()

    @pytest.fixture(scope="class")
    def multi_client(self, multi_server):
        ex = FlightSQLExecutor(f"grpc://localhost:{multi_server.port}")
        yield ex
        ex.close()

    def test_flight_info_returns_configured_endpoints(self, multi_client):
        from datafusion_flight_sql_server_spark.protocol.flightsql import (
            CommandStatementQuery,
        )

        info = multi_client.flight_info(CommandStatementQuery(query=self.SQL))
        assert len(info.endpoints) == 4
        # every ticket distinct, all buckets of one result
        tickets = [bytes(ep.ticket.ticket) for ep in info.endpoints]
        assert len(set(tickets)) == 4

    def test_multi_endpoint_merge_matches_single_endpoint(
        self, multi_client, server
    ):
        multi = multi_client.execute(self.SQL).sort_by("id").combine_chunks()
        single_ex = FlightSQLExecutor(f"grpc://localhost:{server.port}")
        try:
            single = single_ex.execute(self.SQL).sort_by("id").combine_chunks()
        finally:
            single_ex.close()
        assert multi.num_rows == single.num_rows == self.N
        assert multi.schema.equals(single.schema)
        assert multi.equals(single)

    def test_buckets_disjoint_complete_and_replayable(
        self, multi_server, multi_client
    ):
        from datafusion_flight_sql_server_spark.protocol.flightsql import (
            CommandStatementQuery,
        )

        info = multi_client.flight_info(
            CommandStatementQuery(query="SELECT id FROM wide_result")
        )
        raw = fl.FlightClient(f"grpc://localhost:{multi_server.port}")
        try:
            counts = []
            ids: list[int] = []
            for ep in info.endpoints:
                bucket_ids = raw.do_get(ep.ticket).read_all().column("id").to_pylist()
                counts.append(len(bucket_ids))
                ids.extend(bucket_ids)
            # union over buckets is exactly the result, no dup, no loss
            assert sorted(ids) == list(range(self.N))
            # tickets replay while staged (Spark re-reads a scan's
            # partition tickets once per action; retries replay them too)
            replay = raw.do_get(info.endpoints[0].ticket).read_all()
            assert replay.num_rows == counts[0]
        finally:
            raw.close()

    def test_buckets_stream_concurrently(self, multi_server, multi_client):
        """All buckets pulled SIMULTANEOUSLY from separate threads — the
        real multi-endpoint consumption pattern (the reference client
        select_alls its endpoint streams, table-provider/src/lib.rs:43-53).
        Exercises the sizes pre-pass + grouped pulls under concurrency:
        each stream plans groups against the same persisted relation, and
        the union must still be exact."""
        from datafusion_flight_sql_server_spark.protocol.flightsql import (
            CommandStatementQuery,
        )

        info = multi_client.flight_info(
            CommandStatementQuery(query="SELECT id FROM wide_result")
        )
        results: dict[int, list[int]] = {}
        errors: list[Exception] = []
        barrier = threading.Barrier(len(info.endpoints))

        def pull(i, ticket):
            raw = fl.FlightClient(f"grpc://localhost:{multi_server.port}")
            try:
                barrier.wait()
                results[i] = (
                    raw.do_get(ticket).read_all().column("id").to_pylist()
                )
            except Exception as exc:  # pragma: no cover
                errors.append(exc)
            finally:
                raw.close()

        threads = [
            threading.Thread(target=pull, args=(i, ep.ticket))
            for i, ep in enumerate(info.endpoints)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
        assert not errors
        assert len(results) == len(info.endpoints)
        ids = [x for b in results.values() for x in b]
        assert sorted(ids) == list(range(self.N))

    def test_concurrent_streams_bounded_aggregate_pull_bytes(
        self, multi_server, multi_client
    ):
        """Round-9 soak (VERDICT r8 #2): concurrent bucket streams draw
        their group reservations from ONE shared pool, so aggregate
        in-flight pull bytes stay <= the pool total — N streams can no
        longer stack N full per-stream budgets on the driver. Run with a
        pool smaller than the result so the streams genuinely contend
        (every group must wait its turn), and assert the union is still
        exact and the pool's high-water mark never passed its total."""
        from datafusion_flight_sql_server_spark.engine import core
        from datafusion_flight_sql_server_spark.protocol.flightsql import (
            CommandStatementQuery,
        )

        info = multi_client.flight_info(
            CommandStatementQuery(query="SELECT id FROM wide_result")
        )
        saved = core._PULL_POOL
        pool = core._PullBudgetPool(256 << 10)  # << the staged result
        core._PULL_POOL = pool
        results: dict[int, list[int]] = {}
        errors: list[Exception] = []
        barrier = threading.Barrier(len(info.endpoints))

        def pull(i, ticket):
            raw = fl.FlightClient(f"grpc://localhost:{multi_server.port}")
            try:
                barrier.wait()
                results[i] = (
                    raw.do_get(ticket).read_all().column("id").to_pylist()
                )
            except Exception as exc:  # pragma: no cover
                errors.append(exc)
            finally:
                raw.close()

        threads = [
            threading.Thread(target=pull, args=(i, ep.ticket))
            for i, ep in enumerate(info.endpoints)
        ]
        try:
            for t in threads:
                t.start()
            for t in threads:
                t.join(180)
        finally:
            core._PULL_POOL = saved
        assert not errors
        ids = [x for b in results.values() for x in b]
        assert sorted(ids) == list(range(self.N))
        # the streams really contended AND the bound held
        assert 0 < pool.peak <= pool.total

    def test_pull_pool_fifo_large_reservation_not_starved(self):
        """ADVICE r9: reservations are granted FIFO — a blocked
        full-pool reservation cannot be overtaken by later small
        acquires that would otherwise fit in the remaining bytes (the
        unordered notify_all race let smalls starve it indefinitely)."""
        import time

        from datafusion_flight_sql_server_spark.engine import core

        pool = core._PullBudgetPool(100)
        held = pool.acquire(60)
        order: list[str] = []

        def runner(tag, nbytes):
            got = pool.acquire(nbytes)
            order.append(tag)
            pool.release(got)

        big = threading.Thread(target=runner, args=("big", 100))
        big.start()
        deadline = time.monotonic() + 10
        while len(pool._waiters) < 1 and time.monotonic() < deadline:
            time.sleep(0.005)  # big is enqueued (blocked: 60 held)
        small = threading.Thread(target=runner, args=("small", 10))
        small.start()
        while len(pool._waiters) < 2 and time.monotonic() < deadline:
            time.sleep(0.005)
        # 40 bytes are free — the pre-fix pool would grant the small
        # here, jumping the queue; FIFO keeps it behind the big
        time.sleep(0.1)
        assert order == []
        pool.release(held)  # pool back to 100 → big first, then small
        big.join(10)
        small.join(10)
        assert order == ["big", "small"]
        assert pool._avail == pool.total and not pool._waiters

    def test_lru_eviction_expires_tickets(self, spark):
        from datafusion_flight_sql_server_spark.protocol.flightsql import (
            CommandStatementQuery,
        )

        srv = FlightSqlServer(
            Engine(spark),
            location="grpc://0.0.0.0:0",
            config=FlightSqlServiceConfig(
                result_endpoints=2, max_staged_results=1
            ),
        )
        threading.Thread(target=srv.serve, daemon=True).start()
        ex = FlightSQLExecutor(f"grpc://localhost:{srv.port}")
        try:
            old = ex.flight_info(CommandStatementQuery(query="SELECT 1 AS x"))
            ex.flight_info(CommandStatementQuery(query="SELECT 2 AS y"))  # evicts
            with pytest.raises(fl.FlightError, match="expired|unknown"):
                ex._client.do_get(old.endpoints[0].ticket, ex._options).read_all()
        finally:
            ex.close()
            srv.shutdown()

    def test_unknown_and_garbage_partition_tickets(self, multi_client):
        from datafusion_flight_sql_server_spark.protocol.state import (
            _PART_TICKET_MAGIC,
            PartitionedResultTicket,
        )

        bogus = PartitionedResultTicket("no-such-result", 0, 4).encode()
        with pytest.raises(fl.FlightError, match="expired|unknown"):
            multi_client._client.do_get(
                fl.Ticket(bogus), multi_client._options
            ).read_all()
        with pytest.raises(fl.FlightError):
            multi_client._client.do_get(
                fl.Ticket(_PART_TICKET_MAGIC + b"\x0c\xde\xad"),
                multi_client._options,
            ).read_all()
        # server survived both
        assert multi_client.execute("SELECT 1 AS x").num_rows == 1

    def test_datasource_reads_endpoints_as_partitions(self, spark, multi_server):
        # Loopback scan (same app serves and reads): endpoints must stay
        # below the task-slot count (local[4] here) or the scan's blocked
        # DoGet tasks starve the inner jobs that produce the staged result
        # (prepare_partitioned_result docstring) — so this server serves 2.
        from datafusion_flight_sql_server_spark.sources import FlightSQLDataSource

        srv = FlightSqlServer(
            Engine(spark),
            location="grpc://0.0.0.0:0",
            config=FlightSqlServiceConfig(result_endpoints=2),
        )
        threading.Thread(target=srv.serve, daemon=True).start()
        try:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
            spark.dataSource.register(FlightSQLDataSource)
            df = (
                spark.read.format("flightsql")
                .option("uri", f"grpc://localhost:{srv.port}")
                .option("query", self.SQL)
                .load()
            )
            # one Spark input partition per Flight endpoint
            assert df.rdd.getNumPartitions() == 2
            assert df.count() == self.N
            total = df.agg({"id": "sum"}).collect()[0][0]
            assert total == self.N * (self.N - 1) // 2
        finally:
            srv.shutdown()


class TestMixedTrafficSoak:
    """Round 10 (VERDICT r9 #6): every traffic KIND the server handles,
    simultaneously, against ONE server — dialect-rewritten statements,
    prepared statements with per-thread parameter bindings, a Substrait
    plan, multi-endpoint bucket streams under a contended shared pull
    pool, and catalog metadata calls — asserting isolation (every thread
    sees exactly its own values: a cross-bound parameter or swapped
    ticket would show), pool bounds (peak <= total), and zero errors.
    Each piece is soak-tested individually elsewhere; this is the mix.
    Runs against real executor processes when SPARK_GRAFT_MASTER is a
    local-cluster master (the round-closing risky-slice run)."""

    N = 200_000

    @pytest.fixture(scope="class")
    def soak_server(self, spark):
        _register_fixtures(spark)
        spark.range(0, self.N).selectExpr(
            "id", "CAST(id % 97 AS INT) AS grp"
        ).repartition(8, "grp").createOrReplaceTempView("soak_wide")
        eng = Engine(spark)
        srv = FlightSqlServer(
            eng,
            location="grpc://0.0.0.0:0",
            config=FlightSqlServiceConfig(result_endpoints=4),
        )
        srv._soak_engine = eng  # the soak asserts on its describe memo
        threading.Thread(target=srv.serve, daemon=True).start()
        yield srv
        srv.shutdown()

    def test_mixed_traffic_isolation_and_pool_bounds(self, soak_server):
        import test_substrait as TS

        from datafusion_flight_sql_server_spark.engine import core
        from datafusion_flight_sql_server_spark.protocol.flightsql import (
            CommandStatementQuery,
        )

        uri = f"grpc://localhost:{soak_server.port}"
        threads_n, iters = 10, 3
        errors: list[str] = []
        barrier = threading.Barrier(threads_n)
        sum_ids = self.N * (self.N - 1) // 2

        def role_dialect(ex, i, t):
            v = ex.execute(
                "SELECT approx_distinct(user_id) AS v FROM orders"
            ).column("v").to_pylist()
            assert v == [3], v
            w = ex.execute(
                f"SELECT strpos(name, 'o') AS v FROM users WHERE id = {2}"
            ).column("v").to_pylist()
            assert w == [2], w

        def role_prepared(ex, i, t):
            want = (t + i) % 3 + 1
            prepared = ex.prepare("SELECT id, name FROM users WHERE id = $1")
            try:
                prepared.bind(
                    pa.RecordBatch.from_pydict(
                        {"$1": pa.array([want], pa.int32())}
                    )
                )
                got = prepared.execute()
                assert got.column("id").to_pylist() == [want], (
                    f"cross-talk: bound {want}, got "
                    f"{got.column('id').to_pylist()}"
                )
            finally:
                prepared.close()

        def role_substrait(ex, i, t):
            p = TS.plan_bytes(
                TS.rel(
                    3,
                    TS.fetch_rel(
                        TS.rel(7, TS.project_rel(TS.USERS_READ, [1], [2])), 3
                    ),
                ),
                ["who"],
            )
            info = ex.flight_info(TS._substrait_command(p))
            tbl = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            assert set(tbl.column("who").to_pylist()) <= {
                "Alice", "Bob", "Charlie",
            }

        def role_stream(ex, i, t):
            info = ex.flight_info(
                CommandStatementQuery(query="SELECT id FROM soak_wide")
            )
            assert len(info.endpoints) == 4
            total, count = 0, 0
            raw = fl.FlightClient(uri)
            try:
                for ep in info.endpoints:
                    for chunk in raw.do_get(ep.ticket):
                        col = chunk.data.column(0)
                        count += len(col)
                        total += sum(col.to_pylist())
            finally:
                raw.close()
            assert count == self.N and total == sum_ids

        def role_metadata(ex, i, t):
            names = ex.table_names()
            assert "users" in names and "soak_wide" in names
            # information_schema virtualization under concurrency: the
            # rewrite probes the live catalog per statement, so ten
            # threads exercise catalog calls against one session
            tbl = ex.execute(
                "SELECT table_name FROM information_schema.tables "
                "WHERE table_name = 'soak_wide'"
            )
            assert tbl.column("table_name").to_pylist() == ["soak_wide"]
            cols = ex.execute(
                "SELECT column_name FROM information_schema.columns "
                "WHERE table_name = 'users'"
            )
            assert "id" in cols.column("column_name").to_pylist()

        roles = [
            role_dialect, role_prepared, role_substrait,
            role_stream, role_metadata,
        ]

        def worker(t):
            ex = FlightSQLExecutor(uri)
            try:
                barrier.wait(timeout=60)
                for i in range(iters):
                    roles[(t + i) % len(roles)](ex, i, t)
                    roles[(t + i + 2) % len(roles)](ex, i, t)
            except Exception as exc:
                errors.append(f"thread {t}: {exc!r}")
            finally:
                ex.close()

        # Prime the describe memo, then count catalog schema probes
        # during the soak: repeated information_schema.columns
        # statements must be O(1) describes per SESSION, not per
        # statement (VERDICT r10 "what's wrong" #2). info_schema refs
        # are always backtick-quoted; other spark.table users are not.
        eng = soak_server._soak_engine
        eng.info_schema_rows("columns")
        spark = eng.spark
        describe_refs: list[str] = []
        real_table = spark.table

        def counting_table(ref):
            if isinstance(ref, str) and ref.startswith("`"):
                describe_refs.append(ref)
            return real_table(ref)

        saved = core._PULL_POOL
        pool = core._PullBudgetPool(512 << 10)  # << the staged streams
        core._PULL_POOL = pool
        spark.table = counting_table
        try:
            ts = [
                threading.Thread(target=worker, args=(t,))
                for t in range(threads_n)
            ]
            for th in ts:
                th.start()
            for th in ts:
                th.join(300)
            assert not any(th.is_alive() for th in ts), "soak hung"
        finally:
            core._PULL_POOL = saved
            spark.table = real_table
        assert not errors, errors
        assert describe_refs == [], (
            f"memoized columns re-described {describe_refs}"
        )
        # streams really contended for the shrunken shared pool, and the
        # aggregate reservation bound held throughout
        assert 0 < pool.peak <= pool.total
        assert pool._avail == pool.total and not pool._waiters


class TestStrictParameterTypes:
    """H3 strict mode (round 8, VERDICT r7 #8): with
    ``strict_parameter_types=True`` the server errors at
    create_prepared_statement on placeholders it cannot type — DataFusion's
    ``parameter_schema_for_plan`` surfaces a planning error there
    (service.rs:1085-1105) — instead of defaulting them to string."""

    @pytest.fixture(scope="class")
    def strict_client(self, spark):
        _register_fixtures(spark)
        srv = FlightSqlServer(
            Engine(spark),
            location="grpc://0.0.0.0:0",
            config=FlightSqlServiceConfig(strict_parameter_types=True),
        )
        threading.Thread(target=srv.serve, daemon=True).start()
        ex = FlightSQLExecutor(f"grpc://localhost:{srv.port}")
        yield ex
        ex.close()
        srv.shutdown()

    def test_typeable_placeholder_still_prepares(self, strict_client):
        prepared = strict_client.prepare("SELECT * FROM users WHERE id = $1")
        assert prepared.parameter_schema.field(0).type == pa.int32()
        prepared.close()

    def test_untypeable_placeholder_errors(self, strict_client):
        # a bare projected placeholder has no comparison sibling and no
        # implicit cast to read a type from — DataFusion errors on it too
        with pytest.raises(fl.FlightError, match="strict_parameter_types"):
            strict_client.prepare("SELECT $1 AS v FROM users")

    def test_default_mode_keeps_string_fallback(self, client):
        # reference-divergent-but-documented lenient default: the same
        # statement prepares with a string-typed parameter
        prepared = client.prepare("SELECT $1 AS v FROM users")
        assert prepared.parameter_schema.field(0).type == pa.utf8()
        prepared.close()


class TestDictionaryHydrationParity:
    """Wire-verify the declared divergence at service.py:41-46: the
    reference hydrates dictionary-encoded result fields before shipping
    (service.rs:1072-1083); this server ships Spark's Arrow export, which
    must therefore contain NO dictionary-encoded fields — even when the
    source parquet is dictionary-encoded on disk — and the GetFlightInfo
    schema must equal the DoGet stream's schema exactly."""

    def test_no_dictionary_fields_on_the_wire(self, spark, server, tmp_path):
        import pyarrow.parquet as pq

        from datafusion_flight_sql_server_spark.protocol.flightsql import (
            CommandStatementQuery,
        )

        path = str(tmp_path / "dicted.parquet")
        t = pa.table(
            {
                "k": pa.array(["alpha", "beta", "alpha", "gamma"] * 500),
                "v": pa.array(list(range(2000)), type=pa.int64()),
            }
        )
        pq.write_table(t, path, use_dictionary=True)
        # the fixture really is dictionary-encoded on disk
        enc = pq.ParquetFile(path).metadata.row_group(0).column(0).encodings
        assert any("DICTIONARY" in e for e in enc)
        spark.read.parquet(path).createOrReplaceTempView("dicted")

        ex = FlightSQLExecutor(f"grpc://localhost:{server.port}")
        try:
            sql = "SELECT k, v FROM dicted"
            info = ex.flight_info(CommandStatementQuery(query=sql))
            declared = info.schema
            for f in declared:
                assert not pa.types.is_dictionary(f.type)
            table = ex._client.do_get(
                info.endpoints[0].ticket, ex._options
            ).read_all()
            for f in table.schema:
                assert not pa.types.is_dictionary(f.type)
            # post-"hydration" parity: declared schema == stream schema,
            # with no re-encode pass needed anywhere
            assert declared.equals(table.schema)
            assert table.num_rows == 2000
        finally:
            ex.close()
