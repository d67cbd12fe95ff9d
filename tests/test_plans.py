"""Unit tests for the plans layer: statement gate, parameter binding,
plan-only schema derivation, streamed delivery.

Ports the reference's non-server unit semantics: the SQLOptions accept/reject
matrix (reference: datafusion-flight-sql-server/src/service.rs:92-101), the
$n/$name positional-vs-named binding rules (service.rs:1157-1192), parameter
IPC decode constraints (service.rs:810-862), qualifier metadata scenarios
(tests/schema_metadata_test.rs:80-179), and batch-streamed result delivery
(service.rs:186-191).
"""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.engine.core import Engine
from datafusion_flight_sql_server_spark.engine.registry import register_memtable
from datafusion_flight_sql_server_spark.plans.gate import (
    PlanVerificationError,
    SQLOptions,
)
from datafusion_flight_sql_server_spark.plans.params import (
    ParameterError,
    bind_sql,
    decode_ipc_params,
    normalize_placeholders,
    null_bind_params,
    record_batch_to_params,
)
from datafusion_flight_sql_server_spark.plans.schema import (
    arrow_schema_for_df,
    parameter_schema_for_sql,
    qualifier_metadata,
)


@pytest.fixture(scope="module", autouse=True)
def fixtures(spark):
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


class TestGate:
    """SQLOptions accept/reject matrix (service.rs:92-101 semantics)."""

    CASES = [
        ("SELECT * FROM users", "query"),
        ("WITH t AS (SELECT 1 AS x) SELECT * FROM t", "query"),
        ("EXPLAIN SELECT 1", "query"),
        ("CREATE TABLE t2 (x INT) USING parquet", "ddl"),
        ("DROP TABLE users", "ddl"),
        ("ALTER TABLE users ADD COLUMNS (extra INT)", "ddl"),
        ("CREATE VIEW v AS SELECT 1 AS one", "ddl"),
        ("INSERT INTO users VALUES (4, 'Dave')", "dml"),
        ("DELETE FROM users WHERE id = 1", "dml"),
        ("UPDATE users SET name = 'x' WHERE id = 1", "dml"),
        ("MERGE INTO users USING orders ON users.id = orders.user_id "
         "WHEN MATCHED THEN DELETE", "dml"),
        # CTE-wrapped DML parses to UnresolvedWith with the DML node as a
        # child — a root-only class check admitted these (round-6 fix)
        ("WITH c AS (SELECT 9 AS i) INSERT INTO users SELECT i, 'x' FROM c",
         "dml"),
        ("WITH c AS (SELECT 1 AS i) DELETE FROM users "
         "WHERE id IN (SELECT i FROM c)", "dml"),
        ("SET spark.sql.shuffle.partitions=1", "statement"),
        ("RESET", "statement"),
        ("CACHE TABLE users", "statement"),
        ("REFRESH TABLE users", "statement"),
    ]

    @pytest.mark.parametrize("sql,category", CASES)
    def test_default_gate_blocks_everything_but_queries(self, spark, sql, category):
        gate = SQLOptions()  # reference server default: deny DDL/DML/statements
        if category == "query":
            gate.verify(spark, sql)  # no raise
        else:
            with pytest.raises(PlanVerificationError):
                gate.verify(spark, sql)

    def test_selective_allow(self, spark):
        SQLOptions(allow_ddl=True).verify(spark, "DROP TABLE users")
        SQLOptions(allow_dml=True).verify(
            spark, "INSERT INTO users VALUES (9, 'Zed')"
        )
        SQLOptions(allow_statements=True).verify(spark, "RESET")
        with pytest.raises(PlanVerificationError):
            SQLOptions(allow_ddl=True).verify(spark, "RESET")


class TestParams:
    """$n/$name binding semantics (service.rs:1157-1192)."""

    def test_positional_rewrite(self):
        sql, names = normalize_placeholders("SELECT * FROM t WHERE a = $1 AND b > $2")
        assert names == ["1", "2"]
        assert ":p1" in sql and ":p2" in sql and "$" not in sql

    def test_named_rewrite(self):
        sql, names = normalize_placeholders("SELECT * FROM t WHERE a = $min_a")
        assert names == ["min_a"] and ":min_a" in sql

    def test_dollar_inside_string_literal_untouched(self):
        sql, names = normalize_placeholders("SELECT '$1 literal' AS s FROM t WHERE x = $1")
        assert names == ["1"]
        assert "'$1 literal'" in sql

    def test_repeated_and_out_of_order(self, spark):
        df = bind_sql(
            spark,
            "SELECT * FROM users WHERE id = $2 OR id = $1 OR id = $2",
            [1, 3],
        )
        assert sorted(r.id for r in df.collect()) == [1, 3]

    def test_record_batch_all_numeric_becomes_positional(self):
        batch = pa.RecordBatch.from_pydict(
            {"$2": pa.array(["b"]), "$1": pa.array(["a"])}
        )
        # sorted by index regardless of field order (service.rs:1178-1186)
        assert record_batch_to_params(batch) == ["a", "b"]

    def test_record_batch_named_becomes_dict(self):
        batch = pa.RecordBatch.from_pydict(
            {"$1": pa.array([5]), "name": pa.array(["x"])}
        )
        # any non-numeric name → named map (service.rs:1187-1191)
        assert record_batch_to_params(batch) == {"1": 5, "name": "x"}

    def test_ipc_single_row_enforced(self):
        schema = pa.schema([("$1", pa.int32())])
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, schema) as w:
            w.write_batch(pa.RecordBatch.from_pydict({"$1": pa.array([1, 2], pa.int32())}))
        with pytest.raises(ParameterError, match="single row"):
            decode_ipc_params(sink.getvalue().to_pybytes())

    def test_unbound_placeholder_rejected(self, spark):
        with pytest.raises(ParameterError, match="unbound"):
            bind_sql(spark, "SELECT * FROM users WHERE id = $1")

    def test_null_bind_params(self):
        assert null_bind_params("SELECT 1") is None
        assert null_bind_params("SELECT * FROM t WHERE a = $1 AND b = $n") == {
            "p1": None,
            "n": None,
        }


class TestParameterSchema:
    """Parameter-schema inference (service.rs:1085-1105; declared divergence
    SURVEY §7 H3: comparison-context typing, string default)."""

    def test_typed_from_comparison_column(self, spark):
        schema = parameter_schema_for_sql(
            spark, "SELECT * FROM users WHERE id = $1"
        )
        assert schema.names == ["$1"]
        assert schema.field("$1").type == pa.int32()

    def test_string_default_and_order(self, spark):
        schema = parameter_schema_for_sql(
            spark, "SELECT * FROM users WHERE name = $who AND id > $2 AND $1 < id"
        )
        # numerics sorted by index first, then named lexicographically
        assert schema.names == ["$1", "$2", "who"]
        assert schema.field("who").type == pa.string()

    def test_plan_probe_types_function_context(self, spark):
        # the comparison regex can't see through abs(); the analyzed-plan
        # walk types the marker from the comparison's cast-STRIPPED sibling
        # (abs(id) is int), not the string-promotion bigint — round-6 H3
        # closure, matching DataFusion's column-type report
        schema = parameter_schema_for_sql(
            spark, "SELECT * FROM users WHERE abs(id) > $1"
        )
        assert schema.field("$1").type == pa.int32()

    def test_plan_probe_types_subquery_context(self, spark):
        # the walk recurses into the IN-subquery's plan; id + 1 is int in
        # Spark (int column + int literal), so the sibling type is int32
        schema = parameter_schema_for_sql(
            spark,
            "SELECT * FROM users WHERE id IN "
            "(SELECT id FROM users WHERE id + 1 < $1)",
        )
        assert schema.field("$1").type == pa.int32()

    def test_limit_offset_placeholders_typed_int64(self, spark):
        # LIMIT/OFFSET positions are int64 by grammar; the analyzed-plan
        # probe can't see them (analysis fails there), so the grammar rule
        # types them directly — closing the last documented
        # string-default residual for the paging shape
        schema = parameter_schema_for_sql(
            spark, "SELECT * FROM users LIMIT $1 OFFSET $2"
        )
        assert schema.field("$1").type == pa.int64()
        assert schema.field("$2").type == pa.int64()

    def test_plan_probe_failure_keeps_string_default(self, spark):
        # a placeholder where neither comparison, grammar-position, nor
        # plan analysis can type it: the default survives instead of
        # raising (GROUP BY $1 is positional-or-expression, ambiguous)
        schema = parameter_schema_for_sql(
            spark, "SELECT name FROM users GROUP BY $1"
        )
        assert schema.field("$1").type == pa.string()


class TestQualifierMetadata:
    """schema_metadata_test.rs:80-179 scenarios at the plans layer."""

    def test_simple_table_qualifier(self, spark):
        df = spark.sql("SELECT id, name FROM users")
        assert qualifier_metadata(df) == {"id": "users", "name": "users"}

    def test_subquery_and_join_aliases(self, spark):
        df = spark.sql(
            "SELECT u.id, u.name, o.amount FROM users u "
            "JOIN (SELECT * FROM orders WHERE amount > 25) o ON u.id = o.user_id"
        )
        assert qualifier_metadata(df) == {"id": "u", "name": "u", "amount": "o"}

    def test_computed_column_has_no_qualifier(self, spark):
        df = spark.sql("SELECT id + 1 AS next_id FROM users")
        assert "next_id" not in qualifier_metadata(df)

    def test_arrow_schema_metadata_flag(self, spark):
        df = spark.sql("SELECT id FROM users")
        with_md = arrow_schema_for_df(df, with_table_metadata=True)
        assert with_md.field("id").metadata[b"table_name"] == b"users"
        without = arrow_schema_for_df(df, with_table_metadata=False)
        assert not without.field("id").metadata or b"table_name" not in (
            without.field("id").metadata or {}
        )


class TestPlanCache:
    """Optional plan cache (SURVEY §7 H5) — off by default like the
    stateless reference; opt-in returns identical DataFrames for repeated
    (sql, params)."""

    def test_disabled_by_default(self, spark):
        engine = Engine(spark)
        a = engine.sql_to_plan("SELECT * FROM users")
        b = engine.sql_to_plan("SELECT * FROM users")
        assert a is not b

    def test_cache_hit_and_param_sensitivity(self, spark):
        engine = Engine(spark, plan_cache_size=4)
        a = engine.sql_to_plan("SELECT * FROM users WHERE id = $1", [1])
        b = engine.sql_to_plan("SELECT * FROM users WHERE id = $1", [1])
        c = engine.sql_to_plan("SELECT * FROM users WHERE id = $1", [2])
        assert a is b and a is not c
        assert [r.id for r in c.collect()] == [2]

    def test_lru_eviction_and_clear(self, spark):
        engine = Engine(spark, plan_cache_size=2)
        a = engine.sql_to_plan("SELECT 1 AS x")
        engine.sql_to_plan("SELECT 2 AS x")
        engine.sql_to_plan("SELECT 3 AS x")  # evicts "SELECT 1"
        assert engine.sql_to_plan("SELECT 1 AS x") is not a
        engine.clear_plan_cache()
        assert len(engine._plan_cache) == 0


class TestExecuteStream:
    """Streamed delivery (service.rs:186-191; SURVEY §7 H1)."""

    def test_multibatch_bounded_stream(self, spark):
        engine = Engine(spark)
        df = spark.range(0, 10_000, 1, 8).select(F.col("id").cast("bigint"))
        batches = list(engine.execute_stream(df, batch_rows=1000))
        assert len(batches) == 10  # never one giant batch
        assert sum(b.num_rows for b in batches) == 10_000
        ids = [v for b in batches for v in b.column("id").to_pylist()]
        assert sorted(ids) == list(range(10_000))

    def test_stream_values_match_collect(self, spark):
        engine = Engine(spark)
        df = spark.sql(
            "SELECT id, name FROM users ORDER BY id"
        )
        batches = list(engine.execute_stream(df))
        table = pa.Table.from_batches(batches)
        assert table.column("name").to_pylist() == ["Alice", "Bob", "Charlie"]

    def test_arrow_path_engaged(self, spark, monkeypatch):
        # The serving hot path must be the executor-side IPC encode
        # (mapInArrow), never the row-at-a-time fallback: poison the
        # fallback and stream a multi-partition, multi-type result.
        engine = Engine(spark)

        def _boom(*a, **k):
            raise AssertionError("row-at-a-time fallback used on Arrow-able plan")
            yield  # pragma: no cover

        monkeypatch.setattr(engine, "_execute_stream_rows", _boom)
        df = spark.range(0, 20_000, 1, 4).selectExpr(
            "id",
            "cast(id as double) AS d",
            "cast(id as string) AS s",
            "array(id, id + 1) AS arr",
            "named_struct('a', id) AS st",
            "id % 2 = 0 AS b",
            "timestamp_micros(id) AS ts",
        )
        table = pa.Table.from_batches(list(engine.execute_stream(df, batch_rows=4096)))
        assert table.num_rows == 20_000
        assert table.column("arr").to_pylist()[1] == [1, 2]

    def test_empty_result_streams_nothing(self, spark):
        engine = Engine(spark)
        df = spark.range(10).where("id < 0")
        assert list(engine.execute_stream(df)) == []

    def test_probe_reads_through_empty_leading_partitions(
        self, spark, monkeypatch
    ):
        # A selective filter often leaves partition 0 empty; the probe must
        # read through empties to the first non-empty pull (the round-6
        # continuation review fix: a [0]-only probe proved nothing about
        # the Arrow path and mis-sized the group loop).
        engine = Engine(spark)

        def _boom(*a, **k):
            raise AssertionError("fallback used on Arrow-able plan")
            yield  # pragma: no cover

        monkeypatch.setattr(engine, "_execute_stream_rows", _boom)
        df = spark.range(0, 100, 1, 8).where("id >= 90")
        batches = list(engine.execute_stream(df))
        assert sorted(
            v for b in batches for v in b.column("id").to_pylist()
        ) == list(range(90, 100))

    def test_rddless_session_streams_arrow_not_rows(self, spark, monkeypatch):
        # Spark Connect has no RDD API: the stream must fall back to the
        # Arrow toLocalIterator path, NOT the row-at-a-time decode (the
        # round-6 continuation review found Connect silently degraded).
        from pyspark.sql import DataFrame

        engine = Engine(spark)

        def _no_rdd(self):
            raise Exception("RDD API unsupported (Connect)")

        monkeypatch.setattr(DataFrame, "rdd", property(_no_rdd))

        def _boom(*a, **k):
            raise AssertionError("row-at-a-time fallback used")
            yield  # pragma: no cover

        monkeypatch.setattr(engine, "_execute_stream_rows", _boom)
        df = spark.range(0, 5_000, 1, 4).selectExpr(
            "id", "cast(id as string) AS s"
        )
        batches = list(engine.execute_stream(df, batch_rows=1024))
        assert sum(b.num_rows for b in batches) == 5_000
        # empty results also resolve through the iterator path
        assert list(engine.execute_stream(spark.range(10).where("id < 0"))) == []


class TestProbePoisoning:
    def test_paging_placeholder_does_not_poison_plan_probe(self, spark):
        # $2 (LIMIT) is grammar-typed; $1 needs the plan probe — a string
        # marker in LIMIT used to fail the whole analysis and leave $1 at
        # the string default (round-5 final review)
        schema = parameter_schema_for_sql(
            spark, "SELECT * FROM users WHERE abs(id) > $1 LIMIT $2"
        )
        assert schema.field("$1").type == pa.int32()  # cast-stripped sibling
        assert schema.field("$2").type == pa.int64()

    def test_cte_wrapped_dml_never_probe_executed(self, spark, tmp_path):
        # Round-6 regression (ADVICE r5 medium): the head regex admits
        # `WITH cte AS (...) INSERT INTO ...`, and spark.sql() executes
        # command plans EAGERLY — schema inference must never write the
        # '<!p:N!>' marker rows into a user table.
        spark.sql(
            "CREATE TABLE probe_guard_t(x INT) USING parquet "
            f"LOCATION '{tmp_path}/probe_guard_t'"
        )
        try:
            schema = parameter_schema_for_sql(
                spark,
                "WITH c AS (SELECT 1 AS y) "
                "INSERT INTO probe_guard_t SELECT y FROM c WHERE y > $1",
            )
            # typing degrades safely to the string default...
            assert schema.field("$1").type == pa.string()
            # ...and, the point: nothing executed during inference
            assert spark.table("probe_guard_t").count() == 0
        finally:
            spark.sql("DROP TABLE probe_guard_t")
