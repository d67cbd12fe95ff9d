"""Sink tests: partition pruning and shuffle-free bucketed joins.

These pin the write-side layout contracts that matter at 100 TB: a reader
filtering on a partition column must prune at planning time (zero I/O for
other partitions), and two tables bucketed on the join key must
sort-merge-join with no Exchange on either side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.operators.sink import (
    write_bucketed,
    write_partitioned,
)
from tests.conftest import SF_SMALL


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPartitionedSink:
    def test_roundtrip_and_partition_pruning(self, spark, tmp_path):
        orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        out = str(tmp_path / "orders_by_status")
        write_partitioned(orders, out, ["o_orderstatus"])

        back = spark.read.parquet(out)
        # values survive the round trip (partition col moves to the dir key)
        assert back.count() == orders.count()
        # decimal-cast sum: exact, order-independent (the write reorders rows)
        exact = F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
        assert back.agg(exact).first()[0] == orders.agg(exact).first()[0]

        filtered = back.filter(F.col("o_orderstatus") == "F")
        plan = _executed_plan(filtered)
        # the predicate must prune directories at planning time, not filter rows
        assert "PartitionFilters" in plan
        assert "o_orderstatus" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
        assert (
            filtered.count()
            == orders.filter(F.col("o_orderstatus") == "F").count()
        )

    def test_max_records_per_file_splits_output(self, spark, tmp_path):
        orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        out = str(tmp_path / "orders_split")
        write_partitioned(
            orders, out, ["o_orderstatus"], max_records_per_file=100
        )
        files = [
            f
            for f in (tmp_path / "orders_split").rglob("*.parquet")
            if f.is_file()
        ]
        # 1500 rows / cap 100 => well more than one file per partition dir
        assert len(files) > 3


class TestBucketedSink:
    @pytest.fixture()
    def no_broadcast(self, spark):
        """Force SMJ so the no-Exchange assertion tests bucketing, not AQE
        broadcast conversion."""
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        yield
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_bucketed_join_has_no_exchange(self, spark, tmp_path, no_broadcast):
        orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        write_bucketed(
            orders.select("o_orderkey", "o_totalprice", "o_orderstatus"),
            "t_orders_bkt",
            "o_orderkey",
            4,
            sort_cols=["o_orderkey"],
            path=str(tmp_path / "orders_bkt"),
        )
        write_bucketed(
            lineitem.select("l_orderkey", "l_quantity"),
            "t_lineitem_bkt",
            "l_orderkey",
            4,
            sort_cols=["l_orderkey"],
            path=str(tmp_path / "lineitem_bkt"),
        )
        try:
            joined = spark.table("t_lineitem_bkt").join(
                spark.table("t_orders_bkt"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = _executed_plan(joined)
            # the whole point of bucketing: co-located join, no shuffle
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            expected = lineitem.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            ).count()
            assert joined.count() == expected

            # aggregation on the bucket key also skips the shuffle
            agg = (
                spark.table("t_lineitem_bkt")
                .groupBy("l_orderkey")
                .agg(F.sum("l_quantity").alias("q"))
            )
            assert "Exchange" not in _executed_plan(agg)
        finally:
            spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
            spark.sql("DROP TABLE IF EXISTS t_lineitem_bkt")


class TestCompaction:
    def test_compact_small_files(self, spark, tmp_path):
        from datafusion_flight_sql_server_spark.operators.sink import compact

        orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        src = str(tmp_path / "fragmented")
        # fragment: 50 partitions => 50 tiny files
        orders.repartition(50).write.parquet(src)
        n_in = len([f for f in (tmp_path / "fragmented").rglob("*.parquet")])
        assert n_in >= 50

        dst = str(tmp_path / "compacted")
        n_declared = compact(spark, src, dst, target_file_bytes=256 * 1024)
        files_out = [f for f in (tmp_path / "compacted").rglob("*.parquet")]
        assert len(files_out) == n_declared < n_in

        back = spark.read.parquet(dst)
        exact = F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
        assert back.count() == orders.count()
        assert back.agg(exact).first()[0] == orders.agg(exact).first()[0]


class TestClusteredSink:
    def test_file_ranges_are_disjoint_and_skippable(self, spark, tmp_path):
        """Clustered layout contract: every output file covers a
        non-overlapping user_id range (footer min/max proves any reader
        can skip files), and a point predicate matches at most one file."""
        import pyarrow.parquet as pq
        from pathlib import Path

        from datafusion_flight_sql_server_spark.operators.sink import (
            write_clustered,
        )

        events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
        out = tmp_path / "events_clustered"
        write_clustered(events, str(out), ["user_id"], n_files=4)

        ranges = []
        for f in sorted(Path(out).glob("*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("user_id")
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            ranges.append((min(mins), max(maxs)))
        assert len(ranges) > 1
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            # range partitioning may put a boundary key in either file but
            # interiors must not interleave
            assert hi1 <= lo2, f"overlapping file ranges {ranges}"

        # a point lookup is containable in exactly one file's range
        probe = ranges[1][0] + (ranges[1][1] - ranges[1][0]) // 2
        holders = [r for r in ranges if r[0] <= probe <= r[1]]
        assert len(holders) == 1

    def test_roundtrip_preserves_rows(self, spark, tmp_path):
        from datafusion_flight_sql_server_spark.operators.sink import (
            write_clustered,
        )

        events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
        out = str(tmp_path / "events_clustered_rt")
        write_clustered(events, out, ["user_id"], n_files=4)
        back = spark.read.parquet(out)
        assert back.count() == events.count()
        got = back.agg(F.sum("event_id")).collect()[0][0]
        want = events.agg(F.sum("event_id")).collect()[0][0]
        assert got == want


class TestZOrder:
    def test_buckets_cover_small_rectangles(self, spark, tmp_path):
        """Z-order layout contract: every bucket's (x, y) bounding box covers
        at most 1/8 of the scaled key plane (top-3 z-bits fix one x bit and
        two y bits), so footer min/max stats can skip buckets for selective
        predicates on EITHER dimension — the property single-key clustering
        cannot provide."""
        from pathlib import Path

        from datafusion_flight_sql_server_spark.operators.sink import (
            write_zorder,
        )

        li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
            "l_orderkey", "l_partkey", "l_suppkey"
        )
        out = tmp_path / "li_zorder"
        write_zorder(li, str(out), "l_partkey", "l_suppkey", bits=16, n_buckets=8)

        back = spark.read.parquet(str(out))
        boxes = (
            back.groupBy("__zbucket")
            .agg(
                F.min("__zx").alias("x0"),
                F.max("__zx").alias("x1"),
                F.min("__zy").alias("y0"),
                F.max("__zy").alias("y1"),
            )
            .collect()
        )
        assert len(boxes) == 8
        full = 65536 * 65536
        for b in boxes:
            area = (b.x1 - b.x0 + 1) * (b.y1 - b.y0 + 1)
            assert area <= full // 8, (
                f"bucket {b.__zbucket} bbox {(b.x0, b.x1, b.y0, b.y1)} "
                f"covers {area / full:.3f} of the plane"
            )
        # buckets partition the data
        assert back.count() == li.count()

    def test_zorder_sql_engine_parity(self, spark):
        """The generated Morton formula evaluates identically in Spark and
        DuckDB (pure integer arithmetic, only the DIV token differs)."""
        import duckdb

        from datafusion_flight_sql_server_spark.operators.sink import (
            zorder_sql,
        )

        spark_z = spark.sql(
            "SELECT xs, ys, CAST("
            + zorder_sql("xs", "ys", bits=8, idiv="DIV")
            + " AS BIGINT) AS z FROM "
            "(SELECT id % 256 AS xs, (id * 7) % 256 AS ys FROM range(500))"
        ).collect()
        duck_z = duckdb.connect().execute(
            "SELECT xs, ys, CAST("
            + zorder_sql("xs", "ys", bits=8, idiv="//")
            + " AS BIGINT) AS z FROM "
            "(SELECT i % 256 AS xs, (i * 7) % 256 AS ys "
            " FROM range(500) t(i))"
        ).fetchall()
        assert sorted(tuple(r) for r in spark_z) == sorted(
            tuple(r) for r in duck_z
        )
        # spot-check the interleave definition itself
        by_xy = {(r.xs, r.ys): r.z for r in spark_z}
        for (xs, ys), z in list(by_xy.items())[:32]:
            expect = 0
            for i in range(8):
                expect |= ((xs >> i) & 1) << (2 * i)
                expect |= ((ys >> i) & 1) << (2 * i + 1)
            assert z == expect
