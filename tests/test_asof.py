"""As-of join edge semantics (operators/asof.py).

The oracle-parity harness covers the bulk behavior (event_asof_join vs
DuckDB ASOF LEFT JOIN); these tests pin the edges the fixture may not hit:
inclusive equal-timestamp matching, duplicate-right-timestamp tie-break,
left-outer nulls, and the no-join-node plan shape.
"""

import datetime

from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.operators.asof import asof_join


def _ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(10)), (101, 1, _ts(20)), (102, 2, _ts(5))],
        "event_id bigint, user_id bigint, ts timestamp",
    ).select(F.col("event_id").alias("purchase_id"), "user_id", "ts")
    right = spark.createDataFrame(
        [
            (1, _ts(10), 7, 1.5),   # equal ts -> inclusive match for 100
            (1, _ts(10), 9, 2.5),   # duplicate ts: max event_id (9) wins
            (1, _ts(15), 3, 9.9),   # between the two purchases
            (2, _ts(6), 4, 4.0),    # AFTER user 2's purchase -> no match
        ],
        "user_id bigint, ts timestamp, event_id bigint, value double",
    )
    return left, right


class TestAsofJoin:
    def test_inclusive_tiebreak_and_outer(self, spark):
        left, right = _frames(spark)
        rows = {
            r.purchase_id: r
            for r in asof_join(left, right).collect()
        }
        assert len(rows) == 3
        # equal-ts match is inclusive, duplicate right ts resolved to max id
        assert rows[100].event_id_r == 9 and rows[100].value_r == 2.5
        # later purchase sees the later view
        assert rows[101].event_id_r == 3 and rows[101].value_r == 9.9
        # right row after the purchase: left-outer nulls
        assert rows[102].event_id_r is None and rows[102].value_r is None
        assert rows[102].ts_r is None

    def test_strict_excludes_equal_timestamp(self, spark):
        # round 12: inclusive=False — a right row AT the left timestamp
        # is invisible (pandas allow_exact_matches=False / prior-tick);
        # everything earlier still carries forward
        left, right = _frames(spark)
        rows = {
            r.purchase_id: r
            for r in asof_join(left, right, inclusive=False).collect()
        }
        assert len(rows) == 3
        # purchase 100 at ts=10: both ts=10 views invisible, nothing earlier
        assert rows[100].event_id_r is None and rows[100].ts_r is None
        # purchase 101 at ts=20: ts=15 strictly earlier -> still matches
        assert rows[101].event_id_r == 3 and rows[101].value_r == 9.9
        assert rows[102].event_id_r is None

    def test_no_join_node_in_plan(self, spark):
        left, right = _frames(spark)
        for inclusive in (True, False):
            plan = (
                asof_join(left, right, inclusive=inclusive)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            # union + single window, never a range join
            assert "Join" not in plan


class TestAsofJoinNearest:
    def test_direction_pick_tie_and_outer(self, spark):
        from datafusion_flight_sql_server_spark.operators.asof import (
            asof_join_nearest,
        )

        left = spark.createDataFrame(
            [
                (200, 1, _ts(10)),  # back at 8 (gap 2) vs fwd at 13 (gap 3)
                (201, 1, _ts(16)),  # fwd-only nearer: back 13? no: back at 13 (3) vs fwd at 17 (1)
                (202, 2, _ts(10)),  # equal gaps (8 and 12, gap 2): backward wins
                (203, 3, _ts(10)),  # no right rows for user 3 -> nulls
                (204, 4, _ts(10)),  # forward-only (right at 30)
            ],
            "event_id bigint, user_id bigint, ts timestamp",
        ).select(F.col("event_id").alias("purchase_id"), "user_id", "ts")
        right = spark.createDataFrame(
            [
                (1, _ts(8), 1, 1.0),
                (1, _ts(13), 2, 2.0),
                (1, _ts(17), 3, 3.0),
                (2, _ts(8), 4, 4.0),
                (2, _ts(12), 5, 5.0),
                (4, _ts(30), 6, 6.0),
            ],
            "user_id bigint, ts timestamp, event_id bigint, value double",
        )
        rows = {
            r.purchase_id: r for r in asof_join_nearest(left, right).collect()
        }
        assert rows[200].event_id_r == 1  # backward gap 2 < forward gap 3
        assert rows[201].event_id_r == 3  # forward gap 1 < backward gap 3
        assert rows[202].event_id_r == 4  # tie (2 vs 2) -> backward
        assert rows[203].event_id_r is None  # no right rows at all
        assert rows[204].event_id_r == 6  # forward-only key matches

    def test_fractional_timestamps_keep_subunit_gaps(self, spark):
        # DOUBLE timestamps must compare in their own type: a long cast
        # truncates |1.9-1.2|=0.7 to 0 and |2.1-1.9|=0.2 to 1, flipping
        # the nearest pick (round-5 review bug)
        from datafusion_flight_sql_server_spark.operators.asof import (
            asof_join_nearest,
        )

        left = spark.createDataFrame(
            [(100, 1, 1.9)], "purchase_id bigint, user_id bigint, ts double"
        )
        right = spark.createDataFrame(
            [(1, 1.2, 1, 1.0), (1, 2.1, 2, 2.0)],
            "user_id bigint, ts double, event_id bigint, value double",
        )
        rows = {
            r.purchase_id: r for r in asof_join_nearest(left, right).collect()
        }
        assert rows[100].event_id_r == 2  # forward gap 0.2 < backward 0.7

    def test_single_shuffle_no_join_node(self, spark):
        from datafusion_flight_sql_server_spark.operators.asof import (
            asof_join_nearest,
        )

        left, right = _frames(spark)
        plan = (
            asof_join_nearest(left, right)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # both directional candidates come from one window pass: no join
        # operator of any kind in the plan
        for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                     "CartesianProduct", "BroadcastNestedLoopJoin"):
            assert node not in plan
