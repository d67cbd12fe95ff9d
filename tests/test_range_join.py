"""Band join edge semantics (operators/range_join.py).

The oracle-parity harness covers bulk behavior (event_band_join vs a DuckDB
range predicate); these tests pin the edges: inclusive ±width boundaries,
key isolation, bucket-boundary pairs (the explode must catch neighbors in
adjacent buckets), and the no-nested-loop plan shape.
"""

import datetime

from datafusion_flight_sql_server_spark.operators.range_join import band_join


def _ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(7200)), (101, 2, _ts(7200))],
        "purchase_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(3600), 10.0),   # exactly -width -> inclusive match
            (1, _ts(10800), 20.0),  # exactly +width -> inclusive match
            (1, _ts(3599), 30.0),   # one second beyond -> excluded
            (1, _ts(7199), 40.0),   # adjacent bucket (7199//3600=1, left=2)
            (2, _ts(7200), 50.0),   # other key: only matches purchase 101
        ],
        "user_id bigint, ts timestamp, value double",
    )
    return left, right


class TestBandJoin:
    def test_inclusive_bounds_buckets_and_keys(self, spark):
        left, right = _frames(spark)
        pairs = band_join(left, right, width_seconds=3600, right_cols=("value",))
        got = {
            (r.purchase_id, r.value_r) for r in pairs.collect()
        }
        assert got == {(100, 10.0), (100, 20.0), (100, 40.0), (101, 50.0)}

    def test_no_nested_loop_in_plan(self, spark):
        left, right = _frames(spark)
        plan = (
            band_join(left, right, right_cols=("value",))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "NestedLoop" not in plan and "Cartesian" not in plan
