"""Mergeable-sketch aggregation (Spark 4 Apache DataSketches HLL).

The 100 TB pattern behind approx_count_distinct-style rollups: build HLL
sketches once per fine-grained slice, persist/ship the binary sketches,
and answer any coarser rollup by UNIONING sketches — never re-scanning
rows. These tests pin (a) the two-level estimate equals the single-pass
estimate (merge correctness), and (b) the estimate is within HLL error of
the exact count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_hll_union_of_slices_matches_single_pass(spark):
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")

    one_pass = (
        events.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")
        ).collect()[0]["n"]
    )
    merged = (
        events.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .collect()[0]["n"]
    )
    assert merged == one_pass  # same sketch params → identical merged state


def test_hll_estimate_within_error_of_exact(spark):
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    exact = events.select("user_id").distinct().count()
    est = (
        events.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")
        ).collect()[0]["n"]
    )
    assert abs(est - exact) / exact < 0.05
