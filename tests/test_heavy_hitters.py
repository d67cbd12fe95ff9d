"""Space-Saving heavy-hitter operator: sketch guarantee, exactness
certificate, and adversarial streams (operators/heavy_hitters.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.operators.heavy_hitters import (
    space_saving_partials,
    topk_exact_via_sketch,
    topk_sketch_plan,
)


def _stream(spark, items, partitions=4):
    return spark.createDataFrame(
        [(w,) for w in items], "word string"
    ).repartition(partitions)


class TestSpaceSaving:
    def test_partials_contain_every_partition_heavy_key(self, spark):
        # 'hot' is > n/capacity globally, so it must survive into the union
        items = ["hot"] * 400 + [f"cold{i}" for i in range(900)]
        df = _stream(spark, items, partitions=4)
        partials = space_saving_partials(df, "word", capacity=8).collect()
        keys = {r.key for r in partials if r.w > 0}
        assert "hot" in keys
        # summaries are bounded: at most capacity counters + 1 total row
        # per partition, and the total rows reconstruct N exactly
        assert len(partials) <= (8 + 1) * 4
        assert -sum(r.w for r in partials if r.w < 0) == len(items)

    def test_weights_are_upper_bounds(self, spark):
        # Space-Saving counters OVERestimate (an evicted minimum's value is
        # inherited), and a key's counter is always >= its true local count
        items = ["a"] * 100 + ["b"] * 50 + [f"x{i}" for i in range(200)]
        df = _stream(spark, items, partitions=2)
        merged = {
            r.key: r.w
            for r in space_saving_partials(df, "word", capacity=16)
            .filter(F.col("w") > 0)
            .groupBy("key")
            .agg(F.sum("w").alias("w"))
            .collect()
        }
        true = {"a": 100, "b": 50}
        for k, n in true.items():
            assert merged.get(k, 0) >= n

    def test_topk_is_exact_when_certified(self, spark):
        items = (
            ["alpha"] * 300
            + ["beta"] * 200
            + ["gamma"] * 100
            + [f"noise{i}" for i in range(500)]
        )
        df = _stream(spark, items, partitions=4)
        got = topk_exact_via_sketch(df, "word", k=3, capacity=64).collect()
        assert [(r.word, r.n) for r in got] == [
            ("alpha", 300),
            ("beta", 200),
            ("gamma", 100),
        ]

    def test_certificate_rejects_flat_distribution(self, spark):
        # every key appears once: the k-th count can never clear N/capacity,
        # so the operator must refuse rather than silently approximate
        items = [f"u{i}" for i in range(2000)]
        df = _stream(spark, items, partitions=4)
        with pytest.raises(ValueError, match="cannot certify"):
            topk_exact_via_sketch(df, "word", k=5, capacity=16)

    def test_k_must_be_below_capacity(self, spark):
        df = _stream(spark, ["a", "b"], partitions=1)
        with pytest.raises(ValueError, match="k=8"):
            topk_exact_via_sketch(df, "word", k=8, capacity=8)

    def test_candidate_union_stays_distributed(self, spark):
        # The candidate side must derive from the scan (MapInArrow lineage),
        # never from a driver-side collect + createDataFrame round-trip: at
        # 100 TB the union is partitions x capacity rows — multi-GB through
        # the driver. A LocalTableScan in the top-k plan would be that
        # round-trip reappearing.
        items = ["hot"] * 50 + [f"c{i}" for i in range(100)]
        df = _stream(spark, items, partitions=4)
        top, total_df, partials = topk_sketch_plan(df, "word", k=2, capacity=32)
        try:
            plan = top._jdf.queryExecution().executedPlan().toString()
            assert "MapInArrow" in plan or "InMemory" in plan, plan
            assert "LocalTableScan" not in plan, plan
            # N comes back as ONE scalar, not the whole candidate union
            assert total_df.first()["n_total"] == len(items)
        finally:
            partials.unpersist()

    def test_nulls_are_ignored(self, spark):
        df = spark.createDataFrame(
            [("a",), (None,), ("a",), ("b",), (None,)], "word string"
        ).repartition(2)
        got = topk_exact_via_sketch(df, "word", k=1, capacity=8).collect()
        assert [(r.word, r.n) for r in got] == [("a", 2)]
