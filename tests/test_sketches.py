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


# -- Count-Min sketch (operators/sketches.py) --------------------------------


def _tok(df):
    return df.select(
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x != '')")
        ).alias("word")
    )


def test_count_min_merge_of_slices_matches_single_pass(spark):
    """Cell-wise addition of per-source sketches equals the single-pass
    sketch — the associative-merge property that lets 100 TB rollups
    combine per-day/per-partition sketches without re-scanning rows."""
    from datafusion_flight_sql_server_spark.operators.sketches import (
        count_min_cells,
        count_min_merge,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    one_pass = {
        (r.r, r.b): r.cell
        for r in count_min_cells(_tok(docs), "word").collect()
    }
    sources = [row.source for row in docs.select("source").distinct().collect()]
    parts = [
        count_min_cells(_tok(docs.filter(F.col("source") == s)), "word")
        for s in sources
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionAll(p)
    merged = {
        (r.r, r.b): r.cell for r in count_min_merge(union).collect()
    }
    assert merged == one_pass


def test_count_min_streaming_merge_matches_batch(spark, tmp_path):
    """foreachBatch merges each micro-batch's sketch into an accumulator;
    after the stream drains, the accumulated sketch equals the batch
    sketch and every point estimate over-approximates the exact count."""
    from datafusion_flight_sql_server_spark.operators.sketches import (
        count_min_cells,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "docs_stream")
    # several files -> several micro-batches with maxFilesPerTrigger=1
    docs.repartition(4).write.parquet(src)

    acc: dict[tuple[int, int], int] = {}

    def merge_batch(batch_df, batch_id):
        for r in count_min_cells(_tok(batch_df), "word").collect():
            key = (r.r, r.b)
            acc[key] = acc.get(key, 0) + r.cell

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch = {
        (r.r, r.b): r.cell
        for r in count_min_cells(_tok(docs), "word").collect()
    }
    assert acc == batch

    # one-sided guarantee: est >= exact for every word
    exact = {
        r.word: r["count"]
        for r in _tok(docs).groupBy("word").count().collect()
    }
    import hashlib

    def bucket(word, row, width=32):
        h = hashlib.md5(f"{word}#{row}".encode()).hexdigest()
        return int(h[:12], 16) % width

    for word, c in exact.items():
        est = min(acc[(r, bucket(word, r))] for r in range(4))
        assert est >= c
