"""Event-time windowed aggregation — batch + Structured Streaming forms.

The reference has no stream processing (SURVEY.md §2.B Streaming: the word
"stream" in the reference only ever means result transport, reference:
datafusion-flight-sql-server/src/service.rs:45,186-191). These operators are
north-star extensions over the ``events`` fixture.

The batch form uses ``F.window`` (the same expression Structured Streaming
compiles); the streaming form wires the identical aggregation behind
``readStream`` + watermark, so batch results double as the streaming oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window count + exact value sum per (window, event_type).

    Window start is emitted as epoch seconds (BIGINT) — portable across
    engines and timezones.
    """
    ts = F.col(ts_col).cast("timestamp")
    return (
        events.groupBy(F.window(ts, duration).alias("w"), type_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("window_start"),
            type_col,
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Sliding-window event counts (each event lands in duration/slide
    windows)."""
    ts = F.col(ts_col).cast("timestamp")
    return (
        events.groupBy(F.window(ts, duration, slide).alias("w"), type_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("window_start"),
            type_col,
            "n",
        )
    )


def streaming_tumbling_counts(
    spark: SparkSession,
    parquet_dir: str,
    schema,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "tumbling_out",
):
    """Structured Streaming form: readStream(parquet) → watermark → windowed
    agg → memory sink. Returns the StreamingQuery; callers
    ``processAllAvailable()`` then read ``spark.sql(f"SELECT * FROM
    {query_name}")``.

    The watermark bounds state for late data; ``update`` mode emits window
    updates as batches arrive.
    """
    stream = (
        spark.readStream.schema(schema).parquet(parquet_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("window_start"),
            "event_type",
            "n",
        )
    )
    return (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
