"""Structured Streaming tests.

The batch windowed aggregations double as the oracle for the streaming form
(streaming/windows.py): the same F.window expression behind readStream +
watermark must converge to the batch answer once all input is processed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.streaming.windows import (
    streaming_tumbling_counts,
    tumbling_counts,
)

from tests.conftest import SF_SMALL


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    # stage the events fixture as a parquet stream source with a streamable
    # timestamp column (the raw fixture is TIMESTAMP(NANOS) → stage as ts)
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    src = str(tmp_path / "events_stream")
    staged = events.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )
    staged.write.parquet(src)

    q = streaming_tumbling_counts(
        spark, src, staged.schema, duration="1 hour", query_name="t_out"
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.event_type): r.n
            for r in spark.sql("SELECT * FROM t_out").collect()
        }
    finally:
        q.stop()

    want = {
        (r.window_start, r.event_type): r.n
        for r in tumbling_counts(staged, duration="1 hour")
        .select("window_start", "event_type", "n")
        .collect()
    }
    # update-mode memory sink may retain superseded rows for a key; the final
    # value per key must equal the batch result, and all keys must be present
    assert set(got) == set(want)
    assert got == want
