"""Driver-checkable batch twins of the streaming operators.

The ``streaming/`` family (sessionize_stream, scd2_stream) was previously
verified only by pytest stream-vs-batch parity tests — the driver's
CORRECTNESS gate never saw it. These queries run the REAL streaming
operators (``applyInPandasWithState`` state-store execution, file-stream
source, memory sink) under a deterministic single-micro-batch contract so
a SQL oracle can hash-check the output:

- the scale-factor events are staged as ONE parquet file and consumed with
  ``trigger(availableNow=True)`` — one micro-batch containing the whole
  history, so the per-user fold sees events in (ts, event_id) order exactly
  like the batch operator;
- only CLOSED outputs are emitted (a gap-closed session, a superseded SCD-2
  version); the open tail lives in the state store and is deliberately NOT
  flushed (no timeout fires under availableNow), which the oracle mirrors
  by excluding each user's final session / open version.

Reference parity: the reference's streaming surface is delivery-only
(execute_stream, service.rs:274-303) — stateful streaming operators are a
§2.C extension; the invariants verified here are the ones the pytest
parity suite (tests/test_stateful_streaming.py, tests/test_streaming.py)
pins against the batch forms.

Scale: state is hash-partitioned by user_id (the same single exchange as
the batch forms); at 100 TB the same operators run with a real trigger and
watermark, and per-batch cost is O(batch), not O(history).
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.queries.catalog import query, tables
from datafusion_flight_sql_server_spark.queries.pipeline_q import _SCD2_DIM_SQL


def _run_stream_once(
    spark: SparkSession,
    sf: str,
    source: DataFrame,
    build_stream,
    sink_name: str,
) -> DataFrame:
    """Stage ``source`` as one parquet file, run ``build_stream(reader)``
    through a memory sink with availableNow, return the sink table."""
    stage = str(
        Path(tempfile.gettempdir())
        / f"stream_stage_{sink_name}_{Path(sf).name}"
    )
    source.coalesce(1).write.mode("overwrite").parquet(stage)
    reader = spark.readStream.schema(source.schema).parquet(stage)
    # a previous invocation's memory-sink table would collide with the new
    # query's temp view of the same name
    try:
        spark.catalog.dropTempView(sink_name)
    except Exception:
        pass
    q = (
        build_stream(reader)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(300)
    finally:
        if q.isActive:  # pragma: no cover - hung stream
            q.stop()
    if q.exception() is not None:  # pragma: no cover - surfaced for driver
        raise q.exception()
    if not finished:  # pragma: no cover - timed out mid-batch
        # a stopped-on-timeout stream leaves a PARTIAL memory sink — it
        # must never flow into the correctness gate as if it were real
        raise TimeoutError(
            f"stream {sink_name!r} did not finish within 300 s; partial "
            f"sink discarded"
        )
    return spark.table(sink_name)


@query(
    "stream_sessionize_batch",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ep,
                   CASE WHEN CAST(epoch_us(ts) // 1000000 AS BIGINT)
                             - LAG(CAST(epoch_us(ts) // 1000000 AS BIGINT)) OVER w > 1800
                             OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT user_id, ep,
                   SUM(new_session) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM flagged
        ), sess AS (
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   COUNT(*) AS n_events,
                   CAST(MAX(ep) - MIN(ep) AS BIGINT) AS duration_s
            FROM numbered
            GROUP BY user_id, session_id
        )
        SELECT user_id, session_id, n_events, duration_s
        FROM sess
        WHERE session_id < (SELECT MAX(s2.session_id) FROM sess s2
                            WHERE s2.user_id = sess.user_id)
    """,
    doc="Streaming sessionization, driver-verified: the REAL "
    "applyInPandasWithState operator (streaming/stateful.py) runs over a "
    "file-stream source with availableNow and emits gap-closed sessions; "
    "the oracle is the batch sessionizer minus each user's still-open "
    "final session (which only a timeout would flush). This is the "
    "stream=batch invariant the pytest parity suite pins, now under the "
    "driver's hash gate.",
    tags=("streaming", "session", "stateful"),
)
def q_stream_sessionize_batch(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.streaming.stateful import (
        sessionize_stream,
    )

    e = tables(spark, sf)["events"].select("user_id", "ts", "event_id")
    # timers OFF: a ProcessingTimeTimeout firing mid-run would flush users'
    # final OPEN sessions nondeterministically (it did: +1 session per user
    # on a slow run), and a registered-but-unfired timer makes availableNow
    # keep scheduling empty micro-batches until it fires. The deterministic
    # contract is gap-closed sessions only, which the oracle mirrors.
    out = _run_stream_once(
        spark,
        sf,
        e,
        lambda reader: sessionize_stream(
            reader, gap_seconds=1800, timeout_ms=None
        ),
        "stream_sessionize_out",
    )
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("session_id").cast("bigint").alias("session_id"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("duration_s").cast("bigint").alias("duration_s"),
    )


@query(
    "stream_scd2_batch",
    oracle=f"""
        WITH {_SCD2_DIM_SQL}
        SELECT user_id, state, valid_from_us, valid_to_us, version
        FROM dim WHERE valid_to_us IS NOT NULL
    """,
    doc="Streaming SCD-2 maintenance, driver-verified: scd2_stream "
    "(streaming/scd2.py) folds the event history through the state store "
    "and emits each version exactly once when it CLOSES; the oracle is "
    "the batch SCD-2 dimension's closed rows (valid_to_us IS NOT NULL). "
    "Same user_id partitioning as the batch build.",
    tags=("streaming", "cdc", "stateful"),
)
def q_stream_scd2_batch(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.streaming.scd2 import scd2_stream

    e = tables(spark, sf)["events"].select(
        "user_id", "event_type", "event_id", "ts"
    )
    out = _run_stream_once(
        spark, sf, e, scd2_stream, "stream_scd2_out"
    )
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "state",
        F.col("valid_from_us").cast("bigint").alias("valid_from_us"),
        F.col("valid_to_us").cast("bigint").alias("valid_to_us"),
        F.col("version").cast("bigint").alias("version"),
    )
