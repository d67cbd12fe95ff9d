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
from datetime import timedelta
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.queries.catalog import query, tables
from datafusion_flight_sql_server_spark.queries.pipeline_q import _SCD2_DIM_SQL


def _await_memory_sink(
    spark: SparkSession, stream_df: DataFrame, sink_name: str
) -> DataFrame:
    """Run a streaming DataFrame into a FRESH memory sink with
    availableNow and return the sink table; raise on stream failure or
    timeout (a partial sink must never flow into the correctness gate).
    Single copy of the run protocol — every streaming twin goes through
    here regardless of how its source was staged."""
    # a previous invocation's memory-sink table would collide with the new
    # query's temp view of the same name
    try:
        spark.catalog.dropTempView(sink_name)
    except Exception:
        pass
    q = (
        stream_df.writeStream.outputMode("append")
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
        raise TimeoutError(
            f"stream {sink_name!r} did not finish within 300 s; partial "
            f"sink discarded"
        )
    return spark.table(sink_name)


def _stage_split_history(
    spark: SparkSession,
    sf: str,
    source: DataFrame,
    stage_name: str,
    ts_col: str = "ts",
) -> str:
    """Stage ``source`` as TWO parquet files split at the midpoint of
    ``ts_col``, with strictly increasing file mtimes, so a reader with
    ``maxFilesPerTrigger=1`` replays it as two MICRO-BATCHES in event-time
    order. Round 6 (VERDICT r5 #8): the single-file staging only exercised
    the one-batch fold; the split drives the incremental path — state
    written by batch 1 (open sessions, partially-aggregated windows below
    the watermark) must be picked up and continued by batch 2."""
    import time as _time

    stage = str(
        Path(tempfile.gettempdir())
        / f"stream_stage_{stage_name}_{Path(sf).name}"
    )
    mn, mx = source.agg(F.min(ts_col), F.max(ts_col)).collect()[0]
    cut = mn + (mx - mn) / 2  # mid-range, deliberately NOT a day boundary:
    # the window/session containing it spans both batches, so the merge of
    # batch-1 state with batch-2 rows is actually exercised
    source.filter(F.col(ts_col) <= F.lit(cut)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    batch1 = set(Path(stage).glob("part-*.parquet"))
    source.filter(F.col(ts_col) > F.lit(cut)).coalesce(1).write.mode(
        "append"
    ).parquet(stage)
    # The file source orders ties arbitrarily, and an order-sensitive fold
    # (SCD-2) would diverge if batch 2 replayed first — so the mtimes are
    # SET explicitly, not left to write timing (a 1 s-granularity
    # filesystem can tie two sub-second writes).
    import os as _os

    now = _time.time()
    for f in Path(stage).glob("part-*.parquet"):
        _os.utime(f, (now, now - 10 if f in batch1 else now))
    return stage


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
    doc="Streaming sessionization, driver-verified over TWO micro-batches "
    "(round 6): the REAL applyInPandasWithState operator "
    "(streaming/stateful.py) consumes the history split at the mid-range "
    "timestamp into two files (maxFilesPerTrigger=1, mtime order), so "
    "sessions open at the batch boundary are carried in the STATE STORE "
    "and continued by batch 2 — the incremental path, not just the "
    "single-batch fold. Emits gap-closed sessions; the oracle is the "
    "batch sessionizer minus each user's still-open final session (which "
    "only a timeout would flush).",
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
    stage = _stage_split_history(spark, sf, e, "sessionize2")
    reader = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    out = _await_memory_sink(
        spark,
        sessionize_stream(reader, gap_seconds=1800, timeout_ms=None),
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
    doc="Streaming SCD-2 maintenance, driver-verified over TWO "
    "micro-batches (round-6 late): scd2_stream (streaming/scd2.py) folds "
    "the history split at the mid-range timestamp (maxFilesPerTrigger=1, "
    "mtime order), so versions OPEN at the batch boundary are carried in "
    "the STATE STORE and must be closed by batch-2 state changes with "
    "the exact valid_from the batch-1 open recorded — the cross-batch "
    "version-continuation path, not just the single-batch fold. Each "
    "version emits exactly once when it CLOSES; the oracle is the batch "
    "SCD-2 dimension's closed rows (valid_to_us IS NOT NULL). Same "
    "user_id partitioning as the batch build.",
    tags=("streaming", "cdc", "stateful"),
)
def q_stream_scd2_batch(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.streaming.scd2 import scd2_stream

    e = tables(spark, sf)["events"].select(
        "user_id", "event_type", "event_id", "ts"
    )
    stage = _stage_split_history(spark, sf, e, "scd2x2")
    reader = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    out = _await_memory_sink(spark, scd2_stream(reader), "stream_scd2_out")
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "state",
        F.col("valid_from_us").cast("bigint").alias("valid_from_us"),
        F.col("valid_to_us").cast("bigint").alias("valid_to_us"),
        F.col("version").cast("bigint").alias("version"),
    )


@query(
    "stream_dedup_batch",
    oracle="""
        SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="Streaming exact deduplication, driver-verified over TWO "
    "micro-batches (round-6 late): Spark's stateful dropDuplicates runs "
    "over the history split at the mid-range timestamp "
    "(maxFilesPerTrigger=1, mtime order), so keys first seen in batch 1 "
    "are held in the STATE STORE and must suppress their batch-2 "
    "re-arrivals — with the mid-range cut, most (user_id, event_type) "
    "pairs occur on both sides, so the cross-batch suppression path is "
    "actually load-bearing, not just the within-batch fold. Emits each "
    "pair exactly once, at first arrival; the oracle is batch DISTINCT. "
    "The stream projects to the key columns before deduplicating so "
    "which physical row arrives first cannot leak into the output. At "
    "100 TB the production form is dropDuplicatesWithinWatermark (state "
    "bounded by event time); the state layout and single key-shuffle are "
    "identical.",
    tags=("streaming", "dedup", "stateful"),
)
def q_stream_dedup_batch(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"].select("user_id", "event_type", "ts")
    stage = _stage_split_history(spark, sf, e, "dedup2")
    reader = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    out = _await_memory_sink(
        spark,
        reader.select("user_id", "event_type").dropDuplicates(
            ["user_id", "event_type"]
        ),
        "stream_dedup_out",
    )
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"), "event_type"
    )


@query(
    "stream_tumbling_batch",
    oracle="""
        SELECT CAST(epoch_us(date_trunc('day', ts)) // 1000000 AS BIGINT)
                   AS window_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_value
        FROM events GROUP BY 1
    """,
    doc="Streaming event-time tumbling window (1 day) with a real "
    "watermark, driver-verified: the history is staged as file 1 and two "
    "far-future sentinel ticks as files 2-3 (later mtimes); "
    "maxFilesPerTrigger=1 forces one micro-batch per file, so by the "
    "sentinel-2 batch the watermark (advanced past sentinel 1) has "
    "provably crossed every history day window and append mode has "
    "emitted each exactly once — deterministic whether or not the engine "
    "runs a trailing no-data finalize batch. Sentinel windows are "
    "excluded by an epoch cutoff; the oracle is the batch day-window "
    "aggregation. This pins Spark's append-mode watermark EVICTION "
    "semantics, which the update-mode pytest coverage cannot see. Scale: "
    "state is O(open windows), the aggregation is the same partial-agg + "
    "one key shuffle as the batch form.",
    tags=("streaming", "window", "watermark"),
)
def q_stream_tumbling_batch(spark: SparkSession, sf: str) -> DataFrame:
    import time as _time

    e = tables(spark, sf)["events"].select("ts", "value")
    # two history files split mid-range (round 6): the day window
    # containing the cut gets rows from BOTH batches, so its partial
    # aggregate must survive the batch-1 watermark advance in state and
    # merge with batch 2 — the incremental path the single-file staging
    # never drove. At scale the high-watermark scalar below comes from
    # source metadata, not a scan.
    stage = _stage_split_history(spark, sf, e, "tumbling")
    max_ts = e.agg(F.max("ts")).collect()[0][0]  # driver scalar
    for days in (40, 80):
        sentinel = spark.createDataFrame(
            [(max_ts + timedelta(days=days), 0.0)], schema=e.schema
        )
        # distinct mtimes: the file source orders batches by mod time
        _time.sleep(0.1)
        sentinel.coalesce(1).write.mode("append").parquet(stage)
    agg = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start"))
            .cast("bigint")
            .alias("window_start"),
            "n_events",
            "total_value",
        )
    )
    out = _await_memory_sink(spark, agg, "stream_tumbling_out")
    # defensive: the sentinel's own window must never appear (it stays
    # open — no batch 3 advances the watermark past it)
    cutoff = int(max_ts.timestamp()) + 86400
    return out.filter(F.col("window_start") < F.lit(cutoff))


@query(
    "stream_interval_join_batch",
    oracle="""
        WITH v AS (
            SELECT event_id AS view_id, user_id, ts
            FROM events WHERE event_type = 'view'
        ), p AS (
            SELECT event_id AS purchase_id, user_id, ts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.purchase_id, v.view_id,
               CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
        FROM p JOIN v
          ON p.user_id = v.user_id
         AND v.ts <= p.ts
         AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
    doc="Stream-stream event-time interval join, driver-verified: the "
    "view and purchase streams (file sources, availableNow) inner-join "
    "on user within a [0, 30 min] event-time band, both sides carrying "
    "watermarks so the state buffer is bounded — the attribution join an "
    "event pipeline runs continuously. Inner stream-stream joins emit "
    "matches as both sides arrive (the watermark only bounds state "
    "eviction, not emission), so the finite-input output is exactly the "
    "batch interval join, which the oracle states as the naive range "
    "predicate. Gaps in exact signed microseconds. Scale: state is "
    "O(rows within the watermark horizon) per side, hash-partitioned by "
    "user_id.",
    tags=("streaming", "join", "range"),
)
def q_stream_interval_join_batch(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"]
    stages = {}
    for side, etype in (("views", "view"), ("purchases", "purchase")):
        stage = str(
            Path(tempfile.gettempdir())
            / f"stream_stage_ivj_{side}_{Path(sf).name}"
        )
        e.filter(F.col("event_type") == etype).select(
            "event_id", "user_id", "ts"
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        stages[side] = stage
    schema = "event_id BIGINT, user_id BIGINT, ts TIMESTAMP"
    views = (
        spark.readStream.schema(schema).parquet(stages["views"])
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
    )
    purchases = (
        spark.readStream.schema(schema).parquet(stages["purchases"])
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("buy_ts"),
        )
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("buy_ts"))
        & (F.col("buy_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select(
        "purchase_id",
        "view_id",
        (F.unix_micros(F.col("buy_ts")) - F.unix_micros(F.col("view_ts")))
        .cast("bigint")
        .alias("gap_us"),
    )
    return _await_memory_sink(spark, joined, "stream_ivj_out")
