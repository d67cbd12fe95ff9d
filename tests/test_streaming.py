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
    # timestamp column (the raw fixture may be TIMESTAMP(NANOS) or NTZ —
    # normalize through the registry's own conversion path)
    from datafusion_flight_sql_server_spark.engine import registry

    path = f"{SF_SMALL}/events.parquet"
    events = spark.read.parquet(path)
    src = str(tmp_path / "events_stream")
    staged = registry._fix_ntz_ts(
        registry._fix_nanos_ts(events, registry._nanos_ts_columns(path))
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


def test_watermark_drops_late_data(spark, tmp_path):
    """An event arriving after the watermark has passed its window must be
    excluded from the append-mode result — the bounded-state contract that
    lets the 100 TB streaming job not buffer history forever."""
    src = tmp_path / "late_src"
    src.mkdir()
    schema = "ts TIMESTAMP, event_type STRING"

    def write_batch(name, epochs):
        df = spark.createDataFrame(
            [(e,) for e in epochs], "ep BIGINT"
        ).select(
            F.timestamp_seconds("ep").alias("ts"),
            F.lit("click").alias("event_type"),
        )
        df.coalesce(1).write.parquet(str(src / name))

    base = 1_699_999_800  # multiple of 300s: window A = exactly [base, base+300)
    # batch 1: five events in window A, plus one 30 min later that advances
    # the watermark (max_ts - 10 min) past window A's end
    write_batch("b1", [base, base + 60, base + 120, base + 180, base + 240,
                       base + 1800])

    stream = (
        spark.readStream.schema(schema)
        .option("latestFirst", "false")
        .parquet(f"{src}/*")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp("w.start").cast("bigint").alias("window_start"),
            "n",
        )
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one LATE event for window A (watermark already at
        # base+1200) and one fresh event to trigger the batch
        write_batch("b2", [base + 60, base + 2400])
        q.processAllAvailable()
        got = {
            r.window_start: r.n
            for r in spark.sql("SELECT * FROM late_out").collect()
        }
    finally:
        q.stop()
        spark.catalog.dropTempView("late_out")

    # window A was finalized with the 5 on-time events; the late 6th was
    # dropped, not merged
    assert got.get(base) == 5


def test_streaming_parquet_sink_with_checkpoint(spark, tmp_path):
    """Stream → parquet-file sink with checkpointing: append-mode windowed
    rows land as files an ordinary batch reader can consume, and the
    checkpoint makes delivery resumable (the piece a 100 TB pipeline needs
    for exactly-once file output)."""
    src = tmp_path / "sink_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "ts TIMESTAMP, event_type STRING"

    def write_batch(name, epochs):
        df = spark.createDataFrame(
            [(e,) for e in epochs], "ep BIGINT"
        ).select(
            F.timestamp_seconds("ep").alias("ts"),
            F.lit("click").alias("event_type"),
        )
        df.coalesce(1).write.parquet(str(src / name))

    base = 1_699_999_800
    write_batch("b1", [base, base + 60, base + 120, base + 1800])

    def start():
        stream = (
            spark.readStream.schema(schema)
            .parquet(f"{src}/*")
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.unix_timestamp("w.start").cast("bigint").alias("window_start"),
                "n",
            )
        )
        return (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # restart from the checkpoint; new data finalizes window A
    write_batch("b2", [base + 2400])
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.window_start: r.n
        for r in spark.read.parquet(out).collect()
    }
    assert got.get(base) == 3  # the three window-A events, emitted once


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: replayed events (at-least-once
    sources duplicate on retry) are collapsed while the watermark bounds
    the dedup state — the streaming counterpart of dedup_exact that a
    100 TB ingest needs so state doesn't grow with the full history."""
    src = tmp_path / "dedup_src"
    src.mkdir()
    schema = "ts TIMESTAMP, event_id BIGINT"

    def write_batch(name, rows):
        df = spark.createDataFrame(rows, "ep BIGINT, event_id BIGINT").select(
            F.timestamp_seconds("ep").alias("ts"), "event_id"
        )
        df.coalesce(1).write.parquet(str(src / name))

    base = 1_700_000_000
    # batch 1: three distinct events, one duplicated at-source
    write_batch("b1", [(base, 1), (base, 1), (base + 60, 2), (base + 120, 3)])

    stream = (
        spark.readStream.schema(schema)
        .option("latestFirst", "false")
        .parquet(f"{src}/*")
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: replay event 2 within the watermark window plus a fresh
        # event 4 — the replay must be suppressed, the fresh one kept
        write_batch("b2", [(base + 180, 2), (base + 240, 4)])
        q.processAllAvailable()
        got = sorted(
            r.event_id for r in spark.sql("SELECT * FROM dedup_out").collect()
        )
    finally:
        q.stop()
        spark.catalog.dropTempView("dedup_out")

    assert got == [1, 2, 3, 4]


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream inner join with watermarks and an event-time range
    condition: purchases attributed to the click that preceded them by at
    most 10 minutes. Both sides carry watermarks so Spark can bound the
    join state buffer — the attribution join a 100 TB event pipeline runs
    continuously."""
    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir()
    buys_dir.mkdir()

    def write(d, name, rows, cols):
        spark.createDataFrame(rows, cols).select(
            F.timestamp_seconds(F.col(cols.split(",")[0].split()[0])).alias("ts"),
            *[c.strip().split()[0] for c in cols.split(",")[1:]],
        ).coalesce(1).write.parquet(str(d / name))

    base = 1_700_000_000
    write(clicks_dir, "b1", [(base, 1, 10), (base + 100, 2, 20)],
          "ep BIGINT, user_id BIGINT, click_id BIGINT")
    # purchase 1: 5 min after user 1's click (attributed); purchase 2:
    # 20 min after user 2's click (outside the window, dropped)
    write(buys_dir, "b1", [(base + 300, 1, 100), (base + 1300, 2, 200)],
          "ep BIGINT, user_id BIGINT, buy_id BIGINT")

    clicks = (
        spark.readStream.schema("ts TIMESTAMP, user_id BIGINT, click_id BIGINT")
        .parquet(f"{clicks_dir}/*")
        .withWatermark("ts", "30 minutes")
        .select(F.col("ts").alias("click_ts"), "user_id", "click_id")
    )
    buys = (
        spark.readStream.schema("ts TIMESTAMP, user_id BIGINT, buy_id BIGINT")
        .parquet(f"{buys_dir}/*")
        .withWatermark("ts", "30 minutes")
        .select(F.col("ts").alias("buy_ts"), "user_id", "buy_id")
    )
    joined = clicks.join(
        buys,
        (clicks.user_id == buys.user_id)
        & (buys.buy_ts >= clicks.click_ts)
        & (buys.buy_ts <= clicks.click_ts + F.expr("INTERVAL 10 MINUTES")),
        "inner",
    )
    q = (
        joined.select("click_id", "buy_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.click_id, r.buy_id)
            for r in spark.sql("SELECT * FROM attrib_out").collect()
        }
    finally:
        q.stop()
        spark.catalog.dropTempView("attrib_out")

    assert got == {(10, 100)}


def test_foreachbatch_idempotent_sink_replay_safe(spark, tmp_path):
    """Exactly-once via idempotent foreachBatch (streaming/sinks.py):
    each micro-batch overwrites its own _batch_id directory, so Spark's
    documented at-least-once replay of a batch id REPLACES prior output
    instead of duplicating it — asserted by re-invoking the writer with
    the same batch id and checking row counts are unchanged."""
    from datafusion_flight_sql_server_spark.streaming.sinks import (
        idempotent_batch_writer,
        write_stream_exactly_once,
    )

    src = tmp_path / "eo_src"
    src.mkdir()
    out = str(tmp_path / "eo_out")
    ckpt = str(tmp_path / "eo_ckpt")
    spark.createDataFrame(
        [(i, f"u{i % 3}") for i in range(20)], "id BIGINT, user STRING"
    ).coalesce(1).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema("id BIGINT, user STRING").parquet(
        f"{src}/*"
    )
    q = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(60)

    back = spark.read.parquet(out)
    assert back.count() == 20
    assert back.select("id").distinct().count() == 20

    # simulate the at-least-once replay: the SAME batch id is re-delivered
    # (possibly with identical data) after a failure — the idempotent
    # writer must replace, not append
    batch_ids = sorted(
        int(p.name.split("=")[1])
        for p in (tmp_path / "eo_out").glob("_batch_id=*")
    )
    assert batch_ids, "no batch directories written"
    replay_df = spark.createDataFrame(
        [(i, f"u{i % 3}") for i in range(20)], "id BIGINT, user STRING"
    )
    idempotent_batch_writer(out)(replay_df, batch_ids[0])
    back2 = spark.read.parquet(out)
    assert back2.count() == 20, "replayed batch duplicated rows"

    # a NEW batch id lands additively
    idempotent_batch_writer(out)(replay_df.limit(5), max(batch_ids) + 1)
    assert spark.read.parquet(out).count() == 25
