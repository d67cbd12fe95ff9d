"""applyInPandasWithState sessionization: closed sessions from a stream must
match the batch sessionizer on the same data (excluding each user's final
still-open session, which only a timeout can close)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.streaming.sessionize import sessionize
from datafusion_flight_sql_server_spark.streaming.stateful import sessionize_stream


def test_stream_sessions_match_batch(spark, tmp_path):
    # small deterministic event set: 3 users, multiple gap-separated sessions
    rows = []
    base = 1_700_000_000
    for u in (1, 2, 3):
        t = base + u * 7
        for s in range(3):  # 3 sessions per user
            for i in range(4):  # 4 events each, 60s apart
                rows.append((u, t))
                t += 60
            t += 3600  # gap > 1800s closes the session
    df = spark.createDataFrame(rows, "user_id BIGINT, ep BIGINT").select(
        "user_id", F.timestamp_seconds("ep").alias("ts")
    )
    src = str(tmp_path / "events")
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    expected_closed = 3 * 2  # 3 users x (3 sessions - 1 still open)
    try:
        # processAllAvailable() never idles here: ProcessingTimeTimeout keeps
        # scheduling micro-batches to evaluate timeouts. Poll the sink until
        # the gap-closed sessions have all been emitted.
        import time

        deadline = time.time() + 180
        while time.time() < deadline:
            if q.exception():
                raise AssertionError(str(q.exception()))
            n = spark.sql("SELECT COUNT(*) AS n FROM sessions_out").collect()[0].n
            if n >= expected_closed:
                break
            time.sleep(2)
        got = {
            (r.user_id, r.session_id): (r.n_events, r.duration_s)
            for r in spark.sql("SELECT * FROM sessions_out").collect()
        }
    finally:
        q.stop()

    batch = sessionize(
        df.withColumn("event_id", F.monotonically_increasing_id()),
        gap_seconds=1800,
    ).collect()
    # the stream emits CLOSED sessions: every batch session except each
    # user's last (still open until timeout)
    last_per_user = {}
    for r in batch:
        last_per_user[r.user_id] = max(last_per_user.get(r.user_id, 0), r.session_id)
    want = {
        (r.user_id, r.session_id): (r.n_events, r.duration_s)
        for r in batch
        if r.session_id != last_per_user[r.user_id]
    }
    assert got == want
    assert len(got) == expected_closed
