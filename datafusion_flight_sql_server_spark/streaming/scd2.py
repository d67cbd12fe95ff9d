"""Streaming SCD-2 dimension maintenance with ``applyInPandasWithState``.

The batch builder (``queries/pipeline_q.py`` ``event_scd2``) windows the
whole history per user; this is the incremental form — the OPEN version of
each user's state lives in Spark's state store, micro-batches of events
arrive, and a version row is emitted exactly once when it CLOSES (the user
transitions to a different state). A 100 TB event log maintains its
dimension with per-batch work proportional to the batch, not the history.

Semantics (append-mode friendly):

- state per user: (state, valid_from_us, version) — the open version;
- an incoming event with a DIFFERENT event_type closes the open version
  (emits it with valid_to_us = the new event's timestamp) and opens the
  next one;
- same-state events extend the open version (no emission);
- late events older than the open version's start are DROPPED (the
  deterministic late-data policy; pair with a watermark upstream to bound
  how late data can be);
- the open versions themselves are never emitted downstream — they are the
  state store's content (at scale: queryable via the state store reader or
  flushed by a final batch job); downstream consumers see the closed,
  immutable history, which is exactly what an SCD-2 fact join needs.

Scale: state is hash-partitioned by user_id (same key as the batch form's
single exchange); per-batch cost is O(batch) + O(touched users), state size
is O(users) x O(1).

The closure is self-contained (stdlib + pandas only) so executor workers
need no package import path.
"""

from __future__ import annotations

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output: one row per CLOSED version.
SCD2_SCHEMA = (
    "user_id BIGINT, state STRING, valid_from_us BIGINT, "
    "valid_to_us BIGINT, version BIGINT"
)
#: State: the open version.
SCD2_STATE_SCHEMA = "state STRING, valid_from_us BIGINT, version BIGINT"


def scd2_stream(events_stream):
    """events stream (user_id long, event_type string, ts timestamp) →
    closed SCD-2 version rows, maintained incrementally per user."""

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values(["ts_us", "event_id"])
        if state.exists:
            cur_state, cur_from, cur_ver = state.get
        else:
            cur_state, cur_from, cur_ver = None, None, 0
        out = []
        for etype, ts_us in zip(rows["event_type"], rows["ts_us"]):
            ts_us = int(ts_us)
            if cur_state is None:
                cur_state, cur_from, cur_ver = etype, ts_us, 1
            elif ts_us < cur_from:
                continue  # late event older than the open version: drop
            elif etype != cur_state:
                out.append((user_id, cur_state, cur_from, ts_us, cur_ver))
                cur_state, cur_from, cur_ver = etype, ts_us, cur_ver + 1
        state.update((cur_state, cur_from, cur_ver))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "state",
                    "valid_from_us",
                    "valid_to_us",
                    "version",
                ],
            )

    from pyspark.sql import functions as F

    prepared = events_stream.select(
        "user_id",
        "event_type",
        F.col("event_id").cast("bigint").alias("event_id"),
        F.unix_micros("ts").cast("bigint").alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SCD2_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
