"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch sessionizer (streaming/sessionize.py) needs the whole history per
user; this is the streaming form — per-user session state (current session
id, last event time, running aggregates) lives in Spark's state store,
events arrive in micro-batches, and CLOSED sessions are emitted exactly once
when the gap passes (or on timeout). This is the ``applyInPandasWithState``
pattern the north star calls out for operators Structured Streaming's
built-ins (session_window) cannot express — here: custom emit semantics and
explicit state shape.

State per user: (session_id, session_start_ep, last_ep, n_events).
Emission: one row per CLOSED session (a later event arrived beyond the gap,
or the processing-time timeout fired with no new events).

Scale: state is partitioned by user_id across executors (one shuffle per
micro-batch, same key as the batch form); state size is O(active users),
not O(events).

The closure is self-contained (stdlib + pandas only) so executor workers
need no package import path.
"""

from __future__ import annotations

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output schema: one row per closed session.
SESSION_SCHEMA = (
    "user_id BIGINT, session_id BIGINT, n_events BIGINT, duration_s BIGINT"
)
#: State schema: (session_id, session_start_ep, last_ep, n_events).
STATE_SCHEMA = "session_id BIGINT, start_ep BIGINT, last_ep BIGINT, n BIGINT"


def sessionize_stream(
    events_stream,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    timeout_ms: int = 30_000,
):
    """events stream (ts timestamp, user_id long, ...) → closed sessions.

    ``applyInPandasWithState`` keyed by user_id; each invocation folds the
    micro-batch's events for that user into the state and emits every
    session closed by a gap. The processing-time timeout flushes the final
    open session of an idle user.
    """

    def fold_sessions(key, pdfs, state: GroupState):
        # Self-contained: stdlib + pandas only (worker-side pickling).
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                session_id, start_ep, last_ep, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_id": [session_id],
                        "n_events": [n],
                        "duration_s": [last_ep - start_ep],
                    }
                )
            return

        eps: list[int] = []
        for pdf in pdfs:
            eps.extend(
                int(v.timestamp()) for v in pd.to_datetime(pdf["ts"])
            )
        eps.sort()
        if state.exists:
            session_id, start_ep, last_ep, n = state.get
        else:
            session_id, start_ep, last_ep, n = 1, None, None, 0

        closed = {"user_id": [], "session_id": [], "n_events": [], "duration_s": []}
        for ep in eps:
            if last_ep is None:
                start_ep, last_ep, n = ep, ep, 1
            elif ep - last_ep > gap_seconds:
                closed["user_id"].append(user_id)
                closed["session_id"].append(session_id)
                closed["n_events"].append(n)
                closed["duration_s"].append(last_ep - start_ep)
                session_id += 1
                start_ep, last_ep, n = ep, ep, 1
            else:
                last_ep = ep
                n += 1
        state.update((session_id, start_ep, last_ep, n))
        state.setTimeoutDuration(timeout_ms)
        if closed["user_id"]:
            yield pd.DataFrame(closed)

    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold_sessions,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
