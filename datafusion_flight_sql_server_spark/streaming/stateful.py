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
    timeout_ms: int | None = 30_000,
):
    """events stream (ts timestamp, user_id long, ...) → closed sessions.

    ``applyInPandasWithState`` keyed by user_id; each invocation folds the
    micro-batch's events for that user into the state and emits every
    session closed by a gap. The processing-time timeout flushes the final
    open session of an idle user. ``timeout_ms=None`` disables the timer
    entirely (gap-closed sessions only): under ``availableNow`` a
    registered processing-time timer forces Spark to keep scheduling empty
    micro-batches until it fires, so a finite-input run that never wants
    the timer flush must not register one.
    """
    use_timer = timeout_ms is not None

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
        if use_timer:
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
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_timer
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


# ---------------------------------------------------------------------------
# transformWithState form (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------

#: Output schema for the running per-user aggregate.
COUNTER_SCHEMA = "user_id BIGINT, n BIGINT, total DOUBLE"

try:  # Spark 4.0+ only
    from pyspark.sql.streaming import StatefulProcessor

    class RunningUserTotals(StatefulProcessor):
        """Per-key running (count, sum) via the transformWithState API —
        the successor of applyInPandasWithState: typed per-key value
        state in the state store (RocksDB provider), explicit init/close
        lifecycle, and composable state primitives (value/list/map state,
        timers) instead of one opaque tuple.

        Emits the updated running totals for a key whenever a micro-batch
        touches it; state is O(active keys) and partitioned by the
        grouping key exactly like the batch groupBy it mirrors, so the
        operator scales with the key space, not the event count.
        """

        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n = 0
            total = 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            if self._state.exists():
                prev_n, prev_total = self._state.get()
                n += int(prev_n)
                total += float(prev_total)
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "total": [total]}
            )

        def close(self) -> None:
            pass

    # transformWithState runs the processor in a dedicated Python
    # driver-worker process that unpickles this class; cloudpickle
    # serializes classes from importable modules BY REFERENCE, so without
    # this the worker needs the repo on ITS import path (same gotcha as
    # sources/flight_table.py — ship the module by value instead).
    import sys as _sys

    try:  # pragma: no cover - vendored path is stable in pyspark>=3.3
        from pyspark import cloudpickle as _cloudpickle

        _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
    except Exception:  # noqa: BLE001 - --py-files deploys still work
        pass

except ImportError:  # pragma: no cover - pre-4.0 fallback
    RunningUserTotals = None  # type: ignore[assignment]


def running_totals_stream(events_stream, query_name: str = "totals_out"):
    """events stream → in-memory table of running per-user (count, sum).

    transformWithStateInPandas requires the RocksDB state store provider
    (set in the session conf by the caller/test).
    """
    return (
        events_stream.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningUserTotals(),
            outputStructType=COUNTER_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .start()
    )
