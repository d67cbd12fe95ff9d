"""Deferred unpersist registry for lazily-returned DataFrames.

A query/operator that persists an intermediate cannot unpersist it before
its caller materializes the (lazy) result, so persisted relations are
registered here and released by harnesses that run many queries in one
session (oracle-parity sweep, bench loop, the driver) — or by any
long-lived embedder — via :func:`run_query_cleanups` between queries.

Lives in engine/ so BOTH the operator library and the query catalog can
register cleanups without operators/ importing from queries/ (the round-5
final review flagged that layering inversion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PENDING_UNPERSIST: list[DataFrame] = []


def register_query_cleanup(df: DataFrame) -> DataFrame:
    """Record a persisted DataFrame for deferred unpersist; returns ``df``."""
    _PENDING_UNPERSIST.append(df)
    return df


def run_query_cleanups() -> None:
    """Unpersist every intermediate registered since the last call."""
    while _PENDING_UNPERSIST:
        df = _PENDING_UNPERSIST.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to release
            pass
