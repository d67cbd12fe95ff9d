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


def corpus_fingerprint(cache_key) -> tuple | None:
    """Filesystem fingerprint for a ``(fixture_dir, table)`` corpus key.

    The session-scoped operator caches (MinHash front end, trained
    quantizer) key on a caller-supplied corpus identity; when that
    identity names a parquet fixture on local disk, the data can change
    UNDER the key (regenerated fixtures, overwritten tables) and a
    persisted cache entry would silently serve the old corpus. Folding
    (max mtime_ns, total size) of the backing file — or directory of
    part files — into the cache key turns any rewrite into a clean miss.
    Returns ``None`` (fingerprint-less key, prior behavior) when the key
    doesn't name a local parquet path — e.g. object-store URIs, where the
    caller's key must carry version identity itself.
    """
    import os

    try:
        d, t = cache_key
        path = os.path.join(str(d), f"{t}.parquet")
        if os.path.isfile(path):
            st = os.stat(path)
            return (st.st_mtime_ns, st.st_size)
        if os.path.isdir(path):
            newest, total = 0, 0
            for root, _dirs, files in os.walk(path):
                for fn in files:
                    st = os.stat(os.path.join(root, fn))
                    newest = max(newest, st.st_mtime_ns)
                    total += st.st_size
            return (newest, total)
    except (TypeError, ValueError, OSError):
        return None
    return None
