"""Exactly-once streaming sinks via idempotent ``foreachBatch``.

Structured Streaming's file sinks are append-only exactly-once, but any
custom destination (JDBC, object-store layout the next job expects, a
compacted table) goes through ``foreachBatch`` — which Spark documents as
AT-LEAST-ONCE: after a failure the same ``batch_id`` is REPLAYED with the
same data. Exactly-once is therefore the writer's job, and the standard
recipe is to make the write a deterministic, self-replacing function of
``batch_id`` (reference has no streaming surface at all — its sink is the
Flight result stream, service.rs:230-236; this is §2.C streaming-forms
territory).

``idempotent_batch_writer`` implements the recipe for a parquet directory
layout: every micro-batch lands in its own ``_batch_id=<n>`` partition
directory with ``overwrite`` semantics, so a replayed batch REPLACES its
previous (possibly partial) output instead of duplicating it. Readers see
the union of batch directories; a crashed write leaves at worst a torn
directory that the replay overwrites.

100 TB posture: the batch directory is also the natural compaction unit
(operators/sink.py compact), and per-batch overwrite keeps the failure
domain one micro-batch wide — no global commit log, no table lock. The
writer never funnels rows through the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def idempotent_batch_writer(
    dst_path: str,
) -> Callable[[DataFrame, int], None]:
    """Return a ``foreachBatch`` function writing each micro-batch to
    ``<dst_path>/_batch_id=<id>/`` with replace-on-replay semantics."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(
                f"{dst_path}/_batch_id={batch_id}"
            )
        )

    return write


def write_stream_exactly_once(
    stream_df: DataFrame,
    dst_path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Attach the idempotent writer to a streaming DataFrame.

    With ``availableNow`` the query drains the source and stops — the batch
    shape used for incremental backfills. Returns the started query.
    """
    writer = (
        stream_df.writeStream.foreachBatch(idempotent_batch_writer(dst_path))
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
