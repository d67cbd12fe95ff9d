"""Parquet sinks — partitioned and bucketed writes for pipeline output.

Reference parity: the reference's only sink is the Arrow Flight result
stream (reference: datafusion-flight-sql-server/src/service.rs:230-236);
DML/CTAS is stubbed (service.rs:799-808, 864-875) and our server keeps that
stub behavior (SURVEY.md §2.B sinks row). These writers are the north-star
extension a training-data pipeline needs on top: materializing curated /
deduplicated / split corpora back to storage in a layout the NEXT job can
read efficiently.

100 TB posture — the layout IS the optimization:

- ``write_partitioned``: hive-style directory partitioning on low-cardinality
  columns (split, language, date). Readers that filter on the partition
  column prune whole directories at planning time (``PartitionFilters`` in
  the scan, zero I/O for pruned partitions) — the difference between
  scanning 100 TB and scanning the 1 TB ``split=val`` slice.
- ``write_bucketed``: hash-bucket the rows on a join/dedup key at write
  time. Two tables bucketed on the same key with the same bucket count
  sort-merge-join with NO Exchange on either side — the shuffle happens
  once at write time instead of on every downstream join. For a corpus that
  is joined/deduplicated repeatedly (the common pipeline case), this
  amortizes the single most expensive operation in the engine.
- Writes stream executor→file; nothing funnels through the driver.
"""

from __future__ import annotations

from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as hive-partitioned parquet under ``path``.

    ``partition_cols`` should be low-cardinality (each distinct combination
    becomes a directory); high-cardinality partitioning produces a
    small-files explosion at scale. ``max_records_per_file`` caps file size
    for downstream parallelism without an extra repartition job.
    """
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy(*partition_cols).parquet(path)


def compact(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Rewrite a directory of (typically many small) parquet files into
    ``ceil(total_bytes / target_file_bytes)`` evenly-sized files; returns
    the output file count.

    Small-files compaction is routine maintenance for any long-running
    pipeline: streaming sinks and fine-grained partitioning produce
    thousands of KB-scale files whose per-file open/footer overhead
    dominates scan time. ``repartition(n)`` (round-robin shuffle) is used
    rather than ``coalesce(n)`` deliberately: coalesce merges whole input
    partitions without a shuffle, which is cheaper but inherits input skew
    — for a maintenance job that runs rarely and is read many times, even
    output sizes win.
    """
    import math

    df = spark.read.parquet(src_path)
    total = sum(
        (Path(f.removeprefix("file:"))).stat().st_size
        for f in df.inputFiles()
        if f.startswith(("file:", "/"))
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df.repartition(n_files).write.mode(mode).parquet(dst_path)
    return n_files


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed parquet table (metastore-registered).

    Bucketing is metadata the optimizer exploits: equi-joins and
    aggregations on ``bucket_col`` between tables sharing the bucket spec
    run with no Exchange. ``sort_cols`` additionally pre-sorts within
    buckets, eliminating the Sort under a sort-merge join. ``path`` makes
    the table external (data outside the warehouse dir).
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_clustered(
    df: DataFrame,
    dst_path: str,
    cluster_cols: Sequence[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on ``cluster_cols``: globally range-partitioned
    across files, sorted within each file.

    This is the data-layout half of data skipping: each output file (and
    every row group inside it) covers a narrow, non-overlapping range of the
    cluster key, so parquet footer min/max statistics let ANY reader —
    Spark's parquet filter pushdown included — prune files and row groups a
    selective predicate cannot touch. At 100 TB, clustering the storage by
    the dominant filter key is the difference between a full scan and
    reading a handful of files; tests/test_sink.py asserts the per-file
    ranges are actually disjoint rather than trusting the writer.

    ``repartitionByRange`` samples the key distribution, so skew collapses
    to at-most-one straggler file per hot key instead of hash hotspots.
    """
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(dst_path)
    )
