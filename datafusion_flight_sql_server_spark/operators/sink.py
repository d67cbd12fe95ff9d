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


def zorder_sql(
    xs: str,
    ys: str,
    bits: int = 16,
    idiv: str = "DIV",
) -> str:
    """SQL text computing the Morton/Z-order interleave of two pre-scaled
    non-negative ``bits``-wide integer expressions.

    Pure integer arithmetic — bit i extracted as ``(v {idiv} 2^i) % 2`` and
    placed with a power-of-4 multiplier — so the SAME formula evaluates
    bit-identically on Spark (``idiv='DIV'``) and DuckDB (``idiv='//'``):
    no engine-specific shift operators, no doubles. The expression stays
    inside whole-stage codegen on the Spark side.
    """
    terms = []
    for i in range(bits):
        p2 = 1 << i
        x_place = 1 << (2 * i)
        y_place = 1 << (2 * i + 1)
        terms.append(f"((({xs}) {idiv} {p2}) % 2) * {x_place}")
        terms.append(f"((({ys}) {idiv} {p2}) % 2) * {y_place}")
    return "(" + " + ".join(terms) + ")"


def write_zorder(
    df: DataFrame,
    dst_path: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-order-clustered on TWO columns.

    ``write_clustered`` gives perfect skipping on one key and none on any
    other; Z-ordering interleaves the bits of both keys so every file covers
    a small RECTANGLE in (x, y) space — footer min/max stats then skip files
    for selective predicates on x, on y, or on both (the Delta/Iceberg
    OPTIMIZE ZORDER layout, reimplemented on stock parquet).

    Mechanics: min/max-scale each key to ``bits`` unsigned bits (one tiny
    aggregate pass), interleave to the Morton code z, then bucket on the
    top ``log2(n_buckets)`` z-bits (deterministic arithmetic — no sampled
    range boundaries, so the layout is reproducible run to run), sort each
    bucket by z, and write one directory per bucket. Scaled ``__zx/__zy``
    and the code ``__z`` are persisted alongside the payload so readers and
    tests can verify the geometry from the files alone.

    Scale: one min/max aggregate + one corpus shuffle on the bucket key;
    sorting is within-partition (no global sort). At 100 TB this is the
    standard one-extra-shuffle price for multi-dimensional data skipping.
    """
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    from pyspark.sql import functions as F

    mm = df.agg(
        F.min(x_col).alias("xmin"),
        F.max(x_col).alias("xmax"),
        F.min(y_col).alias("ymin"),
        F.max(y_col).alias("ymax"),
    )
    top = (1 << bits) - 1
    # Scale in DOUBLE (not BIGINT): (x - xmin) * top overflows 64-bit
    # integers for wide-domain keys (epoch micros, hashes), and integer DIV
    # rejects fractional columns. FLOOR over the double quotient is
    # deterministic IEEE arithmetic for identical inputs (the oracle
    # evaluates the same expression), and a 1-ulp quotient wobble moves a
    # row one z-cell at most — irrelevant to clustering quality.
    scaled = df.crossJoin(F.broadcast(mm)).select(
        df["*"],
        F.expr(
            f"CAST(FLOOR((({x_col} - xmin) * {top}.0)"
            f" / GREATEST(CAST(xmax - xmin AS DOUBLE), 1.0)) AS BIGINT)"
        ).alias("__zx"),
        F.expr(
            f"CAST(FLOOR((({y_col} - ymin) * {top}.0)"
            f" / GREATEST(CAST(ymax - ymin AS DOUBLE), 1.0)) AS BIGINT)"
        ).alias("__zy"),
    )
    z = scaled.withColumn(
        "__z", F.expr(f"CAST({zorder_sql('__zx', '__zy', bits)} AS BIGINT)")
    )
    # top log2(n_buckets) bits of the 2*bits-wide z code
    bucket_div = (1 << (2 * bits)) // n_buckets
    bucketed = z.withColumn(
        "__zbucket", F.expr(f"CAST(__z DIV {bucket_div} AS BIGINT)")
    )
    (
        bucketed.repartition(n_buckets, "__zbucket")
        .sortWithinPartitions("__z")
        .write.mode(mode)
        .partitionBy("__zbucket")
        .parquet(dst_path)
    )
