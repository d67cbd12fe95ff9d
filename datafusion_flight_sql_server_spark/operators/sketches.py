"""Count-Min sketch as a mergeable DataFrame aggregation state.

The reference's engine surface has approx aggregates but no reusable
sketch-state operator (reference: datafusion-flight-sql-server/src/
service.rs:214-247 delegates everything); this module provides the
Count-Min build/probe pair the `agg_count_min` query and the streaming
rollup tests share.

Design for 100 TB: the sketch IS the aggregation state — a (row, bucket)
cell table of d*w longs that

- builds map-side (each partition partial-aggregates its token stream onto
  d*w cells before any shuffle),
- merges associatively by cell-wise addition (partitions, micro-batches,
  days — the property continuous-aggregate rollups need),
- answers point frequency queries with est = min over rows of the probed
  cell, which over-estimates by construction (est >= true always; the
  epsilon*N bound holds with the usual 1-delta probability).

Hashing is the repo's engine-portable md5-bucket idiom, so a DuckDB oracle
reproduces the sketch bit-for-bit (see queries/mining_q.py agg_count_min).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_min_bucket(col: Column, row: Column, width: int) -> Column:
    """Row-``row`` bucket of a value: 48-bit md5 prefix of "value#row" mod w.

    DuckDB twin: ``('0x' || substring(md5(x || '#' || r), 1, 12))::BIGINT
    % width``.
    """
    salted = F.concat(col.cast("string"), F.lit("#"), row.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 12), 16, 10).cast("bigint") % width
    )


def count_min_cells(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 32
) -> DataFrame:
    """Build the sketch: one (r, b, cell) row per non-empty cell.

    The explode-by-depth happens before the aggregation, so Catalyst's
    partial aggregation collapses each partition to at most d*w rows
    before the (tiny) shuffle.
    """
    r = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    return (
        df.select(F.col(value_col).alias("_v"), r)
        .select("r", count_min_bucket(F.col("_v"), F.col("r"), width).alias("b"))
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cell"))
    )


def count_min_merge(cells: DataFrame) -> DataFrame:
    """Merge sketch fragments (same d/w) by cell-wise addition."""
    return cells.groupBy("r", "b").agg(F.sum("cell").alias("cell"))


def count_min_estimate(
    cells: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 32,
) -> DataFrame:
    """Point-frequency estimates for ``queries[value_col]``: min over rows.

    ``cells`` is broadcast — it is at most d*w rows by construction.
    """
    if {"r", "b", "cell"} & set(queries.columns):
        raise ValueError(
            "count_min_estimate: query columns may not be named r/b/cell "
            "(reserved by the sketch cell schema)"
        )
    r = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    probe = queries.select("*", r).withColumn(
        "b", count_min_bucket(F.col(value_col), F.col("r"), width)
    )
    others = [c for c in queries.columns]
    # LEFT join: a probed value whose cell was never written has a true
    # sketch count of 0 — an inner join would drop the row entirely (and a
    # partially-empty probe would min over only non-empty cells, inflating
    # the estimate). coalesce(cell, 0) restores the real CM semantics:
    # absent cell == zero counter.
    return (
        probe.join(F.broadcast(cells), ["r", "b"], "left")
        .groupBy(*others)
        .agg(F.min(F.coalesce(F.col("cell"), F.lit(0))).alias("est_c"))
    )
