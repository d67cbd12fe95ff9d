"""Gap-based sessionization (batch formulation).

Batch analogue of Structured Streaming's ``session_window``: a new session
starts when the gap to the previous event of the same user exceeds the
threshold; session ids are the running count of session starts. Integer
epoch arithmetic keeps results exact and engine-portable.

Scale shape: a single shuffle on user_id serves both window passes (same
partitioning), then one aggregation — no self-joins, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(user_id, session_id, n_events, duration_s) per gap-based session."""
    ep = F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("bigint")
    order = W.partitionBy(user_col).orderBy(ts_col, id_col)
    # ts/id are carried through so the cumulative-sum pass can reuse the SAME
    # total order as the lag pass — ordering by second-granularity `ep` alone
    # would number same-second ties nondeterministically across runs/engines.
    flagged = events.select(
        user_col,
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        ep.alias("ep"),
        F.when(
            (ep - F.lag(ep).over(order) > gap_seconds)
            | F.lag(F.col(ts_col)).over(order).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    running = (
        W.partitionBy(user_col)
        .orderBy("_ts", "_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    numbered = flagged.select(
        user_col,
        "ep",
        F.sum("new_session").over(running).cast("bigint").alias("session_id"),
    )
    return numbered.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ep") - F.min("ep")).cast("bigint").alias("duration_s"),
    )
