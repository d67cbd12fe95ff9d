"""Band (range/interval) join — bucketed equi-join, never a theta join.

Like the as-of join (``operators/asof.py``), range predicates are not in the
reference's delegated SQL surface (DataFusion 53 plans ``t1.ts BETWEEN
t2.ts - w AND t2.ts + w`` as a nested-loop theta join; SURVEY.md §2.B joins
table marks range joins non-parity), but they are a training-pipeline
staple: "all observations within ±w of each fact row" (context windows,
label attribution, feature neighborhoods).

The naive Spark plan for a band predicate is a BroadcastNestedLoopJoin —
O(|L|·|R|) per key and a non-starter at 100 TB. This operator uses the
standard bucketing decomposition instead:

1. both sides bucket their timestamp: ``b = floor(epoch_us / (w·1e6))``;
2. the left side explodes to the three buckets ``{b-1, b, b+1}`` — any
   right row within ±w of a left row must land in one of them;
3. an **equi-join** on ``(key, bucket)`` generates candidates (each
   matching pair exactly once — the right row has one bucket value);
4. the exact ``|Δt| <= w`` filter prunes the candidates.

100 TB posture: the join is hash-partitioned on (key, bucket) — shuffle
volume is 3·|L| + |R| rows, candidates are bounded by per-(key, 2w-window)
co-occurrence, and no cartesian/nested-loop node ever appears (asserted in
tests). Skewed keys (one user with millions of events in one window) are
AQE skew-join territory, same as any hot-key equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    width_seconds: int = 3600,
    right_cols: tuple[str, ...] = ("event_id", "value"),
) -> DataFrame:
    """Inner band join: pairs of (left row, right row) with the same ``on``
    key and ``|left.ts - right.ts| <= width_seconds``.

    Returns all ``left`` columns plus ``{ts_col}_r`` and ``{c}_r`` for each
    requested right column. Aggregate on top (and re-join to ``left``) for
    left-outer "count within window" shapes.
    """
    w_us = int(width_seconds) * 1_000_000
    l_us = F.unix_micros(F.col(ts_col))
    r_us = F.unix_micros(F.col(ts_col))

    lb = F.floor(l_us / F.lit(w_us))
    l2 = left.withColumn(
        "_b", F.explode(F.array(lb - 1, lb, lb + 1))
    ).withColumn("_l_us", l_us)
    r2 = right.select(
        F.col(on),
        F.floor(r_us / F.lit(w_us)).alias("_b"),
        r_us.alias("_r_us"),
        F.col(ts_col).alias(f"{ts_col}_r"),
        *[F.col(c).alias(f"{c}_r") for c in right_cols],
    )
    return (
        l2.join(r2, [on, "_b"])
        .filter(F.abs(F.col("_l_us") - F.col("_r_us")) <= F.lit(w_us))
        .drop("_b", "_l_us", "_r_us")
    )
