"""As-of (backward, inclusive) join — the time-series point-in-time join.

Not in the reference's delegated SQL surface (DataFusion 53 has no ASOF
JOIN; SURVEY.md §2.B joins table marks it non-parity), but a staple of
training-data pipelines: attach the most recent prior observation (feature
snapshot, last view event) to each fact row. Implemented the Spark-first
way SURVEY.md suggests — a single union + one window pass, no range
self-join and no per-row subquery:

1. the right side is deduplicated to one row per (key, timestamp), keeping
   the lexicographically greatest (id, *values) row atomically (as-of with
   duplicate right timestamps is otherwise engine-ambiguous, and a rule
   keyed on input position would not survive a shuffle);
2. both sides union into one stream ordered by (timestamp, side-marker)
   — right rows sort BEFORE left rows at equal timestamps,
   which makes the join inclusive (right.ts <= left.ts); the strict
   variant (``inclusive=False``) flips that tie order so same-timestamp
   right rows become invisible (right.ts < left.ts);
3. ``last(..., ignorenulls=True)`` over an unbounded-preceding row frame
   carries each key's latest right row forward; left rows read it, rows
   with no prior right row get NULL (left-outer semantics).

100 TB posture: exactly one shuffle on the join key (the window), a
map-side-combinable pre-aggregation for the dedupe, and no join node at
all — the plan scales like sessionization, not like a range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_id_col: str = "event_id",
    right_value_cols: tuple[str, ...] = ("value",),
    inclusive: bool = True,
) -> DataFrame:
    """Backward as-of join — inclusive (``right.ts <= left.ts``, the
    default) or strict (``right.ts < left.ts``, pandas
    ``merge_asof(allow_exact_matches=False)`` / kdb prior-tick).
    Inclusivity is purely the union's tie order: right rows sort before
    left rows at equal timestamps for inclusive, after them for strict —
    same single-shuffle plan either way.

    Returns every ``left`` row with appended columns ``{ts_col}_r``,
    ``{right_id_col}_r`` and ``{c}_r`` for each value column — the matched
    right row's fields, NULL when the key has no right row at or before
    the left timestamp.

    Duplicate rule (total): right rows duplicated within ``(on, ts_col)``
    resolve by lexicographic max over ``(right_id_col, *right_value_cols)``
    — the winner is always exactly ONE input row taken atomically, so ties
    on ``right_id_col`` extend the comparison into the value columns rather
    than mixing fields across rows. Input position deliberately plays no
    role: after a shuffle, "first seen" is not a meaningful order in a
    distributed engine, while the struct-max is reproducible on any
    partitioning.
    """
    rvals = [right_id_col, *right_value_cols]
    r1 = (
        right.groupBy(on, ts_col)
        .agg(F.max(F.struct(*[F.col(c) for c in rvals])).alias("_m"))
        .select(
            on,
            ts_col,
            F.struct(
                F.col(ts_col).alias(f"{ts_col}_r"),
                *[F.col(f"_m.{c}").alias(f"{c}_r") for c in rvals],
            ).alias("_r"),
        )
    )
    l2 = left.withColumn("_is_l", F.lit(1))
    r2 = r1.withColumn("_is_l", F.lit(0 if inclusive else 2))
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        W.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("_is_l"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        u.withColumn("_rj", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_l") == 1)
        .select(
            *left.columns,
            F.col(f"_rj.{ts_col}_r").alias(f"{ts_col}_r"),
            *[F.col(f"_rj.{c}_r").alias(f"{c}_r") for c in rvals],
        )
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_id_col: str = "event_id",
    right_value_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """Nearest-match as-of join (kdb ``aj`` nearest / pandas
    ``merge_asof(direction='nearest')``).

    Each left row matches the right row with the smallest |right.ts -
    left.ts| for its key, in either direction; an exact tie prefers the
    BACKWARD (earlier) candidate, which keeps the operator a strict
    superset of the backward join's semantics. Left-outer: keys with no
    right rows at all yield NULLs. Duplicates within ``(on, ts_col)``
    follow :func:`asof_join`'s total rule — lexicographic max over
    ``(right_id_col, *right_value_cols)``, one input row atomically.

    Same plan discipline as :func:`asof_join`: the two directional
    candidates come from one union + ONE sorted window pass (a
    carry-forward ``last`` and a carry-backward ``first`` share the same
    partition/order, so Catalyst plans a single sort under a single
    Window node) — one shuffle on the key, no range join, no per-row
    subquery. The nearer candidate is a row-local comparison afterwards.
    """
    rvals = [right_id_col, *right_value_cols]
    r1 = (
        right.groupBy(on, ts_col)
        .agg(F.max(F.struct(*[F.col(c) for c in rvals])).alias("_m"))
        .select(
            on,
            ts_col,
            F.struct(
                F.col(ts_col).alias(f"{ts_col}_r"),
                *[F.col(f"_m.{c}").alias(f"{c}_r") for c in rvals],
            ).alias("_r"),
        )
    )
    l2 = left.withColumn("_is_l", F.lit(1))
    r2 = r1.withColumn("_is_l", F.lit(0))
    u = l2.unionByName(r2, allowMissingColumns=True)
    order = [F.col(ts_col), F.col("_is_l")]
    wb = (
        W.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    from pyspark.sql.types import (
        DecimalType,
        DoubleType,
        FloatType,
        TimestampNTZType,
        TimestampType,
    )

    ts_type = left.schema[ts_col].dataType
    if isinstance(ts_type, TimestampType):
        # exact integer microseconds — a double epoch loses sub-us ties
        def _num(c):
            return F.unix_micros(c)
    elif isinstance(ts_type, TimestampNTZType):
        # NTZ carries no instant; the engine contract pins sessions to
        # UTC, making the cast the identity wall-clock mapping — without
        # it a long cast would collapse gaps to whole seconds
        def _num(c):
            return F.unix_micros(c.cast("timestamp"))
    elif isinstance(ts_type, (DoubleType, FloatType, DecimalType)):
        # fractional timestamps subtract in their OWN type: a long cast
        # truncates sub-unit gaps and flips nearest picks (|1.9-1.2|
        # would beat |2.1-1.9|)
        def _num(c):
            return c
    else:
        # integer timestamps (epochs, sequence numbers) subtract directly
        def _num(c):
            return c.cast("long")

    lt = F.col(ts_col)
    back = F.col("_b")
    fwd = F.col("_f")
    gap_b = _num(lt) - _num(back[f"{ts_col}_r"])
    gap_f = _num(fwd[f"{ts_col}_r"]) - _num(lt)
    # right rows sort before left rows at equal ts, so the backward frame
    # sees same-ts matches (gap 0, wins every tie) and the forward frame
    # starts strictly after them — no double-count ambiguity
    pick_back = back.isNotNull() & (fwd.isNull() | (gap_b <= gap_f))
    chosen = F.when(pick_back, back).otherwise(fwd)
    return (
        u.withColumn("_b", F.last("_r", ignorenulls=True).over(wb))
        .withColumn("_f", F.first("_r", ignorenulls=True).over(wf))
        .filter(F.col("_is_l") == 1)
        .withColumn("_n", chosen)
        .select(
            *left.columns,
            F.col(f"_n.{ts_col}_r").alias(f"{ts_col}_r"),
            *[F.col(f"_n.{c}_r").alias(f"{c}_r") for c in rvals],
        )
    )
