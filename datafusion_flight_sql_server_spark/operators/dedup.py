"""Deduplication operators (north-star extension, SURVEY.md §2.C).

Exact dedup here; near-dup families (MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine) live in sibling modules. All operators follow the same
scale rules: deterministic partition-stable hashing, shuffles only on
digest/bucket keys, and no all-pairs comparison without blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact(df: DataFrame, key: str, id_col: str) -> DataFrame:
    """Exact content dedup: one row per distinct ``key`` digest.

    Returns (canonical id = MIN(id_col), n_dups) per md5(key) group.
    Deterministic — unlike ``dropDuplicates``, which keeps an arbitrary
    (partition-order-dependent) row. Cost: one shuffle on the 128-bit
    digest, which also dodges skew from long text keys and keeps shuffle
    rows narrow (digest instead of full document text).
    """
    return (
        df.groupBy(F.md5(F.col(key)).alias("_digest"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select(id_col, "n_dups")
    )


def dedup_exact_keep_row(df: DataFrame, key: str, id_col: str) -> DataFrame:
    """Exact dedup keeping the full canonical row (min id wins).

    Window-free formulation: aggregate to the winning id per digest, then
    semi-join back — at 100 TB this is two narrow shuffles instead of a
    window sort over the full rows.
    """
    winners = df.groupBy(F.md5(F.col(key)).alias("_digest")).agg(
        F.min(id_col).alias(id_col)
    )
    return df.join(winners.select(id_col), on=id_col, how="left_semi")
