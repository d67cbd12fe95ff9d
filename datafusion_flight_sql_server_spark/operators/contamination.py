"""Benchmark-contamination detection — n-gram overlap vs an eval set.

North-star extension (SURVEY.md §2.C): before training on a scraped
corpus, a pipeline must find training documents that leak evaluation data
(verbatim or near-verbatim benchmark passages). The standard detector is
n-gram overlap: a training doc sharing word n-grams with any eval doc is
flagged with the overlap fraction, and downstream filtering drops or
audits it.

100 TB posture: shingling is map-only (reuses the zip_with shingle pass
from ``operators/dedup.py`` — O(tokens) per doc, JVM-side); the only
data-sized shuffle is the equi-join on the 48-bit shingle hash. The eval
side is benchmark-sized (thousands of docs), so AQE broadcasts it at
runtime — no forced hint, and never an unblocked cross join. Output is one
row per contaminated training doc, linear in corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.operators.dedup import (
    _shingle_hash,
    rebalance_for_compute,
    shingle_col,
)


def ngram_contamination(
    docs: DataFrame,
    eval_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Flag training docs sharing word ``shingle_n``-grams with eval docs.

    ``eval_pred`` marks the held-out/evaluation rows inside ``docs``; all
    other rows are the training corpus. Returns one row per contaminated
    training doc: ``(doc_id, n_shared, n_eval_docs, frac)`` where
    ``n_shared`` counts distinct leaked shingles, ``n_eval_docs`` the
    distinct eval docs hit, and ``frac`` = leaked fraction of the doc's own
    shingle set (rounded to 6 dp, engine-portable).
    """
    # shingling is the dominant cost: widen the map stage when the input
    # layout is coarse (no-op on well-split inputs — dedup.py rationale;
    # measured 2.5 s -> 1.2 s at sf0.1 on the single-row-group fixture)
    hashed = rebalance_for_compute(docs, id_col).select(
        F.col(id_col),
        eval_pred.alias("_is_eval"),
        F.array_distinct(
            F.transform(
                shingle_col(F.col(text_col), shingle_n),
                lambda s: _shingle_hash(s),
            )
        ).alias("hs"),
    )
    exploded = hashed.select(
        id_col,
        "_is_eval",
        F.size("hs").alias("n_sh"),
        F.explode("hs").alias("sh"),
    )
    train = exploded.filter(~F.col("_is_eval")).drop("_is_eval")
    eval_side = exploded.filter(F.col("_is_eval")).select(
        F.col(id_col).alias("eval_id"), "sh"
    )
    return (
        train.join(eval_side, "sh")
        .groupBy(id_col, "n_sh")
        .agg(
            F.countDistinct("sh").alias("n_shared"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
        .select(
            id_col,
            "n_shared",
            "n_eval_docs",
            F.round(F.col("n_shared") / F.col("n_sh"), 6).alias("frac"),
        )
    )
