"""North-star extension queries (SURVEY.md §2.C) — batch entry points.

These wrap the reusable operators in ``operators/`` / ``functions/`` /
``streaming/`` as declared catalog queries with DuckDB oracles. They go
beyond the reference (which has no data-pipeline operators) per the repo
north star: dedup, text analysis, similarity search, multimodal plumbing,
event-time windows — each designed for 100 TB (no driver-side loops, no
unblocked cross joins, deterministic hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.queries.catalog import query, tables
from datafusion_flight_sql_server_spark.functions.text import (
    STOPWORDS_BY_LANG,
    doc_fingerprint,
    lang_scores,
    quality_score_col,
    token_count_cols,
)
from datafusion_flight_sql_server_spark.operators.dedup import (
    MINHASH_P,
    dedup_exact,
    embed_cosine_near_dups,
    minhash_near_dups,
    minhash_params,
    ngram_jaccard_near_dups,
    simhash_near_dups,
)
from datafusion_flight_sql_server_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
    projection_tables,
)
from datafusion_flight_sql_server_spark.operators.dedup import (
    dedup_exact_keep_best,
    dedup_exact_keep_row,
)
from datafusion_flight_sql_server_spark.streaming.sessionize import sessionize
from datafusion_flight_sql_server_spark.streaming.windows import (
    sliding_counts,
    tumbling_counts,
)


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
        FROM documents
        GROUP BY md5(text)
    """,
    doc="Exact dedup by content hash: canonical representative = MIN(doc_id)"
    " per md5(text) group. Hash-groupBy scales linearly (one shuffle on the "
    "digest); deterministic, unlike dropDuplicates' arbitrary row pick.",
    tags=("dedup",),
)
def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    return dedup_exact(tables(spark, sf)["documents"], key="text", id_col="doc_id")


@query(
    "dedup_exact_keeprow",
    oracle="""
        SELECT doc_id, text, lang, source, n_chars
        FROM documents
        WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
    """,
    doc="Exact dedup keeping the full canonical row (min doc_id per content "
    "digest): window-free agg + semi-join, two narrow shuffles instead of a "
    "full-row window sort (operators/dedup.py dedup_exact_keep_row).",
    tags=("dedup",),
)
def q_dedup_exact_keeprow(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    return dedup_exact_keep_row(d, key="text", id_col="doc_id")


@query(
    "dedup_exact_keepbest",
    oracle="""
        WITH ranked AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (PARTITION BY md5(text)
                       ORDER BY n_chars DESC, doc_id) AS rn
            FROM documents)
        SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
        FROM documents d
        WHERE d.doc_id IN (SELECT doc_id FROM ranked WHERE rn = 1)
    """,
    doc="Quality-ranked exact dedup: per content digest keep the duplicate "
    "with the highest quality score (n_chars here; any score column in "
    "production), doc_id tie-break — the keep rule training pipelines "
    "actually want when duplicates differ in source quality. max_by over "
    "a (score, -id) struct is a partial-aggregatable argmax, so the plan "
    "stays two narrow shuffles (digest agg + semi-join), window-free "
    "(operators/dedup.py dedup_exact_keep_best).",
    tags=("dedup",),
)
def q_dedup_exact_keepbest(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    return dedup_exact_keep_best(d, key="text", id_col="doc_id", score_col="n_chars")


# ---------------------------------------------------------------------------
# Similarity search (embeddings)
# ---------------------------------------------------------------------------

_COS = (
    "ROUND(CASE WHEN sqrt(list_dot_product({a},{a})) > 0 "
    "AND sqrt(list_dot_product({b},{b})) > 0 "
    "THEN list_dot_product({a},{b}) / "
    "(sqrt(list_dot_product({a},{a})) * sqrt(list_dot_product({b},{b}))) "
    "ELSE 0.0 END, 6)"
)

#: Temperature exponent for the language-mix flatteners
#: (doc_sample_temperature, pipeline_curate_v2): post-sample counts target
#: ∝ n_lang^alpha.
MIX_TEMPERATURE_ALPHA = 0.5


@query(
    "sim_topk",
    oracle=f"""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 8),
             c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
                   FROM embeddings),
             p AS (SELECT query_id, neighbor_id,
                          {_COS.format(a="qv", b="cv")} AS sim
                   FROM q JOIN c ON neighbor_id <> query_id),
             r AS (SELECT query_id, neighbor_id, sim,
                          ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY sim DESC, neighbor_id) AS rnk
                   FROM p)
        SELECT query_id, neighbor_id, sim, CAST(rnk AS BIGINT) AS rank
        FROM r WHERE rnk <= 5
    """,
    doc="Brute-force cosine top-k: 8 query vectors (broadcast) against the "
    "full corpus; DOUBLE-cast dot products, similarity rounded to 6 decimals "
    "with neighbor-id tie-break for a total order. The exactness baseline "
    "for sim_topk_lsh (operators/similarity.py).",
    tags=("similarity",),
)
def q_sim_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["embeddings"]
    return brute_force_topk(e, e.filter(F.col("vec_id") < 8), k=5)


@query(
    "sim_range_search",
    oracle=f"""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 8),
             c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
                   FROM embeddings)
        SELECT query_id, neighbor_id,
               {_COS.format(a="qv", b="cv")} AS sim
        FROM q JOIN c ON neighbor_id <> query_id
        WHERE {_COS.format(a="qv", b="cv")} >= 0.3
    """,
    doc="Radius (range) search: ALL neighbors with cosine >= tau per "
    "query, not a fixed top-k — the FAISS/Milvus range_search API, and "
    "the primitive behind threshold tuning for embedding dedup (how many "
    "neighbors would tau merge?). Result size is data-dependent, so "
    "there is no rank column; the contract is the exact set above the "
    "threshold (round-6 similarities). Scale: the query side is a "
    "broadcast (a bounded evaluation sample by contract — "
    "similarity.py's guarded-limit discipline); per-corpus-row work is "
    "|queries| dot products map-side, and only above-threshold pairs "
    "shuffle. The full-corpus variant is dedup_embed_cosine's "
    "LSH-bucketed pair generation.",
    tags=("similarity",),
)
def q_sim_range_search(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.similarity import (
        round_cosine,
    )

    e = tables(spark, sf)["embeddings"]
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    return (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            round_cosine(F.col("qv"), F.col("cv")).alias("sim"),
        )
        .filter(F.col("sim") >= 0.3)
    )


#: Lloyd refinement steps for the registered trained-IVF query (and its
#: unrolled oracle — keep in sync via _ivf_oracle()).
IVF_TRAIN_ITERS = 2


def _ivf_chain(n_cells: int, iters: int) -> tuple[str, str]:
    """Shared WITH-prefix unrolling the trained coarse quantizer of
    ``operators.similarity.train_cells``: seed centroids (c0 = lowest-id
    vectors), corpus (e), then per Lloyd step an argmax assignment (cosine
    DESC, cent_id tie-break) and element-wise means quantized to micros via
    floor(x*1e6+0.5)/1e6 — the quantization absorbs summation-order ulp
    drift and, unlike ROUND(double, 6), evaluates IEEE-exactly in both
    engines, so they produce bit-identical centroids and the same discrete
    assignments (same determinism idiom as _pagerank_oracle's unrolled CTE
    chain). Returns (cte_block, final_centroid_cte_name); shared by the
    sim_topk_ivf and dedup_semantic oracles."""
    steps = []
    prev = "c0"
    for t in range(1, iters + 1):
        steps.append(
            f"""a{t} AS (SELECT neighbor_id, v, cent_id AS cell FROM (
                 SELECT e.neighbor_id, e.v, c.cent_id,
                        ROW_NUMBER() OVER (PARTITION BY e.neighbor_id
                            ORDER BY {_COS.format(a="e.v", b="c.cv")} DESC,
                                     c.cent_id) AS rn
                 FROM e CROSS JOIN {prev} c) WHERE rn = 1),
             c{t} AS (SELECT cell AS cent_id,
                             list(m ORDER BY idx) AS cv
                      FROM (SELECT cell, idx,
                                   FLOOR(AVG(x) * 1000000.0 + 0.5) / 1000000.0 AS m
                            FROM (SELECT cell, unnest(v) AS x,
                                         unnest(range(1, len(v) + 1)) AS idx
                                  FROM a{t})
                            GROUP BY cell, idx)
                      GROUP BY cell)"""
        )
        prev = f"c{t}"
    chain = (",\n             " + ",\n             ".join(steps)) if steps else ""
    block = f"""c0 AS (SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
                    FROM embeddings WHERE vec_id < {n_cells}),
             e AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings){chain}"""
    return block, prev


def _ivf_oracle(
    k: int = 5, n_cells: int = 16, n_probe: int = 4, iters: int = IVF_TRAIN_ITERS
) -> str:
    """DuckDB SQL unrolling the EXACT spherical-k-means IVF pipeline of
    ``operators.similarity.ivf_topk(train_iters=iters)`` — trained-centroid
    chain from _ivf_chain, then assignment, probe, and exact re-rank."""
    block, prev = _ivf_chain(n_cells, iters)
    return f"""
        WITH {block},
             asg AS (SELECT neighbor_id, v, cent_id AS cell FROM (
                 SELECT e.neighbor_id, e.v, c.cent_id,
                        ROW_NUMBER() OVER (PARTITION BY e.neighbor_id
                            ORDER BY {_COS.format(a="e.v", b="c.cv")} DESC,
                                     c.cent_id) AS rn
                 FROM e CROSS JOIN {prev} c) WHERE rn = 1),
             q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 8),
             probe AS (SELECT query_id, qv, cell FROM (
                 SELECT q.query_id, q.qv, c.cent_id AS cell,
                        ROW_NUMBER() OVER (PARTITION BY q.query_id
                            ORDER BY {_COS.format(a="q.qv", b="c.cv")} DESC,
                                     c.cent_id) AS rn
                 FROM q CROSS JOIN {prev} c) WHERE rn <= {n_probe}),
             cand AS (SELECT p.query_id, p.qv, a.neighbor_id, a.v
                      FROM probe p JOIN asg a ON a.cell = p.cell
                      WHERE a.neighbor_id <> p.query_id),
             r AS (SELECT query_id, neighbor_id,
                          {_COS.format(a="qv", b="v")} AS sim,
                          ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY {_COS.format(a="qv", b="v")} DESC,
                                       neighbor_id) AS rnk
                   FROM cand)
        SELECT query_id, neighbor_id, sim, CAST(rnk AS BIGINT) AS rank
        FROM r WHERE rnk <= {k}
    """


@query(
    "sim_topk_ivf",
    oracle=_ivf_oracle(),
    doc="Trained IVF ANN (round 3: real spherical k-means, no longer a "
    "seed-only stand-in): deterministic seed centroids (16 lowest-id "
    "vectors) refined by 2 Lloyd steps — aggregation-only argmax "
    "assignment, per-cell element-wise means quantized to micros "
    "(floor(x*1e6+0.5)/1e6, IEEE-exact in both engines) so the "
    "trained centroids are bit-identical across engines — then 4-cell "
    "probe per query and exact cosine re-rank. Candidate fraction "
    "~n_probe/n_cells of the corpus, no cross join; each training step is "
    "one corpus scan + one (n_cells x dim) aggregate with centroids "
    "localCheckpointed per step (operators/similarity.py ivf_topk).",
    tags=("similarity", "approx"),
)
def q_sim_topk_ivf(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["embeddings"]
    return ivf_topk(
        e,
        e.filter(F.col("vec_id") < 8),
        k=5,
        train_iters=IVF_TRAIN_ITERS,
        dim=64,
        cache_key=(sf, "embeddings"),
    )


def _cluster_quality_oracle(n_cells: int = 16, iters: int = IVF_TRAIN_ITERS) -> str:
    """Per-cell cohesion/separation audit over the trained quantizer."""
    block, prev = _ivf_chain(n_cells, iters)
    cs = _COS.format(a="e.v", b="c.cv")
    sep_cos = _COS.format(a="a.cv", b="b.cv")
    return f"""
        WITH {block},
             asg AS (SELECT neighbor_id, cell,
                            CAST(FLOOR(cs * 1000000 + 0.5) AS BIGINT) AS cs_ppm
                     FROM (
                 SELECT e.neighbor_id, c.cent_id AS cell, {cs} AS cs,
                        ROW_NUMBER() OVER (PARTITION BY e.neighbor_id
                            ORDER BY {cs} DESC, c.cent_id) AS rn
                 FROM e CROSS JOIN {prev} c) WHERE rn = 1),
             coh AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors,
                            CAST(SUM(cs_ppm) AS BIGINT) AS sum_cohesion_ppm
                     FROM asg GROUP BY cell),
             sep AS (SELECT a.cent_id AS cell,
                            CAST(MAX(FLOOR({sep_cos} * 1000000 + 0.5))
                                 AS BIGINT) AS max_other_sim_ppm
                     FROM {prev} a JOIN {prev} b ON a.cent_id <> b.cent_id
                     GROUP BY a.cent_id)
        SELECT coh.cell, coh.n_vectors, coh.sum_cohesion_ppm,
               s.max_other_sim_ppm
        FROM coh JOIN sep s ON coh.cell = s.cell
    """


@query(
    "embed_cluster_quality",
    oracle=_cluster_quality_oracle(),
    doc="Clustering-quality audit of the trained coarse quantizer (the "
    "health check an ANN/SemDeDup deployment monitors before trusting "
    "cell-blocked operators): per cell, the member count, the exact "
    "ppm-sum of member-to-own-centroid cosines (cohesion — summed as "
    "integers so the audit is order-independent), and the maximum "
    "cosine between this centroid and any other (separation — cells "
    "whose centroids nearly coincide under-merge near-duplicates and "
    "over-probe queries). Reuses the bit-deterministic trained "
    "quantizer (train_cells) and aggregation-only assignment "
    "(assign_cells); the separation pass is a 16x16 broadcast "
    "cross of the centroid table, constant at any corpus size. Scale: "
    "one corpus scan + one cell aggregation.",
    tags=("similarity", "evaluation", "embedding"),
)
def q_embed_cluster_quality(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.similarity import (
        assign_cells,
        round_cosine,
        train_cells,
    )

    e = tables(spark, sf)["embeddings"]
    cents = train_cells(
        e,
        n_cells=16,
        train_iters=IVF_TRAIN_ITERS,
        dim=64,
        cache_key=(sf, "embeddings"),
    )
    asg = assign_cells(e, cents)
    coh = asg.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum(F.floor(F.col("cs") * 1000000 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("sum_cohesion_ppm"),
    )
    a = cents.select(F.col("cent_id").alias("cell"), F.col("cent_vec").alias("av"))
    b = cents.select(F.col("cent_id").alias("other"), F.col("cent_vec").alias("bv"))
    sep = (
        a.join(F.broadcast(b), F.col("cell") != F.col("other"))
        .groupBy("cell")
        .agg(
            F.max(
                F.floor(round_cosine(F.col("av"), F.col("bv")) * 1000000 + F.lit(0.5))
            )
            .cast("bigint")
            .alias("max_other_sim_ppm")
        )
    )
    return coh.join(sep, "cell").select(
        F.col("cell").cast("bigint").alias("cell"),
        "n_vectors",
        "sum_cohesion_ppm",
        "max_other_sim_ppm",
    )


def _ivf_recall_oracle(k: int = 5) -> str:
    """Recall@k of the trained-IVF path vs brute force: both unrolled
    pipelines as CTE blocks, joined on (query, neighbor)."""
    bf = f"""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 8),
             c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
                   FROM embeddings),
             p AS (SELECT query_id, neighbor_id,
                          {_COS.format(a="qv", b="cv")} AS sim
                   FROM q JOIN c ON neighbor_id <> query_id),
             r AS (SELECT query_id, neighbor_id,
                          ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY sim DESC, neighbor_id) AS rnk
                   FROM p)
        SELECT query_id, neighbor_id FROM r WHERE rnk <= {k}
    """
    return f"""
        WITH bf AS ({bf}),
             ivf AS ({_ivf_oracle(k=k)}),
             hits AS (SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS h
                      FROM bf b JOIN ivf i
                        ON b.query_id = i.query_id
                       AND b.neighbor_id = i.neighbor_id
                      GROUP BY b.query_id),
             qs AS (SELECT DISTINCT query_id FROM bf)
        SELECT qs.query_id,
               CAST(COALESCE(h, 0) AS BIGINT) AS hits,
               CAST(COALESCE(h, 0) * 1000000 // {k} AS BIGINT) AS recall_ppm
        FROM qs LEFT JOIN hits ON qs.query_id = hits.query_id
    """


@query(
    "embed_ivf_recall",
    oracle=_ivf_recall_oracle(),
    doc="ANN evaluation loop: recall@5 of the trained-IVF path against "
    "the exact brute-force top-5, per query, in exact ppm — the number "
    "an ANN deployment monitors when tuning n_probe/n_cells. Both sides "
    "are the existing bit-deterministic pipelines (micro-quantized "
    "trained centroids; round-6 similarities with id tie-breaks), so the "
    "intersection — and therefore the recall — is itself deterministic "
    "and hash-checkable. Scale: the brute-force side is the 8-query "
    "broadcast matmul (an evaluation SAMPLE, not the corpus pairwise); "
    "the join is k-rows-per-query tiny.",
    tags=("similarity", "evaluation"),
)
def q_embed_ivf_recall(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["embeddings"]
    queries_df = e.filter(F.col("vec_id") < 8)
    bf = brute_force_topk(e, queries_df, k=5).select("query_id", "neighbor_id")
    ivf = ivf_topk(
        e,
        queries_df,
        k=5,
        train_iters=IVF_TRAIN_ITERS,
        dim=64,
        cache_key=(sf, "embeddings"),
    ).select("query_id", "neighbor_id")
    hits = (
        bf.join(ivf, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
    )
    qs = bf.select("query_id").distinct()
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits"),
        F.expr("CAST(COALESCE(hits, 0) * 1000000 DIV 5 AS BIGINT)").alias(
            "recall_ppm"
        ),
    )


_D2U = (
    "CAST(FLOOR((list_dot_product({a},{a}) - 2*list_dot_product({a},{b}) "
    "+ list_dot_product({b},{b})) * 1000000.0 + 0.5) AS BIGINT)"
)


def _pq_oracle(
    k: int = 5, m: int = 4, sub_w: int = 16, n_codes: int = 8,
    n_candidates: int = 20,
) -> str:
    """DuckDB SQL unrolling the EXACT product-quantization pipeline of
    ``operators.similarity.pq_topk`` (train_iters=1): per-subspace seed
    codebooks from the lowest-id vectors, one Lloyd step with floor-micros
    mean quantization, argmin encoding, BIGINT ADC sums, exact cosine
    re-rank — every comparison either integer or micro-quantized, so both
    engines produce identical codes, candidates and ranks (see pq_topk's
    determinism contract)."""
    d2 = _D2U.format(a="s.sv", b="c.cv")
    d2q = _D2U.format(a="s.qsv", b="c.cv")
    return f"""
        WITH e AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
             ms AS (SELECT unnest(range(0, {m})) AS sub_m),
             subs AS (SELECT vid, sub_m,
                             v[(sub_m*{sub_w}+1):((sub_m+1)*{sub_w})] AS sv
                      FROM e CROSS JOIN ms),
             cb0 AS (SELECT sub_m, vid AS code, sv AS cv
                     FROM subs WHERE vid < {n_codes}),
             best1 AS (SELECT sub_m, code, sv FROM (
                 SELECT s.sub_m, c.code, s.sv,
                        ROW_NUMBER() OVER (PARTITION BY s.vid, s.sub_m
                            ORDER BY {d2} ASC, c.code) AS rn
                 FROM subs s JOIN cb0 c ON s.sub_m = c.sub_m) WHERE rn = 1),
             cb1 AS (SELECT sub_m, code, list(mm ORDER BY idx) AS cv FROM (
                 SELECT sub_m, code, idx,
                        FLOOR(AVG(x) * 1000000.0 + 0.5) / 1000000.0 AS mm
                 FROM (SELECT sub_m, code, unnest(sv) AS x,
                              unnest(range(1, len(sv) + 1)) AS idx
                       FROM best1)
                 GROUP BY sub_m, code, idx) GROUP BY sub_m, code),
             codes AS (SELECT vid, sub_m, code FROM (
                 SELECT s.vid, s.sub_m, c.code,
                        ROW_NUMBER() OVER (PARTITION BY s.vid, s.sub_m
                            ORDER BY {d2} ASC, c.code) AS rn
                 FROM subs s JOIN cb1 c ON s.sub_m = c.sub_m) WHERE rn = 1),
             q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 8),
             qsubs AS (SELECT query_id, sub_m,
                              qv[(sub_m*{sub_w}+1):((sub_m+1)*{sub_w})] AS qsv
                       FROM q CROSS JOIN ms),
             dt AS (SELECT s.query_id, c.sub_m, c.code, {d2q} AS du
                    FROM qsubs s JOIN cb1 c ON s.sub_m = c.sub_m),
             adc AS (SELECT d.query_id, cd.vid AS neighbor_id,
                            SUM(d.du) AS adc
                     FROM codes cd
                     JOIN dt d ON d.sub_m = cd.sub_m AND d.code = cd.code
                     WHERE cd.vid <> d.query_id
                     GROUP BY d.query_id, cd.vid),
             cand AS (SELECT query_id, neighbor_id FROM (
                 SELECT query_id, neighbor_id,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc, neighbor_id) AS crnk
                 FROM adc) WHERE crnk <= {n_candidates}),
             r AS (SELECT c.query_id, c.neighbor_id,
                          {_COS.format(a="q.qv", b="e.v")} AS sim,
                          ROW_NUMBER() OVER (PARTITION BY c.query_id
                              ORDER BY {_COS.format(a="q.qv", b="e.v")} DESC,
                                       c.neighbor_id) AS rnk
                   FROM cand c
                   JOIN e ON e.vid = c.neighbor_id
                   JOIN q ON q.query_id = c.query_id)
        SELECT query_id, neighbor_id, sim, CAST(rnk AS BIGINT) AS rank
        FROM r WHERE rnk <= {k}
    """


@query(
    "sim_topk_pq",
    oracle=_pq_oracle(),
    doc="Product-quantization ANN (the memory-compression leg of the ANN "
    "triad, after LSH bucketing and IVF partitioning): 4 subspaces x 8 "
    "codewords trained with one Lloyd step (floor-micros means, the "
    "trained-IVF determinism idiom), corpus encoded to 4 codes/vector, "
    "candidates ranked by BIGINT asymmetric-distance sums (integer, "
    "order-free), best 20 re-ranked by exact cosine. A 64-float vector "
    "collapses to 4 codes, so the ranking scan reads ~3% of the raw "
    "bytes; at 100 TB the production form is IVF-PQ (route via ivf_topk "
    "cells, run the same ADC per probed cell — this operator is that ADC "
    "kernel plus the eval harness). Every comparison is integer or "
    "micro-quantized with id tie-breaks, so the trained pipeline "
    "hash-matches the unrolled ANSI oracle (operators/similarity.py "
    "pq_topk).",
    tags=("similarity", "approx"),
)
def q_sim_topk_pq(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.similarity import pq_topk

    e = tables(spark, sf)["embeddings"]
    return pq_topk(e, e.filter(F.col("vec_id") < 8), k=5)


def _lsh_oracle(
    k: int = 5, n_tables: int = 8, n_bits: int = 4, dim: int = 64, seed: int = 42
) -> str:
    """DuckDB SQL replicating the EXACT sign-random-projection pipeline of
    ``operators.similarity.lsh_topk`` — the hyperplanes are the same
    md5-derived constants (``projection_tables``), embedded as a
    ``planes(t, b, w)`` VALUES relation, so bucket membership and the final
    re-ranked top-k match bit-for-bit (``list_dot_product`` sums in the
    same sequential element order as the JVM fold; sign at >= 0)."""
    tabs = projection_tables(dim, n_tables, n_bits, seed)
    rows = ",\n                 ".join(
        f"({t}, {b}, [{', '.join(repr(x) for x in tabs[t][b])}])"
        for t in range(n_tables)
        for b in range(n_bits)
    )
    return f"""
        WITH planes(t, b, w) AS (VALUES
                 {rows}),
             e AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
             q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE vec_id < 8),
             eb AS (SELECT neighbor_id, t,
                           string_agg(CASE WHEN list_dot_product(e.v, p.w) >= 0
                                           THEN '1' ELSE '0' END,
                                      '' ORDER BY p.b) AS sig
                    FROM e CROSS JOIN planes p GROUP BY neighbor_id, t),
             qb AS (SELECT query_id, t,
                           string_agg(CASE WHEN list_dot_product(q.v, p.w) >= 0
                                           THEN '1' ELSE '0' END,
                                      '' ORDER BY p.b) AS sig
                    FROM q CROSS JOIN planes p GROUP BY query_id, t),
             cand AS (SELECT DISTINCT qb.query_id, eb.neighbor_id
                      FROM eb JOIN qb ON eb.t = qb.t AND eb.sig = qb.sig
                      WHERE eb.neighbor_id <> qb.query_id),
             scored AS (SELECT c.query_id, c.neighbor_id,
                               {_COS.format(a="qv.v", b="ev.v")} AS sim
                        FROM cand c
                        JOIN e ev ON ev.neighbor_id = c.neighbor_id
                        JOIN q qv ON qv.query_id = c.query_id),
             r AS (SELECT query_id, neighbor_id, sim,
                          ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rnk
                   FROM scored)
        SELECT query_id, neighbor_id, sim, CAST(rnk AS BIGINT) AS rank
        FROM r WHERE rnk <= {k}
    """


@query(
    "sim_topk_lsh",
    oracle=_lsh_oracle(),
    doc="LSH-blocked ANN: sign-random-projection banding (8 tables x 4 bits, "
    "deterministic md5-seeded hyperplanes) generates candidates via bucket "
    "equi-join — no cartesian product at any scale — then exact cosine "
    "re-ranks. Fully deterministic, so hash-checked against an ANSI oracle "
    "that embeds the same hyperplane constants; recall vs sim_topk asserted "
    "in tests/test_similarity.py (operators/similarity.py).",
    tags=("similarity", "approx"),
)
def q_sim_topk_lsh(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["embeddings"]
    return lsh_topk(e, e.filter(F.col("vec_id") < 8), k=5)


# ---------------------------------------------------------------------------
# Near-duplicate detection
# ---------------------------------------------------------------------------


def _minhash_ctes(shingle_n: int = 3, n_perms: int = 16, n_bands: int = 8) -> str:
    """The shared toks/sh/hashed/sig/buck CTE chain replicating
    ``operators.dedup._minhash_hashed_buckets`` bit-for-bit."""
    rows = n_perms // n_bands
    params = minhash_params(n_perms)
    mh = ",\n                   ".join(
        f"list_min(list_transform(h, x -> ({a} * (x % {MINHASH_P}) + {b}) % {MINHASH_P})) AS mh{i}"
        for i, (a, b) in enumerate(params)
    )
    band_selects = "\n              UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, md5(concat_ws('-', "
        + ", ".join(f"mh{bi * rows + r}" for r in range(rows))
        + ")) AS key FROM sig"
        for bi in range(n_bands)
    )
    return f"""toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                      FROM documents),
        sh AS (SELECT doc_id,
                      CASE WHEN len(w) >= {shingle_n}
                           THEN list_distinct(list_transform(
                                range(1, len(w) - {shingle_n - 2}),
                                i -> array_to_string(w[i:i+{shingle_n - 1}], ' ')))
                           ELSE [array_to_string(w, ' ')] END AS s
               FROM toks),
        hashed AS (SELECT doc_id,
                          list_distinct(list_transform(s, x ->
                            ('0x' || substr(md5(x), 1, 12))::BIGINT)) AS h
                   FROM sh),
        sig AS (SELECT doc_id,
                   {mh}
                FROM hashed),
        buck AS ({band_selects})"""


def _minhash_oracle(
    shingle_n: int = 3, n_perms: int = 16, n_bands: int = 8, threshold: float = 0.3
) -> str:
    """DuckDB SQL replicating the EXACT MinHash-LSH pipeline of
    ``operators.dedup.minhash_near_dups`` — same md5-derived permutation
    constants, same banding, same verification — so the (probabilistic-recall
    but fully deterministic) candidate set matches bit-for-bit."""
    return f"""
        WITH {_minhash_ctes(shingle_n, n_perms, n_bands)},
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM buck a JOIN buck b
                   ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               ROUND(len(list_intersect(sa.h, sb.h))::DOUBLE
                     / len(list_distinct(sa.h || sb.h)), 6) AS jaccard
        FROM cand
        JOIN hashed sa ON sa.doc_id = doc_a
        JOIN hashed sb ON sb.doc_id = doc_b
        WHERE ROUND(len(list_intersect(sa.h, sb.h))::DOUBLE
                    / len(list_distinct(sa.h || sb.h)), 6) >= {threshold}
    """


@query(
    "dedup_incremental_minhash",
    oracle=f"""
        WITH {_minhash_ctes()},
        cand AS (SELECT DISTINCT a.doc_id AS bdoc, b.doc_id AS hdoc
                 FROM buck a JOIN buck b
                   ON a.band = b.band AND a.key = b.key
                 WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0),
        dup AS (SELECT DISTINCT c.bdoc FROM cand c
                JOIN hashed sa ON sa.doc_id = c.bdoc
                JOIN hashed sb ON sb.doc_id = c.hdoc
                WHERE ROUND(len(list_intersect(sa.h, sb.h))::DOUBLE
                            / len(list_distinct(sa.h || sb.h)), 6) >= 0.3)
        SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
        FROM documents d
        WHERE d.doc_id % 10 = 0
          AND NOT EXISTS (SELECT 1 FROM dup WHERE dup.bdoc = d.doc_id)
    """,
    doc="Incremental NEAR-dup ingestion (the production MinHash shape: "
    "corpora grow by batches, each batch screens against ALL history "
    "without re-pairing history with itself): a new batch (10% of docs) "
    "band-joins the historical bucket sidecar — batch x history buckets "
    "ONLY, never the quadratic history x history bulk — confirmed "
    "near-dups (exact Jaccard >= 0.3 on hashed shingle sets) anti-join "
    "out of the batch. At 100 TB the history side is the stored "
    "signature sidecar, bucketed by (band, key) so the candidate join is "
    "Exchange-free; history text is never read "
    "(operators/dedup.py minhash_fresh_vs_history).",
    tags=("dedup", "similarity", "pipeline"),
)
def q_dedup_incremental_minhash(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.dedup import (
        minhash_fresh_vs_history,
    )

    d = tables(spark, sf)["documents"]
    fresh = minhash_fresh_vs_history(
        d, F.col("doc_id") % 10 == 0, cache_key=(sf, "documents")
    )
    return fresh.select("doc_id", F.col("n_chars").cast("bigint").alias("n_chars"))


@query(
    "dedup_near_minhash",
    oracle=_minhash_oracle(),
    doc="MinHash-LSH near-dedup over word-3-gram shingles: 16 md5-seeded "
    "permutations, 8 bands x 2 rows (S-curve threshold ~0.35), band-bucket "
    "equi-join candidates, exact "
    "Jaccard >= 0.3 verification. All JVM higher-order functions; the one "
    "data-sized shuffle is the hash-partitioned band join "
    "(operators/dedup.py minhash_near_dups).",
    tags=("dedup", "similarity"),
)
def q_dedup_near_minhash(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    return minhash_near_dups(d, cache_key=(sf, "documents"))


def _clusters_oracle() -> str:
    """Recursive-CTE transitive closure over the exact minhash pair list."""
    return f"""
        WITH RECURSIVE pairs AS (
        {_minhash_oracle()}
        ), edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ), reach(node, label) AS (
            SELECT DISTINCT src, src FROM edges
            UNION
            SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
        ), comp AS (
            SELECT node AS doc_id, MIN(label) AS cluster_id
            FROM reach GROUP BY node
        )
        SELECT doc_id, cluster_id,
               COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
        FROM comp
    """


@query(
    "dedup_near_clusters",
    oracle=_clusters_oracle(),
    doc="Near-dup cluster assignment: transitive closure of the MinHash "
    "pair list (A~B, B~C => one cluster) via iterative min-label "
    "propagation — each round one equi-join + one groupBy, converging at "
    "the unique fixed point where every doc carries its component's min "
    "id (operators/components.py; large-star/small-star is the documented "
    "O(log n)-round upgrade for adversarial chain graphs). Oracle: "
    "recursive CTE over the identical pair SQL. Output: every paired doc "
    "with its cluster id and cluster size.",
    tags=("dedup", "similarity", "iterative"),
)
def q_dedup_near_clusters(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    from datafusion_flight_sql_server_spark.operators.components import (
        connected_components,
    )

    d = tables(spark, sf)["documents"]
    pairs = minhash_near_dups(d, cache_key=(sf, "documents")).select(
        "doc_a", "doc_b"
    )
    comps = connected_components(pairs, "doc_a", "doc_b")
    return comps.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        F.count(F.lit(1))
        .over(W.partitionBy("cluster_id"))
        .cast("bigint")
        .alias("cluster_size"),
    )


@query(
    "graph_components_star",
    oracle=_clusters_oracle(),
    doc="Connected components via large-star/small-star contraction "
    "(Kiveris et al., SoCC'14; operators/components.py "
    "connected_components_star) over the same MinHash near-dup pair list "
    "as dedup_near_clusters — identical output, O(log n) rounds instead "
    "of diameter rounds. Each round is two groupBy+join edge rewrites "
    "(the same shuffle shape as label propagation); on the adversarial "
    "long-chain graphs that make propagation linear, this is the plan "
    "that survives 100 TB. Oracle: the recursive-CTE transitive closure.",
    tags=("graph", "dedup", "iterative"),
)
def q_graph_components_star(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    from datafusion_flight_sql_server_spark.operators.components import (
        connected_components_star,
    )
    from datafusion_flight_sql_server_spark.queries.catalog import (
        register_query_cleanup,
    )

    d = tables(spark, sf)["documents"]
    pairs = minhash_near_dups(d, cache_key=(sf, "documents")).select(
        "doc_a", "doc_b"
    )
    comps = connected_components_star(pairs, "doc_a", "doc_b")
    register_query_cleanup(comps)
    return comps.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        F.count(F.lit(1))
        .over(W.partitionBy("cluster_id"))
        .cast("bigint")
        .alias("cluster_size"),
    )


def _simhash_oracle(n_bits: int = 48, band_bits: int = 16, max_hamming: int = 3) -> str:
    """DuckDB SQL replicating ``simhash_near_dups`` bit-for-bit (same shingle
    hashes, same vote rule incl. ties-to-1, same banding)."""
    n_bands = n_bits // band_bits
    bits = ", ".join(
        f"CASE WHEN list_sum(list_transform(h, x -> CASE WHEN (x >> {j}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) >= 0 THEN 1 ELSE 0 END AS bit{j}"
        for j in range(n_bits)
    )
    sim = " + ".join(f"bit{j} * {1 << j}" for j in range(n_bits))
    band_list = ", ".join(str(b) for b in range(n_bands))
    key_list = ", ".join(
        f"(sim >> {b * band_bits}) & {(1 << band_bits) - 1}" for b in range(n_bands)
    )
    return f"""
        WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                      FROM documents),
        shg AS (SELECT doc_id,
                       CASE WHEN len(w) >= 3
                            THEN list_distinct(list_transform(range(1, len(w)-1),
                                 i -> array_to_string(w[i:i+2], ' ')))
                            ELSE [array_to_string(w, ' ')] END AS s
                FROM toks),
        t AS (SELECT doc_id, list_transform(s, x ->
                      ('0x' || substr(md5(x), 1, 12))::BIGINT) AS h FROM shg),
        bitted AS (SELECT doc_id, {bits} FROM t),
        sh AS (SELECT doc_id, ({sim})::BIGINT AS sim FROM bitted),
        b AS (SELECT doc_id, sim, unnest([{band_list}]) AS band,
                     unnest([{key_list}]) AS key FROM sh),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
                        a.sim AS sa, b2.sim AS sb
                 FROM b a JOIN b b2
                   ON a.band = b2.band AND a.key = b2.key
                  AND a.doc_id < b2.doc_id)
        SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    """


@query(
    "dedup_simhash",
    oracle=_simhash_oracle(),
    doc="SimHash near-dedup: 48-bit signature over word-3-gram shingle "
    "hashes (sign of the per-bit ±1 vote sum), 3 sixteen-bit bands — "
    "pigeonhole guarantees any pair within Hamming<=3 shares a band, so "
    "blocking is lossless for the verifier — then exact Hamming on the "
    "signatures. Signature-only verification: one bigint per doc at scale, "
    "no shingle-set re-join (operators/dedup.py simhash_near_dups).",
    tags=("dedup", "similarity"),
)
def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    return simhash_near_dups(d)


@query(
    "dedup_ngram_jaccard",
    oracle="""
        WITH t AS (SELECT doc_id, lang, n_chars // 64 AS lb, lower(text) AS tx
                   FROM documents),
        g AS (SELECT doc_id, lang, lb,
                     CASE WHEN length(tx) >= 5
                          THEN list_distinct(list_transform(
                               range(1, length(tx)-3), i -> tx[i:i+4]))
                          ELSE [tx] END AS s
              FROM t)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               ROUND(len(list_intersect(a.s, b.s))::DOUBLE
                     / len(list_distinct(a.s || b.s)), 6) AS jaccard
        FROM g a JOIN g b
          ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        WHERE ROUND(len(list_intersect(a.s, b.s))::DOUBLE
                    / len(list_distinct(a.s || b.s)), 6) >= 0.5
    """,
    doc="Character-5-gram Jaccard near-dedup with attribute blocking "
    "(lang x length-bucket equi-join — no cartesian product): the cheap "
    "high-precision sweep of the dedup family; MinHash banding is the "
    "recall path (operators/dedup.py ngram_jaccard_near_dups).",
    tags=("dedup", "similarity"),
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    return ngram_jaccard_near_dups(d)


def _semantic_dedup_oracle(
    eps: float, n_cells: int = 16, iters: int = IVF_TRAIN_ITERS
) -> str:
    """DuckDB SQL replaying ``operators.similarity.semantic_dedup``: the
    shared trained-quantizer chain (_ivf_chain), an assignment that keeps
    the winning centroid cosine, then the SemDeDup keep rule — x is
    dropped iff a same-cell witness y with (cs_y, id_y) < (cs_x, id_x)
    has cosine(x, y) >= eps."""
    block, prev = _ivf_chain(n_cells, iters)
    return f"""
        WITH {block},
             asg AS (SELECT neighbor_id AS vec_id, v, cell, cs FROM (
                 SELECT e.neighbor_id, e.v, c.cent_id AS cell,
                        {_COS.format(a="e.v", b="c.cv")} AS cs,
                        ROW_NUMBER() OVER (PARTITION BY e.neighbor_id
                            ORDER BY {_COS.format(a="e.v", b="c.cv")} DESC,
                                     c.cent_id) AS rn
                 FROM e CROSS JOIN {prev} c) WHERE rn = 1),
             wit AS (SELECT DISTINCT a.vec_id
                     FROM asg a JOIN asg b
                       ON a.cell = b.cell
                      AND (b.cs < a.cs
                           OR (b.cs = a.cs AND b.vec_id < a.vec_id))
                     WHERE {_COS.format(a="a.v", b="b.v")} >= {eps})
        SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
               CAST(FLOOR(a.cs * 1000000 + 0.5) AS BIGINT) AS cs_micros,
               w.vec_id IS NULL AS kept
        FROM asg a LEFT JOIN wit w ON a.vec_id = w.vec_id
    """


#: Within-cell cosine at/above which two vectors are semantic duplicates
#: (fixture embeddings cluster loosely; real corpora use ~0.95+).
SEMANTIC_DEDUP_EPS = 0.3


@query(
    "dedup_semantic",
    oracle=_semantic_dedup_oracle(SEMANTIC_DEDUP_EPS),
    doc="SemDeDup-style semantic dedup (Abbas et al. 2023, "
    "arXiv:2303.09540): cluster the corpus with the TRAINED coarse "
    "quantizer shared with sim_topk_ivf (2 Lloyd steps, micro-quantized "
    "centroids — bit-identical across engines), call same-cell vectors "
    "with round-6 cosine >= eps duplicates, and keep one representative "
    "per duplicate group — the vector LEAST similar to its centroid (the "
    "paper's keep rule: retain the edge of the semantic region, drop the "
    "redundant interior), id tie-break. Emits (vec_id, cell, cs_micros, "
    "kept) for the full corpus — the auditable form. Scale: candidate "
    "pairs are a cell-blocked equi-join (the SemDeDup trick — cell size "
    "~ corpus/n_cells bounds the quadratic term; n_cells scales with the "
    "corpus), the witness set collapses to a distinct id list, and "
    "training/assignment reuse the IVF path's broadcast-argmax plan "
    "(operators/similarity.py semantic_dedup).",
    tags=("dedup", "similarity"),
)
def q_dedup_semantic(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.similarity import semantic_dedup

    e = tables(spark, sf)["embeddings"]
    return semantic_dedup(
        e,
        eps=SEMANTIC_DEDUP_EPS,
        train_iters=IVF_TRAIN_ITERS,
        dim=64,
        cache_key=(sf, "embeddings"),
    )


@query(
    "dedup_embed_cosine",
    oracle=f"""
        WITH e AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_COS.format(a="a.v", b="b.v")} AS sim
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_COS.format(a="a.v", b="b.v")} >= 0.25
    """,
    doc="Embedding-cosine near-dup pairs, IVF-style blocked on the coarse "
    "cluster column (label): candidates come from a block equi-join, never "
    "an unblocked cross join; exact cosine >= 0.25 on candidates "
    "(operators/dedup.py embed_cosine_near_dups).",
    tags=("dedup", "similarity"),
)
def q_dedup_embed_cosine(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["embeddings"]
    return embed_cosine_near_dups(e, threshold=0.25)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "text_stats",
    oracle="""
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT) AS n_chars_computed,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(string_split(text, ' '), w -> LENGTH(w)))
                    AS DOUBLE) / len(string_split(text, ' ')) AS avg_word_len,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                    / len(string_split(text, ' ')) AS uniq_ratio
        FROM documents
    """,
    doc="Quality-scoring signals: char/word counts, mean word length, "
    "unique-token ratio — all JVM builtins, no UDF (higher-order "
    "aggregate over the token array).",
    tags=("text",),
)
def q_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    words = F.split(F.col("text"), " ")
    total_len = F.aggregate(
        F.transform(words, lambda w: F.length(w)), F.lit(0), lambda acc, x: acc + x
    )
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_computed"),
        F.size(words).cast("bigint").alias("n_words"),
        (total_len.cast("double") / F.size(words)).alias("avg_word_len"),
        (F.size(F.array_distinct(words)).cast("double") / F.size(words)).alias(
            "uniq_ratio"
        ),
    )


@query(
    "text_quality",
    oracle="""
        SELECT doc_id,
               ROUND(
                 0.4 * LEAST(len(string_split(text, ' ')) / 64.0, 1.0)
                 + 0.3 * (len(list_distinct(string_split(text, ' ')))
                          / CAST(len(string_split(text, ' ')) AS DOUBLE))
                 + 0.3 * (len(list_filter(string_split(text, ' '),
                              w -> w IN ('the', 'a')))
                          / CAST(len(string_split(text, ' ')) AS DOUBLE)),
                 6) AS quality
        FROM documents
    """,
    doc="Composite quality score: length saturation + lexical diversity + "
    "stopword ratio (deterministic double formula, identical both engines).",
    tags=("text",),
)
def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    return d.select("doc_id", quality_score_col(F.col("text")).alias("quality"))


@query(
    "text_tokens",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT)
                   AS re_tokens,
               CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
        FROM documents
    """,
    doc="Token counting: whitespace split, regex word tokenizer, and the "
    "chars/4 BPE estimate used for LLM budget accounting.",
    tags=("text",),
)
def q_text_tokens(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    ws, re_t, bpe = token_count_cols(F.col("text"))
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        re_t.alias("re_tokens"),
        bpe.alias("approx_bpe_tokens"),
    )


@query(
    "text_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))),
                   ' ')) AS fingerprint
        FROM documents
    """,
    doc="Document fingerprint: md5 over the sorted distinct token set "
    "(case-folded) — canonical near-dup blocking key; identical digests "
    "across engines.",
    tags=("text", "dedup"),
)
def q_text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    return d.select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))


@query(
    "text_rolling_hash",
    oracle=f"""
        WITH t AS (SELECT doc_id,
                          list_transform(string_split(lower(text), ' '),
                            x -> ('0x' || substr(md5(x), 1, 12))::BIGINT) AS h
                   FROM documents)
        SELECT doc_id,
               list_reduce([0::BIGINT] || h,
                           (a, x) -> (a * 31 + x) % {MINHASH_P}) AS rolling_fp
        FROM t
    """,
    doc="Order-sensitive rolling-hash document fingerprint: polynomial fold "
    "(acc*31 + token_hash mod P) over the token-hash sequence — unlike the "
    "sorted-set fingerprint (text_fingerprint), token reordering changes the "
    "digest. Left-fold in both engines; modulus keeps every step in int64.",
    tags=("text", "dedup"),
)
def q_text_rolling_hash(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.dedup import _shingle_hash

    d = tables(spark, sf)["documents"]
    hashes = F.transform(F.split(F.lower(F.col("text")), " "), _shingle_hash)
    fp = F.aggregate(
        hashes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % MINHASH_P,
    )
    return d.select("doc_id", fp.alias("rolling_fp"))


def _langid_oracle() -> str:
    """Build the DuckDB CASE expression mirroring lang_scores()."""
    score_exprs = []
    for lang, words in STOPWORDS_BY_LANG.items():
        lst = ", ".join(f"'{w}'" for w in words)
        score_exprs.append(
            f"len(list_filter(string_split(lower(text), ' '), w -> w IN ({lst})))"
            f" AS score_{lang}"
        )
    scores = ",\n               ".join(score_exprs)
    langs = list(STOPWORDS_BY_LANG)
    # argmax with first-wins tie-break in declared language order
    cond = " ".join(
        f"WHEN score_{lang} >= GREATEST({', '.join('score_' + l for l in langs)}) "
        f"THEN '{lang}'"
        for lang in langs
    )
    return f"""
        SELECT doc_id, lang AS labeled_lang,
               CASE {cond} ELSE 'und' END AS predicted_lang
        FROM (SELECT doc_id, lang, {scores} FROM documents)
    """


@query(
    "text_langid",
    oracle=_langid_oracle(),
    doc="Language ID via stopword-hit scoring (argmax over per-language "
    "stopword lists, deterministic first-wins tie-break). A real n-gram "
    "model slots into the same shape; the synthetic corpus shares one "
    "vocabulary so the labeled lang is not recoverable — the operator "
    "contract (deterministic scoring + argmax) is what's verified.",
    tags=("text",),
)
def q_text_langid(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    scored = d.select(
        "doc_id", F.col("lang").alias("labeled_lang"), *lang_scores(F.col("text"))
    )
    langs = list(STOPWORDS_BY_LANG)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit("und")
    # first-wins: build from the last lang backwards so earlier langs override
    for lang in reversed(langs):
        pred = F.when(F.col(f"score_{lang}") >= best, F.lit(lang)).otherwise(pred)
    return scored.select("doc_id", "labeled_lang", pred.alias("predicted_lang"))


# ---------------------------------------------------------------------------
# Multimodal column plumbing
# ---------------------------------------------------------------------------


@query(
    "multimodal_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS digest,
               'text/plain' AS mime
        FROM documents
    """,
    doc="Multimodal column convention: payload as opaque BINARY + typed "
    "metadata (byte size, content digest, mime), all JVM-side column math. "
    "The decode/feature-extract mapInPandas stages live in "
    "operators/multimodal.py and are exercised by multimodal_decode.",
    tags=("multimodal",),
)
def q_multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    blob = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).cast("bigint").alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("digest"),
        F.lit("text/plain").alias("mime"),
    )


@query(
    "multimodal_decode",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS sha256,
               'image/x-fake' AS mime,
               CAST(('0x' || substr(sha256(text), 1, 4))::BIGINT % 1024 + 1
                    AS BIGINT) AS width,
               CAST(('0x' || substr(sha256(text), 5, 4))::BIGINT % 1024 + 1
                    AS BIGINT) AS height,
               CAST(3 AS BIGINT) AS channels
        FROM documents
    """,
    doc="Arrow-batched mapInPandas decode stage over opaque binary payloads "
    "(operators/multimodal.py decode_images). The decoder is a deterministic "
    "sha256-derived fake (no image libs in-env) chosen to be SQL-expressible, "
    "so the whole Python-worker pipeline — schema, batching, payload bytes — "
    "is value-checked against the oracle, not just smoke-tested.",
    tags=("multimodal",),
)
def q_multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.multimodal import (
        decode_images,
        with_blob,
    )

    d = tables(spark, sf)["documents"]
    return decode_images(with_blob(d))


# ---------------------------------------------------------------------------
# Event-time operators (batch-first; streaming variants in streaming/)
# ---------------------------------------------------------------------------


@query(
    "event_tumbling_window",
    oracle="""
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="Tumbling event-time window (1h) × event_type — batch analogue of "
    "the Structured Streaming windowed agg (streaming/windows.py); window "
    "start emitted as epoch seconds for engine-portable hashing.",
    tags=("events", "window"),
)
def q_event_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"]
    return tumbling_counts(e, duration="1 hour")


@query(
    "event_anomaly",
    oracle="""
        WITH w AS (
            SELECT event_id, user_id, value,
                   CAST(SUM(CAST(value AS DECIMAL(18,6)))
                        OVER win AS DOUBLE) AS s,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))
                            * CAST(value AS DECIMAL(18,6)))
                        OVER win AS DOUBLE) AS q,
                   COUNT(*) OVER win AS n
            FROM events
            WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, user_id,
               CAST(FLOOR((value - s / n)
                          / sqrt(GREATEST(q / n - (s / n) * (s / n), 1e-12))
                          * 1000000 + 0.5) AS BIGINT) AS z_micros
        FROM w
        WHERE n >= 5
          AND q / n - (s / n) * (s / n) > 1e-12
    """,
    doc="Per-user trailing z-score anomaly signal (the metric-stream "
    "outlier detector of an event pipeline): each event scored against "
    "the mean/std of its user's previous 20 events (current row excluded; "
    "needs >= 5 priors and non-degenerate variance). Determinism "
    "discipline: the window sums are EXACT decimal sums (value and "
    "value^2) cast to double after, so mean/var/sqrt/divide start from "
    "bit-identical doubles in both engines, and the score is emitted as "
    "BIGINT micros via the IEEE-exact floor(x*1e6+0.5) idiom (no ROUND-on-"
    "double boundary risk). Plan: one hash-partitioned window over "
    "(user_id), no joins.",
    tags=("events", "window", "quality"),
)
def q_event_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = tables(spark, sf)["events"]
    win = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    v = F.col("value").cast("decimal(18,6)")
    scored = e.select(
        "event_id",
        "user_id",
        "value",
        F.sum(v).over(win).cast("double").alias("s"),
        F.sum(v * v).over(win).cast("double").alias("q"),
        F.count("*").over(win).alias("n"),
    )
    mean = F.col("s") / F.col("n")
    var = F.col("q") / F.col("n") - mean * mean
    return (
        scored.filter((F.col("n") >= 5) & (var > 1e-12))
        .select(
            "event_id",
            "user_id",
            F.floor(
                (F.col("value") - mean)
                / F.sqrt(F.greatest(var, F.lit(1e-12)))
                * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("z_micros"),
        )
    )


@query(
    "event_sliding_window",
    oracle="""
        SELECT ws AS window_start, event_type, COUNT(*) AS n
        FROM (SELECT event_type,
                     unnest([ep - (ep % 1800), ep - (ep % 1800) - 1800]) AS ws
              FROM (SELECT event_type,
                           CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ep
                    FROM events))
        GROUP BY 1, 2
    """,
    doc="Sliding event-time window (1h window / 30m slide) x event_type — "
    "each event contributes to duration/slide windows; the oracle unrolls "
    "the two epoch-aligned window starts per event, matching Spark's "
    "window() alignment (streaming/windows.py sliding_counts).",
    tags=("events", "window"),
)
def q_event_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"]
    return sliding_counts(e, duration="1 hour", slide="30 minutes")


@query(
    "event_sessionize",
    oracle="""
        WITH flagged AS (
            -- epoch_us // 1000000 floors like Spark's unix_timestamp;
            -- CAST(epoch(..) AS BIGINT) would ROUND the fractional second
            SELECT user_id, ts, event_id,
                   CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ep,
                   CASE WHEN CAST(epoch_us(ts) // 1000000 AS BIGINT)
                             - LAG(CAST(epoch_us(ts) // 1000000 AS BIGINT)) OVER w > 1800
                             OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            -- same (ts, event_id) total order as the lag pass: same-second
            -- ties must cumulate deterministically in both engines
            SELECT user_id, ep,
                   SUM(new_session) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               CAST(MAX(ep) - MIN(ep) AS BIGINT) AS duration_s
        FROM numbered
        GROUP BY user_id, session_id
    """,
    doc="Gap-based sessionization (30 min) — lag + cumulative-sum session "
    "ids, the batch analogue of session_window(); integer epoch arithmetic "
    "keeps it exact. Scales as one shuffle on user_id.",
    tags=("events", "session"),
)
def q_event_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"]
    return sessionize(e, gap_seconds=1800)


@query(
    "event_asof_join",
    oracle="""
        WITH v AS (
            -- dedupe right side per (user, ts): max event_id wins, values
            -- taken atomically — as-of over duplicate right timestamps is
            -- engine-ambiguous otherwise (operators/asof.py does the same)
            SELECT user_id, ts,
                   MAX(event_id) AS view_id,
                   arg_max(value, event_id) AS view_value
            FROM events WHERE event_type = 'view'
            GROUP BY user_id, ts
        ), p AS (
            SELECT event_id AS purchase_id, user_id, ts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.purchase_id, p.user_id,
               CAST(epoch_us(p.ts) AS BIGINT) AS ep_us,
               v.view_id, v.view_value,
               CAST((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT)
                   AS gap_s
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="Backward inclusive as-of join: each purchase event picks up the "
    "user's most recent prior-or-simultaneous view event (point-in-time "
    "feature attachment). Spark side is the union + window-carry-forward "
    "form — one shuffle on the key, no range join (operators/asof.py); "
    "oracle is DuckDB's native ASOF LEFT JOIN over a deduplicated right "
    "side. Left-outer: purchases before any view keep NULL view columns.",
    tags=("events", "join", "asof"),
)
def q_event_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.asof import asof_join

    e = tables(spark, sf)["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    j = asof_join(purchases, views)
    return j.select(
        "purchase_id",
        "user_id",
        F.unix_micros(F.col("ts")).cast("bigint").alias("ep_us"),
        F.col("event_id_r").alias("view_id"),
        F.col("value_r").alias("view_value"),
        (
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_r")))
            / F.lit(1000000)
        )
        .cast("bigint")
        .alias("gap_s"),
    )


@query(
    "event_asof_join_strict",
    oracle="""
        WITH v AS (
            SELECT user_id, ts,
                   MAX(event_id) AS view_id,
                   arg_max(value, event_id) AS view_value
            FROM events WHERE event_type = 'view'
            GROUP BY user_id, ts
        ), p AS (
            SELECT event_id AS purchase_id, user_id, ts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.purchase_id, p.user_id,
               CAST(epoch_us(p.ts) AS BIGINT) AS ep_us,
               v.view_id, v.view_value,
               CAST((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT)
                   AS gap_s
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND p.ts > v.ts
    """,
    doc="STRICT backward as-of join (pandas merge_asof "
    "allow_exact_matches=False / kdb prior-tick): each purchase picks "
    "the most recent view STRICTLY BEFORE it — a simultaneous view is "
    "invisible, the attribution shape for leakage-free point-in-time "
    "features (a same-instant observation is information from the "
    "future of the decision). Spark side is operators/asof.py's union + "
    "window-carry-forward with the tie order flipped (inclusive=False) "
    "— identical single-shuffle plan; oracle is DuckDB's native ASOF "
    "LEFT JOIN with a strict `>` predicate.",
    tags=("events", "join", "asof"),
)
def q_event_asof_join_strict(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.asof import asof_join

    e = tables(spark, sf)["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    j = asof_join(purchases, views, inclusive=False)
    return j.select(
        "purchase_id",
        "user_id",
        F.unix_micros(F.col("ts")).cast("bigint").alias("ep_us"),
        F.col("event_id_r").alias("view_id"),
        F.col("value_r").alias("view_value"),
        (
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_r")))
            / F.lit(1000000)
        )
        .cast("bigint")
        .alias("gap_s"),
    )


@query(
    "event_asof_nearest",
    oracle="""
        WITH v AS (
            SELECT user_id, ts,
                   MAX(event_id) AS view_id,
                   arg_max(value, event_id) AS view_value
            FROM events WHERE event_type = 'view'
            GROUP BY user_id, ts
        ), p AS (
            SELECT event_id AS purchase_id, user_id, ts
            FROM events WHERE event_type = 'purchase'
        ), b AS (
            SELECT p.purchase_id, p.user_id, p.ts,
                   v.ts AS b_ts, v.view_id AS b_id, v.view_value AS b_val
            FROM p ASOF LEFT JOIN v
              ON p.user_id = v.user_id AND p.ts >= v.ts
        ), f AS (
            SELECT p.purchase_id,
                   v.ts AS f_ts, v.view_id AS f_id, v.view_value AS f_val
            FROM p ASOF LEFT JOIN v
              ON p.user_id = v.user_id AND p.ts <= v.ts
        ), j AS (
            SELECT b.*, f.f_ts, f.f_id, f.f_val,
                   (b.b_ts IS NOT NULL AND (f.f_ts IS NULL OR
                        epoch_us(b.ts) - epoch_us(b.b_ts)
                        <= epoch_us(f.f_ts) - epoch_us(b.ts)))
                       AS pick_back
            FROM b JOIN f ON b.purchase_id = f.purchase_id
        )
        SELECT purchase_id, user_id,
               CASE WHEN pick_back THEN b_id ELSE f_id END AS view_id,
               CASE WHEN pick_back THEN b_val ELSE f_val END AS view_value,
               CAST(epoch_us(ts) - epoch_us(CASE WHEN pick_back THEN b_ts
                                            ELSE f_ts END) AS BIGINT)
                   AS gap_us
        FROM j
    """,
    doc="Nearest-match as-of join (pandas merge_asof direction='nearest' "
    "/ kdb aj): each purchase matches the view event with the smallest "
    "|Δt| in either direction, exact ties preferring the earlier "
    "(backward) candidate; purchases with no views at all keep NULLs. "
    "Spark side is ONE union + one sorted window pass producing both "
    "directional candidates (carry-forward last + carry-backward first "
    "share a single sort under a single Window node — "
    "operators/asof.py:asof_join_nearest), then a row-local pick; the "
    "oracle composes DuckDB's two directional ASOF LEFT JOINs. The gap "
    "is emitted in exact signed microseconds (no integer division — "
    "Spark DIV truncates toward zero, DuckDB // floors, and they differ "
    "on negative forward gaps). One shuffle on the key at any scale.",
    tags=("events", "join", "asof"),
)
def q_event_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.asof import (
        asof_join_nearest,
    )

    e = tables(spark, sf)["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    j = asof_join_nearest(purchases, views)
    return j.select(
        "purchase_id",
        "user_id",
        F.col("event_id_r").alias("view_id"),
        F.col("value_r").alias("view_value"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_r")))
        .cast("bigint")
        .alias("gap_us"),
    )


@query(
    "event_band_join",
    oracle="""
        WITH p AS (
            SELECT event_id AS purchase_id, user_id, ts
            FROM events WHERE event_type = 'purchase'
        ), v AS (
            SELECT user_id, ts, value
            FROM events WHERE event_type = 'view'
        )
        SELECT p.purchase_id, p.user_id,
               COUNT(v.user_id) AS n_views,
               CAST(COALESCE(SUM(CAST(v.value AS DECIMAL(18,6))), 0)
                    AS DOUBLE) AS sum_view_value
        FROM p LEFT JOIN v
          ON p.user_id = v.user_id
         AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR
                      AND p.ts + INTERVAL 1 HOUR
        GROUP BY p.purchase_id, p.user_id
    """,
    doc="Band (range) join: per purchase, the count and value-sum of the "
    "same user's view events within ±1 hour. Spark side decomposes the "
    "range predicate into a bucketed equi-join on (user, time-bucket) with "
    "a 3-bucket explode — no nested-loop/cartesian node at any scale "
    "(operators/range_join.py); the oracle states the naive range "
    "predicate directly. Sum is exact (decimal) then cast to DOUBLE; "
    "purchases with no nearby view keep count 0 / sum 0.",
    tags=("events", "join", "range"),
)
def q_event_band_join(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.range_join import band_join

    e = tables(spark, sf)["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    pairs = band_join(
        purchases, views, width_seconds=3600, right_cols=("value",)
    )
    per_purchase = pairs.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("value_r").cast("decimal(18,6)")).alias("_s"),
    )
    return purchases.join(per_purchase, "purchase_id", "left").select(
        "purchase_id",
        "user_id",
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_views"),
        F.coalesce(F.col("_s").cast("double"), F.lit(0.0)).alias(
            "sum_view_value"
        ),
    )


# Same ANSI text both engines, except the string type name (Spark: STRING,
# DuckDB: VARCHAR). The inner TIMESTAMP cast pins the render: DuckDB's
# date_trunc('day', ...) yields DATE ('2024-01-01'), Spark's a TIMESTAMP
# ('2024-01-01 00:00:00') — through TIMESTAMP both print the latter.
_TIME_ROLLUP_SQL = """
    SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS {s}) AS day,
           CAST(CAST(date_trunc('hour', ts) AS TIMESTAMP) AS {s}) AS hour,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS (
        (date_trunc('day', ts), event_type),
        (date_trunc('day', ts), date_trunc('hour', ts), event_type)
    )
"""


@query(
    "event_time_rollup",
    oracle=_TIME_ROLLUP_SQL.format(s="VARCHAR"),
    doc="Hypertable-style multi-granularity rollup (continuous-aggregate "
    "analogue): one GROUPING SETS pass produces hourly AND daily "
    "per-event-type aggregates — counts, distinct users, exact decimal "
    "value sums cast to DOUBLE. Identical ANSI SQL runs on both engines. "
    "Scale: Catalyst expands the sets into a single shuffle with partial "
    "aggregation; day-level rows reuse the same exchange, so the rollup "
    "costs one scan at any SF (vs one job per granularity).",
    tags=("events", "agg", "rollup"),
)
def q_event_time_rollup(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(_TIME_ROLLUP_SQL.format(s="STRING"))


@query(
    "text_topk_tokens",
    oracle="""
        SELECT token, COUNT(*) AS n
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
              FROM documents)
        WHERE token <> ''
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 100
    """,
    doc="Corpus vocabulary head: top-100 whitespace tokens by frequency "
    "(vocab construction / stopword mining). Explode + count + top-k; the "
    "groupBy is partial-aggregated map-side and the top-k collapses to "
    "TakeOrderedAndProject, so the full token list never sorts globally. "
    "Tie-broken on (count desc, token) for a total order.",
    tags=("text",),
)
def q_text_topk_tokens(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(100)
    )


@query(
    "doc_split",
    oracle="""
        SELECT doc_id,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                        THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    doc="Deterministic train/val/test assignment: md5 of the stable id, "
    "first hex byte compared lexicographically (fixed-width lowercase hex "
    "sorts numerically) against 'cd'/'e6' thresholds for a ~80/10/10 "
    "split. Row-local (no shuffle, no RNG state), reproducible across "
    "engines, runs, and retries — the property sample()/rand() cannot "
    "give a 100 TB pipeline.",
    tags=("text", "sampling"),
)
def q_doc_split(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < "cd", F.lit("train"))
        .when(bucket < "e6", F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@query(
    "embed_centroids",
    oracle="""
        SELECT CAST(label AS BIGINT) AS label,
               CAST(g.i - 1 AS BIGINT) AS pos,
               ROUND(CAST(SUM(CAST(CAST(embedding[g.i] AS DOUBLE)
                                   AS DECIMAL(28,12))) AS DOUBLE)
                     / COUNT(*), 6) AS c
        FROM embeddings, generate_series(1, 64) AS g(i)
        GROUP BY label, g.i
    """,
    doc="Per-class mean embedding (centroids) in long form (label, pos, c) "
    "— the class-prototype computation a curation pipeline runs before "
    "centroid-distance filtering or IVF seeding. posexplode + one "
    "partial-aggregatable groupBy((label, pos)): shuffle volume is "
    "|labels| x dim partial sums, never the corpus. Decimal-cast sums make "
    "the mean order-independent (exact across engines); division in DOUBLE "
    "after, rounded to 6 dp. Long output keeps the driver's value hash on "
    "scalars (array columns stringify engine-specifically). Oracle "
    "hardcodes dim=64 (DuckDB's generate_series cannot take a lateral "
    "len(embedding) arg); the Spark side is dim-agnostic.",
    tags=("similarity", "embedding"),
)
def q_embed_centroids(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["embeddings"]
    ex = e.select(
        F.col("label").cast("bigint").alias("label"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "val"
        ),
    )
    return ex.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
            / F.count("*"),
            6,
        ).alias("c")
    ).select("label", F.col("pos").cast("bigint").alias("pos"), "c")


@query(
    "text_histogram",
    oracle="""
        SELECT CAST(LEAST(n_chars // 64, 15) AS BIGINT) AS bucket,
               CAST(LEAST(n_chars // 64, 15) * 64 AS BIGINT) AS lo,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(n_chars) AS BIGINT) AS min_chars,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars
        FROM documents
        GROUP BY 1, 2
    """,
    doc="Document-length histogram: fixed-width 64-char buckets with a "
    "capped tail (LEAST caps the top bucket so outliers cannot explode "
    "group cardinality) — the length-distribution profile a corpus "
    "curation pass reads before setting min/max-length filters. Pure "
    "row-local arithmetic bucketing (integer division, no width_bucket "
    "dependency) + one partial-aggregatable groupBy.",
    tags=("text", "profiling"),
)
def q_text_histogram(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    bucket = F.least(
        F.floor(F.col("n_chars") / F.lit(64)).cast("bigint"),
        F.lit(15).cast("bigint"),
    )
    return d.groupBy(
        bucket.alias("bucket"), (bucket * 64).alias("lo")
    ).agg(
        F.count("*").alias("n"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "join_skew_salted",
    oracle="""
        SELECT d.doc_id, d.lang, CAST(lt.n AS BIGINT) AS lang_total
        FROM documents d
        JOIN (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang) lt
          ON d.lang = lt.lang
    """,
    doc="Skew-safe dimension join (operators/skew.py salted_join): lang is "
    "a hot low-cardinality key (a handful of values over the whole corpus),"
    " so an unsalted shuffle join lands each language on ONE reducer. The "
    "salted form widens the join key with pmod(xxhash64(doc_id), 8) on the "
    "fact side and an 8-way explode on the dimension side — each hot key "
    "spreads over 8 reducers, deterministically (no RNG state). Semantics "
    "are exactly the plain join, which is what the oracle states. "
    "Complements AQE skew-join (runtime splitting of sort-merge "
    "partitions) for cases known skewed up front.",
    tags=("join", "skew"),
)
def q_join_skew_salted(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.skew import salted_join

    d = tables(spark, sf)["documents"]
    dim = d.groupBy("lang").agg(F.count("*").alias("lang_total"))
    return salted_join(
        d.select("doc_id", "lang"), dim, ["lang"], "doc_id", n_salts=8
    )


@query(
    "text_contamination",
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                      FROM documents),
        sh AS (SELECT doc_id,
                      CASE WHEN len(w) >= 3
                           THEN list_distinct(list_transform(
                                range(1, len(w) - 1),
                                i -> array_to_string(w[i:i+2], ' ')))
                           ELSE [array_to_string(w, ' ')] END AS s
               FROM toks),
        hashed AS (SELECT doc_id,
                          list_distinct(list_transform(s, x ->
                            ('0x' || substr(md5(x), 1, 12))::BIGINT)) AS h
                   FROM sh),
        ex AS (SELECT doc_id, len(h) AS n_sh, unnest(h) AS sh FROM hashed),
        ev AS (SELECT doc_id AS eval_id, sh FROM ex WHERE doc_id % 53 = 0),
        tr AS (SELECT * FROM ex WHERE doc_id % 53 <> 0)
        SELECT tr.doc_id,
               CAST(COUNT(DISTINCT tr.sh) AS BIGINT) AS n_shared,
               CAST(COUNT(DISTINCT ev.eval_id) AS BIGINT) AS n_eval_docs,
               ROUND(COUNT(DISTINCT tr.sh)::DOUBLE / ANY_VALUE(tr.n_sh), 6)
                   AS frac
        FROM tr JOIN ev ON tr.sh = ev.sh
        GROUP BY tr.doc_id
    """,
    doc="Benchmark decontamination (operators/contamination.py): training "
    "docs sharing word-3-gram shingles with the eval slice (doc_id % 53 = "
    "0 stands in for a benchmark id list), with leaked-shingle count, hit "
    "eval-doc count, and leaked fraction of the doc's own shingle set. "
    "Map-only zip_with shingling reused from the dedup pass; the one "
    "data-sized shuffle is the equi-join on the 48-bit shingle hash; the "
    "benchmark side is small so AQE broadcasts it — no hint, no cross "
    "join. The standard pre-training leak check at corpus scale.",
    tags=("text", "contamination", "dedup"),
)
def q_text_contamination(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.contamination import (
        ngram_contamination,
    )

    d = tables(spark, sf)["documents"]
    return ngram_contamination(d, F.col("doc_id") % 53 == 0)


@query(
    "text_redact",
    oracle="""
        WITH aug AS (SELECT doc_id,
                            text || ' contact user' || doc_id ||
                            '@example.com or 555-123-4567.' AS t
                     FROM documents)
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                   '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted,
               CAST(len(regexp_extract_all(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                   AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t,
                   '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones
        FROM aug
    """,
    doc="PII redaction: emails and phone-shaped numbers replaced with "
    "typed placeholders, plus per-doc match counts for audit metrics. "
    "Row-local regexp_replace/regexp_count — map-only, no shuffle, "
    "whole-stage codegen. The fixture corpus contains no PII, so a "
    "deterministic synthetic contact line is appended first to make the "
    "redaction observable and hash-checkable. Patterns restricted to "
    "syntax with identical semantics in Java regex and RE2.",
    tags=("text", "privacy"),
)
def q_text_redact(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-123-4567."),
    )
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(t, email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("redacted"),
        F.regexp_count(t, F.lit(email)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(phone)).cast("bigint").alias("n_phones"),
    )


@query(
    "text_quality_rules",
    oracle="""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents),
        m AS (SELECT doc_id,
                     len(ws) AS n_words,
                     list_sum(list_transform(ws, x -> len(x)))::DOUBLE
                         / len(ws) AS mwl,
                     len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
                         ::DOUBLE / len(ws) AS alpha_frac,
                     len(list_filter(ws,
                         x -> x IN ('the', 'a', 'of', 'and'))) AS n_stop
              FROM w)
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               ROUND(mwl, 6) AS mean_word_len,
               ROUND(alpha_frac, 6) AS alpha_frac,
               n_words BETWEEN 5 AND 1000 AS r_len,
               mwl BETWEEN 2.0 AND 12.0 AS r_word_len,
               alpha_frac >= 0.6 AS r_alpha,
               n_stop >= 1 AS r_stopword,
               (n_words BETWEEN 5 AND 1000) AND (mwl BETWEEN 2.0 AND 12.0)
                   AND alpha_frac >= 0.6 AND n_stop >= 1 AS keep
        FROM m
    """,
    doc="Rule-based quality gate (Gopher-style repetition/format rules, "
    "Rae et al. 2021 public recipe): per-doc word count, mean word "
    "length, alphabetic-word fraction, and stopword presence, each as an "
    "explicit boolean rule plus the conjunctive keep decision — the "
    "auditable filter a curation pipeline applies before training, as "
    "opposed to text_quality's opaque score. Row-local JVM higher-order "
    "functions (split/filter/aggregate), no shuffle, whole-stage codegen; "
    "integer word-length sums are exact so the DOUBLE means are "
    "bit-identical across engines.",
    tags=("text", "quality"),
)
def q_text_quality_rules(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    ws = F.split(F.col("text"), " ")
    n = F.size(ws)
    wl_sum = F.aggregate(
        F.transform(ws, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    mwl = wl_sum.cast("double") / n
    alpha = F.size(F.filter(ws, lambda x: x.rlike("[a-z]"))).cast("double") / n
    n_stop = F.size(
        F.filter(ws, lambda x: x.isin("the", "a", "of", "and"))
    )
    r_len = (n >= 5) & (n <= 1000)
    r_wl = (mwl >= 2.0) & (mwl <= 12.0)
    r_alpha = alpha >= 0.6
    r_stop = n_stop >= 1
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(alpha, 6).alias("alpha_frac"),
        r_len.alias("r_len"),
        r_wl.alias("r_word_len"),
        r_alpha.alias("r_alpha"),
        r_stop.alias("r_stopword"),
        (r_len & r_wl & r_alpha & r_stop).alias("keep"),
    )


@query(
    "doc_sample_stratified",
    oracle="""
        SELECT doc_id, lang,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
              CASE lang WHEN 'en' THEN '40' WHEN 'zh' THEN '80'
                        ELSE 'ff' END
    """,
    doc="Stratified downsampling with per-language rates (en ~25%, zh "
    "~50%, others ~99.6%) — the language-rebalancing step of a corpus "
    "mix. Same md5-bucket idiom as doc_split: deterministic, row-local, "
    "no RNG state, reproducible across engines/runs/retries, and the "
    "rate table is a CASE over the stratum key so the filter stays a "
    "pushable row-local predicate (no per-stratum windows or joins at "
    "100 TB).",
    tags=("text", "sampling"),
)
def q_doc_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    limit = (
        F.when(F.col("lang") == "en", F.lit("40"))
        .when(F.col("lang") == "zh", F.lit("80"))
        .otherwise(F.lit("ff"))
    )
    return d.select("doc_id", "lang", bucket.alias("bucket"), limit.alias("_l")).filter(
        F.col("bucket") < F.col("_l")
    ).drop("_l")


@query(
    "embed_quantize",
    oracle="""
        WITH e AS (SELECT vec_id,
                          list_transform(embedding,
                                         x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        s AS (SELECT vec_id, v,
                     list_min(v) AS vmin, list_max(v) AS vmax,
                     (list_max(v) - list_min(v)) / 255.0 AS scale
              FROM e),
        q AS (SELECT vec_id, vmin, vmax, scale,
                     list_transform(v, x -> CAST(LEAST(FLOOR(
                         (x - vmin) / scale), 255.0) AS BIGINT)) AS qv,
                     v
              FROM s)
        SELECT vec_id,
               ROUND(vmin, 6) AS vmin,
               ROUND(vmax, 6) AS vmax,
               CAST(list_min(qv) AS BIGINT) AS qmin,
               CAST(list_max(qv) AS BIGINT) AS qmax,
               ROUND(CAST(list_sum(qv) AS DOUBLE) / len(qv), 6) AS qmean,
               ROUND(list_max(list_transform(range(1, len(v) + 1),
                   i -> (v[i] - vmin) / scale - qv[i])), 6) AS max_err_levels
        FROM q
    """,
    doc="Per-vector int8 scalar quantization (the storage/compute "
    "compression step before ANN indexing at corpus scale): min-max "
    "levels in [0,255] via FLOOR, plus a reconstruction-error audit in "
    "level units (max of (x-vmin)/scale - q; multiply by scale for the "
    "absolute error). Row-local transform/aggregate over the "
    "embedding array — map-only, no shuffle, dim-agnostic on the Spark "
    "side. FLOOR (not ROUND) for the level so the double arithmetic is "
    "branch-free and bit-identical across engines; LEAST(...,255) guards "
    "the vmax element's fp edge. Fixture vectors are non-constant so "
    "scale > 0.",
    tags=("similarity", "embedding"),
)
def q_embed_quantize(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["embeddings"]
    v = F.col("embedding").cast("array<double>")
    df = e.select("vec_id", v.alias("v"))
    # Raw intermediates keep underscore names: the output columns below
    # reuse "vmin"/"vmax" for their ROUNDED forms, and Catalyst's project
    # collapse would otherwise resolve the error lambda against the rounded
    # alias (bitten: a silent 1e-4 systematic drift vs the oracle).
    df = df.select(
        "vec_id",
        "v",
        F.array_min("v").alias("_vmin"),
        F.array_max("v").alias("_vmax"),
        ((F.array_max("v") - F.array_min("v")) / 255.0).alias("_scale"),
    )
    df = df.select(
        "vec_id",
        "v",
        "_vmin",
        "_vmax",
        "_scale",
        F.transform(
            F.col("v"),
            lambda x: F.least(
                F.floor((x - F.col("_vmin")) / F.col("_scale")), F.lit(255.0)
            ).cast("bigint"),
        ).alias("qv"),
    )
    # Error reported in quantization LEVELS: (x - vmin)/scale - q, a
    # sub/div/sub chain with no mul-add that a compiler could fuse (FMA) —
    # the absolute-error form vmin + q*scale rounded differently between
    # engines at the last ulp and flipped the 6-dp hash.
    err = F.zip_with(
        F.col("v"),
        F.col("qv"),
        lambda x, q: (x - F.col("_vmin")) / F.col("_scale") - q,
    )
    return df.select(
        "vec_id",
        F.round("_vmin", 6).alias("vmin"),
        F.round("_vmax", 6).alias("vmax"),
        F.array_min("qv").cast("bigint").alias("qmin"),
        F.array_max("qv").cast("bigint").alias("qmax"),
        F.round(
            F.aggregate("qv", F.lit(0).cast("bigint"), lambda a, x: a + x).cast(
                "double"
            )
            / F.size("qv"),
            6,
        ).alias("qmean"),
        F.round(F.array_max(err), 6).alias("max_err_levels"),
    )


@query(
    "corpus_mix_report",
    oracle="""
        WITH per AS (SELECT lang, source,
                            CAST(COUNT(*) AS BIGINT) AS n_docs,
                            CAST(SUM(len(string_split(text, ' ')))
                                 AS BIGINT) AS n_tokens
                     FROM documents
                     GROUP BY lang, source)
        SELECT lang, source, n_docs, n_tokens,
               ROUND(CAST(n_tokens AS DOUBLE)
                     / SUM(n_tokens) OVER (), 6) AS token_share
        FROM per
    """,
    doc="Data-mixture report: docs and whitespace tokens per (lang, "
    "source) stratum with each stratum's share of total corpus tokens — "
    "the table a pretraining run's sampling weights are tuned against. "
    "One partial-aggregatable groupBy (shuffle volume = |strata|, never "
    "the corpus); the global total is a window over the already-tiny "
    "aggregate, so no second pass over the data. Integer token sums are "
    "exact; the share division happens in DOUBLE on exact BIGINTs.",
    tags=("text", "sampling", "profiling"),
)
def q_corpus_mix_report(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = tables(spark, sf)["documents"]
    per = d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
    )
    total = F.sum("n_tokens").over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return per.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / total, 6).alias(
            "token_share"
        ),
    )


@query(
    "pipeline_curate",
    oracle="""
        WITH w AS (SELECT doc_id, lang, text,
                          string_split(text, ' ') AS ws
                   FROM documents),
        gated AS (SELECT doc_id, lang, text FROM w
                  WHERE len(ws) BETWEEN 5 AND 1000
                    AND len(list_filter(ws,
                        x -> x IN ('the', 'a', 'of', 'and'))) >= 1),
        canon AS (SELECT MIN(doc_id) AS doc_id
                  FROM gated GROUP BY md5(text)),
        kept AS (SELECT g.doc_id, g.lang FROM gated g
                 JOIN canon c ON g.doc_id = c.doc_id)
        SELECT doc_id, lang,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                        THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM kept
    """,
    doc="End-to-end curation pipeline composing three operators: quality "
    "gate (text_quality_rules subset) -> exact dedup canonical-keeper "
    "(dedup_exact's MIN(doc_id)-per-md5 idiom) -> deterministic "
    "train/val/test split (doc_split). The composition stays one Spark "
    "job: the gate is a pushable row-local filter, dedup is the single "
    "data-sized shuffle (on the text digest), and the split is another "
    "row-local projection — exactly the lineage a 100 TB curation run "
    "executes, demonstrated as one declarative plan rather than three "
    "materialized passes.",
    tags=("text", "pipeline", "dedup", "sampling"),
)
def q_pipeline_curate(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    ws = F.split(F.col("text"), " ")
    n = F.size(ws)
    n_stop = F.size(F.filter(ws, lambda x: x.isin("the", "a", "of", "and")))
    gated = d.filter((n >= 5) & (n <= 1000) & (n_stop >= 1)).select(
        "doc_id", "lang", "text"
    )
    canon = gated.groupBy(F.md5("text").alias("_dig")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = gated.join(canon.select("doc_id"), "doc_id").select("doc_id", "lang")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return kept.select(
        "doc_id",
        "lang",
        F.when(bucket < "cd", F.lit("train"))
        .when(bucket < "e6", F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@query(
    "pipeline_curate_v2",
    oracle=f"""
        WITH w AS (SELECT doc_id, lang, text, n_chars,
                          list_filter(string_split(lower(text), ' '),
                                      x -> x <> '') AS ws
                   FROM documents),
        gated AS (SELECT doc_id, lang, text, n_chars FROM w
                  WHERE len(ws) BETWEEN 5 AND 1000
                    AND 1.0 - CAST(len(list_distinct(ws)) AS DOUBLE)
                              / len(ws) <= 0.4),
        best AS (SELECT doc_id,
                        ROW_NUMBER() OVER (PARTITION BY md5(text)
                            ORDER BY n_chars DESC, doc_id) AS rn
                 FROM gated),
        kept AS (SELECT g.doc_id, g.lang FROM gated g
                 JOIN best b ON b.doc_id = g.doc_id AND b.rn = 1),
        lc AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n FROM kept
               GROUP BY lang),
        mn AS (SELECT MIN(n) AS n_min FROM lc),
        rate AS (SELECT lang,
                        POWER(n / (SELECT n_min FROM mn),
                              {MIX_TEMPERATURE_ALPHA} - 1.0) AS keep_rate
                 FROM lc)
        SELECT k.doc_id, k.lang
        FROM kept k JOIN rate r ON k.lang = r.lang
        WHERE CAST(('0x' || substring(md5(CAST(k.doc_id AS VARCHAR)), 1, 4))
                   AS INTEGER) / 65536.0 < r.keep_rate
    """,
    doc="Round-3 curation pipeline: composes the round's new operators in "
    "ONE declarative plan — repetition gate (row-local dup-word fraction "
    "via array_distinct, no token shuffle), quality-ranked exact dedup "
    "(dedup_exact_keepbest's max_by argmax on the text digest — the only "
    "corpus-sized shuffle), temperature-flattened language sampling "
    "(doc_sample_temperature's tiny broadcast rate table + row-local "
    "md5-bucket keep). Threshold comparisons on raw doubles are safe "
    "cross-engine (identical IEEE inputs compare identically; only "
    "ROUND diverges) so no rounding appears anywhere in the plan. This "
    "is the lineage a 100 TB curation run executes as a single job.",
    tags=("text", "pipeline", "dedup", "sampling"),
)
def q_pipeline_curate_v2(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    ws = F.expr("filter(split(lower(text), ' '), x -> x != '')")
    n = F.size(ws)
    dup_frac = F.lit(1.0) - F.size(F.array_distinct(ws)).cast("double") / n
    gated = d.filter((n >= 5) & (n <= 1000) & (dup_frac <= 0.4)).select(
        "doc_id", "lang", "text", "n_chars"
    )
    winners = gated.groupBy(F.md5("text").alias("_dig")).agg(
        F.max_by(
            F.col("doc_id"),
            F.struct(F.col("n_chars").alias("s"), (-F.col("doc_id")).alias("ni")),
        ).alias("doc_id")
    )
    kept = gated.join(winners.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id", "lang"
    )
    lc = kept.groupBy("lang").agg(F.count("*").cast("double").alias("n"))
    n_min = lc.agg(F.min("n").alias("n_min"))
    rate = lc.crossJoin(F.broadcast(n_min)).select(
        "lang",
        F.pow(F.col("n") / F.col("n_min"), F.lit(MIX_TEMPERATURE_ALPHA - 1.0)).alias(
            "keep_rate"
        ),
    )
    draw = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("double")
        / F.lit(65536.0)
    )
    return (
        kept.join(F.broadcast(rate), "lang")
        .filter(draw < F.col("keep_rate"))
        .select("doc_id", "lang")
    )


@query(
    "event_gapfill",
    oracle="""
        WITH agg AS (SELECT event_type,
                            (epoch_us(ts) // 1000000 // 3600) * 3600 AS b,
                            CAST(COUNT(*) AS BIGINT) AS n_obs
                     FROM events GROUP BY 1, 2),
        bounds AS (SELECT event_type, MIN(b) AS mn, MAX(b) AS mx FROM agg
                   GROUP BY event_type),
        spine AS (SELECT event_type,
                         unnest(generate_series(mn, mx, 3600)) AS b
                  FROM bounds)
        SELECT s.event_type,
               CAST(s.b AS BIGINT) AS bucket,
               COALESCE(a.n_obs, 0) AS n_obs,
               a.n_obs IS NULL AS is_gap,
               last_value(a.n_obs IGNORE NULLS)
                   OVER (PARTITION BY s.event_type ORDER BY s.b)
                   AS n_locf
        FROM spine s LEFT JOIN agg a
             ON s.event_type = a.event_type AND s.b = a.b
    """,
    doc="Time-series gap filling (the hypertable 'time_bucket_gapfill' "
    "pattern): hourly observation counts per event type densified onto a "
    "complete bucket spine between each type's first and last hour, with "
    "gap flags and last-observation-carried-forward. Scale shape: the "
    "corpus-sized work is ONE partial-aggregatable groupBy; the spine is "
    "generated from the |types|-row bounds aggregate via "
    "sequence+explode (rows = types x hours, independent of event "
    "count), so the left join and LOCF window run on the tiny aggregate, "
    "never the raw 100 TB stream.",
    tags=("temporal", "gapfill"),
)
def q_event_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = tables(spark, sf)["events"]
    b = ((F.unix_micros(F.col("ts")) / 1000000).cast("bigint") / 3600).cast(
        "bigint"
    ) * 3600
    agg = e.groupBy(F.col("event_type"), b.alias("b")).agg(
        F.count("*").alias("n_obs")
    )
    bounds = agg.groupBy("event_type").agg(
        F.min("b").alias("mn"), F.max("b").alias("mx")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.lit(3600))).alias("b"),
    )
    joined = spine.join(agg, ["event_type", "b"], "left")
    w = Window.partitionBy("event_type").orderBy("b")
    return joined.select(
        "event_type",
        F.col("b").cast("bigint").alias("bucket"),
        F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
        F.col("n_obs").isNull().alias("is_gap"),
        F.last("n_obs", ignorenulls=True).over(w).alias("n_locf"),
    )


@query(
    "multimodal_resize",
    oracle="""
        WITH dec AS (SELECT doc_id,
                            ('0x' || substr(sha256(text), 1, 4))::BIGINT
                                % 1024 + 1 AS width,
                            ('0x' || substr(sha256(text), 5, 4))::BIGINT
                                % 1024 + 1 AS height
                     FROM documents)
        SELECT doc_id,
               CAST(width AS BIGINT) AS width,
               CAST(height AS BIGINT) AS height,
               CAST(FLOOR(width / (CASE WHEN GREATEST(width, height) > 256
                    THEN GREATEST(width, height) / 256.0 ELSE 1.0 END))
                    AS BIGINT) AS target_w,
               CAST(FLOOR(height / (CASE WHEN GREATEST(width, height) > 256
                    THEN GREATEST(width, height) / 256.0 ELSE 1.0 END))
                    AS BIGINT) AS target_h
        FROM dec
    """,
    doc="Resize planning stage (operators/multimodal.py resize_meta): "
    "aspect-preserving target dimensions capped at max_side=256, computed "
    "from the decode stage's metadata. The planning half is pure JVM "
    "column math (map-only, no Python); a real byte-level resize is the "
    "follow-on mapInPandas stage consuming (payload, target_w, target_h). "
    "Oracle replays the deterministic fake decoder's sha256-derived "
    "dimensions, so the full decode->plan lineage is value-checked.",
    tags=("multimodal",),
)
def q_multimodal_resize(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.multimodal import (
        decode_images,
        resize_meta,
        with_blob,
    )

    d = tables(spark, sf)["documents"]
    return resize_meta(decode_images(with_blob(d)), max_side=256)


@query(
    "multimodal_frames",
    oracle="""
        WITH dec AS (SELECT doc_id,
                            ('0x' || substr(sha256(text), 1, 4))::BIGINT
                                % 1024 + 1 AS width
                     FROM documents)
        SELECT doc_id, CAST(unnest(range(0, width, 10)) AS BIGINT)
                   AS frame_idx
        FROM dec
    """,
    doc="Frame-sampling stage for video payloads (operators/multimodal.py "
    "sample_frames): every 10th frame index in [0, n_frames) exploded to "
    "one row per sampled frame (the fake decode's width column stands in "
    "for the frame count). sequence+explode is map-only fan-out — the "
    "same plan shape a real ffmpeg-backed sampler produces, with output "
    "rows proportional to sampled frames, not raw bytes.",
    tags=("multimodal",),
)
def q_multimodal_frames(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.multimodal import (
        decode_images,
        sample_frames,
        with_blob,
    )

    d = tables(spark, sf)["documents"]
    return sample_frames(decode_images(with_blob(d)), "width", every_n=10)


@query(
    "event_session_window_native",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ep_us,
                   CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                             - LAG(CAST(epoch_us(ts) AS BIGINT)) OVER w
                             > 1800000000
                             OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT user_id, ep_us,
                   SUM(new_session) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sid
            FROM flagged
        )
        SELECT user_id,
               CAST(MIN(ep_us) AS BIGINT) AS session_start_us,
               CAST(MAX(ep_us) + 1800000000 AS BIGINT) AS session_end_us,
               COUNT(*) AS n_events
        FROM numbered
        GROUP BY user_id, sid
    """,
    doc="Spark's NATIVE session_window operator (30 min gap), batch form — "
    "the built-in counterpart of event_sessionize's lag+cumsum. One "
    "shuffle on user_id; MergingSessions aggregation needs no second "
    "window pass, so it is the cheaper plan at 100 TB (and the same "
    "expression works under readStream for the streaming form, cf. "
    "streaming/stateful.py). Oracle replays Spark's merge rule exactly: "
    "sessions split only when the inter-event gap strictly exceeds the "
    "gap duration (an exactly-1800 s gap MERGES — verified empirically), "
    "session end = last event + gap. Microsecond integer arithmetic end "
    "to end, so the hash check is exact.",
    tags=("events", "session", "streaming"),
)
def q_event_session_window_native(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"]
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start")
            .cast("bigint")
            .alias("session_start_us"),
            F.unix_micros("session_window.end")
            .cast("bigint")
            .alias("session_end_us"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Document preparation: chunking, packing, n-grams, lexical entropy
# ---------------------------------------------------------------------------

#: doc_chunk window geometry: 64-word chunks every 48 words (16-word overlap).
CHUNK_WORDS = 64
CHUNK_STRIDE = 48


@query(
    "doc_chunk",
    oracle=f"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
                   FROM documents),
             s AS (SELECT doc_id, words,
                          unnest(range(0, greatest(len(words), 1),
                                 {CHUNK_STRIDE})) AS start
                   FROM w)
        SELECT doc_id,
               CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(least({CHUNK_WORDS}, len(words) - start) AS BIGINT)
                   AS n_words,
               array_to_string(list_slice(words, start + 1,
                                          start + {CHUNK_WORDS}), ' ')
                   AS chunk_text
        FROM s
    """,
    doc="Overlapping sliding-window chunking (64-word chunks, 48-word "
    "stride) — the RAG/pretraining text-splitting primitive. Row-local: "
    "split once, generate start offsets with sequence(), posexplode + "
    "slice; no shuffle at all, so it scales embarrassingly (chunk count "
    "per doc is data-independent of cluster size). Chunk identity = "
    "(doc_id, chunk_idx) with chunk_idx = start/stride.",
    tags=("text", "chunking"),
)
def q_doc_chunk(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.functions.text import chunk_words

    d = tables(spark, sf)["documents"]
    return chunk_words(d, chunk=CHUNK_WORDS, stride=CHUNK_STRIDE)


#: doc_pack bin capacity in estimated BPE tokens (chars/4, cf. text_tokens).
PACK_CAPACITY = 2048


@query(
    "doc_pack",
    oracle=f"""
        WITH t AS (SELECT doc_id, source,
                          CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS tokens
                   FROM documents),
             c AS (SELECT doc_id, source, tokens,
                          SUM(tokens) OVER
                            (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS cum_tokens
                   FROM t)
        SELECT doc_id, source, tokens,
               CAST(cum_tokens AS BIGINT) AS cum_tokens,
               CAST((cum_tokens - tokens) // {PACK_CAPACITY} AS BIGINT)
                   AS bin_id,
               CAST(cum_tokens - tokens
                    - ((cum_tokens - tokens) // {PACK_CAPACITY})
                      * {PACK_CAPACITY} AS BIGINT) AS bin_offset
        FROM c
    """,
    doc="Greedy contiguous sequence packing: documents are laid end-to-end "
    "per shard (source) in doc_id order and cut into 2048-token training "
    "bins — bin_id/bin_offset give each doc its (sequence, position) slot. "
    "The running sum is a single window per shard key, so parallelism = "
    "shard count and no global sort exists; at 100 TB packing is per-shard "
    "by construction (a global ORDER BY would serialize on one task, which "
    "is why the window partitions by source).",
    tags=("text", "packing"),
)
def q_doc_pack(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = tables(spark, sf)["documents"]
    tokens = F.ceil(F.length("text") / 4.0).cast("bigint")
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    t = d.select("doc_id", "source", tokens.alias("tokens"))
    cum = F.sum("tokens").over(w)
    start = cum - F.col("tokens")
    return t.select(
        "doc_id",
        "source",
        "tokens",
        cum.cast("bigint").alias("cum_tokens"),
        F.floor(start / PACK_CAPACITY).cast("bigint").alias("bin_id"),
        (start - F.floor(start / PACK_CAPACITY) * PACK_CAPACITY)
        .cast("bigint")
        .alias("bin_offset"),
    )


@query(
    "text_ngrams_top",
    oracle="""
        WITH w AS (SELECT list_filter(string_split(lower(text), ' '),
                                      x -> x <> '') AS words
                   FROM documents),
             i AS (SELECT words, unnest(range(1, len(words))) AS i FROM w)
        SELECT list_extract(words, i) || ' ' || list_extract(words, i + 1)
                   AS bigram,
               COUNT(*) AS n
        FROM i
        GROUP BY 1
        ORDER BY n DESC, bigram
        LIMIT 50
    """,
    doc="Corpus top-50 bigrams: the n-gram sibling of text_topk_tokens "
    "(collocation mining / contamination probes). Adjacent pairs come from "
    "zip_with over two array slices — row-local, no self-join on token "
    "position — then one partial-aggregated groupBy and a "
    "TakeOrderedAndProject top-k; ties broken on (count desc, bigram).",
    tags=("text",),
)
def q_text_ngrams_top(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    words = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    n1 = F.greatest(F.size(words) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(words, 1, n1),
        F.slice(words, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(50)
    )


@query(
    "text_entropy",
    oracle="""
        WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
                     FROM documents),
             cnt AS (SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS c
                     FROM tok WHERE w <> '' GROUP BY doc_id, w),
             tot AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS vocab
                     FROM cnt GROUP BY doc_id)
        SELECT cnt.doc_id,
               CAST(ANY_VALUE(vocab) AS BIGINT) AS vocab,
               ROUND(log2(ANY_VALUE(n))
                     - SUM(c * log2(c)) / ANY_VALUE(n), 6) AS token_entropy
        FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
        GROUP BY cnt.doc_id
    """,
    doc="Per-document token-distribution Shannon entropy plus vocabulary "
    "size — the lexical-diversity quality signal (low entropy flags "
    "boilerplate/repetition). Computed as log2(n) - sum(c*log2(c))/n from "
    "integer counts so only one float division happens per doc; rounded "
    "to 6 decimals (summation-order ulp discipline, same as the "
    "similarity scores). Two partial-aggregatable shuffles on "
    "(doc_id, token) then doc_id.",
    tags=("text", "quality"),
)
def q_text_entropy(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    cnt = tok.groupBy("doc_id", "w").agg(
        F.count("*").cast("double").alias("c")
    )
    return cnt.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("vocab"),
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
            6,
        ).alias("token_entropy"),
    )


@query(
    "text_repetition",
    oracle="""
        WITH w AS (SELECT doc_id,
                          unnest(string_split(lower(text), ' ')) AS word
                   FROM documents),
             wc AS (SELECT doc_id, word, COUNT(*) AS c
                    FROM w WHERE word <> '' GROUP BY doc_id, word),
             tot AS (SELECT doc_id,
                            CAST(SUM(c) AS BIGINT) AS n_words,
                            CAST(COUNT(*) AS BIGINT) AS n_distinct,
                            SUM(len(word) * c) AS word_chars
                     FROM wc GROUP BY doc_id),
             top AS (SELECT doc_id, word, c,
                            ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY c DESC, word) AS rn
                     FROM wc),
             ws AS (SELECT doc_id,
                           list_filter(string_split(lower(text), ' '),
                                       x -> x <> '') AS a
                    FROM documents),
             bg AS (SELECT doc_id,
                           unnest(list_transform(range(1, len(a)),
                               i -> a[i] || ' ' || a[i + 1])) AS bigram
                    FROM ws WHERE len(a) >= 2),
             bc AS (SELECT doc_id, bigram, COUNT(*) AS c
                    FROM bg GROUP BY doc_id, bigram),
             btop AS (SELECT doc_id,
                             MAX(c) AS top_c,
                             CAST(SUM(c) AS BIGINT) AS n_bigrams
                      FROM bc GROUP BY doc_id)
        SELECT t.doc_id,
               t.n_words,
               ROUND(CAST(p.c * len(p.word) AS DOUBLE) / t.word_chars, 6)
                   AS top_word_char_frac,
               ROUND(1.0 - CAST(t.n_distinct AS DOUBLE) / t.n_words, 6)
                   AS dup_word_frac,
               ROUND(CAST(b.top_c AS DOUBLE) / b.n_bigrams, 6)
                   AS top_bigram_frac
        FROM tot t
        JOIN top p ON p.doc_id = t.doc_id AND p.rn = 1
        JOIN btop b ON b.doc_id = t.doc_id
    """,
    doc="Repetition quality signals per document, the word-level analogues "
    "of the Gopher repetition filters (fraction of characters in the most "
    "frequent word, duplicate-word fraction, most-frequent-bigram "
    "coverage) — high values flag machine-generated/boilerplate text for "
    "the curation gate. Tie-break for the top word is (count DESC, word) "
    "so both engines pick the same word. Plan: explode -> two "
    "partial-aggregated shuffles keyed (doc_id, token) then doc_id — the "
    "same shape as text_entropy; bigrams are built row-locally with "
    "zip_with over array slices (no self-join). Docs with < 2 words are "
    "excluded (no bigram denominator), matching the oracle's len>=2.",
    tags=("text", "quality"),
)
def q_text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    words = d.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x != '')").alias("a"),
    )
    w = words.select("doc_id", F.explode("a").alias("word"))
    wc = w.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    tot = wc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_words"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.sum(F.length("word") * F.col("c")).alias("word_chars"),
    )
    from pyspark.sql import Window as W

    top = (
        wc.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(F.col("c").desc(), "word")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("word").alias("top_word"), F.col("c").alias("top_word_c"))
    )
    bg = words.filter(F.size("a") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(a, 1, size(a) - 1),"
                "         slice(a, 2, size(a) - 1),"
                "         (x, y) -> concat(x, ' ', y))"
            )
        ).alias("bigram"),
    )
    bc = bg.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    btop = bc.groupBy("doc_id").agg(
        F.max("c").alias("top_c"),
        F.sum("c").cast("bigint").alias("n_bigrams"),
    )
    return (
        tot.join(top, "doc_id")
        .join(btop, "doc_id")
        .select(
            "doc_id",
            "n_words",
            F.round(
                (F.col("top_word_c") * F.length("top_word")).cast("double")
                / F.col("word_chars"),
                6,
            ).alias("top_word_char_frac"),
            F.round(
                F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_words"),
                6,
            ).alias("dup_word_frac"),
            F.round(
                F.col("top_c").cast("double") / F.col("n_bigrams"), 6
            ).alias("top_bigram_frac"),
        )
    )


@query(
    "doc_sample_temperature",
    oracle=f"""
        WITH lc AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n
                    FROM documents GROUP BY lang),
             mn AS (SELECT MIN(n) AS n_min FROM lc),
             rate AS (SELECT lang,
                             POWER(n / (SELECT n_min FROM mn),
                                   {MIX_TEMPERATURE_ALPHA} - 1.0) AS keep_rate
                      FROM lc)
        SELECT d.doc_id, d.lang, ROUND(r.keep_rate, 6) AS keep_rate
        FROM documents d JOIN rate r ON d.lang = r.lang
        WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))
                   AS INTEGER) / 65536.0 < r.keep_rate
    """,
    doc="Temperature-flattened language mixture (the multilingual-corpus "
    "rebalancing step): keep-rate per language = (n_lang/n_min)^(alpha-1) "
    "with alpha=0.5, so the rarest language keeps 100% and dominant "
    "languages are downsampled toward counts ∝ n^alpha. Selection reuses "
    "the deterministic md5-bucket idiom (first 4 hex chars as a uniform "
    "[0,1) draw) — reproducible across engines/runs/retries, no RNG "
    "state. Plan: one tiny language-count aggregate broadcast back onto "
    "the corpus; the keep decision is a row-local pushable predicate "
    "(no per-stratum windows at 100 TB).",
    tags=("text", "sampling"),
)
def q_doc_sample_temperature(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    lc = d.groupBy("lang").agg(F.count("*").cast("double").alias("n"))
    n_min = lc.agg(F.min("n").alias("n_min"))
    rate = lc.crossJoin(F.broadcast(n_min)).select(
        "lang",
        F.pow(F.col("n") / F.col("n_min"), F.lit(MIX_TEMPERATURE_ALPHA - 1.0)).alias(
            "keep_rate"
        ),
    )
    draw = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("double")
        / F.lit(65536.0)
    )
    return (
        d.join(F.broadcast(rate), "lang")
        .filter(draw < F.col("keep_rate"))
        .select("doc_id", "lang", F.round("keep_rate", 6).alias("keep_rate"))
    )


# ---------------------------------------------------------------------------
# Iterative graph algorithms
# ---------------------------------------------------------------------------

#: PageRank parameters: damping, fixed unrolled iteration count, and the
#: lineage-control cadence: every PR_CHECKPOINT_EVERY-th iteration the rank
#: frame is localCheckpoint(eager)ed so plan depth stays bounded for deep
#: loops (at the default 3 iterations the cadence never fires — the unrolled
#: plan is cheaper than an extra materialization job).
PR_DAMPING = 0.85
PR_ITERS = 3
PR_CHECKPOINT_EVERY = 4
#: Rank-vector rows below this count are broadcast into the per-step edge
#: join (killing the per-iteration |E| shuffle); above it the step falls
#: back to the co-partitioned shuffle join — the broadcast is ~24 B/row, so
#: 2M rows ≈ 50 MB, a safe executor broadcast. |V| ≪ |E| holds for most
#: real graphs, but the fallback keeps billion-node graphs correct.
PR_BROADCAST_MAX_NODES = 2_000_000


def _pagerank_oracle() -> str:
    """Unroll PR_ITERS PageRank steps as a CTE chain (same math as Spark)."""
    steps = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        steps.append(
            f"""it{k} AS (
                SELECT e.dst AS node, SUM({prev}.r / {prev}.deg) AS c
                FROM e JOIN {prev} ON e.src = {prev}.node GROUP BY e.dst
            ),
            r{k} AS (
                SELECT d.node, d.deg,
                       (SELECT {1 - PR_DAMPING} / n FROM n) + {PR_DAMPING} * COALESCE(it{k}.c, 0) AS r
                FROM deg d LEFT JOIN it{k} ON d.node = it{k}.node
            )"""
        )
        prev = f"r{k}"
    chain = ",\n            ".join(steps)
    return f"""
        WITH e0 AS (SELECT DISTINCT 'p' || l_partkey AS src,
                                    's' || l_suppkey AS dst
                    FROM lineitem),
             e AS (SELECT src, dst FROM e0
                   UNION ALL
                   SELECT dst AS src, src AS dst FROM e0),
             deg AS (SELECT src AS node, CAST(COUNT(*) AS DOUBLE) AS deg
                     FROM e GROUP BY src),
             n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
             r0 AS (SELECT node, deg, (SELECT 1.0 / n FROM n) AS r FROM deg),
             {chain}
        SELECT node, ROUND(r, 6) AS rank FROM r{PR_ITERS}
    """


@query(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    doc="Iterative algorithm on DataFrames: PageRank over the undirected "
    "part-supplier bipartite graph (edges = distinct lineitem pairs, both "
    "directions), 3 fixed iterations at d=0.85. Node ids are packed into "
    "BIGINT (part p -> 2p, supplier s -> 2s+1) so every join/agg hashes "
    "and shuffles fixed-width ints; the 'p../s..' strings are rebuilt only "
    "in the final projection. Per step the rank vector (|V| rows) is "
    "broadcast into the edge join when |V| <= PR_BROADCAST_MAX_NODES — the "
    "edge table then never re-shuffles after construction — falling back "
    "to the co-partitioned shuffle join for billion-node graphs. Every "
    "node has outdegree >= 1 by construction (no dangling mass). Deep "
    "loops localCheckpoint the rank frame every PR_CHECKPOINT_EVERY steps "
    "(lineage control; no-op at 3). The result is materialized eagerly and "
    "the e/deg invariant caches are unpersisted before returning, so "
    "long-lived sessions don't accumulate cache blocks per invocation "
    "(round-2 ADVICE). Contribution sums drift only in the last ulp "
    "between engines, absorbed by the 6-decimal round.",
    tags=("graph", "iterative"),
)
def q_graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    li = tables(spark, sf)["lineitem"]
    e0 = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    e = e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # e and deg feed EVERY iteration plus the final projection; persist the
    # invariants (MEMORY_AND_DISK default spills for graphs larger than
    # executor memory) — exchange reuse alone breaks under AQE replanning
    # for deeper loops.
    e = e.persist()
    deg = (
        e.groupBy("src")
        .agg(F.count("*").cast("double").alias("deg"))
        .select(F.col("src").alias("node"), "deg")
        .persist()
    )
    # One cheap job on the cached invariant: materializes deg AND yields the
    # node count that picks the per-step join strategy (broadcast vs
    # co-partitioned shuffle) — an adaptive choice, not a blind hint.
    n_nodes = deg.count()
    rank_side = F.broadcast if n_nodes <= PR_BROADCAST_MAX_NODES else (lambda df: df)
    n_tbl = deg.agg(F.count("*").cast("double").alias("n"))
    # 1-row N broadcast-joined onto every node (no driver-side collect)
    r = deg.crossJoin(F.broadcast(n_tbl)).select(
        "node", "deg", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for i in range(1, PR_ITERS + 1):
        # Union-into-aggregation (round 14, VERDICT r13 #5, guide §2.4):
        # the old step aggregated contributions by dst and LEFT-joined the
        # result back onto deg — a second broadcast build (a driver-side
        # collect of |V| rows) per iteration, or a second |V|-row exchange
        # in the shuffle fallback. Instead a zero-contribution base leg
        # (one row per node, carrying deg) unions with the per-edge
        # contribution leg into ONE groupBy: sum(c) absorbs the base 0.0
        # exactly (x + 0.0 == x for any finite double, and partial-sum
        # order was already nondeterministic), and max(deg) recovers deg
        # because the base leg is the only one with deg > 0 (every node
        # has outdegree >= 1 by construction). One exchange per iteration,
        # one broadcast build (the rank side) instead of two.
        contrib_leg = e.join(rank_side(r), e["src"] == r["node"]).select(
            F.col("dst").alias("node"),
            (F.col("r") / F.col("deg")).alias("c"),
            F.lit(0.0).alias("deg"),
        )
        base_leg = deg.select("node", F.lit(0.0).alias("c"), "deg")
        r = (
            contrib_leg.unionByName(base_leg)
            .groupBy("node")
            .agg(F.sum("c").alias("c"), F.max("deg").alias("deg"))
            .crossJoin(F.broadcast(n_tbl))
            .select(
                "node",
                "deg",
                (
                    F.lit(1 - PR_DAMPING) / F.col("n")
                    + F.lit(PR_DAMPING) * F.col("c")
                ).alias("r"),
            )
        )
        if i % PR_CHECKPOINT_EVERY == 0 and i < PR_ITERS:
            # Deep-loop lineage control: truncate the growing plan so the
            # optimizer re-plans a bounded tree (and executors never replay
            # earlier steps). No-op at the default 3 iterations.
            r = r.localCheckpoint(eager=True)
    out = r.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("p"), (F.col("node") / 2).cast("long")),
        )
        .otherwise(F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("long")))
        .alias("node"),
        F.round("r", 6).alias("rank"),
    )
    # Materialize the result once (lineage-truncated), then free the loop
    # invariants immediately — without this every invocation leaves e/deg
    # cache blocks behind until GC-driven ContextCleaner reclaim, inflating
    # executor memory across a long-lived session (round-2 ADVICE). The
    # returned handle's own blocks are |V| rows and go with the handle.
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    deg.unpersist()
    return out


def _profile_oracle() -> str:
    cols = {
        "o_orderkey": "o_orderkey",
        "o_custkey": "o_custkey",
        "o_orderstatus": "o_orderstatus",
        "o_totalprice": "o_totalprice",
        "o_orderdate": "CAST(o_orderdate AS DATE)",
        "o_orderpriority": "o_orderpriority",
    }
    parts = [
        f"""SELECT '{name}' AS col_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT({expr}) AS BIGINT) AS n_nonnull,
                   CAST(COUNT(DISTINCT {expr}) AS BIGINT) AS n_distinct,
                   CAST(MIN({expr}) AS VARCHAR) AS min_val,
                   CAST(MAX({expr}) AS VARCHAR) AS max_val
            FROM orders"""
        for name, expr in cols.items()
    ]
    return "\nUNION ALL\n".join(parts)


@query(
    "profile_table",
    oracle=_profile_oracle(),
    doc="Per-column data profiling (the pre-curation health check): row "
    "count, non-null count, exact distinct count, stringified min/max for "
    "every column of orders — in ONE pass over the table. All per-column "
    "aggregates run in a single Aggregate node and stack() reshapes the "
    "1-row result to long form row-locally, vs the oracle's N UNION ALL "
    "scans — at 100 TB that is 1 scan vs |columns| scans. Timestamp "
    "column profiled at DATE grain for engine-portable string forms.",
    tags=("profiling",),
)
def q_profile_table(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    specs = {
        "o_orderkey": F.col("o_orderkey"),
        "o_custkey": F.col("o_custkey"),
        "o_orderstatus": F.col("o_orderstatus"),
        "o_totalprice": F.col("o_totalprice"),
        "o_orderdate": F.col("o_orderdate").cast("date"),
        "o_orderpriority": F.col("o_orderpriority"),
    }
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, c in specs.items():
        aggs.append(F.count(c).cast("bigint").alias(f"nn_{name}"))
        aggs.append(F.countDistinct(c).cast("bigint").alias(f"nd_{name}"))
        aggs.append(F.min(c).cast("string").alias(f"mn_{name}"))
        aggs.append(F.max(c).cast("string").alias(f"mx_{name}"))
    one = o.agg(*aggs)
    stack = ", ".join(
        f"'{n}', nn_{n}, nd_{n}, mn_{n}, mx_{n}" for n in specs
    )
    return one.select(
        F.expr(
            f"stack({len(specs)}, {stack}) AS "
            "(col_name, n_nonnull, n_distinct, min_val, max_val)"
        ),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val")


@query(
    "event_funnel",
    oracle="""
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_stage1,
               CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_stage2,
               CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_stage3
    """,
    doc="Ordered funnel analysis (view -> click -> purchase): users "
    "counted at each stage only if the stage event happened strictly "
    "after their previous-stage entry time. Three chained "
    "aggregate+semi-join steps, each one shuffle on user_id with the "
    "events scan reused — the declarative form of the sequential-pattern "
    "scan every product-analytics engine special-cases. At 100 TB all "
    "three stages co-partition on user_id, so AQE folds the joins into "
    "the same exchange layout.",
    tags=("events", "funnel"),
)
def q_event_funnel(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"]
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").cast("bigint").alias("n_stage1"))
        .crossJoin(s2.agg(F.count("*").cast("bigint").alias("n_stage2")))
        .crossJoin(s3.agg(F.count("*").cast("bigint").alias("n_stage3")))
    )


@query(
    "event_retention",
    oracle="""
        WITH first_day AS (
            SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0
            FROM events GROUP BY user_id
        )
        SELECT CAST(d0 AS VARCHAR) AS cohort_day,
               CAST(date_diff('day', d0, CAST(date_trunc('day', e.ts) AS DATE))
                    AS BIGINT) AS day_offset,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
        FROM events e JOIN first_day USING (user_id)
        GROUP BY d0, day_offset
    """,
    doc="Cohort retention matrix: users grouped by first-seen day, "
    "activity counted per day-offset from that cohort day — the "
    "retention curve table behind every DAU/stickiness dashboard. One "
    "window-free aggregate for the cohort assignment, one co-partitioned "
    "join back (same user_id exchange), one distinct-count aggregate; "
    "cohort day stringified for engine-portable hashing.",
    tags=("events", "retention"),
)
def q_event_retention(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"]
    day = F.date_trunc("day", F.col("ts")).cast("date")
    first_day = e.groupBy("user_id").agg(F.min(day).alias("d0"))
    return (
        e.join(first_day, "user_id")
        .select(
            F.col("d0"),
            F.datediff(day, F.col("d0")).cast("bigint").alias("day_offset"),
            "user_id",
        )
        .groupBy("d0", "day_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
        .select(
            F.col("d0").cast("string").alias("cohort_day"),
            "day_offset",
            "n_active",
        )
    )


@query(
    "event_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id)
                     AS prev_type
            FROM events
        )
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    """,
    doc="Event-sequence transition counts (the Markov-chain transition "
    "matrix over per-user event streams): lag() over the (ts, event_id) "
    "total order pairs each event with its predecessor, then one "
    "partial-aggregatable groupBy on the (prev, next) pair — the "
    "behavioral-modeling sibling of text_ngrams_top's token bigrams. One "
    "shuffle on user_id for the window, one on the pair; the tie-break "
    "on event_id keeps same-second sequences deterministic across "
    "engines (same discipline as sessionization).",
    tags=("events", "sequence"),
)
def q_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = tables(spark, sf)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


# ---------------------------------------------------------------------------
# Cluster-blocked diversity coreset
# ---------------------------------------------------------------------------


def _coreset_oracle(n_cells: int = 16, iters: int = IVF_TRAIN_ITERS) -> str:
    """Per trained-quantizer cell: the most-central member + cell size."""
    block, prev = _ivf_chain(n_cells, iters)
    cs = _COS.format(a="e.v", b="c.cv")
    return f"""
        WITH {block},
             asg AS (SELECT neighbor_id AS vec_id, cell, cs FROM (
                 SELECT e.neighbor_id, c.cent_id AS cell, {cs} AS cs,
                        ROW_NUMBER() OVER (PARTITION BY e.neighbor_id
                            ORDER BY {cs} DESC, c.cent_id) AS rn
                 FROM e CROSS JOIN {prev} c) WHERE rn = 1),
             ranked AS (SELECT cell, vec_id, cs,
                               COUNT(*) OVER (PARTITION BY cell) AS n_members,
                               ROW_NUMBER() OVER (PARTITION BY cell
                                   ORDER BY cs DESC, vec_id) AS rk
                        FROM asg)
        SELECT CAST(cell AS BIGINT) AS cell,
               CAST(vec_id AS BIGINT) AS rep_vec_id,
               CAST(n_members AS BIGINT) AS n_members,
               CAST(FLOOR(cs * 1000000 + 0.5) AS BIGINT) AS centrality_ppm
        FROM ranked WHERE rk = 1
    """


@query(
    "embed_coreset_sample",
    oracle=_coreset_oracle(),
    doc="Cluster-blocked diversity coreset: one representative per trained-"
    "quantizer cell (the member most cosine-central to its centroid, "
    "vec_id ties) with the cell population — the embedding-space "
    "DIVERSITY sampling primitive (coreset/k-center style) next to the "
    "frequency/quality-based doc samplers: 16 spread-out exemplars that "
    "cover the corpus's regions instead of its modes, the seed set for "
    "curriculum/dedup-aware curation. Reuses the bit-deterministic "
    "trained quantizer (train_cells) and the aggregation-only "
    "assignment (assign_cells); representative pick and cell size share "
    "ONE (cell) partitioning. Scale: assignment is |cells| broadcast "
    "dot products per vector; the only data-sized exchange is the cell "
    "hash partition — no pairwise distances anywhere.",
    tags=("similarity", "sampling", "embedding"),
)
def q_embed_coreset_sample(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    from datafusion_flight_sql_server_spark.operators.similarity import (
        assign_cells,
        train_cells,
    )

    e = tables(spark, sf)["embeddings"]
    cents = train_cells(
        e,
        n_cells=16,
        train_iters=IVF_TRAIN_ITERS,
        dim=64,
        cache_key=(sf, "embeddings"),
    )
    asg = assign_cells(e, cents)
    w = W.partitionBy("cell")
    wr = w.orderBy(F.col("cs").desc(), F.col("vec_id"))
    return (
        asg.select(
            "cell",
            "vec_id",
            "cs",
            F.count(F.lit(1)).over(w).alias("n_members"),
            F.row_number().over(wr).alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select(
            F.col("cell").cast("bigint").alias("cell"),
            F.col("vec_id").cast("bigint").alias("rep_vec_id"),
            F.col("n_members").cast("bigint").alias("n_members"),
            F.floor(F.col("cs") * 1000000 + F.lit(0.5))
            .cast("bigint")
            .alias("centrality_ppm"),
        )
    )
