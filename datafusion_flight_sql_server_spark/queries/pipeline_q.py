"""Round-4 query additions: training-data curation signals and warehouse
modeling operators.

Beyond-reference extensions (SURVEY.md §2.C): the reference engine's SQL
surface (reference: datafusion-flight-sql-server/src/service.rs:214-247
delegates to the embedded engine) has no LM-scoring / substring-dedup /
recall-evaluation / CDC primitives — these are the operators a large-scale
training-data pipeline layers on top, expressed Spark-first.

Exactness discipline (catalog.py module docstring): every score that must
hash-match the DuckDB oracle is integer/decimal arithmetic (ppm values via
BIGINT integer division, micros via unix_micros/epoch_us) — no libm in the
compared output. Cosines reuse the round-6 idiom already driver-verified by
``dedup_embed_cosine``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from datafusion_flight_sql_server_spark.operators.dedup import rebalance_for_compute
from datafusion_flight_sql_server_spark.queries.catalog import query, tables

#: Vocabulary size at or below which text_lm_unigram folds the trained
#: (word → corpus count) table into a literal map and scores each document
#: row-locally instead of re-exploding the token stream. Spark probes a
#: literal map by LINEAR scan, so the fold only wins while |V| stays around
#: the per-token compare budget a hash-join probe would beat.
_VOCAB_FOLD_LIMIT = 64


# ---------------------------------------------------------------------------
# Unigram language-model quality score
# ---------------------------------------------------------------------------


@query(
    "text_lm_unigram",
    oracle="""
        WITH tok AS (SELECT doc_id,
                            unnest(list_filter(string_split(lower(text), ' '),
                                               x -> x <> '')) AS word
                     FROM documents),
             gc AS (SELECT word, COUNT(*) AS c FROM tok GROUP BY word),
             tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                            CAST(COUNT(*) AS BIGINT) AS v
                     FROM gc),
             per_doc AS (SELECT t.doc_id,
                                CAST(COUNT(*) AS BIGINT) AS n_tok,
                                CAST(SUM(g.c) AS BIGINT) AS sum_c
                         FROM tok t JOIN gc g ON t.word = g.word
                         GROUP BY t.doc_id)
        SELECT d.doc_id, d.n_tok,
               CAST((1000000 * (d.sum_c + d.n_tok))
                    // (d.n_tok * (tot.n + tot.v)) AS BIGINT) AS lm_score_ppm
        FROM per_doc d CROSS JOIN tot
    """,
    doc="CCNet-style unigram language-model quality score: train token "
    "frequencies over the corpus itself, then score each document by its "
    "mean add-one-smoothed token probability, reported in exact ppm — "
    "(sum_c + n_tok) * 1e6 DIV (n_tok * (N + V)). Common/fluent text "
    "scores high; rare-token noise scores low — the standard perplexity "
    "filter with the log replaced by an exact rational mean so both "
    "engines hash-match bit-for-bit (no libm). Scale: the vocabulary "
    "table (word → corpus count) map-side partial-aggregates to at most "
    "|V| rows per task. Scoring is then ADAPTIVE on the counted "
    "vocabulary: at or below the fold gate the table becomes a literal "
    "map and every document scores ROW-LOCALLY with an array aggregate — "
    "one corpus scan, zero token shuffles (256x-docs scale-up audit: "
    "7.9 s → 3.1 s, 1.8x the DuckDB baseline, down from 4.4x for the "
    "windowed-pair plan this replaced); past the gate the token stream "
    "joins the vocabulary with no forced side, so AQE broadcasts small "
    "vocabularies and falls back to a (word)-partitioned shuffle join "
    "for pathological ones — the cost class the windowed plan always "
    "paid. The doc score is one doc_id aggregation (docs are partition-"
    "local after explode, so partial aggregation collapses to ~1 "
    "row/doc before the exchange), and the 1-row (N, V) corpus spine is "
    "driver-side literals under the gate, a 1-row broadcast past it. No "
    "all-pairs, no per-row UDF.",
    tags=("text", "quality", "lm"),
)
def q_text_lm_unigram(spark: SparkSession, sf: str) -> DataFrame:
    d = rebalance_for_compute(tables(spark, sf)["documents"], "doc_id")
    return unigram_lm_scores(d)


def unigram_lm_scores(
    d: DataFrame, fold_limit: int = _VOCAB_FOLD_LIMIT
) -> DataFrame:
    """Per-doc add-one-smoothed unigram-LM score in exact ppm.

    Adaptive on the COUNTED vocabulary size (see q_text_lm_unigram's doc);
    ``fold_limit`` is parameterized so tests can force both the
    literal-map fold path and the vocabulary-join path on the same data
    and assert identical output.
    """
    base = d.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x != '')").alias("ws"),
    )
    tok = base.select("doc_id", F.explode("ws").alias("word"))
    from pyspark import StorageLevel

    from datafusion_flight_sql_server_spark.queries.catalog import (
        register_query_cleanup,
    )

    # gc is persisted (at most |V| tiny rows) because the gate below
    # MATERIALIZES it once to count the vocabulary; without the persist the
    # join path would re-run the whole explode+aggregate a second time
    # inside the returned plan.
    gc = register_query_cleanup(
        tok.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Counted (not assumed) vocabulary fold: when the trained vocabulary is
    # tiny, scoring needs NO second token pass at all — the (word → count)
    # table folds into a literal map and each doc scores row-locally with
    # an ARRAY aggregate (one corpus scan, zero token shuffles; measured
    # 7.9 s → 3.2 s at the 256x docs scale-up). The gate is 64 because a
    # Spark literal-map probe is a linear scan per token — past ~64 words
    # the broadcast-hash-join probe below wins. limit(k+1) ships at most
    # 65 rows; the gate, not the corpus, bounds the driver.
    head = gc.limit(fold_limit + 1).collect()
    if len(head) <= fold_limit:
        n = sum(int(r.c) for r in head)
        v = len(head)
        entries: list = []
        for r in sorted(head, key=lambda r: r.word):
            entries.extend([F.lit(r.word), F.lit(int(r.c))])
        m = F.create_map(*entries)
        return (
            base.filter(F.size("ws") > 0)
            .select(
                "doc_id",
                F.size("ws").cast("bigint").alias("n_tok"),
                F.aggregate(
                    "ws",
                    F.lit(0).cast("bigint"),
                    lambda acc, w: acc + F.element_at(m, w),
                ).alias("sum_c"),
            )
            .select(
                "doc_id",
                "n_tok",
                F.expr(
                    f"CAST((1000000 * (sum_c + n_tok))"
                    f" DIV (n_tok * ({n} + {v})) AS BIGINT)"
                ).alias("lm_score_ppm"),
            )
        )
    per_doc = (
        tok.join(gc, "word")  # no forced side: AQE broadcasts small vocabs
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.sum("c").cast("bigint").alias("sum_c"),
        )
    )
    tot = gc.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    return per_doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_tok",
        F.expr(
            "CAST((1000000 * (sum_c + n_tok)) DIV (n_tok * (n + v)) AS BIGINT)"
        ).alias("lm_score_ppm"),
    )


# ---------------------------------------------------------------------------
# Cross-document repeated-substring dedup signal
# ---------------------------------------------------------------------------


@query(
    "dedup_substring",
    oracle="""
        WITH w AS (SELECT doc_id,
                          list_filter(string_split(lower(text), ' '),
                                      x -> x <> '') AS a
                   FROM documents),
             sh AS (SELECT doc_id,
                           md5(unnest(list_transform(range(1, len(a) - 3),
                               i -> array_to_string(a[i:i+4], ' ')))) AS sid
                    FROM w WHERE len(a) >= 5),
             df AS (SELECT sid, COUNT(DISTINCT doc_id) AS ndoc
                    FROM sh GROUP BY sid)
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN df.ndoc >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup,
               CAST((1000000 * SUM(CASE WHEN df.ndoc >= 2 THEN 1 ELSE 0 END))
                    // COUNT(*) AS BIGINT) AS dup_ppm
        FROM sh s JOIN df ON s.sid = df.sid
        GROUP BY s.doc_id
    """,
    doc="Exact-substring dedup signal (the word-shingle form of Lee et al. "
    "2021 'Deduplicating Training Data Makes Language Models Better'): "
    "every 5-word shingle is fingerprinted (md5), shingles occurring in "
    ">= 2 distinct documents are 'duplicated spans', and each document "
    "reports its duplicated-shingle fraction in exact ppm. Downstream "
    "gates drop or trim high-dup_ppm docs. Scale: suffix arrays don't "
    "distribute; shingle fingerprints do — the plan is one straight-line "
    "lineage: explode+md5 (map-side, computed ONCE) -> partial-aggregated "
    "(doc_id, sid) instance counts -> a (sid)-partitioned window for "
    "doc-frequency (pairs are distinct per doc after the aggregate, so "
    "count(*) over the sid partition IS the doc-frequency; no self-join, "
    "no second pass over the corpus) -> one doc_id aggregation. Shingle "
    "strings never shuffle (only 128-bit fingerprints), and only distinct "
    "(doc, shingle) pairs cross the wire after the first partial "
    "aggregation; no all-pairs comparison exists anywhere.",
    tags=("dedup", "text"),
)
def q_dedup_substring(spark: SparkSession, sf: str) -> DataFrame:
    d = rebalance_for_compute(tables(spark, sf)["documents"], "doc_id")
    sh = (
        d.select(
            "doc_id",
            F.expr("filter(split(lower(text), ' '), x -> x != '')").alias("a"),
        )
        .filter(F.size("a") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(a) - 4),"
                    "          i -> md5(concat_ws(' ', slice(a, i, 5))))"
                )
            ).alias("sid"),
        )
    )
    pairs = sh.groupBy("doc_id", "sid").agg(F.count(F.lit(1)).alias("inst"))
    ndoc = F.count(F.lit(1)).over(W.partitionBy("sid"))
    return (
        pairs.withColumn("ndoc", ndoc)
        .groupBy("doc_id")
        .agg(
            F.sum("inst").cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("ndoc") >= 2, F.col("inst")).otherwise(0))
            .cast("bigint")
            .alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup",
            F.expr("CAST((1000000 * n_dup) DIV n_shingles AS BIGINT)").alias(
                "dup_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Matryoshka-truncation recall evaluation
# ---------------------------------------------------------------------------

_DOT = "list_dot_product({a}, {b})"
_COS6 = (
    "ROUND(CASE WHEN sqrt(list_dot_product({a},{a})) > 0 "
    "AND sqrt(list_dot_product({b},{b})) > 0 "
    "THEN list_dot_product({a},{b}) / "
    "(sqrt(list_dot_product({a},{a})) * sqrt(list_dot_product({b},{b}))) "
    "ELSE 0.0 END, 6)"
)


@query(
    "embed_matryoshka",
    oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
             q AS (SELECT vec_id AS q_id, v AS qv, v[1:32] AS qh
                   FROM e WHERE vec_id < 8),
             c AS (SELECT vec_id AS c_id, v AS cv, v[1:32] AS ch
                   FROM e WHERE vec_id >= 8),
             p AS (SELECT q_id, c_id,
                          {_COS6.format(a="qv", b="cv")} AS cos_full,
                          {_COS6.format(a="qh", b="ch")} AS cos_half
                   FROM q CROSS JOIN c),
             rf AS (SELECT q_id, c_id,
                           ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_full DESC, c_id) AS rn
                    FROM p),
             rh AS (SELECT q_id, c_id,
                           ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_half DESC, c_id) AS rn
                    FROM p)
        SELECT f.q_id,
               CAST(COUNT(h.c_id) AS BIGINT) AS n_overlap,
               CAST((1000000 * COUNT(h.c_id)) // 10 AS BIGINT) AS recall_ppm
        FROM (SELECT * FROM rf WHERE rn <= 10) f
        LEFT JOIN (SELECT * FROM rh WHERE rn <= 10) h
               ON f.q_id = h.q_id AND f.c_id = h.c_id
        GROUP BY f.q_id
    """,
    doc="Matryoshka-embedding evaluation: for 8 probe queries, compare "
    "exact cosine top-10 under the full 64-dim embedding vs the first-32-"
    "dims truncation (cosine is scale-invariant, so truncation needs no "
    "renormalization for ranking) and report recall@10 in exact ppm. This "
    "is the measurement that justifies storing/searching truncated "
    "vectors at 100 TB (half the bytes, ~2x the scan rate). Scale: an "
    "EVALUATION harness by design — the probe set is a tiny broadcast "
    "side (8 rows) against the corpus, so the 'cross join' is a "
    "broadcast nested loop over a sampled probe set, never corpus x "
    "corpus; ranks are per-query windows over candidate rows. Cosine "
    "round-6 with c_id tie-break, the idiom driver-verified by "
    "dedup_embed_cosine.",
    tags=("similarity", "embedding", "eval"),
)
def q_embed_matryoshka(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.functions.vector import cosine

    e = tables(spark, sf)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qs = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.slice("v", 1, 32).alias("qh"),
    )
    cs = e.filter(F.col("vec_id") >= 8).select(
        F.col("vec_id").alias("c_id"),
        F.col("v").alias("cv"),
        F.slice("v", 1, 32).alias("ch"),
    )
    pairs = F.broadcast(qs).crossJoin(cs).select(
        "q_id",
        "c_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_full"),
        F.round(cosine(F.col("qh"), F.col("ch")), 6).alias("cos_half"),
    )
    # both ranks in ONE pass over the pairs (two windows share the q_id
    # partitioning — one exchange, no self-join, the corpus scans once);
    # a top-10-full row overlaps iff its half-dim rank is also <= 10
    wf = W.partitionBy("q_id").orderBy(F.col("cos_full").desc(), "c_id")
    wh = W.partitionBy("q_id").orderBy(F.col("cos_half").desc(), "c_id")
    ranked = pairs.withColumn("rn_f", F.row_number().over(wf)).withColumn(
        "rn_h", F.row_number().over(wh)
    )
    return (
        ranked.filter(F.col("rn_f") <= 10)
        .groupBy("q_id")
        .agg(
            F.sum(F.when(F.col("rn_h") <= 10, 1).otherwise(0))
            .cast("bigint")
            .alias("n_overlap")
        )
        .select(
            "q_id",
            "n_overlap",
            F.expr("CAST((1000000 * n_overlap) DIV 10 AS BIGINT)").alias(
                "recall_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable heavy-hitter sketch (Space-Saving candidates + exact verify)
# ---------------------------------------------------------------------------

_MG_CAPACITY = 256
_MG_TOPK = 20


@query(
    "agg_topk_sketch",
    oracle=f"""
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS word
              FROM documents)
        GROUP BY word
        ORDER BY n DESC, word
        LIMIT {_MG_TOPK}
    """,
    doc=f"Sketch-based heavy hitters: per-partition Space-Saving summaries "
    f"(capacity {_MG_CAPACITY} counters, Arrow-batched mapInArrow with "
    f"vectorized value_counts pre-aggregation — the mergeable summary "
    f"family of Agarwal et al. 2012) nominate candidates, then "
    f"an exact recount restricted to the candidate set (broadcast semi-"
    f"join) emits the top-{_MG_TOPK}. Guarantee: any token with global "
    f"count > N/{_MG_CAPACITY} must exceed its partition's local "
    f"threshold somewhere (pigeonhole), so it survives into the candidate "
    f"set — the output is provably the EXACT top-{_MG_TOPK} whenever the "
    f"{_MG_TOPK}th true count clears N/{_MG_CAPACITY}, which the operator "
    f"verifies at runtime and raises otherwise (no silent approximation). "
    f"Scale: pass 1 shuffles only {_MG_CAPACITY} counters per partition "
    f"(vs a full (word) shuffle of the token stream); pass 2 shuffles "
    f"only candidate-token rows. At 100 TB that's the difference between "
    f"shuffling ~100 TB of tokens and shuffling megabytes.",
    tags=("agg", "sketch", "text"),
)
def q_agg_topk_sketch(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.heavy_hitters import (
        topk_exact_via_sketch,
    )

    d = tables(spark, sf)["documents"]
    tok = d.select(
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x != '')")
        ).alias("word")
    )
    return topk_exact_via_sketch(
        tok, "word", k=_MG_TOPK, capacity=_MG_CAPACITY
    )


# ---------------------------------------------------------------------------
# SCD-2 dimension build from an event stream (CDC pattern)
# ---------------------------------------------------------------------------

#: Shared oracle CTE chain producing the SCD-2 dimension from ``events`` —
#: the single source of truth for the build semantics, consumed by both
#: ``event_scd2`` and ``event_scd2_lookup``. BOTH windows tie-break on
#: event_id: without it, two state-change events sharing a timestamp would
#: version nondeterministically.
_SCD2_DIM_SQL = """o AS (SELECT user_id, event_id, event_type,
                          CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                          LAG(event_type) OVER w AS prev
                   FROM events
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             seg AS (SELECT user_id, event_id, event_type, ts_us
                     FROM o WHERE prev IS NULL OR prev <> event_type),
             dim AS (SELECT user_id,
                            event_type AS state,
                            ts_us AS valid_from_us,
                            LEAD(ts_us) OVER w2 AS valid_to_us,
                            CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version
                     FROM seg
                     WINDOW w2 AS (PARTITION BY user_id
                                   ORDER BY ts_us, event_id))"""


def _scd2_dim(ev: DataFrame) -> DataFrame:
    """Spark-side SCD-2 dimension build — the counterpart of
    ``_SCD2_DIM_SQL`` (same two windows, same event_id tie-breaks)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").cast("bigint").alias("ts_us"),
        F.lag("event_type").over(w).alias("prev"),
    )
    seg = o.filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    w2 = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    return seg.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w2).alias("valid_to_us"),
        F.row_number().over(w2).cast("bigint").alias("version"),
    )


@query(
    "event_scd2",
    oracle=f"""
        WITH {_SCD2_DIM_SQL}
        SELECT user_id, state, valid_from_us, valid_to_us, version
        FROM dim
    """,
    doc="Slowly-changing-dimension type-2 build (the CDC merge pattern): "
    "collapse each user's event stream into versioned state intervals — "
    "a new version opens whenever event_type changes; valid_to_us is the "
    "next version's open (NULL = current). Timestamps are exact epoch "
    "micros; ordering ties break on event_id. Scale: two windows over "
    "the same (user_id) partitioning — Catalyst reuses one Exchange; no "
    "joins, no driver state. This is how a 100 TB event log becomes a "
    "point-in-time-queryable dimension table.",
    tags=("events", "cdc", "warehouse"),
)
def q_event_scd2(spark: SparkSession, sf: str) -> DataFrame:
    return _scd2_dim(tables(spark, sf)["events"])


# ---------------------------------------------------------------------------
# Last-touch attribution
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 7 * 86400 * 1_000_000


@query(
    "event_attribution",
    oracle=f"""
        WITH o AS (SELECT user_id, event_type, value,
                          CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                          LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                                          THEN struct_pack(
                                              ts_us := CAST(epoch_us(ts) AS BIGINT),
                                              etype := event_type) END IGNORE NULLS)
                              OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS touch
                   FROM events),
             p AS (SELECT CASE WHEN touch IS NOT NULL
                               AND ts_us - touch.ts_us <= {_ATTR_WINDOW_US}
                               THEN touch.etype ELSE 'direct' END AS channel,
                          value
                   FROM o WHERE event_type = 'purchase')
        SELECT channel,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM p
        GROUP BY channel
    """,
    doc="Last-touch marketing attribution: each purchase is credited to "
    "the user's most recent preceding view/click within a 7-day window "
    "(else 'direct'), then purchases and exact-decimal revenue aggregate "
    "per channel. The carried touch is a (ts, type) struct through a "
    "running last_value IGNORE NULLS window — micros arithmetic, no "
    "libm. Scale: one window over (user_id) partitions plus one tiny "
    "channel aggregation; the event stream shuffles once.",
    tags=("events", "warehouse"),
)
def q_event_attribution(spark: SparkSession, sf: str) -> DataFrame:
    ev = tables(spark, sf)["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    touch = F.last(
        F.when(
            F.col("event_type").isin("view", "click"),
            F.struct(
                F.unix_micros("ts").cast("bigint").alias("ts_us"),
                F.col("event_type").alias("etype"),
            ),
        ),
        ignorenulls=True,
    ).over(w)
    o = ev.select(
        "event_type",
        "value",
        F.unix_micros("ts").cast("bigint").alias("ts_us"),
        touch.alias("touch"),
    )
    p = o.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch").isNotNull()
            & (F.col("ts_us") - F.col("touch.ts_us") <= F.lit(_ATTR_WINDOW_US)),
            F.col("touch.etype"),
        )
        .otherwise(F.lit("direct"))
        .alias("channel"),
        "value",
    )
    return p.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Inter-source overlap matrix (curation diagnostic)
# ---------------------------------------------------------------------------


@query(
    "dedup_source_overlap",
    oracle="""
        WITH w AS (SELECT source,
                          list_filter(string_split(lower(text), ' '),
                                      x -> x <> '') AS a
                   FROM documents),
             sh AS (SELECT DISTINCT source,
                           md5(unnest(list_transform(range(1, len(a) - 3),
                               i -> array_to_string(a[i:i+4], ' ')))) AS sid
                    FROM w WHERE len(a) >= 5)
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS shared_shingles
        FROM sh a JOIN sh b ON a.sid = b.sid AND a.source < b.source
        GROUP BY a.source, b.source
    """,
    doc="Inter-source contamination matrix: for every pair of corpus "
    "sources, the number of distinct 5-word shingles they share — the "
    "diagnostic that tells a curation team WHICH feeds duplicate each "
    "other (mirror sites, scraped re-posts) before choosing what to "
    "drop. Scale: the join key is the 128-bit shingle fingerprint and "
    "the join INPUT is the distinct (shingle, source) projection — at "
    "most |sources| rows per shingle, so the self-join fans out "
    "quadratically only in the per-shingle source count (bounded, "
    "small), never in corpus size. Same fingerprint discipline as "
    "dedup_substring: shingle text never shuffles.",
    tags=("dedup", "text", "diagnostic"),
)
def q_dedup_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    sh = (
        d.select(
            "source",
            F.expr("filter(split(lower(text), ' '), x -> x != '')").alias("a"),
        )
        .filter(F.size("a") >= 5)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(a) - 4),"
                    "          i -> md5(concat_ws(' ', slice(a, i, 5))))"
                )
            ).alias("sid"),
        )
        .distinct()
    )
    a = sh.select(F.col("source").alias("source_a"), "sid")
    b = sh.select(F.col("source").alias("source_b"), "sid")
    return (
        a.join(b, "sid")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_shingles"))
    )


# ---------------------------------------------------------------------------
# Corpus drift: per-source total-variation distance from the corpus mix
# ---------------------------------------------------------------------------


@query(
    "corpus_drift",
    oracle="""
        WITH tok AS (SELECT source,
                            unnest(list_filter(string_split(lower(text), ' '),
                                               x -> x <> '')) AS word
                     FROM documents),
             sw AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS k
                    FROM tok GROUP BY source, word),
             gc AS (SELECT word, CAST(SUM(k) AS BIGINT) AS c
                    FROM sw GROUP BY word),
             tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM gc),
             src AS (SELECT source, CAST(SUM(k) AS BIGINT) AS n_s
                     FROM sw GROUP BY source),
             per_src AS (SELECT s.source,
                                CAST(SUM(s.k) AS BIGINT) AS n_tok,
                                SUM(ABS(s.k * t.n - g.c * r.n_s))
                                    AS present_num,
                                CAST(SUM(g.c) AS BIGINT) AS c_present
                         FROM sw s
                         JOIN gc g ON s.word = g.word
                         JOIN src r ON s.source = r.source
                         CROSS JOIN tot t
                         GROUP BY s.source)
        SELECT p.source, p.n_tok,
               CAST((1000000 * (p.present_num
                                + p.n_tok * (t.n - p.c_present)))
                    // (2 * p.n_tok * t.n) AS BIGINT) AS tv_ppm
        FROM per_src p CROSS JOIN tot t
    """,
    doc="Data-drift monitor: per-source total-variation distance between "
    "the source's token distribution and the whole-corpus distribution, "
    "in exact ppm. TV = 0.5 * sum_w |k_w/n_s - c_w/N| is computed as the "
    "integer identity sum|k_w*N - c_w*n_s| / (2*n_s*N), with the "
    "absent-word tail folded in algebraically (n_s * (N - sum of c_w "
    "over words present in the source)) — no full outer join against the "
    "vocabulary, no floats until the final cast. High tv_ppm flags a "
    "feed whose language mix shifted (scraper drift, encoding breakage) "
    "before it contaminates a training mix. Scale: same single-lineage "
    "shape as text_lm_unigram — one explode, partial-aggregated "
    "(source, word) pairs, word-keyed frequency join, source-keyed "
    "final aggregation; the 1-row N spine broadcasts.",
    tags=("text", "quality", "diagnostic"),
)
def q_corpus_drift(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    tok = d.select(
        "source",
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x != '')")
        ).alias("word"),
    )
    sw = tok.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    gc = sw.groupBy("word").agg(F.sum("k").cast("bigint").alias("c"))
    tot = gc.agg(F.sum("c").cast("bigint").alias("n"))
    ns = F.sum("k").over(W.partitionBy("source"))
    per_src = (
        sw.join(gc, "word")
        .crossJoin(F.broadcast(tot))
        .withColumn("n_s", ns)
        .groupBy("source", "n")
        .agg(
            F.sum("k").cast("bigint").alias("n_tok"),
            F.sum(
                F.abs(F.col("k") * F.col("n") - F.col("c") * F.col("n_s"))
            ).alias("present_num"),
            F.sum("c").cast("bigint").alias("c_present"),
        )
    )
    return per_src.select(
        "source",
        "n_tok",
        F.expr(
            "CAST((1000000 * (present_num + n_tok * (n - c_present)))"
            " DIV (2 * n_tok * n) AS BIGINT)"
        ).alias("tv_ppm"),
    )


# ---------------------------------------------------------------------------
# Keyword extraction (rational tf-idf, deterministic top-3 per doc)
# ---------------------------------------------------------------------------


@query(
    "text_tfidf",
    oracle="""
        WITH tok AS (SELECT doc_id,
                            unnest(list_filter(string_split(lower(text), ' '),
                                               x -> x <> '')) AS word
                     FROM documents),
             dc AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS k
                    FROM tok GROUP BY doc_id, word),
             dfq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df
                     FROM dc GROUP BY word),
             nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
                    FROM dc),
             dl AS (SELECT doc_id, word, k,
                           SUM(k) OVER (PARTITION BY doc_id) AS doc_len
                    FROM dc),
             scored AS (SELECT d.doc_id, d.word,
                               CAST((d.k * 1000000 * nd.n_docs)
                                    // (d.doc_len * f.df)
                                    AS BIGINT) AS score_ppm
                        FROM dl d
                        JOIN dfq f ON d.word = f.word
                        CROSS JOIN nd),
             ranked AS (SELECT doc_id, word, score_ppm,
                               ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score_ppm DESC, word) AS rn
                        FROM scored)
        SELECT doc_id, word, score_ppm, CAST(rn AS BIGINT) AS rank
        FROM ranked WHERE rn <= 3
    """,
    doc="Keyword extraction: deterministic top-3 terms per document by a "
    "rational tf-idf variant — score_ppm = (tf * 1e6 * N_docs) DIV "
    "(doc_len * df) — which is order-equivalent to tf * (N/df) and, "
    "being pure integer arithmetic, hash-matches across engines with no "
    "log() (the idf log is monotone in N/df, so top-k by the rational "
    "score selects the same terms as classic tf-idf whenever df ties "
    "don't span the cut; ties break on the word). Scale: the "
    "single-lineage pair-aggregate shape again — explode once, "
    "(doc, word) partial aggregation, df from a word-keyed aggregation "
    "of the pairs, per-doc rank via WindowGroupLimit (top-3 prunes "
    "map-side, the full scored list never sorts).",
    tags=("text", "quality"),
)
def q_text_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    tok = d.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x != '')")
        ).alias("word"),
    )
    dc = tok.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    wdc = dc.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("word"))
    ).withColumn("doc_len", F.sum("k").over(W.partitionBy("doc_id")))
    n_docs = dc.agg(
        F.count_distinct("doc_id").cast("bigint").alias("n_docs")
    )
    scored = wdc.crossJoin(F.broadcast(n_docs)).select(
        "doc_id",
        "word",
        F.expr(
            "CAST((k * 1000000 * n_docs) DIV (doc_len * df) AS BIGINT)"
        ).alias("score_ppm"),
    )
    rn = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.col("score_ppm").desc(), "word")
    )
    return (
        scored.withColumn("rank", rn.cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "word", "score_ppm", "rank")
    )


# ---------------------------------------------------------------------------
# Gaps and islands: consecutive-activity-day streaks per user
# ---------------------------------------------------------------------------


@query(
    "event_islands",
    oracle="""
        WITH days AS (SELECT DISTINCT user_id,
                             CAST(date_trunc('day', ts) AS DATE) AS d
                      FROM events),
             ranked AS (SELECT user_id, d,
                               ROW_NUMBER() OVER (PARTITION BY user_id
                                                  ORDER BY d) AS rn
                        FROM days),
             islands AS (SELECT user_id, d - CAST(rn AS INTEGER) AS anchor,
                                MIN(d) AS island_start,
                                MAX(d) AS island_end,
                                CAST(COUNT(*) AS BIGINT) AS n_days
                         FROM ranked
                         GROUP BY user_id, d - CAST(rn AS INTEGER))
        SELECT user_id,
               CAST(island_start AS VARCHAR) AS island_start,
               CAST(island_end AS VARCHAR) AS island_end,
               n_days
        FROM islands
    """,
    doc="Gaps-and-islands (the classic warehouse streak pattern): each "
    "user's distinct activity days collapse into maximal runs of "
    "consecutive days via the date-minus-row_number anchor trick — "
    "consecutive days share an anchor, any gap starts a new island. "
    "Retention/streak features (n_days per island) come out of one "
    "aggregation. Dates are emitted as strings (repo date-compare "
    "convention). Scale: one (user_id) window plus one (user_id, anchor) "
    "aggregation over the DISTINCT (user, day) projection — the raw "
    "event stream collapses map-side before any shuffle; no joins, no "
    "spine densification needed (contrast event_gapfill, which fills the "
    "gaps this query measures).",
    tags=("events", "warehouse"),
)
def q_event_islands(spark: SparkSession, sf: str) -> DataFrame:
    ev = tables(spark, sf)["events"]
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    ranked = days.withColumn(
        "rn", F.row_number().over(W.partitionBy("user_id").orderBy("d"))
    )
    return (
        ranked.withColumn("anchor", F.expr("date_sub(d, rn)"))
        .groupBy("user_id", "anchor")
        .agg(
            F.min("d").cast("string").alias("island_start"),
            F.max("d").cast("string").alias("island_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
        )
        .select("user_id", "island_start", "island_end", "n_days")
    )


# ---------------------------------------------------------------------------
# Weighted priority sampling (deterministic Duffield-Lund-Thorup analog)
# ---------------------------------------------------------------------------


@query(
    "doc_sample_weighted",
    oracle="""
        WITH h AS (SELECT doc_id, n_chars,
                          ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                             1, 12))::BIGINT AS hv
                   FROM documents)
        SELECT doc_id, n_chars,
               CAST((n_chars * 281474976710656) // (hv + 1) AS BIGINT)
                   AS priority
        FROM h
        ORDER BY priority DESC, doc_id
        LIMIT 100
    """,
    doc="Weight-proportional sampling without replacement (the "
    "priority-sampling scheme of Duffield/Lund/Thorup, with the uniform "
    "draw derandomized to the md5-bucket idiom): each doc gets priority "
    "w * 2^48 DIV (h + 1) where w = n_chars and h is a 48-bit md5 "
    "fraction — order-equivalent to w/u, so long/high-quality docs are "
    "proportionally favored while every doc keeps a nonzero chance. "
    "Pure integer arithmetic (no pow/log), so the sample is bit-"
    "reproducible across engines, runs and retries — the property a "
    "100 TB curation pipeline needs to make sampling auditable. Scale: "
    "priority is row-local; top-n collapses to TakeOrderedAndProject "
    "(no global sort).",
    tags=("sampling",),
)
def q_doc_sample_weighted(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    return (
        d.select("doc_id", "n_chars", hv.alias("hv"))
        .select(
            "doc_id",
            "n_chars",
            F.expr(
                "CAST(n_chars * 281474976710656 DIV (hv + 1) AS BIGINT)"
            ).alias("priority"),
        )
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Point-in-time lookup against the SCD-2 dimension
# ---------------------------------------------------------------------------


@query(
    "event_scd2_lookup",
    oracle=f"""
        WITH {_SCD2_DIM_SQL},
             p AS (SELECT user_id, event_id,
                          CAST(epoch_us(ts) AS BIGINT) AS ts_us
                   FROM events WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id, p.ts_us,
               d.state AS state_at_purchase, d.version
        FROM p JOIN dim d
          ON p.user_id = d.user_id
         AND d.valid_from_us <= p.ts_us
         AND (d.valid_to_us IS NULL OR p.ts_us < d.valid_to_us)
    """,
    doc="Point-in-time (temporal) lookup: each purchase joins to the SCD-2 "
    "state interval valid AT its event time — the query every SCD-2 "
    "dimension exists to answer (event_scd2 builds the dimension; this "
    "consumes it). The interval predicate rides an equi-join on user_id, "
    "so candidates are each user's own handful of versions, never a "
    "range cross-join; every purchase matches exactly one interval "
    "because the versions partition the user's timeline. Scale: dim and "
    "probe shuffle once on user_id (co-partitioned); at 100 TB the "
    "dimension would be written bucketed on user_id (operators/sink.py "
    "write_bucketed) making this join Exchange-free.",
    tags=("events", "cdc", "warehouse"),
)
def q_event_scd2_lookup(spark: SparkSession, sf: str) -> DataFrame:
    ev = tables(spark, sf)["events"]
    dim = _scd2_dim(ev)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").cast("bigint").alias("ts_us"),
    )
    return (
        p.join(
            dim,
            (F.col("p_user") == dim.user_id)
            & (dim.valid_from_us <= F.col("ts_us"))
            & (dim.valid_to_us.isNull() | (F.col("ts_us") < dim.valid_to_us)),
        )
        .select(
            "event_id",
            F.col("p_user").alias("user_id"),
            "ts_us",
            F.col("state").alias("state_at_purchase"),
            "version",
        )
    )


# ---------------------------------------------------------------------------
# Embedding QC: distance-to-centroid outliers
# ---------------------------------------------------------------------------

@query(
    "embed_outliers",
    oracle=f"""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
             c AS (SELECT label, idx,
                          FLOOR(AVG(x) * 1000000.0 + 0.5) / 1000000.0 AS m
                   FROM (SELECT label, unnest(v) AS x,
                                unnest(range(1, len(v) + 1)) AS idx
                         FROM e)
                   GROUP BY label, idx),
             cv AS (SELECT label, list(m ORDER BY idx) AS cvec
                    FROM c GROUP BY label)
        SELECT e.vec_id, e.label,
               {_COS6.format(a="e.v", b="cv.cvec")} AS sim_to_centroid,
               {_COS6.format(a="e.v", b="cv.cvec")} < 0.0 AS is_outlier
        FROM e JOIN cv ON e.label = cv.label
    """,
    doc="Embedding quality control: each vector's cosine similarity to its "
    "own label centroid, flagging vectors that point AWAY from their "
    "cluster (sim < 0) — the standard screen for mislabeled rows, "
    "corrupted embeddings, and drifted encoder versions before vectors "
    "enter an index. Centroids are element-wise means quantized to "
    "micros (the trained-IVF floor idiom, bit-identical across engines); "
    "similarity is round-6 cosine. Scale: one partial-aggregated "
    "(label) mean pass, centroids broadcast back — two scans, one tiny "
    "shuffle, no pairwise anything.",
    tags=("embedding", "quality"),
)
def q_embed_outliers(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.functions.vector import cosine

    e = tables(spark, sf)["embeddings"].select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    dim = 64
    means = e.groupBy("label").agg(
        *[
            (
                F.floor(F.avg(F.element_at("v", i + 1)) * 1000000.0 + 0.5)
                / 1000000.0
            ).alias(f"m{i}")
            for i in range(dim)
        ]
    )
    cents = means.select(
        "label", F.array(*[F.col(f"m{i}") for i in range(dim)]).alias("cvec")
    )
    sim = F.round(cosine(F.col("v"), F.col("cvec")), 6)
    return e.join(F.broadcast(cents), "label").select(
        "vec_id",
        "label",
        sim.alias("sim_to_centroid"),
        (sim < 0.0).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# Curation pipeline v3: round-4 signals composed into one declarative job
# ---------------------------------------------------------------------------

#: v3 gates: documents keep iff duplicated-shingle fraction below this and
#: unigram-LM commonness within this band (drops both rare-token noise and
#: degenerate all-stopword text); survivors are weight-sampled to the cap.
CURATE_V3_DUP_PPM_MAX = 500_000
CURATE_V3_LM_PPM_MIN = 20_000
CURATE_V3_SAMPLE_N = 200


@query(
    "pipeline_curate_v3",
    oracle=f"""
        WITH w AS (SELECT doc_id, n_chars,
                          list_filter(string_split(lower(text), ' '),
                                      x -> x <> '') AS a
                   FROM documents),
             sh AS (SELECT doc_id,
                           md5(unnest(list_transform(range(1, len(a) - 3),
                               i -> array_to_string(a[i:i+4], ' ')))) AS sid
                    FROM w WHERE len(a) >= 5),
             sp AS (SELECT doc_id, sid, COUNT(*) AS inst
                    FROM sh GROUP BY doc_id, sid),
             spd AS (SELECT doc_id, sid, inst,
                            COUNT(*) OVER (PARTITION BY sid) AS ndoc
                     FROM sp),
             dup AS (SELECT doc_id,
                            CAST((1000000 * SUM(CASE WHEN ndoc >= 2
                                                     THEN inst ELSE 0 END))
                                 // SUM(inst) AS BIGINT) AS dup_ppm
                     FROM spd GROUP BY doc_id),
             tok AS (SELECT doc_id, unnest(a) AS word FROM w),
             dc AS (SELECT doc_id, word, COUNT(*) AS k
                    FROM tok GROUP BY doc_id, word),
             dcc AS (SELECT doc_id, word, k,
                            SUM(k) OVER (PARTITION BY word) AS c
                     FROM dc),
             tot AS (SELECT CAST(SUM(k) AS BIGINT) AS n,
                            CAST(COUNT(DISTINCT word) AS BIGINT) AS v
                     FROM dc),
             lm AS (SELECT d.doc_id,
                           CAST((1000000 * (SUM(d.k * d.c) + SUM(d.k)))
                                // (SUM(d.k) * (t.n + t.v)) AS BIGINT)
                               AS lm_score_ppm
                    FROM dcc d CROSS JOIN tot t
                    GROUP BY d.doc_id, t.n, t.v),
             gated AS (SELECT w.doc_id, w.n_chars,
                              dup.dup_ppm, lm.lm_score_ppm
                       FROM w
                       JOIN dup ON w.doc_id = dup.doc_id
                       JOIN lm ON w.doc_id = lm.doc_id
                       WHERE dup.dup_ppm <= {CURATE_V3_DUP_PPM_MAX}
                         AND lm.lm_score_ppm >= {CURATE_V3_LM_PPM_MIN})
        SELECT doc_id, n_chars, dup_ppm, lm_score_ppm,
               CAST((n_chars * 281474976710656)
                    // (('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                           1, 12))::BIGINT + 1)
                    AS BIGINT) AS priority
        FROM gated
        ORDER BY priority DESC, doc_id
        LIMIT {CURATE_V3_SAMPLE_N}
    """,
    doc="One-job curation v3, composing the round-4 signals: repeated-"
    "substring gate (dup_ppm <= 50%), unigram-LM commonness gate "
    "(lm_score_ppm >= 2%), then weight-proportional priority sampling to "
    "a fixed budget — dedup signal, fluency signal, and auditable "
    "sampling as ONE declarative plan Catalyst schedules as a single "
    "job. Scale: the corpus text is read once per tokenization (shingle "
    "+ word — different explodes, unavoidable), every side artifact is "
    "keyed by fingerprint/word and collapses to doc_id-keyed ppm "
    "columns, the three doc_id-keyed joins co-partition on one "
    "exchange, and the final sample is TakeOrderedAndProject (no global "
    "sort). All comparisons are exact integers, so the selected set is "
    "bit-reproducible — an auditable sample at 100 TB.",
    tags=("pipeline", "dedup", "quality", "sampling"),
)
def q_pipeline_curate_v3(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    w = d.select(
        "doc_id",
        "n_chars",
        F.expr("filter(split(lower(text), ' '), x -> x != '')").alias("a"),
    )
    # dup_ppm (dedup_substring's single-lineage shape)
    sh = w.filter(F.size("a") >= 5).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(a) - 4),"
                "          i -> md5(concat_ws(' ', slice(a, i, 5))))"
            )
        ).alias("sid"),
    )
    sp = sh.groupBy("doc_id", "sid").agg(F.count(F.lit(1)).alias("inst"))
    spd = sp.withColumn("ndoc", F.count(F.lit(1)).over(W.partitionBy("sid")))
    dup = spd.groupBy("doc_id").agg(
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN ndoc >= 2 THEN inst ELSE 0 END))"
            " DIV SUM(inst) AS BIGINT)"
        ).alias("dup_ppm")
    )
    # lm_score_ppm (text_lm_unigram's single-lineage shape)
    tok = w.select("doc_id", F.explode("a").alias("word"))
    dc = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("k"))
    dcc = dc.withColumn("c", F.sum("k").over(W.partitionBy("word")))
    tot = (
        dcc.groupBy("word")
        .agg(F.first("c").alias("c"))
        .agg(
            F.sum("c").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("v"),
        )
    )
    lm = (
        dcc.crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "n", "v")
        .agg(
            F.sum(F.col("k") * F.col("c")).alias("sum_kc"),
            F.sum("k").alias("n_tok"),
        )
        .select(
            "doc_id",
            F.expr(
                "CAST((1000000 * (sum_kc + n_tok))"
                " DIV (n_tok * (n + v)) AS BIGINT)"
            ).alias("lm_score_ppm"),
        )
    )
    gated = (
        w.select("doc_id", "n_chars")
        .join(dup, "doc_id")
        .join(lm, "doc_id")
        .filter(
            (F.col("dup_ppm") <= CURATE_V3_DUP_PPM_MAX)
            & (F.col("lm_score_ppm") >= CURATE_V3_LM_PPM_MIN)
        )
    )
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    return (
        gated.withColumn("hv", hv)
        .select(
            "doc_id",
            "n_chars",
            "dup_ppm",
            "lm_score_ppm",
            F.expr(
                "CAST(n_chars * 281474976710656 DIV (hv + 1) AS BIGINT)"
            ).alias("priority"),
        )
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(CURATE_V3_SAMPLE_N)
    )


# ---------------------------------------------------------------------------
# Fuzzy entity matching (SymSpell delete-variant blocking)
# ---------------------------------------------------------------------------


@query(
    "join_fuzzy",
    oracle="""
        WITH n AS (SELECT c_custkey, c_name FROM customer),
             probe AS (SELECT c_custkey, c_name FROM n
                       WHERE c_custkey % 20 = 0),
             pv AS (SELECT c_custkey, c_name,
                           unnest(list_prepend(c_name,
                               list_transform(range(1, len(c_name) + 1),
                                   i -> substr(c_name, 1, i - 1)
                                        || substr(c_name, i + 1)))) AS var
                    FROM probe),
             cv AS (SELECT c_custkey, c_name,
                           unnest(list_prepend(c_name,
                               list_transform(range(1, len(c_name) + 1),
                                   i -> substr(c_name, 1, i - 1)
                                        || substr(c_name, i + 1)))) AS var
                    FROM n),
             cand AS (SELECT DISTINCT p.c_custkey AS probe_key,
                             c.c_custkey AS match_key,
                             p.c_name AS probe_name, c.c_name AS match_name
                      FROM pv p JOIN cv c ON p.var = c.var
                      WHERE p.c_custkey <> c.c_custkey)
        SELECT probe_key, match_key, probe_name, match_name,
               CAST(levenshtein(probe_name, match_name) AS BIGINT) AS dist
        FROM cand
        WHERE levenshtein(probe_name, match_name) <= 1
    """,
    doc="Fuzzy entity matching with SymSpell-style symmetric-delete "
    "blocking: a probe batch (5% of customers — the incremental-ingest "
    "shape) matches the full corpus at Levenshtein distance <= 1. Every "
    "name expands to its delete-1 variants (len+1 strings); a pair "
    "within distance 1 MUST share a variant, so candidates come from a "
    "variant equi-join and the exact edit distance verifies only "
    "candidates — never an all-pairs comparison, and no length/prefix "
    "blocking assumptions that break on uniform key spaces. Scale: "
    "variant expansion is map-side (~len rows per name), the join key is "
    "a short string, candidates per name are bounded by true near-"
    "matches; this is how entity resolution dedups a 100 TB contact/"
    "entity table. Levenshtein is a JVM builtin on the Spark side, "
    "DuckDB's levenshtein in the oracle.",
    tags=("join", "dedup", "fuzzy"),
)
def q_join_fuzzy(spark: SparkSession, sf: str) -> DataFrame:
    c = tables(spark, sf)["customer"].select("c_custkey", "c_name")
    variants = F.expr(
        "array_prepend(transform(sequence(1, length(c_name)),"
        " i -> concat(substring(c_name, 1, i - 1),"
        "             substring(c_name, i + 1, length(c_name)))), c_name)"
    )
    cv = c.select(
        "c_custkey", "c_name", F.explode(variants).alias("var")
    )
    pv = cv.filter(F.col("c_custkey") % 20 == 0).select(
        F.col("c_custkey").alias("probe_key"),
        F.col("c_name").alias("probe_name"),
        "var",
    )
    cand = (
        pv.join(
            cv.select(
                F.col("c_custkey").alias("match_key"),
                F.col("c_name").alias("match_name"),
                "var",
            ),
            "var",
        )
        .filter(F.col("probe_key") != F.col("match_key"))
        .select("probe_key", "match_key", "probe_name", "match_name")
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("probe_name", "match_name").cast("bigint")
    ).filter(F.col("dist") <= 1)


# ---------------------------------------------------------------------------
# Incremental ingest dedup: new batch vs historical corpus
# ---------------------------------------------------------------------------


@query(
    "dedup_incremental",
    oracle="""
        WITH hist AS (SELECT DISTINCT md5(text) AS digest
                      FROM documents WHERE doc_id % 10 <> 0),
             batch AS (SELECT doc_id, md5(text) AS digest, n_chars
                       FROM documents WHERE doc_id % 10 = 0),
             fresh AS (SELECT b.doc_id, b.digest, b.n_chars
                       FROM batch b
                       WHERE NOT EXISTS (SELECT 1 FROM hist h
                                         WHERE h.digest = b.digest)),
             keep AS (SELECT doc_id, digest, n_chars,
                             ROW_NUMBER() OVER (PARTITION BY digest
                                                ORDER BY doc_id) AS rn
                      FROM fresh)
        SELECT doc_id, digest, CAST(n_chars AS BIGINT) AS n_chars
        FROM keep WHERE rn = 1
    """,
    doc="Incremental ingestion dedup (the production shape of exact dedup: "
    "corpora grow by batches, and each batch dedups against ALL history "
    "without rereading it): a new batch (10% of docs) anti-joins the "
    "historical digest set, then dedups within itself (first doc_id "
    "wins). Scale: history is represented ONLY by its 16-byte digests — "
    "at 100 TB that sidecar is what gets stored/bucketed between runs "
    "(operators/sink.py write_bucketed on digest makes the anti-join "
    "Exchange-free); the batch shuffles once on digest for both the "
    "anti-join and the within-batch keep. Text bytes never join "
    "anything.",
    tags=("dedup", "pipeline"),
)
def q_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    hist = (
        d.filter(F.col("doc_id") % 10 != 0)
        .select(F.md5("text").alias("digest"))
        .distinct()
    )
    batch = d.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.md5("text").alias("digest"), "n_chars"
    )
    fresh = batch.join(hist, "digest", "left_anti")
    keep = fresh.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("digest").orderBy("doc_id")),
    ).filter(F.col("rn") == 1)
    return keep.select("doc_id", "digest", F.col("n_chars").cast("bigint").alias("n_chars"))


# ---------------------------------------------------------------------------
# Time-weighted average (step-function integral over an event stream)
# ---------------------------------------------------------------------------

# Identical ANSI text on both engines except the epoch-micros function name
# (Spark: unix_micros, DuckDB: epoch_us) and the string type keyword.
#
# Exactness: the per-segment weight is duration-in-micros (BIGINT) times the
# value-in-micros (BIGINT via the driver-verified DECIMAL(18,6) cast); the
# product can exceed int64 (5.6e8 value-micros * 8.6e10 day-micros ~ 5e19),
# so it is accumulated as DECIMAL(38,0) — exact and order-independent. Both
# engines cast the exact decimal sum to DOUBLE (IEEE correctly rounded →
# bit-identical), divide by the identical BIGINT span, and emit BIGINT
# micros via the floor(x + 0.5) idiom.
_TIME_WEIGHTED_SQL = """
    WITH e AS (
        SELECT user_id,
               CAST(CAST(date_trunc('day', ts) AS DATE) AS {s}) AS day,
               {us}(ts) AS tmic,
               CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vmic,
               event_id
        FROM events
    ), seg AS (
        SELECT user_id, day, vmic,
               lead(tmic) OVER (PARTITION BY user_id, day
                                ORDER BY tmic, event_id) - tmic AS dur
        FROM e
    )
    SELECT user_id, day,
           CAST(SUM(dur) AS BIGINT) AS span_micros,
           CAST(FLOOR(CAST(SUM(CAST(vmic AS DECIMAL(20,0)) * dur) AS DOUBLE)
                      / CAST(SUM(dur) AS DOUBLE) + 0.5) AS BIGINT) AS twa_micros
    FROM seg
    WHERE dur IS NOT NULL
    GROUP BY user_id, day
    HAVING SUM(dur) > 0
"""


@query(
    "event_time_weighted",
    oracle=_TIME_WEIGHTED_SQL.format(s="VARCHAR", us="epoch_us"),
    doc="Time-weighted average value per (user, day) — the irregular-"
    "sampling average a timeseries store computes with time_weight(): "
    "each observation holds (LOCF step function) until the next one, so "
    "the mean is the integral of the step function divided by the "
    "observed span, not the naive row mean that over-weights bursts. "
    "lead() over (user_id, day) turns the stream into segments; segment "
    "weight = duration micros x value micros accumulated as exact "
    "DECIMAL(38,0) (the product exceeds int64). Groups need >= 2 distinct "
    "timestamps (span > 0). Scale: the lead() window and the groupBy "
    "share the (user_id, day) hash partitioning, so Catalyst plans ONE "
    "exchange — the stream shuffles once regardless of SF.",
    tags=("events", "window", "agg"),
)
def q_event_time_weighted(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(_TIME_WEIGHTED_SQL.format(s="STRING", us="unix_micros"))


# ---------------------------------------------------------------------------
# Exponentially weighted moving average (dyadic weights -> exact integers)
# ---------------------------------------------------------------------------


@query(
    "window_ewma",
    oracle="""
        WITH e AS (
            SELECT event_id, user_id, ts,
                   CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
                       AS vmic
            FROM events
        ), w AS (
            SELECT event_id, user_id,
                   list(vmic) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
                       AS vals
            FROM e
        )
        SELECT event_id, user_id,
               CAST((2 * list_sum(list_transform(
                         list_zip(vals, range(1, len(vals) + 1)),
                         p -> p[1] * (CAST(1 AS BIGINT) << (p[2] - 1))))
                     + ((CAST(1 AS BIGINT) << len(vals)) - 1))
                    // (2 * ((CAST(1 AS BIGINT) << len(vals)) - 1))
                    AS BIGINT) AS ewma_micros
        FROM w
    """,
    doc="Exponentially weighted moving average (alpha = 1/2) of each "
    "user's event values over the trailing 16 events — the recency-"
    "weighted smoother for metric streams (EWMA control charts). The "
    "dyadic alpha makes it EXACT: weights are powers of two, so the "
    "weighted numerator and the 2^k - 1 denominator are plain BIGINTs "
    "(max ~5.6e8 value-micros x 2^16 ~ 3.7e13, far inside int64) and the "
    "result is the integer round-half-up (2N + D) DIV 2D — no floating "
    "point anywhere, either engine. The frame list is collected in "
    "window ORDER (ts, event_id), a total order, so position weights "
    "agree across engines. Scale: one (user_id) window, bounded "
    "16-element per-row state, no joins — same plan family as "
    "window_moving_median/event_anomaly.",
    tags=("window", "events"),
)
def q_window_ewma(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        """
        WITH e AS (
            SELECT event_id, user_id, ts,
                   CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
                       AS vmic
            FROM events
        ), w AS (
            SELECT event_id, user_id,
                   collect_list(vmic) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id
                       ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS vals
            FROM e
        )
        SELECT event_id, user_id,
               (2 * aggregate(transform(vals,
                                        (x, i) -> x * shiftleft(CAST(1 AS BIGINT), i)),
                              CAST(0 AS BIGINT), (a, x) -> a + x)
                + (shiftleft(CAST(1 AS BIGINT), size(vals)) - 1))
               div (2 * (shiftleft(CAST(1 AS BIGINT), size(vals)) - 1))
                   AS ewma_micros
        FROM w
        """
    )


# ---------------------------------------------------------------------------
# Inverted index (impact-ordered posting lists)
# ---------------------------------------------------------------------------


@query(
    "text_inverted_index",
    oracle="""
        WITH tok AS (SELECT doc_id,
                            unnest(list_filter(string_split(lower(text), ' '),
                                               x -> x <> '')) AS token
                     FROM documents),
             pairs AS (SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
                       FROM tok GROUP BY token, doc_id),
             stats AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
                              CAST(SUM(tf) AS BIGINT) AS cf
                       FROM pairs GROUP BY token),
             ranked AS (SELECT token, doc_id, tf,
                               row_number() OVER (PARTITION BY token
                                                  ORDER BY tf DESC, doc_id)
                                   AS rn
                        FROM pairs),
             post AS (SELECT token,
                             array_to_string(
                                 list(doc_id ORDER BY tf DESC, doc_id),
                                 ',') AS top_postings
                      FROM ranked WHERE rn <= 20 GROUP BY token)
        SELECT s.token, s.df, s.cf, p.top_postings
        FROM stats s JOIN post p ON s.token = p.token
    """,
    doc="Inverted-index build, the retrieval-side complement of the dedup "
    "family: per token, document frequency, collection frequency, and an "
    "IMPACT-ORDERED posting list (top-20 doc_ids by term frequency, "
    "doc_id tie-break — the index head a keyword-search or BM25 "
    "candidate-generation stage reads first). Scale: the token stream is "
    "exploded once and immediately partial-aggregated to distinct "
    "(token, doc_id, tf) pairs, then EVERYTHING else — df/cf (unbounded-"
    "frame window aggregates), the tf ranking, and the top-20 gate — "
    "runs on ONE (token) hash partitioning: a single text scan, two "
    "exchanges total, no self-join of the pair table. The only per-group "
    "buffer downstream of the rank filter is the 20-element posting "
    "array, so stopword-class tokens (df ~ corpus size) cost O(1) state "
    "per row, not an O(df) collect — the skew that kills naive index "
    "builds. Postings render as joined strings (repo array-hash "
    "convention, cf. agg_array).",
    tags=("text", "pipeline"),
)
def q_text_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    pairs = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    full = W.partitionBy("token")
    ranked = (
        pairs.withColumn("df", F.count(F.lit(1)).over(full))
        .withColumn("cf", F.sum("tf").over(full))
        .withColumn(
            "rn",
            F.row_number().over(
                full.orderBy(F.col("tf").desc(), "doc_id")
            ),
        )
        .filter(F.col("rn") <= 20)
    )
    return ranked.groupBy("token", "df", "cf").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("tf")).alias("s1"),
                            F.col("doc_id").alias("s2"),
                        )
                    )
                ),
                lambda x: x["s2"].cast("string"),
            ),
            ",",
        ).alias("top_postings")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance selection (round 6)
# ---------------------------------------------------------------------------


@query(
    "doc_dsir_select",
    oracle="""
        WITH tok AS (
            SELECT doc_id, lang,
                   unnest(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS w
            FROM documents
        ),
        vocab AS (
            SELECT w,
                   CAST(COUNT(*) AS BIGINT) AS c_all,
                   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS c_tgt
            FROM tok GROUP BY w
        ),
        tot AS (
            SELECT CAST(SUM(c_all) AS BIGINT) AS n_all,
                   CAST(SUM(c_tgt) AS BIGINT) AS n_tgt,
                   CAST(COUNT(*) AS BIGINT) AS v
            FROM vocab
        ),
        scored_w AS (
            SELECT vocab.w,
                   CAST((1000000 * (c_tgt + 1)) // (n_tgt + v) AS BIGINT)
                   - CAST((1000000 * (c_all + 1)) // (n_all + v) AS BIGINT)
                       AS diff_ppm
            FROM vocab CROSS JOIN tot
        ),
        per_doc AS (
            SELECT t.doc_id,
                   CAST(SUM(s.diff_ppm) AS BIGINT) AS sum_diff,
                   CAST(COUNT(*) AS BIGINT) AS n_tok
            FROM tok t JOIN scored_w s ON t.w = s.w
            GROUP BY t.doc_id
        ),
        ranked AS (
            SELECT doc_id,
                   CAST(CASE WHEN sum_diff >= 0 THEN sum_diff // n_tok
                        ELSE -((-sum_diff) // n_tok) END AS BIGINT)
                       AS dsir_ppm,
                   ROW_NUMBER() OVER (
                       ORDER BY CASE WHEN sum_diff >= 0 THEN sum_diff // n_tok
                                ELSE -((-sum_diff) // n_tok) END DESC, doc_id
                   ) AS rank
            FROM per_doc
        )
        SELECT doc_id, dsir_ppm, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= 100
    """,
    doc="DSIR-style importance selection (Xie et al., arXiv:2302.03169, "
    "linearized): score every document by the mean per-token probability "
    "GAP between a target-domain unigram LM (here: the lang='en' slice) "
    "and the raw-corpus LM, both add-one smoothed over the joint "
    "vocabulary, and keep the top-100 — the data-selection primitive "
    "that up-weights documents that look like the target domain. All "
    "arithmetic is exact integer ppm (per-word smoothed probabilities "
    "floor to ppm, the per-doc mean is a truncated-toward-zero integer "
    "division on both engines), so the selected set is bit-reproducible "
    "and auditable — the property a 100 TB curation decision needs. "
    "Scale: both the LM aggregates and the scoring join consume ONE "
    "(doc_id, w) -> count pre-aggregate, so its exchange is planned as a "
    "ReusedExchange and the corpus tokenizes exactly once (plan-pinned in "
    "tests/test_plan_shapes.py); the scoring join probes per-(doc, word) "
    "rows, not per-token (the vocabulary side is corpus-vocab-sized, AQE "
    "broadcasts real-text vocabularies); per-doc sums weight by the "
    "count and partial-aggregate map-side; top-100 is TakeOrdered, no "
    "global sort.",
    tags=("sampling", "text", "pipeline"),
)
def q_doc_dsir_select(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x != '')")
        ).alias("w"),
    )
    # Single tokenization pass: both the vocabulary LM and the scoring join
    # consume this (doc_id, w) -> count pre-aggregate. The two lineages
    # share an IDENTICAL Exchange(hash(doc_id, lang, w)) subtree, which
    # Catalyst plans as one Exchange + a ReusedExchange — without this
    # common shuffle the broadcast-join probe side has no exchange in
    # common with the vocab branch and the corpus would tokenize twice.
    doc_w = tok.groupBy("doc_id", "lang", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    vocab = doc_w.groupBy("w").agg(
        F.sum("cnt").cast("bigint").alias("c_all"),
        F.sum(F.when(F.col("lang") == "en", F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("c_tgt"),
    )
    tot = vocab.agg(
        F.sum("c_all").cast("bigint").alias("n_all"),
        F.sum("c_tgt").cast("bigint").alias("n_tgt"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    scored_w = vocab.join(F.broadcast(tot)).select(
        "w",
        (
            F.expr("CAST((1000000 * (c_tgt + 1)) DIV (n_tgt + v) AS BIGINT)")
            - F.expr("CAST((1000000 * (c_all + 1)) DIV (n_all + v) AS BIGINT)")
        ).alias("diff_ppm"),
    )
    per_doc = (
        doc_w.select("doc_id", "w", "cnt")
        .join(scored_w, "w")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("diff_ppm") * F.col("cnt"))
            .cast("bigint")
            .alias("sum_diff"),
            F.sum("cnt").cast("bigint").alias("n_tok"),
        )
    )
    # truncate-toward-zero mean: Spark's DIV and DuckDB's // both floor,
    # which disagree on negatives — normalize via the sign-split form
    mean = F.expr(
        "CAST(CASE WHEN sum_diff >= 0 THEN sum_diff DIV n_tok "
        "ELSE -((-sum_diff) DIV n_tok) END AS BIGINT)"
    )
    top = (
        per_doc.select("doc_id", mean.alias("dsir_ppm"))
        .orderBy(F.desc("dsir_ppm"), "doc_id")
        .limit(100)
    )
    from pyspark.sql import Window as W

    return top.select(
        "doc_id",
        "dsir_ppm",
        F.row_number()
        .over(W.orderBy(F.desc("dsir_ppm"), "doc_id"))
        .cast("bigint")
        .alias("rank"),
    )
