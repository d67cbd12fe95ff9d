"""Round-5 analytics operators: funnels, cohorts, fits, sampling.

Product-analytics and corpus-analytics shapes a Flight SQL user runs daily,
each with a DuckDB oracle under the exactness discipline (catalog.py):
decimal-cast money sums, integer epoch/day arithmetic, integer-algebra
variance tests (no engine-dependent sqrt/ln in COMPARISONS), and unique
total orders for every ranking.

Reference scope: all of these are §2.C extensions — the reference delegates
its relational surface (service.rs:171,186-190) and has no analytics
library; these are the queries its users write on top, re-expressed
Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.queries.catalog import query, tables


# ---------------------------------------------------------------------------
# First-order cohort LTV
# ---------------------------------------------------------------------------


@query(
    "orders_cohort_ltv",
    oracle="""
        WITH m AS (SELECT o_custkey,
                          CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                               AS BIGINT) AS ym,
                          CAST(o_totalprice AS DECIMAL(18,2)) AS price
                   FROM orders),
        firsts AS (SELECT o_custkey, MIN(ym) AS cohort_ym FROM m
                   GROUP BY o_custkey),
        cells AS (SELECT f.cohort_ym, m.ym - f.cohort_ym AS month_off,
                         m.price, m.o_custkey
                  FROM m JOIN firsts f ON m.o_custkey = f.o_custkey)
        SELECT cohort_ym, CAST(month_off AS BIGINT) AS month_off,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS customers,
               CAST(SUM(price) AS DOUBLE) AS revenue
        FROM cells GROUP BY cohort_ym, month_off
    """,
    doc="First-order cohort lifetime value: customers grouped by first "
    "order month, revenue accumulated by months-since-first — the LTV "
    "curve. Month arithmetic is integer (y*12+m), money sums go through "
    "DECIMAL(18,2) so parallel partial aggregation is bit-exact. Scale: "
    "two custkey-partitioned aggregations sharing one exchange.",
    tags=("orders", "cohort", "analytics"),
)
def q_orders_cohort_ltv(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    m = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("ym"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    firsts = m.groupBy("o_custkey").agg(F.min("ym").alias("cohort_ym"))
    cells = m.join(firsts, "o_custkey").select(
        "cohort_ym",
        (F.col("ym") - F.col("cohort_ym")).cast("bigint").alias("month_off"),
        "price",
        "o_custkey",
    )
    return cells.groupBy("cohort_ym", "month_off").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("customers"),
        F.sum("price").cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Zipf exponent fit
# ---------------------------------------------------------------------------


@query(
    "text_zipf_fit",
    oracle="""
        WITH tok AS (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                               x -> x <> '')) AS w
                     FROM documents),
        freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY w),
        ranked AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, w) AS r
                   FROM freq),
        pts AS (SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y
                FROM ranked WHERE r <= 1000)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
               ROUND((COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
                     / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x)), 4)
                   AS zipf_slope
        FROM pts
    """,
    doc="Zipf's-law fit over the corpus vocabulary: least-squares slope of "
    "ln(freq) vs ln(rank) for the top-1000 tokens (natural text ≈ -1; "
    "strong deviation flags synthetic/garbled corpora — a corpus-level "
    "quality gate). Ranking ties break on the token so the point set is "
    "engine-identical; the slope rounds to 4 decimals, far above "
    "double-summation noise (~1e-12 over 1000 points). Scale: one "
    "explode+count (map-side partial agg), a 1000-row windowed head, and "
    "a 5-scalar reduce.",
    tags=("text", "quality", "fit"),
)
def q_text_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    freq = (
        d.select(
            F.explode(
                F.expr("filter(split(lower(text), ' '), x -> x != '')")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    # distributed top-k first (TakeOrderedAndProject — per-partition heads,
    # no global sort), THEN a row_number over just the 1000 survivors; a
    # global row_number over the whole vocabulary would be a single-task
    # sort of the corpus vocabulary at scale
    top = freq.orderBy(F.desc("f"), "w").limit(1000)
    ranked = top.select(
        "f", F.row_number().over(W.orderBy(F.desc("f"), "w")).alias("r")
    )
    pts = ranked.select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    n = F.count(F.lit(1))
    return pts.agg(
        n.cast("bigint").alias("n_points"),
        F.round(
            (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")),
            4,
        ).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# Keyword extraction (rational tf-idf argmax)
# ---------------------------------------------------------------------------


@query(
    "text_keyword_extract",
    oracle="""
        WITH tok AS (SELECT doc_id,
                            unnest(list_filter(string_split(lower(text), ' '),
                                               x -> x <> '')) AS w
                     FROM documents),
        tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
               FROM tok GROUP BY doc_id, w),
        df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
        nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n
               FROM documents),
        scored AS (SELECT t.doc_id, t.w,
                          t.tf * nd.n * 1000000 // d.df AS score_ppm
                   FROM tf t JOIN df d ON t.w = d.w CROSS JOIN nd),
        best AS (SELECT doc_id, w AS keyword, score_ppm,
                        ROW_NUMBER() OVER (PARTITION BY doc_id
                                           ORDER BY score_ppm DESC, w) AS rk
                 FROM scored)
        SELECT doc_id, keyword, CAST(score_ppm AS BIGINT) AS score_ppm
        FROM best WHERE rk = 1
    """,
    doc="Per-document keyword extraction: argmax of a RATIONAL tf-idf "
    "(tf * N / df in exact integer ppm — no engine-dependent ln in the "
    "ORDER BY, so the winner is bit-deterministic; ties break "
    "lexicographically). Scale: single explode lineage; df is a "
    "vocabulary-sized aggregate of tf (AQE broadcasts it); the argmax is "
    "a doc-partitioned window, one shuffle.",
    tags=("text", "keywords", "analytics"),
)
def q_text_keyword_extract(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark import StorageLevel

    from datafusion_flight_sql_server_spark.queries.catalog import (
        register_query_cleanup,
    )

    d = tables(spark, sf)["documents"]
    tf = (
        d.select(
            "doc_id",
            F.explode(
                F.expr("filter(split(lower(text), ' '), x -> x != '')")
            ).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    # tf feeds BOTH the df aggregation and the scored join; Catalyst's
    # column pruning defeats exchange reuse here (the bigram_lm lesson),
    # so without the persist the corpus would tokenize twice
    tf = register_query_cleanup(tf.persist(StorageLevel.MEMORY_AND_DISK))
    df_ = tf.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    nd = d.agg(F.countDistinct("doc_id").cast("bigint").alias("n"))
    scored = (
        tf.join(df_, "w")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "w",
            F.expr("tf * n * 1000000 DIV df").alias("score_ppm"),
        )
    )
    best = scored.select(
        "doc_id",
        F.col("w").alias("keyword"),
        "score_ppm",
        F.row_number()
        .over(W.partitionBy("doc_id").orderBy(F.desc("score_ppm"), "w"))
        .alias("rk"),
    )
    return best.filter(F.col("rk") == 1).select(
        "doc_id", "keyword", F.col("score_ppm").cast("bigint").alias("score_ppm")
    )


# ---------------------------------------------------------------------------
# Period-over-period percent change
# ---------------------------------------------------------------------------


@query(
    "window_percent_change",
    oracle="""
        WITH monthly AS (
            SELECT l_returnflag AS flag,
                   CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1
                        AS BIGINT) AS ym,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS rev_cents
            FROM lineitem GROUP BY flag, ym
        )
        SELECT flag, ym, rev_cents,
               ROUND(CAST(rev_cents - LAG(rev_cents) OVER w AS DOUBLE)
                     / CAST(LAG(rev_cents) OVER w AS DOUBLE), 6) AS pct_change
        FROM monthly WINDOW w AS (PARTITION BY flag ORDER BY ym)
    """,
    doc="Month-over-month revenue change per return flag: the "
    "period-over-period lag pattern. Revenue is exact integer cents "
    "(decimal sum x100); the ratio is one double division of two exact "
    "integers, rounded to 6 — bit-identical across engines. Scale: one "
    "aggregation + one window on the same (flag) partitioning.",
    tags=("window", "timeseries", "analytics"),
)
def q_window_percent_change(spark: SparkSession, sf: str) -> DataFrame:
    l = tables(spark, sf)["lineitem"]
    monthly = l.groupBy(
        F.col("l_returnflag").alias("flag"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("bigint")
        .alias("ym"),
    ).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("rev_cents")
    )
    w = W.partitionBy("flag").orderBy("ym")
    prev = F.lag("rev_cents").over(w)
    return monthly.select(
        "flag",
        "ym",
        "rev_cents",
        F.round(
            (F.col("rev_cents") - prev).cast("double") / prev.cast("double"), 6
        ).alias("pct_change"),
    )


# ---------------------------------------------------------------------------
# Balanced per-group sampling
# ---------------------------------------------------------------------------


@query(
    "doc_balanced_sample",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                               doc_id) AS rk
            FROM documents
        )
        SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 20
    """,
    doc="Balanced per-language sample: exactly k=20 docs per lang, chosen "
    "by md5(doc_id) ranking — deterministic, seedless, and uniform "
    "(a hash of the id is a fixed random permutation), the standard "
    "trick for reproducible balanced subsets of a skewed corpus. Scale: "
    "one window per lang partition; rank pushdown keeps only k rows per "
    "group before the final gather.",
    tags=("documents", "sampling", "pipeline"),
)
def q_doc_balanced_sample(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number()
        .over(
            W.partitionBy("lang").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        )
        .alias("rk"),
    )
    return ranked.filter(F.col("rk") <= 20).select(
        "doc_id", "lang", F.col("rk").cast("bigint").alias("rk")
    )


# ---------------------------------------------------------------------------
# Token-budget corpus selection
# ---------------------------------------------------------------------------


@query(
    "doc_budget_select",
    oracle="""
        WITH scored AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                   CAST((1000000 * len(list_distinct(string_split(text, ' '))))
                        // len(string_split(text, ' ')) AS BIGINT) AS score_ppm
            FROM documents),
        tot AS (SELECT SUM(n_tok) // 2 AS budget FROM scored),
        ordered AS (
            SELECT doc_id, n_tok, score_ppm,
                   SUM(n_tok) OVER (ORDER BY score_ppm DESC, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum_tok
            FROM scored)
        SELECT o.doc_id, o.score_ppm, o.n_tok,
               CAST(o.cum_tok AS BIGINT) AS cum_tok
        FROM ordered o, tot t WHERE o.cum_tok <= t.budget
    """,
    doc="Token-budget corpus selection: keep the highest-quality documents "
    "(type-token ratio in exact integer ppm, doc_id ties) until half the "
    "corpus token count is spent — the data-mixing primitive behind "
    "quality-thresholded pretraining subsets. The oracle's global "
    "ORDER-BY running sum would be a single-partition sort at corpus "
    "scale, so the Spark plan computes the SAME rows without any global "
    "doc order: docs bucket by score_ppm DIV 1000, the <=1001-row bucket "
    "spine carries budget + per-bucket prior cumulative tokens (the only "
    "single-partition window, bounded by the bucket count, broadcast "
    "back), and each doc's exact global cumulative is prior_cum + a "
    "bucket-PARTITIONED running sum — per-bucket parallel windows, one "
    "doc shuffle on bucket. Bit-exact: all integer arithmetic.",
    tags=("documents", "sampling", "pipeline"),
)
def q_doc_budget_select(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    scored = d.select(
        "doc_id",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n_tok"),
        # cast BEFORE the 1e6 multiply: docs with >2147 distinct tokens
        # overflow 32-bit INT under ANSI mode (the oracle's len() is BIGINT)
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000000"
            " DIV size(split(text, ' '))"
        ).alias("score_ppm"),
    )
    scored = scored.withColumn("bucket", F.expr("score_ppm DIV 1000"))
    # Tiny spine: per-bucket token totals, descending-cumulative prior sums,
    # and the global budget. <=1001 rows — the single-partition window is
    # bounded by the bucket count, never the corpus.
    spine = scored.groupBy("bucket").agg(F.sum("n_tok").alias("btok"))
    w_desc = W.orderBy(F.col("bucket").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    w_all = W.orderBy(F.col("bucket").desc()).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    spine = (
        spine.select(
            "bucket",
            F.coalesce(
                F.sum("btok").over(w_desc), F.lit(0).cast("bigint")
            ).alias("prior_cum"),
            F.sum("btok").over(w_all).alias("total"),
        )
        .withColumn("budget", F.expr("total DIV 2"))
        .drop("total")
    )
    w_in = W.partitionBy("bucket").orderBy(
        F.col("score_ppm").desc(), F.col("doc_id")
    )
    return (
        scored.join(F.broadcast(spine), "bucket")
        .withColumn(
            "cum_tok",
            (F.col("prior_cum") + F.sum("n_tok").over(w_in)).cast("bigint"),
        )
        .filter(F.col("cum_tok") <= F.col("budget"))
        .select("doc_id", "score_ppm", "n_tok", "cum_tok")
    )


# ---------------------------------------------------------------------------
# Price elasticity (exact-integer least squares)
# ---------------------------------------------------------------------------


@query(
    "part_price_elasticity",
    oracle="""
        WITH pts AS (
            SELECT p.p_brand AS brand,
                   CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS x,
                   CAST(l.l_quantity AS BIGINT) AS y
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        )
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(COUNT(*) * SUM(CAST(x AS HUGEINT) * y)
                          - SUM(CAST(x AS HUGEINT))
                            * SUM(CAST(y AS HUGEINT)) AS DOUBLE)
                     / CAST(COUNT(*) * SUM(CAST(x AS HUGEINT)
                                           * CAST(x AS HUGEINT))
                            - SUM(CAST(x AS HUGEINT))
                              * SUM(CAST(x AS HUGEINT)) AS DOUBLE)
                     * 1000000, 6) AS slope_per_cent_ppm
        FROM pts GROUP BY brand
    """,
    doc="Quantity-vs-price least-squares slope per brand (price "
    "elasticity proxy): the regression is computed from EXACT decimal "
    "sums of integer cents and quantities — n*Sxy - Sx*Sy over "
    "n*Sxx - Sx^2 — with one final double division, so parallel partial "
    "aggregation cannot perturb the result (regr_slope's internal "
    "double accumulation would). Scale: one join (part broadcasts) + "
    "one aggregation; the sums are mergeable sketch-like state.",
    tags=("orders", "regression", "analytics"),
)
def q_part_price_elasticity(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    pts = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("p_brand").alias("brand"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("x"),
            F.col("l_quantity").cast("bigint").alias("y"),
        )
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    n = F.count(F.lit(1))
    num = (n * F.sum(xd * yd) - F.sum(xd) * F.sum(yd)).cast("double")
    den = (n * F.sum(xd * xd) - F.sum(xd) * F.sum(xd)).cast("double")
    return pts.groupBy("brand").agg(
        n.cast("bigint").alias("n"),
        F.round(num / den * 1000000, 6).alias("slope_per_cent_ppm"),
    )


# ---------------------------------------------------------------------------
# Peak detection (integer algebra, no sqrt)
# ---------------------------------------------------------------------------


@query(
    "event_peak_detect",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY event_type, day
        ), stats AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS sx,
                   SUM(CAST(c AS HUGEINT) * c) AS sxx
            FROM daily GROUP BY event_type
        )
        SELECT d.event_type, CAST(d.day AS VARCHAR) AS day, d.c
        FROM daily d JOIN stats s ON d.event_type = s.event_type
        WHERE s.n > 1 AND CAST(d.c AS HUGEINT) * s.n > s.sx
          AND (CAST(d.c AS HUGEINT) * s.n - s.sx)
              * (CAST(d.c AS HUGEINT) * s.n - s.sx) * (s.n - 1)
              > 4 * CAST(s.n AS HUGEINT)
                  * (CAST(s.n AS HUGEINT) * s.sxx
                     - CAST(s.sx AS HUGEINT) * s.sx)
        ORDER BY d.event_type, day
    """,
    doc="Daily-count anomaly peaks per event type: a day is a peak when "
    "count > mean + 2*stddev, tested in PURE INTEGER algebra — "
    "(c*n - Sx)^2 * (n-1) > 4n(n*Sxx - Sx^2) is the squared form of the "
    "z-score test, so no engine sqrt/double enters the comparison and "
    "the flag set is bit-deterministic. The squared products route "
    "through DECIMAL(38,0)/HUGEINT (like part_price_elasticity's "
    "identical n*Sxx - Sx^2 algebra): Sxx alone exceeds int64 at c~1e9 "
    "daily counts, and lhs^2*(n-1) far earlier — exact up to "
    "c*n < ~1e16. Scale: daily counts partial-aggregate map-side; "
    "stats is a per-type 3-scalar table joined back broadcast.",
    tags=("events", "anomaly", "analytics"),
)
def q_event_peak_detect(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"]
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sx"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sxx"),
    )
    d = daily.join(F.broadcast(stats), "event_type")
    lhs = F.col("c").cast("decimal(38,0)") * F.col("n") - F.col("sx")
    return (
        d.filter(
            (F.col("n") > 1)
            & (F.col("c").cast("decimal(38,0)") * F.col("n") > F.col("sx"))
            & (
                lhs * lhs * (F.col("n") - 1)
                > 4
                * F.col("n").cast("decimal(38,0)")
                * (
                    F.col("n").cast("decimal(38,0)") * F.col("sxx")
                    - F.col("sx").cast("decimal(38,0)") * F.col("sx")
                )
            )
        )
        .select(
            "event_type", F.col("day").cast("string").alias("day"), "c"
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# PCA power iteration (distributed Gram matrix, exact integer arithmetic)
# ---------------------------------------------------------------------------


@query(
    "embed_pca_power",
    oracle="""
        WITH ints AS (
            SELECT vec_id, i.i AS i,
                   CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000)
                        AS BIGINT) AS x
            FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i
        ),
        gram AS (
            SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS g
            FROM ints a JOIN ints b ON a.vec_id = b.vec_id
            GROUP BY a.i, b.i
        ),
        w1 AS (SELECT i, SUM(g) AS w FROM gram GROUP BY i),
        mw AS (SELECT MAX(abs(w)) AS m FROM w1),
        u AS (SELECT i, CAST(w AS HUGEINT) * 1000000 // (SELECT m FROM mw)
                     AS u
              FROM w1),
        v2 AS (SELECT gram.i AS i, SUM(CAST(g AS HUGEINT) * u.u) AS v
               FROM gram JOIN u ON gram.j = u.i GROUP BY gram.i),
        mv AS (SELECT MAX(abs(v)) AS m FROM v2)
        SELECT i, CAST(v // ((SELECT m FROM mv) // 1000000) AS BIGINT)
                   AS dir_ppm
        FROM v2 ORDER BY i
    """,
    doc="Two power-iteration steps on the embedding Gram matrix (the "
    "normalized direction of G·(G·1)), entirely in exact integer "
    "arithmetic. The iteration's fixed point is the dominant "
    "eigenvector; convergence per step depends on the spectral gap — "
    "the near-isotropic test fixture needs many steps (callers add "
    "rounds; each is one 4096-row join), while real embedding corpora "
    "with a dominant direction converge in a few. What ships here is "
    "the distributed machinery those rounds repeat: "
    "components floor-quantized to micros, the 64x64 Gram accumulated as "
    "per-partition numpy int64 outer products inside mapInArrow (the ONLY "
    "data-sized pass — 4096 longs of mergeable state per partition, the "
    "same map-side-combine shape as a sketch), then v = G(G·1) computed "
    "on the 4096-row Gram table with ppm re-normalization between steps "
    "so every intermediate fits DECIMAL(38,0)/HUGEINT. Output is the "
    "direction in ppm of its largest |component| — bit-deterministic, no "
    "sqrt/eigensolver. Both engines truncate integer division toward "
    "zero (verified), so signs need no special casing. Scale: corpus "
    "touched once; everything after is 64x64.",
    tags=("embeddings", "linalg", "iterative"),
)
def q_embed_pca_power(spark: SparkSession, sf: str) -> DataFrame:
    from collections.abc import Iterator

    import pyarrow as pa

    e = tables(spark, sf)["embeddings"].select("embedding")
    dim = 64

    def partial_gram(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        import numpy as np

        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for batch in batches:
            col = batch.column(0)
            arr = np.asarray(col.flatten(), dtype=np.float64).reshape(-1, dim)
            q = np.floor(arr * 1_000_000).astype(np.int64)
            acc += q.T @ q
            seen = True
        if seen:
            ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
            yield pa.RecordBatch.from_pydict(
                {
                    "i": ii.ravel().astype("int32"),
                    "j": jj.ravel().astype("int32"),
                    "g": acc.ravel(),
                }
            )

    gram = (
        e.mapInArrow(partial_gram, "i int, j int, g long")
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
    )
    from datafusion_flight_sql_server_spark.queries.catalog import (
        register_query_cleanup,
    )
    from pyspark import StorageLevel

    # gram feeds both iteration steps; 4096 rows — cache, don't rescan
    gram = register_query_cleanup(gram.persist(StorageLevel.MEMORY_AND_DISK))
    w1 = gram.groupBy("i").agg(F.sum("g").alias("w"))
    mw = w1.agg(F.max(F.abs(F.col("w"))).alias("m"))
    # u derives from gram, so its `i` is renamed before joining back to
    # gram (self-join lineage would make `i` ambiguous)
    u = w1.crossJoin(F.broadcast(mw)).select(
        F.col("i").alias("uj"),
        F.expr("CAST(w AS DECIMAL(38,0)) * 1000000 DIV m").alias("u"),
    )
    v2 = (
        gram.join(F.broadcast(u), gram["j"] == F.col("uj"))
        .groupBy("i")
        .agg(F.sum(F.col("g").cast("decimal(38,0)") * F.col("u")).alias("v"))
    )
    mv = v2.agg(F.max(F.abs(F.col("v"))).alias("m"))
    return (
        v2.crossJoin(F.broadcast(mv))
        .select(
            "i",
            F.expr("CAST(v DIV (m DIV 1000000) AS BIGINT)").alias("dir_ppm"),
        )
        .orderBy("i")
    )


@query(
    "event_running_distinct",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day
            FROM events
            GROUP BY user_id
        ), daily AS (
            SELECT first_day AS day, COUNT(*) AS new_users
            FROM firsts GROUP BY first_day
        ), days AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day
            FROM events
        )
        SELECT CAST(d.day AS VARCHAR) AS day,
               CAST(COALESCE(SUM(n.new_users), 0) AS BIGINT)
                   AS cumulative_users
        FROM days d LEFT JOIN daily n ON n.day <= d.day
        GROUP BY d.day
    """,
    doc="Cumulative distinct users per day (the audience-reach curve). A "
    "naive running COUNT(DISTINCT user_id) OVER (ORDER BY day) carries "
    "the whole user set in every window frame — quadratic state. The "
    "scalable form: one user-keyed aggregation finds each user's FIRST "
    "active day (map-side combinable), a tiny per-day count of "
    "first-appearances follows, and the running sum is a window over "
    "O(days) rows. Oracle mirrors with a day<=day join over the same "
    "daily counts. At 100 TB: one shuffle by user_id, then day-level "
    "data; the 1970-style distinct-explosion never materializes.",
    tags=("events", "window", "distinct"),
)
def q_event_running_distinct(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = tables(spark, sf)["events"]
    firsts = (
        e.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
    )
    daily = firsts.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    days = e.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        days.join(daily, days.day == daily.first_day, "left")
        .select("day", F.coalesce("new_users", F.lit(0)).alias("new_users"))
        .select(
            F.col("day").cast("string").alias("day"),
            F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (Robertson/Sparck Jones; the Lucene +1 idf form)
# ---------------------------------------------------------------------------

#: Fixed evaluation query for the registered BM25 run (terms from the
#: fixture vocabulary, present at every scale factor).
BM25_TERMS = ("vector", "join", "scan")
BM25_K1 = 1.2
BM25_B = 0.75

#: Per-(doc, term) BM25 contribution in integer micros. ONE ln per term and
#: a fixed-shape double expression evaluated identically by both engines,
#: then floor(x*1e6 + 0.5) so the per-doc SUM is integer — order-independent
#: and hash-exact (the repo's floor-micros idiom; a double SUM over terms
#: would be association-dependent at the last ulp).
_BM25_TERM_PPM = (
    "CAST(floor("
    "ln(1.0 + (CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))"
    " * (CAST(tf AS DOUBLE) * {k1p1})"
    " / (CAST(tf AS DOUBLE) + {k1} * ({one_minus_b} + {b} *"
    " (CAST(dl AS DOUBLE) / (CAST(total AS DOUBLE) / CAST(n AS DOUBLE)))))"
    " * 1000000.0 + 0.5) AS BIGINT)"
).format(k1p1=BM25_K1 + 1, k1=BM25_K1, one_minus_b=1 - BM25_B, b=BM25_B)

_BM25_TOKENS_DUCK = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


@query(
    "text_bm25",
    oracle=f"""
        WITH per AS (SELECT doc_id,
                 CAST(len({_BM25_TOKENS_DUCK}) AS BIGINT) AS dl,
                 CAST(len(list_filter({_BM25_TOKENS_DUCK},
                                      x -> x = '{BM25_TERMS[0]}')) AS BIGINT) AS tf_0,
                 CAST(len(list_filter({_BM25_TOKENS_DUCK},
                                      x -> x = '{BM25_TERMS[1]}')) AS BIGINT) AS tf_1,
                 CAST(len(list_filter({_BM25_TOKENS_DUCK},
                                      x -> x = '{BM25_TERMS[2]}')) AS BIGINT) AS tf_2
             FROM documents),
        long AS (SELECT doc_id, dl, '{BM25_TERMS[0]}' AS w, tf_0 AS tf FROM per
                 UNION ALL
                 SELECT doc_id, dl, '{BM25_TERMS[1]}', tf_1 FROM per
                 UNION ALL
                 SELECT doc_id, dl, '{BM25_TERMS[2]}', tf_2 FROM per),
        hits AS (SELECT * FROM long WHERE tf > 0),
        dfq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY w),
        st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(dl) AS BIGINT) AS total FROM per),
        term AS (SELECT h.doc_id, {_BM25_TERM_PPM} AS s_ppm
                 FROM hits h JOIN dfq USING (w) CROSS JOIN st),
        docsc AS (SELECT doc_id, CAST(SUM(s_ppm) AS BIGINT) AS score_ppm
                  FROM term GROUP BY doc_id),
        ranked AS (SELECT doc_id, score_ppm,
                          ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id)
                              AS rk
                   FROM docsc)
        SELECT doc_id, score_ppm, CAST(rk AS BIGINT) AS rank
        FROM ranked WHERE rk <= 10
    """,
    doc="BM25 ranked retrieval (k1=1.2, b=0.75, Lucene +1 idf) for a fixed "
    "3-term query — the scoring-side complement of text_inverted_index, "
    "and the engine primitive behind contamination screens and "
    "retrieval-based curation. Zero explodes: per-doc length and "
    "per-term tf are ROW-LOCAL higher-order-function expressions "
    "(size/filter over the token array), so the corpus never shuffles — "
    "only an n_docs-row stats table does. Per-(doc,term) scores are "
    "floor-micros integers (one ln each, identical expression shape in "
    "both engines), so the per-doc SUM is order-independent and the "
    "top-10 (score DESC, doc_id) is a total order. Scale: one corpus "
    "scan, an n_docs-row persist shared by the stats and the long form, "
    "broadcast df/N joins, TakeOrdered top-10 — no corpus-sized shuffle "
    "anywhere.",
    tags=("text", "retrieval", "analytics"),
)
def q_text_bm25(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark import StorageLevel

    from datafusion_flight_sql_server_spark.queries.catalog import (
        register_query_cleanup,
    )

    d = tables(spark, sf)["documents"]
    toks = "filter(split(lower(text), ' '), x -> x != '')"
    per = d.select(
        "doc_id",
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("dl"),
        *[
            F.expr(
                f"CAST(size(filter({toks}, x -> x = '{t}')) AS BIGINT)"
            ).alias(f"tf_{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    # `per` feeds both the corpus stats and the long form; without the
    # persist the documents scan (and 4 higher-order projections) runs
    # twice (the text_keyword_extract lesson — exchange reuse does not
    # apply across different aggregates)
    per = register_query_cleanup(per.persist(StorageLevel.MEMORY_AND_DISK))
    stack_args = ", ".join(
        f"'{t}', tf_{i}" for i, t in enumerate(BM25_TERMS)
    )
    hits = per.select(
        "doc_id",
        "dl",
        F.expr(f"stack({len(BM25_TERMS)}, {stack_args}) AS (w, tf)"),
    ).filter(F.col("tf") > 0)
    dfq = hits.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    st = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dl").cast("bigint").alias("total"),
    )
    term = (
        hits.join(F.broadcast(dfq), "w")
        .crossJoin(F.broadcast(st))
        .select("doc_id", F.expr(_BM25_TERM_PPM).alias("s_ppm"))
    )
    docsc = term.groupBy("doc_id").agg(
        F.sum("s_ppm").cast("bigint").alias("score_ppm")
    )
    top = docsc.orderBy(F.desc("score_ppm"), "doc_id").limit(10)
    return top.select(
        "doc_id",
        "score_ppm",
        F.row_number()
        .over(W.orderBy(F.desc("score_ppm"), "doc_id"))
        .cast("bigint")
        .alias("rank"),
    )


# ---------------------------------------------------------------------------
# Mutual k-NN graph over embeddings
# ---------------------------------------------------------------------------


@query(
    "embed_knn_graph",
    oracle="""
        WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        p AS (SELECT a.vec_id AS qa, b.vec_id AS qb,
                     ROUND(CASE WHEN sqrt(list_dot_product(a.v, a.v)) > 0
                                AND sqrt(list_dot_product(b.v, b.v)) > 0
                           THEN list_dot_product(a.v, b.v) /
                                (sqrt(list_dot_product(a.v, a.v)) *
                                 sqrt(list_dot_product(b.v, b.v)))
                           ELSE 0.0 END, 6) AS sim
              FROM c a JOIN c b ON a.vec_id <> b.vec_id),
        r AS (SELECT qa, qb, sim,
                     ROW_NUMBER() OVER (PARTITION BY qa
                                        ORDER BY sim DESC, qb) AS rk
              FROM p),
        knn AS (SELECT qa, qb, sim FROM r WHERE rk <= 5)
        SELECT k1.qa AS a_id, k1.qb AS b_id, k1.sim
        FROM knn k1 JOIN knn k2 ON k1.qa = k2.qb AND k1.qb = k2.qa
        WHERE k1.qa < k1.qb
    """,
    doc="Mutual k-NN graph (k=5): undirected edges kept only when each "
    "endpoint ranks in the other's top-k — the standard noise-robust "
    "graph for clustering/community detection over embeddings, and the "
    "edge input graph_components_star consumes. Built by composition: "
    "the self-kNN two-stage top-k (operators/similarity.py "
    "self_knn_topk — each corpus batch row scores against the broadcast "
    "corpus matrix, so its per-row candidates are FINAL: n*(k+8) rows "
    "shuffle instead of n_batches*n*(k+64), then exact JVM re-rank), "
    "then the "
    "mutuality check is an edge-list self equi-join on (a,b)=(b,a) and "
    "a<b dedups orientations. Scale: the directed edge list is n*k rows "
    "(never n^2); the join is hash-partitioned on ids. The corpus-side "
    "matmul design holds while the query matrix fits an executor "
    "(guarded at 100k rows); past that the cell-blocked IVF path "
    "(dedup_semantic's quantizer) generates the candidate pairs "
    "instead.",
    tags=("similarity", "graph"),
)
def q_embed_knn_graph(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.similarity import (
        self_knn_topk,
    )

    e = tables(spark, sf)["embeddings"]
    knn = self_knn_topk(e, k=5)
    fwd = knn.select(
        F.col("query_id").alias("a_id"),
        F.col("neighbor_id").alias("b_id"),
        "sim",
    )
    rev = knn.select(
        F.col("neighbor_id").alias("a_id"),
        F.col("query_id").alias("b_id"),
    )
    return fwd.join(rev, ["a_id", "b_id"]).filter(
        F.col("a_id") < F.col("b_id")
    )


# ---------------------------------------------------------------------------
# Embedding-norm QC audit (round 6)
# ---------------------------------------------------------------------------


@query(
    "embed_norm_audit",
    oracle="""
        WITH v AS (
            SELECT label,
                   CAST(FLOOR(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[]))
                              * 1000000 + 0.5) AS BIGINT) AS nsq
            FROM embeddings
        )
        SELECT CAST(label AS BIGINT) AS label,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(SUM(CASE WHEN nsq = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero_norm,
               CAST(MIN(nsq) AS BIGINT) AS min_normsq_micros,
               CAST(MAX(nsq) AS BIGINT) AS max_normsq_micros,
               CAST(SUM(nsq) // COUNT(*) AS BIGINT) AS avg_normsq_micros
        FROM v GROUP BY label
    """,
    doc="Embedding-norm QC audit per label: vector count, zero-norm count "
    "(dead/failed encodes — they poison cosine math downstream), and "
    "min/max/mean squared norm in exact integer micros — the ingest "
    "screen run before any similarity/dedup pass (un-normalized or "
    "collapsed batches show up as norm outliers). Determinism: each "
    "vector's squared norm is one left-fold dot product on DOUBLE-cast "
    "arrays (same fold order as DuckDB's list_dot_product), floored to "
    "micros per vector, so every aggregate is order-free integer math. "
    "Scale: one corpus scan, map-side partial aggregation, one "
    "|labels|-row exchange — no pairwise anything.",
    tags=("embedding", "quality", "agg"),
)
def q_embed_norm_audit(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.functions.vector import dot

    e = tables(spark, sf)["embeddings"]
    v = F.col("embedding").cast("array<double>")
    nsq = F.floor(dot(v, v) * 1000000.0 + F.lit(0.5)).cast("bigint")
    return (
        e.select(F.col("label").cast("bigint").alias("label"), nsq.alias("nsq"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum(F.when(F.col("nsq") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_zero_norm"),
            F.min("nsq").alias("min_normsq_micros"),
            F.max("nsq").alias("max_normsq_micros"),
            F.expr("CAST(SUM(nsq) DIV COUNT(1) AS BIGINT)").alias(
                "avg_normsq_micros"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonality profile (round 6)
# ---------------------------------------------------------------------------


@query(
    "event_dow_profile",
    oracle="""
        WITH c AS (
            SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, dow, CAST(n AS BIGINT) AS n_events,
               CAST((1000000 * n) // SUM(n) OVER (PARTITION BY event_type)
                    AS BIGINT) AS share_ppm
        FROM c
    """,
    doc="Day-of-week seasonality profile per event type: event counts and "
    "each weekday's exact-ppm share of the type — the load/seasonality "
    "fingerprint behind anomaly baselines and traffic-aware sampling. "
    "Weekday portability: Spark's weekday() (Monday=0) + 1 equals "
    "DuckDB's isodow (Monday=1); shares are integer DIV on exact counts. "
    "Scale: one scan, map-side partial aggregation to |types| x 7 rows; "
    "the share window runs over that tiny aggregate, never the stream.",
    tags=("temporal", "agg"),
)
def q_event_dow_profile(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"]
    c = e.groupBy(
        "event_type",
        (F.weekday("ts") + 1).cast("bigint").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return c.select(
        "event_type",
        "dow",
        F.col("n").cast("bigint").alias("n_events"),
        # integer DIV, never double division truncated (boundary-exact)
        F.expr(
            "CAST((1000000 * n) DIV SUM(n) OVER "
            "(PARTITION BY event_type) AS BIGINT)"
        ).alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# Mergeable quantile rollup via fixed-bin histogram sketches (round 6)
# ---------------------------------------------------------------------------


@query(
    "event_quantile_rollup",
    oracle="""
        WITH b AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(FLOOR(value * 10) AS BIGINT) AS bin
            FROM events WHERE value IS NOT NULL
        ),
        daily AS (SELECT day, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
        merged AS (SELECT bin, SUM(c) AS c FROM daily GROUP BY bin),
        cum AS (SELECT bin, SUM(c) OVER (ORDER BY bin) AS cum,
                       SUM(c) OVER () AS total
                FROM merged),
        q AS (SELECT UNNEST([50, 90, 99]) AS q_pct)
        SELECT CAST(q.q_pct AS BIGINT) AS q_pct,
               CAST(MIN(cum.bin) AS BIGINT) AS q_bin
        FROM q JOIN cum ON 100 * cum.cum >= q.q_pct * cum.total
        GROUP BY q.q_pct
    """,
    doc="Mergeable quantile rollup — the percentile leg of the sketch "
    "family (agg_hll_rollup merges distinct-count sketches, "
    "agg_topk_sketch heavy-hitter summaries; this merges VALUE-HISTOGRAM "
    "sketches): each day stores fixed-bin counts (bin = floor(value*10), "
    "IEEE-exact both engines), coarser grains merge by pure addition, "
    "and any quantile reads off the merged cumulative counts — the "
    "continuous-aggregate pattern where p50/p90/p99 over a quarter comes "
    "from KB-sized daily sketches, never a raw re-scan. Bin-level "
    "quantiles are EXACT (the histogram loses only intra-bin order, and "
    "the k-th element's bin is rank-determined), so the result "
    "hash-matches the oracle's rank computation with no error-bound "
    "contract needed. Scale: one event scan -> per-(day,bin) partial "
    "aggregation; every later grain is an O(bins) aggregate; the "
    "quantile extraction windows over the tiny merged histogram.",
    tags=("temporal", "sketch", "agg"),
)
def q_event_quantile_rollup(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["events"].filter(F.col("value").isNotNull())
    daily = (
        e.select(
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") * 10).cast("bigint").alias("bin"),
        )
        .groupBy("day", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    merged = daily.groupBy("bin").agg(F.sum("c").alias("c"))
    cum = merged.select(
        "bin",
        F.sum("c").over(W.orderBy("bin")).alias("cum"),
        F.sum("c").over(W.partitionBy()).alias("total"),
    )
    spine = (
        tables(spark, sf)["events"]
        .sparkSession.createDataFrame([(50,), (90,), (99,)], "q_pct BIGINT")
    )
    return (
        cum.join(
            F.broadcast(spine),
            100 * F.col("cum") >= F.col("q_pct") * F.col("total"),
        )
        .groupBy("q_pct")
        .agg(F.min("bin").cast("bigint").alias("q_bin"))
    )


# ---------------------------------------------------------------------------
# Per-language document-length quantiles (round 6)
# ---------------------------------------------------------------------------


@query(
    "text_length_quantiles",
    oracle="""
        WITH b AS (
            SELECT lang, CAST(n_chars // 100 AS BIGINT) AS bin
            FROM documents
        ),
        h AS (SELECT lang, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
        cum AS (SELECT lang, bin,
                       SUM(c) OVER (PARTITION BY lang ORDER BY bin) AS cum,
                       SUM(c) OVER (PARTITION BY lang) AS total
                FROM h),
        q AS (SELECT UNNEST([25, 50, 75, 95]) AS q_pct)
        SELECT cum.lang, CAST(q.q_pct AS BIGINT) AS q_pct,
               CAST(MIN(cum.bin) * 100 AS BIGINT) AS q_chars_floor
        FROM q JOIN cum ON 100 * cum.cum >= q.q_pct * cum.total
        GROUP BY cum.lang, q.q_pct
    """,
    doc="Per-language document-length quantile profile (p25/p50/p75/p95 "
    "floored to 100-char bins) — the GROUPED form of the mergeable "
    "histogram-sketch quantile (event_quantile_rollup is the rollup "
    "form): corpus curation reads length cutoffs per language from "
    "per-shard histograms that merge by addition, instead of sorting "
    "the corpus per language. Bin-level quantiles are exact by rank, "
    "integer end to end. Scale: one scan, per-(lang,bin) partial "
    "aggregation, windows over the tiny per-language histograms.",
    tags=("text", "sketch", "sampling"),
)
def q_text_length_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    h = (
        d.select("lang", F.expr("CAST(n_chars DIV 100 AS BIGINT)").alias("bin"))
        .groupBy("lang", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wl = W.partitionBy("lang")
    cum = h.select(
        "lang",
        "bin",
        F.sum("c").over(wl.orderBy("bin")).alias("cum"),
        F.sum("c").over(wl).alias("total"),
    )
    spine = d.sparkSession.createDataFrame(
        [(25,), (50,), (75,), (95,)], "q_pct BIGINT"
    )
    return (
        cum.join(
            F.broadcast(spine),
            100 * F.col("cum") >= F.col("q_pct") * F.col("total"),
        )
        .groupBy("lang", "q_pct")
        .agg((F.min("bin") * 100).cast("bigint").alias("q_chars_floor"))
    )


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth (corpus saturation curve)
# ---------------------------------------------------------------------------


@query(
    "text_vocab_growth",
    oracle="""
        WITH tok AS (SELECT doc_id,
                            unnest(list_filter(string_split(lower(text), ' '),
                                               x -> x <> '')) AS w
                     FROM documents),
        m AS (SELECT MAX(doc_id) AS mx FROM tok),
        per_tok AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
                    FROM tok GROUP BY doc_id),
        fo AS (SELECT w, MIN(doc_id) AS doc_id FROM tok GROUP BY w),
        per_new AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
                    FROM fo GROUP BY doc_id),
        base AS (SELECT t.doc_id, t.n_tok, COALESCE(p.n_new, 0) AS n_new
                 FROM per_tok t LEFT JOIN per_new p USING (doc_id)),
        buck AS (SELECT LEAST(base.doc_id * 20 // (m.mx + 1), 19) AS bucket,
                        SUM(n_tok) AS tok_b, SUM(n_new) AS new_b
                 FROM base, m GROUP BY 1),
        cum AS (SELECT bucket,
                       CAST(SUM(tok_b) OVER (ORDER BY bucket) AS BIGINT)
                           AS cum_tokens,
                       CAST(SUM(new_b) OVER (ORDER BY bucket) AS BIGINT)
                           AS cum_vocab
                FROM buck),
        pts AS (SELECT ln(CAST(cum_tokens AS DOUBLE)) AS x,
                       ln(CAST(cum_vocab AS DOUBLE)) AS y
                FROM cum WHERE cum_tokens > 0 AND cum_vocab > 0),
        fit AS (SELECT ROUND((COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
                             / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x)), 4)
                    AS heaps_beta
                FROM pts)
        SELECT CAST(bucket AS INT) AS bucket, cum_tokens, cum_vocab,
               heaps_beta
        FROM cum CROSS JOIN fit
    """,
    doc="Heaps-law vocabulary growth: cumulative distinct-vocabulary size "
    "vs cumulative token count at 20 corpus-order checkpoints, plus the "
    "fitted Heaps exponent beta (ln V = ln K + beta ln N; natural corpora "
    "sit near 0.4-0.6 — a saturated/looping crawl flattens toward 0, "
    "synthetic word soup toward 1). The curve tells a pipeline whether "
    "MORE of the same source still buys vocabulary diversity. Scale "
    "design: per-doc first-occurrence counting is two hash aggregates "
    "(word -> min doc, then doc -> count) — never a running distinct; "
    "the single-partition cumulative window runs over exactly 20 "
    "checkpoint rows regardless of corpus size (buckets = doc-id "
    "ventiles via integer DIV, engine-exact), so the global-order "
    "dependency costs O(1). Slope from plain double sums over <= 20 "
    "points, rounded to 4 decimals (zipf_fit precedent: far above "
    "summation noise).",
    tags=("text", "quality", "fit"),
)
def q_text_vocab_growth(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    tok = d.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x != '')")
        ).alias("w"),
    )
    per_tok = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok")
    )
    fo = tok.groupBy("w").agg(F.min("doc_id").alias("doc_id"))
    per_new = fo.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    base = (
        per_tok.join(per_new, "doc_id", "left")
        .na.fill({"n_new": 0})
        .crossJoin(F.broadcast(tok.agg(F.max("doc_id").alias("mx"))))
    )
    buck = (
        base.select(
            F.expr("LEAST(doc_id * 20 DIV (mx + 1), 19)").alias("bucket"),
            "n_tok",
            "n_new",
        )
        .groupBy("bucket")
        .agg(F.sum("n_tok").alias("tok_b"), F.sum("n_new").alias("new_b"))
    )
    # cumulative over the <= 20 checkpoint rows: the one ordered window,
    # deliberately bounded to bucket-count cardinality at any corpus size
    win = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = buck.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.sum("tok_b").over(win).cast("bigint").alias("cum_tokens"),
        F.sum("new_b").over(win).cast("bigint").alias("cum_vocab"),
    )
    pts = cum.filter((F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0)).select(
        F.log(F.col("cum_tokens").cast("double")).alias("x"),
        F.log(F.col("cum_vocab").cast("double")).alias("y"),
    )
    n = F.count(F.lit(1))
    fit = pts.agg(
        F.round(
            (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")),
            4,
        ).alias("heaps_beta")
    )
    return cum.crossJoin(F.broadcast(fit)).select(
        "bucket", "cum_tokens", "cum_vocab", "heaps_beta"
    )


# ---------------------------------------------------------------------------
# Token burstiness (Church-Gale variance-to-mean ratio)
# ---------------------------------------------------------------------------


@query(
    "text_burstiness",
    oracle="""
        WITH tok AS (SELECT doc_id,
                            unnest(list_filter(string_split(lower(text), ' '),
                                               x -> x <> '')) AS w
                     FROM documents),
        tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
               FROM tok GROUP BY doc_id, w),
        st AS (SELECT w,
                      CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(c) AS BIGINT) AS total_count,
                      CAST(SUM(c * c) AS BIGINT) AS s2
               FROM tf GROUP BY w)
        SELECT w AS token, n_docs, total_count,
               CAST((1000000 * (n_docs * s2 - total_count * total_count))
                    // (n_docs * total_count) AS BIGINT) AS burst_ppm
        FROM st ORDER BY n_docs DESC, token LIMIT 20
    """,
    doc="Token burstiness (Church-Gale): for the 20 highest-document-"
    "frequency tokens, the variance-to-mean ratio of per-containing-doc "
    "counts — VMR = (n*Sc2 - Sc^2)/(n*Sc) in exact integer ppm (floor "
    "division truncates identically in both engines on positive values; "
    "the 1e6 factor multiplies the SUBTRACTED numerator, keeping the "
    "widest intermediate ~5e18 inside bigint at sf1). Function words sit "
    "near Poisson (VMR ~ 1, burst_ppm ~ its fractional part); topical "
    "content words clump (VMR >> 1) — the classic content-word detector "
    "and a mixture-weight diagnostic for corpus curation. Scale: one "
    "explode, two hash aggregates (both map-side partial), and a "
    "distributed TakeOrdered head of 20 — no window over the vocabulary, "
    "no join.",
    tags=("text", "quality", "statistics"),
)
def q_text_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    tf = (
        d.select(
            "doc_id",
            F.explode(
                F.expr("filter(split(lower(text), ' '), x -> x != '')")
            ).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    st = tf.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("c").cast("bigint").alias("total_count"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    return (
        st.orderBy(F.desc("n_docs"), "w")
        .limit(20)
        .select(
            F.col("w").alias("token"),
            "n_docs",
            "total_count",
            F.expr(
                "(1000000 * (n_docs * s2 - total_count * total_count)) "
                "DIV (n_docs * total_count)"
            )
            .cast("bigint")
            .alias("burst_ppm"),
        )
    )
