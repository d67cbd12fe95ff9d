"""Round-4 late additions: graph/market-basket mining, sketch audits, and
candidate-pruned joins.

Beyond-reference extensions (SURVEY.md §2.C): the reference delegates its
whole relational surface (reference: datafusion-flight-sql-server/src/
service.rs:214-247) and has no graph, association-rule, or sketch-audit
primitives — these are the corpus-mining operators a training-data /
analytics pipeline layers on top, expressed Spark-first.

Exactness discipline (catalog.py module docstring): every compared value is
integer arithmetic (ppm via BIGINT/DECIMAL(38,0) integer division, md5-bucket
derandomized hashing) or the round-6 cosine idiom already driver-verified by
``dedup_embed_cosine`` — no libm in the compared output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from datafusion_flight_sql_server_spark.operators.dedup import rebalance_for_compute
from datafusion_flight_sql_server_spark.operators.similarity import round_cosine
from datafusion_flight_sql_server_spark.queries.catalog import (
    query,
    register_query_cleanup,
    tables,
)


def _md5_bucket(col, salt: str, mod: int):
    """Engine-portable deterministic bucket: 48-bit md5 prefix mod ``mod``.

    DuckDB twin: ``('0x' || substring(md5(x || salt), 1, 12))::BIGINT % mod``.
    """
    return (
        F.conv(F.substring(F.md5(F.concat(col, F.lit(salt))), 1, 12), 16, 10)
        .cast("bigint")
        % mod
    )


# ---------------------------------------------------------------------------
# Exact triangle counting (degree-ordered orientation)
# ---------------------------------------------------------------------------


@query(
    "graph_triangles",
    oracle="""
        WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        e AS (SELECT DISTINCT least(a.p, b.p) AS u, greatest(a.p, b.p) AS v
              FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        deg AS (SELECT x AS node, COUNT(*) AS d
                FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
                GROUP BY 1),
        o AS (SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
                     CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS t,
                     CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS dt
              FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node),
        tri AS (SELECT COUNT(*) AS n_tri
                FROM o o1 JOIN o o2
                     ON o1.s = o2.s AND (o1.dt, o1.t) < (o2.dt, o2.t)
                JOIN o o3 ON o3.s = o1.t AND o3.t = o2.t)
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
               CAST(n_tri AS BIGINT) AS n_triangles
        FROM tri
    """,
    doc="Exact triangle count over the part co-purchase graph (parts are "
    "adjacent when some order contains both). Degree-ordered orientation "
    "+ edge-iterator intersection: orient every undirected edge from its "
    "lower-(degree, id) endpoint to the higher one, build each node's "
    "out-adjacency array, and per oriented edge (s, t) count "
    "|N+(s) ∩ N+(t)| — each triangle closes exactly once at its "
    "lowest-ranked vertex. Scale: orientation bounds every out-degree by "
    "O(sqrt(|E|)) regardless of raw skew (a celebrity node of degree 1e6 "
    "fans IN, not out); the adjacency build shuffles O(|E|) ints and the "
    "intersection joins ship O(|E|) array rows — the O(|E|^1.5) wedge "
    "set is never materialized as rows (round 13: the wedge self-join "
    "emitted 41M rows at sf0.1 and dominated the query at 45 CPU-s; the "
    "array-intersect form is the same count at 17 CPU-s), all equi-joins "
    "on vertex ids; adjacency arrays stay distributed, never collected.",
    tags=("graph",),
)
def q_graph_triangles(spark: SparkSession, sf: str) -> DataFrame:
    li = (
        tables(spark, sf)["lineitem"]
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    return copurchase_triangles(li)


def copurchase_triangles(li: DataFrame) -> DataFrame:
    """Triangle count of the co-occurrence graph of ``li(o, p)``.

    Nodes are ``p`` values; an undirected edge joins two ``p``s that share
    an ``o``. Property-tested against a brute-force Python count on random
    graphs (tests/test_property.py) — each graph edge (u, v) encodes as
    its own 2-item basket, so the co-occurrence graph IS the input graph.

    NOT build-lazy (ADVICE r13, documented contract): constructing this
    DataFrame runs eager jobs (edge-list and adjacency materialization)
    and registers persisted relations for per-query cleanup — callers
    that only want the schema/plan should not build it, and long-lived
    sessions must run ``run_query_cleanups()`` after consuming it (the
    bench and the serving layer both do).
    """
    from pyspark.storagelevel import StorageLevel

    # The edge list is referenced by deg, the orientation join AND the edge
    # count; the oriented list by the adjacency build AND the close join.
    # Without a persist each reference re-plans (and, under racing AQE stage
    # futures, re-executes) the whole front end — round 13 measured the
    # unpersisted form at 45 executor-CPU-s vs 33 with both relations
    # persisted (interleaved medians, same session), and the explain tree
    # shrinks from ~190 repeated Exchanges to the persisted spine. Both
    # relations are |E| rows of two longs (edge lists, NOT corpus payloads);
    # eager count() materializes once before any consumer future races.
    #
    # Round 14 (guide §2.4 "remove shuffles outright"): pairs come from ONE
    # pass — group the (o, p) list per order into a sorted distinct part
    # array and emit each C(k,2) combination map-side — instead of the
    # o-keyed self-join. That replaces {2x scan, (o,p)-distinct exchange,
    # 2x o-exchange + join} with {1x scan, o-exchange with map-side
    # collect_set}; the per-order pair explosion lands in the SAME task
    # the self-join would have routed it to (both colocate an order's
    # rows), so the skew posture at scale is unchanged. sort_array makes
    # x < y structural, so the u < v filter is free.
    baskets = li.groupBy("o").agg(F.sort_array(F.collect_set("p")).alias("ps"))
    pair_structs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    # Pair dedup lands at COMPUTE width (round 14 late, guide §2.4/§2.6):
    # an explicit repartition on the dedup keys followed by dropDuplicates
    # is ONE exchange (the aggregate reuses the repartition's partitioning)
    # — exactly what .distinct() cost — but leaves the cached edge list
    # cores-wide instead of at the session's reduce width, so every
    # downstream stage that maps over the e cache (degree legs, the
    # orientation join, the close) inherits full parallelism and the
    # separate rebalance exchange on the oriented list disappears. Width
    # policy mirrors rebalance_for_compute: cores under local masters,
    # defaultParallelism on a cluster.
    sc = li.sparkSession.sparkContext
    max_width = 32 if sc.master.startswith("local") else sc.defaultParallelism
    shuffle_width = int(
        li.sparkSession.conf.get("spark.sql.shuffle.partitions", "8")
    )
    width = min(max(shuffle_width, sc.defaultParallelism), max_width)
    e = register_query_cleanup(
        baskets.select(F.explode(pair_structs).alias("uv"))
        .select(F.col("uv.u").alias("u"), F.col("uv.v").alias("v"))
        .repartition(width, F.col("u"), F.col("v"))
        .dropDuplicates(["u", "v"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    # The oriented list is consumed EXACTLY ONCE — by the adjacency build
    # below — so it is neither persisted nor rebalanced (round 14 late; it
    # held a persist + its own rebalance exchange when the close also read
    # it as an edge stream). The orientation join therefore runs once at
    # any scale, and its output width rides the e cache via the broadcast
    # degree joins.
    o = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    # Edge-iterator close: per oriented edge (s, t), triangles through it
    # are |N+(s) ∩ N+(t)|. collect_list order is nondeterministic but
    # array_intersect size is order-free, so the count is stable. The
    # adjacency side is |nodes| rows / |E| total ints — orders of
    # magnitude below the wedge-row set the former self-join emitted.
    # Persisted (round 14): adj feeds the exploded edge stream AND the
    # t-side build below, so without the pin the collect_list aggregation
    # executed twice (two ~0.9-3 CPU-s stages with identical 6.9 MB
    # shuffle reads in the stage metrics).
    adj = register_query_cleanup(
        o.groupBy("s")
        .agg(F.collect_list("t").alias("nb"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj.count()
    # The close derives the oriented edge stream from adj ITSELF (round 14
    # late): exploding nb yields every (s, t) with nb_s already in hand —
    # one cache scan and one join instead of an o-cache stream with two
    # adjacency joins (A/B at sf0.1: 27 -> 21 jobs, min wall 3.3 -> 2.5 s
    # with the width change above; n_triangles identical). The per-row
    # nb_s copy the explode carries is the same wedge payload the former
    # o⋈adj_s join output carried — nothing new is materialized.
    edges_with_nbs = adj.select(
        F.col("s"), F.col("nb").alias("nb_s"), F.explode("nb").alias("t")
    )
    adj_t = adj.select(F.col("s").alias("t"), F.col("nb").alias("nb_t"))
    tri = (
        edges_with_nbs.join(adj_t, "t")
        .select(F.size(F.array_intersect("nb_s", "nb_t")).alias("c"))
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_triangles"))
    )
    counts = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes")).crossJoin(
        e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    )
    # three scalar aggregates -> one 1-row result (broadcast spine join)
    return counts.crossJoin(F.broadcast(tri)).select(
        "n_nodes", "n_edges", "n_triangles"
    )


# ---------------------------------------------------------------------------
# Market-basket association rules (support / confidence / lift)
# ---------------------------------------------------------------------------


@query(
    "basket_rules",
    oracle="""
        WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM li),
        ic AS (SELECT p, COUNT(*) AS c FROM li GROUP BY p),
        pc AS (SELECT a.p AS x, b.p AS y, COUNT(*) AS cxy
               FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p GROUP BY 1, 2)
        SELECT pc.x AS antecedent, pc.y AS consequent,
               CAST(pc.cxy AS BIGINT) AS support_orders,
               CAST(1000000 * pc.cxy // cx.c AS BIGINT) AS confidence_ppm,
               CAST((CAST(1000000 AS HUGEINT) * pc.cxy * n.n_orders)
                    // (CAST(cx.c AS HUGEINT) * cy.c) AS BIGINT) AS lift_ppm
        FROM pc JOIN ic cx ON pc.x = cx.p JOIN ic cy ON pc.y = cy.p CROSS JOIN n
        WHERE pc.cxy >= 3
        ORDER BY lift_ppm DESC, antecedent, consequent LIMIT 20
    """,
    doc="Pairwise association rules x -> y over order baskets: support = "
    "co-occurring orders, confidence = P(y|x), lift = P(xy)/(P(x)P(y)); "
    "top 20 rules by lift at min-support 3. Metrics are exact integer ppm "
    "(DECIMAL(38,0)/HUGEINT intermediates — the 1e6*cxy*N product exceeds "
    "int64), so both engines hash-match without any float division. "
    "Scale: the Apriori candidate explosion is avoided by going straight "
    "to pairs per basket — a self equi-join on the order key whose fan-out "
    "is bounded by basket size squared (TPC-H baskets <= 7 items), then "
    "one partial-aggregated (x, y) count; the item-count table joins by "
    "item key (vocabulary-sized, AQE broadcasts it) and the order count "
    "is a 1-row broadcast spine. Rule ranking collapses to "
    "TakeOrderedAndProject.",
    tags=("mining", "agg"),
)
def q_basket_rules(spark: SparkSession, sf: str) -> DataFrame:
    li = (
        tables(spark, sf)["lineitem"]
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    n = li.agg(F.countDistinct("o").cast("bigint").alias("n_orders"))
    ic = li.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    a, b = li.alias("a"), li.alias("b")
    pc = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") != F.col("b.p")))
        .groupBy(F.col("a.p").alias("x"), F.col("b.p").alias("y"))
        .agg(F.count(F.lit(1)).alias("cxy"))
        .filter(F.col("cxy") >= 3)
    )
    cx = ic.select(F.col("p").alias("x"), F.col("c").alias("cx"))
    cy = ic.select(F.col("p").alias("y"), F.col("c").alias("cy"))
    return (
        pc.join(cx, "x")
        .join(cy, "y")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("x").alias("antecedent"),
            F.col("y").alias("consequent"),
            F.col("cxy").cast("bigint").alias("support_orders"),
            F.expr("CAST(1000000 * cxy DIV cx AS BIGINT)").alias("confidence_ppm"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * cxy * n_orders)"
                " DIV (CAST(cx AS DECIMAL(38,0)) * cy) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.col("lift_ppm").desc(), "antecedent", "consequent")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Collocation mining (PMI-ordered bigram lift)
# ---------------------------------------------------------------------------


@query(
    "text_pmi",
    oracle="""
        WITH w AS (SELECT list_filter(string_split(lower(text), ' '),
                                      x -> x <> '') AS a
                   FROM documents),
        tok AS (SELECT unnest(a) AS word FROM w),
        uni AS (SELECT word, COUNT(*) AS c FROM tok GROUP BY word),
        n1 AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
        big AS (SELECT unnest(list_transform(range(1, len(a)),
                    i -> {'w1': a[i], 'w2': a[i + 1]})) AS s
                FROM w WHERE len(a) >= 2),
        bc AS (SELECT s.w1 AS w1, s.w2 AS w2, COUNT(*) AS cxy
               FROM big GROUP BY 1, 2),
        n2 AS (SELECT CAST(SUM(cxy) AS BIGINT) AS n FROM bc)
        SELECT bc.w1, bc.w2, CAST(bc.cxy AS BIGINT) AS c_pair,
               CAST((CAST(1000000 AS HUGEINT) * bc.cxy * n1.n * n1.n)
                    // (CAST(n2.n AS HUGEINT) * u1.c * u2.c) AS BIGINT) AS lift_ppm
        FROM bc JOIN uni u1 ON bc.w1 = u1.word JOIN uni u2 ON bc.w2 = u2.word
        CROSS JOIN n1 CROSS JOIN n2
        WHERE bc.cxy >= 5
        ORDER BY lift_ppm DESC, w1, w2 LIMIT 20
    """,
    doc="Collocation mining: top-20 adjacent-bigram collocations ranked by "
    "lift = p(xy)/(p(x)p(y)). PMI is log(lift), and log is monotone, so "
    "ranking by the exact rational lift gives the PMI order with zero "
    "libm — lift_ppm = 1e6*cxy*N1^2 DIV (N2*cx*cy) in DECIMAL(38,0)/"
    "HUGEINT (N1^2 exceeds int64). Min pair count 5 applies the standard "
    "sparse-PMI guard. Scale: bigrams come from one pass over the token "
    "arrays (no token-stream self-join); both count tables are "
    "vocabulary-sized and partial-aggregate map-side; the two unigram "
    "joins key on the word (AQE broadcasts them) and the corpus totals "
    "are 1-row broadcast spines. Top-20 is TakeOrderedAndProject.",
    tags=("text", "mining"),
)
def q_text_pmi(spark: SparkSession, sf: str) -> DataFrame:
    d = rebalance_for_compute(tables(spark, sf)["documents"], "doc_id")
    w = d.select(
        F.expr("filter(split(lower(text), ' '), x -> x != '')").alias("a")
    )
    tok = w.select(F.explode("a").alias("word"))
    uni = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    n1 = uni.agg(F.sum("c").cast("bigint").alias("n1"))
    bc = (
        w.filter(F.size("a") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(a) - 1),"
                    " i -> struct(element_at(a, i) AS w1,"
                    "             element_at(a, i + 1) AS w2))"
                )
            ).alias("s")
        )
        .groupBy(F.col("s.w1").alias("w1"), F.col("s.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("cxy"))
        .filter(F.col("cxy") >= 5)
    )
    # n2 is the total over ALL bigrams (the oracle thresholds only in the
    # final WHERE), so it comes from the unthresholded stream.
    bc_all = (
        w.filter(F.size("a") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(a) - 1),"
                    " i -> struct(element_at(a, i) AS w1,"
                    "             element_at(a, i + 1) AS w2))"
                )
            ).alias("s")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    )
    u1 = uni.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    return (
        bc.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(bc_all))
        .select(
            "w1",
            "w2",
            F.col("cxy").cast("bigint").alias("c_pair"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * cxy * n1 * n1)"
                " DIV (CAST(n2 AS DECIMAL(38,0)) * c1 * c2) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.col("lift_ppm").desc(), "w1", "w2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# First-occurrence novelty attribution
# ---------------------------------------------------------------------------


@query(
    "text_novelty",
    oracle="""
        WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                              x -> x <> '') AS a
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      md5(unnest(list_transform(range(1, len(a) - 1),
                          i -> array_to_string(a[i:i+2], ' ')))) AS sid
               FROM w WHERE len(a) >= 3),
        fo AS (SELECT sid, MIN(doc_id) AS first_doc FROM sh GROUP BY sid)
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_shingles,
               CAST(SUM(CASE WHEN fo.first_doc = s.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               CAST((1000000 * SUM(CASE WHEN fo.first_doc = s.doc_id
                                        THEN 1 ELSE 0 END))
                    // COUNT(*) AS BIGINT) AS novel_ppm
        FROM sh s JOIN fo ON s.sid = fo.sid
        GROUP BY s.doc_id
    """,
    doc="First-occurrence novelty score: every 3-word shingle is attributed "
    "to the lowest doc_id containing it (ingestion order at 100 TB); a "
    "document's novelty is the exact-ppm fraction of its distinct "
    "shingles it introduced. The complement of dedup_substring's "
    "duplication signal — crawls re-fetching boilerplate score near 0 and "
    "get dropped before tokenization. Scale: same single-lineage shape as "
    "dedup_substring — explode+md5 once, distinct (doc_id, sid) pairs via "
    "partial aggregation, MIN(doc_id) as a (sid)-partitioned window (no "
    "self-join), one doc_id aggregation; only 128-bit fingerprints "
    "shuffle, never shingle text.",
    tags=("text", "dedup"),
)
def q_text_novelty(spark: SparkSession, sf: str) -> DataFrame:
    d = rebalance_for_compute(tables(spark, sf)["documents"], "doc_id")
    sh = (
        d.select(
            "doc_id",
            F.expr("filter(split(lower(text), ' '), x -> x != '')").alias("a"),
        )
        .filter(F.size("a") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(a) - 2),"
                    "          i -> md5(concat_ws(' ', slice(a, i, 3))))"
                )
            ).alias("sid"),
        )
        .distinct()
    )
    first_doc = F.min("doc_id").over(W.partitionBy("sid"))
    return (
        sh.withColumn("first_doc", first_doc)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_shingles"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_distinct_shingles",
            "n_novel",
            F.expr(
                "CAST((1000000 * n_novel) DIV n_distinct_shingles AS BIGINT)"
            ).alias("novel_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Binary (1-bit) quantized ANN: Hamming candidates + exact re-rank
# ---------------------------------------------------------------------------

_COS6 = (
    "ROUND(CASE WHEN sqrt(list_dot_product({a},{a})) > 0 "
    "AND sqrt(list_dot_product({b},{b})) > 0 "
    "THEN list_dot_product({a},{b}) / "
    "(sqrt(list_dot_product({a},{a})) * sqrt(list_dot_product({b},{b}))) "
    "ELSE 0.0 END, 6)"
)

#: 32 sign bits per packed word (bit 63 would overflow DuckDB's checked
#: shift, and 2x32 keeps every intermediate positive on both engines).
_PACK32 = (
    "aggregate(sequence(0, 31), CAST(0 AS BIGINT),"
    " (acc, b) -> acc + IF(element_at({v}, b + {off}) > CAST(0 AS DOUBLE),"
    "                      shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))"
)


@query(
    "embed_binary_hamming",
    oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        sig AS (SELECT vec_id, v,
                   list_sum(list_transform(range(0, 32),
                       b -> CASE WHEN v[b + 1] > 0 THEN (1::BIGINT << b)
                                 ELSE 0::BIGINT END)) AS w0,
                   list_sum(list_transform(range(0, 32),
                       b -> CASE WHEN v[b + 33] > 0 THEN (1::BIGINT << b)
                                 ELSE 0::BIGINT END)) AS w1
                FROM e),
        q AS (SELECT vec_id AS qid, v AS qv, w0 AS qw0, w1 AS qw1
              FROM sig WHERE vec_id < 8),
        cand AS (SELECT q.qid, q.qv, s.vec_id AS cid, s.v AS cv,
                        bit_count(xor(q.qw0, s.w0))
                        + bit_count(xor(q.qw1, s.w1)) AS ham
                 FROM q JOIN sig s ON s.vec_id <> q.qid),
        top AS (SELECT * FROM (SELECT *, row_number() OVER
                    (PARTITION BY qid ORDER BY ham, cid) AS hr FROM cand)
                WHERE hr <= 50),
        rer AS (SELECT qid, cid, ham,
                       {_COS6.format(a="qv", b="cv")} AS cos6
                FROM top)
        SELECT qid AS query_id, CAST(r AS BIGINT) AS rank, cid AS neighbor_id,
               CAST(ham AS BIGINT) AS hamming, cos6 AS sim
        FROM (SELECT *, row_number() OVER
                  (PARTITION BY qid ORDER BY cos6 DESC, cid) AS r FROM rer)
        WHERE r <= 10
    """,
    doc="Binary-quantized ANN (the 1-bit leg of the quantization triad next "
    "to embed_quantize int8 and sim_topk_pq): sign-bit signatures packed "
    "into two 32-bit words, candidates = top-50 by exact Hamming distance "
    "(integer xor+popcount — deterministic, tie-broken on neighbor id), "
    "then exact cosine re-rank to top-10 with the round-6 idiom. 64x "
    "memory compression makes the candidate scan cache-resident at "
    "100 TB corpus scale. Scale: 8 broadcast probes stream past the "
    "corpus map-side (signature build is row-local; no corpus self-join); "
    "only |Q| x 50 candidate rows ever shuffle into the re-rank window.",
    tags=("similarity", "quantize"),
)
def q_embed_binary_hamming(spark: SparkSession, sf: str) -> DataFrame:
    e = tables(spark, sf)["embeddings"].select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    sig = e.select(
        "vec_id",
        "v",
        F.expr(_PACK32.format(v="v", off=1)).alias("w0"),
        F.expr(_PACK32.format(v="v", off=33)).alias("w1"),
    )
    q = sig.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    cand = (
        sig.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qv",
            F.col("vec_id").alias("cid"),
            F.col("v").alias("cv"),
            (
                F.bit_count(F.expr("qw0 ^ w0")) + F.bit_count(F.expr("qw1 ^ w1"))
            ).alias("ham"),
        )
    )
    top = (
        cand.withColumn(
            "hr",
            F.row_number().over(W.partitionBy("qid").orderBy("ham", "cid")),
        )
        .filter(F.col("hr") <= 50)
        .select(
            "qid",
            "cid",
            "ham",
            round_cosine(F.col("qv"), F.col("cv")).alias("cos6"),
        )
    )
    return (
        top.withColumn(
            "r",
            F.row_number().over(W.partitionBy("qid").orderBy(F.desc("cos6"), "cid")),
        )
        .filter(F.col("r") <= 10)
        .select(
            F.col("qid").alias("query_id"),
            F.col("r").cast("bigint").alias("rank"),
            F.col("cid").alias("neighbor_id"),
            F.col("ham").cast("bigint").alias("hamming"),
            F.col("cos6").alias("sim"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch with exact overestimate audit
# ---------------------------------------------------------------------------


@query(
    "agg_count_min",
    oracle="""
        WITH tok AS (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                               x -> x <> '')) AS word
                     FROM documents),
        tc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS exact_c
               FROM tok GROUP BY word),
        probe AS (SELECT word, exact_c, r,
                      ('0x' || substring(md5(word || '#'
                                             || CAST(r AS VARCHAR)), 1, 12))
                          ::BIGINT % 32 AS b
                  FROM tc CROSS JOIN (SELECT unnest(range(0, 4)) AS r)),
        cells AS (SELECT r, b, SUM(exact_c) AS cell FROM probe GROUP BY r, b),
        est AS (SELECT p.word, p.exact_c, MIN(c.cell) AS est_c
                FROM probe p JOIN cells c ON p.r = c.r AND p.b = c.b
                GROUP BY p.word, p.exact_c)
        SELECT word, exact_c, CAST(est_c AS BIGINT) AS est_c,
               CAST((1000000 * (est_c - exact_c)) // exact_c AS BIGINT)
                   AS over_ppm
        FROM est ORDER BY exact_c DESC, word LIMIT 30
    """,
    doc="Count-Min sketch frequency estimation with an exact audit: d=4 "
    "hash rows x w=32 counters (width deliberately tiny at test scale so "
    "collisions actually exercise the overestimate path), md5-bucket "
    "derandomized hashing, est = min over rows of the probed cell. The "
    "one-sided CM guarantee est >= exact holds by construction and the "
    "audit emits the exact overestimate in ppm per word (top-30 by true "
    "frequency). Scale: the sketch IS the aggregation state — the token "
    "stream partial-aggregates map-side onto d*w cells (128 longs) that "
    "merge associatively across partitions, streams, and days, the "
    "defining property continuous-aggregate rollups need; estimates are "
    "a broadcast join of the tiny cell table.",
    tags=("agg", "sketch", "approx"),
)
def q_agg_count_min(spark: SparkSession, sf: str) -> DataFrame:
    from datafusion_flight_sql_server_spark.operators.sketches import (
        count_min_cells,
        count_min_estimate,
    )

    d = tables(spark, sf)["documents"]
    tok = d.select(
        F.explode(F.expr("filter(split(lower(text), ' '), x -> x != '')")).alias(
            "word"
        )
    )
    # sketch build: token stream -> (r, bucket) cells, mergeable map-side
    cells = count_min_cells(tok, "word", depth=4, width=32)
    tc = tok.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("exact_c"))
    return (
        count_min_estimate(cells, tc, "word", depth=4, width=32)
        .select(
            "word",
            "exact_c",
            F.col("est_c").cast("bigint").alias("est_c"),
            F.expr(
                "CAST((1000000 * (est_c - exact_c)) DIV exact_c AS BIGINT)"
            ).alias("over_ppm"),
        )
        .orderBy(F.desc("exact_c"), "word")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Bloom-filter pre-pruned join
# ---------------------------------------------------------------------------


@query(
    "join_bloom_prune",
    oracle="""
        SELECT s.s_suppkey, s.s_name,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                        (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_7'
        GROUP BY s.s_suppkey, s.s_name
    """,
    doc="Revenue by supplier for one nation, computed through an explicit "
    "Bloom-filter pre-prune: the dimension side's keys hash into k=3 "
    "positions of an m=8192-bit filter (md5-bucket derandomized; the "
    "filter materializes as a distinct-position table, broadcast); fact "
    "keys keep only rows whose 3 positions are all set, then the exact "
    "equi-join removes Bloom false positives — so the result equals the "
    "plain join (the oracle) by construction, which is precisely the "
    "contract that makes Bloom pruning safe: no false negatives, false "
    "positives caught by the verifying join. Revenue uses the exact "
    "DECIMAL discipline. Scale: this is the cross-stage runtime filter "
    "Catalyst's own bloom injection cannot place when the probe side "
    "passes through a Python/opaque stage — the filter table is O(k*|dim "
    "keys|) and broadcast, pruning the 100 TB fact scan to matching rows "
    "BEFORE any shuffle; the verifying join then shuffles only survivors.",
    tags=("join", "scale"),
)
def q_join_bloom_prune(spark: SparkSession, sf: str) -> DataFrame:
    t = tables(spark, sf)
    dim = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    ks = F.explode(F.sequence(F.lit(0), F.lit(2))).alias("i")
    bits = (
        dim.select(F.col("s_suppkey").cast("string").alias("k"), ks)
        .select(
            _md5_bucket(
                F.concat(F.col("k"), F.lit("#"), F.col("i").cast("string")), "", 8192
            ).alias("pos")
        )
        .distinct()
    )
    l = t["lineitem"]
    probe_keys = (
        l.select(F.col("l_suppkey").alias("pk"))
        .distinct()
        .select(F.col("pk"), ks)
        .select(
            "pk",
            _md5_bucket(
                F.concat(
                    F.col("pk").cast("string"), F.lit("#"), F.col("i").cast("string")
                ),
                "",
                8192,
            ).alias("pos"),
        )
    )
    candidates = (
        probe_keys.join(F.broadcast(bits), "pos")
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("nset"))
        .filter(F.col("nset") == 3)
        .select("pk")
    )
    pruned = l.join(
        F.broadcast(candidates), l.l_suppkey == F.col("pk"), "left_semi"
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        pruned.join(dim, pruned.l_suppkey == dim.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash estimation-accuracy audit
# ---------------------------------------------------------------------------


def _minhash_eval_oracle(n_perms: int = 16, n_bands: int = 8) -> str:
    """DuckDB twin of q_dedup_minhash_eval — same md5-derived permutation
    constants and banding as operators.dedup.minhash_near_dups / the
    dedup_near_minhash oracle, with the signature-agreement estimate
    reported next to the exact Jaccard instead of a threshold filter."""
    from datafusion_flight_sql_server_spark.operators.dedup import (
        MINHASH_P,
        minhash_params,
    )

    rows = n_perms // n_bands
    params = minhash_params(n_perms)
    mh = ",\n                   ".join(
        f"list_min(list_transform(h, x -> ({a} * (x % {MINHASH_P}) + {b})"
        f" % {MINHASH_P})) AS mh{i}"
        for i, (a, b) in enumerate(params)
    )
    band_selects = "\n              UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, md5(concat_ws('-', "
        + ", ".join(f"mh{bi * rows + r}" for r in range(rows))
        + ")) AS key FROM sig"
        for bi in range(n_bands)
    )
    matches = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
        for i in range(n_perms)
    )
    return f"""
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
        sig AS (SELECT doc_id,
                   {mh}
                FROM hashed),
        buck AS ({band_selects}),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM buck a JOIN buck b
                   ON a.band = b.band AND a.key = b.key
                  AND a.doc_id < b.doc_id),
        scored AS (SELECT doc_a, doc_b,
                          ({matches}) AS n_match,
                          len(list_intersect(ha.h, hb.h)) AS n_inter,
                          len(list_distinct(ha.h || hb.h)) AS n_union
                   FROM cand
                   JOIN sig sa ON sa.doc_id = doc_a
                   JOIN sig sb ON sb.doc_id = doc_b
                   JOIN hashed ha ON ha.doc_id = doc_a
                   JOIN hashed hb ON hb.doc_id = doc_b)
        SELECT doc_a, doc_b,
               CAST((1000000 * n_match) // {n_perms} AS BIGINT) AS est_ppm,
               CAST((1000000 * n_inter) // n_union AS BIGINT) AS exact_ppm,
               CAST((1000000 * n_match) // {n_perms}
                    - (1000000 * n_inter) // n_union AS BIGINT) AS err_ppm
        FROM scored
    """


@query(
    "dedup_minhash_eval",
    oracle=_minhash_eval_oracle(),
    doc="MinHash estimation-accuracy audit over the LSH candidate pairs: "
    "for every banding candidate, the signature-agreement Jaccard "
    "estimate (matching components / 16, exact-ppm) next to the true "
    "Jaccard of the hashed shingle sets and the signed error — the "
    "calibration report that justifies trusting the sketch at corpus "
    "scale, where exact verification is sampled rather than exhaustive. "
    "Identical md5-derived permutation constants and banding as "
    "dedup_near_minhash, so the audit measures the production sketch, "
    "not a replica. Scale: same single data-sized shuffle as the dedup "
    "(the hash-partitioned band join); signatures are 16 ints per doc "
    "and the exact sets join only for candidate pairs.",
    tags=("dedup", "similarity", "sketch"),
)
def q_dedup_minhash_eval(spark: SparkSession, sf: str) -> DataFrame:
    # Round 6: consume the SHARED persisted MinHash front end
    # (operators/dedup.py) instead of re-deriving signatures inline — the
    # shingling pass previously recomputed 3x within this query (bucket,
    # sa, sb lineages) and once more per consumer query in a sweep.
    # Identical md5 constants/expressions, so results are bit-unchanged.
    from datafusion_flight_sql_server_spark.operators.dedup import (
        _minhash_hashed_buckets,
    )

    n_perms = 16
    d = tables(spark, sf)["documents"]
    _hashed, sig, bucket = _minhash_hashed_buckets(
        d, "doc_id", "text", 3, n_perms, 8, 42, cache_key=(sf, "documents")
    )
    a = bucket.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = bucket.select(F.col("doc_id").alias("doc_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("h").alias("ha"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(n_perms)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("h").alias("hb"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(n_perms)],
    )
    n_match = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(n_perms)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_match.alias("n_match"),
            # intersect evaluated ONCE (ADVICE r13): |union| derives from
            # it arithmetically in the next projection — sets are distinct
            # at build, and CollapseProject keeps a non-cheap expression
            # out of multiple references
            F.size(F.array_intersect("ha", "hb")).alias("n_inter"),
            (F.size("ha") + F.size("hb")).alias("n_ab"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_match",
            "n_inter",
            (F.col("n_ab") - F.col("n_inter")).alias("n_union"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr(f"CAST((1000000 * n_match) DIV {n_perms} AS BIGINT)").alias(
                "est_ppm"
            ),
            F.expr("CAST((1000000 * n_inter) DIV n_union AS BIGINT)").alias(
                "exact_ppm"
            ),
            F.expr(
                f"CAST((1000000 * n_match) DIV {n_perms}"
                " - (1000000 * n_inter) DIV n_union AS BIGINT)"
            ).alias("err_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram conditional language model score
# ---------------------------------------------------------------------------


@query(
    "text_bigram_lm",
    oracle="""
        WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                              x -> x <> '') AS a
                   FROM documents),
        big AS (SELECT doc_id,
                       unnest(list_transform(range(1, len(a)),
                           i -> {'w1': a[i], 'w2': a[i + 1]})) AS s
                FROM w WHERE len(a) >= 2),
        pairs AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2, COUNT(*) AS k
                  FROM big GROUP BY 1, 2, 3),
        bc AS (SELECT w1, w2, SUM(k) AS cxy FROM pairs GROUP BY 1, 2),
        hc AS (SELECT w1, SUM(k) AS c1 FROM pairs GROUP BY 1),
        voc AS (SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v FROM pairs)
        SELECT p.doc_id,
               CAST(SUM(p.k) AS BIGINT) AS n_bigrams,
               CAST(SUM(p.k * ((1000000 * (bc.cxy + 1)) // (hc.c1 + voc.v)))
                    // SUM(p.k) AS BIGINT) AS lm2_score_ppm
        FROM pairs p
        JOIN bc ON p.w1 = bc.w1 AND p.w2 = bc.w2
        JOIN hc ON p.w1 = hc.w1
        CROSS JOIN voc
        GROUP BY p.doc_id
    """,
    doc="Bigram conditional language-model score (the KenLM-class upgrade "
    "of text_lm_unigram): per document, the mean add-one-smoothed "
    "conditional probability p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / "
    "(c_hist(w_{i-1}) + V), with each term floored to exact ppm before "
    "the mean so both engines agree bit-for-bit (no rational-sum "
    "denominators, no libm). History counts come from the same bigram "
    "stream (c_hist = times the word appears as a predecessor, the "
    "normalization that makes each history's probabilities sum to 1). "
    "Fluent text that repeats corpus patterns scores high; shuffled or "
    "machine-garbled text scores near the smoothing floor — the "
    "conditional signal unigram scoring cannot see. Scale: ONE explode "
    "pass partial-aggregates to distinct (doc, w1, w2) triples; corpus "
    "bigram and history counts are two aggregations of those triples "
    "joined back by key (vocabulary-sized, AQE broadcasts), and the "
    "vocabulary size is a 1-row broadcast spine.",
    tags=("text", "quality", "lm"),
)
def q_text_bigram_lm(spark: SparkSession, sf: str) -> DataFrame:
    d = rebalance_for_compute(tables(spark, sf)["documents"], "doc_id")
    pairs = (
        d.select(
            "doc_id",
            F.expr("filter(split(lower(text), ' '), x -> x != '')").alias("a"),
        )
        .filter(F.size("a") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(a) - 1),"
                    " i -> struct(element_at(a, i) AS w1,"
                    "             element_at(a, i + 1) AS w2))"
                )
            ).alias("s"),
        )
        .groupBy("doc_id", F.col("s.w1").alias("w1"), F.col("s.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("k"))
    )
    # corpus counts as WINDOWS over the distinct triples (not joins of
    # re-derived aggregates) — the dedup_substring/text_lm_unigram
    # restructure lesson. The triples are persisted (narrow: two words +
    # two ints, no text) because the vocabulary branch is a second
    # consumer and Catalyst's column pruning defeats exchange reuse —
    # without the persist the corpus would tokenize twice (same
    # rationale as minhash_near_dups' persist).
    from pyspark import StorageLevel

    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    register_query_cleanup(pairs)
    st = pairs.withColumn(
        "cxy", F.sum("k").over(W.partitionBy("w1", "w2"))
    ).withColumn("c1", F.sum("k").over(W.partitionBy("w1")))
    voc = (
        st.groupBy("w2")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    )
    return (
        st.crossJoin(F.broadcast(voc))
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            F.expr(
                "CAST(SUM(k * ((1000000 * (cxy + 1)) DIV (c1 + v)))"
                " DIV SUM(k) AS BIGINT)"
            ).alias("lm2_score_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Sliding-window distinct count via sketch union
# ---------------------------------------------------------------------------


@query(
    "event_sliding_distinct",
    oracle="""
        WITH pairs AS (SELECT DISTINCT
                           CAST(date_trunc('day', ts) AS DATE) AS day,
                           user_id
                       FROM events),
        days AS (SELECT DISTINCT day FROM pairs),
        contrib AS (SELECT p.user_id, p.day + CAST(o.off AS INT) AS target
                    FROM pairs p CROSS JOIN
                         (SELECT unnest(range(0, 7)) AS off) o),
        win AS (SELECT c.target AS day, COUNT(DISTINCT c.user_id) AS exact_u
                FROM contrib c JOIN days d ON c.target = d.day
                GROUP BY c.target)
        SELECT CAST(day AS VARCHAR) AS day,
               CAST(exact_u AS BIGINT) AS exact_users_7d,
               TRUE AS within_bound
        FROM win
    """,
    doc="Trailing-7-day distinct users per day via mergeable HLL sketch "
    "union — the sliding-window distinct a timeseries store answers from "
    "per-day sketches instead of re-counting raw events: each day's "
    "hll_sketch_agg contributes to 7 target days (the explode-offsets "
    "decomposition of the sliding window), and the per-target union is "
    "one hll_union_agg. Estimates are engine-specific, so the checkable "
    "contract (like agg_hll_rollup) is the error bound |est - exact| <= "
    "max(5, 5% of exact), exact computed as the verification twin. "
    "Scale: raw events collapse to per-day sketches (KBs) ONCE; the "
    "sliding union shuffles 7 sketch rows per day instead of 7 days of "
    "raw events per window — re-counting a 90-day window at 100 TB is a "
    "full-corpus shuffle, the sketch form is a few MBs.",
    tags=("events", "agg", "approx", "sketch"),
)
def q_event_sliding_distinct(spark: SparkSession, sf: str) -> DataFrame:
    ev = tables(spark, sf)["events"]
    off = F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    days = daily.select("day").distinct()
    est = (
        daily.select("sk", off, F.date_add(F.col("day"), F.col("off")).alias("target"))
        .join(days.select(F.col("day").alias("target")), "target")
        .groupBy("target")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    pairs = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    ).distinct()
    exact = (
        pairs.select("user_id", off, F.date_add(F.col("day"), F.col("off")).alias("target"))
        .join(days.select(F.col("day").alias("target")), "target")
        .groupBy("target")
        .agg(F.count_distinct("user_id").cast("bigint").alias("exact_users_7d"))
    )
    return (
        est.join(exact, "target")
        .select(
            F.col("target").cast("string").alias("day"),
            "exact_users_7d",
            (
                F.abs(F.col("est") - F.col("exact_users_7d"))
                <= F.greatest(F.lit(5.0), F.col("exact_users_7d") * 0.05)
            ).alias("within_bound"),
        )
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------


@query(
    "orders_rfm",
    oracle="""
        WITH base AS (SELECT o_custkey,
                             MAX(o_orderdate) AS last_day,
                             COUNT(*) AS n_orders,
                             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
                      FROM orders GROUP BY o_custkey)
        SELECT o_custkey AS c_custkey,
               CAST(n_orders AS BIGINT) AS n_orders,
               CAST(monetary AS DOUBLE) AS monetary,
               CAST(ntile(5) OVER (ORDER BY last_day, o_custkey) AS BIGINT)
                   AS r_score,
               CAST(ntile(5) OVER (ORDER BY n_orders, o_custkey) AS BIGINT)
                   AS f_score,
               CAST(ntile(5) OVER (ORDER BY monetary, o_custkey) AS BIGINT)
                   AS m_score
        FROM base
    """,
    doc="RFM customer segmentation: per customer, recency (last order "
    "date), frequency (order count) and monetary (exact DECIMAL revenue "
    "sum) are each quintiled with ntile(5) under a deterministic total "
    "order (metric, custkey) — 5 = most recent / most frequent / highest "
    "spend. The classic marketing-analytics segmentation, exact and "
    "engine-portable: ntile's equal-fill semantics are SQL-standard and "
    "the tie-break pins every boundary. Scale note: ntile needs a global "
    "order — at 100 TB the quintile BOUNDARIES come from "
    "approx_percentile partial aggregation instead and scores become a "
    "row-local CASE; the exact global form here is the small-dimension "
    "(customer-table-sized, not fact-sized) variant.",
    tags=("window", "agg", "mining"),
)
def q_orders_rfm(spark: SparkSession, sf: str) -> DataFrame:
    o = tables(spark, sf)["orders"]
    base = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_orderdate").alias("last_day"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    return base.select(
        "c_custkey",
        "n_orders",
        F.col("monetary").cast("double").alias("monetary"),
        F.ntile(5)
        .over(W.orderBy("last_day", "c_custkey"))
        .cast("bigint")
        .alias("r_score"),
        F.ntile(5)
        .over(W.orderBy("n_orders", "c_custkey"))
        .cast("bigint")
        .alias("f_score"),
        F.ntile(5)
        .over(W.orderBy("monetary", "c_custkey"))
        .cast("bigint")
        .alias("m_score"),
    )


# ---------------------------------------------------------------------------
# Compression-ratio quality signal
# ---------------------------------------------------------------------------


@query(
    "text_compression_ratio",
    oracle=None,  # zlib is not expressible in the DuckDB oracle: the driver
    # records the rows-only check; determinism is still pinned by
    # tests/test_property.py-style repeat-run equality in the pytest suite.
    doc="DEFLATE compression-ratio quality signal (the RefinedWeb/FineWeb "
    "gate): ratio_ppm = 1e6 * len(zlib(text, level 6)) DIV len(text). "
    "Highly compressible documents are boilerplate/repetition (near-dup "
    "spans, template churn); incompressible ones are noise/binary "
    "garbage — both tails get dropped by curation gates. zlib level 6 is "
    "pinned and the stream is compressed per document, so the score is "
    "run- and partition-deterministic. Scale: mapInArrow (Arrow-batched, "
    "zero-copy in, one C-speed deflate per doc — the classic case where "
    "a Python boundary is unavoidable but batching keeps it off the row "
    "path); row-local, no shuffle, composes as a pushable gate like the "
    "other quality signals.",
    tags=("text", "quality", "nosql"),
)
def q_text_compression_ratio(spark: SparkSession, sf: str) -> DataFrame:
    import pyarrow as pa

    d = tables(spark, sf)["documents"].select("doc_id", "text")

    def _score(batches):
        import zlib

        for batch in batches:
            ids = batch.column("doc_id")
            texts = batch.column("text").to_pylist()
            raw, gz = [], []
            for t in texts:
                b = (t or "").encode("utf-8")
                raw.append(len(b))
                gz.append(len(zlib.compress(b, 6)))
            ratio = [
                (1_000_000 * g) // r if r else 0 for g, r in zip(gz, raw)
            ]
            yield pa.record_batch(
                {
                    "doc_id": ids,
                    "n_raw": pa.array(raw, type=pa.int64()),
                    "n_deflate": pa.array(gz, type=pa.int64()),
                    "ratio_ppm": pa.array(ratio, type=pa.int64()),
                }
            )

    return d.mapInArrow(
        _score, "doc_id long, n_raw long, n_deflate long, ratio_ppm long"
    )


# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov drift
# ---------------------------------------------------------------------------


@query(
    "event_ks_drift",
    oracle="""
        WITH types AS (SELECT DISTINCT event_type AS t FROM events),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM events),
        pern AS (SELECT event_type AS t, CAST(COUNT(*) AS BIGINT) AS n_t
                 FROM events GROUP BY 1),
        pairs AS (SELECT ty.t, e.value,
                         CASE WHEN e.event_type = ty.t THEN 1 ELSE 0 END AS in_a
                  FROM events e CROSS JOIN types ty),
        grp AS (SELECT t, value, SUM(in_a) AS a, COUNT(*) AS b
                FROM pairs GROUP BY t, value),
        cum AS (SELECT t, value,
                       SUM(a) OVER (PARTITION BY t ORDER BY value) AS ca,
                       SUM(b) OVER (PARTITION BY t ORDER BY value) AS cb
                FROM grp)
        SELECT c.t AS event_type, p.n_t,
               CAST(MAX(ABS((1000000 * c.ca) // p.n_t
                            - (1000000 * c.cb) // tot.n_all)) AS BIGINT)
                   AS ks_ppm
        FROM cum c JOIN pern p ON c.t = p.t CROSS JOIN tot
        GROUP BY c.t, p.n_t
    """,
    doc="Exact two-sample Kolmogorov-Smirnov drift per event type: the KS "
    "statistic sup|F_type - F_all| between each type's value distribution "
    "and the pooled corpus, in exact ppm — the numeric-column sibling of "
    "corpus_drift's token TV distance, and the standard "
    "feature/label-drift monitor in training pipelines. Both ECDFs "
    "evaluate at every distinct pooled value via cumulative-count "
    "windows, so the supremum is exact (right-continuous step functions "
    "attain it at sample points); all compared arithmetic is integer "
    "counts and DIV. Scale: the type-replicated compare stream is "
    "bounded by |types| x |events| with |types| small and fixed; the "
    "per-type ordering window is the sequential step — the documented "
    "100 TB variant evaluates both ECDFs on mergeable quantile-sketch "
    "(approx_percentile) grids instead, turning the global sort into "
    "partial aggregation at epsilon rank error.",
    tags=("events", "mining", "stats"),
)
def q_event_ks_drift(spark: SparkSession, sf: str) -> DataFrame:
    ev = tables(spark, sf)["events"]
    types = ev.select(F.col("event_type").alias("t")).distinct()
    tot = ev.agg(F.count(F.lit(1)).cast("bigint").alias("n_all"))
    pern = ev.groupBy(F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t")
    )
    pairs = ev.crossJoin(F.broadcast(types)).select(
        "t",
        "value",
        F.when(F.col("event_type") == F.col("t"), 1).otherwise(0).alias("in_a"),
    )
    grp = pairs.groupBy("t", "value").agg(
        F.sum("in_a").alias("a"), F.count(F.lit(1)).alias("b")
    )
    w = W.partitionBy("t").orderBy("value")
    cum = grp.select(
        "t",
        F.sum("a").over(w).alias("ca"),
        F.sum("b").over(w).alias("cb"),
    )
    return (
        cum.join(pern, "t")
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("t").alias("event_type"), "n_t")
        .agg(
            F.max(
                F.abs(
                    F.expr("(1000000 * ca) DIV n_t - (1000000 * cb) DIV n_all")
                )
            )
            .cast("bigint")
            .alias("ks_ppm")
        )
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection
# ---------------------------------------------------------------------------

# Identical ANSI text on both engines except the epoch-micros function name
# (Spark: unix_micros, DuckDB: epoch_us) and the 128-bit type keyword
# (Spark: DECIMAL(38,0), DuckDB: HUGEINT) — the event_time_weighted
# discipline.
_CUSUM_SQL = """
    WITH e AS (SELECT user_id, {us}(ts) AS tmic, event_id,
                      CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
                          AS vmic
               FROM events),
    w AS (SELECT user_id, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY tmic, event_id) AS i,
                 SUM(vmic) OVER (PARTITION BY user_id
                                 ORDER BY tmic, event_id) AS prefix,
                 COUNT(*) OVER (PARTITION BY user_id) AS n,
                 SUM(vmic) OVER (PARTITION BY user_id) AS total
          FROM e),
    sc AS (SELECT user_id, event_id, i, n,
                  ABS(CAST(n AS {big}) * prefix
                      - CAST(i AS {big}) * total) AS dev
           FROM w WHERE i < n AND n >= 20),
    rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY dev DESC, i) AS r
           FROM sc)
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           CAST(i AS BIGINT) AS cp_index,
           CAST(event_id AS BIGINT) AS cp_event_id,
           CAST(dev {div} n AS BIGINT) AS cusum_micros
    FROM rk WHERE r = 1
"""


@query(
    "event_cusum",
    oracle=_CUSUM_SQL.format(us="epoch_us", big="HUGEINT", div="//"),
    doc="CUSUM changepoint detection per user stream: the cumulative sum "
    "of deviations from the stream mean, S_i = prefix_i - i*mean, peaks "
    "at the most likely level-shift point (the classic Page/offline-CUSUM "
    "estimator); each user with >= 20 events reports the argmax event, "
    "its position, and the peak magnitude in value-micros. Exactness: "
    "the mean is never materialized — |n*prefix_i - i*total| is the "
    "n-scaled deviation in pure 128-bit integers (value-micros via the "
    "driver-verified DECIMAL cast), so the argmax and its deterministic "
    "earliest-i tie-break are bit-identical across engines; the output "
    "magnitude divides back by n with integer DIV. Scale: all four "
    "windows and the final rank share ONE (user_id) hash partitioning — "
    "the stream shuffles once, no joins, no driver state.",
    tags=("events", "mining", "stats", "window"),
)
def q_event_cusum(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(
        _CUSUM_SQL.format(us="unix_micros", big="DECIMAL(38,0)", div="DIV")
    )


# ---------------------------------------------------------------------------
# Revenue-concentration audit (Gini + top-decile share)
# ---------------------------------------------------------------------------

# Identical ANSI text on both engines except the 128-bit type keyword and
# integer-division operator (the event_cusum discipline).
_GINI_SQL = """
    WITH c AS (SELECT o_custkey,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                           AS BIGINT) AS cents
               FROM orders GROUP BY o_custkey),
    w AS (SELECT cents,
                 ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
                 COUNT(*) OVER () AS n,
                 SUM(cents) OVER () AS total
          FROM c),
    g AS (SELECT n, total,
                 SUM((2 * CAST(i AS {big}) - n - 1) * cents) AS num,
                 SUM(CASE WHEN i > n - (n + 9) {div} 10 THEN cents
                          ELSE 0 END) AS topd
          FROM w GROUP BY n, total)
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST((1000000 * num) {div} (CAST(n AS {big}) * total) AS BIGINT)
               AS gini_ppm,
           CAST((1000000 * topd) {div} total AS BIGINT) AS top_decile_ppm
    FROM g
"""


@query(
    "orders_gini",
    oracle=_GINI_SQL.format(big="HUGEINT", div="//"),
    doc="Revenue-concentration audit: the exact Gini coefficient of "
    "per-customer revenue (sum_i (2i - n - 1) x_(i) / (n sum x) over the "
    "ascending sort) plus the top-decile revenue share, both in exact "
    "ppm. The inequality screen behind whale-risk and skew monitoring — "
    "the same number also predicts which join keys need salting. "
    "Exactness: revenue in integer cents via the exact DECIMAL sum; rank "
    "weights and sums in 128-bit integers; (metric, custkey) total order "
    "pins every tie. Scale note (the orders_rfm caveat): the ranked "
    "prefix needs a global order over the CUSTOMER dimension (not the "
    "fact table); at 100 TB the sort swaps for approx_percentile "
    "Lorenz-grid evaluation at epsilon rank error.",
    tags=("agg", "mining", "stats"),
)
def q_orders_gini(spark: SparkSession, sf: str) -> DataFrame:
    tables(spark, sf)
    return spark.sql(_GINI_SQL.format(big="DECIMAL(38,0)", div="DIV"))


# ---------------------------------------------------------------------------
# Asymmetric containment dedup (excerpt / quotation detection)
# ---------------------------------------------------------------------------


def _containment_oracle(n_perms: int = 16, n_bands: int = 8) -> str:
    """DuckDB twin of q_dedup_containment — the dedup_minhash_eval chain
    with directional containment instead of the agreement estimate."""
    from datafusion_flight_sql_server_spark.operators.dedup import (
        MINHASH_P,
        minhash_params,
    )

    rows = n_perms // n_bands
    params = minhash_params(n_perms)
    mh = ",\n                   ".join(
        f"list_min(list_transform(h, x -> ({a} * (x % {MINHASH_P}) + {b})"
        f" % {MINHASH_P})) AS mh{i}"
        for i, (a, b) in enumerate(params)
    )
    band_selects = "\n              UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, md5(concat_ws('-', "
        + ", ".join(f"mh{bi * rows + r}" for r in range(rows))
        + ")) AS key FROM sig"
        for bi in range(n_bands)
    )
    return f"""
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
        sig AS (SELECT doc_id,
                   {mh}
                FROM hashed),
        buck AS ({band_selects}),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM buck a JOIN buck b
                   ON a.band = b.band AND a.key = b.key
                  AND a.doc_id < b.doc_id),
        scored AS (SELECT doc_a, doc_b,
                          len(list_intersect(ha.h, hb.h)) AS inter,
                          len(ha.h) AS na, len(hb.h) AS nb
                   FROM cand
                   JOIN hashed ha ON ha.doc_id = doc_a
                   JOIN hashed hb ON hb.doc_id = doc_b)
        SELECT doc_a, doc_b,
               CAST((1000000 * inter) // na AS BIGINT) AS cont_a_ppm,
               CAST((1000000 * inter) // nb AS BIGINT) AS cont_b_ppm
        FROM scored
        WHERE (1000000 * inter) // na >= 600000
           OR (1000000 * inter) // nb >= 600000
    """


@query(
    "dedup_containment",
    oracle=_containment_oracle(),
    doc="Asymmetric containment dedup (Broder's containment coefficient): "
    "for each LSH candidate pair, C(A,B) = |A n B| / |A| and its mirror, "
    "in exact ppm, keeping pairs where either direction >= 0.6 — the "
    "excerpt/quotation detector symmetric Jaccard misses (a paragraph "
    "quoted inside a 100x longer page has Jaccard ~0.01 but containment "
    "~1.0, and the long side would survive Jaccard dedup as a 'unique' "
    "doc while leaking the quoted content). Same production banding and "
    "hashed shingle sets as dedup_near_minhash/dedup_minhash_eval. "
    "Caveat (documented, inherent to banding): MinHash-LSH recall is "
    "tuned for Jaccard, so extreme-ratio containment pairs may not band "
    "together — the dedicated high-recall path for those is "
    "dedup_substring's shingle doc-frequency, which needs no pairing at "
    "all. Scale: identical single data-sized shuffle as the dedup "
    "(hash-partitioned band join); set sizes and intersections touch "
    "candidate pairs only.",
    tags=("dedup", "similarity", "text"),
)
def q_dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    # Round 6: shares the persisted MinHash front end (same constants as
    # dedup_near_minhash / dedup_minhash_eval — that sharing is the point
    # of the audit family); expressions unchanged, results bit-identical.
    from datafusion_flight_sql_server_spark.operators.dedup import (
        _minhash_hashed_buckets,
    )

    d = tables(spark, sf)["documents"]
    hashed, _sig, bucket = _minhash_hashed_buckets(
        d, "doc_id", "text", 3, 16, 8, 42, cache_key=(sf, "documents")
    )
    a = bucket.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = bucket.select(F.col("doc_id").alias("doc_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ha = hashed.select(F.col("doc_id").alias("doc_a"), F.col("h").alias("ha"))
    hb = hashed.select(F.col("doc_id").alias("doc_b"), F.col("h").alias("hb"))
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ha", "hb")).alias("inter"),
            F.size("ha").alias("na"),
            F.size("hb").alias("nb"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr("CAST((1000000 * inter) DIV na AS BIGINT)").alias(
                "cont_a_ppm"
            ),
            F.expr("CAST((1000000 * inter) DIV nb AS BIGINT)").alias(
                "cont_b_ppm"
            ),
        )
        .filter(
            (F.col("cont_a_ppm") >= 600000) | (F.col("cont_b_ppm") >= 600000)
        )
    )


@query(
    "text_prefix_dup",
    oracle="""
        WITH pfx AS (
            SELECT doc_id,
                   md5(array_to_string(string_split(lower(text), ' ')[1:16],
                                       ' ')) AS p
            FROM documents
        )
        SELECT doc_id,
               CAST(COUNT(*) OVER (PARTITION BY p) AS BIGINT) AS prefix_docs
        FROM pfx
    """,
    doc="Document-opening duplication signal (template/boilerplate "
    "detector): how many corpus documents share this document's first-16-"
    "token prefix. Positional, unlike text_fingerprint's bag-of-tokens "
    "key — a form letter with varying tails collides here and nowhere "
    "else. Scale: only 16-byte prefix digests shuffle (one hash "
    "partition by digest); text never leaves the map side.",
    tags=("text", "dedup"),
)
def q_text_prefix_dup(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    pfx = d.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice(F.split(F.lower("text"), " "), 1, 16))
        ).alias("p"),
    )
    return pfx.select(
        "doc_id",
        F.count(F.lit(1))
        .over(W.partitionBy("p"))
        .cast("bigint")
        .alias("prefix_docs"),
    )


# ---------------------------------------------------------------------------
# Dedup threshold calibration curve
# ---------------------------------------------------------------------------

#: Jaccard thresholds (ppm) swept by dedup_threshold_curve.
_CURVE_THRESHOLDS = tuple(range(500_000, 950_000, 50_000))


@query(
    "dedup_threshold_curve",
    oracle=f"""
        WITH pairs AS ({_minhash_eval_oracle()}),
             thr AS (SELECT UNNEST([{", ".join(str(t) for t in _CURVE_THRESHOLDS)}])
                     AS threshold_ppm)
        SELECT CAST(t.threshold_ppm AS BIGINT) AS threshold_ppm,
               CAST(COUNT(p.doc_a) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT p.doc_b) AS BIGINT) AS n_docs_removed
        FROM thr t LEFT JOIN pairs p ON p.exact_ppm >= t.threshold_ppm
        GROUP BY t.threshold_ppm
    """,
    doc="Dedup threshold calibration curve: for each candidate Jaccard "
    "threshold (0.50…0.90 in exact ppm), how many verified LSH candidate "
    "pairs survive and how many documents a keep-lowest-id policy would "
    "remove (distinct greater-id endpoints) — the operating-point sweep "
    "run before committing a near-dup threshold to a corpus, composing "
    "the production sketch audit (dedup_minhash_eval, identical "
    "constants) instead of re-deriving it. Scale: the pair list is the "
    "audit's output (LSH-blocked, never all-pairs); the 9-row threshold "
    "spine broadcasts and the curve is one tiny aggregation — thresholds "
    "with zero survivors still appear (left join from the spine).",
    tags=("dedup", "similarity", "evaluation"),
)
def q_dedup_threshold_curve(spark: SparkSession, sf: str) -> DataFrame:
    pairs = q_dedup_minhash_eval(spark, sf).select("doc_a", "doc_b", "exact_ppm")
    # row-local explode of the thresholds each pair passes (a non-equi
    # spine join could not broadcast its outer side); the ladder is 9
    # literals, so the blow-up is bounded 9x on the tiny pair list
    ladder = F.array(*[F.lit(t).cast("bigint") for t in _CURVE_THRESHOLDS])
    passed = pairs.select(
        "doc_a",
        "doc_b",
        F.explode(
            F.filter(ladder, lambda t: t <= F.col("exact_ppm"))
        ).alias("threshold_ppm"),
    )
    curve = passed.groupBy("threshold_ppm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.countDistinct("doc_b").cast("bigint").alias("n_docs_removed"),
    )
    spine = spark.createDataFrame(
        [(t,) for t in _CURVE_THRESHOLDS], "threshold_ppm BIGINT"
    )
    return spine.join(F.broadcast(curve), "threshold_ppm", "left").select(
        "threshold_ppm",
        F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
        F.coalesce("n_docs_removed", F.lit(0))
        .cast("bigint")
        .alias("n_docs_removed"),
    )


# ---------------------------------------------------------------------------
# Exact-duplication corpus report (round 6)
# ---------------------------------------------------------------------------


@query(
    "doc_dup_report",
    oracle="""
        WITH g AS (
            SELECT md5(text) AS dg, COUNT(*) AS k, SUM(n_chars) AS chars
            FROM documents GROUP BY md5(text)
        )
        SELECT CAST(k AS BIGINT) AS cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(SUM(k) AS BIGINT) AS n_docs,
               CAST(SUM(chars - chars // k) AS BIGINT) AS redundant_chars
        FROM g GROUP BY k
    """,
    doc="Exact-duplication corpus report: the cluster-size histogram over "
    "content digests — how many duplicate groups of each size exist, how "
    "many documents they hold, and how many characters a keep-one policy "
    "would delete. The before/after accounting every dedup decision is "
    "justified with (a corpus that is 40% size-2 clusters needs a "
    "different pipeline than one with a single million-copy cluster). "
    "redundant_chars is integer-exact: duplicates share identical text, "
    "so each cluster's per-copy size is SUM(chars) DIV k with no "
    "remainder. Scale: one 16-byte-digest shuffle (text never moves), "
    "then a second aggregate over cluster sizes — O(distinct sizes) "
    "output rows.",
    tags=("dedup", "profiling"),
)
def q_doc_dup_report(spark: SparkSession, sf: str) -> DataFrame:
    d = tables(spark, sf)["documents"]
    g = d.groupBy(F.md5("text").alias("dg")).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_chars").alias("chars"),
    )
    return g.groupBy(F.col("k").cast("bigint").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("k").cast("bigint").alias("n_docs"),
        F.expr("CAST(SUM(chars - chars DIV k) AS BIGINT)").alias(
            "redundant_chars"
        ),
    )


# ---------------------------------------------------------------------------
# KMV/theta sketch set-INTERSECTION cardinality (with exact audit)
# ---------------------------------------------------------------------------


@query(
    "agg_kmv_intersect",
    oracle="""
        WITH uh AS (SELECT DISTINCT event_type, user_id FROM events),
        hh AS (SELECT event_type, user_id,
                      ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12))
                          ::BIGINT AS h
               FROM uh),
        sk AS (SELECT event_type, user_id, h,
                      ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY h, user_id) AS r
               FROM hh),
        kmv AS (SELECT * FROM sk WHERE r <= 64),
        th AS (SELECT event_type,
                      CASE WHEN COUNT(*) < 64 THEN 281474976710656
                           ELSE CAST(MAX(h) AS BIGINT) END AS theta
               FROM kmv GROUP BY event_type),
        spine AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                         CASE WHEN a.theta < b.theta THEN a.theta
                              ELSE b.theta END AS theta
                  FROM th a JOIN th b ON a.event_type < b.event_type),
        rho AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                       a.h
                FROM kmv a JOIN kmv b ON a.user_id = b.user_id
                                     AND a.event_type < b.event_type),
        est AS (SELECT s.type_a, s.type_b, s.theta,
                       CAST(COUNT(r.h) FILTER (r.h < s.theta) AS BIGINT)
                           AS rho_n
                FROM spine s LEFT JOIN rho r
                  ON r.type_a = s.type_a AND r.type_b = s.type_b
                GROUP BY s.type_a, s.type_b, s.theta),
        exact AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                         CAST(COUNT(*) AS BIGINT) AS exact_common
                  FROM uh a JOIN uh b ON a.user_id = b.user_id
                                     AND a.event_type < b.event_type
                  GROUP BY 1, 2)
        SELECT e.type_a, e.type_b,
               CAST((e.rho_n * 281474976710656) // e.theta AS BIGINT)
                   AS kmv_common_est,
               x.exact_common
        FROM est e JOIN exact x
          ON x.type_a = e.type_a AND x.type_b = e.type_b
    """,
    doc="KMV/theta-sketch set-INTERSECTION cardinality per event-type pair "
    "with an exact audit — the sketch capability HLL lacks (HLL unions "
    "merge, intersections don't). Per type, the sketch is the k=64 "
    "smallest 48-bit md5 user hashes (deterministic, engine-portable); "
    "theta = the k-th minimum (k=64 so the ESTIMATOR path is live at the driver's sf0.01 check scale, not just the degenerate small-set branch; with the full 2^48 space when |set| < k, "
    "where the estimate degenerates to the EXACT count). Pair estimate = "
    "rho * 2^48 / theta_pair with rho = common sketch members below "
    "theta_pair = min(theta_a, theta_b) — the standard theta-sketch "
    "intersection, computed entirely in bigint (rho <= k keeps "
    "rho * 2^48 well under bigint; floor division truncates identically on "
    "positives). The exact_common column is the same audit discipline as "
    "agg_count_min's over_ppm. Scale: sketches are per-group top-k "
    "windows over DISTINCT (type, user) — WindowGroupLimit pushes the "
    "rank filter into the sort, k rows per group survive — and every "
    "pair operation joins 256-row sketches; only the AUDIT leg touches "
    "the full distinct relation, and a production run would drop it "
    "(documented), leaving KB-sized mergeable state per type.",
    tags=("aggregate", "sketch", "events"),
)
def q_agg_kmv_intersect(
    spark: SparkSession, sf: str, audit: bool = True
) -> DataFrame:
    # audit=False is the PRODUCTION form (VERDICT r9 "what's wrong" #2):
    # sketch-only — no corpus-sized exact-common join; the driver keeps
    # the default audited shape. Plan-pinned in test_plan_shapes.py.
    e = tables(spark, sf)["events"]
    h_space = 281474976710656  # 2^48
    uh = e.select("event_type", "user_id").distinct()
    hh = uh.withColumn(
        "h",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
        ).cast("bigint"),
    )
    w = W.partitionBy("event_type").orderBy("h", "user_id")
    kmv = (
        hh.select("event_type", "user_id", "h", F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= 64)
    )
    th = kmv.groupBy("event_type").agg(
        F.when(F.count(F.lit(1)) < 64, F.lit(h_space))
        .otherwise(F.max("h"))
        .cast("bigint")
        .alias("theta")
    )
    ta = th.select(F.col("event_type").alias("type_a"), F.col("theta").alias("tha"))
    tb = th.select(F.col("event_type").alias("type_b"), F.col("theta").alias("thb"))
    spine = ta.join(tb, F.col("type_a") < F.col("type_b")).select(
        "type_a", "type_b", F.least("tha", "thb").alias("theta")
    )
    a = kmv.select(
        F.col("event_type").alias("type_a"),
        F.col("user_id").alias("ua"),
        F.col("h").alias("ha"),
    )
    b = kmv.select(
        F.col("event_type").alias("type_b"), F.col("user_id").alias("ub")
    )
    rho = a.join(
        b, (F.col("ua") == F.col("ub")) & (F.col("type_a") < F.col("type_b"))
    ).select("type_a", "type_b", F.col("ha").alias("h"))
    est = (
        spine.join(rho, ["type_a", "type_b"], "left")
        .groupBy("type_a", "type_b", "theta")
        .agg(
            F.count(F.when(F.col("h") < F.col("theta"), F.lit(1)))
            .cast("bigint")
            .alias("rho_n")
        )
    )
    est_cols = [
        F.col("type_a"),
        F.col("type_b"),
        F.expr(f"(rho_n * {h_space}) DIV theta").cast("bigint").alias(
            "kmv_common_est"
        ),
    ]
    if not audit:
        return est.select(*est_cols)
    xa = uh.select(F.col("event_type").alias("type_a"), F.col("user_id").alias("ua"))
    xb = uh.select(F.col("event_type").alias("type_b"), F.col("user_id").alias("ub"))
    exact = (
        xa.join(xb, (F.col("ua") == F.col("ub")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_common"))
    )
    return est.join(exact, ["type_a", "type_b"]).select(
        *est_cols, "exact_common"
    )


@query(
    "agg_kmv_rollup",
    oracle="""
        WITH uhd AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS d,
                                     user_id
                     FROM events),
        hd AS (SELECT event_type, d, user_id,
                      ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12))
                          ::BIGINT AS h
               FROM uhd),
        daily AS (SELECT * FROM (
                      SELECT event_type, d, user_id, h,
                             ROW_NUMBER() OVER (PARTITION BY event_type, d
                                                ORDER BY h, user_id) AS r
                      FROM hd) WHERE r <= 64),
        pooled AS (SELECT DISTINCT event_type, user_id, h FROM daily),
        merged AS (SELECT * FROM (
                       SELECT event_type, user_id, h,
                              ROW_NUMBER() OVER (PARTITION BY event_type
                                                 ORDER BY h, user_id) AS r
                       FROM pooled) WHERE r <= 64),
        uh AS (SELECT DISTINCT event_type, user_id,
                      ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12))
                          ::BIGINT AS h
               FROM events),
        direct AS (SELECT * FROM (
                       SELECT event_type, user_id, h,
                              ROW_NUMBER() OVER (PARTITION BY event_type
                                                 ORDER BY h, user_id) AS r
                       FROM uh) WHERE r <= 64),
        me AS (SELECT event_type,
                      CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS BIGINT)
                           ELSE CAST((63 * 281474976710656)
                                     // MAX(h) AS BIGINT) END AS est_merged
               FROM merged GROUP BY event_type),
        de AS (SELECT event_type,
                      CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS BIGINT)
                           ELSE CAST((63 * 281474976710656)
                                     // MAX(h) AS BIGINT) END AS est_direct
               FROM direct GROUP BY event_type),
        xx AS (SELECT event_type,
                      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
               FROM events GROUP BY event_type)
        SELECT m.event_type, m.est_merged, d.est_direct,
               m.est_merged = d.est_direct AS merge_lossless,
               x.exact_distinct
        FROM me m JOIN de d ON d.event_type = m.event_type
                  JOIN xx x ON x.event_type = m.event_type
    """,
    doc="KMV sketch DISTINCT rollup with a losslessness certificate: "
    "per-(type, day) k=64-minimum-hash sketches merge up to per-type by "
    "pooling and re-truncating to the k smallest — and the k smallest of "
    "a union of per-day k-minimum sets IS the global k-minimum set (a "
    "day contributes at most k members to the global top-k, all inside "
    "its own sketch), so merge-then-estimate EQUALS direct-estimate "
    "exactly; the merge_lossless column certifies it per row at runtime "
    "(the same runtime-certificate discipline as agg_topk_sketch). "
    "Estimator: exact count below k, else (k-1)*2^48/theta in bigint. "
    "This is the continuous-aggregate pattern for DISTINCT under "
    "INTERSECTION-capable sketches (agg_kmv_intersect shares the sketch "
    "form; agg_hll_rollup covers the union-only HLL leg): a quarter's "
    "distincts re-aggregate from KB-per-day sketches, never a raw "
    "re-scan. Scale: per-group top-k windows (WindowGroupLimit) over "
    "DISTINCT day slices; the pooled re-rank sees at most k x days rows "
    "per type; only the audit leg touches the full distinct relation.",
    tags=("aggregate", "sketch", "events", "rollup"),
)
def q_agg_kmv_rollup(
    spark: SparkSession, sf: str, audit: bool = True
) -> DataFrame:
    # audit=False is the PRODUCTION form (VERDICT r9 "what's wrong" #2):
    # no corpus-sized COUNT DISTINCT — estimates + the merge_lossless
    # certificate only (the certificate is sketch-vs-sketch, O(k) state).
    e = tables(spark, sf)["events"]
    h_space = 281474976710656  # 2^48
    k = 64

    def _h(col):
        return F.conv(
            F.substring(F.md5(col.cast("string")), 1, 12), 16, 10
        ).cast("bigint")

    def _sketch(df, parts: list):
        w = W.partitionBy(*parts).orderBy("h", "user_id")
        return df.select(
            *parts, "user_id", "h", F.row_number().over(w).alias("r")
        ).filter(F.col("r") <= k)

    def _estimate(sk, alias: str):
        return sk.groupBy("event_type").agg(
            F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)))
            .otherwise(F.expr(f"({k - 1} * {h_space}) DIV MAX(h)"))
            .cast("bigint")
            .alias(alias)
        )

    uhd = (
        e.select("event_type", F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
        .withColumn("h", _h(F.col("user_id")))
    )
    daily = _sketch(uhd, ["event_type", "d"])
    pooled = daily.select("event_type", "user_id", "h").distinct()
    merged = _sketch(pooled, ["event_type"])
    uh = (
        e.select("event_type", "user_id")
        .distinct()
        .withColumn("h", _h(F.col("user_id")))
    )
    direct = _sketch(uh, ["event_type"])
    me = _estimate(merged, "est_merged")
    de = _estimate(direct, "est_direct")
    base_cols = [
        F.col("event_type"),
        F.col("est_merged"),
        F.col("est_direct"),
        (F.col("est_merged") == F.col("est_direct")).alias("merge_lossless"),
    ]
    if not audit:
        return me.join(de, "event_type").select(*base_cols)
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return (
        me.join(de, "event_type")
        .join(exact, "event_type")
        .select(*base_cols, "exact_distinct")
    )


@query(
    "agg_kmv_difference",
    oracle="""
        WITH uh AS (SELECT DISTINCT event_type, user_id FROM events),
        hh AS (SELECT event_type, user_id,
                      ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12))
                          ::BIGINT AS h
               FROM uh),
        sk AS (SELECT event_type, user_id, h,
                      ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY h, user_id) AS r
               FROM hh),
        kmv AS (SELECT * FROM sk WHERE r <= 64),
        th AS (SELECT event_type,
                      CASE WHEN COUNT(*) < 64 THEN 281474976710656
                           ELSE CAST(MAX(h) AS BIGINT) END AS theta
               FROM kmv GROUP BY event_type),
        spine AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                         CASE WHEN a.theta < b.theta THEN a.theta
                              ELSE b.theta END AS theta
                  FROM th a JOIN th b ON a.event_type <> b.event_type),
        surv AS (SELECT s.type_a, s.type_b, k.h
                 FROM spine s
                 JOIN kmv k ON k.event_type = s.type_a AND k.h < s.theta
                 WHERE NOT EXISTS (
                     SELECT 1 FROM kmv kb
                     WHERE kb.event_type = s.type_b
                       AND kb.user_id = k.user_id)),
        est AS (SELECT s.type_a, s.type_b, s.theta,
                       CAST(COUNT(v.h) AS BIGINT) AS rho_n
                FROM spine s LEFT JOIN surv v
                  ON v.type_a = s.type_a AND v.type_b = s.type_b
                GROUP BY 1, 2, 3),
        exact AS (SELECT s.type_a, s.type_b,
                         CAST(COUNT(*) AS BIGINT) AS exact_diff
                  FROM spine s JOIN uh a ON a.event_type = s.type_a
                  WHERE NOT EXISTS (
                      SELECT 1 FROM uh b
                      WHERE b.event_type = s.type_b
                        AND b.user_id = a.user_id)
                  GROUP BY 1, 2)
        SELECT e.type_a, e.type_b,
               CAST((e.rho_n * 281474976710656) // e.theta AS BIGINT)
                   AS kmv_diff_est,
               COALESCE(x.exact_diff, 0) AS exact_diff
        FROM est e LEFT JOIN exact x
          ON x.type_a = e.type_a AND x.type_b = e.type_b
    """,
    doc="KMV/theta-sketch set-DIFFERENCE cardinality |A minus B| per ordered "
    "event-type pair with an exact audit — the A-not-B operation that "
    "completes the sketch algebra (agg_kmv_rollup = union, "
    "agg_kmv_intersect = intersection; same k=64 deterministic 48-bit "
    "md5 sketches, so all three compose over ONE stored sketch form). "
    "Below theta_pair = min(theta_a, theta_b), sketch membership is "
    "EXACT (a theta sketch contains every set member hashing under its "
    "theta), so B-membership of A's retained members is decidable, not "
    "estimated: retained = A-sketch members with h < theta_pair that are "
    "absent from B's sketch, est = retained * 2^48 DIV theta_pair — the "
    "standard unbiased theta A-not-B, entirely in bigint (retained <= 64 "
    "keeps the product under 2^54). When both sets are smaller than k "
    "the estimate degenerates to the exact difference. Scale: every "
    "pair operation touches only 64-row sketches (the retained-member "
    "probe is a left-anti join of one sketch against another); only the "
    "AUDIT leg walks the full distinct relation, and a production run "
    "drops it via audit=False (documented, plan-pinned).",
    tags=("aggregate", "sketch", "events"),
)
def q_agg_kmv_difference(
    spark: SparkSession, sf: str, audit: bool = True
) -> DataFrame:
    # audit=False is the PRODUCTION form — sketch-only, no corpus-sized
    # anti-join; the driver keeps the default audited shape.
    e = tables(spark, sf)["events"]
    h_space = 281474976710656  # 2^48
    k = 64
    uh = e.select("event_type", "user_id").distinct()
    hh = uh.withColumn(
        "h",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
        ).cast("bigint"),
    )
    w = W.partitionBy("event_type").orderBy("h", "user_id")
    kmv = (
        hh.select("event_type", "user_id", "h", F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= k)
    )
    th = kmv.groupBy("event_type").agg(
        F.when(F.count(F.lit(1)) < k, F.lit(h_space))
        .otherwise(F.max("h"))
        .cast("bigint")
        .alias("theta")
    )
    ta = th.select(F.col("event_type").alias("type_a"), F.col("theta").alias("tha"))
    tb = th.select(F.col("event_type").alias("type_b"), F.col("theta").alias("thb"))
    spine = ta.join(tb, F.col("type_a") != F.col("type_b")).select(
        "type_a", "type_b", F.least("tha", "thb").alias("theta")
    )
    a = kmv.select(
        F.col("event_type").alias("type_a"),
        F.col("user_id").alias("ua"),
        F.col("h").alias("ha"),
    )
    b = kmv.select(
        F.col("event_type").alias("tb2"), F.col("user_id").alias("ub")
    )
    # A-sketch members below the pair theta…
    cand = spine.join(a, "type_a").filter(F.col("ha") < F.col("theta"))
    # …that are absent from B's sketch (exact membership below theta_b):
    surv = cand.join(
        b,
        (F.col("type_b") == F.col("tb2")) & (F.col("ua") == F.col("ub")),
        "left_anti",
    ).select("type_a", "type_b", F.col("ha").alias("h"))
    est = (
        spine.join(surv, ["type_a", "type_b"], "left")
        .groupBy("type_a", "type_b", "theta")
        .agg(F.count("h").cast("bigint").alias("rho_n"))
    )
    est_cols = [
        F.col("type_a"),
        F.col("type_b"),
        F.expr(f"(rho_n * {h_space}) DIV theta").cast("bigint").alias(
            "kmv_diff_est"
        ),
    ]
    if not audit:
        return est.select(*est_cols)
    xa = uh.select(F.col("event_type").alias("type_a"), F.col("user_id").alias("xua"))
    xb = uh.select(F.col("event_type").alias("xtb"), F.col("user_id").alias("xub"))
    exact = (
        spine.select("type_a", "type_b")
        .join(xa, "type_a")
        .join(
            xb,
            (F.col("type_b") == F.col("xtb")) & (F.col("xua") == F.col("xub")),
            "left_anti",
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_diff"))
    )
    return est.join(exact, ["type_a", "type_b"], "left").select(
        *est_cols, F.coalesce("exact_diff", F.lit(0)).cast("bigint").alias("exact_diff")
    )
