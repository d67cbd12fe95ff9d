"""Connected components over a pair list — near-dup cluster assignment.

North-star extension (SURVEY.md §2.C): pairwise near-duplicate operators
(``operators/dedup.py``) emit edges; deduplication policy usually needs the
*transitive closure* — "A≈B and B≈C ⇒ {A,B,C} are one cluster, keep one".
That closure is connected components, an iterative algorithm outside the
reference's delegated SQL surface (DataFusion 53 has no recursive CTEs).

Implemented as iterative min-label propagation on DataFrames:

1. symmetrize the edge list;
2. every node starts labeled with its own id;
3. each round, a node's label becomes ``min(own, min(neighbor labels))`` —
   one equi-join + one groupBy per round;
4. stop when the (monotonically decreasing) label sum is unchanged — the
   unique fixed point where every node carries its component's min id, so
   the result is deterministic and engine-comparable (DuckDB oracle: a
   recursive CTE over the same edges).

100 TB posture: each round is one hash-partitioned join + partial-agg
groupBy (no cartesian anything); rounds needed equal the component
diameter. Near-dup graphs are overwhelmingly tiny star-shaped clusters
(diameter ≤ ~4), so the loop converges in a handful of rounds; for
adversarial long-chain graphs the documented upgrade is the
large-star/small-star contraction (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14), which converges in O(log n) rounds
with the same per-round join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node reachable through ``edges`` with its component's
    minimum node id. Returns (node, cluster_id); only nodes appearing in at
    least one edge are labeled (isolated rows never enter the pair list).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        sym.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        # One join + one groupBy per round (round 13; was join + groupBy +
        # left-join): a node's next label is min over its own label and its
        # neighbors' labels, which a union INTO the aggregation expresses
        # without the second join — same result, one fewer shuffle stage
        # per round, and partial aggregation compacts the |E|-row leg
        # map-side before it crosses the wire.
        new_labels = (
            sym.join(labels, sym["dst"] == labels["node"])
            .select(F.col("src").alias("node"), "label")
            .unionByName(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:  # fixed point: labels are component minima
            break
        prev_sum = new_sum
    sym.unpersist()
    return labels.select("node", F.col("label").alias("cluster_id"))


# -- large-star / small-star contraction -------------------------------------
#
# Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC'14,
# public): alternate two edge rewrites until the edge set is a fixed point,
# at which moment every component is a depth-1 star rooted at its minimum
# id. Each rewrite is one groupBy + one equi-join over the edge list — the
# same per-round shuffle shape as min-label propagation — but the round
# count is O(log n) in the component DIAMETER, not linear, which is what
# survives an adversarial chain graph at scale.


def _star_round(e: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star rewrite over a (u, v) edge list.

    large-star: for each node u, connect every STRICTLY LARGER neighbor to
    m = min(N(u) ∪ {u}). small-star: orient edges (larger, smaller), then
    connect every smaller-or-equal neighbor AND u itself to m.
    """
    if large:
        nbrs = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
    else:
        nbrs = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
    m = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least("_mv", "u").alias("m"))
    )
    joined = nbrs.join(m, "u")
    if large:
        out = joined.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    else:
        # emit (v, m) AND (u, m) in ONE pass over the join output via an
        # array explode (round 13; was a self-union that referenced the
        # join subtree twice — exchange reuse usually de-duplicated it,
        # but the explode form guarantees a single execution and halves
        # the plan width per round)
        out = joined.select(
            F.explode(F.array("v", "u")).alias("u"), F.col("m").alias("v")
        )
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    with_rounds: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """Connected components via alternating large-star/small-star rounds.

    Same contract as :func:`connected_components` — every node appearing in
    an edge gets (node, cluster_id) with cluster_id = component min — but
    converges in O(log n) rounds on long-chain graphs where min-label
    propagation needs diameter rounds. Raises if ``max_iter`` rounds do not
    reach the fixed point (each round provably contracts, so this only
    fires on a too-small max_iter).
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Lineage MUST be truncated each round, not just cached: every star
    # round references its input ~3x, so the logical plan grows ~9x per
    # round and analysis cost explodes exponentially by round ~6 (measured:
    # a 32-node chain ran minutes instead of seconds under persist()).
    # localCheckpoint materializes the partitions AND cuts the plan — on a
    # cluster, swap for reliable checkpoint() if executor loss matters
    # mid-algorithm. eager=True is deliberate (round-13 A/B): eager=False
    # (letting the fingerprint action materialize the checkpoint) saves a
    # job per round but measured SLOWER (7.1 s vs 4.6 s wall median at
    # equal host load) — the fused materialize+fingerprint job has a
    # longer serial critical path than the two pipelined jobs.
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def fingerprint(df: DataFrame) -> tuple:
        # exact-count + hash-sum multiset fingerprint (one scalar row)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = fingerprint(e)
    rounds = 0
    converged = False
    for _ in range(max_iter):
        e = _star_round(_star_round(e, large=True), large=False).localCheckpoint(
            eager=True
        )
        cur = fingerprint(e)
        rounds += 1
        if cur == prev:  # fixed point: components are depth-1 min-stars
            converged = True
            break
        prev = cur
    if not converged:
        nodes.unpersist()
        raise RuntimeError(
            f"connected_components_star: no fixed point in {max_iter} rounds"
        )
    # converged edges are (child, root); roots label themselves
    labels = (
        nodes.join(e, nodes["node"] == e["u"], "left")
        .select(
            "node", F.coalesce(F.col("v"), F.col("node")).alias("cluster_id")
        )
        .groupBy("node")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    result = labels.persist(StorageLevel.MEMORY_AND_DISK)
    result.count()  # materialize before releasing the inputs it reads
    nodes.unpersist()
    if with_rounds:
        return result, rounds
    return result
