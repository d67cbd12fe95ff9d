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
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
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
