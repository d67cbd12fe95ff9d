"""Mergeable heavy-hitter sketch: distributed Misra-Gries candidates with an
exact verification pass.

The reference engine exposes no frequent-items surface (its aggregate set is
the delegated engine's — reference: datafusion-flight-sql-server/src/
service.rs:214-247); this is a §2.C extension for corpus vocabulary / hot-key
profiling at 100 TB.

Why not just ``groupBy(col).count().orderBy(...).limit(k)``? That shuffles
one row per *distinct key*. For token streams the distinct count is corpus-
scale (trillions of shingles / n-grams), so the exact plan's shuffle IS the
bottleneck. The sketch plan shuffles ``capacity`` counters per partition in
pass 1 and only candidate-key rows in pass 2 — megabytes, not terabytes.

Algorithm (Misra-Gries 1982; mergeability per Agarwal et al., "Mergeable
Summaries", PODS 2012):

- pass 1 (mapInArrow, one summary per partition): maintain ``capacity``
  counters; on overflow decrement all and evict zeros. Each surviving counter
  is a lower bound on the partition-local count, undercounting by at most
  ``n_p / capacity``.
- candidate union: any key whose GLOBAL count exceeds ``N / capacity`` must
  exceed ``n_p / capacity`` in at least one partition (pigeonhole), so it
  appears in at least one partition summary. The union of summaries is
  therefore a superset of every global heavy hitter.
- pass 2 (exact verify): recount ONLY candidate keys (broadcast hash
  semi-join pushes the filter map-side) and take the exact top-k.

The result is provably the exact top-k whenever the k-th true count clears
``N / capacity``; the operator checks that bound at runtime and raises
instead of silently degrading.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_partials(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: (key, weight lower bound)."""
    import pyarrow as pa

    schema = pa.schema(
        [pa.field("key", pa.string()), pa.field("w", pa.int64())]
    )

    def summarize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        counters: dict[str, int] = {}
        for batch in batches:
            for key in batch.column(0).to_pylist():
                if key is None:
                    continue
                if key in counters:
                    counters[key] += 1
                elif len(counters) < capacity:
                    counters[key] = 1
                else:
                    # decrement-all step; evict zeroed counters
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        if counters:
            yield pa.RecordBatch.from_pydict(
                {"key": list(counters), "w": list(counters.values())},
                schema=schema,
            )

    return df.select(F.col(col).alias("key")).mapInArrow(
        summarize, "key string, w long"
    )


def topk_exact_via_sketch(
    df: DataFrame, col: str, k: int, capacity: int = 256
) -> DataFrame:
    """Exact top-``k`` keys by count, computed sketch-first (see module doc).

    Returns columns ``(word, n)``; raises ``ValueError`` if the sketch
    guarantee cannot certify exactness (k-th count <= N / capacity).
    """
    if k >= capacity:
        raise ValueError(
            f"topk_exact_via_sketch: k={k} must be < capacity={capacity} "
            f"for the N/capacity guarantee to be meaningful."
        )
    # Candidate union: every key surviving any partition summary. Weights are
    # only used to prune nothing here — correctness needs the full union.
    candidates = (
        misra_gries_partials(df, col, capacity)
        .groupBy("key")
        .agg(F.sum("w").alias("w_lb"))
        .select("key")
    )
    exact = (
        df.join(
            F.broadcast(candidates), df[col] == candidates["key"], "leftsemi"
        )
        .groupBy(F.col(col).alias("word"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    top = exact.orderBy(F.col("n").desc(), "word").limit(k)

    # Runtime certificate: the k-th exact count must clear N / capacity, else
    # a non-candidate key could in principle belong in the top-k.
    total = df.where(F.col(col).isNotNull()).count()
    rows = top.collect()  # k rows — driver-sized by construction
    if len(rows) == k and rows[-1]["n"] * capacity <= total:
        raise ValueError(
            f"topk_exact_via_sketch: cannot certify exactness — k-th count "
            f"{rows[-1]['n']} <= N/capacity = {total}/{capacity}; raise "
            f"capacity."
        )
    spark = df.sparkSession
    return spark.createDataFrame(rows, schema=top.schema)
