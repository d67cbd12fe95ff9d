"""Mergeable heavy-hitter sketch: distributed Space-Saving candidates with an
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

Algorithm (Space-Saving, Metwally et al. 2005; mergeability per Agarwal et
al., "Mergeable Summaries", PODS 2012):

- pass 1 (mapInArrow, one summary per partition): each Arrow batch is
  pre-aggregated vectorized (``value_counts`` — the Python loop touches
  distinct-keys-per-batch, not rows), then folded into ``capacity``
  counters with weighted Space-Saving updates (an unseen key evicts the
  minimum counter and inherits its value as overestimation). Every key
  whose partition-local count exceeds ``n_p / capacity`` is guaranteed
  present in the summary (the min counter never exceeds ``n_p /
  capacity``).
- candidate union: any key whose GLOBAL count exceeds ``N / capacity`` must
  exceed ``n_p / capacity`` in at least one partition (pigeonhole), so it
  appears in at least one partition summary. The union of summaries is
  therefore a superset of every global heavy hitter.
- pass 2 (exact verify): recount ONLY candidate keys (broadcast hash
  semi-join pushes the filter map-side) and take the exact top-k.

The result is provably the exact top-k whenever the k-th true count clears
``N / capacity``; the operator checks that bound at runtime — using the
partition totals carried inside the summaries, no extra corpus scan — and
raises instead of silently degrading.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Key of the in-band partition-total row in a summary (empty string cannot
#: collide: the operators feed tokenized non-empty keys, and the total row is
#: tagged with w = -n so it is unambiguous even if an empty key slipped in).
_TOTAL_KEY = ""


def space_saving_partials(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Space-Saving summaries: (key, count upper bound ``w``).

    Each summary also carries one total row ``(key='', w=-n_p)`` recording
    the partition's item count, so callers can reconstruct the global N
    without re-scanning the input.
    """
    import pyarrow as pa

    schema = pa.schema(
        [pa.field("key", pa.string()), pa.field("w", pa.int64())]
    )

    def summarize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        counters: dict[str, int] = {}
        total = 0
        for batch in batches:
            # vectorized pre-aggregation: the fold below iterates over the
            # batch's DISTINCT keys, not its rows
            vc = pc.value_counts(batch.column(0))
            for item in vc.to_pylist():
                key = item["values"]
                if key is None:
                    continue
                w = item["counts"]
                total += w
                if key in counters:
                    counters[key] += w
                elif len(counters) < capacity:
                    counters[key] = w
                else:
                    # weighted Space-Saving eviction: replace the minimum
                    # counter; the newcomer inherits its value (overestimate)
                    victim = min(counters, key=counters.get)
                    counters[key] = counters.pop(victim) + w
        if total:
            yield pa.RecordBatch.from_pydict(
                {
                    "key": [_TOTAL_KEY, *counters],
                    "w": [-total, *counters.values()],
                },
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
    top, total_df, partials = topk_sketch_plan(df, col, k, capacity)
    try:
        # The candidate union never touches the driver: it stays a
        # distributed DataFrame broadcast-joined against the corpus. At
        # 100 TB the union is partitions x capacity rows — routing it
        # through collect()/createDataFrame would be a multi-GB driver
        # round-trip; here only N (one scalar) and the k result rows land
        # on the driver. partials is persisted so the N-aggregate and the
        # candidate side share one corpus scan.
        total = total_df.first()["n_total"]
        rows = top.collect()  # k rows — driver-sized by construction
    finally:
        partials.unpersist()

    # Runtime certificate: the k-th exact count must clear N / capacity, else
    # a non-candidate key could in principle belong in the top-k.
    if len(rows) == k and rows[-1]["n"] * capacity <= total:
        raise ValueError(
            f"topk_exact_via_sketch: cannot certify exactness — k-th count "
            f"{rows[-1]['n']} <= N/capacity = {total}/{capacity}; raise "
            f"capacity."
        )
    return df.sparkSession.createDataFrame(rows, schema=top.schema)


def topk_sketch_plan(
    df: DataFrame, col: str, k: int, capacity: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the (top-k, total-N, persisted partials) plan triple.

    Exposed separately so plan-shape tests can assert the candidate side is
    scan-derived (MapInArrow in the lineage, no driver-side LocalTableScan).
    The caller owns unpersisting ``partials``.
    """
    partials = space_saving_partials(df, col, capacity).persist()
    # Negative-weight rows are the in-band partition totals; their sum is -N.
    total_df = partials.filter(F.col("w") < 0).agg(
        F.coalesce(-F.sum("w"), F.lit(0)).cast("bigint").alias("n_total")
    )
    # Candidate union stays distributed: tiny (partitions x capacity rows),
    # broadcast into a semi-join that prunes the recount map-side.
    candidates = partials.filter(F.col("w") > 0).select("key").distinct()
    exact = (
        df.join(
            F.broadcast(candidates), df[col] == candidates["key"], "leftsemi"
        )
        .groupBy(F.col(col).alias("word"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    top = exact.orderBy(F.col("n").desc(), "word").limit(k)
    return top, total_df, partials
