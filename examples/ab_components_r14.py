"""A/B harness: connected_components propagation variants (round 14+).

Isolates the propagation loop from the minhash front end: the sf0.1 pair
list is built once and localCheckpointed, then each variant runs over the
same materialized edges. Reports wall / jobs / rounds per run and checks
every variant's labels against V0.

Usage: python examples/ab_components_r14.py [--runs N]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from datafusion_flight_sql_server_spark.engine.session import build_session


def v0_current(edges: DataFrame) -> tuple[DataFrame, int]:
    """Baseline: operators/components.py connected_components (self-loop
    join, one neighbor-min step per action)."""
    from datafusion_flight_sql_server_spark.operators.components import (
        connected_components,
    )

    return connected_components(edges), -1


def _sym_labels(edges: DataFrame):
    e = edges.select(F.col("src").alias("src"), F.col("dst").alias("dst"))
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
    return sym, labels


def _loop(selfed, labels, step, max_iter=25):
    rounds = 0
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        new_labels = step(selfed, labels).persist(StorageLevel.MEMORY_AND_DISK)
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        rounds += 1
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels, rounds


def v1_jump(edges: DataFrame) -> tuple[DataFrame, int]:
    """Pointer-jump: each round takes min over label(label(neighbor))."""
    sym, labels = _sym_labels(edges)
    selfed = (
        sym.unionByName(
            labels.select(F.col("node").alias("src"), F.col("node").alias("dst"))
        )
    ).persist(StorageLevel.MEMORY_AND_DISK)

    def step(selfed, lbl):
        l2 = lbl.select(F.col("node").alias("jn"), F.col("label").alias("jl"))
        return (
            selfed.join(lbl, selfed["dst"] == lbl["node"])
            .join(l2, F.col("label") == F.col("jn"))
            .groupBy("src")
            .agg(F.min("jl").alias("label"))
            .select(F.col("src").alias("node"), "label")
        )

    labels, rounds = _loop(selfed, labels, step)
    selfed.unpersist()
    sym.unpersist()
    return labels.select("node", F.col("label").alias("cluster_id")), rounds


def v2_jump_partitioned(edges: DataFrame) -> tuple[DataFrame, int]:
    """V1 + selfed persisted hash-partitioned by src: in the broadcast
    regime the round's groupBy reuses the cached partitioning (no
    exchange)."""
    sym, labels = _sym_labels(edges)
    selfed = (
        sym.unionByName(
            labels.select(F.col("node").alias("src"), F.col("node").alias("dst"))
        )
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def step(selfed, lbl):
        l2 = lbl.select(F.col("node").alias("jn"), F.col("label").alias("jl"))
        return (
            selfed.join(F.broadcast(lbl), selfed["dst"] == lbl["node"])
            .join(F.broadcast(l2), F.col("label") == F.col("jn"))
            .groupBy("src")
            .agg(F.min("jl").alias("label"))
            .select(F.col("src").alias("node"), "label")
        )

    labels, rounds = _loop(selfed, labels, step)
    selfed.unpersist()
    sym.unpersist()
    return labels.select("node", F.col("label").alias("cluster_id")), rounds


def v3_nojump_partitioned(edges: DataFrame) -> tuple[DataFrame, int]:
    """Current step shape + src-partitioned selfed (isolates the
    partitioning win from the jump win)."""
    sym, labels = _sym_labels(edges)
    selfed = (
        sym.unionByName(
            labels.select(F.col("node").alias("src"), F.col("node").alias("dst"))
        )
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def step(selfed, lbl):
        return (
            selfed.join(F.broadcast(lbl), selfed["dst"] == lbl["node"])
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .select(F.col("src").alias("node"), "label")
        )

    labels, rounds = _loop(selfed, labels, step)
    selfed.unpersist()
    sym.unpersist()
    return labels.select("node", F.col("label").alias("cluster_id")), rounds


def v4_part_nohint(edges: DataFrame) -> tuple[DataFrame, int]:
    """V3 without the broadcast hint: the planner must pick the broadcast
    itself from the materialized labels' stats (the hint would force a
    broadcast attempt at 100 TB where labels cannot fit)."""
    sym, labels = _sym_labels(edges)
    selfed = (
        sym.unionByName(
            labels.select(F.col("node").alias("src"), F.col("node").alias("dst"))
        )
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def step(selfed, lbl):
        return (
            selfed.join(lbl, selfed["dst"] == lbl["node"])
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .select(F.col("src").alias("node"), "label")
        )

    labels, rounds = _loop(selfed, labels, step)
    selfed.unpersist()
    sym.unpersist()
    return labels.select("node", F.col("label").alias("cluster_id")), rounds


VARIANTS = [
    ("v0_current", v0_current),
    ("v3_part_only", v3_nojump_partitioned),
    ("v4_part_nohint", v4_part_nohint),
]


def main() -> int:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = build_session(
        app_name="ab_components_r14",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def _jobs():
        with urllib.request.urlopen(
            f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/jobs"
        ) as r:
            return len(json.load(r))

    def _steal():
        return int(Path("/proc/stat").read_text().split("\n")[0].split()[8])

    from datafusion_flight_sql_server_spark.operators.dedup import (
        minhash_near_dups,
    )
    from datafusion_flight_sql_server_spark.queries.catalog import tables

    d = tables(spark, "/tmp/bench_presplit_sf0.1")["documents"]
    pairs = (
        minhash_near_dups(d)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    print(f"pairs: {pairs.count()} rows", flush=True)

    ref = None
    for name, fn in VARIANTS:
        # warmup + correctness check
        labels, rounds = fn(pairs)
        got = {(r["node"], r["cluster_id"]) for r in labels.collect()}
        try:
            labels.unpersist()
        except Exception:
            pass
        if ref is None:
            ref = got
            print(f"{name}: REFERENCE ({len(got)} labeled nodes)", flush=True)
        else:
            ok = got == ref
            print(f"{name}: labels {'MATCH' if ok else 'MISMATCH'}", flush=True)
            if not ok:
                continue
        walls = []
        for r in range(runs):
            time.sleep(1.0)
            j0, s0 = _jobs(), _steal()
            t0 = time.perf_counter()
            labels, rounds = fn(pairs)
            labels.collect()
            dt = time.perf_counter() - t0
            js, st = _jobs() - j0, (_steal() - s0) / 100.0
            try:
                labels.unpersist()
            except Exception:
                pass
            walls.append(dt)
            print(
                f"  {name} run {r}: wall {dt:.3f}s jobs {js} rounds {rounds}"
                f" steal {st:.1f}s",
                flush=True,
            )
        print(f"  {name}: min {min(walls):.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
