"""A/B harness: connected_components_star variants (round 14+).

Same protocol as ab_components_r14.py: sf0.1 minhash pairs checkpointed
once, each variant timed over the same edges, labels checked against the
current implementation.

Usage: python examples/ab_star_r14.py [--runs N]
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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datafusion_flight_sql_server_spark.engine.session import build_session


def s0_current(edges: DataFrame):
    from datafusion_flight_sql_server_spark.operators.components import (
        connected_components_star,
    )

    return connected_components_star(edges, with_rounds=True)


def _star_round_window(e: DataFrame, large: bool, dedup: bool = True) -> DataFrame:
    """Window form: m = least(min(v) over (partition by u), u) — no join."""
    if large:
        nbrs = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
    else:
        nbrs = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
    w = Window.partitionBy("u")
    withm = nbrs.withColumn(
        "m", F.least(F.min("v").over(w), F.col("u"))
    )
    if large:
        out = withm.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    else:
        out = withm.select(
            F.explode(F.array("v", "u")).alias("u"), F.col("m").alias("v")
        )
    out = out.filter(F.col("u") != F.col("v"))
    return out.distinct() if dedup else out


def _run_star(edges: DataFrame, star_round, max_iter: int = 30):
    from pyspark.storagelevel import StorageLevel

    base = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = base.filter(F.col("u") != F.col("v"))
    nodes = base.select(F.explode(F.array("u", "v")).alias("node")).distinct()

    def fingerprint(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = fingerprint(e)
    rounds = 0
    for _ in range(max_iter):
        e = star_round(
            star_round(e, large=True, dedup=False), large=False
        ).localCheckpoint(eager=True)
        cur = fingerprint(e)
        rounds += 1
        if cur == prev:
            break
        prev = cur
    labels = (
        nodes.join(e, nodes["node"] == e["u"], "left")
        .select(
            "node", F.coalesce(F.col("v"), F.col("node")).alias("cluster_id")
        )
        .groupBy("node")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    result = labels.persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    return result, rounds


def s1_window(edges: DataFrame):
    return _run_star(edges, _star_round_window)


VARIANTS = [("s0_current", s0_current), ("s1_window", s1_window)]


def main() -> int:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = build_session(
        app_name="ab_star_r14",
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
        labels, rounds = fn(pairs)
        got = {(r["node"], r["cluster_id"]) for r in labels.collect()}
        try:
            labels.unpersist()
        except Exception:
            pass
        if ref is None:
            ref = got
            print(f"{name}: REFERENCE ({len(got)} nodes, {rounds} rounds)", flush=True)
        else:
            ok = got == ref
            print(f"{name}: labels {'MATCH' if ok else 'MISMATCH'} ({rounds} rounds)", flush=True)
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
