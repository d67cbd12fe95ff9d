"""A/B harness: copurchase_triangles variants (round 14+).

Usage: python examples/ab_triangles_r14.py [--runs N]
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
from datafusion_flight_sql_server_spark.queries.catalog import (
    run_query_cleanups,
    tables,
)


def v0_current(li: DataFrame) -> DataFrame:
    from datafusion_flight_sql_server_spark.queries.mining_q import (
        copurchase_triangles,
    )

    return copurchase_triangles(li)


def _pairs(li: DataFrame):
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
    return baskets.select(F.explode(pair_structs).alias("uv")).select(
        F.col("uv.u").alias("u"), F.col("uv.v").alias("v")
    )


def _wide(df: DataFrame, *cols: str) -> DataFrame:
    sc = df.sparkSession.sparkContext
    max_width = 32 if sc.master.startswith("local") else sc.defaultParallelism
    shuffle_width = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "8")
    )
    target = min(max(shuffle_width, sc.defaultParallelism), max_width)
    return df.repartition(target, *[F.col(c) for c in cols])


def v1_wide_distinct(li: DataFrame) -> DataFrame:
    """Dedup pairs at compute width; o inherits it (no separate rebalance)."""
    raw = _pairs(li)
    e = _wide(raw, "u", "v").dropDuplicates(["u", "v"]).persist(
        StorageLevel.MEMORY_AND_DISK
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
    o = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj = (
        o.groupBy("s")
        .agg(F.collect_list("t").alias("nb"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj.count()
    adj_s = adj.select(F.col("s"), F.col("nb").alias("nb_s"))
    adj_t = adj.select(F.col("s").alias("t"), F.col("nb").alias("nb_t"))
    tri = (
        o.join(adj_s, "s")
        .join(adj_t, "t")
        .select(F.size(F.array_intersect("nb_s", "nb_t")).alias("c"))
        .agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_triangles")
        )
    )
    counts = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    ).crossJoin(e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges")))
    out = counts.crossJoin(F.broadcast(tri)).select(
        "n_nodes", "n_edges", "n_triangles"
    )
    out._ab_cleanup = (e, o, adj)
    return out


def v2_explode_close(li: DataFrame) -> DataFrame:
    """v1 + the close reads adj exploded in place; o is referenced once
    (inside the adj build) and never persisted."""
    raw = _pairs(li)
    e = _wide(raw, "u", "v").dropDuplicates(["u", "v"]).persist(
        StorageLevel.MEMORY_AND_DISK
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
    o = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    adj = (
        o.groupBy("s")
        .agg(F.collect_list("t").alias("nb"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj.count()
    edges_with_nbs = adj.select(
        F.col("s"), F.col("nb").alias("nb_s"), F.explode("nb").alias("t")
    )
    adj_t = adj.select(F.col("s").alias("t"), F.col("nb").alias("nb_t"))
    tri = (
        edges_with_nbs.join(adj_t, "t")
        .select(F.size(F.array_intersect("nb_s", "nb_t")).alias("c"))
        .agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_triangles")
        )
    )
    counts = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    ).crossJoin(e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges")))
    out = counts.crossJoin(F.broadcast(tri)).select(
        "n_nodes", "n_edges", "n_triangles"
    )
    out._ab_cleanup = (e, adj)
    return out


VARIANTS = [
    ("v0_current", v0_current),
    ("v1_wide_distinct", v1_wide_distinct),
    ("v2_explode_close", v2_explode_close),
]


def main() -> int:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = build_session(
        app_name="ab_triangles_r14",
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

    def li():
        return (
            tables(spark, "/tmp/bench_presplit_sf0.1")["lineitem"]
            .select(
                F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
            )
            .distinct()
        )

    def _cleanup(df):
        for rel in getattr(df, "_ab_cleanup", ()):  # noqa: B009
            try:
                rel.unpersist()
            except Exception:
                pass
        spark.catalog.clearCache()
        run_query_cleanups()

    ref = None
    for name, fn in VARIANTS:
        out = fn(li())
        got = out.collect()[0].asDict()
        _cleanup(out)
        if ref is None:
            ref = got
            print(f"{name}: REFERENCE {got}", flush=True)
        else:
            ok = got == ref
            print(f"{name}: {'MATCH' if ok else 'MISMATCH ' + str(got)}", flush=True)
            if not ok:
                continue
        walls = []
        for r in range(runs):
            time.sleep(1.0)
            j0, s0 = _jobs(), _steal()
            t0 = time.perf_counter()
            out = fn(li())
            out.collect()
            dt = time.perf_counter() - t0
            js, st = _jobs() - j0, (_steal() - s0) / 100.0
            _cleanup(out)
            walls.append(dt)
            print(
                f"  {name} run {r}: wall {dt:.3f}s jobs {js} steal {st:.1f}s",
                flush=True,
            )
        print(f"  {name}: min {min(walls):.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
