"""Bucketed-orderkey experiment for tpch_q5/q10 (VERDICT round-5 #3).

The one structural lever not yet pulled on the two unresolved perf labels:
both queries' dominant exchange is the lineitem ⋈ orders join on the
orderkey. Bucketing BOTH tables on that key (operators/sink.py
write_bucketed) makes the join Exchange-free — the storage-layout
co-location a real 100 TB deployment would provision. This script measures
the registered parquet-scan variant against an otherwise-identical
bucketed-table variant, interleaved with the DuckDB oracle on the same
replicated data, so all three numbers share one process and one host load.

ROUND-6 FINDING (ran at 64x, idle host): NEGATIVE for these two queries at
this scale. Bucketed scans engage (`Bucketed: true` in the FileScan), but
(a) the q10 decomposition shows the orderkey exchange itself is only
~0.5 s of the 2.1 s SHUFFLED-HASH plan (the round-6 q10 rewrite) — the
rest is the 13M-row scan + probe, which bucketing cannot reduce — and
(b) without table stats the in-memory catalog mis-sizes the bucketed
side and Catalyst broadcast a 9.6M-row orders relation (9.3 s, 4x worse
than the hint plan). Bucketing remains the right lever when the join is
exchange-DOMINATED (many repeated joins over the same co-located key at
cluster scale, amortizing the bucketed write); for these single-pass
queries the shuffled-hash hint captures nearly all of it with no layout
precondition. Kept as the runnable record of that measurement.

Usage: python examples/bench_bucketed.py [--mult-fact 64] [--buckets 32]
Prints one JSON line per (query, variant).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from examples.bench_scaleup import build_replicas  # noqa: E402


def q5_from(spark, li, od, t):
    """tpch_q5 body over explicit lineitem/orders DataFrames (same plan
    as queries/relational.py q_tpch_q5, parameterized for the A/B)."""
    from pyspark.sql import functions as F

    r = t["region"].filter(F.col("r_name") == "ASIA")
    n = t["nation"].join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    s = t["supplier"].join(n, F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    rev4 = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    l_asia = li.join(s, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "l_orderkey", "s_nationkey", "n_name", rev4.alias("rev4")
    )
    o_cust = od.join(t["customer"], F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "c_nationkey"
    )
    return (
        l_asia.join(
            o_cust,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            (
                F.sum("rev4").cast("decimal(38,0)")
                * F.lit("0.0001").cast("decimal(4,4)")
            ).cast("double").alias("revenue")
        )
    )


def q10_from(spark, li, od, t):
    """tpch_q10 body (same plan as the registered query) over explicit
    lineitem/orders DataFrames; no hash hint — the point of the bucketed
    variant is that the layout itself deletes the exchange."""
    from pyspark.sql import functions as F

    rev4 = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    per_cust = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", rev4.alias("rev4"))
        .join(od.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            (
                F.sum("rev4").cast("decimal(38,0)")
                * F.lit("0.0001").cast("decimal(4,4)")
            ).cast("double").alias("revenue")
        )
    )
    return (
        per_cust.join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--mult-fact", type=int, default=64)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    dst = f"/tmp/scaleup_f{args.mult_fact}_d1"
    if not Path(dst, "lineitem.parquet").exists():
        print(f"building replicas in {dst} ...", file=sys.stderr)
        build_replicas(args.src, dst, args.mult_fact, 1)

    import duckdb

    from datafusion_flight_sql_server_spark.engine.session import build_session
    from datafusion_flight_sql_server_spark.operators.sink import write_bucketed
    from datafusion_flight_sql_server_spark.queries import REGISTRY
    from datafusion_flight_sql_server_spark.queries.catalog import tables

    wh = f"/tmp/bucketed_wh_f{args.mult_fact}_b{args.buckets}"
    spark = build_session(
        app_name="bench_bucketed",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.sql.warehouse.dir": wh,
            "spark.sql.sources.bucketing.autoBucketedScan.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = tables(spark, dst)

    li_tbl, od_tbl = f"li_b{args.buckets}", f"od_b{args.buckets}"
    if not spark.catalog.tableExists(li_tbl):
        print("bucketing lineitem/orders ...", file=sys.stderr)
        write_bucketed(
            t["lineitem"], li_tbl, "l_orderkey", args.buckets,
            sort_cols=["l_orderkey"],
        )
        write_bucketed(
            t["orders"], od_tbl, "o_orderkey", args.buckets,
            sort_cols=["o_orderkey"],
        )

    li_b, od_b = spark.table(li_tbl), spark.table(od_tbl)

    duck = duckdb.connect()
    for f in sorted(Path(dst).glob("*.parquet")):
        duck.execute(f"CREATE VIEW {f.stem} AS SELECT * FROM read_parquet('{f}')")

    cases = []
    for qname, builder in (("tpch_q5_local_supplier", q5_from),
                           ("tpch_q10_returned_items", q10_from)):
        cases.append((qname, "parquet", lambda b=builder: b(spark, t["lineitem"], t["orders"], t)))
        cases.append((qname, "bucketed", lambda b=builder: b(spark, li_b, od_b, t)))

    # exchange-count sanity: the bucketed plan must drop the orderkey shuffle
    for qname, variant, make in cases:
        plan = make()._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange hashpartitioning")
        print(json.dumps({"query": qname, "variant": variant,
                          "exchanges_in_initial_plan": n_ex}), file=sys.stderr)

    results = {(q, v): {"spark": []} for q, v, _ in cases}
    oracle_s = {}
    for qname, variant, make in cases:  # warm-up
        make().toArrow()
    for qname in ("tpch_q5_local_supplier", "tpch_q10_returned_items"):
        duck.execute(REGISTRY[qname].oracle).fetchdf()
    for _ in range(args.runs):
        for qname, variant, make in cases:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            make().toArrow()
            results[(qname, variant)]["spark"].append(time.perf_counter() - t0)
        for qname in ("tpch_q5_local_supplier", "tpch_q10_returned_items"):
            t0 = time.perf_counter()
            duck.execute(REGISTRY[qname].oracle).fetchdf()
            oracle_s.setdefault(qname, []).append(time.perf_counter() - t0)

    for (qname, variant), r in results.items():
        s = round(statistics.median(r["spark"]), 3)
        d = round(statistics.median(oracle_s[qname]), 3)
        print(json.dumps({
            "query": qname, "variant": variant, "spark_sec": s,
            "duck_sec": d, "ratio": round(s / d, 2),
            "mult_fact": args.mult_fact, "buckets": args.buckets,
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
