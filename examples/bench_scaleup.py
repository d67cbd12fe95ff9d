"""Scale-up bench for the floor-bound "weak" queries (VERDICT round-5 #5).

The six queries whose bench ratio exceeds 2× all sit on sub-second DuckDB
baselines at sf0.1 — below Spark's measured ~0.1 s per-query floor, where
the ratio measures scheduling constants, not plan quality. This experiment
replicates the fact tables with shifted keys (facts grow, dims don't — the
real 100 TB shape) until the baselines do >=1 s of work, then re-measures
both engines on the SAME files, interleaved, median of N.

Layout: each replicated table is ONE parquet file whose row groups are the
replicas (64 x ~100 MB for lineitem) — splittable like real data, unlike
the single-row-group driver fixtures, while keeping the registry's
file-per-table contract.

Usage:  python examples/bench_scaleup.py [--mult-fact 64] [--mult-docs 32]
Prints one JSON line per query: spark_sec, duck_sec, ratio.
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

WEAK = (
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume",
    "agg_group_multi",
    "window_running",
    "fn_explode",
    "text_lm_unigram",
)

#: per-table replication: facts grow with the multiplier, dims are copied.
#: Fact keys share ONE shift (max o_orderkey + 1) so the orderkey join
#: stays replica-local; documents shift independently on doc_id.
FACT_KEYS = {"lineitem": ["l_orderkey"], "orders": ["o_orderkey"]}
DOC_KEYS = {"documents": ["doc_id"]}
COPY = ("customer", "supplier", "nation", "region", "part", "events", "embeddings")


def build_replicas(src: str, dst: str, mult_fact: int, mult_docs: int) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = Path(dst)
    out.mkdir(parents=True, exist_ok=True)
    # orderkey shift must be SHARED between orders and lineitem so the
    # orderkey join stays replica-local
    orders = pq.read_table(f"{src}/orders.parquet")
    off_orders = pc.max(orders.column("o_orderkey")).as_py() + 1

    def replicate(name: str, keys: list[str], off: int, mult: int) -> None:
        tbl = pq.read_table(f"{src}/{name}.parquet")
        target = out / f"{name}.parquet"
        writer = pq.ParquetWriter(str(target), tbl.schema)
        for i in range(mult):
            shifted = tbl
            for key in keys:
                col = shifted.column(key)
                idx = shifted.schema.get_field_index(key)
                shifted = shifted.set_column(
                    idx,
                    shifted.schema.field(key),
                    pc.add(col, pa.scalar(i * off, type=col.type)),
                )
            writer.write_table(shifted)  # one row group per replica
        writer.close()

    for name, keys in FACT_KEYS.items():
        replicate(name, keys, off_orders, mult_fact)
    for name, keys in DOC_KEYS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        off = pc.max(t.column(keys[0])).as_py() + 1
        replicate(name, keys, off, mult_docs)
    for name in COPY:
        shutil.copy(f"{src}/{name}.parquet", out / f"{name}.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--mult-fact", type=int, default=64)
    ap.add_argument("--mult-docs", type=int, default=32)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--dst", default=None)
    ap.add_argument(
        "--queries",
        nargs="+",
        default=None,
        help="registered query names to measure (default: the WEAK set)",
    )
    args = ap.parse_args()
    dst = args.dst or f"/tmp/scaleup_f{args.mult_fact}_d{args.mult_docs}"
    if not Path(dst, "lineitem.parquet").exists():
        print(f"building replicas in {dst} ...", file=sys.stderr)
        build_replicas(args.src, dst, args.mult_fact, args.mult_docs)

    import duckdb

    from datafusion_flight_sql_server_spark.engine.session import build_session
    from datafusion_flight_sql_server_spark.queries import REGISTRY
    from datafusion_flight_sql_server_spark.queries.catalog import (
        run_query_cleanups,
    )

    spark = build_session(
        app_name="bench_scaleup",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    duck = duckdb.connect()
    for f in sorted(Path(dst).glob("*.parquet")):
        duck.execute(
            f"CREATE VIEW {f.stem} AS SELECT * FROM read_parquet('{f}')"
        )

    wanted = tuple(args.queries) if args.queries else WEAK
    unknown = [n for n in wanted if n not in REGISTRY]
    if unknown:
        ap.error(f"not registered queries: {', '.join(unknown)}")
    names = list(wanted)
    results: dict[str, dict] = {n: {"spark": [], "duck": []} for n in names}
    # warm-up both engines once per query, then interleave timed runs so
    # co-tenant noise hits both engines alike
    for name in names:
        spec = REGISTRY[name]
        spec.fn(spark, dst).toArrow()
        run_query_cleanups()
        duck.execute(spec.oracle).fetchdf()
    for _ in range(args.runs):
        for name in names:
            spec = REGISTRY[name]
            spark.catalog.clearCache()
            run_query_cleanups()
            t0 = time.perf_counter()
            n_rows = spec.fn(spark, dst).toArrow().num_rows
            results[name]["spark"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            d_rows = len(duck.execute(spec.oracle).fetchdf())
            results[name]["duck"].append(time.perf_counter() - t0)
            results[name]["rows"] = (n_rows, d_rows)

    for name in names:
        s = round(statistics.median(results[name]["spark"]), 3)
        d = round(statistics.median(results[name]["duck"]), 3)
        print(
            json.dumps(
                {
                    "query": name,
                    "spark_sec": s,
                    "duck_sec": d,
                    "ratio": round(s / d, 2) if d else None,
                    "rows": results[name]["rows"],
                    "mult_fact": args.mult_fact,
                    "mult_docs": args.mult_docs,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
