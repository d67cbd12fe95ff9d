"""Spark-only sf0.1 → sf1 scaling slopes for the heavy four (VERDICT r9 #5).

graph_triangles, dedup_ngram_jaccard, dedup_near_clusters and
graph_components_star were excluded from the round-9 sf1 oracle audit
because their DuckDB sides would take minutes-to-hours. Their SPARK
scaling still needs pinning: this script times each query at sf0.1 and
at sf1 (examples/gen_scaled_sf.py output — 10x join-preserving
replication) in ONE process with ONE session (sf1-proportional knobs:
4 MiB scan splits, 32 shuffle partitions, applied to BOTH scales so the
slope is data-only), and prints per-query wall-clocks plus the scaling
exponent  log10(t_sf1 / t_sf0.1)  — 1.0 = linear in the 10x data,
>1 superlinear.

Expected shapes (documented before measuring): the lang x length-blocked
ngram join and the banded near-dup clustering are ~linear (candidate
pairs scale with duplicate density, which gen_scaled_sf replicates
proportionally); star-contraction components are ~linear with an
O(log n) round count (round count should NOT grow — replication adds
disjoint component copies, not diameter); the degree-ordered wedge join
of triangles is the superlinear candidate (worst case m^1.5 — but
replication creates disjoint copies, so the wedge space should scale
~linearly rather than by the m^1.5 bound; a superlinear surprise here
means the blocking leaks across replicas).

Protocol: 1 warm-up + median of 3 timed runs at sf0.1, 1 warm-up +
median of 2 timed at sf1 (each sf1 run is minutes; the slope does not
need a third sample). Fresh DataFrame per run (AQE reuse trap),
clearCache + query cleanups between runs. Idle host required.

Usage: python examples/bench_heavy_scaling.py [SF1_DIR] [SF01_DIR]
       (defaults: /tmp/sf1 /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from datafusion_flight_sql_server_spark.engine.session import build_session
from datafusion_flight_sql_server_spark.queries import REGISTRY
from datafusion_flight_sql_server_spark.queries.catalog import (
    run_query_cleanups,
)

QUERIES = tuple(
    q.strip()
    for q in os.environ.get(
        # round 13 (VERDICT r12 #3): the same protocol pins the as-of trio
        # (union + window carry, single shuffle — predicted ~linear) via
        #   SPARK_GRAFT_SCALING_QUERIES=event_asof_join,event_asof_join_strict,event_asof_nearest
        "SPARK_GRAFT_SCALING_QUERIES",
        "dedup_ngram_jaccard,dedup_near_clusters,"
        "graph_components_star,graph_triangles",
    ).split(",")
    if q.strip()
)

#: overridable so the recorded protocol reproduces off this host
#: (argv[2]; $SPARK_GRAFT_SF_DIR-style fixtures elsewhere)
SF01 = "/root/testdata/sf0.1"


def _timed(spark, name: str, sf_dir: str, runs: int) -> float:
    times = []
    for _ in range(1 + runs):  # first is warm-up
        run_query_cleanups()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).toArrow()
        times.append(time.perf_counter() - t0)
    return statistics.median(times[1:])


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    sf01 = sys.argv[2] if len(sys.argv) > 2 else SF01
    spark = build_session(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 << 20)},
    )
    rows = {}
    for name in QUERIES:
        t01 = _timed(spark, name, sf01, runs=3)
        t1 = _timed(spark, name, sf1, runs=2)
        slope = math.log10(t1 / t01)
        rows[name] = {
            "sf0.1_sec": round(t01, 2),
            "sf1_sec": round(t1, 2),
            "exponent": round(slope, 2),
        }
        print(
            f"{name:24s} sf0.1 {t01:7.2f} s   sf1 {t1:8.2f} s   "
            f"10^x exponent {slope:5.2f}",
            flush=True,
        )
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
