"""Round-14 measurement harness (guide §1): isolate queries with the bench
session confs over the PRESPLIT copy, report wall medians + structural
metrics (jobs, stages, executor CPU, shuffle bytes) from the status API.

Usage: python examples/profile_r14.py q1 [q2 ...] [--runs N] [--asgiven]
Writes nothing; prints one JSON line per query.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from datafusion_flight_sql_server_spark.engine.session import build_session
from datafusion_flight_sql_server_spark.queries import REGISTRY
from datafusion_flight_sql_server_spark.queries.catalog import run_query_cleanups


def _loadavg():
    return [float(x) for x in Path("/proc/loadavg").read_text().split()[:3]]


def main() -> int:
    args = [a for a in sys.argv[1:]]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = "/root/testdata/sf0.1"
    if "--asgiven" in args:
        args.remove("--asgiven")
        data_dir = sf_dir
    else:
        data_dir = str(Path("/tmp") / f"bench_presplit_{Path(sf_dir).name}")
    names = args

    spark = build_session(
        app_name="profile_r14",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "true",
            "spark.appStateStore.asyncTracking.enable": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    status = sc.statusTracker()

    import urllib.request

    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def _rest(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
            return json.load(r)

    spark.range(1).toArrow()  # session warm

    for name in names:
        fn = REGISTRY[name].fn
        # warmup
        fn(spark, data_dir).toArrow()
        spark.catalog.clearCache()
        run_query_cleanups()
        samples = []
        jobs_before = len(_rest("jobs"))
        for r in range(runs):
            spark.catalog.clearCache()
            run_query_cleanups()
            la0 = _loadavg()[0]
            t0 = time.perf_counter()
            n_rows = fn(spark, data_dir).toArrow().num_rows
            dt = time.perf_counter() - t0
            samples.append(dt)
        jobs_after = len(_rest("jobs"))
        # stage metrics for the LAST run window: pull all stages, aggregate
        stages = _rest("stages?status=complete")
        cpu_total = sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
        print(
            json.dumps(
                {
                    "query": name,
                    "rows": n_rows,
                    "wall_median": round(statistics.median(samples), 3),
                    "wall_all": [round(s, 3) for s in samples],
                    "jobs_per_run": round((jobs_after - jobs_before) / runs, 1),
                    "cum_executor_cpu_s": round(cpu_total, 1),
                    "loadavg": _loadavg()[0],
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
