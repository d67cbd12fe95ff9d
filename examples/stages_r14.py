"""Per-stage breakdown of ONE query (bench session confs, presplit data).

Usage: python examples/stages_r14.py <query> [--asgiven] [--runs N]
Prints wall per run, then the last run's stages sorted by executorRunTime.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from datafusion_flight_sql_server_spark.engine.session import build_session
from datafusion_flight_sql_server_spark.queries import REGISTRY
from datafusion_flight_sql_server_spark.queries.catalog import run_query_cleanups


def main() -> int:
    args = sys.argv[1:]
    runs = 2
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = "/root/testdata/sf0.1"
    data_dir = str(Path("/tmp") / f"bench_presplit_{Path(sf_dir).name}")
    if "--asgiven" in args:
        args.remove("--asgiven")
        data_dir = sf_dir
    name = args[0]

    spark = build_session(
        app_name="stages_r14",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import urllib.request

    def _rest(path):
        with urllib.request.urlopen(
            f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/{path}"
        ) as r:
            return json.load(r)

    jvm_pid = spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()
    print(f"JVM PID {jvm_pid}", flush=True)
    spark.range(1).toArrow()
    fn = REGISTRY[name].fn
    fn(spark, data_dir).toArrow()  # warmup
    for r in range(runs):
        spark.catalog.clearCache()
        run_query_cleanups()
        time.sleep(2.0)  # cooldown: let AQE/cleaner threads drain
        before = {s["stageId"] for s in _rest("stages")}
        jobs_before = len(_rest("jobs"))
        la0 = Path("/proc/loadavg").read_text().split()[0]

        def _steal():
            f = Path("/proc/stat").read_text().splitlines()[0].split()
            return int(f[8])  # steal jiffies

        print(f"RUN {r} START", flush=True)
        st0 = _steal()
        t0 = time.perf_counter()
        fn(spark, data_dir).toArrow()
        dt = time.perf_counter() - t0
        steal_s = (_steal() - st0) / 100.0
        jobs_after = len(_rest("jobs"))
        print(
            f"== run {r}: wall {dt:.3f}s jobs {jobs_after - jobs_before} "
            f"loadavg_start {la0} steal {steal_s:.1f}s",
            flush=True,
        )
        stages = [
            s
            for s in _rest("stages?status=complete")
            if s["stageId"] not in before
        ]
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        tot_run = sum(s.get("executorRunTime", 0) for s in stages)
        tot_cpu = sum(s.get("executorCpuTime", 0) for s in stages)
        print(
            f"   stages {len(stages)}  executorRunTime {tot_run/1e3:.1f}s  "
            f"executorCpuTime {tot_cpu/1e9:.1f}s"
        )
        for s in stages[:12]:
            print(
                "   id=%d tasks=%d run=%.2fs cpu=%.2fs in=%.1fMB sh_r=%.1fMB "
                "sh_w=%.1fMB  %s"
                % (
                    s["stageId"],
                    s.get("numCompleteTasks", -1),
                    s.get("executorRunTime", 0) / 1e3,
                    s.get("executorCpuTime", 0) / 1e9,
                    s.get("inputBytes", 0) / 1e6,
                    s.get("shuffleReadBytes", 0) / 1e6,
                    s.get("shuffleWriteBytes", 0) / 1e6,
                    (s.get("name") or "")[:90],
                )
                + " gc=%.1fs" % (s.get("jvmGcTime", 0) / 1e3)
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
