"""Dump .explain('formatted') for queries through the bench session confs.

Usage: python examples/dump_plan_r14.py <out_dir> <suffix> <query> [...]
Writes <out_dir>/<query>_<suffix>.txt for each query (presplit layout).
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from datafusion_flight_sql_server_spark.engine.session import build_session
from datafusion_flight_sql_server_spark.queries import REGISTRY
from datafusion_flight_sql_server_spark.queries.catalog import run_query_cleanups


def main() -> int:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = "/root/testdata/sf0.1"
    data_dir = str(Path("/tmp") / f"bench_presplit_{Path(sf_dir).name}")
    spark = build_session(
        app_name="dump_plan_r14",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
            "spark.sql.shuffle.partitions": "8",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, data_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")
        run_query_cleanups()
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
