"""Dump EXECUTED physical plans (SQL-tab plan descriptions) for a query.

For queries that return a localCheckpoint'ed DataFrame the logical plan of
the handle is just a checkpoint scan; the real plans ran inside the build.
This collects every SQL execution the query triggered via the UI REST API.

Usage: python examples/dump_exec_plans_r14.py <out_file> <query>
"""

from __future__ import annotations

import json
import sys
import urllib.request
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from datafusion_flight_sql_server_spark.engine.session import build_session
from datafusion_flight_sql_server_spark.queries import REGISTRY
from datafusion_flight_sql_server_spark.queries.catalog import run_query_cleanups


def main() -> int:
    out_file = Path(sys.argv[1])
    name = sys.argv[2]
    sf_dir = "/root/testdata/sf0.1"
    data_dir = str(Path("/tmp") / f"bench_presplit_{Path(sf_dir).name}")
    spark = build_session(
        app_name="dump_exec_plans_r14",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def _rest(path):
        with urllib.request.urlopen(
            f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/{path}"
        ) as r:
            return json.load(r)

    before_ids = {x["id"] for x in _rest("sql?length=1000")}
    REGISTRY[name].fn(spark, data_dir).toArrow()
    run_query_cleanups()
    chunks = []
    for x in _rest("sql?length=1000&planDescription=true"):
        if x["id"] in before_ids:
            continue
        chunks.append(
            f"== SQL execution {x['id']}: {x.get('description', '')[:120]}\n"
            + x.get("planDescription", "")
            + "\n"
        )
    out_file.write_text("\n".join(chunks))
    print(f"wrote {out_file} ({sum(len(c) for c in chunks)} chars, "
          f"{len(chunks)} executions)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
