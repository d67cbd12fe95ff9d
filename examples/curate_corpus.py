"""End-to-end corpus curation example.

Demonstrates the training-data pipeline path of this engine on the test
fixtures: quality/dedup signals -> gated, weight-sampled corpus -> Z-order
clustered parquet ready for the next job — all as declarative Spark plans
(no collect in the data path).

Run: python examples/curate_corpus.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from datafusion_flight_sql_server_spark.engine.session import build_session
    from datafusion_flight_sql_server_spark.operators.sink import write_zorder
    from datafusion_flight_sql_server_spark.queries import REGISTRY

    spark = build_session(app_name="curate-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. the one-job curation pipeline: substring-dup gate -> unigram-LM
    #    gate -> weighted priority sample (see pipeline_q.py for the plan)
    curated = REGISTRY["pipeline_curate_v3"].fn(spark, sf_dir)
    print("curated sample (first 5 rows):")
    for row in curated.limit(5).collect():
        print(" ", row.asDict())

    # 2. diagnostics a curation run should ship with
    for name in ("corpus_drift", "dedup_source_overlap", "agg_topk_sketch"):
        df = REGISTRY[name].fn(spark, sf_dir)
        print(f"{name}: {df.count()} rows; sample: {df.limit(2).collect()}")

    # 3. materialize the curated ids Z-order-clustered on (doc_id, n_chars)
    #    so downstream readers skip files on either key
    out = str(Path(tempfile.gettempdir()) / "curated_corpus_zorder")
    write_zorder(curated, out, "doc_id", "n_chars", n_buckets=4)
    back = spark.read.parquet(out)
    print(f"z-ordered output: {back.count()} rows in {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
