"""embed_pca_power: the distributed integer pipeline must equal a local
numpy reference EXACTLY (Gram accumulation, ppm normalization, truncating
division) — hash parity vs DuckDB alone would accept two engines sharing
the same bug, not a correct computation."""

from __future__ import annotations

import numpy as np

from datafusion_flight_sql_server_spark.queries import REGISTRY
from datafusion_flight_sql_server_spark.queries.catalog import (
    run_query_cleanups,
)
from tests.conftest import SF_SMALL


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero (Spark DIV / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_matches_local_integer_reference(spark):
    try:
        rows = REGISTRY["embed_pca_power"].fn(spark, SF_SMALL).collect()
    finally:
        run_query_cleanups()
    got = {r.i: r.dir_ppm for r in rows}

    import pyarrow.parquet as pq

    emb = np.vstack(
        pq.read_table(f"{SF_SMALL}/embeddings.parquet")
        .column("embedding")
        .to_pylist()
    ).astype(np.float64)
    # int64 first, THEN object: floor().astype(object) would box float64
    # and the "exact" reference would accumulate in floating point
    q = np.floor(emb * 1_000_000).astype(np.int64).astype(object)
    gram = q.T @ q
    w = gram.sum(axis=1)
    mw = max(abs(int(x)) for x in w)
    u = np.array([_trunc_div(int(x) * 1_000_000, mw) for x in w], object)
    v = gram @ u
    mv = max(abs(int(x)) for x in v)
    expect = {
        i: _trunc_div(int(v[i]), mv // 1_000_000) for i in range(len(v))
    }

    assert got == expect
    # output contract: ppm of the largest |component|
    assert max(abs(x) for x in got.values()) == 1_000_000
