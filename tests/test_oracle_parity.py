"""Local replica of the driver's correctness gate: every declared query runs
on Spark AND its oracle SQL runs on DuckDB over the same sf0.001 parquet;
row counts, column names, and values must match (exact for non-floats,
bit-exact for floats too — the decimal-cast discipline makes float results
order-independent)."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_SMALL


def _normalize(df):
    """Sort columns by name and rows by all columns → comparable list."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # unify NaN/None representation
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # numpy types → python
    try:
        import numpy as np

        if isinstance(a, np.generic):
            a = a.item()
        if isinstance(b, np.generic):
            b = b.item()
    except ImportError:
        pass
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return str(a) == str(b)


def _compare(spark_pdf, duck_pdf, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    s = _normalize(spark_pdf)
    d = _normalize(duck_pdf)
    for col in s.columns:
        sk, dk = s[col].dtype.kind, d[col].dtype.kind
        assert (sk == dk) or {sk, dk} <= {"i", "u"} or {sk, dk} <= {"O", "b"}, (
            f"{name}: column {col!r} dtype kind {s[col].dtype} != oracle {d[col].dtype}"
        )
    for col in s.columns:
        sv, dv = list(s[col]), list(d[col])
        mismatches = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, dv)) if not _values_equal(x, y)
        ]
        assert not mismatches, (
            f"{name}: column {col!r} first mismatches {mismatches[:5]} "
            f"({len(mismatches)} total)"
        )


def _query_names():
    from datafusion_flight_sql_server_spark.queries import REGISTRY

    return sorted(REGISTRY)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    from datafusion_flight_sql_server_spark.queries import REGISTRY

    from datafusion_flight_sql_server_spark.queries.catalog import (
        run_query_cleanups,
    )

    spec = REGISTRY[name]
    try:
        sdf = spec.fn(spark, SF_SMALL)
        spark_pdf = sdf.toPandas()
    finally:
        # release persisted intermediates (e.g. text_bigram_lm's pair cache)
        # so the shared sweep session doesn't accumulate cached partitions
        run_query_cleanups()
    assert spark_pdf is not None
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check, like the driver
        return
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    _compare(spark_pdf, duck_pdf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_registry_oracle_coverage():
    """Every query has an oracle unless explicitly tagged approximate/
    non-SQL; names are unique and non-empty."""
    from datafusion_flight_sql_server_spark.queries import REGISTRY

    assert len(REGISTRY) >= 40, f"expected broad coverage, got {len(REGISTRY)}"
    missing = [
        n
        for n, s in REGISTRY.items()
        if s.oracle is None and "approx" not in s.tags and "nosql" not in s.tags
    ]
    assert not missing, f"queries without oracle and without approx/nosql tag: {missing}"


def test_priority_names_all_registered():
    """Every name in the verification-priority list must exist in the
    registry — a typo would silently burn one of the driver's 50
    correctness slots on a missing query."""
    from datafusion_flight_sql_server_spark.queries import REGISTRY, _PRIORITY

    stale = [n for n in _PRIORITY if n not in REGISTRY]
    assert not stale, f"priority names not in registry: {stale}"
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate priority names"
