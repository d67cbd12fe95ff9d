"""Query registry machinery.

Each entry pairs a Spark-first implementation (DataFrame API or Spark SQL)
with the equivalent ANSI SQL the DuckDB oracle runs on the same parquet
tables. Column names/aliases MUST match between the two — the driver sorts
columns by name before hashing values.

Exactness discipline (what makes the value-hash match):

- Sums/avgs over double columns are computed through ``DECIMAL(18,s)`` casts:
  decimal arithmetic is exact and order-independent, so Spark's parallel
  partial aggregation and DuckDB's sequential scan produce bit-identical
  results; the final cast back to DOUBLE is deterministic.
- Integer-valued doubles (l_quantity) are cast to BIGINT first.
- Computed integers are cast to BIGINT on BOTH sides (DuckDB widens most
  integer expressions to BIGINT/HUGEINT; Spark keeps INT — explicit casts
  align the schemas).
- Ranking functions get a unique total order (tie-break on a key column).
- Timestamps in outputs are reduced to DATE / epoch seconds / strings.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from datafusion_flight_sql_server_spark.engine.registry import register_sf_tables


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Register a query implementation under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            # a silent overwrite would REPLACE an already-driver-verified
            # operator with an unchecked twin (nearly happened round 5:
            # a new event_funnel shadowed the round-2 green one)
            raise ValueError(f"query {name!r} is already registered")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


# Deferred-unpersist registry: canonical home is engine/cleanup.py (so the
# operator library can register cleanups without importing queries/); the
# names are re-exported here because every harness imports them from the
# catalog.
from datafusion_flight_sql_server_spark.engine.cleanup import (  # noqa: F401
    register_query_cleanup,
    run_query_cleanups,
)


# Keyed on the live session object (not id()) so a garbage-collected session
# whose id is reused can never serve stale DataFrames bound to a dead JVM.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, tuple[str, dict[str, DataFrame]]]" = (
    weakref.WeakKeyDictionary()
)


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load + register the scale-factor tables once per (session, dir).

    If the caller switches sf_dir within one session, the temp views are
    re-registered so SQL-based queries see the same tables as DataFrame-based
    ones.
    """
    cached = _TABLE_CACHE.get(spark)
    if cached is None or cached[0] != sf_dir:
        cached = (sf_dir, register_sf_tables(spark, sf_dir))
        _TABLE_CACHE[spark] = cached
    return cached[1]
