"""Declared operator/query catalog (SURVEY.md §2).

Importing this package populates :data:`REGISTRY`; ``__spark_entry__.py``
derives ``queries()`` and ``oracle_sql()`` from it.
"""

from datafusion_flight_sql_server_spark.queries.catalog import REGISTRY, QuerySpec, query

# Register all query modules (import side effects populate REGISTRY).
from datafusion_flight_sql_server_spark.queries import relational  # noqa: F401
from datafusion_flight_sql_server_spark.queries import functions_q  # noqa: F401
from datafusion_flight_sql_server_spark.queries import windows_q  # noqa: F401
from datafusion_flight_sql_server_spark.queries import extensions  # noqa: F401

__all__ = ["REGISTRY", "QuerySpec", "query"]
