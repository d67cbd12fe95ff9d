"""Per-request session policy.

Clone of the reference's ``SessionStateProvider`` trait and its static
default (reference: datafusion-flight-sql-server/src/session.rs:9-31,
service.rs:133-151): every RPC asks the provider for the session to run
under, passing the request headers — the hook for auth and multi-tenancy.

Divergence note (declared): the reference's default provider clones a static
``SessionState``, which carries registered tables into the per-request copy.
Spark's cheap clone (``spark.newSession()``) does NOT inherit temp views, so
the static provider here returns the *shared* base engine — same visibility
semantics as the reference (all requests see the registered tables), at the
cost of shared temp-view namespace across requests. A multi-tenant deployment
supplies its own provider returning isolated sessions with re-registered (or
global) views.
"""

from __future__ import annotations

from typing import Mapping, Protocol, Sequence

from datafusion_flight_sql_server_spark.engine.core import Engine


class SessionStateProvider(Protocol):
    """Request headers → Engine (session.rs:9-12 analogue)."""

    def engine_for_request(self, headers: Mapping[str, Sequence[str]]) -> Engine:
        ...


class StaticSessionStateProvider:
    """Default provider: one shared engine for every request
    (session.rs:16-31 analogue)."""

    def __init__(self, engine: Engine):
        self._engine = engine

    def engine_for_request(self, headers: Mapping[str, Sequence[str]]) -> Engine:
        return self._engine
