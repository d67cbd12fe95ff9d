"""Bearer-token auth middleware.

Clone of the reference's documented auth pattern (reference:
examples/bearer_auth_flight_sql.rs:49-75,95-114): an interceptor validates
``Authorization: Bearer <token>`` before any handler runs and attaches the
authenticated principal for downstream use; the handshake endpoint stays
unimplemented by design (service.rs:198-207 — "favor middleware over
handshake").
"""

from __future__ import annotations

import pyarrow.flight as fl


class BearerAuthMiddleware(fl.ServerMiddleware):
    """Carries the authenticated principal (UserData extension analogue)."""

    def __init__(self, principal: str):
        self.principal = principal


class BearerAuthMiddlewareFactory(fl.ServerMiddlewareFactory):
    """Rejects calls without the expected bearer token
    (bearer_auth_flight_sql.rs:49-75)."""

    def __init__(self, token: str, principal: str = "user"):
        self._expected = f"Bearer {token}"
        self._principal = principal

    def start_call(self, info, headers):
        for key in ("authorization", "Authorization"):
            for value in headers.get(key, ()):  # gRPC lowercases in practice
                if value == self._expected:
                    return BearerAuthMiddleware(self._principal)
        raise fl.FlightUnauthenticatedError("valid bearer token required")
