"""API gateway layer (reference ``src/dart_planner/gateway/``)."""

from dart_planner_tpu.gateway.middleware import (
    CSRFMiddleware,
    SecureMiddleware,
    SecurityHeadersMiddleware,
)

__all__ = ["CSRFMiddleware", "SecureMiddleware", "SecurityHeadersMiddleware"]
