"""Input validation helpers (reference security/validation.py, 613 LoC of
per-field checks — condensed to the validators the control stack uses)."""

from __future__ import annotations

import re
from typing import Iterable, Sequence

import numpy as np

from dart_planner_tpu.common.errors import ValidationError

_IDENT_RE = re.compile(r"^[A-Za-z0-9_.-]{1,64}$")


def validate_identifier(value: str, name: str = "identifier") -> str:
    """Safe machine identifiers: alnum/underscore/dot/dash, <= 64 chars."""
    if not isinstance(value, str) or not _IDENT_RE.match(value):
        raise ValidationError(f"invalid {name}: {value!r}")
    return value


def validate_position(
    value,
    name: str = "position",
    max_abs: float = 10_000.0,
) -> np.ndarray:
    """Finite 3-vector within a sane envelope."""
    arr = np.asarray(value, dtype=float)
    if arr.shape != (3,):
        raise ValidationError(f"{name} must be a 3-vector, got shape {arr.shape}")
    if not np.isfinite(arr).all():
        raise ValidationError(f"{name} contains non-finite values")
    if np.any(np.abs(arr) > max_abs):
        raise ValidationError(f"{name} outside +-{max_abs} m envelope")
    return arr


def validate_waypoints(
    waypoints: Iterable, max_count: int = 1000
) -> list[np.ndarray]:
    """A bounded list of valid positions."""
    out = []
    for i, wp in enumerate(waypoints):
        if i >= max_count:
            raise ValidationError(f"more than {max_count} waypoints")
        pos = wp.get("position") if isinstance(wp, dict) else wp
        out.append(validate_position(pos, name=f"waypoint[{i}]"))
    if not out:
        raise ValidationError("empty waypoint list")
    return out
