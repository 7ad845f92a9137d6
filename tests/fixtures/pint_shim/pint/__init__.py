"""Minimal pint stand-in: just enough for the reference DART-Planner
package (/root/reference) to import and run its SE(3) MPC planner so we
can record golden trajectories (VERDICT round-1 item 4).

The reference uses pint shallowly (common/units.py): quantities are
always constructed with the exact SI unit string that ``ensure_units``
later expects, ``.to()`` is therefore an identity check, and all hot
math first strips units via ``to_float``/``.magnitude``. This shim
implements exactly that contract — value + unit-string tag, identity
``.to()`` with a DimensionalityError on mismatch, and transparent
numpy arithmetic — NOT general dimensional analysis.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from . import errors  # noqa: F401  (pint.errors submodule)


def _norm(unit: str) -> str:
    """Normalize a unit string for identity comparison."""
    u = unit.replace(" ", "")
    u = u.replace("**", "^")
    u = u.replace("meter", "m").replace("second", "s")
    u = u.replace("newton", "N").replace("radian", "rad")
    u = u.replace("degree", "deg").replace("kilogram", "kg")
    return u


class Quantity:
    """Value + unit-string tag. Arithmetic keeps the left operand's
    units (sufficient: the reference never mixes unit systems)."""

    __array_priority__ = 100.0  # beat ndarray in mixed ops

    def __init__(self, value: Any, units: Optional[str] = None):
        if isinstance(value, Quantity):
            units = units or value.units
            value = value.magnitude
        elif isinstance(value, str) and units is None:
            parts = value.split(None, 1)
            value = float(parts[0])
            units = parts[1] if len(parts) > 1 else ""
        if isinstance(value, (list, tuple)):
            value = np.asarray(value)
        self._magnitude = value
        self._units = units or ""

    @property
    def magnitude(self):
        return self._magnitude

    m = magnitude

    @property
    def units(self) -> str:
        return self._units

    def to(self, unit: str) -> "Quantity":
        if _norm(str(unit)) == _norm(self._units):
            return self
        # the one real conversion the stack uses
        conv = {
            ("deg", "rad"): np.pi / 180.0,
            ("rad", "deg"): 180.0 / np.pi,
            ("deg/s", "rad/s"): np.pi / 180.0,
            ("rad/s", "deg/s"): 180.0 / np.pi,
        }.get((_norm(self._units), _norm(str(unit))))
        if conv is None:
            raise errors.DimensionalityError(self._units, str(unit))
        return Quantity(self._magnitude * conv, str(unit))

    def _mag(self, other):
        return other.magnitude if isinstance(other, Quantity) else other

    def __add__(self, other):
        return Quantity(self._magnitude + self._mag(other), self._units)

    __radd__ = __add__

    def __sub__(self, other):
        return Quantity(self._magnitude - self._mag(other), self._units)

    def __rsub__(self, other):
        return Quantity(self._mag(other) - self._magnitude, self._units)

    def __mul__(self, other):
        return Quantity(self._magnitude * self._mag(other), self._units)

    __rmul__ = __mul__

    def __truediv__(self, other):
        return Quantity(self._magnitude / self._mag(other), self._units)

    def __rtruediv__(self, other):
        return Quantity(self._mag(other) / self._magnitude, self._units)

    def __neg__(self):
        return Quantity(-self._magnitude, self._units)

    def __abs__(self):
        return Quantity(abs(self._magnitude), self._units)

    def __pow__(self, p):
        return Quantity(self._magnitude**p, self._units)

    def copy(self) -> "Quantity":
        mag = self._magnitude
        return Quantity(mag.copy() if hasattr(mag, "copy") else mag, self._units)

    def __getitem__(self, idx):
        return Quantity(self._magnitude[idx], self._units)

    def __len__(self):
        return len(self._magnitude)

    def __iter__(self):
        for v in self._magnitude:
            yield Quantity(v, self._units)

    def __float__(self):
        return float(self._magnitude)

    def __array__(self, dtype=None):
        return np.asarray(self._magnitude, dtype=dtype)

    def _cmp_mag(self, other):
        return other.magnitude if isinstance(other, Quantity) else other

    def __lt__(self, other):
        return self._magnitude < self._cmp_mag(other)

    def __le__(self, other):
        return self._magnitude <= self._cmp_mag(other)

    def __gt__(self, other):
        return self._magnitude > self._cmp_mag(other)

    def __ge__(self, other):
        return self._magnitude >= self._cmp_mag(other)

    def __eq__(self, other):
        return self._magnitude == self._cmp_mag(other)

    def __hash__(self):
        return hash((repr(self._magnitude), self._units))

    def __repr__(self):
        return f"<Quantity({self._magnitude!r}, '{self._units}')>"


class UnitRegistry:
    def __init__(self, *a, **k):
        pass

    def setup_matplotlib(self, enable: bool = True) -> None:
        pass

    def __contains__(self, unit: str) -> bool:
        return True  # every unit "exists": defines become no-ops

    def define(self, definition: str) -> None:
        pass

    def Quantity(self, value, units=None) -> Quantity:
        return Quantity(value, units)

    def __call__(self, unit: str) -> Quantity:
        return Quantity(1.0, unit)

    def __getattr__(self, unit: str) -> Quantity:
        return Quantity(1.0, unit)


__version__ = "0.0-shim"
