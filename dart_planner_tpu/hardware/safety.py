"""State-level safety monitoring.

Port of the reference ``hardware/safety.py`` (``AirSimSafetyManager``,
:20-188) generalized over any ``VehicleIO``: checks the *live state*
against geofence / altitude / velocity envelopes every tick and triggers
emergency landing on violation. This complements the trajectory gate in
:class:`~dart_planner_tpu.hardware.vehicle_io.SafetyValidatedVehicleIO`,
which can only validate one short-horizon plan at a time (a slow climb
toward an unsafe goal passes every per-plan check; the state monitor is
what catches it).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from dart_planner_tpu.common.types import DroneState
from dart_planner_tpu.hardware.vehicle_io import VehicleIO


@dataclass
class SafetyLimits:
    """(reference safety.py config fields; defaults.yaml safety:)"""

    max_altitude: float = 50.0
    safety_radius: float = 100.0
    max_velocity: float = 15.0
    emergency_landing_altitude: float = 2.0


class SafetyManager:
    """(reference safety.py:20-188)"""

    def __init__(self, limits: Optional[SafetyLimits] = None):
        self.limits = limits or SafetyLimits()
        self.violations = 0
        self.last_violation: Optional[str] = None
        self.emergency_active = False

    def check_state(self, state: DroneState) -> Optional[str]:
        """Returns a violation description or None."""
        pos = np.asarray(state.position)
        vel = np.asarray(state.velocity)
        if not np.isfinite(pos).all():
            return "non-finite position"
        if pos[2] > self.limits.max_altitude:
            return f"altitude {pos[2]:.1f} > ceiling {self.limits.max_altitude}"
        if np.linalg.norm(pos[:2]) > self.limits.safety_radius:
            return (
                f"radius {np.linalg.norm(pos[:2]):.1f} > geofence "
                f"{self.limits.safety_radius}"
            )
        speed = float(np.linalg.norm(vel))
        if speed > self.limits.max_velocity:
            return f"speed {speed:.1f} > envelope {self.limits.max_velocity}"
        return None

    async def monitor_safety(self, state: DroneState, vehicle: VehicleIO) -> bool:
        """One safety tick (reference :38-71). Returns True if safe."""
        violation = self.check_state(state)
        if violation is None:
            return True
        self.violations += 1
        self.last_violation = violation
        if not self.emergency_active:
            self.emergency_active = True
            await self.emergency_land(vehicle)
        return False

    async def emergency_land(self, vehicle: VehicleIO) -> None:
        """(reference :73-122)"""
        try:
            await vehicle.land()
        except Exception:
            await vehicle.emergency_stop()

    def get_safety_violations(self) -> int:
        return self.violations

    def reset_safety_violations(self) -> None:
        self.violations = 0
        self.emergency_active = False
        self.last_violation = None
