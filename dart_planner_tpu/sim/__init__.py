"""Simulation: vectorized drone physics + closed-loop Monte Carlo fleets.

Replaces the reference's ``DroneSimulator`` (point mass + wind,
/root/reference/src/dart_planner/utils/drone_simulator.py:52-72) and its
20-run Monte-Carlo test (tests/test_monte_carlo_sim.py) with jittable
physics steps and a ``lax.scan`` closed-loop engine that vmaps to
thousands of scenarios per chip.
"""

from dart_planner_tpu.sim.physics import (
    PhysicsConfig,
    RigidBodyState,
    point_mass_step,
    rigid_body_step,
    sample_wind,
)
from dart_planner_tpu.sim.closed_loop import (
    ClosedLoopConfig,
    EpisodeResult,
    simulate_episode,
    monte_carlo,
)
from dart_planner_tpu.sim.worlds import (
    WorldConfig,
    sample_worlds,
    perceive_worlds,
)

__all__ = [
    "PhysicsConfig",
    "RigidBodyState",
    "point_mass_step",
    "rigid_body_step",
    "sample_wind",
    "ClosedLoopConfig",
    "EpisodeResult",
    "simulate_episode",
    "monte_carlo",
    "WorldConfig",
    "sample_worlds",
    "perceive_worlds",
]
