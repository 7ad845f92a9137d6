"""Trajectory planning: SE(3) MPC (L2) and global mission planning (L1)."""

from dart_planner_tpu.planning.base import BasePlanner, PlannerFactory
from dart_planner_tpu.planning.se3_mpc import (
    SE3MPCConfig,
    SE3MPCPlanner,
    SolveResult,
    make_problem,
    solve,
    solve_se3_mpc,
)

# registry (reference se3_mpc_planner.py:760-762)
PlannerFactory.register("se3_mpc", SE3MPCPlanner)

__all__ = [
    "BasePlanner",
    "PlannerFactory",
    "SE3MPCConfig",
    "SE3MPCPlanner",
    "SolveResult",
    "make_problem",
    "solve",
    "solve_se3_mpc",
]
