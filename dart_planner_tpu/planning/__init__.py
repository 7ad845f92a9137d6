"""Trajectory planning: SE(3) MPC (L2) and global mission planning (L1)."""

from dart_planner_tpu.planning.se3_mpc import (
    SE3MPCConfig,
    SE3MPCPlanner,
    SolveResult,
    make_problem,
    solve_se3_mpc,
)

__all__ = [
    "SE3MPCConfig",
    "SE3MPCPlanner",
    "SolveResult",
    "make_problem",
    "solve_se3_mpc",
]
