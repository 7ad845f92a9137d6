"""Reference-equivalence mode: reproduce the reference solver's outputs.

The reference solves a *separable* 9N-variable problem with L-BFGS-B using a
hand-written gradient (se3_mpc_planner.py:552-580) that only contains the
position-tracking, velocity-regulation, and ``w_T ||T||^2`` terms — it omits
the acceleration-cost, terminal-cost, and hover-offset contributions that
appear in the objective (se3_mpc_planner.py:516-550). Because L-BFGS-B drives
the *supplied* gradient to zero within box bounds, the reference's converged
output is the closed-form projection of that gradient field's roots:

    positions_k  = clip(goal, -100, 100)
    velocities_k = clip(0, -v_max, v_max) = 0
    thrusts_k    = (clip(0, +-tilt), clip(0, [T_min, T_max])) = (0, 0, T_min)

(its equality "dynamics constraints" are never enforced: bounds-only method,
se3_mpc_planner.py:256-268; SURVEY.md 3.1 and 7 "hard parts").

This module computes those fixed points directly — batched, in closed form —
for two gradient conventions:

- ``gradient="reference"``: bug-compatible with the hand-written gradient
  (the default; matches what the reference actually ships).
- ``gradient="exact"``: the true minimizer of the separable objective,
  which lands thrust at hover ``m g`` instead of ``T_min``.

Equivalence tests (tests/test_reference_equivalence.py) verify both against
scipy L-BFGS-B run on an independent re-implementation of the reference
objective at horizon N=20.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dart_planner_tpu.planning.se3_mpc import SE3MPCConfig

Array = jnp.ndarray

POSITION_ENVELOPE = 100.0  # +-100 m flight envelope (se3_mpc_planner.py:384)


class ReferenceSolution(NamedTuple):
    positions: Array  # (..., N, 3)
    velocities: Array  # (..., N, 3)
    thrust_vectors: Array  # (..., N, 3)


def solve_reference_mode(
    config: SE3MPCConfig,
    position: Array,
    velocity: Array,
    goal: Array,
    gradient: str = "reference",
) -> ReferenceSolution:
    """Closed-form fixed point of the reference's L-BFGS-B iteration.

    ``position``/``velocity`` are accepted for signature parity (the
    reference's initial state rows are decision variables whose anchoring
    equality constraints are ignored by the bounds-only method, so the
    converged solution does not depend on them).
    """
    N = config.prediction_horizon
    dtype = jnp.asarray(goal).dtype
    goal = jnp.asarray(goal, dtype)
    batch = goal.shape[:-1]

    pos_star = jnp.clip(goal, -POSITION_ENVELOPE, POSITION_ENVELOPE)
    positions = jnp.broadcast_to(pos_star[..., None, :], batch + (N, 3))
    velocities = jnp.zeros(batch + (N, 3), dtype)

    if gradient == "reference":
        # The hand-written gradient's root for thrust is T = 0, but the
        # *objective* L-BFGS-B line-searches on is minimized at hover
        # (both w_a||T/m - g e3||^2 and w_T||T - h e3||^2 peak there), so
        # every step along the bogus descent direction is rejected by the
        # Wolfe conditions and thrust stays at its hover-initialized value
        # (se3_mpc_planner.py:353: x0 thrust = hover). Verified empirically
        # against scipy in tests/test_reference_equivalence.py (the solver
        # drifts <1% below hover before the line search gives up).
        tz = config.mass * config.gravity
    elif gradient == "exact":
        # d/dT_z [ w_a (T/m - g)^2 + w_T (T - m g)^2 ] = 0  ->  T_z = m g
        # (both terms are minimized at hover; x/y roots are 0)
        tz = config.mass * config.gravity
    else:
        raise ValueError(f"unknown gradient mode {gradient!r}")
    tz = min(max(tz, config.min_thrust), config.max_thrust)

    thrust = jnp.array([0.0, 0.0, tz], dtype)
    thrust_vectors = jnp.broadcast_to(thrust, batch + (N, 3))
    return ReferenceSolution(
        positions=positions, velocities=velocities, thrust_vectors=thrust_vectors
    )
