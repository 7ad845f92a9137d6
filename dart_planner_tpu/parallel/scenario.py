"""Sharded scenario-fleet solver.

Replaces the reference's process-level distribution (cloud plans / edge
controls over ZMQ REQ/REP, /root/reference/src/dart_planner/edge/
main_improved.py:96-147) with the TPU-native scaling model:

- one chip: ``vmap``ped batch inside a single XLA executable;
- one host: batch sharded over the local devices of a 1D/2D ``Mesh``;
- many hosts: same code — the mesh gains a "hosts" axis over DCN via
  ``jax.distributed``; scenarios stay independent so nothing crosses the
  interconnect during the solve, and only fleet statistics are reduced
  with ``psum`` (ICI within a slice, DCN across hosts).

Everything is a pure function of fixed-shape inputs; the per-scenario
solver is :func:`dart_planner_tpu.planning.se3_mpc.solve_se3_mpc`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dart_planner_tpu.ops import costs
from dart_planner_tpu.planning import se3_mpc

Array = jnp.ndarray

BATCH_AXES = ("hosts", "devices")


class FleetStats(NamedTuple):
    """Fleet-level reductions (computed with psum over the mesh)."""

    total: Array  # scalar int: fleet size
    converged: Array  # scalar int: scenarios with converged solves
    mean_cost: Array  # scalar
    max_grad_norm: Array  # scalar


def make_fleet_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    hosts: Optional[int] = None,
) -> Mesh:
    """Build the ("hosts", "devices") mesh.

    With one process, "hosts" is 1 (or ``hosts`` if forcing a virtual
    split, e.g. 8 CPU devices as 2 hosts x 4 devices for scaling tests).
    Under ``jax.distributed`` the host axis maps to real processes/DCN.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    h = hosts if hosts is not None else max(jax.process_count(), 1)
    if n % h != 0:
        raise ValueError(f"{n} devices not divisible by {h} hosts")
    arr = np.array(devs).reshape(h, n // h)
    return Mesh(arr, BATCH_AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits the leading scenario axis over every mesh axis."""
    return NamedSharding(mesh, P(BATCH_AXES))


def shard_scenarios(prob: costs.Problem, mesh: Mesh) -> costs.Problem:
    """Device-put a batched Problem with the scenario axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), prob)


@functools.partial(
    jax.jit,
    static_argnames=("config", "mesh", "use_obstacles", "method",
                     "with_stats"),
)
def solve_fleet(
    config: se3_mpc.SE3MPCConfig,
    mesh: Mesh,
    prob: costs.Problem,
    u_init: Optional[Array] = None,
    use_obstacles: bool = True,
    method: str = "auto",
    with_stats: bool = True,
) -> tuple[se3_mpc.SolveResult, Optional[FleetStats]]:
    """Solve a sharded scenario fleet and reduce fleet statistics.

    ``prob`` must have one leading batch axis divisible by the mesh size.
    The solve itself is embarrassingly parallel (no communication); the
    returned :class:`FleetStats` are psum-reduced across the whole mesh so
    every host sees global numbers without a host-side gather. ``method``
    picks the per-shard solver (``"fused"`` Pallas kernel on TPU, ``"xla"``
    elsewhere under ``"auto"`` — see :func:`se3_mpc.solve`).

    ``with_stats=False`` returns ``(result, None)`` and emits NO
    collectives at all: back-to-back fleet calls (warm-started MPC
    rounds) then run with zero cross-host synchronization, which is the
    production cadence — reduce stats once per reporting interval, not
    once per solve. On an oversubscribed test fabric (loopback gRPC
    sharing the compute cores) the per-call psum alone costs tens of
    percent of weak-scaling efficiency; see docs/scaling.md.

    Adaptive tail refinement (``config.tail_iterations`` > 0) runs PER
    SHARD: each shard compacts and refines its own worst
    ``tail_capacity`` fraction, with no cross-shard gather — load stays
    balanced and no collectives are added, at the price of bitwise
    mesh-size invariance (which shard-boundary scenarios get the extra
    polish depends on the split; the single-phase core remains
    mesh-invariant, tests/test_scaling.py).
    """
    if u_init is None:
        u_init = se3_mpc.initialize_thrusts(config, prob)

    spec = P(BATCH_AXES)

    def local_solve(prob_l: costs.Problem, u0_l: Array):
        res = se3_mpc.solve(
            config, prob_l, u0_l, use_obstacles=use_obstacles, method=method
        )
        if not with_stats:
            return res, None
        n = jnp.asarray(res.cost.shape[0], jnp.float32)
        stats = FleetStats(
            total=jax.lax.psum(n, BATCH_AXES),
            converged=jax.lax.psum(
                jnp.sum(res.converged.astype(jnp.float32)), BATCH_AXES
            ),
            mean_cost=jax.lax.psum(jnp.sum(res.cost), BATCH_AXES),
            max_grad_norm=jax.lax.pmax(jnp.max(res.grad_norm), BATCH_AXES),
        )
        return res, stats

    res, stats = shard_map(
        local_solve,
        mesh=mesh,
        # pallas_call (the fused solver) has no varying-mesh-axes
        # annotation for its outputs; skip the vma check — correctness
        # is covered by tests/test_scaling.py mesh-invariance
        check_vma=False,
        in_specs=(
            # spec tree must mirror the actual Problem structure:
            # v_cap is an optional field (None unless the fleet carries
            # per-scenario velocity caps, e.g. unknown-space slowdowns)
            costs.Problem(p0=spec, v0=spec, goal=spec, obstacles=spec,
                          obstacle_mask=spec,
                          v_cap=None if prob.v_cap is None else spec),
            spec,
        ),
        out_specs=(
            se3_mpc.SolveResult(
                thrusts=spec, positions=spec, velocities=spec,
                accelerations=spec, cost=spec, converged=spec, grad_norm=spec,
                min_improvement=spec,
            ),
            None
            if not with_stats
            else FleetStats(total=P(), converged=P(), mean_cost=P(),
                            max_grad_norm=P()),
        ),
    )(prob, u_init)
    if with_stats:
        stats = stats._replace(mean_cost=stats.mean_cost / stats.total)
    return res, stats


def fleet_statistics(result: se3_mpc.SolveResult) -> dict:
    """Host-side summary of an (unsharded or fully-addressable) result."""
    return {
        "total": int(result.cost.shape[0]),
        "converged": int(jnp.sum(result.converged)),
        "mean_cost": float(jnp.mean(result.cost)),
        "max_grad_norm": float(jnp.max(result.grad_norm)),
    }
