"""Fused Pallas solver vs the pure-XLA solver (CPU interpreter mode).

The fused kernel (ops/pallas_mpc.py) must run the identical algorithm as
planning.se3_mpc.solve_se3_mpc. On convex problem instances (no hinge
penalties active) the two must agree to float32 tolerance; on hard
obstacle-dense instances individual unconverged scenarios may branch at
line-search near-ties, so the contract is aggregate solution quality.
"""

import numpy as np
import pytest

from dart_planner_tpu.planning import se3_mpc

# fast configuration for the interpreter (full config runs on TPU benches)
CFG = se3_mpc.SE3MPCConfig(
    prediction_horizon=8, max_iterations=4, cg_iterations=10
)


def _problem(rng, batch, config, with_obstacles=True):
    if with_obstacles:
        obs = np.concatenate(
            [
                rng.normal(0, 4, (batch, 3, 3)),
                rng.uniform(0.3, 1.2, (batch, 3, 1)),
            ],
            axis=-1,
        ).astype(np.float32)
    else:
        obs = None
    return se3_mpc.make_problem(
        rng.normal(0, 2, (batch, 3)).astype(np.float32) + [0, 0, 5],
        rng.normal(0, 1, (batch, 3)).astype(np.float32),
        rng.normal(0, 3, (batch, 3)).astype(np.float32) + [0, 0, 5],
        obstacles=obs,
        config=config,
    )


def _solve_both(config, prob, **kw):
    u0 = se3_mpc.initialize_thrusts(config, prob)
    rx = se3_mpc.solve(config, prob, u0, method="xla", **kw)
    rf = se3_mpc.solve(config, prob, u0, method="fused", block_b=8, **kw)
    return rx, rf


def test_convex_parity(rng):
    """No obstacles, hinges inactive: identical Newton path, tight match."""
    config = CFG._replace(
        ground_weight=0.0, velocity_bound_weight=0.0,
        tilt_weight=0.0, thrust_norm_weight=0.0,
    )
    prob = _problem(rng, 4, config, with_obstacles=False)
    rx, rf = _solve_both(config, prob, use_obstacles=False)
    np.testing.assert_allclose(
        np.asarray(rf.thrusts), np.asarray(rx.thrusts), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(rf.cost), np.asarray(rx.cost), rtol=1e-5
    )


def test_obstacle_aggregate_quality(rng):
    """With obstacle/ground/velocity hinges: per-scenario paths may branch
    at near-ties, but aggregate cost and convergence must match."""
    prob = _problem(rng, 16, CFG)
    rx, rf = _solve_both(CFG, prob)
    cx = np.asarray(rx.cost)
    cf = np.asarray(rf.cost)
    assert np.mean(cf) <= np.mean(cx) * 1.05
    # every fused solve descends from the cold-start cost
    u0 = se3_mpc.initialize_thrusts(CFG, prob)
    r0 = se3_mpc._finalize(CFG, prob, u0)
    assert np.all(cf <= np.asarray(r0.cost) + 1e-3)
    # thrust iterates agree on the (majority) non-branching scenarios
    close = np.abs(np.asarray(rf.thrusts) - np.asarray(rx.thrusts)) < 0.05
    assert close.all(axis=(-1, -2)).mean() >= 0.5


def test_unbatched_and_shapes(rng):
    """Single unbatched scenario: (N, 3) in, (N, 3) out."""
    prob = _problem(rng, 1, CFG)
    prob1 = type(prob)(*[np.asarray(x)[0] for x in prob])
    u0 = se3_mpc.initialize_thrusts(CFG, prob1)
    assert u0.shape == (CFG.prediction_horizon, 3)
    rf = se3_mpc.solve(CFG, prob1, u0, method="fused", block_b=8)
    assert rf.thrusts.shape == (CFG.prediction_horizon, 3)
    assert rf.cost.shape == ()
    assert np.isfinite(np.asarray(rf.cost))


def test_per_step_goal_reference(rng):
    """Tracking mode: goal of shape (B, N, 3) (beyond the reference planner)."""
    config = CFG
    B, N = 2, config.prediction_horizon
    goal = np.cumsum(
        rng.normal(0, 0.3, (B, N, 3)).astype(np.float32), axis=1
    ) + np.float32([0, 0, 5])
    prob = se3_mpc.make_problem(
        goal[:, 0] + rng.normal(0, 0.1, (B, 3)).astype(np.float32),
        np.zeros((B, 3), np.float32),
        goal,
        config=config,
    )
    rx, rf = _solve_both(config, prob, use_obstacles=False)
    np.testing.assert_allclose(
        np.asarray(rf.cost), np.asarray(rx.cost), rtol=1e-3
    )


def test_bounds_respected(rng):
    """Fused iterates stay inside the reference thrust box
    (se3_mpc_planner.py:390-401)."""
    prob = _problem(rng, 8, CFG)
    u0 = se3_mpc.initialize_thrusts(CFG, prob)
    rf = se3_mpc.solve(CFG, prob, u0, method="fused", block_b=8)
    lb, ub = CFG.thrust_bounds()
    u = np.asarray(rf.thrusts)
    assert (u >= np.asarray(lb) - 1e-5).all()
    assert (u <= np.asarray(ub) + 1e-5).all()


def test_dispatcher_auto_is_xla_on_cpu():
    import jax

    assert jax.default_backend() == "cpu"
    prob = _problem(np.random.default_rng(0), 2, CFG)
    r = se3_mpc.solve(CFG, prob)  # must not require Pallas on CPU
    assert np.isfinite(np.asarray(r.cost)).all()


def test_group_stacking_matches_ungrouped(rng):
    """groups=2 packs two scenarios per lane column. Packing is NOT
    bit-exact: a group's 3N nonzero rows sit inside a 2*NP1-row matmul
    contraction, whose tree reduction pairs partial sums differently than
    the NP1-row G=1 contraction (~1e-6 noise). So the contract mirrors
    the XLA-vs-fused one: tight parity on convex instances (unique Newton
    path), aggregate cost parity on obstacle instances (near-ties may
    branch)."""
    from dart_planner_tpu.ops import pallas_mpc

    convex = CFG._replace(
        ground_weight=0.0, velocity_bound_weight=0.0,
        tilt_weight=0.0, thrust_norm_weight=0.0,
    )
    probc = _problem(rng, 6, convex, with_obstacles=False)
    u0 = se3_mpc.initialize_thrusts(convex, probc)
    u1, _ = pallas_mpc.solve_thrusts_fused(
        convex, probc, u0, block_b=4, interpret=True, groups=1,
        use_obstacles=False,
    )
    u2, _ = pallas_mpc.solve_thrusts_fused(
        convex, probc, u0, block_b=4, interpret=True, groups=2,
        use_obstacles=False,
    )
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=2e-3)

    prob = _problem(rng, 6, CFG)
    u0 = se3_mpc.initialize_thrusts(CFG, prob)
    c1 = np.asarray(se3_mpc._finalize(CFG, prob, *pallas_mpc.solve_thrusts_fused(
        CFG, prob, u0, block_b=4, interpret=True, groups=1)).cost)
    c2 = np.asarray(se3_mpc._finalize(CFG, prob, *pallas_mpc.solve_thrusts_fused(
        CFG, prob, u0, block_b=4, interpret=True, groups=2)).cost)
    assert np.mean(c2) <= np.mean(c1) * 1.05
    assert np.mean(c1) <= np.mean(c2) * 1.05


def test_block_padding_paths(rng):
    """Batch not divisible by block: padded lanes must not leak into the
    real scenarios."""
    prob5 = _problem(rng, 5, CFG)
    u0 = se3_mpc.initialize_thrusts(CFG, prob5)
    r5 = se3_mpc.solve(CFG, prob5, u0, method="fused", block_b=4)
    prob4 = type(prob5)(*[np.asarray(x)[:4] for x in prob5])
    r4 = se3_mpc.solve(
        CFG, prob4, u0[:4], method="fused", block_b=4
    )
    np.testing.assert_allclose(
        np.asarray(r5.thrusts)[:4], np.asarray(r4.thrusts), atol=1e-4
    )


def test_full_curvature_stage_with_padding_rows(rng):
    """Stage-2 (full-curvature Newton) parity at a horizon whose 3N is
    NOT a multiple of 8 (N=12 -> 4 padding rows in the kernel layout).

    Regression guard: the stage-2 Jacobi clamp had no absolute floor, so
    padding rows (diag == diag_quad == 0) produced minv = inf and one
    NaN silently froze the whole stage — every line-search comparison
    went false, min_improvement reported 0 (= "converged"), and the
    fused path quietly returned stage-1-quality iterates. N=8 tests
    (3N=24, no padding) could never catch it."""
    config = se3_mpc.SE3MPCConfig(
        prediction_horizon=12, max_iterations=10,
        gn_warmup_iterations=4, cg_iterations=10,
    )
    assert (3 * config.prediction_horizon) % 8 != 0  # padding rows exist
    assert config.newton_full_curvature  # stage 2 actually runs
    prob = _problem(rng, 8, config)
    u0 = se3_mpc.initialize_thrusts(config, prob)
    rx = se3_mpc.solve(config, prob, u0, method="xla")
    rf = se3_mpc.solve(config, prob, u0, method="fused", block_b=8)
    np.testing.assert_allclose(
        np.asarray(rf.cost), np.asarray(rx.cost), rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(rf.converged), np.asarray(rx.converged)
    )
    # pre-fix signature: fused cost sat ~4e-2 above XLA (stage-1-quality
    # iterates), which the rtol=1e-4 cost parity above fails loudly
