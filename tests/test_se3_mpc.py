"""SE(3) MPC solver tests: correctness, feasibility, warm start, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dart_planner_tpu.common import frames
from dart_planner_tpu.common.types import DroneState
from dart_planner_tpu.ops import costs, dynamics
from dart_planner_tpu.planning import se3_mpc

CFG = se3_mpc.SE3MPCConfig(prediction_horizon=20, dt=0.1, max_iterations=12)


def _prob(p0=(0.0, 0.0, 2.0), v0=(0.0, 0.0, 0.0), goal=(5.0, 0.0, 3.0), obstacles=None):
    return se3_mpc.make_problem(p0, v0, goal, obstacles=obstacles, config=CFG)


def test_hover_at_goal_is_near_optimal():
    """Start at goal with zero velocity: solver should essentially hover."""
    prob = _prob(p0=(1.0, 1.0, 2.0), goal=(1.0, 1.0, 2.0))
    res = se3_mpc.solve_se3_mpc(CFG, prob, use_obstacles=False)
    hover = CFG.hover_thrust
    # thrust near hover, trajectory stays near goal
    np.testing.assert_allclose(np.asarray(res.thrusts)[..., 2], hover, rtol=0.15)
    np.testing.assert_allclose(
        np.asarray(res.positions), np.tile([1, 1, 2], (20, 1)), atol=0.2
    )


def test_moves_toward_goal():
    prob = _prob(p0=(0.0, 0.0, 2.0), goal=(5.0, 0.0, 2.0))
    res = se3_mpc.solve_se3_mpc(CFG, prob, use_obstacles=False)
    pos = np.asarray(res.positions)
    # monotone-ish progress: final x much closer to goal than start
    assert pos[-1, 0] > 3.0
    assert abs(pos[-1, 1]) < 0.3 and abs(pos[-1, 2] - 2.0) < 0.5


def test_dynamics_feasible_by_construction(rng):
    """Every solver output satisfies the reference dynamics recursion
    exactly (the condensed formulation's key superset property)."""
    prob = _prob(goal=(3.0, -4.0, 5.0))
    res = se3_mpc.solve_se3_mpc(CFG, prob, use_obstacles=False)
    gvec = frames.gravity_vector()
    pos, vel, _ = dynamics.rollout_linear(
        res.thrusts, prob.p0, prob.v0, CFG.dt, CFG.mass, gvec
    )
    np.testing.assert_allclose(res.positions, pos, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(res.velocities, vel, rtol=1e-5, atol=1e-5)


def test_thrust_bounds_respected():
    # aggressive goal to force saturation
    prob = _prob(p0=(0.0, 0.0, 2.0), goal=(50.0, 50.0, 30.0))
    res = se3_mpc.solve_se3_mpc(CFG, prob, use_obstacles=False)
    lb, ub = CFG.thrust_bounds()
    u = np.asarray(res.thrusts)
    assert np.all(u >= np.asarray(lb) - 1e-4)
    assert np.all(u <= np.asarray(ub) + 1e-4)


def test_matches_scipy_on_same_problem():
    """Condensed solve reaches (or beats) scipy L-BFGS-B solving the
    identical condensed problem."""
    scipy_opt = pytest.importorskip("scipy.optimize")
    cfg = se3_mpc.SE3MPCConfig(prediction_horizon=10, dt=0.1, max_iterations=20)
    prob = se3_mpc.make_problem((0.0, 0.0, 2.0), (1.0, 0.0, 0.0), (4.0, 2.0, 3.0),
                                config=cfg)
    gvec = frames.gravity_vector()
    w = cfg.weights

    def f_np(x):
        u = jnp.asarray(x.reshape(10, 3), jnp.float64)
        return float(costs.condensed_cost(u, prob, w, cfg.dt, cfg.mass,
                                          gvec.astype(jnp.float64)))

    def g_np(x):
        u = jnp.asarray(x.reshape(10, 3), jnp.float64)
        return np.asarray(
            costs.condensed_grad(u, prob, w, cfg.dt, cfg.mass,
                                 gvec.astype(jnp.float64))
        ).ravel()

    lb, ub = cfg.thrust_bounds(jnp.float64)
    bounds = [(float(l), float(u_)) for l, u_ in zip(
        np.tile(np.asarray(lb), 10), np.tile(np.asarray(ub), 10)
    )]
    x0 = np.tile([0.0, 0.0, cfg.hover_thrust], 10)
    ref = scipy_opt.minimize(f_np, x0, jac=g_np, method="L-BFGS-B", bounds=bounds,
                             options={"maxiter": 200})
    res = se3_mpc.solve_se3_mpc(cfg, prob, use_obstacles=False)
    ours = float(res.cost)
    assert ours <= ref.fun * 1.001 + 1e-3, (ours, ref.fun)
    # and the thrust sequences agree
    np.testing.assert_allclose(
        np.asarray(res.thrusts).ravel(), ref.x, rtol=5e-2, atol=0.3
    )


def test_obstacle_avoidance_binds():
    """An obstacle near the straight-line path pushes the optimized
    trajectory around it (the reference's solver cannot do this —
    SURVEY.md 3.1). The obstacle is slightly off-axis: a perfectly on-axis
    obstacle is a measure-zero symmetric configuration where the lateral
    penalty gradient vanishes identically (true for any smooth penalty
    method, including the reference's declared constraints)."""
    cfg = CFG
    obstacle = np.array([[2.5, 0.3, 2.0, 1.0]])  # r=1 (+1.5 margin)
    prob_free = _prob(p0=(0.0, 0.0, 2.0), goal=(5.0, 0.0, 2.0))
    prob_obs = _prob(p0=(0.0, 0.0, 2.0), goal=(5.0, 0.0, 2.0), obstacles=obstacle)
    res_free = se3_mpc.solve_se3_mpc(cfg, prob_free, use_obstacles=False)
    res_obs = se3_mpc.solve_se3_mpc(cfg, prob_obs, use_obstacles=True)
    d_free = np.linalg.norm(
        np.asarray(res_free.positions) - np.array([2.5, 0.3, 2.0]), axis=-1
    ).min()
    d_obs = np.linalg.norm(
        np.asarray(res_obs.positions) - np.array([2.5, 0.3, 2.0]), axis=-1
    ).min()
    assert d_obs > d_free + 0.3, (d_free, d_obs)
    assert d_obs > 1.2  # meaningfully clears the 1m obstacle


def test_batched_solve_matches_single(rng):
    B = 16
    p0 = rng.normal(size=(B, 3)).astype(np.float32)
    p0[:, 2] += 5
    goals = rng.normal(size=(B, 3)).astype(np.float32) * 3
    goals[:, 2] += 5
    prob = se3_mpc.make_problem(p0, np.zeros((B, 3), np.float32), goals, config=CFG)
    res = se3_mpc.solve_se3_mpc(CFG, prob, use_obstacles=False)
    assert res.thrusts.shape == (B, 20, 3)
    # element 5 equals its own single solve
    prob5 = se3_mpc.make_problem(p0[5], np.zeros(3, np.float32), goals[5], config=CFG)
    res5 = se3_mpc.solve_se3_mpc(CFG, prob5, use_obstacles=False)
    # tolerance: the inner CG's reduction order differs batched vs single,
    # so iterates agree to ~mN, not bitwise
    np.testing.assert_allclose(res.thrusts[5], res5.thrusts, rtol=5e-3, atol=5e-3)


def test_warm_start_shifts():
    u = jnp.arange(20 * 3, dtype=jnp.float32).reshape(20, 3)
    shifted = se3_mpc.shift_warm_start(CFG, u)
    np.testing.assert_allclose(shifted[:-1], u[1:])
    np.testing.assert_allclose(shifted[-1], u[-1])


def test_extract_trajectory_fields():
    prob = _prob()
    res = se3_mpc.solve_se3_mpc(CFG, prob, use_obstacles=False)
    traj = se3_mpc.extract_trajectory(CFG, res, 100.0)
    assert traj.horizon == 20
    np.testing.assert_allclose(
        np.asarray(traj.timestamps), 100.0 + 0.1 * np.arange(20), rtol=1e-5
    )
    # attitudes consistent with thrust direction: tilt angle from thrust
    u = np.asarray(res.thrusts)
    for k in [0, 5, 19]:
        tilt_from_thrust = np.arccos(u[k, 2] / np.linalg.norm(u[k]))
        roll, pitch, _ = np.asarray(traj.attitudes)[k]
        # tilt magnitude approx equals sqrt(roll^2+pitch^2) for small angles
        assert abs(np.hypot(roll, pitch) - tilt_from_thrust) < 0.1
    assert traj.thrusts is not None and np.all(np.asarray(traj.thrusts) > 0)


def test_planner_facade_and_emergency():
    planner = se3_mpc.SE3MPCPlanner(CFG)
    state = DroneState.create(timestamp=0.0, position=(0.0, 0.0, 2.0))
    traj = planner.plan_trajectory(state, (3.0, 0.0, 2.5))
    assert bool(jnp.all(se3_mpc.is_plan_valid(traj)))
    # warm start kept
    assert planner.last_solution is not None
    traj2 = planner.plan_trajectory(state, (3.0, 0.0, 2.5))
    assert traj2.horizon == 20
    stats = planner.get_planning_stats()
    assert stats["total_plans"] == 2

    # emergency trajectory hovers in place
    em = se3_mpc.emergency_trajectory(CFG, state)
    np.testing.assert_allclose(
        np.asarray(em.positions), np.tile([0, 0, 2.0], (20, 1)), atol=1e-6
    )


def test_is_plan_valid_rejects_bad():
    state = DroneState.create(position=(0.0, 0.0, 2.0))
    traj = se3_mpc.emergency_trajectory(CFG, state)
    assert bool(se3_mpc.is_plan_valid(traj))
    bad = traj.replace(positions=traj.positions.at[0, 2].set(jnp.nan))
    assert not bool(se3_mpc.is_plan_valid(bad))
    low = traj.replace(positions=traj.positions.at[3, 2].set(0.05))
    assert not bool(se3_mpc.is_plan_valid(low))


def test_qp_cold_start_is_quadratic_optimal():
    """The "qp" cold start is the exact unconstrained minimizer of the
    quadratic cost terms: with all hinge weights zero and bounds wide,
    one Newton round from it must produce (numerically) zero
    improvement, and its quadratic cost must beat the hover start."""
    import jax.numpy as jnp

    from dart_planner_tpu.common import frames
    from dart_planner_tpu.ops import costs

    rng = np.random.default_rng(5)
    B = 16
    cfg = CFG._replace(
        tail_iterations=0,
        ground_weight=0.0, velocity_bound_weight=0.0, tilt_weight=0.0,
        thrust_norm_weight=0.0, max_thrust=1e6, min_thrust=-1e6,
        max_tilt_angle=float(np.pi / 2.0001),
    )
    prob = se3_mpc.make_problem(
        rng.normal(0, 2, (B, 3)).astype(np.float32) + [0, 0, 5],
        rng.normal(0, 1, (B, 3)).astype(np.float32),
        rng.normal(0, 4, (B, 3)).astype(np.float32) + [0, 0, 5],
        config=cfg,
    )
    u_qp = se3_mpc.initialize_thrusts(cfg, prob, mode="qp")
    u_h = se3_mpc.initialize_thrusts(cfg, prob, mode="hover")
    gvec = frames.gravity_vector(frames.WorldFrame.ENU, cfg.gravity).astype(
        jnp.float32
    )
    c_qp = np.asarray(
        costs.condensed_cost(u_qp, prob, cfg.weights, cfg.dt, cfg.mass, gvec)
    )
    c_h = np.asarray(
        costs.condensed_cost(u_h, prob, cfg.weights, cfg.dt, cfg.mass, gvec)
    )
    assert np.all(c_qp < c_h)
    r = se3_mpc.solve(
        cfg._replace(max_iterations=1), prob, u_qp, method="xla",
        use_obstacles=False,
    )
    rel = np.asarray(
        (c_qp - np.asarray(r.cost)) / (1.0 + np.abs(np.asarray(r.cost)))
    )
    assert np.all(rel < 1e-4), rel.max()


def test_tail_refine_improves_unconverged_and_never_regresses():
    """Two-phase solve (tail_iterations > 0): refined scenarios never
    end with higher cost than phase 1, the combined converged fraction
    is at least phase 1's, and some unconverged scenario actually
    converges in the tail pass on an obstacle-dense batch."""
    rng = np.random.default_rng(11)
    B = 64
    base = CFG._replace(max_iterations=6)
    obs = np.concatenate(
        [rng.normal(0, 4, (B, 4, 3)), rng.uniform(0.3, 1.2, (B, 4, 1))],
        axis=-1,
    ).astype(np.float32)
    prob = se3_mpc.make_problem(
        rng.normal(0, 2, (B, 3)).astype(np.float32) + [0, 0, 5],
        rng.normal(0, 1, (B, 3)).astype(np.float32),
        rng.normal(0, 5, (B, 3)).astype(np.float32) + [0, 0, 5],
        obstacles=obs,
        config=base,
    )
    u0 = se3_mpc.initialize_thrusts(base, prob)
    r1 = se3_mpc.solve(
        base._replace(tail_iterations=0), prob, u0, method="xla"
    )
    r2 = se3_mpc.solve(
        base._replace(tail_iterations=6, tail_cg_iterations=25,
                      tail_capacity=0.5),
        prob, u0, method="xla",
    )
    c1, c2 = np.asarray(r1.cost), np.asarray(r2.cost)
    assert np.all(c2 <= c1 + 1e-5)
    conv1 = np.asarray(r1.converged)
    conv2 = np.asarray(r2.converged)
    assert not np.any(conv1 & ~conv2)  # converged never un-converges
    assert conv2.mean() > conv1.mean()  # the tail pass converts some
    assert np.any(c2 < c1 - 1e-3)  # and genuinely improves costs


def test_tail_refine_shared_fields_with_coincident_batch_dims():
    """Regression (round-4 advisor): _tail_refine's shared-vs-batched
    field classification must go by trailing rank, not shape-prefix
    equality. A shared (3,) goal with a batch of exactly 3 scenarios
    (and shared (K, 4) obstacles with K == B) used to be misread as
    batched, silently corrupting refined costs."""
    rng = np.random.default_rng(3)
    base = CFG._replace(max_iterations=4, tail_iterations=4,
                        tail_capacity=1.0)
    for B, K in [(3, 4), (4, 4)]:  # B==len(goal), then B==K
        obs = np.concatenate(
            [rng.normal(0, 3, (K, 3)), rng.uniform(0.4, 1.0, (K, 1))],
            axis=-1,
        ).astype(np.float32)
        p0 = rng.normal(0, 2, (B, 3)).astype(np.float32) + [0, 0, 5]
        v0 = rng.normal(0, 1, (B, 3)).astype(np.float32)
        goal_shared = np.asarray([4.0, -2.0, 6.0], np.float32)
        prob_shared = se3_mpc.make_problem(
            p0, v0, goal_shared, obstacles=obs, config=base
        )
        prob_bcast = se3_mpc.make_problem(
            p0, v0, np.tile(goal_shared, (B, 1)),
            obstacles=np.tile(obs[None], (B, 1, 1)), config=base,
        )
        u0 = se3_mpc.initialize_thrusts(base, prob_shared)
        r_shared = se3_mpc.solve(base, prob_shared, u0, method="xla")
        r_bcast = se3_mpc.solve(base, prob_bcast, u0, method="xla")
        np.testing.assert_allclose(
            np.asarray(r_shared.cost), np.asarray(r_bcast.cost),
            rtol=1e-5, err_msg=f"B={B} K={K}",
        )
        np.testing.assert_allclose(
            np.asarray(r_shared.thrusts), np.asarray(r_bcast.thrusts),
            rtol=1e-4, atol=1e-4,
        )


def test_perturbed_restart_never_regresses_and_improves():
    """Phase-3 perturbed restart (restart_iterations > 0): costs never
    regress vs the two-phase result, converged never un-converges, the
    result is deterministic, and on a deliberately under-budgeted
    phase 1 the jittered re-solve genuinely improves some scenario."""
    rng = np.random.default_rng(7)
    B = 64
    base = CFG._replace(max_iterations=2, gn_warmup_iterations=2,
                        tail_iterations=2, tail_capacity=0.25)
    obs = np.concatenate(
        [rng.normal(0, 4, (B, 4, 3)), rng.uniform(0.3, 1.2, (B, 4, 1))],
        axis=-1,
    ).astype(np.float32)
    prob = se3_mpc.make_problem(
        rng.normal(0, 2, (B, 3)).astype(np.float32) + [0, 0, 5],
        rng.normal(0, 1, (B, 3)).astype(np.float32),
        rng.normal(0, 5, (B, 3)).astype(np.float32) + [0, 0, 5],
        obstacles=obs,
        config=base,
    )
    u0 = se3_mpc.initialize_thrusts(base, prob)
    r2 = se3_mpc.solve(base, prob, u0, method="xla")
    cfg_r = base._replace(restart_iterations=8, restart_capacity=0.5)
    r3 = se3_mpc.solve(cfg_r, prob, u0, method="xla")
    c2, c3 = np.asarray(r2.cost), np.asarray(r3.cost)
    assert np.all(c3 <= c2 + 1e-5)
    assert np.any(c3 < c2 - 1e-3), "restart never improved anything"
    assert not np.any(np.asarray(r2.converged) & ~np.asarray(r3.converged))
    r3b = se3_mpc.solve(cfg_r, prob, u0, method="xla")
    np.testing.assert_array_equal(np.asarray(r3.cost), np.asarray(r3b.cost))


def test_goal_margin_clamp_restores_goal_reachability():
    """A goal inside an obstacle's inflated margin ball parks the plan
    at a standoff outside the 1 m success ring (the closed-loop quiet-
    failure mode, scripts/diag_timeouts.py); with goal_margin_clamp the
    added margin shrinks just enough that the plan terminates at the
    goal, while the raw radius stays guarded by the floor."""
    goal = np.asarray([5.0, 0.0, 3.0], np.float32)
    # obstacle surface 0.7 m from the goal: inside the 1.5 m margin
    obs = np.asarray([[5.0, 1.2, 3.0, 0.5]], np.float32)
    base = CFG._replace(tail_iterations=0)
    u_kw = dict(method="xla")

    def final_dist(cfg):
        prob = se3_mpc.make_problem(
            np.zeros(3, np.float32), np.zeros(3, np.float32), goal,
            obstacles=obs, config=cfg,
        )
        u0 = se3_mpc.initialize_thrusts(cfg, prob)
        r = se3_mpc.solve(cfg, prob, u0, **u_kw)
        return float(np.linalg.norm(np.asarray(r.positions)[-1] - goal))

    d_off = final_dist(base)
    d_on = final_dist(base._replace(goal_margin_clamp=0.5,
                                    goal_margin_floor=0.6))
    assert d_off > 0.45, d_off  # the standoff the clamp exists to fix
    assert d_on < 0.25, (d_on, d_off)

    # margins helper invariants
    import jax.numpy as jnp

    cfg = base._replace(goal_margin_clamp=0.5, goal_margin_floor=0.6)
    far = np.asarray([[20.0, 0.0, 3.0, 0.5]], np.float32)
    m_far = np.asarray(se3_mpc.effective_margins(cfg, jnp.asarray(far), jnp.asarray(goal)))
    assert np.allclose(m_far, cfg.safety_margin)  # untouched when clear
    m_near = np.asarray(se3_mpc.effective_margins(cfg, jnp.asarray(obs), jnp.asarray(goal)))
    assert cfg.goal_margin_floor - 1e-6 <= m_near[0] < cfg.safety_margin
