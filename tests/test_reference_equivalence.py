"""Reference-equivalence gate (SURVEY.md section 4, BASELINE.md):

match the reference SE(3) MPC's control sequences at horizon N=20 within
tolerance. The reference objective/gradient/bounds (se3_mpc_planner.py:
378-402, 516-580) are re-implemented here independently in numpy and solved
with scipy L-BFGS-B exactly as the reference does (:256-268); our
closed-form ``reference_mode`` and the condensed solver are checked against
it.
"""

import numpy as np
import pytest

scipy_opt = pytest.importorskip("scipy.optimize")

from dart_planner_tpu.planning import se3_mpc
from dart_planner_tpu.planning.reference_mode import solve_reference_mode

N = 20
DT = 0.1
MASS = 1.5
G = 9.81
W_POS, W_VEL, W_ACC, W_T = 100.0, 10.0, 1.0, 0.1
MAX_V = 10.0
MAX_T, MIN_T = 25.0, 2.0
MAX_TILT = np.pi / 4
HOVER = MASS * G

CFG = se3_mpc.SE3MPCConfig(prediction_horizon=N, dt=DT)


def _unpack(x):
    return x[: N * 3].reshape(N, 3), x[N * 3 : 2 * N * 3].reshape(N, 3), x[
        2 * N * 3 :
    ].reshape(N, 3)


def _reference_objective(x, goal):
    """Independent numpy re-implementation of se3_mpc_planner.py:516-550."""
    p, v, T = _unpack(x)
    a = T / MASS - np.array([0, 0, G])
    cost = W_POS * np.sum((p - goal) ** 2)
    cost += W_VEL * np.sum(v**2)
    cost += W_ACC * np.sum(a**2)
    cost += W_T * np.sum((T - np.array([0, 0, HOVER])) ** 2)
    cost += 10 * W_POS * np.sum((p[-1] - goal) ** 2)
    return cost


def _reference_gradient(x, goal):
    """The reference's hand-written (incomplete) gradient
    (se3_mpc_planner.py:552-580): position/velocity terms plus
    2 w_T T — no acceleration, terminal, or hover-offset terms."""
    p, v, T = _unpack(x)
    g = np.zeros_like(x)
    g[: N * 3] = (2 * W_POS * (p - goal)).ravel()
    g[N * 3 : 2 * N * 3] = (2 * W_VEL * v).ravel()
    g[2 * N * 3 :] = (2 * W_T * T).ravel()
    return g


def _reference_bounds():
    """se3_mpc_planner.py:378-402."""
    bounds = [(-100.0, 100.0)] * (N * 3)
    bounds += [(-MAX_V, MAX_V)] * (N * 3)
    mtt = MAX_T * np.sin(MAX_TILT)
    for _ in range(N):
        bounds += [(-mtt, mtt), (-mtt, mtt), (MIN_T, MAX_T)]
    return bounds


def _solve_scipy(p0, v0, goal, jac):
    x0 = np.zeros(9 * N)
    p_init = np.linspace(p0, goal, N)
    x0[: N * 3] = p_init.ravel()
    x0[N * 3 : 2 * N * 3] = 0.0
    x0[2 * N * 3 :] = np.tile([0, 0, HOVER], N)
    res = scipy_opt.minimize(
        lambda x: _reference_objective(x, goal),
        x0,
        jac=jac,
        method="L-BFGS-B",
        bounds=_reference_bounds(),
        options={"maxiter": 200, "gtol": 1e-8, "ftol": 1e-12},
    )
    return _unpack(res.x)


def test_reference_mode_matches_scipy_with_reference_gradient():
    p0 = np.array([0.0, 0.0, 2.0])
    v0 = np.zeros(3)
    goal = np.array([5.0, -3.0, 4.0])
    p_ref, v_ref, T_ref = _solve_scipy(
        p0, v0, goal, jac=lambda x: _reference_gradient(x, goal)
    )
    ours = solve_reference_mode(CFG, p0, v0, goal, gradient="reference")
    np.testing.assert_allclose(np.asarray(ours.positions), p_ref, atol=5e-3)
    np.testing.assert_allclose(np.asarray(ours.velocities), v_ref, atol=5e-3)
    # thrust: scipy's line search rejects the bogus descent direction and
    # leaves thrust within ~1% of its hover initialization (see
    # reference_mode.py docstring)
    np.testing.assert_allclose(
        np.asarray(ours.thrust_vectors), T_ref, atol=0.15
    )


def test_reference_mode_exact_matches_scipy_true_gradient():
    """With the *correct* gradient of the separable objective, scipy lands
    on hover thrust at the goal — and so does gradient='exact'."""
    p0 = np.array([1.0, 1.0, 3.0])
    v0 = np.array([0.5, 0.0, 0.0])
    goal = np.array([-2.0, 6.0, 8.0])

    def true_grad(x):
        p, v, T = _unpack(x)
        g = np.zeros_like(x)
        gp = 2 * W_POS * (p - goal)
        gp[-1] += 2 * 10 * W_POS * (p[-1] - goal)
        g[: N * 3] = gp.ravel()
        g[N * 3 : 2 * N * 3] = (2 * W_VEL * v).ravel()
        a = T / MASS - np.array([0, 0, G])
        gT = 2 * W_ACC * a / MASS + 2 * W_T * (T - np.array([0, 0, HOVER]))
        g[2 * N * 3 :] = gT.ravel()
        return g

    p_ref, v_ref, T_ref = _solve_scipy(p0, v0, goal, jac=true_grad)
    ours = solve_reference_mode(CFG, p0, v0, goal, gradient="exact")
    np.testing.assert_allclose(np.asarray(ours.positions), p_ref, atol=1e-2)
    np.testing.assert_allclose(np.asarray(ours.velocities), v_ref, atol=1e-2)
    np.testing.assert_allclose(np.asarray(ours.thrust_vectors), T_ref, atol=1e-2)


def test_goal_clipping_to_envelope():
    goal = np.array([250.0, -150.0, 50.0])
    ours = solve_reference_mode(CFG, np.zeros(3), np.zeros(3), goal)
    np.testing.assert_allclose(
        np.asarray(ours.positions)[0], [100.0, -100.0, 50.0], atol=1e-5
    )


def test_condensed_solver_tracks_reference_positions():
    """The condensed (dynamics-feasible) solver should reach the same
    neighborhood as the reference's converged positions by the end of the
    horizon — same cost model, feasibility added."""
    p0 = np.array([0.0, 0.0, 2.0])
    goal = np.array([4.0, 1.0, 3.0])
    prob = se3_mpc.make_problem(p0, np.zeros(3), goal, config=CFG)
    res = se3_mpc.solve_se3_mpc(CFG, prob, use_obstacles=False)
    ref = solve_reference_mode(CFG, p0, np.zeros(3), goal)
    end_gap = np.linalg.norm(
        np.asarray(res.positions)[-1] - np.asarray(ref.positions)[-1]
    )
    assert end_gap < 1.0, end_gap
