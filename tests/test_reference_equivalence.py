"""Reference-equivalence gate (SURVEY.md section 4, BASELINE.md):

match the reference SE(3) MPC's control sequences at horizon N=20 within
tolerance — against GOLDEN OUTPUTS recorded from the ACTUAL reference
implementation (/root/reference's ``SE3MPCPlanner.plan_trajectory``,
se3_mpc_planner.py:215,256-268, run under the pint shim in
``tests/fixtures/pint_shim`` by ``scripts/make_golden_fixtures.py``).

Two fixture sets, both produced by the reference's own code path:

- ``reference_n20.npz`` — shipped config (max_iterations=15, tol=5e-2):
  what the reference actually emits in its 10 Hz loop.
- ``reference_n20_converged.npz`` — same code run until scipy's own
  criteria bind (maxiter=500, tol=1e-10), so outputs are the stable
  stall point of the reference's (objective, gradient, bounds) triple
  rather than an iteration-count artifact.

Measured fixture facts the tolerances below are set from (see
scripts/make_golden_fixtures.py; deviations quoted are maxima over all
cases): converged positions sit on clip(goal, +-100) to 8e-3 m,
velocities within 0.12 m/s of zero, thrust stays a line-search stall
0.35-0.48 N below hover (1.99 N for envelope-clipped goals) with
EXACTLY zero x/y components, and the recorded trajectories fly 0.31 m
inside an obstacle overlapping the goal (case 20) because L-BFGS-B is
bounds-only and never sees the sphere constraints (:499-514).
"""

from pathlib import Path

import numpy as np
import pytest

from dart_planner_tpu.ops import so3
from dart_planner_tpu.planning import se3_mpc
from dart_planner_tpu.planning.reference_mode import solve_reference_mode

GOLDEN_DIR = Path(__file__).parent / "fixtures" / "golden"

N = 20
DT = 0.1
MASS = 1.5
G = 9.81
HOVER = MASS * G
CFG = se3_mpc.SE3MPCConfig(prediction_horizon=N, dt=DT)


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN_DIR / "reference_n20.npz")


@pytest.fixture(scope="module")
def golden_converged():
    return np.load(GOLDEN_DIR / "reference_n20_converged.npz")


def test_reference_mode_matches_golden_converged(golden_converged):
    """``reference_mode`` (the closed-form model of the reference's
    converged behaviour) vs the real reference run to convergence."""
    d = golden_converged
    for i in range(len(d["goal"])):
        ours = solve_reference_mode(CFG, d["p0"][i], d["v0"][i], d["goal"][i])
        np.testing.assert_allclose(
            np.asarray(ours.positions), d["positions"][i], atol=0.02,
            err_msg=f"case {i} positions",
        )
        np.testing.assert_allclose(
            np.asarray(ours.velocities), d["velocities"][i], atol=0.15,
            err_msg=f"case {i} velocities",
        )
        # thrust x/y: exactly zero on both sides (gradient has no
        # cross-terms; bounds symmetric)
        np.testing.assert_allclose(
            np.asarray(ours.thrust_vectors)[:, :2],
            d["thrust_vectors"][i][:, :2],
            atol=1e-9,
            err_msg=f"case {i} thrust xy",
        )
        # thrust z: our model says hover; the real stall point is
        # 0.35-0.48 N below it (1.99 N when the goal clips the envelope
        # and the position terms keep the line search alive longer)
        atol_z = 2.1 if i in (15, 16) else 0.55
        np.testing.assert_allclose(
            np.asarray(ours.thrust_vectors)[:, 2],
            d["thrust_vectors"][i][:, 2],
            atol=atol_z,
            err_msg=f"case {i} thrust z",
        )


def test_reference_mode_final_position_matches_shipped(golden):
    """At the shipped 15-iteration budget the terminal step already sits
    on clip(goal) (10x terminal cost): ours must match to 2 cm."""
    d = golden
    for i in range(len(d["goal"])):
        ours = solve_reference_mode(CFG, d["p0"][i], d["v0"][i], d["goal"][i])
        np.testing.assert_allclose(
            np.asarray(ours.positions)[-1], d["positions"][i][-1], atol=0.02,
            err_msg=f"case {i}",
        )


def test_attitude_extraction_matches_reference(golden):
    """Our SO(3) attitude/body-rate extraction vs the reference's
    (se3_mpc_planner.py:604-654), fed the reference's own recorded
    thrust vectors — tight numeric equivalence, including the shared
    ``b1 = c x b3`` yaw convention (yaw = -pi/2 at hover)."""
    d = golden
    for i in range(len(d["goal"])):
        T = d["thrust_vectors"][i].astype(np.float64)
        yaw = np.zeros(N)
        Rs = so3.thrust_yaw_to_rotmat(T, yaw)
        att = np.asarray(so3.rotmat_to_euler(Rs))
        rates = np.asarray(so3.body_rates_from_rotmats(Rs, DT))
        np.testing.assert_allclose(
            att, d["attitudes"][i], atol=1e-6, err_msg=f"case {i} attitudes"
        )
        np.testing.assert_allclose(
            rates, d["body_rates"][i], atol=1e-5, err_msg=f"case {i} rates"
        )


def test_condensed_solver_tracks_golden_end_positions(golden):
    """The condensed (dynamics-feasible) solver must land within 0.3 m of
    the reference's recorded terminal position for every flyable goal.

    Underground goals (z < 0, cases 7 and 14) are excluded: the
    reference teleports its kinematically-unconstrained positions there;
    a feasible 2 s trajectory from z~5 m legitimately cannot follow
    (measured gaps 1.0/2.6 m) — the superset semantics, not an error."""
    d = golden
    checked = 0
    for i in range(15):
        if d["goal"][i][2] < 0:
            continue
        prob = se3_mpc.make_problem(
            d["p0"][i], d["v0"][i], d["goal"][i], config=CFG
        )
        res = se3_mpc.solve_se3_mpc(CFG, prob, use_obstacles=False)
        gap = np.linalg.norm(
            np.asarray(res.positions)[-1] - d["positions"][i][-1]
        )
        assert gap < 0.3, f"case {i}: end gap {gap:.3f} m"
        checked += 1
    assert checked >= 12  # the case list holds >=12 flyable goals


def test_obstacle_superset_vs_golden_case20(golden):
    """Case 20: obstacle (r=1 m) overlapping the goal. The recorded
    reference path flies INSIDE it (bounds-only L-BFGS-B); our solver
    with obstacle hinges must keep full clearance on the same problem."""
    d = golden
    center = d["obstacles"][-1][1:4]
    radius = d["obstacles"][-1][4]
    ref_min = np.linalg.norm(d["positions"][20] - center, axis=1).min()
    assert ref_min < radius, "fixture no longer records the penetration"

    obs = np.array([[*center, radius]], dtype=np.float32)
    prob = se3_mpc.make_problem(
        d["p0"][20], d["v0"][20], d["goal"][20], obstacles=obs, config=CFG
    )
    res = se3_mpc.solve_se3_mpc(CFG, prob)
    ours_min = np.linalg.norm(
        np.asarray(res.positions) - center, axis=1
    ).min()
    assert ours_min >= radius, f"ours {ours_min:.3f} < r={radius}"


def test_goal_clipping_matches_golden_envelope_cases(golden):
    """Cases 15/16 have goals outside the +-100 m envelope; the recorded
    terminal positions are the per-axis clip — and so are ours."""
    d = golden
    for i in (15, 16):
        ours = solve_reference_mode(CFG, d["p0"][i], d["v0"][i], d["goal"][i])
        clipped = np.clip(d["goal"][i], -100.0, 100.0)
        np.testing.assert_allclose(d["positions"][i][-1], clipped, atol=0.02)
        np.testing.assert_allclose(
            np.asarray(ours.positions)[-1], clipped, atol=1e-5
        )


def test_reference_mode_exact_matches_scipy_true_gradient():
    """Independent anchor kept from round 1: with the *correct* gradient
    of the reference's separable objective (se3_mpc_planner.py:516-550),
    scipy L-BFGS-B lands on hover thrust at the goal — and so does
    ``gradient='exact'``. Guards against the golden fixtures and the
    solver sharing a misreading of the objective."""
    scipy_opt = pytest.importorskip("scipy.optimize")

    W_POS, W_VEL, W_ACC, W_T = 100.0, 10.0, 1.0, 0.1
    MAX_V, MAX_T, MIN_T = 10.0, 25.0, 2.0
    MAX_TILT = np.pi / 4

    def unpack(x):
        return (
            x[: N * 3].reshape(N, 3),
            x[N * 3 : 2 * N * 3].reshape(N, 3),
            x[2 * N * 3 :].reshape(N, 3),
        )

    p0 = np.array([1.0, 1.0, 3.0])
    v0 = np.array([0.5, 0.0, 0.0])
    goal = np.array([-2.0, 6.0, 8.0])

    def objective(x):
        p, v, T = unpack(x)
        a = T / MASS - np.array([0, 0, G])
        cost = W_POS * np.sum((p - goal) ** 2)
        cost += W_VEL * np.sum(v**2)
        cost += W_ACC * np.sum(a**2)
        cost += W_T * np.sum((T - np.array([0, 0, HOVER])) ** 2)
        cost += 10 * W_POS * np.sum((p[-1] - goal) ** 2)
        return cost

    def true_grad(x):
        p, v, T = unpack(x)
        g = np.zeros_like(x)
        gp = 2 * W_POS * (p - goal)
        gp[-1] += 2 * 10 * W_POS * (p[-1] - goal)
        g[: N * 3] = gp.ravel()
        g[N * 3 : 2 * N * 3] = (2 * W_VEL * v).ravel()
        a = T / MASS - np.array([0, 0, G])
        gT = 2 * W_ACC * a / MASS + 2 * W_T * (T - np.array([0, 0, HOVER]))
        g[2 * N * 3 :] = gT.ravel()
        return g

    bounds = [(-100.0, 100.0)] * (N * 3) + [(-MAX_V, MAX_V)] * (N * 3)
    mtt = MAX_T * np.sin(MAX_TILT)
    for _ in range(N):
        bounds += [(-mtt, mtt), (-mtt, mtt), (MIN_T, MAX_T)]

    x0 = np.zeros(9 * N)
    x0[: N * 3] = np.linspace(p0, goal, N).ravel()
    x0[2 * N * 3 :] = np.tile([0, 0, HOVER], N)
    res = scipy_opt.minimize(
        objective, x0, jac=true_grad, method="L-BFGS-B", bounds=bounds,
        options={"maxiter": 200, "gtol": 1e-8, "ftol": 1e-12},
    )
    p_ref, v_ref, T_ref = unpack(res.x)

    ours = solve_reference_mode(CFG, p0, v0, goal, gradient="exact")
    np.testing.assert_allclose(np.asarray(ours.positions), p_ref, atol=1e-2)
    np.testing.assert_allclose(np.asarray(ours.velocities), v_ref, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(ours.thrust_vectors), T_ref, atol=1e-2
    )
