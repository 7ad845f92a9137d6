"""Trajectory smoother tests (reference trajectory_smoother.py behaviors)."""

import jax
import jax.numpy as jnp
import numpy as np

from dart_planner_tpu.common.types import DroneState, Trajectory
from dart_planner_tpu.control.smoother import (
    SmootherConfig,
    SmootherState,
    TrajectorySmoother,
    get_desired_state,
    update_trajectory,
)


def _line_traj(p0, p1, t0=0.0, N=20, dt=0.1):
    ts = t0 + dt * np.arange(N)
    alpha = np.linspace(0, 1, N)[:, None]
    pos = (1 - alpha) * np.asarray(p0) + alpha * np.asarray(p1)
    vel = np.broadcast_to((np.asarray(p1) - np.asarray(p0)) / ((N - 1) * dt), (N, 3))
    return Trajectory(
        timestamps=jnp.asarray(ts, jnp.float32),
        positions=jnp.asarray(pos, jnp.float32),
        velocities=jnp.asarray(vel, jnp.float32),
        accelerations=jnp.zeros((N, 3), jnp.float32),
    )


def test_failsafe_hold_without_plan():
    sm = TrajectorySmoother()
    ds = DroneState.create(position=(1.0, 2.0, 3.0))
    pos, vel, acc = sm.get_desired_state(0.0, ds)
    np.testing.assert_allclose(np.asarray(pos), [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(vel), 0, atol=1e-6)


def test_follows_trajectory():
    sm = TrajectorySmoother()
    ds = DroneState.create(position=(0.0, 0.0, 0.0))
    traj = _line_traj([0, 0, 0], [10, 0, 0])
    sm.update_trajectory(traj, 0.0)
    # drive at the 100 Hz rate the rate limiters assume (TS:180)
    for t in np.arange(0.0, 0.95, 0.01):
        pos_mid, vel_mid, _ = sm.get_desired_state(t, ds)
    # halfway through a 1.9 s straight line: x ~ 5 (smoothing lags slightly)
    assert 3.0 < float(pos_mid[0]) < 6.0
    # velocity feedforward tracks the plan through time-based slew limits
    # + exponential smoothing (plan cruise is ~5.3 m/s; the filter lags)
    assert 1.5 < float(vel_mid[0]) < 6.0


def test_interpolation_clamps_at_end():
    sm = TrajectorySmoother()
    ds = DroneState.create()
    traj = _line_traj([0, 0, 0], [10, 0, 0])
    sm.update_trajectory(traj, 0.0)
    for t in np.arange(0.0, 1.9, 0.01):
        sm.get_desired_state(t, ds)  # prime smoothing along the way
    pos, vel, acc = sm.get_desired_state(5.0, ds)  # past the 1.9s plan end...
    # ...but also past the 2s failsafe? 5.0 - 0.0 > 2 -> failsafe hold
    np.testing.assert_allclose(np.asarray(pos), np.asarray(ds.position), atol=1e-5)


def test_jump_starts_min_jerk_transition():
    cfg = SmootherConfig()
    state = SmootherState.zeros(20)
    t1 = _line_traj([0, 0, 0], [0, 0, 0])  # hover at origin
    state = update_trajectory(cfg, state, t1, jnp.asarray(0.0))
    ds = DroneState.create()
    (_, _, _), state = get_desired_state(cfg, state, jnp.asarray(0.1), ds)
    # new plan starts 2 m away -> jump
    t2 = _line_traj([2, 0, 0], [5, 0, 0], t0=0.1)
    state = update_trajectory(cfg, state, t2, jnp.asarray(0.1))
    assert bool(state.in_transition)
    # during the blend the command moves smoothly from 0 toward 2
    xs = []
    for t in np.arange(0.1, 0.1 + cfg.transition_time, 0.05):
        (pos, vel, acc), state = get_desired_state(cfg, state, jnp.asarray(t), ds)
        xs.append(float(pos[0]))
    assert xs[0] < 0.5  # starts near the old command
    assert all(b >= a - 1e-4 for a, b in zip(xs, xs[1:]))  # monotone blend
    # after the transition it follows the new plan
    (pos, vel, acc), state = get_desired_state(
        cfg, state, jnp.asarray(0.1 + cfg.transition_time + 0.05), ds
    )
    assert not bool(state.in_transition)


def test_no_jump_no_transition():
    cfg = SmootherConfig()
    state = SmootherState.zeros(20)
    t1 = _line_traj([0, 0, 0], [10, 0, 0])
    state = update_trajectory(cfg, state, t1, jnp.asarray(0.0))
    ds = DroneState.create()
    (_, _, _), state = get_desired_state(cfg, state, jnp.asarray(0.1), ds)
    # replan from nearly the same state -> no transition
    t2 = _line_traj([0.55, 0, 0], [10, 0, 0], t0=0.1)
    state = update_trajectory(cfg, state, t2, jnp.asarray(0.1))
    assert not bool(state.in_transition)


def test_vmapped_smoothers():
    cfg = SmootherConfig()
    B, N = 4, 20
    states = SmootherState.zeros(N, (B,))
    trajs = jax.vmap(lambda i: _line_traj([0, 0, 0], [10, 0, 0]))(jnp.arange(B))
    t = jnp.zeros(B)
    states = jax.vmap(lambda s, tr, tt: update_trajectory(cfg, s, tr, tt))(
        states, trajs, t
    )
    ds = DroneState.zeros((B,))
    (pos, vel, acc), states = jax.vmap(
        lambda s, tt, d: get_desired_state(cfg, s, tt, d)
    )(states, jnp.full((B,), 0.5), ds)
    assert pos.shape == (B, 3)
    assert np.isfinite(np.asarray(pos)).all()
