"""Dynamics tests: scan vs closed-form rollout, reference transcription."""

import jax.numpy as jnp
import numpy as np

from dart_planner_tpu.common import frames
from dart_planner_tpu.ops import dynamics

MASS = 1.5
G = 9.81
GVEC = frames.gravity_vector(frames.WorldFrame.ENU, G)


def _naive_rollout(u, p0, v0, dt):
    """Direct transcription of the reference recursion
    (se3_mpc_planner.py:443-461) in plain numpy."""
    N = u.shape[0]
    p = np.zeros((N, 3))
    v = np.zeros((N, 3))
    p[0], v[0] = p0, v0
    for k in range(N - 1):
        a = u[k] / MASS - np.array([0, 0, G])
        p[k + 1] = p[k] + v[k] * dt + 0.5 * a * dt**2
        v[k + 1] = v[k] + a * dt
    return p, v


def test_linear_rollout_matches_reference_recursion(rng):
    N, dt = 20, 0.1
    u = rng.normal(size=(N, 3)).astype(np.float64) * 3 + np.array([0, 0, MASS * G])
    p0 = rng.normal(size=3)
    v0 = rng.normal(size=3)
    pos, vel, acc = dynamics.rollout_linear(
        jnp.asarray(u), jnp.asarray(p0), jnp.asarray(v0), dt, MASS, GVEC.astype(jnp.float64)
    )
    p_ref, v_ref = _naive_rollout(u, p0, v0, dt)
    np.testing.assert_allclose(pos, p_ref, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(vel, v_ref, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(acc, u / MASS - np.array([0, 0, G]), rtol=1e-12)


def test_scan_matches_linear(rng):
    N, dt = 12, 0.125
    u = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32) * 5
    p0 = jnp.asarray(rng.normal(size=3), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=3), jnp.float32)
    g32 = GVEC.astype(jnp.float32)
    out_lin = dynamics.rollout_linear(u, p0, v0, dt, MASS, g32)
    out_scan = dynamics.rollout_scan(u, p0, v0, dt, MASS, g32)
    for a, b in zip(out_lin, out_scan):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_batched_rollout(rng):
    B, N, dt = 32, 8, 0.1
    u = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    p0 = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    pos, vel, acc = dynamics.rollout_linear(u, p0, v0, dt, MASS, GVEC.astype(jnp.float32))
    assert pos.shape == (B, N, 3)
    # batch element 3 equals its own single rollout
    pos3, vel3, _ = dynamics.rollout_linear(
        u[3], p0[3], v0[3], dt, MASS, GVEC.astype(jnp.float32)
    )
    np.testing.assert_allclose(pos[3], pos3, rtol=1e-6)
    np.testing.assert_allclose(vel[3], vel3, rtol=1e-6)


def test_hover_is_fixed_point():
    """Hover thrust keeps the vehicle stationary."""
    N, dt = 10, 0.1
    u = jnp.broadcast_to(jnp.array([0.0, 0.0, MASS * G]), (N, 3))
    p0 = jnp.array([1.0, 2.0, 3.0])
    v0 = jnp.zeros(3)
    pos, vel, acc = dynamics.rollout_linear(u, p0, v0, dt, MASS, GVEC)
    np.testing.assert_allclose(pos, np.tile([1, 2, 3], (N, 1)), atol=1e-5)
    np.testing.assert_allclose(vel, 0.0, atol=1e-6)
    np.testing.assert_allclose(acc, 0.0, atol=1e-6)


def test_simulator_step_matches_reference_semantics():
    """Thrust along world z, semi-implicit Euler
    (reference drone_simulator.py:52-72)."""
    pos = jnp.array([0.0, 0.0, 1.0])
    vel = jnp.array([1.0, 0.0, 0.0])
    att = jnp.zeros(3)
    ang = jnp.zeros(3)
    thrust = jnp.array(MASS * G)
    torque = jnp.array([0.1, 0.0, 0.0])
    dt = 0.01
    npos, nvel, natt, nang = dynamics.simulator_step(
        pos, vel, att, ang, thrust, torque, dt, mass=MASS, gravity=G
    )
    # hover thrust: vertical acc 0, velocity unchanged, x advances
    np.testing.assert_allclose(nvel, [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(npos, [0.01, 0.0, 1.0], atol=1e-6)
    # torque around x with Ixx=0.1 -> ang acc 1 rad/s^2
    np.testing.assert_allclose(nang, [0.01, 0.0, 0.0], atol=1e-8)
    np.testing.assert_allclose(natt, [0.0001, 0.0, 0.0], atol=1e-8)
