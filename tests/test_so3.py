"""SO(3) operator tests: round trips, invariants, degenerate inputs."""

import jax
import jax.numpy as jnp
import numpy as np

from dart_planner_tpu.ops import so3


def test_hat_vee_roundtrip(rng):
    v = jnp.asarray(rng.normal(size=(7, 3)), jnp.float32)
    np.testing.assert_allclose(so3.vee(so3.hat(v)), v, rtol=1e-6)


def test_hat_cross_product(rng):
    a = rng.normal(size=3).astype(np.float32)
    b = rng.normal(size=3).astype(np.float32)
    np.testing.assert_allclose(
        so3.hat(jnp.asarray(a)) @ b, np.cross(a, b), rtol=1e-5, atol=1e-6
    )


def test_euler_rotmat_roundtrip(rng):
    # keep pitch away from +-pi/2 gimbal lock
    e = np.stack(
        [
            rng.uniform(-3, 3, size=50),
            rng.uniform(-1.4, 1.4, size=50),
            rng.uniform(-3, 3, size=50),
        ],
        axis=-1,
    ).astype(np.float32)
    R = so3.euler_to_rotmat(jnp.asarray(e))
    # orthonormality + det 1
    eye = jnp.einsum("...ij,...kj->...ik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
    e2 = so3.rotmat_to_euler(R)
    np.testing.assert_allclose(e2, e, rtol=1e-4, atol=1e-4)


def test_euler_matches_reference_formula():
    """Spot-check the ZYX formula against hand-derived entries
    (reference geometric_controller.py:770-784)."""
    roll, pitch, yaw = 0.1, -0.2, 0.7
    R = np.asarray(so3.euler_to_rotmat(jnp.array([roll, pitch, yaw])))
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    expected = np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_quat_to_rotmat_identity_and_normalization():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(so3.quat_to_rotmat(q), np.eye(3), atol=1e-6)
    # non-normalized input gives same rotation
    q2 = jnp.array([2.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(so3.quat_to_rotmat(q2), np.eye(3), atol=1e-6)
    # degenerate -> identity
    np.testing.assert_allclose(so3.quat_to_rotmat(jnp.zeros(4)), np.eye(3), atol=1e-6)


def test_thrust_yaw_frame_properties(rng):
    t = jnp.asarray(rng.normal(size=(20, 3)) * 10 + np.array([0, 0, 15]), jnp.float32)
    yaw = jnp.asarray(rng.uniform(-3, 3, size=20), jnp.float32)
    R = so3.thrust_yaw_to_rotmat(t, yaw)
    # column 3 is the thrust direction
    b3 = np.asarray(t / jnp.linalg.norm(t, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(R)[..., :, 2], b3, atol=1e-5)
    # orthonormal
    eye = jnp.einsum("...ji,...jk->...ik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)


def test_thrust_yaw_degenerate_cases():
    # zero thrust -> identity
    R = so3.thrust_yaw_to_rotmat(jnp.zeros(3), jnp.array(0.3))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
    # thrust parallel to yaw vector (horizontal thrust along x, yaw 0)
    R2 = so3.thrust_yaw_to_rotmat(jnp.array([5.0, 0.0, 0.0]), jnp.array(0.0))
    R2 = np.asarray(R2)
    assert np.all(np.isfinite(R2))
    np.testing.assert_allclose(R2 @ R2.T, np.eye(3), atol=1e-5)


def test_attitude_error_zero_at_agreement(rng):
    e = jnp.asarray(rng.uniform(-1, 1, size=(5, 3)), jnp.float32)
    R = so3.euler_to_rotmat(e)
    err = so3.attitude_error(R, R)
    np.testing.assert_allclose(err, 0.0, atol=1e-6)


def test_body_rates_constant_rotation():
    # constant attitude sequence -> zero rates
    R = so3.euler_to_rotmat(jnp.array([0.1, 0.2, 0.3]))
    Rs = jnp.broadcast_to(R, (6, 3, 3))
    omega = so3.body_rates_from_rotmats(Rs, 0.1)
    np.testing.assert_allclose(omega, 0.0, atol=1e-6)


def test_body_rates_yaw_spin():
    # pure yaw spin at rate w -> body z rate ~ w
    w = 0.5
    dt = 0.01
    yaws = jnp.arange(10) * w * dt
    e = jnp.stack([jnp.zeros(10), jnp.zeros(10), yaws], axis=-1)
    Rs = so3.euler_to_rotmat(e)
    omega = so3.body_rates_from_rotmats(Rs, dt)
    np.testing.assert_allclose(np.asarray(omega)[1:, 2], w, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(omega)[1:, :2], 0.0, atol=1e-4)


def test_jit_vmap_composable(rng):
    f = jax.jit(jax.vmap(so3.euler_to_rotmat))
    e = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    assert f(e).shape == (16, 3, 3)
