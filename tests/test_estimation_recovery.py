"""Estimation + error-recovery tests."""

import time
from unittest.mock import MagicMock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dart_planner_tpu.common.error_recovery import (
    CircuitBreaker,
    CircuitBreakerOpenError,
    CircuitState,
    GracefulDegradation,
    RetryConfig,
    retry_with_backoff,
)
from dart_planner_tpu.estimation import (
    EKFConfig,
    PX4EKF2StateEstimator,
    SimGroundTruthEstimator,
    ekf_init,
    ekf_predict,
    ekf_update_position,
)


# ---- EKF ----
def test_ekf_converges_on_noisy_position():
    cfg = EKFConfig()
    rng = np.random.default_rng(0)
    dt = 0.01
    true_p = np.zeros(3)
    true_v = np.array([1.0, 0.5, 0.0])
    st = ekf_init(np.zeros(3) + rng.normal(0, 1, 3))
    for k in range(200):
        true_p = true_p + true_v * dt
        st = ekf_predict(cfg, st, jnp.zeros(3), dt)
        if k % 5 == 0:
            z = true_p + rng.normal(0, 0.05, 3)
            st = ekf_update_position(cfg, st, z)
    p_est = np.asarray(st.x[:3])
    v_est = np.asarray(st.x[3:6])
    assert np.linalg.norm(p_est - true_p) < 0.1
    assert np.linalg.norm(v_est - true_v) < 0.3  # velocity inferred from positions


def test_ekf_vmapped_fleet():
    cfg = EKFConfig()
    B = 16
    st = ekf_init(np.random.rand(B, 3).astype(np.float32))
    st2 = jax.vmap(lambda s: ekf_predict(cfg, s, jnp.zeros(3), 0.01))(st)
    assert st2.x.shape == (B, 9)
    assert np.isfinite(np.asarray(st2.P)).all()


# ---- adapters ----
def test_px4_adapter_parses_messages():
    conn = MagicMock()
    att = MagicMock()
    att.get_type.return_value = "ATTITUDE"
    att.roll, att.pitch, att.yaw = 0.1, -0.05, 1.0
    att.rollspeed, att.pitchspeed, att.yawspeed = 0.01, 0.0, -0.02
    odom = MagicMock()
    odom.get_type.return_value = "ODOMETRY"
    odom.x, odom.y, odom.z = 1.0, 2.0, 3.0
    odom.roll, odom.pitch, odom.yaw = 0.1, -0.05, 1.0
    odom.vx, odom.vy, odom.vz = 0.5, 0.0, -0.1
    odom.rollspeed, odom.pitchspeed, odom.yawspeed = 0, 0, 0
    conn.recv_match.side_effect = [att, odom, None]
    est = PX4EKF2StateEstimator(conn)
    est.update()
    s = est.get_latest()
    assert s is not None and s.source == "PX4_EKF2"
    np.testing.assert_allclose(np.asarray(s.pose.position), [1, 2, 3])
    ds = s.to_drone_state()
    np.testing.assert_allclose(np.asarray(ds.velocity), [0.5, 0, -0.1])


def test_sim_ground_truth_estimator():
    from dart_planner_tpu.hardware import VehicleIOFactory

    v = VehicleIOFactory.create("simulated", {"initial_position": (1.0, 2.0, 3.0)})
    est = SimGroundTruthEstimator(v)
    est.update()
    s = est.get_latest()
    np.testing.assert_allclose(np.asarray(s.pose.position), [1, 2, 3], atol=1e-6)


# ---- retry / circuit breaker ----
def test_retry_eventually_succeeds():
    calls = {"n": 0}

    @retry_with_backoff(RetryConfig(max_attempts=4, base_delay=0.001))
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ValueError("boom")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 3


def test_retry_raises_after_exhaustion():
    @retry_with_backoff(RetryConfig(max_attempts=2, base_delay=0.001))
    def always_fails():
        raise ValueError("nope")

    with pytest.raises(ValueError):
        always_fails()


def test_circuit_breaker_opens_and_recovers():
    cb = CircuitBreaker(failure_threshold=2, recovery_timeout=0.05)

    def fail():
        raise RuntimeError("down")

    for _ in range(2):
        with pytest.raises(RuntimeError):
            cb.call(fail)
    assert cb.state is CircuitState.OPEN
    with pytest.raises(CircuitBreakerOpenError):
        cb.call(lambda: "hi")
    time.sleep(0.06)  # recovery window
    assert cb.call(lambda: "hi") == "hi"  # half-open probe succeeds
    assert cb.state is CircuitState.CLOSED


def test_graceful_degradation_fallback():
    gd = GracefulDegradation()
    gd.register_fallback("plan", lambda: "hover")
    assert gd.execute("plan", lambda: "trajectory") == "trajectory"

    def broken():
        raise RuntimeError("solver died")

    assert gd.execute("plan", broken) == "hover"
    with pytest.raises(RuntimeError):
        gd.execute("other", broken)
