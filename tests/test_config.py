"""Config system tests (reference test_frozen_config.py scope)."""

import os

import numpy as np
import pytest

from dart_planner_tpu.common.errors import ConfigurationError
from dart_planner_tpu.config import (
    ConfigurationManager,
    DARTPlannerFrozenConfig,
    get_frozen_config,
    reset_frozen_config,
    load_vehicle_params,
    compute_max_torque_xyz,
)


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    for k in list(os.environ):
        if k.startswith("DART_"):
            monkeypatch.delenv(k, raising=False)
    reset_frozen_config()
    yield
    reset_frozen_config()


def test_defaults_load():
    cfg = get_frozen_config()
    assert cfg.hardware.control_frequency == 400.0
    assert cfg.planning.prediction_horizon == 20
    assert cfg.coordinate_frame.world_frame == "ENU"


def test_frozen_rejects_mutation():
    cfg = get_frozen_config()
    with pytest.raises(Exception):
        cfg.debug = True
    with pytest.raises(Exception):
        cfg.hardware.control_frequency = 1.0


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("DART_CONTROL_FREQUENCY", "800")
    monkeypatch.setenv("DART_PREDICTION_HORIZON", "10")
    monkeypatch.setenv("DART_DEBUG", "true")
    cfg = ConfigurationManager().load()
    assert cfg.hardware.control_frequency == 800.0
    assert cfg.planning.prediction_horizon == 10
    assert cfg.debug is True


def test_bad_env_override(monkeypatch):
    monkeypatch.setenv("DART_ZMQ_PORT", "not-a-port")
    with pytest.raises(ConfigurationError):
        ConfigurationManager().load()


def test_validation_planning_vs_control(monkeypatch):
    monkeypatch.setenv("DART_CONTROL_FREQUENCY", "40")
    monkeypatch.setenv("DART_PLANNING_FREQUENCY", "50")
    with pytest.raises(ConfigurationError):
        ConfigurationManager().load()


def test_invalid_world_frame(monkeypatch):
    monkeypatch.setenv("DART_WORLD_FRAME", "XYZ")
    with pytest.raises(ConfigurationError):
        ConfigurationManager().load()


def test_planning_to_se3_config():
    cfg = get_frozen_config()
    se3 = cfg.planning.to_se3_config()
    assert se3.prediction_horizon == 20
    assert se3.dt == 0.1
    assert se3.obstacle_weight == 1000.0


def test_vehicle_params_and_torque():
    p = load_vehicle_params()
    assert p.mass == 1.5
    assert p.max_total_thrust == 48.0
    tau = compute_max_torque_xyz(p)
    # x-geometry: 0.225*sin(45)*2*12 = 3.818 roll/pitch, 0.72 yaw
    np.testing.assert_allclose(tau[0], 0.225 * np.sin(np.pi / 4) * 24, rtol=1e-6)
    np.testing.assert_allclose(tau[2], 0.72, rtol=1e-6)
    assert 0 < p.hover_throttle_fraction < 1


def test_real_time_config_defaults_and_budget_validation():
    """RealTimeConfig (reference frozen_config.py:82-112): loop
    frequencies + latency budgets, cross-validated so every budget fits
    its loop period."""
    import pytest
    from dart_planner_tpu.config.frozen_config import (
        RealTimeConfig,
        get_frozen_config,
        reset_frozen_config,
    )

    reset_frozen_config()
    cfg = get_frozen_config()
    rt = cfg.real_time
    assert rt.control_loop_frequency_hz == 400.0
    assert rt.safety_priority > rt.control_priority > rt.planning_priority
    # a control budget exceeding the control period must be rejected
    with pytest.raises(Exception):
        RealTimeConfig(control_loop_frequency_hz=1000.0,
                       max_control_latency_ms=5.0)
    # frozen: mutation rejected
    with pytest.raises(Exception):
        rt.control_loop_frequency_hz = 100.0


def test_real_time_config_builds_scheduler_tasks():
    from dart_planner_tpu.config.frozen_config import RealTimeConfig
    from dart_planner_tpu.runtime.scheduler import TaskPriority

    rt = RealTimeConfig()
    noop = lambda: None  # noqa: E731
    tasks = rt.quartic_tasks(noop, noop, noop)
    by_name = {t.name: t for t in tasks}
    assert by_name["safety"].priority == TaskPriority.CRITICAL
    assert by_name["control"].frequency_hz == 400.0
    # deadline fraction encodes the latency budget within the period
    assert by_name["control"].deadline_s == pytest.approx(2.5e-3)
    assert by_name["planning"].deadline_s == pytest.approx(40e-3)


def test_real_time_env_overrides(monkeypatch):
    from dart_planner_tpu.config.frozen_config import (
        ConfigurationManager,
    )

    # note: raising the control frequency alone is rejected by the
    # budget-fits-period validator (2.5 ms default budget > 2 ms period
    # at 500 Hz) — an override must stay self-consistent
    monkeypatch.setenv("DART_RT_CONTROL_FREQUENCY", "250")
    monkeypatch.setenv("DART_RT_MAX_PLANNING_LATENCY_MS", "30")
    cfg = ConfigurationManager().load()
    assert cfg.real_time.control_loop_frequency_hz == 250.0
    assert cfg.real_time.max_planning_latency_ms == 30.0
