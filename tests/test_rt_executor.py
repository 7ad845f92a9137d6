"""C++ real-time executor tests (reference test_rt_control_extension.py
scope: loop rate, deadline/jitter stats, PID outputs)."""

import time

import numpy as np
import pytest

from dart_planner_tpu.common.errors import RealTimeError
from dart_planner_tpu.runtime.rt_executor import (
    PythonControlLoop,
    RealTimeControlLoop,
    create_control_loop,
    native_available,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="g++/native build unavailable"
)


@needs_native
@pytest.mark.flaky  # wall-clock rate assertions on a shared box
def test_native_loop_runs_at_rate():
    loop = RealTimeControlLoop(frequency_hz=500.0)
    loop.set_gains([1, 1, 4], [0, 0, 0.1], [0.5, 0.5, 2],
                   [8, 8, 4], [0, 0, 0], [2, 2, 1])
    loop.set_state([0, 0, 1.8], [0, 0, 0], [0, 0, 0], [0, 0, 0])
    loop.set_setpoint([0, 0, 2.0], [0, 0, 0], [0, 0, 0], [0, 0, 0],
                      thrust_ff=14.7)
    loop.start()
    time.sleep(0.5)
    cmd = loop.get_command()
    stats = loop.get_stats()
    loop.stop()
    # ~250 iterations in 0.5 s at 500 Hz (allow heavy CI derating)
    assert stats["iteration_count"] > 100, stats
    assert stats["frequency_actual_hz"] > 200, stats
    # PID: 0.2 m altitude error * kp_z=4 -> thrust above feedforward
    assert cmd is not None and cmd["thrust"] > 14.7
    assert stats["mean_execution_time_ms"] < 1.0
    assert 0.0 <= stats["success_rate"] <= 1.0


@needs_native
def test_native_loop_attitude_rates():
    loop = RealTimeControlLoop(frequency_hz=500.0)
    loop.set_gains([0, 0, 0], [0, 0, 0], [0, 0, 0],
                   [8, 8, 4], [0, 0, 0], [0, 0, 0])
    loop.set_state([0, 0, 2], [0, 0, 0], [0.1, 0.0, -0.2], [0, 0, 0])
    loop.set_setpoint([0, 0, 2], [0, 0, 0], [0, 0, 0], [0, 0, 0], 14.7)
    loop.start()
    time.sleep(0.1)
    cmd = loop.get_command()
    loop.stop()
    assert cmd["roll_rate"] == pytest.approx(-0.8, rel=1e-6)  # -8*0.1
    assert cmd["yaw_rate"] == pytest.approx(0.8, rel=1e-6)  # -4*(-0.2)


@needs_native
def test_native_frequency_cap():
    with pytest.raises(RealTimeError):
        RealTimeControlLoop(frequency_hz=2000.0)


@needs_native
def test_native_no_output_without_state():
    loop = RealTimeControlLoop(frequency_hz=500.0)
    loop.start()
    time.sleep(0.05)
    assert loop.get_command() is None  # no valid state/setpoint yet
    loop.stop()


@pytest.mark.flaky  # wall-clock rate assertions on a shared box
def test_python_fallback_loop():
    loop = PythonControlLoop(frequency_hz=200.0)
    loop.set_gains([1, 1, 4], [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0])
    loop.set_state([0, 0, 1.0], [0, 0, 0], [0, 0, 0], [0, 0, 0])
    loop.set_setpoint([0, 0, 2.0], [0, 0, 0], [0, 0, 0], [0, 0, 0], 14.7)
    loop.start()
    time.sleep(0.3)
    cmd = loop.get_command()
    stats = loop.get_stats()
    loop.stop()
    assert cmd is not None and cmd["thrust"] == pytest.approx(14.7 + 4.0, rel=0.1)
    assert stats["iteration_count"] > 20


def test_factory_prefers_native():
    loop = create_control_loop(400.0)
    if native_available():
        assert isinstance(loop, RealTimeControlLoop)
    else:
        assert isinstance(loop, PythonControlLoop)
