"""Host-runtime tests: state buffer, timing manager, quartic scheduler
(reference test_state_buffer.py / test_timing_alignment.py /
test_quartic_scheduler.py scope)."""

import asyncio
import threading
import time

import numpy as np
import pytest

from dart_planner_tpu.common.state_buffer import (
    DroneStateBuffer,
    StateManager,
    ThreadSafeStateBuffer,
)
from dart_planner_tpu.common.timing import (
    TimingConfig,
    TimingManager,
    high_res_sleep,
)
from dart_planner_tpu.common.types import DroneState
from dart_planner_tpu.runtime.scheduler import (
    QuarticScheduler,
    create_control_task,
    create_safety_task,
    quartic_scheduler_context,
)


# ---- state buffer ----
def test_buffer_versioning_and_latest():
    buf = ThreadSafeStateBuffer(buffer_size=4, state_type=dict)
    assert buf.get_latest_state() is None
    for i in range(10):
        v = buf.update_state({"i": i}, timestamp=float(i))
        assert v == i + 1
    snap = buf.get_latest_state()
    assert snap.state["i"] == 9
    assert snap.version == 10


def test_buffer_at_time_query():
    buf = ThreadSafeStateBuffer(buffer_size=8, state_type=dict)
    for i in range(8):
        buf.update_state({"i": i}, timestamp=float(i))
    snap = buf.get_state_at_time(5.04, tolerance=0.1)
    assert snap is not None and snap.state["i"] == 5
    assert buf.get_state_at_time(100.0, tolerance=0.1) is None


def test_buffer_threaded_producers():
    buf = ThreadSafeStateBuffer(buffer_size=16, state_type=int)

    def produce(k):
        for i in range(100):
            buf.update_state(k * 1000 + i)

    threads = [threading.Thread(target=produce, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert buf.get_latest_state().version == 400
    assert buf.get_statistics()["updates"] == 400


def test_drone_state_buffer_and_manager():
    mgr = StateManager()
    buf = DroneStateBuffer()
    mgr.register_buffer("drone", buf)
    mgr.update_state("drone", DroneState.create(position=(1, 2, 3)))
    snap = mgr.get_latest_state("drone")
    np.testing.assert_allclose(np.asarray(snap.state.position), [1, 2, 3])
    assert "drone" in mgr.get_all_statistics()


# ---- timing manager ----
def test_planner_dt_coupled_to_control_frequency():
    tm = TimingManager(TimingConfig(control_frequency=200.0))
    assert tm.get_planner_dt() == pytest.approx(0.005)


def test_should_plan_throttling():
    tm = TimingManager(TimingConfig(min_planning_interval=0.1))
    assert tm.should_plan(1.0)
    assert not tm.should_plan(1.05)  # too soon
    assert tm.should_plan(1.2)
    tm.update_planning_timing(1.2, planning_duration=0.5)  # slow planner
    assert not tm.should_plan(2.0)  # throttled by latency
    assert tm.throttling_events == 1


def test_should_control_rate():
    tm = TimingManager(TimingConfig(control_frequency=100.0))
    assert tm.should_control(0.0) or tm.should_control(0.011)
    tm.last_control_time = 1.0
    assert not tm.should_control(1.005)
    assert tm.should_control(1.02)


def test_high_res_sleep_precision():
    t0 = time.perf_counter()
    high_res_sleep(0.01)
    elapsed = time.perf_counter() - t0
    assert 0.009 < elapsed < 0.05  # CI boxes are noisy; bound loosely


# ---- quartic scheduler ----
def test_scheduler_runs_tasks_at_rate():
    counts = {"control": 0, "safety": 0}

    async def main():
        async with quartic_scheduler_context() as sched:
            sched.add_task(
                create_control_task(
                    lambda: counts.__setitem__("control", counts["control"] + 1),
                    frequency_hz=200.0,
                )
            )
            sched.add_task(
                create_safety_task(
                    lambda: counts.__setitem__("safety", counts["safety"] + 1),
                    frequency_hz=50.0,
                )
            )
            await asyncio.sleep(0.5)
            stats = sched.get_task_stats("control")
            return stats

    stats = asyncio.run(main())
    # ~100 control ticks and ~25 safety ticks expected in 0.5 s; allow slack
    assert counts["control"] > 40, counts
    assert counts["safety"] > 10, counts
    assert stats["execution_count"] == counts["control"]
    assert "mean_execution_ms" in stats


def test_scheduler_auto_disables_overrunning_task():
    async def main():
        sched = QuarticScheduler(max_consecutive_overruns=3)

        def slow():
            time.sleep(0.02)  # 20 ms >> 5 ms period

        sched.add_task(create_control_task(slow, frequency_hz=200.0, name="slow"))
        loop = asyncio.create_task(sched.start())
        await asyncio.sleep(0.3)
        await sched.stop()
        loop.cancel()
        return sched

    sched = asyncio.run(main())
    assert not sched.tasks["slow"].enabled  # auto-disabled
    assert sched.total_overruns >= 3


def test_scheduler_priority_order():
    order = []

    async def main():
        sched = QuarticScheduler()
        sched.add_task(
            create_control_task(lambda: order.append("control"), 100.0)
        )
        sched.add_task(
            create_safety_task(lambda: order.append("safety"), 100.0)
        )
        loop = asyncio.create_task(sched.start())
        await asyncio.sleep(0.1)
        await sched.stop()
        loop.cancel()

    asyncio.run(main())
    # safety (CRITICAL) must run before control (HIGH) at equal readiness
    assert order[0] == "safety"


def test_prometheus_exposition_format():
    """Counters render as counter, summaries as gauge quantiles
    (reference ops stack: docker-compose.yml Prometheus scrape)."""
    from dart_planner_tpu.common.metrics import MetricsManager

    m = MetricsManager()
    m.increment("plans")
    m.increment("plans")
    for v in (1.0, 2.0, 3.0):
        m.record("plan latency ms", v)
    text = m.prometheus_exposition()
    assert "# TYPE dart_plans_total counter" in text
    assert "dart_plans_total 2" in text
    assert "# TYPE dart_plan_latency_ms gauge" in text
    assert 'dart_plan_latency_ms{quantile="50"} 2.0' in text
    assert "dart_plan_latency_ms_count 3" in text
    assert text.endswith("\n")
