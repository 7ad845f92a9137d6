"""Intermediate: cooperative real-time scheduler with jitter stats.

Mirrors the reference examples/intermediate/quartic_scheduler_demo.py:
control/planning/safety tasks at 200/25/50 Hz for two seconds, then a
per-task timing report (executions, deadline misses, jitter RMS).

    python examples/intermediate/scheduler_demo.py
"""

import asyncio

from dart_planner_tpu.runtime.scheduler import (
    QuarticScheduler,
    create_control_task,
    create_planning_task,
    create_safety_task,
)

counters = {"control": 0, "planning": 0, "safety": 0}


async def demo() -> None:
    sched = QuarticScheduler()
    sched.add_task(
        create_control_task(lambda: counters.__setitem__(
            "control", counters["control"] + 1), frequency_hz=200.0)
    )
    sched.add_task(
        create_planning_task(lambda: counters.__setitem__(
            "planning", counters["planning"] + 1), frequency_hz=25.0)
    )
    sched.add_task(
        create_safety_task(lambda: counters.__setitem__(
            "safety", counters["safety"] + 1), frequency_hz=50.0)
    )

    run = asyncio.ensure_future(sched.start())
    await asyncio.sleep(2.0)
    await sched.stop()
    run.cancel()

    print(f"tick counts over 2 s: {counters}")
    for name, stats in sched.get_all_stats().items():
        print(
            f"  {name:>9}: {stats['execution_count']} runs, "
            f"{stats['missed_deadlines']} misses, "
            f"jitter RMS {stats.get('jitter_rms_ms', 0.0):.3f} ms"
        )


if __name__ == "__main__":
    asyncio.run(demo())
