"""Beginner: heartbeat monitoring and loss-triggered emergency.

Mirrors the reference examples/beginner/heartbeat_demo.py: a monitor
receives heartbeats for a while, then the link "fails" and the emergency
callback fires after the configured timeout.

    python examples/beginner/heartbeat_demo.py
"""

import asyncio

from dart_planner_tpu.comms.heartbeat import HeartbeatConfig, HeartbeatMonitor


async def demo() -> None:
    fired = asyncio.Event()

    monitor = HeartbeatMonitor(
        HeartbeatConfig(interval_ms=100, timeout_ms=300),
        emergency_callback=fired.set,
    )
    monitor.start_monitoring()

    print("link healthy: sending heartbeats for 1 s ...")
    for _ in range(10):
        monitor.heartbeat_received_sync()
        await asyncio.sleep(0.1)
    assert not monitor.emergency_triggered

    print("link failed: heartbeats stop ...")
    await asyncio.wait_for(fired.wait(), timeout=2.0)
    print("emergency callback fired (timeout exceeded) — failsafe engaged")
    monitor.stop_monitoring()


if __name__ == "__main__":
    asyncio.run(demo())
