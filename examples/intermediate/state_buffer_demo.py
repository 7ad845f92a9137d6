"""Intermediate: thread-safe state buffer between producer and consumer.

Mirrors the reference examples/intermediate/state_buffer_demo.py: an
estimator thread publishes states at 200 Hz while the main thread reads
latest/at-time snapshots and statistics.

    python examples/intermediate/state_buffer_demo.py
"""

import threading
import time

import numpy as np

from dart_planner_tpu.common.state_buffer import ThreadSafeStateBuffer
from dart_planner_tpu.common.types import DroneState


def main() -> None:
    buf = ThreadSafeStateBuffer(buffer_size=32)
    stop = threading.Event()

    def estimator() -> None:
        t = 0.0
        while not stop.is_set():
            state = DroneState.create(
                timestamp=t, position=(0.0, 0.0, 2.0 + 0.1 * np.sin(t))
            )
            buf.update_state(state, timestamp=t)
            t += 0.005
            time.sleep(0.005)

    # warm the first DroneState construction (jax array creation) on the
    # main thread so the estimator loop runs at a steady 200 Hz
    DroneState.create(timestamp=0.0, position=(0.0, 0.0, 2.0))
    thread = threading.Thread(target=estimator, daemon=True)
    thread.start()
    deadline = time.time() + 5.0
    while buf.get_latest_state() is None and time.time() < deadline:
        time.sleep(0.05)
    time.sleep(0.5)

    snap = buf.get_latest_state()
    print(f"latest: version={snap.version} t={float(snap.timestamp):.3f}")
    past = buf.get_state_at_time(float(snap.timestamp) - 0.05)
    print(f"50 ms ago: t={float(past.timestamp):.3f}")
    print("stats:", buf.get_statistics())

    stop.set()
    thread.join(timeout=1.0)


if __name__ == "__main__":
    main()
