"""Fleet checkpoint / resume.

The reference has no ML-style checkpointing (SURVEY.md section 5.4 — its
persisted state is CSV logs and an in-memory warm start). Long-running
Monte-Carlo fleets here do need one: this module snapshots the batch RNG
key, scenario cursor, and accumulated episode statistics to disk and
restores them, so a 100k-scenario sweep survives preemption. Arrays are
stored as a single ``npz`` (host-side; device arrays are pulled once).
"""

from __future__ import annotations

import json
import pathlib
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class FleetCheckpoint:
    """Resumable sweep state."""

    rng_key: np.ndarray  # (2,) uint32 jax PRNG key
    scenario_cursor: int  # episodes completed so far
    total_scenarios: int
    successes: int = 0
    crashes: int = 0
    sum_final_distance: float = 0.0
    extras: Dict[str, Any] = field(default_factory=dict)

    @property
    def success_rate(self) -> float:
        return self.successes / max(self.scenario_cursor, 1)


def save_checkpoint(path: str | pathlib.Path, ckpt: FleetCheckpoint) -> None:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path,
        rng_key=np.asarray(ckpt.rng_key),
        scalars=np.asarray(
            [
                ckpt.scenario_cursor,
                ckpt.total_scenarios,
                ckpt.successes,
                ckpt.crashes,
            ],
            np.int64,
        ),
        sum_final_distance=np.asarray(ckpt.sum_final_distance),
        extras=np.frombuffer(json.dumps(ckpt.extras).encode(), np.uint8),
    )


def load_checkpoint(path: str | pathlib.Path) -> Optional[FleetCheckpoint]:
    path = pathlib.Path(path)
    if not path.exists():
        return None
    with np.load(path) as z:
        s = z["scalars"]
        return FleetCheckpoint(
            rng_key=z["rng_key"],
            scenario_cursor=int(s[0]),
            total_scenarios=int(s[1]),
            successes=int(s[2]),
            crashes=int(s[3]),
            sum_final_distance=float(z["sum_final_distance"]),
            extras=json.loads(z["extras"].tobytes().decode()),
        )


def run_sweep(
    config,
    total_scenarios: int,
    chunk: int,
    start_center,
    goal_center,
    checkpoint_path: str | pathlib.Path,
    seed: int = 0,
    max_chunks: Optional[int] = None,
    **mc_kwargs,
) -> FleetCheckpoint:
    """Resumable Monte-Carlo sweep: ``chunk`` episodes per step, checkpoint
    after each chunk. Re-invoking with the same path continues where the
    last run stopped.
    """
    from dart_planner_tpu.sim.closed_loop import monte_carlo

    ckpt = load_checkpoint(checkpoint_path)
    if ckpt is None or ckpt.total_scenarios != total_scenarios:
        ckpt = FleetCheckpoint(
            rng_key=np.asarray(jax.random.PRNGKey(seed)),
            scenario_cursor=0,
            total_scenarios=total_scenarios,
        )
    chunks_done = 0
    while ckpt.scenario_cursor < ckpt.total_scenarios:
        if max_chunks is not None and chunks_done >= max_chunks:
            break
        n = min(chunk, ckpt.total_scenarios - ckpt.scenario_cursor)
        key = jnp.asarray(ckpt.rng_key, jnp.uint32)
        key, sub = jax.random.split(key)
        res = monte_carlo(
            config,
            sub,
            num_episodes=n,
            start_center=jnp.asarray(start_center),
            goal_center=jnp.asarray(goal_center),
            **mc_kwargs,
        )
        ckpt.rng_key = np.asarray(key)
        ckpt.scenario_cursor += n
        ckpt.successes += int(np.asarray(res.success).sum())
        ckpt.crashes += int(np.asarray(res.crashed).sum())
        ckpt.sum_final_distance += float(np.asarray(res.final_distance).sum())
        save_checkpoint(checkpoint_path, ckpt)
        chunks_done += 1
    return ckpt
