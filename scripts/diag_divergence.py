"""Diagnose the TPU closed-loop success divergence (VERDICT item 1).

Round-1 measurements on identical Monte-Carlo configs (docs/kernel.md):
CPU scan 0.555 | TPU scan 0.154 | TPU fused tick kernel 0.602.

Hypotheses tested here, each as a separate MC run on the real chip:

H1 (precision): the scan tick path contains default-precision matmuls
    (physics.py:155 ``R @ exp_so3``, so3.exp_so3's ``W @ W``,
    so3.attitude_error's ``R_des^T @ R``) which run with bf16 inputs on
    TPU. 2,400 Rodrigues products per episode at ~0.4% relative error
    destroys the attitude loop. Test: re-run the scan path under
    ``jax.default_matmul_precision('highest')``.

H2 (euler roundtrip): the scan path converts R -> euler -> R every tick
    (closed_loop.py control_tick -> to_drone_state -> compute_control)
    while the fused kernel keeps R. Test: compare after H1 is fixed.

Usage: python scripts/diag_divergence.py [n_episodes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def run(method: str, n: int, precision: str | None, label: str):
    from dart_planner_tpu.sim import ClosedLoopConfig, monte_carlo

    cfg = ClosedLoopConfig()
    key = jax.random.PRNGKey(0)
    start = jnp.asarray([0.0, 0.0, 3.0])
    goal = jnp.asarray([6.0, 3.0, 4.0])

    def go():
        res = monte_carlo(cfg, key, n, start, goal, method=method)
        return (
            float(jnp.mean(res.success)),
            float(jnp.mean(res.crashed)),
            float(jnp.mean(res.final_distance)),
            float(jnp.mean(res.tracking_rmse)),
        )

    t0 = time.time()
    if precision:
        with jax.default_matmul_precision(precision):
            s, c, d, r = go()
    else:
        s, c, d, r = go()
    print(
        f"{label:42s} success={s:.3f} crash={c:.3f} "
        f"mean_final_dist={d:.2f} rmse={r:.3f}  ({time.time()-t0:.0f}s)",
        flush=True,
    )
    return s


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    print(f"backend={jax.default_backend()} n={n}", flush=True)
    run("xla", n, None, "scan ticks, default matmul precision")
    run("xla", n, "highest", "scan ticks, HIGHEST matmul precision")
    run("fused", n, None, "fused tick kernel")


if __name__ == "__main__":
    main()
