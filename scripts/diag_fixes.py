"""A/B the candidate tail-convergence fixes on the bench batch (XLA path).

Each variant: convergence fraction by the ftol criterion, p95/max cost
excess vs the 60-iteration ground truth, at equal or near-equal budget.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402

from dart_planner_tpu.planning import se3_mpc  # noqa: E402
from diag_convergence import make_batch  # noqa: E402


def main():
    config, prob = make_batch(4096)
    u0 = se3_mpc.initialize_thrusts(config, prob)
    print(f"platform={jax.devices()[0].platform}", flush=True)

    gt = se3_mpc.solve(
        config._replace(max_iterations=60, cg_iterations=25), prob, u0,
        method="xla",
    )
    gt_cost = np.asarray(gt.cost, np.float64)
    print("gt done", flush=True)

    wide = (1.5, 1.0, 0.7, 0.5, 0.35, 0.25, 0.15, 0.1, 0.06, 0.03, 0.015,
            0.007)
    variants = {
        "base-12": {},
        "base-16": {"max_iterations": 16},
        "fullH-12": {"newton_full_curvature": True},
        "fullH-16": {"newton_full_curvature": True, "max_iterations": 16},
        "wideLS-12": {"line_search_alphas": wide},
        "fullH+wideLS-12": {
            "newton_full_curvature": True, "line_search_alphas": wide,
        },
        "fullH+wideLS-16": {
            "newton_full_curvature": True, "line_search_alphas": wide,
            "max_iterations": 16,
        },
    }
    for name, over in variants.items():
        cfg = config._replace(**over)
        t0 = time.perf_counter()
        res = se3_mpc.solve(cfg, prob, u0, method="xla")
        jax.block_until_ready(res.cost)
        compile_s = time.perf_counter() - t0
        cost = np.asarray(res.cost, np.float64)
        excess = (cost - gt_cost) / np.maximum(np.abs(gt_cost), 1e-9)
        conv = float(np.asarray(res.converged).mean())
        print(
            f"{name:18s} conv={conv:.4f} p95ex={np.percentile(excess,95):.2e}"
            f" maxex={excess.max():.2e} (compile+run {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
