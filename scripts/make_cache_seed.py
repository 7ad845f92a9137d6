"""Regenerate the repo-shipped compile-cache seed (tools/jax_cache_seed).

The smoke gate's cold cost is dominated by Mosaic compiles of the fused
kernels (~minutes through the dev tunnel). This script runs
``scripts/tpu_smoke.py`` against an EMPTY temporary cache so exactly the
gate's own executables are captured, then copies them into
``tools/jax_cache_seed/`` — which ``tpu_smoke.py``/``bench.py`` copy
into the persistent cache on startup, so a fresh container's first gate
run is seconds, not minutes.

Re-run after any change that alters compiled kernels (ops/, solver
semantics, jax/libtpu upgrades — stale entries are harmless, they just
miss, but they waste repo space). Requires the real TPU.

Usage: python scripts/make_cache_seed.py
"""

import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEED = os.path.join(ROOT, "tools", "jax_cache_seed")


def main() -> int:
    # the seed must not seed itself: build into a temp dir with the
    # shipped seed hidden from the smoke run
    with tempfile.TemporaryDirectory(prefix="jax_seed_") as tmp:
        env = dict(os.environ)
        env["DART_JAX_CACHE_DIR"] = tmp
        env.setdefault("PYTHONPATH", "")
        env["PYTHONPATH"] = ROOT + (
            ":" + env["PYTHONPATH"] if env["PYTHONPATH"] else ""
        )
        hidden = None
        if os.path.isdir(SEED):
            hidden = SEED + ".building"
            os.rename(SEED, hidden)
        try:
            rc = subprocess.call(
                [sys.executable, os.path.join(ROOT, "scripts", "tpu_smoke.py")],
                env=env, cwd=ROOT,
            )
            if rc != 0:
                print(f"tpu_smoke failed (rc={rc}); seed NOT updated")
                return rc
            os.makedirs(SEED, exist_ok=True)
            total = 0
            for name in os.listdir(tmp):
                shutil.copy2(os.path.join(tmp, name), os.path.join(SEED, name))
                total += os.path.getsize(os.path.join(tmp, name))
            print(
                f"seed updated: {len(os.listdir(tmp))} entries, "
                f"{total / 1e6:.1f} MB -> {SEED}"
            )
        finally:
            if hidden and not os.path.isdir(SEED):
                os.rename(hidden, SEED)
            elif hidden:
                shutil.rmtree(hidden)
    return 0


if __name__ == "__main__":
    sys.exit(main())
