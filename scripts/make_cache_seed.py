"""Regenerate the repo-shipped compile-cache seed (tools/jax_cache_seed).

The smoke gate's and the driver bench's cold cost is dominated by Mosaic
compiles of the fused kernels (~minutes each through the dev tunnel;
round 4's driver bench run was killed by an external timeout mid-compile
and recorded nothing). This script runs ``scripts/tpu_smoke.py`` AND
``bench.py --compile-only`` against an EMPTY temporary cache so exactly
the gate's and the bench's executables are captured, then atomically
swaps the result into ``tools/jax_cache_seed/`` — which
``tpu_smoke.py``/``bench.py`` copy into the persistent cache on startup,
so a fresh container's first run is minutes of measuring, not tens of
minutes of compiling.

Re-run after any change that alters compiled kernels (ops/, solver
semantics, bench shapes, jax/libtpu upgrades — stale entries are
harmless, they just miss, but they waste repo space; check freshness
with ``python scripts/check_cache_seed.py``). Requires the real TPU.

Usage: python scripts/make_cache_seed.py [--smoke-only]
"""

import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEED = os.path.join(ROOT, "tools", "jax_cache_seed")


def main() -> int:
    smoke_only = "--smoke-only" in sys.argv[1:]
    # the seed must not seed itself: capture into a temp cache dir with
    # the shipped seed hidden from the runs, and only swap the new seed
    # into place after every step succeeded (a partial failure must
    # leave the previous good seed untouched).
    with tempfile.TemporaryDirectory(prefix="jax_seed_") as tmp:
        cache = os.path.join(tmp, "cache")
        os.makedirs(cache)
        env = dict(os.environ)
        env["DART_JAX_CACHE_DIR"] = cache
        env["PYTHONPATH"] = ROOT + (
            ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
        )
        hidden = None
        if os.path.isdir(SEED):
            hidden = SEED + ".building"
            os.rename(SEED, hidden)
        swapped = False
        try:
            cmds = [[sys.executable,
                     os.path.join(ROOT, "scripts", "tpu_smoke.py")]]
            if not smoke_only:
                cmds.append([sys.executable, os.path.join(ROOT, "bench.py"),
                             "--compile-only"])
            for cmd in cmds:
                rc = subprocess.call(cmd, env=env, cwd=ROOT)
                if rc != 0:
                    print(f"{' '.join(cmd[1:])} failed (rc={rc}); "
                          "seed NOT updated")
                    return rc
            # stage the new seed next to SEED, then atomic-rename it in
            staging = SEED + ".staging"
            if os.path.isdir(staging):
                shutil.rmtree(staging)
            os.makedirs(os.path.dirname(SEED), exist_ok=True)
            shutil.copytree(cache, staging)
            os.rename(staging, SEED)
            swapped = True
            # record what the seed was built against so
            # scripts/check_cache_seed.py can flag drift loudly
            import check_cache_seed

            check_cache_seed.write_manifest()
            total = sum(
                os.path.getsize(os.path.join(SEED, n))
                for n in os.listdir(SEED)
            )
            print(
                f"seed updated: {len(os.listdir(SEED))} entries, "
                f"{total / 1e6:.1f} MB -> {SEED}"
            )
        finally:
            if hidden:
                if swapped:
                    shutil.rmtree(hidden)
                else:
                    # failure path: restore the previous good seed
                    if os.path.isdir(SEED):
                        shutil.rmtree(SEED)
                    os.rename(hidden, SEED)
    return 0


if __name__ == "__main__":
    sys.exit(main())
