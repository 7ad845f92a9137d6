"""Loud staleness check for the repo-shipped compile-cache seed.

``tools/jax_cache_seed`` holds compiled TPU executables captured by
``scripts/make_cache_seed.py``. Entries are keyed by compiled-program
fingerprint, so when a kernel-determining source changes the old
entries don't break anything — they just silently stop matching, and
the smoke gate / driver bench quietly fall back to multi-minute cold
compiles (which is how round 4 lost its benchmark to a timeout).

This check makes that drift LOUD: ``make_cache_seed.py`` writes a
``MANIFEST.json`` of {source path: sha256} over every file whose content
feeds the compiled kernels (ops/, solver, sim step, bench shapes) plus
the jax version; this script (and ``tests/test_cache_seed.py``)
recompares them. A mismatch means: run ``python scripts/make_cache_seed.py``
on the real chip before shipping.

Usage: python scripts/check_cache_seed.py   (exit 0 fresh, 1 stale/missing)
"""

import hashlib
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEED = os.path.join(ROOT, "tools", "jax_cache_seed")
MANIFEST = os.path.join(SEED, "MANIFEST.json")

# Every source whose content can change a compiled kernel executable or
# the shapes the smoke gate / bench compile for. Comment-only edits do
# trip this — by design: the repo rule is "smoke-gate every ops/ change
# on the real chip" (CLAUDE.md), and regenerating the seed is part of
# that pass.
KERNEL_SOURCES = [
    "dart_planner_tpu/ops/pallas_mpc.py",
    "dart_planner_tpu/ops/pallas_rollout.py",
    "dart_planner_tpu/ops/costs.py",
    "dart_planner_tpu/ops/dynamics.py",
    "dart_planner_tpu/ops/so3.py",
    "dart_planner_tpu/planning/se3_mpc.py",
    "dart_planner_tpu/sim/closed_loop.py",
    "dart_planner_tpu/sim/physics.py",
    "dart_planner_tpu/sim/worlds.py",
    "dart_planner_tpu/control/geometric.py",
    "bench.py",
    "scripts/tpu_smoke.py",
]


def current_manifest() -> dict:
    entries = {}
    for rel in KERNEL_SOURCES:
        path = os.path.join(ROOT, rel)
        h = hashlib.sha256()
        with open(path, "rb") as f:
            h.update(f.read())
        entries[rel] = h.hexdigest()
    try:
        import jax

        jax_version = jax.__version__
    except Exception:
        jax_version = "unknown"
    return {"jax": jax_version, "sources": entries}


def write_manifest() -> None:
    with open(MANIFEST, "w") as f:
        json.dump(current_manifest(), f, indent=1, sort_keys=True)
        f.write("\n")


def check() -> list:
    """Return a list of human-readable staleness findings (empty = fresh)."""
    if not os.path.isdir(SEED):
        return ["tools/jax_cache_seed is missing entirely"]
    if not os.path.isfile(MANIFEST):
        return ["tools/jax_cache_seed/MANIFEST.json is missing "
                "(seed predates the staleness check)"]
    with open(MANIFEST) as f:
        recorded = json.load(f)
    now = current_manifest()
    findings = []
    if recorded.get("jax") != now["jax"]:
        findings.append(
            f"jax version changed: seed built on {recorded.get('jax')}, "
            f"now {now['jax']}"
        )
    rec_src = recorded.get("sources", {})
    for rel, digest in now["sources"].items():
        if rel not in rec_src:
            findings.append(f"{rel}: not covered by the seed manifest")
        elif rec_src[rel] != digest:
            findings.append(f"{rel}: changed since the seed was built")
    return findings


def main() -> int:
    findings = check()
    if findings:
        print("STALE compile-cache seed — its entries will silently miss "
              "and the smoke gate/bench will compile cold:")
        for f in findings:
            print(f"  - {f}")
        print("fix: python scripts/make_cache_seed.py  (on the real TPU)")
        return 1
    print(f"compile-cache seed is fresh ({len(os.listdir(SEED)) - 1} "
          "entries + manifest)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
