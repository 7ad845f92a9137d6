"""Import-layering contract enforcement.

The reference enforces its architecture with import-linter contracts
(/root/reference/importlinter.ini:4-18: control/planning/common must not
import hardware). This repo's CLAUDE.md states the analogous contract —
``common``/``ops`` at the bottom; ``planning``/``control``/``sim`` above;
``hardware``/``comms``/``apps`` on top; ``security``/``gateway`` optional
— and this test makes it executable by AST-scanning every module.

Two rules, checked statically (no imports executed):

1. *Module-level* imports must respect the layer ranks below: a package
   may only import packages of strictly lower rank (same-package imports
   are free). Function-local imports are exempt — the DI container
   (common/di.py) wires concrete components lazily, exactly like the
   reference's di_container_v2.
2. The reference's hard contract holds for imports ANYWHERE, even lazy:
   ``common``/``ops``/``planning``/``control`` never import
   ``hardware``/``comms``/``apps``.
"""

import ast
from pathlib import Path

import dart_planner_tpu

PKG_DIR = Path(dart_planner_tpu.__file__).parent
PKG = "dart_planner_tpu"

# module-level layer ranks; a package may import strictly-lower ranks
RANK = {
    "common": 0,
    "ops": 0,
    "config": 1,
    "estimation": 1,
    "neural_scene": 1,
    "security": 1,
    "gateway": 1,
    "planning": 2,
    "control": 2,
    "perception": 2,
    "sim": 3,
    "runtime": 3,
    "parallel": 3,
    "comms": 3,
    "hardware": 4,
    "apps": 5,
}

# the reference's hard rule, applied to lazy imports too
CORE = {"common", "ops", "planning", "control"}
FORBIDDEN_FOR_CORE = {"hardware", "comms", "apps"}


def _imports(path: Path):
    """Yield (target_subpackage, is_module_level, lineno) for intra-repo
    imports in one file."""
    tree = ast.parse(path.read_text())

    def walk(node, toplevel):
        for child in ast.iter_child_nodes(node):
            mods = []
            if isinstance(child, ast.Import):
                mods = [a.name for a in child.names]
            elif isinstance(child, ast.ImportFrom) and child.module:
                mods = [child.module]
            for m in mods:
                if m == PKG or m.startswith(PKG + "."):
                    parts = m.split(".")
                    if len(parts) > 1:
                        yield parts[1], toplevel, child.lineno
            if isinstance(
                child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                yield from walk(child, False)
            else:
                yield from walk(child, toplevel)

    yield from walk(tree, True)


def _scan():
    for f in sorted(PKG_DIR.rglob("*.py")):
        rel = f.relative_to(PKG_DIR)
        sub = rel.parts[0]
        if sub.endswith(".py"):
            sub = "__root__"
        for target, toplevel, lineno in _imports(f):
            if target != sub:
                yield sub, target, toplevel, f"{PKG}/{rel}:{lineno}"


def test_module_level_layering():
    violations = [
        f"{where}: {sub} (rank {RANK.get(sub)}) imports {target} "
        f"(rank {RANK.get(target)}) at module level"
        for sub, target, toplevel, where in _scan()
        if toplevel
        and sub != "__root__"  # the package __init__ may re-export anything
        and RANK.get(target, 99) >= RANK.get(sub, -1)
    ]
    assert not violations, "\n".join(violations)


def test_core_never_touches_hardware_even_lazily():
    violations = [
        f"{where}: {sub} imports {target}"
        for sub, target, toplevel, where in _scan()
        if sub in CORE and target in FORBIDDEN_FOR_CORE
    ]
    assert not violations, "\n".join(violations)


def test_every_subpackage_has_a_rank():
    subs = {
        p.name
        for p in PKG_DIR.iterdir()
        if p.is_dir() and (p / "__init__.py").exists()
    }
    unranked = subs - set(RANK)
    assert not unranked, f"add new subpackages to RANK: {sorted(unranked)}"
