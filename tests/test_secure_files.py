"""Secure file utilities (reference security/secure_file_utils.py parity:
/root/reference/src/dart_planner/security/secure_file_utils.py)."""

import json
import os
import stat

import pytest

from dart_planner_tpu.common.errors import SecurityError
from dart_planner_tpu.security import secure_files as sf


def test_secure_write_is_owner_only_and_atomic(tmp_path):
    p = tmp_path / "keys" / "store.json"
    sf.secure_write(p, "secret")
    assert p.read_text() == "secret"
    assert stat.S_IMODE(p.stat().st_mode) == 0o600
    assert not (tmp_path / "keys" / "store.json.tmp").exists()
    # overwrite keeps permissions and replaces content atomically
    sf.secure_write(p, b"v2")
    assert p.read_bytes() == b"v2"
    assert stat.S_IMODE(p.stat().st_mode) == 0o600


def test_symlink_destinations_refused(tmp_path):
    target = tmp_path / "elsewhere.txt"
    target.write_text("x")
    link = tmp_path / "link.txt"
    link.symlink_to(target)
    with pytest.raises(SecurityError):
        sf.secure_write(link, "hijack")
    with pytest.raises(SecurityError):
        sf.secure_read(link)
    # symlinked PARENT directory is refused too
    realdir = tmp_path / "real"
    realdir.mkdir()
    dirlink = tmp_path / "dlink"
    dirlink.symlink_to(realdir)
    with pytest.raises(SecurityError):
        sf.secure_write(dirlink / "f.txt", "hijack")


def test_secure_read_rejects_loose_permissions(tmp_path):
    p = tmp_path / "loose.txt"
    p.write_text("data")
    os.chmod(p, 0o644)
    with pytest.raises(SecurityError):
        sf.secure_read(p)
    assert sf.secure_read(p, require_owner_only=False) == "data"
    os.chmod(p, 0o600)
    assert sf.secure_read(p) == "data"


def test_json_roundtrip_and_directory(tmp_path):
    d = sf.create_secure_directory(tmp_path / "a" / "b")
    assert stat.S_IMODE(d.stat().st_mode) == 0o700
    assert stat.S_IMODE((tmp_path / "a").stat().st_mode) == 0o700
    p = d / "data.json"
    sf.secure_json_write(p, {"k": [1, 2]})
    assert sf.secure_json_read(p) == {"k": [1, 2]}


def test_check_file_security_report(tmp_path):
    p = tmp_path / "f.bin"
    sf.secure_write(p, b"\x00")
    rep = sf.check_file_security(p)
    assert rep["owner_only"] and rep["issues"] == []
    os.chmod(p, 0o666)
    rep = sf.check_file_security(p)
    assert not rep["owner_only"]
    assert any("group/other" in i for i in rep["issues"])
    rep = sf.check_file_security(tmp_path / "missing")
    assert "file does not exist" in rep["issues"]


def test_failed_write_leaves_no_droppings(tmp_path, monkeypatch):
    p = tmp_path / "f.txt"

    class Boom(str):
        def encode(self, *a, **k):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        sf.secure_write(p, Boom("x"))
    assert list(tmp_path.iterdir()) == []
