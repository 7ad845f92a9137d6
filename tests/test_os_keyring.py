"""OS-keyring adapter (security/os_keyring.py) on the file fallback.

The ``keyring`` package is absent from this image, so these tests
exercise the owner-only file backend — the same code path an air-gapped
deployment uses. Reference analog:
/root/reference/src/dart_planner/security/os_keyring.py:62-287.
"""

import os
import stat

import pytest

from dart_planner_tpu.common.errors import SecurityError
from dart_planner_tpu.security import os_keyring


@pytest.fixture
def mgr(tmp_path):
    return os_keyring.OSKeyringManager(
        fallback_path=str(tmp_path / "ring.json"), prefer_os_keyring=False
    )


def test_store_retrieve_roundtrip(mgr):
    kid = mgr.store_key(b"\x00\x01secret", os_keyring.KeyType.HMAC)
    assert mgr.retrieve_key(kid, os_keyring.KeyType.HMAC) == b"\x00\x01secret"
    # wrong type namespace -> miss
    assert mgr.retrieve_key(kid, os_keyring.KeyType.JWT) is None


def test_empty_key_rejected(mgr):
    with pytest.raises(SecurityError):
        mgr.store_key(b"", os_keyring.KeyType.KEK)


def test_usage_count_and_metadata(mgr):
    kid = mgr.store_key(b"k", os_keyring.KeyType.API, rotation_policy="30d")
    mgr.retrieve_key(kid, os_keyring.KeyType.API)
    mgr.retrieve_key(kid, os_keyring.KeyType.API)
    meta = mgr.list_keys(os_keyring.KeyType.API)[kid]
    assert meta.usage_count == 2
    assert meta.rotation_policy == "30d"
    assert meta.key_type == os_keyring.KeyType.API


def test_expiry(mgr):
    import time

    kid = mgr.store_key(
        b"short-lived", os_keyring.KeyType.DEK, expires_at=time.time() - 1
    )
    assert mgr.retrieve_key(kid, os_keyring.KeyType.DEK) is None


def test_delete_and_list(mgr):
    k1 = mgr.store_key(b"a", os_keyring.KeyType.JWT)
    k2 = mgr.store_key(b"b", os_keyring.KeyType.JWT)
    assert set(mgr.list_keys(os_keyring.KeyType.JWT)) == {k1, k2}
    assert mgr.delete_key(k1, os_keyring.KeyType.JWT)
    assert not mgr.delete_key(k1, os_keyring.KeyType.JWT)  # already gone
    assert set(mgr.list_keys(os_keyring.KeyType.JWT)) == {k2}


def test_rotate_key(mgr):
    kid = mgr.store_key(b"old", os_keyring.KeyType.KEK)
    new_id = mgr.rotate_key(kid, os_keyring.KeyType.KEK, b"new")
    assert new_id != kid
    assert mgr.retrieve_key(kid, os_keyring.KeyType.KEK) is None
    assert mgr.retrieve_key(new_id, os_keyring.KeyType.KEK) == b"new"
    with pytest.raises(SecurityError):
        mgr.rotate_key("nope", os_keyring.KeyType.KEK, b"x")


def test_validate_key_access(mgr):
    assert mgr.validate_key_access()
    assert mgr.list_keys("probe") == {}  # probe cleaned up


def test_fallback_file_is_owner_only(mgr, tmp_path):
    mgr.store_key(b"k", os_keyring.KeyType.HMAC)
    mode = stat.S_IMODE(os.stat(tmp_path / "ring.json").st_mode)
    assert mode == 0o600


def test_backend_reports_file_when_keyring_absent(mgr):
    assert mgr.backend_name == "file"


def test_require_os_keyring_raises_when_unavailable(tmp_path):
    # keyring absent from this image -> strict mode must fail closed
    # (reference raises ConfigurationError at construction, OK:74-76)
    with pytest.raises(SecurityError):
        os_keyring.OSKeyringManager(
            fallback_path=str(tmp_path / "ring.json"),
            require_os_keyring=True,
        )


@pytest.fixture
def keyring_caplog(caplog):
    """caplog wired directly to the module logger: the package logging
    config sets propagate=False on the root package logger
    (common/logging_config.py), so caplog's root-logger handler misses
    records once any earlier test configures logging."""
    import logging

    logger = logging.getLogger(os_keyring.__name__)
    logger.addHandler(caplog.handler)
    try:
        with caplog.at_level(logging.WARNING, logger=os_keyring.__name__):
            yield caplog
    finally:
        logger.removeHandler(caplog.handler)


def test_fallback_emits_warning(tmp_path, keyring_caplog):
    os_keyring.OSKeyringManager(
        fallback_path=str(tmp_path / "ring.json"),
    )
    assert any(
        "falling back" in r.message for r in keyring_caplog.records
    )


def test_explicit_file_backend_is_silent(tmp_path, keyring_caplog):
    os_keyring.OSKeyringManager(
        fallback_path=str(tmp_path / "ring.json"),
        prefer_os_keyring=False,
    )
    assert not keyring_caplog.records


def test_file_store_concurrent_writers_lose_nothing(tmp_path):
    """Two processes hammering the same store: flock serializes the
    read-modify-write cycles, so every stored key must survive."""
    import multiprocessing as mp

    path = str(tmp_path / "ring.json")

    def worker(tag, n):
        m = os_keyring.OSKeyringManager(
            fallback_path=path, prefer_os_keyring=False
        )
        for i in range(n):
            m.store_key(
                f"{tag}-{i}".encode(), os_keyring.KeyType.API,
                key_id=f"{tag}-{i}",
            )

    procs = [
        mp.Process(target=worker, args=(t, 20)) for t in ("a", "b")
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
        assert p.exitcode == 0
    m = os_keyring.OSKeyringManager(
        fallback_path=path, prefer_os_keyring=False
    )
    keys = m.list_keys(os_keyring.KeyType.API)
    assert len(keys) == 40
