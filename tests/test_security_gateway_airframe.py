"""Key derivation/manager, credential store, gateway ASGI middleware,
and airframe config (reference security/key_*.py, credential_manager.py,
gateway/middleware.py, config/airframe_config.py)."""

import asyncio
import json
import time

import pytest

from dart_planner_tpu.common.errors import ConfigurationError, SecurityError
from dart_planner_tpu.config.airframe import (
    AirframeConfig,
    AirframeConfigManager,
    get_airframe_config,
)
from dart_planner_tpu.gateway import (
    CSRFMiddleware,
    SecureMiddleware,
    SecurityHeadersMiddleware,
)
from dart_planner_tpu.security.credentials import SecureCredentialManager
from dart_planner_tpu.security.key_derivation import (
    KeyDerivationError,
    OSKeyStoreError,
    derive_key_from_passphrase,
    derive_key_from_scrypt,
    derive_key_from_os_keystore,
    generate_secure_key,
    validate_key_strength,
)
from dart_planner_tpu.security.key_manager import SecureKeyManager


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


# -- key derivation ---------------------------------------------------

def test_derivation_deterministic_per_salt():
    k1, salt = derive_key_from_passphrase("hunter2-but-long")
    k2, _ = derive_key_from_passphrase("hunter2-but-long", salt)
    k3, _ = derive_key_from_passphrase("different", salt)
    assert k1 == k2 and k1 != k3 and len(k1) == 32
    s1, salt_s = derive_key_from_scrypt("hunter2-but-long")
    s2, _ = derive_key_from_scrypt("hunter2-but-long", salt_s)
    assert s1 == s2 and s1 != k1
    with pytest.raises(KeyDerivationError):
        derive_key_from_passphrase("")
    with pytest.raises(OSKeyStoreError):
        derive_key_from_os_keystore("main")


def test_key_strength():
    assert validate_key_strength(generate_secure_key())
    assert not validate_key_strength(b"short")
    assert not validate_key_strength(b"\x00" * 32)
    assert not validate_key_strength(b"abcd" * 8)  # repetitive


# -- key manager ------------------------------------------------------

@pytest.fixture
def km(tmp_path):
    return SecureKeyManager(str(tmp_path / "keys.json"))


def test_key_manager_token_roundtrip(km):
    tok = km.create_hmac_token({"sub": "alice"}, ttl_s=60)
    body = km.verify_hmac_token(tok)
    assert body["sub"] == "alice"
    with pytest.raises(SecurityError):
        km.verify_hmac_token(tok[:-2] + "ff")  # tampered signature
    with pytest.raises(SecurityError):
        km.verify_hmac_token("garbage")


def test_key_manager_rotation_grace(km):
    tok = km.create_hmac_token({"sub": "a"}, ttl_s=60)
    old_kid = km.verify_hmac_token(tok)["kid"]
    km.rotate_keys()
    # old token still verifies inside the grace window
    assert km.verify_hmac_token(tok)["kid"] == old_kid
    new_tok = km.create_hmac_token({"sub": "b"}, ttl_s=60)
    assert km.verify_hmac_token(new_tok)["kid"] != old_kid
    stats = km.get_key_stats()
    assert stats["active_keys"] == 1 and stats["retired_keys"] == 1
    # expire the grace window -> old key cleaned up, token rejected
    km._keys[old_kid].retired_at = time.time() - km.grace_period_s - 1
    assert km.cleanup_expired_keys() == 1
    with pytest.raises(SecurityError):
        km.verify_hmac_token(tok)


def test_key_manager_revocation_and_persistence(km, tmp_path):
    tok = km.create_hmac_token({"sub": "a"}, ttl_s=60)
    jti = km.verify_hmac_token(tok)["jti"]
    km.revoke_token(jti)
    with pytest.raises(SecurityError):
        km.verify_hmac_token(tok)
    # a second manager over the same file sees keys + revocations
    km2 = SecureKeyManager(str(tmp_path / "keys.json"))
    with pytest.raises(SecurityError):
        km2.verify_hmac_token(tok)
    ok = km2.check_security()
    assert ok["ok"], ok["issues"]


def test_key_manager_expired_token(km):
    tok = km.create_hmac_token({"sub": "a"}, ttl_s=-1)
    with pytest.raises(SecurityError):
        km.verify_hmac_token(tok)


# -- credential manager ----------------------------------------------

def test_credentials_roundtrip(tmp_path):
    path = str(tmp_path / "creds.enc")
    cm = SecureCredentialManager(path, passphrase="pass-phrase-1")
    cm.store_credential("api", "s3cr3t", "api_key")
    cm.store_credential("stale", "x", expires_in_days=-1.0)
    assert cm.get_credential("api") == "s3cr3t"
    assert cm.get_credential("stale") is None  # expired
    assert cm.get_credential_info("api")["credential_type"] == "api_key"
    # reload with the right passphrase
    cm2 = SecureCredentialManager(path, passphrase="pass-phrase-1")
    assert cm2.get_credential("api") == "s3cr3t"
    assert cm2.cleanup_expired() == 1
    # wrong passphrase fails closed
    with pytest.raises(SecurityError):
        SecureCredentialManager(path, passphrase="wrong")
    assert cm2.remove_credential("api")
    assert cm2.list_credentials() == []


def test_credentials_require_passphrase(tmp_path, monkeypatch):
    monkeypatch.delenv("DART_CREDENTIALS_KEY", raising=False)
    with pytest.raises(SecurityError):
        SecureCredentialManager(str(tmp_path / "c.enc"))


# -- ASGI middleware --------------------------------------------------

async def _echo_app(scope, receive, send):
    body = b""
    while True:
        msg = await receive()
        body += msg.get("body", b"")
        if not msg.get("more_body", False):
            break
    await send(
        {"type": "http.response.start", "status": 200, "headers": []}
    )
    await send({"type": "http.response.body", "body": body})


def _call(app, method="GET", path="/", headers=(), body=b""):
    scope = {
        "type": "http",
        "method": method,
        "path": path,
        "headers": [(k.lower().encode(), v.encode()) for k, v in headers],
    }
    sent = []
    done = False

    async def receive():
        nonlocal done
        if done:
            return {"type": "http.disconnect"}
        done = True
        return {"type": "http.request", "body": body, "more_body": False}

    async def send(message):
        sent.append(message)

    run(app(scope, receive, send))
    status = next(m["status"] for m in sent if m["type"] == "http.response.start")
    hdrs = dict(
        next(m for m in sent if m["type"] == "http.response.start")["headers"]
    )
    payload = b"".join(
        m.get("body", b"") for m in sent if m["type"] == "http.response.body"
    )
    return status, hdrs, payload


def test_csrf_sets_cookie_on_safe_and_blocks_unsafe():
    app = CSRFMiddleware(_echo_app)
    status, hdrs, _ = _call(app, "GET")
    assert status == 200 and b"csrftoken=" in hdrs.get(b"set-cookie", b"")
    # POST without token -> 403
    status, _, payload = _call(app, "POST", body=b"{}")
    assert status == 403 and b"CSRF" in payload
    # POST with matching cookie + header -> allowed
    status, _, _ = _call(
        app,
        "POST",
        headers=[("cookie", "csrftoken=tok123"), ("x-csrf-token", "tok123")],
        body=b"{}",
    )
    assert status == 200
    # mismatched token -> 403
    status, _, _ = _call(
        app,
        "POST",
        headers=[("cookie", "csrftoken=tok123"), ("x-csrf-token", "nope")],
    )
    assert status == 403


def test_secure_middleware_validates_json():
    app = SecureMiddleware(_echo_app)
    status, _, payload = _call(
        app, "POST", body=json.dumps({"pos": [1, 2, 3]}).encode()
    )
    assert status == 200 and b"pos" in payload  # body replayed downstream
    status, _, _ = _call(app, "POST", body=b"{not json")
    assert status == 400
    status, _, _ = _call(app, "POST", body=json.dumps({"s": "\x00"}).encode())
    assert status == 422
    # exempt path bypasses validation
    status, _, _ = _call(app, "POST", path="/docs", body=b"{not json")
    assert status == 200


def test_security_headers_attached():
    app = SecurityHeadersMiddleware(_echo_app)
    _, hdrs, _ = _call(app, "GET")
    assert hdrs[b"x-content-type-options"] == b"nosniff"
    assert hdrs[b"x-frame-options"] == b"DENY"


# -- airframe config --------------------------------------------------

def test_airframe_presets_load_and_validate():
    mgr = AirframeConfigManager()
    names = mgr.list_airframes()
    assert {"sitl_quad", "dji_f450", "racing_250", "heavy_hex"} <= set(names)
    for name in names:
        cfg = mgr.get(name)
        assert cfg.validate_config() == [], (name, cfg.validate_config())
    assert mgr.get().name == "sitl_quad"  # default
    assert get_airframe_config("racing_250").max_velocity == 30.0


def test_airframe_helpers_and_custom():
    mgr = AirframeConfigManager()
    quad = mgr.get("sitl_quad")
    assert quad.get_total_thrust() == pytest.approx(4 * 7.5)
    assert quad.get_thrust_to_weight_ratio() == pytest.approx(
        30.0 / 9.81, rel=1e-6
    )
    hexa = mgr.get("heavy_hex")
    assert hexa.motor_count == 6
    custom = mgr.add_custom("sitl_quad", "brick", mass=10.0)
    assert any("thrust-to-weight too low" in i for i in custom.validate_config())
    with pytest.raises(ConfigurationError):
        mgr.get("does_not_exist")


def test_csrf_cookie_is_not_httponly():
    """RFC 6265: the HttpOnly attribute's mere presence enables it; the
    double-submit cookie must be JS-readable."""
    app = CSRFMiddleware(_echo_app)
    _, hdrs, _ = _call(app, "GET")
    assert b"httponly" not in hdrs[b"set-cookie"].lower()


def test_secure_middleware_exemption_is_prefix_only():
    """Routes merely containing an exempt segment must still be validated."""
    app = SecureMiddleware(_echo_app)
    status, _, _ = _call(
        app, "POST", path="/api/static-waypoints", body=b"{not json"
    )
    assert status == 400  # not exempted


def test_keystore_tmp_never_world_readable(tmp_path, monkeypatch):
    """Secrets must be 0600 from the first byte, including the temp file."""
    import os as _os

    seen_modes = []
    real_open = _os.open

    def spy_open(path, flags, mode=0o777):
        if str(path).endswith(".tmp"):
            seen_modes.append(mode)
        return real_open(path, flags, mode)

    monkeypatch.setattr(_os, "open", spy_open)
    km = SecureKeyManager(str(tmp_path / "keys.json"))
    km.rotate_keys()
    assert seen_modes and all(m == 0o600 for m in seen_modes)
