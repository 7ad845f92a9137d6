"""Typed credential helpers + motor-mixing schema (reference parity:
security/credential_helpers.py, hardware/motor_mixing_schema.py)."""

import pytest

from dart_planner_tpu.hardware.mixing_schema import (
    MotorMixingModel,
    validate_motor_mixing,
)
from dart_planner_tpu.security import credential_helpers as ch
from dart_planner_tpu.security.credentials import SecureCredentialManager


@pytest.fixture
def mgr(tmp_path):
    return SecureCredentialManager(
        credentials_file=str(tmp_path / "creds.enc"),
        passphrase="test-pass-12345",
    )


def test_mavlink_and_api_roundtrip(mgr):
    assert ch.get_mavlink_credentials(mgr) is None
    ch.store_mavlink_credentials(mgr, "gcs", "hunter2")
    assert ch.get_mavlink_credentials(mgr) == ("gcs", "hunter2")

    ch.store_api_credentials(mgr, "weather", "KEY", "SECRET")
    assert ch.get_api_credentials(mgr, "weather") == ("KEY", "SECRET")
    assert ch.get_api_credentials(mgr, "missing") is None
    assert ch.rotate_api_credentials(mgr, "weather", "KEY2")
    assert ch.get_api_credentials(mgr, "weather") == ("KEY2", None)
    assert not ch.rotate_api_credentials(mgr, "never-stored", "x")


def test_database_and_jwt_helpers(mgr):
    ch.store_database_credentials(mgr, "flightlog", "app", "pw",
                                  host="db.local", port=5433)
    assert ch.get_database_credentials(mgr, "flightlog") == (
        "app", "pw", "db.local", 5433
    )
    secret = ch.store_jwt_credentials(mgr)
    got = ch.get_jwt_credentials(mgr)
    assert got == (secret, "HS256") and len(secret) > 30


def test_mixing_schema_accepts_defaults_and_builds_config():
    cfg = validate_motor_mixing({})
    assert len(cfg.motor_positions) == 4
    m = MotorMixingModel(arm_length=0.2, pwm_idle=0.05)
    assert m.to_config().arm_length == 0.2


@pytest.mark.parametrize("bad", [
    {"motor_directions": [1, 1, 1, -1]},          # unbalanced yaw
    {"motor_directions": [1, -1, 2, -1]},          # not +-1
    {"motor_positions": [[0.1, 0.1, 0.0]] * 3},    # only 3 motors
    {"pwm_min": 0.5, "pwm_idle": 0.4},             # idle below min
    {"pwm_idle": 1.0},                             # idle not < max
    # collinear motors: roll/pitch/yaw not independently controllable
    {"motor_positions": [[0.15, 0.0, 0.0], [-0.15, 0.0, 0.0],
                         [0.3, 0.0, 0.0], [-0.3, 0.0, 0.0]]},
])
def test_mixing_schema_rejects_bad_configs(bad):
    with pytest.raises(Exception):
        validate_motor_mixing(bad)
