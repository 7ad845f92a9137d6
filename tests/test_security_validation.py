"""Safety-relevant input validation + file-integrity manager.

Reference analogs: security/validation.py:229-489 (trajectory /
control-command / attitude / sensor validators with SafetyLimits) and
security/file_verification.py:90-460 (persisted checksum+HMAC records
with key-id binding, TTL, cleanup, status). The edge-ingestion test
covers the wiring the reference never did: its InputValidator exists
but edge/main_improved.py never calls it on received trajectories.
"""

import os
import time

import numpy as np
import pytest

from dart_planner_tpu.common.errors import ValidationError
from dart_planner_tpu.security.file_verification import (
    FileVerificationManager,
)
from dart_planner_tpu.security.validation import (
    SafetyLimits,
    validate_attitude,
    validate_command_envelope,
    validate_control_command,
    validate_sensor_data,
    validate_trajectory,
)


def _good_trajectory(n=20, dt=0.1, speed=1.0):
    ts = np.arange(n) * dt
    vel = np.zeros((n, 3))
    vel[:, 0] = speed
    pos = np.zeros((n, 3))
    pos[:, 0] = ts * speed
    pos[:, 2] = 2.0
    acc = np.zeros((n, 3))
    return ts, pos, vel, acc


# ---------------------------------------------------------------- trajectory

def test_valid_trajectory_passes():
    validate_trajectory(*_good_trajectory())


def test_discontinuous_trajectory_rejected():
    ts, pos, vel, acc = _good_trajectory()
    pos[10:, 0] += 5.0  # teleport the tail; velocities no longer explain it
    with pytest.raises(ValidationError, match="discontinuity"):
        validate_trajectory(ts, pos, vel, acc)


def test_overspeed_trajectory_rejected():
    ts, pos, vel, acc = _good_trajectory(speed=20.0)
    with pytest.raises(ValidationError, match="velocity"):
        validate_trajectory(ts, pos, vel, acc)


def test_altitude_envelope_enforced():
    ts, pos, vel, acc = _good_trajectory()
    pos[5, 2] = 500.0
    with pytest.raises(ValidationError, match="altitude"):
        validate_trajectory(ts, pos, vel, acc)


def test_nonmonotone_timestamps_rejected():
    ts, pos, vel, acc = _good_trajectory()
    ts[5] = ts[7]
    with pytest.raises(ValidationError, match="increasing"):
        validate_trajectory(ts, pos, vel, acc)


def test_nonfinite_rejected():
    ts, pos, vel, acc = _good_trajectory()
    pos[3, 1] = np.nan
    with pytest.raises(ValidationError, match="non-finite"):
        validate_trajectory(ts, pos, vel, acc)


def test_segment_length_cap():
    # positions consistent with huge velocities, but segments too long
    limits = SafetyLimits(
        max_horizontal_velocity=1e9, max_segment_length=100.0,
        continuity_tolerance=1e9,
    )
    ts, pos, vel, acc = _good_trajectory(speed=2000.0)
    with pytest.raises(ValidationError, match="segment"):
        validate_trajectory(ts, pos, vel, acc, limits=limits)


def test_home_range_enforced():
    ts, pos, vel, acc = _good_trajectory()
    with pytest.raises(ValidationError, match="range"):
        validate_trajectory(
            ts, pos, vel, acc,
            limits=SafetyLimits(max_range=1.0),
            home=np.array([100.0, 0.0, 2.0]),
        )


def test_waypoint_count_cap():
    ts, pos, vel, acc = _good_trajectory(n=50)
    with pytest.raises(ValidationError, match="waypoints"):
        validate_trajectory(
            ts, pos, vel, acc, limits=SafetyLimits(max_waypoints=10)
        )


# ------------------------------------------------- commands/attitude/sensor

def test_control_command_forms():
    out = validate_control_command(
        {"type": "position", "target": [1.0, 2.0, 3.0], "priority": 5}
    )
    assert out["priority"] == 5
    validate_control_command({"type": "emergency_stop"})
    with pytest.raises(ValidationError):
        validate_control_command({"type": "self_destruct"})
    with pytest.raises(ValidationError):
        validate_control_command({"type": "position"})  # no target
    with pytest.raises(ValidationError):
        validate_control_command(
            {"type": "velocity", "target": [100.0, 0.0, 0.0]}
        )


def test_attitude_limits():
    out = validate_attitude({"roll": 0.1, "pitch": -0.2, "yaw": 3.5})
    assert abs(out["yaw"]) <= np.pi  # normalized
    with pytest.raises(ValidationError, match="roll"):
        validate_attitude({"roll": 1.5, "pitch": 0.0, "yaw": 0.0})


def test_command_envelope():
    validate_command_envelope(15.0, [0.1, -0.1, 0.0])
    with pytest.raises(ValidationError):
        validate_command_envelope(-1.0, [0, 0, 0])
    with pytest.raises(ValidationError):
        validate_command_envelope(1e6, [0, 0, 0])
    with pytest.raises(ValidationError):
        validate_command_envelope(10.0, [0, 0, 100.0])


def test_sensor_data_imu_gps():
    validate_sensor_data(
        {"accelerometer": [0, 0, 9.81], "gyroscope": [0.1, 0, 0]}, "imu"
    )
    with pytest.raises(ValidationError):
        validate_sensor_data({"accelerometer": [0, 0, 9.81]}, "imu")
    validate_sensor_data(
        {"latitude": 47.0, "longitude": 8.0, "altitude": 400.0}, "gps"
    )
    with pytest.raises(ValidationError, match="atitude"):
        validate_sensor_data(
            {"latitude": 95.0, "longitude": 8.0, "altitude": 0.0}, "gps"
        )
    with pytest.raises(ValidationError, match="sensor type"):
        validate_sensor_data({}, "sonar")


# --------------------------------------------------------- file verification

@pytest.fixture
def fvm(tmp_path):
    return FileVerificationManager(
        verification_dir=tmp_path / "verif", secret_key=b"test-key"
    )


def test_create_and_verify_roundtrip(fvm, tmp_path):
    f = tmp_path / "artifact.yaml"
    f.write_text("gains: [7, 7, 8.5]\n")
    rec = fvm.create_record(f, key_id="kid-1")
    assert rec.key_id == "kid-1"
    out = fvm.verify_file(f)
    assert out == {
        "checksum_valid": True, "hmac_valid": True, "file_exists": True
    }


def test_tamper_detected(fvm, tmp_path):
    f = tmp_path / "artifact.yaml"
    f.write_text("gains: [7, 7, 8.5]\n")
    fvm.create_record(f)
    time.sleep(0.01)
    f.write_text("gains: [700, 7, 8.5]\n")
    out = fvm.verify_file(f)
    assert not out["checksum_valid"] and not out["hmac_valid"]


def test_key_id_binding(fvm, tmp_path):
    """Same file, different key ids -> different HMAC signatures, so a
    signature cannot be replayed under a rotated key id (FV:183-199)."""
    f = tmp_path / "a.bin"
    f.write_bytes(b"payload")
    sig1 = fvm.create_record(f, key_id="k1").hmac_signature
    sig2 = fvm.create_record(f, key_id="k2").hmac_signature
    assert sig1 != sig2


def test_wrong_key_fails(tmp_path):
    f = tmp_path / "a.bin"
    f.write_bytes(b"payload")
    m1 = FileVerificationManager(
        verification_dir=tmp_path / "v", secret_key=b"key-A"
    )
    m1.create_record(f)
    m2 = FileVerificationManager(
        verification_dir=tmp_path / "v", secret_key=b"key-B"
    )
    assert m2.verify_checksum(f)  # checksum is keyless
    assert not m2.verify_hmac(f)  # HMAC is not


def test_ttl_and_cleanup(fvm, tmp_path):
    f = tmp_path / "a.bin"
    f.write_bytes(b"payload")
    fvm.create_record(f, expires_in=-1.0)  # already expired
    assert not fvm.verify_checksum(f)
    status = fvm.get_verification_status()
    assert status["expired_records"] == 1
    assert fvm.cleanup_expired() == 1
    assert fvm.get_verification_status()["total_records"] == 0


def test_persistence_across_instances(tmp_path):
    f = tmp_path / "a.bin"
    f.write_bytes(b"payload")
    FileVerificationManager(
        verification_dir=tmp_path / "v", secret_key=b"k"
    ).create_record(f)
    m2 = FileVerificationManager(
        verification_dir=tmp_path / "v", secret_key=b"k"
    )
    assert m2.verify_file(f)["hmac_valid"]


def test_store_is_owner_only(fvm, tmp_path):
    f = tmp_path / "a.bin"
    f.write_bytes(b"x")
    fvm.create_record(f)
    import stat

    mode = stat.S_IMODE(os.stat(fvm.records_path).st_mode)
    assert mode == 0o600


def test_generated_key_persisted_not_hardcoded(tmp_path, monkeypatch):
    """No env key + no argument -> a random key is generated and reused,
    never the reference's forgeable hardcoded default (FV:118-120)."""
    monkeypatch.delenv("DART_FILE_VERIFICATION_KEY", raising=False)
    m1 = FileVerificationManager(verification_dir=tmp_path / "v")
    m2 = FileVerificationManager(verification_dir=tmp_path / "v")
    assert m1._key == m2._key
    assert len(m1._key) == 32
    m3 = FileVerificationManager(verification_dir=tmp_path / "other")
    assert m3._key != m1._key


# ----------------------------------------------------------- edge ingestion

def _edge_payload(ts, pos, vel, acc):
    return {
        "available": True,
        "timestamps": np.asarray(ts),
        "positions": np.asarray(pos),
        "velocities": np.asarray(vel),
        "accelerations": np.asarray(acc),
    }


def test_edge_rejects_unsafe_cloud_trajectory():
    """A compromised/buggy cloud sends a discontinuous then an
    out-of-envelope trajectory: the edge must refuse both at ingestion
    and accept the well-formed one (the wiring VERDICT item 5b asked
    for; the reference's validator exists but is never called on this
    path)."""
    from dart_planner_tpu.apps.edge import EdgeConfig, EdgeController

    edge = EdgeController(EdgeConfig())
    payloads = []

    def fake_send_request(command, payload=None):
        if command == "get_trajectory":
            return payloads.pop(0)
        return {}

    edge.client.send_request = fake_send_request

    ts, pos, vel, acc = _good_trajectory()
    bad_pos = pos.copy()
    bad_pos[10:, 0] += 5.0  # discontinuity
    payloads.append(_edge_payload(ts, bad_pos, vel, acc))
    assert not edge._fetch_trajectory()

    fast = vel.copy()
    fast[:, 2] = 50.0  # out-of-envelope climb rate
    payloads.append(_edge_payload(ts, pos, fast, acc))
    assert not edge._fetch_trajectory()
    assert edge.rejected_trajectories == 2

    payloads.append(_edge_payload(ts, pos, vel, acc))
    assert edge._fetch_trajectory()
    edge.client.close()
