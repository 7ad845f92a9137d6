"""Centralized RBAC matrix tests (reference security/permissions.py
parity: /root/reference/src/dart_planner/security/permissions.py)."""

import pytest

from dart_planner_tpu.security import permissions as perms
from dart_planner_tpu.security.auth import (
    AuthManager,
    Role,
    generate_rsa_keypair,
)

P = perms.Permission


def test_matrix_shape_and_hierarchy():
    # admin holds every permission; viewers only observe
    assert perms.get_role_permissions(Role.ADMIN) == frozenset(P)
    viewer = perms.get_role_permissions(Role.VIEWER)
    assert viewer and all(p.value.startswith("monitor:") for p in viewer)
    # strictly increasing capability: viewer < operator < pilot+... < admin
    op = perms.get_role_permissions(Role.OPERATOR)
    pilot = perms.get_role_permissions(Role.PILOT)
    assert viewer < op
    assert len(pilot) > len(op)
    assert pilot < perms.get_role_permissions(Role.ADMIN)


def test_flight_authority_split():
    """Reference semantics: pilots fly, operators may only STOP."""
    assert perms.has_permission(Role.PILOT, P.FLIGHT_ARM)
    assert perms.has_permission(Role.PILOT, P.FLIGHT_ATTITUDE)
    assert not perms.has_permission(Role.OPERATOR, P.FLIGHT_ARM)
    assert perms.has_permission(Role.OPERATOR, P.FLIGHT_EMERGENCY_STOP)
    assert not perms.has_permission(Role.VIEWER, P.FLIGHT_EMERGENCY_STOP)
    # no administration for either
    for r in (Role.PILOT, Role.OPERATOR):
        assert not perms.has_any_permission(
            r, perms.get_permissions_by_group("user")
        )
        assert not perms.has_permission(r, P.SECURITY_KEYS_MANAGE)


def test_helper_functions():
    mission = perms.get_permissions_by_group("mission")
    assert perms.has_all_permissions(Role.OPERATOR, mission)
    assert not perms.has_all_permissions(Role.VIEWER, mission)
    roles = perms.get_roles_with_permission(P.MISSION_START)
    assert set(roles) == {Role.ADMIN, Role.PILOT, Role.OPERATOR}
    assert perms.get_permissions_by_group("nope") == frozenset()


def test_legacy_string_bridge():
    """The secure hardware channel keys off short command strings
    (hardware/secure_interface.py); the typed matrix must agree."""
    assert perms.has_legacy_permission(Role.PILOT, "emergency_stop")
    assert perms.has_legacy_permission(Role.OPERATOR, "set_mission")
    assert not perms.has_legacy_permission(Role.VIEWER, "arm")
    assert not perms.has_legacy_permission(Role.VIEWER, "unknown_cmd")


def test_pilot_role_through_auth_tokens():
    """End to end: a PILOT token passes the flight-command permission
    gate that a VIEWER token fails."""
    priv, pub = generate_rsa_keypair()
    mgr = AuthManager(private_key_pem=priv, public_key_pem=pub)
    pilot = mgr.register_user("amelia", "s3cret-pass-123", Role.PILOT)
    token = mgr.create_access_token(pilot)
    assert mgr.has_permission(token, "arm")
    assert mgr.has_permission(token, "emergency_stop")
    viewer = mgr.register_user("vee", "s3cret-pass-456", Role.VIEWER)
    vtoken = mgr.create_access_token(viewer)
    assert not mgr.has_permission(vtoken, "arm")
    assert mgr.has_permission(vtoken, "view")
