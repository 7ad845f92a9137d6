"""User database service + management CLI (reference security/db/,
manage_users.py, alembic migrations)."""

import pytest

from dart_planner_tpu.common.errors import SecurityError
from dart_planner_tpu.security import manage_users
from dart_planner_tpu.security.auth import Role
from dart_planner_tpu.security.db import UserService


@pytest.fixture
def svc():
    s = UserService(":memory:")
    yield s
    s.close()


def test_schema_migrated(svc):
    assert svc.schema_version == 2  # both migration steps applied


def test_user_crud_and_roles(svc):
    u = svc.create_user("alice", "pw-alice-1", Role.OPERATOR)
    assert u["username"] == "alice" and u["role"] == "operator"
    assert svc.get_user_by_username("alice")["id"] == u["id"]
    with pytest.raises(SecurityError):
        svc.create_user("alice", "x", Role.VIEWER)  # duplicate
    svc.create_user("bob", "pw-bob-123", Role.VIEWER)
    assert [x["username"] for x in svc.get_all_users()] == ["alice", "bob"]
    svc.update_user_role(u["id"], Role.ADMIN)
    assert svc.get_user(u["id"])["role"] == "admin"
    assert svc.delete_user(u["id"])
    assert svc.get_user(u["id"]) is None


def test_authentication_against_db(svc):
    svc.create_user("op", "correct-horse", Role.OPERATOR)
    user = svc.authenticate("op", "correct-horse")
    assert user is not None and user.role == Role.OPERATOR
    assert svc.authenticate("op", "wrong") is None
    assert svc.authenticate("ghost", "x") is None
    # deactivated users cannot authenticate
    uid = svc.get_user_by_username("op")["id"]
    svc.set_active(uid, False)
    assert svc.authenticate("op", "correct-horse") is None


def test_token_revocation(svc):
    u = svc.create_user("op", "pw", Role.OPERATOR)
    assert not svc.is_token_revoked("jti-1")
    svc.revoke_token("jti-1", u["id"])
    assert svc.is_token_revoked("jti-1")
    svc.revoke_token("jti-1", u["id"])  # idempotent


def test_manage_users_cli(svc, capsys):
    assert manage_users.main(
        ["create-admin", "-u", "root", "-p", "pw-root-1"], service=svc
    ) == 0
    assert manage_users.main(
        ["create-user", "-u", "op", "-p", "pw-op-1", "-r", "operator"],
        service=svc,
    ) == 0
    assert manage_users.main(["list-users"], service=svc) == 0
    out = capsys.readouterr().out
    assert "root" in out and "admin" in out and "op" in out
    assert manage_users.main(
        ["set-role", "-u", "op", "-r", "admin"], service=svc
    ) == 0
    assert svc.get_user_by_username("op")["role"] == "admin"
    assert manage_users.main(["delete-user", "-u", "op"], service=svc) == 0
    assert svc.get_user_by_username("op") is None
    assert manage_users.main(["delete-user", "-u", "nope"], service=svc) == 1
