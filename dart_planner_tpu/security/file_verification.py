"""File integrity verification (reference security/file_verification.py):
SHA-256 digests with constant-time comparison for config/model artifacts."""

from __future__ import annotations

import hashlib
import hmac
from pathlib import Path

from dart_planner_tpu.common.errors import SecurityError


def compute_file_digest(path: str | Path, chunk_size: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(chunk_size):
            h.update(chunk)
    return h.hexdigest()


def verify_file_digest(path: str | Path, expected_hex: str) -> bool:
    """True iff the file hashes to ``expected_hex`` (constant-time)."""
    try:
        actual = compute_file_digest(path)
    except OSError as e:
        raise SecurityError(f"cannot read {path}: {e}") from e
    return hmac.compare_digest(actual, expected_hex.lower())
