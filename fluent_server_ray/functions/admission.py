"""Driver-side job admission ≙ the reference's handshake control plane.

The reference gates a session behind HELO → PING → PONG with sha512
digests (reference ``message/helo.go:16-74``, ``message/ping.go:22-95``,
``message/pong.go:10-46``). In a batch engine the analogue is
validating a job's credentials/config once on the driver before any
Dataset work starts. These are pure functions so conformance tests can
pin the exact digest algebra the reference uses:

- shared-key proof: ``sha512_hex(salt + client_hostname + nonce +
  shared_key)`` (reference ``message/ping.go:63-74``)
- password proof: ``sha512_hex(hashsalt + username + password)``
  (reference ``message/ping.go:76-95``)
- PONG server proof: ``sha512_hex(salt + server_hostname + nonce +
  shared_key)`` (reference ``message/pong.go:31-36``)

Nonce/salt generation stays wall-clock/entropy-free in the data plane:
callers supply them (the reference generates 16 random bytes,
``message/helo.go:7-14`` — driver-side only).
"""

from __future__ import annotations

import hashlib
import hmac


def shared_key_hexdigest(salt: str | bytes, hostname: str, nonce: bytes,
                         shared_key: str) -> str:
    h = hashlib.sha512()
    h.update(salt.encode() if isinstance(salt, str) else salt)
    h.update(hostname.encode())
    h.update(nonce)
    h.update(shared_key.encode())
    return h.hexdigest()


def password_hexdigest(hashsalt: bytes, username: str, password: bytes) -> str:
    h = hashlib.sha512()
    h.update(hashsalt)
    h.update(username.encode())
    h.update(password)
    return h.hexdigest()


def validate_shared_key(ping: dict, nonce: bytes, shared_key: str) -> None:
    """PING fields → raises ValueError on mismatch (reference replies
    PONG(false, reason) instead of dropping — callers map the exception
    to a refusal, ``message/ping.go:111-122``)."""
    want = shared_key_hexdigest(
        ping["shared_key_salt"], ping["client_hostname"], nonce, shared_key
    )
    if not hmac.compare_digest(want, ping["shared_key_hexdigest"]):
        raise ValueError("shared key mismatch")


def validate_password(ping: dict, hashsalt: bytes, users) -> None:
    """``users: Callable[[str], bytes | None]`` ≙ the reference's
    ``Users func(string) []byte`` lookup (``options/options.go:16``)."""
    username, password = ping.get("username", ""), ping.get("password", "")
    if not username:
        raise ValueError("username is mandatory")
    if not password:
        raise ValueError("password is mandatory")
    stored = users(username)
    if stored is None:
        raise ValueError(f"unknown user : {username}")
    want = password_hexdigest(hashsalt, username, stored)
    if not hmac.compare_digest(want, password):
        raise ValueError(f"bad password for user : {username}")


def pong(auth_ok: bool, reason: str, server_hostname: str, salt: str | bytes,
         nonce: bytes, shared_key: str) -> list:
    """5-ary PONG frame (reference ``message/pong.go:10-46``)."""
    return [
        "PONG",
        auth_ok,
        reason,
        server_hostname,
        shared_key_hexdigest(salt, server_hostname, nonce, shared_key)
        if auth_ok
        else "",
    ]


def helo(nonce: bytes, auth_salt: bytes = b"", keepalive: bool = True) -> list:
    """2-ary HELO frame (reference ``message/helo.go:16-74``)."""
    return ["HELO", {"nonce": nonce, "auth": auth_salt, "keepalive": keepalive}]
