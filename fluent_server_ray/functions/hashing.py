"""Shared hash constructions whose exact bit layout is an ORACLE
CONTRACT — every strict DuckDB mirror that says ``md5_number_upper``
hangs on the single definition below.  Change it in one place or not
at all."""

from __future__ import annotations

import hashlib


def md5_u64(data: bytes | str) -> int:
    """First 8 bytes of ``md5(data)`` as a LITTLE-ENDIAN uint64.

    This is exactly DuckDB's ``md5_number_upper(x)`` (DuckDB stores
    the digest as two little-endian u64 halves; "upper" is the first
    half), so any engine-side value built from ``md5_u64`` can be
    mirrored bit-for-bit in SQL.  Used by the SimHash word-hash family
    (stages/dedup.py) and the deterministic embedding stub
    (stages/multimodal.py).
    """
    if isinstance(data, str):
        data = data.encode("utf-8")
    return int.from_bytes(hashlib.md5(data).digest()[:8], "little")


def md5_u64_prefixed(prefix_digest, suffix: bytes) -> int:
    """``md5_u64(prefix ∥ suffix)`` from a reusable copy of the
    prefix's md5 state — hash a shared long prefix ONCE, then derive
    many suffixed values at O(len(suffix)) each.  ``prefix_digest`` is
    ``hashlib.md5(prefix)`` (not its digest).  Bit-identical to
    ``md5_u64(prefix + suffix)``."""
    h = prefix_digest.copy()
    h.update(suffix)
    return int.from_bytes(h.digest()[:8], "little")
