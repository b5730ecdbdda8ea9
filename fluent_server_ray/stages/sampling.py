"""Deterministic key-stratified sampling — training-data curation.

Sampling for corpus curation must be (a) deterministic across runs,
nodes and engines (no RNG in the data plane — the same discipline as
the reference's entropy-free event path; cf. SURVEY §2.7 F3), and
(b) stratified by a KEY so logical units stay whole: sampling
conversations must keep or drop every turn of a conversation together,
never shred it.

Rule: keep a key iff the first byte of ``md5(key)`` is below a
threshold — ``frac ≈ threshold/256``. md5 is identical in every
language and in DuckDB, and fixed-length lowercase hex compares
lexicographically as numerically, so the SQL mirror is literally
``substr(md5(key), 1, 2) < '<hex>'`` — the Ray stage and the oracle
cannot drift.

Vectorization: md5 runs once per DISTINCT key per batch (dictionary
encode → hash uniques → take), not per row — a conversation's turns
share one digest.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _keep_mask(keys: pa.Array, hex_threshold: str) -> pa.Array:
    enc = pc.dictionary_encode(pc.fill_null(pc.cast(keys, pa.string()), ""))
    uniq = enc.dictionary.to_pylist()
    keep_per_value = pa.array(
        np.fromiter(
            (hashlib.md5(u.encode()).hexdigest()[:2] < hex_threshold
             for u in uniq),
            dtype=bool, count=len(uniq),
        )
    )
    return pc.take(keep_per_value, enc.indices)


def sample_by_key(ds, key_col: str, hex_threshold: str | None = "40"):
    """Keep all rows whose ``key_col`` hashes under the threshold
    (``'40'`` ≈ 25%, ``'80'`` ≈ 50% of keys — of KEYS, not rows: a hot
    key contributes all or none of its rows).

    ``hex_threshold=None`` is the keep-all sentinel (the stage becomes
    a no-op) — two hex chars cannot express 100%: even ``'ff'`` drops
    keys whose md5 starts with ``'ff'`` (~1/256)."""
    if hex_threshold is None:
        return ds
    if not (len(hex_threshold) == 2
            and all(c in "0123456789abcdef" for c in hex_threshold)):
        raise ValueError(
            "hex_threshold must be two lowercase hex chars, or None to keep all"
        )

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        arr = t[key_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return t.filter(_keep_mask(arr, hex_threshold))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sample_by_key_sql_predicate(key_col: str,
                                hex_threshold: str | None = "40") -> str:
    """The DuckDB WHERE predicate mirroring :func:`sample_by_key`."""
    if hex_threshold is None:  # keep-all sentinel, same as the stage
        return "TRUE"
    return (
        f"substr(md5(COALESCE(CAST({key_col} AS VARCHAR), '')), 1, 2)"
        f" < '{hex_threshold}'"
    )
