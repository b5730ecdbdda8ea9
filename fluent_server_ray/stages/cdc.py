"""Content-defined chunking (CDC) — binary-payload dedup.

Byte-identical dedup (``dedup.exact_dedup``) misses a payload that is
99% the same file with a few bytes inserted — every fixed-size block
after the insertion shifts. CDC cuts chunk boundaries where a rolling
hash of the CONTENT hits a mask, so boundaries move with the content:
two payloads sharing a long byte run share the chunks inside it
regardless of alignment, and chunk-hash dedup then stores each shared
chunk once. This is the standard large-blob dedup shape (backup
systems, dataset lakes) applied to the multimodal ``binary`` columns
(cf. ``stages/multimodal.py`` — the reference's opaque PackedForward
blob, ``message/mode.go:32-36``, generalized).

Algorithm: Gear rolling hash —
``h_i = (h_{i-1} << 1) + GEAR[b_i]`` over a fixed random byte table.
Because the shift discards bits past 64, ``h_i`` depends on only the
last 64 bytes:  ``h_i = Σ_{k<64} GEAR[b_{i-k}] << k`` — which makes the
whole rolling hash VECTORIZABLE as 64 shifted adds over the byte
array (no per-byte Python loop). A cut falls after position ``i`` when
``h_i & (avg_size-1) == 0``, subject to min/max chunk bounds (the
min/max walk touches only candidate positions, not bytes).

Everything is deterministic: fixed-seed gear table, content-only
boundaries, md5 chunk ids.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_GEAR = np.random.default_rng(23).integers(
    0, 1 << 63, size=256, dtype=np.uint64
)


def gear_hashes(data: np.ndarray) -> np.ndarray:
    """Rolling gear hash per byte position (vectorized, 64-byte window)."""
    g = _GEAR[data]
    h = np.zeros(len(data), dtype=np.uint64)
    for k in range(64):
        if k >= len(data):
            break
        h[k:] += g[: len(data) - k] << np.uint64(k)
    return h


def chunk_boundaries(payload: bytes, min_size: int = 32, avg_size: int = 64,
                     max_size: int = 256) -> list[int]:
    """Cut offsets (exclusive ends) for one payload. ``avg_size`` must
    be a power of two (it becomes the hash mask)."""
    assert avg_size & (avg_size - 1) == 0, "avg_size must be a power of 2"
    n = len(payload)
    if n == 0:
        return []
    data = np.frombuffer(payload, dtype=np.uint8)
    h = gear_hashes(data)
    mask = np.uint64(avg_size - 1)
    cand = np.nonzero((h & mask) == 0)[0] + 1  # cut AFTER the position
    cuts: list[int] = []
    last = 0
    ci = 0
    while last < n:
        lo, hi = last + min_size, last + max_size
        while ci < len(cand) and cand[ci] < lo:
            ci += 1
        if ci < len(cand) and cand[ci] <= hi and cand[ci] < n:
            cut = int(cand[ci])
            ci += 1
        else:
            cut = min(hi, n)
        cuts.append(cut)
        last = cut
    return cuts


def cdc_chunk_batch(batch: pa.Table, payload_col: str = "payload",
                    id_col: str = "doc_id", min_size: int = 32,
                    avg_size: int = 64, max_size: int = 256) -> pa.Table:
    """payload rows → one row per chunk:
    (doc_id, chunk_idx, offset, length, chunk_hash[md5 hex])."""
    ids, idxs, offs, lens, hashes = [], [], [], [], []
    for doc_id, payload in zip(batch[id_col].to_pylist(),
                               batch[payload_col].to_pylist()):
        payload = payload or b""
        last = 0
        for i, cut in enumerate(chunk_boundaries(payload, min_size,
                                                 avg_size, max_size)):
            ids.append(doc_id)
            idxs.append(i)
            offs.append(last)
            lens.append(cut - last)
            hashes.append(hashlib.md5(payload[last:cut]).hexdigest())
            last = cut
    return pa.table(
        {
            id_col: pa.array(np.asarray(ids, dtype=np.int64)),
            "chunk_idx": pa.array(np.asarray(idxs, dtype=np.int32)),
            "offset": pa.array(np.asarray(offs, dtype=np.int64)),
            "length": pa.array(np.asarray(lens, dtype=np.int64)),
            "chunk_hash": pa.array(hashes, type=pa.string()),
        }
    )


def cdc_chunks(ds, payload_col: str = "payload", id_col: str = "doc_id",
               min_size: int = 32, avg_size: int = 64, max_size: int = 256,
               batch_size: int = 256, concurrency=None):
    """Dataset of payload rows → Dataset of chunk rows (actor pool:
    binary rows are large, so SMALL batches bound per-task memory while
    concurrency autoscale­s with the cluster — a fixed cap would starve
    a big cluster's CPU-bound chunking pass)."""
    if concurrency is None:
        from fluent_server_ray.stages.enrich import pool_limits

        concurrency = pool_limits()

    class Chunker:
        def __call__(self, batch: pa.Table) -> pa.Table:
            return cdc_chunk_batch(batch, payload_col, id_col,
                                   min_size, avg_size, max_size)

    return ds.map_batches(
        Chunker, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
    )


def cdc_dedup_stats(chunks_ds) -> pa.Table:
    """Storage-dedup summary over chunk rows: total vs distinct chunks
    and bytes (combiner-first — per-block distinct sizes, tiny merge).
    ``dedup_ratio = stored_bytes / total_bytes``."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        per = t.group_by("chunk_hash").aggregate(
            [("length", "max"), ("length", "sum"), ([], "count_all")]
        )
        return per.rename_columns(
            ["chunk_hash", "stored_len", "total_len", "n"]
        )

    parts = list(
        chunks_ds.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if not parts:
        return pa.table(
            {"total_chunks": pa.array([0]), "distinct_chunks": pa.array([0]),
             "total_bytes": pa.array([0]), "stored_bytes": pa.array([0]),
             "dedup_ratio": pa.array([1.0])}
        )
    merged = pa.concat_tables(parts).group_by("chunk_hash").aggregate(
        [("stored_len", "max"), ("total_len", "sum"), ("n", "sum")]
    )
    total_chunks = int(pc.sum(merged["n_sum"]).as_py())
    distinct_chunks = len(merged)
    total_bytes = int(pc.sum(merged["total_len_sum"]).as_py())
    stored_bytes = int(pc.sum(merged["stored_len_max"]).as_py())
    return pa.table(
        {
            "total_chunks": pa.array([total_chunks], type=pa.int64()),
            "distinct_chunks": pa.array([distinct_chunks], type=pa.int64()),
            "total_bytes": pa.array([total_bytes], type=pa.int64()),
            "stored_bytes": pa.array([stored_bytes], type=pa.int64()),
            "dedup_ratio": pa.array(
                [stored_bytes / total_bytes if total_bytes else 1.0],
                type=pa.float64(),
            ),
        }
    )


def cdc_chunks_sql(min_size: int = 32, avg_size: int = 64,
                   max_size: int = 256, table: str = "documents") -> str:
    """DuckDB mirror of :func:`cdc_chunks` over the demo payloads
    (``attach_payload`` = utf-8 bytes of ``text``) — the gear hash is
    plain modular arithmetic, so the whole chunker is SQL-computable:

    - the cut test ``h & (avg_size-1) == 0`` reads only the LOW
      ``log2(avg_size)`` bits of the hash, and the left-shift
      recurrence means those bits depend on only the last
      ``log2(avg_size)`` bytes — six masked-gear window lags instead
      of the full 64-term sum;
    - the fixed-seed gear table inlines (masked) as 256 VALUES rows;
    - the min/max-bounded boundary walk is sequential BY DESIGN (each
      cut re-bases the window) → one recursive CTE stepping all docs
      in parallel, picking per step the first candidate in
      ``[cut+min, cut+max]`` (else the forced max cut);
    - chunk ids are ``md5(substr(...))`` — DuckDB md5 over the same
      utf-8 bytes.

    ASCII assumption (like ``winnow_fingerprints_sql``): byte
    extraction via ``unicode(substr(...))`` and character offsets
    equal byte offsets only for ASCII text — true of the test corpora;
    the ENGINE is byte-correct for any payload."""
    assert avg_size & (avg_size - 1) == 0
    bits = avg_size.bit_length() - 1
    glow = (_GEAR & np.uint64(avg_size - 1)).astype(np.int64)
    gear_rows = ", ".join(f"({b}, {int(v)})" for b, v in enumerate(glow))
    hterms = " + ".join(
        f"COALESCE(lag(gv, {k}) OVER w, 0) * {1 << k}" for k in range(bits)
    )
    return f"""
WITH RECURSIVE gear(b, gv) AS (VALUES {gear_rows}),
docs AS (
  SELECT doc_id, text, length(text) AS n FROM {table}
  WHERE text IS NOT NULL AND length(text) > 0
),
bytes AS (
  SELECT d.doc_id, gs AS i, g.gv
  FROM docs d
  CROSS JOIN unnest(generate_series(1, d.n)) AS u(gs)
  JOIN gear g ON g.b = unicode(substr(d.text, gs, 1))
),
hashes AS (
  SELECT doc_id, i, ({hterms}) % {avg_size} AS hlow
  FROM bytes
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
cand AS (
  SELECT doc_id, i FROM hashes WHERE hlow = 0
),
rec AS (
  SELECT doc_id, n, 0 AS cut, 0 AS idx FROM docs
  UNION ALL
  SELECT r.doc_id, r.n,
    COALESCE(
      (SELECT min(c.i) FROM cand c
       WHERE c.doc_id = r.doc_id
         AND c.i >= r.cut + {min_size} AND c.i <= r.cut + {max_size}
         AND c.i < r.n),
      LEAST(r.cut + {max_size}, r.n)) AS cut,
    r.idx + 1
  FROM rec r WHERE r.cut < r.n
)
SELECT r.doc_id, CAST(r.idx - 1 AS INTEGER) AS chunk_idx,
  CAST(p.cut AS BIGINT) AS "offset", CAST(r.cut - p.cut AS BIGINT) AS length,
  md5(substr(d.text, p.cut + 1, r.cut - p.cut)) AS chunk_hash
FROM rec r
JOIN rec p ON p.doc_id = r.doc_id AND p.idx = r.idx - 1
JOIN docs d ON d.doc_id = r.doc_id
WHERE r.idx >= 1
ORDER BY r.doc_id, chunk_idx
""".strip()
