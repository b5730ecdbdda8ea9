"""Multimodal column plumbing (binary payloads + typed metadata).

Treats image/audio/video as opaque ``binary`` columns with metadata,
processed by actor-pool ``map_batches`` stages — the same shape the
reference uses for opaque PackedForward blobs (reference
``message/mode.go:32-36``: a binary payload whose decode happens in a
dedicated reader, ``defaultreader/reader.go:51-77``).

The actual codec decode is optional-import: ``DecodeStub(real=True)``
uses PIL if it is importable (decoding payload bytes as images —
width/height from the real header parse, failed decodes flagged with
zero dims rather than crashing the stage) and raises
``NotImplementedError`` when no image library exists in the
environment (this container ships none — the default ``real=False``
deterministic fake keeps the plumbing testable either way). The
Ray-side plumbing — schema, batch sizing for large binary rows, actor
signature, output layout — is real and tested in both cases.

Memory note for real payloads: image/audio rows are MBs each, so these
stages run with small ``batch_size`` (e.g. 32) and bounded actor
concurrency so batch × concurrency fits the worker heap; blocks stay
bounded via ``DataContext.target_max_block_size``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def attach_payload(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Demo payload synthesis: utf-8 bytes of the text as the opaque
    binary column (stand-in for real image/audio bytes)."""
    payload = pc.cast(batch[text_col], pa.binary())
    return batch.append_column("payload", payload)


def _image_module():
    """Optional-import image codec (PIL). Returns the module or None —
    no hard dependency; callers choose stub vs real per availability."""
    try:
        from PIL import Image  # noqa: F401  (optional, not shipped here)

        return Image
    except ImportError:
        return None


class DecodeStub:
    """Actor-pool decoder for binary payloads.

    ``real=False`` (default): deterministic fake decode — width/height
    derived from byte length, crc32 checksum. ``real=True``: decodes
    payload bytes as images via PIL when importable (the import is
    resolved ONCE per actor in ``__init__`` — actor-pool state, not
    per batch); raises ``NotImplementedError`` when no image library
    exists in the environment (honest stub per the build spec). A
    real-path payload that fails to parse yields width=height=0
    instead of failing the task — at corpus scale bad bytes are data,
    not errors.

    Output schema is identical on both paths:
    (doc_id, n_bytes, width, height, checksum).
    """

    def __init__(self, real: bool = False):
        self._img = None
        if real:
            self._img = _image_module()
            if self._img is None:
                raise NotImplementedError(
                    "real image/audio decode requires codec libraries not "
                    "present in this environment; plumbing is exercised via "
                    "the deterministic fake (real=False)"
                )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n_bytes = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        if self._img is not None:
            import io

            width = np.zeros(len(payloads), dtype=np.int64)
            height = np.zeros(len(payloads), dtype=np.int64)
            for i, p in enumerate(payloads):
                try:
                    with self._img.open(io.BytesIO(p or b"")) as im:
                        width[i], height[i] = im.size
                except Exception:
                    pass  # undecodable payload → (0, 0), row kept
        else:
            width = n_bytes % 640 + 1
            height = (n_bytes * 7) % 480 + 1
        checksum = np.array(
            [zlib.crc32(p or b"") for p in payloads], dtype=np.int64
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(n_bytes),
                "width": pa.array(width),
                "height": pa.array(height),
                "checksum": pa.array(checksum),
            }
        )


def decode_documents(ds, batch_size: int = 256, concurrency=None):
    """documents → payload → decoded metadata (the full multimodal
    plumbing path: attach binary, actor-pool decode, typed output).
    Small batches bound per-task memory for wide binary rows; the pool
    autoscales with the cluster (``pool_limits``)."""
    if concurrency is None:
        from fluent_server_ray.stages.enrich import pool_limits

        concurrency = pool_limits()
    ds = ds.map_batches(
        attach_payload, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.map_batches(
        DecodeStub,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,  # small batches: binary rows are wide
        concurrency=concurrency,
    )


def decode_documents_sql() -> str:
    """SQL mirror of the fake decode (checksum omitted — no crc32 in
    DuckDB; the Ray-side checksum is covered by unit tests instead)."""
    return """
SELECT doc_id,
  CAST(strlen(text) AS BIGINT) AS n_bytes,
  CAST(strlen(text) % 640 + 1 AS BIGINT) AS width,
  CAST((strlen(text) * 7) % 480 + 1 AS BIGINT) AS height
FROM documents
""".strip()


class FrameSampleStub:
    """Frame sampling for video-shaped payloads: one binary payload row
    explodes into ``n_frames`` frame rows (the flat-map/explode shape —
    ≙ PackedForward blob → many entries, reference
    ``defaultreader/reader.go:63-75``). The 'frames' are deterministic
    equal slices of the payload (codec stub); real frame decode would
    replace ``_slice`` only — the Ray-side explode plumbing is what's
    exercised.
    """

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_pylist()
        out_id, out_frame, out_len, out_head = [], [], [], []
        for doc_id, text in zip(ids, texts):
            t = text or ""
            n = len(t)
            for f in range(self.n_frames):
                lo = f * n // self.n_frames
                hi = (f + 1) * n // self.n_frames
                frame = t[lo:hi]
                out_id.append(doc_id)
                out_frame.append(f)
                out_len.append(len(frame))
                out_head.append(frame[:8])
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_frame, type=pa.int32()),
                "frame_chars": pa.array(out_len, type=pa.int64()),
                "frame_head": pa.array(out_head, type=pa.string()),
            }
        )


def frame_sample_sql(n_frames: int = 4) -> str:
    """SQL mirror of the deterministic frame slicing (character-based,
    matching Python slicing on the same strings)."""
    selects = []
    for f in range(n_frames):
        selects.append(f"""
SELECT doc_id, CAST({f} AS INTEGER) AS frame_idx,
  CAST(({f + 1} * length(text) // {n_frames}) - ({f} * length(text) // {n_frames}) AS BIGINT)
    AS frame_chars,
  substr(text, {f} * length(text) // {n_frames} + 1,
         LEAST(8, ({f + 1} * length(text) // {n_frames}) - ({f} * length(text) // {n_frames})))
    AS frame_head
FROM documents""".strip())
    return "\nUNION ALL\n".join(selects)


class EmbedStub:
    """Feature-extract stub: payload bytes → deterministic fake
    embedding (md5-derived unit vector). Real models would replace the
    vector function; batch-level inference shape is what's exercised
    (one vectorized call per batch, actor-pool residency for weights).

    The fake's value function is deliberately SQL-reproducible so the
    op is STRICTLY oracle-checkable end to end (:func:`embed_stub_sql`):
    per dim j, ``raw_j = md5_number_upper(text ∥ U+001F ∥ j) % 2000001
    − 1000000`` (an exact integer both sides), then ONE float64
    normalization tree ``raw / sqrt(Σ raw²)`` — identical expression,
    identical bits.
    """

    def __init__(self, dim: int = 16):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        from fluent_server_ray.functions.hashing import md5_u64_prefixed

        texts = batch["text"].to_pylist()
        n = len(texts)
        dim_sufs = [str(j).encode("utf-8") for j in range(self.dim)]
        raw = np.empty((n, self.dim), dtype=np.int64)
        for i, t in enumerate(texts):
            # md5(text ∥ 0x1f) is a shared prefix across the dim
            # digests — hash the document ONCE, clone the md5 state
            # per dim (bit-identical to md5(text ∥ 0x1f ∥ j), at
            # 1/dim the hashing cost).
            h0 = hashlib.md5((t or "").encode("utf-8") + b"\x1f")
            for j, suf in enumerate(dim_sufs):
                raw[i, j] = md5_u64_prefixed(h0, suf) % 2000001 - 1000000
        norms = np.sqrt((raw * raw).sum(axis=1).astype(np.float64))
        norms[norms == 0] = 1.0
        mat = raw.astype(np.float64) / norms[:, None]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "embedding": pa.array(list(mat), type=pa.list_(pa.float64())),
            }
        )


def embed_stub_sql(dim: int = 16, table: str = "documents") -> str:
    """DuckDB mirror of :class:`EmbedStub` in LONG form
    (doc_id, dim, v): the integer raws are exact both sides
    (``md5_number_upper`` ≡ first-8-digest-bytes little-endian), and
    the float64 division tree is shared verbatim."""
    return f"""
WITH raw AS MATERIALIZED (
  SELECT doc_id, g.j,
    CAST(md5_number_upper(COALESCE(text, '') || chr(31)
                          || CAST(g.j AS VARCHAR)) % 2000001 AS BIGINT)
      - 1000000 AS r
  FROM {table}, generate_series(0, {int(dim) - 1}) AS g(j)
), norms AS (
  SELECT doc_id,
    CASE WHEN sum(r * r) = 0 THEN 1.0
         ELSE sqrt(CAST(sum(r * r) AS DOUBLE)) END AS nrm
  FROM raw GROUP BY doc_id
)
SELECT raw.doc_id, CAST(raw.j AS BIGINT) AS dim,
  CAST(raw.r AS DOUBLE) / norms.nrm AS v
FROM raw JOIN norms USING (doc_id)
ORDER BY doc_id, dim
""".strip()


class ResizeStub:
    """Resize stage stub: consumes decoded frame metadata and computes
    target dimensions under an aspect-preserving max-side constraint —
    the integer math a real resampler would use (the pixel resample
    itself needs an image library; clearly stubbed per the build spec).
    """

    def __init__(self, max_side: int = 224, real: bool = False):
        if real:
            raise NotImplementedError(
                "real pixel resampling requires an image library not "
                "present in this environment"
            )
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = batch["width"]
        h = batch["height"]
        longer = pc.max_element_wise(w, h)
        # scale = max_side / longer, applied in integer math:
        # out = dim * max_side // longer  (floor, matching SQL //)
        out_w = pc.divide(pc.multiply(w, self.max_side), longer)
        out_h = pc.divide(pc.multiply(h, self.max_side), longer)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "out_width": pc.cast(out_w, pa.int64()),
                "out_height": pc.cast(out_h, pa.int64()),
            }
        )


def resize_sql(max_side: int = 224) -> str:
    """Composes over the fake-decode dims (decode_documents_sql)."""
    return f"""
WITH decoded AS (
  SELECT doc_id,
    CAST(strlen(text) % 640 + 1 AS BIGINT) AS width,
    CAST((strlen(text) * 7) % 480 + 1 AS BIGINT) AS height
  FROM documents
)
SELECT doc_id,
  CAST(width * {max_side} // GREATEST(width, height) AS BIGINT) AS out_width,
  CAST(height * {max_side} // GREATEST(width, height) AS BIGINT) AS out_height
FROM decoded
""".strip()


# ------------------------------------- perceptual-hash (aHash) dedup

def phash_batch(batch: pa.Table, text_col: str = "text",
                n_bits: int = 63) -> pa.Table:
    """Deterministic perceptual hash (aHash) over the stub-decoded
    thumbnail: the payload's codepoint sequence is bucketed into
    ``n_bits`` equal spans (char i of an L-char payload lands in span
    ``i·n_bits // L`` — the stand-in for an 8×8 grayscale downsample),
    each span's pixel is its codepoint sum mod 256, and the hash sets
    bit k iff ``n_bits·p_k ≥ Σp`` (the integer spelling of
    "pixel ≥ mean" — no division). 63 bits keep the code in int64 on
    both engines (the house simhash convention). Payloads with zero
    codepoints (NULL/'') emit no signature — mirrored by the SQL
    ``length(text) >= 1`` filter.

    A real image pipeline swaps the span-sum for the decoded-pixel
    downsample; everything downstream (hamming blocking, verify,
    pair output) is codec-agnostic."""
    t = batch.filter(pc.and_(
        pc.is_valid(batch[text_col]),
        pc.greater(pc.utf8_length(batch[text_col]), 0)))
    ids = (t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
           if len(t) else np.array([], dtype=np.int64))
    texts = t[text_col].to_pylist()
    # one flat codepoint array + global span ids → ONE scatter-add for
    # the whole batch (no per-pixel python)
    lens = np.fromiter((len(s) for s in texts), dtype=np.int64,
                       count=len(texts))
    total = int(lens.sum())
    cps = np.empty(total, dtype=np.int64)
    spans = np.empty(total, dtype=np.int64)
    pos = 0
    for d, s in enumerate(texts):
        L = len(s)
        if not L:
            continue
        cp = np.fromiter(map(ord, s), dtype=np.int64, count=L)
        cps[pos:pos + L] = cp
        spans[pos:pos + L] = d * n_bits + (np.arange(L) * n_bits) // L
        pos += L
    pix = np.zeros(len(texts) * n_bits, dtype=np.int64)
    np.add.at(pix, spans, cps)
    pix = (pix % 256).reshape(len(texts), n_bits)
    s = pix.sum(axis=1, keepdims=True)
    bits = (n_bits * pix >= s)
    code = (bits.astype(np.uint64)
            << np.arange(n_bits, dtype=np.uint64)[None, :]).sum(axis=1)
    return pa.table({"doc_id": pa.array(ids),
                     "phash": pa.array(code.astype(np.int64))})


def phash_dupes(ds, max_hamming: int = 8, n_blocks: int = 9,
                n_buckets: int = 64, max_group: int = 4096):
    """Perceptual-hash near-dup pairs: all (doc_a, doc_b, hamming)
    whose 63-bit aHash codes differ in ≤ ``max_hamming`` bits — the
    multimodal sibling of :func:`dedup.simhash_near_dupes`, same
    pigeonhole plan: 63 bits split into ``n_blocks`` 7-bit blocks
    (recall 1 for d < n_blocks), one (block, value)-bucket exchange of
    small-int rows per doc, vectorized in-bucket verify (exact XOR
    popcount), distributed pair distinct. The hamming distance rides
    the pair rows out (``distinct_pairs`` carries non-key columns).
    Returns a Dataset (doc_a, doc_b, hamming)."""
    import pandas as pd

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.dedup import (
        _empty_pairs_ds, _hamming64, distinct_pairs)

    assert max_hamming < n_blocks, "pigeonhole needs d < n_blocks"
    n_bits = 63
    assert n_bits % n_blocks == 0
    width = n_bits // n_blocks

    def explode_blocks(t: pa.Table) -> pa.Table:
        sig = phash_batch(t)
        n = len(sig)
        ids = sig["doc_id"].to_numpy(zero_copy_only=False)
        codes = sig["phash"].to_numpy(zero_copy_only=False)
        u = codes.astype(np.uint64)
        mask = np.uint64((1 << width) - 1)
        blocks = np.stack(
            [(u >> np.uint64(bi * width)) & mask
             for bi in range(n_blocks)], axis=1)
        return pa.table({
            "block_id": pa.array(
                np.tile(np.arange(n_blocks, dtype=np.int32), n)),
            "block_val": pa.array(blocks.reshape(-1).astype(np.int64)),
            "doc_id": pa.array(np.repeat(ids, n_blocks)),
            "phash": pa.array(np.repeat(codes, n_blocks)),
        })

    def add_bucket(t: pa.Table) -> pa.Table:
        bv = t["block_val"].to_numpy(zero_copy_only=False)
        bi = t["block_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_bucket", pa.array(
            ((bv * n_blocks + bi) % n_buckets).astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        key = ["block_id", "block_val"]
        g = g.drop_duplicates(key + ["doc_id"])
        size = g.groupby(key)["doc_id"].transform("size")
        g = g[size > 1]
        empty = pd.DataFrame({
            "doc_a": np.asarray([], dtype=np.int64),
            "doc_b": np.asarray([], dtype=np.int64),
            "hamming": np.asarray([], dtype=np.int64)})
        if not len(g):
            return empty
        size = g.groupby(key)["doc_id"].transform("size")
        outs = []
        small = g[size <= max_group]
        if len(small):
            m = small.merge(small, on=key)
            m = m[m["doc_id_x"] < m["doc_id_y"]]
            if len(m):
                x = (m["phash_x"].to_numpy(np.int64).astype(np.uint64)
                     ^ m["phash_y"].to_numpy(np.int64).astype(np.uint64))
                ham = _hamming64(x)
                keep = ham <= max_hamming
                outs.append(pd.DataFrame({
                    "doc_a": m["doc_id_x"].to_numpy(np.int64)[keep],
                    "doc_b": m["doc_id_y"].to_numpy(np.int64)[keep],
                    "hamming": ham[keep]}))
        big = g[size > max_group]
        if len(big):
            # degenerate code collision: min-id representative pairing
            reps = (big.sort_values("doc_id")
                    .groupby(key, as_index=False).first()
                    [key + ["doc_id", "phash"]]
                    .rename(columns={"doc_id": "rep_id",
                                     "phash": "rep_sig"}))
            m = big.merge(reps, on=key)
            m = m[m["doc_id"] != m["rep_id"]]
            if len(m):
                x = (m["phash"].to_numpy(np.int64).astype(np.uint64)
                     ^ m["rep_sig"].to_numpy(np.int64).astype(np.uint64))
                ham = _hamming64(x)
                keep = ham <= max_hamming
                ids = m["doc_id"].to_numpy(np.int64)[keep]
                rep = m["rep_id"].to_numpy(np.int64)[keep]
                outs.append(pd.DataFrame({
                    "doc_a": np.minimum(rep, ids),
                    "doc_b": np.maximum(rep, ids),
                    "hamming": ham[keep]}))
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    from fluent_server_ray.stages.groups import map_buckets

    _HAM_FIELDS = (("hamming", pa.int64()),)
    cand = map_buckets(
        ds.map_batches(explode_blocks, batch_format="pyarrow",
                       zero_copy_batch=True)
        .map_batches(skip_empty(add_bucket), batch_format="pyarrow",
                     zero_copy_batch=True),
        per_bucket,
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                   ("hamming", pa.int64())]), key="_bucket")
    out = distinct_pairs(cand, n_buckets=n_buckets,
                         extra_fields=_HAM_FIELDS).materialize()
    if out.count() == 0:
        return _empty_pairs_ds()
    return out


def phash_dupes_sql(max_hamming: int = 8, n_bits: int = 63,
                    table: str = "documents") -> str:
    """All-pairs mirror: same span/pixel/mean-bit construction via a
    correlated ``generate_series`` char explode, then an exact
    ``bit_count(xor(...))`` hamming scan over every (a < b) pair —
    recall-1 ground truth for the pigeonhole path (engine recall is 1
    for d < n_blocks, so the sets must be EQUAL)."""
    return f"""
WITH docs AS MATERIALIZED (
  SELECT doc_id, text, length(text) AS L FROM {table}
  WHERE text IS NOT NULL AND length(text) >= 1
), idx AS (
  -- correlated series via unnest(generate_series(...)): this DuckDB
  -- rejects lateral table-function parameters
  SELECT doc_id, text, L, unnest(generate_series(1, L)) AS i FROM docs
), chars AS (
  SELECT doc_id, ((i - 1) * {n_bits}) // L AS k,
    unicode(substr(text, CAST(i AS INTEGER), 1)) AS cp
  FROM idx
), pix0 AS (
  SELECT doc_id, k, sum(cp) % 256 AS p FROM chars GROUP BY 1, 2
), grid AS (
  SELECT d.doc_id, unnest(generate_series(0, {n_bits - 1})) AS k
  FROM docs d
), pix AS (
  SELECT g.doc_id, g.k, coalesce(p.p, 0) AS p
  FROM grid g LEFT JOIN pix0 p ON p.doc_id = g.doc_id AND p.k = g.k
), tot AS (
  SELECT doc_id, sum(p) AS s FROM pix GROUP BY 1
), code AS MATERIALIZED (
  SELECT pix.doc_id,
    CAST(sum(CASE WHEN {n_bits} * p >= t.s
             THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER)
             ELSE 0 END) AS BIGINT) AS h
  FROM pix JOIN tot t ON t.doc_id = pix.doc_id GROUP BY pix.doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
FROM code a JOIN code b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h, b.h)) <= {max_hamming}
ORDER BY doc_a, doc_b
""".strip()
