"""Deduplication operators for training-data pipelines.

Five strategies over a document table, each in its idiomatic Ray Data
shape:

- **exact** — content-hash partition + per-group min-id winner
  (hash col added in a vectorized ``map_batches``; one ``groupby``
  shuffle keyed on the 16-byte hash, never on the full text).
- **prefix-blocked char-Jaccard** — LSH-style blocking on a text
  prefix, pairwise verification inside each block
  (``groupby(block).map_groups``); exact w.r.t. its blocking rule, so
  it is SQL-mirrorable (DuckDB's ``jaccard`` is the same char-set
  measure).
- **MinHash + LSH** — per-doc minhash signature over k-word shingles
  (vectorized numpy), banded into ``(band_id, band_hash)`` keys,
  candidate groups via one groupby shuffle (oversized buckets capped
  via a min-id representative), candidates verified with true
  shingle-set Jaccard. Probabilistic recall → no SQL oracle.
- **SimHash** — 64-bit simhash of word hashes; near-dup candidates =
  identical simhash bucket (optionally rotated bands for hamming<=k).
- **embedding cosine** — see :mod:`fluent_server_ray.stages.similarity`.

All signatures are deterministic (fixed hash seeds via
``pandas.util.hash_array``; Python's ``hash()`` is process-seeded and
never used).

The scale story: every strategy reduces to (vectorized per-batch
signature) → (groupby on a small key) → (per-group work bounded by
group size). Skewed blocks (a hot prefix) are bounded by block size
caps; at 100 TB the groupby key space is uniform hashes, so the
shuffle is balanced by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- exact

# the shared (doc_a, doc_b) candidate-pair block schema — pinned so
# every per-bucket pair generator (including empty sort partitions)
# emits identically-typed Arrow blocks (groups.map_buckets)
_PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = pd.util.hash_array(
        np.asarray(batch[text_col].to_pylist(), dtype=object)
    ).astype("int64")
    return batch.append_column("_h", pa.array(h))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                n_buckets: int = 256):
    """Keep the min-id row per distinct text. Returns (id, text) rows.

    Two-level, combiner-first: each batch collapses to one (bucket,
    min_id, text) row per distinct text BEFORE the shuffle, so what
    moves is O(distinct-per-block), and a text duplicated millions of
    times (the hot-key case — mass-duplicated boilerplate is exactly
    what dedup exists for) contributes one row per block instead of
    flooding one reducer. min-of-mins is exact.

    The exchange key is ``hash(text) % n_buckets`` — a BOUNDED small
    int (a groupby on the raw hash makes one pandas group per distinct
    text; per-group dispatch dominates at corpus scale). All copies of
    a text share its hash, so they co-locate; inside a bucket the
    winner is one segmented sort + groupby-head over every text in the
    bucket at once, grouped on the TEXT itself (two texts colliding
    into one bucket — or even one 64-bit hash, expected near the 2^32
    birthday bound at trillion-row scale — each keep their own winner,
    matching the SQL GROUP BY text).
    """

    from fluent_server_ray.stages.aggregate import skip_empty

    def partial(t: pa.Table) -> pa.Table:
        t = add_content_hash(t, text_col).select(["_h", id_col, text_col])
        out = t.group_by(["_h", text_col]).aggregate([(id_col, "min")])
        h = out["_h"].to_numpy(zero_copy_only=False)
        return pa.table({
            "_b": pa.array((h % n_buckets).astype(np.int64)),
            text_col: out[text_col],
            id_col: out[f"{id_col}_min"],
        })

    def min_per_text(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        # dropna=False: SQL's GROUP BY text keeps one min-id NULL-text
        # row (all NULLs hash alike, so they share a bucket and the
        # global winner is exact); pandas would drop the NaN group
        return g.groupby(text_col, sort=False, as_index=False,
                         dropna=False).head(1)[[id_col, text_col]]

    from fluent_server_ray.stages.groups import map_buckets, ray_schema_types

    types = ray_schema_types(ds, [id_col, text_col])
    out_schema = pa.schema([pa.field(id_col, types[id_col]),
                            pa.field(text_col, types[text_col])])
    return map_buckets(
        ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True),
        min_per_text, out_schema, key="_b")


def exact_dedup_sql(table: str = "documents") -> str:
    return (
        f"SELECT min(doc_id) AS doc_id, text FROM {table} GROUP BY text"
    )


# ------------------------------------- prefix-blocked char-set Jaccard

def _charset_jaccard(a: str, b: str) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def prefix_block_dupes(
    ds,
    prefix_len: int = 12,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_block: int | None = None,
):
    """Near-dup pairs among docs sharing a text prefix (blocking key),
    scored by char-set Jaccard (DuckDB's ``jaccard`` semantics, so the
    result is oracle-checkable). Returns (doc_a, doc_b) with a < b.

    ``max_block`` (OPT-IN; default None = exact) bounds the per-block
    O(n²) pair scan: a hot prefix (boilerplate headers) above the cap
    compares each member only to the block's min-id representative —
    O(n) for the pathological block, candidates stay connected through
    the representative (same skew-cap pattern as
    ``minhash_lsh_candidates``). The cap is deliberately NOT the
    default: above it the result diverges from the SQL oracle
    (recall < 1 inside the capped block), so oracle-checked paths stay
    exact unless a caller opts into the scale cap explicitly."""

    from fluent_server_ray.stages.aggregate import skip_empty

    @skip_empty
    def add_block(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "block": pc.utf8_slice_codeunits(t[text_col], 0, prefix_len),
                id_col: t[id_col],
                text_col: t[text_col],
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # blocks co-locate via hash(block) % n — a native groupby on
        # the raw prefix makes one pandas group per distinct prefix
        # (O(docs) dispatch). The verification loop itself is the
        # oracle-exact per-pair scan either way; singleton blocks drop
        # vectorized first.
        size = g.groupby("block", sort=False)[text_col].transform("size")
        g = g[size > 1]
        a_out, b_out = [], []
        for _, sub in g.groupby("block", sort=False):
            sub = sub.sort_values(id_col)
            ids = sub[id_col].to_numpy()
            txts = sub[text_col].to_numpy()
            if max_block is not None and len(sub) > max_block:
                rep_id, rep_txt = ids[0], txts[0]
                for j in range(1, len(sub)):
                    if _charset_jaccard(rep_txt, txts[j]) >= threshold:
                        a_out.append(rep_id)
                        b_out.append(ids[j])
            else:
                for i in range(len(sub)):
                    for j in range(i + 1, len(sub)):
                        if _charset_jaccard(txts[i], txts[j]) >= threshold:
                            a_out.append(ids[i])
                            b_out.append(ids[j])
        return pd.DataFrame(
            {"doc_a": np.asarray(a_out, dtype=np.int64),
             "doc_b": np.asarray(b_out, dtype=np.int64)}
        )

    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.groups import map_buckets

    blocked = ds.map_batches(add_block, batch_format="pyarrow",
                             zero_copy_batch=True)
    bucketed = _with_bucket(blocked, "block", 256)
    return map_buckets(bucketed, per_bucket, _PAIR_SCHEMA, key="_bucket")


def prefix_block_dupes_sql(
    prefix_len: int = 12, threshold: float = 0.9, table: str = "documents"
) -> str:
    return f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM {table} a JOIN {table} b
  ON substr(a.text, 1, {prefix_len}) = substr(b.text, 1, {prefix_len})
 AND a.doc_id < b.doc_id
WHERE jaccard(a.text, b.text) >= {threshold}
""".strip()


# ------------------------------------------------------- MinHash + LSH

def _minhash_params(num_perm: int, seed: int = 7):
    """Multiply-add permutation family over Z_2^64 (odd multipliers →
    bijective; natural uint64 wraparound replaces the classic Mersenne
    modulo — measured 3-5× cheaper per element, and min-stability only
    needs the family to be permutation-like, which odd-multiplier
    affine maps are)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, np.iinfo(np.uint64).max, size=num_perm,
                     dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, np.iinfo(np.uint64).max, size=num_perm,
                     dtype=np.uint64)
    return a, b


# rolling-shingle mix constants (odd → bijective per factor)
_SH_C = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F),
         np.uint64(0x165667B19E3779F9), np.uint64(0x27D4EB2F165667C5),
         np.uint64(0x85EBCA77C2B2AE63))


def _batch_shingle_hashes(texts: list, k: int = 3):
    """Numeric k-word-shingle hashes for a whole batch in vector ops.

    Each word is hashed ONCE (one ``pd.util.hash_array`` over the
    batch's flattened token array — the former per-doc string-join +
    string-hash of full shingles was the signature stage's hot spot),
    then shingle hashes are the position-weighted mix
    ``sum_j C_j * wordhash[i+j] (mod 2^64)`` computed as k shifted
    vector ops over the flat array. Duplicates are NOT removed: a
    min over a multiset equals the min over its set, so signatures are
    unchanged by repeats and the per-doc dedup pass is skipped.

    Returns ``(H, lengths)``: the concatenated per-doc shingle-hash
    array and per-doc lengths (docs with < k words fall back to their
    word hashes; empty docs contribute a single 0).
    """
    n = len(texts)
    toks = [(t or "").split() for t in texts]
    lens = np.fromiter((len(w) for w in toks), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(n, dtype=np.uint64), np.ones(n, dtype=np.int64)
    flat = np.empty(total, dtype=object)
    pos = 0
    for w in toks:
        if w:
            flat[pos:pos + len(w)] = w
            pos += len(w)
    wh = pd.util.hash_array(flat).astype(np.uint64)
    if k > 1 and total >= k:
        comb = wh[: total - k + 1] * _SH_C[0]
        for j in range(1, k):
            comb = comb + wh[j: total - k + 1 + j] * _SH_C[j]
    else:
        comb = wh * _SH_C[0]
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    out_parts = []
    out_lens = np.empty(n, dtype=np.int64)
    for i in range(n):
        s, l = starts[i], lens[i]
        if l >= k:
            part = comb[s: s + l - k + 1]
        elif l > 0:  # short doc: word hashes (matches the old fallback
            part = wh[s: s + l] * _SH_C[0]  # shape: unigram "shingles")
        else:
            part = np.zeros(1, dtype=np.uint64)
        out_parts.append(part)
        out_lens[i] = len(part)
    return np.concatenate(out_parts), out_lens


_MD5_TOKEN_CACHE: dict = {}


def _word_hashes(text: str) -> np.ndarray:
    """md5-derived 64-bit word hashes: first 8 digest bytes,
    LITTLE-endian — bit-identical to DuckDB ``md5_number_upper(tok)``,
    which is what makes the simhash signature STRICTLY
    oracle-checkable (pandas ``hash_array``, the previous family, has
    no SQL form). Per-worker token cache (bounded) amortizes the
    digest over the corpus vocabulary; empty text hashes to ``[0]``
    (signature 0 — the mirror's LEFT-JOIN COALESCE rule)."""
    from fluent_server_ray.functions.hashing import md5_u64

    toks = list(dict.fromkeys(text.split()))  # unique words
    if not toks:
        return np.array([0], dtype=np.uint64)
    cache = _MD5_TOKEN_CACHE
    vals = []
    for t in toks:
        v = cache.get(t)
        if v is None:
            v = md5_u64(t)
            if len(cache) < (1 << 20):  # bound per-worker memory
                cache[t] = v
        vals.append(v)
    return np.array(vals, dtype=np.uint64)


def shingle_set(text: str, k: int = 3) -> set:
    toks = text.split()
    if len(toks) < k:
        return set(toks)
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


class MinHashStage:
    """Per-batch minhash signatures + LSH band keys (callable class so
    the permutation parameters are built once per worker)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, seed: int = 7,
                 shingle_k: int = 3):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.a, self.b = _minhash_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        h, _ = _batch_shingle_hashes([text], self.shingle_k)
        # (n_shingles, num_perm) permuted hashes → column-min
        # (uint64 wraparound IS the mod-2^64 of the affine family)
        ph = h[:, None] * self.a[None, :] + self.b[None, :]
        return ph.min(axis=0)

    def sigs_batch(self, batch: pa.Table):
        """(ids int64 (n,), signatures uint64 (n, num_perm)) for a
        batch — batch-vectorized end to end: word hashes via ONE
        ``hash_array`` over the batch's flat token array, numeric
        rolling shingle mixes (:func:`_batch_shingle_hashes`), the
        permutation family as a single multiply-add over Z_2^64, and
        per-doc column-mins from one ``np.minimum.reduceat`` over the
        doc boundaries — identical values to the per-doc
        ``signature()`` (min is associative; the wraparound arithmetic
        is elementwise), pinned by a parity test."""
        n = len(batch)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        H, lengths = _batch_shingle_hashes(texts, self.shingle_k)
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        # one permutation at a time over the 1-D flat array: the
        # (total_shingles × num_perm) matrix form strides terribly in
        # reduceat (measured 75× slower) — this loop is 64 cache-warm
        # vector passes with one reused buffer
        sigs_t = np.empty((self.num_perm, n), dtype=np.uint64)
        buf = np.empty_like(H)
        for j in range(self.num_perm):
            np.multiply(H, self.a[j], out=buf)
            np.add(buf, self.b[j], out=buf)
            sigs_t[j] = np.minimum.reduceat(buf, starts)
        return ids, sigs_t.T  # (n, num_perm)

    def band_hashes(self, sigs: np.ndarray) -> np.ndarray:
        """(n, bands) int64 band keys from (n, num_perm) signatures
        (XOR fold per band, masked non-negative)."""
        n = sigs.shape[0]
        folded = np.bitwise_xor.reduce(
            sigs.reshape(n, self.bands, self.rows_per_band).astype(np.uint64),
            axis=2,
        ) & np.uint64(0x7FFFFFFFFFFFFFFF)  # (n, bands)
        return folded.astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Explode each doc into `bands` rows: (band_id, band_hash,
        doc_id) — :meth:`sigs_batch` + :meth:`band_hashes`."""
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "band_id": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                }
            )
        ids, sigs = self.sigs_batch(batch)
        folded = self.band_hashes(sigs)
        return pa.table(
            {
                "band_id": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n)
                ),
                "band_hash": pa.array(folded.reshape(-1)),
                "doc_id": pa.array(np.repeat(ids, self.bands)),
            }
        )


def minhash_lsh_candidates(ds, num_perm: int = 64, bands: int = 16,
                           max_bucket: int = 256, n_buckets: int = 256):
    """Candidate near-dup pairs via banded MinHash LSH. One shuffle on
    ``band_hash % n_buckets`` (band_hash is already uniform — it IS a
    hash — so the exchange key is a bounded small int, never one Ray
    group per band value: a native groupby on (band_id, band_hash)
    makes ~bands×docs singleton pandas groups and its per-group
    dispatch dominates the whole dedup wall). Inside a bucket the pair
    explosion is fully vectorized: drop singleton bands with one
    ``transform('size')``, form pairs for surviving SMALL bands with
    one self-merge (C kernels over every band in the bucket at once).

    ``max_bucket`` bounds the O(n^2) per-band pair explosion: a band
    group larger than this (a degenerate hash collision or a corpus
    of near-identical docs) emits only each member paired with the
    group's min-id representative — candidates stay connected through
    the representative while work stays O(n) for the pathological
    group (the skew-cap pattern; same spirit as salting hot keys)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        bh = t["band_hash"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_bucket", pa.array((bh % n_buckets).astype(np.int64))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        key = ["band_id", "band_hash"]
        g = g.drop_duplicates(key + ["doc_id"])
        size = g.groupby(key)["doc_id"].transform("size")
        g = g[size > 1]
        empty = pd.DataFrame(
            {"doc_a": np.asarray([], dtype=np.int64),
             "doc_b": np.asarray([], dtype=np.int64)}
        )
        if not len(g):
            return empty
        size = g.groupby(key)["doc_id"].transform("size")
        outs = []
        small = g[size <= max_bucket]
        if len(small):
            m = small.merge(small, on=key)
            m = m[m["doc_id_x"] < m["doc_id_y"]]
            outs.append(pd.DataFrame(
                {"doc_a": m["doc_id_x"].to_numpy(np.int64),
                 "doc_b": m["doc_id_y"].to_numpy(np.int64)}
            ))
        big = g[size > max_bucket]
        if len(big):
            rep = big.groupby(key)["doc_id"].transform("min").to_numpy(
                np.int64
            )
            ids = big["doc_id"].to_numpy(np.int64)
            mask = ids != rep
            outs.append(pd.DataFrame(
                {"doc_a": rep[mask], "doc_b": ids[mask]}
            ))
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.enrich import pool_limits

    sig = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_limits(),  # signature pass scales with cpus
    )
    from fluent_server_ray.stages.groups import map_buckets

    bucketed = sig.map_batches(skip_empty(add_bucket),
                               batch_format="pyarrow", zero_copy_batch=True)
    return map_buckets(bucketed, per_bucket, _PAIR_SCHEMA, key="_bucket")


def _empty_pairs_ds(with_jaccard: bool = False,
                    cols: tuple[str, str] = ("doc_a", "doc_b")):
    """Typed zero-row pair Dataset — the shared zero-duplicates result
    shape (typed so downstream ``select_columns``/``to_pandas`` see the
    contract columns even with no blocks)."""
    import ray.data as rd

    a_col, b_col = cols
    fields = {a_col: pa.array([], type=pa.int64()),
              b_col: pa.array([], type=pa.int64())}
    if with_jaccard:
        fields["jaccard"] = pa.array([], type=pa.float64())
    return rd.from_arrow(pa.table(fields))


def distinct_pairs(pairs_ds, n_buckets: int = 256,
                   cols: tuple[str, str] = ("doc_a", "doc_b"),
                   extra_fields: tuple = ()):
    """Distributed DISTINCT over id-pair rows: one groupby on
    ``siphash(first col) % n_buckets`` (balanced small-int key), each
    bucket deduped with one vectorized ``drop_duplicates`` — never one
    group per pair, never a driver materialization. Columns beyond the
    pair key (e.g. a verified similarity score — identical across
    duplicate discoveries of one pair, so any surviving copy is the
    same) are carried through; callers DECLARE them via
    ``extra_fields`` ((name, arrow type) tuples) so every output block
    — including empty sort partitions — keeps one pinned schema
    (``map_buckets``), killing the empty-schema RefBundle warnings."""
    from fluent_server_ray.stages.aggregate import hash_bucket_array, skip_empty
    from fluent_server_ray.stages.groups import map_buckets

    a_col, b_col = cols
    out_schema = pa.schema(
        [pa.field(a_col, pa.int64()), pa.field(b_col, pa.int64())]
        + [pa.field(n, t) for n, t in extra_fields])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_pbucket", pa.array(hash_bucket_array(t[a_col], n_buckets))
        )

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates([a_col, b_col])

    return map_buckets(
        pairs_ds.map_batches(skip_empty(add_bucket),
                             batch_format="pyarrow",
                             zero_copy_batch=True),
        bucket_distinct, out_schema, key="_pbucket")


def minhash_near_dupes(ds, threshold: float = 0.8, num_perm: int = 64,
                       bands: int = 16, max_bucket: int = 256,
                       shingle_k: int = 3, n_buckets: int = 64,
                       broadcast_bytes: int = 256 << 20):
    """MinHash+LSH near-dup pairs with IN-CLUSTER verification — the
    100 TB shape (the CORPUS never materializes on the driver):

    1. banded-LSH candidate pairs (one shuffle on the band key,
       oversized buckets capped — :func:`minhash_lsh_candidates`);
    2. the distinct candidate id set (ints, O(near-dup docs))
       broadcasts via ``ray.put``; the docs table streams through one
       vectorized ``is_in`` filter → candidate texts only. (If even the
       id set outgrew the driver, the mergeable ``sketches.BloomFilter``
       slots in — false positives drop out in the join/verify.)
    3. size-adaptive verification, equality of both paths pinned:
       - candidate texts ≤ ``broadcast_bytes``: texts broadcast once
         (``ray.put``), pairs verified with true shingle-set Jaccard
         inside parallel ``map_batches`` over the pair rows — zero
         extra shuffles;
       - larger: distributed DISTINCT of the pair rows
         (:func:`distinct_pairs`), then two bucketed hash joins attach
         text_a / text_b (pair rows + candidate texts shuffle; the
         corpus does not) and the same verify runs per bucket.

    Returns a **Dataset** (doc_a, doc_b, jaccard) — the verified,
    deduped pair set stays in the object store: on a boilerplate-heavy
    crawl the near-dup PAIR SET itself is corpus-scale, so it must
    never concat onto the driver (write it to a sink or reduce it
    downstream; tests compare a sorted ``to_pandas`` at test scale
    only). Row-set equality with the driver-side
    :func:`verify_jaccard_pairs` baseline is pinned in tests.
    """
    import ray

    from fluent_server_ray.stages.aggregate import grouped_counts

    # materialize the small-by-construction candidate pairs: Ray
    # Datasets re-execute their upstream DAG per consumer, and the id
    # extraction + verification both consume this (pinning avoids
    # re-running the corpus-wide signature pass).
    raw_cand = minhash_lsh_candidates(
        ds, num_perm=num_perm, bands=bands, max_bucket=max_bucket
    ).materialize()

    if raw_cand.count() == 0:  # no near-dups — the common corpus case
        return _empty_pairs_ds(with_jaccard=True)

    # distinct candidate ids (small: only docs appearing in some pair)
    def explode_ids(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [t["doc_a"].combine_chunks(), t["doc_b"].combine_chunks()]
        )
        return pa.table({"doc_id": pc.unique(both)})

    ids_tbl = grouped_counts(
        raw_cand.map_batches(explode_ids, batch_format="pyarrow"), ["doc_id"]
    )
    id_arr = ids_tbl["doc_id"].combine_chunks()
    id_ref = ray.put(id_arr)

    def grab_texts(t: pa.Table) -> pa.Table:
        keys = ray.get(id_ref)
        return t.filter(pc.is_in(t["doc_id"], value_set=keys)).select(
            ["doc_id", "text"]
        )

    cand_docs = ds.map_batches(grab_texts, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    def make_verify(text_of):
        """Pair-batch verifier; ``text_of(table) -> (texts_a, texts_b)``."""

        def verify(t: pa.Table) -> pa.Table:
            a_ids = t["doc_a"].to_pylist()
            b_ids = t["doc_b"].to_pylist()
            texts_a, texts_b = text_of(t)
            keep_a, keep_b, sims = [], [], []
            seen: set = set()
            cache: dict = {}

            def sset(doc_id, text):
                if doc_id not in cache:
                    cache[doc_id] = shingle_set(str(text), shingle_k)
                return cache[doc_id]

            for a, b, ta, tb in zip(a_ids, b_ids, texts_a, texts_b):
                if (a, b) in seen:  # band-duplicate within this batch
                    continue
                seen.add((a, b))
                sa, sb = sset(a, ta), sset(b, tb)
                sim = len(sa & sb) / max(1, len(sa | sb))
                if sim >= threshold:
                    keep_a.append(a)
                    keep_b.append(b)
                    sims.append(sim)
            return pa.table(
                {
                    "doc_a": pa.array(np.asarray(keep_a, dtype=np.int64)),
                    "doc_b": pa.array(np.asarray(keep_b, dtype=np.int64)),
                    "jaccard": pa.array(np.asarray(sims, dtype=np.float64)),
                }
            )

        return verify

    if cand_docs.size_bytes() <= broadcast_bytes:
        # broadcast path: candidate texts ship once; the raw pair rows
        # stream straight into verification (cross-batch band dupes are
        # dropped in the final result-sized dedup). Texts broadcast as
        # LARGE_STRING: a dup-heavy pair block's take() can gather
        # > 2 GB of text, silently wrapping 32-bit string offsets into
        # garbage (observed as UnicodeDecodeError at 500k-doc scale).
        texts_tbl = pa.concat_tables(
            cand_docs.iter_batches(batch_size=None, batch_format="pyarrow")
        )
        texts_tbl = pa.table({
            "doc_id": texts_tbl["doc_id"],
            "text": texts_tbl["text"].cast(pa.large_string()),
        })
        texts_ref = ray.put(texts_tbl)

        def text_of(t: pa.Table):
            tt = ray.get(texts_ref)
            ids, texts = tt["doc_id"], tt["text"]
            ta = pc.take(texts, pc.index_in(t["doc_a"], value_set=ids))
            tb = pc.take(texts, pc.index_in(t["doc_b"], value_set=ids))
            return ta.to_pylist(), tb.to_pylist()

        verified = raw_cand.map_batches(
            make_verify(text_of), batch_format="pyarrow"
        )
    else:
        from fluent_server_ray.stages.joins import bucketed_hash_join

        cand = distinct_pairs(raw_cand, n_buckets=n_buckets).materialize()

        def rename(cols: dict):
            def fn(t: pa.Table) -> pa.Table:
                return pa.table({new: t[old] for old, new in cols.items()})

            return fn

        docs_a = cand_docs.map_batches(
            rename({"doc_id": "doc_a", "text": "text_a"}),
            batch_format="pyarrow",
        )
        docs_b = cand_docs.map_batches(
            rename({"doc_id": "doc_b", "text": "text_b"}),
            batch_format="pyarrow",
        )
        j1 = bucketed_hash_join(cand, docs_a, key="doc_a",
                                n_buckets=n_buckets).materialize()
        j2 = bucketed_hash_join(j1, docs_b, key="doc_b", n_buckets=n_buckets)

        def text_of(t: pa.Table):
            return t["text_a"].to_pylist(), t["text_b"].to_pylist()

        verified = j2.map_batches(make_verify(text_of), batch_format="pyarrow")

    # distributed distinct (cross-batch band duplicates); materialize so
    # the count() guard doesn't force a re-execution for the caller —
    # pair blocks pin in the OBJECT STORE, never on the driver
    out = distinct_pairs(
        verified, extra_fields=(("jaccard", pa.float64()),)).materialize()
    if out.count() == 0:  # candidates existed but none verified
        return _empty_pairs_ds(with_jaccard=True)
    return out


def verify_jaccard_pairs(cand_df: pd.DataFrame, docs_df: pd.DataFrame,
                         threshold: float = 0.8, shingle_k: int = 3) -> pd.DataFrame:
    """Driver-side verification of candidate pairs with true shingle-set
    Jaccard — the small-data testing baseline that
    :func:`minhash_near_dupes` must reproduce (tests pin equality)."""
    texts = docs_df.set_index("doc_id")["text"]
    uniq = cand_df.drop_duplicates(["doc_a", "doc_b"])
    cache: dict = {}

    def sset(d):
        if d not in cache:
            cache[d] = shingle_set(str(texts[d]), shingle_k)
        return cache[d]

    keep_a, keep_b, sims = [], [], []
    for a, b in zip(uniq["doc_a"], uniq["doc_b"]):
        sa, sb = sset(a), sset(b)
        sim = len(sa & sb) / max(1, len(sa | sb))
        if sim >= threshold:
            keep_a.append(a)
            keep_b.append(b)
            sims.append(sim)
    return pd.DataFrame({"doc_a": keep_a, "doc_b": keep_b, "jaccard": sims})


# ------------------------------------------------------------- SimHash

def simhash_batch(batch: pa.Table) -> np.ndarray:
    """64-bit simhash per doc (vectorized bit-vote over word hashes);
    returns an int64 array aligned with the batch rows."""
    texts = batch["text"].to_pylist()
    out = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        h = _word_hashes(text or "")
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
        # signed! a uint64 vote count would wrap negatives to huge
        # positives and set nearly every bit
        votes = bits.sum(axis=0).astype(np.int64) * 2 - len(h)  # >0 → bit set
        sim = np.uint64(0)
        for bit_idx in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(bit_idx)
        out[i] = np.int64(sim & np.uint64(0x7FFFFFFFFFFFFFFF))
    return out


def simhash_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`simhash_batch`, bit-for-bit: DISTINCT
    whitespace tokens per doc → ``md5_number_upper`` (== the engine's
    first-8-digest-bytes little-endian word hash) → per-bit signed
    vote ``2·ones − n > 0`` over bits 0..62 (the engine masks bit 63
    off the final signature, so it never needs voting) → bit sum.
    Docs with no tokens (empty text) get signature 0 via the LEFT
    JOIN, matching the engine's ``[0]`` hash rule (vote −1 ⇒ all bits
    clear). ``AS MATERIALIZED`` pins the token scan to one
    evaluation under the 63-way bit cross join."""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT DISTINCT doc_id,
    unnest(list_filter(regexp_split_to_array(text, '{_PY_WHITESPACE_RE2}'),
                       x -> x <> '')) AS tok
  FROM {table}
), hashed AS MATERIALIZED (
  SELECT doc_id, md5_number_upper(tok) AS h FROM toks
), votes AS (
  SELECT doc_id, b.b AS bit,
    2 * sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE 0 END)
      - count(*) AS vote
  FROM hashed, generate_series(0, 62) AS b(b)
  GROUP BY doc_id, b.b
), sigs AS (
  SELECT doc_id,
    sum(CASE WHEN vote > 0
        THEN CAST(CAST(1 AS UBIGINT) << bit AS HUGEINT) ELSE 0 END)
      AS sim
  FROM votes GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(s.sim, 0) AS BIGINT) AS simhash
FROM (SELECT DISTINCT doc_id FROM {table}) d
LEFT JOIN sigs s USING (doc_id)
ORDER BY doc_id
""".strip()


def simhash_pairs_sql(max_hamming: int = 3,
                      table: str = "documents") -> str:
    """Exact all-pairs hamming mirror for :func:`simhash_near_dupes`:
    equality holds whenever ``max_hamming < n_blocks`` (pigeonhole
    recall 1) and no degenerate signature group exceeds the
    ``max_group`` fallback cap — true by construction on the test
    corpora (the fallback only triggers on thousands of identical
    signatures)."""
    return f"""
WITH s AS MATERIALIZED ({simhash_sql(table)})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(CAST(a.simhash AS UBIGINT),
                    CAST(b.simhash AS UBIGINT))) <= {int(max_hamming)}
ORDER BY doc_a, doc_b
""".strip()


class SimHashStage:
    """64-bit simhash per doc (see :func:`simhash_batch`)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(simhash_batch(batch))}
        )


def simhash_signatures(ds):
    from fluent_server_ray.stages.enrich import pool_limits

    return ds.map_batches(
        SimHashStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=pool_limits(),  # per-doc signature pass scales with cpus
    )


def simhash_near_dupes(ds, max_hamming: int = 3, n_blocks: int = 4,
                       n_buckets: int = 64, max_group: int = 4096):
    """SimHash near-dup pairs: all (doc_a, doc_b) whose 64-bit simhashes
    differ in at most ``max_hamming`` bits.

    The pigeonhole blocking standard for hamming search: split the
    signature into ``n_blocks`` contiguous blocks — two signatures
    within hamming distance d < n_blocks MUST agree exactly on at
    least one block — so grouping by ``(block_id, block_value)`` and
    pairing within groups has recall 1 for d ≤ n_blocks - 1. Pairs are
    verified exactly (popcount of the XOR) inside the group, then
    deduped across blocks with the distributed distinct. One shuffle of
    ``n_blocks`` small-int rows per doc; the corpus text never moves.
    Returns a **Dataset** (doc_a, doc_b) — the pair set stays in the
    object store (corpus-scale on boilerplate-heavy corpora).

    Requires ``max_hamming < n_blocks`` (else recall < 1 — asserted).
    Groups above ``max_group`` (a degenerate signature collision —
    thousands of empty/boilerplate docs) fall back to min-id
    representative pairing: O(n) instead of an n×n XOR matrix.
    """
    assert max_hamming < n_blocks, "pigeonhole needs d < n_blocks"
    assert 64 % n_blocks == 0
    width = 64 // n_blocks

    def explode_blocks(t: pa.Table) -> pa.Table:
        sigs = simhash_batch(t)
        n = len(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = sigs.astype(np.uint64)
        mask = np.uint64((1 << width) - 1)
        blocks = np.stack(
            [(u >> np.uint64(bi * width)) & mask for bi in range(n_blocks)],
            axis=1,
        )  # (n, n_blocks)
        return pa.table(
            {
                "block_id": pa.array(
                    np.tile(np.arange(n_blocks, dtype=np.int32), n)
                ),
                "block_val": pa.array(blocks.reshape(-1).astype(np.int64)),
                "doc_id": pa.array(np.repeat(ids, n_blocks)),
                "simhash": pa.array(np.repeat(sigs, n_blocks)),
            }
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        bv = t["block_val"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_bucket", pa.array((bv % 256).astype(np.int64))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized over every (block_id, block_val) group in the
        bucket at once: singleton groups drop with one
        ``transform('size')``; surviving SMALL groups pair via one
        self-merge + one flat popcount pass; groups over ``max_group``
        take the skew cap (cf. minhash max_bucket, prefix max_block —
        each member vs the min-id representative only: O(n), connected
        through the representative; recall<1 only for such degenerate
        groups). A native groupby on (block_id, block_val) would make
        one pandas group per block value — per-group dispatch dominates
        at corpus scale."""
        key = ["block_id", "block_val"]
        g = g.drop_duplicates(key + ["doc_id"])
        size = g.groupby(key)["doc_id"].transform("size")
        g = g[size > 1]
        empty = pd.DataFrame(
            {"doc_a": np.asarray([], dtype=np.int64),
             "doc_b": np.asarray([], dtype=np.int64)}
        )
        if not len(g):
            return empty
        size = g.groupby(key)["doc_id"].transform("size")
        outs = []
        small = g[size <= max_group]
        if len(small):
            m = small.merge(small, on=key)
            m = m[m["doc_id_x"] < m["doc_id_y"]]
            if len(m):
                x = (m["simhash_x"].to_numpy(np.int64).astype(np.uint64)
                     ^ m["simhash_y"].to_numpy(np.int64).astype(np.uint64))
                keep = _hamming64(x) <= max_hamming
                outs.append(pd.DataFrame(
                    {"doc_a": m["doc_id_x"].to_numpy(np.int64)[keep],
                     "doc_b": m["doc_id_y"].to_numpy(np.int64)[keep]}
                ))
        big = g[size > max_group]
        if len(big):
            reps = (big.sort_values("doc_id")
                    .groupby(key, as_index=False).first()
                    [key + ["doc_id", "simhash"]]
                    .rename(columns={"doc_id": "rep_id",
                                     "simhash": "rep_sig"}))
            m = big.merge(reps, on=key)
            m = m[m["doc_id"] != m["rep_id"]]
            if len(m):
                x = (m["simhash"].to_numpy(np.int64).astype(np.uint64)
                     ^ m["rep_sig"].to_numpy(np.int64).astype(np.uint64))
                keep = _hamming64(x) <= max_hamming
                ids = m["doc_id"].to_numpy(np.int64)[keep]
                rep = m["rep_id"].to_numpy(np.int64)[keep]
                outs.append(pd.DataFrame(
                    {"doc_a": np.minimum(rep, ids),
                     "doc_b": np.maximum(rep, ids)}
                ))
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    from fluent_server_ray.stages.aggregate import skip_empty

    from fluent_server_ray.stages.groups import map_buckets

    cand = map_buckets(
        ds.map_batches(explode_blocks, batch_format="pyarrow",
                       zero_copy_batch=True)
        .map_batches(skip_empty(add_bucket), batch_format="pyarrow",
                     zero_copy_batch=True),
        per_bucket, _PAIR_SCHEMA, key="_bucket")
    out = distinct_pairs(cand, n_buckets=n_buckets).materialize()
    if out.count() == 0:  # no pair within the radius — the common case
        return _empty_pairs_ds()
    return out


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _hamming64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (byte-table lookup) over an XOR array."""
    ham = np.zeros(x.shape, dtype=np.int64)
    for shift in range(0, 64, 8):
        ham += _POPCOUNT8[
            ((x >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.int64)
        ]
    return ham


# ------------------------------------------- exact n-gram Jaccard

def ngram_jaccard_dupes(ds, threshold: float = 0.8, shingle_k: int = 3,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_parts: int = 8, max_docs: int = 1_000_000):
    """EXACT all-pairs k-word-shingle Jaccard near-dup pairs (a < b).

    Exact set-similarity semantics require every pair examined — O(n²)
    by definition. This is the verification-pool operator (bounded
    corpora: post-clustering pools, candidate audits); open-corpus
    near-dedup belongs to :func:`minhash_near_dupes`. Distribution is
    the block-cross-product: each doc's distinct shingle-hash set is
    computed once in a vectorized pass and materialized as Arrow block
    refs (never concatenated on the driver); one Ray task per unordered
    block pair compares its two blocks — P·(P+1)/2 independent tasks,
    the shape the Dataset API cannot express (a self cross join), so
    this is one of the few sanctioned raw-``ray.remote`` stages. The
    per-task pair tables re-enter Ray Data via ``from_arrow_refs`` —
    the result is a **Dataset** whose blocks stay in the object store
    (the driver never concatenates the pair set).

    Sets compare by 64-bit hashes of the shingles (the vectorized
    rolling mix of :func:`_batch_shingle_hashes` — one ``hash_array``
    over the batch's flat token array, no per-doc string-join loop): a
    hash collision could perturb a Jaccard value by ~|union|/2^64 —
    below any realistic threshold granularity.

    ``max_docs`` is the bounded-pool contract made loud: the task
    fan-out AND total work are O(n²), so pointing this at an open
    corpus is a mistake — that's :func:`minhash_near_dupes`'s job.
    """
    import ray

    if not (0.0 < threshold <= 1.0):
        raise ValueError(
            "ngram_jaccard_dupes requires 0 < threshold <= 1 (the "
            "vectorized intersection join only surfaces pairs sharing "
            ">= 1 shingle; threshold 0 would also demand disjoint pairs)")

    def shingle_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t[text_col].to_pylist()
        H, lens = _batch_shingle_hashes(texts, shingle_k)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        hsets = []
        for i in range(len(ids)):
            # empty doc → empty set (union-0 pairs excluded, matching
            # SQL NULL); _batch_shingle_hashes pads empties with one 0
            if not (texts[i] or "").strip():
                hsets.append(np.asarray([], dtype=np.uint64))
            else:  # unique → sorted (np.unique sorts), dupes dropped
                hsets.append(np.unique(H[starts[i]: starts[i] + lens[i]]))
        return pa.table(
            {
                id_col: pa.array(ids),
                "sh": pa.array([h.astype(np.int64) for h in hsets],
                               type=pa.list_(pa.int64())),
            }
        )

    # n_parts bounds both per-task memory (two parts' shingle sets) and
    # task count (P(P+1)/2): size it so a part fits a worker heap; more
    # parts = more parallelism but re-unpacks each part more often.
    sh = ds.map_batches(shingle_rows, batch_format="pyarrow",
                        zero_copy_batch=True).repartition(n_parts).materialize()
    n_docs = sh.count()
    if n_docs > max_docs:
        raise ValueError(
            f"ngram_jaccard_dupes is the EXACT all-pairs verifier "
            f"(O(n²)); got {n_docs} docs > max_docs={max_docs}. For "
            f"open corpora use minhash_near_dupes (bounded LSH "
            f"exchange) and verify candidates, or raise max_docs "
            f"knowingly.")
    refs = sh.to_arrow_refs()

    @ray.remote
    def block_pair(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        def unpack(t):
            # a repartition of a tiny input can emit schema-less empty
            # blocks — treat them as zero docs
            if t.num_rows == 0 or id_col not in t.column_names:
                return (np.asarray([], dtype=np.int64),
                        np.asarray([], dtype=np.int64),
                        np.asarray([], dtype=np.int64))
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            sh_col = t["sh"]
            if isinstance(sh_col, pa.ChunkedArray):
                sh_col = sh_col.combine_chunks()
            flat = pc.list_flatten(sh_col).to_numpy(zero_copy_only=False)
            lens = pc.list_value_length(sh_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            return ids, flat.astype(np.int64), lens

        ia, fa, la = unpack(ta)
        ib, fb, lb = unpack(tb)
        empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                          "doc_b": pa.array([], type=pa.int64())})
        if len(fa) == 0 or len(fb) == 0:
            return empty
        # vectorized all-pairs intersection: hash-join the two flat
        # (doc_idx, shingle) postings on the shingle value — per-doc
        # sets are unique, so each (x, y, shingle) match is one row and
        # the per-(x, y) row count IS |sa ∩ sb|. No per-pair Python.
        xa = np.repeat(np.arange(len(ia), dtype=np.int64), la)
        yb = np.repeat(np.arange(len(ib), dtype=np.int64), lb)
        m = pd.DataFrame({"h": fa, "x": xa}).merge(
            pd.DataFrame({"h": fb, "y": yb}), on="h", sort=False)
        if len(m) == 0:
            return empty
        grp = m.groupby(["x", "y"], sort=False).size().reset_index(name="i")
        x = grp["x"].to_numpy()
        y = grp["y"].to_numpy()
        inter = grp["i"].to_numpy().astype(np.float64)
        union = (la[x] + lb[y] - grp["i"].to_numpy()).astype(np.float64)
        keep = inter / union >= threshold
        if same:
            keep &= x < y
        keep &= ia[x] != ib[y]
        aid, bid = ia[x[keep]], ib[y[keep]]
        return pa.table(
            {
                "doc_a": pa.array(np.minimum(aid, bid)),
                "doc_b": pa.array(np.maximum(aid, bid)),
            }
        )

    import ray.data as rd

    futures = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            futures.append(block_pair.remote(refs[i], refs[j], i == j))
    # each doc lives in exactly one part, so a pair is examined by
    # exactly one task — the refs are already distinct; distinct_pairs
    # still runs as a cheap invariant (and normalizes empty blocks)
    pairs = rd.from_arrow_refs(futures)
    out = distinct_pairs(pairs, n_buckets=min(64, n_parts * 8)).materialize()
    if out.count() == 0:
        return _empty_pairs_ds()
    return out


# ------------------------------------------- connected components

def pair_components(pairs_ds, n_buckets: int = 64, max_iters: int = 20,
                    cols: tuple[str, str] = ("doc_a", "doc_b"),
                    driver_max_edges: int = 1 << 20):
    """Connected components over an undirected pair Dataset — the
    near-dup CLUSTERING step (a near-dup relation is not transitive;
    keeping one doc per *component* is the actual corpus-dedup rule,
    cf. MinHash-dedup practice in large-crawl pipelines).

    Algorithm: distributed hash-min label propagation. Every node
    starts labeled with itself; each round, every node takes the min
    label among itself and its neighbors (one bucketed hash join of
    edges against labels + one distributed min-aggregate — both keyed
    shuffles on the SAME hash-bucket primitive). Labels only decrease,
    so the process converges in at most *diameter* rounds — near-dup
    components are LSH cliques or short chains, so 2-4 rounds in
    practice; ``max_iters`` bounds adversarial chains. Convergence is
    detected distributedly AND for free: current-label rows enter the
    min-reduce marked ``_old``, so the same shuffle that computes the
    new minima also emits a per-node changed flag (2 shuffles per
    round, no separate old-vs-new comparison join); a round that
    changes no label ends the loop. If
    ``max_iters`` is exhausted while labels are still moving the
    result would be silently WRONG (an interior node can still carry a
    non-minimal label), so that case RAISES — rerun with a larger
    ``max_iters``.

    Returns a Dataset ``(doc_id, component)`` with ``component`` = min
    doc id of the component, for every doc that appears in some pair
    (singletons are their own trivial component and are omitted —
    union them in from the corpus if needed).

    Scale note (named trade-off): the Dataset formulation re-shuffles
    the EDGE rows through the per-round join (Ray's groupby cannot
    reuse a prior partitioning), so total edge movement is
    O(rounds × |edges|). For the near-dup graphs this operator exists
    for (LSH cliques / short chains, diameter 2-4) that is 2-4 edge
    shuffles — the same order as the pair-generation shuffle itself.
    A deep-diameter graph at corpus scale would instead want edge
    buckets pinned in the object store with per-bucket join tasks
    (raw ``ray.remote`` over ``to_arrow_refs``, the ngram-style
    escape hatch).
    """
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.joins import bucketed_hash_join

    a_col, b_col = cols

    def both_dirs(t: pa.Table) -> pa.Table:
        src = pa.concat_arrays(
            [t[a_col].combine_chunks().cast(pa.int64()),
             t[b_col].combine_chunks().cast(pa.int64())]
        )
        dst = pa.concat_arrays(
            [t[b_col].combine_chunks().cast(pa.int64()),
             t[a_col].combine_chunks().cast(pa.int64())]
        )
        return pa.table({"src": src, "dst": dst})

    edges = pairs_ds.map_batches(skip_empty(both_dirs),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "component": pa.array([], type=pa.int64())})
        )

    # size-adaptive (the minhash-verify pattern): the EDGE set — not
    # the corpus — is already materialized and counted; a bounded pair
    # graph resolves on the driver in pure numpy (each round one
    # minimum.at over the edge arrays — no per-round executor fixed
    # cost), the distributed propagation below is the corpus-scale
    # path. Identical fixpoint by construction: both iterate
    # label[dst] = min(label[dst], label[src]) to convergence.
    if n_edges <= driver_max_edges:
        t = pa.concat_tables(
            edges.iter_batches(batch_size=None, batch_format="pyarrow")
        )
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        nodes = np.unique(src)  # both directions present → all nodes
        si = np.searchsorted(nodes, src)
        di = np.searchsorted(nodes, dst)
        labels = nodes.copy()
        for _ in range(max_iters):
            new = labels.copy()
            np.minimum.at(new, di, labels[si])
            if (new == labels).all():
                break
            labels = new
        else:  # same contract as the distributed path: never return
            # silently-wrong interior labels
            raise RuntimeError(
                f"pair_components did not converge in {max_iters} "
                f"rounds — the pair graph has a longer chain than "
                f"expected; rerun with a larger max_iters"
            )
        return rd.from_arrow(
            pa.table({"doc_id": pa.array(nodes, type=pa.int64()),
                      "component": pa.array(labels, type=pa.int64())})
        )

    def seed(t: pa.Table) -> pa.Table:
        u = pc.unique(t["src"])
        return pa.table({"node": u, "label": u})

    def node_min(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["label"].min()
        return out.astype({"node": "int64", "label": "int64"})

    _NODE_SCHEMA = pa.schema([("node", pa.int64()),
                              ("label", pa.int64())])

    def bucket_reduce(ds, per_bucket, out_schema=_NODE_SCHEMA):
        from fluent_server_ray.stages.aggregate import hash_bucket_array

        def add_b(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_nb", pa.array(hash_bucket_array(t["node"], n_buckets))
            )

        def run(g: pd.DataFrame) -> pd.DataFrame:
            return per_bucket(g.drop(columns=["_nb"]))

        from fluent_server_ray.stages.groups import map_buckets

        return map_buckets(
            ds.map_batches(skip_empty(add_b), batch_format="pyarrow",
                           zero_copy_batch=True),
            run, out_schema, key="_nb")

    # initial labels: one row per distinct node (per-block unique →
    # distributed distinct-min, reusing the same bucketed reduction)
    labels = bucket_reduce(
        edges.map_batches(skip_empty(seed), batch_format="pyarrow",
                          zero_copy_batch=True),
        node_min,
    ).materialize()

    def mark_old(t: pa.Table) -> pa.Table:
        # current-label rows carry a marker so the min-reduce can emit
        # the convergence signal in the SAME shuffle (folding the
        # old-vs-new comparison join away: 2 shuffles/round, not 3)
        return pa.table(
            {"node": t["node"], "label": t["label"],
             "_old": pa.array(np.ones(len(t), dtype=np.int8))}
        )

    def min_with_change(g: pd.DataFrame) -> pd.DataFrame:
        new = g.groupby("node", as_index=False)["label"].min()
        old = g[g["_old"] == 1][["node", "label"]].rename(
            columns={"label": "_lold"}
        )
        m = new.merge(old, on="node", how="left")
        # every node is seeded, so _lold is always present; the fillna
        # is belt-and-braces for a candidate-only node
        chg = (m["label"] < m["_lold"].fillna(np.inf)).to_numpy()
        return pd.DataFrame(
            {"node": m["node"].to_numpy(dtype=np.int64),
             "label": m["label"].to_numpy(dtype=np.int64),
             "_chg": chg.astype(np.int8)}
        )

    for _ in range(max_iters):
        # neighbor labels: edges(src,dst) ⋈ labels(node=src) → (dst, label)
        joined = bucketed_hash_join(edges, labels, key="src",
                                    right_key="node", n_buckets=n_buckets)

        def to_cand(t: pa.Table) -> pa.Table:
            return pa.table(
                {"node": t["dst"], "label": t["label"],
                 "_old": pa.array(np.zeros(len(t), dtype=np.int8))}
            )

        cand = joined.map_batches(skip_empty(to_cand),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)
        marked = labels.map_batches(skip_empty(mark_old),
                                    batch_format="pyarrow",
                                    zero_copy_batch=True)
        merged = bucket_reduce(
            cand.union(marked), min_with_change,
            out_schema=pa.schema([("node", pa.int64()),
                                  ("label", pa.int64()),
                                  ("_chg", pa.int8())])).materialize()

        def changed_rows(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["_chg"], 1))

        n_changed = merged.map_batches(
            skip_empty(changed_rows), batch_format="pyarrow",
            zero_copy_batch=True,
        ).count()

        def strip(t: pa.Table) -> pa.Table:
            return t.select(["node", "label"])

        labels = merged.map_batches(strip, batch_format="pyarrow",
                                    zero_copy_batch=True)
        if n_changed == 0:
            break
    else:  # loop exhausted with labels still moving → labels are wrong
        raise RuntimeError(
            f"pair_components did not converge in {max_iters} rounds "
            f"({n_changed} labels still changing) — the pair graph has "
            "a longer chain than max_iters; rerun with a larger value"
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["node"], "component": t["label"]})

    return labels.map_batches(skip_empty(finish), batch_format="pyarrow",
                              zero_copy_batch=True)


def pair_components_sql(pairs_sql: str) -> str:
    """Recursive-CTE oracle: min-label transitive closure over the
    (exact, SQL-expressible) pair query given by ``pairs_sql`` — the
    same component rule the distributed propagation computes."""
    return f"""
WITH RECURSIVE base AS (
  {pairs_sql}
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM base
  UNION ALL
  SELECT doc_b, doc_a FROM base
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, min(lbl) AS component FROM reach
GROUP BY node ORDER BY doc_id
""".strip()


# Python str.split() splits on UNICODE whitespace; RE2's \s is ASCII
# only. This class enumerates exactly the code points str.isspace()
# accepts (web text carries \xa0 etc.), keeping the mirror byte-exact.
_PY_WHITESPACE_RE2 = (
    r"[\t\n\x0B\x0C\r\x1C-\x1F \x{0085}\x{00A0}\x{1680}"
    r"\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+"
)


def ngram_jaccard_dupes_sql(threshold: float = 0.8, shingle_k: int = 3,
                            table: str = "documents") -> str:
    """DuckDB mirror: same whitespace tokenization as Python
    ``str.split()`` (runs of UNICODE whitespace, ends stripped —
    parity pinned in tests incl. \\xa0), same short-text fallback
    (docs with < k words use their word set)."""
    assert shingle_k == 3, "SQL mirror written for k=3"
    return f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '{_PY_WHITESPACE_RE2}'),
                x -> x <> '') AS w
  FROM {table}
), sh AS (
  SELECT doc_id,
    CASE WHEN len(w) < 3 THEN list_distinct(w)
         ELSE list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) END AS s
  FROM toks
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s)) * 1.0
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {threshold}
ORDER BY doc_a, doc_b
""".strip()


# --------------------------------------------- containment / overlap

def overlap_dupes(ds, min_overlap_millionths: int = 800_000,
                  shingle_k: int = 3, id_col: str = "doc_id",
                  text_col: str = "text", n_buckets: int = 64,
                  max_bucket_pairs: int = 5_000_000,
                  max_driver_pairs: int = 2_000_000):
    """Asymmetric containment near-dup: pairs whose k-shingle OVERLAP
    COEFFICIENT ``|A∩B| / min(|A|,|B|)`` clears a threshold — the
    subsumption detector (a short doc quoted inside a long one scores
    ~1.0 here while its Jaccard ``|A∩B|/|A∪B|`` stays near 0, so
    MinHash/Jaccard dedup structurally cannot find it; cf. Broder 1997
    §2's containment measure, the one resemblance doesn't bound).

    Plan (the Bayardo inverted-index shape of
    :func:`~fluent_server_ray.stages.similarity.tfidf_cosine_pairs`,
    minus weights): per-batch distinct-shingle postings → ONE
    shingle-hash bucket exchange (a shingle's postings never span
    buckets, so df<2 shingles produce no pairs for free) → per-bucket
    triu pair partials (each shared shingle contributes 1) →
    distributed (doc_a, doc_b) intersection merge → two bucketed joins
    attach per-doc DISTINCT-shingle counts. Everything through the
    final filter is int64-exact: ``overlap_millionths =
    1_000_000·inter // min(na, nb)`` — no float in the operator at
    all. Per-bucket candidate volume is capped (raises) —
    :func:`minhash_near_dupes` is the open-corpus path.

    Per-doc sizes count ALL distinct shingles (computed before the
    exchange), so dropping df<2 shingles from the pair stage is
    lossless, not an approximation. Docs with no tokens are excluded
    (their overlap is 0/0). Returns a Dataset (doc_a, doc_b, inter,
    na, nb, overlap_millionths), doc_a < doc_b, sorted.
    """
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import (grouped_agg,
                                                    hash_bucket_array,
                                                    skip_empty)
    from fluent_server_ray.stages.joins import bucketed_hash_join

    def _empty():
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "inter": pa.array([], type=pa.int64()),
            "na": pa.array([], type=pa.int64()),
            "nb": pa.array([], type=pa.int64()),
            "overlap_millionths": pa.array([], type=pa.int64()),
        }))

    def shingle_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t[text_col].to_pylist()
        H, lens = _batch_shingle_hashes(texts, shingle_k)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        hsets = []
        keep = np.ones(len(ids), dtype=bool)
        for i in range(len(ids)):
            if not (texts[i] or "").strip():
                keep[i] = False
                hsets.append(np.asarray([], dtype=np.int64))
            else:
                hsets.append(np.unique(
                    H[starts[i]: starts[i] + lens[i]]).astype(np.int64))
        return pa.table({
            id_col: pa.array(ids),
            "sh": pa.array(hsets, type=pa.list_(pa.int64())),
        }).filter(pa.array(keep))

    sh_ds = ds.map_batches(skip_empty(shingle_rows), batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    def sizes_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "d": t[id_col],
            "n_sh": pc.cast(pc.list_value_length(t["sh"]), pa.int64()),
        })

    sizes = sh_ds.map_batches(sizes_rows, batch_format="pyarrow",
                              zero_copy_batch=True)

    def postings(t: pa.Table) -> pa.Table:
        sh = t["sh"]
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        lens = pc.list_value_length(sh).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(sh)
        out = pa.table({"d": pa.array(np.repeat(ids, lens)), "sh": flat})
        return out.append_column(
            "_b", pa.array(hash_bucket_array(out["sh"], n_buckets)))

    _EMPTY_PART = {"doc_a": np.asarray([], dtype=np.int64),
                   "doc_b": np.asarray([], dtype=np.int64),
                   "inter": np.asarray([], dtype=np.int64)}

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # postings are distinct per (doc, shingle) and d sorts ascending
        # within a shingle run, so triu indices emit doc_a < doc_b
        g = g.sort_values(["sh", "d"], kind="mergesort").reset_index(drop=True)
        codes, _ = pd.factorize(g["sh"], sort=False)
        n = len(g)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        csizes = np.diff(np.r_[starts, n]).astype(np.int64)
        total = int((csizes * (csizes - 1) // 2).sum())
        if total == 0:
            return pd.DataFrame(_EMPTY_PART)
        if total > max_bucket_pairs:
            raise ValueError(
                f"overlap_dupes: bucket generates {total} candidate "
                f"pairs > max_bucket_pairs={max_bucket_pairs} — a "
                f"stop-shingle is exploding the index; use "
                f"minhash_near_dupes for open corpora")
        d = g["d"].to_numpy(dtype="int64")
        ai = np.empty(total, np.int64)
        bi = np.empty(total, np.int64)
        pos = 0
        for s, c in zip(starts, csizes):
            if c < 2:
                continue
            ii, jj = np.triu_indices(int(c), 1)
            m = len(ii)
            ai[pos:pos + m] = d[s + ii]
            bi[pos:pos + m] = d[s + jj]
            pos += m
        out = (pd.DataFrame({"doc_a": ai, "doc_b": bi})
               .groupby(["doc_a", "doc_b"], sort=False)
               .size().reset_index(name="inter"))
        return out.astype({"inter": "int64"})

    from fluent_server_ray.stages.groups import map_buckets

    posted = sh_ds.map_batches(skip_empty(postings), batch_format="pyarrow",
                               zero_copy_batch=True)
    parts = map_buckets(
        posted, per_bucket,
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                   ("inter", pa.int64())]), key="_b").materialize()

    # size-adaptive continuation (the PMI / cosine-pairs pattern):
    # partials are result-sized — when they fit the driver, one Arrow
    # merge + a broadcast-filtered size lookup replace the distributed
    # merge, two bucketed joins and the final sort. Pure-int math on
    # both paths, so results are identical by construction.
    if parts.count() <= max_driver_pairs:
        import ray

        tabs = list(parts.iter_batches(batch_size=None,
                                       batch_format="pyarrow"))
        if not tabs:
            return _empty()
        tot = (pa.concat_tables(tabs).group_by(["doc_a", "doc_b"])
               .aggregate([("inter", "sum")]))
        if tot.num_rows == 0:
            return _empty()
        ids = pc.unique(pa.concat_arrays([
            tot["doc_a"].combine_chunks().cast(pa.int64()),
            tot["doc_b"].combine_chunks().cast(pa.int64())]))
        ids_ref = ray.put(ids)

        def filt(t: pa.Table) -> pa.Table:
            want = ray.get(ids_ref)
            return t.filter(pc.is_valid(pc.index_in(t["d"],
                                                    value_set=want)))

        ntabs = list(
            sizes.map_batches(skip_empty(filt), batch_format="pyarrow",
                              zero_copy_batch=True)
            .iter_batches(batch_size=None, batch_format="pyarrow"))
        ntab = pa.concat_tables(ntabs)
        nd = ntab["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn = ntab["n_sh"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(nd, kind="stable")
        nd, nn = nd[order], nn[order]
        da = tot["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = tot["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        it = tot["inter_sum"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        na = nn[np.searchsorted(nd, da)]
        nb = nn[np.searchsorted(nd, db)]
        ov = 1_000_000 * it // np.minimum(na, nb)
        m = ov >= min_overlap_millionths
        if not m.any():
            return _empty()
        out = pd.DataFrame({"doc_a": da[m], "doc_b": db[m],
                            "inter": it[m], "na": na[m], "nb": nb[m],
                            "overlap_millionths": ov[m]})
        out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        return rd.from_arrow(pa.Table.from_pandas(out,
                                                  preserve_index=False))

    inter = grouped_agg(parts, keys=["doc_a", "doc_b"],
                        aggs=[("inter", "sum")], final="ray").materialize()
    if inter.count() == 0:  # no pair shares a shingle — typed empty
        return _empty()

    def rn_a(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_a", "na"])

    def rn_b(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_b", "nb"])

    j = bucketed_hash_join(
        inter, sizes.map_batches(rn_a, batch_format="pyarrow",
                                 zero_copy_batch=True),
        key="doc_a", n_buckets=n_buckets)
    j = bucketed_hash_join(
        j, sizes.map_batches(rn_b, batch_format="pyarrow",
                             zero_copy_batch=True),
        key="doc_b", n_buckets=n_buckets)

    def finish(t: pa.Table) -> pa.Table:
        it = t["inter_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        # join fill-side ints ride as float64 (NaN-capable); every pair
        # doc exists in sizes, so the cast back is exact
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
        ov = 1_000_000 * it // np.minimum(na, nb)
        out = pa.table({
            "doc_a": pc.cast(t["doc_a"], pa.int64()),
            "doc_b": pc.cast(t["doc_b"], pa.int64()),
            "inter": pa.array(it),
            "na": pa.array(na),
            "nb": pa.array(nb),
            "overlap_millionths": pa.array(ov),
        })
        return out.filter(pc.greater_equal(
            out["overlap_millionths"],
            pa.scalar(min_overlap_millionths, pa.int64())))

    out = (j.map_batches(skip_empty(finish), batch_format="pyarrow",
                         zero_copy_batch=True)
           .sort(["doc_a", "doc_b"]).materialize())
    # 0-row Datasets lose their schema through to_pandas (NOTES
    # gotcha) — hand back the typed empty instead
    return out if out.count() else _empty()


def overlap_dupes_sql(min_overlap_millionths: int = 800_000,
                      shingle_k: int = 3,
                      table: str = "documents") -> str:
    """DuckDB mirror of :func:`overlap_dupes` — exact all-pairs
    overlap coefficient in integer millionths, same tokenizer /
    short-doc fallback / empty-doc exclusion contract as
    :func:`ngram_jaccard_dupes_sql`."""
    assert shingle_k == 3, "SQL mirror written for k=3"
    return f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '{_PY_WHITESPACE_RE2}'),
                x -> x <> '') AS w
  FROM {table}
), sh AS (
  SELECT doc_id,
    CASE WHEN len(w) < 3 THEN list_distinct(w)
         ELSE list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) END AS s
  FROM toks
  WHERE len(w) > 0
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
  CAST(len(a.s) AS BIGINT) AS na,
  CAST(len(b.s) AS BIGINT) AS nb,
  CAST(1000000 * len(list_intersect(a.s, b.s))
       // least(len(a.s), len(b.s)) AS BIGINT) AS overlap_millionths
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE 1000000 * len(list_intersect(a.s, b.s))
      // least(len(a.s), len(b.s)) >= {min_overlap_millionths}
ORDER BY doc_a, doc_b
""".strip()


# ------------------------------------- persisted incremental dedup index

def build_text_index(ds, index_dir: str, text_col: str = "text",
                     n_parts: int = 64):
    """Persist a corpus's DISTINCT text set as a dedup INDEX,
    hive-partitioned by hash part (``hpart = hash(text) % n_parts``) —
    the durable state a CONTINUOUS ingestion pipeline dedups each new
    shard against (the batch-side analogue of the reference's
    at-least-once chunk-ack store, ``message/session.go:139-160``:
    state that makes re-delivered content drop instead of duplicate).

    One bucket exchange of (text, hpart); each partition's distinct
    set is one vectorized ``drop_duplicates`` over the whole bucket.
    NULL texts are not indexed (SQL equality: NULL matches nothing).
    Calling it again with rows already deduped against the index
    EXTENDS it (new files land in the same hive layout; the
    per-partition-distinct invariant holds because survivors are by
    construction absent from the index).

    Crash safety (the C6-analogue for the wide ops): the INITIAL build
    writes into ``<dir>.building`` and atomically renames — a SIGKILL
    mid-build leaves no half-index at the published path, and the
    re-run starts clean. A crash mid-EXTEND can leave truncated part
    files inside the live layout (appends are in-place by design);
    :func:`repair_text_index` drops exactly those (a parquet footer
    never lands before the stream is complete), after which re-running
    the SAME extend is idempotent: texts the crashed run did persist
    dedup the re-sent copies, re-appended survivors are set-semantics
    duplicates inside one partition (the probe reads a set).
    """
    import os

    from fluent_server_ray.stages.aggregate import skip_empty

    fresh_build = not os.path.isdir(index_dir)
    dest = index_dir.rstrip("/") + ".building" if fresh_build else index_dir
    if fresh_build:
        import shutil

        shutil.rmtree(dest, ignore_errors=True)  # stale crashed build

    def part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        t = add_content_hash(t, text_col)
        h = t["_h"].to_numpy(zero_copy_only=False)
        out = pa.table({
            text_col: t[text_col],
            "hpart": pa.array((h % n_parts).astype(np.int64)),
        })
        # batch-local distinct first: the shuffle carries one row per
        # distinct (text, part) per block
        return out.group_by([text_col, "hpart"]).aggregate([])

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(text_col)[[text_col, "hpart"]]

    from fluent_server_ray.stages.groups import map_buckets

    _IDX_SCHEMA = pa.schema([(text_col, pa.string()),
                             ("hpart", pa.int64())])
    map_buckets(
        ds.map_batches(skip_empty(part), batch_format="pyarrow",
                       zero_copy_batch=True),
        per_part, _IDX_SCHEMA, key="hpart",
    ).write_parquet(dest, partition_cols=["hpart"])
    if fresh_build:
        os.rename(dest, index_dir)
    return index_dir


def repair_text_index(index_dir: str) -> dict:
    """Drop truncated part files left by a crash mid-EXTEND (see
    :func:`build_text_index`): a parquet file whose footer does not
    read back was never fully written — the data it held belongs to an
    extend that will re-run anyway. Also clears a ``.building`` remnant
    from a crashed INITIAL build. Returns
    ``{"files_dropped": n, "building_cleared": bool}``."""
    import glob as _glob
    import os
    import shutil

    import pyarrow.parquet as _pq

    dropped = 0
    for f in _glob.glob(os.path.join(index_dir, "hpart=*", "*.parquet")):
        try:
            _pq.read_metadata(f)
        except Exception:
            os.remove(f)
            dropped += 1
    building = index_dir.rstrip("/") + ".building"
    had_building = os.path.isdir(building)
    shutil.rmtree(building, ignore_errors=True)
    return {"files_dropped": dropped, "building_cleared": had_building}


# per-WORKER cache of index bucket text sets: repeated incremental
# runs probe the same hot hpart partitions every shard — re-reading
# them per group call was pure read amplification. Keyed on the
# partition's exact file list + sizes, so an EXTEND (new files) or a
# compaction (new paths) invalidates naturally — no epoch protocol.
# LRU, byte-bounded; lives in the worker process across tasks.
from collections import OrderedDict as _OrderedDict

_IDX_CACHE: "_OrderedDict[tuple, tuple[frozenset, int]]" = _OrderedDict()
# byte cap: env-overridable so the steady-state bench can disable the
# cache (FSR_IDX_CACHE_BYTES=0) in every worker without code changes
_IDX_CACHE_MAX_BYTES = int(__import__("os").environ.get(
    "FSR_IDX_CACHE_BYTES", 256 << 20))


def _index_bucket_texts(index_dir: str, k: int, text_col: str):
    """The distinct-text set of index partition ``hpart=k`` via the
    per-worker LRU (None if the partition has no files). When
    ``FSR_IDX_CACHE_LOG`` names a file, each cache MISS appends one
    ``<bytes-read>`` line (O_APPEND, atomic for short lines) — the
    aggregate-re-read-bytes probe of the steady-state ingestion bench
    (BASELINE.md "Index cache affinity")."""
    import glob as _glob
    import os

    import pyarrow.parquet as _pq

    fs = sorted(_glob.glob(os.path.join(index_dir, f"hpart={k}",
                                        "*.parquet")))
    if not fs:
        return None
    # mtime_ns in the key: a rebuild-in-place can write same-name
    # same-size files with different content (deterministic corpora do)
    key = (index_dir, k,
           tuple((f, os.path.getsize(f), os.stat(f).st_mtime_ns)
                 for f in fs))
    if _IDX_CACHE_MAX_BYTES > 0:
        hit = _IDX_CACHE.get(key)
        if hit is not None:
            _IDX_CACHE.move_to_end(key)
            return hit[0]
    log = os.environ.get("FSR_IDX_CACHE_LOG")
    if log:
        read_bytes = sum(sz for _, sz, _ in key[2])
        with open(log, "a") as fh:
            fh.write(f"{read_bytes}\n")
    idx = pa.concat_tables(
        [_pq.read_table(f, columns=[text_col]) for f in fs]
    )
    texts = frozenset(idx[text_col].to_pylist())
    if _IDX_CACHE_MAX_BYTES <= 0:
        return texts
    nbytes = sum(len(s) for s in texts) + 80 * len(texts)
    _IDX_CACHE[key] = (texts, nbytes)
    used = sum(b for _, b in _IDX_CACHE.values())
    while used > _IDX_CACHE_MAX_BYTES and len(_IDX_CACHE) > 1:
        _, (_, b) = _IDX_CACHE.popitem(last=False)
        used -= b
    return texts


def dedup_against_index(ds, index_dir: str, id_col: str = "doc_id",
                        text_col: str = "text", n_parts: int = 64):
    """Anti-join a NEW shard against a persisted
    :func:`build_text_index`: keep rows whose text does NOT appear in
    the index (plus NULL-text rows — NULL equals nothing). The
    incremental-ingestion dedup step: the corpus index is NEVER
    rescanned in full; the shard shuffles once on its hash part and
    each bucket task reads ONLY its own index partition (Parquet path
    pruning) and filters with one vectorized ``isin`` on the TEXT
    itself (the hash only routes — collisions cannot drop rows).
    Partition text sets are cached PER WORKER (LRU keyed on the
    partition's file list, so extends/compactions invalidate) — on
    repeated incremental runs hot partitions are read once per worker,
    not once per group call.

    Within-shard duplicates are deliberately NOT collapsed here (run
    :func:`exact_dedup` on the shard first); output: (id, text)
    survivors — feed them back through :func:`build_text_index` to
    extend the index.

    ``index_dir`` must exist (checked — a typo'd path would otherwise
    glob empty in every bucket and silently disable dedup) and, on a
    multi-node cluster, must live on storage every worker can read
    (object store / NFS); a driver-local tempdir is invisible to
    remote bucket tasks.
    """
    import os

    if not os.path.isdir(index_dir):
        raise FileNotFoundError(
            f"dedup index dir not found: {index_dir!r} — build it with "
            f"build_text_index() on shared storage first"
        )

    from fluent_server_ray.stages.aggregate import skip_empty

    def add_part(t: pa.Table) -> pa.Table:
        t = add_content_hash(t, text_col)
        h = t["_h"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t[id_col], text_col: t[text_col],
            "_b": pa.array(
                np.where(pc.is_valid(t[text_col]).to_numpy(
                    zero_copy_only=False),
                    (h % n_parts).astype(np.int64), -1)
            ),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        k = int(g["_b"].iloc[0])
        if k < 0:  # NULL-text rows: never duplicates, all survive
            return g[[id_col, text_col]]
        texts = _index_bucket_texts(index_dir, k, text_col)
        if texts is None:
            return g[[id_col, text_col]]
        keep = ~g[text_col].isin(texts)
        return g.loc[keep, [id_col, text_col]]

    from fluent_server_ray.stages.groups import map_buckets, ray_schema_types

    types = ray_schema_types(ds, [id_col, text_col])
    bucketed = ds.map_batches(skip_empty(add_part), batch_format="pyarrow",
                              zero_copy_batch=True)
    return map_buckets(
        bucketed, per_bucket,
        pa.schema([pa.field(id_col, types[id_col]),
                   pa.field(text_col, types[text_col])]), key="_b")


def compact_text_index(index_dir: str, text_col: str = "text",
                       n_parts: int = 64):
    """Compact a :func:`build_text_index` layout: every EXTEND appends
    new files to the hive partitions, so read amplification grows with
    shard count — compaction rewrites the layout with a bounded file
    count (one per reduce block) and re-deduplicates. One distributed
    pass (the same distinct-per-partition pipeline as the builder) into
    a sibling directory, then an atomic swap — readers racing the swap
    see either the old or the new complete layout, never a mix.
    Returns (n_rows, n_files_before, n_files_after)."""
    import glob as _glob
    import os
    import shutil

    import ray.data as rd

    from fluent_server_ray.stages.aggregate import skip_empty

    if not os.path.isdir(index_dir):
        raise FileNotFoundError(f"dedup index dir not found: {index_dir!r}")
    before = _glob.glob(os.path.join(index_dir, "hpart=*", "*.parquet"))
    ds = rd.read_parquet(index_dir)

    def part(t: pa.Table) -> pa.Table:
        # re-derive hpart from the text (hive column dtypes can read
        # back as dictionary/string; the hash is the source of truth)
        t = t.filter(pc.is_valid(t[text_col]))
        t = add_content_hash(t, text_col)
        h = t["_h"].to_numpy(zero_copy_only=False)
        out = pa.table({
            text_col: t[text_col],
            "hpart": pa.array((h % n_parts).astype(np.int64)),
        })
        return out.group_by([text_col, "hpart"]).aggregate([])

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(text_col)[[text_col, "hpart"]]

    from fluent_server_ray.stages.groups import map_buckets

    tmp = index_dir.rstrip("/") + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    map_buckets(
        ds.map_batches(skip_empty(part), batch_format="pyarrow",
                       zero_copy_batch=True),
        per_part,
        pa.schema([(text_col, pa.string()), ("hpart", pa.int64())]),
        key="hpart",
    ).write_parquet(tmp, partition_cols=["hpart"])

    old = index_dir.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(index_dir, old)
    os.rename(tmp, index_dir)
    shutil.rmtree(old, ignore_errors=True)

    import pyarrow.parquet as _pq

    after = _glob.glob(os.path.join(index_dir, "hpart=*", "*.parquet"))
    n_rows = sum(_pq.read_metadata(f).num_rows for f in after)
    return n_rows, len(before), len(after)


# ------------------------------------------- exact shared-substring dedup

# Horner multiplier for the k-window rolling mix (odd → bijective per
# step); windows of ANY length fold through the same constant, unlike
# the fixed-length _SH_C family.
_WIN_P = np.uint64(0x100000001B3)  # FNV-ish odd prime


def _window_hashes(texts: list, ids: np.ndarray, window_k: int):
    """Exact k-token-window hashes for a batch: each token hashed once
    (one ``pd.util.hash_array`` over the batch's flat token array),
    window hash = Horner fold ``((h0·P + h1)·P + h2)…`` over k shifted
    vector ops (mod 2^64). Windows never cross a document boundary
    (validity mask on the repeated doc-id array). Docs with < k tokens
    emit nothing — a short doc HAS no k-token run, unlike the shingle
    fallback in :func:`_batch_shingle_hashes`.

    Returns ``(win_hash uint64, win_doc int64)`` flat arrays.
    """
    toks = [(t or "").split() for t in texts]
    lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                       count=len(toks))
    total = int(lens.sum())
    if total < window_k:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    flat = np.empty(total, dtype=object)
    pos = 0
    for w in toks:
        if w:
            flat[pos:pos + len(w)] = w
            pos += len(w)
    wh = pd.util.hash_array(flat).astype(np.uint64)
    n_win = total - window_k + 1
    comb = wh[:n_win].copy()
    for j in range(1, window_k):
        comb = comb * _WIN_P + wh[j:n_win + j]
    doc_of = np.repeat(ids, lens)
    valid = doc_of[:n_win] == doc_of[window_k - 1:]
    return comb[valid], doc_of[:n_win][valid]


def window_set(text: str, window_k: int) -> set:
    """The exact k-token windows of a document (space-joined) — the
    verification primitive :func:`substring_dupes` uses to make its
    hash-candidate pairs collision-free."""
    toks = (text or "").split()
    return {" ".join(toks[i:i + window_k])
            for i in range(len(toks) - window_k + 1)}


def substring_dupes(ds, window_k: int = 8, id_col: str = "doc_id",
                    text_col: str = "text", n_buckets: int = 256,
                    broadcast_bytes: int = 256 << 20):
    """EXACT shared-substring duplicate pairs: documents that share at
    least one identical run of ``window_k`` consecutive tokens — the
    window-granular form of the suffix-array substring dedup of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (ACL 2022), re-expressed as a Ray Data exchange.

    Shape (the 100 TB story):

    1. **window pass** (combiner): one vectorized rolling-hash pass per
       batch (:func:`_window_hashes`), collapsed to DISTINCT
       ``(hash, doc)`` rows (Arrow ``group_by``) — a doc repeating one
       window many times contributes it once per block;
    2. **one exchange** on ``hash % n_buckets`` (uniform 64-bit key →
       balanced buckets); per bucket, hash-groups with ≥ 2 docs pair up
       via one vectorized self-merge. A window shared by q docs yields
       q(q-1)/2 pairs — output-size work, exactly what the SQL
       self-join produces.
    3. **verification** makes the result collision-exact: candidate
       ids broadcast (``ray.put``), candidate TEXTS only stream out of
       the corpus, and each pair must share an actual window STRING
       (at trillion-window scale 64-bit hashes collide near the 2^32
       birthday bound, so the exact operator cannot trust raw hashes).
       Texts within ``broadcast_bytes`` ship once via ``ray.put``;
       beyond it, two bucketed hash joins attach text_a/text_b to the
       deduped pairs — the same large-side plan as
       :func:`minhash_near_dupes`.

    Returns a **Dataset** (doc_a, doc_b) — distinct verified pairs;
    stays in the object store (pair sets are corpus-scale on
    boilerplate-heavy crawls).
    """
    import ray

    from fluent_server_ray.stages.aggregate import skip_empty

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        wh, wd = _window_hashes(t[text_col].to_pylist(), ids, window_k)
        tbl = pa.table({"_h": wh.view(np.int64), id_col: wd})
        uniq = tbl.group_by(["_h", id_col]).aggregate([])
        b = uniq["_h"].to_numpy(zero_copy_only=False).view(np.uint64)
        return uniq.append_column(
            "_b", pa.array((b % np.uint64(n_buckets)).astype(np.int64)))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["_h", id_col])  # cross-block window dupes
        sz = g.groupby("_h")["_h"].transform("size")
        g = g[sz >= 2]
        if not len(g):
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64")})
        m = g.merge(g, on="_h")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        out = m[[f"{id_col}_x", f"{id_col}_y"]].drop_duplicates()
        out.columns = ["doc_a", "doc_b"]
        return out

    from fluent_server_ray.stages.groups import map_buckets

    cand = map_buckets(
        ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True),
        bucket_pairs, _PAIR_SCHEMA, key="_b").materialize()
    if cand.count() == 0:
        return _empty_pairs_ds()

    def explode_ids(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [t["doc_a"].combine_chunks(), t["doc_b"].combine_chunks()])
        return pa.table({id_col: pc.unique(both)})

    from fluent_server_ray.stages.aggregate import grouped_counts

    ids_tbl = grouped_counts(
        cand.map_batches(explode_ids, batch_format="pyarrow"), [id_col])
    id_ref = ray.put(ids_tbl[id_col].combine_chunks())

    def grab_texts(t: pa.Table) -> pa.Table:
        keys = ray.get(id_ref)
        return t.filter(pc.is_in(t[id_col], value_set=keys)).select(
            [id_col, text_col])

    cand_docs = ds.map_batches(grab_texts, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    def verify_rows(pair_a, pair_b, text_a, text_b) -> pa.Table:
        cache: dict = {}

        def wset(d, s):
            if d not in cache:
                cache[d] = window_set(str(s), window_k)
            return cache[d]

        keep_a, keep_b = [], []
        for a, b, sa, sb in zip(pair_a, pair_b, text_a, text_b):
            if wset(a, sa) & wset(b, sb):
                keep_a.append(a)
                keep_b.append(b)
        return pa.table({
            "doc_a": pa.array(np.asarray(keep_a, dtype=np.int64)),
            "doc_b": pa.array(np.asarray(keep_b, dtype=np.int64)),
        })

    if cand_docs.size_bytes() <= broadcast_bytes:
        # broadcast path: candidate texts ship once via ray.put; raw
        # pair rows stream straight into verification. LARGE_STRING
        # texts: a dup-heavy pair block's take() can gather > 2 GB and
        # silently wrap 32-bit string offsets (cf. minhash path).
        texts_tbl = pa.concat_tables(
            cand_docs.iter_batches(batch_size=None,
                                   batch_format="pyarrow"))
        texts_tbl = pa.table({
            id_col: texts_tbl[id_col],
            text_col: texts_tbl[text_col].cast(pa.large_string()),
        })
        texts_ref = ray.put(texts_tbl)

        def verify(t: pa.Table) -> pa.Table:
            tt = ray.get(texts_ref)
            ids, texts = tt[id_col], tt[text_col]
            ta = pc.take(texts, pc.index_in(t["doc_a"], value_set=ids))
            tb = pc.take(texts, pc.index_in(t["doc_b"], value_set=ids))
            return verify_rows(t["doc_a"].to_pylist(),
                               t["doc_b"].to_pylist(),
                               ta.to_pylist(), tb.to_pylist())

        verified = cand.map_batches(skip_empty(verify),
                                    batch_format="pyarrow")
    else:
        # candidate texts beyond broadcast size: attach them with two
        # bucketed hash joins — the same large-side plan as
        # minhash_near_dupes. Pairs are deduped FIRST (cross-bucket
        # window collisions repeat pairs; joining first would amplify
        # text bytes by the duplication factor).
        from fluent_server_ray.stages.joins import bucketed_hash_join

        pairs = distinct_pairs(cand, n_buckets=n_buckets).materialize()

        def rename(cols: dict):
            def fn(t: pa.Table) -> pa.Table:
                return pa.table({new: t[old]
                                 for old, new in cols.items()})
            return fn

        docs_a = cand_docs.map_batches(
            rename({id_col: "doc_a", text_col: "text_a"}),
            batch_format="pyarrow")
        docs_b = cand_docs.map_batches(
            rename({id_col: "doc_b", text_col: "text_b"}),
            batch_format="pyarrow")
        j1 = bucketed_hash_join(pairs, docs_a, key="doc_a",
                                n_buckets=n_buckets).materialize()
        j2 = bucketed_hash_join(j1, docs_b, key="doc_b",
                                n_buckets=n_buckets)

        def verify_joined(t: pa.Table) -> pa.Table:
            return verify_rows(t["doc_a"].to_pylist(),
                               t["doc_b"].to_pylist(),
                               t["text_a"].to_pylist(),
                               t["text_b"].to_pylist())

        verified = j2.map_batches(skip_empty(verify_joined),
                                  batch_format="pyarrow")

    out = distinct_pairs(verified).materialize()
    if out.count() == 0:
        return _empty_pairs_ds()
    return out


def build_minhash_index(ds, index_dir: str, num_perm: int = 64,
                        bands: int = 16, seed: int = 7, shingle_k: int = 3,
                        n_parts: int = 64):
    """Persist a corpus's MinHash state as a NEAR-dup INDEX — the
    probabilistic sibling of :func:`build_text_index` for continuous
    ingestion (new shards probe it instead of re-signing the corpus):

    - ``<dir>/bands/bpart=K/``: (band_id, band_hash, doc_id) rows,
      hive-partitioned by ``band_hash % n_parts`` — the ROUTING side
      (a probe reads only the partitions its own band keys hash to);
    - ``<dir>/sigs/spart=K/``: (doc_id, sig list<int64>[num_perm]),
      partitioned by ``doc_id % n_parts`` — the VERIFICATION side
      (candidate pairs fetch only the partitions holding their ids and
      estimate Jaccard from signature agreement, the standard
      signature-store design).

    Calling it again with NEW docs EXTENDS both layouts (files append
    into the same hive dirs). Deterministic for fixed params (the
    probe must be built with the SAME num_perm/bands/seed/shingle_k —
    stored in ``<dir>/params.json`` and checked at probe time).

    Crash safety mirrors :func:`build_text_index`: the INITIAL build
    writes into ``<dir>.building`` and atomically renames (params.json
    is written LAST inside the staging dir, so a published index
    always carries it); a crash mid-EXTEND can leave truncated part
    files — :func:`repair_minhash_index` drops exactly those, after
    which re-running the same extend is idempotent (band/sig rows are
    keyed by doc — duplicates from the re-send collapse in the probe's
    candidate dedup).
    """
    import json
    import os
    import shutil

    from fluent_server_ray.stages.aggregate import skip_empty

    params = {"num_perm": num_perm, "bands": bands, "seed": seed,
              "shingle_k": shingle_k, "n_parts": n_parts}
    fresh_build = not os.path.isdir(index_dir)
    dest = index_dir.rstrip("/") + ".building" if fresh_build else index_dir
    if fresh_build:
        shutil.rmtree(dest, ignore_errors=True)  # stale crashed build
    pfile = os.path.join(index_dir, "params.json")
    if os.path.exists(pfile):
        stored = json.load(open(pfile))
        if stored != params:
            raise ValueError(
                f"minhash index at {index_dir!r} was built with "
                f"{stored}; refusing to extend with {params}")
    stage = MinHashStage(num_perm, bands, seed, shingle_k)

    def band_rows(t: pa.Table) -> pa.Table:
        out = stage(t)
        bh = out["band_hash"].to_numpy(zero_copy_only=False)
        return out.append_column(
            "bpart", pa.array((bh % n_parts).astype(np.int64)))

    def sig_rows(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "sig": pa.array([], type=pa.list_(pa.int64())),
                "spart": pa.array([], type=pa.int64()),
            })
        ids, sigs = stage.sigs_batch(t)
        return pa.table({
            "doc_id": pa.array(ids),
            "sig": pa.array(list(sigs.view(np.int64))),
            "spart": pa.array(ids % n_parts),
        })

    (ds.map_batches(skip_empty(band_rows), batch_format="pyarrow",
                    zero_copy_batch=True)
     .write_parquet(os.path.join(dest, "bands"),
                    partition_cols=["bpart"]))
    (ds.map_batches(skip_empty(sig_rows), batch_format="pyarrow",
                    zero_copy_batch=True)
     .write_parquet(os.path.join(dest, "sigs"),
                    partition_cols=["spart"]))
    if not os.path.exists(os.path.join(dest, "params.json")):
        json.dump(params, open(os.path.join(dest, "params.json"), "w"))
    if fresh_build:
        os.rename(dest, index_dir)
    return index_dir


def repair_minhash_index(index_dir: str) -> dict:
    """Drop truncated band/sig part files left by a crash mid-EXTEND
    (parquet footer check — cf. :func:`repair_text_index`) and clear a
    ``.building`` remnant from a crashed initial build."""
    import glob as _glob
    import os
    import shutil

    import pyarrow.parquet as _pq

    dropped = 0
    for sub, part in (("bands", "bpart"), ("sigs", "spart")):
        pat = os.path.join(index_dir, sub, f"{part}=*", "*.parquet")
        for f in _glob.glob(pat):
            try:
                _pq.read_metadata(f)
            except Exception:
                os.remove(f)
                dropped += 1
    building = index_dir.rstrip("/") + ".building"
    had_building = os.path.isdir(building)
    shutil.rmtree(building, ignore_errors=True)
    return {"files_dropped": dropped, "building_cleared": had_building}


def near_dups_against_index(ds, index_dir: str, threshold: float = 0.8):
    """Probe a NEW shard against a persisted
    :func:`build_minhash_index`: pairs (shard doc, indexed doc) whose
    banded LSH keys collide AND whose signature-estimated Jaccard
    (fraction of agreeing minhash components — the textbook unbiased
    estimator) clears ``threshold``. The index is NEVER rescanned in
    full: the shard's band rows shuffle once on their band-hash part
    and each bucket task reads ONLY its own ``bands/bpart=K``
    partition; candidate signatures come from ONLY the ``sigs/spart``
    partitions holding candidate ids. Probabilistic recall (LSH) and
    estimated Jaccard → rows-only checks; recall/precision pinned in
    pytest on constructed near-dups.

    Returns a Dataset (doc_a = shard id, doc_b = indexed id,
    est_jaccard), distinct pairs. Same shared-storage caveat as
    :func:`dedup_against_index`.
    """
    import glob as _glob
    import json
    import os

    import pyarrow.parquet as _pq
    import ray

    from fluent_server_ray.stages.aggregate import skip_empty

    pfile = os.path.join(index_dir, "params.json")
    if not os.path.exists(pfile):
        raise FileNotFoundError(
            f"minhash index params not found: {pfile!r} — build the "
            f"index with build_minhash_index() on shared storage first")
    p = json.load(open(pfile))
    n_parts = p["n_parts"]
    stage = MinHashStage(p["num_perm"], p["bands"], p["seed"],
                         p["shingle_k"])

    # shard signatures: small-by-construction relative to the corpus —
    # pinned in the object store once, consumed by the verify step
    def sig_rows(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "sig": pa.array([], type=pa.list_(pa.int64()))})
        ids, sigs = stage.sigs_batch(t)
        return pa.table({"doc_id": pa.array(ids),
                         "sig": pa.array(list(sigs.view(np.int64)))})

    shard_sigs = ds.map_batches(skip_empty(sig_rows), batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    def band_rows(t: pa.Table) -> pa.Table:
        out = stage(t)
        bh = out["band_hash"].to_numpy(zero_copy_only=False)
        return out.append_column(
            "bpart", pa.array((bh % n_parts).astype(np.int64)))

    def probe_bucket(g: pd.DataFrame) -> pd.DataFrame:
        k = int(g["bpart"].iloc[0])
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                              "doc_b": pd.Series(dtype="int64")})
        fs = sorted(_glob.glob(
            os.path.join(index_dir, "bands", f"bpart={k}", "*.parquet")))
        if not fs:
            return empty
        idx = pa.concat_tables([_pq.read_table(f) for f in fs]).to_pandas()
        m = g.merge(idx, on=["band_id", "band_hash"],
                    suffixes=("_a", "_b"))
        if not len(m):
            return empty
        out = m[["doc_id_a", "doc_id_b"]].drop_duplicates()
        out.columns = ["doc_a", "doc_b"]
        return out

    from fluent_server_ray.stages.groups import map_buckets

    cand = map_buckets(
        ds.map_batches(skip_empty(band_rows), batch_format="pyarrow",
                       zero_copy_batch=True),
        probe_bucket, _PAIR_SCHEMA, key="bpart")
    cand = distinct_pairs(cand).materialize()
    if cand.count() == 0:
        return _empty_pairs_ds(with_jaccard=False).map_batches(
            lambda t: t.append_column(
                "est_jaccard", pa.array([], type=pa.float64())),
            batch_format="pyarrow")

    shard_sig_tbl = pa.concat_tables(
        shard_sigs.iter_batches(batch_size=None, batch_format="pyarrow"))
    sig_ref = ray.put(shard_sig_tbl)

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """One verify task per sigs partition: ``g`` carries every
        candidate pair whose INDEXED id lives in this spart."""
        k = int(g["_spart"].iloc[0])
        fs = sorted(_glob.glob(
            os.path.join(index_dir, "sigs", f"spart={k}", "*.parquet")))
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                              "doc_b": pd.Series(dtype="int64"),
                              "est_jaccard": pd.Series(dtype="float64")})
        if not fs:
            return empty
        idx = pa.concat_tables([_pq.read_table(f) for f in fs])
        idx_ids = idx["doc_id"].combine_chunks()
        idx_sigs = np.stack(
            [np.asarray(s, dtype=np.int64) for s in idx["sig"].to_pylist()])
        st = ray.get(sig_ref)
        a_pos = pc.index_in(pa.array(g["doc_a"].to_numpy()),
                            value_set=st["doc_id"].combine_chunks())
        b_pos = pc.index_in(pa.array(g["doc_b"].to_numpy()),
                            value_set=idx_ids)
        a_sig_list = st["sig"].to_pylist()
        a_idx = a_pos.to_numpy(zero_copy_only=False)
        b_idx = b_pos.to_numpy(zero_copy_only=False)
        ok = ~(pd.isna(a_idx) | pd.isna(b_idx))
        if not ok.any():
            return empty
        a_sigs = np.stack([np.asarray(a_sig_list[int(i)], dtype=np.int64)
                           for i in a_idx[ok]])
        b_sigs = idx_sigs[b_idx[ok].astype(np.int64)]
        est = (a_sigs == b_sigs).mean(axis=1)
        keep = est >= threshold
        sub = g.loc[ok, ["doc_a", "doc_b"]].reset_index(drop=True)
        out = sub.loc[keep].copy()
        out["est_jaccard"] = est[keep]
        return out

    def add_spart(t: pa.Table) -> pa.Table:
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_spart", pa.array((b % n_parts).astype(np.int64)))

    return map_buckets(
        cand.map_batches(add_spart, batch_format="pyarrow",
                         zero_copy_batch=True),
        verify_bucket,
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                   ("est_jaccard", pa.float64())]), key="_spart")


def substring_dupes_sql(window_k: int = 8, table: str = "documents") -> str:
    """DuckDB mirror: same Unicode-whitespace tokenization
    (``_PY_WHITESPACE_RE2`` parity with Python ``str.split()``), same
    space-joined exact k-token windows via list slicing; docs shorter
    than k tokens generate no windows (``generate_series(1, n)`` is
    empty for n < 1, and NULL text propagates to no rows)."""
    return f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '{_PY_WHITESPACE_RE2}'),
                x -> x <> '') AS t
  FROM {table}
), wins AS (
  SELECT doc_id, array_to_string(t[i:i + {window_k - 1}], ' ') AS w
  FROM toks, unnest(generate_series(1, len(t) - {window_k - 1})) AS g(i)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM wins a JOIN wins b ON a.w = b.w AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
""".strip()


def keep_best_per_component(docs_ds, comps_ds, score_col: str = "n_chars",
                            id_col: str = "doc_id", n_buckets: int = 64):
    """Near-dup CANONICALIZATION — the step after clustering: keep ONE
    representative per duplicate component, the highest-``score_col``
    doc (ties → smallest id), plus every unclustered doc as its own
    trivial component. This is the "keep the longest/best copy" rule
    large-crawl dedup pipelines apply once components are known, rather
    than blind keep-min-id (which can retain a truncated variant).

    ``comps_ds`` is :func:`pair_components` output ``(doc_id,
    component)``; singletons are absent there by contract, so the
    corpus side LEFT-joins and fills ``component = doc_id``.

    Physical plan: one bucketed LEFT hash join of the (id, score)
    corpus projection against the component table (single co-located
    exchange), then :func:`aggregate.latest_by_key` — a combiner-first
    per-component argmax (per-batch winner, ONE key exchange of ≤
    blocks-per-component survivor rows, per-bucket re-argmax). Neither
    the corpus nor the component table ever lands on the driver.

    Returns a Dataset ``(doc_id, component, score_col)`` of KEPT docs,
    sorted by component.
    """
    from fluent_server_ray.stages.aggregate import latest_by_key
    from fluent_server_ray.stages.joins import bucketed_hash_join

    scored = docs_ds.select_columns([id_col, score_col])
    joined = bucketed_hash_join(scored, comps_ds, key=id_col,
                                how="left", n_buckets=n_buckets)

    def fill(t: pa.Table) -> pa.Table:
        comp = t["component"]
        ids = t[id_col]
        if pa.types.is_floating(comp.type):
            # fill-side unmatched rows come back float64 (the join's
            # documented NaN-capable dtype); ids are exact in float64
            # only below 2^53 — refuse rather than silently round.
            if len(t) and pc.max(ids).as_py() >= (1 << 53):
                raise ValueError(
                    "keep_best_per_component: id exceeds 2^53 — the "
                    "float64 fill-side representation would round it")
            miss = pc.or_kleene(pc.is_null(comp), pc.is_nan(comp))
            comp = pc.if_else(miss, pc.cast(ids, pa.float64()), comp)
            comp = pc.cast(comp, pa.int64())
        else:
            comp = pc.fill_null(comp, ids)
        # argmax tiebreak: latest_by_key orders every order-col DESC,
        # so "smallest id wins ties" rides in as -id
        neg = pc.negate_checked(pc.cast(ids, pa.int64()))
        return pa.table({id_col: ids, "component": comp,
                         score_col: t[score_col], "_neg_id": neg})

    labeled = joined.map_batches(fill, batch_format="pyarrow",
                                 zero_copy_batch=True)
    best = latest_by_key(labeled, key="component",
                         order_cols=[score_col, "_neg_id"],
                         n_buckets=n_buckets)
    return best.drop_columns(["_neg_id"])


def keep_best_per_component_sql(pairs_sql: str,
                                score_col: str = "n_chars",
                                table: str = "documents") -> str:
    """Mirror: recursive-CTE components over the same pair query, LEFT
    join onto the corpus with singleton fill, then the window argmax
    (score DESC, id ASC)."""
    return f"""
WITH comp AS (
  {pair_components_sql(pairs_sql)}
), scored AS (
  SELECT d.doc_id,
    CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component,
    d.{score_col}
  FROM {table} d LEFT JOIN comp c ON c.doc_id = d.doc_id
)
SELECT doc_id, component, {score_col} FROM (
  SELECT scored.*, row_number() OVER (
    PARTITION BY component ORDER BY {score_col} DESC, doc_id ASC
  ) AS _rn FROM scored
) WHERE _rn = 1 ORDER BY component
""".strip()


# ------------------------------------------ edit-distance near-dup pairs

def _pairwise_levenshtein(A, B, la, lb, P):
    """Byte-level Levenshtein distance for many (A[i], B[i]) pairs at
    once: the DP advances row-by-row over ALL pairs simultaneously —
    the insertion chain ``cur[j] = min(base[j], cur[j-1]+1)`` resolves
    as ONE ``np.minimum.accumulate`` per DP row via the ``d[j] =
    cur[j] - j`` transform, so a band of P-byte strings costs O(P)
    numpy calls regardless of pair count (never a per-pair Python
    loop). ``A``/``B`` are (m, P) byte matrices, ``la``/``lb`` the
    true byte lengths. Returns int32 distances."""
    m = len(la)
    jj = np.arange(P + 1, dtype=np.int32)
    prev = np.tile(jj, (m, 1))
    res = lb.astype(np.int32).copy()  # la == 0 rows: dist = lb
    for i in range(1, P + 1):
        cost = (A[:, i - 1:i] != B).astype(np.int32)
        base = np.empty_like(prev)
        base[:, 0] = i
        base[:, 1:] = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        d = np.minimum.accumulate(base - jj, axis=1)
        cur = d + jj
        done = la == i
        if done.any():
            res[done] = cur[done, lb[done]]
        prev = cur
    return res


def edit_distance_dupes(ds, id_col: str = "doc_id",
                        text_col: str = "text", prefix_len: int = 64,
                        max_dist: int = 2, band_width: int = 8,
                        max_band_pairs: int = 200_000_000):
    """Edit-distance near-duplicate pairs: all (a < b) whose first
    ``prefix_len``-CODEPOINT prefixes are within BYTE-level Levenshtein
    distance ``max_dist`` — the typo/suffix-variant dedup family that
    shingle methods miss (one-char edits barely move a Jaccard score).
    Byte-level distance is the deliberate contract: DuckDB's
    ``levenshtein`` is byte-based, so the mirror is exact, and bytes ≥
    codepoints means byte-blocking stays complete.

    Recall 1 within the radius: edit distance ≥ |byte-length Δ|, so
    every qualifying pair lands in the same or adjacent length band
    (``band_width > max_dist``); each doc is replicated to its band
    and the next, and a pair counts in a band iff at least one member
    is primary there — exactly once globally.

    Per-band the DP is vectorized ACROSS pairs (the classic
    ``d[j] = min-accumulate`` trick turns the insertion chain into one
    ``np.minimum.accumulate`` per DP row, so the whole band costs
    O(P) numpy calls, never a per-pair Python loop), and the pair axis
    is CHUNKED (500k pairs per DP invocation) so a dense band's
    byte-matrix gathers stay O(chunk·P) memory — a uniform-length
    corpus can legitimately produce tens of millions of candidates.
    ``max_band_pairs`` survives only as a runaway-compute backstop
    (raises loudly); :func:`minhash_near_dupes` is the open-corpus
    path.

    Returns a Dataset (doc_a, doc_b, dist) sorted by (doc_a, doc_b).
    """
    import pandas as pd

    from fluent_server_ray.stages.aggregate import skip_empty

    if band_width <= max_dist:
        raise ValueError("band_width must exceed max_dist for "
                         "adjacent-band blocking to be complete")

    def explode_bands(t: pa.Table):
        pref = pc.utf8_slice_codeunits(
            pc.fill_null(pc.cast(t[text_col], pa.string()), ""),
            0, prefix_len)
        nbytes = pc.binary_length(pref).to_numpy(zero_copy_only=False)
        band = (nbytes // band_width).astype(np.int64)
        base = pa.table({
            id_col: t[id_col], "_pref": pref,
            "_nb": pa.array(nbytes.astype(np.int64)),
        })
        out = []
        for shift, primary in ((0, True), (1, False)):
            out.append(base.append_column(
                "_band", pa.array(band + shift)
            ).append_column(
                "_primary", pa.array(np.full(len(t), primary))))
        return pa.concat_tables(out)

    def per_band(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "doc_a": np.asarray([], dtype=np.int64),
            "doc_b": np.asarray([], dtype=np.int64),
            "dist": np.asarray([], dtype=np.int64),
        })
        g = g.sort_values(["_nb", id_col]).reset_index(drop=True)
        n = len(g)
        if n < 2:
            return empty
        nb = g["_nb"].to_numpy(dtype="int64")
        # candidate window: j > i with nb[j] - nb[i] <= max_dist
        hi = np.searchsorted(nb, nb + max_dist, side="right")
        counts = hi - np.arange(n) - 1
        counts = np.maximum(counts, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        if total > max_band_pairs:
            raise ValueError(
                f"edit_distance_dupes: band with {n} docs generates "
                f"{total} candidate pairs > max_band_pairs="
                f"{max_band_pairs} — a runaway same-length corpus; "
                "use minhash_near_dupes for open corpora")
        i_idx = np.repeat(np.arange(n), counts)
        starts = np.cumsum(counts) - counts
        j_idx = (np.arange(total) - np.repeat(starts, counts)
                 + np.repeat(np.arange(n), counts) + 1)
        prim = g["_primary"].to_numpy(dtype=bool)
        keep = prim[i_idx] | prim[j_idx]
        i_idx, j_idx = i_idx[keep], j_idx[keep]
        if not len(i_idx):
            return empty

        # byte matrix: one vectorized scatter, no per-doc loop
        enc = [s.encode("utf-8") for s in g["_pref"].tolist()]
        lens = nb
        P = int(lens.max())
        mat = np.zeros((n, max(P, 1)), dtype=np.int16)
        if P:
            flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
            rows = np.repeat(np.arange(n), lens)
            cols = (np.arange(int(lens.sum()))
                    - np.repeat(np.cumsum(lens) - lens, lens))
            mat[rows, cols] = flat

        # verification CHUNKS the pair axis: the DP gathers a
        # (pairs, P) int16 matrix per side, so a dense band (uniform
        # doc lengths at corpus scale — 12M candidates at sf0.1) would
        # otherwise materialize gigabytes at once. Survivors are few;
        # peak memory stays O(chunk · P) regardless of band density.
        chunk = 500_000
        outs = []
        ids_np = g[id_col].to_numpy()
        for s0 in range(0, len(i_idx), chunk):
            ic = i_idx[s0:s0 + chunk]
            jc = j_idx[s0:s0 + chunk]
            res = _pairwise_levenshtein(mat[ic], mat[jc],
                                        lens[ic], lens[jc], P)
            ok = res <= max_dist
            if not ok.any():
                continue
            ia = ids_np[ic[ok]]
            ib = ids_np[jc[ok]]
            outs.append(pd.DataFrame({
                "doc_a": np.minimum(ia, ib).astype(np.int64),
                "doc_b": np.maximum(ia, ib).astype(np.int64),
                "dist": res[ok].astype(np.int64),
            }))
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    from fluent_server_ray.stages.groups import map_buckets

    out = map_buckets(
        ds.map_batches(skip_empty(explode_bands), batch_format="pyarrow",
                       zero_copy_batch=True),
        per_band,
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                   ("dist", pa.int64())]), key="_band")
    return out.sort(["doc_a", "doc_b"])


def edit_distance_dupes_sql(prefix_len: int = 64, max_dist: int = 2,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            table: str = "documents") -> str:
    pref = (f"substr(COALESCE(CAST({{s}}.{text_col} AS VARCHAR), ''),"
            f" 1, {prefix_len})")
    a, b = pref.format(s="a"), pref.format(s="b")
    return f"""
SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
  CAST(levenshtein({a}, {b}) AS BIGINT) AS dist
FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col}
WHERE levenshtein({a}, {b}) <= {max_dist}
ORDER BY doc_a, doc_b
""".strip()


# ------------------------------------------------ per-source dup rate

def source_dup_rate(ds, group_col: str = "source",
                    text_col: str = "text", n_buckets: int = 64) -> pa.Table:
    """Per-source exact-duplicate rate — the curation dashboard row
    "how contaminated is each feed?": for every source, the fraction
    of its docs whose exact text (md5) appears in MORE THAN ONE doc
    corpus-wide (both copies count as duplicates, wherever they live).

    Shape: per-batch md5 → ONE hash-bucket exchange on the
    fingerprint (all copies of a text co-locate, so dup flags are
    decided entirely inside a bucket) → per-bucket (source, n, dups)
    combiner rows → bounded driver merge (≤ sources × buckets rows).
    The corpus text crosses the wire once as 16-byte digests + the
    source tag; nothing else moves. Output: one row per source
    (source, n_docs, n_dups, dup_rate_millionths), sorted by source;
    the rate mirrors the SQL float expression bit-for-bit.
    """
    import hashlib

    import pandas as pd

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)

    def fp(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        fps = [hashlib.md5((s or "").encode("utf-8")).hexdigest()
               for s in texts]
        fparr = pa.array(fps, type=pa.string())
        return pa.table({
            "_fp": fparr,
            group_col: pc.fill_null(
                pc.cast(t[group_col], pa.string()), ""),
            "_b": pa.array(hash_bucket_array(fparr, n_buckets)),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("_fp")["_fp"].transform("size")
        dup = (cnt > 1).astype("int64")
        out = (g.assign(_dup=dup).groupby(group_col, sort=False)
               .agg(n=("_fp", "size"), dups=("_dup", "sum"))
               .reset_index())
        return out[[group_col, "n", "dups"]]

    from fluent_server_ray.stages.groups import map_buckets

    parts = map_buckets(
        ds.map_batches(skip_empty(fp), batch_format="pyarrow",
                       zero_copy_batch=True),
        per_bucket,
        pa.schema([(group_col, pa.string()), ("n", pa.int64()),
                   ("dups", pa.int64())]), key="_b")
    tables = list(parts.iter_batches(batch_size=None,
                                     batch_format="pyarrow"))
    if not tables:
        return pa.table({
            group_col: pa.array([], type=pa.string()),
            "n_docs": pa.array([], type=pa.int64()),
            "n_dups": pa.array([], type=pa.int64()),
            "dup_rate_millionths": pa.array([], type=pa.int64()),
        })
    merged = (pa.concat_tables(tables).group_by(group_col)
              .aggregate([("n", "sum"), ("dups", "sum")])
              .rename_columns([group_col, "n", "dups"])
              .sort_by(group_col))
    n = merged["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    d = merged["dups"].to_numpy(zero_copy_only=False).astype(np.float64)
    # (1000000.0 * dups) / n, floored — the SQL mirror's exact float tree
    rate = np.floor((1_000_000.0 * d) / n).astype(np.int64)
    return pa.table({
        group_col: merged[group_col],
        "n_docs": pc.cast(merged["n"], pa.int64()),
        "n_dups": pc.cast(merged["dups"], pa.int64()),
        "dup_rate_millionths": pa.array(rate),
    })


def source_dup_rate_sql(group_col: str = "source",
                        text_col: str = "text",
                        table: str = "documents") -> str:
    return f"""
WITH h AS (
  SELECT COALESCE(CAST({group_col} AS VARCHAR), '') AS {group_col},
    md5(COALESCE(CAST({text_col} AS VARCHAR), '')) AS fp
  FROM {table}
), c AS (
  SELECT fp, count(*) AS cnt FROM h GROUP BY fp
)
SELECT h.{group_col},
  count(*) AS n_docs,
  CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
  CAST(floor((1000000.0 * sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END))
             / count(*)) AS BIGINT) AS dup_rate_millionths
FROM h JOIN c USING (fp)
GROUP BY h.{group_col} ORDER BY h.{group_col}
""".strip()


# ------------------------------------------ winnow fingerprint pairs

def winnow_pairs(ds, k: int = 8, window: int = 4, min_shared: int = 2,
                 n_buckets: int = 256,
                 max_bucket_pairs: int = 200_000_000):
    """MOSS-style content-overlap pairs: all (doc_a < doc_b) sharing at
    least ``min_shared`` distinct winnowed rolling-hash fingerprints
    (:func:`~fluent_server_ray.stages.textstats.winnow_fingerprints_batch`
    — Schleimer et al. 2003) — the plagiarism/quote-detection shape:
    position-robust shared k-char content, where shingle-Jaccard asks
    "how similar overall?" this asks "how much is literally copied?".

    Shape: per-batch fingerprint explode (fingerprints are distinct
    per doc by construction) → ONE hash-bucket exchange on the
    fingerprint → per-bucket CHUNKED pair formation (pairs
    pre-aggregate to (pair, count) partials every ~2M, so bucket
    memory is O(chunk + distinct pairs); ``max_bucket_pairs`` is a
    runaway backstop only; fingerprints partition disjointly, so
    per-bucket shared counts sum to the global count) → distributed
    (doc_a, doc_b) merge → threshold filter. Returns a Dataset
    (doc_a, doc_b, n_shared) sorted by (doc_a, doc_b).
    """
    from fluent_server_ray.stages.aggregate import (grouped_agg,
                                                    hash_bucket_array,
                                                    skip_empty)
    from fluent_server_ray.stages.textstats import \
        winnow_fingerprints_batch

    def fps(t: pa.Table) -> pa.Table:
        out = winnow_fingerprints_batch(t, k=k, window=window)
        return out.append_column(
            "_b", pa.array(hash_bucket_array(out["fp"], n_buckets)))

    _EMPTY = {"doc_a": np.asarray([], dtype=np.int64),
              "doc_b": np.asarray([], dtype=np.int64),
              "n": np.asarray([], dtype=np.int64)}

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["fp", "doc_id"],
                          kind="mergesort").reset_index(drop=True)
        codes, _ = pd.factorize(g["fp"], sort=False)
        n = len(g)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        sizes = np.diff(np.r_[starts, n]).astype(np.int64)
        total = int((sizes * (sizes - 1) // 2).sum())
        if total == 0:
            return pd.DataFrame(_EMPTY)
        if total > max_bucket_pairs:
            raise ValueError(
                f"winnow_pairs: bucket generates {total} candidate "
                f"pairs > max_bucket_pairs={max_bucket_pairs} — a "
                "runaway mass-shared fingerprint; pre-dedup exact "
                "copies or raise the winnow window")
        d = g["doc_id"].to_numpy(dtype="int64")
        # CHUNKED pair accumulation: a popular fingerprint's triu
        # explosion is pre-aggregated to (pair, count) partials every
        # ~2M pairs, so peak memory is O(chunk + distinct pairs) even
        # when the raw candidate count reaches tens of millions
        # (sf0.1 produces 7.4M); a final local groupby merges partials.
        chunk = 2_000_000
        parts, buf_a, buf_b, buffered = [], [], [], 0

        def flush():
            nonlocal buf_a, buf_b, buffered
            if not buffered:
                return
            df = (pd.DataFrame({"doc_a": np.concatenate(buf_a),
                                "doc_b": np.concatenate(buf_b)})
                  .groupby(["doc_a", "doc_b"], sort=False)
                  .size().rename("n").reset_index())
            parts.append(df)
            buf_a, buf_b, buffered = [], [], 0

        for s, c in zip(starts, sizes):
            if c < 2:
                continue
            ii, jj = np.triu_indices(int(c), 1)
            buf_a.append(d[s + ii])
            buf_b.append(d[s + jj])
            buffered += len(ii)
            if buffered >= chunk:
                flush()
        flush()
        if not parts:
            return pd.DataFrame(_EMPTY)
        return (pd.concat(parts, ignore_index=True)
                .groupby(["doc_a", "doc_b"], sort=False)["n"]
                .sum().reset_index())

    from fluent_server_ray.stages.groups import map_buckets

    pairs = map_buckets(
        ds.map_batches(skip_empty(fps), batch_format="pyarrow",
                       zero_copy_batch=True),
        per_bucket,
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                   ("n", pa.int64())]), key="_b")
    total = grouped_agg(pairs, keys=["doc_a", "doc_b"],
                        aggs=[("n", "sum")], final="ray")

    def finish(t: pa.Table) -> pa.Table:
        out = pa.table({
            "doc_a": pc.cast(t["doc_a"], pa.int64()),
            "doc_b": pc.cast(t["doc_b"], pa.int64()),
            "n_shared": pc.cast(t["n_sum"], pa.int64()),
        })
        return out.filter(pc.greater_equal(
            out["n_shared"], pa.scalar(min_shared, pa.int64())))

    from fluent_server_ray.stages.aggregate import skip_empty as _se

    return (total.map_batches(_se(finish), batch_format="pyarrow",
                              zero_copy_batch=True)
            .sort(["doc_a", "doc_b"]))


def winnow_pairs_sql(k: int = 8, window: int = 4, min_shared: int = 2,
                     table: str = "documents") -> str:
    from fluent_server_ray.stages.textstats import winnow_fingerprints_sql

    inner = winnow_fingerprints_sql(k=k, window=window, table=table)
    # AS MATERIALIZED: the CTE is referenced twice; DuckDB would
    # otherwise inline and recompute the window scan per reference
    return f"""
WITH fps AS MATERIALIZED (
  SELECT * FROM ({inner}) t
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  count(*) AS n_shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {min_shared}
ORDER BY doc_a, doc_b
""".strip()


def sorted_neighborhood_pairs(ds, id_col: str = "doc_id",
                              text_col: str = "text",
                              key_len: int = 4, window: int = 8,
                              n_buckets: int = 64):
    """Sorted-Neighborhood Method blocking (Hernandez & Stolfo 1995):
    sort the corpus by a deliberately-coarse blocking key (the first
    ``key_len`` codepoints of the text) and emit every candidate pair
    within a sliding window of ``window`` consecutive records — the
    third classic blocking family beside prefix blocking
    (:func:`prefix_block_dupes` — equality on the prefix) and length
    banding (:func:`edit_distance_dupes`): SNM windows SPAN key
    boundaries, catching near-miss keys that equality blocking splits.

    Exact rank, no global sort: global rank over (bkey, id) =
    (rows with a strictly smaller bkey) + (row's position within its
    bkey). The bkey histogram is a bounded driver merge (the blocking
    key is deliberately coarse — that is WHAT makes it a blocking
    key; the base-offset table is |distinct bkeys| and broadcasts in
    the task closure), the within-key position is one bkey bucket
    exchange, and pairing is one rank-window bucket exchange
    (bucket = rank // window, rows ghosted to bucket+1; a pair is
    formed only where its HIGHER rank is primary — exactly once).

    NULL texts are excluded (no sort position). Output: a Dataset
    (id_a, id_b, rank_dist) with id_a < id_b, rank_dist < window,
    sorted — candidate pairs for a downstream verifier
    (:func:`ngram_jaccard_dupes`-style), not confirmed duplicates.
    """
    import pandas as pd

    from fluent_server_ray.stages.aggregate import (grouped_counts,
                                                    skip_empty)
    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.groups import map_buckets

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        return pa.table({
            "id": pc.cast(t[id_col], pa.int64()),
            "bkey": pc.utf8_slice_codeunits(
                pc.cast(t[text_col], pa.string()), 0, key_len),
        })

    keyed = ds.select_columns([id_col, text_col]).map_batches(
        skip_empty(proj), batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    hist = grouped_counts(keyed, ["bkey"], final="driver")
    if hist.num_rows == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "rank_dist": pa.array([], pa.int64())}))
    hdf = hist.to_pandas().sort_values("bkey").reset_index(drop=True)
    counts = hdf["n"].to_numpy().astype(np.int64)
    base = dict(zip(hdf["bkey"],
                    (np.cumsum(counts) - counts).tolist()))

    rank_schema = pa.schema([pa.field("id", pa.int64()),
                             pa.field("rank", pa.int64())])

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bkey", "id"])
        within = g.groupby("bkey", sort=False).cumcount().to_numpy()
        return pd.DataFrame({
            "id": g["id"].to_numpy(),
            "rank": g["bkey"].map(base).to_numpy(dtype=np.int64)
            + within,
        })

    ranked = map_buckets(_with_bucket(keyed, "bkey", n_buckets),
                         rank_bucket, rank_schema)

    def ghost(t: pa.Table) -> pa.Table:
        rank = t["rank"].to_numpy(zero_copy_only=False)
        wb = rank // window
        prim = pa.table({"id": t["id"], "rank": t["rank"],
                         "_wb": pa.array(wb),
                         "_prim": pa.array(
                             np.ones(len(rank), dtype=bool))})
        gh = pa.table({"id": t["id"], "rank": t["rank"],
                       "_wb": pa.array(wb + 1),
                       "_prim": pa.array(
                           np.zeros(len(rank), dtype=bool))})
        return pa.concat_tables([prim, gh])

    pair_schema = pa.schema([pa.field("id_a", pa.int64()),
                             pa.field("id_b", pa.int64()),
                             pa.field("rank_dist", pa.int64())])

    def pair_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("rank").reset_index(drop=True)
        rank = g["rank"].to_numpy(dtype=np.int64)
        ids = g["id"].to_numpy(dtype=np.int64)
        prim = g["_prim"].to_numpy(dtype=bool)
        # for each PRIMARY row j: neighbors i with rank in
        # (rank_j - window, rank_j)
        lo = np.searchsorted(rank, rank - window, side="right")
        hi = np.searchsorted(rank, rank, side="left")
        lo, hi = lo[prim], hi[prim]
        jd = np.flatnonzero(prim)
        counts = hi - lo
        tot = int(counts.sum())
        if tot == 0:
            return pd.DataFrame({
                "id_a": np.asarray([], dtype=np.int64),
                "id_b": np.asarray([], dtype=np.int64),
                "rank_dist": np.asarray([], dtype=np.int64)})
        i_idx = (np.arange(tot)
                 - np.repeat(np.cumsum(counts) - counts, counts)
                 + np.repeat(lo, counts))
        j_idx = np.repeat(jd, counts)
        ia, ib = ids[i_idx], ids[j_idx]
        return pd.DataFrame({
            "id_a": np.minimum(ia, ib),
            "id_b": np.maximum(ia, ib),
            "rank_dist": rank[j_idx] - rank[i_idx],
        })

    ghosted = ranked.map_batches(skip_empty(ghost),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)
    pairs = map_buckets(ghosted, pair_bucket, pair_schema, key="_wb")
    return pairs.sort(["id_a", "id_b"])


def sorted_neighborhood_sql(key_len: int = 4, window: int = 8,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            table: str = "documents") -> str:
    return f"""
WITH r AS (
  SELECT CAST({id_col} AS BIGINT) AS id,
    row_number() OVER (ORDER BY substr({text_col}, 1, {key_len}),
                       {id_col}) - 1 AS rn
  FROM {table} WHERE {text_col} IS NOT NULL
)
SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
  CAST(b.rn - a.rn AS BIGINT) AS rank_dist
FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < {window}
ORDER BY id_a, id_b
""".strip()


def transfer_labels(pairs_ds, labels_ds, id_col: str = "doc_id",
                    label_col: str = "label", n_buckets: int = 64,
                    cols: tuple[str, str] = ("doc_a", "doc_b")):
    """Semi-supervised label TRANSFER across near-dup components —
    the weak-supervision step big-corpus curation runs after
    clustering (a license tag, language id, or toxicity verdict
    established for one copy propagates to its near-duplicates):
    every node of the pair graph takes the MODE of its component's
    KNOWN labels (ties -> smallest label, the :func:`aggregate.
    grouped_mode` rule); a node with its own label KEEPS it;
    components with no labeled member stay NULL.

    Distributed end to end: components via :func:`pair_components`
    (hash-min propagation), (component, label) counts via the
    distributed merge, per-component mode via one component bucket
    exchange (whole-bucket sort + head — components are node-scaled,
    never a driver merge), and two bucketed joins attach mode and own
    labels. Only pair-graph nodes appear (singletons never entered
    the pair set; the caller unions untouched rows).

    Output: Dataset (doc_id, component, label) sorted by doc_id.
    """
    import pandas as pd

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.groups import map_buckets
    from fluent_server_ray.stages.joins import bucketed_hash_join

    # materialize: comp feeds TWO joins — a lazy Dataset would
    # re-execute the whole component propagation (and the pair
    # generation upstream of it) once per consumer (the house
    # double-execution gotcha)
    comp = pair_components(pairs_ds, n_buckets=n_buckets,
                           cols=cols).materialize()  # (doc_id, component)

    def known(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[label_col]))
        return pa.table({
            "doc_id": pc.cast(t[id_col], pa.int64()),
            "_own": pc.cast(t[label_col], pa.string()),
        })

    kn = labels_ds.map_batches(skip_empty(known),
                               batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    # component x known-label counts (distributed merge)
    ck = bucketed_hash_join(comp, kn, key="doc_id",
                            n_buckets=n_buckets)
    counts = grouped_agg(
        ck.map_batches(
            skip_empty(lambda t: pa.table({
                "component": t["component"], "lbl": t["_own"]})
                .group_by(["component", "lbl"])
                .aggregate([([], "count_all")])
                .rename_columns(["component", "lbl", "n"])),
            batch_format="pyarrow", zero_copy_batch=True),
        keys=["component", "lbl"], aggs=[("n", "sum")], final="ray")

    mode_schema = pa.schema([pa.field("component", pa.int64()),
                             pa.field("_mode", pa.string())])

    def per_bucket_mode(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["component", "n_sum", "lbl"],
                          ascending=[True, False, True])
        top = g.groupby("component", sort=False).head(1)
        return pd.DataFrame({"component": top["component"].to_numpy(),
                             "_mode": top["lbl"].to_numpy()})

    from fluent_server_ray.stages.assembly import _with_bucket

    modes = map_buckets(_with_bucket(counts, "component", n_buckets),
                        per_bucket_mode, mode_schema)

    with_mode = bucketed_hash_join(comp, modes, key="component",
                                   how="left", n_buckets=n_buckets)
    full = bucketed_hash_join(with_mode, kn, key="doc_id", how="left",
                              n_buckets=n_buckets)

    def finish(t: pa.Table) -> pa.Table:
        lbl = pc.coalesce(t["_own"], t["_mode"])
        return pa.table({
            "doc_id": t["doc_id"],
            "component": t["component"],
            "label": lbl,
        })

    return full.map_batches(skip_empty(finish), batch_format="pyarrow",
                            zero_copy_batch=True).sort("doc_id")


def transfer_labels_sql(pairs_sql: str, labels_sql: str) -> str:
    """Mirror: recursive-closure components + deterministic mode
    (row_number over n DESC, label ASC) + COALESCE(own, mode).
    ``labels_sql`` yields (doc_id, label) with NULLs allowed."""
    return f"""
WITH RECURSIVE base AS (
  {pairs_sql}
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM base
  UNION ALL SELECT doc_b, doc_a FROM base
), nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
), comp AS (
  SELECT node AS doc_id, min(lbl) AS component FROM reach
  GROUP BY node
), known AS (
  SELECT doc_id, label AS own FROM ({labels_sql})
  WHERE label IS NOT NULL
), cnt AS (
  SELECT c.component, k.own AS lbl,
    CAST(count(*) AS BIGINT) AS n
  FROM comp c JOIN known k ON k.doc_id = c.doc_id
  GROUP BY 1, 2
), mode AS (
  SELECT component, lbl AS cmode FROM (
    SELECT component, lbl,
      row_number() OVER (PARTITION BY component
                         ORDER BY n DESC, lbl) AS rn
    FROM cnt
  ) WHERE rn = 1
)
SELECT c.doc_id, c.component,
  COALESCE(k.own, m.cmode) AS label
FROM comp c
LEFT JOIN mode m ON m.component = c.component
LEFT JOIN known k ON k.doc_id = c.doc_id
ORDER BY c.doc_id
""".strip()


def cross_source_dup_histogram(ds, text_col: str = "text",
                               source_col: str = "source",
                               key_tokens: int | None = None) -> pa.Table:
    """Cross-source duplicate leakage: for texts that appear in MORE
    THAN ONE source, the histogram of how many sources share them —
    the contamination screen run before treating sources as
    independent (a text in k sources inflates any per-source metric
    k ways; :func:`exact_dedup` removes copies, this REPORTS the
    overlap structure).

    Distributed shape: per-batch local (text, source) dedup
    (combiner), distributed distinct merge over the unbounded pair
    space, then a per-text distinct-source rollup whose k>1 rows
    collapse to the bounded (n_sources, n_texts) histogram — the
    corpus never lands on the driver. Output sorted by n_sources.
    """
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[text_col]),
                             pc.is_valid(t[source_col])))
        key = pc.cast(t[text_col], pa.string())
        if key_tokens is not None:
            # first k NON-EMPTY tokens, single-space joined (the
            # phrase_match flatten, rebuilt per doc)
            toks = pc.split_pattern(key, " ")
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            flat = pc.list_flatten(toks)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            lens = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False)
            doc_row = np.repeat(np.arange(len(t), dtype=np.int64),
                                np.asarray(lens, dtype=np.int64))
            keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            doc_row = doc_row[keep]
            words = flat.filter(pa.array(keep))
            ne_lens = np.bincount(doc_row,
                                  minlength=len(t)).astype(np.int64)
            starts = np.cumsum(ne_lens) - ne_lens
            pos = (np.arange(len(doc_row), dtype=np.int64)
                   - np.repeat(starts, ne_lens))
            import pandas as pd
            head = pos < key_tokens
            joined = (pd.Series(np.asarray(words, dtype=object)[head])
                      .groupby(doc_row[head]).agg(" ".join))
            keys = np.full(len(t), "", dtype=object)
            keys[joined.index.to_numpy()] = joined.to_numpy()
            key = pa.array(keys, pa.string())
        return (pa.table({"text": key, "src": t[source_col]})
                .group_by(["text", "src"]).aggregate([]))

    ts = grouped_agg(
        ds.select_columns([text_col, source_col]).map_batches(
            skip_empty(partial), batch_format="pyarrow",
            zero_copy_batch=True),
        keys=["text", "src"], aggs=[("text", "count")],
        final="ray").drop_columns(["text_count"])

    def one(t: pa.Table) -> pa.Table:
        ones = pa.array(np.ones(t.num_rows, dtype=np.int64))
        return pa.table({"text": t["text"], "one": ones})

    per_text = grouped_agg(
        ts.map_batches(one, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["text"], aggs=[("one", "sum")], final="ray")

    def hist_partial(t: pa.Table) -> pa.Table:
        k = pc.cast(t["one_sum"], pa.int64())
        sub = pa.table({"n_sources": k}).filter(pc.greater(k, 1))
        return (sub.group_by("n_sources")
                .aggregate([([], "count_all")])
                .rename_columns(["n_sources", "c"]))

    hist = grouped_agg(
        per_text.map_batches(skip_empty(hist_partial),
                             batch_format="pyarrow",
                             zero_copy_batch=True),
        keys=["n_sources"], aggs=[("c", "sum")], final="driver")
    out = hist.to_pandas().sort_values("n_sources") if hist.num_rows \
        else None
    if out is None or out.empty:
        return pa.table({"n_sources": pa.array([], pa.int64()),
                         "n_texts": pa.array([], pa.int64())})
    return pa.table({
        "n_sources": pa.array(out["n_sources"].astype("int64"),
                              pa.int64()),
        "n_texts": pa.array(out["c_sum"].astype("int64"), pa.int64()),
    })


def cross_source_dup_histogram_sql(text_col: str = "text",
                                   source_col: str = "source",
                                   key_tokens: int | None = None,
                                   table: str = "documents") -> str:
    key = (text_col if key_tokens is None else
           f"array_to_string((list_filter(string_split({text_col}, "
           f"' '), x -> x <> ''))[1:{key_tokens}], ' ')")
    return f"""
WITH ts AS (
  SELECT DISTINCT {key} AS text, {source_col} AS src
  FROM {table}
  WHERE {text_col} IS NOT NULL AND {source_col} IS NOT NULL
), per_text AS (
  SELECT text, CAST(count(*) AS BIGINT) AS k FROM ts GROUP BY text
)
SELECT k AS n_sources, CAST(count(*) AS BIGINT) AS n_texts
FROM per_text WHERE k > 1
GROUP BY k ORDER BY k
""".strip()


# ------------------------------------ blocking-quality evaluation

def blocking_eval(ds, prefix_len: int = 12, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """Candidate-generator quality report: precision/recall of the
    PREFIX-BLOCKING candidate pairs (docs sharing their first
    ``prefix_len`` chars — :func:`prefix_block_dupes`' key) against
    the NORMALIZED-exact-dup truth pairs (same canonical text under
    :func:`hygiene.normalize_text`'s case/spacing/control folding) —
    the eval a pipeline owner reads before trusting a cheap blocking
    key to feed an expensive verifier.

    Counts are computed WITHOUT materializing any pair: every metric
    is Σ m·(m−1)/2 over a grouped count (candidates by block key,
    truth by normalized fingerprint, true-positives by the pair of
    both), so the exchanges carry one row per distinct key. Pair
    counts accumulate as python ints (HUGEINT mirror) and are
    range-guarded into BIGINT. NULL texts are excluded (a NULL
    blocking key can never join in the mirror).

    Returns ONE row: (cand_pairs, true_pairs, tp_pairs,
    precision_millionths, recall_millionths) — precision/recall NULL
    when their denominator is 0."""
    import hashlib

    from fluent_server_ray.stages.aggregate import grouped_counts, skip_empty

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        text = t[text_col]
        bkey = pc.utf8_slice_codeunits(text, 0, prefix_len)
        norm = pc.replace_substring_regex(
            text, r"[\x00-\x08\x0E-\x1B\x7F]", "")
        norm = pc.replace_substring_regex(norm, _PY_WHITESPACE_RE2, " ")
        norm = pc.utf8_lower(pc.utf8_trim(norm, " "))
        nfp = pa.array(
            [hashlib.md5(x.encode("utf-8")).hexdigest()
             for x in norm.to_pylist()], pa.string())
        return pa.table({"bkey": bkey, "nfp": nfp})

    proj_ds = ds.select_columns([text_col]).map_batches(
        skip_empty(proj), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # three count consumers — never re-scan the corpus

    def pairs_partial(t: pa.Table) -> pa.Table:
        s = sum(int(n) * (int(n) - 1) // 2 for n in t["n"].to_pylist())
        return pa.table({"p": pa.array([str(s)], pa.string())})

    def pair_sum(keys: list[str]) -> int:
        cnt = grouped_counts(proj_ds.select_columns(keys), keys,
                             final="ray")
        total = 0
        for b in (cnt.map_batches(skip_empty(pairs_partial),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)
                  .iter_batches(batch_size=None, batch_format="pyarrow")):
            total += sum(int(x) for x in b["p"].to_pylist())
        return total

    cand = pair_sum(["bkey"])
    true_p = pair_sum(["nfp"])
    tp = pair_sum(["bkey", "nfp"])
    for v in (cand, true_p, tp):
        if v >= (1 << 63):
            raise ValueError("blocking_eval: pair count exceeds BIGINT"
                             " — the output cast would overflow")
    return pa.table({
        "cand_pairs": pa.array([cand], pa.int64()),
        "true_pairs": pa.array([true_p], pa.int64()),
        "tp_pairs": pa.array([tp], pa.int64()),
        "precision_millionths": pa.array(
            [10**6 * tp // cand if cand else None], pa.int64()),
        "recall_millionths": pa.array(
            [10**6 * tp // true_p if true_p else None], pa.int64()),
    })


def blocking_eval_sql(prefix_len: int = 12, text_col: str = "text",
                      table: str = "documents") -> str:
    norm = (f"lower(trim(regexp_replace(regexp_replace({text_col},"
            "'[\\x00-\\x08\\x0E-\\x1B\\x7F]', '', 'g'),"
            f"'{_PY_WHITESPACE_RE2}', ' ', 'g'), ' '))")
    return f"""
WITH d AS MATERIALIZED (
  SELECT substr({text_col}, 1, {prefix_len}) AS bkey, md5({norm}) AS nfp
  FROM {table} WHERE {text_col} IS NOT NULL
), c AS (
  SELECT COALESCE(sum(m * (m - 1) // 2), CAST(0 AS HUGEINT)) AS p
  FROM (SELECT CAST(count(*) AS HUGEINT) AS m FROM d GROUP BY bkey)
), t AS (
  SELECT COALESCE(sum(m * (m - 1) // 2), CAST(0 AS HUGEINT)) AS p
  FROM (SELECT CAST(count(*) AS HUGEINT) AS m FROM d GROUP BY nfp)
), tp AS (
  SELECT COALESCE(sum(m * (m - 1) // 2), CAST(0 AS HUGEINT)) AS p
  FROM (SELECT CAST(count(*) AS HUGEINT) AS m
        FROM d GROUP BY bkey, nfp)
)
SELECT CAST(c.p AS BIGINT) AS cand_pairs,
  CAST(t.p AS BIGINT) AS true_pairs,
  CAST(tp.p AS BIGINT) AS tp_pairs,
  CAST((1000000 * tp.p) // NULLIF(c.p, 0) AS BIGINT)
    AS precision_millionths,
  CAST((1000000 * tp.p) // NULLIF(t.p, 0) AS BIGINT)
    AS recall_millionths
FROM c, t, tp
""".strip()
