"""Mergeable sketches: HyperLogLog approximate distinct count.

The reference has no sketches (SURVEY.md §2.5) and its exact grouped
counts stay exact here; HLL is the beyond-reference capability for
cardinalities too large to count exactly (distinct conv_ids / users /
ngrams at 10^12 rows): each batch emits ONE serialized register array,
registers merge by element-wise max (associative + commutative +
idempotent), so the shuffle carries ``O(blocks × 2^p)`` bytes no matter
how many rows flow.

Implementation: classic HLL (Flajolet et al.) with 2^p registers,
deterministic 64-bit hashing via ``pandas.util.hash_array`` (fixed-key
SipHash — never Python's ``hash()``), numpy-vectorized register
updates, and the standard bias corrections for small/large ranges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


class HyperLogLog:
    def __init__(self, p: int = 12):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_values(self, values: np.ndarray) -> None:
        h = pd.util.hash_array(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining 64-p bits, left-aligned
        # rho = leading zeros of `rest` + 1 (capped); vectorized via
        # float64 log2 on the high bits is inexact — use bit scans
        rho = np.full(len(h), 64 - self.p + 1, dtype=np.uint8)
        nonzero = rest != 0
        # position of highest set bit of rest (63..0)
        hb = np.zeros(len(h), dtype=np.int64)
        r = rest[nonzero]
        hb_nz = np.zeros(len(r), dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            ge = r >= (np.uint64(1) << np.uint64(shift))
            hb_nz[ge] += shift
            r = np.where(ge, r >> np.uint64(shift), r)
        hb[nonzero] = hb_nz
        rho[nonzero] = (63 - hb[nonzero] + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)  # linear counting
        return float(e)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        h = cls(data[0])
        h.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return h


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate distinct count of a column: one sketch per batch,
    element-wise-max merge on the driver (sketches are tiny)."""

    def sketch_batch(t: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        vals = t[col].to_numpy(zero_copy_only=False)
        h.add_values(np.asarray(vals, dtype=object))
        return pa.table({"sketch": pa.array([h.serialize()], type=pa.binary())})

    merged = HyperLogLog(p)
    for batch in ds.map_batches(
        sketch_batch, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in batch["sketch"].to_pylist():
            merged.merge(HyperLogLog.deserialize(blob))
    return merged.estimate()


def exact_distinct_count(ds, col: str, n_buckets: int = 64) -> int:
    """EXACT global ``count(DISTINCT col)`` — the deterministic twin
    the HLL estimate is checked against: per-batch local dedup, ONE
    value-hash bucket exchange (only distinct values move), per-bucket
    distinct counts, ≤ ``n_buckets`` ints to the driver. Reuses
    :func:`aggregate.grouped_distinct_count` with a constant group
    key. NULLs are not counted (SQL count(DISTINCT))."""
    import pyarrow as pa

    from fluent_server_ray.stages.aggregate import grouped_distinct_count

    def add_g(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_g", pa.array(np.zeros(len(t), dtype=np.int64)))

    with_g = ds.map_batches(add_g, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = grouped_distinct_count(with_g, "_g", col,
                                 n_buckets=n_buckets).to_pandas()
    return 0 if out.empty else int(out["n_distinct"].iloc[0])


def accumulate_histogram(ds, col: str, lo: float, hi: float,
                         bins: int) -> np.ndarray:
    """THE fixed-edge histogram rule, shared by every bucket-contract
    operator (quantiles here, ``features.percentile_rank``'s CDF):
    per-batch bincount partials (the combiner — histograms add), one
    tiny vector to merge per block. NULL/NaN rows are no measurement —
    dropping matches the SQL mirrors' ``IS NOT NULL`` (clipping would
    silently inflate bucket 0 and shift every quantile left); values
    outside [lo, hi) clip to the edge buckets. Returns the merged
    int64 count vector."""
    import pyarrow as pa

    width = (hi - lo) / bins

    def hist_batch(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        vals = vals[~np.isnan(vals)]
        idx = np.floor((vals - lo) / width).astype(np.int64)
        idx = np.clip(idx, 0, bins - 1)
        counts = np.bincount(idx, minlength=bins).astype(np.int64)
        return pa.table({"hist": pa.array([counts.tobytes()], type=pa.binary())})

    total = np.zeros(bins, dtype=np.int64)
    for batch in ds.map_batches(
        hist_batch, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in batch["hist"].to_pylist():
            total += np.frombuffer(blob, dtype=np.int64)
    return total


def binned_quantiles(ds, col: str, lo: float, hi: float, bins: int = 1000,
                     qs: tuple[float, ...] = (0.5, 0.95, 0.99)):
    """Distributed histogram quantiles over the shared
    :func:`accumulate_histogram` rule: quantile = lower edge of the
    first bin whose cumulative count reaches ceil(q*n). Deterministic
    integer outputs, so an SQL engine reproduces it exactly (unlike
    interpolated quantiles).

    Returns a pyarrow Table (q, bucket_idx, bucket_lo, n_total).
    """
    import pyarrow as pa

    width = (hi - lo) / bins
    total = accumulate_histogram(ds, col, lo, hi, bins)
    n = int(total.sum())
    out_q, out_idx, out_lo = [], [], []
    if n == 0:  # empty / all-NULL input → no rows (the SQL mirror's
        # totals CTE filters the NULL-sum row away identically)
        return pa.table(
            {
                "q": pa.array([], type=pa.float64()),
                "bucket_idx": pa.array([], type=pa.int64()),
                "bucket_lo": pa.array([], type=pa.float64()),
                "n_total": pa.array([], type=pa.int64()),
            }
        )
    cum = np.cumsum(total)
    for q in qs:
        target = int(np.ceil(q * n))
        bucket = int(np.searchsorted(cum, target))
        out_q.append(q)
        out_idx.append(bucket)
        out_lo.append(lo + bucket * width)
    return pa.table(
        {
            "q": pa.array(out_q, type=pa.float64()),
            "bucket_idx": pa.array(out_idx, type=pa.int64()),
            "bucket_lo": pa.array(out_lo, type=pa.float64()),
            "n_total": pa.array([n] * len(qs), type=pa.int64()),
        }
    )


def binned_quantiles_sql(col: str, lo: float, hi: float, bins: int = 1000,
                         qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                         table: str = "events") -> str:
    """Exact SQL mirror of the histogram-quantile rule."""
    width = (hi - lo) / bins
    q_rows = ", ".join(f"({q})" for q in qs)
    return f"""
WITH buckets AS (
  SELECT LEAST(GREATEST(CAST(floor(({col} - {lo}) / {width}) AS BIGINT), 0),
               {bins - 1}) AS bucket_idx,
         count(*) AS c
  FROM {table} WHERE {col} IS NOT NULL GROUP BY 1
), cum AS (
  SELECT bucket_idx, sum(c) OVER (ORDER BY bucket_idx
                                  ROWS UNBOUNDED PRECEDING) AS cum_c
  FROM buckets
), totals AS (SELECT sum(c) AS n FROM buckets HAVING count(*) > 0),
qs(q) AS (VALUES {q_rows})
SELECT q,
  (SELECT min(bucket_idx) FROM cum
    WHERE cum_c >= CAST(ceil(q * totals.n) AS BIGINT)) AS bucket_idx,
  {lo} + (SELECT min(bucket_idx) FROM cum
           WHERE cum_c >= CAST(ceil(q * totals.n) AS BIGINT)) * {width}
    AS bucket_lo,
  CAST(totals.n AS BIGINT) AS n_total
FROM qs, totals
""".strip()



def grouped_binned_quantiles(ds, group_col: str, col: str, lo: float,
                             hi: float, bins: int = 1000,
                             qs: tuple[float, ...] = (0.5, 0.95, 0.99)):
    """Per-GROUP histogram quantiles — the keyed sibling of
    :func:`binned_quantiles` (p50/p95/p99 per event type, per tenant,
    per language: the standard curation dashboard shape).

    Combiner: each batch bins its values and bincounts over the
    COMBINED key ``group_code * bins + bin_idx`` (one vectorized
    bincount regardless of group count), emitting one (group,
    histogram-blob) row per group per batch. Driver merge holds
    |groups| × bins int64 — the bounded-key-space contract (same as
    ``grouped_counts(final='driver')``); an unbounded group column
    belongs in a hash-bucketed ``map_groups`` variant instead.
    Quantile rule identical to the ungrouped sketch (lower edge of the
    first bin reaching ceil(q·n)) — deterministic integers, exact SQL
    mirror.

    Returns a pyarrow Table (group_col, q, bucket_idx, bucket_lo,
    n_total) sorted by (group_col, q).
    """
    import pyarrow as pa

    width = (hi - lo) / bins

    def hist_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = pc.dictionary_encode(
            pc.fill_null(pc.cast(t[group_col], pa.string()), "")
        )
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = keys.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = keys.dictionary.to_pylist()
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(vals)  # NULL value rows drop (mirror: IS NOT NULL)
        vals, codes = vals[ok], codes[ok]
        idx = np.clip(
            np.floor((vals - lo) / width).astype(np.int64), 0, bins - 1
        )
        combined = codes * bins + idx
        counts = np.bincount(combined, minlength=len(uniq) * bins)
        counts = counts.reshape(len(uniq), bins).astype(np.int64)
        return pa.table(
            {
                "g": pa.array(uniq, type=pa.string()),
                "hist": pa.array([c.tobytes() for c in counts],
                                 type=pa.binary()),
            }
        )

    from fluent_server_ray.stages.aggregate import skip_empty

    totals: dict = {}
    for batch in ds.map_batches(
        skip_empty(hist_batch), batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for g, blob in zip(batch["g"].to_pylist(), batch["hist"].to_pylist()):
            vec = np.frombuffer(blob, dtype=np.int64)
            if g in totals:
                totals[g] = totals[g] + vec
            else:
                totals[g] = vec.copy()

    out_g, out_q, out_idx, out_lo, out_n = [], [], [], [], []
    for g in sorted(totals):
        total = totals[g]
        n = int(total.sum())
        if n == 0:  # group had only NULL values → no row (mirror: the
            continue  # WHERE filter leaves no bucket rows for it)
        cum = np.cumsum(total)
        for q in qs:
            target = int(np.ceil(q * n))
            bucket = int(np.searchsorted(cum, target))
            out_g.append(g)
            out_q.append(q)
            out_idx.append(bucket)
            out_lo.append(lo + bucket * width)
            out_n.append(n)
    return pa.table(
        {
            group_col: pa.array(out_g, type=pa.string()),
            "q": pa.array(out_q, type=pa.float64()),
            "bucket_idx": pa.array(out_idx, type=pa.int64()),
            "bucket_lo": pa.array(out_lo, type=pa.float64()),
            "n_total": pa.array(out_n, type=pa.int64()),
        }
    )


def grouped_binned_quantiles_sql(group_col: str, col: str, lo: float,
                                 hi: float, bins: int = 1000,
                                 qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                                 table: str = "events") -> str:
    """Exact SQL mirror of the per-group histogram-quantile rule."""
    width = (hi - lo) / bins
    q_rows = ", ".join(f"({q})" for q in qs)
    return f"""
WITH buckets AS (
  SELECT COALESCE(CAST({group_col} AS VARCHAR), '') AS g,
         LEAST(GREATEST(CAST(floor(({col} - {lo}) / {width}) AS BIGINT), 0),
               {bins - 1}) AS bucket_idx,
         count(*) AS c
  FROM {table} WHERE {col} IS NOT NULL GROUP BY 1, 2
), cum AS (
  SELECT g, bucket_idx,
         sum(c) OVER (PARTITION BY g ORDER BY bucket_idx
                      ROWS UNBOUNDED PRECEDING) AS cum_c
  FROM buckets
), totals AS (SELECT g, sum(c) AS n FROM buckets GROUP BY g),
qs(q) AS (VALUES {q_rows})
SELECT t.g AS {group_col}, q,
  (SELECT min(bucket_idx) FROM cum
    WHERE cum.g = t.g
      AND cum_c >= CAST(ceil(q * t.n) AS BIGINT)) AS bucket_idx,
  {lo} + (SELECT min(bucket_idx) FROM cum
           WHERE cum.g = t.g
             AND cum_c >= CAST(ceil(q * t.n) AS BIGINT)) * {width}
    AS bucket_lo,
  CAST(t.n AS BIGINT) AS n_total
FROM qs, totals t
""".strip()


class BloomFilter:
    """Numpy-backed Bloom filter: the broadcast-side structure for
    semi/anti joins whose key set is too large to ship exactly (the
    100 TB path noted in relational.customers_without_orders). Mergeable
    by OR; deterministic (fixed-key SipHash double hashing).

    False positives only: a semi join keeps a few extra rows (verify
    downstream); an anti join may drop a few matches — callers choose
    fpr accordingly.
    """

    def __init__(self, n_items: int, fpr: float = 0.01):
        m = int(np.ceil(-n_items * np.log(fpr) / (np.log(2) ** 2)))
        self.m = max(64, m)
        self.k = max(1, int(round((self.m / max(1, n_items)) * np.log(2))))
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _positions(self, values: np.ndarray) -> np.ndarray:
        h1 = pd.util.hash_array(values)
        h2 = pd.util.hash_array(values, hash_key="fedcba9876543210")
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(self.m)).astype(
            np.int64
        )

    def add(self, values: np.ndarray) -> None:
        pos = self._positions(np.asarray(values, dtype=object)).ravel()
        np.bitwise_or.at(
            self.bits, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64)
        )

    def contains(self, values: np.ndarray) -> np.ndarray:
        pos = self._positions(np.asarray(values, dtype=object))
        got = (self.bits[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
        return got.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


class MisraGries:
    """Misra-Gries heavy-hitters sketch (weighted, mergeable).

    Capacity-``m`` counter summary of a weighted key stream: every key
    whose true weight exceeds ``W/(m+1)`` (W = total weight) is
    GUARANTEED present, and each estimate undercounts its true weight
    by at most ``W/(m+1)`` — the classic deterministic frequent-items
    bound. Mergeable: combine two summaries by summing counters, then
    subtracting the (m+1)-th largest value and dropping non-positives
    (Agarwal et al.'s mergeable-summaries rule), so per-block partials
    reduce like any combiner. With ``m`` ≥ distinct-keys the sketch
    degenerates to EXACT counts — which makes the driver query
    oracle-checkable at test scale while the same code path bounds
    memory at 100 TB tag cardinalities.
    """

    def __init__(self, capacity: int):
        assert capacity >= 1
        self.capacity = capacity
        self.counters: dict = {}

    def update_counts(self, keys, weights) -> "MisraGries":
        for k, w in zip(keys, weights):
            c = self.counters
            if k in c:
                c[k] += int(w)
            else:
                c[k] = int(w)
        self._shrink()
        return self

    def _shrink(self) -> None:
        c = self.counters
        if len(c) <= self.capacity:
            return
        # subtract the (capacity+1)-th largest count from everyone,
        # drop the non-positive — one deterministic pass
        vals = sorted(c.values(), reverse=True)
        dec = vals[self.capacity]
        self.counters = {k: v - dec for k, v in c.items() if v - dec > 0}

    def merge(self, other: "MisraGries") -> "MisraGries":
        assert self.capacity == other.capacity
        for k, w in other.counters.items():
            self.counters[k] = self.counters.get(k, 0) + w
        self._shrink()
        return self

    def top(self, k: int) -> list[tuple[str, int]]:
        """(key, estimate) sorted by (estimate desc, key asc); a None
        key (nulls in the counted column) sorts AFTER every string on
        ties — SQL's NULLS-LAST — instead of raising on None < str."""
        return sorted(
            self.counters.items(),
            key=lambda kv: (-kv[1], kv[0] is None, kv[0] or ""),
        )[:k]


def heavy_hitters(ds, col: str, k: int = 10, capacity: int = 256):
    """Top-k keys of ``col`` by count via per-block EXACT partial counts
    (bounded by per-block cardinality) merged through a Misra-Gries
    summary of ``capacity`` counters — the shuffle-free heavy-hitter
    path: what reaches the driver is one bounded summary per block, no
    matter the key cardinality. Exact (oracle-checkable) whenever
    ``capacity`` ≥ distinct keys; otherwise estimates carry the
    deterministic W/(capacity+1) undercount bound.

    Returns a pyarrow Table (key, n) sorted by (n desc, key asc).
    """
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import _partial_counts

    count_fn = _partial_counts([col])  # the shared combiner, not a copy

    def partial(t: pa.Table) -> pa.Table:
        # canonicalize to string up front: the sketch keys and the
        # string-typed output column must accept any input dtype, and
        # nulls stay null (SQL groups NULL as its own key)
        t = pa.table({col: pc.cast(t[col], pa.string())})
        return count_fn(t)

    sketch = MisraGries(capacity)
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        sketch.update_counts(b[col].to_pylist(), b["n"].to_pylist())
    top = sketch.top(k)
    return pa.table(
        {
            col: pa.array([t[0] for t in top], type=pa.string()),
            "n": pa.array([t[1] for t in top], type=pa.int64()),
        }
    )


# ------------------------------------------------ count-min sketch

CMS_WIDTH = 2048
CMS_DEPTH = 4
# 16-byte SipHash keys for pandas hash_array — one independent hash
# row per depth; fixed constants keep the sketch deterministic across
# processes/nodes (same discipline as hash_bucket_array).
_CMS_KEYS = [f"fsr-cms-{d:08d}" for d in range(CMS_DEPTH)]


def _cms_batch(values, width: int = CMS_WIDTH,
               depth: int = CMS_DEPTH) -> np.ndarray:
    """depth×width int64 count matrix of one batch of string values —
    the per-block combiner (count-min sketches ADD, like histograms)."""
    import pandas as pd

    vals = np.asarray(values, dtype=object)
    m = np.zeros((depth, width), dtype=np.int64)
    for d in range(depth):
        h = pd.util.hash_array(vals, hash_key=_CMS_KEYS[d]) % width
        m[d] += np.bincount(h.astype(np.int64), minlength=width)
    return m


def cms_build(ds, col: str, width: int = CMS_WIDTH,
              depth: int = CMS_DEPTH) -> np.ndarray:
    """Build a count-min sketch over a column: per-block partial
    matrices (one depth×width int64 blob per block, independent of
    row count or key cardinality), merged by addition on the driver —
    O(blocks × depth × width) driver work, nothing key-sized ever
    ships. The point-estimate upper-bounds the true count with
    overestimate ≤ e/width · N at probability 1 − e^−depth (Cormode &
    Muthukrishnan 2005 conventions)."""
    import pyarrow as pa

    def partial(t: pa.Table):
        if len(t) == 0:
            return
        vals = pc.fill_null(pc.cast(t[col], pa.string()), "").to_numpy(
            zero_copy_only=False
        )
        yield pa.table(
            {"m": pa.array([_cms_batch(vals, width, depth).tobytes()],
                           type=pa.binary())}
        )

    total = np.zeros((depth, width), dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for blob in b["m"].to_pylist():
            total += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)
    return total


def cms_query(sketch: np.ndarray, keys: list[str]):
    """Point estimates (min over depth rows) for the given keys.
    width/depth come from ``sketch.shape`` — a build/query geometry
    mismatch cannot silently break the overestimate bound."""
    import pandas as pd

    depth, width = sketch.shape
    vals = np.asarray([k if k is not None else "" for k in keys],
                      dtype=object)
    est = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        h = pd.util.hash_array(vals, hash_key=_CMS_KEYS[d]) % width
        est = np.minimum(est, sketch[d, h.astype(np.int64)])
    return est


# --------------------------------------- KMV (k minimum values) sketch

class KMVSketch:
    """Bottom-k / K-Minimum-Values sketch (Bar-Yossef et al. 2002;
    Beyer et al. 2007 for the unbiased estimator): keep the k smallest
    64-bit hashes of a set. Mergeable (union = bottom-k of the
    concatenation), and — unlike HLL — supports JACCARD estimation
    between two sketches, which is what cross-corpus OVERLAP questions
    need ("how much of corpus A's shingle space is in benchmark B?")
    without materializing either side's key set.

    distinct ≈ (k-1) / kth_min_normalized; jaccard ≈ |bottom-k of the
    union shared by both| / k. Deterministic (pandas SipHash, fixed
    key). Exact when the set has < k distinct values (the sketch then
    IS the hash set)."""

    def __init__(self, k: int = 1024):
        self.k = int(k)
        self.hashes = np.array([], dtype=np.uint64)

    def add_values(self, values: np.ndarray) -> None:
        import pandas as pd

        if not len(values):
            return
        h = pd.util.hash_array(np.asarray(values, dtype=object))
        self.hashes = np.unique(np.concatenate([self.hashes, h]))[: self.k]

    def merge(self, other: "KMVSketch") -> "KMVSketch":
        out = KMVSketch(self.k)
        out.hashes = np.unique(
            np.concatenate([self.hashes, other.hashes])
        )[: self.k]
        return out

    def estimate(self) -> float:
        n = len(self.hashes)
        if n < self.k:  # exact regime
            return float(n)
        kth = float(self.hashes[self.k - 1]) / float(2**64)
        return (self.k - 1) / kth

    def jaccard(self, other: "KMVSketch") -> float:
        """Estimate J(A,B) from the bottom-k of the UNION."""
        union = np.unique(np.concatenate([self.hashes, other.hashes]))
        kk = min(self.k, len(union))
        if kk == 0:
            return 0.0
        low = union[:kk]
        both = np.intersect1d(low, self.hashes, assume_unique=True)
        both = np.intersect1d(both, other.hashes, assume_unique=True)
        return float(len(both)) / float(kk)

    def serialize(self) -> bytes:
        return np.concatenate(
            [np.array([self.k], dtype=np.uint64), self.hashes]
        ).tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "KMVSketch":
        arr = np.frombuffer(data, dtype=np.uint64)
        out = cls(int(arr[0]))
        out.hashes = arr[1:].copy()
        return out


def kmv_sketch(ds, col: str, k: int = 1024) -> KMVSketch:
    """Distributed KMV build: one sketch per block (the per-batch
    combiner — k hashes each), merged on the driver (O(blocks·k),
    independent of corpus size)."""
    def sk_batch(t: pa.Table) -> pa.Table:
        s = KMVSketch(k)
        s.add_values(t[col].to_numpy(zero_copy_only=False))
        return pa.table({"sk": pa.array([s.serialize()], type=pa.binary())})

    from fluent_server_ray.stages.aggregate import skip_empty

    out = KMVSketch(k)
    for b in (ds.map_batches(skip_empty(sk_batch), batch_format="pyarrow",
                             zero_copy_batch=True)
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        for blob in b["sk"].to_pylist():
            out = out.merge(KMVSketch.deserialize(blob))
    return out


def corpus_overlap_estimate(ds_a, ds_b, col: str, k: int = 1024) -> pa.Table:
    """Cross-corpus overlap report from two KMV sketches — the
    contamination-scale question ("what fraction of pretraining
    shingles appear in the eval set?") answered with two O(blocks·k)
    reduces and ZERO joins/shuffles. Returns one row:
    (distinct_a, distinct_b, jaccard, overlap_est =
    J/(1+J)·(|A|+|B|), the inclusion-exclusion intersection)."""
    sa = kmv_sketch(ds_a, col, k)
    sb = kmv_sketch(ds_b, col, k)
    da, db = sa.estimate(), sb.estimate()
    j = sa.jaccard(sb)
    inter = j / (1.0 + j) * (da + db) if j > 0 else 0.0
    return pa.table({
        "distinct_a": pa.array([da], type=pa.float64()),
        "distinct_b": pa.array([db], type=pa.float64()),
        "jaccard": pa.array([j], type=pa.float64()),
        "overlap_est": pa.array([inter], type=pa.float64()),
    })
