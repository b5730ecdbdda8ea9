"""Similarity search over embedding columns.

- ``ann_topk`` — brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put``); each batch does one float64 numpy
  matmul against it and emits only its local top-k per query (a
  combiner), so the driver merge sees ``O(num_blocks * Q * k)`` rows,
  never the corpus. This is the exact baseline.
- ``LSHBucketStage`` — the scale path: sign-random-projection LSH
  bucket keys (one groupby shuffle on the bucket key); search happens
  within buckets only. Recall < 1 by construction → no SQL oracle.
- ``cosine_dupes`` — embedding near-duplicate pairs (cosine ≥ t)
  within LSH buckets, or exact within blocks for oracle checking.

Float determinism note: all scores are computed in float64 with
per-row reductions (numpy dot), matching what an independent engine
computes; outputs expose only integer ids ordered by (score desc, id)
so ulp-level differences cannot flip set equality except at exact
ties, which the synthetic data does not contain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """list<float> column → (n, d) float64 matrix (flat zero-copy read;
    flatten() respects list offsets after slicing)."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def ann_topk(ds, query_ids: list[int], k: int = 5, id_col: str = "vec_id",
             emb_col: str = "embedding"):
    """Exact cosine top-k neighbors for each query id (self excluded).

    Returns a pandas DataFrame (query_id, neighbor_id, rank) with rank
    1..k by (cosine desc, neighbor_id asc).
    """
    import ray

    # fetch the query vectors (tiny: filter on an int set, no shuffle)
    qset = set(query_ids)

    def grab_queries(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(t[id_col], value_set=pa.array(list(qset)))
        return t.filter(mask)

    qtab = pa.concat_tables(
        ds.map_batches(grab_queries, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    qid_np = qtab[id_col].to_numpy()
    order = np.argsort(qid_np)
    qids = qid_np[order]
    qmat = _normalize(_batch_matrix(qtab, emb_col)[order])
    qref = ray.put((qids, qmat))

    def local_topk(t: pa.Table) -> pa.Table:
        ids_q, mat_q = ray.get(qref)  # zero-copy numpy from plasma
        ids = t[id_col].to_numpy().astype(np.int64)
        mat = _normalize(_batch_matrix(t, emb_col))
        sims = mat_q @ mat.T  # (Q, n)
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, sims.shape[1])  # +1 in case self is in this batch
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, kk - 1)[:kk]
            for j in top:
                if ids[j] != ids_q[qi]:
                    out_q.append(int(ids_q[qi]))
                    out_n.append(int(ids[j]))
                    out_s.append(float(row[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = pa.concat_tables(
        ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ).to_pandas()
    # final merge: per query, global top-k with deterministic tie-break
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    out = partials.groupby("query_id", sort=True).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def ann_topk_sql(query_ids: list[int], k: int = 5,
                 table: str = "embeddings") -> str:
    ids = ", ".join(str(i) for i in sorted(query_ids))
    return f"""
WITH sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, c.embedding) AS cosine
  FROM {table} q JOIN {table} c ON q.vec_id <> c.vec_id
  WHERE q.vec_id IN ({ids})
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
""".strip()


class LSHBucketStage:
    """Sign-random-projection bucket keys per vector.

    ``n_tables == 1``: appends one ``bucket`` column (vectors sharing
    all ``n_planes`` signs collide). ``n_tables > 1``: the multi-table
    LSH used for near-dup RECALL — each vector explodes into
    ``n_tables`` rows keyed ``(table_id, bucket)`` with independent
    plane sets; a pair is a candidate if it collides in ANY table.
    Collision prob per pair: ``1 - (1 - p^k)^L`` with
    ``p = 1 - acos(cos) / pi`` — pick ``n_planes`` (k) for bucket
    granularity and ``n_tables`` (L) for recall; low thresholds need
    small k / larger L (shuffle volume is L × corpus)."""

    def __init__(self, dim: int, n_planes: int = 8, n_tables: int = 1,
                 seed: int = 11, emb_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, dim, n_planes))
        self.n_tables = n_tables
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, self.emb_col)
        weights = 1 << np.arange(self.planes.shape[2])
        if self.n_tables == 1:
            bucket = ((mat @ self.planes[0]) > 0) @ weights
            return batch.append_column(
                "bucket", pa.array(bucket.astype(np.int64))
            )
        parts = []
        for ti in range(self.n_tables):
            bucket = ((mat @ self.planes[ti]) > 0) @ weights
            parts.append(
                batch.append_column(
                    "table_id", pa.array(np.full(len(batch), ti, dtype=np.int64))
                ).append_column("bucket", pa.array(bucket.astype(np.int64)))
            )
        return pa.concat_tables(parts)


def cosine_dupes(ds, threshold: float = 0.95, id_col: str = "vec_id",
                 emb_col: str = "embedding", exact: bool = False,
                 n_planes: int = 2, n_tables: int = 24,
                 dim: int | None = None, n_buckets: int = 64):
    """Embedding near-duplicate pairs (cosine >= threshold, a < b).

    exact=False (default — the scale path): multi-table
    sign-projection LSH, candidate pairs generated ONLY within
    ``(table_id, bucket)`` groups (one shuffle of L × corpus rows),
    each candidate verified with the exact cosine inside its group —
    precision is exact, recall is ``1-(1-p^k)^L`` (≈1 - 3e-6 per pair
    at the defaults for cosine 0.43). Duplicate discoveries across
    tables collapse via a distributed distinct keyed on
    ``hash(vec_a) % n_buckets``. Returns a **Dataset** (vec_a, vec_b):
    neither the corpus NOR the result pair set (corpus-scale on
    near-dup-heavy corpora) ever concatenates on the driver.

    exact=True: all-pairs O(n²) matmul on the driver, returning a
    pandas DataFrame — the recall baseline for tests (fine to ~10^5
    vectors; never the scale path).
    """
    if exact:
        tab = pa.concat_tables(
            ds.iter_batches(batch_size=None, batch_format="pyarrow")
        )
        ids = tab[id_col].to_numpy().astype(np.int64)
        mat = _normalize(_batch_matrix(tab, emb_col))
        sims = mat @ mat.T
        iu, ju = np.where(np.triu(sims >= threshold, k=1))
        order_ids = ids
        a = np.minimum(order_ids[iu], order_ids[ju])
        b = np.maximum(order_ids[iu], order_ids[ju])
        df = pd.DataFrame({"vec_a": a, "vec_b": b}).sort_values(
            ["vec_a", "vec_b"]
        )
        return df.reset_index(drop=True)

    if dim is None:
        first = next(iter(ds.iter_batches(batch_size=1, batch_format="pyarrow")))
        dim = len(first[emb_col][0])

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy(dtype=np.int64)
        mat = _normalize(np.stack(g[emb_col].to_numpy()))
        sims = mat @ mat.T
        iu, ju = np.where(np.triu(sims >= threshold, k=1))
        keep = ids[iu] != ids[ju]  # same id may recur across blocks
        return pd.DataFrame(
            {
                "vec_a": np.minimum(ids[iu][keep], ids[ju][keep]),
                "vec_b": np.maximum(ids[iu][keep], ids[ju][keep]),
            }
        )

    from fluent_server_ray.stages.enrich import pool_limits
    from fluent_server_ray.stages.groups import map_buckets

    def combine_key(t: pa.Table) -> pa.Table:
        # (table_id, bucket) → one int key (bucket < 2^n_planes), so
        # the schema-stable single-key map_buckets shuffle applies;
        # the single-table layout has no table_id column (table 0)
        b = t["bucket"].to_numpy(zero_copy_only=False)
        ti = (t["table_id"].to_numpy(zero_copy_only=False)
              if "table_id" in t.column_names
              else np.zeros(len(t), dtype=np.int64))
        tb = ti * (1 << n_planes) + b
        return t.append_column("_tb", pa.array(tb.astype(np.int64)))

    cand = map_buckets(
        ds.map_batches(
            LSHBucketStage,
            fn_constructor_kwargs={"dim": dim, "n_planes": n_planes,
                                   "n_tables": n_tables, "emb_col": emb_col},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=pool_limits(),  # per-vec bucket pass scales with cpus
        ).map_batches(combine_key, batch_format="pyarrow",
                      zero_copy_batch=True),
        bucket_pairs,
        pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())]),
        key="_tb")
    # distributed distinct over pair rows (same-pair hits from several
    # tables); pairs are verified already, so this is the final result —
    # materialized into the OBJECT STORE (never the driver)
    from fluent_server_ray.stages.dedup import _empty_pairs_ds, distinct_pairs

    out = distinct_pairs(
        cand, n_buckets=n_buckets, cols=("vec_a", "vec_b")
    ).materialize()
    if out.count() == 0:
        return _empty_pairs_ds(cols=("vec_a", "vec_b"))
    return out


def cosine_dupes_sql(threshold: float = 0.95, table: str = "embeddings") -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {threshold}
""".strip()


# ----------------------------------------------------------- IVF index

def _bottomk_sample_matrix(ds, sample_size: int, id_col: str = "vec_id",
                           emb_col: str = "embedding",
                           return_count: bool = False):
    """Deterministic UNIFORM sample of ``sample_size`` embedding rows:
    the global bottom-k rows by ``siphash(id)`` (classic bottom-k /
    minwise sampling). Each batch keeps its local bottom-k (a
    combiner), the driver merges the O(blocks × k) partials and takes
    the global bottom-k — so the sample is a fixed pseudo-random subset
    of the CORPUS, independent of row/block order. ``ds.limit(k)``
    (the old path) takes the stream HEAD instead: on a corpus ordered
    by time or source the k-means quantizer then trains only on the
    head's distribution and tail queries degrade — pinned by the
    clustered-corpus recall test."""
    import pandas as pd_

    def local(t: pa.Table) -> pa.Table:
        t = t.select([id_col, emb_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if ids.dtype == object:
            h = pd_.util.hash_array(ids)
        else:
            h = pd_.util.hash_array(np.ascontiguousarray(ids))
        kk = min(sample_size, len(t))
        idx = (np.argpartition(h, kk - 1)[:kk]
               if kk < len(t) else np.arange(len(t)))
        out = t.take(pa.array(idx)).append_column(
            "_hs", pa.array(h[idx], type=pa.uint64())
        )
        if return_count:
            # block row count rides on the FIRST kept row only, so the
            # driver recovers the corpus size from the same combiner
            # pass (no separate ds.count() scan).
            bn = np.zeros(len(out), dtype=np.int64)
            if len(bn):
                bn[0] = len(t)
            out = out.append_column("_bn", pa.array(bn))
        return out

    parts = pa.concat_tables(
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    h = parts["_hs"].to_numpy(zero_copy_only=False)
    kk = min(sample_size, len(parts))
    idx = np.argpartition(h, kk - 1)[:kk] if kk < len(parts) else np.arange(
        len(parts)
    )
    mat = _batch_matrix(parts.take(pa.array(idx)), emb_col)
    if return_count:
        return mat, int(pc.sum(parts["_bn"]).as_py() or 0)
    return mat


def _kmeans(sample: np.ndarray, n_centroids: int, n_iter: int = 10,
            seed: int = 17) -> np.ndarray:
    """Deterministic spherical k-means (numpy; fixed iterations).

    Init is farthest-first traversal (the deterministic k-means++
    variant: start from sample row 0 — the sample itself is already a
    pseudo-random bottom-k-by-hash subset — then repeatedly take the
    point LEAST cosine-similar to every chosen centroid). Random init
    can seed two centroids inside one dense blob and leave a small
    separated blob with no centroid — an empty cluster Lloyd never
    recovers (empty clusters keep their previous centroid).
    ``seed`` is kept for API stability; the init consumes no RNG."""
    sample = _normalize(sample)
    chosen = [0]
    sims = sample @ sample[0]
    for _ in range(1, n_centroids):
        nxt = int(np.argmin(sims))
        chosen.append(nxt)
        sims = np.maximum(sims, sample @ sample[nxt])
    centroids = sample[chosen]
    for _ in range(n_iter):
        assign = (sample @ centroids.T).argmax(axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_build(ds, index_dir: str, n_centroids: int = 16,
              id_col: str = "vec_id", emb_col: str = "embedding",
              sample_size: int = 10_000, seed: int = 17) -> np.ndarray:
    """Persist an IVF index: train the coarse quantizer on a
    deterministic UNIFORM hash-sample (:func:`_bottomk_sample_matrix`
    — not the stream head, which would bias the centroids on
    time/source-ordered corpora), assign every vector to its nearest
    centroid in one streamed pass, and WRITE THE CORPUS PARTITIONED BY
    CENTROID ID (hive dirs ``lists/centroid=<c>/``) plus
    ``centroids.npy``.

    This is the promised scale path for :func:`ivf_topk`: the
    assignment becomes a durable partition key, so a query batch later
    reads only its probed lists — ``n_probe / n_centroids`` of the
    files — instead of streaming the whole corpus
    (:func:`ivf_search` + the file-pruning test pin this).
    """
    import os

    import ray

    sample = _bottomk_sample_matrix(ds, sample_size, id_col, emb_col)
    centroids = _kmeans(sample, n_centroids, seed=seed)
    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, "centroids.npy"), centroids)
    cent_ref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        mat = _normalize(_batch_matrix(t, emb_col))
        a = pa.array((mat @ cents.T).argmax(axis=1).astype(np.int64))
        # `centroid` partitions the files (hive dirs = the prunable
        # layout); a plain copy stays IN the files so per-file reads
        # don't depend on hive-column reconstruction
        return t.append_column("centroid", a).append_column("centroid_id", a)

    ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True) \
        .write_parquet(os.path.join(index_dir, "lists"),
                       partition_cols=["centroid"])
    return centroids


def ivf_search(index_dir: str, query_ids: list[int], query_mat: np.ndarray,
               k: int = 5, n_probe: int = 4, id_col: str = "vec_id",
               emb_col: str = "embedding", return_stats: bool = False):
    """Query a persisted IVF index reading ONLY the probed lists.

    ``query_mat`` is the (Q, d) raw query matrix aligned with
    ``query_ids``. Each query probes its ``n_probe`` nearest centroids;
    the union of probed centroid partitions (and nothing else) is read
    via ``read_parquet`` path selection — Parquet-level pruning, not a
    post-read filter. Returns the same (query_id, neighbor_id, rank)
    frame as :func:`ivf_topk`; with ``return_stats=True`` also a dict
    ``{n_lists_total, n_lists_read}`` (the pruning evidence).
    """
    import glob as _glob
    import os

    import ray.data as rd

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    order = np.argsort(np.asarray(query_ids))
    qids = np.asarray(query_ids)[order]
    qmat = _normalize(np.asarray(query_mat, dtype=np.float64)[order])
    qprobe = np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]

    all_lists = sorted(
        _glob.glob(os.path.join(index_dir, "lists", "centroid=*"))
    )
    probed = sorted(set(int(c) for c in qprobe.ravel()))
    dirs = [
        p for p in all_lists
        if int(os.path.basename(p).split("=", 1)[1]) in probed
    ]
    paths = sorted(
        f for d in dirs for f in _glob.glob(os.path.join(d, "*.parquet"))
    )
    stats = {"n_lists_total": len(all_lists), "n_lists_read": len(dirs)}

    empty = pd.DataFrame(
        {"query_id": pd.Series(dtype="int64"),
         "neighbor_id": pd.Series(dtype="int64"),
         "rank": pd.Series(dtype="int64")}
    )
    if not paths:  # every probed centroid was an empty kmeans cluster
        return (empty, stats) if return_stats else empty

    import ray

    ref = ray.put((qids, qmat, qprobe))

    def local_topk(t: pa.Table) -> pa.Table:
        ids_q, mat_q, probes = ray.get(ref)
        ids = t[id_col].to_numpy().astype(np.int64)
        assign = t["centroid_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(_batch_matrix(t, emb_col))
        sims = mat_q @ mat.T
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            mask = np.isin(assign, probes[qi])
            mask &= ids != ids_q[qi]
            cand = np.where(mask)[0]
            if not len(cand):
                continue
            row = sims[qi][cand]
            kk = min(k, len(cand))
            top = cand[np.argpartition(-row, kk - 1)[:kk]]
            for j in top:
                out_q.append(int(ids_q[qi]))
                out_n.append(int(ids[j]))
                out_s.append(float(sims[qi][j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    tables = list(
        rd.read_parquet(paths)
        .map_batches(local_topk, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if not tables:  # probed lists held only the query vectors themselves
        return (empty, stats) if return_stats else empty
    partials = pa.concat_tables(tables).to_pandas()
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    out = partials.groupby("query_id", sort=True).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount() + 1
    out = out[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)
    return (out, stats) if return_stats else out


def ivf_topk(ds, query_ids: list[int], k: int = 5, n_centroids: int = 16,
             n_probe: int = 4, id_col: str = "vec_id",
             emb_col: str = "embedding", sample_size: int = 10_000,
             seed: int = 17):
    """IVF approximate top-k: k-means coarse quantizer trained on a
    sample, centroids broadcast; each batch scores a query ONLY against
    rows assigned to that query's `n_probe` nearest centroids.

    At scale use :func:`ivf_build` + :func:`ivf_search` instead: the
    assignment is persisted as a partition key and queries READ only
    n_probe/n_centroids of the files (tests pin both the pruning and
    result equality with this in-stream variant). Recall < 1 → no SQL
    oracle; tests pin recall vs the exact brute-force baseline.
    """
    import ray

    sample = _bottomk_sample_matrix(ds, sample_size, id_col, emb_col)
    centroids = _kmeans(sample, n_centroids, seed=seed)

    qset = set(query_ids)

    def grab_queries(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t[id_col], value_set=pa.array(list(qset))))

    qtab = pa.concat_tables(
        ds.map_batches(grab_queries, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    qid_np = qtab[id_col].to_numpy()
    order = np.argsort(qid_np)
    qids = qid_np[order]
    qmat = _normalize(_batch_matrix(qtab, emb_col)[order])
    # each query probes its n_probe nearest centroids
    qprobe = np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]
    ref = ray.put((qids, qmat, centroids, qprobe))

    def local_topk(t: pa.Table) -> pa.Table:
        ids_q, mat_q, cents, probes = ray.get(ref)
        ids = t[id_col].to_numpy().astype(np.int64)
        mat = _normalize(_batch_matrix(t, emb_col))
        assign = (mat @ cents.T).argmax(axis=1)
        sims = mat_q @ mat.T
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            mask = np.isin(assign, probes[qi])
            mask &= ids != ids_q[qi]
            cand = np.where(mask)[0]
            if not len(cand):
                continue
            row = sims[qi][cand]
            kk = min(k, len(cand))
            top = cand[np.argpartition(-row, kk - 1)[:kk]]
            for j in top:
                out_q.append(int(ids_q[qi]))
                out_n.append(int(ids[j]))
                out_s.append(float(sims[qi][j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = pa.concat_tables(
        ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ).to_pandas()
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    out = partials.groupby("query_id", sort=True).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


# ---------------------------------------- distributed k-means

def kmeans_fit(ds, n_clusters: int | None = 8, n_iter: int = 4,
               sample_size: int = 512, id_col: str = "vec_id",
               emb_col: str = "embedding",
               target_cluster_rows: int = 4_096):
    """Distributed spherical k-means over the FULL embedding corpus
    (the clustering step of cluster-balanced data curation; the IVF
    quantizer's :func:`_kmeans` trains on a sample only).

    Init: driver k-means on the deterministic bottom-k hash sample
    (order-independent). Refine: ``n_iter`` Lloyd rounds, each ONE
    ``map_batches`` pass emitting per-block (cluster, sum-vector,
    count) partials — k×d floats per block, merged on the driver into
    new centroids, re-broadcast via ``ray.put``. The corpus never
    lands on the driver and is re-read from storage each round (the
    scale-safe choice: pinning a 100 TB projection in the object
    store is not an option; small corpora can ``materialize()``
    upstream). Assignment inside a block is one BLAS matmul
    (block × k·d) plus a k×n one-hot matmul for the sums — no Python
    row loop. Empty clusters keep their previous centroid.

    Returns ``(centroids, sizes)``: a normalized (k, d) float64 array
    and an int64 length-k member-count array from the LAST assignment
    pass. Deterministic for a fixed corpus and parameters.
    """
    import ray

    pruned = ds.select_columns([id_col, emb_col])
    if n_clusters is None:
        # Auto-k (the SemDeDup scale-with-the-corpus rule): the corpus
        # size is recovered from the SAME sampling combiner pass — no
        # separate ds.count() scan re-executing the upstream pipeline.
        sample, n_total = _bottomk_sample_matrix(
            pruned, sample_size, id_col, emb_col, return_count=True)
        n_clusters = int(min(65_536, max(
            8, -(-n_total // int(target_cluster_rows)))))
    else:
        sample = _bottomk_sample_matrix(pruned, sample_size, id_col,
                                        emb_col)
    # Training k centroids needs >= 4k sample rows or kmeans silently
    # clamps k to the sample — re-sample once at the needed size when
    # the first sample came back full (i.e. the corpus has more rows).
    need = 4 * n_clusters
    if need > len(sample) and len(sample) == sample_size:
        sample = _bottomk_sample_matrix(pruned, need, id_col, emb_col)
    k = min(n_clusters, len(sample))
    centroids = _kmeans(sample, k)
    d = centroids.shape[1]

    sizes = np.zeros(k, dtype=np.int64)
    for _ in range(n_iter):
        cref = ray.put(centroids)

        def partial(t: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            mat = _normalize(_batch_matrix(t, emb_col))
            assign = (mat @ c.T).argmax(axis=1)
            onehot = (assign == np.arange(len(c))[:, None]).astype(
                np.float64
            )
            sums = onehot @ mat                      # k×d
            counts = onehot.sum(axis=1).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(len(c), dtype=np.int64)),
                "vecsum": pa.array(list(sums), type=pa.list_(pa.float64())),
                "n": pa.array(counts, type=pa.int64()),
            })

        parts = pa.concat_tables(
            pruned.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .iter_batches(batch_size=None, batch_format="pyarrow")
        )
        cl = parts["cluster"].to_numpy(zero_copy_only=False)
        ns = parts["n"].to_numpy(zero_copy_only=False)
        vs = np.stack(parts["vecsum"].to_pylist()).reshape(-1, d)
        # canonical merge order: iter_batches block order varies run to
        # run, and float addition doesn't commute — sort the partials
        # by their FULL content (cluster, count, every sum component:
        # a prefix key isn't a total order, and two unequal partials
        # tying on it would still reorder across runs; fully-equal rows
        # commute exactly) so the driver sum is bit-stable
        order = np.lexsort(
            tuple(vs[:, j] for j in range(d - 1, -1, -1)) + (ns, cl)
        )
        cl, ns, vs = cl[order], ns[order], vs[order]
        sums = np.zeros((k, d))
        np.add.at(sums, cl, vs)
        sizes = np.zeros(k, dtype=np.int64)
        np.add.at(sizes, cl, ns)
        nonempty = sizes > 0
        new_c = centroids.copy()
        new_c[nonempty] = sums[nonempty] / sizes[nonempty, None]
        centroids = _normalize(new_c)

    return centroids, sizes


def kmeans_cluster_sizes(ds, n_clusters: int = 8, n_iter: int = 4,
                         sample_size: int = 512, id_col: str = "vec_id",
                         emb_col: str = "embedding") -> pa.Table:
    """Fit + report: (cluster_id, n_members) per cluster, sorted by
    cluster_id — the corpus-composition summary a curation pipeline
    reads before cluster-balanced sampling."""
    centroids, sizes = kmeans_fit(ds, n_clusters, n_iter, sample_size,
                                  id_col, emb_col)
    return pa.table({
        "cluster_id": pa.array(np.arange(len(sizes), dtype=np.int64)),
        "n_members": pa.array(sizes, type=pa.int64()),
    })


def kmeans_assign_fixed(ds, centroid_ids: tuple = tuple(range(8)),
                        id_col: str = "vec_id",
                        emb_col: str = "embedding") -> pa.Table:
    """ONE spherical-k-means assignment step from PINNED centroids —
    the corpus vectors whose ids are ``centroid_ids`` play the
    centroids (so the step is fully specified by data + ids and hence
    SQL-expressible): each vector goes to the centroid of maximum
    cosine similarity, ties to the LOWEST centroid id (numpy argmax
    first-max ≡ the mirror's ``row_number() OVER (ORDER BY cos DESC,
    c)``). This driver-checks the distance/argmax kernel that the
    iterative :func:`kmeans_fit` (rows-only: recall Lloyd is not
    SQL-expressible) reuses every round.

    Shape: centroid vectors are driver-resolved (an ``is_in`` filter,
    tiny) and broadcast via ``ray.put``; assignment is one BLAS matmul
    per batch; per-cluster counts finish with the house grouped-counts
    exchange (bounded: ≤ len(centroid_ids) rows). Output:
    (cluster, n_vecs) sorted by cluster — cluster IS the centroid's
    vec id.
    """
    import ray

    from fluent_server_ray.stages.aggregate import grouped_counts

    cid_sorted = sorted(int(c) for c in centroid_ids)

    def grab(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t[id_col],
                                 value_set=pa.array(cid_sorted)))

    ctab = pa.concat_tables(
        ds.map_batches(grab, batch_format="pyarrow",
                       zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    order = np.argsort(ctab[id_col].to_numpy())
    cids = ctab[id_col].to_numpy()[order].astype(np.int64)
    cmat = _normalize(_batch_matrix(ctab, emb_col)[order])
    cref = ray.put((cids, cmat))

    def assign(t: pa.Table) -> pa.Table:
        ids_c, mat_c = ray.get(cref)
        mat = _normalize(_batch_matrix(t, emb_col))
        a = (mat @ mat_c.T).argmax(axis=1)
        return pa.table({"cluster": pa.array(ids_c[a], pa.int64())})

    out = grouped_counts(
        ds.map_batches(assign, batch_format="pyarrow",
                       zero_copy_batch=True), ["cluster"]).to_pandas()
    out = out.sort_values("cluster").reset_index(drop=True)
    return pa.table({
        "cluster": pa.array(out["cluster"].astype("int64")),
        "n_vecs": pa.array(out["n"].astype("int64")),
    })


def kmeans_assign_fixed_sql(centroid_ids: tuple = tuple(range(8)),
                            table: str = "embeddings") -> str:
    ids = ", ".join(str(int(c)) for c in sorted(centroid_ids))
    return f"""
WITH cents AS (
  SELECT vec_id AS c, embedding AS cemb
  FROM {table} WHERE vec_id IN ({ids})
), sims AS (
  SELECT e.vec_id, c.c,
    list_cosine_similarity(e.embedding, c.cemb) AS cos
  FROM {table} e CROSS JOIN cents c
), ranked AS (
  SELECT vec_id, c,
    row_number() OVER (PARTITION BY vec_id
                       ORDER BY cos DESC, c) AS rn
  FROM sims
)
SELECT c AS cluster, CAST(count(*) AS BIGINT) AS n_vecs
FROM ranked WHERE rn = 1 GROUP BY 1 ORDER BY 1
""".strip()


def cluster_balanced_sample(ds, n_clusters: int = 8, cap: int = 100,
                            n_iter: int = 3, sample_size: int = 512,
                            id_col: str = "vec_id",
                            emb_col: str = "embedding"):
    """Cluster-balanced curation sampling: fit :func:`kmeans_fit`,
    assign every vector map-side against the broadcast centroids (one
    BLAS matmul per batch), then keep at most ``cap`` members per
    cluster by the deterministic md5 rank
    (:func:`fluent_server_ray.stages.sampling.per_key_cap` over the
    cluster key) — the semantic-diversity counterpart of the
    per-domain quota cap (one dense region of embedding space cannot
    dominate the training mix).

    Shape: the k-means passes plus ONE hash-bucket exchange on
    (id, cluster_id) — embeddings never re-shuffle and payloads never
    move; join survivors back by id to materialize text. Output:
    (id_col, cluster_id) survivors, sorted by id. Deterministic for a
    fixed corpus and parameters."""
    import ray

    from fluent_server_ray.stages.sampling import per_key_cap

    centroids, _ = kmeans_fit(ds, n_clusters, n_iter, sample_size,
                              id_col, emb_col)
    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _normalize(_batch_matrix(t, emb_col))
        a = (mat @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table({id_col: t[id_col], "cluster_id": pa.array(a)})

    assigned = ds.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)
    return per_key_cap(assigned, key_col="cluster_id", id_col=id_col,
                       cap=cap)


# ------------------------------------------- scalar (int8) quantization

def embedding_quantize(ds, id_col: str = "vec_id",
                       emb_col: str = "embedding", levels: int = 256):
    """Per-dimension scalar quantization of an embedding column to
    ``levels`` integer codes (the int8 storage shrink every
    embedding-heavy pipeline applies before indexing: 4× smaller than
    float32, recall loss negligible for ANN candidate generation).

    ``code = floor((x - min_d) / (max_d - min_d) * (levels-1) + 0.5)``
    (half-away rounding spelled as floor(+0.5) so numpy and SQL agree;
    a constant dimension quantizes to 0). Per-dimension min/max are an
    ELEMENTWISE combiner — each batch emits one (d,) min and max
    vector, the driver folds them (min/max selection is exact in any
    order) and broadcasts the scale once. All arithmetic is float64 on
    exactly-converted float32 inputs with one fixed expression tree, so
    codes are bit-exact across engines and partitionings (floor
    boundaries are IEEE-exact equalities, not wobble).

    Output: LONG form (id, dim 1-based, code int64) — the layout a
    columnar code store or a SQL mirror can both express. At 100 TB
    you'd write the packed uint8 list column instead; the long form
    here is the oracle-checkable contract, the codes are identical.
    """
    import ray

    from fluent_server_ray.stages.aggregate import skip_empty

    ds = ds.materialize()  # consumed twice: min/max pass + encode pass

    def mm_partial(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, emb_col)
        return pa.table({
            "mn": pa.array(m.min(axis=0)),
            "mx": pa.array(m.max(axis=0)),
        })

    mn = None
    mx = None
    for part in ds.map_batches(
            skip_empty(mm_partial), batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        pmn = part["mn"].to_numpy(zero_copy_only=False)
        pmx = part["mx"].to_numpy(zero_copy_only=False)
        mn = pmn if mn is None else np.minimum(mn, pmn)
        mx = pmx if mx is None else np.maximum(mx, pmx)
    if mn is None:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            "dim": pa.array([], type=pa.int64()),
            "code": pa.array([], type=pa.int64()),
        }))
    span = mx - mn
    scale_ref = ray.put((mn, span))

    def encode(t: pa.Table) -> pa.Table:
        lo, sp = ray.get(scale_ref)
        m = _batch_matrix(t, emb_col)
        n, d = m.shape
        with np.errstate(divide="ignore", invalid="ignore"):
            v = (m - lo) / sp * (levels - 1)
        codes = np.floor(v + 0.5)
        codes = np.where(sp == 0, 0.0, codes)
        codes = np.clip(codes, 0, levels - 1).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
            "code": pa.array(codes.reshape(-1)),
        })

    return ds.map_batches(skip_empty(encode), batch_format="pyarrow",
                          zero_copy_batch=True)


def embedding_quantize_sql(table: str = "embeddings",
                           levels: int = 256) -> str:
    """Mirror: unnest to (id, dim, x), per-dim min/max, the same
    float64 expression tree (CASTs make the float32 column double
    BEFORE arithmetic, as the engine's matrix load does)."""
    return f"""
WITH d AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim
  FROM {table}
), mm AS (
  SELECT dim, min(x) AS mn, max(x) AS mx FROM d GROUP BY dim
)
SELECT vec_id, d.dim,
  CAST(CASE WHEN mx = mn THEN 0
       ELSE least({levels - 1}, greatest(0,
            floor((x - mn) / (mx - mn) * {levels - 1} + 0.5))) END
       AS BIGINT) AS code
FROM d JOIN mm USING (dim)
""".strip()


# --------------------------------------------------- distributed PCA

def pca_fit(ds, n_components: int = 8, emb_col: str = "embedding"):
    """Fit PCA over an embedding column with ONE streaming pass of
    second-moment combiners: each batch emits ``(n, Σx, XᵀX)`` — a
    (1 + d + d²)-float partial regardless of batch size — and the
    driver folds them into the covariance ``(ΣXᵀX − n·μμᵀ)/(n−1)``
    and eigendecomposes (``numpy.linalg.eigh`` on the d×d symmetric
    matrix; d is the embedding width, never the corpus). This is the
    textbook method-of-moments PCA — the corpus never materializes,
    only d² floats per block move.

    Component signs are canonicalized (largest-|loading| coordinate
    made positive) so the fit is deterministic up to block summation
    order. Returns ``(mean (d,), components (n_components, d),
    explained_variance (n_components,))``.
    """
    from fluent_server_ray.stages.aggregate import skip_empty

    def moments(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, emb_col)
        g = m.T @ m
        return pa.table({
            "n": pa.array([m.shape[0]], type=pa.int64()),
            "s": pa.array([m.sum(axis=0)]),
            "g": pa.array([g.reshape(-1)]),
        })

    n_total = 0
    s = None
    g = None
    for part in ds.map_batches(
            skip_empty(moments), batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for i in range(len(part)):
            n_total += part["n"][i].as_py()
            ps = np.asarray(part["s"][i].as_py())
            pg = np.asarray(part["g"][i].as_py())
            s = ps if s is None else s + ps
            g = pg if g is None else g + pg
    if n_total < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    d = s.shape[0]
    mean = s / n_total
    cov = (g.reshape(d, d) - n_total * np.outer(mean, mean)) / (n_total - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T
    # deterministic sign: the largest-|loading| coordinate is positive
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return mean, comps, evals[order]


def pca_project(ds, n_components: int = 8, id_col: str = "vec_id",
                emb_col: str = "embedding"):
    """Dimensionality reduction for embedding pipelines: fit
    :func:`pca_fit`, broadcast ``(mean, components)`` once
    (``ray.put``), and project every batch with one BLAS matmul —
    the standard pre-indexing shrink (IVF/LSH over 8-32 PCA dims
    instead of raw 768). Rows-only driver check (an eigenbasis is not
    SQL-expressible); pytest pins equality with numpy's full PCA up to
    component sign and the variance-ordering invariant.

    Output: (id, proj list<double>[n_components]).
    """
    import ray

    mean, comps, _ = pca_fit(ds, n_components, emb_col)
    ref = ray.put((mean, comps))

    def project(t: pa.Table) -> pa.Table:
        mu, c = ray.get(ref)
        m = _batch_matrix(t, emb_col)
        proj = (m - mu) @ c.T
        return pa.table({
            id_col: t[id_col],
            "proj": pa.array(list(proj)),
        })

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)


# ------------------------------------------------- SemDeDup composite

def semantic_dedup(ds, threshold: float = 0.95, n_clusters: int | None = None,
                   n_iter: int = 4, sample_size: int = 512,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   max_cluster_rows: int = 65_536,
                   target_cluster_rows: int = 4_096):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate REMOVAL over an embedding corpus — cluster with
    k-means, then compare pairs only WITHIN each cluster and keep one
    representative of every near-duplicate set. Catches paraphrase
    duplicates that exact/MinHash text dedup cannot see, at k-partition
    cost instead of O(n²).

    Pipeline: :func:`kmeans_fit` (distributed Lloyd; corpus never on
    the driver) → one assignment ``map_batches`` pass (one BLAS matmul
    per block against the broadcast centroids) → per-cluster exact
    pairwise cosine with the deterministic keep rule: a vector is
    DROPPED iff some SMALLER id in its cluster has cosine >=
    threshold with it (keep-lowest-id, the same rule as
    ``exact_dedup``; one-shot, not transitive — chain removal wants
    :func:`dedup.pair_components` over :func:`cosine_dupes`).

    Scale contract: the per-cluster comparison is exact and
    cluster-sized (|cluster|² sims in one worker) — ``n_clusters`` is
    the knob that bounds it, and SemDeDup's own design scales k WITH
    the corpus (the paper uses 50k clusters for LAION) so clusters
    stay worker-sized. Two guards make that contract enforced rather
    than advisory:

    - ``n_clusters=None`` (the default) derives k from the corpus:
      ``k = clamp(ceil(n / target_cluster_rows), 8, 65536)`` — the
      paper's scale-k-with-the-corpus rule, for free. The corpus size
      comes out of kmeans' own sampling combiner pass (no extra
      ``ds.count()`` scan), and the training sample is automatically
      re-drawn at ``4·k`` rows when the derived k outgrows the
      default ``sample_size`` (otherwise kmeans would silently train
      fewer centroids than derived);
    - any cluster that still exceeds ``max_cluster_rows`` (skewed
      corpora: k-means happily puts half of a lopsided corpus in one
      cell) is recursively BISECTED in-worker along its top principal
      axis at the median projection before the exact pass — worker
      memory stays O(max_cluster_rows²) instead of O((n/k)²). The
      recall boundary is the same kind the paper already accepts: a
      near-dup pair straddling a (sub-)cluster boundary is missed.

    The groupby key is ``cluster`` (bounded cardinality = k).

    Returns the survivor Dataset (vec_id, cluster), sorted by vec_id.
    """
    import ray

    centroids, _ = kmeans_fit(ds, n_clusters, n_iter, sample_size,
                              id_col, emb_col,
                              target_cluster_rows=target_cluster_rows)
    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _normalize(_batch_matrix(t, emb_col))
        cl = (mat @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            emb_col: t[emb_col],
            "cluster": pa.array(cl),
        })

    def _keep_block(mat: np.ndarray) -> np.ndarray:
        """Exact keep mask over an id-ascending normalized block:
        row j is dropped iff some i<j has cosine >= threshold."""
        sims = mat @ mat.T
        return ~(np.triu(sims >= threshold, k=1)).any(axis=0)

    def _keep_recursive(mat: np.ndarray) -> np.ndarray:
        """Oversized-cluster guard: bisect along the top principal
        axis at the median projection, recurse per half. Deterministic
        (eigh on the d×d covariance, sign-canonical axis, stable
        argsort split)."""
        n = mat.shape[0]
        if n <= max_cluster_rows:
            return _keep_block(mat)
        centered = mat - mat.mean(axis=0)
        cov = centered.T @ centered
        _, vecs = np.linalg.eigh(cov)
        axis = vecs[:, -1]
        axis = axis if axis[np.argmax(np.abs(axis))] >= 0 else -axis
        order = np.argsort(centered @ axis, kind="stable")
        keep = np.empty(n, dtype=bool)
        for half in (order[: n // 2], order[n // 2:]):
            sub = np.sort(half)  # preserve id-ascending order per side
            keep[sub] = _keep_recursive(mat[sub])
        return keep

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = _normalize(np.stack(g[emb_col].to_numpy())[order])
        keep = _keep_recursive(mat)
        return pd.DataFrame({
            id_col: ids[keep],
            "cluster": np.full(int(keep.sum()), int(g["cluster"].iloc[0]),
                               dtype=np.int64),
        })

    from fluent_server_ray.stages.groups import map_buckets

    pruned = ds.select_columns([id_col, emb_col])
    out = map_buckets(
        pruned.map_batches(assign, batch_format="pyarrow",
                           zero_copy_batch=True),
        survivors,
        pa.schema([(id_col, pa.int64()), ("cluster", pa.int64())]),
        key="cluster")
    return out.sort(id_col)


# ------------------------------------------- per-label class centroids

def label_centroids(ds, label_col: str = "label",
                    emb_col: str = "embedding") -> pa.Table:
    """Per-label mean embedding (nearest-class-mean prototypes — the
    cheap domain/quality classifier of data-curation stacks: label a
    seed set, average, assign the corpus by cosine-to-centroid).

    Combiner-first and integer-exact: each batch contributes one
    (label, dim) partial of ``sum(floor(val·1e6))`` as int64 plus a
    count — integer sums are order-independent, so the driver merge
    and the SQL mirror agree bit-for-bit (a float64 sum would depend
    on reduction order). Output: (label, dim, n, sum_millionths,
    mean_millionths = sum/n in one exact division), sorted — bounded
    by |labels|·d rows."""
    import numpy as np

    from fluent_server_ray.stages.aggregate import skip_empty

    def partial(t: pa.Table) -> pa.Table:
        m = np.floor(
            _batch_matrix(t, emb_col).astype(np.float64) * 1_000_000.0
        ).astype(np.int64)
        labels = t[label_col]
        # one vectorized groupby over (label) for all dims: build the
        # (label, dim) long form with repeat/tile — d is small (≤ few k)
        n, d = m.shape
        lab_idx = pc.dictionary_encode(labels.combine_chunks()
                                       if isinstance(labels, pa.ChunkedArray)
                                       else labels)
        codes = lab_idx.indices.to_numpy(zero_copy_only=False)
        uniq = lab_idx.dictionary
        k = len(uniq)
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, codes, m)
        counts = np.bincount(codes, minlength=k).astype(np.int64)
        return pa.table({
            "label": pc.take(uniq, pa.array(
                np.repeat(np.arange(k, dtype=np.int64), d))),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
            "s": pa.array(sums.reshape(-1)),
            "n": pa.array(np.repeat(counts, d)),
        })

    parts = list(
        ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    empty = pa.table({"label": pa.array([], type=pa.string()),
                      "dim": pa.array([], type=pa.int64()),
                      "n": pa.array([], type=pa.int64()),
                      "sum_millionths": pa.array([], type=pa.int64()),
                      "mean_millionths": pa.array([], type=pa.float64())})
    if not parts:
        return empty
    merged = (pa.concat_tables(parts).group_by(["label", "dim"])
              .aggregate([("s", "sum"), ("n", "sum")]))
    mean = pc.divide(pc.cast(merged["s_sum"], pa.float64()),
                     pc.cast(merged["n_sum"], pa.float64()))
    out = pa.table({
        "label": merged["label"],
        "dim": merged["dim"],
        "n": merged["n_sum"],
        "sum_millionths": merged["s_sum"],
        "mean_millionths": mean,
    })
    return out.sort_by([("label", "ascending"), ("dim", "ascending")])


def label_centroids_sql(label_col: str = "label",
                        emb_col: str = "embedding",
                        table: str = "embeddings") -> str:
    return f"""
WITH flat AS (
  SELECT {label_col} AS label, gs - 1 AS dim,
    CAST(floor(CAST({emb_col}[gs] AS DOUBLE) * 1000000.0) AS BIGINT) AS v
  FROM {table}
  CROSS JOIN unnest(generate_series(1, len({emb_col}))) AS u(gs)
)
SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(v) AS BIGINT) AS sum_millionths,
  CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_millionths
FROM flat GROUP BY label, dim
ORDER BY label, dim
""".strip()


# ------------------------------------- all-pairs TF-IDF cosine (sparse)

def tfidf_cosine_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                       min_sim_millionths: int = 300_000,
                       max_df_permille: int = 500, n_buckets: int = 64,
                       max_bucket_pairs: int = 5_000_000,
                       max_driver_pairs: int = 2_000_000):
    """All-pairs sparse TF-IDF cosine similarity ≥ threshold — the
    lexical twin of :func:`cosine_dupes` for corpora WITHOUT an
    embedding column, via the classic inverted-index / term-at-a-time
    plan (Bayardo et al., WWW 2007 "Scaling Up All Pairs Similarity
    Search"): docs never meet pairwise unless they share a surviving
    term, and each term's postings co-locate with ONE hash-bucket
    exchange.

    Contract (identical in the SQL mirror): the vector space is the
    DF-PRUNED TF-IDF space — terms with ``df < 2`` (can't contribute
    to any pair) or ``df·1000 > max_df_permille·N`` (stop-terms, the
    O(df²) cost drivers) are dropped BEFORE weights and norms, so the
    output is a true cosine in that space. Weights are integer-exact:
    ``w = tf · floor(ln(N/df)·1000)`` (idf in THOUSANDTHS keeps every
    norm²/dot within int64 — dots are bounded by max norm² via
    Cauchy-Schwarz; a batch-level guard raises before any block could
    wrap). One float expression per surviving pair at the very end
    (``floor(1e6·dot / (√na²·√nb²))``, int64→float64 casts are
    round-to-nearest on both engines = the SQL VARCHAR→DOUBLE path).

    Scale shape: tokenize+tf per batch (combiner) → driver-merged df
    table (vocab-sized "small side"; swap for the
    :func:`~fluent_server_ray.stages.textstats.doc_tfidf_joined`
    vocab-join when it isn't) → broadcast idf once via ``ray.put`` →
    per-term pair partials inside buckets (postings of one term never
    span buckets; per-bucket candidate count capped at
    ``max_bucket_pairs``, raises — ``minhash_near_dupes`` is the
    open-corpus path) → distributed (doc_a, doc_b) partial-dot merge →
    two bucketed joins attach norms. The corpus text crosses the wire
    exactly once, as (doc, term, w) postings.

    Returns a Dataset (doc_a, doc_b, sim_millionths) with
    ``doc_a < doc_b``, sorted by (doc_a, doc_b).
    """
    import ray
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import (grouped_agg,
                                                    hash_bucket_array,
                                                    skip_empty)
    from fluent_server_ray.stages.joins import bucketed_hash_join

    def _empty():
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "sim_millionths": pa.array([], type=pa.int64()),
        }))

    ds = ds.materialize()
    n_docs = ds.count()
    if n_docs == 0:
        return _empty()

    def tf_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype("int64")
        toks = [(s or "").split() for s in t[text_col].to_pylist()]
        lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                           count=len(toks))
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for w in toks:
            if w:
                flat[pos:pos + len(w)] = w
                pos += len(w)
        pairs = pa.table({"d": pa.array(np.repeat(ids, lens)),
                          "term": pa.array(flat, type=pa.string())})
        tf = pairs.group_by(["d", "term"]).aggregate([([], "count_all")])
        return tf.rename_columns(["d", "term", "tf"])

    tf_ds = ds.map_batches(skip_empty(tf_partial), batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    # df pass: tf rows are unique per (doc, term), so df(term) = row
    # count — per-batch combiner, vocab-sized driver merge
    def df_partial(t: pa.Table) -> pa.Table:
        out = t.group_by("term").aggregate([([], "count_all")])
        return out.rename_columns(["term", "df"])

    tabs = list(
        tf_ds.map_batches(skip_empty(df_partial), batch_format="pyarrow",
                          zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tabs:
        return _empty()
    df_tbl = (pa.concat_tables(tabs).group_by("term")
              .aggregate([("df", "sum")]))
    dfv = df_tbl["df_sum"].to_numpy(zero_copy_only=False).astype("int64")
    keep = (dfv >= 2) & (dfv * 1000 <= max_df_permille * n_docs)
    if not keep.any():
        return _empty()
    terms = df_tbl["term"].combine_chunks().filter(pa.array(keep))
    idf_k = np.floor(
        np.log(float(n_docs) / dfv[keep].astype(np.float64)) * 1000
    ).astype("int64")
    idf_ref = ray.put((terms, pa.array(idf_k)))

    def weights(t: pa.Table) -> pa.Table:
        vocab, idf = ray.get(idf_ref)
        sub = t.filter(pc.is_valid(pc.index_in(t["term"],
                                               value_set=vocab)))
        idx = pc.index_in(sub["term"], value_set=vocab)
        w = pc.multiply(pc.cast(sub["tf"], pa.int64()), pc.take(idf, idx))
        wnp = w.to_numpy(zero_copy_only=False)
        if len(wnp):
            peak = float(np.max(np.abs(wnp)))
            # every per-doc norm² (and via Cauchy-Schwarz every dot)
            # is ≤ rows·peak²; raise before any int64 sum could wrap
            if peak * peak * len(wnp) >= 2.0 ** 61:
                raise ValueError(
                    "tfidf_cosine_pairs: weight magnitudes too large "
                    "for exact int64 norms — shard the input or "
                    "reduce tf scale")
        return pa.table({"d": sub["d"], "term": sub["term"], "w": w})

    w_ds = tf_ds.map_batches(skip_empty(weights), batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    def w2(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table({"d": t["d"], "w2": pa.array(w * w)})

    norms = grouped_agg(
        w_ds.map_batches(skip_empty(w2), batch_format="pyarrow",
                         zero_copy_batch=True),
        keys=["d"], aggs=[("w2", "sum")], final="ray")

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_b", pa.array(hash_bucket_array(t["term"], n_buckets)))

    _EMPTY_PAIRS = {"doc_a": np.asarray([], dtype=np.int64),
                    "doc_b": np.asarray([], dtype=np.int64),
                    "dot": np.asarray([], dtype=np.int64)}

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", "d"], kind="mergesort"
                          ).reset_index(drop=True)
        codes, _ = pd.factorize(g["term"], sort=False)
        n = len(g)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        sizes = np.diff(np.r_[starts, n]).astype(np.int64)
        total = int((sizes * (sizes - 1) // 2).sum())
        if total == 0:
            return pd.DataFrame(_EMPTY_PAIRS)
        if total > max_bucket_pairs:
            raise ValueError(
                f"tfidf_cosine_pairs: bucket generates {total} "
                f"candidate pairs > max_bucket_pairs={max_bucket_pairs}"
                " — lower max_df_permille or use minhash_near_dupes")
        d = g["d"].to_numpy(dtype="int64")
        w = g["w"].to_numpy(dtype="int64")
        ai = np.empty(total, np.int64)
        bi = np.empty(total, np.int64)
        dot = np.empty(total, np.int64)
        pos = 0
        # per-TERM loop with a vectorized body (triu expansion);
        # candidate volume is the capped O(Σ df²) term above
        for s, c in zip(starts, sizes):
            if c < 2:
                continue
            ii, jj = np.triu_indices(int(c), 1)
            m = len(ii)
            ai[pos:pos + m] = d[s + ii]
            bi[pos:pos + m] = d[s + jj]
            dot[pos:pos + m] = w[s + ii] * w[s + jj]
            pos += m
        out = (pd.DataFrame({"doc_a": ai, "doc_b": bi, "dot": dot})
               .groupby(["doc_a", "doc_b"], sort=False)["dot"]
               .sum().reset_index())
        return out

    from fluent_server_ray.stages.groups import map_buckets

    dots = map_buckets(
        w_ds.map_batches(add_bucket, batch_format="pyarrow",
                         zero_copy_batch=True),
        per_bucket,
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                   ("dot", pa.int64())]), key="_b").materialize()

    # size-adaptive continuation (the PMI pattern): the pair partials
    # are result-sized — when they fit the driver, ONE pandas-free
    # Arrow merge + a broadcast-filtered norm lookup replace the
    # distributed pair-merge, two bucketed joins and final sort
    # (~9 s of fixed exchange latency at sf0.1). Byte-identical
    # output: same int sums, same one float tree per row, same sort.
    if dots.count() <= max_driver_pairs:
        tabs = list(dots.iter_batches(batch_size=None,
                                      batch_format="pyarrow"))
        if not tabs:  # zero candidate pairs: all-empty blocks yield
            return _empty()  # no batches at all (review finding)
        tot = (pa.concat_tables(tabs).group_by(["doc_a", "doc_b"])
               .aggregate([("dot", "sum")]))
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
            norms.map_batches(skip_empty(filt), batch_format="pyarrow",
                              zero_copy_batch=True)
            .iter_batches(batch_size=None, batch_format="pyarrow"))
        ntab = pa.concat_tables(ntabs) if ntabs else pa.table(
            {"d": pa.array([], pa.int64()),
             "w2_sum": pa.array([], pa.int64())})
        nd = ntab["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        nw = ntab["w2_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(nd, kind="stable")
        nd, nw = nd[order], nw[order]
        da = tot["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = tot["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        dot = tot["dot_sum"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        na2 = nw[np.searchsorted(nd, da)].astype(np.float64)
        nb2 = nw[np.searchsorted(nd, db)].astype(np.float64)
        sim = np.floor((1_000_000.0 * dot)
                       / (np.sqrt(na2) * np.sqrt(nb2))).astype(np.int64)
        m = sim >= min_sim_millionths
        out = pd.DataFrame({"doc_a": da[m], "doc_b": db[m],
                            "sim_millionths": sim[m]})
        out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        return rd.from_arrow(pa.Table.from_pandas(out,
                                                  preserve_index=False))

    total = grouped_agg(dots, keys=["doc_a", "doc_b"],
                        aggs=[("dot", "sum")], final="ray")

    def rn_a(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_a", "na2"])

    def rn_b(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_b", "nb2"])

    na = norms.map_batches(rn_a, batch_format="pyarrow",
                           zero_copy_batch=True)
    nb = norms.map_batches(rn_b, batch_format="pyarrow",
                           zero_copy_batch=True)
    j = bucketed_hash_join(total, na, key="doc_a", n_buckets=n_buckets)
    j = bucketed_hash_join(j, nb, key="doc_b", n_buckets=n_buckets)

    def finish(t: pa.Table) -> pa.Table:
        dot = t["dot_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        na2 = t["na2"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb2 = t["nb2"].to_numpy(zero_copy_only=False).astype(np.float64)
        sim = np.floor((1_000_000.0 * dot)
                       / (np.sqrt(na2) * np.sqrt(nb2))).astype(np.int64)
        out = pa.table({
            "doc_a": pc.cast(t["doc_a"], pa.int64()),
            "doc_b": pc.cast(t["doc_b"], pa.int64()),
            "sim_millionths": pa.array(sim),
        })
        return out.filter(
            pc.greater_equal(out["sim_millionths"],
                             pa.scalar(min_sim_millionths, pa.int64())))

    return (j.map_batches(skip_empty(finish), batch_format="pyarrow",
                          zero_copy_batch=True)
            .sort(["doc_a", "doc_b"]))


def tfidf_cosine_pairs_sql(min_sim_millionths: int = 300_000,
                           max_df_permille: int = 500,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           table: str = "documents") -> str:
    from fluent_server_ray.stages.dedup import _PY_WHITESPACE_RE2

    return f"""
WITH toks AS (
  SELECT {id_col} AS d,
    unnest(list_filter(regexp_split_to_array({text_col},
                                             '{_PY_WHITESPACE_RE2}'),
                       x -> x <> '')) AS term
  FROM {table}
), tf AS (
  SELECT d, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY d, term
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), nn AS (
  SELECT count(*) AS n FROM {table}
), kept AS (
  SELECT term,
    CAST(floor(ln(CAST(nn.n AS DOUBLE) / dft.df) * 1000) AS BIGINT)
      AS idf_k
  FROM dft CROSS JOIN nn
  WHERE df >= 2 AND df * 1000 <= {max_df_permille} * nn.n
), w AS (
  SELECT tf.d, tf.term, CAST(tf.tf * k.idf_k AS HUGEINT) AS w
  FROM tf JOIN kept k USING (term)
), norms AS (
  SELECT d, sum(w * w) AS n2 FROM w GROUP BY d
), dots AS (
  SELECT a.d AS doc_a, b.d AS doc_b, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.d < b.d
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT doc_a, doc_b,
    CAST(floor((1000000.0 * CAST(CAST(dot AS VARCHAR) AS DOUBLE))
         / (sqrt(CAST(CAST(na.n2 AS VARCHAR) AS DOUBLE))
            * sqrt(CAST(CAST(nb.n2 AS VARCHAR) AS DOUBLE))))
         AS BIGINT) AS sim_millionths
  FROM dots JOIN norms na ON na.d = dots.doc_a
            JOIN norms nb ON nb.d = dots.doc_b
) WHERE sim_millionths >= {min_sim_millionths}
ORDER BY doc_a, doc_b
""".strip()


def kcenter_sample(ds, k: int = 16, emb_col: str = "embedding",
                   id_col: str = "vec_id"):
    """Greedy k-CENTER selection (farthest-point sampling) — the
    classic coverage-maximizing subset rule behind dataset
    distillation / diverse seed-set picking (Sener & Savarese 2018's
    coreset baseline): start from the min-id vector, then repeatedly
    take the point FARTHEST from everything selected so far (squared
    L2; ties by min id — fully deterministic, no RNG).

    Iterative by nature (k rounds; no SQL form — pinned by a
    brute-force pytest like kmeans/PCA): each round broadcasts only
    the NEWEST center, every block updates a carried running
    min-distance column in one vectorized pass, and a per-block top-1
    combiner reduces to an O(blocks) driver argmax. The corpus stays
    in the object store; driver state is k ids.

    Returns a pyarrow Table (sel_idx, vec_id, dist2) where ``dist2``
    is the point's distance² to the previously selected set at the
    moment of selection (sel_idx 0 = seed, dist2 0).
    """
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import skip_empty

    ds = ds.materialize()

    def seed_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table({"i": pa.array([int(ids.min())], pa.int64())})

    parts = list(ds.map_batches(skip_empty(seed_partial),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
                 .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not parts:
        return pa.table({"sel_idx": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "dist2": pa.array([], pa.float64())})
    seed = min(int(p["i"].to_numpy().min()) for p in parts)

    def fetch_vec(target: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False)
            hit = ids == target
            if not hit.any():
                return pa.table({"v": pa.array([], pa.list_(pa.float64()))})
            m = _batch_matrix(t, emb_col)[hit][:1]
            return pa.table({"v": pa.array([m[0].tolist()],
                                           pa.list_(pa.float64()))})
        tabs = list(ds.map_batches(skip_empty(f), batch_format="pyarrow",
                                   zero_copy_batch=True)
                    .iter_batches(batch_size=None, batch_format="pyarrow"))
        for p in tabs:
            if p.num_rows:
                return np.asarray(p["v"][0].as_py(), dtype=np.float64)
        raise KeyError(target)

    import ray as _ray

    selected = [(0, seed, 0.0)]
    cur = ds
    center_ref = _ray.put(fetch_vec(seed))

    for round_i in range(1, min(k, cur.count())):
        def update(t: pa.Table, _c=center_ref) -> pa.Table:
            c = _ray.get(_c)
            m = _batch_matrix(t, emb_col)
            d2 = ((m - c[None, :]) ** 2).sum(axis=1)
            if "_mind" in t.column_names:
                prev = t["_mind"].to_numpy(zero_copy_only=False)
                d2 = np.minimum(prev, d2)
                t = t.drop_columns(["_mind"])
            return t.append_column("_mind", pa.array(d2, pa.float64()))

        cur = cur.map_batches(update, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

        def top1(t: pa.Table) -> pa.Table:
            d = t["_mind"].to_numpy(zero_copy_only=False)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            # farthest; ties -> min id (argmax picks first of the max
            # run only after a stable id sort)
            order = np.lexsort((ids, -d))
            j = order[0]
            return pa.table({"i": pa.array([int(ids[j])], pa.int64()),
                             "d": pa.array([float(d[j])], pa.float64())})

        tops = pa.concat_tables(
            cur.map_batches(skip_empty(top1), batch_format="pyarrow",
                            zero_copy_batch=True)
            .iter_batches(batch_size=None, batch_format="pyarrow"))
        di = tops["d"].to_numpy(zero_copy_only=False)
        ii = tops["i"].to_numpy(zero_copy_only=False)
        o = np.lexsort((ii, -di))[0]
        nid, nd = int(ii[o]), float(di[o])
        selected.append((round_i, nid, nd))
        center_ref = _ray.put(fetch_vec(nid))

    return pa.table({
        "sel_idx": pa.array([s[0] for s in selected], pa.int64()),
        id_col: pa.array([s[1] for s in selected], pa.int64()),
        "dist2": pa.array([s[2] for s in selected], pa.float64()),
    })


# ------------------------------------------ MMR diversified re-ranking

def mmr_topk(ds, query_id: int = 0, k: int = 10, pool: int = 50,
             lam: float = 0.7, id_col: str = "vec_id",
             emb_col: str = "embedding") -> pa.Table:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): the top-``k`` diverse neighbors of one query vector —
    greedily pick the candidate maximizing ``λ·rel(d) − (1−λ)·max_{s∈
    selected} sim(d, s)``, ties by id ascending. The
    relevance-vs-redundancy re-ranker that keeps a retrieval page (or
    a dedup-aware sampling pool) from filling with near-copies.

    Scale shape: standard MMR practice re-ranks a bounded relevance
    pool, and that is the distributed contract here — stage 1 is the
    brute cosine top-``pool`` scan (per-block partial top-pool +
    O(blocks·pool) driver merge, the ann_topk plan); stage 2 (the
    greedy loop, inherently sequential) runs on the pool's pool×pool
    sim matrix driver-side — pool² floats, corpus-independent. The
    corpus streams exactly once.

    Returns (rank, vec_id) — ranks only, like ann_topk: the float
    scores are reduction-order-sensitive across engines, the ORDER is
    stable (argmax gaps ≫ ulp noise on real embeddings)."""
    import ray

    def grab_query(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t[id_col], query_id))

    qblocks = [b for b in ds.map_batches(
        grab_query, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows]
    out_fields = [("rank", pa.int64()), (id_col, pa.int64())]
    if not qblocks:
        return pa.schema(out_fields).empty_table()
    qtab = pa.concat_tables(qblocks)
    qvec = _normalize(_batch_matrix(qtab, emb_col))[0]
    qref = ray.put(qvec)

    def local_pool(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids != query_id
        ids = ids[keep]
        if not len(ids):
            return pa.table({"vid": pa.array([], pa.int64()),
                             "rel": pa.array([], pa.float64())})
        mat = _normalize(_batch_matrix(t, emb_col)[keep])
        rel = mat @ q
        order = np.lexsort((ids, -rel))[:pool]
        return pa.table({"vid": pa.array(ids[order], pa.int64()),
                         "rel": pa.array(rel[order], pa.float64())})

    parts = pa.concat_tables(
        ds.map_batches(local_pool, batch_format="pyarrow",
                       zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not len(parts):
        return pa.schema(out_fields).empty_table()
    ids = parts["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
    rel = parts["rel"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -rel))[:pool]
    pool_ids = ids[order]
    pool_rel = rel[order]

    # pool-sized vector fetch (one filtered pass) + driver greedy
    pset = pa.array([int(i) for i in pool_ids], pa.int64())

    def grab_pool(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[id_col], value_set=pset))

    ptab = pa.concat_tables(
        ds.map_batches(grab_pool, batch_format="pyarrow",
                       zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    pids = ptab[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    pmat = _normalize(_batch_matrix(ptab, emb_col))
    # align pool order
    pos = {int(v): i for i, v in enumerate(pids)}
    pmat = pmat[[pos[int(v)] for v in pool_ids]]
    sims = pmat @ pmat.T

    n = len(pool_ids)
    selected: list[int] = []
    chosen = np.zeros(n, dtype=bool)
    max_sim = np.full(n, -np.inf)
    for _ in range(min(k, n)):
        if not selected:
            score = pool_rel.copy()
        else:
            score = lam * pool_rel - (1.0 - lam) * max_sim
        score[chosen] = -np.inf
        # argmax with id-asc tie-break: lexsort on (-score, id)
        best = int(np.lexsort((pool_ids, -score))[0])
        selected.append(int(pool_ids[best]))
        chosen[best] = True
        max_sim = np.maximum(max_sim, sims[:, best])
    return pa.table({
        "rank": pa.array(range(1, len(selected) + 1), pa.int64()),
        id_col: pa.array(selected, pa.int64()),
    })


def mmr_topk_sql(query_id: int = 0, k: int = 10, pool: int = 50,
                 lam: float = 0.7, table: str = "embeddings") -> str:
    """Unrolled-greedy mirror: the same bounded pool (top-``pool`` by
    cosine), then ``k`` MATERIALIZED selection rounds — each round's
    argmax is a correlated max over the pairs of already-selected rows
    (the BPE-oracle unrolled-chain device)."""
    rounds = []
    prev = None
    for r in range(1, k + 1):
        if r == 1:
            rounds.append(
                "sel1 AS MATERIALIZED (SELECT vec_id, 1 AS rank "
                "FROM cand ORDER BY rel DESC, vec_id LIMIT 1)")
            prev = "sel1"
        else:
            rounds.append(f"""
pick{r} AS MATERIALIZED (
  SELECT c.vec_id FROM cand c
  WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
  ORDER BY {lam} * c.rel - (1.0 - {lam}) * (
      SELECT max(p.sim) FROM pairs p
      WHERE p.a = c.vec_id
        AND p.b IN (SELECT vec_id FROM {prev})) DESC,
    c.vec_id
  LIMIT 1
),
sel{r} AS MATERIALIZED (
  SELECT * FROM {prev}
  UNION ALL SELECT vec_id, {r} FROM pick{r}
)""".strip())
            prev = f"sel{r}"
    chain = ",\n".join(rounds)
    return f"""
WITH cand AS MATERIALIZED (
  SELECT c.vec_id,
    list_cosine_similarity(q.embedding, c.embedding) AS rel
  FROM {table} q JOIN {table} c ON c.vec_id <> q.vec_id
  WHERE q.vec_id = {query_id}
  ORDER BY rel DESC, c.vec_id LIMIT {pool}
), pairs AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b,
    list_cosine_similarity(x.embedding, y.embedding) AS sim
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
  JOIN {table} x ON x.vec_id = a.vec_id
  JOIN {table} y ON y.vec_id = b.vec_id
),
{chain}
SELECT CAST(rank AS BIGINT) AS rank, vec_id FROM {prev} ORDER BY rank
""".strip()


def hard_negative_topk(ds, query_ids: list[int], k: int = 5,
                       id_col: str = "vec_id", emb_col: str = "embedding",
                       label_col: str = "label"):
    """Contrastive hard-negative mining: for each labeled query vector,
    the exact cosine top-k neighbors whose label DIFFERS — the pairs a
    metric-learning / embedding-finetune pipeline trains against.

    Same contract as :func:`ann_topk` (rank 1..k by cosine desc,
    neighbor_id asc; only ranks are emitted, so the engine/mirror float
    trees only need to agree on ORDER, the pinned precedent).

    Scale shape: the query matrix (+labels) broadcasts once via
    ``ray.put``; each block computes a (Q, n) sim matrix, masks
    same-label columns to −inf and emits its local top-k; the driver
    merge is |queries|·k-bounded."""
    import ray

    qset = set(query_ids)

    def grab_queries(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[id_col], value_set=pa.array(list(qset)))
        return t.filter(mask)

    qtab = pa.concat_tables(
        ds.map_batches(grab_queries, batch_format="pyarrow",
                       zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    qid_np = qtab[id_col].to_numpy()
    order = np.argsort(qid_np)
    qids = qid_np[order]
    qlab = qtab[label_col].to_numpy().astype(np.int64)[order]
    qmat = _normalize(_batch_matrix(qtab, emb_col)[order])
    qref = ray.put((qids, qlab, qmat))

    def local_topk(t: pa.Table) -> pa.Table:
        ids_q, lab_q, mat_q = ray.get(qref)
        ids = t[id_col].to_numpy().astype(np.int64)
        labs = t[label_col].to_numpy().astype(np.int64)
        mat = _normalize(_batch_matrix(t, emb_col))
        sims = mat_q @ mat.T  # (Q, n)
        # same-label columns (and the query row itself) are not
        # negatives — mask them out of the ranking entirely
        neg = (labs[None, :] != lab_q[:, None]) \
            & (ids[None, :] != ids_q[:, None])
        sims = np.where(neg, sims, -np.inf)
        out_q, out_n, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, kk - 1)[:kk]
            for j in top:
                if np.isfinite(row[j]):
                    out_q.append(int(ids_q[qi]))
                    out_n.append(int(ids[j]))
                    out_s.append(float(row[j]))
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "cosine": pa.array(out_s, type=pa.float64()),
        })

    partials = pa.concat_tables(
        ds.map_batches(local_topk, batch_format="pyarrow",
                       zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ).to_pandas()
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"],
        ascending=[True, False, True])
    out = partials.groupby("query_id", sort=True).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def hard_negative_topk_sql(query_ids: list[int], k: int = 5,
                           table: str = "embeddings") -> str:
    ids = ", ".join(str(i) for i in sorted(query_ids))
    return f"""
WITH sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, c.embedding) AS cosine
  FROM {table} q JOIN {table} c
    ON q.vec_id <> c.vec_id AND q.label <> c.label
  WHERE q.vec_id IN ({ids})
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
""".strip()


def knn_classify(ds, query_ids: list[int], k: int = 5,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 label_col: str = "label"):
    """kNN label audit: predict each query vector's label by majority
    vote among its exact cosine top-k neighbors (self excluded) and
    compare against the stored label — the mislabeled-sample /
    label-quality screen a curation pipeline runs over embeddings.

    Deterministic contract: neighbors rank by (cosine desc, id asc)
    — the :func:`ann_topk` precedent — and the vote breaks ties by
    (count desc, label asc), so prediction is a pure function of the
    rank order both engines agree on.

    Scale shape: identical to :func:`ann_topk` — broadcast query
    matrix, per-block local top-k (labels ride along), |queries|·k
    driver merge + vote."""
    import ray

    qset = set(query_ids)

    def grab_queries(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[id_col], value_set=pa.array(list(qset)))
        return t.filter(mask)

    qtab = pa.concat_tables(
        ds.map_batches(grab_queries, batch_format="pyarrow",
                       zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    qid_np = qtab[id_col].to_numpy()
    order = np.argsort(qid_np)
    qids = qid_np[order]
    qlab = qtab[label_col].to_numpy().astype(np.int64)[order]
    qmat = _normalize(_batch_matrix(qtab, emb_col)[order])
    qref = ray.put((qids, qmat))

    def local_topk(t: pa.Table) -> pa.Table:
        ids_q, mat_q = ray.get(qref)
        ids = t[id_col].to_numpy().astype(np.int64)
        labs = t[label_col].to_numpy().astype(np.int64)
        mat = _normalize(_batch_matrix(t, emb_col))
        sims = mat_q @ mat.T
        out_q, out_n, out_l, out_s = [], [], [], []
        kk = min(k + 1, sims.shape[1])  # +1 in case self is local
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, kk - 1)[:kk]
            for j in top:
                if ids[j] != ids_q[qi]:
                    out_q.append(int(ids_q[qi]))
                    out_n.append(int(ids[j]))
                    out_l.append(int(labs[j]))
                    out_s.append(float(row[j]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "nlabel": pa.array(out_l, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        })

    partials = pa.concat_tables(
        ds.map_batches(local_topk, batch_format="pyarrow",
                       zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ).to_pandas()
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"],
        ascending=[True, False, True])
    top = partials.groupby("query_id", sort=True).head(k)
    votes = (top.groupby(["query_id", "nlabel"]).size().rename("n")
             .reset_index()
             .sort_values(["query_id", "n", "nlabel"],
                          ascending=[True, False, True]))
    pred = votes.groupby("query_id", sort=True).head(1)
    true_of = dict(zip(qids.tolist(), qlab.tolist()))
    out = pa.table({
        "query_id": pa.array(pred["query_id"].astype("int64")),
        "predicted_label": pa.array(pred["nlabel"].astype("int64")),
        "true_label": pa.array(
            [true_of[int(q)] for q in pred["query_id"]], pa.int64()),
    })
    return out.append_column(
        "correct", pc.equal(out["predicted_label"], out["true_label"]))


def knn_classify_sql(query_ids: list[int], k: int = 5,
                     table: str = "embeddings") -> str:
    ids = ", ".join(str(i) for i in sorted(query_ids))
    return f"""
WITH sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         c.label AS nlabel,
         list_cosine_similarity(q.embedding, c.embedding) AS cosine
  FROM {table} q JOIN {table} c ON q.vec_id <> c.vec_id
  WHERE q.vec_id IN ({ids})
), ranked AS (
  SELECT query_id, nlabel,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM sims
), votes AS (
  SELECT query_id, nlabel, count(*) AS n
  FROM ranked WHERE rank <= {k} GROUP BY 1, 2
), pred AS (
  SELECT query_id, nlabel,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY n DESC, nlabel) AS rn
  FROM votes
)
SELECT p.query_id, CAST(p.nlabel AS BIGINT) AS predicted_label,
  CAST(q.label AS BIGINT) AS true_label,
  (p.nlabel = q.label) AS correct
FROM pred p JOIN {table} q ON q.vec_id = p.query_id
WHERE p.rn = 1
ORDER BY p.query_id
""".strip()
