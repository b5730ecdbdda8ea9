"""Round-5 operators: the exact-degenerate IVF driver twin, the
fixed-centroid k-means assignment step, and the schema-stability
contract of the map_buckets migration (typed empty partitions)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _duck(df, sql, view="embeddings"):
    con = duckdb.connect()
    con.register(view, df)
    return con.execute(sql).df()


def _cmp(ray_df, duck_df):
    assert sorted(ray_df.columns) == sorted(duck_df.columns)
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = duck_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def _emb_df(n=120, d=16, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [rng.standard_normal(d).astype(np.float32).tolist()
                      for _ in range(n)],
    })


# --------------------------------------- IVF exact-degenerate setting

def test_ivf_nprobe_all_equals_brute_force(ray_session):
    """n_probe = n_centroids makes every query scan every inverted
    list — the result must equal ann_topk bit for bit (this is the
    identity the strict driver row ann_ivf_exact rests on)."""
    from fluent_server_ray.stages.similarity import ann_topk, ivf_topk

    df = _emb_df()
    qids = [0, 1, 2, 3]
    brute = ann_topk(rd.from_pandas(df), qids, k=5)
    ivf = ivf_topk(rd.from_pandas(df), qids, k=5,
                   n_centroids=8, n_probe=8)
    pd.testing.assert_frame_equal(
        brute.reset_index(drop=True), ivf.reset_index(drop=True))


# --------------------------------------- fixed-centroid assignment

def test_kmeans_assign_fixed_hand_pin(ray_session):
    """Two orthogonal pinned centroids: vectors colinear with each go
    to it; an exact tie (the zero-cosine diagonal vector) breaks to
    the LOWEST centroid id."""
    from fluent_server_ray.stages.similarity import kmeans_assign_fixed

    e = {
        0: [1.0, 0.0, 0.0, 0.0],     # centroid 0
        1: [0.0, 1.0, 0.0, 0.0],     # centroid 1
        2: [2.0, 0.1, 0.0, 0.0],     # → 0
        3: [-0.1, 3.0, 0.0, 0.0],    # → 1
        4: [0.0, 0.0, 1.0, 0.0],     # cos 0 with both → tie → 0
    }
    df = pd.DataFrame({
        "vec_id": list(e),
        "embedding": [list(map(float, v)) for v in e.values()],
    })
    out = kmeans_assign_fixed(
        rd.from_pandas(df), centroid_ids=(0, 1)).to_pandas()
    got = dict(zip(out["cluster"], out["n_vecs"]))
    assert got == {0: 3, 1: 2}  # c0: vecs 0, 2, tie-vec 4; c1: 1, 3


def test_kmeans_assign_fixed_duckdb_parity(ray_session):
    from fluent_server_ray.stages.similarity import (
        kmeans_assign_fixed, kmeans_assign_fixed_sql)

    df = _emb_df(n=200, d=12, seed=9)
    out = kmeans_assign_fixed(
        rd.from_pandas(df), centroid_ids=tuple(range(6))).to_pandas()
    duck = _duck(df, kmeans_assign_fixed_sql(tuple(range(6))))
    _cmp(out, duck)
    assert out["n_vecs"].sum() == len(df)


# --------------------------------------- schema-stable group stages

def test_distinct_pairs_schema_stable_under_empty_partitions(ray_session):
    """A pair set hashing into few buckets leaves most of the 256 sort
    partitions empty; every output block must still carry the pinned
    (doc_a, doc_b) schema (no empty-schema RefBundles, no object
    dtypes)."""
    from fluent_server_ray.stages.dedup import distinct_pairs

    pairs = pd.DataFrame({
        "doc_a": np.repeat([1, 2], 5).astype(np.int64),
        "doc_b": np.tile(np.arange(10, 15), 2).astype(np.int64),
    })
    out = distinct_pairs(rd.from_pandas(pairs))
    tables = list(out.iter_batches(batch_size=None,
                                   batch_format="pyarrow"))
    want = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    assert all(t.schema == want for t in tables)
    total = sum(t.num_rows for t in tables)
    assert total == 10


def test_exact_dedup_string_id_schema(ray_session):
    """The conv-id variant (string ids) keeps its declared Arrow types
    through the schema-pinned bucket stage."""
    from fluent_server_ray.stages.dedup import exact_dedup

    df = pd.DataFrame({
        "conv_id": ["a", "b", "c", "d"],
        "doc_text": ["x", "x", "y", None],
    })
    out = exact_dedup(rd.from_pandas(df), id_col="conv_id",
                      text_col="doc_text")
    tables = list(out.iter_batches(batch_size=None,
                                   batch_format="pyarrow"))
    for t in tables:
        assert t.schema.field("conv_id").type == pa.string()
        assert t.schema.field("doc_text").type == pa.string()
    got = pa.concat_tables(tables).to_pandas()
    assert sorted(got["conv_id"]) == ["a", "c", "d"]
