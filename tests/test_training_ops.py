"""Training-data operators (dedup / textstats / similarity / multimodal
/ windows) vs DuckDB oracles at sf0.001, plus behavior tests for the
probabilistic ops on constructed near-duplicate fixtures."""

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMALL
from tests.test_ray_entry import _con, _to_df


ORACLE_QUERIES = [
    "doc_token_counts",
    "doc_quality",
    "doc_langid",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_prefix_block",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "embedding_dup_clusters",
    "event_value_stats",
    "conv_value_stats",
    "transcripts_sample_convs",
    "curation_pipeline",
    "transcripts_tenant_counts_salted",
    "range_join_purchase_windows",
    "tumbling_value_agg",
    "doc_token_quantiles",
    "heavy_hitter_tags",
    "ann_cosine_topk",
    "embedding_dupes",
    "multimodal_decode",
    "sessionize",
    "tumbling_counts",
    "lineitem_agg",
    "orders_by_nation",
    "top_orders",
    "distinct_event_types",
    "union_high_low",
    "join_revenue_by_priority",
    "dedup_replayed_turns",
    "asof_prior_click",
    "anti_join_customers",
    "topk_per_customer",
    "multimodal_frames",
    "sliding_counts",
    "doc_bpe_token_counts",
    "doc_tfidf",
    "multimodal_resize",
    "price_quantiles",
    "value_quantiles_by_type",
    "doc_pii_scrub",
    "transcripts_scrub_uids",
    "doc_ngram_repetition",
    "doc_decontaminate",
    "conv_running_stats",
    "conv_documents",
    "doc_pack_sequences",
    "doc_split_assign",
    "semi_join_customers",
    "events_late_flags",
    "events_extract_props",
    "docs_per_source_cap",
    "docs_corpus_shuffle",
    "docs_sample_bottomk",
    "user_funnel",
    "window_distinct_users",
    "customer_order_profile",
    "rollup_order_counts",
    "vocab_top_words",
    "docs_weighted_sample",
    "trending_tags",
    "transcripts_suppress",
    "asof_next_click",
    "dedup_incremental",
    "shipping_priority",
    "transcripts_copy_route",
    "dedup_substring",
    "doc_unigram_logprob",
    "embedding_quantize",
    "user_retention_cohorts",
    "order_count_distribution",
    "events_value_rank_in_type",
    "lm_prep_pipeline",
    "doc_normalize",
    "users_per_event_type",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_training_query_matches_oracle(ray_session, name):
    import __ray_entry__ as e

    ray_df = _to_df(e.queries()[name](SF_SMALL))
    duck_df = _con(SF_SMALL).execute(e.oracle_sql()[name]).df()
    assert sorted(ray_df.columns) == sorted(duck_df.columns), name
    assert len(ray_df) == len(duck_df), f"{name}: {len(ray_df)} vs {len(duck_df)}"
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = duck_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_minhash_finds_constructed_near_dups(ray_session):
    """MinHash+LSH must recover pairs that share ~90% of their words."""
    import ray.data as rd

    from fluent_server_ray.stages.dedup import (
        minhash_lsh_candidates,
        verify_jaccard_pairs,
    )

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(500)]
    docs = []
    for i in range(40):
        words = list(rng.choice(vocab, size=60, replace=False))
        docs.append({"doc_id": 2 * i, "text": " ".join(words)})
        near = words.copy()
        near[0], near[1] = "zz1", "zz2"  # ~97% overlap
        docs.append({"doc_id": 2 * i + 1, "text": " ".join(near)})
    df = pd.DataFrame(docs)
    ds = rd.from_pandas(df)
    cand = minhash_lsh_candidates(ds).to_pandas()
    found = verify_jaccard_pairs(cand, df, threshold=0.8)
    got = set(zip(found["doc_a"], found["doc_b"]))
    want = {(2 * i, 2 * i + 1) for i in range(40)}
    # LSH with 16 bands x 4 rows at J~0.94 has recall ~1-1e-9 per pair
    assert want <= got
    # and no wildly-wrong pairs survive verification
    assert all(b - a == 1 for a, b in got)


def test_simhash_near_dups_collide(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.dedup import simhash_signatures

    rng = np.random.default_rng(5)
    words = list(rng.choice([f"w{i}" for i in range(500)], size=60, replace=False))
    near = words.copy()
    near[0], near[1] = "zz1", "zz2"
    other = list(rng.choice([f"v{i}" for i in range(500)], size=60, replace=False))
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [" ".join(words), " ".join(near), " ".join(other)],
        }
    )
    sigs = simhash_signatures(rd.from_pandas(df)).to_pandas()
    s = sigs.set_index("doc_id")["simhash"]
    ham = lambda a, b: bin(int(a) ^ int(b)).count("1")
    # ~97% word overlap → few flipped bits; unrelated docs → ~32
    assert ham(s[0], s[1]) <= 12
    assert ham(s[0], s[2]) >= 20


def test_exact_dedup_removes_constructed_dups(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.dedup import exact_dedup

    df = pd.DataFrame(
        {
            "doc_id": [5, 3, 9, 7, 1],
            "text": ["same", "same", "same", "other", "third"],
        }
    )
    out = exact_dedup(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [1, 3, 7]  # min id wins per text


def test_decode_real_path_or_honest_stub():
    """real=True decodes actual image bytes when PIL is importable
    (same output schema as the fake path; undecodable payloads keep
    their row with zero dims); without an image library it raises the
    documented NotImplementedError. Either way green — the optional
    import is the contract."""
    import pyarrow as pa

    from fluent_server_ray.stages.multimodal import DecodeStub, _image_module

    if _image_module() is None:
        with pytest.raises(NotImplementedError):
            DecodeStub(real=True)
        return

    import io

    img = _image_module().new("RGB", (37, 21))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    batch = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "payload": pa.array([buf.getvalue(), b"not an image"],
                            type=pa.binary()),
    })
    out = DecodeStub(real=True)(batch)
    assert out.column_names == ["doc_id", "n_bytes", "width", "height",
                                "checksum"]
    assert out["width"].to_pylist() == [37, 0]
    assert out["height"].to_pylist() == [21, 0]


def test_lsh_bucketed_cosine_dupes_matches_exact(ray_session):
    """The multi-table-LSH scale path (the one the driver query runs)
    reproduces the exact all-pairs baseline at the tuned defaults:
    in-bucket verification makes precision exactly 1, and 24 tables x
    2 planes put per-pair miss probability ~3e-6 at cosine 0.43 — so
    set equality with the O(n²) driver baseline is the expectation,
    deterministic under the fixed plane seed."""
    from fluent_server_ray.stages.similarity import cosine_dupes
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    exact = cosine_dupes(ds, threshold=0.42, exact=True)
    approx = cosine_dupes(
        rd.read_parquet(f"{SF_SMALL}/embeddings.parquet"),
        threshold=0.42, exact=False,
    ).to_pandas()  # pair ops return Datasets; collect at test scale only
    e = set(zip(exact["vec_a"], exact["vec_b"]))
    a = set(zip(approx["vec_a"], approx["vec_b"]))
    assert len(e) > 0
    assert a == e


def test_minhash_near_dupes_matches_driver_baseline(ray_session):
    """The distributed MinHash verification (texts shipped for candidate
    ids only, verified in-cluster) returns exactly what the driver-side
    verifier returns on the same candidates."""
    import ray.data as rd

    from fluent_server_ray.stages.dedup import (
        minhash_lsh_candidates,
        minhash_near_dupes,
        verify_jaccard_pairs,
    )

    ds = rd.read_parquet(f"{SF_SMALL}/documents.parquet")
    dist = minhash_near_dupes(ds).to_pandas()
    cand = minhash_lsh_candidates(
        rd.read_parquet(f"{SF_SMALL}/documents.parquet")
    ).to_pandas()
    docs = rd.read_parquet(f"{SF_SMALL}/documents.parquet").to_pandas()
    base = verify_jaccard_pairs(cand, docs).sort_values(
        ["doc_a", "doc_b"]
    ).reset_index(drop=True)
    assert set(zip(dist["doc_a"], dist["doc_b"])) == set(
        zip(base["doc_a"], base["doc_b"])
    )
    assert len(dist) > 0


def test_winnow_fingerprints_shared_content(ray_session):
    """Docs sharing a phrase share fingerprints; unrelated docs don't."""
    import ray.data as rd

    from fluent_server_ray.stages.textstats import (
        apply_doc_stage,
        winnow_fingerprints_batch,
    )

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the quick brown fox jumps over the lazy dog and runs far away",
                "PREFIX the quick brown fox jumps over the lazy dog SUFFIX!!",
                "completely unrelated content with nothing in common whatsoever",
            ],
        }
    )
    out = apply_doc_stage(
        rd.from_pandas(df), winnow_fingerprints_batch
    ).to_pandas()
    s = {i: set(out[out["doc_id"] == i]["fp"]) for i in (1, 2, 3)}
    assert len(s[1] & s[2]) >= 5
    assert len(s[1] & s[3]) == 0
    # deterministic across runs
    out2 = apply_doc_stage(
        rd.from_pandas(df), winnow_fingerprints_batch
    ).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["doc_id", "fp"]).reset_index(drop=True),
        out2.sort_values(["doc_id", "fp"]).reset_index(drop=True),
    )


def test_ivf_topk_recall_vs_bruteforce(ray_session):
    """IVF with n_probe=8/16 centroids must recover most of the exact
    top-k (probabilistic scale path; recall pinned, not equality)."""
    import ray.data as rd

    from fluent_server_ray.stages.similarity import ann_topk, ivf_topk

    path = f"{SF_SMALL}/embeddings.parquet"
    qids = list(range(8))
    exact = ann_topk(rd.read_parquet(path), qids, k=5)
    approx = ivf_topk(rd.read_parquet(path), qids, k=5,
                      n_centroids=16, n_probe=8)
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall


def test_ivf_persisted_index_prunes_reads(ray_session, tmp_path):
    """ivf_build writes the corpus partitioned by centroid id;
    ivf_search reads ONLY the probed lists (n_probe/n_centroids of the
    files) and returns exactly what the in-stream ivf_topk returns for
    the same quantizer (same kmeans seed)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from fluent_server_ray.stages.similarity import (
        _batch_matrix,
        ivf_build,
        ivf_search,
        ivf_topk,
    )

    path = f"{SF_SMALL}/embeddings.parquet"
    index_dir = str(tmp_path / "ivf")
    ivf_build(rd.read_parquet(path), index_dir, n_centroids=16)

    qids = list(range(8))
    tab = pq.read_table(path)
    mask = np.isin(tab["vec_id"].to_numpy(), qids)
    qtab = tab.filter(mask)
    order = np.argsort(qtab["vec_id"].to_numpy())
    qmat = _batch_matrix(qtab)[order]

    got, stats = ivf_search(index_dir, qids, qmat, k=5, n_probe=4,
                            return_stats=True)
    # pruning evidence: strictly fewer lists read than exist, bounded
    # by the union of per-query probes
    assert stats["n_lists_total"] == 16
    assert 0 < stats["n_lists_read"] < 16
    assert stats["n_lists_read"] <= 4 * len(qids)

    want = ivf_topk(rd.read_parquet(path), qids, k=5, n_centroids=16,
                    n_probe=4)
    assert set(zip(got["query_id"], got["neighbor_id"])) == set(
        zip(want["query_id"], want["neighbor_id"])
    )


def test_pair_components_chain_and_convergence(ray_session):
    """Hash-min label propagation: a CHAIN (worst-case diameter) and
    disjoint cliques resolve to min-id components; empty input returns
    a typed empty Dataset."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.dedup import pair_components

    # chain 10-11-12-13-14 (diameter 4) + clique {20,21,22} + pair {30,31}
    pairs = pd.DataFrame(
        {
            "doc_a": [10, 11, 12, 13, 20, 20, 21, 30],
            "doc_b": [11, 12, 13, 14, 21, 22, 22, 31],
        }
    )
    out = pair_components(rd.from_pandas(pairs)).to_pandas()
    got = dict(zip(out["doc_id"], out["component"]))
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 31: 30}

    empty = pair_components(
        rd.from_arrow(
            pa.table({"doc_a": pa.array([], type=pa.int64()),
                      "doc_b": pa.array([], type=pa.int64())})
        )
    )
    assert empty.count() == 0
    assert empty.schema().names == ["doc_id", "component"]

    # exhausting max_iters with labels still moving must raise, never
    # return silently-wrong components
    with pytest.raises(RuntimeError, match="did not converge"):
        pair_components(rd.from_pandas(pairs), max_iters=2)

    # the DISTRIBUTED propagation (corpus-scale path, forced by
    # driver_max_edges=0) computes the identical fixpoint
    dist = pair_components(rd.from_pandas(pairs),
                           driver_max_edges=0).to_pandas()
    assert dict(zip(dist["doc_id"], dist["component"])) == got
    with pytest.raises(RuntimeError, match="did not converge"):
        pair_components(rd.from_pandas(pairs), max_iters=2,
                        driver_max_edges=0)


def test_grouped_quantiles_null_values_match_oracle(ray_session):
    """NULL values must be excluded from the histogram (not clipped
    into bucket 0), a NULL group key maps to '' on both sides, and an
    all-NULL group yields no row — engine vs DuckDB on a nully table."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.sketches import (
        grouped_binned_quantiles,
        grouped_binned_quantiles_sql,
    )

    t = pa.table(
        {
            "g": pa.array(["a", "a", "a", None, "b", "b", "onlynull"]),
            "v": pa.array([1.0, None, 9.0, 5.0, 2.0, None, None]),
        }
    )
    got = grouped_binned_quantiles(
        rd.from_arrow(t), "g", "v", lo=0.0, hi=10.0, bins=10, qs=(0.5,)
    ).to_pandas()
    con = duckdb.connect()
    con.register("tbl", t)
    want = con.execute(
        grouped_binned_quantiles_sql("g", "v", lo=0.0, hi=10.0, bins=10,
                                     qs=(0.5,), table="tbl")
    ).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert "onlynull" not in set(got["g"])
    assert "" in set(got["g"])  # the NULL group key, canonicalized


def test_curation_near_dedup_keeps_min_per_component(ray_session):
    """gate → exact dedup → minhash pairs → components → keep min-id:
    a 3-doc near-dup cluster collapses to its min id, distinct docs
    survive, gated docs never reach the near-dup stage."""
    import ray.data as rd

    from fluent_server_ray.pipelines.curation import (
        curate_documents_near_dedup,
    )

    rng = np.random.default_rng(7)
    vocab = [f"word{i}" for i in range(400)]
    base = list(rng.choice(vocab, size=60, replace=False))
    near1 = base.copy(); near1[0] = "changedone"
    near2 = base.copy(); near2[-1] = "changedtwo"
    distinct = list(rng.choice(vocab, size=60, replace=False))
    docs = pd.DataFrame(
        {
            "doc_id": [10, 11, 12, 20, 30],
            "text": [
                " ".join(base), " ".join(near1), " ".join(near2),
                " ".join(distinct),
                "short low 1 2 3",  # fails the ≥20-token gate
            ],
        }
    )
    out = curate_documents_near_dedup(rd.from_pandas(docs)).to_pandas()
    assert sorted(out["doc_id"]) == [10, 20]  # cluster→min id; gated gone


def test_ivf_quantizer_sample_uniform_on_clustered_corpus(ray_session):
    """A corpus ORDERED by distribution (head drawn from cluster A,
    tail from cluster B) must yield a quantizer sample containing both
    — ds.limit() took the stream head and biased the centroids to A —
    and IVF recall for tail (B) queries must hold."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.similarity import (
        _bottomk_sample_matrix,
        ann_topk,
        ivf_topk,
    )

    rng = np.random.default_rng(23)
    n_a, n_b, d = 3000, 1000, 16
    a = rng.standard_normal((n_a, d))
    a[:, :8] += 6.0
    b = rng.standard_normal((n_b, d))
    b[:, 8:] -= 6.0
    mat = np.vstack([a, b])
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(n_a + n_b, dtype=np.int64)),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(tab).repartition(16)

    sample = _bottomk_sample_matrix(ds, 1000)
    assert len(sample) == 1000
    frac_b = float((sample[:, 8:].sum(axis=1) < -20).mean())
    # uniform over the corpus → ~25% from the tail cluster
    assert 0.15 < frac_b < 0.35, frac_b

    # recall for TAIL queries with the sampled quantizer
    qids = list(range(n_a + n_b - 8, n_a + n_b))
    exact = ann_topk(rd.from_arrow(tab), qids, k=5)
    approx = ivf_topk(rd.from_arrow(tab).repartition(16), qids, k=5,
                      n_centroids=16, n_probe=4, sample_size=1000)
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    ap = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(e & ap) / len(e)
    assert recall >= 0.8, recall


def test_anti_join_bloom_path_matches_exact(ray_session):
    """The Bloom-prefiltered anti join (the big-key-set path) returns
    exactly the broadcast-exact result: Bloom negatives are definite,
    positives take the exact residual check."""
    from fluent_server_ray.pipelines.relational import customers_without_orders

    exact = customers_without_orders(SF_SMALL).to_pandas()
    bloom = customers_without_orders(SF_SMALL, use_bloom=True).to_pandas()
    cols = ["c_custkey", "c_name"]
    pd.testing.assert_frame_equal(
        exact[cols].sort_values(cols).reset_index(drop=True),
        bloom[cols].sort_values(cols).reset_index(drop=True),
    )


def test_prefix_block_hot_prefix_stays_linear(ray_session):
    """10^4 docs sharing one prefix (the boilerplate-header hot block)
    must complete via the representative cap in O(n) — and the capped
    pairs are still verified true near-dups."""
    import time

    import ray.data as rd

    from fluent_server_ray.stages.dedup import prefix_block_dupes

    n = 10_000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            # same 12-char prefix; identical text → charset jaccard 1.0
            "text": ["BOILERPLATE: terms apply " + str(i % 7) for i in range(n)],
        }
    )
    t0 = time.perf_counter()
    out = prefix_block_dupes(rd.from_pandas(df), max_block=512).to_pandas()
    wall = time.perf_counter() - t0
    # O(n) via representative pairing: ~n pairs, not n^2/2 (~5*10^7)
    assert len(out) <= n
    assert len(out) > 0
    assert (out["doc_a"] == 0).all()  # min-id representative anchors
    assert wall < 60, wall  # the uncapped scan would take minutes


def test_minhash_batch_vectorized_matches_per_doc():
    """The batched reduceat signature path emits exactly the per-doc
    signature() bands for every doc (values and grouping keys)."""
    import pyarrow as pa

    from fluent_server_ray.stages.dedup import MinHashStage

    stage = MinHashStage()
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "one two",
        "a b c d e f g h i j k l m n o p",
        "the quick brown fox jumps over the lazy cat",
    ]
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = stage(batch).to_pandas()
    for i, text in enumerate(texts):
        sig = stage.signature(text)
        rows = out[out["doc_id"] == i].sort_values("band_id")
        assert len(rows) == stage.bands
        for bi, bh in zip(rows["band_id"], rows["band_hash"]):
            chunk = sig[bi * stage.rows_per_band:(bi + 1) * stage.rows_per_band]
            want = int(np.bitwise_xor.reduce(chunk.astype(np.uint64))) & 0x7FFFFFFFFFFFFFFF
            assert bh == want, (i, bi)


def test_simhash_pairs_recall_one_within_radius(ray_session):
    """Pigeonhole blocking has recall 1 for hamming <= n_blocks-1: the
    distributed pairs equal the brute-force hamming scan over the
    signatures, exactly."""
    import itertools

    import ray.data as rd

    from fluent_server_ray.stages.dedup import (
        simhash_near_dupes,
        simhash_signatures,
    )

    docs = rd.read_parquet(f"{SF_SMALL}/documents.parquet")
    got = simhash_near_dupes(docs, max_hamming=3, n_blocks=4).to_pandas()
    sigs = simhash_signatures(
        rd.read_parquet(f"{SF_SMALL}/documents.parquet")
    ).to_pandas()
    s = dict(zip(sigs["doc_id"], sigs["simhash"]))
    want = set()
    for a, b in itertools.combinations(sorted(s), 2):
        if bin(int(s[a]) ^ int(s[b])).count("1") <= 3:
            want.add((a, b))
    assert set(zip(got["doc_a"], got["doc_b"])) == want
    assert len(want) > 0


def test_ngram_jaccard_superset_of_minhash(ray_session):
    """Exact all-pairs Jaccard at the same threshold/shingles contains
    every MinHash-verified pair (LSH recall <= 1, verification equal)."""
    import ray.data as rd

    from fluent_server_ray.stages.dedup import (
        minhash_near_dupes,
        ngram_jaccard_dupes,
    )

    exact = ngram_jaccard_dupes(
        rd.read_parquet(f"{SF_SMALL}/documents.parquet"), threshold=0.8
    ).to_pandas()
    mh = minhash_near_dupes(
        rd.read_parquet(f"{SF_SMALL}/documents.parquet"), threshold=0.8
    ).to_pandas()
    e = set(zip(exact["doc_a"], exact["doc_b"]))
    m = set(zip(mh["doc_a"], mh["doc_b"]))
    assert m <= e
    assert len(e) > 0


def test_near_dup_ops_empty_result_corpora(ray_session):
    """A corpus with NO near-dups (the common case) must return empty
    frames, not crash on zero-batch concat — for every pair operator."""
    import ray.data as rd

    from fluent_server_ray.stages.dedup import (
        minhash_near_dupes,
        ngram_jaccard_dupes,
        simhash_near_dupes,
    )
    from fluent_server_ray.stages.similarity import cosine_dupes

    rng = np.random.default_rng(11)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                " ".join(rng.choice([f"w{i}{j}" for i in range(200)], size=40,
                                    replace=False))
                for j in range(6)
            ],
        }
    )
    # pair ops return Datasets; an empty one still carries the typed
    # contract schema (ray's to_pandas drops columns at zero rows, so
    # assert on schema().names)
    mh = minhash_near_dupes(rd.from_pandas(docs))
    assert mh.count() == 0
    assert mh.schema().names == ["doc_a", "doc_b", "jaccard"]
    sh = simhash_near_dupes(rd.from_pandas(docs), max_hamming=1, n_blocks=4)
    assert sh.count() == 0 and sh.schema().names == ["doc_a", "doc_b"]
    ng = ngram_jaccard_dupes(rd.from_pandas(docs), threshold=0.99)
    assert ng.count() == 0 and ng.schema().names == ["doc_a", "doc_b"]
    import pyarrow as pa

    embs = pa.table(
        {
            "vec_id": pa.array(np.arange(6, dtype=np.int64)),
            "embedding": pa.array(
                [rng.standard_normal(16).tolist() for _ in range(6)],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    cd = cosine_dupes(rd.from_arrow(embs), threshold=0.9999, exact=False,
                      dim=16)
    assert cd.count() == 0 and cd.schema().names == ["vec_a", "vec_b"]


def test_cdc_chunks_reassemble_and_shift_robust(ray_session):
    """CDC invariants: (1) chunks partition each payload exactly;
    (2) inserting a prefix shifts alignment but preserves most chunk
    hashes of the shared suffix (the property fixed-size blocking
    lacks); (3) fully deterministic across runs; (4) dedup stats see
    the sharing."""
    import ray.data as rd

    from fluent_server_ray.stages.cdc import cdc_chunks, cdc_dedup_stats

    rng = np.random.default_rng(9)
    base = bytes(rng.integers(0, 256, size=4096, dtype=np.uint8))
    shifted = b"INSERTED-PREFIX-BYTES!" + base
    df = pd.DataFrame({"doc_id": [1, 2], "payload": [base, shifted]})

    chunks = cdc_chunks(rd.from_pandas(df)).to_pandas()
    for doc_id, payload in [(1, base), (2, shifted)]:
        c = chunks[chunks["doc_id"] == doc_id].sort_values("chunk_idx")
        assert c["offset"].iloc[0] == 0
        assert (c["offset"] + c["length"]).iloc[-1] == len(payload)
        assert (c["offset"].iloc[1:].to_numpy()
                == (c["offset"] + c["length"]).iloc[:-1].to_numpy()).all()

    h1 = set(chunks[chunks["doc_id"] == 1]["chunk_hash"])
    h2 = set(chunks[chunks["doc_id"] == 2]["chunk_hash"])
    # content-defined boundaries re-synchronize after the insertion:
    # the majority of doc 1's chunks survive verbatim in doc 2
    assert len(h1 & h2) / len(h1) > 0.5

    again = cdc_chunks(rd.from_pandas(df)).to_pandas()
    pd.testing.assert_frame_equal(
        chunks.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True),
        again.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True),
    )

    stats = cdc_dedup_stats(cdc_chunks(rd.from_pandas(df))).to_pandas()
    assert stats["stored_bytes"][0] < stats["total_bytes"][0]
    assert stats["distinct_chunks"][0] < stats["total_chunks"][0]
    assert 0 < stats["dedup_ratio"][0] < 1


def test_cdc_chunk_size_bounds(ray_session):
    from fluent_server_ray.stages.cdc import chunk_boundaries

    rng = np.random.default_rng(3)
    payload = bytes(rng.integers(0, 256, size=10_000, dtype=np.uint8))
    cuts = chunk_boundaries(payload, min_size=32, avg_size=64, max_size=256)
    sizes = np.diff([0] + cuts)
    assert cuts[-1] == len(payload)
    assert (sizes[:-1] >= 32).all() and (sizes <= 256).all()
    assert 64 / 2 < sizes.mean() < 64 * 3  # mask hits near the target rate


def test_ngram_jaccard_unicode_whitespace_parity(ray_session, tmp_path):
    """The SQL mirror tokenizes exactly like Python str.split() on
    Unicode whitespace (NBSP, ideographic space, line sep) — scraped
    web text is full of it."""
    import duckdb
    import pyarrow.parquet as pq
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.dedup import (
        ngram_jaccard_dupes,
        ngram_jaccard_dupes_sql,
    )

    texts = [
        "alpha\xa0beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon zeta",       # same tokens
        "alpha　beta gamma delta epsilon eta",  # one token differs
        "totally different words here now ok",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)

    got = ngram_jaccard_dupes(rd.read_parquet(p), threshold=0.5).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(ngram_jaccard_dupes_sql(threshold=0.5)).df()
    assert set(zip(got["doc_a"], got["doc_b"])) == set(
        zip(want["doc_a"], want["doc_b"])
    )
    assert (0, 1) in set(zip(got["doc_a"], got["doc_b"]))  # NBSP == space


def test_kmeans_recovers_blob_sizes(ray_session):
    """Distributed Lloyd's over 3 well-separated blobs recovers the
    exact member counts, and two full runs are bit-identical (the
    partial merge is canonically ordered)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.similarity import (kmeans_cluster_sizes,
                                                     kmeans_fit)

    rng = np.random.default_rng(7)
    blobs = []
    for center, n in (((10.0, 0, 0), 50), ((0, 10.0, 0), 30),
                      ((0, 0, 10.0), 20)):
        blobs.append(np.asarray(center) + rng.normal(0, 0.1, size=(n, 3)))
    mat = np.vstack(blobs)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              type=pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t).repartition(8)

    out = kmeans_cluster_sizes(ds, n_clusters=3, n_iter=3,
                               sample_size=64)
    sizes = sorted(out["n_members"].to_pylist())
    assert sizes == [20, 30, 50]

    c1, s1 = kmeans_fit(ds, n_clusters=3, n_iter=3, sample_size=64)
    c2, s2 = kmeans_fit(ds, n_clusters=3, n_iter=3, sample_size=64)
    assert (s1 == s2).all()
    assert (c1 == c2).all()


def test_cluster_balanced_sample_caps_every_cluster(ray_session):
    """Over 3 well-separated blobs (50/30/20), cap=10 keeps exactly 10
    per cluster, chosen deterministically; a cluster under the cap
    keeps all members."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.similarity import cluster_balanced_sample

    rng = np.random.default_rng(3)
    rows = []
    for center, n in (((10.0, 0, 0), 50), ((0, 10.0, 0), 30),
                      ((0, 0, 10.0), 8)):
        rows.append(np.asarray(center) + rng.normal(0, 0.1, size=(n, 3)))
    mat = np.vstack(rows)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              type=pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t).repartition(6)

    out = cluster_balanced_sample(ds, n_clusters=3, cap=10, n_iter=3,
                                  sample_size=64).to_pandas()
    sizes = sorted(out.groupby("cluster_id").size().tolist())
    assert sizes == [8, 10, 10]  # under-cap cluster keeps all 8

    out2 = cluster_balanced_sample(ds, n_clusters=3, cap=10, n_iter=3,
                                   sample_size=64).to_pandas()
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  out2.reset_index(drop=True))


def test_dedup_against_index_and_extension(ray_session, tmp_path):
    """Persisted-index incremental dedup: a new shard keeps only texts
    absent from the index; NULL text is never a duplicate (SQL
    equality); feeding survivors back through build_text_index EXTENDS
    the index so the next shard dedups against both generations."""
    import ray.data as rd

    from fluent_server_ray.stages.dedup import (build_text_index,
                                                dedup_against_index)

    idx = str(tmp_path / "txtidx")
    corpus = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha", "beta", "alpha"],  # distinct set {alpha, beta}
    })
    build_text_index(rd.from_pandas(corpus), idx, n_parts=4)

    shard1 = pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": ["alpha", "gamma", None, "beta"],
    })
    out1 = dedup_against_index(rd.from_pandas(shard1), idx,
                               n_parts=4).to_pandas()
    got1 = sorted(zip(out1["doc_id"],
                      (None if pd.isna(t) else t for t in out1["text"])))
    assert got1 == [(11, "gamma"), (12, None)]

    # extend with the survivors; 'gamma' now dedups, NULL still passes
    build_text_index(rd.from_pandas(out1), idx, n_parts=4)
    shard2 = pd.DataFrame({
        "doc_id": [20, 21, 22],
        "text": ["gamma", "delta", None],
    })
    out2 = dedup_against_index(rd.from_pandas(shard2), idx,
                               n_parts=4).to_pandas()
    got2 = sorted(zip(out2["doc_id"],
                      (None if pd.isna(t) else t for t in out2["text"])))
    assert got2 == [(21, "delta"), (22, None)]


def test_index_bucket_cache_hit_and_invalidation(tmp_path):
    """The per-worker partition cache returns the same set object on a
    repeat probe (no re-read) and invalidates when the partition gains
    a file (EXTEND) — the key is the file list, not an epoch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fluent_server_ray.stages.dedup import _index_bucket_texts

    d = tmp_path / "idx" / "hpart=3"
    d.mkdir(parents=True)
    pq.write_table(pa.table({"text": ["a", "b"]}), d / "f1.parquet")

    s1 = _index_bucket_texts(str(tmp_path / "idx"), 3, "text")
    s2 = _index_bucket_texts(str(tmp_path / "idx"), 3, "text")
    assert s1 == {"a", "b"} and s2 is s1  # cache hit: same object

    pq.write_table(pa.table({"text": ["c"]}), d / "f2.parquet")
    s3 = _index_bucket_texts(str(tmp_path / "idx"), 3, "text")
    assert s3 == {"a", "b", "c"}  # new file invalidated the entry
    assert _index_bucket_texts(str(tmp_path / "idx"), 9, "text") is None


def test_exact_dedup_keeps_one_null_text_row(ray_session):
    """SQL GROUP BY text keeps one min-id NULL-text row; the engine
    must too (pandas' NaN-group drop would silently delete them)."""
    import duckdb
    import ray.data as rd

    import pyarrow as pa

    from fluent_server_ray.stages.dedup import exact_dedup, exact_dedup_sql

    t = pa.table({
        "doc_id": pa.array([5, 2, 9, 1], type=pa.int64()),
        "text": pa.array([None, None, "x", "x"], type=pa.string()),
    })
    out = exact_dedup(rd.from_arrow(t)).to_pandas()
    got = sorted(
        (i, None if pd.isna(x) else x)
        for i, x in out.itertuples(index=False)
    )
    assert got == [(1, "x"), (2, None)]
    con = duckdb.connect()
    con.register("docs_null", t)
    odf = con.execute(exact_dedup_sql(table="docs_null")).df()
    assert sorted(
        (i, None if pd.isna(x) else x)
        for i, x in odf.itertuples(index=False)
    ) == got


def test_window_topk_null_ts_matches_sql(ray_session):
    """A NULL-ts row lands in the NULL window partition and is ranked
    there (SQL PARTITION BY semantics) — never a NaN-rank crash."""
    import duckdb
    import ray.data as rd

    import pyarrow as pa

    from fluent_server_ray.stages.windows import window_topk, window_topk_sql

    t = pa.table({
        "tag": ["a", "b", "a", "c"],
        "ts": pa.array([1_700_000_000_000_000, None,
                        1_700_000_100_000_000, None],
                       type=pa.timestamp("us")),
    })
    out = window_topk(rd.from_arrow(t), key_col="tag", k=2).to_pandas()
    con = duckdb.connect()
    con.register("routed", t)
    odf = con.execute(window_topk_sql(table="routed")).df()
    key = lambda df: sorted(
        (g, None if pd.isna(w) else int(w), int(n), int(r))
        for g, w, n, r in df.itertuples(index=False)
    )
    assert key(out) == key(odf)
    # a×2 in one real window (rank 1); b,c ranked 1,2 in the NULL window
    assert len(out) == 3


def test_dedup_against_missing_index_raises(ray_session, tmp_path):
    """A typo'd / non-shared index path must fail loudly — an empty
    glob in every bucket would silently disable dedup."""
    import ray.data as rd

    from fluent_server_ray.stages.dedup import dedup_against_index

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
    with pytest.raises(FileNotFoundError, match="index dir not found"):
        dedup_against_index(ds, str(tmp_path / "nope"))


def test_compact_text_index(ray_session, tmp_path):
    """After two extensions the partitions hold multiple files;
    compaction re-deduplicates, bounds the file count, and dedup
    behavior against the compacted index is unchanged."""
    import glob
    import ray.data as rd

    from fluent_server_ray.stages.dedup import (build_text_index,
                                                compact_text_index,
                                                dedup_against_index)

    idx = str(tmp_path / "idx")
    texts = [f"t{i}" for i in range(20)]
    build_text_index(
        rd.from_pandas(pd.DataFrame(
            {"doc_id": range(20), "text": texts})), idx, n_parts=4)
    build_text_index(  # extension: 10 new texts
        rd.from_pandas(pd.DataFrame(
            {"doc_id": range(20, 30),
             "text": [f"u{i}" for i in range(10)]})), idx, n_parts=4)
    before = glob.glob(f"{idx}/hpart=*/*.parquet")

    n_rows, n_before, n_after = compact_text_index(idx, n_parts=4)
    assert n_before == len(before)
    assert n_after <= n_before
    assert n_rows == 30  # distinct texts preserved exactly

    shard = pd.DataFrame({"doc_id": [100, 101, 102],
                          "text": ["t3", "u5", "fresh"]})
    out = dedup_against_index(rd.from_pandas(shard), idx,
                              n_parts=4).to_pandas()
    assert sorted(out["doc_id"]) == [102]


def test_substring_dupes_constructed(ray_session):
    """Exact shared 8-token runs pair; shorter overlaps and short docs
    never do; the verification step kills a structural hash collision
    candidate only if one existed (set equality with brute force)."""
    import ray.data as rd

    from fluent_server_ray.stages.dedup import substring_dupes, window_set

    run = " ".join(f"r{i}" for i in range(8))          # the shared run
    short = " ".join(f"r{i}" for i in range(7))        # 7-token sub-run
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            f"a b c {run} d e",                        # carries run
            f"x y {run} z",                            # carries run
            f"p q {short} s t",                        # only 7 shared
            "tiny doc",                                # < 8 tokens
            " ".join(f"u{i}" for i in range(30)),      # unrelated
            None,                                      # NULL text
        ],
    })
    ds = rd.from_pandas(docs)
    got = substring_dupes(ds, window_k=8).to_pandas()
    assert set(zip(got["doc_a"], got["doc_b"])) == {(1, 2)}

    # brute-force parity on a random corpus with planted runs
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(30)]
    texts[7] = texts[3][:]                              # exact dup
    texts[12] = "lead in " + " ".join(texts[5].split()[10:25]) + " tail"
    df = pd.DataFrame({"doc_id": range(30), "text": texts})
    got = substring_dupes(rd.from_pandas(df), window_k=8).to_pandas()
    want = set()
    ws = {r.doc_id: window_set(r.text, 8) for r in df.itertuples()}
    for a in range(30):
        for b in range(a + 1, 30):
            if ws[a] & ws[b]:
                want.add((a, b))
    assert set(zip(got["doc_a"], got["doc_b"])) == want
    assert (3, 7) in want and (5, 12) in want


def test_substring_dupes_join_fallback_parity(ray_session):
    """broadcast_bytes=1 forces the bucketed-join text-attach path; the
    verified pair set must equal the broadcast path's (and brute
    force) bit for bit — the fallback changes the plan, not the
    contract."""
    import ray.data as rd

    from fluent_server_ray.stages.dedup import substring_dupes, window_set

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(150)]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(24)]
    texts[9] = texts[2][:]                              # exact dup
    texts[17] = "pre " + " ".join(texts[6].split()[5:20]) + " post"
    df = pd.DataFrame({"doc_id": range(24), "text": texts})

    broad = substring_dupes(rd.from_pandas(df), window_k=8).to_pandas()
    joined = substring_dupes(rd.from_pandas(df), window_k=8,
                             broadcast_bytes=1).to_pandas()
    want = set()
    ws = {r.doc_id: window_set(r.text, 8) for r in df.itertuples()}
    for a in range(24):
        for b in range(a + 1, 24):
            if ws[a] & ws[b]:
                want.add((a, b))
    assert set(zip(broad["doc_a"], broad["doc_b"])) == want
    assert set(zip(joined["doc_a"], joined["doc_b"])) == want
    assert (2, 9) in want and (6, 17) in want


def test_substring_dupes_empty_corpus(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.dedup import substring_dupes

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2], "text": ["too short", "also tiny"]}))
    out = substring_dupes(ds, window_k=8)
    assert out.count() == 0
    # typed empty Dataset: schema keeps the pair contract columns
    assert out.schema().names == ["doc_a", "doc_b"]


def test_pca_matches_numpy(ray_session):
    """Distributed moment-combiner PCA equals numpy's full-matrix PCA
    (same covariance, eigh, sign canonicalization) regardless of block
    split; projection matches (X-mu)@C.T."""
    import ray.data as rd

    from fluent_server_ray.stages.similarity import pca_fit, pca_project

    import pyarrow as pa

    rng = np.random.default_rng(5)
    # anisotropic cloud so the spectrum is well separated
    base = rng.normal(size=(300, 6)) * np.array([10, 5, 2, 1, .5, .1])
    # list<float32> layout — the embeddings.parquet storage type
    tbl = pa.table({
        "vec_id": pa.array(np.arange(300), type=pa.int64()),
        "embedding": pa.array(list(base.astype(np.float32)),
                              type=pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(7)
    mean, comps, evar = pca_fit(ds, n_components=3, emb_col="embedding")

    X = base.astype(np.float32).astype(np.float64)
    cov = np.cov(X, rowvar=False)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    ref = v[:, order].T
    flip = np.sign(ref[np.arange(3), np.abs(ref).argmax(axis=1)])
    ref = ref * flip[:, None]
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    assert np.allclose(comps, ref, atol=1e-8)
    assert np.allclose(evar, w[order], atol=1e-9)
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-10)

    proj = pca_project(ds, n_components=3).to_pandas()
    proj = proj.sort_values("vec_id").reset_index(drop=True)
    got = np.stack([np.asarray(p) for p in proj["proj"]])
    assert np.allclose(got, (X - X.mean(axis=0)) @ ref.T, atol=1e-8)


def test_embedding_quantize_bounds_and_reconstruction(ray_session):
    """Codes live in [0, 255]; a constant dimension quantizes to 0;
    dequantization error is bounded by half a step per dimension."""
    import ray.data as rd

    from fluent_server_ray.stages.similarity import embedding_quantize

    import pyarrow as pa

    rng = np.random.default_rng(9)
    X = rng.normal(size=(50, 4)) * np.array([1.0, 100.0, 0.01, 1.0])
    X[:, 3] = 7.5  # constant dim
    tbl = pa.table({
        "vec_id": pa.array(np.arange(50), type=pa.int64()),
        "embedding": pa.array(list(X.astype(np.float32)),
                              type=pa.list_(pa.float32())),
    })
    out = embedding_quantize(rd.from_arrow(tbl).repartition(5)).to_pandas()
    assert len(out) == 200
    assert out["code"].between(0, 255).all()
    assert (out.loc[out["dim"] == 4, "code"] == 0).all()
    Xf = X.astype("float32").astype("float64")
    mn, mx = Xf.min(axis=0), Xf.max(axis=0)
    for d in range(3):
        sub = out[out["dim"] == d + 1].sort_values("vec_id")
        recon = mn[d] + sub["code"].to_numpy() / 255.0 * (mx[d] - mn[d])
        step = (mx[d] - mn[d]) / 255.0
        assert np.abs(recon - Xf[:, d]).max() <= step / 2 + 1e-12


def test_rank_in_group_null_semantics(ray_session):
    """NULL values rank NULL; a NULL group key is its own partition
    (SQL PARTITION BY NULL-groups semantics)."""
    import ray.data as rd

    from fluent_server_ray.stages.features import rank_in_group

    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "event_type": ["a", "a", "a", None, None, "b"],
        "value": [10.0, 30.0, None, 5.0, 9.0, 2.0],
    })
    out = rank_in_group(rd.from_pandas(df)).to_pandas()
    out = out.set_index("event_id")
    assert out.loc[2, "rk"] == 1 and out.loc[1, "rk"] == 2  # desc
    assert pd.isna(out.loc[3, "rk"])                        # NULL value
    assert out.loc[5, "rk"] == 1 and out.loc[4, "rk"] == 2  # NULL group
    assert out.loc[6, "rk"] == 1


def test_retention_cohorts_constructed(ray_session):
    """Hand-built triangle: cohorts by first-week, distinct users per
    (cohort, offset); repeat events within a week count once."""
    import ray.data as rd

    from fluent_server_ray.stages.windows import retention_cohorts

    week = 604800
    rows = []
    # user 1: weeks 0, 1, 1, 3   user 2: weeks 0, 3   user 3: week 1
    for uid, wks in [(1, [0, 1, 1, 3]), (2, [0, 3]), (3, [1])]:
        for w in wks:
            rows.append({"user_id": uid,
                         "ts": pd.Timestamp(w * week + 30, unit="s")})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = retention_cohorts(ds).to_pandas()
    got = {(r.cohort_window, r.window_offset): r.n_users
           for r in out.itertuples()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 3): 2, (1, 0): 1}


def test_normalize_text_edge_parity(ray_session, tmp_path):
    """Engine normalization equals the SQL mirror on adversarial text:
    control bytes, unicode whitespace (\\xa0, ideographic space),
    non-ASCII case (ß, É), NULL text."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.hygiene import (normalize_text,
                                                  normalize_text_sql)

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "  Hello\tWORLD  ",
            "a\x00b\x1fc\x7fd",
            "cafÉ NAP　 end",
            None,
            "MiXeD   Line Sep",
        ],
    })
    p = tmp_path / "docs.parquet"
    df.to_parquet(p, index=False)
    got = normalize_text(rd.read_parquet(str(p))).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{p}')")
    want = con.execute(normalize_text_sql() + " ORDER BY doc_id").df()
    got = got.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert got.loc[0, "text_norm"] == "hello world"
    # \x00 and \x7f strip; \x1f is Python whitespace → collapses to ' '
    assert got.loc[1, "text_norm"] == "ab cd"
    assert pd.isna(got.loc[3, "text_norm"])


def test_grouped_distinct_count_null_semantics(ray_session):
    """NULL group is its own group; NULL values are never counted
    (SQL count(DISTINCT) semantics); cross-block duplicates collapse."""
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import grouped_distinct_count

    df = pd.DataFrame({
        "event_type": ["a", "a", "a", None, None, "b", "b"],
        "user_id": [1.0, 1.0, 2.0, 3.0, None, None, 4.0],
    })
    ds = rd.from_pandas(df).repartition(4)
    out = grouped_distinct_count(ds, "event_type", "user_id").to_pandas()
    got = {(None if pd.isna(k) else k): v
           for k, v in zip(out["event_type"], out["n_distinct"])}
    assert got == {"a": 2, None: 1, "b": 1}

    # final='ray' path returns a Dataset with identical content on
    # null-free keys…
    clean = df[df["event_type"].notna()]
    out2 = grouped_distinct_count(
        rd.from_pandas(clean).repartition(4), "event_type", "user_id",
        final="ray").to_pandas()
    got2 = {k: v for k, v in zip(out2["event_type"], out2["n_distinct"])}
    assert got2 == {"a": 2, "b": 1}
    # …and fails LOUDLY on a NULL key (Ray sort boundary sampling
    # crashes on None-vs-str; the guard names the fix)
    with pytest.raises(Exception, match="has NULLs"):
        grouped_distinct_count(
            rd.from_pandas(df).repartition(4), "event_type", "user_id",
            final="ray").to_pandas()


def test_ann_over_pca_projection_anisotropic(ray_session):
    """ANN composes with PCA reduction (emb_col='proj'): on a corpus
    whose variance concentrates in a few directions, top-k over the
    3-dim projection reproduces most full-dim cosine neighbors. (On an
    ISOTROPIC corpus — like the synthetic test embeddings — PCA
    reduction destroys neighborhoods; that is a property of the data,
    measured at recall<0.3, which is why no driver query ships this
    composite.)"""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.similarity import ann_topk, pca_project

    rng = np.random.default_rng(17)
    base = rng.normal(size=(400, 24)) * np.concatenate(
        [[20, 10, 5], np.full(21, 0.1)])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(400), type=pa.int64()),
        "embedding": pa.array(list(base.astype(np.float32)),
                              type=pa.list_(pa.float32())),
    })
    qids = [3, 50, 111, 222, 333]
    proj = pca_project(rd.from_arrow(tbl).repartition(5),
                       n_components=3).materialize()
    red = ann_topk(proj, qids, k=5, emb_col="proj")
    full = ann_topk(rd.from_arrow(tbl).repartition(5), qids, k=5)
    fs = set(zip(full["query_id"], full["neighbor_id"]))
    rs = set(zip(red["query_id"], red["neighbor_id"]))
    assert len(fs & rs) / len(fs) >= 0.8


def test_minhash_index_build_probe_extend(ray_session, tmp_path):
    """Persisted near-dup index: probing a new shard finds its
    near-dups of INDEXED docs only (index never rescanned in full),
    exact copies estimate 1.0, unrelated docs don't pair; survivors
    extend the index; mismatched params refuse loudly."""
    import ray.data as rd

    from fluent_server_ray.stages.dedup import (build_minhash_index,
                                                near_dups_against_index)

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(800)]
    base_texts = [" ".join(rng.choice(vocab, size=60, replace=False))
                  for _ in range(30)]
    idx_df = pd.DataFrame({"doc_id": range(30), "text": base_texts})
    idx_dir = str(tmp_path / "mhidx")
    build_minhash_index(rd.from_pandas(idx_df), idx_dir, n_parts=8)

    # shard: one exact copy, one ~97% near-dup, three unrelated
    near = base_texts[4].split()
    near[0], near[1] = "zz1", "zz2"
    shard = pd.DataFrame({
        "doc_id": [100, 101, 102, 103, 104],
        "text": [base_texts[7], " ".join(near)]
        + [" ".join(rng.choice([f"v{i}" for i in range(800)], size=60,
                               replace=False)) for _ in range(3)],
    })
    out = near_dups_against_index(
        rd.from_pandas(shard), idx_dir, threshold=0.5).to_pandas()
    got = {(a, b): j for a, b, j in
           zip(out["doc_a"], out["doc_b"], out["est_jaccard"])}
    assert got.get((100, 7)) == 1.0          # exact copy
    assert (101, 4) in got and got[(101, 4)] >= 0.5
    assert all(a in (100, 101) for a, _ in got)  # unrelated never pair

    # extension: index the unrelated survivors, re-probe an exact copy
    survivors = shard[shard["doc_id"].isin([102, 103, 104])]
    build_minhash_index(rd.from_pandas(survivors), idx_dir, n_parts=8)
    probe2 = pd.DataFrame({"doc_id": [200],
                           "text": [shard["text"].iloc[2]]})
    out2 = near_dups_against_index(
        rd.from_pandas(probe2), idx_dir, threshold=0.9).to_pandas()
    assert {(200, 102)} == set(zip(out2["doc_a"], out2["doc_b"]))

    # param drift refuses
    with pytest.raises(Exception, match="refusing to extend"):
        build_minhash_index(rd.from_pandas(probe2), idx_dir,
                            num_perm=32, bands=8, n_parts=8)


def test_line_dedup_parity_and_edges(ray_session, tmp_path):
    """Corpus-level line dedup equals the SQL mirror on a corpus with
    shared boilerplate lines, an all-boilerplate doc (keeps its row
    with text=''), a NULL text (treated as ''), and threshold-boundary
    lines (count == min_count removed, count == min_count-1 kept)."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.hygiene import line_dedup, line_dedup_sql

    boiler = "assistant: How can I help?"
    twice = "user: hello"  # appears exactly min_count=3 - 1 times → kept
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            f"{boiler}\nunique line one\n{twice}",
            f"{boiler}\n{boiler}\nunique two",   # within-doc repeats count
            f"{twice}\nunique three",
            boiler,                                # all lines boilerplate
            None,                                  # NULL → '' (one line)
        ],
    })
    p = tmp_path / "docs.parquet"
    df.to_parquet(p, index=False)
    got = line_dedup(rd.read_parquet(str(p)), min_count=3).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    sql = line_dedup_sql(
        f"SELECT doc_id, text FROM read_parquet('{p}')",
        "doc_id", "text", min_count=3)
    want = con.execute(sql).df()
    pd.testing.assert_frame_equal(
        got, want.astype({"n_lines": "int64", "n_removed": "int64"}))

    by_id = got.set_index("doc_id")
    # boiler occurs 4 times (>=3) → removed everywhere; twice occurs 2
    assert by_id.loc[1, "text"] == f"unique line one\n{twice}"
    assert by_id.loc[2, "text"] == "unique two"
    assert by_id.loc[4, "text"] == "" and by_id.loc[4, "n_removed"] == 1
    # the NULL doc's single '' line is unique → kept as ''
    assert by_id.loc[5, "text"] == "" and by_id.loc[5, "n_removed"] == 0


def test_conv_structure_edges(ray_session, tmp_path):
    """conv_structure on adversarial shapes: a single-turn conv, an
    agent loop (identical (role,text) repeated), same-role-different-
    text adjacency, and NULL texts (NULL = NULL is never a repeat,
    SQL equality semantics). Engine equals a DuckDB window mirror."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.assembly import conv_structure

    df = pd.DataFrame({
        "conv_id": ["a", "a", "a", "a", "b", "c", "c", "c"],
        "turn_idx": [1, 2, 3, 4, 1, 1, 2, 3],
        "role": ["user", "tool", "tool", "tool", "user",
                 "user", "user", "assistant"],
        "text": ["hi", "CALL x", "CALL x", "CALL x", "solo",
                 None, None, "ok"],
    })
    p = tmp_path / "t.parquet"
    df.to_parquet(p, index=False)
    got = conv_structure(rd.read_parquet(str(p))).to_pandas()
    by = got.set_index("conv_id")
    # conv a: tool repeats 2 adjacents same role; loop run of 3
    assert by.loc["a", "n_role_repeats"] == 2
    assert by.loc["a", "max_repeat_run"] == 3
    assert by.loc["a", "first_role"] == "user"
    assert by.loc["a", "last_role"] == "tool"
    # conv b: singleton
    assert by.loc["b", "n_turns"] == 1 and by.loc["b", "max_repeat_run"] == 1
    # conv c: two NULL texts, same role — role repeat counts, but the
    # NULL texts are NOT an identical run (SQL NULL = NULL)
    assert by.loc["c", "n_role_repeats"] == 1
    assert by.loc["c", "max_repeat_run"] == 1

    con = duckdb.connect()
    want = con.execute("""
WITH w AS (
  SELECT conv_id, turn_idx, role, text,
    CASE WHEN role = lag(role) OVER win THEN 1 ELSE 0 END AS role_rep,
    CASE WHEN role = lag(role) OVER win AND text = lag(text) OVER win
         THEN 0 ELSE 1 END AS brk
  FROM read_parquet(?) WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx)
), runs AS (
  SELECT *, sum(brk) OVER (ORDER BY conv_id, turn_idx
                           ROWS UNBOUNDED PRECEDING) AS run_id FROM w
), runlen AS (
  SELECT conv_id, run_id, count(*) AS rl FROM runs GROUP BY conv_id, run_id
), pc AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
    arg_min(role, turn_idx) AS first_role,
    arg_max(role, turn_idx) AS last_role,
    CAST(sum(role_rep) AS BIGINT) AS n_role_repeats
  FROM runs GROUP BY conv_id)
SELECT p.conv_id, p.n_turns, p.first_role, p.last_role, p.n_role_repeats,
  (SELECT CAST(max(rl) AS BIGINT) FROM runlen r
   WHERE r.conv_id = p.conv_id) AS max_repeat_run
FROM pc p ORDER BY conv_id
""", [str(p)]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.astype(got.dtypes.to_dict()))


def test_bigram_logprob_edges(ray_session, tmp_path):
    """Bigram LM score vs SQL on edge shapes: 0/1-token docs emit no
    row, a 2-token doc scores its single bigram, NULL text drops, and
    order sensitivity (same bag of words, different order → different
    score) — the property the unigram score can't see."""
    import duckdb
    import math
    import ray.data as rd

    from fluent_server_ray.stages.textstats import (doc_bigram_logprob,
                                                    doc_bigram_logprob_sql)

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["a b c a b", "b a c b a", "x", "", None, "a b"],
    })
    p = tmp_path / "docs.parquet"
    df.to_parquet(p, index=False)
    got = doc_bigram_logprob(rd.read_parquet(str(p))).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(doc_bigram_logprob_sql() + " ORDER BY doc_id").df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    assert set(got.doc_id) == {1, 2, 6}  # <2 tokens → no row
    by = got.set_index("doc_id")
    # docs 1 and 2 share the unigram bag but differ in bigram order
    assert by.loc[1, "avg_logprob"] != by.loc[2, "avg_logprob"]
    # doc 6's single bigram 'a b': c(a b)=3 of c_prefix(a)=4 starts
    assert by.loc[6, "logprob_millionths"] == math.floor(
        math.log(3 / 4) * 1_000_000)


def test_semantic_dedup_matches_bruteforce(ray_session):
    """SemDeDup with n_clusters=1 equals the brute-force keep-lowest-id
    survivor set exactly; with separated clusters and within-cluster
    dups it still equals brute force (no cross-cluster pair exists to
    miss), and every dropped vector has a smaller-id near neighbor."""
    import ray.data as rd

    from fluent_server_ray.stages.similarity import (_normalize,
                                                     semantic_dedup)

    rng = np.random.default_rng(7)
    # two well-separated blobs, each with planted near-duplicate pairs
    base = rng.normal(size=(2, 16))
    rows = []
    vid = 0
    for b in range(2):
        for i in range(30):
            v = base[b] * 10 + rng.normal(scale=0.5, size=16)
            rows.append((vid, v))
            vid += 1
            if i % 5 == 0:  # planted near-dup of the row just added
                rows.append((vid, v + rng.normal(scale=1e-3, size=16)))
                vid += 1
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([r[1] for r in rows])
    import pyarrow as pa

    tab = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(mat.astype(np.float32).tolist(),
                              type=pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tab)

    t = 0.9999
    sims = _normalize(mat.astype(np.float32).astype(np.float64))
    sims = sims @ sims.T
    dom = np.triu(sims >= t, k=1).any(axis=0)
    want = set(ids[~dom])

    for k in (1, 2):
        got = semantic_dedup(ds, threshold=t, n_clusters=k,
                             n_iter=3).to_pandas()
        assert set(got.vec_id) == want, k
    assert len(want) < len(ids)  # the planted dups actually dropped


def test_semantic_dedup_oversized_cluster_guard(ray_session):
    """A pathological one-cluster corpus larger than max_cluster_rows
    must complete via the recursive bisection guard (not OOM/raise),
    stay SOUND (every dropped id has a smaller-id neighbor >= t) and
    never drop more than the brute-force rule; auto-k (n_clusters=None)
    derives k from the corpus and also completes."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.similarity import (_normalize,
                                                     semantic_dedup)

    rng = np.random.default_rng(11)
    n = 120
    mat = rng.normal(size=(n, 8))
    # plant near-dups: every 4th vector duplicated with tiny noise
    for i in range(0, n - 1, 4):
        mat[i + 1] = mat[i] + rng.normal(scale=1e-4, size=8)
    ids = np.arange(n, dtype=np.int64)
    tab = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(mat.astype(np.float32).tolist(),
                              type=pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tab)
    t = 0.9999

    nm = _normalize(mat.astype(np.float32).astype(np.float64))
    sims = nm @ nm.T
    brute_keep = ~np.triu(sims >= t, k=1).any(axis=0)

    got = semantic_dedup(ds, threshold=t, n_clusters=1, n_iter=2,
                         max_cluster_rows=16).to_pandas()
    kept = set(got.vec_id)
    # superset of brute-force survivors (bisection only MISSES pairs)
    assert set(ids[brute_keep]) <= kept
    # soundness: every dropped id really has a smaller-id near neighbor
    for j in ids:
        if j not in kept:
            assert (sims[:j, j] >= t).any(), j
    assert len(kept) < n  # the planted dups actually dropped

    auto = semantic_dedup(ds, threshold=t, n_iter=2).to_pandas()
    assert set(ids[~np.triu(sims >= t, k=1).any(axis=0)]) <= set(auto.vec_id)


def test_grouped_exact_median_edges(ray_session):
    """Exact median vs DuckDB bit-for-bit: odd/even counts, duplicate
    values spanning the middle, NULL values ignored, NULL group key
    canonicalized to ''."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import (
        grouped_exact_median, grouped_exact_median_sql)

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 5 + ["c"] + [None] * 2,
        "v": [1.0, 1.0, 2.0, 5.0,
              0.1, 0.2, 0.2, 0.2, 9.0,
              42.0,
              3.0, None],
    })
    got = grouped_exact_median(rd.from_pandas(df), "k", "v").to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(grouped_exact_median_sql("k", "v", "t")).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_exact=True)
    by = got.set_index("k")["median"]
    assert by["a"] == 1.5      # even: (1.0+2.0)/2
    assert by["b"] == 0.2      # duplicates span the middle
    assert by["c"] == 42.0     # singleton
    assert by[""] == 3.0       # NULL key → ''; NULL value ignored


def test_conv_context_windows_never_splits_turns(ray_session, tmp_path):
    """Window assignment: a turn belongs to the window where it starts,
    oversized turns occupy one slot, NULL text counts 0 chars, and
    windows are per-conversation (reset across convs)."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.assembly import conv_context_windows

    df = pd.DataFrame({
        "conv_id": ["a", "a", "a", "a", "b"],
        "turn_idx": [1, 2, 3, 4, 1],
        "text": ["x" * 6, "y" * 3, "z" * 20, None, "q" * 9],
    })
    p = tmp_path / "t.parquet"
    df.to_parquet(p, index=False)
    got = conv_context_windows(rd.read_parquet(str(p)),
                               budget=8).to_pandas()
    # priors: a → 0, 6, 9, 29 → windows 0, 0, 1, 3; b resets → 0
    assert got.window_id.tolist() == [0, 0, 1, 3, 0]
    assert got.win_off.tolist() == [0, 6, 1, 5, 0]

    want = duckdb.connect().execute("""
WITH w AS (
  SELECT conv_id, turn_idx,
    sum(COALESCE(length(text), 0)) OVER
      (PARTITION BY conv_id ORDER BY turn_idx ROWS UNBOUNDED PRECEDING)
    - COALESCE(length(text), 0) AS prior
  FROM read_parquet(?))
SELECT conv_id, turn_idx, CAST(prior // 8 AS BIGINT) AS window_id,
  CAST(prior - (prior // 8) * 8 AS BIGINT) AS win_off
FROM w ORDER BY conv_id, turn_idx
""", [str(p)]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype(got.dtypes.to_dict()))


def test_quality_curriculum_tiers_and_rates(ray_session):
    """Curriculum mix on sf0.001: all three tiers survive, the high
    tier keeps every doc (rate 1.0 → no coin), and survivors per tier
    never exceed that tier's population."""
    from fluent_server_ray.pipelines.curation import quality_curriculum
    from fluent_server_ray.stages.textstats import doc_unigram_logprob
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_SMALL}/documents.parquet",
                         columns=["doc_id", "text"])
    got = quality_curriculum(ds).to_pandas()
    counts = got.tier.value_counts()
    assert set(counts.index) == {"high", "mid", "low"}

    scored = doc_unigram_logprob(ds).to_pandas()
    n_high = int((scored.avg_logprob >= -3_400_000).sum())
    assert counts["high"] == n_high  # rate 1.0 keeps all
    n_low = int((scored.avg_logprob < -3_404_000).sum())
    assert 0 < counts["low"] < n_low  # rate 0.125 actually thins


def test_doc_token_entropy_edges(ray_session, tmp_path):
    """Entropy vs SQL bit-for-bit on edges: single-token doc (H=0),
    all-identical tokens (H=0), uniform tokens (H=ln k via the
    millionths contract), empty/NULL text emits no row."""
    import duckdb
    import math
    import ray.data as rd

    from fluent_server_ray.stages.textstats import (doc_token_entropy,
                                                    doc_token_entropy_sql)

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["x", "a a a a", "a b c d", "", None],
    })
    p = tmp_path / "docs.parquet"
    df.to_parquet(p, index=False)
    got = doc_token_entropy(rd.read_parquet(str(p))).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(doc_token_entropy_sql() + " ORDER BY doc_id").df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()),
                                  check_exact=True)
    by = got.set_index("doc_id")["entropy"]
    assert set(got.doc_id) == {1, 2, 3}
    assert by[1] == 0.0
    # all-identical tokens: ln_n_m·n − n·ln_n_m == 0 EXACTLY under the
    # both-logs-floored contract (the old float tree left a ~2e-7
    # truncation residue and 1-ulp oracle drift)
    assert by[2] == 0.0
    # uniform: ln(tf)=ln(1)=0 → H = floor(ln(4)·1e6)·4 / (1e6·4)
    assert by[3] == math.floor(math.log(4.0) * 1e6) / 1e6
    assert abs(by[3] - math.log(4.0)) < 1e-5


def test_tool_transitions_skip_non_calls(ray_session):
    """Transitions chain over intervening non-call turns, reset across
    conversations, and a single-call conv contributes nothing."""
    import ray.data as rd

    from fluent_server_ray.stages.assembly import tool_transitions

    df = pd.DataFrame({
        "conv_id": ["a"] * 5 + ["b"] * 2 + ["c"],
        "turn_idx": [1, 2, 3, 4, 5, 1, 2, 1],
        "kind": ["tool", "msg", "tool", "error", "tool",
                 "tool", "tool", "tool"],
        "parsed_tool": ["search", "", "bash", "", "search",
                        "bash", "bash", "browser"],
    })
    got = tool_transitions(rd.from_pandas(df)).to_pandas()
    want = {("search", "bash"): 1, ("bash", "search"): 1,
            ("bash", "bash"): 1}
    assert {(r.prev_tool, r.tool): r.n for r in got.itertuples()} == want


def test_dup_ngram_fraction_edges(ray_session, tmp_path):
    """Dup-gram fraction vs SQL: a doc sharing every 3-gram with
    another scores 1.0, a unique doc scores 0.0, within-doc repeats
    count toward df only once (df is per-DISTINCT-doc), <k-token docs
    emit no row."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.hygiene import (dup_ngram_fraction,
                                                  dup_ngram_fraction_sql)

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "the cat sat down",          # shares all grams with doc 2
            "the cat sat down",
            "a wholly unique document here",
            "x y",                        # < 3 tokens → no row
            "rep rep rep rep",            # within-doc repeat, df=1 → 0.0
        ],
    })
    p = tmp_path / "docs.parquet"
    df.to_parquet(p, index=False)
    got = dup_ngram_fraction(rd.read_parquet(str(p))).to_pandas()
    got = got.reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(dup_ngram_fraction_sql()).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()),
                                  check_exact=True)
    by = got.set_index("doc_id")["dup_frac"]
    assert by[1] == 1.0 and by[2] == 1.0
    assert by[3] == 0.0
    assert 4 not in by.index
    assert by[5] == 0.0


def test_bm25_topk_vs_oracle(ray_session, tmp_path):
    """BM25 vs the SQL mirror: integer-millionths equality, absent
    query terms yield zero rows, doc-length normalization favors the
    shorter doc at equal tf, empty-text docs count toward N/avgdl."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.textstats import bm25_topk, bm25_topk_sql

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "apple banana apple cherry",
            "apple banana",                       # shorter, same terms
            "banana banana banana banana banana banana",
            "cherry date elderberry fig grape melon",
            "",                                    # counts toward N only
        ],
    })
    p = tmp_path / "docs.parquet"
    df.to_parquet(p, index=False)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    terms = ["apple", "banana"]
    got = bm25_topk(rd.read_parquet(str(p)), terms, k=10).to_pandas()
    want = con.execute(bm25_topk_sql(terms, k=10)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.astype(got.dtypes.to_dict()),
        check_exact=True,
    )
    # dl-normalization: doc 2 (tf 1+1, dl 2) outranks doc 1 (tf 2+1, dl 4)
    # only if BM25's length penalty engages — assert both present, and
    # the absent-term query returns the typed empty
    assert set(got.doc_id) >= {1, 2, 3}
    none = bm25_topk(rd.read_parquet(str(p)), ["zzz"], k=3).to_pandas()
    assert len(none) == 0 and list(none.columns) == [
        "doc_id", "bm25_millionths"]


def test_pmi_top_pairs_vs_oracle(ray_session, tmp_path):
    """PMI vs the SQL mirror: min_count gates rare pairs, an
    always-together pair outranks a frequent-word pair, doc boundaries
    never form pairs."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.textstats import (pmi_top_pairs,
                                                    pmi_top_pairs_sql)

    rows = []
    for i in range(6):  # 'zig zag' always adjacent, rare elsewhere
        rows.append((i, "zig zag common common common common"))
    for i in range(6, 12):  # frequent pair of frequent words
        rows.append((i, "common common filler words here"))
    rows.append((12, "zig"))  # boundary: no pair with next doc's 'zag'
    rows.append((13, "zag"))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    p = tmp_path / "docs.parquet"
    df.to_parquet(p, index=False)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    got = pmi_top_pairs(rd.read_parquet(str(p)), k=20, min_count=5).to_pandas()
    want = con.execute(pmi_top_pairs_sql(k=20, min_count=5)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.astype(got.dtypes.to_dict()),
        check_exact=True,
    )
    ranked = list(zip(got.w1, got.w2))
    # exclusivity beats raw frequency: 'zig zag' (pair 6, words 7 each)
    # outranks 'common common' (pair ~18, word 36)
    assert ranked.index(("zig", "zag")) < ranked.index(("common", "common"))
    assert not ((got.w1 == "zig") & (got.w2 == "zig")).any()


def test_salted_replicated_join_matches_plain(ray_session):
    """Salted replicated join == bucketed hash join row set, including
    a pathological hot key (80% of the big side on one key) and
    unmatched keys on both sides."""
    import ray.data as rd

    from fluent_server_ray.stages.joins import (bucketed_hash_join,
                                                salted_replicated_join)

    big = pd.DataFrame({
        "k": [7] * 800 + list(range(100)),
        "v": np.arange(900, dtype=np.int64),
    })
    small = pd.DataFrame({
        "k": list(range(0, 120, 2)),   # half the keys match; 7 is odd →
        "w": [f"w{i}" for i in range(0, 120, 2)],  # hot key UNmatched
    })
    small.loc[len(small)] = [7, "hot"]  # now the hot key matches too
    l, r = rd.from_pandas(big), rd.from_pandas(small)
    got = salted_replicated_join(l, r, key="k", n_salts=4,
                                 n_sub=4).to_pandas()
    want = bucketed_hash_join(rd.from_pandas(big), rd.from_pandas(small),
                              key="k").to_pandas()
    cols = ["k", "v", "w"]
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w.astype(g.dtypes.to_dict()),
                                  check_exact=True)
    # hot key joined exactly once per big row (800 hot + 1 from range)
    assert (g.k == 7).sum() == 801


def test_salted_replicated_join_rejects_overlap(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.joins import salted_replicated_join

    l = rd.from_pandas(pd.DataFrame({"k": [1], "v": [1]}))
    r = rd.from_pandas(pd.DataFrame({"k": [1], "v": [2]}))
    with pytest.raises(ValueError, match="overlap"):
        salted_replicated_join(l, r, key="k")


def test_range_lookup_edges(ray_session):
    """Interval enrich: boundary values go RIGHT (b0 <= v < b1 is the
    middle tier), NULL maps to NULL, out-of-order boundaries rejected."""
    import ray.data as rd

    from fluent_server_ray.stages.enrich import range_lookup

    df = pd.DataFrame({"v": [-1.0, 0.0, 4.99, 5.0, 19.99, 20.0, None]})
    got = range_lookup(rd.from_pandas(df), "v", [5.0, 20.0],
                       ["low", "mid", "high"], "tier").to_pandas()
    assert list(got.tier) == ["low", "low", "low", "mid", "mid",
                              "high", None]
    with pytest.raises(ValueError, match="increasing"):
        range_lookup(rd.from_pandas(df), "v", [5.0, 5.0],
                     ["a", "b", "c"], "t")
    with pytest.raises(ValueError, match="labels"):
        range_lookup(rd.from_pandas(df), "v", [5.0], ["a"], "t")


def test_latest_by_key_vs_oracle(ray_session, tmp_path):
    """Upsert compaction == SQL row_number()=1: ts tie broken by the
    second order column, single-row keys pass through."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import (latest_by_key,
                                                    latest_by_key_sql)

    ts = pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-02 00:00:00",  # k=1: later wins
        "2024-01-05 00:00:00", "2024-01-05 00:00:00",  # k=2: ts TIE ->
        "2024-01-03 00:00:00",                          # higher id wins
    ])
    df = pd.DataFrame({
        "user_id": [1, 1, 2, 2, 3],
        "event_id": [10, 11, 20, 21, 30],
        "ts": ts,
        "value": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    p = tmp_path / "ev.parquet"
    df.to_parquet(p, index=False)
    got = latest_by_key(rd.read_parquet(str(p)), "user_id",
                        ["ts", "event_id"]).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(latest_by_key_sql(
        ["user_id", "event_id", "ts", "value"], "user_id",
        ["ts", "event_id"], "events")).df()
    pd.testing.assert_frame_equal(
        got[want.columns].reset_index(drop=True),
        want.astype(got[want.columns].dtypes.to_dict()), check_exact=True)
    assert list(got.event_id) == [11, 21, 30]


def test_bpe_train_matches_reference(ray_session):
    """Distributed BPE == the pure-Python textbook trainer: same merge
    sequence incl. count TIES (broken (w desc, left, right)), same
    early stop at min_count, end-of-word marker participates."""
    import ray.data as rd

    from fluent_server_ray.stages.bpe import bpe_train, bpe_train_reference

    texts = ["low low low low low", "lower lower",
             "newest newest newest newest newest newest",
             "widest widest widest", "new new newer"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = bpe_train(rd.from_pandas(df), n_merges=12).to_pandas()
    ref = bpe_train_reference(texts, n_merges=12)
    assert list(zip(got.left, got.right, got.w)) == ref
    assert list(got.merged) == [a + b for a, b, _ in ref]
    assert list(got["rank"]) == list(range(len(ref)))
    # early stop: singleton corpus has no pair with count >= 2
    tiny = bpe_train(rd.from_pandas(
        pd.DataFrame({"doc_id": [0], "text": ["ab cd"]})), n_merges=5)
    assert len(tiny) == 0


def test_bpe_repeated_symbol_runs(ray_session):
    """Greedy left-to-right non-overlap on symbol runs ('aaaa' merging
    (a,a) gives aa+aa, 'aaa' gives aa+a) — the replace-semantics edge
    where a separator-consuming substitution diverges."""
    import ray.data as rd

    from fluent_server_ray.stages.bpe import bpe_train, bpe_train_reference

    texts = ["aaaa aaaa aaa", "aaaa aa"]
    got = bpe_train(rd.from_pandas(
        pd.DataFrame({"doc_id": [0, 1], "text": texts})),
        n_merges=6).to_pandas()
    ref = bpe_train_reference(texts, n_merges=6)
    assert list(zip(got.left, got.right, got.w)) == ref


def test_doc_compression_ratio_exact(ray_session, tmp_path):
    """zlib ratio byte-exact vs direct zlib; repetitive text scores
    lower ratio than varied text; empty doc keeps a guarded row."""
    import zlib

    import ray.data as rd

    from fluent_server_ray.stages.textstats import doc_compression_ratio

    texts = ["spam spam spam spam spam spam spam spam",
             "the quick brown fox jumps over the lazy dog", ""]
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": texts})
    p = tmp_path / "d.parquet"
    df.to_parquet(p, index=False)
    got = (doc_compression_ratio(rd.read_parquet(str(p)))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, t in enumerate(texts):
        raw = t.encode()
        assert got.n_bytes[i] == len(raw)
        assert got.n_compressed[i] == len(zlib.compress(raw, 6))
        assert got.ratio[i] == got.n_compressed[i] / max(len(raw), 1)
    assert got.ratio[0] < got.ratio[1]  # redundancy compresses better
    assert len(got) == 3  # empty doc kept (guarded denominator)


def test_label_centroids_vs_oracle(ray_session, tmp_path):
    """Per-label centroids == SQL mirror bit-for-bit (integer-sum
    contract); mean of a known two-vector label is exact."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.similarity import (label_centroids,
                                                     label_centroids_sql)

    df = pd.DataFrame({
        "vec_id": [1, 2, 3],
        "embedding": [[1.0, 2.0], [3.0, 4.0], [10.0, -2.5]],
        "label": ["a", "a", "b"],
    })
    p = tmp_path / "e.parquet"
    df.to_parquet(p, index=False)
    got = label_centroids(rd.read_parquet(str(p))).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(label_centroids_sql()).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.astype(got.dtypes.to_dict()),
        check_exact=True)
    a = got[got.label == "a"].set_index("dim")
    assert a.mean_millionths[0] == 2_000_000.0  # mean(1,3)
    assert a.mean_millionths[1] == 3_000_000.0  # mean(2,4)


def test_salted_join_randomized(ray_session):
    """Randomized equivalence: salted replicated join == pandas inner
    merge across seeds, key skews, and salt/bucket shapes."""
    import ray.data as rd

    from fluent_server_ray.stages.joins import salted_replicated_join

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n_big = int(rng.integers(50, 400))
        keys = rng.choice([1, 2, 3, 7, 7, 7, 7, 100, 101], size=n_big)
        big = pd.DataFrame({"k": keys.astype(np.int64),
                            "v": np.arange(n_big, dtype=np.int64)})
        small_keys = rng.choice(np.arange(110), size=20, replace=False)
        small = pd.DataFrame({"k": small_keys.astype(np.int64),
                              "w": [f"s{k}" for k in small_keys]})
        got = salted_replicated_join(
            rd.from_pandas(big), rd.from_pandas(small), key="k",
            n_salts=int(rng.integers(2, 6)), n_sub=int(rng.integers(2, 6)),
        ).to_pandas()
        want = big.merge(small, on="k")
        if want.empty:  # zero-match seed: typed-empty Dataset, and
            assert len(got) == 0  # to_pandas() drops cols at 0 rows
            continue
        cols = ["k", "v", "w"]
        pd.testing.assert_frame_equal(
            got[cols].sort_values(cols).reset_index(drop=True),
            want[cols].sort_values(cols).reset_index(drop=True)
            .astype(got[cols].dtypes.to_dict()),
            check_exact=True,
        )


def test_bm25_randomized_vs_bruteforce(ray_session, tmp_path):
    """Randomized BM25 equivalence vs a from-scratch driver-side
    scorer (same millionths contract), incl. rank order."""
    import math

    import ray.data as rd

    from fluent_server_ray.stages.textstats import bm25_topk

    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    for seed in (3, 4):
        rng = np.random.default_rng(seed)
        texts = [" ".join(rng.choice(vocab,
                                     size=int(rng.integers(0, 15))))
                 for _ in range(60)]
        df = pd.DataFrame({"doc_id": range(60), "text": texts})
        p = tmp_path / f"b{seed}.parquet"
        df.to_parquet(p, index=False)
        terms = ["alpha", "gamma"]
        k1, b = 1.2, 0.75
        got = bm25_topk(rd.read_parquet(str(p)), terms, k=60).to_pandas()

        # driver-side reference
        toks = [t.split(" ") if t else [] for t in texts]
        toks = [[w for w in ws if w] for ws in toks]
        n = len(texts)
        dl = [len(ws) for ws in toks]
        avgdl = sum(dl) / n
        scores = {}
        for term in terms:
            df_t = sum(1 for ws in toks if term in ws)
            if df_t == 0:
                continue
            idf = math.log(((n - df_t) + 0.5) / (df_t + 0.5) + 1.0)
            for i, ws in enumerate(toks):
                tf = ws.count(term)
                if tf:
                    den = tf + k1 * ((1.0 - b) + (b * dl[i]) / avgdl)
                    c = math.floor((idf * (tf * (1.0 + k1))) / den
                                   * 1_000_000.0)
                    scores[i] = scores.get(i, 0) + c
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        assert list(zip(got.doc_id, got.bm25_millionths)) == want


def test_latest_by_key_randomized(ray_session, tmp_path):
    """Randomized upsert compaction vs pandas idxmax incl. timestamp
    ties resolved by the second order column."""
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import latest_by_key

    for seed in (5, 6):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(100, 500))
        df = pd.DataFrame({
            "user_id": rng.integers(0, 30, size=n).astype(np.int64),
            "event_id": np.arange(n, dtype=np.int64),
            # coarse ts → plenty of within-key ties
            "ts": pd.to_datetime(
                rng.integers(0, 5, size=n), unit="D",
                origin="2024-01-01"),
            "value": rng.normal(size=n),
        })
        p = tmp_path / f"l{seed}.parquet"
        df.to_parquet(p, index=False)
        got = latest_by_key(rd.read_parquet(str(p)), "user_id",
                            ["ts", "event_id"]).to_pandas()
        want = (df.sort_values(["user_id", "ts", "event_id"],
                               ascending=[True, False, False])
                .drop_duplicates("user_id")
                .sort_values("user_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want[got.columns],
            check_exact=True)


def test_doc_tfidf_joined_equals_broadcast(ray_session, tmp_path):
    """The distributed-join tfidf path == the broadcast path row for
    row (same millionths), incl. a doc whose terms are all corpus-wide
    (idf floor 0) and an empty doc that emits no row."""
    import ray.data as rd

    from fluent_server_ray.stages.textstats import (doc_tfidf,
                                                    doc_tfidf_joined)

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["common common rare", "common unique", "common", ""],
    })
    p = tmp_path / "d.parquet"
    df.to_parquet(p, index=False)
    a = (doc_tfidf(rd.read_parquet(str(p))).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (doc_tfidf_joined(rd.read_parquet(str(p))).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert set(b.doc_id) == {1, 2, 3}  # empty doc drops in both
    # the empty doc still counts toward N: idf(common) = ln(4/3)
    import math
    assert (b.set_index("doc_id").tfidf_millionths[3]
            == math.floor(math.log(4 / 3) * 1e6))


def test_bpe_adaptive_paths_agree(ray_session):
    """Size-adaptive BPE: driver-exact path (vocab fits) ==
    distributed path == pure-Python reference, same tie-breaks."""
    import ray.data as rd

    from fluent_server_ray.stages.bpe import (bpe_train,
                                              bpe_train_adaptive,
                                              bpe_train_reference)

    texts = ["low low low low low", "lower lower newest",
             "newest newest widest\twide", "wide wide\nnew"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    dist = bpe_train(rd.from_pandas(df), n_merges=10).to_pandas()
    drv = bpe_train_adaptive(rd.from_pandas(df), n_merges=10).to_pandas()
    forced = bpe_train_adaptive(rd.from_pandas(df), n_merges=10,
                                driver_max_vocab_bytes=0).to_pandas()
    pd.testing.assert_frame_equal(dist, drv, check_exact=True)
    pd.testing.assert_frame_equal(dist, forced, check_exact=True)
    norm = [t.replace("\t", " ").replace("\n", " ") for t in texts]
    ref = bpe_train_reference(norm, n_merges=10)
    assert list(zip(drv.left, drv.right, drv.w)) == ref


def test_bpe_encode_matches_reference(ray_session):
    """Encoding with the learned table == per-word greedy reference
    replay; token counts shrink as merges apply."""
    import re as _re

    import ray.data as rd

    from fluent_server_ray.stages.bpe import (END_OF_WORD, bpe_encode,
                                              bpe_train)

    texts = ["low lower lowest", "low low newest", ""]
    df = pd.DataFrame({"doc_id": range(3), "text": texts})
    merges = bpe_train(rd.from_pandas(df), n_merges=8)
    got = (bpe_encode(rd.from_pandas(df), merges).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    pairs = list(zip(merges["left"].to_pylist(),
                     merges["right"].to_pylist()))

    def ref_encode(text):
        out = []
        for w in text.split(" "):
            if not w:
                continue
            syms = " ".join(list(w) + [END_OF_WORD])
            for a, b in pairs:
                rx = _re.compile(r"(?<!\S)" + _re.escape(a) + " "
                                 + _re.escape(b) + r"(?!\S)")
                syms = rx.sub(a + b, syms)
            out.extend(syms.split(" "))
        return out

    for i, t in enumerate(texts):
        want = ref_encode(t)
        assert got.tokens[i].split(" ") == want or (
            got.tokens[i] == "" and want == [])
        assert got.n_tokens[i] == len(want)
    # merges actually compress: fewer symbols than raw chars+markers
    raw = sum(len(w) + 1 for w in texts[0].split(" "))
    assert got.n_tokens[0] < raw


def test_window_anomalies_edges(ray_session, tmp_path):
    """Spike detection vs SQL: an injected burst window flags, a
    constant-rate type (zero variance) flags nothing, threshold is a
    strict |z| >= cut."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.windows import (window_anomalies,
                                                  window_anomalies_sql)

    rows = []
    # 'steady': exactly 5 events in each of 6 hourly windows → std 0
    for w in range(6):
        for i in range(5):
            rows.append(("steady", pd.Timestamp("2024-01-01")
                         + pd.Timedelta(hours=w, minutes=i)))
    # 'bursty': 2 events/hour, one window with 40
    for w in range(6):
        k = 40 if w == 3 else 2
        for i in range(k):
            rows.append(("bursty", pd.Timestamp("2024-01-01")
                         + pd.Timedelta(hours=w, minutes=i)))
    df = pd.DataFrame(rows, columns=["event_type", "ts"])
    p = tmp_path / "ev.parquet"
    df.to_parquet(p, index=False)
    got = window_anomalies(rd.read_parquet(str(p)), 3600, 2.0).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(window_anomalies_sql(3600, 2.0)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.astype(got.dtypes.to_dict()),
        check_exact=True)
    assert set(got.event_type) == {"bursty"}  # zero-variance never flags
    assert 40 in set(got.n)  # the burst window itself is flagged


def test_grouped_topk_counts_block_partials(ray_session):
    """Per-group top-k stays exact when a group's values straddle many
    blocks (the per-block-partial containment argument) and on count
    ties (value-asc break)."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.features import (grouped_topk_counts,
                                                   grouped_topk_counts_sql)

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b"], size=2000),
        "user_id": rng.integers(0, 40, size=2000).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(16)  # force straddling
    got = grouped_topk_counts(ds, "event_type", "user_id", k=3).to_pandas()
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute(grouped_topk_counts_sql(
        "event_type", "user_id", k=3)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.astype(got.dtypes.to_dict()),
        check_exact=True)
    assert list(got.groupby("event_type")["rank"].max()) == [3, 3]


def test_diff_by_key_all_statuses(ray_session):
    """Dataset diff: added/removed/changed each detected, identical
    keys omitted, text-identical-but-different-key rows independent."""
    import ray.data as rd

    from fluent_server_ray.stages.diff import diff_by_key

    old = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["same", "will change", "will vanish", "same too"],
    })
    new = pd.DataFrame({
        "doc_id": [1, 2, 4, 5],
        "text": ["same", "CHANGED", "same too", "brand new"],
    })
    got = (diff_by_key(rd.from_pandas(old), rd.from_pandas(new))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = {2: "changed", 3: "removed", 5: "added"}
    assert dict(zip(got.doc_id, got.status)) == want


def test_winsorize_by_group_nulls(ray_session, tmp_path):
    """Winsorization: NULL value stays NULL; clamps hit the sketch's
    bucket edges; in-band values pass through unchanged."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.features import (winsorize_by_group,
                                                   winsorize_by_group_sql)

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "event_id": np.arange(300, dtype=np.int64),
        "event_type": rng.choice(["a", "b"], size=300),
        "value": rng.uniform(0, 100, size=300).round(2),
    })
    df.loc[0, "value"] = None
    p = tmp_path / "e.parquet"
    df.to_parquet(p, index=False)
    got = winsorize_by_group(rd.read_parquet(str(p)), lo=0.0, hi=100.0,
                             bins=200).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
    want = con.execute(winsorize_by_group_sql(lo=0.0, hi=100.0,
                                              bins=200)).df()
    cols = sorted(got.columns)
    g = got[cols].sort_values(["event_id"]).reset_index(drop=True)
    w = (want[cols].astype(got[cols].dtypes.to_dict())
         .sort_values(["event_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(g, w, check_exact=True)
    assert np.isnan(g.loc[g.event_id == 0, "value_w"]).all()
    assert (g.value_w.min() >= 0) and (g.value_w.max() <= 100)


def test_rebalance_by_key_skewed(ray_session, tmp_path):
    """Rebalancing on a skewed mix: the big source downsamples toward
    the small one's mass (±md5 binomial noise), the smallest keeps
    everything, and the SQL mirror matches row-for-row."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.sampling import (rebalance_by_key,
                                                   rebalance_by_key_sql)

    df = pd.DataFrame({
        "doc_id": np.arange(1100, dtype=np.int64),
        "source": ["big"] * 1000 + ["small"] * 100,
    })
    p = tmp_path / "d.parquet"
    df.to_parquet(p, index=False)
    got = (rebalance_by_key(rd.read_parquet(str(p))).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    want = (con.execute(rebalance_by_key_sql()).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()),
                                  check_exact=True)
    sizes = got.groupby("source").size()
    assert sizes["small"] == 100          # smallest keeps all
    assert 60 <= sizes["big"] <= 140      # ~100 expected, md5 noise


def test_split_by_content_no_leakage(ray_session):
    """Content-keyed split: byte-identical duplicate texts always land
    in the SAME split; id-keyed split demonstrably leaks them."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.assembly import split_of

    texts = [f"doc body {i % 7}" for i in range(400)]  # heavy dup
    df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64),
                       "text": texts})

    def by_content(t):
        return pa.table({"doc_id": t["doc_id"],
                         "split": split_of(t["text"])})

    got = (rd.from_pandas(df).repartition(8)
           .map_batches(by_content, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas())
    j = df.merge(got, on="doc_id")
    assert (j.groupby("text")["split"].nunique() == 1).all()
    # the id-keyed rule would split the dups (sanity of the premise)
    id_split = split_of(pa.array([str(i) for i in range(400)]))
    j2 = df.assign(split=id_split.to_pylist())
    assert (j2.groupby("text")["split"].nunique() > 1).any()


def test_doc_chunk_dedup_first_occurrence(ray_session):
    """Paragraph dedup keeps the FIRST (doc_id, chunk_idx) occurrence
    of each distinct chunk — incl. a repeat WITHIN one doc and a
    cross-doc repeat — and drops nothing unique."""
    import duckdb
    import ray.data as rd

    import __ray_entry__ as entrymod

    # build via the registered callable against a scratch corpus
    w = " ".join(f"w{i}" for i in range(20))          # one full chunk
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [w + " " + w,        # within-doc repeat: idx 1 drops
                 w,                   # cross-doc repeat: doc 2 drops
                 "totally different"],
        "lang": ["en"] * 3, "source": ["s"] * 3, "n_chars": [1] * 3,
    })
    import tempfile, os
    d = tempfile.mkdtemp()
    df.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    got = entrymod.queries()["doc_chunk_dedup"](d).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{os.path.join(d, 'documents.parquet')}')")
    want = con.execute(entrymod.oracle_sql()["doc_chunk_dedup"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.astype(got.dtypes.to_dict()),
        check_exact=True)
    keys = set(zip(got.doc_id, got.chunk_idx))
    assert (1, 0) in keys and (1, 1) not in keys  # within-doc repeat
    assert not any(d_ == 2 for d_, _ in keys)     # cross-doc repeat
    assert (3, 0) in keys                          # unique survives


def test_psi_drift_detects_shift(ray_session):
    """PSI: identical cohorts score ~0 (smoothing only), a mean-shifted
    cohort scores large; SQL mirror bit-exact on both."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.features import psi_drift, psi_drift_sql

    rng = np.random.default_rng(21)
    same = rng.uniform(10, 30, size=2000).round(2)
    shifted = rng.uniform(200, 400, size=1000).round(2)
    df = pd.DataFrame({
        "event_id": np.arange(3000, dtype=np.int64),
        "event_type": ["stable"] * 2000 + ["moved"] * 1000,
        "value": np.concatenate([same, shifted]),
    })
    # cohorts: even/odd ids; for 'moved', make odd cohort different
    df.loc[(df.event_type == "moved") & (df.event_id % 2 == 1),
           "value"] = rng.uniform(0, 50, size=int(
               ((df.event_type == "moved") & (df.event_id % 2 == 1)).sum()
           )).round(2)
    con = duckdb.connect()
    con.register("events", df)
    a = rd.from_pandas(df[df.event_id % 2 == 0])
    b = rd.from_pandas(df[df.event_id % 2 == 1])
    got = psi_drift(a, b).to_pandas()
    want = con.execute(psi_drift_sql("event_id % 2 = 0",
                                     "event_id % 2 = 1")).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.astype(got.dtypes.to_dict()),
        check_exact=True)
    by = got.set_index("event_type").psi_millionths
    assert by["stable"] < 100_000        # same distribution: PSI ~ 0
    assert by["moved"] > 1_000_000       # full shift: PSI >> 0.25


def test_conv_turn_gaps_edges(ray_session, tmp_path):
    """Turn-gap stats: single-turn conv emits no row; gaps use turn
    ORDER (not arrival order); SQL mirror exact."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.assembly import (conv_turn_gaps,
                                                   conv_turn_gaps_sql)

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "conv_id": ["a", "a", "a", "b"],
        "turn_idx": [2, 0, 1, 0],  # shuffled arrival
        "ts": [base + pd.Timedelta(seconds=100),
               base,
               base + pd.Timedelta(seconds=10),
               base],
    })
    got = conv_turn_gaps(rd.from_pandas(df)).to_pandas()
    assert list(got.conv_id) == ["a"]  # single-turn 'b' drops
    assert got.n_gaps[0] == 2
    assert got.max_gap_sec[0] == 90.0  # turn1->turn2, ordered by idx
    assert got.avg_gap_sec[0] == 50.0


def test_gram_diversity_mode_collapse(ray_session):
    """Diversity ratio: a repetitive source scores far below a varied
    one; SQL mirror exact."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.textstats import (
        gram_diversity_by_source, gram_diversity_by_source_sql)

    rows = []
    for i in range(50):
        rows.append(("collapsed", "the same thing again " * 5))
        rows.append(("varied", " ".join(f"w{i}_{j}" for j in range(20))))
    df = pd.DataFrame(rows, columns=["source", "text"])
    got = gram_diversity_by_source(rd.from_pandas(df)).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(gram_diversity_by_source_sql()).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.astype(got.dtypes.to_dict()),
        check_exact=True)
    d = got.set_index("source").diversity
    assert d["collapsed"] < 0.02 < 0.5 < d["varied"]


def test_gate_per_language_thresholds(ray_session):
    """Per-language bars: a 12-token zh doc passes (bar 10) while a
    12-token en doc fails (bar 30); unknown lang takes the default;
    NULL text gates out."""
    import ray.data as rd

    from fluent_server_ray.stages.hygiene import gate_per_language

    twelve = " ".join(["tok"] * 12)
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "lang": ["zh", "en", "xx", "xx", "en"],
        "text": [twelve, twelve, twelve, " ".join(["t"] * 20), None],
    })
    got = gate_per_language(rd.from_pandas(df)).to_pandas()
    assert set(got.doc_id) == {1, 4}  # zh@12 passes, xx@20 >= 15


def test_bpe_sql_mirror_matches_reference_trainer(ray_session):
    """The unrolled-CTE DuckDB mirror reproduces the pure-Python
    reference trainer bit-for-bit, including the greedy-run parity
    cases ('aaaa' -> aa+aa vs 'aaa' -> aa+a), lexicographic
    tie-breaks, early stop below min_count, and tab/newline word
    separation; the encode mirror matches the engine encoder."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.bpe import (
        bpe_encode,
        bpe_train_adaptive,
        bpe_train_reference,
        bpe_train_sql,
        bpe_encode_sql,
    )

    corpora = [
        ["aaaa aaa bb", "aaaa cc bb aaaa", "x", None, "", "a\ta a\nbb"],
        ["the cat sat on the mat", "the cat", "mat mat mat the"],
        ["ab ab ab abab", "abab abab", "b a ab ba"],
    ]
    for texts in corpora:
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT row_number() OVER () AS "
            "doc_id, * FROM (SELECT unnest(?) AS text)", [texts])
        sql = con.execute(bpe_train_sql(8, 2)).df()
        ref = bpe_train_reference(
            [(t or "").replace("\t", " ").replace("\n", " ")
             for t in texts if t], 8, 2)
        assert list(zip(sql["left"], sql["right"],
                        sql["w"].astype(int))) == ref

        docs = rd.from_pandas(pd.DataFrame(
            {"doc_id": range(1, len(texts) + 1), "text": texts}))
        merges = bpe_train_adaptive(docs, n_merges=8)
        eng = (bpe_encode(docs, merges).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        got = (con.execute(bpe_encode_sql(8, 2)).df()
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(eng, got)


def test_cdc_sql_mirror_matches_engine():
    """The recursive-CTE gear-hash mirror reproduces cdc_chunk_batch
    byte-for-byte on random ASCII payloads including empty/NULL text,
    forced max-size cuts (no candidate in range) and long runs."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from fluent_server_ray.stages.cdc import cdc_chunk_batch, cdc_chunks_sql

    rng = np.random.default_rng(7)
    texts = ["".join(chr(int(c)) for c in
                     rng.integers(32, 127, size=int(rng.integers(0, 900))))
             for _ in range(40)]
    texts += [None, "", "a" * 700, "xy" * 300]
    tab = pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    payload = pa.table({"doc_id": tab["doc_id"],
                        "payload": tab["text"].cast(pa.binary())})
    eng = cdc_chunk_batch(payload).to_pandas()

    con = duckdb.connect()
    con.register("documents", tab.to_pandas())
    got = con.execute(cdc_chunks_sql()).df()
    assert eng.reset_index(drop=True).equals(got.reset_index(drop=True))


def test_pmi_driver_and_distributed_paths_identical(ray_session, tmp_path):
    """The size-adaptive driver merge and the distributed
    grouped_agg+join fallback produce byte-identical PMI tables
    (forced via driver_max_partial_bytes=0)."""
    import ray.data as rd

    from fluent_server_ray.stages.textstats import pmi_top_pairs

    rows = []
    for i in range(6):
        rows.append((i, "zig zag common common common common"))
    for i in range(6, 12):
        rows.append((i, "common common filler words here"))
    rows.append((12, None))
    rows.append((13, ""))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    p = tmp_path / "docs.parquet"
    df.to_parquet(p, index=False)

    fast = pmi_top_pairs(rd.read_parquet(str(p)), k=20,
                         min_count=5).to_pandas()
    slow = pmi_top_pairs(rd.read_parquet(str(p)), k=20, min_count=5,
                         driver_max_partial_bytes=0).to_pandas()
    pd.testing.assert_frame_equal(fast.reset_index(drop=True),
                                  slow.reset_index(drop=True))
    assert len(fast) > 0


def test_profile_table_counts(ray_session):
    """Profiling card: exact nulls + distinct per column, including an
    all-null column and a zero-row table."""
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.features import profile_table

    df = pd.DataFrame({
        "a": [1, 1, 2, None],
        "b": ["x", None, None, None],
        "c": pd.array([None, None, None, None], dtype="Int64"),
    })
    got = profile_table(lambda: rd.from_pandas(df),
                        ["a", "b", "c"]).to_pandas()
    assert got.set_index("column").to_dict("index") == {
        "a": {"n_rows": 4, "n_nulls": 1, "n_distinct": 2},
        "b": {"n_rows": 4, "n_nulls": 3, "n_distinct": 1},
        "c": {"n_rows": 4, "n_nulls": 4, "n_distinct": 0},
    }


def test_pack_sequences_n_col(ray_session):
    """pack_sequences(n_col=...) respects precomputed counts: a doc
    with a huge real-token count must advance the cursor even if its
    text is short."""
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.assembly import pack_sequences

    df = pd.DataFrame({
        "doc_id": [0, 8, 16],           # one bucket (mod 8)
        "text": ["a b", "a b", "a b"],  # whitespace counts would be 2
        "n_tokens": [1000, 100, 10],
    })
    got = pack_sequences(rd.from_pandas(df), budget=1024, n_buckets=8,
                         n_col="n_tokens").to_pandas()
    # offsets 0, 1000, 1100 -> seq ids 0, 0, 1
    assert got.seq_id.tolist() == [0, 0, 1]
    assert got.seq_off.tolist() == [0, 1000, 76]


def test_pearson_corr_exact_and_nulls(ray_session):
    """Pearson from exact int partials: bit-equal to the same float64
    tree computed locally; rows with a NULL on either side excluded;
    zero variance gives NULL corr (mirror semantics)."""
    import math

    import pandas as pd
    import pytest
    import ray.data as rd

    from fluent_server_ray.stages.features import pearson_corr

    df = pd.DataFrame({
        "x": pd.array([1, 2, 3, 4, None, 7], dtype="Int64"),
        "y": pd.array([2, 3, 7, 9, 5, None], dtype="Int64"),
    })
    got = pearson_corr(rd.from_pandas(df), "x", "y").to_pydict()
    xs, ys = [1, 2, 3, 4], [2, 3, 7, 9]
    n = float(len(xs))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxy = float(sum(a * b for a, b in zip(xs, ys)))
    sxx, syy = float(sum(a * a for a in xs)), float(sum(b * b for b in ys))
    want = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert got["n"] == [4] and got["corr"] == [want]  # bitwise

    # constant column: NULL corr (the mirror's sqrt(0) division is
    # NULL in DuckDB; a REGULAR graph hits this in assortativity)
    flat = pd.DataFrame({"x": [5, 5, 5], "y": [1, 2, 3]})
    got = pearson_corr(rd.from_pandas(flat), "x", "y").to_pydict()
    assert got["n"] == [3] and got["corr"][0] is None


def test_pearson_corr_overflow_exact(ray_session):
    """Block partials stay exact when x*y / x*x exceed int64: values
    around 3.2e9 whose products are ~1e19 > 2^63 must produce the
    same corr as the python-int ground truth (a silent int64 wrap
    would flip signs / magnitudes)."""
    import math

    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.features import pearson_corr

    xs = [3_200_000_000 + i for i in range(6)]
    ys = [3_200_000_011 - 2 * i for i in range(6)]
    got = pearson_corr(
        rd.from_pandas(pd.DataFrame({"x": xs, "y": ys})), "x", "y"
    ).to_pydict()
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    # exact-integer subtractions, float64 division — the engine tree
    want = float(n * sxy - sx * sy) / (
        math.sqrt(float(n * sxx - sx * sx))
        * math.sqrt(float(n * syy - sy * sy)))
    assert got["corr"] == [want]  # bitwise; wrap would give garbage
    assert abs(want + 1.0) < 1e-9  # ys is a strictly decreasing line


def test_kmeans_auto_k_scales_sample(ray_session):
    """n_clusters=None derives k = ceil(n / target_cluster_rows)
    (floored at 8) and re-draws the training sample at 4*k rows when
    the derived k outgrows the default sample — centroids.shape[0]
    must equal the derived k, not a sample-clamped value."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.similarity import kmeans_fit

    import pyarrow as pa

    rng = np.random.default_rng(7)
    n, d = 3000, 4
    mat = rng.normal(size=(n, d))
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              type=pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t).repartition(8)
    # target 8 rows/cluster -> derived k = 375; 4k = 1500 > 512 so the
    # sample is re-drawn; without that, kmeans trains only 512 centroids
    cents, sizes = kmeans_fit(ds, n_clusters=None, n_iter=1,
                              target_cluster_rows=8)
    assert cents.shape == (375, d)
    assert sizes.sum() == n
    # small corpus floors at k=8
    cents2, _ = kmeans_fit(ds, n_clusters=None, n_iter=1,
                           target_cluster_rows=100_000)
    assert cents2.shape == (8, d)


def test_pearson_corr_equals_fraction_exact(ray_session):
    """Randomized exactness pin: for several seeds (mixed magnitudes,
    including values whose squares overflow int64), pearson_corr
    equals the Fraction-exact correlation converted to float64 the
    same way (int subtractions, then float division tree)."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.features import pearson_corr

    for seed, scale in ((0, 10), (1, 10**9), (2, 4 * 10**9)):
        rng = np.random.default_rng(seed)
        n = 200
        xs = (rng.integers(0, 1000, n) + scale).astype(object)
        ys = (rng.integers(0, 1000, n) * 3 + scale // 2).astype(object)
        xs = [int(v) for v in xs]
        ys = [int(v) for v in ys]
        got = pearson_corr(
            rd.from_pandas(pd.DataFrame(
                {"x": np.array(xs, dtype="int64"),
                 "y": np.array(ys, dtype="int64")})), "x", "y"
        ).to_pydict()["corr"][0]
        N = len(xs)
        num = N * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
        vx = N * sum(a * a for a in xs) - sum(xs) ** 2
        vy = N * sum(b * b for b in ys) - sum(ys) ** 2
        want = float(num) / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
        assert got == want, (seed, scale)


def test_pearson_oracle_bitexact_in_hugeint_cast_divergence_zone(
        ray_session):
    """Round-4 review fix: DuckDB's direct HUGEINT->DOUBLE cast is NOT
    correctly rounded (~1% of >64-bit values off by 1 ulp), while the
    engine's float(int) is — the mirror must enter float64 via
    HUGEINT->VARCHAR->DOUBLE (correctly-rounded parse). This dataset
    is PINNED so one of its exact variance terms (74 bits) sits on a
    diverging value: with the old direct cast the strict comparison
    fails; with the VARCHAR route engine == oracle bit-for-bit."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.features import (
        pearson_corr,
        pearson_corr_sql,
    )

    rng = np.random.default_rng(12)
    n = 200
    df = pd.DataFrame({
        "x": rng.integers(1_600_000_000, 1_800_000_000, n),
        "y": rng.integers(1, 2_000_000_000, n),
    })
    # prove the pin still bites: at least one exact term's direct
    # HUGEINT cast differs from python's correctly-rounded float()
    sx, sy = int(df.x.sum()), int(df.y.sum())
    sxy = sum(int(a) * int(b) for a, b in zip(df.x, df.y))
    sxx = sum(int(a) ** 2 for a in df.x)
    syy = sum(int(b) ** 2 for b in df.y)
    terms = [n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy]
    con = duckdb.connect()
    diverges = [
        v for v in terms if abs(v) >= (1 << 63)
        and con.execute(
            f"SELECT CAST(CAST('{v}' AS HUGEINT) AS DOUBLE)"
        ).fetchone()[0] != float(v)
    ]
    assert diverges, "pin rotted: rotate the seed (see round-4 notes)"
    con.register("t", df)
    want = con.execute(pearson_corr_sql("x", "y", "t")).df()
    got = pearson_corr(rd.from_pandas(df), "x", "y").to_pydict()
    assert got["n"] == [int(want["n"].iloc[0])]
    assert got["corr"] == [float(want["corr"].iloc[0])]  # bit-for-bit


def test_pearson_corr_int64_min_does_not_wrap(ray_session):
    """Round-4 review fix: np.abs(INT64_MIN) wraps to itself, so the
    old peak check under-reported and took the int64 fast path, where
    (-2^63)^2 silently wrapped to 0 (=> spurious 'zero variance').
    x=[-2^63, 0] vs y=[0, 1] has exact corr 1.0."""
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.features import pearson_corr

    df = pd.DataFrame({"x": [-(1 << 63), 0], "y": [0, 1]})
    got = pearson_corr(rd.from_pandas(df), "x", "y").to_pydict()
    # num = 2^63, vx = 2^126, vy = 1 -> corr = 2^63/2^63 = 1.0 exactly
    assert got["corr"] == [1.0]


def test_embed_stub_prefix_state_equals_full_hash(ray_session):
    """Round-4 review fix: EmbedStub hashes each document ONCE and
    derives the per-dim digests from a copied md5 prefix state — must
    stay bit-identical to the naive md5(text || 0x1f || j) loop the
    SQL mirror implements."""
    import hashlib

    import pyarrow as pa

    from fluent_server_ray.stages.multimodal import EmbedStub

    texts = ["", "héllo wörld", "a" * 10_000, "tab\tnew\nline"]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })
    out = EmbedStub(dim=16)(batch)
    embs = out["embedding"].to_pylist()
    for t, e in zip(texts, embs):
        raw = [
            int.from_bytes(
                hashlib.md5(f"{t}\x1f{j}".encode()).digest()[:8],
                "little") % 2000001 - 1000000
            for j in range(16)
        ]
        nrm = sum(r * r for r in raw) ** 0.5 or 1.0
        want = [r / nrm for r in raw]
        assert e == want


def test_keep_best_per_component_semantics(ray_session):
    """Canonicalization keeps the LONGEST doc per component (ties ->
    smallest id) and every singleton: a component whose longest member
    is NOT the min id must keep the long one (the blind keep-min-id
    rule would keep the truncated copy), and a score tie must resolve
    to the smaller id deterministically."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.dedup import keep_best_per_component

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 10, 11, 99], type=pa.int64()),
        "n_chars": pa.array([5, 50, 20, 7, 7, 3], type=pa.int64()),
    })
    comps = pa.table({
        # component {1,2,3} labeled 1 (min id), {10,11} labeled 10
        "doc_id": pa.array([1, 2, 3, 10, 11], type=pa.int64()),
        "component": pa.array([1, 1, 1, 10, 10], type=pa.int64()),
    })
    got = (keep_best_per_component(rd.from_arrow(docs),
                                   rd.from_arrow(comps), n_buckets=8)
           .to_pandas().sort_values("component").reset_index(drop=True))
    # comp 1 -> doc 2 (longest, not min id); comp 10 -> doc 10 (tie,
    # smaller id); singleton 99 -> itself
    assert list(got.component) == [1, 10, 99]
    assert list(got.doc_id) == [2, 10, 99]
    assert list(got.n_chars) == [50, 7, 3]


def test_keep_best_per_component_no_pairs(ray_session):
    """An empty component table (no near-dups found) must keep every
    doc as its own component — the empty-right-join edge."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.dedup import keep_best_per_component

    docs = pa.table({
        "doc_id": pa.array([4, 7], type=pa.int64()),
        "n_chars": pa.array([9, 9], type=pa.int64()),
    })
    comps = pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "component": pa.array([], type=pa.int64()),
    })
    got = (keep_best_per_component(rd.from_arrow(docs),
                                   rd.from_arrow(comps), n_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(got.doc_id) == [4, 7]
    assert list(got.component) == [4, 7]


def test_conv_truncate_context_suffix_rule(ray_session):
    """Budget rule: keep the newest suffix whose token total fits; the
    newest turn is ALWAYS kept even when alone over budget; a turn
    exactly at the budget boundary survives."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.assembly import conv_truncate_context

    t = pa.table({
        "conv_id": ["a", "a", "a", "b", "c", "c"],
        "turn_idx": pa.array([0, 1, 2, 0, 0, 1], type=pa.int32()),
        "role": ["user", "assistant", "user",
                 "user", "user", "assistant"],
        "text": [
            "one two three",        # 3 tok — pushes total to 6 > 5
            "four five",            # 2 tok — suffix total 4
            "six seven",            # 2 tok — suffix total 2
            "w x y z a b c d",      # 8 tok > 5 but newest => kept
            "p q r",                # 3 tok — suffix total 5 == budget
            "s t",                  # 2 tok
        ],
    })
    got = (conv_truncate_context(rd.from_arrow(t), max_tokens=5,
                                 n_buckets=4)
           .to_pandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    kept = list(zip(got.conv_id, got.turn_idx))
    assert kept == [("a", 1), ("a", 2), ("b", 0), ("c", 0), ("c", 1)]
    assert list(got.n_tok) == [2, 2, 8, 3, 2]


def _budget_reference(df, budget):
    """Brute-force prefix-under-budget: the window rule, in pandas."""
    df = df.copy()
    df["score"] = (df.text.str.count("[A-Za-z]") * 1_000_000
                   // df.n_chars.clip(lower=1))
    df["n_tok"] = df.text.str.count("[^ ]+")
    out = []
    for _, g in df.groupby("source"):
        g = g.sort_values(["score", "doc_id"],
                          ascending=[False, True])
        keep = g[g.n_tok.cumsum() <= budget]
        out.append(keep[["doc_id", "source", "score", "n_tok"]])
    import pandas as pd
    return (pd.concat(out).sort_values(["source", "doc_id"])
            .reset_index(drop=True))


def test_select_token_budget_matches_reference(ray_session):
    """Randomized pin: the distributed statistic-then-map plan equals
    the brute-force per-group sorted prefix rule — including tied
    scores inside the boundary bin (several docs share a score so the
    intra-bin id-ASC cumsum actually decides)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.sampling import select_token_budget

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "9", "##", "gamma delta", "x y z"]
    rows = []
    for i in range(200):
        text = " ".join(rng.choice(words, rng.integers(1, 12)))
        rows.append({"doc_id": i, "source": f"s{i % 4}", "text": text,
                     "n_chars": len(text)})
    df = pd.DataFrame(rows)
    for budget in (0, 7, 40, 10_000):
        got = (select_token_budget(rd.from_pandas(df), budget=budget)
               .to_pandas().reset_index(drop=True))
        want = _budget_reference(df, budget)
        if len(want) == 0:
            # Ray's to_pandas() on an all-empty dataset drops the
            # column schema entirely — assert emptiness only
            assert len(got) == 0
        else:
            pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_select_token_budget_degenerate_bin_guard(ray_session):
    """A group where every doc lands in ONE score bin puts the whole
    group in the boundary pass — the cap must raise, not serialize."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from fluent_server_ray.stages.sampling import select_token_budget

    df = pd.DataFrame({
        "doc_id": range(10),
        "source": ["s"] * 10,
        "text": ["aa bb"] * 10,   # identical score, 2 tokens each
        "n_chars": [5] * 10,
    })
    with pytest.raises(ValueError, match="boundary bin"):
        select_token_budget(rd.from_pandas(df), budget=4,
                            max_boundary_rows=3).to_pandas()


def test_temperature_sample_rates_and_edges(ray_session):
    """alpha=0.5 keep-rate per source ≈ sqrt(min_n/n) (exact integer
    threshold over the md5-4-hex coin, checked by brute force); the
    smallest source keeps everything; alpha=0 equals rebalance_by_key;
    alpha=1 keeps the natural mix whole."""
    import hashlib
    import math

    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.sampling import (rebalance_by_key,
                                                   temperature_sample)

    rows = []
    i = 0
    for src, n in [("big", 800), ("mid", 200), ("small", 50)]:
        for _ in range(n):
            rows.append({"doc_id": i, "source": src})
            i += 1
    df = pd.DataFrame(rows)

    got = (temperature_sample(rd.from_pandas(df), alpha=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # brute-force the same contract
    scale = 65_536
    ns = df.source.value_counts().to_dict()
    mn = min(ns.values())
    thr = {g: math.isqrt((scale * scale * mn) // n)
           for g, n in ns.items()}
    m = df.apply(lambda r: thr[r.source] >= scale
                 or hashlib.md5(str(r.doc_id).encode()).hexdigest()[:4]
                 < format(thr[r.source], "04x"), axis=1)
    want = df[m].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # the smallest source survives whole (threshold == scale)
    assert (got.source == "small").sum() == 50
    # keep-rate ordering: smaller sources keep a larger fraction
    rates = {g: (got.source == g).sum() / n for g, n in ns.items()}
    assert rates["small"] >= rates["mid"] >= rates["big"]

    # alpha=0 ≡ rebalance_by_key
    a0 = (temperature_sample(rd.from_pandas(df), alpha=0.0)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    rb = (rebalance_by_key(rd.from_pandas(df))
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a0, rb, check_dtype=False)

    # alpha=1 keeps every row
    a1 = temperature_sample(rd.from_pandas(df), alpha=1.0).to_pandas()
    assert len(a1) == len(df)

    import pytest

    with pytest.raises(ValueError, match="alpha"):
        temperature_sample(rd.from_pandas(df), alpha=0.3)


def test_rolling_agg_matches_pandas_reference(ray_session):
    """Randomized pin incl. NULL values, NULL keys and ts ties: the
    bucketed cumsum-minus-shift rolling window equals a brute-force
    per-key pandas rolling over (ts, id) order."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.windows import rolling_agg

    rng = np.random.default_rng(11)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 12, n).astype("float64"),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 50, n), unit="s"),  # many ties
        "value": rng.normal(0, 100, n),
    })
    df.loc[rng.choice(n, 30, replace=False), "value"] = np.nan
    df.loc[rng.choice(n, 20, replace=False), "user_id"] = np.nan

    k = 4
    got = (rolling_agg(rd.from_pandas(df), k=k)
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    ref = df.copy()
    ref["vm"] = np.floor(ref.value * 1e6)
    rows = []
    for uid, g in ref.groupby("user_id", dropna=False):
        g = g.sort_values(["ts", "event_id"])
        vm = g.vm.to_numpy()
        for j in range(len(g)):
            win = vm[max(0, j - k + 1):j + 1]
            nn = win[~np.isnan(win)]
            rows.append({
                "event_id": int(g.event_id.iloc[j]),
                "user_id": uid,
                "roll_sum_micros": (np.nan if len(nn) == 0
                                    else int(nn.sum())),
                "roll_n": len(nn),
                "roll_mean": (np.nan if len(nn) == 0
                              else float(int(nn.sum())) / len(nn)),
            })
    want = (pd.DataFrame(rows).sort_values("event_id")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_oov_rate_brute_force(ray_session):
    """OOV rate vs a pandas brute force, incl. the vocab-cutoff tie
    rule (count DESC, word ASC) actually deciding membership and a
    zero-token doc emitting no row."""
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.textstats import oov_rate

    df = pd.DataFrame({
        "doc_id": range(6),
        "text": ["a a b", "b c", "c d e", "a zz", "", "  "],
    })
    k = 3  # counts: a=3 b=2 c=2 d=1 e=1 zz=1 → vocab {a, b, c} (tie
    #        b/c broken by word ASC is irrelevant at k=3; d/e/zz out)
    got = (oov_rate(rd.from_pandas(df), vocab_k=k)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    vocab = {"a", "b", "c"}
    rows = []
    for _, r in df.iterrows():
        toks = [w for w in r.text.split(" ") if w != ""]
        if not toks:
            continue
        oov = sum(w not in vocab for w in toks)
        rows.append({"doc_id": r.doc_id, "n_tokens": len(toks),
                     "n_oov": oov,
                     "oov_rate_millionths": oov * 1_000_000 // len(toks)})
    want = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_source_token_kl_uniform_and_skewed(ray_session):
    """A group distributed exactly like the corpus has KL ≈ 0 (the
    floored-log contract bounds it within ±2e-6 of zero per term);
    a disjoint-vocabulary group has strictly larger KL. Checked
    against a direct-float reference within the flooring tolerance."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.textstats import source_token_kl

    df = pd.DataFrame({
        "doc_id": range(4),
        "lang": ["en", "en", "fr", "de"],
        "text": ["x y z", "x y z", "x y z", "q q q"],
    })
    got = source_token_kl(rd.from_pandas(df), group_col="lang").to_pandas()
    got = got.set_index("lang")

    # direct reference
    toks = []
    for _, r in df.iterrows():
        toks += [(r.lang, w) for w in r.text.split(" ") if w]
    tdf = pd.DataFrame(toks, columns=["lang", "w"])
    N = len(tdf)
    cw = tdf.w.value_counts()
    for lang, g in tdf.groupby("lang"):
        n_g = len(g)
        kl = 0.0
        for w, c in g.w.value_counts().items():
            kl += (c / n_g) * np.log((c * N) / (n_g * cw[w]))
        assert abs(got.loc[lang, "kl_nats"] - kl) < 5e-6, (lang, kl)
    # fr's distribution equals en's section of the corpus but the
    # corpus includes q's mass → all kl ordering: de (disjoint vocab)
    # largest
    assert got.loc["de", "kl_nats"] > got.loc["fr", "kl_nats"] >= -1e-5

    # empty corpus → typed empty table
    empty = source_token_kl(
        rd.from_pandas(pd.DataFrame({"doc_id": [], "lang": [],
                                     "text": []}).astype(
            {"doc_id": "int64", "lang": "string", "text": "string"})),
        group_col="lang")
    assert empty.num_rows == 0
    assert empty.column_names == ["lang", "n_tokens", "kl_millionths",
                                  "kl_nats"]


def test_edit_distance_dupes_matches_brute_force(ray_session):
    """Randomized pin vs a pure-Python Levenshtein over utf-8 BYTES of
    the codepoint prefix (the DuckDB-levenshtein contract), including
    multi-byte chars, empty texts, and cross-band pairs."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.dedup import edit_distance_dupes

    def lev(a: bytes, b: bytes) -> int:
        prev = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            cur = [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[len(b)]

    rng = np.random.default_rng(3)
    base = ["the quick brown fox", "the quick brown fix",
            "héllo wörld", "hello world", "", "a", "ab",
            "日本語のテキスト", "日本語のテキストです"]
    texts = []
    for i in range(60):
        t = base[i % len(base)]
        if rng.random() < 0.5 and t:
            pos = int(rng.integers(0, len(t)))
            t = t[:pos] + "x" + t[pos + 1:]
        texts.append(t)
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    P, D = 16, 2
    got = (edit_distance_dupes(rd.from_pandas(df), prefix_len=P,
                               max_dist=D)
           .to_pandas().reset_index(drop=True))

    want_rows = []
    enc = [t[:P].encode("utf-8") for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            d = lev(enc[i], enc[j])
            if d <= D:
                want_rows.append({"doc_a": i, "doc_b": j, "dist": d})
    want = (pd.DataFrame(want_rows,
                         columns=["doc_a", "doc_b", "dist"])
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert len(want) > 0  # the corpus actually exercises the radius
    if len(got) == 0:
        assert len(want) == 0
    else:
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64"))


def test_edit_distance_dupes_pair_cap_guard(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from fluent_server_ray.stages.dedup import edit_distance_dupes

    df = pd.DataFrame({"doc_id": range(40), "text": ["same len"] * 40})
    with pytest.raises(ValueError, match="max_band_pairs"):
        edit_distance_dupes(rd.from_pandas(df),
                            max_band_pairs=100).to_pandas()


def test_grouped_ols_trend_exact(ray_session):
    """Slope/intercept per group vs exact-fraction reference, incl. a
    NULL group, NULL x/y rows excluded, a zero-variance group → NULL,
    and a large-magnitude group driving the python-int fallback."""
    from fractions import Fraction

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.features import grouped_ols_trend

    big = 3_100_000_000  # x² > int64-safe peak for a 4-row block
    df = pd.DataFrame({
        "g": ["a", "a", "a", "b", "b", None, None, "z", "z",
              "big", "big", "big"],
        "x": [1, 2, 3, 10, 20, 5, 6, 7, 7, big, big + 1, big + 2],
        "y": [2, 4, 7, 1, 2, 3, None, 9, 11, 5, 6, 9],
    })
    got = grouped_ols_trend(rd.from_pandas(df), group_col="g",
                            x_col="x", y_col="y").to_pandas()

    def ref(sub):
        sub = sub.dropna(subset=["x", "y"])
        n = len(sub)
        xs = [int(v) for v in sub.x]
        ys = [int(v) for v in sub.y]
        sx, sy = sum(xs), sum(ys)
        # python ints: pandas int64 sums would overflow on big² —
        # exactly the case the operator's object-dtype fallback guards
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        den = n * sxx - sx * sx
        if den == 0:
            return n, None, None
        return (n, float(Fraction(n * sxy - sx * sy, 1)) / float(den),
                float(Fraction(sy * sxx - sx * sxy, 1)) / float(den))

    by_g = dict(zip(got.g, zip(got.n, got.slope, got.intercept)))
    for gname, sub in df.groupby("g", dropna=False):
        key = None if gname is None or gname != gname else gname
        n, s, ic = ref(sub)
        gn, gs, gi = by_g[key]
        assert gn == n, gname
        if s is None:
            assert np.isnan(gs) and np.isnan(gi), gname
        else:
            assert gs == s and gi == ic, (gname, gs, s)
    # z has zero x-variance → NULL; null group present and last
    assert np.isnan(by_g["z"][1])
    assert got.g.tolist()[-1] is None or got.g.isna().tolist()[-1]


def test_langid_confusion_counts(ray_session):
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.textstats import (langid_batch,
                                                    langid_confusion)

    df = pd.DataFrame({
        "doc_id": range(6),
        "lang": ["en", "en", "fr", None, "de", "fr"],
        "text": ["the cat and the dog", "le chat et le chien",
                 "der hund und die katze", "the end of the story",
                 "xyzzy", "le monde est grand"],
    })
    got = langid_confusion(rd.from_pandas(df)).to_pandas()
    # reference: run the batch predictor directly, count pairs
    import pyarrow as pa
    preds = langid_batch(pa.Table.from_pandas(df))["lang_pred"].to_pylist()
    ref = (pd.DataFrame({"lang": df["lang"].fillna("unknown"),
                         "lang_pred": preds})
           .groupby(["lang", "lang_pred"]).size().rename("n")
           .reset_index().sort_values(["lang", "lang_pred"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    assert got["n"].sum() == 6


def test_source_dup_rate_cross_source(ray_session):
    """Dup flags are corpus-wide: a text shared ACROSS two sources
    marks a dup doc in BOTH; null source folds to ''; null text = ''."""
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.dedup import source_dup_rate

    df = pd.DataFrame({
        "doc_id": range(7),
        "source": ["a", "a", "b", "b", "b", None, "c"],
        "text": ["same", "uniq-a", "same", "uniq-b1", "uniq-b2",
                 None, ""],
    })
    got = source_dup_rate(rd.from_pandas(df)).to_pandas()
    by = dict(zip(got["source"],
                  zip(got["n_docs"], got["n_dups"],
                      got["dup_rate_millionths"])))
    assert by["a"] == (2, 1, 500000)
    assert by["b"] == (3, 1, 333333)
    # None text and "" text are the SAME content -> both dups
    assert by[""] == (1, 1, 1000000)
    assert by["c"] == (1, 1, 1000000)
    assert list(got["source"]) == sorted(got["source"])


def test_tfidf_cosine_pairs_matches_brute_force(ray_session):
    """Pin vs a from-scratch dense reference over the df-pruned
    integer-weight space, reproducing the exact float expression tree
    (1e6*dot / (sqrt(na2)*sqrt(nb2)), floored)."""
    import math
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.similarity import tfidf_cosine_pairs

    texts = [
        "apple banana cherry apple",
        "apple banana cherry date",
        "apple banana",
        "zebra yak xylophone",       # df-1 terms only -> no pairs
        "date cherry banana apple",  # same bag as doc 1
        "",                          # empty -> drops out
        "apple apple apple apple apple banana",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    n = len(texts)
    min_sim, permille = 100_000, 900

    got = (tfidf_cosine_pairs(rd.from_pandas(df),
                              min_sim_millionths=min_sim,
                              max_df_permille=permille)
           .to_pandas().reset_index(drop=True))

    tf = [Counter(t.split()) for t in texts]
    dfc = Counter()
    for c in tf:
        dfc.update(c.keys())
    kept = {t: math.floor(math.log(n / d) * 1000)
            for t, d in dfc.items() if d >= 2 and d * 1000 <= permille * n}
    w = [{t: c * kept[t] for t, c in cnt.items() if t in kept}
         for cnt in tf]
    want = []
    for i in range(n):
        for j in range(i + 1, n):
            dot = sum(w[i][t] * w[j][t] for t in w[i] if t in w[j])
            if dot == 0:
                continue
            na2 = sum(v * v for v in w[i].values())
            nb2 = sum(v * v for v in w[j].values())
            sim = math.floor((1_000_000.0 * float(dot))
                             / (math.sqrt(float(na2))
                                * math.sqrt(float(nb2))))
            if sim >= min_sim:
                want.append({"doc_a": i, "doc_b": j,
                             "sim_millionths": sim})
    want = (pd.DataFrame(want, columns=["doc_a", "doc_b",
                                        "sim_millionths"])
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert len(want) > 3
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))
    # identical bags score (within one ulp-floor of) 1.0
    top = got[(got.doc_a == 1) & (got.doc_b == 4)]["sim_millionths"]
    assert len(top) == 1 and int(top.iloc[0]) >= 999_999


def test_tfidf_cosine_pairs_guards(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from fluent_server_ray.stages.similarity import tfidf_cosine_pairs

    # every doc identical -> one hot term per bucket, cap trips
    df = pd.DataFrame({"doc_id": range(60),
                       "text": ["common words here"] * 60})
    with pytest.raises(ValueError, match="max_bucket_pairs"):
        tfidf_cosine_pairs(rd.from_pandas(df), max_df_permille=1000,
                           max_bucket_pairs=100).to_pandas()

    # all-unique vocabulary -> empty result with the right schema
    df2 = pd.DataFrame({"doc_id": range(3),
                        "text": ["aa bb", "cc dd", "ee ff"]})
    out = tfidf_cosine_pairs(rd.from_pandas(df2))
    assert out.count() == 0
    # ray's to_pandas drops columns on 0-row datasets; the typed
    # schema is the contract
    assert [f.name for f in out.schema().base_schema] == [
        "doc_a", "doc_b", "sim_millionths"]


def test_welch_ttest_exact_and_degenerate(ray_session):
    """t/df vs a from-scratch exact-int reference sharing the float
    tree; degenerate shapes: n<2 group -> NULLs, zero variance both
    sides -> NULL t, NULL values excluded."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.features import welch_ttest

    df = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 4 + ["c"] * 3,
        "v": [1.5, 2.25, 3.0, 2.0, None, 4.5, 5.0, 4.0, 6.25,
              9.9, 9.9, 9.9],
    })
    got = welch_ttest(rd.from_pandas(df), group_col="g",
                      value_col="v", group_a="a",
                      group_b="b").to_pandas().iloc[0]

    def mom(g):
        ys = [math.floor(v * 1_000_000.0) for v in df[df.g == g].v
              if v == v and v is not None]
        n = len(ys)
        return n, sum(ys), sum(y * y for y in ys)

    na, sya, syya = mom("a")
    nb, syb, syyb = mom("b")
    ma = float(sya) / float(na)
    mb = float(syb) / float(nb)
    va = float(na * syya - sya * sya) / (float(na) * float(na - 1))
    vb = float(nb * syyb - syb * syb) / (float(nb) * float(nb - 1))
    van, vbn = va / float(na), vb / float(nb)
    se2 = van + vbn
    t = (ma - mb) / math.sqrt(se2)
    dfw = (se2 * se2) / (van * van / float(na - 1)
                         + vbn * vbn / float(nb - 1))
    assert (got.n_a, got.n_b) == (4, 4)
    assert got.mean_a == ma and got.mean_b == mb
    assert got.t_stat == t and got.welch_df == dfw

    # one-row group -> NULL t/df and NULL mean for that side
    one = welch_ttest(rd.from_pandas(df), group_col="g",
                      value_col="v", group_a="a",
                      group_b="missing").to_pandas().iloc[0]
    assert one.n_b == 0 and np.isnan(one.t_stat) and np.isnan(one.mean_b)

    # zero variance both sides -> se2 == 0 -> NULL t
    zz = pd.DataFrame({"g": ["a", "a", "b", "b"],
                       "v": [2.0, 2.0, 2.0, 2.0]})
    z = welch_ttest(rd.from_pandas(zz), group_col="g", value_col="v",
                    group_a="a", group_b="b").to_pandas().iloc[0]
    assert np.isnan(z.t_stat) and np.isnan(z.welch_df)


def test_split_leakage_counts(ray_session):
    """Cross-split shared texts counted per split; same-split dups
    are NOT leaks; distinct-text counting (copies collapse)."""
    import hashlib

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.assembly import split_of
    from fluent_server_ray.stages.hygiene import split_leakage

    # craft ids whose splits differ, then give some of them equal text
    ids = list(range(400))
    splits = split_of(pa.array(ids, type=pa.int64())).to_pylist()
    by_split = {}
    for i, s in zip(ids, splits):
        by_split.setdefault(s, []).append(i)
    assert set(by_split) == {"train", "val", "test"}
    tr, va, te = (by_split["train"], by_split["val"], by_split["test"])
    texts = {i: f"uniq-{i}" for i in ids}
    texts[tr[0]] = texts[va[0]] = "shared-tv"        # train <-> val
    texts[tr[1]] = texts[te[0]] = "shared-tt"        # train <-> test
    texts[tr[2]] = texts[tr[3]] = "dup-in-train"     # NOT a leak
    df = pd.DataFrame({"doc_id": ids,
                       "text": [texts[i] for i in ids]})
    got = split_leakage(rd.from_pandas(df)).to_pandas()
    by = {r.split: (r.n_texts, r.n_leaked) for r in got.itertuples()}
    # train: one distinct text collapses two dup docs
    assert by["train"] == (len(tr) - 1, 2)
    assert by["val"] == (len(va), 1)
    assert by["test"] == (len(te), 1)


def test_doc_keywords_rank_and_ties(ray_session):
    """Top-k per doc with the deterministic (w desc, term asc) rank;
    zero-token docs yield no rows; k larger than vocab keeps all."""
    import math
    from collections import Counter

    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.textstats import doc_keywords

    texts = ["b a a c", "a b", "", "z z z q"]
    df = pd.DataFrame({"doc_id": range(4), "text": texts})
    got = doc_keywords(rd.from_pandas(df), k=2).to_pandas()

    n = 4
    tf = [Counter(t.split()) for t in texts]
    dfc = Counter()
    for c in tf:
        dfc.update(c.keys())
    idf = {t: math.floor(math.log(n / d) * 1_000_000)
           for t, d in dfc.items()}
    want = []
    for i, cnt in enumerate(tf):
        ws = sorted(((c * idf[t], t) for t, c in cnt.items()),
                    key=lambda p: (-p[0], p[1]))
        for r, (w, t) in enumerate(ws[:2], start=1):
            want.append({"doc_id": i, "term": t, "rank": r,
                         "w_millionths": w})
    want = pd.DataFrame(want).sort_values(["doc_id", "rank"]
                                          ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)
    assert 2 not in got.doc_id.values  # empty doc emits nothing


def test_interarrival_gaps_per_key(ray_session):
    """Gaps only within a (user, type) group; first event emits no
    row; within-second ordering cannot change the gap multiset."""
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.windows import interarrival_gaps

    base = pd.Timestamp("2026-01-01")
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2, 3],
        "event_type": ["c", "c", "c", "v", "c", "c", "c"],
        "event_id": [10, 11, 12, 13, 14, 15, 16],
        "ts": [base, base + pd.Timedelta(seconds=5),
               base + pd.Timedelta(seconds=5, microseconds=900_000),
               base + pd.Timedelta(seconds=100),
               base, base + pd.Timedelta(seconds=42),
               base],
    })
    got = (interarrival_gaps(rd.from_pandas(df))
           .to_pandas().sort_values(["event_type", "gap_sec"])
           .reset_index(drop=True))
    # user1/c: secs [0,5,5] -> gaps [5,0]; user1/v: single -> none;
    # user2/c: [0,42] -> [42]; user3/c single -> none
    assert got["gap_sec"].tolist() == [0, 5, 42]
    assert got["event_type"].tolist() == ["c", "c", "c"]


def test_source_vocab_overlap_exact(ray_session):
    """Pairwise top-k word overlap vs a from-scratch counter
    reference, with a tie on counts broken by word asc and k smaller
    than the vocabulary."""
    from collections import Counter

    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.textstats import source_vocab_overlap

    df = pd.DataFrame({
        "doc_id": range(6),
        "source": ["web", "web", "books", "books", "code", None],
        "text": ["the cat sat", "the dog ran", "the cat slept",
                 "a cat a dog", "def foo(): pass", "the end"],
    })
    k = 3
    got = source_vocab_overlap(rd.from_pandas(df), k=k).to_pandas()

    tops = {}
    for src, sub in df.fillna({"source": ""}).groupby("source"):
        c = Counter(w for t in sub.text for w in t.split() if w)
        ranked = sorted(c.items(), key=lambda p: (-p[1], p[0]))[:k]
        tops[src] = {w for w, _ in ranked}
    want = []
    srcs = sorted(tops)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            sh = len(tops[a] & tops[b])
            if sh:
                want.append({"source_a": a, "source_b": b,
                             "n_shared": sh})
    want = pd.DataFrame(want, columns=["source_a", "source_b",
                                       "n_shared"])
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)
    assert len(want) >= 1


def test_dedup_normalized_collapses_trivial_variants(ray_session):
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.dedup import exact_dedup
    from fluent_server_ray.stages.hygiene import normalize_text

    df = pd.DataFrame({
        "doc_id": [5, 2, 3, 4],
        "text": ["Hello  World", "hello world", "  HELLO\tWORLD ",
                 "different"],
    })
    got = (exact_dedup(normalize_text(rd.from_pandas(df)),
                       text_col="text_norm")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.doc_id.tolist() == [2, 4]
    assert got.text_norm.tolist() == ["hello world", "different"]


def test_winnow_pairs_copy_detection(ray_session):
    """A literal copy and a mostly-copied doc score far above
    unrelated docs; threshold filters; counts match a from-scratch
    fingerprint-set reference."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.dedup import winnow_pairs
    from fluent_server_ray.stages.textstats import \
        winnow_fingerprints_batch

    body = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    texts = [body,
             body,                              # exact copy
             body[:60] + " completely new tail content here",
             "utterly unrelated text about databases and engines",
             "another unrelated string with its own words"]
    df = pd.DataFrame({"doc_id": range(5), "text": texts})

    fps = winnow_fingerprints_batch(pa.Table.from_pandas(df))
    sets = {}
    for d, f in zip(fps["doc_id"].to_pylist(), fps["fp"].to_pylist()):
        sets.setdefault(d, set()).add(f)
    want = {}
    for i in range(5):
        for j in range(i + 1, 5):
            sh = len(sets.get(i, set()) & sets.get(j, set()))
            if sh >= 3:
                want[(i, j)] = sh

    got = winnow_pairs(rd.from_pandas(df), min_shared=3).to_pandas()
    got_map = {(a, b): n for a, b, n in
               zip(got.doc_a, got.doc_b, got.n_shared)}
    assert got_map == want
    assert got_map[(0, 1)] == len(sets[0])          # exact copy
    assert got_map[(0, 2)] >= 3                      # partial copy
    assert (3, 4) not in got_map                     # unrelated


def test_robust_outliers_median_mad(ray_session):
    """Outliers vs a from-scratch median/MAD reference (DuckDB median
    semantics: even counts interpolate); zero-MAD group flags
    nothing; NULL value and NULL group rows excluded."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.features import robust_outliers

    df = pd.DataFrame({
        "event_id": range(12),
        "event_type": ["a"] * 7 + ["z"] * 3 + [None, "a"],
        "value": [1.0, 1.1, 0.9, 1.0, 1.05, 0.95, 100.0,
                  5.0, 5.0, 5.0, 7.0, None],
    })
    got = robust_outliers(rd.from_pandas(df), k=3.0).to_pandas()

    def med(v):
        v = sorted(v)
        n = len(v)
        lo, hi = v[(n - 1) // 2], v[n // 2]
        return lo + (hi - lo) * 0.5

    sub = df[(df.event_type == "a") & df.value.notna()]
    m = med(sub.value.tolist())
    ad = (sub.value - m).abs()
    mad = med(ad.tolist())
    want = sub[ad > 3.0 * mad].event_id.tolist()
    assert got.event_id.tolist() == sorted(want)
    assert 6 in got.event_id.tolist()          # the 100.0 spike
    assert not (got.event_type == "z").any()   # MAD == 0 group silent


def test_overlap_dupes_finds_containment_jaccard_misses(ray_session):
    """A 12-word doc quoted inside a 120-word doc: overlap coefficient
    1.0 (containment), Jaccard ~0.1 — the pair exact Jaccard dedup at
    0.8 structurally cannot emit. Also pins the integer-millionths
    contract and the pair orientation (doc_a < doc_b)."""
    import ray.data as rd

    from fluent_server_ray.stages.dedup import (
        ngram_jaccard_dupes,
        overlap_dupes,
    )

    words = [f"tok{i}" for i in range(120)]
    long_doc = " ".join(words)
    short_doc = " ".join(words[50:62])
    other = " ".join(f"zz{i}" for i in range(30))
    docs = pd.DataFrame({
        "doc_id": np.array([7, 3, 9], dtype=np.int64),
        "text": [long_doc, short_doc, other],
    })
    got = overlap_dupes(rd.from_pandas(docs),
                        min_overlap_millionths=900_000).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert (row.doc_a, row.doc_b) == (3, 7)        # a < b
    assert row.overlap_millionths == 1_000_000     # full containment
    assert row.inter == row.na == 10               # 12 words -> 10 shingles
    assert row.nb == 118
    jac = ngram_jaccard_dupes(rd.from_pandas(docs),
                              threshold=0.8).to_pandas()
    assert len(jac) == 0


def test_overlap_dupes_empty_and_no_dup_corpora(ray_session):
    """No-shared-shingle corpora return the typed empty Dataset (the
    0-row to_pandas schema-drop gotcha); empty/whitespace docs are
    excluded rather than dividing by their 0-size set."""
    import ray.data as rd

    from fluent_server_ray.stages.dedup import overlap_dupes

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a b c d e", "f g h i j", "", "   "],
    })
    out = overlap_dupes(rd.from_pandas(docs))
    assert out.count() == 0
    assert out.schema().names == [
        "doc_a", "doc_b", "inter", "na", "nb", "overlap_millionths"]


def test_overlap_dupes_matches_duckdb_sf_small(ray_session):
    """Full operator-vs-oracle parity at sf0.001 (the same compare the
    driver battery runs at sf0.01)."""
    import ray.data as rd

    from fluent_server_ray.stages.dedup import overlap_dupes, overlap_dupes_sql

    ray_df = overlap_dupes(
        rd.read_parquet(f"{SF_SMALL}/documents.parquet",
                        columns=["doc_id", "text"]),
        min_overlap_millionths=800_000,
    ).to_pandas()
    duck_df = _con(SF_SMALL).execute(overlap_dupes_sql(800_000)).df()
    assert len(ray_df) == len(duck_df) > 0
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = duck_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_vocab_novelty_first_seen_only(ray_session):
    """A token re-appearing on a later day must count only on its
    first-seen day; per-day totals count distinct NEW tokens."""
    import ray.data as rd

    from fluent_server_ray.stages.textstats import vocab_novelty

    day = 86_400_000_000  # epoch-us per day
    df = pd.DataFrame({
        "ts": pd.to_datetime(
            np.array([0, 0, 1 * day, 2 * day, 2 * day], dtype="int64"),
            unit="us"),
        "text": ["alpha beta", "beta gamma", "alpha delta",
                 "", "delta epsilon zeta"],
    })
    got = vocab_novelty(rd.from_pandas(df)).to_pandas()
    # day0: alpha beta gamma; day1: delta; day2: epsilon zeta
    assert got.day.tolist() == [0, 1, 2]
    assert got.n_new.tolist() == [3, 1, 2]


def test_shard_plan_rank_ties_and_balance(ray_session):
    """Exact (n_tokens DESC, id ASC) dense ranking on a tie-heavy
    corpus, and the LPT round-robin balance bound: shard token totals
    span at most one dealing round's largest doc."""
    import ray.data as rd

    from fluent_server_ray.stages.assembly import shard_plan

    rng = np.random.default_rng(5)
    n = 200
    lens = rng.integers(1, 30, size=n)  # heavy ties in [1,30)
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [" ".join(["w"] * int(k)) for k in lens],
    })
    got = shard_plan(rd.from_pandas(docs), n_shards=4).to_pandas()
    want = docs.assign(n_tokens=lens).sort_values(
        ["n_tokens", "doc_id"], ascending=[False, True])
    want["rank"] = np.arange(1, n + 1)
    want["shard"] = (want["rank"] - 1) % 4
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want[["doc_id", "n_tokens", "rank", "shard"]],
        check_dtype=False)
    totals = got.groupby("shard").n_tokens.sum()
    assert len(totals) == 4
    assert totals.max() - totals.min() <= int(lens.max())


def test_contingency_chi2_known_table(ray_session):
    """Hand-computed 2x2: groups a/b over tiers 0/1 with counts
    [[30,10],[10,30]] — expected all 20, every contrib (10²)/20 = 5."""
    import ray.data as rd

    from fluent_server_ray.stages.features import contingency_chi2

    rows = ([("a", 50.0)] * 30 + [("a", 150.0)] * 10
            + [("b", 50.0)] * 10 + [("b", 150.0)] * 30)
    df = pd.DataFrame(rows, columns=["event_type", "value"])
    got = contingency_chi2(rd.from_pandas(df), tier_width=100.0,
                           n_tiers=2).to_pandas()
    assert got.n.tolist() == [30, 10, 10, 30]
    assert got.expected.tolist() == [20.0] * 4
    assert got.contrib.tolist() == [5.0] * 4
    assert abs(got.contrib.sum() - 20.0) < 1e-12  # chi2 stat, dof=1


def test_pagerank_quantized_vs_reference(ray_session):
    """Distributed quantized PageRank equals a from-scratch driver
    reference applying the same floor arithmetic round for round, on
    a graph with a hub, a dangling node and weighted edges."""
    import ray.data as rd

    from fluent_server_ray.stages.graph import SCALE, pagerank

    edges = pd.DataFrame({
        "src": ["a", "b", "c", "a", "d"],
        "dst": ["b", "c", "a", "c", "a"],
        "w":   np.array([3, 1, 2, 1, 5], dtype=np.int64),
    })  # 'c' -> a only; no out-edges from... all have out; add dangling
    edges = pd.concat([edges, pd.DataFrame(
        {"src": ["a"], "dst": ["z"], "w": np.array([1], dtype=np.int64)})])
    got = pagerank(rd.from_pandas(edges), n_iters=4,
                   n_buckets=4).to_pandas()

    nodes = sorted(set(edges.src) | set(edges.dst))
    n = len(nodes)
    r = {v: SCALE // n for v in nodes}
    outw = edges.groupby("src").w.sum().to_dict()
    tele = (SCALE * 150) // (1000 * n)
    for _ in range(4):
        inc = {v: 0 for v in nodes}
        for s, d_, w in edges.itertuples(index=False):
            inc[d_] += (r[s] * int(w)) // outw[s]
        r = {v: tele + (850 * inc[v]) // 1000 for v in nodes}
    want = pd.DataFrame({"node": nodes,
                         "rank_billionths": [r[v] for v in nodes]})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)
    # dangling node z keeps teleport-only mass; hub a outranks it
    assert r["z"] == tele + 0 or got.set_index("node").loc["z"].item() >= tele
    assert (got.set_index("node").loc["a", "rank_billionths"]
            > got.set_index("node").loc["z", "rank_billionths"])


def test_packing_efficiency_consistent_with_pack_sequences(ray_session):
    """The report's n_seqs equals the packer's max(seq_id)+1 per
    bucket and fill never exceeds 1.0 — the two operators describe
    the same layout."""
    import ray.data as rd

    from fluent_server_ray.stages.assembly import (
        pack_sequences,
        packing_efficiency,
    )
    from tests.conftest import SF_SMALL

    docs = rd.read_parquet(f"{SF_SMALL}/documents.parquet",
                           columns=["doc_id", "text"])
    rep = packing_efficiency(docs).to_pandas().set_index("bucket")
    packed = pack_sequences(docs).to_pandas()
    per_bucket = packed.groupby("bucket").seq_id.max() + 1
    for b, n_seqs in per_bucket.items():
        assert rep.loc[b, "n_seqs"] == n_seqs
    assert (rep.fill_millionths <= 1_000_000).all()
    assert (rep.fill_millionths > 0).all()


def test_rank_fusion_orders_and_ties(ray_session):
    """RRF ranks: doc strong on both signals tops; ties broken by id;
    rrf equals the two-division tree on exact ranks."""
    import ray.data as rd

    from fluent_server_ray.stages.features import rank_fusion

    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "text": ["abc def ghi jkl",        # high alpha, 4 tokens
                 "1 2 3 4 5 6 7 8",        # zero alpha, 8 tokens
                 "ab cd",                  # low both
                 "ab cd"],                 # tie with 3 -> id breaks
    })
    got = rank_fusion(rd.from_pandas(docs), k=60).to_pandas()
    g = got.set_index("doc_id")
    assert g.loc[1, "rank_alpha"] == 1
    assert g.loc[2, "rank_tokens"] == 1
    assert g.loc[3, "rank_alpha"] == 2 and g.loc[4, "rank_alpha"] == 3
    for _, r in got.iterrows():
        want = 1.0 / (60 + r.rank_alpha) + 1.0 / (60 + r.rank_tokens)
        assert r.rrf == want
    assert g.loc[1, "rrf"] == got.rrf.max()


def test_touch_attribution_window_edges_and_ties(ray_session):
    """Window boundaries inclusive on both ends; ts-tie touches break
    by id (first=min, last=max); out-of-window touches invisible but
    counted correctly; no-touch purchase -> NULLs + 0."""
    import ray.data as rd

    from fluent_server_ray.stages.windows import touch_attribution

    W = 10  # seconds
    us = 1_000_000

    def ev(i, u, ty, sec):
        return {"event_id": i, "user_id": u, "event_type": ty,
                "ts": pd.Timestamp(sec * us * 1000, unit="ns")}

    rows = [
        ev(1, 1, "view", 0),     # exactly ts-W for purchase@10 -> in
        ev(2, 1, "click", 5),
        ev(3, 1, "view", 10),    # tie with purchase ts -> in (last)
        ev(4, 1, "purchase", 10),
        ev(5, 1, "view", 30),    # after purchase@10; ties purchase@30
        ev(6, 2, "purchase", 50),            # user 2: no touches
        ev(7, 3, "view", 100), ev(8, 3, "view", 100),  # ts tie
        ev(9, 3, "purchase", 105),
        ev(10, 1, "view", 21),   # 21 < 30-W=20? no: 21 >= 20 -> in
        ev(11, 1, "purchase", 30),
    ]
    df = pd.DataFrame(rows)
    got = touch_attribution(rd.from_pandas(df), window_sec=W,
                            n_buckets=4).to_pandas().set_index(
        "purchase_id")
    r = got.loc[4]
    assert (r.first_touch_id, r.last_touch_id, r.n_touches) == (1, 3, 3)
    r = got.loc[6]
    assert np.isnan(r.first_touch_id) and np.isnan(r.last_touch_id)
    assert r.first_touch_type is None or pd.isna(r.first_touch_type)
    assert r.n_touches == 0
    r = got.loc[9]
    assert (r.first_touch_id, r.last_touch_id, r.n_touches) == (7, 8, 2)
    r = got.loc[11]  # window [20,30]: view@21 (id10), view@30 (id5)
    assert (r.first_touch_id, r.last_touch_id, r.n_touches) == (10, 5, 2)


def test_daily_ffill_gaps_and_day_close(ray_session):
    """Gap days carry the close forward; a day's close is its last
    event by (ts, id); single-day keys emit one row."""
    import ray.data as rd

    from fluent_server_ray.stages.windows import daily_ffill

    day_us = 86_400_000_000

    def ev(i, u, day_frac, v):
        return {"event_id": i, "user_id": u,
                "ts": pd.Timestamp(int(day_frac * day_us) * 1000,
                                   unit="ns"),
                "value": float(v)}

    df = pd.DataFrame([
        ev(1, 1, 0.2, 10.0), ev(2, 1, 0.9, 11.0),   # day0 close=11
        ev(3, 1, 3.5, 30.0),                         # day3; gap 1,2
        ev(4, 2, 5.1, 99.0),                         # single day
        ev(5, 3, 7.0, 1.0), ev(6, 3, 7.0, 2.0),      # ts tie -> id 6
    ])
    got = daily_ffill(rd.from_pandas(df), n_buckets=4).to_pandas()
    want = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 3],
        "day": [0, 1, 2, 3, 5, 7],
        "value": [11.0, 11.0, 11.0, 30.0, 99.0, 2.0],
    })
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_decayed_counts_recency_beats_volume(ray_session):
    """A tag with 3 events today outranks one with 20 events a week
    ago (20·2^-7 ≈ 0.16 < 3); weights are exact halvings."""
    import ray.data as rd

    from fluent_server_ray.stages.windows import decayed_counts

    day_ns = 86_400_000_000_000
    rows = ([{"tag": "fresh", "ts": pd.Timestamp(7 * day_ns)}] * 3
            + [{"tag": "stale", "ts": pd.Timestamp(0)}] * 20
            + [{"tag": "mid", "ts": pd.Timestamp(6 * day_ns)}] * 4)
    got = decayed_counts(rd.from_pandas(pd.DataFrame(rows))).to_pandas()
    g = got.set_index("tag")
    assert g.loc["fresh", "decayed_millionths"] == 3_000_000
    assert g.loc["mid", "decayed_millionths"] == 4 * 500_000
    assert g.loc["stale", "decayed_millionths"] == 20 * 7812  # floor(1e6/128)
    assert got.tag.tolist() == ["fresh", "mid", "stale"]


def test_source_length_gini_known_values(ray_session):
    """Uniform lengths -> G=0; an extreme 1-vs-rest split approaches
    (n-1)/n; single-doc source -> 0."""
    import ray.data as rd

    from fluent_server_ray.stages.textstats import source_length_gini

    docs = pd.DataFrame({
        "doc_id": np.arange(9, dtype=np.int64),
        "source": ["u"] * 4 + ["x"] * 4 + ["s"],
        "text": ["w w w"] * 4                  # uniform: 3,3,3,3
        + ["w", "w", "w", " ".join(["w"] * 97)]  # skewed: 1,1,1,97
        + ["w w"],                             # single doc
    })
    got = source_length_gini(rd.from_pandas(docs),
                             n_buckets=4).to_pandas().set_index("source")
    assert got.loc["u", "gini"] == 0.0
    assert got.loc["s", "gini"] == 0.0
    # exact: ranks 1,2,3 on the three 1s, 4 on 97
    n, tot, rw = 4, 100, 1 * 1 + 2 * 1 + 3 * 1 + 4 * 97
    want = 2.0 * rw / (n * tot) - (n + 1) / n
    assert abs(got.loc["x", "gini"] - want) < 1e-15
    assert got.loc["x", "gini"] > 0.7


def test_props_audit_conformance_counts(ray_session):
    """Valid/malformed/null payload accounting and min/max/sum over
    valid extractions; a group with no valid payload gets NULL
    min/max."""
    import ray.data as rd

    from fluent_server_ray.stages.fields import props_audit

    df = pd.DataFrame({
        "event_type": ["a", "a", "a", "a", "b", "b"],
        "props": ['{"k": 5}', '{"k": -2}', "oops", None,
                  '{"k": 5, "x": 1}', "{}"],
    })
    got = props_audit(rd.from_pandas(df)).to_pandas().set_index(
        "event_type")
    a = got.loc["a"]
    assert (a.n, a.n_null, a.n_valid) == (4, 1, 2)
    assert (a.k_min, a.k_max, a.k_sum) == (-2, 5, 3)
    b = got.loc["b"]
    assert (b.n, b.n_null, b.n_valid) == (2, 0, 0)
    assert pd.isna(b.k_min) and pd.isna(b.k_max)


def test_chi2_cat_and_dup_degree_shapes(ray_session):
    """Categorical chi2 margins on a hand 2x2; degree histogram over
    a known pair set (one triangle + one isolated pair)."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.features import contingency_chi2_cat

    df = pd.DataFrame({
        "lang": ["en"] * 40 + ["de"] * 40,
        "source": ["a"] * 30 + ["b"] * 10 + ["a"] * 10 + ["b"] * 30,
    })
    got = contingency_chi2_cat(rd.from_pandas(df)).to_pandas()
    assert got.n.tolist() == [10, 30, 30, 10]
    assert got.expected.tolist() == [20.0] * 4
    assert got.contrib.tolist() == [5.0] * 4


def test_distinctive_bigrams_lift_contrast(ray_session):
    """A phrase unique to one source tops its lift list even when a
    corpus-wide phrase has higher raw count; min_count gates noise."""
    import ray.data as rd

    from fluent_server_ray.stages.textstats import (
        source_distinctive_bigrams,
    )

    common = "the cat sat"
    docs = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "source": ["a"] * 4 + ["b"] * 4,
        "text": [f"{common} secret word"] * 4 + [common] * 4,
    })
    got = source_distinctive_bigrams(
        rd.from_pandas(docs), k=5, min_count=3).to_pandas()
    a = got[got.source == "a"]
    # "secret word" and "sat secret" occur only in a: lift = N/n_a
    top = a.iloc[0]
    assert top.pair in ("sat secret", "secret word")
    n_a, n_total = 4 * 4, 4 * 4 + 4 * 2   # bigrams per side
    assert top.lift_millionths == 1_000_000 * 4 * n_total // (n_a * 4)
    # within source a: the corpus-shared bigram lifts below the
    # unique phrase (4·24//(16·8) = 0.75 vs 1.5)
    ai = a.set_index("pair")
    assert ai.loc["the cat", "lift_millionths"] == 750_000
    assert ai.loc["the cat", "lift_millionths"] < top.lift_millionths


def test_pit_window_features_strict_before(ray_session):
    """Events AT the turn's ts are excluded (leakage-safe); the
    window's trailing edge is inclusive; value sums are exact micros."""
    import ray.data as rd

    from fluent_server_ray.stages.windows import pit_window_features

    us = 1_000_000

    def T(sec):
        return pd.Timestamp(sec * us * 1000, unit="ns")

    turns = pd.DataFrame({
        "conv_id": ["conv-7", "conv-7", "conv-8"],
        "turn_idx": np.array([0, 1, 0], dtype=np.int64),
        "user_id": np.array([7, 7, 8], dtype=np.int64),
        "ts": [T(100), T(3700), T(50)],
    })
    events = pd.DataFrame({
        "user_id": np.array([7, 7, 7, 8], dtype=np.int64),
        "event_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "ts": [T(40), T(100), T(3650), T(60)],
        "value": [1.5, 10.0, 2.25, 9.9],
    })
    got = pit_window_features(rd.from_pandas(turns),
                              rd.from_pandas(events), window_sec=3600,
                              n_buckets=4).to_pandas()
    g = got.set_index(["conv_id", "turn_idx"])
    # turn@100: event@40 in, event@100 EXCLUDED (strict before)
    assert g.loc[("conv-7", 0)].tolist() == [1, 1_500_000]
    # turn@3700 window [100, 3700): event@100 in (trailing edge
    # inclusive), event@3650 in, event@40 out
    assert g.loc[("conv-7", 1)].tolist() == [2, 12_250_000]
    # user 8: event@60 after turn@50 -> nothing
    assert g.loc[("conv-8", 0)].tolist() == [0, 0]


def test_weekly_growth_gaps_dont_chain(ray_session):
    """First week NULL; consecutive weeks get (n-prev)/prev; a gap
    week breaks the chain (NULL, not growth vs two weeks ago)."""
    import ray.data as rd

    from fluent_server_ray.stages.windows import weekly_growth

    wk_ns = 7 * 86_400_000_000_000
    rows = ([{"event_type": "a", "ts": pd.Timestamp(0)}] * 4
            + [{"event_type": "a", "ts": pd.Timestamp(wk_ns)}] * 6
            + [{"event_type": "a", "ts": pd.Timestamp(3 * wk_ns)}] * 3)
    got = weekly_growth(rd.from_pandas(pd.DataFrame(rows))).to_pandas()
    assert got.n.tolist() == [4, 6, 3]
    assert pd.isna(got["pct_change"].iloc[0])
    assert got["pct_change"].iloc[1] == 0.5
    assert pd.isna(got["pct_change"].iloc[2])   # week 3 after a gap


def test_overlap_dupes_randomized_vs_bruteforce(ray_session):
    """Seeded random corpora: the bucketed inverted-index plan equals
    a from-scratch brute-force overlap computation — both pair set
    and exact counts — across 3 draws including heavy repetition."""
    import ray.data as rd

    from fluent_server_ray.stages.dedup import overlap_dupes

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> collisions
        n = 24
        texts = [" ".join(rng.choice(vocab,
                                     size=rng.integers(0, 15)))
                 for _ in range(n)]
        docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                             "text": texts})
        tau = 600_000
        got = overlap_dupes(rd.from_pandas(docs),
                            min_overlap_millionths=tau).to_pandas()
        got_set = {(r.doc_a, r.doc_b, r.inter, r.na, r.nb,
                    r.overlap_millionths)
                   for r in got.itertuples(index=False)}

        def shingles(t):
            w = t.split()
            if len(w) < 3:
                return set(w)
            return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

        want = set()
        sh = {i: shingles(t) for i, t in enumerate(texts) if t.strip()}
        for a in sh:
            for b in sh:
                if a >= b:
                    continue
                inter = len(sh[a] & sh[b])
                na, nb = len(sh[a]), len(sh[b])
                ov = 1_000_000 * inter // min(na, nb)
                if ov >= tau:
                    want.add((a, b, inter, na, nb, ov))
        assert got_set == want, f"seed {seed}"


def test_pagerank_randomized_vs_reference(ray_session):
    """Seeded random weighted digraphs (with dangling nodes and
    self-loops): the distributed quantized iteration equals the
    driver reference round for round."""
    import ray.data as rd

    from fluent_server_ray.stages.graph import SCALE, pagerank

    for seed in (3, 4):
        rng = np.random.default_rng(seed)
        nodes = [f"n{i}" for i in range(8)]
        m = 14
        edges = pd.DataFrame({
            "src": rng.choice(nodes, size=m),
            "dst": rng.choice(nodes, size=m),
            "w": rng.integers(1, 9, size=m).astype(np.int64),
        })
        edges = edges.groupby(["src", "dst"], as_index=False).w.sum()
        got = pagerank(rd.from_pandas(edges), n_iters=3,
                       n_buckets=4).to_pandas()
        ns = sorted(set(edges.src) | set(edges.dst))
        n = len(ns)
        r = {v: SCALE // n for v in ns}
        outw = edges.groupby("src").w.sum().to_dict()
        tele = (SCALE * 150) // (1000 * n)
        for _ in range(3):
            inc = {v: 0 for v in ns}
            for s, d_, w in edges.itertuples(index=False):
                inc[d_] += (r[s] * int(w)) // outw[s]
            r = {v: tele + (850 * inc[v]) // 1000 for v in ns}
        want = pd.DataFrame({"node": ns,
                             "rank_billionths": [r[v] for v in ns]})
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                      check_dtype=False)


def test_quarantined_map_isolates_poison_rows(ray_session):
    """A transform that raises on specific rows: clean rows still
    produce output, exactly the poison rows land in quarantine with
    the error string, order-independent; a fully-clean corpus pays
    only a null column."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.robust import (
        good_rows,
        quarantined_map,
        quarantined_rows,
    )

    n = 100
    poison = {13, 14, 77}
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": ["x" * (i % 7 + 1) for i in range(n)]})

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if any(int(i) in poison for i in ids):
            raise ValueError("poison payload")
        import pyarrow.compute as pc
        return pa.table({"doc_id": t["doc_id"],
                         "n_chars": pc.cast(pc.utf8_length(t["text"]),
                                            pa.int64())})

    schema = pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())])
    tagged = quarantined_map(rd.from_pandas(df), fn, schema,
                             id_col="doc_id").materialize()
    good = good_rows(tagged).to_pandas()
    bad = quarantined_rows(tagged, "doc_id").to_pandas()
    assert set(bad.doc_id) == poison
    assert bad._err.str.contains("ValueError: poison payload").all()
    assert set(good.doc_id) == set(range(n)) - poison
    want = {i: (i % 7 + 1) for i in range(n) if i not in poison}
    assert dict(zip(good.doc_id, good.n_chars)) == want


def test_kcenter_sample_vs_bruteforce(ray_session):
    """Distributed farthest-point equals a from-scratch numpy greedy
    on a seeded random corpus: same ids in the same order, same
    selection distances; coverage radius shrinks monotonically."""
    import ray.data as rd

    from fluent_server_ray.stages.similarity import kcenter_sample

    rng = np.random.default_rng(9)
    n, d, k = 60, 8, 7
    m = rng.normal(size=(n, d))
    ids = np.arange(100, 100 + n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids,
                       "embedding": [row.tolist() for row in m]})
    got = kcenter_sample(rd.from_pandas(df), k=k).to_pandas()

    sel = [0]                      # min id = index 0
    mind = ((m - m[0]) ** 2).sum(axis=1)
    want = [(0, 100, 0.0)]
    for r in range(1, k):
        far = np.lexsort((ids, -mind))[0]
        want.append((r, int(ids[far]), float(mind[far])))
        mind = np.minimum(mind, ((m - m[far]) ** 2).sum(axis=1))
        sel.append(far)
    want_df = pd.DataFrame(want, columns=["sel_idx", "vec_id", "dist2"])
    pd.testing.assert_frame_equal(got, want_df, check_dtype=False)
    d2 = got.dist2.to_numpy()[1:]
    assert (np.diff(d2) <= 1e-12).all()   # greedy radii non-increasing
