"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship routed dataset on sf0.001.
``queries()`` — one callable per implemented operator/pipeline
(SURVEY.md §2); each takes ``sf_dir`` and returns a Dataset /
DataFrame / Table.
``oracle_sql()`` — the DuckDB-equivalent SQL for each query (omitted
for genuinely non-SQL-expressible ops → rows-only check).

Ray is initialised by the driver BEFORE this module is imported:
nothing here (or in fluent_server_ray) calls ``ray.init()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

def _pin_block_order() -> None:
    """Driver correctness contract: the battery's value-hash compare is
    row-order-sensitive, and map-stage queries mirror DuckDB's file
    scan order. Ray's streaming executor reorders output bundles by
    default (``preserve_order=False``) — usually in-order at small
    scale, but NOT guaranteed (observed: 16-row blocks swapping under
    contention). Pin it for every battery/oracle consumer of this
    module. bench.py's flagship headline runs before this import, so
    the unordered fast path still serves throughput measurement."""
    try:
        from ray.data import DataContext

        DataContext.get_current().execution_options.preserve_order = True
    except Exception:  # pragma: no cover - DataContext API drift
        pass


_pin_block_order()

from fluent_server_ray import oracle
from fluent_server_ray.sources.pq import read_parquet_clean
from fluent_server_ray.pipelines.flagship import build_routed
from fluent_server_ray.sources.transcripts import read_transcripts
from fluent_server_ray.stages.aggregate import grouped_counts
from fluent_server_ray.stages.parse import apply_parse

PARSE_COLS = [
    "conv_id", "turn_idx", "role", "tool", "text", "parsed_tool",
    "error_code", "msg", "is_heartbeat", "kind", "tag",
]


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return build_routed("/root/testdata/sf0.001")


# ----- flagship pipeline queries (transcripts derived from events) -----

def _q_parse(sf_dir: str):
    return apply_parse(read_transcripts(sf_dir)).select_columns(PARSE_COLS)


def _q_route(sf_dir: str):
    return build_routed(
        sf_dir, columns=["conv_id", "turn_idx", "tag", "tenant", "sink"]
    )


def _q_sink_counts(sf_dir: str):
    cols = ["sink", "role", "tool", "tag"]
    return grouped_counts(build_routed(sf_dir, columns=cols), cols)


def _q_tenant_counts(sf_dir: str):
    return grouped_counts(build_routed(sf_dir, columns=["tenant"]), ["tenant"])


def _q_tenant_counts_salted(sf_dir: str):
    """The hot-key treatment as a driver-checked path: salt the key,
    count per (key, salt) — a two-level exact aggregate whose partials
    for one hot tenant spread over n_salts reducers — then merge the
    salt level out. Same oracle as the unsalted counts (salting never
    changes results)."""
    from fluent_server_ray.stages.aggregate import add_salt

    salted = add_salt(build_routed(sf_dir, columns=["tenant"]), "tenant",
                      n_salts=8)
    two_level = grouped_counts(salted, ["tenant", "_salt"])
    out = two_level.group_by(["tenant"]).aggregate([("n", "sum")])
    return out.rename_columns(["tenant", "n"]).sort_by(
        [("tenant", "ascending")]
    )


def _q_heartbeat_stats(sf_dir: str):
    return grouped_counts(apply_parse(read_transcripts(sf_dir)), ["is_heartbeat"])


def _q_first_turn(sf_dir: str):
    """First turn per conversation under stable (conv_id, turn_idx)
    order — pins the ordering invariant (north rule / reference
    intra-chunk order, defaultreader/reader.go:85-103).

    Combiner-first: each batch collapses to one row per conv (sorted
    batch + Arrow group_by 'first'), then the same min-merge over the
    tiny partials — 'first under an order' is associative, so raw rows
    never shuffle."""
    import pandas as pd
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        t = t.select(["conv_id", "turn_idx", "text"]).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        out = t.group_by("conv_id", use_threads=False).aggregate(
            [("text", "first"), ("turn_idx", "first")]
        )
        return out.rename_columns(["conv_id", "first_text", "first_turn"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("first_turn").head(1)

    return (
        build_routed(sf_dir, columns=["conv_id", "turn_idx", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("conv_id")
        .map_groups(merge, batch_format="pandas")
    )


# ----- training-data ops (documents / embeddings) -----

ANN_QUERY_IDS = [0, 1, 2, 3, 4, 5, 6, 7]
ANN_K = 5
COSINE_DUP_T = 0.42
GREP_INCLUDE = (r"\bspark\b", r"\bmerge\b")
GREP_EXCLUDE = (r"\bvector\b",)
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
# training-mixture declaration: full src0, half src1, 1/4 src2, 5%
# src3, drop everything else (explicit universe)
MIXTURE = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.05}


def _docs(sf_dir: str):
    # the test tables are single small parquet files that Ray reads as
    # ONE block — which would serialize every per-doc stage (signature
    # loops especially) onto one task; real corpora have thousands of
    # natural blocks. Split so doc stages parallelize here too.
    return read_parquet_clean(f"{sf_dir}/documents.parquet",
                              override_num_blocks=32)


def _embs(sf_dir: str):
    return read_parquet_clean(f"{sf_dir}/embeddings.parquet")


def _q_token_counts(sf_dir: str):
    from fluent_server_ray.stages.textstats import apply_doc_stage, token_count_batch

    return apply_doc_stage(_docs(sf_dir), token_count_batch)


def _q_quality(sf_dir: str):
    from fluent_server_ray.stages.textstats import apply_doc_stage, quality_batch

    return apply_doc_stage(_docs(sf_dir), quality_batch)


def _q_langid(sf_dir: str):
    from fluent_server_ray.stages.textstats import apply_doc_stage, langid_batch

    return apply_doc_stage(_docs(sf_dir), langid_batch)


def _q_fingerprint(sf_dir: str):
    from fluent_server_ray.stages.textstats import apply_doc_stage, fingerprint_batch

    return apply_doc_stage(_docs(sf_dir), fingerprint_batch)


def _q_bpe_tokens(sf_dir: str):
    from fluent_server_ray.stages.textstats import apply_doc_stage, bpe_token_count_batch

    return apply_doc_stage(_docs(sf_dir), bpe_token_count_batch)


def _q_winnow(sf_dir: str):
    """Winnowed rolling-hash fingerprints (MOSS scheme) — one row per
    (doc_id, fingerprint). STRICT oracle: the polynomial hash is plain
    modular arithmetic, mirrored bit-for-bit in DuckDB HUGEINT math
    (winnow_fingerprints_sql)."""
    from fluent_server_ray.stages.textstats import (
        apply_doc_stage,
        winnow_fingerprints_batch,
    )

    return apply_doc_stage(_docs(sf_dir), winnow_fingerprints_batch)


def _q_tfidf(sf_dir: str):
    """Per-doc TF-IDF mass (integer-exact millionths contract) — the
    corpus-level df machinery as a driver-checked query."""
    from fluent_server_ray.stages.textstats import doc_tfidf

    return doc_tfidf(_docs(sf_dir))


def _q_dedup_exact(sf_dir: str):
    from fluent_server_ray.stages.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


def _q_dedup_incremental(sf_dir: str):
    """Incremental dedup against a PERSISTED text index (the
    continuous-ingestion shape): the even-doc_id half of the corpus is
    indexed (hive-partitioned distinct text set), the odd half arrives
    as a new shard and anti-joins against it — each shard bucket reads
    ONLY its own index partition."""
    import os
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from fluent_server_ray.stages.dedup import (build_text_index,
                                                dedup_against_index)

    def half(parity: int):
        ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "text"])

        def f(t):
            keep = pc.equal(pc.bit_wise_and(t["doc_id"], 1), parity)
            return t.filter(pc.fill_null(keep, False))

        return ds.map_batches(f, batch_format="pyarrow",
                              zero_copy_batch=True)

    # deterministic scratch path, rebuilt per call (mkdtemp would leak
    # one even-half index per invocation across conformance sweeps)
    idx = os.path.join(
        tempfile.gettempdir(),
        "fsr_txtidx_" + os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(idx, ignore_errors=True)
    build_text_index(half(0), idx, n_parts=16)
    return dedup_against_index(half(1), idx, n_parts=16)


def _q_dedup_incremental_minhash(sf_dir: str):
    """Incremental NEAR-dup detection against a persisted MinHash
    index (the signature-store design): even-doc_id half indexed
    (bands routed by hash part, signatures by id part), odd half
    probes reading ONLY its colliding partitions; pairs verified by
    signature-estimated Jaccard. STRICT oracle on the PAIR SET: with
    the fixed seeds the found (probe, indexed) pairs equal the exact
    cross-half Jaccard-threshold pairs on the test corpora (verified
    sf0.001 + sf0.01), so the exact pair query restricted to
    odd-vs-even ids is the mirror; the est_jaccard VALUE is a
    signature statistic with no SQL form → projected off here, pinned
    in pytest."""
    import os
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from fluent_server_ray.stages.dedup import (build_minhash_index,
                                                near_dups_against_index)

    def half(parity: int):
        ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "text"])

        def f(t):
            keep = pc.equal(pc.bit_wise_and(t["doc_id"], 1), parity)
            return t.filter(pc.fill_null(keep, False))

        return ds.map_batches(f, batch_format="pyarrow",
                              zero_copy_batch=True)

    idx = os.path.join(
        tempfile.gettempdir(),
        "fsr_mhidx_" + os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(idx, ignore_errors=True)
    build_minhash_index(half(0), idx, n_parts=16)
    return near_dups_against_index(half(1), idx,
                                   threshold=0.8).select_columns(
        ["doc_a", "doc_b"]
    )


def _q_dedup_prefix_block(sf_dir: str):
    from fluent_server_ray.stages.dedup import prefix_block_dupes

    return prefix_block_dupes(_docs(sf_dir))


def _q_dedup_minhash(sf_dir: str):
    """MinHash+LSH near-dup pairs, candidates verified IN-CLUSTER with
    true shingle-set Jaccard (texts ship for candidate ids only; the
    corpus never materializes on the driver). STRICT oracle: the
    in-cluster verify makes precision exactly 1, and with the fixed
    permutation seeds the banded-LSH recall is DETERMINISTIC — on the
    test corpora the found set equals the exact Jaccard-threshold set
    (verified at sf0.001 + sf0.01), so the exact all-pairs DuckDB
    list-algebra query is a valid oracle. At open-corpus scale recall
    is < 1 by design; that property stays pinned in pytest. Returns a
    Dataset — the pair set itself stays in the object store."""
    from fluent_server_ray.stages.dedup import minhash_near_dupes

    return minhash_near_dupes(_docs(sf_dir)).select_columns(
        ["doc_a", "doc_b"]
    )


def _q_dedup_simhash(sf_dir: str):
    from fluent_server_ray.stages.dedup import simhash_signatures

    return simhash_signatures(_docs(sf_dir))


def _q_dedup_simhash_pairs(sf_dir: str):
    """SimHash hamming-ball near-dup pairs (pigeonhole blocks, exact
    in-group verify). STRICT oracle: the md5-derived word-hash family
    is SQL-reproducible (``md5_number_upper``), and pigeonhole
    blocking has recall 1 for max_hamming < n_blocks with exact
    verification — so the blocked pair set EQUALS the oracle's
    all-pairs hamming scan on the test corpora."""
    from fluent_server_ray.stages.dedup import simhash_near_dupes

    return simhash_near_dupes(_docs(sf_dir), max_hamming=3, n_blocks=4)


def _q_dedup_ngram_jaccard(sf_dir: str):
    """EXACT all-pairs 3-word-shingle Jaccard (block-cross-product) —
    oracle-checked against DuckDB list algebra."""
    from fluent_server_ray.stages.dedup import ngram_jaccard_dupes

    return ngram_jaccard_dupes(_docs(sf_dir), threshold=0.8)


def _q_dedup_containment(sf_dir: str):
    """Asymmetric containment near-dup (3-shingle OVERLAP COEFFICIENT
    ≥ 0.8) via the inverted-index bucket plan — finds short-in-long
    subsumption that Jaccard structurally misses; int64-exact
    millionths end to end."""
    from fluent_server_ray.stages.dedup import overlap_dupes

    return overlap_dupes(_docs(sf_dir), min_overlap_millionths=800_000)


def _q_dedup_clusters(sf_dir: str):
    """Near-dup CLUSTERS: connected components (distributed hash-min
    label propagation) over the exact n-gram-Jaccard pair set — the
    keep-one-per-component corpus-dedup rule. Oracle: recursive-CTE
    transitive closure over the same SQL pair query."""
    from fluent_server_ray.stages.dedup import (
        ngram_jaccard_dupes,
        pair_components,
    )

    pairs = ngram_jaccard_dupes(_docs(sf_dir), threshold=0.8)
    return pair_components(pairs)


def _q_dedup_keep_best(sf_dir: str):
    """Near-dup CANONICALIZATION: one representative per duplicate
    component — the LONGEST doc wins (ties → smallest id), singletons
    kept as their own component. The keep-the-best-copy curation rule
    applied after clustering."""
    from fluent_server_ray.stages.dedup import (
        keep_best_per_component,
        ngram_jaccard_dupes,
        pair_components,
    )

    docs = _docs(sf_dir)
    comps = pair_components(ngram_jaccard_dupes(docs, threshold=0.8))
    return keep_best_per_component(docs, comps)


def _q_ann(sf_dir: str):
    from fluent_server_ray.stages.similarity import ann_topk

    return ann_topk(_embs(sf_dir), ANN_QUERY_IDS, k=ANN_K)


def _q_ivf(sf_dir: str):
    """IVF (k-means coarse quantizer) approximate top-k — the ANN scale
    path; recall<1 by design (measured 0.825 at n_probe=8/16 on the
    test corpus) → rows-only check; recall pinned vs brute force in
    tests."""
    from fluent_server_ray.stages.similarity import ivf_topk

    return ivf_topk(_embs(sf_dir), ANN_QUERY_IDS, k=ANN_K,
                    n_centroids=16, n_probe=8)


def _q_ann_ivf_exact(sf_dir: str):
    """IVF with ``n_probe = n_centroids`` — every query probes every
    inverted list, so the plan degenerates to exact brute force and the
    brute-force SQL oracle applies STRICTLY (the driver row that pins
    the IVF scoring/merge kernel; the pruned ``ann_ivf_topk`` variant
    stays rows-only with pytest-pinned recall)."""
    from fluent_server_ray.stages.similarity import ivf_topk

    return ivf_topk(_embs(sf_dir), ANN_QUERY_IDS, k=ANN_K,
                    n_centroids=16, n_probe=16)


def _q_kmeans_assign_fixed(sf_dir: str):
    """One spherical-k-means assignment step from pinned corpus
    centroids (vec_ids 0..7) — strict-oracle coverage for the
    distance/argmax kernel the iterative kmeans_fit reuses."""
    from fluent_server_ray.stages.similarity import kmeans_assign_fixed

    return kmeans_assign_fixed(_embs(sf_dir), centroid_ids=tuple(range(8)))


def _q_embedding_kmeans(sf_dir: str):
    """Distributed spherical k-means over the embedding corpus
    (cluster-composition summary): driver-side init on a deterministic
    bottom-k hash sample, Lloyd rounds as map_batches partial-sum
    passes (k×d per block) with broadcast centroids — the corpus never
    lands on the driver. Rows-only (iterative, not SQL-expressible);
    blob-recovery + bit-determinism pinned in pytest."""
    from fluent_server_ray.stages.similarity import kmeans_cluster_sizes

    return kmeans_cluster_sizes(_embs(sf_dir), n_clusters=8, n_iter=3)


def _q_embedding_balanced(sf_dir: str):
    """Cluster-balanced sample: k-means fit + broadcast-centroid
    assignment + per-cluster md5-rank quota (≤25/cluster) — semantic
    diversity balancing. Rows-only (k-means); exact-cap + determinism
    pinned in pytest."""
    from fluent_server_ray.stages.similarity import cluster_balanced_sample

    return cluster_balanced_sample(_embs(sf_dir), n_clusters=8, cap=25,
                                   n_iter=3)


def _q_embedding_dupes(sf_dir: str):
    """Embedding near-dup pairs via the bucketed multi-table-LSH scale
    path (exact in-bucket verification → precision 1; recall ≈ 1 at the
    tuned plane/table counts, so the exact SQL oracle still matches).
    The exact all-pairs path survives only in tests as the recall
    baseline."""
    from fluent_server_ray.stages.similarity import cosine_dupes

    return cosine_dupes(_embs(sf_dir), threshold=COSINE_DUP_T, exact=False)


def _q_embedding_dup_clusters(sf_dir: str):
    """Connected components over the embedding near-dup pair graph
    (cosine >= t), labels = min vec_id per component — the
    keep-one-per-cluster rule on the EMBEDDING side. The LSH pair
    recall ≈ 1 at the tuned defaults, so the recursive-CTE closure
    over the exact SQL pair query is the oracle."""
    from fluent_server_ray.stages.dedup import pair_components
    from fluent_server_ray.stages.similarity import cosine_dupes

    pairs = cosine_dupes(_embs(sf_dir), threshold=COSINE_DUP_T, exact=False)

    def rename(t):
        import pyarrow as pa

        return pa.table({"doc_a": t["vec_a"], "doc_b": t["vec_b"]})

    comp = pair_components(
        pairs.map_batches(rename, batch_format="pyarrow",
                          zero_copy_batch=True)
    )

    def out_names(t):
        import pyarrow as pa

        return pa.table({"vec_id": t["doc_id"], "component": t["component"]})

    return comp.map_batches(out_names, batch_format="pyarrow",
                            zero_copy_batch=True)


def _embedding_dup_clusters_sql() -> str:
    from fluent_server_ray.stages import dedup, similarity

    pair_sql = (
        "SELECT vec_a AS doc_a, vec_b AS doc_b FROM ("
        + similarity.cosine_dupes_sql(COSINE_DUP_T)
        + ") p"
    )
    base = dedup.pair_components_sql(pair_sql)
    return (
        "SELECT doc_id AS vec_id, component FROM (" + base.replace(
            "ORDER BY doc_id", ""
        ) + ") c ORDER BY vec_id"
    )


def _q_multimodal(sf_dir: str):
    from fluent_server_ray.stages.multimodal import decode_documents

    return decode_documents(_docs(sf_dir)).select_columns(
        ["doc_id", "n_bytes", "width", "height"]
    )


def _q_resize(sf_dir: str):
    from fluent_server_ray.stages.enrich import pool_limits
    from fluent_server_ray.stages.multimodal import ResizeStub, decode_documents

    return decode_documents(_docs(sf_dir)).map_batches(
        ResizeStub, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=256, concurrency=pool_limits(),
    )


def _q_frames(sf_dir: str):
    from fluent_server_ray.stages.enrich import pool_limits
    from fluent_server_ray.stages.multimodal import FrameSampleStub

    return _docs(sf_dir).map_batches(
        FrameSampleStub, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=256, concurrency=pool_limits(),
    )


def _q_embed_stub(sf_dir: str):
    """Multimodal feature-extract stub: payload → deterministic fake
    embedding (md5-derived unit vector, actor-pool batch inference
    shape). STRICT oracle: the value function is SQL-reproducible
    (``multimodal.embed_stub_sql``), compared in LONG form
    (doc_id, dim, v) so every component is checked."""
    import numpy as np
    import pyarrow as pa

    from fluent_server_ray.stages.enrich import pool_limits
    from fluent_server_ray.stages.multimodal import EmbedStub

    wide = _docs(sf_dir).map_batches(
        EmbedStub, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=256, concurrency=pool_limits(),
    )

    def long_form(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        n = len(t)
        d = len(flat) // max(n, 1) if n else 0
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "v": pa.array(flat, type=pa.float64()),
        })

    return wide.map_batches(long_form, batch_format="pyarrow",
                            zero_copy_batch=True).sort(["doc_id", "dim"])


# ----- windowed / relational -----

def _q_sessionize(sf_dir: str):
    import ray.data as rd

    from fluent_server_ray.stages.windows import sessionize

    return sessionize(read_parquet_clean(f"{sf_dir}/events.parquet"))


def _q_asof(sf_dir: str):
    import ray.data as rd

    from fluent_server_ray.stages.windows import asof_prior_event

    return asof_prior_event(read_parquet_clean(f"{sf_dir}/events.parquet"))


def _q_asof_next(sf_dir: str):
    """Forward as-of with tolerance: earliest click at-or-after each
    error within 30 min, per user (one key-bucket exchange + one
    merge_asof(by=) per bucket)."""
    from fluent_server_ray.stages.windows import asof_next_event

    return asof_next_event(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "user_id", "ts",
                                    "event_type"])
    )


def _q_tumbling(sf_dir: str):
    import ray.data as rd

    from fluent_server_ray.stages.windows import tumbling_counts

    return tumbling_counts(
        read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    )


def _q_sliding(sf_dir: str):
    import ray.data as rd

    from fluent_server_ray.stages.windows import sliding_counts

    return sliding_counts(
        read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    )


RANGE_JOIN_HALF_WIDTH_S = 3600


def _q_range_join(sf_dir: str):
    """Keyed range join: each click matched to the ±1 h windows
    around the same user's purchases (one co-located shuffle,
    searchsorted in-bucket matching — never an E×W expansion)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from fluent_server_ray.stages.windows import range_join

    half = pa.scalar(RANGE_JOIN_HALF_WIDTH_S * 1_000_000,
                     type=pa.duration("us"))
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type", "ts"])

    def clicks(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "click"))
        return t.select(["event_id", "user_id", "ts"])

    def windows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table(
            {
                "win_id": t["event_id"],
                "user_id": t["user_id"],
                "lo": pc.subtract(t["ts"], half),
                "hi": pc.add(t["ts"], half),
            }
        )

    left = ev.map_batches(clicks, batch_format="pyarrow", zero_copy_batch=True)
    right = ev.map_batches(windows, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = range_join(left, right, key_col="user_id")
    return out.select_columns(["event_id", "win_id"])


def _range_join_sql() -> str:
    w = RANGE_JOIN_HALF_WIDTH_S
    return f"""
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), win AS (
  SELECT event_id AS win_id, user_id,
         ts - INTERVAL {w} SECOND AS lo, ts + INTERVAL {w} SECOND AS hi
  FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, w.win_id
FROM clicks c JOIN win w
  ON c.user_id = w.user_id AND c.ts >= w.lo AND c.ts < w.hi
""".strip()


def _q_tumbling_value_agg(sf_dir: str):
    """Windowed VALUE aggregate (beyond counts): per (event_type,
    tumbling hour) sum/mean of cents — window id as a row-wise column,
    then the generic combiner-first grouped_agg."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from fluent_server_ray.pipelines.relational import _cents
    from fluent_server_ray.stages.aggregate import grouped_agg

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        secs = pc.divide(us, 1_000_000)  # unit-canonical, cf. windows.py
        win = pc.multiply(pc.divide(secs, 3600), 3600)
        return pa.table(
            {"event_type": t["event_type"], "window_start": win,
             "value_cents": _cents(t["value"])}
        )

    return grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "window_start"],
        [("value_cents", "sum"), ("value_cents", "mean")],
    )


def _tumbling_value_agg_sql() -> str:
    return """
WITH prep AS (
  SELECT event_type,
    ((epoch_us(ts) // 1000000) // 3600) * 3600 AS window_start,
    CAST(round(value * 100.0) AS BIGINT) AS c
  FROM events
)
SELECT event_type, window_start,
  CAST(sum(c) AS BIGINT) AS value_cents_sum,
  CAST(sum(c) AS DOUBLE) / count(c) AS value_cents_mean
FROM prep GROUP BY event_type, window_start
ORDER BY event_type, window_start
""".strip()


def _q_late_flags(sf_dir: str):
    """Watermark late-data flagging (max event time − 30 min; the
    late-arrival handling the reference lacks, SURVEY §2.10): per-batch
    max combiner → one broadcast scalar → pure vectorized flag."""
    from fluent_server_ray.stages.windows import late_flags

    return late_flags(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "ts"])
    )


def _q_semi_join(sf_dir: str):
    """Semi join (existence filter, no join expansion): customers with
    at least one high-value order — distinct-key broadcast + one
    vectorized is_in per batch."""
    from fluent_server_ray.pipelines import relational as rel

    return rel.customers_with_orders(sf_dir)


def _q_customer_profile(sf_dir: str):
    """LEFT OUTER bucketed hash join: every customer + order count /
    total spend, no-order customers kept with NULL stats (fill-side
    float64 per joins.canonical_dtype_map; oracle casts to match)."""
    from fluent_server_ray.pipelines import relational as rel

    return rel.customer_order_profile(sf_dir)


def _q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: two chained bucketed hash joins (custkey then
    orderkey exchange, filters pushed to the reads), per-order revenue
    through the distributed grouped_agg merge, block-local top-k +
    O(blocks·k) driver merge."""
    from fluent_server_ray.pipelines import relational as rel

    return rel.shipping_priority(sf_dir)


def _q_rollup_orders(sf_dir: str):
    """GROUP BY ROLLUP in one input pass: finest-level combiner counts,
    coarser levels re-aggregated from the bounded partial table."""
    from fluent_server_ray.pipelines import relational as rel

    return rel.rollup_order_counts(sf_dir)


def _q_cms_event_counts(sf_dir: str):
    """Count-min sketch point estimates per event type (mergeable
    depth×width matrix, per-block partials). STRICT oracle: with 5
    distinct keys in a depth×width sketch the estimate is exactly the
    true count unless one key collides with another in EVERY depth row
    (width ≫ keys ⇒ structurally impossible here, and deterministic —
    fixed SipHash row keys), so plain ``count(*) GROUP BY`` is the
    oracle. The ≥-exact overestimate bound on ADVERSARIAL key spaces
    stays pinned in pytest."""
    import pyarrow as pa

    from fluent_server_ray.stages.sketches import cms_build, cms_query

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type"])
    sketch = cms_build(ds, "event_type")
    keys = ["click", "error", "purchase", "signup", "view"]
    est = cms_query(sketch, keys)
    return pa.table(
        {"event_type": pa.array(keys, type=pa.string()),
         "est_n": pa.array(est, type=pa.int64())}
    )


def _q_vocab(sf_dir: str):
    """Corpus vocabulary top-100: per-batch explode + local count
    combiner, one word-bucket exchange, per-bucket top-k, O(buckets*k)
    driver merge — never a global sort."""
    from fluent_server_ray.stages.textstats import vocab_top_words

    return vocab_top_words(_docs(sf_dir))


def _q_weighted_sample(sf_dir: str):
    """Quality-weighted deterministic downsampling: keep-prob =
    min(n_chars, 511)/512 via md5-first-byte coin vs per-row threshold
    (pure map, no shuffle; 1/256 quantization contract)."""
    from fluent_server_ray.stages.sampling import weighted_sample

    return weighted_sample(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    )


def _q_extract_props(sf_dir: str):
    """Structured field extraction from JSON props strings — the
    fluentd parser-filter analog (one vectorized Arrow extract_regex
    kernel per field, no row loop, no shuffle)."""
    from fluent_server_ray.stages.fields import extract_fields

    return extract_fields(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "props"])
    )


def _q_grep_filter(sf_dir: str):
    """fluentd ``filter_grep`` analog: AND-of-includes,
    NOT-any-exclude regex row filter (one vectorized
    ``match_substring_regex`` per pattern, no shuffle; RE2 patterns
    shared verbatim with the DuckDB mirror)."""
    from fluent_server_ray.stages.fields import grep_filter

    return grep_filter(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]),
        include=GREP_INCLUDE, exclude=GREP_EXCLUDE,
    )


def _q_chunk_windows(sf_dir: str):
    """Sliding-window document chunking (flat-map explode; one
    vectorized list_slice+join per start offset, no shuffle)."""
    from fluent_server_ray.stages.assembly import chunk_windows

    return chunk_windows(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    )


def _q_user_pivot(sf_dir: str):
    """Per-user event-type crosstab (declared-width pivot; indicator
    columns + grouped_agg combiner, distributed final merge)."""
    from fluent_server_ray.stages.features import pivot_counts

    return pivot_counts(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type"]),
        "user_id", "event_type", EVENT_TYPES,
    )


def _q_value_zscore(sf_dir: str):
    """Global z-score standardization of event value (two passes:
    exact integer moments combiner → broadcast-scalar map; bit-exact
    float contract vs the SQL mirror)."""
    from fluent_server_ray.stages.features import zscore

    return zscore(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "value"])
    )


def _q_docs_above_median(sf_dir: str):
    """Percentile-threshold curation gate: keep docs at/above the
    corpus median token count (histogram-sketch quantile broadcast
    into a pure filter; integer-exact threshold rule)."""
    from fluent_server_ray.stages.textstats import token_filter_above_quantile

    return token_filter_above_quantile(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    )


RETAG_RULES = [
    (r"^tool\.assistant\.(\w+)", r"hot.\1"),
    (r"^err\.", "errors.all"),
]


def _q_pseudonymize(sf_dir: str):
    """Salted sha256 pseudonymization of the conversation id over the
    live transcript stream (fluent-plugin-anonymizer / GDPR shape):
    joins and groupbys on conv_id keep working, the raw id is gone.
    Vectorized factorize-then-scatter; digest loop is per-DISTINCT-id,
    not per-row."""
    from fluent_server_ray.stages.hygiene import pseudonymize

    ds = read_transcripts(sf_dir,
                          columns=["conv_id", "turn_idx", "role"])
    return pseudonymize(ds, cols=("conv_id",)).sort(
        ["conv_id", "turn_idx"])


def _q_throttle(sf_dir: str):
    """fluentd throttle: at most 5 events per (event_type, 10-minute
    tumbling window), deterministic first-by-(ts, id); one key-bucket
    exchange + per-bucket vectorized rank."""
    from fluent_server_ray.stages.windows import throttle

    return throttle(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "event_type", "ts"])
    )


def _q_retag(sf_dir: str):
    """fluentd rewrite_tag_filter over the routed transcripts:
    first-matching RE2 rule rewrites the tag (\\1 backrefs), others
    pass through — pure map after the flagship route stage."""
    from fluent_server_ray.pipelines.flagship import build_routed
    from fluent_server_ray.stages.route import retag

    routed = build_routed(sf_dir, columns=["conv_id", "turn_idx", "tag"])
    return retag(routed, RETAG_RULES)


def _q_multiline(sf_dir: str):
    """fluent-plugin-concat: ERR- continuation turns merge into their
    nearest earlier leader within the conversation (multiline-log
    reassembly; one conv bucket exchange + segmented cumsum)."""
    from fluent_server_ray.stages.assembly import concat_multiline

    return concat_multiline(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"])
    )


def _q_trending_tags(sf_dir: str):
    """Trending tags: top-3 tags per tumbling hour over the routed
    stream — grouped-count combiner partials merged distributedly,
    per-window rank via one window bucket exchange."""
    from fluent_server_ray.pipelines.flagship import build_routed
    from fluent_server_ray.stages.windows import window_topk

    routed = build_routed(sf_dir, columns=["tag", "ts"])
    return window_topk(routed, key_col="tag", k=3)


COPY_ROUTES = [
    ("tool.**", "tools_copy"),
    ("*.*.search", "search_copy"),  # overlaps tool.** on search calls
    ("err.**", "errors_copy"),
]


def _q_copy_route(sf_dir: str):
    """fluentd copy-output fan-out: one row per (turn, MATCHING route)
    — tool.search turns land in BOTH tools_copy and search_copy;
    unmatched tags fall through once."""
    from fluent_server_ray.pipelines.flagship import build_routed
    from fluent_server_ray.stages.route import copy_route

    routed = build_routed(sf_dir, columns=["conv_id", "turn_idx", "tag"])
    return copy_route(routed, COPY_ROUTES)


def _q_suppress(sf_dir: str):
    """fluent-plugin-suppress: drop a turn whose text repeats any of
    the previous 3 turns' texts in its conversation (flood control;
    one conv bucket exchange + vectorized lag compares)."""
    from fluent_server_ray.stages.assembly import suppress

    return suppress(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"])
    )


def _q_bigram_top(sf_dir: str):
    """Top-100 adjacent word pairs (collocations / BPE merge
    candidates): pair-forming explode (one shifted self-join of the
    flat token array, doc-boundary masked) + local count combiner →
    one pair-bucket exchange → per-bucket top-k → O(buckets·k)
    driver merge."""
    from fluent_server_ray.stages.textstats import bigram_top

    return bigram_top(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    )


def _q_token_ids(sf_dir: str):
    """Tokenizer build→apply composite: top-20 vocabulary (bounded,
    lands on the driver by construction) broadcast into the encode
    map — one index_in over the flat token array, segmented re-join
    to per-doc id CSV; OOV → -1 (exercised: the corpus has more than
    20 distinct words)."""
    from fluent_server_ray.stages.textstats import (encode_with_vocab,
                                                    vocab_top_words)

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    vocab = vocab_top_words(ds, k=20)["word"].to_pylist()
    return encode_with_vocab(ds, vocab)


def _q_pct_rank(sf_dir: str):
    """Per-row percentile rank vs the global value distribution
    (additive histogram pass → broadcast cumulative vector → pure
    map; two exact ints per row feed one IEEE division — bit-exact
    vs the SQL mirror)."""
    from fluent_server_ray.stages.features import percentile_rank

    return percentile_rank(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "value"])
    )


def _q_word_postings(sf_dir: str):
    """Inverted-index build: distinct (word, doc) combiner → one
    word-bucket exchange → per-bucket sorted collect; stop-word-sized
    posting lists capped to NULL (max_docs=400), exact counts kept.
    Returns a Dataset — the index never lands on the driver."""
    from fluent_server_ray.stages.textstats import word_postings

    return word_postings(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]),
        max_docs=400,
    )


def _q_zscore_by_type(sf_dir: str):
    """Per-group z-score: exact integer moment partials per
    (block, group) merged on the driver, (mean, std) vectors broadcast
    into a map-side index_in/take lookup — no row shuffle."""
    from fluent_server_ray.stages.features import grouped_zscore

    return grouped_zscore(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "event_type", "value"])
    )


def _q_mixture_sample(sf_dir: str):
    """Deterministic training-mixture sampling: per-source keep
    fraction via the md5-first-byte coin (pure map, no shuffle)."""
    from fluent_server_ray.stages.sampling import mixture_sample

    return mixture_sample(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"]),
        MIXTURE,
    )


def _q_per_source_cap(sf_dir: str):
    """Quota sampling: at most 10 documents per source, deterministic
    md5 rank — the domain-balancing curation step (one bucket exchange
    of (id, key) only)."""
    from fluent_server_ray.stages.sampling import per_key_cap

    return per_key_cap(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])
    )


def _q_corpus_shuffle(sf_dir: str):
    """Deterministic global training-order shuffle: distributed
    range-sort on md5(doc_id) — seedless, engine-independent
    permutation; only (id, skey) move through the exchange."""
    from fluent_server_ray.stages.sampling import shuffle_order

    return shuffle_order(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    )


def _q_sample_bottomk(sf_dir: str):
    """Deterministic uniform bottom-k corpus sample (k smallest
    md5(id)): per-block bottom-k partials, O(blocks·k) driver merge —
    no shuffle."""
    from fluent_server_ray.stages.sampling import bottomk_sample

    return bottomk_sample(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    )


def _q_funnel(sf_dir: str):
    """signup→purchase conversion funnel within 24 h: pushed
    two-type read filter + one bucket exchange on user_id +
    whole-bucket pandas kernels."""
    import pyarrow.dataset as pads

    from fluent_server_ray.stages.windows import funnel

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts"],
        filter=pads.field("event_type").isin(["signup", "purchase"]),
        filter_refs=["event_type"],
    )
    return funnel(ds)


def _q_window_distinct(sf_dir: str):
    """Exact distinct users per hourly window: per-batch pair dedup →
    one bucketed distinct → bounded per-window combiner counts."""
    from fluent_server_ray.stages.windows import window_distinct_users

    return window_distinct_users(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts"])
    )


def _q_approx_distinct(sf_dir: str):
    """Distinct-user cardinality, strict-checkable form: the EXACT
    distributed two-level distinct (the 100 TB path — only distinct
    values shuffle) next to the HLL sketch estimate validated inside
    its error envelope (p=12 ⇒ σ = 1.04/√4096 ≈ 1.6%; the 5% gate is
    3σ, and with a fixed hash + fixed data the estimate is
    deterministic, so the flag can never flap). The raw HLL estimate
    itself is probabilistic → pinned in pytest, not SQL."""
    import pyarrow as pa

    from fluent_server_ray.stages.sketches import (
        approx_distinct,
        exact_distinct_count,
    )

    def ds():
        return read_parquet_clean(f"{sf_dir}/events.parquet",
                                  columns=["user_id"])

    est = approx_distinct(ds(), "user_id")
    exact = exact_distinct_count(ds(), "user_id")
    ok = exact > 0 and abs(est - exact) / exact <= 0.05
    return pa.table({
        "n_users": pa.array([exact], type=pa.int64()),
        "hll_ok": pa.array([ok], type=pa.bool_()),
    })


def _q_anti_join_bloom(sf_dir: str):
    """The big-key-set anti-join path: Bloom broadcast + definite-negative
    short-circuit + exact residual check. Same oracle as the exact path
    (the Bloom never changes the result, only what ships)."""
    from fluent_server_ray.pipelines import relational as rel

    return rel.customers_without_orders(sf_dir, use_bloom=True)


def _q_ivf_persisted(sf_dir: str):
    """Persisted-IVF ANN: build the centroid-partitioned index under
    /tmp, then answer the standard query batch reading ONLY probed
    lists (rows-only check; parity with in-stream IVF and the pruning
    itself are pinned in tests)."""
    import os
    import shutil

    import numpy as np
    import pyarrow.parquet as pq

    from fluent_server_ray.stages.similarity import (
        _batch_matrix,
        ivf_build,
        ivf_search,
    )

    index_dir = f"/tmp/fsr_ivf_index/{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(index_dir, ignore_errors=True)
    ivf_build(_embs(sf_dir), index_dir, n_centroids=16)
    tab = pq.read_table(f"{sf_dir}/embeddings.parquet")
    mask = np.isin(tab["vec_id"].to_numpy(), ANN_QUERY_IDS)
    qtab = tab.filter(mask)
    order = np.argsort(qtab["vec_id"].to_numpy())
    qmat = _batch_matrix(qtab)[order]
    return ivf_search(index_dir, ANN_QUERY_IDS, qmat, k=ANN_K, n_probe=8)


def _q_curation(sf_dir: str):
    """Composite curation chain (dedup → quality gate → deterministic
    sample) as one lazy Dataset graph, oracle-checked END-TO-END."""
    from fluent_server_ray.pipelines.curation import curate_documents

    return curate_documents(_docs(sf_dir))


def _q_curation_near_dedup(sf_dir: str):
    """The full large-crawl curation chain: quality gate → exact dedup
    → MinHash near-dup pairs → connected components → keep min-id per
    component. STRICT oracle: MinHash candidate generation is
    pair-local (two docs share a band bucket or not, independent of
    the rest of the corpus), so the corpus-level found-set == exact-set
    equality that `dedup_minhash` pins carries over to the gated
    survivor subset — the mirror runs the exact pair query + recursive
    closure over the same gate+dedup CTEs."""
    from fluent_server_ray.pipelines.curation import (
        curate_documents_near_dedup,
    )

    return curate_documents_near_dedup(_docs(sf_dir))


def _q_cdc_chunks(sf_dir: str):
    """Content-defined chunking of the multimodal binary payloads —
    one row per (doc, chunk) with offset/length/md5. STRICT oracle:
    the gear rolling hash is modular arithmetic (cut test reads only
    the low mask bits → 6 window lags) and the min/max boundary walk
    is a recursive CTE (`cdc.cdc_chunks_sql`); insertion-shift
    robustness and reassembly stay pinned in tests."""
    from fluent_server_ray.stages.cdc import cdc_chunks
    from fluent_server_ray.stages.multimodal import attach_payload

    payloads = _docs(sf_dir).map_batches(
        attach_payload, batch_format="pyarrow", zero_copy_batch=True
    )
    return cdc_chunks(payloads)


def _q_sample_convs(sf_dir: str):
    """Deterministic conversation-stratified sample (~25% of convs, all
    turns of a kept conv together) — md5-rule exactly mirrored in SQL."""
    from fluent_server_ray.stages.sampling import sample_by_key

    return sample_by_key(
        read_transcripts(sf_dir), "conv_id", hex_threshold="40"
    ).select_columns(["conv_id", "turn_idx", "text"])


def _sample_convs_sql() -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE
    from fluent_server_ray.stages.sampling import sample_by_key_sql_predicate

    return (
        "WITH " + TRANSCRIPTS_SQL_CTE
        + "\nSELECT conv_id, turn_idx, text FROM transcripts WHERE "
        + sample_by_key_sql_predicate("conv_id", "40")
    )


# ----- hygiene (scrub / repetition / decontamination) -----

def _q_doc_pii_scrub(sf_dir: str):
    """PII masking over documents (emails / IPs / phone numbers):
    sequential RE2 redaction + per-pattern match counts; exact nested
    regexp_replace oracle. (The synthetic corpus carries no PII — the
    parity is exact on zero redactions; injected-PII behavior is
    pinned in pytest.)"""
    from fluent_server_ray.stages.hygiene import scrub

    return scrub(_docs(sf_dir))


def _q_scrub_uids(sf_dir: str):
    """Log pseudonymization over transcript turns: mask ``user=<uid>``
    and ``ERR-<nnn>`` (both occur in the flagship text templates, so
    the scrub is non-trivially exercised at driver scale)."""
    from fluent_server_ray.stages.hygiene import SCRUB_LOG, scrub

    return scrub(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"]),
        patterns=SCRUB_LOG, id_cols=("conv_id", "turn_idx"),
    )


def _scrub_uids_sql() -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE
    from fluent_server_ray.stages.hygiene import SCRUB_LOG, scrub_sql

    return (
        "WITH " + TRANSCRIPTS_SQL_CTE + "\n"
        + scrub_sql(SCRUB_LOG, ("conv_id", "turn_idx"),
                    table="transcripts")
    )


def _q_ngram_repetition(sf_dir: str):
    """Gopher-style repetition quality signals (top-2-gram fraction,
    duplicate-3-gram fraction) per document."""
    from fluent_server_ray.stages.hygiene import ngram_repetition_batch
    from fluent_server_ray.stages.textstats import apply_doc_stage

    return apply_doc_stage(_docs(sf_dir), ngram_repetition_batch).sort(
        "doc_id"
    )


def _q_decontaminate(sf_dir: str):
    """Benchmark 3-gram decontamination: training docs sharing any
    word 3-gram with the held-out slice (doc_id % 29 == 0) are
    flagged; the benchmark gram set broadcasts once."""
    from fluent_server_ray.stages.hygiene import decontaminate

    return decontaminate(_docs(sf_dir)).sort("doc_id")


# ----- training-set assembly -----

def _q_conv_running_stats(sf_dir: str):
    """Per-conversation ordered window functions (row_number / running
    sum / lag) — one hash-bucket exchange, vectorized segmented
    kernels per bucket."""
    from fluent_server_ray.stages.assembly import running_turn_stats

    return running_turn_stats(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "role",
                                          "text"])
    )


def _q_conv_documents(sf_dir: str):
    """Conversation → training document assembly: turns newline-joined
    as ``role: text`` in stable turn order."""
    from fluent_server_ray.stages.assembly import conv_to_documents

    return conv_to_documents(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "role",
                                          "text"])
    )


def _q_sft_loss_spans(sf_dir: str):
    """SFT loss-mask spans: per turn, the character offsets of its
    rendered ``role: text`` line inside the assembled conversation
    document, and whether the span is trainable (assistant turns) or
    masked context."""
    from fluent_server_ray.stages.assembly import sft_loss_spans

    return sft_loss_spans(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "role",
                                          "text"])
    )


def _q_token_budget(sf_dir: str):
    """Quality-ordered selection under a per-source TOKEN budget:
    keep each source's best docs (alpha-ratio millionths DESC, id ASC)
    while the inclusive token cumsum fits 600 — statistic-then-map
    (bin-sum threshold scan + exact boundary-bin resolution), never a
    whole-source sort."""
    from fluent_server_ray.stages.sampling import select_token_budget

    return select_token_budget(_docs(sf_dir), budget=600)


def _q_conv_truncate(sf_dir: str):
    """Context-window truncation: per conversation keep the newest
    suffix of turns fitting a whitespace-token budget (final turn
    always kept) — the SFT assembly step before packing."""
    from fluent_server_ray.stages.assembly import conv_truncate_context

    return conv_truncate_context(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "role",
                                          "text"]),
        max_tokens=64,
    )


def _q_pack_sequences(sf_dir: str):
    """Deterministic concat-and-chunk sequence packing (the
    LM-pretraining sample-packing layout) — window-cumsum assignment,
    no sequential bin state."""
    from fluent_server_ray.stages.assembly import pack_sequences

    return pack_sequences(_docs(sf_dir))


def _q_split_assign(sf_dir: str):
    """Deterministic train/val/test split by key md5 — stable across
    runs/engines/shards; pure map stage."""
    from fluent_server_ray.stages.assembly import split_assign

    return split_assign(_docs(sf_dir))


def _q_heavy_hitter_tags(sf_dir: str):
    """Top-10 hottest tags via the mergeable Misra-Gries summary —
    per-block exact partials reduce into one bounded sketch (capacity
    >= distinct tags here, so the result is exact and oracle-checked;
    the same path bounds memory at unbounded tag cardinality)."""
    from fluent_server_ray.stages.sketches import heavy_hitters

    return heavy_hitters(build_routed(sf_dir, columns=["tag"]), "tag",
                         k=10, capacity=256)


def _heavy_hitter_tags_sql() -> str:
    return (
        oracle.with_pipeline_ctes()
        + "\nSELECT tag, count(*) AS n FROM routed GROUP BY tag"
          " ORDER BY n DESC, tag LIMIT 10"
    )


TOKEN_QUANTILE_ARGS = dict(lo=0.0, hi=512.0, bins=512)


def _q_token_quantiles(sf_dir: str):
    """Histogram quantiles of a COMPUTED column — per-doc token counts
    feed the additive-histogram sketch (read → vectorized count →
    combiner histograms; the sketch composes with any upstream map)."""
    import pyarrow as pa

    from fluent_server_ray.stages.sketches import binned_quantiles
    from fluent_server_ray.stages.textstats import token_count_batch

    toks = _docs(sf_dir).map_batches(
        token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return binned_quantiles(toks, "n_tokens", **TOKEN_QUANTILE_ARGS)


def _token_quantiles_sql() -> str:
    from fluent_server_ray.stages.sketches import binned_quantiles_sql

    sub = ("(SELECT CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT)"
           " AS n_tokens FROM documents)")
    return binned_quantiles_sql("n_tokens", table=sub,
                                **TOKEN_QUANTILE_ARGS)


def _q_event_value_stats(sf_dir: str):
    """Generic grouped aggregates (sum/min/max/count/mean) via the
    combiner-first grouped_agg — cents-exact integer math, mean as
    exact sum/count."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from fluent_server_ray.pipelines.relational import _cents
    from fluent_server_ray.stages.aggregate import grouped_agg

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": t["event_type"], "value_cents": _cents(t["value"])}
        )

    return grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        [("value_cents", "sum"), ("value_cents", "min"),
         ("value_cents", "max"), ("value_cents", "count"),
         ("value_cents", "mean")],
    )


def _event_value_stats_sql() -> str:
    return """
WITH prep AS (
  SELECT event_type, CAST(round(value * 100.0) AS BIGINT) AS c FROM events
)
SELECT event_type,
  CAST(sum(c) AS BIGINT) AS value_cents_sum,
  min(c) AS value_cents_min,
  max(c) AS value_cents_max,
  count(c) AS value_cents_count,
  CAST(sum(c) AS DOUBLE) / count(c) AS value_cents_mean
FROM prep GROUP BY event_type ORDER BY event_type
""".strip()


def _q_conv_value_stats(sf_dir: str):
    """Per-CONVERSATION value stats via ``grouped_agg(final='ray')`` —
    the unbounded-key-cardinality path: |convs| is O(rows), so the
    merge of partials runs as Ray's distributed groupby and the driver
    never holds the partials (unlike ``final='driver'``, which is for
    bounded key spaces like event_type)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_agg

    ds = read_transcripts(sf_dir, columns=["conv_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"conv_id": t["conv_id"],
             "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64())}
        )

    return grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["conv_id"],
        [("n_chars", "sum"), ("n_chars", "max"), ("n_chars", "count"),
         ("n_chars", "mean")],
        final="ray",
    )


def _conv_value_stats_sql() -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE

    return (
        "WITH " + TRANSCRIPTS_SQL_CTE
        + """
SELECT conv_id,
  CAST(sum(length(text)) AS BIGINT) AS n_chars_sum,
  CAST(max(length(text)) AS BIGINT) AS n_chars_max,
  count(text) AS n_chars_count,
  CAST(sum(length(text)) AS DOUBLE) / count(text) AS n_chars_mean
FROM transcripts GROUP BY conv_id ORDER BY conv_id"""
    )


GROUPED_QUANTILE_ARGS = dict(lo=0.0, hi=500.0, bins=1000)


def _q_value_quantiles_by_type(sf_dir: str):
    """Per-event-type histogram quantiles (p50/p95/p99 of value) — the
    keyed sketch: one vectorized bincount per batch over the combined
    (group, bin) key, |groups|×bins driver merge."""
    from fluent_server_ray.stages.sketches import grouped_binned_quantiles

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    return grouped_binned_quantiles(ds, "event_type", "value",
                                    **GROUPED_QUANTILE_ARGS)


def _value_quantiles_by_type_sql() -> str:
    from fluent_server_ray.stages.sketches import grouped_binned_quantiles_sql

    return grouped_binned_quantiles_sql("event_type", "value",
                                        table="events",
                                        **GROUPED_QUANTILE_ARGS)


VALUE_QUANTILE_ARGS = dict(lo=0.0, hi=500000.0, bins=1000)


def _q_value_quantiles(sf_dir: str):
    """Distributed histogram quantiles of order prices (combiner =
    additive histograms; deterministic bucket outputs, exact oracle)."""
    import ray.data as rd

    from fluent_server_ray.stages.sketches import binned_quantiles

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    return binned_quantiles(ds, "o_totalprice", **VALUE_QUANTILE_ARGS)


def _q_dedup_substring(sf_dir: str):
    """EXACT shared-substring pairs (docs sharing an 8-token run) —
    the window-granular substring dedup of Lee et al. 2022, one
    rolling-hash combiner + one bucket exchange + collision-exact
    verification. Strict oracle: DuckDB window self-join."""
    from fluent_server_ray.stages.dedup import substring_dupes

    return substring_dupes(_docs(sf_dir), window_k=8)


def _q_unigram_logprob(sf_dir: str):
    """Perplexity-style LM quality score: per-doc mean unigram
    log-probability under the corpus's own unigram model
    (integer-exact millionths contract, cf. doc_tfidf)."""
    from fluent_server_ray.stages.textstats import doc_unigram_logprob

    return doc_unigram_logprob(_docs(sf_dir))


def _q_embedding_quantize(sf_dir: str):
    """Per-dimension int8 scalar quantization of the embedding column
    (long-form codes; bit-exact float64 expression-tree contract)."""
    from fluent_server_ray.stages.similarity import embedding_quantize

    return embedding_quantize(
        read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                           override_num_blocks=8))


def _q_embedding_pca(sf_dir: str):
    """Distributed PCA projection to 8 dims (second-moment combiners →
    driver eigh → broadcast projection). Eigenbasis is not
    SQL-expressible → rows-only; numpy-equality pinned in pytest."""
    from fluent_server_ray.stages.similarity import pca_project

    return pca_project(
        read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                           override_num_blocks=8), n_components=8)


def _q_retention(sf_dir: str):
    """Weekly cohort retention triangle over events (distinct
    (user, week) combiner → one user exchange → bounded merge)."""
    from fluent_server_ray.stages.windows import retention_cohorts

    return retention_cohorts(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts"]))


def _q_order_count_distribution(sf_dir: str):
    """TPC-H Q13 shape: customers by order count incl. zero-order
    customers (grouped_agg(final='ray') + LEFT bucketed join)."""
    from fluent_server_ray.pipelines.relational import \
        order_count_distribution

    return order_count_distribution(sf_dir)


def _q_normalize(sf_dir: str):
    """Canonical text normalization (control-strip → whitespace
    collapse → trim → lowercase), the pre-dedup cleanup pass."""
    from fluent_server_ray.stages.hygiene import normalize_text

    return normalize_text(_docs(sf_dir))


def _q_users_per_type(sf_dir: str):
    """EXACT count(DISTINCT user) per event type — the generic
    two-level distinct (combiner → one value-hash exchange → bounded
    merge)."""
    from fluent_server_ray.stages.aggregate import grouped_distinct_count

    return grouped_distinct_count(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "user_id"]),
        "event_type", "user_id")


LINE_DEDUP_MIN_COUNT = 4


def _q_conv_line_dedup(sf_dir: str):
    """Bulk corpus-level LINE dedup (RefinedWeb/C4 pre-training
    staple) over the conversation-document corpus: every ``role:
    text`` line occurring >= min_count times corpus-wide is removed
    from every document — repeated boilerplate turns vanish, unique
    content stays."""
    from fluent_server_ray.stages.assembly import conv_to_documents
    from fluent_server_ray.stages.hygiene import line_dedup

    docs = conv_to_documents(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "role",
                                          "text"])
    ).select_columns(["conv_id", "doc_text"])
    return line_dedup(docs, id_col="conv_id", text_col="doc_text",
                      min_count=LINE_DEDUP_MIN_COUNT)


def _conv_line_dedup_sql() -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE
    from fluent_server_ray.stages.hygiene import line_dedup_sql

    docs_cte = (
        "WITH " + TRANSCRIPTS_SQL_CTE +
        " SELECT conv_id, string_agg(role || ': ' || text, chr(10)"
        " ORDER BY turn_idx) AS doc_text FROM transcripts"
        " GROUP BY conv_id"
    )
    return line_dedup_sql(docs_cte, "conv_id", "doc_text",
                          min_count=LINE_DEDUP_MIN_COUNT)


def _q_median_by_type(sf_dir: str):
    """EXACT per-group median via distributed selection over
    (key, value) COUNTS — one key-bucket exchange + one vectorized
    searchsorted; the exact counterpart of the histogram quantiles."""
    from fluent_server_ray.stages.aggregate import grouped_exact_median

    return grouped_exact_median(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value"]),
        "event_type", "value")


def _q_conv_windows(sf_dir: str):
    """Chat-LM context-window assignment: per-conversation integer
    char-budget packing that never splits a turn."""
    from fluent_server_ray.stages.assembly import conv_context_windows

    return conv_context_windows(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"]))


def _q_dup_ngram_frac(sf_dir: str):
    """Cross-corpus duplicated-3-gram fraction per doc (RefinedWeb/
    Dolma boilerplate signal): no broadcast — gram df merges
    distributed, occurrences join the dup-gram set via one bucketed
    hash join, totals attach with a doc-bucketed LEFT join."""
    from fluent_server_ray.stages.hygiene import dup_ngram_fraction

    return dup_ngram_fraction(_docs(sf_dir))


BM25_QUERY_TERMS = ["window", "scan", "merge"]


def _q_bm25_topk(sf_dir: str):
    """Okapi BM25 top-20 retrieval for a fixed query over the document
    corpus: one tokenize pass, broadcast query set, distributed
    matched-row scoring, O(blocks·k) top-k merge. Integer-millionths
    score contract keeps the DuckDB oracle bit-exact."""
    from fluent_server_ray.stages.textstats import bm25_topk

    return bm25_topk(_docs(sf_dir), BM25_QUERY_TERMS, k=20)


def _q_pmi_pairs(sf_dir: str):
    """Top-50 adjacent-pair collocations by PMI (phrase-vocabulary
    induction): distributed unigram/pair count merges, min-count gate
    before two bucketed unigram joins, millionths contract."""
    from fluent_server_ray.stages.textstats import pmi_top_pairs

    return pmi_top_pairs(_docs(sf_dir), k=50, min_count=5)


def _q_orders_segment_salted(sf_dir: str):
    """Order counts per market segment through the SKEW-SAFE salted
    replicated join (hot o_custkey rows cycle across n_salts buckets;
    the customer side replicates once per salt) — identical semantics
    to the plain inner join, pinned by the shared oracle."""
    from fluent_server_ray.stages.joins import salted_replicated_join

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"])
    joined = salted_replicated_join(orders, cust, key="o_custkey",
                                    right_key="c_custkey")
    return grouped_counts(joined, ["c_mktsegment"]).sort_by("c_mktsegment")


VALUE_TIERS = ([5.0, 20.0], ["low", "mid", "high"])


def _q_value_tier_counts(sf_dir: str):
    """Interval-table enrichment (fluentd geoip/CIDR-filter shape):
    broadcast boundary table + vectorized searchsorted per batch, then
    bounded grouped counts."""
    from fluent_server_ray.stages.enrich import range_lookup

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    tiered = range_lookup(ev, "value", *VALUE_TIERS, out_col="tier")
    return grouped_counts(tiered.select_columns(["event_type", "tier"]),
                          ["event_type", "tier"]).sort_by(
        [("event_type", "ascending"), ("tier", "ascending")])


def _q_latest_per_user(sf_dir: str):
    """CDC upsert compaction: each user's latest event by (ts,
    event_id) — combiner-first argmax, one key exchange."""
    from fluent_server_ray.stages.aggregate import latest_by_key

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type", "value"])
    return latest_by_key(ev, "user_id", ["ts", "event_id"])


def _q_compression_ratio(sf_dir: str):
    """Per-doc zlib compression ratio (Dolma/Gopher redundancy gate):
    per-row C zlib inside parallel map_batches. STRICT oracle via
    pinned zlib constants: a golden compressed-size map keyed by
    md5(text) joins ON CONTENT (`textstats.compression_ratio_sql`),
    so the driver check verifies the distributed (id ↔ text) pairing
    and the C zlib bytes; also byte-exact pytest pins."""
    from fluent_server_ray.stages.textstats import doc_compression_ratio

    return doc_compression_ratio(_docs(sf_dir))


def _q_label_centroids(sf_dir: str):
    """Per-label embedding centroids (nearest-class-mean prototypes):
    integer-millionths per-dim sums merge order-free; one exact final
    division."""
    from fluent_server_ray.stages.similarity import label_centroids

    return label_centroids(
        read_parquet_clean(f"{sf_dir}/embeddings.parquet"))


def _q_tfidf_joined(sf_dir: str):
    """doc_tfidf's web-scale path: vocab/idf table stays distributed
    (grouped_agg final='ray' + one bucketed term join) instead of a
    driver-built broadcast — same oracle as doc_tfidf."""
    from fluent_server_ray.stages.textstats import doc_tfidf_joined

    return doc_tfidf_joined(_docs(sf_dir))


def _q_bpe_encode(sf_dir: str):
    """Tokenize the corpus with a learned 8-merge BPE table: the merge
    table broadcasts once; each batch replays the merges with compiled
    lookaround regexes over one joined buffer. STRICT oracle: the
    train rounds unroll as CTEs and the final vocab maps every word
    to its merged symbols (`bpe.bpe_encode_sql`); encoder also pinned
    vs a per-word reference in pytest."""
    from fluent_server_ray.stages.bpe import bpe_encode, bpe_train_adaptive

    merges = bpe_train_adaptive(_docs(sf_dir), n_merges=8)
    return bpe_encode(_docs(sf_dir), merges)


def _q_sink_anomalies(sf_dir: str):
    """Observability composite anchored in the flagship domain:
    parse→route, then per-SINK tumbling traffic counts with
    z-score spike flags — the dashboard a log pipeline feeds."""
    from fluent_server_ray.stages.windows import window_anomalies

    routed = build_routed(sf_dir, columns=["sink", "ts"])
    return window_anomalies(routed, width_seconds=600, threshold=2.0,
                            key_col="sink", ts_col="ts")


def _q_lang_gate(sf_dir: str):
    """Per-language minimum-length gate (multilingual curation uses a
    bar per language, not one global threshold): pure vectorized map,
    broadcast threshold table."""
    from fluent_server_ray.stages.hygiene import gate_per_language

    return gate_per_language(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "text"]))


def _q_gram_diversity(sf_dir: str):
    """Distinct-bigram ratio per source (distinct-n diversity metric —
    mode-collapse detector for synthetic corpora): bounded grouped
    totals + the two-level exact distinct over the unbounded gram
    space."""
    from fluent_server_ray.stages.textstats import gram_diversity_by_source

    return gram_diversity_by_source(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"]))


def _q_turn_gaps(sf_dir: str):
    """Per-conversation inter-turn latency stats (agent-latency
    mining): one conv-bucket exchange, integer-microsecond gap sums,
    two fixed float derivations."""
    from fluent_server_ray.stages.assembly import conv_turn_gaps

    return conv_turn_gaps(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "ts"]))


def _q_psi_drift(sf_dir: str):
    """PSI drift between the even/odd event-id cohorts per event_type
    (the ML-ops distribution monitor): integer histogram partials
    cross the cluster, per-bin millionths floor makes the Σ order-free
    and SQL-bit-exact."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from fluent_server_ray.stages.features import psi_drift

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])

    def half(h):
        def fn(t: _pa.Table) -> _pa.Table:
            keep = _pc.equal(_pc.bit_wise_and(t["event_id"],
                                              _pa.scalar(1)), h)
            return t.filter(keep)

        return ev.map_batches(fn, batch_format="pyarrow",
                              zero_copy_batch=True)

    return psi_drift(half(0), half(1))


def _q_cluster_sizes(sf_dir: str):
    """Dedup-cluster size histogram (the dedup-ratio report a curation
    run ships): connected components over the exact-Jaccard pair set →
    per-component counts → bounded count-of-counts."""
    from fluent_server_ray.stages.dedup import (ngram_jaccard_dupes,
                                                pair_components)

    comps = pair_components(ngram_jaccard_dupes(_docs(sf_dir),
                                                threshold=0.8))
    per_comp = grouped_counts(comps, ["component"])
    sizes = (per_comp.select(["n"]).rename_columns(["size"])
             .group_by("size").aggregate([([], "count_all")])
             .rename_columns(["size", "n_clusters"]))
    return sizes.sort_by("size")


def _q_conv_dedup(sf_dir: str):
    """Conversation-LEVEL exact dedup: assemble each conv into one
    document, then the combiner-first min-id dedup keeps the first
    conv of every identical rendered transcript."""
    from fluent_server_ray.stages.assembly import conv_to_documents
    from fluent_server_ray.stages.dedup import exact_dedup

    docs = conv_to_documents(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "role",
                                          "text"]))
    return exact_dedup(docs, id_col="conv_id",
                       text_col="doc_text").sort("conv_id")


def _q_chunk_dedup(sf_dir: str):
    """Paragraph-level exact dedup (RefinedWeb's sub-document pass):
    NON-overlapping 20-token chunks explode map-side, then the
    standard combiner-first exact dedup keeps each distinct chunk's
    first (doc_id, chunk_idx) occurrence — the order pair rides one
    int64 (chunk_idx < 1e6 asserted) through the shared min-reduce."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from fluent_server_ray.stages.assembly import chunk_windows
    from fluent_server_ray.stages.dedup import exact_dedup

    chunks = chunk_windows(_docs(sf_dir), window=20, stride=20)

    def encode(t: _pa.Table) -> _pa.Table:
        idx = t["chunk_idx"]
        if len(t) and _pc.max(idx).as_py() >= 1_000_000:
            raise ValueError("chunk_idx >= 1e6 breaks the order encoding")
        cid = _pc.add(_pc.multiply(t["doc_id"], _pa.scalar(1_000_000)),
                      idx)
        return _pa.table({"cid": cid, "chunk_text": t["chunk_text"]})

    deduped = exact_dedup(
        chunks.map_batches(encode, batch_format="pyarrow",
                           zero_copy_batch=True),
        id_col="cid", text_col="chunk_text")

    def decode(t: _pa.Table) -> _pa.Table:
        doc = _pc.divide(t["cid"], _pa.scalar(1_000_000))
        idx = _pc.subtract(t["cid"],
                           _pc.multiply(doc, _pa.scalar(1_000_000)))
        return _pa.table({"doc_id": doc, "chunk_idx": idx,
                          "chunk_text": t["chunk_text"]})

    return deduped.map_batches(decode, batch_format="pyarrow",
                               zero_copy_batch=True).sort(
        ["doc_id", "chunk_idx"])


def _q_split_by_content(sf_dir: str):
    """LEAKAGE-SAFE train/val/test split: the assignment hashes the
    CONTENT, not the id, so byte-identical duplicates always land in
    the same split (an id-keyed split leaks dup text across the
    boundary). Same md5 rule as doc_split_assign, keyed on text."""
    import pyarrow as _pa

    from fluent_server_ray.stages.assembly import split_of

    def fn(t: _pa.Table) -> _pa.Table:
        return _pa.table({"doc_id": t["doc_id"],
                          "split": split_of(t["text"])})

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow",
                                     zero_copy_batch=True)


def _q_rebalance(sf_dir: str):
    """Flatten the source mix: every source deterministically
    downsampled toward the smallest source's mass via integer
    md5-prefix thresholds (bounded grouped count → pure filter)."""
    from fluent_server_ray.stages.sampling import rebalance_by_key

    return rebalance_by_key(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"]))


def _q_temperature_sample(sf_dir: str):
    """XLM-style temperature resampling (alpha=0.5) over the SKEWED
    language mix (the op's published use-case): per-language keep-rate
    sqrt(min_n/n) via exact isqrt integer thresholds over the
    md5-4-hex coin — bounded grouped count, then a pure filter.
    (The `source` column is uniform in the test corpus — grouping by
    it would keep every row and never exercise the threshold.)"""
    from fluent_server_ray.stages.sampling import temperature_sample

    return temperature_sample(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"]),
        group_col="lang")


def _q_rolling_value(sf_dir: str):
    """Per-user moving aggregate of the last 5 events by (ts, id):
    int64-micros cumsum-minus-shift inside one key-bucket exchange;
    SQL window-frame semantics incl. NULL handling."""
    from fluent_server_ray.stages.windows import rolling_agg

    return rolling_agg(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "user_id", "ts",
                                    "value"]))


def _q_value_trend(sf_dir: str):
    """Per-event-type OLS drift line of value-micros over epoch
    seconds — exact HUGEINT-class partials (python-int fallback when
    a block's products could wrap int64), one float division per
    coefficient."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from fluent_server_ray.stages.features import grouped_ols_trend

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "value"])

    def prep(t: _pa.Table) -> _pa.Table:
        us = _pc.cast(_pc.cast(t["ts"], _pa.timestamp("us")), _pa.int64())
        x = _pc.divide(us, 1_000_000)
        y = _pc.cast(_pc.floor(_pc.multiply(
            _pc.cast(t["value"], _pa.float64()),
            _pa.scalar(1_000_000.0))), _pa.int64())
        return _pa.table({"event_type": t["event_type"], "x": x, "y": y})

    return grouped_ols_trend(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_col="event_type", x_col="x", y_col="y")


def _q_edit_distance_dupes(sf_dir: str):
    """Typo-radius near-dup pairs: byte-Levenshtein ≤ 2 over 64-cp
    prefixes — length-band blocking (recall 1 within the radius),
    across-pairs vectorized DP; bounded-pool contract."""
    from fluent_server_ray.stages.dedup import edit_distance_dupes

    return edit_distance_dupes(_docs(sf_dir))


def _q_robust_outliers(sf_dir: str):
    """Median/MAD outliers per event type (|v−med| > 3·MAD) — exact
    distributed medians, broadcast maps, pure filter pass."""
    from fluent_server_ray.stages.features import robust_outliers

    return robust_outliers(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "event_type", "value"]))


def _q_tool_error_rates(sf_dir: str):
    """Per-tool error rate over the FLAGSHIP route (parse→route →
    fraction of tool turns carrying an error code) — the log-pipeline
    reliability dashboard; one fused combiner pass, bounded merge."""
    import numpy as _np
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    ds = build_routed(sf_dir)

    def prep(t: _pa.Table) -> _pa.Table:
        sub = t.filter(_pc.is_valid(t["parsed_tool"]))
        return _pa.table({
            "parsed_tool": sub["parsed_tool"],
            "err": _pc.cast(_pc.is_valid(sub["error_code"]), _pa.int64()),
        })

    agg = grouped_agg(
        ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["parsed_tool"], aggs=[("err", "sum"), ("err", "count")])
    agg = agg.sort_by("parsed_tool")
    n = agg["err_count"].to_numpy(zero_copy_only=False).astype(_np.float64)
    e = agg["err_sum"].to_numpy(zero_copy_only=False).astype(_np.float64)
    # (1000000.0 * errs) / calls, floored — the SQL mirror's float tree
    rate = _np.floor((1_000_000.0 * e) / n).astype(_np.int64)
    return _pa.table({
        "parsed_tool": agg["parsed_tool"],
        "n_calls": _pc.cast(agg["err_count"], _pa.int64()),
        "n_errors": _pc.cast(agg["err_sum"], _pa.int64()),
        "err_rate_millionths": _pa.array(rate),
    })


def _q_dedup_normalized(sf_dir: str):
    """Exact dedup in NORMALIZED space (case/spacing/control-byte
    differences collide): min-id doc per distinct canonical text —
    normalize map composed with the combiner-first exact dedup."""
    from fluent_server_ray.stages.dedup import exact_dedup
    from fluent_server_ray.stages.hygiene import normalize_text

    return exact_dedup(normalize_text(_docs(sf_dir)),
                       text_col="text_norm")


def _q_dup_degree_hist(sf_dir: str):
    """Near-dup pair-graph DEGREE histogram (how many docs have k
    near-dup partners) — the graph-health report that separates
    pairwise noise from dense copy clusters. Pairs explode to
    endpoints, per-doc degrees merge distributedly (unbounded doc
    space), the bounded count-of-counts merges on the driver."""
    import pyarrow as pa

    from fluent_server_ray.stages.aggregate import (grouped_agg,
                                                    grouped_counts,
                                                    skip_empty)
    from fluent_server_ray.stages.dedup import ngram_jaccard_dupes

    pairs = ngram_jaccard_dupes(_docs(sf_dir), threshold=0.8)

    def endpoints(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([
            t["doc_a"].combine_chunks().cast(pa.int64()),
            t["doc_b"].combine_chunks().cast(pa.int64())])
        return pa.table({"doc_id": both})

    deg = grouped_agg(
        pairs.map_batches(skip_empty(endpoints), batch_format="pyarrow",
                          zero_copy_batch=True),
        keys=["doc_id"], aggs=[("doc_id", "count")], final="ray")

    def rn(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_id", "degree"])

    out = grouped_counts(
        deg.map_batches(rn, batch_format="pyarrow", zero_copy_batch=True),
        ["degree"], final="driver")
    return out.rename_columns(["degree", "n_docs"]).sort_by(
        [("degree", "ascending")])


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _q_tool_mode(sf_dir: str):
    """Per-sink dominant tool (grouped MODE, ties by tool) over the
    flagship route — combiner counts + one argmax per group."""
    from fluent_server_ray.stages.aggregate import grouped_mode

    routed = build_routed(sf_dir, columns=["sink", "tool"])

    def non_null(t):
        import pyarrow.compute as _pc

        return t.filter(_pc.is_valid(t["tool"]))

    return grouped_mode(
        routed.map_batches(non_null, batch_format="pyarrow",
                           zero_copy_batch=True), "sink", "tool")


def _q_ttr(sf_dir: str):
    """Per-doc type-token ratio signals (lexical diversity gate):
    distinct vs total tokens, integers only, pure map."""
    from fluent_server_ray.stages.textstats import type_token_ratio

    return type_token_ratio(_docs(sf_dir))


def _q_kcenter(sf_dir: str):
    """Greedy k-center (farthest-point) diverse selection — iterative
    (k rounds, newest center broadcast each round; rows-only like the
    other iterative fits, pinned by a brute-force pytest)."""
    from fluent_server_ray.stages.similarity import kcenter_sample

    return kcenter_sample(_embs(sf_dir), k=16)


def _q_user_event_melt(sf_dir: str):
    """melt(pivot(x)) reshape round trip: the wide per-user feature
    matrix unpivoted back to long — declared-width contract means
    zero-count cells surface as explicit 0 rows (mirrored by the
    cross-join oracle)."""
    from fluent_server_ray.stages.features import pivot_counts
    from fluent_server_ray.stages.fields import melt

    wide = pivot_counts(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type"]),
        key_col="user_id", pivot_col="event_type", values=_EVENT_TYPES,
        final="ray")
    long = melt(wide, id_cols=("user_id",),
                value_cols=tuple(f"n_{v}" for v in _EVENT_TYPES))
    return long.sort(["user_id", "variable"])


def _q_dup_cluster_examples(sf_dir: str):
    """Dup-cluster AUDIT view: per near-dup component, its size and
    the smallest non-keeper member — the spot-check table a curator
    eyeballs before trusting a dedup rule."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.dedup import (ngram_jaccard_dupes,
                                                pair_components)

    comp = pair_components(ngram_jaccard_dupes(_docs(sf_dir),
                                               threshold=0.8))

    def prep(t: pa.Table) -> pa.Table:
        d = pc.cast(t["doc_id"], pa.int64())
        c = pc.cast(t["component"], pa.int64())
        non_keeper = pc.if_else(pc.greater(d, c), d,
                                pa.scalar(None, pa.int64()))
        return pa.table({"cluster_id": c, "m": d, "nk": non_keeper})

    agg = grouped_agg(
        comp.map_batches(skip_empty(prep), batch_format="pyarrow",
                         zero_copy_batch=True),
        keys=["cluster_id"], aggs=[("m", "count"), ("nk", "min")],
        final="ray")

    def rn(t: pa.Table) -> pa.Table:
        return pa.table({
            "cluster_id": t["cluster_id"],
            "size": pc.cast(t["m_count"], pa.int64()),
            "example_dup": pc.cast(t["nk_min"], pa.int64()),
        })

    return (agg.map_batches(rn, batch_format="pyarrow",
                            zero_copy_batch=True)
            .sort(["cluster_id"]))


def _dup_cluster_examples_sql() -> str:
    from fluent_server_ray.stages import dedup

    base = dedup.pair_components_sql(
        dedup.ngram_jaccard_dupes_sql(threshold=0.8))
    marker = "SELECT node AS doc_id, min(lbl) AS component FROM reach"
    idx = base.index(marker)
    prefix = base[:idx].rstrip()
    assert prefix.endswith(")"), "components-SQL shape changed"
    return f"""{prefix},
comp AS (
  SELECT node AS doc_id, min(lbl) AS component FROM reach GROUP BY node
)
SELECT component AS cluster_id,
  CAST(count(*) AS BIGINT) AS size,
  CAST(min(doc_id) FILTER (WHERE doc_id > component) AS BIGINT)
    AS example_dup
FROM comp GROUP BY component ORDER BY cluster_id"""


def _q_dow_profile(sf_dir: str):
    """Day-of-week × hour traffic heatmap per event type (ISO weekday
    ≡ isodow; bounded cell space, combiner counts)."""
    from fluent_server_ray.stages.windows import dow_hour_profile

    return dow_hour_profile(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]))


def _q_weekly_growth(sf_dir: str):
    """Week-over-week traffic growth per event type (lag over epoch
    weeks; gap weeks don't chain); counts combiner-merged, one float
    division per row = the SQL lag tree."""
    from fluent_server_ray.stages.windows import weekly_growth

    return weekly_growth(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]))


def _q_monthly_revenue(sf_dir: str):
    """Calendar-month revenue seasonality (Arrow temporal kernels ≡
    date_trunc — the calendar window fixed-width tumbling can't
    express); exact-cents sums."""
    from fluent_server_ray.pipelines.relational import monthly_revenue

    return monthly_revenue(sf_dir)


def _q_pit_features(sf_dir: str):
    """Point-in-time windowed feature join: per transcript turn, the
    user's event count + value-micros sum STRICTLY before the turn in
    a 1h lookback — the leakage-safe feature-store primitive."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.windows import pit_window_features

    def add_user(t: pa.Table) -> pa.Table:
        uid = pc.cast(pc.utf8_slice_codeunits(t["conv_id"], 5, 99),
                      pa.int64())
        return t.append_column("user_id", uid)

    turns = read_transcripts(
        sf_dir, columns=["conv_id", "turn_idx", "ts"]
    ).map_batches(add_user, batch_format="pyarrow", zero_copy_batch=True)
    events = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"])
    return pit_window_features(turns, events, window_sec=3600)


def _q_collapse_repeats(sf_dir: str):
    """Consecutive-duplicate-token collapse (OCR/ASR stutter cleanup)
    — pure Arrow kernels, list layout rebuilt from kept-count offsets,
    no shuffle."""
    from fluent_server_ray.stages.hygiene import collapse_repeat_tokens

    return collapse_repeat_tokens(_docs(sf_dir))


def _q_distinctive_bigrams(sf_dir: str):
    """Per-source distinctive bigrams by lift (source share vs corpus
    share) — python-int exact millionths (HUGEINT mirror), one
    pair-bucket exchange, per-source top-k."""
    from fluent_server_ray.stages.textstats import source_distinctive_bigrams

    return source_distinctive_bigrams(_docs(sf_dir))


def _dup_degree_hist_sql() -> str:
    """Wrap the exact-Jaccard pair query as a CTE, then count degrees
    and degrees-of-degrees — string surgery kept to one well-pinned
    split point (the pair SELECT)."""
    from fluent_server_ray.stages import dedup

    base = dedup.ngram_jaccard_dupes_sql(threshold=0.8)
    marker = "SELECT a.doc_id AS doc_a"
    idx = base.index(marker)
    prefix = base[:idx].rstrip()          # "WITH toks AS (...), sh AS (...)"
    body = base[idx:].replace("ORDER BY doc_a, doc_b", "").rstrip()
    assert prefix.endswith(")"), "pair-SQL shape changed"
    return f"""{prefix},
pairs AS (
  {body}
), ep AS (
  SELECT doc_a AS doc_id FROM pairs
  UNION ALL SELECT doc_b FROM pairs
), deg AS (
  SELECT doc_id, count(*) AS degree FROM ep GROUP BY doc_id
)
SELECT CAST(degree AS BIGINT) AS degree,
  CAST(count(*) AS BIGINT) AS n_docs
FROM deg GROUP BY degree ORDER BY degree"""


def _q_chi2_lang_source(sf_dir: str):
    """Categorical chi-square: is the language mix independent of the
    source feed — same bit-exact per-cell contract as the tiered
    variant."""
    from fluent_server_ray.stages.features import contingency_chi2_cat

    return contingency_chi2_cat(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source"]))


def _q_props_audit(sf_dir: str):
    """Semi-structured payload conformance audit over events.props:
    per type, rows / nulls / schema-valid payloads and min/max/sum of
    the extracted value — Arrow regex kernels, no per-row json."""
    from fluent_server_ray.stages.fields import props_audit

    return props_audit(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "props"]))


def _q_source_gini(sf_dir: str):
    """Per-source Gini coefficient of doc token counts — the corpus
    length-inequality diagnostic; integer rank partials, one float
    tree per source (bit-exact vs the window-rank mirror)."""
    from fluent_server_ray.stages.textstats import source_length_gini

    return source_length_gini(_docs(sf_dir))


def _q_decayed_tags(sf_dir: str):
    """Recency-decayed heavy hitters over the routed stream: per-tag
    Σ floor(1e6·2^-age_days) — exact (integer ages make the decay an
    exact binary power), combiner-first."""
    from fluent_server_ray.pipelines.flagship import build_routed
    from fluent_server_ray.stages.windows import decayed_counts

    return decayed_counts(build_routed(sf_dir, columns=["tag", "ts"]))


def _q_daily_ffill(sf_dir: str):
    """Regular-grid resample with forward fill: per user, one row per
    day from first to last event carrying the day-close value — the
    irregular-stream → fixed-frequency-series step."""
    from fluent_server_ray.stages.windows import daily_ffill

    return daily_ffill(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "user_id", "ts", "value"]))


def _q_attribution(sf_dir: str):
    """First/last-touch attribution of purchases to view/click events
    in a 24h lookback — four merge_asof C kernels per user bucket."""
    from fluent_server_ray.stages.windows import touch_attribution

    return touch_attribution(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "user_id", "event_type",
                                    "ts"]))


def _q_rank_fusion(sf_dir: str):
    """Reciprocal Rank Fusion of two curation signals (alpha mass +
    token count): exact histogram-plan ranks, one id join, fixed
    two-division float tree — bit-exact vs row_number mirror."""
    from fluent_server_ray.stages.features import rank_fusion

    return rank_fusion(_docs(sf_dir))


def _q_packing_efficiency(sf_dir: str):
    """Per-bucket packing fill-rate report for the concat-and-chunk
    LM layout — integer-exact, one combiner pass."""
    from fluent_server_ray.stages.assembly import packing_efficiency

    return packing_efficiency(_docs(sf_dir))


def _q_fk_audit(sf_dir: str):
    """Referential-integrity audit over every warehouse FK edge:
    child rows / NULL keys / orphans, exact, distinct-keys-only
    shuffles — the pre-join data-quality gate."""
    from fluent_server_ray.pipelines.relational import fk_integrity_audit

    return fk_integrity_audit(sf_dir)


def _q_tool_pagerank(sf_dir: str):
    """Quantized-integer PageRank over the tool-transition graph
    (5 synchronous rounds, billionths ranks, floor arithmetic) —
    which tools sit at the center of agent tool-flow. Oracle: the
    unrolled 5-round MATERIALIZED-CTE mirror."""
    from fluent_server_ray.stages.assembly import tool_transitions
    from fluent_server_ray.stages.graph import pagerank

    edges = tool_transitions(apply_parse(read_transcripts(sf_dir)))
    return pagerank(edges, src="prev_tool", dst="tool", w="n", n_iters=5,
                    n_buckets=8)


def _q_chi2(sf_dir: str):
    """Chi-square independence diagnostic (event_type × value-tier):
    integer margins driver-merged from per-batch combiners, one fixed
    float tree per cell — bit-exact vs the SQL mirror."""
    from fluent_server_ray.stages.features import contingency_chi2

    return contingency_chi2(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value"]))


def _q_shard_plan(sf_dir: str):
    """Token-balanced output-shard planner: exact global (n_tokens
    DESC, id) rank via additive value histogram + one within-value
    exchange, dealt round-robin — LPT-style balance without a global
    sort."""
    from fluent_server_ray.stages.assembly import shard_plan

    return shard_plan(_docs(sf_dir), n_shards=16)


def _q_vocab_novelty(sf_dir: str):
    """New-vocabulary cadence over the transcript stream: per-day
    count of never-before-seen tokens (first-seen day per token via a
    distributed min-groupby; the vocabulary never lands on the
    driver). The ingestion-drift monitor."""
    from fluent_server_ray.stages.textstats import vocab_novelty

    return vocab_novelty(read_transcripts(sf_dir, columns=["ts", "text"]))


def _q_winnow_pairs(sf_dir: str):
    """MOSS-style content-overlap pairs: docs sharing ≥ 40 winnowed
    rolling-hash fingerprints (corpus background tops out ~33;
    literal copies measure 80+) — fingerprint-bucket exchange."""
    from fluent_server_ray.stages.dedup import winnow_pairs

    return winnow_pairs(_docs(sf_dir), min_shared=40)


def _q_source_vocab_overlap(sf_dir: str):
    """Pairwise top-100-vocabulary overlap between sources — word-
    bucket exchange, O(buckets·sources·k) driver merge."""
    from fluent_server_ray.stages.textstats import source_vocab_overlap

    return source_vocab_overlap(_docs(sf_dir))


def _q_interarrival_quantiles(sf_dir: str):
    """Per-event-type p50/p95/p99 of per-user inter-arrival seconds —
    user-bucket gap extraction composed with the integer-histogram
    grouped quantile sketch (engagement-cadence dashboard)."""
    from fluent_server_ray.stages.sketches import grouped_binned_quantiles
    from fluent_server_ray.stages.windows import interarrival_gaps

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"])
    gaps = interarrival_gaps(ds)
    return grouped_binned_quantiles(gaps, group_col="event_type",
                                    col="gap_sec", lo=0.0,
                                    hi=100_000.0, bins=1000)


def _q_doc_keywords(sf_dir: str):
    """Per-doc top-3 TF-IDF keywords — integer-exact weights,
    deterministic (w desc, term asc) rank; pure per-batch combiner."""
    from fluent_server_ray.stages.textstats import doc_keywords

    return doc_keywords(_docs(sf_dir))


def _q_split_leakage(sf_dir: str):
    """Eval-integrity audit: distinct texts shared between each pair
    of train/val/test splits — digest-bucket exchange, bounded merge."""
    from fluent_server_ray.stages.hygiene import split_leakage

    return split_leakage(_docs(sf_dir))


def _q_ab_ttest(sf_dir: str):
    """Welch two-sample t-test of value-micros between 'error' and
    'click' events — exact integer partials, one shared float tree."""
    from fluent_server_ray.stages.features import welch_ttest

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    return welch_ttest(ds, group_col="event_type", value_col="value",
                       group_a="error", group_b="click")


def _q_langid_confusion(sf_dir: str):
    """Language-ID confusion matrix: (labeled lang, predicted lang)
    counts — the classifier accuracy report; one fused combiner pass."""
    from fluent_server_ray.stages.textstats import langid_confusion

    return langid_confusion(_docs(sf_dir))


def _q_source_dup_rate(sf_dir: str):
    """Per-source exact-duplicate rate: fraction of each source's docs
    whose text appears in >1 doc corpus-wide — one digest-bucket
    exchange, bounded driver merge."""
    from fluent_server_ray.stages.dedup import source_dup_rate

    return source_dup_rate(_docs(sf_dir))


def _q_tfidf_cosine_pairs(sf_dir: str):
    """All-pairs sparse TF-IDF cosine ≥ 0.3 via the inverted-index
    plan (df-pruned space, integer-exact weights, term-bucket pair
    partials, two bucketed norm joins)."""
    from fluent_server_ray.stages.similarity import tfidf_cosine_pairs

    return tfidf_cosine_pairs(_docs(sf_dir))


def _q_oov_rate(sf_dir: str):
    """Tokenizer-coverage gate: per-doc out-of-vocab rate vs the
    corpus's own top-200 vocabulary — distributed vocab build, then a
    broadcast membership check (one index_in per batch)."""
    from fluent_server_ray.stages.textstats import oov_rate

    return oov_rate(_docs(sf_dir), vocab_k=200)


def _q_source_token_kl(sf_dir: str):
    """Data-mixing drift: per-language KL divergence of the token
    distribution from the corpus blend — word-bucket exchange folds
    c_w locally; floored-log int64 contract."""
    from fluent_server_ray.stages.textstats import source_token_kl

    return source_token_kl(_docs(sf_dir), group_col="lang")


def _q_docs_diff(sf_dir: str):
    """Keyed dataset diff between a corpus and its simulated next
    pipeline version (every 7th doc dropped, every remaining 5th doc
    re-cased): per-key md5 digests meet in ONE outer bucketed join;
    identical keys never leave the join tasks."""
    import numpy as np
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from fluent_server_ray.stages.diff import diff_by_key

    left = _docs(sf_dir)

    def simulate(t: _pa.Table) -> _pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        keep = (ids % 7) != 0
        sub = t.filter(_pa.array(keep))
        ids = ids[keep]
        up = _pa.array((ids % 5) == 0)
        text = _pc.if_else(up, _pc.utf8_upper(sub["text"]), sub["text"])
        return _pa.table({"doc_id": sub["doc_id"], "text": text})

    right = _docs(sf_dir).map_batches(simulate, batch_format="pyarrow",
                                      zero_copy_batch=True)
    return diff_by_key(left, right)


def _q_winsorize(sf_dir: str):
    """Per-group quantile capping: histogram-sketch thresholds
    (integer-exact bin rule) broadcast into a pure clamp map."""
    from fluent_server_ray.stages.features import winsorize_by_group

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])
    return winsorize_by_group(ev)


def _q_top_users_per_type(sf_dir: str):
    """Per-group top-k-by-count (top talkers per category): count
    combiner → one exchange → per-block per-group top-k partials →
    O(blocks·groups·k) driver re-rank."""
    from fluent_server_ray.stages.features import grouped_topk_counts

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])
    return grouped_topk_counts(ev, "event_type", "user_id", k=5)


def _q_window_anomalies(sf_dir: str):
    """Traffic-spike detection: tumbling counts (distributed combiner)
    → per-type z-score on the bounded count table → |z|>=2 windows."""
    from fluent_server_ray.stages.windows import window_anomalies

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])
    return window_anomalies(ev, width_seconds=3600, threshold=2.0)


def _q_corpus_overlap(sf_dir: str):
    """Cross-corpus vocabulary overlap between the odd/even doc halves
    via two KMV sketches — two O(blocks·k) reduces, zero shuffles. At
    this vocab size (« k=1024) the sketch is in its EXACT regime, so
    the DuckDB set-algebra oracle matches bit-for-bit; at crawl scale
    the same code degrades gracefully to the (k-1)/kth estimator."""
    import pyarrow.compute as _pc

    from fluent_server_ray.stages.sketches import corpus_overlap_estimate

    docs = _docs(sf_dir)

    def words(half: int):
        def fn(t):
            import pyarrow as _pa

            keep = _pc.equal(
                _pc.bit_wise_and(t["doc_id"], _pa.scalar(1)), half)
            sub = t.filter(keep)
            toks = _pc.list_flatten(_pc.split_pattern(sub["text"], " "))
            if isinstance(toks, _pa.ChunkedArray):
                toks = toks.combine_chunks()
            return _pa.table({"word": toks.filter(_pc.not_equal(toks, ""))})

        return docs.map_batches(fn, batch_format="pyarrow",
                                zero_copy_batch=True)

    return corpus_overlap_estimate(words(0), words(1), "word", k=1024)


def _q_bpe_merges(sf_dir: str):
    """Distributed BPE merge-table training (8 merges): word counts
    collapse the corpus to a vocab Dataset; each merge is a parallel
    pair-count pass + one broadcast regex merge. STRICT oracle: the
    iteration count is a fixed parameter, so the rounds UNROLL into a
    computed DuckDB query (`bpe.bpe_train_sql` — pair counts → argmax
    → greedy parity-rule merge per round); also pinned in pytest
    against a pure-Python reference trainer."""
    from fluent_server_ray.stages.bpe import bpe_train_adaptive

    return bpe_train_adaptive(_docs(sf_dir), n_merges=8)


def _q_tool_transitions(sf_dir: str):
    """Agent tool-flow mining: (prev tool -> next tool) Markov counts
    over each conversation's tool-call turns."""
    from fluent_server_ray.stages.assembly import tool_transitions

    return tool_transitions(apply_parse(read_transcripts(sf_dir)))


def _q_token_entropy(sf_dir: str):
    """Per-doc Shannon token entropy (within-doc distribution signal):
    integer-millionths ln(tf) contract, pure per-batch map — no corpus
    pass, no shuffle."""
    from fluent_server_ray.stages.textstats import doc_token_entropy

    return doc_token_entropy(_docs(sf_dir))


def _q_quality_curriculum(sf_dir: str):
    """Quality-curriculum data mixing: unigram-LM score → fixed-
    threshold tier → per-tier deterministic md5-coin rates (upsample
    quality, downsample noise) — pure map after the score pass."""
    from fluent_server_ray.pipelines.curation import quality_curriculum

    return quality_curriculum(_docs(sf_dir))


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup (cluster-then-dedup): k-means partition + per-cluster
    exact cosine with keep-lowest-id — paraphrase-level dedup text
    hashing can't see. Rows-only (k-means is iterative, not
    SQL-expressible); within-cluster equality vs the brute-force
    survivor set is pinned in pytest."""
    from fluent_server_ray.stages.similarity import semantic_dedup

    return semantic_dedup(_embs(sf_dir), threshold=COSINE_DUP_T,
                          n_clusters=8, n_iter=3)


def _q_bigram_logprob(sf_dir: str):
    """Bigram-LM quality score under the corpus's own conditional
    bigram model: word order now matters (vs the unigram bag-of-words
    score); integer-millionths contract, bit-exact vs SQL."""
    from fluent_server_ray.stages.textstats import doc_bigram_logprob

    return doc_bigram_logprob(_docs(sf_dir))


def _q_turns_prior_event(sf_dir: str):
    """Generic TWO-DATASET as-of join on the flagship: attach each
    transcript turn's user's most recent event STRICTLY BEFORE the
    turn (deploy-onto-logs / reading-onto-trade shape). One unioned
    cogrouped exchange + one merge_asof per bucket; mirrored by
    DuckDB ASOF LEFT JOIN with the same strict inequality."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.joins import asof_join

    left = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "ts"])

    def add_user(t: pa.Table) -> pa.Table:
        uid = pc.cast(pc.utf8_slice_codeunits(t["conv_id"], 5, 99),
                      pa.int64())
        return t.append_column("user_id", uid)

    left = left.map_batches(add_user, batch_format="pyarrow",
                            zero_copy_batch=True)
    right = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id"])
    out = asof_join(left, right, key="user_id",
                    attach={"event_id": "prior_event_id"},
                    allow_exact_matches=False)
    return out.select_columns(
        ["conv_id", "turn_idx", "prior_event_id"]
    ).sort(["conv_id", "turn_idx"])


def _q_turns_prior_event_ts(sf_dir: str):
    """As-of join attaching the matched RIGHT TIMESTAMP itself ("when
    was the user's prior event") alongside the event id — exercises
    the pre-rename-copy attach path and the typed (non-float64)
    matched-column convention: prior_ts stays timestamp[us], NULL
    (NaT) where no prior event exists."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.joins import asof_join

    left = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "ts"])

    def add_user(t: pa.Table) -> pa.Table:
        uid = pc.cast(pc.utf8_slice_codeunits(t["conv_id"], 5, 99),
                      pa.int64())
        return t.append_column("user_id", uid)

    left = left.map_batches(add_user, batch_format="pyarrow",
                            zero_copy_batch=True)
    right = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id"])
    out = asof_join(left, right, key="user_id",
                    attach={"event_id": "prior_event_id",
                            "ts": "prior_ts"},
                    allow_exact_matches=False)
    return out.select_columns(
        ["conv_id", "turn_idx", "prior_event_id", "prior_ts"]
    ).sort(["conv_id", "turn_idx"])


def _q_ts_id_corr(sf_dir: str):
    """Pearson over LARGE-MAGNITUDE integers (epoch-seconds vs
    event_id): Σx² per block exceeds what a bound-check can prove
    int64-safe, driving the python-int exact partial path; the mirror
    subtracts in HUGEINT. A silent int64 wrap or a float64
    cancellation would diverge from the oracle here."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.features import pearson_corr

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_id"])

    def derive(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())  # timestamp[us] -> micros
        return pa.table({
            "x": pc.divide(us, pa.scalar(1_000_000, pa.int64())),
            "y": t["event_id"],
        })

    return pearson_corr(
        ev.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True), "x", "y")


def _q_len_token_corr(sf_dir: str):
    """Exact-partials Pearson correlation (chars vs tokens per doc) —
    the corpus-health correlation check: int64 combiner sums, python-
    int merge, ONE declared float64 tree (bit-exact vs the SQL
    mirror, never SQL corr() whose accumulation order is
    engine-defined)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.features import pearson_corr
    from fluent_server_ray.stages.textstats import TOKEN_RE

    def derive(t: pa.Table) -> pa.Table:
        return pa.table({
            "x": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            "y": pc.cast(pc.count_substring_regex(t["text"], TOKEN_RE),
                         pa.int64()),
        })

    return pearson_corr(
        _docs(sf_dir).map_batches(derive, batch_format="pyarrow",
                                  zero_copy_batch=True), "x", "y")


def _q_extract_args(sf_dir: str):
    """Typed field extraction over the FLAGSHIP text (fluentd parser
    filter on the live stream): pull the tool-call query argument out
    of `args={"q":"..."}` — one vectorized extract_regex, NULL where
    the turn is not a tool call."""
    import pyarrow as pa

    from fluent_server_ray.stages.fields import extract_fields

    ARGS_FIELDS = (("q", r'args=\{"q":"([a-z]+)"\}', pa.string(),
                    "VARCHAR"),)
    return extract_fields(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"]),
        fields=ARGS_FIELDS, src_col="text",
        id_cols=("conv_id", "turn_idx"),
    )


def _q_sink_size_quantiles(sf_dir: str):
    """Per-sink message-size p50/p95/p99 over the flagship route — the
    payload-size SLO dashboard; histogram-sketch quantiles, integer
    bucket contract."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.sketches import grouped_binned_quantiles

    routed = build_routed(sf_dir, columns=["sink", "text"])

    def size(t: pa.Table) -> pa.Table:
        return pa.table({
            "sink": t["sink"],
            "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
        })

    sized = routed.map_batches(size, batch_format="pyarrow",
                               zero_copy_batch=True)
    return grouped_binned_quantiles(sized, "sink", "n_chars",
                                    lo=0.0, hi=128.0, bins=128)


def _q_events_profile(sf_dir: str):
    """Dataset profiling card (rows / nulls / exact distinct per
    column): one pruned null-count pass + one two-level exact distinct
    per column — the pre-flight a pipeline records next to its
    output."""
    from fluent_server_ray.stages.features import profile_table

    cols = ["event_id", "user_id", "event_type", "props"]
    return profile_table(
        lambda: read_parquet_clean(f"{sf_dir}/events.parquet",
                                   columns=cols),
        cols,
    )


def _q_lm_tokenize_pack(sf_dir: str):
    """END-TO-END tokenizer-true packing: train an 8-merge BPE on the
    corpus, encode every doc, pack sequences by the REAL encoded token
    counts (not a whitespace proxy) — the tokenize→pack tail of an LM
    data pipeline in one lazy composition. STRICT oracle: the
    unrolled-CTE encode mirror feeds the same window-cumsum pack
    SQL."""
    from fluent_server_ray.stages.assembly import pack_sequences
    from fluent_server_ray.stages.bpe import bpe_encode, bpe_train_adaptive

    docs = _docs(sf_dir)
    merges = bpe_train_adaptive(docs, n_merges=8)
    encoded = bpe_encode(_docs(sf_dir), merges)
    return pack_sequences(encoded, n_col="n_tokens")


def _q_log_templates(sf_dir: str):
    """Log-template mining (Drain-lite): mask quoted strings + number
    runs → template, combiner-first count with a distributed final
    merge — the first dashboard a log pipeline derives from the raw
    stream."""
    from fluent_server_ray.stages.fields import log_templates

    return log_templates(read_transcripts(sf_dir, columns=["text"]))


def _q_events_throttle(sf_dir: str):
    """fluent-plugin-throttle: at most 3 events per (event_type,
    1-hour tumbling window), first-come by (ts, event_id) — one
    key-bucket exchange + one vectorized cumcount quota."""
    from fluent_server_ray.stages.windows import throttle

    return throttle(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "event_type", "ts"]),
        width_seconds=3600, limit=3,
    )


def _q_conv_merge_roles(sf_dir: str):
    """Chat-format normalization: merge CONSECUTIVE same-role turns
    into one message (fluentd concat analogue / training-API
    constraint) — gaps-and-islands over one conv bucket exchange."""
    from fluent_server_ray.stages.assembly import conv_merge_roles

    return conv_merge_roles(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "role",
                                          "text"]))


def _q_conv_structure(sf_dir: str):
    """Per-conversation structure validation (chat-data quality gate):
    role alternation, first/last speaker, and agent-loop detection
    (longest identical (role,text) run) — one conv_id bucket exchange
    + whole-bucket gaps-and-islands kernels."""
    from fluent_server_ray.stages.assembly import conv_structure

    return conv_structure(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "role",
                                          "text"]))


def _q_lm_prep(sf_dir: str):
    """End-to-end LM training-set prep (scrub → gate → dedup → split)
    composed in one lazy graph; the whole chain is oracle-checked."""
    from fluent_server_ray.pipelines.curation import lm_prep_documents

    return lm_prep_documents(_docs(sf_dir))


def _q_rank_in_group(sf_dir: str):
    """dense_rank() OVER (PARTITION BY event_type ORDER BY value DESC)
    via one group-key bucket exchange + whole-bucket segmented rank."""
    from fluent_server_ray.stages.features import rank_in_group

    return rank_in_group(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "event_type", "value"]))


def _q_prompt_completion(sf_dir: str):
    """SFT pair mining: (user turn → immediately-following assistant
    turn) training pairs per conversation — one conv-bucket exchange,
    vectorized groupby shift. Oracle: window lead()."""
    from fluent_server_ray.stages.assembly import prompt_completion_pairs

    return prompt_completion_pairs(read_transcripts(sf_dir))


def _q_fim(sf_dir: str):
    """Fill-in-the-middle transform (PSM, Bavarian et al. 2022):
    deterministic md5-derived character cuts, pure per-batch map —
    mirrored bit-for-bit via DuckDB md5_number_upper + substr."""
    from fluent_server_ray.stages.assembly import fim_transform

    return fim_transform(_docs(sf_dir))


def _q_vocab_coverage(sf_dir: str):
    """Per-doc coverage of the global top-100 vocabulary (tokenizer-
    fit / domain-shift diagnostic): vocab combiner + word-bucket
    exchange, then one segmented per-batch pass; integer millionths."""
    from fluent_server_ray.stages.textstats import vocab_coverage

    return vocab_coverage(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]))


def _q_stratified_split(sf_dir: str):
    """EXACT-quota stratified train/val/test split per source: within-
    stratum (md5(id), id) rank against ⌊n·f⌋ quota boundaries — the
    split whose per-stratum proportions are exact to the row."""
    from fluent_server_ray.stages.sampling import stratified_split

    return stratified_split(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"]))


def _q_token_triangles(sf_dir: str):
    """Exact triangle count of the corpus word-adjacency graph via the
    degree-oriented (compact-forward) plan — O(m^1.5) wedge work
    regardless of hub skew (Suri & Vassilvitskii's 'curse of the last
    reducer' dodge). Oracle: 3-way distinct-edge self-join."""
    from fluent_server_ray.stages.graph import (token_adjacency_edges,
                                                triangle_count)

    edges = token_adjacency_edges(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["text"]))
    return triangle_count(edges)


def _q_orders_price_band(sf_dir: str):
    """Band (θ-proximity) self-join: order pairs whose totals differ
    by ≤ $1 (integer cents) — grid-cell + ghost-copy exchange, every
    qualifying pair local to one cell. Oracle: DuckDB IEJoin."""
    from fluent_server_ray.stages.joins import band_join_pairs

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_totalprice"])

    def cents(t):
        import pyarrow as pa
        import pyarrow.compute as _pc

        v = _pc.floor(_pc.add(_pc.multiply(t["o_totalprice"], 100.0),
                              0.5))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "cents": v.cast(pa.int64())})

    ob = orders.map_batches(cents, batch_format="pyarrow",
                            zero_copy_batch=True)
    return band_join_pairs(ob, "o_orderkey", "cents", eps=100)


def _q_cusum(sf_dir: str):
    """CUSUM sequential drift detection over per-type daily volumes
    (Page 1954): bounded daily-count combiner, driver-side integer
    recursion, recursive-CTE mirror — catches sustained small shifts
    the per-day z-score monitor misses."""
    from fluent_server_ray.stages.features import cusum_flags

    return cusum_flags(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]),
        k=70, h=25)


def _q_ntile(sf_dir: str):
    """SQL NTILE(4) per event type ordered by (value, id) — exact
    window-function tile semantics (first n%q tiles one larger) via a
    group-bucket exchange + segmented vectorized tiling."""
    from fluent_server_ray.stages.features import ntile

    return ntile(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value", "event_id"]),
        "event_type", "value", "event_id", q=4)


def _q_event_motifs(sf_dir: str):
    """Sequential-pattern mining: top-50 consecutive event-type
    trigrams across per-user timelines — user-bucket exchange +
    segmented shifts, vocab-top-k merge shape."""
    from fluent_server_ray.stages.windows import event_motifs

    return event_motifs(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "event_type",
                                    "event_id"]))


def _q_event_markov(sf_dir: str):
    """Laplace-smoothed Markov transition matrix over per-user event
    sequences, integer-millionths probabilities — distributed pair
    counts, |states|² driver grid."""
    from fluent_server_ray.stages.windows import event_markov_probs

    return event_markov_probs(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "event_type",
                                    "event_id"]))


def _q_k_anonymity(sf_dir: str):
    """k-anonymity audit over the (event_type, day) quasi-identifier:
    class sizes + at-risk flags, distributed grouped count — the
    privacy gate before a dataset release."""
    import pyarrow.compute as _pc

    from fluent_server_ray.stages.hygiene import k_anonymity

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def derive(t):
        import pyarrow as pa

        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"event_type": t["event_type"],
                         "day": pa.array(us // 86_400_000_000)})

    return k_anonymity(ev.map_batches(derive, batch_format="pyarrow",
                                      zero_copy_batch=True),
                       ["event_type", "day"], k=55)


def _q_user_profile_outer(sf_dir: str):
    """FULL OUTER join at driver level: per-user high-value purchase
    counts ⟗ high-value error counts — one-sided users keep NULL on
    the missing side (the fill-side float64 dtype policy, driver-
    checked)."""
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.joins import bucketed_hash_join

    def side(typ: str, out_name: str):
        import pyarrow as pa
        import pyarrow.compute as _pc

        ev = read_parquet_clean(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "value"])

        def partial(t):
            m = _pc.and_(_pc.equal(t["event_type"], typ),
                         _pc.greater(t["value"], 150.0))
            out = (t.filter(m).select(["user_id"])
                   .group_by("user_id").aggregate([([], "count_all")]))
            return out.rename_columns(["user_id", "c"])

        agg = grouped_agg(
            ev.map_batches(skip_empty(partial), batch_format="pyarrow",
                           zero_copy_batch=True),
            keys=["user_id"], aggs=[("c", "sum")], final="ray")

        def rn(t):
            return t.rename_columns(["user_id", out_name])

        return agg.map_batches(rn, batch_format="pyarrow",
                               zero_copy_batch=True)

    j = bucketed_hash_join(side("purchase", "n_purchase"),
                           side("error", "n_error"),
                           key="user_id", how="outer")
    return j.sort("user_id")


def _q_token_bfs(sf_dir: str):
    """Distributed level-synchronous BFS over the (symmetrized) word-
    adjacency graph from its most frequent token — single-source
    shortest paths as bucketed frontier joins; depth-capped
    recursive-CTE mirror."""
    from fluent_server_ray.stages.graph import (bfs_distances,
                                                token_adjacency_edges)
    from fluent_server_ray.stages.textstats import vocab_top_words

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["text"]).materialize()
    edges = token_adjacency_edges(docs)
    source = vocab_top_words(docs, k=1)["word"][0].as_py()

    def both_dirs(t):
        import pyarrow as pa

        return pa.table({
            "src": pa.concat_arrays([t["lo"].combine_chunks(),
                                     t["hi"].combine_chunks()]),
            "dst": pa.concat_arrays([t["hi"].combine_chunks(),
                                     t["lo"].combine_chunks()]),
        })

    sym = edges.map_batches(both_dirs, batch_format="pyarrow",
                            zero_copy_batch=True)
    # n_buckets=8: each BFS round is two bucketed exchanges whose
    # FIXED cost scales with bucket count — at battery scale the
    # frontier is tiny; at corpus scale raise it with the cluster
    return bfs_distances(sym, source, max_depth=4, n_buckets=8)


def _q_mutual_information(sf_dir: str):
    """Mutual information lang × source in floored integer micronats
    (the feature-dependence metric beside the chi-square pair) —
    distributed contingency combiner, one exact division at the end."""
    from fluent_server_ray.stages.features import mutual_information

    return mutual_information(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source"]))


def _q_benford(sf_dir: str):
    """Benford first-digit audit of order totals per priority class —
    fabricated-data / ingestion-bug screen: integer-cents first digit
    via the half-away cents contract, pinned expected millionths,
    bounded grouped-count combiner."""
    from fluent_server_ray.stages.features import benford_audit

    return benford_audit(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_totalprice", "o_orderpriority"]))


def _q_association_rules(sf_dir: str):
    """Market-basket association rules user_id x event_type (support /
    confidence / lift in integer millionths): local-distinct combiner,
    one basket bucket exchange, sentinel-row item/total partials on
    the same pass, bounded |items|^2 driver merge."""
    from fluent_server_ray.stages.features import association_rules

    return association_rules(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type"]),
        min_support=1)


def _q_volume_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of per-type daily event volumes — the
    trend-persistence screen beside CUSUM; bounded daily combiner,
    pearson exact-integer float tree per key."""
    from fluent_server_ray.stages.features import volume_autocorr

    return volume_autocorr(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]))


def _q_token_kcore(sf_dir: str):
    """k-core membership (k=16) of the word-adjacency graph —
    synchronous distributed peel (degree count -> survivor filter ->
    two-sided edge semi-join per round) with the size-adaptive driver
    continuation; unrolled MATERIALIZED-CTE mirror."""
    from fluent_server_ray.stages.graph import (kcore,
                                                token_adjacency_edges)

    edges = token_adjacency_edges(_docs(sf_dir))
    return kcore(edges, k=16)


def _mod4(t):
    import pyarrow.compute as pc

    # pyarrow 16 has no pc.modulo: a - (a//4)*4 (the house identity)
    a = t["event_id"]
    return pc.subtract(a, pc.multiply(pc.divide(a, 4), 4))


def _q_counts_maintained(sf_dir: str):
    """Incremental materialized-view maintenance of per-(type, day)
    event counts: base shard applied, delta shard applied, delta
    REPLAYED (lost-ack retry — must be a ledgered no-op); the
    maintained view must equal the full-recompute GROUP BY oracle."""
    import hashlib
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import maintain_counts

    store = ("/tmp/fsr_scratch/counts_view_"
             + hashlib.md5(sf_dir.encode()).hexdigest()[:8])
    shutil.rmtree(store, ignore_errors=True)
    os.makedirs(store, exist_ok=True)

    def proj(t):
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t["event_type"],
            "day": pa.array(us // 86_400_000_000),
            "event_id": t["event_id"],
        })

    # materialize: ds feeds base + delta, and the delta applies twice
    # — a lazy graph would re-run the read/projection three times
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "ts"]).map_batches(
        proj, batch_format="pyarrow", zero_copy_batch=True).materialize()
    base = ds.map_batches(
        lambda t: t.filter(pc.not_equal(_mod4(t), 0)),
        batch_format="pyarrow", zero_copy_batch=True)
    delta = ds.map_batches(
        lambda t: t.filter(pc.equal(_mod4(t), 0)),
        batch_format="pyarrow", zero_copy_batch=True)
    keys = ["event_type", "day"]
    maintain_counts(store, base, keys, "base")
    maintain_counts(store, delta, keys, "delta-0")
    # replay the SAME delta id: ledger makes it exactly-once
    return maintain_counts(store, delta, keys, "delta-0")


def _q_column_topk(sf_dir: str):
    """Profiler "common values" panel: top-3 most frequent values per
    events column (int/timestamp/string — floats refused by
    contract); vocab-top-k shape generalized across columns."""
    from fluent_server_ray.stages.profile import column_topk

    return column_topk(
        read_parquet_clean(
            f"{sf_dir}/events.parquet",
            columns=["event_type", "user_id", "props"]),
        columns=["event_type", "user_id", "props"], k=3)


def _q_funnel_abandonment(sf_dir: str):
    """Funnel ABANDONMENT (the negation the product team actually
    reads): per anchored user, the furthest step reached in the
    signup -> click -> purchase chain and whether they completed —
    derived from the greedy-earliest funnel in one vectorized map."""
    import pyarrow as pa
    import pyarrow.compute as pc

    funnel = _q_multi_funnel(sf_dir)

    def furthest(t):
        f = pc.add(
            pc.add(pa.array([1] * t.num_rows, pa.int64()),
                   pc.cast(pc.is_valid(t["step2_ts"]), pa.int64())),
            pc.cast(pc.is_valid(t["step3_ts"]), pa.int64()))
        return pa.table({
            "user_id": t["user_id"],
            "furthest_step": f,
            "completed": t["completed"],
        })

    return funnel.map_batches(furthest, batch_format="pyarrow",
                              zero_copy_batch=True)


def _q_fuzzy_best(sf_dir: str):
    """End-to-end record linkage: fuzzy candidates (odd-doc
    first-char corruption vs the clean table, byte Levenshtein <= 2)
    reduced to the BEST match per dirty row (min dist, then smallest
    clean id) — the resolve step after blocking+verify; one pair
    bucket exchange for the per-left argmin."""
    import pandas as pd
    import pyarrow as pa

    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.groups import map_buckets

    pairs = _q_fuzzy_match(sf_dir)

    schema = pa.schema([pa.field("id_l", pa.int64()),
                        pa.field("id_r", pa.int64()),
                        pa.field("dist", pa.int64())])

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["id_l", "dist", "id_r"])
        return g.groupby("id_l", sort=False).head(1)[
            ["id_l", "id_r", "dist"]]

    return map_buckets(_with_bucket(pairs, "id_l", 16), best,
                       schema).sort("id_l")


def _q_changepoint(sf_dir: str):
    """Change-point localization per event type (binary segmentation,
    one split): CUSUM says THAT a shift happened, this says WHEN —
    floored integer gain contract keeps the argmax identical across
    engines."""
    from fluent_server_ray.stages.features import changepoint_split

    return changepoint_split(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]))


def _q_fd_audit(sf_dir: str):
    """Functional-dependency audit: does o_custkey determine
    o_orderpriority? (It doesn't — the violation rate is the
    point.) Distinct-rhs-per-lhs via the value-hash exchange,
    bounded histogram collapse."""
    from fluent_server_ray.stages.profile import fd_violations

    return fd_violations(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey", "o_orderpriority"]),
        "o_custkey", "o_orderpriority")


def _q_order_audit(sf_dir: str):
    """Sequence-sanity audit over transcripts: adjacent turn pairs
    (by turn_idx) whose event time does not strictly increase —
    the clock-skew / replay detector."""
    from fluent_server_ray.stages.profile import order_audit

    return order_audit(read_transcripts(
        sf_dir, columns=["conv_id", "turn_idx", "ts"]))


def _q_pareto(sf_dir: str):
    """Pareto / ABC whale curve: users dealt into 10 exact NTILE
    tiles by descending total cents, cumulative revenue share in
    millionths."""
    from fluent_server_ray.stages.features import pareto_shares

    return pareto_shares(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "value"]), q=10)


def _q_orders_skyline(sf_dir: str):
    """2-D skyline (Pareto frontier): distinct (price, date) points
    with no order both at-most-as-expensive and at-least-as-recent —
    per-block vectorized frontier sweep, bounded candidate merge."""
    from fluent_server_ray.stages.frontier import orders_skyline

    return orders_skyline(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_totalprice", "o_orderdate"],
                           override_num_blocks=8))


def _q_phrase_match(sf_dir: str):
    """Exact-phrase search ("data slow" as adjacent tokens): map-only
    flatten + searchsorted range-count, no exchange at any scale."""
    from fluent_server_ray.stages.textstats import phrase_match

    return phrase_match(_docs(sf_dir), "data", "slow", window=1)


def _q_proximity_match(sf_dir: str):
    """NEAR/4 proximity search ("merge" then "group" within 4
    tokens): same kernel, window widened."""
    from fluent_server_ray.stages.textstats import phrase_match

    return phrase_match(_docs(sf_dir), "merge", "group", window=4)


def _q_theilsen(sf_dir: str):
    """Per-event-type Theil–Sen slope of daily revenue cents vs day
    number — robust trend (median of pairwise slopes); corpus
    collapses to the bounded (group × day) table in one combiner
    pass, pair formation on the calendar-bounded daily table."""
    from fluent_server_ray.stages.features import theilsen_trend

    return theilsen_trend(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_mannwhitney(sf_dir: str):
    """Mann-Whitney U / rank-sum AUC for every event-type pair —
    exact doubled-midrank integers over the distinct-value histogram
    (one combiner pass; pair formation on the bounded G×V table)."""
    from fluent_server_ray.stages.features import mannwhitney_pairs

    return mannwhitney_pairs(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value"]))


def _q_km_survival(sf_dir: str):
    """Kaplan-Meier churn curve over user lifetimes (right-censored
    in the final week) — per-user span combiner, calendar-bounded
    histogram, floored integer-millionths product-limit recurrence."""
    from fluent_server_ray.stages.features import km_survival

    return km_survival(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts"]))


def _q_item_cooc(sf_dir: str):
    """Item-item co-occurrence affinity (users-who-did-A-also-did-B):
    distinct (user,item) combiner, user-bucket pair exchange, bounded
    item×item partials; exact counts + millionths Jaccard + two-op
    bit-exact cosine."""
    from fluent_server_ray.stages.features import item_cooccurrence

    return item_cooccurrence(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type"]))


def _q_seasonal_dow(sf_dir: str):
    """Day-of-week seasonal index per event type (multiplicative
    seasonality panel): calendar-bounded daily-cents combiner, exact
    python-int ratio in millionths, epoch-anchored dow arithmetic."""
    from fluent_server_ray.stages.features import seasonal_dow_index

    return seasonal_dow_index(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_twap(sf_dir: str):
    """Time-weighted average value per event type (step-function
    integral / span): day-segmented integration in a day-bucket
    exchange, python-int/HUGEINT numerators, driver stitches the
    cross-day carries; (ts, cents) tie order is part of the
    contract."""
    from fluent_server_ray.stages.features import twap_by_group

    return twap_by_group(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_boolean_search(sf_dir: str):
    """Boolean conjunction search: docs with "data" AND "slow" AND
    NOT "spark" — map-only per-term vectorized counts, no exchange."""
    from fluent_server_ray.stages.textstats import boolean_search

    return boolean_search(_docs(sf_dir), must=["data", "slow"],
                          must_not=["spark"])


def _q_token_clustering(sf_dir: str):
    """Local clustering coefficient per word of the adjacency graph
    (distributed distinct-edge combiner, dense driver continuation on
    the vocab-bounded node set; millionths floor contract)."""
    from fluent_server_ray.stages.graph import (clustering_coefficients,
                                                token_adjacency_edges)

    return clustering_coefficients(token_adjacency_edges(_docs(sf_dir)))


def _q_trimmed_mean(sf_dir: str):
    """10% two-sided trimmed mean of value cents per event type —
    exact rank-window multiplicities over the distinct-cents
    histogram (one combiner pass), one floor division."""
    from fluent_server_ray.stages.features import trimmed_mean

    return trimmed_mean(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value"]))


def _q_kendall_volumes(sf_dir: str):
    """Kendall tau-b between click and purchase daily volumes —
    exact concordant/discordant/tie integers over the calendar-
    bounded day-pair set, two-op bit-exact float tail."""
    from fluent_server_ray.stages.features import kendall_daily_volumes

    return kendall_daily_volumes(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]))


def _q_autocomplete(sf_dir: str):
    """Type-ahead index: top-3 completions per 2-char word prefix —
    explode+count combiner, one prefix-bucket exchange (per-bucket
    top-k is final), O(prefixes×k) driver concat."""
    from fluent_server_ray.stages.textstats import autocomplete_topk

    return autocomplete_topk(_docs(sf_dir))


def _q_concordance(sf_dir: str):
    """KWIC concordance of "merge" (±2 tokens of context per
    occurrence) — map-only, context assembly loops over matches."""
    from fluent_server_ray.stages.textstats import concordance

    return concordance(_docs(sf_dir), "merge", width=2)


def _q_order_reconciliation(sf_dir: str):
    """Invoice-vs-ledger reconciliation: order header totals vs
    summed line charges with orphan detection both ways — per-line
    fixed float tree to cents, distributed per-order partials, one
    bucketed outer join; order-sized Dataset result."""
    from fluent_server_ray.stages.profile import order_reconciliation

    return order_reconciliation(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_totalprice"]),
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_extendedprice",
                                    "l_discount", "l_tax"]))


def _q_token_assortativity(sf_dir: str):
    """Degree assortativity (do hub words neighbor hub words): two
    bucketed degree joins over edge stubs, exact-partials Pearson."""
    from fluent_server_ray.stages.graph import (degree_assortativity,
                                                token_adjacency_edges)

    return degree_assortativity(token_adjacency_edges(_docs(sf_dir)))


def _q_daily_interp(sf_dir: str):
    """Daily-grid resample with integer-floored LINEAR interpolation
    per event type (gap days lerped between observed neighbors) —
    calendar-bounded daily combiner, driver numpy sweep."""
    from fluent_server_ray.stages.features import daily_interpolate

    return daily_interpolate(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_id_gaps(sf_dir: str):
    """Sequence-completeness audit: missing id ranges of the
    purchase-event subsequence (the full id space is dense, so the
    filtered view is the non-trivial audit) — range-partitioned
    sorted-diff kernel per id bucket, driver stitches the bounded
    per-bucket boundary table."""
    import pyarrow.compute as _pc

    from fluent_server_ray.stages.profile import id_gap_audit

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type"])
    return id_gap_audit(ds.map_batches(
        lambda t: t.filter(_pc.equal(t["event_type"], "purchase"))
        .select(["event_id"]),
        batch_format="pyarrow", zero_copy_batch=True))


def _q_runs_test(sf_dir: str):
    """Wald-Wolfowitz runs test on day-over-day revenue move signs
    per event type — exact run/sign integers from the daily-cents
    combiner, fixed float z tree."""
    from fluent_server_ray.stages.features import runs_test_daily

    return runs_test_daily(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_simpson_diversity(sf_dir: str):
    """Simpson vocabulary concentration per source (probability two
    random tokens match) — distributed (source,word) merge, python-
    int/HUGEINT moment partials, one floor division."""
    from fluent_server_ray.stages.textstats import (
        simpson_diversity_by_source)

    return simpson_diversity_by_source(_docs(sf_dir))


def _q_churn_labels(sf_dir: str):
    """Leakage-free churn-label generation: per active (user, week),
    that week's features + was-active-next-week label — one (user,
    week) combiner materialized once, one bucketed left self-join."""
    from fluent_server_ray.stages.features import churn_labels

    return churn_labels(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "value"]))


def _q_weighted_quantiles(sf_dir: str):
    """Quantity-weighted price quartiles per returnflag (the median
    price of a UNIT sold) — (group,cents) weight-sum combiner, exact
    ceil(q·W) integer rank picks on the bounded histogram."""
    from fluent_server_ray.stages.features import weighted_quantiles

    return weighted_quantiles(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_returnflag", "l_extendedprice",
                                    "l_quantity"]),
        group_col="l_returnflag", value_col="l_extendedprice",
        weight_col="l_quantity")


def _q_fano(sf_dir: str):
    """Fano overdispersion of daily volumes per event type (Poisson-
    ness check) — daily count combiner, python-int/HUGEINT moments,
    one floor division to millionths."""
    from fluent_server_ray.stages.features import fano_dispersion

    return fano_dispersion(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]))


def _q_spearman_volumes(sf_dir: str):
    """Spearman rho between click and purchase daily volumes —
    doubled midranks, exact integer moments, one bit-exact float
    tree (the grade sibling of the Kendall query)."""
    from fluent_server_ray.stages.features import spearman_daily_volumes

    return spearman_daily_volumes(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]))


def _q_gate_funnel(sf_dir: str):
    """Curation drop-off accounting: survivors after each gate-chain
    prefix (input -> tokens -> alpha -> exact dedup -> md5 sample) —
    combiner sums + distinct-text merge, exact at every stage."""
    from fluent_server_ray.pipelines.curation import curation_gate_funnel

    return curation_gate_funnel(_docs(sf_dir))


def _q_l_diversity(sf_dir: str):
    """l-diversity release gate over (event_type, day) classes with
    user_id as the sensitive attribute — two distributed rollups,
    audit never lands on the driver."""
    from fluent_server_ray.stages.hygiene import l_diversity

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "user_id"])

    def derive(t):
        import pyarrow as pa

        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"event_type": t["event_type"],
                         "day": pa.array(us // 86_400_000_000),
                         "user_id": t["user_id"]})

    return l_diversity(ev.map_batches(derive, batch_format="pyarrow",
                                      zero_copy_batch=True),
                       ["event_type", "day"], "user_id", l_min=40)


def _q_new_vs_returning(sf_dir: str):
    """Growth accounting: daily new vs returning distinct users —
    one (user,day) distinct combiner materialized for its two
    consumers (first-day mins, daily actives)."""
    from fluent_server_ray.stages.features import new_vs_returning

    return new_vs_returning(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts"]))


def _q_role_latency(sf_dir: str):
    """Response latency per role transition (user->assistant vs
    tool->assistant ...): conv-bucket exchange, vectorized lag,
    bounded |roles|² partials, integer-micros mean."""
    from fluent_server_ray.stages.assembly import role_transition_latency

    return role_transition_latency(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx",
                                          "role", "ts"]))


def _q_ship_latency(sf_dir: str):
    """Order-fulfillment SLA: ship-latency p50/p90/p99/max days per
    priority — one bucketed join, calendar-bounded histogram
    combiner, exact ceil(q·n) integer rank picks."""
    from fluent_server_ray.stages.features import ship_latency_quantiles

    return ship_latency_quantiles(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_orderdate",
                                    "o_orderpriority"]),
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_shipdate"]))


def _q_ewma_daily(sf_dir: str):
    """Trailing-7-day EWMA of daily revenue per event type — exact
    power-of-two weights, clipped geometric denominator, integer
    millicents; calendar-grid convolution on the bounded daily
    table."""
    from fluent_server_ray.stages.features import ewma_daily

    return ewma_daily(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_session_entry_exit(sf_dir: str):
    """Session landing/exit report: (entry type, exit type) path
    counts + bounces over 30-min session windows — key-bucket
    exchange, segmented sessionizer, bucket-local |types|² counts."""
    from fluent_server_ray.stages.windows import session_entry_exit

    return session_entry_exit(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "event_id",
                                    "event_type"]))


def _q_outlier_days(sf_dir: str):
    """Robust holiday/incident screen: days whose volume deviates
    > 3×MAD from the per-type median — lower-median exact-int
    contract on the calendar-bounded daily counts."""
    from fluent_server_ray.stages.features import outlier_days_mad

    return outlier_days_mad(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]))


def _q_cross_source_dups(sf_dir: str):
    """Cross-source contamination screen: histogram of 4-token
    prefix keys shared by k>1 sources (blocking-key leakage exact
    equality misses) — distinct-pair combiner, per-key rollup,
    bounded histogram; corpus never on the driver."""
    from fluent_server_ray.stages.dedup import cross_source_dup_histogram

    return cross_source_dup_histogram(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["text", "source"]),
        key_tokens=4)


def _q_longest_streak(sf_dir: str):
    """Gaps-and-islands: longest consecutive-active-day streak per
    user — distinct (user, day) combiner, one key-bucket exchange,
    segmented day-minus-rank island kernel."""
    from fluent_server_ray.stages.windows import longest_streak

    return longest_streak(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts"],
                           override_num_blocks=8))


def _q_state_intervals(sf_dir: str):
    """Run-length state intervals (SCD-style history): consecutive
    equal event_type runs per user collapsed to validity intervals,
    segmented shift-compare + cumsum inside one bucket exchange."""
    from fluent_server_ray.stages.windows import state_intervals

    return state_intervals(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           override_num_blocks=8))


def _q_cube_counts(sf_dir: str):
    """GROUP BY CUBE (priority, status): one finest-level combiner
    pass; every marginal is a re-aggregation of the bounded partial
    table."""
    from fluent_server_ray.pipelines.relational import cube_order_counts

    return cube_order_counts(sf_dir)


def _q_quantile_normalize(sf_dir: str):
    """Quantile normalization of event values across types
    (distribution alignment): exact within-group ranks mapped onto the
    pooled order statistics via a broadcast distinct-value cumsum."""
    from fluent_server_ray.stages.features import quantile_normalize

    return quantile_normalize(
        read_parquet_clean(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "event_type", "value"]))


def _q_label_transfer(sf_dir: str):
    """Label transfer across near-dup components (weak supervision):
    even doc_ids keep their lang label, odd doc_ids inherit their
    component's mode label; unlabeled components stay NULL. Fully
    distributed (hash-min components, distributed mode, bucketed
    joins); closure + row_number mode mirror."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.dedup import (ngram_jaccard_dupes,
                                                transfer_labels)

    pairs = ngram_jaccard_dupes(_docs(sf_dir), threshold=0.8)

    def lbl(t):
        even = pc.equal(
            pc.subtract(t["doc_id"],
                        pc.multiply(pc.divide(t["doc_id"], 2), 2)), 0)
        return pa.table({
            "doc_id": t["doc_id"],
            "label": pc.if_else(even, t["lang"],
                                pa.nulls(t.num_rows, pa.string())),
        })

    labels = _docs(sf_dir).map_batches(lbl, batch_format="pyarrow",
                                       zero_copy_batch=True)
    # n_buckets=8: five bucketed exchanges whose FIXED cost scales
    # with bucket count — tiny at battery scale (the BFS precedent);
    # raise with the cluster at corpus scale
    return transfer_labels(pairs, labels, n_buckets=8)


def _q_sliding_distinct(sf_dir: str):
    """Exact distinct users per SLIDING window (1h window, 30min
    slide): phase-shift explode then the two-level distinct — only
    distinct (window, user) pairs shuffle."""
    from fluent_server_ray.stages.windows import sliding_distinct_users

    return sliding_distinct_users(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts"]),
        width_seconds=3600, slide_seconds=1800)


def _q_rolling_sum(sf_dir: str):
    """Per-user rolling 5-event value sum (ROWS frame) in exact
    integer cents — difference of two segmented cumsums, one key
    bucket exchange."""
    from fluent_server_ray.stages.windows import rolling_frame_sum

    return rolling_frame_sum(
        read_parquet_clean(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "ts", "value"]),
        window_rows=5)


def _q_sorted_neighborhood(sf_dir: str):
    """Sorted-Neighborhood blocking candidates (window 8 over the
    4-codepoint sort key): exact distributed rank (bounded bkey
    histogram + within-key cumcount exchange) + rank-window ghost
    buckets; row_number self-join mirror."""
    from fluent_server_ray.stages.dedup import sorted_neighborhood_pairs

    return sorted_neighborhood_pairs(_docs(sf_dir), key_len=4,
                                     window=8)


def _q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth at doc_id deciles: per-word min
    first-occurrence through the distributed merge, sentinel-row
    token/doc counters on the same pass, |boundaries|-bounded
    histogram collapse."""
    from fluent_server_ray.stages.textstats import vocab_growth

    return vocab_growth(_docs(sf_dir),
                        boundaries=[49 + 50 * i for i in range(10)])


def _q_multi_funnel(sf_dir: str):
    """3-step greedy-earliest funnel signup -> click -> purchase
    within 7 days: pushed type filter, one key bucket exchange,
    whole-bucket min-after-min C kernels; chain-of-CTEs mirror."""
    from fluent_server_ray.stages.windows import multi_funnel

    return multi_funnel(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type", "ts"]),
        steps=("signup", "click", "purchase"),
        within_seconds=7 * 86400)


def _q_volume_xcorr(sf_dir: str):
    """Lead-lag cross-correlation of click vs purchase daily volumes
    (lags -3..3) — bounded daily combiner + exact-integer pearson
    tree per lag; generate_series LEFT JOIN mirror keeps empty lags."""
    from fluent_server_ray.stages.features import volume_xcorr

    return volume_xcorr(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]),
        key_a="click", key_b="purchase", max_lag=3)


def _q_rfm(sf_dir: str):
    """RFM segmentation per user: combiner-first (max day, count,
    cent sum) partials through the distributed merge, fixed-threshold
    tiers, integer cents."""
    from fluent_server_ray.stages.features import rfm_scores

    return rfm_scores(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "value"]))


def _q_diversified_topk(sf_dir: str):
    """Global top-50 events by value with at most 3 per user —
    result diversification: per-group segmented rank keeps <=
    |groups|*3 survivors, then one sort+limit over survivors only."""
    from fluent_server_ray.stages.features import diversified_topk

    return diversified_topk(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "user_id", "value"]),
        k=50, per_group=3)


def _q_readability(sf_dir: str):
    """Coleman-Liau readability per doc — integer letter/word/sentence
    counts + ONE declared float tree (bit-exact vs the mirror)."""
    from fluent_server_ray.stages.textstats import (apply_doc_stage,
                                                    readability_batch)

    return apply_doc_stage(_docs(sf_dir), readability_batch)


def _q_fuzzy_match(sf_dir: str):
    """Fuzzy join (record linkage): documents with the first char
    dropped on odd doc_ids matched back to the clean table within
    byte Levenshtein 2 on 32-codepoint prefixes — length-band
    blocking, across-pairs DP kernel shared with
    dedup.edit_distance_dupes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.joins import fuzzy_join

    docs = _docs(sf_dir)

    def corrupt(t):
        odd = pc.equal(
            pc.subtract(t["doc_id"],
                        pc.multiply(pc.divide(t["doc_id"], 2), 2)), 1)
        return pa.table({
            "id": t["doc_id"],
            "text": pc.if_else(
                odd, pc.utf8_slice_codeunits(t["text"], 1, 2 ** 31),
                t["text"]),
        })

    left = docs.map_batches(corrupt, batch_format="pyarrow",
                            zero_copy_batch=True)
    right = docs.map_batches(
        lambda t: pa.table({"id": t["doc_id"], "text": t["text"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    return fuzzy_join(left, right, max_dist=2, prefix_len=32)


def _q_session_coverage(sf_dir: str):
    """Per-user interval UNION (merge overlapping activity extents
    into maximal covered spans): intervals [ts, ts + (event_id % 600)
    s] in integer micros; one key bucket exchange, whole-bucket
    segmented cummax islands, gaps-and-islands mirror."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.windows import merge_intervals

    def iv(t):
        us = t["ts"].cast(pa.int64())
        eid = t["event_id"]
        dur = pc.subtract(eid, pc.multiply(pc.divide(eid, 600), 600))
        return pa.table({
            "user_id": t["user_id"],
            "s": us,
            "e": pc.add(us, pc.multiply(dur, 1_000_000)),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts"]).map_batches(
        iv, batch_format="pyarrow", zero_copy_batch=True)
    return merge_intervals(ds, key_col="user_id",
                           start_col="s", end_col="e")


def _q_json_key_profile(sf_dir: str):
    """Schema discovery over the schemaless props JSON column (the
    reference's open Stuff map, msg/option.go:7): per top-level key,
    rows present + distinct values; json.loads runs once per DISTINCT
    document (factorize-then-parse)."""
    from fluent_server_ray.stages.fields import json_key_profile

    return json_key_profile(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["props"]))


def _q_ks_drift(sf_dir: str):
    """Exact two-sample KS statistic (click vs purchase value
    distributions) in integer millionths — the binning-free drift
    test beside PSI; distinct-value count combiner, integer max CDF
    gap."""
    from fluent_server_ray.stages.features import ks_two_sample

    return ks_two_sample(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["value", "event_type"]))


def _q_events_profile_full(sf_dir: str):
    """FULL column profiler over the events table (typed min/max on
    top of the rows/nulls/distinct card the older events_profile
    reports): one scalar-partial pass plus one value-hash distinct
    exchange — the new-source admission audit."""
    from fluent_server_ray.stages.profile import profile_table

    return profile_table(
        read_parquet_clean(f"{sf_dir}/events.parquet"))


def _q_kruskal(sf_dir: str):
    """Kruskal-Wallis H across event types — the k-group omnibus rank
    test (doubled pooled midranks, floored-integer H with tie
    correction) over one distinct-value-histogram combiner pass."""
    from fluent_server_ray.stages.features import kruskal_by_group

    return kruskal_by_group(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value"]))


def _q_anova(sf_dir: str):
    """One-way ANOVA F across event types — exact integer cents
    moments from one combiner pass, floored-integer F recipe."""
    from fluent_server_ray.stages.features import anova_by_group

    return anova_by_group(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value"]))


def _q_target_encoding(sf_dir: str):
    """Leave-one-out target encoding of order priority by total price
    — the leakage-safe categorical encoder: bounded per-category
    (n, Σcents) broadcast into one vectorized encode pass."""
    from fluent_server_ray.stages.features import target_encode_loo

    return target_encode_loo(
        read_parquet_clean(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority", "o_totalprice"]))


def _q_t_closeness(sf_dir: str):
    """t-closeness release gate over (event_type, day) classes with
    the event value ($100-bucketed cents) as the ordered sensitive
    attribute — exact-integer EMD between class and global CDFs."""
    import pyarrow as pa

    from fluent_server_ray.stages.features import _cents, _epoch_day
    from fluent_server_ray.stages.hygiene import t_closeness

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "value"])

    def derive(t):
        return pa.table({"event_type": t["event_type"],
                         "day": _epoch_day(t["ts"]),
                         "value": t["value"]})

    return t_closeness(
        ev.map_batches(derive, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type", "day"], lambda t: _cents(t["value"]),
        t_max_e6=100_000, unit=10_000)


def _q_wildcard_search(sf_dir: str):
    """SQL-LIKE wildcard search with a sound trigram prefilter
    (pg_trgm plan): vectorized short-circuit substring AND-mask,
    exact ordered-literal regex verify on survivors only."""
    from fluent_server_ray.stages.textstats import wildcard_search

    return wildcard_search(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]),
        pattern="%merge%window%dup%")


def _q_spell_candidates(sf_dir: str):
    """SymSpell deletion-neighborhood spell-correction candidates:
    key join (never a cross join) + exact lev≤1 verify; deterministic
    synthetic typos from the top vocab words."""
    from fluent_server_ray.stages.textstats import spell_candidates

    return spell_candidates(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["text"]))


def _q_link_prediction(sf_dir: str):
    """Resource-Allocation link prediction over the adjacent-token
    graph: top non-edges by sum of floored per-center 1e6//deg —
    wedge plan with pair merge + edge anti-join (dense continuation
    under 4096 nodes, parity-pinned)."""
    from fluent_server_ray.stages.graph import (link_prediction_ra,
                                                token_adjacency_edges)

    return link_prediction_ra(
        token_adjacency_edges(
            read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["text"])), k=50)


def _q_term_burstiness(sf_dir: str):
    """Term burstiness audit (Church-Gale cf/df + per-doc count
    variance over ALL docs) for the top-100 collection-frequency
    terms — one combiner pass + one word-bucket exchange."""
    from fluent_server_ray.stages.textstats import term_burstiness

    return term_burstiness(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["text"]), k=100)


def _q_js_divergence(sf_dir: str):
    """Pairwise Jensen-Shannon divergence between source token
    distributions — integer-log device, one word-bucket exchange,
    O(buckets·pairs) driver merge."""
    from fluent_server_ray.stages.textstats import source_js_divergence

    return source_js_divergence(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"]))


def _q_rake_keyphrases(sf_dir: str):
    """RAKE keyphrase extraction: stopword-free phrase runs, exact
    floored degree/frequency word scores, bucket-join phrase scoring
    — nothing unbounded on the driver."""
    from fluent_server_ray.stages.textstats import rake_keyphrases

    return rake_keyphrases(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["text"]), k=50)


def _q_holt_trend(sf_dir: str):
    """Holt level+trend smoothing of per-type daily volumes — exact
    floored integer recurrence (recursive-CTE mirror), one daily
    combiner pass."""
    from fluent_server_ray.stages.features import holt_trend

    return holt_trend(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]))


def _q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape: per-brand revenue of lineitems below 20% of
    their part's average quantity — the avg and the filter live inside
    ONE partkey-bucket exchange (no stats join, no second scan)."""
    from fluent_server_ray.pipelines.relational import small_qty_revenue

    return small_qty_revenue(sf_dir)


def _q_big_volume_customers(sf_dir: str):
    """TPC-H Q18 shape: orders whose summed quantity exceeds the
    cutoff, joined back to orders and customer — distributed per-order
    combiner, HAVING filter before either join."""
    from fluent_server_ray.pipelines.relational import big_volume_customers

    return big_volume_customers(sf_dir)


def _q_dormant_customers(sf_dir: str):
    """TPC-H Q22 shape (recency-adapted): above-positive-average
    balances with no recent order, per market segment — two scalar
    partials + one broadcast anti-is_in, nothing joined wide."""
    from fluent_server_ray.pipelines.relational import (
        dormant_high_balance_customers,
    )

    return dormant_high_balance_customers(sf_dir)


def _q_langid_kappa(sf_dir: str):
    """Cohen's kappa between the stored lang label and the langid
    heuristic — exact-integer chance-corrected agreement over the
    bounded confusion table (one combiner pass)."""
    from fluent_server_ray.stages.textstats import langid_kappa

    return langid_kappa(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "text"]))


def _q_feature_hashing(sf_dir: str):
    """Hashing-trick bag-of-words: fixed-width signed token buckets
    (md5 ≡ md5_number_upper), purely per-doc streaming map — no
    vocabulary build, no exchange."""
    from fluent_server_ray.stages.textstats import feature_hash_vectors

    return feature_hash_vectors(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]), dim=64)


def _q_tool_hits(sf_dir: str):
    """HITS hubs/authorities over the tool-transition graph (4
    max-normalized integer rounds, unbounded-int exact) — separates
    dispatcher tools from destination tools where PageRank's single
    score can't. Edge table arrives from the distributed transition
    combiner; the iteration is driver-side over that bounded table."""
    from fluent_server_ray.stages.assembly import tool_transitions
    from fluent_server_ray.stages.graph import hits

    edges = tool_transitions(apply_parse(read_transcripts(sf_dir)))
    return hits(edges, src="prev_tool", dst="tool", w="n", n_iters=4)


def _q_key_skew(sf_dir: str):
    """Partition-key skew audit: per event_type, row/distinct-user
    counts, hottest-user share and Herfindahl concentration — exact
    python-int moments over the distributed (type, user) counts."""
    from fluent_server_ray.stages.features import key_skew_audit

    return key_skew_audit(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "user_id"]))


def _q_split_by_cluster(sf_dir: str):
    """Leakage-free splits: every doc inherits its exact-dup cluster
    representative's md5 split — the fix for what split_leakage
    audits; one fingerprint-bucket exchange."""
    from fluent_server_ray.stages.assembly import split_by_cluster

    return split_by_cluster(_docs(sf_dir))


def _q_blocking_eval(sf_dir: str):
    """Precision/recall of prefix-blocking candidate pairs vs the
    normalized-exact-dup truth, over the heavily-duplicated event
    props payloads — every metric a Σ m(m−1)/2 over grouped counts,
    no pair ever materializes."""
    from fluent_server_ray.stages.dedup import blocking_eval

    return blocking_eval(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["props"]),
        prefix_len=6, text_col="props")


def _q_seq_patterns(sf_dir: str):
    """Gap-constrained length-3 sequential patterns by user support —
    shifted-array enumeration inside one user-bucket exchange; the
    motif report funnels (steps named up front) and Markov (adjacent
    pairs only) can't express."""
    from fluent_server_ray.stages.features import sequential_patterns

    return sequential_patterns(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type", "ts",
                                    "event_id"]))


def _q_token_fertility(sf_dir: str):
    """Tokenizer fertility per language (BPE-ish tokens per whitespace
    word, exact integer sums) — the multilingual tokenizer audit."""
    from fluent_server_ray.stages.textstats import token_fertility_by_lang

    return token_fertility_by_lang(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"]))


def _q_schema_drift(sf_dir: str):
    """Day-over-day JSON schema drift: consecutive observed days' key-
    set Jaccard + added/removed counts — the temporal derivative of
    the static key census."""
    from fluent_server_ray.stages.fields import json_schema_drift

    return json_schema_drift(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["ts", "props"]))


def _q_markov_entropy(sf_dir: str):
    """Entropy rate of the empirical event-type Markov chain — the
    one-number predictability summary of user behavior; integer-log
    device over the bounded transition table."""
    from fluent_server_ray.stages.windows import markov_entropy_rate

    return markov_entropy_rate(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "event_type",
                                    "event_id"]))


def _q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: supplier(s) attaining the max quarterly
    revenue — distributed per-supplier combiner, per-batch max
    partials, only the argmax rows join supplier."""
    from fluent_server_ray.pipelines.relational import top_supplier_revenue

    return top_supplier_revenue(sf_dir)


def _q_contamination_score(sf_dir: str):
    """Graded benchmark contamination per training doc: fraction of
    its distinct 3-grams found in the benchmark slice — broadcast
    bench gram set + one vectorized is_in per batch."""
    from fluent_server_ray.stages.hygiene import contamination_score

    return contamination_score(_docs(sf_dir))


def _q_holtwinters(sf_dir: str):
    """Additive Holt-Winters (level+trend+weekly seasonality) of
    per-type daily volumes — exact truncating-integer recurrence on a
    zero-filled calendar grid; the mirror carries the 7 seasonal slots
    as a shift-register recursive CTE."""
    from fluent_server_ray.stages.features import holtwinters_trend

    return holtwinters_trend(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]))


def _q_part_basket(sf_dir: str):
    """Market-basket co-purchase part pairs by order support —
    per-order distinct self-merge inside one orderkey-bucket exchange,
    distributed pair merge, partial top-k."""
    from fluent_server_ray.pipelines.relational import part_basket_pairs

    return part_basket_pairs(sf_dir)


def _q_nb_langid(sf_dir: str):
    """Multinomial Naive Bayes langid: train on the labeled 4/5 split,
    argmax-classify the holdout — one count-combiner pass, model
    broadcast, vectorized lookup + segment-sum scoring."""
    from fluent_server_ray.stages.textstats import naive_bayes_classify

    return naive_bayes_classify(_docs(sf_dir))


RT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "tag"]
RT_ADD = {"msg_len": ("len", "text"), "ts_hour": ("hour", "ts"),
          "tag_head": ("segment", "tag", ".", 0),
          "role_tool": ("concat", ["role", "tool"], ":")}
RT_RENAME = {"tool": "tool_name"}
RT_REMOVE = ["text"]


def _q_late_priority_counts(sf_dir: str):
    """TPC-H Q4 shape: per-priority count of orders with a line shipped
    >90 days after the order date — pushed quarter filter, one
    orderkey-bucketed join, late-filter-then-distinct semi-join."""
    from fluent_server_ray.pipelines.relational import \
        late_order_priority_counts

    return late_order_priority_counts(sf_dir)


def _q_disjunctive_band_revenue(sf_dir: str):
    """TPC-H Q19 shape: revenue under an OR-of-ANDs brand/size/quantity
    predicate — part attrs broadcast once, map-side disjunct masks,
    2-int partials."""
    from fluent_server_ray.pipelines.relational import \
        disjunctive_band_revenue

    return disjunctive_band_revenue(sf_dir)


def _q_nation_year_profit(sf_dir: str):
    """TPC-H Q9 shape: per (supplier nation, ship year) profit over
    name-matched parts — part + supplier maps broadcast once, map-side
    lookups, bounded (nation, year) combiner."""
    from fluent_server_ray.pipelines.relational import nation_year_profit

    return nation_year_profit(sf_dir)


def _q_part_revenue_important(sf_dir: str):
    """TPC-H Q11 shape: parts whose revenue exceeds 2x the mean
    per-part revenue — per-part combiner rollup, integer scalar
    threshold on the driver."""
    from fluent_server_ray.pipelines.relational import \
        part_revenue_important

    return part_revenue_important(sf_dir)


def _q_part_attr_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) with
    brand/type and NOT-IN supplier exclusions — broadcast dims,
    map-side exclusions, dim-bounded distinct exchange."""
    from fluent_server_ray.pipelines.relational import \
        part_attr_supplier_counts

    return part_attr_supplier_counts(sf_dir)


def _q_excess_share_suppliers(sf_dir: str):
    """TPC-H Q20 shape: suppliers shipping >50% of a name-matched
    part's yearly quantity — nested-IN with a correlated integer
    threshold inside one partkey-bucket exchange."""
    from fluent_server_ray.pipelines.relational import \
        excess_share_suppliers

    return excess_share_suppliers(sf_dir)


def _q_part_min_price_supplier(sf_dir: str):
    """TPC-H Q2 shape: per-part groupwise-min regional supplier with
    tie join-back — broadcast regional suppkey set, dim-bounded
    (part, supplier) min partials, driver join-back."""
    from fluent_server_ray.pipelines.relational import \
        part_min_price_supplier

    return part_min_price_supplier(sf_dir)


def _q_sole_late_suppliers(sf_dir: str):
    """TPC-H Q21 shape: per-supplier count of multi-supplier orders
    where they were the ONLY late shipper — one orderkey join, one
    orderkey-bucket screen, bounded supplier merge."""
    from fluent_server_ray.pipelines.relational import \
        sole_late_supplier_counts

    return sole_late_supplier_counts(sf_dir)


def _q_gazetteer_tags(sf_dir: str):
    """Dictionary (gazetteer) tagging: per-doc per-category hit counts
    against a broadcast term lexicon — batch-local explode + exact
    per-batch counts, no shuffle."""
    from fluent_server_ray.stages.textstats import gazetteer_tags

    return gazetteer_tags(_docs(sf_dir))


def _q_rank_delta(sf_dir: str):
    """Window-over-window rank movement of event types (top movers) —
    one scan, (window, key) combiner, driver-side total-order ranks."""
    from fluent_server_ray.stages.features import rank_delta_by_window

    return rank_delta_by_window(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]))


def _q_nested_lines(sf_dir: str):
    """Nested denormalization: one canonical-JSON record per order with
    its sorted line list — one orderkey-bucket exchange, byte-exact
    nested payload vs the SQL string_agg mirror."""
    from fluent_server_ray.stages.assembly import nest_order_lines

    return nest_order_lines(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_linenumber",
                                    "l_partkey", "l_quantity",
                                    "l_extendedprice"]))


def _q_rule_matches(sf_dir: str):
    """Standing-query rules engine: per-rule match + distinct-user
    counts for a broadcast conjunctive alert-rule set — vectorized
    per-rule masks, one bounded distinct exchange."""
    from fluent_server_ray.stages.features import standing_rule_matches

    return standing_rule_matches(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value", "user_id"]))


def _roundtrip_agg(sf_dir: str, write_fn, read_fn, prefix: str):
    """Shared body of the format round-trip audits: events → sharded
    <format> files under a scratch dir → read back → per-type count +
    cents sum (equals the straight-off-parquet oracle ⟺ the format
    round-trip is lossless)."""
    import shutil
    import tempfile

    import pyarrow as _pa
    import pyarrow.compute as _pc

    from fluent_server_ray.stages.aggregate import grouped_agg

    out = tempfile.mkdtemp(prefix=prefix)
    try:
        write_fn(
            read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value",
                                        "user_id"]), out)
        back = read_fn(out)

        def partial(t: _pa.Table) -> _pa.Table:
            prep = _pa.table({
                "event_type": t["event_type"],
                "value_cents": _pc.cast(
                    _pc.round(_pc.multiply(t["value"], 100.0),
                              round_mode="half_towards_infinity"),
                    _pa.int64()),
                "one": _pa.array([1] * len(t), _pa.int64()),
            })
            o = prep.group_by(["event_type"]).aggregate(
                [("value_cents", "sum"), ("one", "sum")])
            return o.rename_columns(["event_type", "value_cents", "n"])

        agg = grouped_agg(
            back.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True),
            ["event_type"], [("value_cents", "sum"), ("n", "sum")])
        return _pa.table({
            "event_type": agg["event_type"],
            "value_cents": _pc.cast(agg["value_cents_sum"], _pa.int64()),
            "n": _pc.cast(agg["n_sum"], _pa.int64()),
        }).sort_by([("event_type", "ascending")])
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _q_jsonl_roundtrip(sf_dir: str):
    """JSONL source/sink: events → sharded .json lines → read back →
    per-type count + cents sum vs the straight-off-parquet oracle."""
    from fluent_server_ray.sources.jsonl import read_jsonl, write_jsonl

    return _roundtrip_agg(sf_dir, write_jsonl, read_jsonl, "fsr_jsonl_")


def _q_csv_roundtrip(sf_dir: str):
    """CSV source/sink: same audit through the Arrow-native CSV path."""
    from fluent_server_ray.sources.csvsrc import read_csv_dir, \
        write_csv_dir

    return _roundtrip_agg(sf_dir, write_csv_dir, read_csv_dir,
                          "fsr_csv_")


def _q_hard_negatives(sf_dir: str):
    """Contrastive hard-negative mining: per labeled query vector, the
    exact cosine top-k DIFFERENT-label neighbors — broadcast query
    matrix, per-block masked top-k, bounded driver merge."""
    from fluent_server_ray.stages.similarity import hard_negative_topk

    return hard_negative_topk(_embs(sf_dir), ANN_QUERY_IDS, k=ANN_K)


def _q_knn_label_audit(sf_dir: str):
    """kNN label-quality audit: majority-vote predicted label among the
    exact cosine top-k vs the stored label — rank-contract neighbors,
    deterministic vote tie-break."""
    from fluent_server_ray.stages.similarity import knn_classify

    return knn_classify(_embs(sf_dir), ANN_QUERY_IDS, k=ANN_K)


def _q_record_transform(sf_dir: str):
    """fluentd record_transformer over the routed transcripts:
    declarative add/rename/remove — one zero-copy map stage generated
    from the same spec as the SQL mirror."""
    from fluent_server_ray.pipelines.flagship import build_routed
    from fluent_server_ray.stages.fields import record_transform

    routed = build_routed(sf_dir, columns=RT_COLS)
    return record_transform(routed, add=RT_ADD, rename=RT_RENAME,
                            remove=RT_REMOVE)


def _q_next_words(sf_dir: str):
    """Bigram-LM next-word suggestions for the top prefix words — one
    pair pass, distributed merge, prefix totals folded out."""
    from fluent_server_ray.stages.textstats import next_word_topk

    return next_word_topk(_docs(sf_dir))


def _q_selfjoin_size(sf_dir: str):
    """Exact F2 self-join size of the user_id key — per-key counts
    through the distributed merge, python-int moment partials."""
    from fluent_server_ray.stages.features import selfjoin_size

    return selfjoin_size(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id"]))


def _q_max_drawdown(sf_dir: str):
    """Max drawdown of each type's cumulative daily value curve —
    daily combiner, bounded-grid driver cumsum/cummax scan."""
    from fluent_server_ray.stages.features import max_drawdown_by_group

    return max_drawdown_by_group(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value", "ts"]))


def _q_mmr_topk(sf_dir: str):
    """MMR diversified re-ranking of one query's cosine top-pool —
    distributed relevance scan, bounded driver greedy, unrolled-round
    SQL mirror."""
    from fluent_server_ray.stages.similarity import mmr_topk

    return mmr_topk(_embs(sf_dir))


def _q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: banded-discount revenue delta — pushed date
    read, one vectorized mask, 2-int block partials."""
    from fluent_server_ray.pipelines.relational import forecast_revenue_delta

    return forecast_revenue_delta(sf_dir)


def _q_nation_volume(sf_dir: str):
    """TPC-H Q7 shape: yearly cross-nation shipping volume — broadcast
    supplier pair map, two bucketed fact joins, bounded partials."""
    from fluent_server_ray.pipelines.relational import nation_volume_shipping

    return nation_volume_shipping(sf_dir)


def _q_market_share(sf_dir: str):
    """TPC-H Q8 shape: per-year national market share inside a region
    on one part type — three broadcast dims, two bucketed joins, one
    exact float division per year."""
    from fluent_server_ray.pipelines.relational import nation_market_share

    return nation_market_share(sf_dir)


def _q_phonetic_pairs(sf_dir: str):
    """Soundex phonetic blocking pairs over the distinct part-name
    vocabulary (product-name record-linkage blocking) — distributed
    vocab merge, per-distinct-word code loop, in-code pairing."""
    from fluent_server_ray.stages.textstats import phonetic_word_pairs

    return phonetic_word_pairs(
        read_parquet_clean(f"{sf_dir}/part.parquet",
                           columns=["p_name"]),
        text_col="p_name")


def _q_phash_dupes(sf_dir: str):
    """Perceptual-hash (aHash) near-dup pairs over the stub-decoded
    payload thumbnails — 63-bit codes, pigeonhole blocking, exact
    hamming verify; recall 1 for d < n_blocks so the set equals the
    all-pairs oracle scan."""
    from fluent_server_ray.stages.multimodal import phash_dupes

    return phash_dupes(_docs(sf_dir))


def _q_gini_splits(sf_dir: str):
    """Decision-stump screen: top value thresholds for predicting
    purchase events, by floored-millionths weighted Gini — one
    histogram combiner pass, driver cumsum scan."""
    from fluent_server_ray.stages.features import gini_best_splits

    return gini_best_splits(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value"]))


def _q_inclusion_audit(sf_dir: str):
    """Inclusion-dependency discovery over candidate FK edges —
    distinct-exchange child side, broadcast dim parents, containment
    in exact millionths."""
    import pyarrow.parquet as _pq

    from fluent_server_ray.stages.profile import inclusion_audit

    edges = [
        ("events.user_id->customer.c_custkey",
         read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id"]),
         "user_id",
         _pq.read_table(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey"]), "c_custkey"),
        ("lineitem.l_partkey->part.p_partkey",
         read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey"]),
         "l_partkey",
         _pq.read_table(f"{sf_dir}/part.parquet",
                        columns=["p_partkey"]), "p_partkey"),
        ("orders.o_custkey->customer.c_custkey",
         read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey"]),
         "o_custkey",
         _pq.read_table(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey"]), "c_custkey"),
        ("part.p_size->nation.n_nationkey",
         read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_size"]),
         "p_size",
         _pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey"]), "n_nationkey"),
    ]
    return inclusion_audit(edges)


def _q_jarque_bera(sf_dir: str):
    """Per-type Jarque-Bera normality screen — exact shifted integer
    power sums (python-int / HUGEINT), one declared float tree."""
    from fluent_server_ray.stages.features import jarque_bera_by_group

    return jarque_bera_by_group(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value"]))


def _q_brown_forsythe(sf_dir: str):
    """Brown-Forsythe spread-homogeneity test — ANOVA on |value −
    group lower median|, floored-integer F recipe."""
    from fluent_server_ray.stages.features import brown_forsythe_by_group

    return brown_forsythe_by_group(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value"]))


def _q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape: per-nation revenue with the customer-supplier
    same-nation constraint — two bucketed fact joins, supplier map
    broadcast once, nation-keyed combiner."""
    from fluent_server_ray.pipelines.relational import local_supplier_volume

    return local_supplier_volume(sf_dir)


def _q_returned_item_customers(sf_dir: str):
    """TPC-H Q10 shape: top customers by returned-line revenue in a
    quarter — pushed filters, one orderkey join, distributed
    per-customer merge, k-row attribute lookup."""
    from fluent_server_ray.pipelines.relational import returned_item_customers

    return returned_item_customers(sf_dir)


def _q_promo_revenue_share(sf_dir: str):
    """TPC-H Q14 shape: PROMO-part share of one month's revenue —
    broadcast promo-key set, 2-int partials per block, one exact
    float division."""
    from fluent_server_ray.pipelines.relational import promo_revenue_share

    return promo_revenue_share(sf_dir)


def _q_mann_kendall(sf_dir: str):
    """Mann-Kendall monotone-trend test per event type over daily
    cents totals — exact integer S + tie-corrected variance numerator,
    one shared continuity-corrected z float tree; bounded daily-table
    driver continuation (the Theil-Sen shape)."""
    from fluent_server_ray.stages.features import mann_kendall_trend

    return mann_kendall_trend(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_mcnemar(sf_dir: str):
    """McNemar paired marginal-homogeneity test: per-user (did click,
    did purchase) indicator pairs; discordant-cell chi-square from
    exact integer cells — distributed per-user indicator merge."""
    from fluent_server_ray.stages.features import mcnemar_paired

    return mcnemar_paired(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type"]))


def _q_rolling_median(sf_dir: str):
    """Per-user rolling 7-row median of cents values in (ts, id)
    order — the order-statistic rolling frame; one key bucket
    exchange, C rolling-median kernels per bucket."""
    from fluent_server_ray.stages.windows import rolling_frame_median

    return rolling_frame_median(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "user_id", "ts",
                                    "value"]))


def _q_rr_private(sf_dir: str):
    """Randomized-response local-DP daily counts: deterministic md5
    flip coin (≡ md5_number_upper), exact channel debias — the privacy
    release beside the k-anonymity/l-diversity suppression rollups."""
    from fluent_server_ray.stages.hygiene import rr_private_daily_counts

    return rr_private_daily_counts(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "ts", "event_type"]))


def _q_user_sprt(sf_dir: str):
    """Per-user Wald SPRT over purchase-vs-click streams: integer
    LLR-scaled walk, first boundary crossing per user — segmented
    numpy walks per bucket, 3-row partials."""
    from fluent_server_ray.stages.features import user_sprt_decisions

    return user_sprt_decisions(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "event_id",
                                    "event_type"]))


def _q_wilcoxon(sf_dir: str):
    """Wilcoxon signed-rank over paired per-user click-vs-purchase
    cents totals — doubled midranks keep ties integral, one z float
    tree; distinct-|d| histogram driver continuation."""
    from fluent_server_ray.stages.features import wilcoxon_signed_rank

    return wilcoxon_signed_rank(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type", "value"]))


def _q_peak_concurrency(sf_dir: str):
    """Per-day peak concurrency of session intervals — sweep-line over
    per-distinct-timestamp delta sums (tie-order-proof RANGE
    semantics), day-partitioned."""
    from fluent_server_ray.stages.windows import peak_concurrency

    return peak_concurrency(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["ts", "event_id"]))


def _q_ipc_roundtrip(sf_dir: str):
    """Arrow IPC (Feather v2) source/sink: the bit-exact interchange
    lane — same lossless round-trip audit as the CSV/JSONL paths."""
    from fluent_server_ray.sources.ipc import read_ipc_dir, write_ipc_dir

    return _roundtrip_agg(sf_dir, write_ipc_dir, read_ipc_dir,
                          "fsr_ipc_")


def _q_orc_roundtrip(sf_dir: str):
    """ORC source/sink: the Hive-lake interchange lane — same lossless
    round-trip audit as the CSV/JSONL/IPC paths (int64/double/string
    columns round-trip bit-exact; ts unit note in sources/orc.py)."""
    from fluent_server_ray.sources.orc import read_orc_dir, write_orc_dir

    return _roundtrip_agg(sf_dir, write_orc_dir, read_orc_dir,
                          "fsr_orc_")


def _q_token_sssp(sf_dir: str):
    """Weighted shortest paths over the word-adjacency graph from its
    most frequent token — synchronous distributed Bellman-Ford with
    md5-priced edges; cost-capped recursive-CTE mirror."""
    from fluent_server_ray.stages.graph import (token_adjacency_edges,
                                                weighted_sssp)
    from fluent_server_ray.stages.textstats import vocab_top_words

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["text"]).materialize()
    edges = token_adjacency_edges(docs)
    source = vocab_top_words(docs, k=1)["word"][0].as_py()
    # n_buckets=8: per-round fixed exchange cost (the BFS precedent);
    # raise with the cluster at corpus scale
    return weighted_sssp(edges, source, n_buckets=8)


def _q_periodogram(sf_dir: str):
    """Weekly-frequency DFT power of the daily cents series per
    event_type — pinned integer-millionth trig table, exact python-int
    spectral sums, one shared float tree for the amplitude."""
    from fluent_server_ray.stages.features import weekly_periodogram

    return weekly_periodogram(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_did(sf_dir: str):
    """2x2 difference-in-differences over user_id%2 variants and a
    pre/post split — exact per-user cents cells, one shared float
    tree."""
    from fluent_server_ray.stages.features import did_estimate

    return did_estimate(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "value"]))


def _q_hodges_lehmann(sf_dir: str):
    """Hodges-Lehmann location of daily cents per event_type — median
    of Walsh sums with exact order-statistic picks on the bounded
    daily table."""
    from fluent_server_ray.stages.features import hodges_lehmann

    return hodges_lehmann(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_capture_recapture(sf_dir: str):
    """Chapman capture-recapture population estimate from two
    consecutive activity weeks — distributed presence flags, exact
    counts, one float tree."""
    from fluent_server_ray.stages.features import capture_recapture

    return capture_recapture(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts"]))


def _q_record_days(sf_dir: str):
    """Strict record-days audit of daily cents per event_type —
    prefix-max comparison on the bounded daily table."""
    from fluent_server_ray.stages.features import record_days

    return record_days(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_cdc_apply(sf_dir: str):
    """CDC upsert-apply: replay signup/click/error as
    insert/update/delete per user — boundary-segmented vectorized
    replay, last-op-wins, tombstone semantics."""
    from fluent_server_ray.stages.windows import cdc_apply

    return cdc_apply(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "event_type",
                                    "value", "event_id"]))


def _q_tool_baskets(sf_dir: str):
    """Tool co-occurrence baskets per conversation over the routed
    path — conv-bucket pair explode, exact supports, mirrored lift."""
    from fluent_server_ray.pipelines.flagship import tool_basket_pairs

    return tool_basket_pairs(sf_dir)


def _q_hour_entropy(sf_dir: str):
    """Circadian Shannon entropy of the 24-hour profile per
    event_type — floored-log-millionths integer term, one float
    tree."""
    from fluent_server_ray.stages.features import hour_entropy

    return hour_entropy(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]))


def _q_return_periods(sf_dir: str):
    """Weibull empirical return periods of the top extreme days per
    event_type — exact dense ranks with earlier-day tie-break."""
    from fluent_server_ray.stages.features import return_periods

    return return_periods(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_kish_ess(sf_dir: str):
    """Kish effective sample size per source under token-count
    weighting — exact hi/lo weight moments, double-rounding-safe
    float tree."""
    from fluent_server_ray.stages.textstats import kish_ess

    return kish_ess(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"]))


def _q_tag_rollup(sf_dir: str):
    """Counts at every dotted tag prefix over routed turns — the
    namespace drill-down via per-batch prefix explode + combiner."""
    from fluent_server_ray.pipelines.flagship import tag_prefix_rollup

    return tag_prefix_rollup(sf_dir)


def _q_threshold_crossing(sf_dir: str):
    """Per-user first passage over a cumulative-cents threshold —
    segmented cumsum + first-hit pick inside one bucket exchange."""
    from fluent_server_ray.stages.windows import threshold_crossing

    return threshold_crossing(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "value",
                                    "event_id"]))


def _q_salt_plan(sf_dir: str):
    """Hot-key salt planner over routed tenant counts — integer-ceil
    salt factors for the add_salt machinery."""
    from fluent_server_ray.pipelines.flagship import tenant_salt_plan

    return tenant_salt_plan(sf_dir, target_rows=200)


def _q_hour_profile_dist(sf_dir: str):
    """Pairwise TVD between tenants' hour-of-day profiles over routed
    turns — exact cross-scaled L1 on the bounded 24-column grid."""
    from fluent_server_ray.pipelines.flagship import (
        tenant_hour_profile_distance)

    return tenant_hour_profile_distance(sf_dir)


def _q_nation_hhi(sf_dir: str):
    """Customer-concentration HHI per nation — distributed per-
    customer totals, broadcast dims, hi/lo-split squared mass, one
    division."""
    from fluent_server_ray.pipelines.relational import nation_customer_hhi

    return nation_customer_hhi(sf_dir)


def _q_verbosity(sf_dir: str):
    """Per-tenant assistant-vs-user verbosity over the flagship routed
    path — per-batch char/turn combiner on the fused
    parse+enrich+route output, tiny final merge, one float tree."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from fluent_server_ray.pipelines.flagship import build_routed
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    routed = build_routed(sf_dir, columns=["tenant", "role", "text"])

    def partial(t: _pa.Table) -> _pa.Table:
        chars = _pc.utf8_length(_pc.fill_null(t["text"], ""))
        is_a = _pc.equal(t["role"], "assistant")
        is_u = _pc.equal(t["role"], "user")
        z = _pa.scalar(0, _pa.int64())
        prep = _pa.table({
            "tenant": t["tenant"],
            "ac": _pc.if_else(is_a, _pc.cast(chars, _pa.int64()), z),
            "uc": _pc.if_else(is_u, _pc.cast(chars, _pa.int64()), z),
            "at": _pc.cast(is_a, _pa.int64()),
            "ut": _pc.cast(is_u, _pa.int64()),
        })
        out = prep.group_by(["tenant"]).aggregate(
            [("ac", "sum"), ("uc", "sum"), ("at", "sum"),
             ("ut", "sum")])
        return out.rename_columns(["tenant", "ac", "uc", "at", "ut"])

    agg = grouped_agg(
        routed.map_batches(skip_empty(partial), batch_format="pyarrow",
                           zero_copy_batch=True),
        ["tenant"], [("ac", "sum"), ("uc", "sum"), ("at", "sum"),
                     ("ut", "sum")], final="driver").to_pandas()
    agg = agg.sort_values("tenant")
    ratio = [
        (float(a) / float(u)) if u > 0 else None
        for a, u in zip(agg["ac_sum"], agg["uc_sum"])
    ]
    return _pa.table({
        "tenant": _pa.array(agg["tenant"], _pa.string()),
        "assistant_chars": _pa.array(agg["ac_sum"].astype("int64")),
        "user_chars": _pa.array(agg["uc_sum"].astype("int64")),
        "assistant_turns": _pa.array(agg["at_sum"].astype("int64")),
        "user_turns": _pa.array(agg["ut_sum"].astype("int64")),
        "verbosity_ratio": _pa.array(ratio, _pa.float64()),
    })


def _q_hoover(sf_dir: str):
    """Hoover redistribution index of per-user cents per event_type —
    exact integer deviation mass |n·x − S|, one division."""
    from fluent_server_ray.stages.features import hoover_index

    return hoover_index(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "user_id", "value"]))


def _q_sn_scale(sf_dir: str):
    """Rousseeuw-Croux Sn robust scale of daily cents per event_type
    — nested exact order-statistic picks on the bounded daily
    table."""
    from fluent_server_ray.stages.features import sn_scale

    return sn_scale(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_burstiness(sf_dir: str):
    """Goh-Barabási burstiness of within-user inter-event gaps per
    event type — exact pooled moments via one user-bucket exchange,
    one float tree."""
    from fluent_server_ray.stages.features import burstiness

    return burstiness(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "user_id", "ts",
                                    "event_id"]))


def _q_word_dropout(sf_dir: str):
    """Deterministic md5-Bernoulli word-dropout augmentation — both
    engines drop identical tokens; survivors re-join with single
    spaces."""
    from fluent_server_ray.stages.hygiene import word_dropout

    return word_dropout(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]))


def _q_fd_discovery(sf_dir: str):
    """All-ordered-pairs functional-dependency discovery over orders'
    non-float columns — one corpus pass emitting distinct triples for
    every pair, distributed counts."""
    from fluent_server_ray.stages.profile import fd_discovery

    return fd_discovery(read_parquet_clean(f"{sf_dir}/orders.parquet"))


def _q_daily_lis(sf_dir: str):
    """Longest strictly increasing/decreasing subsequences of daily
    cents per event_type — patience sorting vs a UNION-deduplicated
    recursive-CTE mirror."""
    from fluent_server_ray.stages.features import daily_lis

    return daily_lis(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_cohort_ltv(sf_dir: str):
    """Cohort LTV curves: first-activity-week cohorts, per-age
    purchase revenue, cumulative per-user value — user-bucket cohort
    assignment, bounded grid."""
    from fluent_server_ray.stages.windows import cohort_ltv

    return cohort_ltv(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "event_type",
                                    "value"]))


def _q_yules_k(sf_dir: str):
    """Yule's K lexical-richness constant per source — distributed
    term counts, counts-of-counts collapse, exact integer spectrum."""
    from fluent_server_ray.stages.textstats import yules_k

    return yules_k(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"]))


def _q_kendalls_w(sf_dir: str):
    """Kendall's W concordance of weekly event-type leaderboards —
    doubled midranks on the complete week-by-type grid, exact integer
    num/den."""
    from fluent_server_ray.stages.features import kendalls_w

    return kendalls_w(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["ts", "event_type", "value"]))


def _q_hash_collisions(sf_dir: str):
    """Truncated-hash surrogate-key collision audit over distinct
    users — birthday-bound check, fully distributed counts."""
    from fluent_server_ray.stages.features import hash_collision_audit

    return hash_collision_audit(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id"]))


def _q_charset_profile(sf_dir: str):
    """Per-doc codepoint-class census from pinned ASCII classes —
    charset/noise audit, no exchange."""
    from fluent_server_ray.stages.textstats import charset_profile

    return charset_profile(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]))


def _q_merkle(sf_dir: str):
    """Two-level Merkle fingerprint of the events table — md5 row
    hashes, hash-partitioned leaves, bucket-ordered root; mismatches
    localize to leaves."""
    from fluent_server_ray.stages.profile import merkle_fingerprint

    return merkle_fingerprint(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_id", "event_type",
                                    "value"]))


def _q_extractive_summary(sf_dir: str):
    """TF-IDF extractive summary: highest-idf-mass sentence per doc
    under the shared sentence/token split contracts, earliest-tie
    pick."""
    from fluent_server_ray.stages.textstats import extractive_summary

    return extractive_summary(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]))


def _q_sentence_stats(sf_dir: str):
    """Per-doc sentence segmentation stats under the shared
    terminator-run split regex — char lengths, no exchange."""
    from fluent_server_ray.stages.textstats import sentence_stats

    return sentence_stats(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]))


def _q_fifo(sf_dir: str):
    """FIFO lot allocation of click demand against purchase lots per
    user — closed-form clamp over one segmented supply cumsum."""
    from fluent_server_ray.stages.windows import fifo_allocation

    return fifo_allocation(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "event_type",
                                    "value", "event_id"]))


def _q_pairwise_bh(sf_dir: str):
    """All type-pair permutation tests + exact integer Benjamini-
    Hochberg step-up — user-bucket exchange, per-pair md5 sign
    streams, cross-multiplied rational reject rule."""
    from fluent_server_ray.stages.features import pairwise_permutation_bh

    return pairwise_permutation_bh(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type", "value"]))


def _q_haar(sf_dir: str):
    """Unnormalized Haar detail-energy ladder over daily cents per
    event_type — complete-pairs contract, exact integer energies,
    unrolled dyadic mirror."""
    from fluent_server_ray.stages.features import haar_energy

    return haar_energy(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_daily_motif(sf_dir: str):
    """Exact-SSD motif pair over the daily cents series per
    event_type — positional non-overlapping windows, integer SSD,
    lexicographic tie-break."""
    from fluent_server_ray.stages.features import daily_motif

    return daily_motif(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_allan(sf_dir: str):
    """Multi-τ Allan variance of the daily cents series per
    event_type — exact integer block-sum diffs, one float tree per
    (group, τ)."""
    from fluent_server_ray.stages.features import allan_variance

    return allan_variance(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value"]))


def _q_ohlc(sf_dir: str):
    """Daily OHLC cents bars per event_type — order-statistic
    open/close re-picked across block partials by the (ts, event_id)
    tie-break; exact int64 cents."""
    from fluent_server_ray.stages.windows import ohlc_daily_bars

    return ohlc_daily_bars(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts", "value",
                                    "event_id"]))


def _q_cochran_q(sf_dir: str):
    """Cochran's Q across matched view/click/purchase binary
    treatments per user — exact integer numerator/denominator, one
    float division."""
    from fluent_server_ray.stages.features import cochran_q

    return cochran_q(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type"]))


def _q_clamped_balance(sf_dir: str):
    """Floor-at-zero running wallet balance per user (purchases
    credit, clicks debit) — max-plus identity turns the clamp
    recurrence into two segmented kernels inside one bucket
    exchange."""
    from fluent_server_ray.stages.windows import clamped_balance

    return clamped_balance(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "event_type",
                                    "value", "event_id"]))


def _q_wilson_ci(sf_dir: str):
    """Wilson 95% interval per event_type for the high-value-row
    proportion — exact combiner counts, pinned z literal, one shared
    float tree."""
    from fluent_server_ray.stages.features import wilson_proportion_ci

    return wilson_proportion_ci(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value"]))


def _q_ols_hour_dow(sf_dir: str):
    """Two-feature OLS (hour, dow → cents) via exact integer normal
    equations and Cramer's rule — arbitrary-precision determinants,
    three final float divisions."""
    from fluent_server_ray.stages.features import ols_hour_dow

    return ols_hour_dow(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["ts", "value"]))


def _q_perm_test(sf_dir: str):
    """Paired sign-flip permutation test over per-user click-vs-
    purchase cents deltas — 64 md5-bit permutations, exact integer
    statistics, combiner-decomposable 64-row exchange."""
    from fluent_server_ray.stages.features import permutation_sign_test

    return permutation_sign_test(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type", "value"]))


def _q_bootstrap_ci(sf_dir: str):
    """Percentile-bootstrap CI for the mean daily total — md5-indexed
    deterministic resamples over the bounded daily table; CI bounds
    are order-statistic picks that EXIST in the resample set."""
    from fluent_server_ray.stages.features import bootstrap_daily_mean_ci

    return bootstrap_daily_mean_ci(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["ts", "value"]))


def _q_cuped(sf_dir: str):
    """CUPED-adjusted per-variant A/B means over pre/post-split
    per-user cents — exact integer pooled moments (hi/lo split),
    one shared float tree for θ and each adjusted mean."""
    from fluent_server_ray.stages.features import cuped_adjusted_means

    return cuped_adjusted_means(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "value"]))


# The external driver samples the FIRST 50 entries of queries() each
# round, and that window had been static since round 2 — 350 of the
# 400 registered queries never received a driver-side correctness row.
# This head list ROTATES the window: the three north-rule flagship
# anchors stay, followed by 47 of the riskiest never-driver-checked
# queries (the float-contract statistics families where the HUGEINT→
# DOUBLE divergences were found, the join/window-heavy operators, and
# the two new strict rows added this round). Everything else keeps its
# original registration order after the head.
_DRIVER_WINDOW = [
    # north-rule anchors (driver-checked every round since r1)
    "transcripts_parse",
    "transcripts_route",
    "transcripts_sink_counts",
    # new strict rows this round (IVF degenerate-exact; fixed-centroid
    # k-means assignment)
    "ann_ivf_exact",
    "kmeans_assign_fixed_centroids",
    # float-contract statistics (the HUGEINT/double-rounding class)
    "events_burstiness",
    "nation_customer_hhi",
    "events_sn_scale",
    "user_km_survival",
    "events_weekly_periodogram",
    "users_cuped_ab_means",
    "events_ols_hour_dow",
    "events_jarque_bera",
    "events_bootstrap_mean_ci",
    "events_pairwise_perm_bh",
    "events_allan_variance",
    "events_haar_energy",
    "events_hodges_lehmann",
    "events_kendalls_w",
    "users_cochran_q",
    "events_hoover_index",
    "source_kish_ess",
    "events_mann_kendall",
    "users_wilcoxon_signed_rank",
    "events_theilsen_trend",
    "events_spearman_volumes",
    "events_kruskal_types",
    "events_anova_types",
    "events_brown_forsythe",
    "events_wilson_ci",
    "users_permutation_sign_test",
    "users_did_estimate",
    "users_capture_recapture",
    # join / window / data-engineering heavy operators
    "user_churn_labels",
    "user_rfm_scores",
    "orders_reconciliation",
    "nation_revenue_q5",
    "nation_year_profit_q9",
    "supplier_sole_late_q21",
    "part_min_price_supplier_q2",
    "user_cdc_apply",
    "user_fifo_allocation",
    "user_clamped_balance",
    "events_ohlc_daily",
    "events_rolling_median",
    "events_peak_concurrency",
    "users_cohort_ltv",
    "orders_fd_discovery",
    "events_merkle_fingerprint",
    "doc_word_dropout",
    "events_daily_lis",
    "token_graph_triangles",
    "token_graph_kcore",
]


def queries() -> dict[str, Callable[[str], Any]]:
    q = _registry()
    missing = [n for n in _DRIVER_WINDOW if n not in q]
    if missing:  # a rename must fail loudly, not silently shrink cover
        raise KeyError(f"_DRIVER_WINDOW names not registered: {missing}")
    head = {n: q[n] for n in _DRIVER_WINDOW}
    head.update((k, v) for k, v in q.items() if k not in head)
    return head


def _registry() -> dict[str, Callable[[str], Any]]:
    from fluent_server_ray.pipelines import relational as rel

    return {
        # flagship transcripts pipeline (SURVEY.md §2.2-2.6)
        "transcripts_parse": _q_parse,
        "transcripts_route": _q_route,
        "transcripts_sink_counts": _q_sink_counts,
        "transcripts_tenant_counts": _q_tenant_counts,
        "transcripts_tenant_counts_salted": _q_tenant_counts_salted,
        "transcripts_heartbeat_stats": _q_heartbeat_stats,
        "transcripts_first_turn": _q_first_turn,
        # text analysis
        "doc_token_counts": _q_token_counts,
        "doc_quality": _q_quality,
        "doc_langid": _q_langid,
        "doc_fingerprint": _q_fingerprint,
        "doc_winnow_fingerprints": _q_winnow,
        "doc_bpe_token_counts": _q_bpe_tokens,
        "doc_tfidf": _q_tfidf,
        # dedup family
        "dedup_exact": _q_dedup_exact,
        "dedup_incremental": _q_dedup_incremental,
        "dedup_incremental_minhash": _q_dedup_incremental_minhash,
        "dedup_prefix_block": _q_dedup_prefix_block,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_simhash_pairs": _q_dedup_simhash_pairs,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "dedup_containment": _q_dedup_containment,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_keep_best": _q_dedup_keep_best,
        "dedup_substring": _q_dedup_substring,
        # similarity search
        "ann_cosine_topk": _q_ann,
        "ann_ivf_topk": _q_ivf,
        "ann_ivf_exact": _q_ann_ivf_exact,
        "kmeans_assign_fixed_centroids": _q_kmeans_assign_fixed,
        "embedding_dupes": _q_embedding_dupes,
        "embedding_kmeans": _q_embedding_kmeans,
        "embedding_balanced_sample": _q_embedding_balanced,
        "embedding_dup_clusters": _q_embedding_dup_clusters,
        "embedding_quantize": _q_embedding_quantize,
        "embedding_pca": _q_embedding_pca,
        # multimodal plumbing
        "multimodal_decode": _q_multimodal,
        "multimodal_frames": _q_frames,
        "multimodal_resize": _q_resize,
        "multimodal_embed": _q_embed_stub,
        "multimodal_cdc_chunks": _q_cdc_chunks,
        # windowed
        "sessionize": _q_sessionize,
        "tumbling_counts": _q_tumbling,
        "sliding_counts": _q_sliding,
        "tumbling_value_agg": _q_tumbling_value_agg,
        "asof_prior_click": _q_asof,
        "asof_next_click": _q_asof_next,
        "range_join_purchase_windows": _q_range_join,
        # relational coverage
        "lineitem_agg": rel.lineitem_agg,
        "orders_by_nation": rel.orders_by_nation,
        "top_orders": rel.top_orders,
        "distinct_event_types": rel.distinct_event_types,
        "union_high_low": rel.union_high_low_value,
        "join_revenue_by_priority": rel.revenue_by_priority,
        "dedup_replayed_turns": rel.dedup_replayed_turns,
        "anti_join_customers": rel.customers_without_orders,
        "anti_join_customers_bloom": _q_anti_join_bloom,
        "semi_join_customers": _q_semi_join,
        "events_late_flags": _q_late_flags,
        "events_extract_props": _q_extract_props,
        "doc_grep_filter": _q_grep_filter,
        "doc_chunk_windows": _q_chunk_windows,
        "user_event_pivot": _q_user_pivot,
        "events_value_zscore": _q_value_zscore,
        "events_zscore_by_type": _q_zscore_by_type,
        "docs_above_median_tokens": _q_docs_above_median,
        "docs_mixture_sample": _q_mixture_sample,
        "events_throttled": _q_throttle,
        "transcripts_retag": _q_retag,
        "transcripts_pseudonymize": _q_pseudonymize,
        "transcripts_multiline": _q_multiline,
        "transcripts_suppress": _q_suppress,
        "trending_tags": _q_trending_tags,
        "transcripts_copy_route": _q_copy_route,
        "bigram_top_pairs": _q_bigram_top,
        "word_postings_index": _q_word_postings,
        "events_value_pct_rank": _q_pct_rank,
        "doc_token_ids": _q_token_ids,
        "customer_order_profile": _q_customer_profile,
        "shipping_priority": _q_shipping_priority,
        "rollup_order_counts": _q_rollup_orders,
        "cms_event_counts": _q_cms_event_counts,
        "vocab_top_words": _q_vocab,
        "docs_weighted_sample": _q_weighted_sample,
        "docs_per_source_cap": _q_per_source_cap,
        "docs_corpus_shuffle": _q_corpus_shuffle,
        "docs_sample_bottomk": _q_sample_bottomk,
        "user_funnel": _q_funnel,
        "window_distinct_users": _q_window_distinct,
        "ann_ivf_persisted": _q_ivf_persisted,
        "topk_per_customer": rel.top_orders_per_customer,
        "approx_distinct_users": _q_approx_distinct,
        "price_quantiles": _q_value_quantiles,
        "doc_token_quantiles": _q_token_quantiles,
        "value_quantiles_by_type": _q_value_quantiles_by_type,
        "heavy_hitter_tags": _q_heavy_hitter_tags,
        "event_value_stats": _q_event_value_stats,
        "conv_value_stats": _q_conv_value_stats,
        "transcripts_sample_convs": _q_sample_convs,
        "curation_pipeline": _q_curation,
        "curation_near_dedup": _q_curation_near_dedup,
        # hygiene
        "doc_pii_scrub": _q_doc_pii_scrub,
        "transcripts_scrub_uids": _q_scrub_uids,
        "doc_ngram_repetition": _q_ngram_repetition,
        "doc_decontaminate": _q_decontaminate,
        # training-set assembly
        "conv_running_stats": _q_conv_running_stats,
        "conv_documents": _q_conv_documents,
        "sft_loss_spans": _q_sft_loss_spans,
        "conv_truncate_context": _q_conv_truncate,
        "docs_token_budget": _q_token_budget,
        "doc_pack_sequences": _q_pack_sequences,
        "doc_split_assign": _q_split_assign,
        # LM-quality / feature / cohort additions (round-3 session 5)
        "doc_unigram_logprob": _q_unigram_logprob,
        "user_retention_cohorts": _q_retention,
        "order_count_distribution": _q_order_count_distribution,
        "events_value_rank_in_type": _q_rank_in_group,
        "lm_prep_pipeline": _q_lm_prep,
        "doc_normalize": _q_normalize,
        "users_per_event_type": _q_users_per_type,
        "conv_line_dedup": _q_conv_line_dedup,
        "conv_structure_flags": _q_conv_structure,
        "transcripts_log_templates": _q_log_templates,
        "events_profile": _q_events_profile,
        "doc_len_token_corr": _q_len_token_corr,
        "turns_prior_event": _q_turns_prior_event,
        "turns_prior_event_ts": _q_turns_prior_event_ts,
        "events_ts_id_corr": _q_ts_id_corr,
        "transcripts_extract_args": _q_extract_args,
        "sink_msg_size_quantiles": _q_sink_size_quantiles,
        "lm_tokenize_pack": _q_lm_tokenize_pack,
        "events_throttle": _q_events_throttle,
        "conv_merge_roles": _q_conv_merge_roles,
        "doc_bigram_logprob": _q_bigram_logprob,
        "semantic_dedup": _q_semantic_dedup,
        "median_value_by_type": _q_median_by_type,
        "conv_context_windows": _q_conv_windows,
        "quality_curriculum_mix": _q_quality_curriculum,
        "doc_token_entropy": _q_token_entropy,
        "doc_oov_rate": _q_oov_rate,
        "dedup_edit_distance": _q_edit_distance_dupes,
        "events_value_trend": _q_value_trend,
        "events_ab_ttest": _q_ab_ttest,
        "split_leakage": _q_split_leakage,
        "doc_keywords": _q_doc_keywords,
        "event_interarrival_quantiles": _q_interarrival_quantiles,
        "source_vocab_overlap": _q_source_vocab_overlap,
        "dedup_normalized": _q_dedup_normalized,
        "dedup_winnow_pairs": _q_winnow_pairs,
        "vocab_novelty_daily": _q_vocab_novelty,
        "docs_shard_plan": _q_shard_plan,
        "events_chi2_type_tier": _q_chi2,
        "tool_pagerank": _q_tool_pagerank,
        "fk_integrity_audit": _q_fk_audit,
        "packing_efficiency": _q_packing_efficiency,
        "doc_rank_fusion": _q_rank_fusion,
        "purchase_attribution": _q_attribution,
        "events_daily_ffill": _q_daily_ffill,
        "tags_decayed": _q_decayed_tags,
        "source_length_gini": _q_source_gini,
        "events_props_audit": _q_props_audit,
        "docs_chi2_lang_source": _q_chi2_lang_source,
        "dup_degree_histogram": _q_dup_degree_hist,
        "source_distinctive_bigrams": _q_distinctive_bigrams,
        "doc_collapse_repeats": _q_collapse_repeats,
        "turns_pit_features": _q_pit_features,
        "lineitem_monthly_revenue": _q_monthly_revenue,
        "events_weekly_growth": _q_weekly_growth,
        "events_dow_hour_profile": _q_dow_profile,
        "dup_cluster_examples": _q_dup_cluster_examples,
        "user_event_melt": _q_user_event_melt,
        "embedding_kcenter_sample": _q_kcenter,
        "sink_tool_mode": _q_tool_mode,
        "doc_type_token_ratio": _q_ttr,
        "tool_error_rates": _q_tool_error_rates,
        "events_robust_outliers": _q_robust_outliers,
        "langid_confusion": _q_langid_confusion,
        "source_dup_rate": _q_source_dup_rate,
        "doc_sim_pairs": _q_tfidf_cosine_pairs,
        "lang_token_kl": _q_source_token_kl,
        "tool_transition_counts": _q_tool_transitions,
        "doc_dup_ngram_frac": _q_dup_ngram_frac,
        "doc_bm25_topk": _q_bm25_topk,
        "bigram_pmi_top": _q_pmi_pairs,
        "orders_segment_counts_salted": _q_orders_segment_salted,
        "events_value_tier_counts": _q_value_tier_counts,
        "events_latest_per_user": _q_latest_per_user,
        "bpe_merge_table": _q_bpe_merges,
        "doc_compression_ratio": _q_compression_ratio,
        "embedding_label_centroids": _q_label_centroids,
        "doc_tfidf_joined": _q_tfidf_joined,
        "corpus_overlap_kmv": _q_corpus_overlap,
        "doc_bpe_encode": _q_bpe_encode,
        "window_anomalies": _q_window_anomalies,
        "top_users_per_event_type": _q_top_users_per_type,
        "events_value_winsorized": _q_winsorize,
        "docs_diff_versions": _q_docs_diff,
        "docs_rebalance_sources": _q_rebalance,
        "docs_temperature_sample": _q_temperature_sample,
        "events_rolling_value": _q_rolling_value,
        "doc_split_by_content": _q_split_by_content,
        "doc_chunk_dedup": _q_chunk_dedup,
        "dedup_cluster_sizes": _q_cluster_sizes,
        "conv_exact_dedup": _q_conv_dedup,
        "events_psi_drift": _q_psi_drift,
        "conv_turn_gaps": _q_turn_gaps,
        "source_gram_diversity": _q_gram_diversity,
        "docs_gated_per_lang": _q_lang_gate,
        "transcripts_sink_anomalies": _q_sink_anomalies,
        "prompt_completion_pairs": _q_prompt_completion,
        "doc_fim_transform": _q_fim,
        "doc_vocab_coverage": _q_vocab_coverage,
        "docs_stratified_split": _q_stratified_split,
        "token_graph_triangles": _q_token_triangles,
        "orders_price_band_pairs": _q_orders_price_band,
        "events_cusum_drift": _q_cusum,
        "events_value_ntile": _q_ntile,
        "event_motifs_top": _q_event_motifs,
        "event_markov_matrix": _q_event_markov,
        "events_k_anonymity": _q_k_anonymity,
        "user_profile_fullouter": _q_user_profile_outer,
        "token_graph_bfs": _q_token_bfs,
        "docs_mutual_information": _q_mutual_information,
        "orders_benford": _q_benford,
        "event_association_rules": _q_association_rules,
        "events_volume_autocorr": _q_volume_autocorr,
        "events_profile_full": _q_events_profile_full,
        "token_graph_kcore": _q_token_kcore,
        "events_counts_maintained": _q_counts_maintained,
        "user_session_coverage": _q_session_coverage,
        "events_json_key_profile": _q_json_key_profile,
        "events_ks_value_drift": _q_ks_drift,
        "doc_readability": _q_readability,
        "doc_fuzzy_match": _q_fuzzy_match,
        "dedup_sorted_neighborhood": _q_sorted_neighborhood,
        "doc_vocab_growth": _q_vocab_growth,
        "events_sliding_distinct": _q_sliding_distinct,
        "events_rolling_value_sum": _q_rolling_sum,
        "doc_label_transfer": _q_label_transfer,
        "user_multi_funnel": _q_multi_funnel,
        "events_volume_xcorr": _q_volume_xcorr,
        "user_rfm_scores": _q_rfm,
        "events_diversified_topk": _q_diversified_topk,
        "orders_cube_counts": _q_cube_counts,
        "events_quantile_normalized": _q_quantile_normalize,
        "doc_fuzzy_best_match": _q_fuzzy_best,
        "user_funnel_abandonment": _q_funnel_abandonment,
        "events_column_topk": _q_column_topk,
        "events_changepoint": _q_changepoint,
        "orders_fd_audit": _q_fd_audit,
        "transcripts_order_audit": _q_order_audit,
        "events_pareto_shares": _q_pareto,
        "orders_skyline": _q_orders_skyline,
        "user_longest_streak": _q_longest_streak,
        "user_state_intervals": _q_state_intervals,
        "doc_phrase_match": _q_phrase_match,
        "doc_proximity_match": _q_proximity_match,
        "events_theilsen_trend": _q_theilsen,
        "events_mannwhitney_pairs": _q_mannwhitney,
        "user_km_survival": _q_km_survival,
        "item_cooccurrence": _q_item_cooc,
        "events_seasonal_dow": _q_seasonal_dow,
        "events_twap": _q_twap,
        "doc_boolean_search": _q_boolean_search,
        "token_graph_clustering": _q_token_clustering,
        "events_trimmed_mean": _q_trimmed_mean,
        "events_kendall_volumes": _q_kendall_volumes,
        "doc_autocomplete_topk": _q_autocomplete,
        "doc_concordance": _q_concordance,
        "orders_reconciliation": _q_order_reconciliation,
        "token_graph_assortativity": _q_token_assortativity,
        "events_daily_interp": _q_daily_interp,
        "events_id_gaps": _q_id_gaps,
        "events_runs_test": _q_runs_test,
        "source_simpson_diversity": _q_simpson_diversity,
        "user_churn_labels": _q_churn_labels,
        "lineitem_weighted_price_quartiles": _q_weighted_quantiles,
        "events_fano_dispersion": _q_fano,
        "events_spearman_volumes": _q_spearman_volumes,
        "curation_gate_funnel": _q_gate_funnel,
        "events_l_diversity": _q_l_diversity,
        "users_new_vs_returning": _q_new_vs_returning,
        "transcripts_role_latency": _q_role_latency,
        "orders_ship_latency_sla": _q_ship_latency,
        "events_ewma_daily": _q_ewma_daily,
        "session_entry_exit": _q_session_entry_exit,
        "events_outlier_days": _q_outlier_days,
        "docs_cross_source_dups": _q_cross_source_dups,
        "events_kruskal_types": _q_kruskal,
        "events_anova_types": _q_anova,
        "orders_target_encoding": _q_target_encoding,
        "events_t_closeness": _q_t_closeness,
        "doc_wildcard_search": _q_wildcard_search,
        "doc_spell_candidates": _q_spell_candidates,
        "token_link_prediction": _q_link_prediction,
        "term_burstiness": _q_term_burstiness,
        "source_js_divergence": _q_js_divergence,
        "doc_rake_keyphrases": _q_rake_keyphrases,
        "events_holt_trend": _q_holt_trend,
        "lineitem_small_qty_revenue": _q_small_qty_revenue,
        "orders_big_volume_customers": _q_big_volume_customers,
        "customers_dormant_balance": _q_dormant_customers,
        "docs_langid_kappa": _q_langid_kappa,
        "doc_feature_hashing": _q_feature_hashing,
        "tool_hits_scores": _q_tool_hits,
        "events_key_skew": _q_key_skew,
        "docs_split_by_cluster": _q_split_by_cluster,
        "dedup_blocking_eval": _q_blocking_eval,
        "user_seq_patterns": _q_seq_patterns,
        "lang_token_fertility": _q_token_fertility,
        "events_schema_drift": _q_schema_drift,
        "events_markov_entropy": _q_markov_entropy,
        "supplier_top_revenue": _q_top_supplier,
        "doc_contamination_score": _q_contamination_score,
        "events_holtwinters": _q_holtwinters,
        "part_basket_pairs": _q_part_basket,
        "nation_revenue_q5": _q_local_supplier_volume,
        "returned_item_customers": _q_returned_item_customers,
        "promo_revenue_share": _q_promo_revenue_share,
        "doc_nb_langid": _q_nb_langid,
        "events_jarque_bera": _q_jarque_bera,
        "events_brown_forsythe": _q_brown_forsythe,
        "events_gini_splits": _q_gini_splits,
        "inclusion_audit": _q_inclusion_audit,
        "multimodal_phash_dupes": _q_phash_dupes,
        "part_phonetic_pairs": _q_phonetic_pairs,
        "banded_discount_revenue": _q_forecast_revenue,
        "nation_volume_q7": _q_nation_volume,
        "nation_market_share_q8": _q_market_share,
        "embedding_mmr_topk": _q_mmr_topk,
        "doc_next_words": _q_next_words,
        "events_selfjoin_size": _q_selfjoin_size,
        "events_max_drawdown": _q_max_drawdown,
        "transcripts_record_transform": _q_record_transform,
        "orders_priority_late": _q_late_priority_counts,
        "lineitem_band_revenue_q19": _q_disjunctive_band_revenue,
        "nation_year_profit_q9": _q_nation_year_profit,
        "part_revenue_important": _q_part_revenue_important,
        "part_supplier_counts_q16": _q_part_attr_supplier_counts,
        "supplier_excess_share_q20": _q_excess_share_suppliers,
        "part_min_price_supplier_q2": _q_part_min_price_supplier,
        "supplier_sole_late_q21": _q_sole_late_suppliers,
        "doc_gazetteer_tags": _q_gazetteer_tags,
        "events_rank_delta": _q_rank_delta,
        "orders_nested_lines": _q_nested_lines,
        "events_rule_matches": _q_rule_matches,
        "events_jsonl_roundtrip": _q_jsonl_roundtrip,
        "events_csv_roundtrip": _q_csv_roundtrip,
        "embedding_hard_negatives": _q_hard_negatives,
        "embedding_knn_label_audit": _q_knn_label_audit,
        "events_mann_kendall": _q_mann_kendall,
        "users_mcnemar_click_purchase": _q_mcnemar,
        "events_rolling_median": _q_rolling_median,
        "events_rr_private_counts": _q_rr_private,
        "user_sprt_decisions": _q_user_sprt,
        "users_wilcoxon_signed_rank": _q_wilcoxon,
        "events_peak_concurrency": _q_peak_concurrency,
        "events_ipc_roundtrip": _q_ipc_roundtrip,
        "events_orc_roundtrip": _q_orc_roundtrip,
        "token_graph_sssp": _q_token_sssp,
        "events_bootstrap_mean_ci": _q_bootstrap_ci,
        "users_cuped_ab_means": _q_cuped,
        "events_weekly_periodogram": _q_periodogram,
        "users_permutation_sign_test": _q_perm_test,
        "events_wilson_ci": _q_wilson_ci,
        "events_ols_hour_dow": _q_ols_hour_dow,
        "user_clamped_balance": _q_clamped_balance,
        "events_ohlc_daily": _q_ohlc,
        "users_cochran_q": _q_cochran_q,
        "events_daily_motif": _q_daily_motif,
        "events_allan_variance": _q_allan,
        "events_haar_energy": _q_haar,
        "events_pairwise_perm_bh": _q_pairwise_bh,
        "user_cdc_apply": _q_cdc_apply,
        "doc_sentence_stats": _q_sentence_stats,
        "doc_extractive_summary": _q_extractive_summary,
        "doc_charset_profile": _q_charset_profile,
        "source_yules_k": _q_yules_k,
        "events_daily_lis": _q_daily_lis,
        "doc_word_dropout": _q_word_dropout,
        "events_sn_scale": _q_sn_scale,
        "events_hoover_index": _q_hoover,
        "transcripts_verbosity_by_tenant": _q_verbosity,
        "tenant_hour_profile_distance": _q_hour_profile_dist,
        "user_threshold_crossing": _q_threshold_crossing,
        "source_kish_ess": _q_kish_ess,
        "events_return_periods": _q_return_periods,
        "transcripts_tool_basket_pairs": _q_tool_baskets,
        "events_hour_entropy": _q_hour_entropy,
        "transcripts_tag_prefix_rollup": _q_tag_rollup,
        "tenant_salt_plan": _q_salt_plan,
        "nation_customer_hhi": _q_nation_hhi,
        "events_burstiness": _q_burstiness,
        "orders_fd_discovery": _q_fd_discovery,
        "users_cohort_ltv": _q_cohort_ltv,
        "events_kendalls_w": _q_kendalls_w,
        "users_hash_collision_audit": _q_hash_collisions,
        "events_merkle_fingerprint": _q_merkle,
        "user_fifo_allocation": _q_fifo,
        "users_did_estimate": _q_did,
        "events_hodges_lehmann": _q_hodges_lehmann,
        "users_capture_recapture": _q_capture_recapture,
        "events_record_days": _q_record_days,
    }


_ROUNDTRIP_AGG_SQL = """
SELECT event_type,
  CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
    AS value_cents,
  CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1 ORDER BY event_type
""".strip()


def oracle_sql() -> dict[str, str]:
    from fluent_server_ray.pipelines import relational as rel
    from fluent_server_ray.stages import (
        aggregate,
        assembly,
        bpe,
        dedup,
        features,
        fields,
        hygiene,
        multimodal,
        profile,
        sampling,
        similarity,
        textstats,
        windows,
    )
    from fluent_server_ray.stages.profile import profile_table_sql

    return {
        "transcripts_parse": oracle.parse_sql(),
        "transcripts_route": oracle.route_sql(),
        "transcripts_sink_counts": oracle.sink_counts_sql(),
        "transcripts_tenant_counts": oracle.tenant_counts_sql(),
        "transcripts_tenant_counts_salted": oracle.tenant_counts_sql()
        + " ORDER BY tenant",
        "transcripts_heartbeat_stats": oracle.heartbeat_stats_sql(),
        "transcripts_first_turn": oracle.first_turn_sql(),
        "doc_token_counts": textstats.token_count_sql(),
        "doc_quality": textstats.quality_sql(),
        "doc_langid": textstats.langid_sql(),
        "doc_fingerprint": textstats.fingerprint_sql(),
        "doc_winnow_fingerprints": textstats.winnow_fingerprints_sql(),
        "doc_bpe_token_counts": textstats.bpe_token_count_sql(),
        "doc_compression_ratio": textstats.compression_ratio_sql(),
        # BPE: fixed merge budget -> the iterative trainer unrolls to
        # one computed query (real oracle, not a golden table)
        "bpe_merge_table": bpe.bpe_train_sql(n_merges=8),
        "doc_bpe_encode": bpe.bpe_encode_sql(n_merges=8),
        "doc_tfidf": textstats.doc_tfidf_sql(),
        "dedup_exact": dedup.exact_dedup_sql(),
        "dedup_incremental": """
SELECT doc_id, text FROM documents
WHERE doc_id % 2 = 1
  AND (text IS NULL OR text NOT IN
       (SELECT text FROM documents
        WHERE doc_id % 2 = 0 AND text IS NOT NULL))
""".strip(),
        "dedup_prefix_block": dedup.prefix_block_dupes_sql(),
        "dedup_ngram_jaccard": dedup.ngram_jaccard_dupes_sql(threshold=0.8),
        "dedup_containment": dedup.overlap_dupes_sql(
            min_overlap_millionths=800_000),
        # MinHash precision is 1 (in-cluster exact verify) and its
        # seeded recall is deterministic + total on the test corpora
        # (found set == exact set, verified sf0.001 + sf0.01) — the
        # exact all-pairs query projected to ids IS the oracle.
        "dedup_minhash": dedup.ngram_jaccard_dupes_sql(threshold=0.8),
        # probe half (odd ids) vs indexed half (even ids): the exact
        # cross-parity pair set, probe id first
        "dedup_incremental_minhash": """
SELECT CASE WHEN a % 2 = 1 THEN a ELSE b END AS doc_a,
       CASE WHEN a % 2 = 1 THEN b ELSE a END AS doc_b
FROM (
  SELECT doc_a AS a, doc_b AS b FROM ({inner})
  WHERE doc_a % 2 <> doc_b % 2
) ORDER BY doc_a, doc_b
""".strip().format(inner=dedup.ngram_jaccard_dupes_sql(threshold=0.8)),
        "multimodal_cdc_chunks": __import__(
            "fluent_server_ray.stages.cdc", fromlist=["x"]
        ).cdc_chunks_sql(),
        "curation_near_dedup": __import__(
            "fluent_server_ray.pipelines.curation", fromlist=["x"]
        ).curate_documents_near_dedup_sql(),
        "cms_event_counts": """
SELECT event_type, CAST(count(*) AS BIGINT) AS est_n FROM events
WHERE event_type IN ('click', 'error', 'purchase', 'signup', 'view')
GROUP BY event_type ORDER BY event_type
""".strip(),
        "approx_distinct_users": (
            "SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
            "TRUE AS hll_ok FROM events"
        ),
        "dedup_clusters": dedup.pair_components_sql(
            dedup.ngram_jaccard_dupes_sql(threshold=0.8)
        ),
        "dedup_keep_best": dedup.keep_best_per_component_sql(
            dedup.ngram_jaccard_dupes_sql(threshold=0.8)
        ),
        "dedup_cluster_sizes": (
            "WITH comp AS ("
            + dedup.pair_components_sql(
                dedup.ngram_jaccard_dupes_sql(threshold=0.8))
            + ") SELECT size, CAST(count(*) AS BIGINT) AS n_clusters "
            "FROM (SELECT component, CAST(count(*) AS BIGINT) AS size "
            "FROM comp GROUP BY component) GROUP BY size ORDER BY size"),
        "conv_exact_dedup": (
            "WITH docs AS (" + assembly.conv_to_documents_sql() + ") "
            "SELECT conv_id, doc_text FROM ("
            "SELECT conv_id, doc_text, row_number() OVER ("
            "PARTITION BY doc_text ORDER BY conv_id) AS rn FROM docs"
            ") WHERE rn = 1 ORDER BY conv_id"),
        "dedup_simhash": dedup.simhash_sql(),
        "dedup_simhash_pairs": dedup.simhash_pairs_sql(max_hamming=3),
        "ann_cosine_topk": similarity.ann_topk_sql(ANN_QUERY_IDS, k=ANN_K),
        # n_probe = n_centroids degenerates IVF to exact brute force:
        # the brute-force oracle is strict for it
        "ann_ivf_exact": similarity.ann_topk_sql(ANN_QUERY_IDS, k=ANN_K),
        "kmeans_assign_fixed_centroids":
            similarity.kmeans_assign_fixed_sql(tuple(range(8))),
        "embedding_dupes": similarity.cosine_dupes_sql(COSINE_DUP_T),
        "embedding_dup_clusters": _embedding_dup_clusters_sql(),
        "multimodal_decode": multimodal.decode_documents_sql(),
        "multimodal_frames": multimodal.frame_sample_sql(),
        "multimodal_resize": multimodal.resize_sql(),
        "multimodal_embed": multimodal.embed_stub_sql(),
        "sessionize": windows.sessionize_sql(),
        "tumbling_counts": windows.tumbling_counts_sql(),
        "sliding_counts": windows.sliding_counts_sql(),
        "tumbling_value_agg": _tumbling_value_agg_sql(),
        "asof_prior_click": windows.asof_prior_event_sql(),
        "asof_next_click": windows.asof_next_event_sql(),
        "range_join_purchase_windows": _range_join_sql(),
        "lineitem_agg": rel.lineitem_agg_sql(),
        "orders_by_nation": rel.orders_by_nation_sql(),
        "top_orders": rel.top_orders_sql(),
        "distinct_event_types": rel.distinct_event_types_sql(),
        "union_high_low": rel.union_high_low_value_sql(),
        "join_revenue_by_priority": rel.revenue_by_priority_sql(),
        "fk_integrity_audit": rel.fk_integrity_audit_sql(),
        "packing_efficiency": assembly.packing_efficiency_sql(),
        "doc_rank_fusion": features.rank_fusion_sql(),
        "purchase_attribution": windows.touch_attribution_sql(),
        "events_daily_ffill": windows.daily_ffill_sql(),
        "tags_decayed": (oracle.with_pipeline_ctes() + "\n"
                         + windows.decayed_counts_sql()),
        "source_length_gini": textstats.source_length_gini_sql(),
        "events_props_audit": fields.props_audit_sql(),
        "docs_chi2_lang_source": features.contingency_chi2_cat_sql(),
        "dup_degree_histogram": _dup_degree_hist_sql(),
        "source_distinctive_bigrams":
            textstats.source_distinctive_bigrams_sql(),
        "doc_collapse_repeats": hygiene.collapse_repeat_tokens_sql(),
        "turns_pit_features": windows.pit_window_features_sql(),
        "lineitem_monthly_revenue": rel.monthly_revenue_sql(),
        "events_weekly_growth": windows.weekly_growth_sql(),
        "events_dow_hour_profile": windows.dow_hour_profile_sql(),
        "dup_cluster_examples": _dup_cluster_examples_sql(),
        "sink_tool_mode": (
            oracle.with_pipeline_ctes(
                "tl AS (SELECT sink, tool FROM routed "
                "WHERE tool IS NOT NULL)") + "\n"
            + aggregate.grouped_mode_sql("sink", "tool", "tl")),
        "doc_type_token_ratio": textstats.type_token_ratio_sql(),
        "user_event_melt": """
WITH u AS (SELECT DISTINCT user_id FROM events),
v(variable, et) AS (VALUES """ + ", ".join(
            f"('n_{t}', '{t}')" for t in _EVENT_TYPES) + """),
c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT u.user_id, v.variable,
  CAST(COALESCE(c.n, 0) AS BIGINT) AS value
FROM u CROSS JOIN v
LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = v.et
ORDER BY u.user_id, v.variable""",
        "dedup_replayed_turns": rel.dedup_replayed_turns_sql(),
        "anti_join_customers": rel.customers_without_orders_sql(),
        "anti_join_customers_bloom": rel.customers_without_orders_sql(),
        "semi_join_customers": rel.customers_with_orders_sql(),
        "events_late_flags": windows.late_flags_sql(),
        "events_extract_props": fields.extract_fields_sql(),
        "doc_grep_filter": fields.grep_filter_sql(
            include=GREP_INCLUDE, exclude=GREP_EXCLUDE,
            select="doc_id, text"),
        "doc_chunk_windows": assembly.chunk_windows_sql(),
        "user_event_pivot": features.pivot_counts_sql(
            "user_id", "event_type", EVENT_TYPES),
        "events_value_zscore": features.zscore_sql(),
        "events_zscore_by_type": features.grouped_zscore_sql(),
        "docs_mixture_sample": sampling.mixture_sample_sql(MIXTURE),
        "events_throttled": windows.throttle_sql(),
        "transcripts_multiline": oracle.with_pipeline_ctes() + "\n"
        + assembly.concat_multiline_sql(),
        "transcripts_suppress": oracle.with_pipeline_ctes() + "\n"
        + assembly.suppress_sql(),
        "trending_tags": oracle.with_pipeline_ctes() + "\n"
        + windows.window_topk_sql(),
        "transcripts_copy_route": oracle.with_pipeline_ctes() + "\n"
        + __import__("fluent_server_ray.stages.route",
                     fromlist=["copy_route_sql"]).copy_route_sql(
                         COPY_ROUTES),
        "transcripts_retag": oracle.with_pipeline_ctes()
        + "\nSELECT conv_id, turn_idx, "
        + __import__("fluent_server_ray.stages.route",
                     fromlist=["retag_case_sql"]).retag_case_sql(RETAG_RULES)
        + " AS tag FROM routed",
        "transcripts_pseudonymize": (
            "WITH "
            + __import__("fluent_server_ray.sources.transcripts",
                         fromlist=["x"]).TRANSCRIPTS_SQL_CTE
            + "\nSELECT "
            + __import__("fluent_server_ray.stages.hygiene",
                         fromlist=["pseudonymize_expr_sql"]
                         ).pseudonymize_expr_sql("conv_id")
            + " AS conv_id, turn_idx, role FROM transcripts"
            " ORDER BY conv_id, turn_idx"),
        "bigram_top_pairs": textstats.bigram_top_sql(),
        "word_postings_index": textstats.word_postings_sql(max_docs=400),
        "events_value_pct_rank": features.percentile_rank_sql(),
        "doc_token_ids": textstats.encode_with_vocab_sql(
            textstats.vocab_top_words_sql(k=20)),
        "docs_above_median_tokens":
            textstats.token_filter_above_quantile_sql(),
        "customer_order_profile": rel.customer_order_profile_sql(),
        "shipping_priority": rel.shipping_priority_sql(),
        "rollup_order_counts": rel.rollup_order_counts_sql(),
        # cms_event_counts: probabilistic overestimate — rows-only
        "vocab_top_words": textstats.vocab_top_words_sql(),
        "docs_weighted_sample": sampling.weighted_sample_sql(),
        "docs_per_source_cap": sampling.per_key_cap_sql(),
        "docs_token_budget": sampling.select_token_budget_sql(budget=600),
        "docs_corpus_shuffle": sampling.shuffle_order_sql(),
        "docs_sample_bottomk": sampling.bottomk_sample_sql(),
        "user_funnel": windows.funnel_sql(),
        "window_distinct_users": windows.window_distinct_users_sql(),
        # ann_ivf_persisted: probabilistic (recall<1) — rows-only
        "topk_per_customer": rel.top_orders_per_customer_sql(),
        # approx_distinct_users: probabilistic sketch — rows-only
        "price_quantiles": __import__(
            "fluent_server_ray.stages.sketches", fromlist=["binned_quantiles_sql"]
        ).binned_quantiles_sql("o_totalprice", table="orders",
                               **VALUE_QUANTILE_ARGS),
        "doc_token_quantiles": _token_quantiles_sql(),
        "value_quantiles_by_type": _value_quantiles_by_type_sql(),
        "heavy_hitter_tags": _heavy_hitter_tags_sql(),
        "event_value_stats": _event_value_stats_sql(),
        "conv_value_stats": _conv_value_stats_sql(),
        "transcripts_sample_convs": _sample_convs_sql(),
        "curation_pipeline": __import__(
            "fluent_server_ray.pipelines.curation",
            fromlist=["curate_documents_sql"],
        ).curate_documents_sql(),
        "curation_gate_funnel": __import__(
            "fluent_server_ray.pipelines.curation",
            fromlist=["curation_gate_funnel_sql"],
        ).curation_gate_funnel_sql(),
        "doc_pii_scrub": hygiene.scrub_sql(),
        "transcripts_scrub_uids": _scrub_uids_sql(),
        "doc_ngram_repetition": hygiene.ngram_repetition_sql()
        + "\nORDER BY doc_id",
        "doc_decontaminate": hygiene.decontaminate_sql()
        + "\nORDER BY doc_id",
        "conv_running_stats": assembly.running_turn_stats_sql(),
        "conv_documents": assembly.conv_to_documents_sql(),
        "sft_loss_spans": assembly.sft_loss_spans_sql(),
        "conv_truncate_context": assembly.conv_truncate_context_sql(
            max_tokens=64),
        "doc_pack_sequences": assembly.pack_sequences_sql(),
        "doc_split_assign": assembly.split_assign_sql(),
        # round-3 session-5 additions
        "dedup_substring": dedup.substring_dupes_sql(window_k=8),
        "doc_unigram_logprob": textstats.doc_unigram_logprob_sql()
        + "\nORDER BY doc_id",
        "embedding_quantize": similarity.embedding_quantize_sql()
        + "\nORDER BY vec_id, dim",
        # embedding_pca: eigenbasis not SQL-expressible — rows-only
        "user_retention_cohorts": windows.retention_cohorts_sql(),
        "order_count_distribution": rel.order_count_distribution_sql(),
        "events_value_rank_in_type": features.rank_in_group_sql(),
        "lm_prep_pipeline": __import__(
            "fluent_server_ray.pipelines.curation",
            fromlist=["lm_prep_documents_sql"],
        ).lm_prep_documents_sql(),
        "doc_normalize": hygiene.normalize_text_sql(),
        "users_per_event_type": __import__(
            "fluent_server_ray.stages.aggregate",
            fromlist=["grouped_distinct_count_sql"],
        ).grouped_distinct_count_sql("event_type", "user_id"),
        "conv_line_dedup": _conv_line_dedup_sql(),
        "conv_structure_flags": assembly.conv_structure_sql(),
        "turns_prior_event": (
            "WITH "
            + __import__("fluent_server_ray.sources.transcripts",
                         fromlist=["x"]).TRANSCRIPTS_SQL_CTE + """
, t AS (
  SELECT conv_id, turn_idx, ts,
    CAST(substr(conv_id, 6) AS BIGINT) AS user_id
  FROM transcripts
)
SELECT t.conv_id, t.turn_idx,
  CAST(e.event_id AS DOUBLE) AS prior_event_id
FROM t ASOF LEFT JOIN events e
  ON t.user_id = e.user_id AND t.ts > e.ts
ORDER BY t.conv_id, t.turn_idx"""
        ),
        "turns_prior_event_ts": (
            "WITH "
            + __import__("fluent_server_ray.sources.transcripts",
                         fromlist=["x"]).TRANSCRIPTS_SQL_CTE + """
, t AS (
  SELECT conv_id, turn_idx, ts,
    CAST(substr(conv_id, 6) AS BIGINT) AS user_id
  FROM transcripts
)
SELECT t.conv_id, t.turn_idx,
  CAST(e.event_id AS DOUBLE) AS prior_event_id,
  e.ts AS prior_ts
FROM t ASOF LEFT JOIN events e
  ON t.user_id = e.user_id AND t.ts > e.ts
ORDER BY t.conv_id, t.turn_idx"""
        ),
        "events_ts_id_corr": features.pearson_corr_sql(
            "CAST(epoch_us(ts) // 1000000 AS BIGINT)",
            "CAST(event_id AS BIGINT)",
            "events"),
        "events_value_trend": features.grouped_ols_trend_sql(
            group_col="event_type",
            x_expr="CAST(epoch_us(ts) // 1000000 AS BIGINT)",
            y_expr=("CAST(floor(CAST(value AS DOUBLE) * 1000000.0) "
                    "AS BIGINT)"),
            table="events"),
        "doc_len_token_corr": features.pearson_corr_sql(
            "length(text)",
            "CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT)",
            "documents"),
        "transcripts_extract_args": (
            "WITH "
            + __import__("fluent_server_ray.sources.transcripts",
                         fromlist=["x"]).TRANSCRIPTS_SQL_CTE + "\n"
            + fields.extract_fields_sql(
                fields=(("q", r'args=\{"q":"([a-z]+)"\}', None,
                         "VARCHAR"),),
                src_col="text", id_cols=("conv_id", "turn_idx"),
                table="transcripts")
        ),
        "sink_msg_size_quantiles": (
            oracle.with_pipeline_ctes() + ",\n"
            + "sized AS (SELECT sink, CAST(length(text) AS BIGINT) "
              "AS n_chars FROM routed),\n"
            + __import__("fluent_server_ray.stages.sketches",
                         fromlist=["x"]).grouped_binned_quantiles_sql(
                "sink", "n_chars", lo=0.0, hi=128.0, bins=128,
                table="sized")[len("WITH "):]
        ),
        "events_profile": features.profile_table_sql(
            ["event_id", "user_id", "event_type", "props"]),
        "lm_tokenize_pack": """
WITH enc AS (
  {enc}
), t AS (
  SELECT doc_id, doc_id % {nb} AS bucket, n_tokens AS n FROM enc
), c AS (
  SELECT doc_id, bucket,
    sum(n) OVER (PARTITION BY bucket ORDER BY doc_id) - n AS off
  FROM t
)
SELECT doc_id, bucket,
  CAST(off // {budget} AS BIGINT) AS seq_id,
  CAST(off % {budget} AS BIGINT) AS seq_off
FROM c ORDER BY doc_id
""".strip().format(
            enc=bpe.bpe_encode_sql(n_merges=8),
            nb=__import__("fluent_server_ray.stages.assembly",
                          fromlist=["x"]).PACK_BUCKETS,
            budget=__import__("fluent_server_ray.stages.assembly",
                              fromlist=["x"]).PACK_BUDGET,
        ),
        "transcripts_log_templates": (
            "WITH "
            + __import__("fluent_server_ray.sources.transcripts",
                         fromlist=["x"]).TRANSCRIPTS_SQL_CTE + "\n"
            + fields.log_templates_sql()
        ),
        "events_throttle": windows.throttle_sql(width_seconds=3600,
                                                limit=3),
        "conv_merge_roles": assembly.conv_merge_roles_sql(),
        "doc_bigram_logprob": textstats.doc_bigram_logprob_sql(),
        "median_value_by_type": __import__(
            "fluent_server_ray.stages.aggregate",
            fromlist=["grouped_exact_median_sql"],
        ).grouped_exact_median_sql("event_type", "value", "events"),
        "conv_context_windows": assembly.conv_context_windows_sql(),
        "conv_turn_gaps": assembly.conv_turn_gaps_sql(),
        "transcripts_role_latency": assembly.role_transition_latency_sql(),
        "source_gram_diversity": textstats.gram_diversity_by_source_sql(),
        "docs_gated_per_lang": hygiene.gate_per_language_sql(),
        # flagship CTE chain + the anomaly query's own CTEs spliced
        # into ONE WITH clause (the anomaly SQL starts "WITH wc AS")
        "transcripts_sink_anomalies": (
            oracle.with_pipeline_ctes() + ",\n"
            + windows.window_anomalies_sql(
                width_seconds=600, threshold=2.0, table="routed",
                key_col="sink")[len("WITH "):]),
        "doc_token_entropy": textstats.doc_token_entropy_sql(),
        "doc_oov_rate": textstats.oov_rate_sql(vocab_k=200),
        "dedup_edit_distance": dedup.edit_distance_dupes_sql(),
        "events_ab_ttest": features.welch_ttest_sql(
            group_col="event_type",
            value_expr=("CAST(floor(CAST(value AS DOUBLE) * 1000000.0)"
                        " AS BIGINT)"),
            group_a="error", group_b="click", table="events"),
        "langid_confusion": textstats.langid_confusion_sql(),
        "split_leakage": hygiene.split_leakage_sql(),
        "doc_keywords": textstats.doc_keywords_sql(),
        "source_vocab_overlap": textstats.source_vocab_overlap_sql(),
        "dedup_normalized": (
            "SELECT min(doc_id) AS doc_id, text_norm FROM ("
            + hygiene.normalize_text_sql() + ") GROUP BY text_norm"),
        "dedup_winnow_pairs": dedup.winnow_pairs_sql(min_shared=40),
        "vocab_novelty_daily": (
            "WITH "
            + __import__("fluent_server_ray.sources.transcripts",
                         fromlist=["x"]).TRANSCRIPTS_SQL_CTE + ",\n"
            + textstats.vocab_novelty_sql()),
        "docs_shard_plan": assembly.shard_plan_sql(n_shards=16),
        "events_chi2_type_tier": features.contingency_chi2_sql(),
        "tool_pagerank": __import__(
            "fluent_server_ray.stages.graph", fromlist=["x"]
        ).pagerank_sql_rounds(
            oracle.with_pipeline_ctes("""calls AS (
  SELECT conv_id, turn_idx, parsed_tool FROM parsed WHERE kind = 'tool'
), seq AS (
  SELECT parsed_tool AS dst,
    lag(parsed_tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
      AS src
  FROM calls
), trans AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
  FROM seq WHERE src IS NOT NULL GROUP BY src, dst
)"""), n_iters=5),
        "events_robust_outliers": features.robust_outliers_sql(),
        "tool_error_rates": (
            oracle.with_pipeline_ctes()
            + "\nSELECT parsed_tool, count(*) AS n_calls,"
            " CAST(sum(CASE WHEN error_code IS NOT NULL THEN 1 ELSE 0"
            " END) AS BIGINT) AS n_errors,"
            " CAST(floor((1000000.0 * sum(CASE WHEN error_code IS NOT"
            " NULL THEN 1 ELSE 0 END)) / count(*)) AS BIGINT)"
            " AS err_rate_millionths"
            " FROM routed WHERE parsed_tool IS NOT NULL"
            " GROUP BY parsed_tool ORDER BY parsed_tool"),
        "event_interarrival_quantiles": (
            __import__("fluent_server_ray.stages.sketches",
                       fromlist=["x"]).grouped_binned_quantiles_sql(
                group_col="event_type", col="gap_sec", lo=0.0,
                hi=100_000.0, bins=1000,
                table=windows.interarrival_gaps_subquery_sql())),
        "source_dup_rate": dedup.source_dup_rate_sql(),
        "doc_sim_pairs": similarity.tfidf_cosine_pairs_sql(),
        "lang_token_kl": textstats.source_token_kl_sql(group_col="lang"),
        "tool_transition_counts": assembly.tool_transitions_sql(),
        "doc_dup_ngram_frac": hygiene.dup_ngram_fraction_sql(),
        "doc_bm25_topk": textstats.bm25_topk_sql(BM25_QUERY_TERMS, k=20),
        "bigram_pmi_top": textstats.pmi_top_pairs_sql(k=50, min_count=5),
        "orders_segment_counts_salted": (
            "SELECT c_mktsegment, count(*) AS n FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "events_value_tier_counts": (
            "SELECT event_type, "
            + __import__(
                "fluent_server_ray.stages.enrich", fromlist=["x"]
            ).range_lookup_sql_case("value", *VALUE_TIERS, out_col="tier")
            + ", count(*) AS n FROM events GROUP BY event_type, tier "
            "ORDER BY event_type, tier"
        ),
        "events_latest_per_user": aggregate.latest_by_key_sql(
            ["user_id", "event_id", "ts", "event_type", "value"],
            "user_id", ["ts", "event_id"], "events"),
        "embedding_label_centroids": similarity.label_centroids_sql(),
        "doc_tfidf_joined": textstats.doc_tfidf_sql(),
        "events_value_winsorized": features.winsorize_by_group_sql(),
        "events_psi_drift": features.psi_drift_sql(
            "event_id % 2 = 0", "event_id % 2 = 1"),
        "docs_rebalance_sources": sampling.rebalance_by_key_sql(),
        "docs_temperature_sample": sampling.temperature_sample_sql(
            group_col="lang"),
        "events_rolling_value": windows.rolling_agg_sql(),
        "doc_split_by_content": (
            "SELECT doc_id, " + assembly.split_case_sql("text")
            + " AS split FROM documents"),
        "doc_chunk_dedup": f"""
WITH ch AS (
  {assembly.chunk_windows_sql(window=20, stride=20)}
), r AS (
  SELECT doc_id, chunk_idx, chunk_text,
    row_number() OVER (PARTITION BY chunk_text
                       ORDER BY doc_id, chunk_idx) AS rn
  FROM ch
)
SELECT doc_id, chunk_idx, chunk_text FROM r WHERE rn = 1
ORDER BY doc_id, chunk_idx
""".strip(),
        "docs_diff_versions": __import__(
            "fluent_server_ray.stages.diff", fromlist=["x"]
        ).diff_by_key_sql(
            "SELECT doc_id, text FROM documents",
            "SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN upper(text) "
            "ELSE text END AS text FROM documents WHERE doc_id % 7 <> 0"),
        "top_users_per_event_type": features.grouped_topk_counts_sql(
            "event_type", "user_id", k=5),
        "window_anomalies": windows.window_anomalies_sql(
            width_seconds=3600, threshold=2.0),
        "corpus_overlap_kmv": """
WITH toks AS (
  SELECT doc_id % 2 AS half,
    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents WHERE text IS NOT NULL
), a AS (
  SELECT DISTINCT w FROM toks WHERE half = 0
), b AS (
  SELECT DISTINCT w FROM toks WHERE half = 1
), s AS (
  SELECT (SELECT count(*) FROM a) AS da,
         (SELECT count(*) FROM b) AS db,
         (SELECT count(*) FROM a JOIN b USING (w)) AS ab
)
SELECT CAST(da AS DOUBLE) AS distinct_a,
  CAST(db AS DOUBLE) AS distinct_b,
  CAST(ab AS DOUBLE) / CAST(da + db - ab AS DOUBLE) AS jaccard,
  CAST(ab AS DOUBLE) / CAST(da + db - ab AS DOUBLE)
    / (1.0 + CAST(ab AS DOUBLE) / CAST(da + db - ab AS DOUBLE))
    * (CAST(da AS DOUBLE) + CAST(db AS DOUBLE)) AS overlap_est
FROM s
""".strip(),
        "quality_curriculum_mix": __import__(
            "fluent_server_ray.pipelines.curation",
            fromlist=["quality_curriculum_sql"],
        ).quality_curriculum_sql(),
        "prompt_completion_pairs": assembly.prompt_completion_pairs_sql(),
        "doc_fim_transform": assembly.fim_transform_sql(),
        "doc_vocab_coverage": textstats.vocab_coverage_sql(),
        "docs_stratified_split": sampling.stratified_split_sql(),
        "token_graph_triangles": __import__(
            "fluent_server_ray.stages.graph", fromlist=["x"]
        ).token_triangles_sql(),
        "token_graph_clustering": __import__(
            "fluent_server_ray.stages.graph", fromlist=["x"]
        ).token_clustering_sql(),
        "token_graph_assortativity": __import__(
            "fluent_server_ray.stages.graph", fromlist=["x"]
        ).token_assortativity_sql(),
        "orders_price_band_pairs": __import__(
            "fluent_server_ray.stages.joins", fromlist=["x"]
        ).band_join_pairs_sql(
            "o_orderkey",
            "CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)",
            100, "orders"),
        "events_cusum_drift": features.cusum_flags_sql(k=70, h=25),
        "events_value_ntile": features.ntile_sql(q=4),
        "event_motifs_top": windows.event_motifs_sql(),
        "event_markov_matrix": windows.event_markov_probs_sql(),
        "events_k_anonymity": __import__(
            "fluent_server_ray.stages.hygiene", fromlist=["x"]
        ).k_anonymity_sql(
            ["event_type",
             "CAST(epoch_us(ts) // 86400000000 AS BIGINT)"],
            ["event_type", "day"], k=55, table="events"),
        "events_l_diversity": __import__(
            "fluent_server_ray.stages.hygiene", fromlist=["x"]
        ).l_diversity_sql(
            ["event_type",
             "CAST(epoch_us(ts) // 86400000000 AS BIGINT)"],
            ["event_type", "day"], "user_id", l_min=40,
            table="events"),
        "user_profile_fullouter": """
WITH p AS (
  SELECT user_id, CAST(count(*) AS DOUBLE) AS n_purchase FROM events
  WHERE event_type = 'purchase' AND value > 150 GROUP BY user_id
), e AS (
  SELECT user_id, CAST(count(*) AS DOUBLE) AS n_error FROM events
  WHERE event_type = 'error' AND value > 150 GROUP BY user_id
)
SELECT user_id, n_purchase, n_error
FROM p FULL OUTER JOIN e USING (user_id) ORDER BY user_id
""".strip(),
        "token_graph_bfs": __import__(
            "fluent_server_ray.stages.graph", fromlist=["x"]
        ).bfs_distances_sql("""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents WHERE text IS NOT NULL
), bi AS (
  SELECT t[gs] AS x, t[gs + 1] AS y
  FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(gs)
), e0 AS MATERIALIZED (
  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
  FROM bi WHERE x <> y
), w AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
    AS word
  FROM documents
), v AS (
  SELECT word, count(*) AS n FROM w GROUP BY word
  ORDER BY n DESC, word LIMIT 1
), e AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e0
  UNION ALL SELECT b, a FROM e0
)""", "(SELECT word FROM v)", max_depth=4),
        "docs_mutual_information": features.mutual_information_sql(),
        "orders_benford": features.benford_audit_sql(),
        "event_association_rules": features.association_rules_sql(),
        "events_volume_autocorr": features.volume_autocorr_sql(),
        "events_profile_full": profile_table_sql(
            {"event_id": "int", "ts": "timestamp", "user_id": "int",
             "event_type": "str", "value": "float", "props": "str"},
            "events"),
        "token_graph_kcore": __import__(
            "fluent_server_ray.stages.graph", fromlist=["x"]
        ).token_kcore_sql(k=16, rounds=8),
        "events_counts_maintained": (
            "SELECT event_type, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, "
            "CAST(count(*) AS BIGINT) AS n FROM events "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "user_session_coverage": windows.merge_intervals_sql(
            "(SELECT CAST(user_id AS VARCHAR) AS key, "
            "epoch_us(ts) AS s, "
            "epoch_us(ts) + (event_id % 600) * 1000000 AS e "
            "FROM events)"),
        "events_json_key_profile": fields.json_key_profile_sql(),
        "events_ks_value_drift": features.ks_two_sample_sql(),
        "doc_readability": textstats.readability_sql(),
        "dedup_sorted_neighborhood": dedup.sorted_neighborhood_sql(
            key_len=4, window=8),
        "events_sliding_distinct": windows.sliding_distinct_users_sql(
            width_seconds=3600, slide_seconds=1800),
        "events_rolling_value_sum": windows.rolling_frame_sum_sql(
            window_rows=5),
        "orders_cube_counts": rel.cube_order_counts_sql(),
        "orders_fd_audit": __import__(
            "fluent_server_ray.stages.profile", fromlist=["x"]
        ).fd_violations_sql("o_custkey", "o_orderpriority", "orders"),
        "transcripts_order_audit": __import__(
            "fluent_server_ray.stages.profile", fromlist=["x"]
        ).order_audit_sql(
            "inner_rel",
            prelude=__import__(
                "fluent_server_ray.sources.transcripts",
                fromlist=["x"]).TRANSCRIPTS_SQL_CTE
            + ", inner_rel AS (SELECT conv_id AS key, "
            "CAST(turn_idx AS BIGINT) AS seq, epoch_us(ts) AS us "
            "FROM transcripts), "),
        "events_pareto_shares": features.pareto_shares_sql(q=10),
        "orders_skyline": __import__(
            "fluent_server_ray.stages.frontier", fromlist=["x"]
        ).orders_skyline_sql(),
        "user_longest_streak": windows.longest_streak_sql(),
        "user_state_intervals": windows.state_intervals_sql(),
        "doc_phrase_match": textstats.phrase_match_sql(
            "data", "slow", window=1),
        "doc_proximity_match": textstats.phrase_match_sql(
            "merge", "group", window=4),
        "events_theilsen_trend": features.theilsen_trend_sql(),
        "events_mannwhitney_pairs": features.mannwhitney_pairs_sql(),
        "user_km_survival": features.km_survival_sql(),
        "item_cooccurrence": features.item_cooccurrence_sql(),
        "events_seasonal_dow": features.seasonal_dow_index_sql(),
        "events_twap": features.twap_by_group_sql(),
        "doc_boolean_search": textstats.boolean_search_sql(
            must=["data", "slow"], must_not=["spark"]),
        "events_trimmed_mean": features.trimmed_mean_sql(),
        "events_kendall_volumes": features.kendall_daily_volumes_sql(),
        "events_daily_interp": features.daily_interpolate_sql(),
        "events_runs_test": features.runs_test_daily_sql(),
        "user_churn_labels": features.churn_labels_sql(),
        "lineitem_weighted_price_quartiles": features.weighted_quantiles_sql(
            group_col="l_returnflag", value_col="l_extendedprice",
            weight_col="l_quantity", table="lineitem"),
        "events_fano_dispersion": features.fano_dispersion_sql(),
        "events_spearman_volumes": features.spearman_daily_volumes_sql(),
        "users_new_vs_returning": features.new_vs_returning_sql(),
        "orders_ship_latency_sla": features.ship_latency_quantiles_sql(),
        "events_ewma_daily": features.ewma_daily_sql(),
        "session_entry_exit": windows.session_entry_exit_sql(),
        "events_outlier_days": features.outlier_days_mad_sql(),
        "docs_cross_source_dups": __import__(
            "fluent_server_ray.stages.dedup", fromlist=["x"]
        ).cross_source_dup_histogram_sql(key_tokens=4),
        "doc_autocomplete_topk": textstats.autocomplete_topk_sql(),
        "doc_concordance": textstats.concordance_sql("merge", width=2),
        "source_simpson_diversity": textstats.simpson_diversity_sql(),
        "orders_reconciliation": __import__(
            "fluent_server_ray.stages.profile", fromlist=["x"]
        ).order_reconciliation_sql(),
        "events_id_gaps": __import__(
            "fluent_server_ray.stages.profile", fromlist=["x"]
        ).id_gap_audit_sql(where="event_type = 'purchase'"),
        "events_changepoint": features.changepoint_split_sql(),
        "events_column_topk": __import__(
            "fluent_server_ray.stages.profile", fromlist=["x"]
        ).column_topk_sql(
            {"event_type": "str", "user_id": "int", "props": "str"},
            k=3, table="events"),
        "user_funnel_abandonment": (
            "SELECT user_id, CAST(1 + (step2_ts IS NOT NULL)::INT "
            "+ (step3_ts IS NOT NULL)::INT AS BIGINT) "
            "AS furthest_step, completed FROM (\n"
            + windows.multi_funnel_sql(
                steps=("signup", "click", "purchase"),
                within_seconds=7 * 86400)
            + "\n) ORDER BY user_id"),
        "doc_fuzzy_best_match": (
            "SELECT id_l, id_r, dist FROM (\n"
            "  SELECT c.*, row_number() OVER (PARTITION BY id_l "
            "ORDER BY dist, id_r) AS rn FROM (\n"
            + __import__(
                "fluent_server_ray.stages.joins", fromlist=["x"]
            ).fuzzy_join_sql(
                "(SELECT doc_id AS id, CASE WHEN doc_id % 2 = 1 "
                "THEN substr(text, 2) ELSE text END AS text "
                "FROM documents)",
                "(SELECT doc_id AS id, text FROM documents)",
                max_dist=2, prefix_len=32)
            + "\n) c) WHERE rn = 1 ORDER BY id_l"),
        "events_quantile_normalized": features.quantile_normalize_sql(),
        "doc_label_transfer": dedup.transfer_labels_sql(
            dedup.ngram_jaccard_dupes_sql(threshold=0.8),
            "SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN lang END "
            "AS label FROM documents"),
        "doc_vocab_growth": textstats.vocab_growth_sql(
            boundaries=[49 + 50 * i for i in range(10)]),
        "user_multi_funnel": windows.multi_funnel_sql(
            steps=("signup", "click", "purchase"),
            within_seconds=7 * 86400),
        "events_volume_xcorr": features.volume_xcorr_sql(
            key_a="click", key_b="purchase", max_lag=3),
        "user_rfm_scores": features.rfm_scores_sql(),
        "events_diversified_topk": features.diversified_topk_sql(
            k=50, per_group=3),
        "doc_fuzzy_match": __import__(
            "fluent_server_ray.stages.joins", fromlist=["x"]
        ).fuzzy_join_sql(
            "(SELECT doc_id AS id, CASE WHEN doc_id % 2 = 1 "
            "THEN substr(text, 2) ELSE text END AS text "
            "FROM documents)",
            "(SELECT doc_id AS id, text FROM documents)",
            max_dist=2, prefix_len=32),
        "events_kruskal_types": features.kruskal_by_group_sql(),
        "events_anova_types": features.anova_by_group_sql(),
        "orders_target_encoding": features.target_encode_loo_sql(),
        "events_t_closeness": __import__(
            "fluent_server_ray.stages.hygiene", fromlist=["x"]
        ).t_closeness_sql(
            ["event_type",
             "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)"],
            ["event_type", "day"],
            "CAST(round(value * 100.0) AS BIGINT)",
            t_max_e6=100_000, unit=10_000, table="events"),
        "doc_wildcard_search": textstats.wildcard_search_sql(
            pattern="%merge%window%dup%"),
        "doc_spell_candidates": textstats.spell_candidates_sql(),
        "token_link_prediction": __import__(
            "fluent_server_ray.stages.graph", fromlist=["x"]
        ).token_link_prediction_sql(k=50),
        "term_burstiness": textstats.term_burstiness_sql(k=100),
        "source_js_divergence": textstats.source_js_divergence_sql(),
        "doc_rake_keyphrases": textstats.rake_keyphrases_sql(k=50),
        "events_holt_trend": features.holt_trend_sql(),
        "lineitem_small_qty_revenue": rel.small_qty_revenue_sql(),
        "orders_big_volume_customers": rel.big_volume_customers_sql(),
        "customers_dormant_balance":
            rel.dormant_high_balance_customers_sql(),
        "docs_langid_kappa": textstats.langid_kappa_sql(),
        "doc_feature_hashing": textstats.feature_hash_vectors_sql(dim=64),
        "tool_hits_scores": __import__(
            "fluent_server_ray.stages.graph", fromlist=["x"]
        ).hits_sql_rounds(
            oracle.with_pipeline_ctes("""calls AS (
  SELECT conv_id, turn_idx, parsed_tool FROM parsed WHERE kind = 'tool'
), seq AS (
  SELECT parsed_tool AS dst,
    lag(parsed_tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
      AS src
  FROM calls
), trans AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
  FROM seq WHERE src IS NOT NULL GROUP BY src, dst
)"""), n_iters=4),
        "events_key_skew": features.key_skew_audit_sql(),
        "docs_split_by_cluster": assembly.split_by_cluster_sql(),
        "dedup_blocking_eval": dedup.blocking_eval_sql(
            prefix_len=6, text_col="props", table="events"),
        "user_seq_patterns": features.sequential_patterns_sql(),
        "lang_token_fertility": textstats.token_fertility_sql(),
        "events_schema_drift": fields.json_schema_drift_sql(),
        "events_markov_entropy": windows.markov_entropy_rate_sql(),
        "supplier_top_revenue": rel.top_supplier_revenue_sql(),
        "doc_contamination_score": hygiene.contamination_score_sql(),
        "events_holtwinters": features.holtwinters_trend_sql(),
        "part_basket_pairs": rel.part_basket_pairs_sql(),
        "nation_revenue_q5": rel.local_supplier_volume_sql(),
        "returned_item_customers": rel.returned_item_customers_sql(),
        "promo_revenue_share": rel.promo_revenue_share_sql(),
        "doc_nb_langid": textstats.naive_bayes_classify_sql(),
        "events_jarque_bera": features.jarque_bera_by_group_sql(),
        "events_brown_forsythe": features.brown_forsythe_by_group_sql(),
        "events_gini_splits": features.gini_best_splits_sql(),
        "inclusion_audit": profile.inclusion_audit_sql(),
        "multimodal_phash_dupes": multimodal.phash_dupes_sql(),
        "part_phonetic_pairs": textstats.phonetic_word_pairs_sql(
            table="part", text_col="p_name"),
        "banded_discount_revenue": rel.forecast_revenue_delta_sql(),
        "nation_volume_q7": rel.nation_volume_shipping_sql(),
        "nation_market_share_q8": rel.nation_market_share_sql(),
        "embedding_mmr_topk": similarity.mmr_topk_sql(),
        "doc_next_words": textstats.next_word_topk_sql(),
        "events_selfjoin_size": features.selfjoin_size_sql(),
        "events_max_drawdown": features.max_drawdown_by_group_sql(),
        "transcripts_record_transform": (
            oracle.with_pipeline_ctes() + "\nSELECT "
            + fields.record_transform_select_sql(
                RT_COLS, add=RT_ADD, rename=RT_RENAME, remove=RT_REMOVE)
            + " FROM routed"),
        "orders_priority_late": rel.late_order_priority_counts_sql(),
        "lineitem_band_revenue_q19": rel.disjunctive_band_revenue_sql(),
        "nation_year_profit_q9": rel.nation_year_profit_sql(),
        "part_revenue_important": rel.part_revenue_important_sql(),
        "part_supplier_counts_q16": rel.part_attr_supplier_counts_sql(),
        "supplier_excess_share_q20": rel.excess_share_suppliers_sql(),
        "part_min_price_supplier_q2": rel.part_min_price_supplier_sql(),
        "supplier_sole_late_q21": rel.sole_late_supplier_counts_sql(),
        "doc_gazetteer_tags": textstats.gazetteer_tags_sql(),
        "events_rank_delta": features.rank_delta_by_window_sql(),
        "orders_nested_lines": assembly.nest_order_lines_sql(),
        "events_rule_matches": features.standing_rule_matches_sql(),
        "events_jsonl_roundtrip": _ROUNDTRIP_AGG_SQL,
        "events_csv_roundtrip": _ROUNDTRIP_AGG_SQL,
        "embedding_hard_negatives": similarity.hard_negative_topk_sql(
            ANN_QUERY_IDS, k=ANN_K),
        "embedding_knn_label_audit": similarity.knn_classify_sql(
            ANN_QUERY_IDS, k=ANN_K),
        "events_mann_kendall": features.mann_kendall_trend_sql(),
        "users_mcnemar_click_purchase": features.mcnemar_paired_sql(),
        "events_rolling_median": windows.rolling_frame_median_sql(),
        "events_rr_private_counts": hygiene.rr_private_daily_counts_sql(),
        "user_sprt_decisions": features.user_sprt_decisions_sql(),
        "users_wilcoxon_signed_rank": features.wilcoxon_signed_rank_sql(),
        "events_peak_concurrency": windows.peak_concurrency_sql(),
        "events_ipc_roundtrip": _ROUNDTRIP_AGG_SQL,
        "events_orc_roundtrip": _ROUNDTRIP_AGG_SQL,
        "token_graph_sssp": __import__(
            "fluent_server_ray.stages.graph", fromlist=["x"]
        ).weighted_sssp_sql("""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents WHERE text IS NOT NULL
), bi AS (
  SELECT t[gs] AS x, t[gs + 1] AS y
  FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(gs)
), e0 AS MATERIALIZED (
  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
  FROM bi WHERE x <> y
), wd AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
    AS word
  FROM documents
), v AS (
  SELECT word, count(*) AS n FROM wd GROUP BY word
  ORDER BY n DESC, word LIMIT 1
)""", "(SELECT word FROM v)", cost_cap=40),
        "events_bootstrap_mean_ci": features.bootstrap_daily_mean_ci_sql(),
        "users_cuped_ab_means": features.cuped_adjusted_means_sql(),
        "events_weekly_periodogram": features.weekly_periodogram_sql(),
        "users_permutation_sign_test": features.permutation_sign_test_sql(),
        "events_wilson_ci": features.wilson_proportion_ci_sql(),
        "events_ols_hour_dow": features.ols_hour_dow_sql(),
        "user_clamped_balance": windows.clamped_balance_sql(),
        "events_ohlc_daily": windows.ohlc_daily_bars_sql(),
        "users_cochran_q": features.cochran_q_sql(),
        "events_daily_motif": features.daily_motif_sql(),
        "events_allan_variance": features.allan_variance_sql(),
        "events_haar_energy": features.haar_energy_sql(),
        "events_pairwise_perm_bh": features.pairwise_permutation_bh_sql(),
        "user_cdc_apply": windows.cdc_apply_sql(),
        "doc_sentence_stats": textstats.sentence_stats_sql(),
        "doc_extractive_summary": textstats.extractive_summary_sql(),
        "doc_charset_profile": textstats.charset_profile_sql(),
        "source_yules_k": textstats.yules_k_sql(),
        "events_daily_lis": features.daily_lis_sql(),
        "doc_word_dropout": hygiene.word_dropout_sql(),
        "events_sn_scale": features.sn_scale_sql(),
        "events_hoover_index": features.hoover_index_sql(),
        "transcripts_verbosity_by_tenant":
            oracle.verbosity_by_tenant_sql(),
        "tenant_hour_profile_distance": __import__(
            "fluent_server_ray.pipelines.flagship", fromlist=["x"]
        ).tenant_hour_profile_distance_sql(),
        "nation_customer_hhi": rel.nation_customer_hhi_sql(),
        "user_threshold_crossing": windows.threshold_crossing_sql(),
        "source_kish_ess": textstats.kish_ess_sql(),
        "events_return_periods": features.return_periods_sql(),
        "transcripts_tool_basket_pairs": __import__(
            "fluent_server_ray.pipelines.flagship", fromlist=["x"]
        ).tool_basket_pairs_sql(),
        "events_hour_entropy": features.hour_entropy_sql(),
        "transcripts_tag_prefix_rollup": __import__(
            "fluent_server_ray.pipelines.flagship", fromlist=["x"]
        ).tag_prefix_rollup_sql(),
        "tenant_salt_plan": __import__(
            "fluent_server_ray.pipelines.flagship", fromlist=["x"]
        ).tenant_salt_plan_sql(target_rows=200),
        "events_burstiness": features.burstiness_sql(),
        "orders_fd_discovery": profile.fd_discovery_sql(),
        "users_cohort_ltv": windows.cohort_ltv_sql(),
        "events_kendalls_w": features.kendalls_w_sql(),
        "users_hash_collision_audit": features.hash_collision_audit_sql(),
        "events_merkle_fingerprint": profile.merkle_fingerprint_sql(),
        "user_fifo_allocation": windows.fifo_allocation_sql(),
        "users_did_estimate": features.did_estimate_sql(),
        "events_hodges_lehmann": features.hodges_lehmann_sql(),
        "users_capture_recapture": features.capture_recapture_sql(),
        "events_record_days": features.record_days_sql(),
    }
