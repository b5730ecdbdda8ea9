"""Distributed graph analytics over edge Datasets.

The near-dup clustering step (:func:`dedup.pair_components`) already
does distributed hash-min label propagation; this module adds the
other graph primitive a log/curation pipeline wants: PAGERANK over a
weighted directed graph that lives as a Dataset of edges (tool→tool
transition graphs, doc-link graphs, user-interaction graphs).

Quantized-integer contract: ranks are int64 BILLIONTHS and every
update is floor arithmetic, so the fixed-point sequence is exactly
reproducible on any engine — the same integer-exactness house rule as
the TF-IDF/BM25/PMI operators (a float PageRank's sums are
order-dependent and can never strict-match an oracle). The quantized
iteration is within ~1e-9·n of the real-valued one per step; the
operator's semantics ARE the quantized sequence, mirrored round-for-
round by an unrolled DuckDB CTE (:func:`pagerank_sql_rounds`).

Dangling-node mass (no out-edges) is dropped, not redistributed —
the "sink-loss" PageRank variant; document the choice, keep the
mirror identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SCALE = 1_000_000_000  # ranks in billionths


def pagerank(edges, src: str = "src", dst: str = "dst", w: str = "w",
             n_iters: int = 5, damping_millis: int = 850,
             n_buckets: int = 32):
    """Weighted PageRank, ``n_iters`` synchronous rounds.

    Per round (all bounded exchanges, nothing on the driver except
    the node COUNT):

    1. edges ⋈ ranks on ``src`` (one bucketed hash join — inner, so
       int64 columns survive),
    2. per-edge contribution ``(r·w) // outw`` (int64; a guard raises
       before ``r·w`` could wrap),
    3. distributed sum by ``dst`` (``grouped_agg(final='ray')``),
    4. nodes LEFT ⋈ incoming, ``r' = teleport + (d·inc) // 1000`` with
       ``teleport = (SCALE·(1000-d)) // (1000·n)``.

    Out-weights attach to edges once up front; each round's ranks
    materialize (≤ one row per node) so round k+1 never re-executes
    round k. Returns a Dataset (node, rank_billionths) sorted by node.
    """
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.joins import bucketed_hash_join

    if isinstance(edges, pa.Table):  # bounded edge lists (e.g. the
        edges = rd.from_arrow(edges)  # tool graph) arrive as Tables
    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(t[src], pa.string()),
            "dst": pc.cast(t[dst], pa.string()),
            "w": pc.cast(t[w], pa.int64()),
        })

    e = edges.map_batches(skip_empty(edge_rows), batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([t["src"].combine_chunks().cast(pa.string()),
                                 t["dst"].combine_chunks().cast(pa.string())])
        return pa.table({"node": both}).group_by("node").aggregate([])

    nodes = grouped_agg(
        e.map_batches(skip_empty(node_partial), batch_format="pyarrow",
                      zero_copy_batch=True),
        keys=["node"], aggs=[("node", "count")], final="ray"
    ).drop_columns(["node_count"]).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], type=pa.string()),
            "rank_billionths": pa.array([], type=pa.int64()),
        }))

    outw = grouped_agg(e, keys=["src"], aggs=[("w", "sum")], final="ray")

    def rn_out(t: pa.Table) -> pa.Table:
        return t.rename_columns(["src", "outw"])

    ew = bucketed_hash_join(
        e, outw.map_batches(rn_out, batch_format="pyarrow",
                            zero_copy_batch=True),
        key="src", n_buckets=n_buckets).materialize()

    r0 = SCALE // n_nodes
    teleport = (SCALE * (1000 - damping_millis)) // (1000 * n_nodes)

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "r": pa.array(np.full(t.num_rows, r0, dtype=np.int64)),
        })

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def rn_rank(t: pa.Table) -> pa.Table:
        return t.rename_columns(["src", "r"])

    def contrib(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        wv = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        ow = t["outw"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(r) and float(r.max()) * float(wv.max()) >= 2.0 ** 62:
            raise ValueError(
                "pagerank: rank·weight would overflow int64 — rescale "
                "edge weights before calling")
        c = (r * wv) // ow
        return pa.table({"dst": t["dst"], "c": pa.array(c)})

    for _ in range(n_iters):
        j = bucketed_hash_join(
            ew,
            ranks.map_batches(rn_rank, batch_format="pyarrow",
                              zero_copy_batch=True),
            key="src", n_buckets=n_buckets)
        inc = grouped_agg(
            j.map_batches(skip_empty(contrib), batch_format="pyarrow",
                          zero_copy_batch=True),
            keys=["dst"], aggs=[("c", "sum")], final="ray")

        def rn_inc(t: pa.Table) -> pa.Table:
            return t.rename_columns(["node", "inc"])

        nj = bucketed_hash_join(
            nodes,
            inc.map_batches(rn_inc, batch_format="pyarrow",
                            zero_copy_batch=True),
            key="node", how="left", n_buckets=n_buckets)

        def update(t: pa.Table) -> pa.Table:
            # left-join fill side rides float64 (NaN = no in-edges);
            # incoming sums are < SCALE < 2^53, so the cast is exact
            iv = t["inc"].to_numpy(zero_copy_only=False)
            iv = np.nan_to_num(iv, nan=0.0)
            if len(iv) and iv.max() >= 2.0 ** 53:
                raise ValueError("pagerank: incoming mass exceeds "
                                 "float64-exact range")
            inc_i = iv.astype(np.int64)
            r_new = teleport + (damping_millis * inc_i) // 1000
            return pa.table({"node": t["node"], "r": pa.array(r_new)})

        ranks = nj.map_batches(skip_empty(update), batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    def finish(t: pa.Table) -> pa.Table:
        return t.rename_columns(["node", "rank_billionths"])

    return (ranks.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)
            .sort(["node"]))


def pagerank_sql_rounds(with_trans_chain: str, n_iters: int = 5,
                        damping_millis: int = 850) -> str:
    """Unrolled-round DuckDB mirror. ``with_trans_chain`` is a
    complete ``WITH ...`` chain whose LAST CTE is ``trans`` with
    columns (src, dst, w); the rounds append to it. Every round is
    ``AS MATERIALIZED`` (DuckDB inlines twice-referenced CTEs; an
    unrolled chain would otherwise recompute the prefix exponentially
    — NOTES r4 gotcha)."""
    d = damping_millis
    parts = [with_trans_chain.rstrip().rstrip(",")]
    parts.append("""
nodes AS MATERIALIZED (
  SELECT src AS node FROM trans UNION SELECT dst FROM trans
), outw AS MATERIALIZED (
  SELECT src, sum(w) AS outw FROM trans GROUP BY src
), nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
r0 AS MATERIALIZED (
  SELECT node, CAST(1000000000 // (SELECT n FROM nn) AS BIGINT) AS r
  FROM nodes
)""".strip())
    for i in range(1, n_iters + 1):
        parts.append(f"""
r{i} AS MATERIALIZED (
  SELECT nd.node,
    CAST((CAST(1000000000 AS BIGINT) * {1000 - d})
           // (1000 * (SELECT n FROM nn))
         + ({d} * COALESCE(inc.s, 0)) // 1000 AS BIGINT) AS r
  FROM nodes nd LEFT JOIN (
    SELECT t.dst AS node, sum((r.r * t.w) // o.outw) AS s
    FROM trans t
    JOIN r{i - 1} r ON t.src = r.node
    JOIN outw o ON t.src = o.src
    GROUP BY t.dst) inc ON nd.node = inc.node
)""".strip())
    body = ",\n".join(parts)
    return (body + f"\nSELECT node, r AS rank_billionths FROM r{n_iters} "
            f"ORDER BY node")


def token_adjacency_edges(ds, text_col: str = "text",
                          n_buckets: int = 64):
    """Undirected word-adjacency graph of a corpus: one edge per
    DISTINCT unordered pair of ADJACENT tokens (self-loops dropped) —
    the co-occurrence graph whose structure (communities, triangles)
    phrase-mining and topic analyses read. Same tokenizer contract as
    :func:`textstats.bigram_top` (single-space split, empties
    dropped, doc boundaries masked).

    Per-batch: ONE shifted self-join of the flat token array →
    canonical (lo, hi) → local distinct (Arrow group_by combiner);
    the unbounded pair space then merges via the distributed distinct
    (``grouped_agg(final='ray')``). Returns a Dataset (lo, hi)."""
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t[text_col], ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        doc_of = doc_of[keep]
        if len(flat) < 2:
            return pa.table({"lo": pa.array([], pa.string()),
                             "hi": pa.array([], pa.string())})
        x = flat.slice(0, len(flat) - 1)
        y = flat.slice(1)
        same = pa.array((doc_of[:-1] == doc_of[1:])
                        & ~np.equal(np.asarray(x, dtype=object),
                                    np.asarray(y, dtype=object)))
        x, y = x.filter(same), y.filter(same)
        lt = pc.less(x, y)
        return (pa.table({"lo": pc.if_else(lt, x, y),
                          "hi": pc.if_else(lt, y, x)})
                .group_by(["lo", "hi"]).aggregate([]))

    e = ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True)
    return grouped_agg(e, keys=["lo", "hi"], aggs=[("lo", "count")],
                       final="ray").drop_columns(["lo_count"])


def _distinct_canonical_edges(edges, a: str, b: str):
    """Shared first step of every undirected-graph operator here:
    per-batch canonicalize (drop self-loops, order endpoints, local
    distinct combiner), then the distributed distinct merge.
    Returns a Dataset (lo, hi) of distinct undirected edges."""
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    if isinstance(edges, pa.Table):
        edges = rd.from_arrow(edges)

    def canon(t: pa.Table) -> pa.Table:
        x = pc.cast(t[a], pa.string())
        y = pc.cast(t[b], pa.string())
        ne = pc.invert(pc.equal(x, y))
        x, y = x.filter(ne), y.filter(ne)
        lt = pc.less(x, y)
        return (pa.table({"lo": pc.if_else(lt, x, y),
                          "hi": pc.if_else(lt, y, x)})
                .group_by(["lo", "hi"]).aggregate([]))

    return grouped_agg(
        edges.map_batches(skip_empty(canon), batch_format="pyarrow",
                          zero_copy_batch=True),
        keys=["lo", "hi"], aggs=[("lo", "count")], final="ray",
    ).drop_columns(["lo_count"])



def triangle_count(edges, a: str = "lo", b: str = "hi",
                   n_buckets: int = 64,
                   max_dense_nodes: int = 4096) -> pa.Table:
    """Exact triangle count of an undirected graph — the
    degree-ORIENTED (compact-forward) plan whose total wedge work is
    O(m^{3/2}) regardless of degree skew (Chiba–Nishizeki; the
    standard MapReduce formulation is Suri & Vassilvitskii 2011,
    "Counting Triangles and the Curse of the Last Reducer" — the hub
    node that breaks the naive node-iterator IS the curse this plan
    dodges):

    1. canonical distinct edges (combiner + distributed distinct),
    2. degrees via distributed count,
    3. orient every edge from its (deg, node)-smaller endpoint — a
       total order, so each node's OUT-degree is ≤ O(√m) even if its
       raw degree is corpus-sized,
    4. wedges per source (ONE src-bucket exchange, per-bucket
       vectorized self-merge) emitted in the same total order,
    5. close wedges against the oriented edge set (ONE pair-keyed
       cogrouped exchange) — each triangle counted exactly once.

    Size-adaptive DRIVER continuation (the house pattern of
    tfidf_cosine_pairs/pair_components): when the distinct node set
    fits ``max_dense_nodes``, the bounded edge list pulls to the
    driver and the count is one dense boolean matmul
    (``Σ (A²∘A)/6``) — byte-identical to the distributed path (parity
    pinned in pytest), which remains for open-scale graphs.

    Returns a 1-row Table (n_nodes, n_edges, n_triangles).
    """
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import (grouped_agg,
                                                    hash_bucket_array,
                                                    skip_empty)
    from fluent_server_ray.stages.groups import map_buckets
    from fluent_server_ray.stages.joins import bucketed_hash_join

    if isinstance(edges, pa.Table):
        edges = rd.from_arrow(edges)

    e = _distinct_canonical_edges(edges, a, b).materialize()
    n_edges = e.count()
    if n_edges == 0:
        return pa.table({"n_nodes": pa.array([0], pa.int64()),
                         "n_edges": pa.array([0], pa.int64()),
                         "n_triangles": pa.array([0], pa.int64())})

    def node_partial(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([t["lo"].combine_chunks(),
                                 t["hi"].combine_chunks()])
        return (pa.table({"node": both}).group_by("node")
                .aggregate([([], "count_all")])
                .rename_columns(["node", "c"]))

    deg = grouped_agg(
        e.map_batches(skip_empty(node_partial), batch_format="pyarrow",
                      zero_copy_batch=True),
        keys=["node"], aggs=[("c", "sum")], final="ray",
    ).materialize()
    n_nodes = deg.count()

    if n_nodes <= max_dense_nodes:
        # driver continuation: edges are ≤ n²/2 ≤ 8M rows, already
        # distinct — one dense A²∘A matmul replaces five exchanges
        et = pa.concat_tables(e.iter_batches(batch_size=None,
                                             batch_format="pyarrow"))
        lo = et["lo"].to_numpy(zero_copy_only=False)
        hi = et["hi"].to_numpy(zero_copy_only=False)
        nodes, codes = np.unique(np.concatenate([lo, hi]),
                                 return_inverse=True)
        i, j = codes[:len(lo)], codes[len(lo):]
        n = len(nodes)
        A = np.zeros((n, n), dtype=np.int32)
        A[i, j] = 1
        A[j, i] = 1
        tri = int((((A @ A) * A).sum()) // 6)
        return pa.table({"n_nodes": pa.array([n], pa.int64()),
                         "n_edges": pa.array([n_edges], pa.int64()),
                         "n_triangles": pa.array([tri], pa.int64())})

    def rn(old: str, new: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns([old, new])
        return fn

    j1 = bucketed_hash_join(
        e, deg.map_batches(rn("lo", "dlo"), batch_format="pyarrow",
                           zero_copy_batch=True),
        key="lo", n_buckets=n_buckets)
    j2 = bucketed_hash_join(
        j1, deg.map_batches(rn("hi", "dhi"), batch_format="pyarrow",
                            zero_copy_batch=True),
        key="hi", n_buckets=n_buckets)

    def orient(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        dlo = t["dlo"].to_numpy(zero_copy_only=False).astype(np.int64)
        dhi = t["dhi"].to_numpy(zero_copy_only=False).astype(np.int64)
        first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        return pa.table({
            "src": pa.array(np.where(first, lo, hi), pa.string()),
            "dst": pa.array(np.where(first, hi, lo), pa.string()),
            # dst's (deg, node) key orders the wedge pair emission
            "dd": pa.array(np.where(first, dhi, dlo)),
        })

    oriented = j2.map_batches(skip_empty(orient), batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def add_src_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket", pa.array(hash_bucket_array(t["src"], n_buckets)))

    wedge_schema = pa.schema([pa.field("src", pa.string()),
                              pa.field("dst", pa.string())])

    def wedges(g) -> "pd.DataFrame":
        import pandas as pd

        m = g[["src", "dst", "dd"]].merge(
            g[["src", "dst", "dd"]], on="src", suffixes=("_x", "_y"))
        keep = ((m["dd_x"] < m["dd_y"])
                | ((m["dd_x"] == m["dd_y"]) & (m["dst_x"] < m["dst_y"])))
        out = m.loc[keep, ["dst_x", "dst_y"]]
        return pd.DataFrame({"src": out["dst_x"].to_numpy(),
                             "dst": out["dst_y"].to_numpy()})

    cand = map_buckets(
        oriented.map_batches(skip_empty(add_src_bucket),
                             batch_format="pyarrow",
                             zero_copy_batch=True),
        wedges, wedge_schema)

    SEP = "\x1f"

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t["src"], t["dst"], SEP)
        return t.append_column(
            "_bucket", pa.array(hash_bucket_array(key, n_buckets)))

    count_schema = pa.schema([pa.field("n", pa.int64())])

    def close(g) -> pa.Table:
        cands = g[g["_side"] == 0]
        es = g[g["_side"] == 1]
        m = cands[["src", "dst"]].merge(es[["src", "dst"]],
                                        on=["src", "dst"])
        return pa.table({"n": pa.array([len(m)], pa.int64())})

    def mark(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.select(["src", "dst", "_bucket"]).append_column(
                "_side", pa.array(np.full(t.num_rows, side,
                                          dtype=np.int64)))
        return fn

    cb = cand.map_batches(skip_empty(add_pair_bucket),
                          batch_format="pyarrow", zero_copy_batch=True)\
        .map_batches(mark(0), batch_format="pyarrow",
                     zero_copy_batch=True)
    eb = oriented.map_batches(skip_empty(add_pair_bucket),
                              batch_format="pyarrow",
                              zero_copy_batch=True)\
        .map_batches(mark(1), batch_format="pyarrow",
                     zero_copy_batch=True)
    both = cb.union(eb)
    counts = map_buckets(both, close, count_schema,
                         batch_format="pandas")
    total = sum(r["n"] for r in
                counts.iter_rows())  # bounded: one row per bucket
    return pa.table({"n_nodes": pa.array([n_nodes], pa.int64()),
                     "n_edges": pa.array([n_edges], pa.int64()),
                     "n_triangles": pa.array([int(total)], pa.int64())})


def token_triangles_sql(table: str = "documents") -> str:
    """DuckDB mirror: canonical distinct adjacent-token edges, then
    the textbook 3-way self-join (a<b<c counts each triangle once)."""
    return f"""
WITH toks AS (
  SELECT row_number() OVER () AS did,
    list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM {table} WHERE text IS NOT NULL
), bi AS (
  SELECT t[gs] AS x, t[gs + 1] AS y
  FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(gs)
), e AS MATERIALIZED (
  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
  FROM bi WHERE x <> y
), nodes AS (SELECT a AS v FROM e UNION SELECT b FROM e)
SELECT
  (SELECT count(*) FROM nodes) AS n_nodes,
  (SELECT count(*) FROM e) AS n_edges,
  (SELECT count(*) FROM e e1
     JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
     JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles
""".strip()


def bfs_distances(edges, source: str, src: str = "src",
                  dst: str = "dst", max_depth: int = 6,
                  n_buckets: int = 32):
    """Unweighted single-source shortest paths (level-synchronous
    distributed BFS) over a directed edge Dataset, ``max_depth``
    rounds: per round the frontier joins the edge set (one bucketed
    hash join), newly-reached nodes anti-join the known set (one more
    bucketed exchange) and become the next frontier. Frontier and
    known sets live as Datasets — nothing node-scaled on the driver;
    rounds are data-independent integers, so the result strict-mirrors
    a depth-capped recursive CTE.

    Nodes unreached within ``max_depth`` are absent (the mirror's
    semantics). Returns a Dataset (node, dist) sorted by node."""
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.joins import bucketed_hash_join

    if isinstance(edges, pa.Table):
        edges = rd.from_arrow(edges)

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(t[src], pa.string()),
            "dst": pc.cast(t[dst], pa.string()),
        })

    e = edges.map_batches(skip_empty(edge_rows), batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    known = rd.from_arrow(pa.table({
        "node": pa.array([source], pa.string()),
        "dist": pa.array([0], pa.int64()),
    })).materialize()
    frontier = known

    for depth in range(1, max_depth + 1):
        def rn_frontier(t: pa.Table) -> pa.Table:
            return pa.table({"src": t["node"]})

        j = bucketed_hash_join(
            frontier.map_batches(rn_frontier, batch_format="pyarrow",
                                 zero_copy_batch=True),
            e, key="src", n_buckets=n_buckets)
        # distinct new candidates (a frontier node's fan-in collapses
        # per bucket before the anti-join)
        cand = grouped_agg(
            j.map_batches(
                skip_empty(lambda t: pa.table({"node": t["dst"]})
                           .group_by("node").aggregate([])),
                batch_format="pyarrow", zero_copy_batch=True),
            keys=["node"], aggs=[("node", "count")], final="ray",
        ).drop_columns(["node_count"]).materialize()
        if cand.count() == 0:  # frontier had no out-edges at all — an
            break              # empty derived side has no join schema

        # anti-join against known: LEFT join on node, keep fill-side
        # nulls (never reached before)
        def rn_known(t: pa.Table) -> pa.Table:
            return t.rename_columns(["node", "_kd"])

        nj = bucketed_hash_join(
            cand,
            known.map_batches(rn_known, batch_format="pyarrow",
                              zero_copy_batch=True),
            key="node", how="left", n_buckets=n_buckets)

        def fresh(t: pa.Table) -> pa.Table:
            m = pc.is_null(t["_kd"])
            kept = t.filter(m)
            return pa.table({
                "node": kept["node"],
                "dist": pa.array(
                    np.full(kept.num_rows, depth, dtype=np.int64)),
            })

        frontier = nj.map_batches(skip_empty(fresh),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
        if frontier.count() == 0:
            break
        known = known.union(frontier).materialize()

    return known.sort("node")


def bfs_distances_sql(edges_cte: str, source_expr: str,
                      max_depth: int = 6) -> str:
    """Depth-capped recursive-CTE mirror. ``edges_cte`` is a complete
    ``WITH`` chain whose LAST CTE is ``e`` with columns (src, dst);
    ``source_expr`` is a scalar SQL expression for the source node.
    UNION (not UNION ALL) dedups (node, d) pairs per round, so cycles
    terminate and the walk stays ≤ |V|·max_depth rows."""
    return f"""
WITH RECURSIVE {edges_cte.strip().removeprefix("WITH").strip()},
walk(node, d) AS (
  SELECT {source_expr}, 0
  UNION
  SELECT e.dst, w.d + 1
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.d < {max_depth}
)
SELECT node, CAST(min(d) AS BIGINT) AS dist
FROM walk GROUP BY node ORDER BY node
""".strip()


def kcore(edges, k: int, a: str = "lo", b: str = "hi",
          max_rounds: int = 64, n_buckets: int = 32,
          driver_max_edges: int = 1 << 20):
    """k-core decomposition membership for a FIXED ``k``: iteratively
    peel nodes of degree < k until the remainder is stable — the
    classic dense-subgraph / graph-hygiene primitive (Seidman 1983;
    Batagelj-Zaveršnik peeling). The k-core is a unique fixed point,
    so the result is order-independent: any peel schedule converges
    to the same node set, which is what lets a synchronous distributed
    peel strict-mirror an unrolled SQL round chain.

    Plan: canonical distinct undirected edges (combiner + distributed
    distinct), then synchronous rounds of [degree count -> survivor
    filter -> two-sided edge semi-join]. Size-adaptive DRIVER
    continuation (the triangle_count house pattern): when the distinct
    edge set fits ``driver_max_edges``, the peel runs as vectorized
    numpy bincount rounds on the driver — same round semantics, parity
    pinned in pytest; the distributed path remains for open-scale
    graphs. Raises if ``max_rounds`` synchronous rounds do not
    converge (the pair_components contract — never silently return a
    non-fixed-point).

    Returns (node, deg) for nodes in the k-core — ``deg`` is the
    degree WITHIN the core — sorted by node; a pa.Table from the
    driver path, a Dataset from the distributed path.
    """
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.joins import bucketed_hash_join

    if k < 1:
        raise ValueError("kcore: k must be >= 1 (isolated nodes never "
                         "appear in an edge list)")
    if isinstance(edges, pa.Table):
        edges = rd.from_arrow(edges)

    e = _distinct_canonical_edges(edges, a, b).materialize()

    empty = pa.table({"node": pa.array([], pa.string()),
                      "deg": pa.array([], pa.int64())})
    n_edges = e.count()
    if n_edges == 0:
        return empty

    if n_edges <= driver_max_edges:
        # driver peel: bounded by contract, vectorized bincount rounds
        df = e.to_pandas()
        codes, nodes = pd.factorize(
            pd.concat([df["lo"], df["hi"]], ignore_index=True),
            sort=True)
        n = len(nodes)
        lo = codes[:len(df)].astype(np.int64)
        hi = codes[len(df):].astype(np.int64)
        ek = np.ones(len(df), dtype=bool)
        for _ in range(max_rounds):
            deg = (np.bincount(lo[ek], minlength=n)
                   + np.bincount(hi[ek], minlength=n))
            alive = deg >= k
            nek = ek & alive[lo] & alive[hi]
            if nek.sum() == ek.sum():
                keep = np.flatnonzero(alive & (deg > 0))
                return pa.table({
                    "node": pa.array(np.asarray(nodes)[keep],
                                     pa.string()),
                    "deg": pa.array(deg[keep].astype(np.int64)),
                })
            ek = nek
        raise ValueError(f"kcore: no convergence in {max_rounds} rounds")

    def degrees(es):
        def node_partial(t: pa.Table) -> pa.Table:
            both = pa.concat_arrays([t["lo"].combine_chunks(),
                                     t["hi"].combine_chunks()])
            return (pa.table({"node": both}).group_by("node")
                    .aggregate([([], "count_all")])
                    .rename_columns(["node", "deg"]))

        return grouped_agg(
            es.map_batches(skip_empty(node_partial),
                           batch_format="pyarrow", zero_copy_batch=True),
            keys=["node"], aggs=[("deg", "sum")], final="ray",
        ).map_batches(
            lambda t: t.rename_columns(["node", "deg"]),
            batch_format="pyarrow", zero_copy_batch=True).materialize()

    prev_edges = n_edges
    for _ in range(max_rounds):
        deg = degrees(e)
        surv = deg.map_batches(
            skip_empty(lambda t: t.filter(pc.greater_equal(t["deg"], k))),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        # two-sided semi-join: keep edges with both endpoints alive
        def lo_key(t: pa.Table) -> pa.Table:
            return pa.table({"lo": t["node"]})

        def hi_key(t: pa.Table) -> pa.Table:
            return pa.table({"hi": t["node"]})

        e2 = bucketed_hash_join(
            e, surv.map_batches(lo_key, batch_format="pyarrow",
                                zero_copy_batch=True),
            key="lo", n_buckets=n_buckets)
        e2 = bucketed_hash_join(
            e2, surv.map_batches(hi_key, batch_format="pyarrow",
                                 zero_copy_batch=True),
            key="hi", n_buckets=n_buckets).materialize()
        n2 = e2.count()
        if n2 == prev_edges:
            return surv.sort("node")
        if n2 == 0:
            return empty
        e, prev_edges = e2, n2
    raise ValueError(f"kcore: no convergence in {max_rounds} rounds")


def token_kcore_sql(k: int, rounds: int = 12,
                    table: str = "documents") -> str:
    """Unrolled-rounds mirror over the word-adjacency graph (same
    edge CTE as :func:`token_triangles_sql`). ``rounds`` must be >=
    the peel's convergence round count for the corpus (the engine
    raises past ``max_rounds``; a too-small unroll here shows up as a
    driver mismatch, never a silent pass) — each round MATERIALIZED
    so DuckDB evaluates it once (the BPE-chain gotcha)."""
    parts = [f"""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM {table} WHERE text IS NOT NULL
), bi AS (
  SELECT t[gs] AS x, t[gs + 1] AS y
  FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(gs)
), s0 AS MATERIALIZED (
  SELECT DISTINCT least(x, y) AS lo, greatest(x, y) AS hi
  FROM bi WHERE x <> y
)""".strip()]
    for i in range(rounds):
        parts.append(f""", d{i} AS MATERIALIZED (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT lo AS node FROM s{i} UNION ALL SELECT hi FROM s{i})
  GROUP BY 1
), s{i + 1} AS MATERIALIZED (
  SELECT s.lo, s.hi FROM s{i} s
  JOIN d{i} da ON da.node = s.lo AND da.deg >= {k}
  JOIN d{i} db ON db.node = s.hi AND db.deg >= {k}
)""")
    parts.append(f"""
SELECT node, deg FROM (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT lo AS node FROM s{rounds} UNION ALL SELECT hi FROM s{rounds})
  GROUP BY 1
) WHERE deg >= {k} ORDER BY node""")
    return "".join(parts)


def clustering_coefficients(edges, a: str = "lo", b: str = "hi",
                            max_dense_nodes: int = 4096) -> pa.Table:
    """Local clustering coefficient per node — triangles through the
    node over its possible neighbor pairs, the per-node texture
    :func:`triangle_count` summarizes globally (how clique-like is
    each word's neighborhood).

    Exact-integer contract: tri(v) = diag(A³)/2 on the canonical
    distinct edge set; coefficient = ONE floor division to millionths
    of ``2·tri(v) · 1e6 // (d·(d−1))``; nodes with degree < 2 emit
    NULL (undefined, the mirror's NULLIF).

    Bounded-pool contract: the distinct NODE set must fit
    ``max_dense_nodes`` (vocabulary graphs are bounded by
    construction) — the distinct-edge combiner runs distributed, then
    one dense matmul on the driver; open-scale per-node triangle
    attribution would need the wedge-center-carrying exchange, and
    :func:`triangle_count` remains the open-scale global path. Output:
    (node, degree, n_triangles, clustering_millionths) sorted by node.
    """
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    if isinstance(edges, pa.Table):
        edges = rd.from_arrow(edges)

    e = _distinct_canonical_edges(edges, a, b)
    batches = list(e.iter_batches(batch_size=None,
                                  batch_format="pyarrow"))
    empty = pa.schema([("node", pa.string()), ("degree", pa.int64()),
                       ("n_triangles", pa.int64()),
                       ("clustering_millionths", pa.int64())])
    if not batches:  # concat_tables([]) raises before the row guard
        return empty.empty_table()
    et = pa.concat_tables(batches)
    if et.num_rows == 0:
        return empty.empty_table()
    lo = et["lo"].to_numpy(zero_copy_only=False)
    hi = et["hi"].to_numpy(zero_copy_only=False)
    nodes, codes = np.unique(np.concatenate([lo, hi]),
                             return_inverse=True)
    n = len(nodes)
    if n > max_dense_nodes:
        raise ValueError(
            "clustering_coefficients: node set exceeds max_dense_nodes "
            "(bounded-pool contract; triangle_count is the open-scale "
            "global path)")
    i, j = codes[:len(lo)], codes[len(lo):]
    A = np.zeros((n, n), dtype=np.int64)
    A[i, j] = 1
    A[j, i] = 1
    deg = A.sum(axis=1)
    tri2 = ((A @ A) * A).sum(axis=1)  # = 2 * triangles through node
    coef = [None if d < 2 else int(t) * 1_000_000 // (int(d) * (int(d) - 1))
            for d, t in zip(deg.tolist(), tri2.tolist())]
    return pa.table({
        "node": pa.array(nodes, pa.string()),
        "degree": pa.array(deg, pa.int64()),
        "n_triangles": pa.array(tri2 // 2, pa.int64()),
        "clustering_millionths": pa.array(coef, pa.int64()),
    })


def token_clustering_sql(table: str = "documents") -> str:
    """Mirror: distinct adjacent-token edges, per-node triangle count
    via the a<b<c three-way self-join credited to each corner."""
    return f"""
WITH toks AS (
  SELECT row_number() OVER () AS did,
    list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM {table} WHERE text IS NOT NULL
), bi AS (
  SELECT t[gs] AS x, t[gs + 1] AS y
  FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(gs)
), e AS MATERIALIZED (
  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
  FROM bi WHERE x <> y
), deg AS (
  SELECT v AS node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT a AS v FROM e UNION ALL SELECT b FROM e
  ) GROUP BY 1
), tri AS (
  SELECT corner AS node, CAST(count(*) AS BIGINT) AS n_tri
  FROM (
    SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3 FROM e e1
      JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
  ) t CROSS JOIN unnest([v1, v2, v3]) AS c(corner)
  GROUP BY 1
)
SELECT deg.node, deg.degree,
  COALESCE(tri.n_tri, 0) AS n_triangles,
  CAST(2 * COALESCE(tri.n_tri, 0) * 1000000
       // NULLIF(deg.degree * (deg.degree - 1), 0) AS BIGINT)
    AS clustering_millionths
FROM deg LEFT JOIN tri ON tri.node = deg.node
ORDER BY deg.node
""".strip()


def degree_assortativity(edges, a: str = "lo", b: str = "hi",
                         n_buckets: int = 64) -> pa.Table:
    """Degree assortativity of an undirected graph: the Pearson
    correlation of endpoint degrees over directed edge stubs (each
    undirected edge contributes both orientations — Newman 2002) —
    "do hubs link to hubs" as one number.

    Exactness: degrees are exact distributed counts; the correlation
    reuses :func:`features.pearson_corr`'s exact-integer-partials /
    one-float-tree contract, so the double is bit-mirrorable.

    Distributed shape: distinct-edge combiner, degree count
    (``final='ray'``), TWO bucketed hash joins decorate each stub
    with its endpoint degrees, then the one-pass moment combiner.
    Output: one row (n, corr) where n = 2·|E|.
    """
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.features import pearson_corr
    from fluent_server_ray.stages.joins import bucketed_hash_join

    if isinstance(edges, pa.Table):
        edges = rd.from_arrow(edges)

    e = _distinct_canonical_edges(edges, a, b).materialize()

    def stubs(t: pa.Table) -> pa.Table:
        u = pa.concat_arrays([t["lo"].combine_chunks(),
                              t["hi"].combine_chunks()])
        v = pa.concat_arrays([t["hi"].combine_chunks(),
                              t["lo"].combine_chunks()])
        return pa.table({"u": u, "v": v})

    und = e.map_batches(skip_empty(stubs), batch_format="pyarrow",
                        zero_copy_batch=True).materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        return (pa.table({"node": t["u"]}).group_by("node")
                .aggregate([([], "count_all")])
                .rename_columns(["node", "c"]))

    deg = grouped_agg(
        und.map_batches(skip_empty(node_partial), batch_format="pyarrow",
                        zero_copy_batch=True),
        keys=["node"], aggs=[("c", "sum")], final="ray").materialize()

    def rn(old: str, new: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns([old, new])
        return fn

    j1 = bucketed_hash_join(
        und, deg.map_batches(rn("u", "x"), batch_format="pyarrow",
                             zero_copy_batch=True),
        key="u", n_buckets=n_buckets)
    j2 = bucketed_hash_join(
        j1, deg.map_batches(rn("v", "y"), batch_format="pyarrow",
                            zero_copy_batch=True),
        key="v", n_buckets=n_buckets)

    def to_int(t: pa.Table) -> pa.Table:
        return pa.table({"x": pc.cast(t["x"], pa.int64()),
                         "y": pc.cast(t["y"], pa.int64())})

    return pearson_corr(
        j2.map_batches(skip_empty(to_int), batch_format="pyarrow",
                       zero_copy_batch=True), "x", "y")


def token_assortativity_sql(table: str = "documents") -> str:
    """Mirror: the adjacency-edge CTE inlined as a subquery under
    :func:`features.pearson_corr_sql`'s exact-HUGEINT formula."""
    from fluent_server_ray.stages.features import pearson_corr_sql

    sub = f"""(
WITH toks AS (
  SELECT row_number() OVER () AS did,
    list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM {table} WHERE text IS NOT NULL
), bi AS (
  SELECT t[gs] AS x, t[gs + 1] AS y
  FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(gs)
), e AS MATERIALIZED (
  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
  FROM bi WHERE x <> y
), und AS (
  SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
), deg AS (
  SELECT u, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u
)
SELECT da.d AS dx, db.d AS dy
FROM und JOIN deg da ON da.u = und.u JOIN deg db ON db.u = und.v
) AS stubs"""
    return pearson_corr_sql("dx", "dy", sub)


# ------------------------------------------ link prediction (RA)

def link_prediction_ra(edges, k: int = 50, a: str = "lo", b: str = "hi",
                       n_buckets: int = 64,
                       max_dense_nodes: int = 4096,
                       max_wedges: int = 200_000_000) -> pa.Table:
    """Link prediction over an undirected graph: top-``k`` NON-edges
    ranked by the Resource-Allocation index (Zhou, Lü & Zhang 2009)
    ``RA(u,v) = Σ_{c ∈ N(u)∩N(v)} 1/deg(c)`` — the exact-arithmetic
    member of the common-neighbor family (Adamic-Adar's ``1/ln deg``
    needs logs; RA keeps every term a floor division and usually
    ranks at least as well).

    Exact-integer contract: per-center weight is
    ``w_c = 1_000_000 // deg(c)`` (floored once per center, summed —
    both engines spell it identically); ``common`` is the plain
    common-neighbor count. Ranking: (ra_millionths desc, lo, hi asc),
    top ``k``.

    Distributed shape (the :func:`triangle_count` wedge plan, re-used
    for scoring): canonical distinct edges → adjacency rows keyed on
    the CENTER → one center-bucket exchange (each center's whole
    neighbor list co-locates, so deg falls out of the group — no deg
    join) → vectorized per-bucket pair self-merge emitting (u, v, w)
    wedge partials → distributed (u,v) merge → one pair-keyed
    cogrouped exchange REMOVES existing edges → per-bucket top-k,
    O(buckets·k) driver merge. Wedge volume Σ d(d-1)/2 is guarded by
    ``max_wedges`` (RA needs every wedge of a hub; cap or sample hubs
    upstream for open-scale graphs). Size-adaptive driver
    continuation: node sets ≤ ``max_dense_nodes`` run as one
    float64 BLAS matmul (entries ≤ n·10⁶ < 2⁵³ — exact), parity-
    pinned against the distributed path.

    Returns a pyarrow Table (lo, hi, common, ra_millionths).
    """
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import (grouped_agg,
                                                    hash_bucket_array,
                                                    skip_empty)
    from fluent_server_ray.stages.groups import map_buckets

    if isinstance(edges, pa.Table):
        edges = rd.from_arrow(edges)

    out_fields = [("lo", pa.string()), ("hi", pa.string()),
                  ("common", pa.int64()), ("ra_millionths", pa.int64())]

    e = _distinct_canonical_edges(edges, a, b).materialize()
    if e.count() == 0:
        return pa.schema(out_fields).empty_table()

    def node_partial(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([t["lo"].combine_chunks(),
                                 t["hi"].combine_chunks()])
        return (pa.table({"node": both}).group_by("node")
                .aggregate([([], "count_all")])
                .rename_columns(["node", "c"]))

    deg = grouped_agg(
        e.map_batches(skip_empty(node_partial), batch_format="pyarrow",
                      zero_copy_batch=True),
        keys=["node"], aggs=[("c", "sum")], final="ray").materialize()
    n_nodes = deg.count()

    if n_nodes <= max_dense_nodes:
        # driver continuation: (A·w) @ A in float64 BLAS — entries are
        # integer-valued ≤ n·1e6 < 2^53, so the matmul is EXACT
        et = pa.concat_tables(e.iter_batches(batch_size=None,
                                             batch_format="pyarrow"))
        lo = et["lo"].to_numpy(zero_copy_only=False)
        hi = et["hi"].to_numpy(zero_copy_only=False)
        nodes, codes = np.unique(np.concatenate([lo, hi]),
                                 return_inverse=True)
        i, j = codes[:len(lo)], codes[len(lo):]
        n = len(nodes)
        A = np.zeros((n, n), dtype=np.float64)
        A[i, j] = 1.0
        A[j, i] = 1.0
        w = (1_000_000 // A.sum(axis=0).astype(np.int64)).astype(
            np.float64)
        S = (A * w) @ A
        C = A @ A
        iu, ju = np.triu_indices(n, 1)
        keep = (S[iu, ju] > 0) & (A[iu, ju] == 0)
        iu, ju = iu[keep], ju[keep]
        ra = S[iu, ju].astype(np.int64)
        cm = C[iu, ju].astype(np.int64)
        order = np.lexsort((nodes[ju], nodes[iu], -ra))[:k]
        return pa.table({
            "lo": pa.array(nodes[iu][order], pa.string()),
            "hi": pa.array(nodes[ju][order], pa.string()),
            "common": pa.array(cm[order], pa.int64()),
            "ra_millionths": pa.array(ra[order], pa.int64())})

    # wedge-volume guard from the degree table (bounded partials)
    def wedge_partial(t: pa.Table) -> pa.Table:
        d = t["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())],
                                       pa.int64())})

    wtot = sum(r["w"] for r in deg.map_batches(
        wedge_partial, batch_format="pyarrow",
        zero_copy_batch=True).iter_rows())
    if wtot > max_wedges:
        raise ValueError(
            f"link_prediction_ra: {wtot} wedges exceed max_wedges — "
            "cap hub degrees or sample upstream")

    def adj_rows(t: pa.Table) -> pa.Table:
        c = pa.concat_arrays([t["lo"].combine_chunks(),
                              t["hi"].combine_chunks()])
        u = pa.concat_arrays([t["hi"].combine_chunks(),
                              t["lo"].combine_chunks()])
        out = pa.table({"c": c, "u": u})
        return out.append_column(
            "_bucket", pa.array(hash_bucket_array(out["c"], n_buckets)))

    adj = e.map_batches(skip_empty(adj_rows), batch_format="pyarrow",
                        zero_copy_batch=True)

    wedge_schema = pa.schema([pa.field("lo", pa.string()),
                              pa.field("hi", pa.string()),
                              pa.field("w", pa.int64())])

    def wedge_pairs(g) -> "pd.DataFrame":
        import pandas as pd

        # whole neighbor list of each center is in this bucket, so
        # deg(c) = group size and w_c floors HERE, once per center
        g = g[["c", "u"]].copy()
        g["w"] = 1_000_000 // g.groupby("c")["u"].transform("size")
        m = g.merge(g[["c", "u"]], on="c", suffixes=("", "_y"))
        m = m[m["u"] < m["u_y"]]
        return pd.DataFrame({"lo": m["u"].to_numpy(),
                             "hi": m["u_y"].to_numpy(),
                             "w": m["w"].to_numpy()})

    wedges = map_buckets(adj, wedge_pairs, wedge_schema)

    def wedge_local(t: pa.Table) -> pa.Table:
        return (t.group_by(["lo", "hi"])
                .aggregate([("w", "sum"), ([], "count_all")])
                .rename_columns(["lo", "hi", "w", "n"]))

    pairs = grouped_agg(
        wedges.map_batches(skip_empty(wedge_local),
                           batch_format="pyarrow",
                           zero_copy_batch=True),
        keys=["lo", "hi"], aggs=[("w", "sum"), ("n", "sum")],
        final="ray")

    SEP = "\x1f"

    def mark(side: int, cols: dict):
        def fn(t: pa.Table) -> pa.Table:
            out = pa.table({new: t[old] for new, old in cols.items()})
            key = pc.binary_join_element_wise(out["lo"], out["hi"], SEP)
            out = out.append_column(
                "_bucket", pa.array(hash_bucket_array(key, n_buckets)))
            return out.append_column(
                "_side", pa.array(np.full(out.num_rows, side,
                                          dtype=np.int64)))
        return fn

    cand = pairs.map_batches(
        skip_empty(mark(0, {"lo": "lo", "hi": "hi", "w": "w_sum",
                            "n": "n_sum"})),
        batch_format="pyarrow", zero_copy_batch=True)

    def edge_mark(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t["lo"], t["hi"], SEP)
        z = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        out = pa.table({"lo": t["lo"], "hi": t["hi"], "w": z, "n": z})
        out = out.append_column(
            "_bucket", pa.array(hash_bucket_array(key, n_buckets)))
        return out.append_column(
            "_side", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    eb = e.map_batches(skip_empty(edge_mark), batch_format="pyarrow",
                       zero_copy_batch=True)

    topk_schema = pa.schema(
        [pa.field(n, t) for n, t in out_fields])

    def drop_edges_topk(g) -> "pd.DataFrame":
        import pandas as pd

        cs = g[g["_side"] == 0]
        es = g[g["_side"] == 1][["lo", "hi"]]
        m = cs.merge(es, on=["lo", "hi"], how="left", indicator=True)
        m = m[m["_merge"] == "left_only"]
        m = m.sort_values(["w", "lo", "hi"],
                          ascending=[False, True, True]).head(k)
        return pd.DataFrame({"lo": m["lo"].to_numpy(),
                             "hi": m["hi"].to_numpy(),
                             "common": m["n"].to_numpy(),
                             "ra_millionths": m["w"].to_numpy()})

    tops = map_buckets(cand.union(eb), drop_edges_topk, topk_schema)
    merged = pa.concat_tables(tops.iter_batches(
        batch_size=None, batch_format="pyarrow"))  # ≤ buckets × k rows
    if merged.num_rows == 0:
        return pa.schema(out_fields).empty_table()
    idx = pc.sort_indices(merged, sort_keys=[
        ("ra_millionths", "descending"), ("lo", "ascending"),
        ("hi", "ascending")])
    return merged.take(idx[:k])


def token_link_prediction_sql(k: int = 50,
                              table: str = "documents") -> str:
    """DuckDB mirror over the adjacent-token graph: adjacency both
    directions, per-center floored weight, pair self-join, edge
    anti-join, deterministic (score desc, lo, hi) top-k."""
    return f"""
WITH toks AS (
  SELECT row_number() OVER () AS did,
    list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM {table} WHERE text IS NOT NULL
), bi AS (
  SELECT t[gs] AS x, t[gs + 1] AS y
  FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(gs)
), e AS MATERIALIZED (
  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
  FROM bi WHERE x <> y
), adj AS MATERIALIZED (
  SELECT a AS c, b AS u FROM e UNION ALL SELECT b, a FROM e
), wdeg AS MATERIALIZED (
  SELECT c, u, 1000000 // count(*) OVER (PARTITION BY c) AS w
  FROM adj
), pairs AS (
  SELECT j1.u AS lo, j2.u AS hi,
    CAST(count(*) AS BIGINT) AS common,
    CAST(sum(j1.w) AS BIGINT) AS ra
  FROM wdeg j1 JOIN wdeg j2 ON j1.c = j2.c AND j1.u < j2.u
  GROUP BY j1.u, j2.u
)
SELECT lo, hi, common, ra AS ra_millionths
FROM pairs p
WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = p.lo AND e.b = p.hi)
ORDER BY ra DESC, lo, hi
LIMIT {k}
""".strip()


# --------------------------------------------- HITS hubs/authorities

def hits(edges: pa.Table, src: str = "src", dst: str = "dst",
         w: str = "w", n_iters: int = 4) -> pa.Table:
    """HITS hubs & authorities (Kleinberg 1999) over a BOUNDED directed
    weighted edge table — the tool-flow sibling of :func:`pagerank`:
    a good HUB calls many good authorities, a good AUTHORITY is called
    by many good hubs (PageRank's single score can't separate the
    dispatcher tools from the destination tools).

    Exact-integer recurrence (both engines spell it identically)::

        h_0 = SCALE (= 1e6) for every node
        a_j = (SCALE · Σ_{i→j} w_ij·h_i) // max_j'(Σ w·h)   per round
        h_i = (SCALE · Σ_{i→j} w_ij·a_j) // max_i'(Σ w·a)

    (max-normalization — the classic L2 norm has no integer form; the
    max-normalized fixpoint has the same ranking). All arithmetic is
    unbounded python ints (HUGEINT in the mirror), so no scale wraps.

    Scale contract: the EDGE TABLE must be bounded (tool graphs:
    ≤ |tools|² rows — it arrives from a distributed combiner); the
    iteration itself is driver-side over that table. For unbounded
    node spaces use :func:`pagerank`'s distributed round shape.
    Returns (node, hub_millionths, auth_millionths) sorted by node.
    """
    SCALE = 1_000_000
    srcs = [s for s in edges[src].to_pylist()]
    dsts = [d for d in edges[dst].to_pylist()]
    ws = [int(x) for x in edges[w].to_pylist()]
    out_schema = pa.schema([
        pa.field("node", pa.string()),
        pa.field("hub_millionths", pa.int64()),
        pa.field("auth_millionths", pa.int64()),
    ])
    nodes = sorted(set(srcs) | set(dsts))
    if not nodes:
        return out_schema.empty_table()

    h = {n: SCALE for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(n_iters):
        a_raw = {n: 0 for n in nodes}
        for s, d, wt in zip(srcs, dsts, ws):
            a_raw[d] += wt * h[s]
        mxa = max(a_raw.values())
        a = {n: (SCALE * v) // mxa if mxa else 0
             for n, v in a_raw.items()}
        h_raw = {n: 0 for n in nodes}
        for s, d, wt in zip(srcs, dsts, ws):
            h_raw[s] += wt * a[d]
        mxh = max(h_raw.values())
        h = {n: (SCALE * v) // mxh if mxh else 0
             for n, v in h_raw.items()}
    return pa.table({
        "node": pa.array(nodes, pa.string()),
        "hub_millionths": pa.array([h[n] for n in nodes], pa.int64()),
        "auth_millionths": pa.array([a[n] for n in nodes], pa.int64()),
    })


def hits_sql_rounds(with_trans_chain: str, n_iters: int = 4) -> str:
    """Unrolled-round DuckDB mirror of :func:`hits`. Same contract as
    :func:`pagerank_sql_rounds`: ``with_trans_chain`` is a complete
    ``WITH ...`` chain whose LAST CTE is ``trans`` (src, dst, w); every
    round CTE is ``AS MATERIALIZED`` (DuckDB inlines twice-referenced
    CTEs — the NOTES r4 gotcha). All sums/products in HUGEINT."""
    parts = [with_trans_chain.rstrip().rstrip(",")]
    parts.append("""
nodes AS MATERIALIZED (
  SELECT src AS node FROM trans UNION SELECT dst FROM trans
), h0 AS MATERIALIZED (
  SELECT node, CAST(1000000 AS HUGEINT) AS h FROM nodes
)""".strip())
    for i in range(1, n_iters + 1):
        parts.append(f"""
a{i}r AS MATERIALIZED (
  SELECT nd.node, COALESCE(sum(CAST(t.w AS HUGEINT) * h.h),
                           CAST(0 AS HUGEINT)) AS raw
  FROM nodes nd
  LEFT JOIN trans t ON t.dst = nd.node
  LEFT JOIN h{i - 1} h ON h.node = t.src
  GROUP BY nd.node
), a{i} AS MATERIALIZED (
  SELECT node,
    COALESCE((CAST(1000000 AS HUGEINT) * raw)
             // NULLIF((SELECT max(raw) FROM a{i}r), 0),
             CAST(0 AS HUGEINT)) AS a
  FROM a{i}r
), h{i}r AS MATERIALIZED (
  SELECT nd.node, COALESCE(sum(CAST(t.w AS HUGEINT) * a.a),
                           CAST(0 AS HUGEINT)) AS raw
  FROM nodes nd
  LEFT JOIN trans t ON t.src = nd.node
  LEFT JOIN a{i} a ON a.node = t.dst
  GROUP BY nd.node
), h{i} AS MATERIALIZED (
  SELECT node,
    COALESCE((CAST(1000000 AS HUGEINT) * raw)
             // NULLIF((SELECT max(raw) FROM h{i}r), 0),
             CAST(0 AS HUGEINT)) AS h
  FROM h{i}r
)""".strip())
    body = ",\n".join(parts)
    return (body + f"""
SELECT h.node, CAST(h.h AS BIGINT) AS hub_millionths,
  CAST(a.a AS BIGINT) AS auth_millionths
FROM h{n_iters} h JOIN a{n_iters} a ON h.node = a.node
ORDER BY h.node""")


# --------------------------------------------- weighted shortest paths

def weighted_sssp(edges, source: str, a: str = "lo", b: str = "hi",
                  cost_cap: int = 40, max_rounds: int = 64,
                  n_buckets: int = 32, max_dense_edges: int = 2_000_000):
    """Weighted single-source shortest paths (synchronous distributed
    Bellman-Ford) over an undirected edge Dataset — the weighted
    sibling of :func:`bfs_distances` (BFS counts hops; this minimizes
    a path COST, the routing/closeness primitive hop counts can't
    express).

    Determinism contract: the edge weight is derived from the
    canonical pair itself — ``w = 1 + md5_u64(lo ∥ U+001F ∥ hi) % 9``
    (≡ DuckDB ``md5_number_upper``), so both engines price every edge
    identically with no weight column to ship. Distances are exact
    int64 cost sums. The mirror is a cost-capped recursive CTE: the
    ``cost_cap`` prunes the SQL walk, so the OPERATOR's contract is
    "nodes within ``cost_cap``" — a shortest path's prefix costs never
    exceed its total, so every node with dist ≤ cap survives pruning
    with its exact distance on both engines.

    Shape: per round, ONE bucketed hash join (edges ⋈ current
    distances on src) + a distributed grouped-min merge of the
    relaxed candidates with the standing distances — nothing
    node-scaled on the driver; convergence is detected from the
    bounded (count, sum) signature of the monotone-decreasing
    distance table and the loop raises past ``max_rounds``.
    Size-adaptive driver continuation (the :func:`link_prediction_ra`
    precedent): a distinct-edge set ≤ ``max_dense_edges`` relaxes as
    one vectorized ``np.minimum.at`` Bellman-Ford on the driver —
    byte-identical results (parity-pinned in tests); each distributed
    round costs a fixed executor exchange, which dominates at bounded
    vocab scale. Returns a pyarrow Table (node, dist ≤ cost_cap)
    sorted by node.
    """
    import ray.data as rd

    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.joins import bucketed_hash_join

    out_schema = pa.schema([pa.field("node", pa.string()),
                            pa.field("dist", pa.int64())])

    e0 = _distinct_canonical_edges(edges, a, b).materialize()

    if e0.count() <= max_dense_edges:
        parts = [t for t in e0.iter_batches(batch_size=None,
                                            batch_format="pyarrow")]
        if not parts:
            return out_schema.empty_table()
        et = pa.concat_tables(parts)
        lo = np.asarray(et["lo"].to_pylist(), dtype=object)
        hi = np.asarray(et["hi"].to_pylist(), dtype=object)
        w = np.array([1 + md5_u64(f"{x}\x1f{y}") % 9
                      for x, y in zip(lo, hi)], dtype=np.int64)
        nodes, codes = np.unique(np.concatenate([lo, hi]),
                                 return_inverse=True)
        i, j = codes[:len(lo)], codes[len(lo):]
        src_idx = np.concatenate([i, j])
        dst_idx = np.concatenate([j, i])
        ww = np.concatenate([w, w])
        INF = np.int64(2 ** 62)
        dist = np.full(len(nodes), INF, dtype=np.int64)
        s_pos = np.searchsorted(nodes, source)
        if s_pos >= len(nodes) or nodes[s_pos] != source:
            return out_schema.empty_table()
        dist[s_pos] = 0
        for _ in range(max_rounds):
            cand = dist[src_idx] + ww  # INF + w stays < 2^63
            new = dist.copy()
            np.minimum.at(new, dst_idx, cand)
            if np.array_equal(new, dist):
                break
            dist = new
        else:
            raise ValueError(
                f"weighted_sssp: no convergence in {max_rounds} rounds")
        keep = dist <= cost_cap
        order = np.argsort(nodes[keep])
        return pa.table({
            "node": pa.array(nodes[keep][order], pa.string()),
            "dist": pa.array(dist[keep][order]),
        })

    def weighted_both(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_pylist()
        hi = t["hi"].to_pylist()
        w = np.array([1 + md5_u64(f"{x}\x1f{y}") % 9
                      for x, y in zip(lo, hi)], dtype=np.int64)
        return pa.table({
            "src": pa.concat_arrays([t["lo"].combine_chunks(),
                                     t["hi"].combine_chunks()]),
            "dst": pa.concat_arrays([t["hi"].combine_chunks(),
                                     t["lo"].combine_chunks()]),
            "w": pa.array(np.concatenate([w, w])),
        })

    e = e0.map_batches(skip_empty(weighted_both), batch_format="pyarrow",
                       zero_copy_batch=True).materialize()

    dist = rd.from_arrow(pa.table({
        "node": pa.array([source], pa.string()),
        "dist": pa.array([0], pa.int64()),
    })).materialize()

    def signature(ds_) -> tuple:
        n = s = 0
        for t in ds_.map_batches(
                skip_empty(lambda t: pa.table({
                    "n": pa.array([len(t)], pa.int64()),
                    "s": pa.array([int(pc.sum(t["dist"]).as_py() or 0)],
                                  pa.int64())})),
                batch_format="pyarrow",
                zero_copy_batch=True).iter_rows():
            n += t["n"]
            s += t["s"]
        return n, s

    sig = signature(dist)
    for _ in range(max_rounds):
        def rn_dist(t: pa.Table) -> pa.Table:
            return t.rename_columns(["src", "d"])

        j = bucketed_hash_join(
            e,
            dist.map_batches(rn_dist, batch_format="pyarrow",
                             zero_copy_batch=True),
            key="src", n_buckets=n_buckets)

        def relax(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t["dst"],
                "dist": pc.add(pc.cast(t["d"], pa.int64()),
                               pc.cast(t["w"], pa.int64())),
            })

        cand = j.map_batches(skip_empty(relax), batch_format="pyarrow",
                             zero_copy_batch=True)
        merged = grouped_agg(dist.union(cand), keys=["node"],
                             aggs=[("dist", "min")], final="ray")
        dist = merged.map_batches(
            lambda t: t.rename_columns(["node", "dist"]),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        new_sig = signature(dist)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise ValueError(
            f"weighted_sssp: no convergence in {max_rounds} rounds")

    parts = [t for t in dist.iter_batches(batch_size=None,
                                          batch_format="pyarrow")]
    out_schema = pa.schema([pa.field("node", pa.string()),
                            pa.field("dist", pa.int64())])
    if not parts:
        return out_schema.empty_table()
    t = pa.concat_tables([p.cast(out_schema) for p in parts])
    t = t.filter(pc.less_equal(t["dist"], cost_cap))
    return t.sort_by([("node", "ascending")])


def weighted_sssp_sql(edges_cte: str, source_expr: str,
                      cost_cap: int = 40) -> str:
    """Cost-capped recursive-CTE mirror. ``edges_cte`` is a complete
    ``WITH`` chain whose LAST CTE is ``e0`` with CANONICAL distinct
    columns (a, b); the weighted symmetric edge set and the walk
    append to it. UNION dedups (node, d) pairs per round; the cost cap
    bounds the walk at |V|·cap rows."""
    return f"""
WITH RECURSIVE {edges_cte.strip().removeprefix("WITH").strip()},
ew AS MATERIALIZED (
  SELECT a, b,
    1 + CAST(md5_number_upper(a || chr(31) || b) % 9 AS BIGINT) AS w
  FROM e0
), e AS MATERIALIZED (
  SELECT a AS src, b AS dst, w FROM ew
  UNION ALL SELECT b, a, w FROM ew
),
walk(node, d) AS (
  SELECT {source_expr}, CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, w.d + e.w
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.d + e.w <= {cost_cap}
)
SELECT node, CAST(min(d) AS BIGINT) AS dist
FROM walk GROUP BY node ORDER BY node
""".strip()
