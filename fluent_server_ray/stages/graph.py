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
