"""End-to-end pipeline over fluentd Forward wire data.

The closest analogue to running the reference server itself: input is
files of msgpack forward frames (≙ the byte streams connections would
deliver, reference ``server/server.go:97-115``), output is per-sink
Parquet plus grouped counts, with chunk-level ack bookkeeping:

decode (``sources/fluentfmt``) → at-least-once chunk dedup → tag-match
route (``stages/route``, the wire tag routes directly — no parsing
needed) → per-sink write + lineage manifest that records the **acked
chunk ids** (≙ the server's ``{"ack": <chunk>}`` replies, reference
``message/ack.go:5-20``; a replayed chunk in a later shard is dropped
because its id is already acked).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from fluent_server_ray.sources.fluentfmt import read_forward_frames
from fluent_server_ray.stages.aggregate import grouped_counts
from fluent_server_ray.stages.route import RouteStage
from fluent_server_ray.pipelines.flagship import _write_sinks


def dedup_chunks(ds, acked: set[str], n_buckets: int = 256):
    """At-least-once input dedup, two levels:

    1. drop rows whose chunk id is already acked (manifest-level skip,
       vectorized ``is_in`` against the broadcast acked set);
    2. within this run, keep one copy of each (chunk, entry_idx) — a
       client may have re-sent a chunk inside the same stream before
       seeing the ack (re-sent entries are byte-identical by the
       protocol's chunk-id contract).

    Combiner-first, one pass, one shuffle: each block drops acked rows,
    locally dedups its chunked rows, and buckets by
    ``siphash(chunk) % n_buckets`` (unchunked rows scatter by position —
    they are never deduped, only carried); each bucket then dedups with
    one vectorized ``drop_duplicates``. Never one pandas group per
    entry, and the decode stage executes exactly once (the old
    split-into-two-filters shape re-ran it per branch).
    """
    import numpy as np
    import ray

    from fluent_server_ray.stages.aggregate import hash_bucket_array

    acked_ref = ray.put(pa.array(sorted(acked), type=pa.string()))

    def local(t: pa.Table) -> pa.Table:
        acked_arr = ray.get(acked_ref)
        has_chunk = pc.not_equal(t["chunk"], "")
        replay = pc.and_(has_chunk, pc.is_in(t["chunk"], value_set=acked_arr))
        t = t.filter(pc.invert(replay))
        has_chunk = pc.not_equal(t["chunk"], "")
        ch = t.filter(has_chunk)
        un = t.filter(pc.invert(has_chunk))
        if ch.num_rows:
            # Arrow-native drop_duplicates: min row index per
            # (chunk, entry_idx), then take — duplicates are
            # byte-identical by the chunk-id contract, so which copy
            # survives is immaterial (min is just deterministic)
            idx = pa.array(np.arange(ch.num_rows, dtype=np.int64))
            keep = (
                ch.append_column("_idx", idx)
                .group_by(["chunk", "entry_idx"])
                .aggregate([("_idx", "min")])["_idx_min"]
            )
            ch = ch.take(keep)
        ch = ch.append_column(
            "_bucket", pa.array(hash_bucket_array(ch["chunk"], n_buckets))
        )
        un = un.append_column(
            "_bucket",
            pa.array(np.arange(un.num_rows, dtype=np.int64) % n_buckets),
        )
        return pa.concat_tables([ch, un])

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        ch = g[g["chunk"] != ""].drop_duplicates(["chunk", "entry_idx"])
        out = pd.concat([ch, g[g["chunk"] == ""]], ignore_index=True)
        return out.drop(columns=["_bucket"])

    return (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(bucket_distinct, batch_format="pandas")
    )


def run_forward_pipeline(
    frame_files: list[str],
    out_dir: str,
    routes: list[tuple[str, str]] | None = None,
    dedup: bool = True,
) -> dict:
    """Process forward-frame shards into routed sinks with ack lineage."""
    from fluent_server_ray.state.lineage import (
        commit_shard,
        committed_shards,
        load_manifests,
    )

    os.makedirs(out_dir, exist_ok=True)
    done = committed_shards(out_dir)
    acked: set[str] = set()
    for m in load_manifests(out_dir):
        acked.update(m.get("acked_chunks", []))

    from fluent_server_ray.pipelines.flagship import (
        _check_stale_lineage,
        _shard_id,
    )

    files_sorted = sorted(os.path.abspath(p) for p in frame_files)
    _check_stale_lineage(
        out_dir, {_shard_id(p, 1) for p in files_sorted}, files_sorted
    )
    for path in files_sorted:
        shard_id = _shard_id(path, 1)  # path-hashed: equal basenames in
        if shard_id in done:           # different dirs can't collide
            continue
        ds = read_forward_frames([path])
        if dedup:
            ds = dedup_chunks(ds, acked)
        from fluent_server_ray.stages.enrich import pool_limits

        routed = ds.map_batches(
            RouteStage,
            fn_constructor_kwargs={"routes": routes},
            batch_format="pyarrow",
            concurrency=pool_limits(),
        )
        routed_m = routed.materialize()
        sink_dir = os.path.join(out_dir, "sinks", f"shard={shard_id}")
        _write_sinks(routed_m, sink_dir)
        counts = grouped_counts(routed_m, ["sink", "tag"]).to_pandas()
        chunk_batches = list(
            routed_m.select_columns(["chunk"]).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        )
        if chunk_batches:
            uniq = pc.unique(
                pa.concat_tables(chunk_batches)["chunk"].combine_chunks()
            )
            new_acks = sorted(c for c in uniq.to_pylist() if c)
        else:  # fully-deduped / heartbeat-only shard: still commits
            new_acks = []
        acked.update(new_acks)
        commit_shard(
            out_dir,
            shard_id,
            {
                "input_file": path,
                "row_count": int(counts["n"].sum()),
                "per_sink_counts": {
                    s: int(g["n"].sum()) for s, g in counts.groupby("sink")
                },
                "acked_chunks": new_acks,  # ≙ the ack replies
            },
        )

    from fluent_server_ray.state.lineage import summarize_manifests

    summary = {**summarize_manifests(out_dir), "acked_chunks": sorted(acked)}
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, sort_keys=True, indent=1)
    return summary
