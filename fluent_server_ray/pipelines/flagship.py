"""Flagship pipeline: parse → enrich → route → aggregate → sinks.

The Ray-native restatement of the reference's full event lifecycle
(reference ``main.go:15-60`` wiring → accept loop
``server/server.go:97-115`` → session parse ``message/session.go:79-122``
→ mode readers ``defaultreader/reader.go:38-115`` → mirror sink
``mirror/mirror.go:26-47``):

- sockets → Parquet shards (files),
- per-session goroutines → streaming-executor blocks,
- the per-event handler chain → three vectorized ``map_batches`` stages
  (parse / enrich-actor-pool / route-actor-pool),
- the mutexed ``map[tag][]Event`` mirror → per-sink partitioned Parquet
  plus a shuffle-free partial+final grouped count,
- chunk acks → per-shard lineage commits (see
  :mod:`fluent_server_ray.state.lineage`).

Two execution modes:

- ``run_pipeline(..., shards=files)`` — resumable: each input shard is
  an independent sub-pipeline; output dirs are shard-addressed and
  committed atomically; a rerun skips committed shards. This is the
  100 TB layout (resume granularity = input file group).
- ``run_pipeline(..., shards=None)`` — single-pass streaming over the
  whole input (fastest path; used by bench).
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.compute as pc

from fluent_server_ray.sources.pq import read_parquet_clean as _rpq
from fluent_server_ray.sources.transcripts import read_transcripts
from fluent_server_ray.stages.parse import apply_parse
from fluent_server_ray.stages.enrich import apply_enrich, build_tenant_map
from fluent_server_ray.stages.route import apply_route
from fluent_server_ray.stages.aggregate import grouped_counts

COUNT_KEYS = ["sink", "role", "tool", "tag"]


def build_routed(
    source,
    tenant_lookup=None,
    routes=None,
    batch_size: int | None = None,
    fused: bool = True,
    columns: list[str] | None = None,
):
    """source (path or Dataset) → routed Dataset (lazy).

    Columns out: transcript cols + parsed struct cols + tenant + sink —
    or exactly ``columns`` when given (the projected fast path: only
    the parse kernels feeding the requested columns run, and the
    heartbeat-filter copy touches only those columns — the bytes/row
    knob for aggregate-only consumers like the grouped counts).
    Heartbeat rows are consumed (dropped) before routing, mirroring the
    reference heartbeat path (``message/session.go:124-137``).

    ``fused=True`` (default): parse + enrich + route run as ONE
    ``map_batches`` stage — one pass over each Arrow block, no
    inter-stage object-store hops; the enrichment table travels as a
    broadcast ObjectRef (zero-copy per worker), never inside the task
    closure. This is the narrow-path layout for 100 TB: the only wide
    operations downstream are the grouped counts and the optional
    output sort.

    ``fused=False``: the three stages run as separate operators (the
    enrich stage as a real actor pool) — the layout to use when the
    enrichment state is heavy (models) and deserves its own resources.
    """
    import ray

    ds = read_transcripts(source) if isinstance(source, str) else source
    if tenant_lookup is None:
        tenant_lookup = build_tenant_map()

    if not fused:
        bs = batch_size or 32768
        ds = apply_parse(ds, batch_size=bs)
        ds = apply_enrich(ds, tenant_lookup, batch_size=bs)
        ds = apply_route(ds, routes=routes, batch_size=bs)
        if columns is not None:
            ds = ds.select_columns(columns)
        return ds

    from fluent_server_ray.stages.enrich import lookup_column, put_lookup
    from fluent_server_ray.stages.parse import parse_batch
    from fluent_server_ray.stages.route import RouteStage

    tenant_ref = (
        put_lookup(tenant_lookup)
        if isinstance(tenant_lookup, dict)
        else tenant_lookup
    )
    route_stage = RouteStage(routes)  # tiny: ships in the closure

    if columns is None:
        parse_cols = None
        need_tenant = need_route = True
    else:
        # helpers the pipeline itself consumes: the heartbeat filter,
        # the router (tag + validity — only when a sink is requested),
        # the tenant lookup key
        need_tenant = "tenant" in columns
        need_route = "sink" in columns
        helpers = {"is_heartbeat"}
        if need_route:
            helpers |= {"tag", "is_valid"}
        if need_tenant:
            helpers.add("conv_id")
        parse_cols = sorted(set(columns) - {"tenant", "sink"} | helpers)

    def process(batch):
        import pyarrow.compute as pc2

        batch = parse_batch(batch, columns=parse_cols)
        if need_tenant:
            batch = batch.append_column(
                "tenant", lookup_column(batch["conv_id"], tenant_ref)
            )
        batch = batch.filter(pc2.invert(batch["is_heartbeat"]))
        if need_route:
            batch = route_stage(batch)
        if columns is not None:
            batch = batch.select(columns)
        return batch

    kwargs = {}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    return ds.map_batches(
        process, batch_format="pyarrow", zero_copy_batch=True, **kwargs
    )


def _shard_id(shard_path, group_size: int) -> str:
    """Deterministic, collision-free commit-unit id: human-readable
    basename(s) + 8 hex chars of sha1 over the FULL path list and the
    grouping knob (two equal basenames in different dirs, or a resume
    with a different ``shard_group_size``, must not share an id)."""
    import hashlib

    group = shard_path if isinstance(shard_path, list) else [shard_path]
    first = os.path.splitext(os.path.basename(group[0].rstrip("/")))[0]
    base = (
        first if len(group) == 1
        else f"{first}--{os.path.splitext(os.path.basename(group[-1]))[0]}"
    )
    # hash the ABSOLUTE paths: the id must be spelling-stable (relative
    # vs absolute, cwd changes) or a resume under a different spelling
    # would silently reprocess and double-count
    h = hashlib.sha1(
        ("\x00".join(os.path.abspath(p) for p in group)
         + f"\x00gs={group_size}").encode()
    ).hexdigest()[:8]
    return f"{base}-{h}"


def _check_stale_lineage(out_dir: str, current_ids: set, inputs) -> None:
    """Refuse to resume over lineage written under a DIFFERENT shard-id
    scheme for the SAME inputs: the old commits would not match, every
    shard would re-run into new sink dirs beside the stale ones, and
    the manifest merge would double-count every sink. Fail with the
    remedy instead of silently duplicating."""
    from fluent_server_ray.state.lineage import load_manifests

    flat_inputs = set()
    for g in inputs:
        for p in (g if isinstance(g, list) else [g]):
            flat_inputs.add(os.path.abspath(p))
    for m in load_manifests(out_dir):
        mid = m.get("shard_id", "")
        mf = m.get("input_file")
        files = mf if isinstance(mf, list) else [mf]
        if mid not in current_ids and any(
            p and os.path.abspath(p) in flat_inputs for p in files
        ):
            raise ValueError(
                f"out_dir {out_dir!r} has lineage for input {files[0]!r} "
                f"under a different shard-id scheme ({mid!r}); wipe the "
                "out_dir (or keep the engine version that wrote it) "
                "before resuming — mixing schemes would double-count."
            )


def _write_sinks(routed, sink_dir: str,
                 partition_cols: list[str] | None = None) -> None:
    """Write per-sink partitioned Parquet atomically (tmp + rename).

    A ZERO-row shard (all-heartbeat file, or a forward shard whose
    chunks were all acked previously) writes an empty directory — the
    shard must still commit its lineage record, or every resume would
    re-crash on the same shard forever."""
    tmp = sink_dir + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    if routed.count() == 0:  # count is free on a materialized shard
        os.makedirs(tmp, exist_ok=True)
    else:
        routed.write_parquet(tmp, partition_cols=partition_cols or ["sink"])
    if os.path.isdir(sink_dir):
        shutil.rmtree(sink_dir)
    os.replace(tmp, sink_dir)


def run_pipeline(
    input_path: str,
    out_dir: str,
    tenant_lookup=None,
    routes=None,
    shards: list[str] | None = None,
    batch_size: int = 32768,
    shard_group_size: int = 1,
    max_concurrent_shards: int = 1,
    conv_buckets: int | None = None,
    time_partition: str | None = None,
) -> dict:
    """Run the flagship pipeline; returns the summary dict
    (per-sink totals — the engine's equivalent of the mirror's HTTP
    JSON view, reference ``mirror/mirror.go:41-47``).

    ``shard_group_size`` groups input files into one commit unit —
    lineage granularity vs per-shard fixed cost is a knob: at 100 TB a
    commit unit should be minutes of work, not one tiny file.

    ``conv_buckets=N`` additionally partitions every sink's output by
    ``siphash(conv_id) % N`` (hive dirs ``cbucket=<k>``, value also
    kept as a ``conv_bucket`` data column) — the persisted
    one-partitioning-key layout: all turns of a conversation co-locate
    in one bucket across every sink and shard, so conversation-keyed
    consumers (sessionization, replay dedup, per-conv analytics) read
    aligned buckets instead of shuffling the corpus.

    ``time_partition='day'|'hour'`` additionally slices every sink by
    EVENT time (hive dirs ``tslice=YYYY-MM-DD[-HH]``, value kept as a
    ``time_slice`` data column) — fluentd's time-sliced output-chunk
    convention (``out_file``'s ``%Y%m%d`` path segments): retention
    deletes drop whole directories, time-ranged consumers prune at the
    read (``read_sink(time_slice=...)``), and late-arriving data lands
    in its event-time slice on replay. Composes with ``conv_buckets``
    (slice nests INSIDE the bucket). Both layout knobs are part of the
    output contract and are checked on resume.
    """
    from fluent_server_ray.state.lineage import (
        commit_shard,
        committed_shards,
        load_manifests,
        summarize_manifests,
    )
    from fluent_server_ray.stages.enrich import put_lookup

    # resolve + broadcast the tenant lookup ONCE for the whole run: a
    # per-shard build_routed would rebuild the dict and ray.put a fresh
    # copy per shard (and each new ref pins another per-worker cache
    # entry for the life of the process)
    if tenant_lookup is None:
        tenant_lookup = build_tenant_map()
    if isinstance(tenant_lookup, dict):
        tenant_lookup = put_lookup(tenant_lookup)

    os.makedirs(out_dir, exist_ok=True)

    if shards is None:
        # discover shard files if input is a dir of parquet shards
        if os.path.isdir(input_path) and not os.path.exists(
            os.path.join(input_path, "events.parquet")
        ):
            shards = sorted(
                os.path.join(input_path, f)
                for f in os.listdir(input_path)
                if f.endswith(".parquet")
            )
        else:
            shards = [input_path]

    # normalize spellings so shard ids, manifests, and the stale-lineage
    # check all agree regardless of how the caller wrote the paths
    shards = [os.path.abspath(p) for p in shards]

    if shard_group_size > 1:
        shards = [
            shards[i : i + shard_group_size]
            for i in range(0, len(shards), shard_group_size)
        ]

    done = committed_shards(out_dir)

    # shard ids are computed up front: basename + a short hash of the
    # full input path(s) and the grouping, so two shards with equal
    # basenames in different directories — or a rerun with a different
    # shard_group_size — can never collide on (and silently overwrite)
    # one sink directory / lineage manifest. Duplicates fail fast.
    work = [
        (_shard_id(shard_path, shard_group_size), shard_path)
        for shard_path in shards
    ]
    ids = [sid for sid, _ in work]
    if len(set(ids)) != len(ids):
        dupes = sorted({i for i in ids if ids.count(i) > 1})
        raise ValueError(f"duplicate shard ids in one run: {dupes}")
    _check_stale_lineage(out_dir, set(ids), [g for _, g in work])
    if time_partition not in (None, "day", "hour"):
        raise ValueError(
            f"time_partition must be None, 'day' or 'hour', "
            f"got {time_partition!r}")
    # the sink LAYOUT is part of the output contract too: resuming a
    # flat out_dir with conv_buckets / time_partition (or different
    # values) would mix layouts and make pruned reads silently
    # incomplete
    for m in load_manifests(out_dir):
        prev = m.get("conv_buckets")
        if prev != conv_buckets:
            raise ValueError(
                f"out_dir {out_dir!r} was written with conv_buckets="
                f"{prev!r}; resuming with conv_buckets={conv_buckets!r} "
                "would mix sink layouts — wipe the out_dir or match it."
            )
        prev_t = m.get("time_partition")
        if prev_t != time_partition:
            raise ValueError(
                f"out_dir {out_dir!r} was written with time_partition="
                f"{prev_t!r}; resuming with time_partition="
                f"{time_partition!r} would mix sink layouts — wipe the "
                "out_dir or match it."
            )

    def process_shard(item) -> None:
        import time

        t_start = time.perf_counter()
        shard_id, shard_path = item
        group = shard_path if isinstance(shard_path, list) else [shard_path]
        if shard_id in done:
            return
        from fluent_server_ray.sources.transcripts import TRANSCRIPT_SCHEMA_COLS
        import ray.data as rd

        src = (
            group[0]
            if len(group) == 1
            else _rpq(group, columns=TRANSCRIPT_SCHEMA_COLS)
        )
        routed = build_routed(
            src, tenant_lookup=tenant_lookup, routes=routes,
            batch_size=batch_size,
        )
        sink_dir = os.path.join(out_dir, "sinks", f"shard={shard_id}")
        part_cols = ["sink"]
        if conv_buckets:
            routed = add_conv_bucket(routed, conv_buckets)
            part_cols.append("cbucket")
        if time_partition:
            routed = add_time_slice(routed, time_partition)
            part_cols.append("tslice")
        # one shard is bounded (that's what a shard IS at 100 TB), so
        # pinning it briefly lets the write and the count share one pass
        routed_m = routed_sorted(routed).materialize()
        _write_sinks(
            routed_m, sink_dir,
            partition_cols=part_cols if len(part_cols) > 1 else None,
        )
        # lineage record: per-sink counts for this shard (small result)
        counts = grouped_counts(routed_m, COUNT_KEYS, batch_size=batch_size).to_pandas()
        input_bytes = sum(
            os.path.getsize(p) for p in group if os.path.isfile(p)
        )
        commit_shard(
            out_dir,
            shard_id,
            {
                "input_file": group if len(group) > 1 else group[0],
                "row_count": int(counts["n"].sum()),
                "per_sink_counts": {
                    s: int(g["n"].sum()) for s, g in counts.groupby("sink")
                },
                # per-partition metrics (north rule: lineage + metrics)
                "elapsed_sec": round(time.perf_counter() - t_start, 3),
                "input_bytes": input_bytes,
                "conv_buckets": conv_buckets,  # layout contract (checked
                "time_partition": time_partition,  # on resume)
            },
        )

    if max_concurrent_shards > 1:
        # overlap commit units: each shard's Dataset pipeline executes
        # independently (own streaming executor); lineage commits stay
        # per-shard atomic, so a crash still resumes cleanly
        from concurrent.futures import ThreadPoolExecutor

        _stub_fsspec_http()  # see docstring: concurrent-import safety



        with ThreadPoolExecutor(max_workers=max_concurrent_shards) as pool:
            list(pool.map(process_shard, work))
    else:
        for item in work:
            process_shard(item)

    # summary = merge of all shard manifests (pure driver-side, tiny)
    summary = summarize_manifests(out_dir)
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, sort_keys=True, indent=1)
    return summary


def add_conv_bucket(routed, n_buckets: int):
    """Append the persisted conversation-bucket key: ``cbucket`` (used
    as a hive partition column, consumed by the writer) and
    ``conv_bucket`` (the same value kept INSIDE the files, so direct
    per-file readers don't depend on hive-path reconstruction).
    Deterministic SipHash — the same conv lands in the same bucket on
    every node, every run."""
    import pyarrow as pa

    from fluent_server_ray.stages.aggregate import hash_bucket_array

    def fn(t: pa.Table) -> pa.Table:
        b = pa.array(hash_bucket_array(t["conv_id"], n_buckets))
        return t.append_column("cbucket", b).append_column("conv_bucket", b)

    return routed.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def add_time_slice(routed, granularity: str = "day"):
    """Append the persisted EVENT-time slice key: ``tslice`` (hive
    partition column, consumed by the writer) and ``time_slice`` (the
    same value kept inside the files) — fluentd's time-sliced output
    convention. ``'day'`` → ``YYYY-MM-DD``, ``'hour'`` →
    ``YYYY-MM-DD-HH``; a NULL event time slices to ``'unknown'`` (the
    reject-sink rows must still land deterministically somewhere)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    fmt = "%Y-%m-%d" if granularity == "day" else "%Y-%m-%d-%H"

    def fn(t: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.strftime(t["ts"], format=fmt), "unknown")
        return t.append_column("tslice", s).append_column("time_slice", s)

    return routed.map_batches(fn, batch_format="pyarrow",
                              zero_copy_batch=True)


def routed_sorted(routed):
    """Stable (conv_id, turn_idx) ordering before sink writes (north
    rule: per-turn text equality under stable turn ordering; ≙ the
    reference's intra-chunk order preservation,
    ``defaultreader/reader.go:85-103``, strengthened to determinism).

    Sorts on a null-safe key column (Ray's sort comparator chokes on
    None vs str — malformed rows have null conv_id and must still land
    deterministically in the reject sink)."""
    import pyarrow as pa

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("_ck", pc.fill_null(t["conv_id"], ""))

    s = routed.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True)
    return s.sort(["_ck", "turn_idx"]).drop_columns(["_ck"])


def read_back(sink_dir: str):
    """Re-read a shard's partitioned sink output as a Dataset."""
    import ray.data as rd

    return rd.read_parquet(sink_dir)


def _stub_fsspec_http() -> None:
    """Make ``from fsspec.implementations.http import HTTPFileSystem``
    deterministic when aiohttp is absent.

    Ray's path resolution attempts that import on EVERY read/write
    (failed imports are never cached), catching only
    ``ModuleNotFoundError``; under concurrent Dataset construction two
    threads can interleave the failing import and one of them observes
    a bare ``ImportError`` that escapes Ray's handler. Registering a
    stub module with a placeholder class makes the import succeed once
    and be cached; the only use is an ``isinstance`` check, which is
    correctly False for every real (local) filesystem.
    """
    import sys
    import types

    name = "fsspec.implementations.http"
    if name in sys.modules:
        return
    try:
        import aiohttp  # noqa: F401

        return  # real module importable; no stub needed
    except ImportError:
        pass
    mod = types.ModuleType(name)

    class HTTPFileSystem:  # placeholder for isinstance checks only
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules[name] = mod


# --------------------------------------- right-to-be-forgotten delete

def delete_convs(out_dir: str, conv_ids) -> dict:
    """GDPR / right-to-be-forgotten DELETE over a committed run:
    remove every row of the given conversations from the persisted
    sinks and reconcile the lineage counts — the retention tool a log
    pipeline owes its users (the reference can only drop future
    traffic; committed history needs surgery).

    Partition-selective and idempotent: with a ``conv_buckets=N``
    layout only the tombstones' ``cbucket`` directories are read at
    all; within candidates, a file containing NO tombstoned row is
    left byte-untouched (re-running with the same tombstones rewrites
    nothing). Rewrites go through write-temp + atomic rename — a crash
    mid-delete leaves every file either old or fully scrubbed, and the
    run can simply be repeated. Lineage is reconciled AFTER scrubbing
    from the OBSERVED parquet metadata row counts (never by
    subtracting deltas), so a re-run after a crash between scrub and
    reconcile heals the manifests too; ``deletes_applied`` audits the
    cumulative reduction. Any compaction remnants are repaired first
    so stale ``.old`` copies can never be scrubbed/double-counted.

    Returns {files_scanned, files_rewritten, rows_deleted, per_sink}.
    """
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as _pq
    import ray

    from fluent_server_ray.stages.aggregate import hash_bucket_array
    from fluent_server_ray.state.lineage import load_manifests

    repair_compaction(out_dir)
    ids = sorted({str(c) for c in conv_ids})
    if not ids:
        return {"files_scanned": 0, "files_rewritten": 0,
                "rows_deleted": 0, "per_sink": {}}
    manifests = load_manifests(out_dir)
    if not manifests:
        raise FileNotFoundError(f"no committed run under {out_dir!r}")
    conv_buckets = manifests[0].get("conv_buckets")

    sinks_root = os.path.join(out_dir, "sinks")
    files = sorted(f for f in _glob.glob(
        os.path.join(sinks_root, "*", "sink=*", "**", "*.parquet"),
        recursive=True) if _is_live_sink_path(f, sinks_root))
    if conv_buckets:
        hit = {int(b) for b in
               hash_bucket_array(pa.array(ids, pa.string()), conv_buckets)}
        files = [f for f in files
                 if any(f"cbucket={b}/" in f or f"cbucket={b}{os.sep}" in f
                        for b in hit)]

    ids_arr = pa.array(ids, pa.string())

    @ray.remote
    def scrub(path: str, tomb: pa.Array) -> tuple:
        import os as _os

        import pyarrow.compute as _pc
        import pyarrow.parquet as _pqq

        t = _pqq.read_table(path)
        mask = _pc.is_in(t["conv_id"], value_set=tomb)
        n = _pc.sum(_pc.cast(mask, pa.int64())).as_py() or 0
        if n == 0:
            return path, 0
        kept = t.filter(_pc.invert(mask))
        tmp = path + ".tmpdel"
        _pqq.write_table(kept, tmp)
        _os.replace(tmp, path)
        return path, int(n)

    results = ray.get([scrub.remote(f, ids_arr) for f in files])

    rows_deleted = 0
    per_sink: dict[str, int] = {}
    for path, n in results:
        if not n:
            continue
        rows_deleted += n
        rel = os.path.relpath(path, sinks_root)
        sink = rel.split(os.sep)[1].split("=", 1)[1]
        per_sink[sink] = per_sink.get(sink, 0) + n

    # reconcile only the shards whose files were candidates — the
    # candidate set is a deterministic function of the tombstones, so
    # a repeat after a crash re-derives the same scope and still heals
    touched = {os.path.relpath(f, sinks_root).split(os.sep)[0]
               .split("=", 1)[1] for f in files}
    reconcile_lineage(out_dir, shard_ids=touched)

    return {"files_scanned": len(files),
            "files_rewritten": sum(1 for _, n in results if n),
            "rows_deleted": rows_deleted, "per_sink": per_sink}


def _is_live_sink_path(path: str, root: str) -> bool:
    """False for files inside compaction remnant dirs (``*.old`` /
    ``*.compacting``) — live readers and surgery must never see a
    crashed swap's stale copy. Only components BELOW ``root`` (the
    run's ``sinks`` dir) are tested: a user's out_dir legitimately
    named ``experiment.old`` must not hide its own data
    (review finding)."""
    parts = os.path.relpath(path, root).split(os.sep)
    return not any(p.endswith(".old") or p.endswith(".compacting")
                   for p in parts)


def delete_time_slices(out_dir: str, before: str | None = None,
                       slices: list[str] | None = None) -> dict:
    """Retention deletion: drop whole event-time slice directories —
    the payoff of ``run_pipeline(time_partition=...)``: expiring old
    data is a directory unlink, not a rewrite (fluentd's time-sliced
    buffer expiry; GDPR/TTL retention at 100 TB must not read data to
    delete it).

    ``before='YYYY-MM-DD[-HH]'`` drops every slice strictly older
    (slice keys compare lexicographically by construction);
    ``slices=[...]`` drops named slices. The ``'unknown'`` slice
    (NULL event times) is never dropped by ``before`` — only by
    naming it explicitly. Lineage is reconciled AFTER the unlinks
    from observed parquet metadata (:func:`reconcile_lineage`), so a
    crash mid-deletion heals on the repeat, and repeating the call is
    a no-op. Returns {dirs_deleted, rows_deleted, per_sink}.
    """
    import glob as _glob

    import pyarrow.parquet as _pq

    from fluent_server_ray.state.lineage import load_manifests

    if (before is None) == (slices is None):
        raise ValueError("pass exactly one of before= / slices=")
    manifests = load_manifests(out_dir)
    if not manifests:
        raise FileNotFoundError(f"no committed run under {out_dir!r}")
    if not any(m.get("time_partition") for m in manifests):
        raise ValueError(
            "out_dir was not written with time_partition= — there are "
            "no time slices to delete")
    repair_compaction(out_dir)

    want = set(slices or [])
    hit_dirs = []
    for d in _glob.glob(os.path.join(out_dir, "sinks", "*", "sink=*",
                                     "**", "tslice=*"), recursive=True):
        if not os.path.isdir(d) or not _is_live_sink_path(
                d, os.path.join(out_dir, "sinks")):
            continue
        val = os.path.basename(d).split("=", 1)[1]
        if before is not None:
            if val != "unknown" and val < before:
                hit_dirs.append(d)
        elif val in want:
            hit_dirs.append(d)

    rows_deleted = 0
    per_sink: dict[str, int] = {}
    for d in sorted(hit_dirs):
        sink = [p for p in d.split(os.sep)
                if p.startswith("sink=")][0].split("=", 1)[1]
        n = sum(_pq.read_metadata(f).num_rows for f in _glob.glob(
            os.path.join(d, "**", "*.parquet"), recursive=True))
        shutil.rmtree(d)
        rows_deleted += n
        per_sink[sink] = per_sink.get(sink, 0) + n

    # store-wide reconcile: the before=/slices= predicate itself is
    # store-wide, and a crash-interrupted earlier call may have
    # unlinked dirs this call no longer sees
    reconcile_lineage(out_dir)
    return {"dirs_deleted": len(hit_dirs), "rows_deleted": rows_deleted,
            "per_sink": per_sink}


def reconcile_lineage(out_dir: str,
                      shard_ids: set | None = None) -> dict:
    """Re-derive shards' lineage counts from the OBSERVED sink files
    (parquet footer row counts — a metadata scan, no data read) and
    re-commit records that drifted. This is the repair half of the
    delete operations: counts are always reconstructable from
    reality, so a crash between file surgery and lineage commit heals
    on the next call. A shard whose files are ALL gone reconciles to
    zero (retention can legitimately empty a shard — review finding).
    ``deletes_applied`` is derived (original − observed), never
    accumulated, so reconcile stays idempotent.

    ``shard_ids`` scopes the scan to those shards (the delta-update
    path for targeted surgery); ``None`` scans the whole store. The
    per-shard footer sweep runs as parallel Ray tasks — at 100 TB the
    metadata scan is inherently O(files), but wall time is bounded by
    the largest shard, not the store."""
    import glob as _glob

    import ray

    from fluent_server_ray.state.lineage import commit_shard, load_manifests

    sinks_root = os.path.join(out_dir, "sinks")

    @ray.remote
    def observe(shard_dir: str, root: str) -> tuple:
        import glob as _g
        import os as _os

        import pyarrow.parquet as _pqm

        counts: dict[str, int] = {}
        for f in _g.glob(_os.path.join(shard_dir, "sink=*", "**",
                                       "*.parquet"), recursive=True):
            if not _is_live_sink_path(f, root):
                continue
            rel = _os.path.relpath(f, shard_dir)
            sink = rel.split(_os.sep)[0].split("=", 1)[1]
            counts[sink] = counts.get(sink, 0)                 \
                + _pqm.read_metadata(f).num_rows
        sid = _os.path.basename(shard_dir).split("=", 1)[1]
        return sid, counts

    shard_dirs = [d for d in _glob.glob(os.path.join(sinks_root,
                                                     "shard=*"))
                  if os.path.isdir(d)
                  and _is_live_sink_path(d, sinks_root)]
    if shard_ids is not None:
        shard_dirs = [d for d in shard_dirs
                      if os.path.basename(d).split("=", 1)[1]
                      in shard_ids]
    observed = dict(ray.get([observe.remote(d, sinks_root)
                             for d in shard_dirs]))

    fixed = 0
    for m in load_manifests(out_dir):
        sid = m["shard_id"]
        if shard_ids is not None and sid not in shard_ids:
            continue
        # a shard directory that vanished entirely observes as empty —
        # its counts must reconcile to zero, not survive stale
        counts = observed.get(sid, {})
        total = sum(counts.values())
        if (counts == m.get("per_sink_counts")
                and total == m.get("row_count")):
            continue
        rec = {k: v for k, v in m.items() if k != "shard_id"}
        # original committed volume = row_count + whatever was already
        # deleted; the audit counter is derived, not accumulated, so
        # reconcile stays idempotent
        original = m["row_count"] + m.get("deletes_applied", 0)
        rec["per_sink_counts"] = counts
        rec["row_count"] = total
        rec["deletes_applied"] = original - total
        commit_shard(out_dir, sid, rec)
        fixed += 1
    return {"reconciled": fixed}


# ----------------------------------------------- small-file compaction

def compact_run(out_dir: str, min_files: int = 2) -> dict:
    """Small-file COMPACTION of a committed run: every sink leaf
    directory (``shard=*/sink=*[/cbucket=*]``) holding ``min_files``
    or more parquet files is rewritten as ONE file — the steady-state
    maintenance a long-lived resumable layout needs (every resume and
    every delete pass can leave small files; downstream readers pay
    per-file open costs).

    Swap protocol (crash-safe with :func:`repair_compaction`): the
    compacted file is written to ``<dir>.compacting/``, then
    ``dir → dir.old``, ``dir.compacting → dir``, ``rm -rf dir.old``.
    A crash at any point leaves a state ``repair_compaction`` can
    roll forward or back; row content is verified equal by count
    before the old directory is dropped. Lineage is untouched —
    compaction changes layout, never rows.

    Returns {dirs_scanned, dirs_compacted, files_before, files_after}.
    """
    import glob as _glob

    import pyarrow.parquet as _pq
    import ray

    repair_compaction(out_dir)  # never treat a crashed swap's
    # remnants as compaction input
    sinks_root = os.path.join(out_dir, "sinks")
    leaf_dirs = sorted({os.path.dirname(f) for f in _glob.glob(
        os.path.join(sinks_root, "*", "sink=*", "**", "*.parquet"),
        recursive=True) if _is_live_sink_path(f, sinks_root)})

    @ray.remote
    def compact(d: str) -> tuple:
        import glob as _g
        import os as _os
        import shutil as _sh

        import pyarrow.parquet as _pqq

        files = sorted(_g.glob(_os.path.join(d, "*.parquet")))
        if len(files) < min_files:
            return d, len(files), len(files), False
        t = _pqq.read_table(files)
        tmpdir = d + ".compacting"
        _sh.rmtree(tmpdir, ignore_errors=True)
        _os.makedirs(tmpdir)
        _pqq.write_table(t, _os.path.join(tmpdir, "compacted-0.parquet"))
        # row-count invariant before any destructive step
        n_new = _pqq.read_metadata(
            _os.path.join(tmpdir, "compacted-0.parquet")).num_rows
        if n_new != t.num_rows:
            raise RuntimeError(f"compaction row mismatch under {d}")
        old = d + ".old"
        _sh.rmtree(old, ignore_errors=True)
        _os.rename(d, old)
        _os.rename(tmpdir, d)
        _sh.rmtree(old)
        return d, len(files), 1, True

    results = ray.get([compact.remote(d) for d in leaf_dirs])
    return {
        "dirs_scanned": len(leaf_dirs),
        "dirs_compacted": sum(1 for *_, done in results if done),
        "files_before": sum(b for _, b, _, _ in results),
        "files_after": sum(a for _, _, a, _ in results),
    }


def repair_compaction(out_dir: str) -> dict:
    """Roll a crashed :func:`compact_run` forward: a missing leaf dir
    with a completed ``.compacting`` sibling is swapped in; stray
    ``.old`` / ``.compacting`` remnants next to a live dir are
    removed. Idempotent; safe to run before every read."""
    import glob as _glob
    import shutil as _sh

    fixed = 0
    for tmp in _glob.glob(os.path.join(out_dir, "sinks", "**",
                                       "*.compacting"), recursive=True):
        live = tmp[: -len(".compacting")]
        if not os.path.isdir(live) and _glob.glob(
                os.path.join(tmp, "*.parquet")):
            os.rename(tmp, live)   # roll forward
            fixed += 1
        else:
            _sh.rmtree(tmp, ignore_errors=True)
    for old in _glob.glob(os.path.join(out_dir, "sinks", "**", "*.old"),
                          recursive=True):
        live = old[: -len(".old")]
        if os.path.isdir(live):
            _sh.rmtree(old, ignore_errors=True)   # swap completed
        else:
            os.rename(old, live)   # roll back (compacted dir lost)
            fixed += 1
    return {"repaired": fixed}


def tenant_hour_profile_distance(source) -> "pa.Table":
    """Pairwise total-variation distance between tenants' hour-of-day
    usage profiles over ROUTED turns — the behavioral-fingerprint
    comparison ("do these two tenants use the product on the same
    clock?") beside the per-tenant count panels.

    Exact contract: hour = ``(epoch_us // 3.6e9) % 24`` (integer
    floor-div, no calendar path); per-(tenant, hour) counts are exact
    ints on the bounded 24-column grid; for pair (a < b) the
    cross-scaled L1 mass ``D = Σ_h |c_ah·N_b − c_bh·N_a|`` is an exact
    python int and ``tvd = float(D) / _split_float(2·N_a·N_b)`` is ONE
    division (TVD ∈ [0, 1]; the denominator passes 2^64 at scale, so
    both engines float it via the shared split tree — D itself is
    BIGINT-guarded in the mirror, so ``float(D)`` matches its cast).
    Hours silent for both tenants contribute
    0 (grid completion is a no-op — mirrored). Output:
    (tenant_a, tenant_b, d_cross, tvd) sorted by pair; the |tenants|²
    pair scan runs on the driver over the bounded grid.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.features import _split_float

    routed = build_routed(source, columns=["tenant", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t["tenant"]),
                             pc.is_valid(t["ts"])))
        us = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False).astype(np.int64))
        hour = pa.array((us // 3_600_000_000) % 24, pa.int64())
        prep = pa.table({"tenant": t["tenant"], "hour": hour,
                         "one": pa.array(np.ones(len(t), np.int64))})
        out = prep.group_by(["tenant", "hour"]).aggregate([("one",
                                                            "sum")])
        return out.rename_columns(["tenant", "hour", "n"])

    grid = grouped_agg(
        routed.map_batches(skip_empty(partial), batch_format="pyarrow",
                           zero_copy_batch=True),
        ["tenant", "hour"], [("n", "sum")],
        final="driver").to_pandas()

    piv = (grid.pivot_table(index="tenant", columns="hour",
                            values="n_sum", aggfunc="sum")
           .fillna(0).astype("int64").sort_index())
    tenants = list(piv.index)
    totals = piv.sum(axis=1).astype("int64")
    out = {"a": [], "b": [], "d": [], "tvd": []}
    for i in range(len(tenants)):
        for j in range(i + 1, len(tenants)):
            ta, tb = tenants[i], tenants[j]
            ca = piv.loc[ta].to_numpy()
            cb = piv.loc[tb].to_numpy()
            na, nb = int(totals[ta]), int(totals[tb])
            d = sum(abs(int(x) * nb - int(y) * na)
                    for x, y in zip(ca, cb))
            out["a"].append(ta)
            out["b"].append(tb)
            out["d"].append(d)
            # 2·N_a·N_b passes 2^64 at 10^12-turn scale — shared
            # split tree for the DENOMINATOR only (d is BIGINT-guarded
            # in the mirror, so float(d) ≡ its correctly-rounded CAST)
            out["tvd"].append(float(d) / _split_float(2 * na * nb)
                              if na and nb else None)
    return pa.table({
        "tenant_a": pa.array(out["a"], pa.string()),
        "tenant_b": pa.array(out["b"], pa.string()),
        "d_cross": pa.array(out["d"], pa.int64()),
        "tvd": pa.array(out["tvd"], pa.float64()),
    })


def tenant_hour_profile_distance_sql() -> str:
    from fluent_server_ray import oracle
    from fluent_server_ray.stages.features import _split_float_sql

    return (
        oracle.with_pipeline_ctes()
        + f"""
, hr AS (
  SELECT tenant, (epoch_us(ts) // 3600000000) % 24 AS hour,
    CAST(count(*) AS BIGINT) AS n
  FROM routed WHERE ts IS NOT NULL GROUP BY 1, 2
), tenants AS (SELECT DISTINCT tenant FROM hr),
hours AS (SELECT DISTINCT hour FROM hr),
grid AS (
  SELECT t.tenant, h.hour, COALESCE(hr.n, 0) AS n
  FROM tenants t CROSS JOIN hours h
  LEFT JOIN hr ON hr.tenant = t.tenant AND hr.hour = h.hour
), tot AS (
  SELECT tenant, CAST(sum(n) AS BIGINT) AS total
  FROM grid GROUP BY tenant
), pairs AS (
  SELECT a.tenant AS ta, b.tenant AS tb
  FROM tenants a JOIN tenants b ON a.tenant < b.tenant
), d AS (
  SELECT p.ta, p.tb,
    CAST(sum(abs(CAST(ga.n AS HUGEINT) * tb_tot.total
                 - CAST(gb.n AS HUGEINT) * ta_tot.total))
      AS BIGINT) AS d_cross,
    max(ta_tot.total) AS na, max(tb_tot.total) AS nb
  FROM pairs p
  JOIN grid ga ON ga.tenant = p.ta
  JOIN grid gb ON gb.tenant = p.tb AND gb.hour = ga.hour
  JOIN tot ta_tot ON ta_tot.tenant = p.ta
  JOIN tot tb_tot ON tb_tot.tenant = p.tb
  GROUP BY p.ta, p.tb
)
SELECT ta AS tenant_a, tb AS tenant_b, d_cross,
  CASE WHEN na > 0 AND nb > 0 THEN
    CAST(d_cross AS DOUBLE)
    / {_split_float_sql('2 * CAST(na AS HUGEINT) * nb')}
  END AS tvd
FROM d ORDER BY ta, tb"""
    )


def tenant_salt_plan(source, target_rows: int = 1000) -> "pa.Table":
    """Hot-key salt planner over ROUTED tenant counts — the
    shuffle-planning companion of ``aggregate.add_salt``: for every
    tenant, the salt factor ``ceil(n / target_rows)`` that caps each
    (tenant, salt) reducer partition at ~target_rows rows, and whether
    the key is "hot" (salt > 1). Feed the plan into a salted
    aggregation so one dominant tenant spreads across reducers instead
    of serializing one.

    Exact contract: counts are exact ints from the per-batch combiner;
    ``salt_factor = (n + target_rows − 1) // target_rows`` (integer
    ceil — mirrored). Output: (tenant, n, salt_factor, is_hot) sorted
    by tenant.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_counts

    routed = build_routed(source, columns=["tenant"])
    counts = grouped_counts(routed, ["tenant"]).to_pandas() \
        .sort_values("tenant")
    n = counts["n"].astype("int64")
    salt = (n + target_rows - 1) // target_rows
    return pa.table({
        "tenant": pa.array(counts["tenant"], pa.string()),
        "n": pa.array(n),
        "salt_factor": pa.array(salt.astype("int64")),
        "is_hot": pa.array((salt > 1).to_numpy(), pa.bool_()),
    })


def tenant_salt_plan_sql(target_rows: int = 1000) -> str:
    from fluent_server_ray import oracle

    return (
        oracle.with_pipeline_ctes()
        + f"""
SELECT tenant, CAST(count(*) AS BIGINT) AS n,
  CAST((count(*) + {target_rows} - 1) // {target_rows} AS BIGINT)
    AS salt_factor,
  (count(*) + {target_rows} - 1) // {target_rows} > 1 AS is_hot
FROM routed GROUP BY tenant ORDER BY tenant"""
    )


def tag_prefix_rollup(source) -> "pa.Table":
    """Hierarchical tag-namespace rollup over ROUTED turns: counts at
    EVERY dotted-prefix level of the tag ('tool.assistant.search'
    contributes to 'tool', 'tool.assistant' and itself) — the
    log-analytics namespace drill-down the reference's flat
    ``map[tag]`` mirror cannot answer without a rescan.

    Exact contract: prefixes split on '.' (levels 1..depth); counts
    are exact ints from a per-batch explode + combiner (each row emits
    ≤ depth prefix rows before the tiny final merge — the exchange is
    |prefixes|-bounded, not row-bounded). Output: (prefix, level, n)
    sorted by (prefix).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    routed = build_routed(source, columns=["tag"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["tag"]))
        # collapse to distinct tags FIRST (Arrow group_by — tags are
        # a dozen-ish values); the python prefix explode then runs
        # over the tiny distinct table, never per routed row
        tags = (pa.table({"tag": t["tag"]}).group_by(["tag"])
                .aggregate([([], "count_all")])
                .rename_columns(["tag", "c"]))
        prefixes, levels, counts = [], [], []
        for tag, c in zip(tags["tag"].to_pylist(),
                          tags["c"].to_pylist()):
            parts = tag.split(".")
            for lvl in range(1, len(parts) + 1):
                prefixes.append(".".join(parts[:lvl]))
                levels.append(lvl)
                counts.append(c)
        prep = pa.table({
            "prefix": pa.array(prefixes, pa.string()),
            "level": pa.array(levels, pa.int64()),
            "one": pa.array(counts, pa.int64()),
        })
        out = prep.group_by(["prefix", "level"]).aggregate([("one",
                                                             "sum")])
        return out.rename_columns(["prefix", "level", "n"])

    agg = grouped_agg(
        routed.map_batches(skip_empty(partial), batch_format="pyarrow",
                           zero_copy_batch=True),
        ["prefix", "level"], [("n", "sum")],
        final="driver").to_pandas().sort_values("prefix")
    return pa.table({
        "prefix": pa.array(agg["prefix"], pa.string()),
        "level": pa.array(agg["level"].astype("int64")),
        "n": pa.array(agg["n_sum"].astype("int64")),
    })


def tag_prefix_rollup_sql() -> str:
    from fluent_server_ray import oracle

    return (
        oracle.with_pipeline_ctes()
        + """
, parts AS (
  SELECT string_split(tag, '.') AS p FROM routed
), pref AS (
  SELECT array_to_string(p[1:g.l], '.') AS prefix,
    CAST(g.l AS BIGINT) AS level
  FROM parts CROSS JOIN unnest(generate_series(1, len(p))) AS g(l)
)
SELECT prefix, level, CAST(count(*) AS BIGINT) AS n
FROM pref GROUP BY prefix, level ORDER BY prefix"""
    )


def tool_basket_pairs(source) -> "pa.Table":
    """Tool co-occurrence baskets over ROUTED turns: for every
    unordered pair of tools used within the SAME conversation, the
    number of conversations using both, each alone, and the lift vs
    independence — the market-basket readout on the tool-call stream
    ("do search and lookup travel together?").

    Exact contract: baskets are DISTINCT (conv, tool) pairs over
    routed turns with a non-empty parsed tool; supports are exact
    ints; ``lift = (float(n_ab)·float(n_convs)) / (float(n_a)·
    float(n_b))`` mirrored exactly (every operand < 2^53).

    Shape: per-batch distinct-pair combiner → ONE conv-bucket
    exchange co-locating each conversation's tools (≤ a handful) →
    per-bucket pair explode → bounded |tools|² merge on the driver.
    Output: (tool_a, tool_b, n_both, n_a, n_b, n_convs, lift) sorted
    by pair.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.assembly import _with_bucket

    routed = build_routed(source, columns=["conv_id", "parsed_tool"])

    def distinct_ct(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t["parsed_tool"]),
                       pc.not_equal(pc.fill_null(t["parsed_tool"], ""),
                                    ""))
        t = t.filter(keep)
        out = (pa.table({"conv_id": t["conv_id"],
                         "tool": t["parsed_tool"]})
               .group_by(["conv_id", "tool"]).aggregate([([],
                                                          "count_all")]))
        return out.rename_columns(["conv_id", "tool", "c"])

    per_ct = grouped_agg(
        routed.map_batches(skip_empty(distinct_ct),
                           batch_format="pyarrow",
                           zero_copy_batch=True),
        keys=["conv_id", "tool"], aggs=[("c", "sum")], final="ray")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = {"ta": [], "tb": [], "n": []}
        solo = {"tool": [], "n": []}
        n_convs = 0
        for _, sub in g.groupby("conv_id", sort=False):
            tools = sorted(set(sub["tool"]))
            n_convs += 1
            for t in tools:
                solo["tool"].append(t)
                solo["n"].append(1)
            for i in range(len(tools)):
                for j in range(i + 1, len(tools)):
                    rows["ta"].append(tools[i])
                    rows["tb"].append(tools[j])
                    rows["n"].append(1)
        pairs = (pd.DataFrame(rows).groupby(["ta", "tb"],
                                            as_index=False).sum()
                 if rows["ta"] else
                 pd.DataFrame({"ta": pd.Series([], dtype="object"),
                               "tb": pd.Series([], dtype="object"),
                               "n": pd.Series([], dtype="int64")}))
        solo_df = (pd.DataFrame(solo).groupby("tool",
                                              as_index=False).sum()
                   if solo["tool"] else
                   pd.DataFrame({"tool": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")}))
        pairs["kind"] = "pair"
        solo_df = solo_df.rename(columns={"tool": "ta"})
        solo_df["tb"] = ""
        solo_df["kind"] = "solo"
        conv_row = pd.DataFrame({"ta": [""], "tb": [""],
                                 "n": [n_convs], "kind": ["convs"]})
        return pd.concat([pairs[["ta", "tb", "n", "kind"]],
                          solo_df[["ta", "tb", "n", "kind"]],
                          conv_row], ignore_index=True)

    bucketed = _with_bucket(per_ct, "conv_id", 64)
    parts = grouped_agg(
        bucketed.groupby("_bucket").map_groups(
            per_bucket, batch_format="pandas"),
        ["ta", "tb", "kind"], [("n", "sum")],
        final="driver").to_pandas()

    n_convs = int(parts[parts.kind == "convs"]["n_sum"].sum())
    solo = {r["ta"]: int(r["n_sum"])
            for _, r in parts[parts.kind == "solo"].iterrows()}
    out = {"a": [], "b": [], "nab": [], "na": [], "nb": [],
           "nc": [], "lift": []}
    pr = parts[parts.kind == "pair"].sort_values(["ta", "tb"])
    for _, r in pr.iterrows():
        na, nb = solo[r["ta"]], solo[r["tb"]]
        nab = int(r["n_sum"])
        out["a"].append(r["ta"])
        out["b"].append(r["tb"])
        out["nab"].append(nab)
        out["na"].append(na)
        out["nb"].append(nb)
        out["nc"].append(n_convs)
        out["lift"].append((float(nab) * float(n_convs))
                           / (float(na) * float(nb)))
    return pa.table({
        "tool_a": pa.array(out["a"], pa.string()),
        "tool_b": pa.array(out["b"], pa.string()),
        "n_both": pa.array(out["nab"], pa.int64()),
        "n_a": pa.array(out["na"], pa.int64()),
        "n_b": pa.array(out["nb"], pa.int64()),
        "n_convs": pa.array(out["nc"], pa.int64()),
        "lift": pa.array(out["lift"], pa.float64()),
    })


def tool_basket_pairs_sql() -> str:
    from fluent_server_ray import oracle

    return (
        oracle.with_pipeline_ctes()
        + """
, ct AS (
  SELECT DISTINCT conv_id, parsed_tool AS tool
  FROM routed WHERE parsed_tool IS NOT NULL AND parsed_tool <> ''
), nc AS (SELECT count(DISTINCT conv_id) AS n FROM ct),
solo AS (
  SELECT tool, CAST(count(*) AS BIGINT) AS n FROM ct GROUP BY tool
), pairs AS (
  SELECT a.tool AS tool_a, b.tool AS tool_b,
    CAST(count(*) AS BIGINT) AS n_both
  FROM ct a JOIN ct b
    ON b.conv_id = a.conv_id AND b.tool > a.tool
  GROUP BY 1, 2
)
SELECT p.tool_a, p.tool_b, p.n_both, sa.n AS n_a, sb.n AS n_b,
  CAST((SELECT n FROM nc) AS BIGINT) AS n_convs,
  (CAST(p.n_both AS DOUBLE) * CAST((SELECT n FROM nc) AS DOUBLE))
  / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)) AS lift
FROM pairs p
JOIN solo sa ON sa.tool = p.tool_a
JOIN solo sb ON sb.tool = p.tool_b
ORDER BY p.tool_a, p.tool_b"""
    )
