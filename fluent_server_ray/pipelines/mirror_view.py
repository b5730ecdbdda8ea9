"""Mirror view: the reference's HTTP JSON sink, re-expressed.

The reference's only sink is an in-memory ``map[tag][]Event`` served as
one JSON object ``{tag: [events...]}`` (reference ``mirror/mirror.go:14-47``,
mounted at ``main.go:48-53``). That design collapses all parallelism
into one mutex and loses everything on restart; here the same *view*
is derived on demand from the durable per-sink Parquet output:

- ``mirror_json(out_dir)`` — group the routed events by tag into the
  reference's exact JSON shape (``{tag: [{"ts": ..., "record": {...}}]}``,
  per ``event/event.go:9-12``); bounded use only (it materializes — the
  same caveat as the reference serving its whole store per request).
- ``mirror_counts(out_dir)`` — the scalable variant: per-tag counts
  from the lineage manifests (no data read at all).
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq


_SORT_COLS = ("conv_id", "turn_idx", "chunk", "entry_idx")


def _sort_recent(df):
    """ts-descending order (the reference's event comparator,
    ``event/event.go:21-33``), canonical-ascending tie-break so equal
    timestamps stay deterministic."""
    cols = [c for c in _SORT_COLS if c in df.columns]
    if "ts" in df.columns:
        return df.sort_values(["ts"] + cols,
                              ascending=[False] + [True] * len(cols),
                              kind="mergesort")
    return df.sort_values(cols, kind="mergesort") if cols else df


def _df_events(df, order: str = "stable"):
    """Yield (tag, event) in a deterministic order — the ONE place the
    mirror's event JSON shape is built (the full view and the paged
    view must tile identically, so they share it). ``order='stable'``
    is the canonical (conv_id, turn_idx) order; ``order='recent'`` is
    ts-descending (reference comparator ``event/event.go:21-33``)."""
    if order == "recent":
        df = _sort_recent(df)
    else:
        sort_cols = [c for c in _SORT_COLS if c in df.columns]
        if sort_cols:
            df = df.sort_values(sort_cols)
    for row in df.to_dict("records"):  # bounded use; no iterrows
        record = {
            k: v
            for k, v in row.items()
            if k not in ("tag", "ts") and v is not None
        }
        yield row.get("tag", ""), {
            "ts": str(row["ts"]) if "ts" in row else None,
            "record": record,
        }


def mirror_json(out_dir: str, limit_per_tag: int | None = None,
                order: str = "stable") -> dict:
    """{tag: [ {ts, record}, ... ]} over all routed sink output.

    ``order='stable'`` (default): events ordered by (conv_id,
    turn_idx) within a tag (deterministic, unlike the reference's
    arrival order). ``order='recent'``: ts-descending per tag — the
    reference's event comparator (``event/event.go:21-33``) as a view;
    with ``limit_per_tag`` this is the GLOBAL most-recent cut per tag
    (per-file top-cap partials merged then re-cut — memory stays
    O(files-in-flight · tags · cap), never first-files-win)."""
    files = sorted(
        glob.glob(os.path.join(out_dir, "sinks", "**", "*.parquet"),
                  recursive=True)
    )
    if order == "recent":
        import pandas as pd

        frames = []
        for f in files:
            df = pq.read_table(f).to_pandas()
            if df.empty or "tag" not in df.columns:
                continue
            df = _sort_recent(df)
            if limit_per_tag:
                # top-cap of a union == top-cap of the union of
                # per-file top-caps — the cap bounds the concat
                df = df.groupby("tag", sort=False).head(limit_per_tag)
            frames.append(df)
        out: dict[str, list] = {}
        if frames:
            allf = _sort_recent(pd.concat(frames, ignore_index=True))
            if limit_per_tag:
                allf = allf.groupby("tag", sort=False).head(limit_per_tag)
            for tag, event in _df_events(allf, order="recent"):
                out.setdefault(tag, []).append(event)
        return out
    out = {}
    for f in files:
        df = pq.read_table(f).to_pandas()
        for tag, event in _df_events(df):
            events = out.setdefault(tag, [])
            if limit_per_tag and len(events) >= limit_per_tag:
                continue  # capped: skip the row instead of append+slice
            events.append(event)
    return out


def mirror_tag_page(out_dir: str, tag: str, offset: int = 0,
                    limit: int = 1000, order: str = "stable") -> list:
    """One tag's events, paged — the scalable per-tag read the
    reference's one-object endpoint lacks. Iterates the sink files in
    the same deterministic order as :func:`mirror_json`, filters the
    tag with one vectorized Arrow ``equal`` per file, and (stable
    order) STOPS as soon as the page is filled — a page request never
    materializes the store. ``order='recent'`` pages the ts-descending
    view: every file must be consulted (the newest event can be
    anywhere), but each contributes at most ``offset+limit`` rows
    post-filter, so memory stays page-bounded."""
    import pyarrow.compute as pc

    files = sorted(
        glob.glob(os.path.join(out_dir, "sinks", "**", "*.parquet"),
                  recursive=True)
    )
    need = offset + limit
    if order == "recent":
        import pandas as pd

        frames = []
        for f in files:
            t = pq.read_table(f)
            if "tag" not in t.column_names:
                continue
            t = t.filter(pc.equal(t["tag"], tag))
            if t.num_rows == 0:
                continue
            frames.append(_sort_recent(t.to_pandas()).head(need))
        if not frames:
            return []
        allf = _sort_recent(pd.concat(frames, ignore_index=True)).head(need)
        return [ev for _, ev in
                _df_events(allf, order="recent")][offset:offset + limit]
    events: list = []
    for f in files:
        t = pq.read_table(f)
        if "tag" not in t.column_names:
            continue
        t = t.filter(pc.equal(t["tag"], tag))
        if t.num_rows == 0:
            continue
        for _, event in _df_events(t.to_pandas()):
            events.append(event)
            if len(events) >= need:
                break
        if len(events) >= need:
            break
    return events[offset:offset + limit]


def mirror_counts(out_dir: str) -> dict:
    """Per-sink totals straight from lineage manifests (O(manifests))."""
    from fluent_server_ray.state.lineage import load_manifests

    totals: dict[str, int] = {}
    for m in load_manifests(out_dir):
        for s, n in m["per_sink_counts"].items():
            totals[s] = totals.get(s, 0) + n
    return totals


def write_mirror_json(out_dir: str, path: str | None = None) -> str:
    path = path or os.path.join(out_dir, "mirror.json")
    with open(path, "w") as f:
        json.dump(mirror_json(out_dir), f, sort_keys=True, default=str)
    return path


DEFAULT_LIMIT_PER_TAG = 1000


def serve_mirror(out_dir: str, port: int = 0, host: str = "127.0.0.1",
                 limit_per_tag: int = DEFAULT_LIMIT_PER_TAG):
    """Serve the mirror view over HTTP — the live counterpart of the
    reference's JSON sink endpoint (``mirror/mirror.go:41-47``, mounted
    ``main.go:48-53``; probed by the JS client,
    ``contrib/js/index.js:33-44``).

    Routes:
      - ``GET /``        → the grouped store, one JSON object
        ``{tag: [{"ts":..., "record":{...}}]}`` — re-derived from the
        durable sink Parquet on every request, exactly as the reference
        re-encodes its in-memory map per request. Capped at
        ``limit_per_tag`` events per tag by default so an accidental
        GET against a large corpus can't materialize it;
        ``GET /?full=1`` overrides the cap explicitly (the reference's
        unbounded behavior, ``mirror/mirror.go:41-47``);
        ``GET /?order=recent`` serves each tag ts-descending (the
        reference's event comparator, ``event/event.go:21-33``).
      - ``GET /counts``  → per-sink totals from lineage manifests only
        (the scalable probe; no data files touched).
      - ``GET /tag/<name>?offset=N&limit=M`` → one tag's events, paged
        (early-stopping file scan; a page never materializes the
        store).

    Returns the started ``ThreadingHTTPServer`` (``server_address``
    carries the bound port when ``port=0``); caller runs
    ``serve_forever()`` (blocking) or drives it from a thread in tests.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from urllib.parse import parse_qs, unquote, urlparse

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib naming)
            parsed = urlparse(self.path)
            route = parsed.path.rstrip("/")
            if route == "/counts":
                body = json.dumps(mirror_counts(out_dir), sort_keys=True)
            elif route.startswith("/tag/"):
                qs = parse_qs(parsed.query)

                def qint(key, default):
                    try:
                        return max(0, int(qs.get(key, [default])[-1]))
                    except ValueError:
                        return default

                # unquote: a tag a client must percent-encode (space,
                # unicode, '/') would otherwise never match its stored key
                page = mirror_tag_page(
                    out_dir, unquote(route[len("/tag/"):]),
                    offset=qint("offset", 0),
                    limit=qint("limit", limit_per_tag),
                    order=("recent"
                           if qs.get("order", ["stable"])[-1] == "recent"
                           else "stable"),
                )
                body = json.dumps(page, sort_keys=True, default=str)
            elif route == "":
                qs = parse_qs(parsed.query)
                full = qs.get("full", ["0"])[-1] in ("1", "true")
                cap = None if full else limit_per_tag
                order = ("recent"
                         if qs.get("order", ["stable"])[-1] == "recent"
                         else "stable")
                body = json.dumps(
                    mirror_json(out_dir, limit_per_tag=cap, order=order),
                    sort_keys=True, default=str)
            else:
                self.send_error(404)
                return
            data = body.encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)


def read_sink(out_dir: str, sink: str, ordered: bool = True,
              conv_bucket: int | None = None,
              time_slice: str | None = None):
    """Dataset over one sink's routed output across all shards.

    ``ordered=True`` re-establishes the stable (conv_id, turn_idx)
    global order (files hold per-shard sorted runs; a cross-shard
    consumer re-sorts — cheap because runs are pre-sorted).

    ``conv_bucket=k`` (output written with
    ``run_pipeline(conv_buckets=N)``) reads ONLY that conversation
    bucket's files across all shards — the prune-at-the-read path for
    conversation-keyed consumers: a bucket holds every turn of its
    conversations, so per-conv work on it needs no shuffle.

    ``time_slice='YYYY-MM-DD[-HH]'`` (output written with
    ``run_pipeline(time_partition=...)``) reads only that event-time
    slice's directories — the time-ranged prune. Composes with
    ``conv_bucket`` (slice nests inside the bucket).
    """
    import glob as _glob

    import ray.data as rd

    from fluent_server_ray.pipelines.flagship import _is_live_sink_path
    from fluent_server_ray.state.lineage import load_manifests

    # a pruning pin against a layout that was never written would glob
    # nothing and read as 'legitimately empty' — validate the pin
    # against the lineage layout contract instead (review finding)
    if conv_bucket is not None or time_slice is not None:
        manifests = load_manifests(out_dir)
        if manifests:
            n_b = manifests[0].get("conv_buckets")
            t_p = manifests[0].get("time_partition")
            if conv_bucket is not None:
                if not n_b:
                    raise ValueError(
                        f"read_sink(conv_bucket=...) on {out_dir!r}, "
                        "which was not written with conv_buckets=")
                if not 0 <= conv_bucket < n_b:
                    raise ValueError(
                        f"conv_bucket {conv_bucket} out of range "
                        f"[0, {n_b})")
            if time_slice is not None:
                if not t_p:
                    raise ValueError(
                        f"read_sink(time_slice=...) on {out_dir!r}, "
                        "which was not written with time_partition=")
                want_len = 10 if t_p == "day" else 13
                if time_slice != "unknown" \
                        and len(time_slice) != want_len:
                    raise ValueError(
                        f"time_slice {time_slice!r} does not match the "
                        f"run's granularity ({t_p!r})")

    sinks_root = os.path.join(out_dir, "sinks")
    # the glob prunes on every layout key the caller pins; unpinned
    # levels stay wildcards ('**' tolerates both flat and nested
    # layouts, including the tslice level under a cbucket)
    parts = [p for p in
             (f"cbucket={conv_bucket}" if conv_bucket is not None else None,
              f"tslice={time_slice}" if time_slice is not None else None)
             if p]
    # consecutive '**/**' makes Python's glob emit DUPLICATE paths —
    # collapse to one '**' when nothing is pinned, and set-dedupe
    # regardless (a double-read would silently double counts)
    sub = os.path.join(*(["**"] + parts + ["**"])) if parts else "**"
    files = sorted({
        f for f in _glob.glob(
            os.path.join(sinks_root, "*", f"sink={sink}", sub,
                         "*.parquet"),
            recursive=True,
        )
        # a crashed compaction's *.old / *.compacting remnants must
        # never double-read; repair_compaction clears them, this
        # filter makes readers safe even before it runs
        if _is_live_sink_path(f, sinks_root)
    })
    if not files and (conv_bucket is not None or time_slice is not None):
        # a sparse bucket / empty slice is a legitimate empty result
        # (small corpora leave hash buckets unpopulated; a quiet day
        # has no rows) — return a TYPED empty Dataset using a sibling
        # file's schema, not an error. Live-filtered: a compaction
        # remnant could be truncated mid-write (review finding).
        siblings = sorted(
            f for f in _glob.glob(
                os.path.join(sinks_root, "*", f"sink={sink}", "**",
                             "*.parquet"),
                recursive=True,
            )
            if _is_live_sink_path(f, sinks_root)
        )
        if siblings:
            sch = pq.read_schema(siblings[0])
            return rd.from_arrow(sch.empty_table())
    if not files:
        raise FileNotFoundError(f"no output for sink {sink!r} under {out_dir}")
    ds = rd.read_parquet(files)
    if ordered and "conv_id" in ds.schema().names:
        import pyarrow as pa
        import pyarrow.compute as pc

        def add_key(t: pa.Table) -> pa.Table:
            return t.append_column("_ck", pc.fill_null(t["conv_id"], ""))

        ds = ds.map_batches(add_key, batch_format="pyarrow",
                            zero_copy_batch=True)
        ds = ds.sort(["_ck", "turn_idx"]).drop_columns(["_ck"])
    return ds
