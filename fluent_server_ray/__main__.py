"""CLI: the standalone-engine surface (≙ the reference's server binary,
``main.go`` configured via env/flags).

    python -m fluent_server_ray run      --input DIR --out DIR [--routes CFG] [--resume]
    python -m fluent_server_ray forward  --frames GLOB --out DIR [--routes CFG]
    python -m fluent_server_ray mirror   --out DIR [--serve PORT]  # print or serve the view
    python -m fluent_server_ray counts   --out DIR           # per-sink totals from lineage
    python -m fluent_server_ray udp-echo [--port N]          # health-check echo (S3)
    python -m fluent_server_ray index build|dedup|compact --index DIR [--input PQ] [--out DIR]

Owns its Ray session (guarded init) — library code never calls
``ray.init``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _init_kwargs(env=os.environ) -> dict:
    """Session kwargs for the CLI's Ray init. Under ``ray job submit``
    (RAY_JOB_ID set) or with an explicit cluster RAY_ADDRESS, JOIN the
    hosting cluster — a driver that silently starts a private
    single-node Ray inside a job would run the whole pipeline on one
    node. Standalone (the default here), start a local session sized
    by RAY_GRAFT_CPUS."""
    if env.get("RAY_JOB_ID") or env.get("RAY_ADDRESS", "local") not in (
            "", "local"):
        return {"address": "auto"}
    return {
        "address": "local",
        "num_cpus": int(env.get("RAY_GRAFT_CPUS", "32")),
        "include_dashboard": False,
    }


def _ray_up():
    import ray

    if not ray.is_initialized():
        ray.init(logging_level="ERROR", **_init_kwargs())
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="fluent_server_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="transcripts parquet → routed sinks")
    run.add_argument("--input", required=True)
    run.add_argument("--out", required=True)
    run.add_argument("--routes", help="routes config (.json or fluent-bit .cfg)")
    run.add_argument("--shard-group-size", type=int, default=1)
    run.add_argument("--conv-buckets", type=int, default=None,
                     help="also partition sinks by hash(conv_id) %% N "
                          "(co-locates conversations for downstream "
                          "per-conv consumers)")
    run.add_argument("--time-partition", choices=["day", "hour"],
                     default=None,
                     help="also slice sinks by event time "
                          "(tslice=YYYY-MM-DD[-HH] hive dirs — "
                          "fluentd's time-sliced output convention)")

    fwd = sub.add_parser("forward", help="msgpack forward frames → routed sinks")
    fwd.add_argument("--frames", required=True, help="glob of frame files")
    fwd.add_argument("--out", required=True)
    fwd.add_argument("--routes")

    mir = sub.add_parser("mirror", help="print (or serve) the mirror JSON view")
    mir.add_argument("--out", required=True)
    mir.add_argument("--serve", type=int, metavar="PORT",
                     help="serve the view over HTTP instead of printing "
                          "(GET / = grouped store, GET /counts = totals)")

    cnt = sub.add_parser("counts", help="per-sink totals from lineage")
    cnt.add_argument("--out", required=True)

    udp = sub.add_parser("udp-echo", help="UDP heartbeat echo (health check)")
    udp.add_argument("--port", type=int, default=0)

    idx = sub.add_parser(
        "index",
        help="persisted dedup index: build/extend, dedup a shard "
             "against it, or compact it",
    )
    idx.add_argument("action", choices=["build", "dedup", "compact"])
    idx.add_argument("--index", required=True, help="index directory")
    idx.add_argument("--input", help="documents parquet (build/dedup)")
    idx.add_argument("--out", help="survivor parquet dir (dedup)")
    idx.add_argument("--n-parts", type=int, default=64)
    idx.add_argument("--id-col", default="doc_id")
    idx.add_argument("--text-col", default="text")

    dele = sub.add_parser(
        "delete",
        help="right-to-be-forgotten: scrub conversations from a "
             "committed run's sinks and reconcile lineage counts",
    )
    dele.add_argument("--out", required=True, help="run output dir")
    dele.add_argument("--conv", required=True, nargs="+",
                      help="conversation ids to remove")

    sft = sub.add_parser(
        "export-sft",
        help="write SFT JSONL shards (document text + loss-mask spans)",
    )
    sft.add_argument("--input", required=True)
    sft.add_argument("--out", required=True)

    args = p.parse_args(argv)

    routes = None
    if getattr(args, "routes", None):
        from fluent_server_ray.config import load_routes

        routes = load_routes(args.routes)

    if args.cmd == "run":
        ray = _ray_up()
        from fluent_server_ray.pipelines.flagship import run_pipeline

        summary = run_pipeline(
            args.input, args.out, routes=routes,
            shard_group_size=args.shard_group_size,
            conv_buckets=args.conv_buckets,
            time_partition=args.time_partition,
        )
        print(json.dumps(summary, sort_keys=True))
        ray.shutdown()
    elif args.cmd == "forward":
        ray = _ray_up()
        from fluent_server_ray.pipelines.forward_pipeline import run_forward_pipeline

        files = sorted(glob.glob(args.frames))
        if not files:
            print(f"no files match {args.frames!r}", file=sys.stderr)
            return 2
        summary = run_forward_pipeline(files, args.out, routes=routes)
        print(json.dumps(summary, sort_keys=True))
        ray.shutdown()
    elif args.cmd == "mirror":
        if args.serve is not None:
            from fluent_server_ray.pipelines.mirror_view import serve_mirror

            srv = serve_mirror(args.out, port=args.serve)
            print(f"mirror on http://{srv.server_address[0]}:"
                  f"{srv.server_address[1]}/ (Ctrl-C to stop)",
                  file=sys.stderr)
            try:
                srv.serve_forever()
            except KeyboardInterrupt:
                pass
            finally:
                srv.server_close()
        else:
            from fluent_server_ray.pipelines.mirror_view import mirror_json

            print(json.dumps(mirror_json(args.out), sort_keys=True,
                             default=str))
    elif args.cmd == "counts":
        from fluent_server_ray.pipelines.mirror_view import mirror_counts

        print(json.dumps(mirror_counts(args.out), sort_keys=True))
    elif args.cmd == "index":
        ray = _ray_up()
        from fluent_server_ray.sources.pq import read_parquet_clean
        from fluent_server_ray.stages.dedup import (build_text_index,
                                                    compact_text_index,
                                                    dedup_against_index)

        if args.action == "build":
            if not args.input:
                print("index build requires --input", file=sys.stderr)
                return 2
            build_text_index(
                read_parquet_clean(args.input,
                                   columns=[args.id_col, args.text_col]),
                args.index, text_col=args.text_col, n_parts=args.n_parts,
            )
            print(json.dumps({"index": args.index, "built": True}))
        elif args.action == "dedup":
            if not (args.input and args.out):
                print("index dedup requires --input and --out",
                      file=sys.stderr)
                return 2
            survivors = dedup_against_index(
                read_parquet_clean(args.input,
                                   columns=[args.id_col, args.text_col]),
                args.index, id_col=args.id_col, text_col=args.text_col,
                n_parts=args.n_parts,
            )
            survivors = survivors.materialize()
            survivors.write_parquet(args.out)
            # survivors extend the index so the NEXT shard dedups
            # against this one too (the invariant build_text_index
            # documents)
            build_text_index(survivors, args.index,
                             text_col=args.text_col, n_parts=args.n_parts)
            print(json.dumps({"survivors": survivors.count(),
                              "out": args.out}))
        else:  # compact
            n_rows, n_before, n_after = compact_text_index(
                args.index, text_col=args.text_col, n_parts=args.n_parts
            )
            print(json.dumps({"rows": n_rows, "files_before": n_before,
                              "files_after": n_after}))
        ray.shutdown()
    elif args.cmd == "delete":
        ray = _ray_up()
        from fluent_server_ray.pipelines.flagship import delete_convs

        print(json.dumps(delete_convs(args.out, args.conv),
                         sort_keys=True))
        ray.shutdown()
    elif args.cmd == "export-sft":
        ray = _ray_up()
        from fluent_server_ray.pipelines.curation import export_sft_jsonl

        out, n = export_sft_jsonl(args.input, args.out)
        print(json.dumps({"out": out, "docs": n}))
        ray.shutdown()
    elif args.cmd == "udp-echo":
        import time

        from fluent_server_ray.functions.udp_echo import serve_udp_echo

        sock, stop, _ = serve_udp_echo(port=args.port)
        print(f"udp echo on {sock.getsockname()[0]}:{sock.getsockname()[1]}"
              " (Ctrl-C to stop)", file=sys.stderr)
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
