"""Per-partition lineage records + checkpoint manifests.

The Ray-native equivalent of the reference's chunk-ack protocol
(reference ``message/mode.go:56-68``: ack a chunk id only AFTER the
handler has fully processed it; clients replay unacked chunks —
at-least-once delivery). Here:

- a **shard** (one input file / partition) is the chunk;
- its sink output is written to a deterministic, shard-addressed
  directory via write-to-temp + atomic rename (idempotent overwrite —
  a replayed shard cannot duplicate rows);
- only after the rename does the shard's lineage record
  ``{shard_id, input_file, row_count, per_sink_counts}`` get committed
  to ``_lineage/<shard_id>.json`` (≙ emitting the ack,
  reference ``message/ack.go:5-20``);
- resume lists committed ids and skips them (≙ the client not
  re-sending acked chunks), so a killed run restarts without
  reprocessing or duplicating.
"""

from __future__ import annotations

import json
import os


def _lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def commit_shard(out_dir: str, shard_id: str, record: dict) -> str:
    """Atomically commit a shard's lineage record (the 'ack')."""
    d = _lineage_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{shard_id}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"shard_id": shard_id, **record}, f, sort_keys=True)
    os.replace(tmp, path)  # atomic on POSIX
    return path


def committed_shards(out_dir: str) -> set[str]:
    d = _lineage_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    return {
        f[: -len(".json")]
        for f in os.listdir(d)
        if f.endswith(".json") and not f.endswith(".tmp")
    }


def load_manifests(out_dir: str) -> list[dict]:
    d = _lineage_dir(out_dir)
    out = []
    if not os.path.isdir(d):
        return out
    for f in sorted(os.listdir(d)):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                out.append(json.load(fh))
    return out


def summarize_manifests(out_dir: str) -> dict:
    """Merge all shard manifests into the run summary (driver-side,
    O(shards)) — the single source both pipelines' ``summary.json``
    derives from, so the merge rule cannot drift between them."""
    manifests = load_manifests(out_dir)
    totals: dict[str, int] = {}
    for m in manifests:
        for sink, n in m["per_sink_counts"].items():
            totals[sink] = totals.get(sink, 0) + n
    return {
        "sinks": totals,
        "rows": sum(m["row_count"] for m in manifests),
        "shards": len(manifests),
    }
