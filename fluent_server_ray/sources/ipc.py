"""Arrow IPC (Feather v2) source/sink — the third interchange sibling
beside :mod:`sources.jsonl` and :mod:`sources.csvsrc`.

IPC is the format for engine-to-engine handoff (Arrow Flight payloads,
inter-process spills, feature-store drops): schema-complete and
BIT-EXACT — timestamps keep their unit, doubles and nested types
round-trip losslessly, nothing renders through text. Where CSV/JSONL
trade fidelity for ubiquity, IPC is the no-loss lane.

- :func:`write_ipc_dir` — sharded ``*.arrow`` files, one per block
  (Ray's native sharding; resumable consumers list shards
  independently);
- :func:`read_ipc_dir` — ``ray.data.read_binary_files`` over the
  layout + a zero-copy per-file IPC decode inside ``map_batches``.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa


def write_ipc_dir(ds, out_dir: str):
    """Write a Dataset as sharded Arrow IPC files under ``out_dir``.

    One file per block, content-addressed name (uuid) — blocks write
    concurrently from workers with no coordination. The write is
    driven by consuming a bounded manifest (one row per block), never
    by materializing data on the driver."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        path = os.path.join(out_dir, f"block-{uuid.uuid4().hex}.arrow")
        with pa.OSFile(path, "wb") as f:
            with pa.ipc.new_file(f, t.schema) as w:
                w.write_table(t)
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([len(t)], pa.int64())})

    # consume the manifest (≤ one row per block) to force the writes
    for _ in ds.map_batches(write_block, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_size=None, batch_format="pyarrow"):
        pass
    return out_dir


def read_ipc_dir(path: str, ts_cols: tuple[str, ...] = ()):
    """Read an Arrow IPC directory into a Dataset.

    Each binary file decodes to its table inside the batch transform
    (``pa.ipc.open_file`` over a buffer — zero-copy to Arrow arrays);
    ``ts_cols`` is accepted for interface parity with the CSV/JSONL
    readers but IPC needs no re-casting (the schema travels)."""
    import ray.data as rd

    ds = rd.read_binary_files(path)

    def decode(t: pa.Table) -> pa.Table:
        tables = [
            pa.ipc.open_file(pa.BufferReader(b.as_py())).read_all()
            for b in t["bytes"]
        ]
        return pa.concat_tables(tables)

    return ds.map_batches(decode, batch_format="pyarrow",
                          zero_copy_batch=True)
