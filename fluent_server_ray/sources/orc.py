"""Apache ORC source/sink — the columnar-interchange sibling of
:mod:`sources.ipc` for Hive/Trino-shaped lakes.

ORC is the hand-off format when the downstream is a Hive-era
warehouse: column-stride compressed, predicate-pushdown-indexed, and
(for the flat numeric/string schemas this engine exchanges) lossless —
int64/double/string columns round-trip bit-exact. Same sharded layout
and zero-driver-materialization contract as the IPC lane:

- :func:`write_orc_dir` — sharded ``*.orc`` files, one per block,
  content-addressed names so blocks write concurrently with no
  coordination;
- :func:`read_orc_dir` — ``ray.data.read_binary_files`` over the
  layout + a per-file ORC decode inside ``map_batches``.

NOTE on timestamps: ORC stores timestamps at nanosecond precision
without a unit marker; ``pyarrow.orc`` reads them back as ``ns``.
``read_orc_dir(ts_cols=...)`` re-casts the named columns to ``us`` so
the round-trip matches the house parquet schema (cast is exact —
values originate at ``us``).
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa


def write_orc_dir(ds, out_dir: str):
    """Write a Dataset as sharded ORC files under ``out_dir``.

    One file per block; the write is driven by consuming a bounded
    manifest (one row per block), never by materializing data on the
    driver."""
    import pyarrow.orc as orc

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        path = os.path.join(out_dir, f"block-{uuid.uuid4().hex}.orc")
        orc.write_table(t, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([len(t)], pa.int64())})

    for _ in ds.map_batches(write_block, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_size=None, batch_format="pyarrow"):
        pass
    return out_dir


def read_orc_dir(path: str, ts_cols: tuple[str, ...] = ()):
    """Read an ORC directory into a Dataset.

    Each binary file decodes inside the batch transform
    (``pyarrow.orc.ORCFile`` over a buffer); ``ts_cols`` re-cast to
    ``timestamp[us]`` (ORC reads back as ns — see module note)."""
    import ray.data as rd

    ds = rd.read_binary_files(path)

    def decode(t: pa.Table) -> pa.Table:
        import pyarrow.orc as orc

        tables = [
            orc.ORCFile(pa.BufferReader(b.as_py())).read()
            for b in t["bytes"]
        ]
        out = pa.concat_tables(tables)
        for c in ts_cols:
            if c in out.column_names:
                i = out.column_names.index(c)
                out = out.set_column(
                    i, c, out[c].cast(pa.timestamp("us")))
        return out

    return ds.map_batches(decode, batch_format="pyarrow",
                          zero_copy_batch=True)
