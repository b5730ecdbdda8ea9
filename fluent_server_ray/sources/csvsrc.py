"""CSV source/sink — the sibling of :mod:`sources.jsonl`.

CSV is the other ubiquitous interchange format a log-pipeline engine
meets (spreadsheet drops, DB exports, legacy ETL). Ray's CSV path is
Arrow-native on both sides (``pyarrow.csv`` writer/reader), so floats
round-trip at full shortest-repr precision and timestamps render
ISO-8601 — unlike the pandas-backed JSON path, nothing here is lossy.

- :func:`write_csv_dir` — sharded ``*.csv`` files, one per block;
- :func:`read_csv_dir` — ``ray.data.read_csv`` over the layout, with
  optional timestamp re-casting for columns a lenient inferrer may
  have read as strings.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def write_csv_dir(ds, out_dir: str):
    """Write a Dataset as sharded CSV files under ``out_dir``."""
    ds.write_csv(out_dir)
    return out_dir


def read_csv_dir(path: str, ts_cols: tuple[str, ...] = ()):
    """Read a CSV directory/file into a Dataset; re-cast the named
    ``ts_cols`` to ``timestamp[us]`` if inference left them strings."""
    import ray.data as rd

    ds = rd.read_csv(path)
    if not ts_cols:
        return ds

    def recast(t: pa.Table) -> pa.Table:
        for c in ts_cols:
            if c in t.column_names:
                t = t.set_column(
                    t.column_names.index(c), c,
                    pc.cast(t[c], pa.timestamp("us")))
        return t

    return ds.map_batches(recast, batch_format="pyarrow",
                          zero_copy_batch=True)
