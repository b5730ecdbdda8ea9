"""JSON-Lines source/sink.

Parquet is the warehouse format, but a log-pipeline engine also meets
newline-delimited JSON everywhere (fluentd's own out_file default,
CloudWatch/S3 exports, training-data drops). This module gives the
engine a real JSONL path on both sides:

- :func:`write_jsonl` — a Ray ``write_json`` wrapper that emits
  sharded ``*.jsonl`` files (one JSON object per line, one file per
  block) under a directory, scale-out friendly (no single giant file);
- :func:`read_jsonl` — ``ray.data.read_json`` over that layout.

Timestamps survive the round-trip as ISO-8601 strings (JSON has no
timestamp type); :func:`read_jsonl` can re-cast declared columns back
to ``timestamp[us]`` so downstream stages see the same schema they
would from parquet.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def write_jsonl(ds, out_dir: str):
    """Write a Dataset as sharded JSON-Lines files under ``out_dir``.

    One file per block (Ray's native sharding) — resumable consumers
    can list and process shards independently.

    Fidelity: timestamps render ISO-8601 at microsecond precision
    (Ray's default is LOSSY epoch seconds); doubles render at 15
    significant digits — the pandas ``to_json`` ceiling, one ULP short
    of float64 round-trip in the worst case. Bit-exact float transport
    stays parquet's job."""
    ds.write_json(out_dir, date_format="iso", date_unit="us",
                  double_precision=15)
    return out_dir


def read_jsonl(path: str, ts_cols: tuple[str, ...] = ()):
    """Read a JSONL directory/file into a Dataset; re-cast the named
    ``ts_cols`` (ISO-8601 strings after the JSON round-trip) back to
    ``timestamp[us]``."""
    import ray.data as rd

    ds = rd.read_json(path)
    if not ts_cols:
        return ds

    def recast(t: pa.Table) -> pa.Table:
        for c in ts_cols:
            if c in t.column_names and not pa.types.is_timestamp(
                    t.schema.field(c).type):
                t = t.set_column(
                    t.column_names.index(c), c,
                    pc.cast(t[c], pa.timestamp("us")))
        return t

    return ds.map_batches(recast, batch_format="pyarrow",
                          zero_copy_batch=True)
