"""Poison-row isolation for per-batch UDFs.

At 100 TB some row WILL break a transform (malformed unicode, a
pathological regex input, an unparseable payload). Ray's default is
brutal: the task raises, retries re-raise deterministically, the whole
pipeline dies. The reference's wire loop has the same concern and
answers it with per-frame rejects (``fluentfmt`` invalid-frame sinks);
this is the generic batch-UDF version: run the transform, and when a
batch raises, BISECT it to isolate the exact poison rows — good rows
still produce output, poison rows land in a quarantine with the error
string, and the pipeline keeps streaming.

Cost model: a clean batch pays one extra null column; a batch with k
poison rows pays O(k·log B) extra UDF invocations (binary search),
never O(B).
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc


def quarantined_map(ds, fn: Callable[[pa.Table], pa.Table],
                    out_schema: pa.Schema, id_col: str):
    """Apply ``fn`` per batch with poison-row isolation.

    ``fn`` must be row-aligned for slicing to be meaningful (its
    output rows correspond to its input rows; aggregating UDFs don't
    bisect sensibly) and must carry ``id_col`` through. ``out_schema``
    declares fn's output (needed to emit typed quarantine rows when a
    whole batch is poison). Returns ONE Dataset with ``out_schema``
    plus ``_err`` (string, null = clean); split it with
    :func:`good_rows` / :func:`quarantined_rows`.
    """

    names = list(out_schema.names)

    def ok(t: pa.Table) -> pa.Table:
        t = t.select(names).cast(out_schema)
        return t.append_column("_err", pa.nulls(t.num_rows, pa.string()))

    def bad(rows: pa.Table, err: Exception) -> pa.Table:
        cols = {}
        for f in out_schema:
            if f.name == id_col and id_col in rows.column_names:
                cols[f.name] = pc.cast(rows[id_col], f.type)
            else:
                cols[f.name] = pa.nulls(rows.num_rows, f.type)
        cols["_err"] = pa.array(
            [f"{type(err).__name__}: {err}"] * rows.num_rows, pa.string())
        return pa.table(cols)

    def wrapper(t: pa.Table) -> pa.Table:
        try:
            return ok(fn(t))
        except Exception:
            pass
        out: list[pa.Table] = []
        stack = [t]
        while stack:
            part = stack.pop()
            try:
                out.append(ok(fn(part)))
            except Exception as e:
                if part.num_rows <= 1:
                    out.append(bad(part, e))
                else:
                    half = part.num_rows // 2
                    stack.append(part.slice(0, half))
                    stack.append(part.slice(half))
        return pa.concat_tables(out)

    return ds.map_batches(wrapper, batch_format="pyarrow",
                          zero_copy_batch=True)


def good_rows(ds):
    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["_err"])).drop_columns(["_err"])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def quarantined_rows(ds, id_col: str):
    def f(t: pa.Table) -> pa.Table:
        q = t.filter(pc.is_valid(t["_err"]))
        return q.select([id_col, "_err"])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
