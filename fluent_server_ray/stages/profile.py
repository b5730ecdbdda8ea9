"""Dataset profiling: one-pass column statistics over any table —
the "what is actually in this feed" audit a pipeline runs before
trusting a new source (rows, null rates, exact distinct cardinality,
typed min/max per column). The reference validates only frame SHAPE
(``message/session.go:139-147``); content-level profiling is the
batch-world extension of that admission gate, and the diagnostic
sibling of :mod:`fluent_server_ray.stages.diff` (diff compares two
pipeline versions; profile characterizes one input).

Distributed shape:

- scalar pass: every block collapses to ONE partial row (n_rows +
  per-column null counts and typed min/max) — the driver merges a
  #blocks-bounded table, the corpus never moves;
- distinct pass: per-block LOCAL dedup of (col, rendered value)
  pairs, then :func:`aggregate.grouped_distinct_count`'s value-hash
  exchange — only distinct pairs shuffle (|cols| x |distinct|, not
  rows x cols).

Exactness contract: min/max never pass through float arithmetic —
ints stay int64, floats are IEEE min/max (NaN input raises: DuckDB
orders NaN above +inf so ``max`` would diverge from skipna engines),
timestamps become exact epoch micros; the single int->double render
at the end is guarded at 2^53. ``+ 0.0`` on both sides normalizes a
-0.0 min/max so the two engines print one spelling. Distinctness of
floats uses Arrow's shortest-round-trip rendering, which is injective
(two distinct doubles never render equal), so ``count(DISTINCT c)``
in the mirror sees the same cardinality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_INT_KINDS = {pa.int8(), pa.int16(), pa.int32(), pa.int64(),
              pa.uint8(), pa.uint16(), pa.uint32()}

F64_EXACT = 2 ** 53


def _classify(t: pa.DataType) -> str:
    if t in _INT_KINDS:
        return "int"
    if t in (pa.float32(), pa.float64()):
        return "float"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if t in (pa.string(), pa.large_string()):
        return "str"
    raise ValueError(f"profile_table: unsupported column type {t} "
                     "(project list/binary columns out first)")


def _canon_num(col: pa.ChunkedArray, kind: str) -> pa.ChunkedArray:
    """Canonical comparable form: int64 for ints/timestamps (exact),
    float64 for floats. Raises on NaN (see module docstring)."""
    if kind == "int":
        return pc.cast(col, pa.int64())
    if kind == "timestamp":
        return col.cast(pa.int64())  # epoch micros
    f = pc.cast(col, pa.float64())
    if pc.any(pc.is_nan(f)).as_py():
        raise ValueError(
            "profile_table: NaN in a float column — DuckDB min/max "
            "order NaN above +inf (skipna engines diverge); filter "
            "NaNs first")
    return f


def profile_table(ds, columns: list[str] | None = None) -> pa.Table:
    """Profile ``ds``: one output row per column —
    ``(col, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    max_str)`` sorted by column name. Numeric/timestamp columns fill
    ``min_num``/``max_num`` (timestamps as epoch micros); string
    columns fill ``min_str``/``max_str`` (bytewise order — DuckDB's
    default VARCHAR collation); the other pair is NULL.
    """
    from fluent_server_ray.stages.aggregate import grouped_distinct_count

    from fluent_server_ray.stages.joins import arrow_schema

    sch = arrow_schema(ds, static=True)
    if sch is None:
        raise ValueError("profile_table: dataset schema unavailable — "
                         "materialize or read with a declared schema")
    if columns is None:
        columns = list(sch.names)
    # arrow_schema returns the Ray Schema wrapper: names/types lists
    type_of = dict(zip(sch.names, sch.types))
    kinds = {c: _classify(type_of[c]) for c in columns}
    ds = ds.select_columns(columns)

    def scalar_partial(t: pa.Table) -> pa.Table:
        row: dict[str, pa.Array] = {
            "n_rows": pa.array([t.num_rows], pa.int64())}
        for i, c in enumerate(columns):
            col = t[c]
            row[f"nulls_{i}"] = pa.array([col.null_count], pa.int64())
            valid = col.drop_null()
            if kinds[c] == "str":
                typ, mn, mx = pa.string(), None, None
                if len(valid):
                    mm = pc.min_max(valid)
                    mn, mx = mm["min"].as_py(), mm["max"].as_py()
            else:
                canon = _canon_num(valid, kinds[c])
                typ = canon.type
                mn = mx = None
                if len(canon):
                    mm = pc.min_max(canon)
                    mn, mx = mm["min"].as_py(), mm["max"].as_py()
            row[f"min_{i}"] = pa.array([mn], typ)
            row[f"max_{i}"] = pa.array([mx], typ)
        return pa.table(row)

    # bounded: one partial row per block reaches the driver
    parts = pa.concat_tables(
        ds.map_batches(scalar_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))

    def render_long(t: pa.Table) -> pa.Table:
        outs = []
        for c in columns:
            valid = t[c].drop_null()
            if kinds[c] == "str":
                v = valid.combine_chunks()
            else:
                canon = _canon_num(valid, kinds[c])
                if kinds[c] == "float":
                    # -0.0 -> 0.0 before rendering: SQL DISTINCT
                    # treats them equal, two strings would not
                    canon = pc.add(canon, 0.0)
                v = pc.cast(canon, pa.string())
            # local dedup (the combiner) before the value exchange
            sub = pa.table({"col": pa.array([c] * len(v), pa.string()),
                            "v": v}).group_by(["col", "v"]).aggregate([])
            outs.append(sub)
        return pa.concat_tables(outs)

    nd = grouped_distinct_count(
        ds.map_batches(render_long, batch_format="pyarrow",
                       zero_copy_batch=True),
        "col", "v", final="driver")
    nd_map = {r["col"]: int(r["n_distinct"])
              for r in nd.to_pylist()}

    n_rows = int(pc.sum(parts["n_rows"]).as_py() or 0)
    out = {"col": [], "n_rows": [], "n_nulls": [], "n_distinct": [],
           "min_num": [], "max_num": [], "min_str": [], "max_str": []}
    col_idx = {c: i for i, c in enumerate(columns)}
    for c in sorted(columns):
        i = col_idx[c]
        out["col"].append(c)
        out["n_rows"].append(n_rows)
        out["n_nulls"].append(
            int(pc.sum(parts[f"nulls_{i}"]).as_py() or 0))
        out["n_distinct"].append(nd_map.get(c, 0))
        mn_col = parts[f"min_{i}"].drop_null()
        mx_col = parts[f"max_{i}"].drop_null()
        mn = pc.min(mn_col).as_py() if len(mn_col) else None
        mx = pc.max(mx_col).as_py() if len(mx_col) else None
        if kinds[c] == "str":
            out["min_num"].append(None)
            out["max_num"].append(None)
            out["min_str"].append(mn)
            out["max_str"].append(mx)
        else:
            for v in (mn, mx):
                if (kinds[c] != "float" and v is not None
                        and abs(int(v)) >= F64_EXACT):
                    raise ValueError(
                        "profile_table: min/max exceeds the "
                        "float64-exact range")
            # + 0.0 normalizes a -0.0 extremum (mirror does the same)
            out["min_num"].append(
                None if mn is None else float(mn) + 0.0)
            out["max_num"].append(
                None if mx is None else float(mx) + 0.0)
            out["min_str"].append(None)
            out["max_str"].append(None)
    return pa.table({
        "col": pa.array(out["col"], pa.string()),
        "n_rows": pa.array(out["n_rows"], pa.int64()),
        "n_nulls": pa.array(out["n_nulls"], pa.int64()),
        "n_distinct": pa.array(out["n_distinct"], pa.int64()),
        "min_num": pa.array(out["min_num"], pa.float64()),
        "max_num": pa.array(out["max_num"], pa.float64()),
        "min_str": pa.array(out["min_str"], pa.string()),
        "max_str": pa.array(out["max_str"], pa.string()),
    })


def profile_table_sql(kinds: dict[str, str], table: str) -> str:
    """Mirror: one UNION ALL branch per column. ``kinds`` maps column
    name -> 'int' | 'float' | 'timestamp' | 'str' (the caller declares
    what :func:`profile_table` inferred from the Arrow schema)."""
    branches = []
    for c in sorted(kinds):
        k = kinds[c]
        if k == "str":
            mins = (f"CAST(NULL AS DOUBLE) AS min_num, "
                    f"CAST(NULL AS DOUBLE) AS max_num, "
                    f"min({c}) AS min_str, max({c}) AS max_str")
        elif k == "timestamp":
            mins = (f"CAST(epoch_us(min({c})) AS DOUBLE) + 0.0 AS min_num, "
                    f"CAST(epoch_us(max({c})) AS DOUBLE) + 0.0 AS max_num, "
                    f"CAST(NULL AS VARCHAR) AS min_str, "
                    f"CAST(NULL AS VARCHAR) AS max_str")
        else:
            mins = (f"CAST(min({c}) AS DOUBLE) + 0.0 AS min_num, "
                    f"CAST(max({c}) AS DOUBLE) + 0.0 AS max_num, "
                    f"CAST(NULL AS VARCHAR) AS min_str, "
                    f"CAST(NULL AS VARCHAR) AS max_str")
        branches.append(f"""
  SELECT '{c}' AS col, CAST(count(*) AS BIGINT) AS n_rows,
    CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
    CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
    {mins}
  FROM {table}""".rstrip())
    return ("SELECT * FROM (" + "\n  UNION ALL".join(branches)
            + "\n) ORDER BY col")
