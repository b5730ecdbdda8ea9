"""Schema-stable per-bucket grouping: a ``map_groups`` replacement.

Ray's ``groupby(key).map_groups(fn)`` is sort + ``map_batches`` with
one batch per block — but a sort partition that received no rows makes
the task yield NOTHING, and the executor then emits a block with an
EMPTY schema (``PandasBlockSchema(names=[], types=[])``), producing
"RefBundle with a different schema" warnings and, worse, letting a
pandas UDF's all-NaN columns surface as Arrow ``null``-typed columns
that crash downstream kernels (``fill_null`` on ``null`` type).

:func:`map_buckets` keeps the identical plan (one sort shuffle on the
bucket column, group slices fed to the UDF) but pins ONE Arrow output
schema: every task output — including empty partitions — is coerced to
it, so block schemas never flip and fill-side columns keep their
declared types at any bucket occupancy. This is the substrate for the
bucketed join / distinct / pair operators (joins.py, dedup.py, ...).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa


def coerce_table(out, schema: pa.Schema) -> pa.Table:
    """Coerce a UDF output (pandas DataFrame or Arrow Table) to exactly
    ``schema`` — column subset/order, declared types, no pandas
    metadata. NaN in numeric columns becomes null (never a fabricated
    value: the bool-fill hazard of ``.astype(bool)`` on object columns
    cannot occur because conversion targets the declared Arrow type
    directly)."""
    if isinstance(out, pa.Table):
        if out.schema == schema:
            return out
        arrays = [
            out[f.name].cast(f.type)
            if not out[f.name].type.equals(f.type)
            else out[f.name]
            for f in schema
        ]
        return pa.Table.from_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in arrays],
            schema=schema,
        )
    arrays = []
    for f in schema:
        col = out[f.name]
        try:
            arrays.append(pa.array(col, type=f.type, from_pandas=True))
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # e.g. float64 NaN column targeted at int64: go through
            # float64 (NaN -> null) then cast
            tmp = pa.array(col, type=pa.float64(), from_pandas=True)
            arrays.append(tmp.cast(f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def map_buckets(
    ds,
    fn: Callable,
    out_schema: pa.Schema,
    key: str = "_bucket",
    batch_format: str = "pandas",
):
    """Apply ``fn`` once per distinct value of integer column ``key``
    (one sort shuffle co-locates each bucket), with every output block
    coerced to ``out_schema`` — Ray ``map_groups`` semantics, schema-
    stable output.

    ``fn`` receives the bucket's rows as a pandas DataFrame
    (``batch_format='pandas'``) or Arrow Table (``'pyarrow'``) and
    returns either; the coercion drops any extra columns (the bucket
    key itself need not be removed by ``fn``)."""
    empty = out_schema.empty_table()

    def apply(t: pa.Table):
        if t.num_rows == 0:
            yield empty
            return
        col = t[key].to_numpy(zero_copy_only=False)
        cuts = np.flatnonzero(col[1:] != col[:-1]) + 1
        starts = np.concatenate(([0], cuts))
        ends = np.concatenate((cuts, [len(col)]))
        for s, e in zip(starts, ends):
            g = t.slice(s, int(e - s))
            if batch_format == "pandas":
                g = g.to_pandas()
            yield coerce_table(fn(g), out_schema)

    return ds.sort(key).map_batches(
        apply, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def ray_schema_types(ds, names: list[str]) -> dict[str, pa.DataType]:
    """Arrow types for ``names`` from a Ray ``Dataset.schema()`` —
    normalizing the pandas-backed case where ``schema().types`` holds
    numpy dtypes / python classes instead of Arrow DataTypes (object →
    string, matching Arrow's conversion of text columns)."""
    sch = ds.schema()
    out: dict[str, pa.DataType] = {}
    for name, typ in zip(sch.names, sch.types):
        if name not in names:
            continue
        if isinstance(typ, pa.DataType):
            out[name] = typ
        else:
            try:
                out[name] = pa.from_numpy_dtype(typ)
            except (pa.ArrowNotImplementedError, TypeError):
                out[name] = pa.string()
    missing = [n for n in names if n not in out]
    if missing:
        raise KeyError(f"columns {missing} not in dataset schema "
                       f"{sch.names}")
    return out


def pandas_fields(df: pd.DataFrame) -> list[pa.Field]:
    """Arrow fields for a prototype pandas frame (used by call sites
    that declare their output schema via an empty typed DataFrame)."""
    return [
        pa.field(name, pa.from_numpy_dtype(dtype)
                 if dtype != object else pa.string())
        for name, dtype in df.dtypes.items()
    ]
