"""Metadata-clean Parquet reads.

Pandas-written parquet embeds a ``pandas`` metadata blob in the file
schema that makes ``pyarrow.Schema`` unhashable; Ray Data's block
schema unification hashes schemas for deduplication
(``ray/data/_internal/arrow_ops/transform_pyarrow.py::unify_schemas``)
and logs ``Failed to hash the schemas (for deduplication)`` per read
task otherwise. Passing an explicit metadata-stripped schema to
``read_parquet`` silences the warning AND lets Ray dedupe the schema
copies across blocks (less driver memory per block metadata).

Use this for any read of externally-written parquet (the driver's
testdata tables); files this engine writes itself (Arrow tables via
``write_parquet``) carry no pandas metadata and don't need it.
"""

from __future__ import annotations

import os


def read_parquet_clean(paths, filter_refs=None, **kwargs):
    """``ray.data.read_parquet`` with the file schema's metadata
    stripped (see module docstring). Only applies when a single
    ``.parquet`` file path is given and no explicit ``schema`` is
    passed; composes with ``columns=`` pruning (the schema names the
    FILE's columns, ``columns`` selects the subset to decode).

    ``filter_refs``: with a pushed-down ``filter``, the column names
    the filter expression references. A pushed filter may reference
    columns outside ``columns`` (filter-then-prune), and a schema that
    doesn't cover them unresolves the refs at the fragment scan — so
    filtered reads are left untouched UNLESS the caller declares the
    refs and they are covered by ``columns`` (then the pruned-layout
    schema is safe to pin and the read stays warning-free)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    filter_ok = "filter" not in kwargs or (
        filter_refs is not None
        and kwargs.get("columns") is not None
        and set(filter_refs) <= set(kwargs["columns"])
    )
    if ("schema" not in kwargs and "filesystem" not in kwargs
            and filter_ok):
        first = paths[0] if isinstance(paths, (list, tuple)) else paths
        if (isinstance(first, str) and first.endswith(".parquet")
                and os.path.isfile(first)):
            try:
                schemas = (
                    [pq.read_schema(p).remove_metadata() for p in paths]
                    if isinstance(paths, (list, tuple))
                    else [pq.read_schema(paths).remove_metadata()]
                )
                # FULL schema equality (names AND types): pinning file
                # 0's schema onto a type-divergent sibling would error
                # (or silently cast) at the fragment scan, where plain
                # read_parquet unifies
                if all(s.equals(schemas[0]) for s in schemas[1:]):
                    schema = schemas[0]
                    cols = kwargs.get("columns")
                    if cols is not None:
                        # the declared schema must match the PRUNED
                        # block layout, in selection order
                        import pyarrow as pa

                        schema = pa.schema(
                            [schema.field(c) for c in cols]
                        )
                    kwargs["schema"] = schema
            except Exception:
                pass  # unreadable footer → let read_parquet report it
    return rd.read_parquet(paths, **kwargs)


def read_parquet_evolving(paths, columns=None, **kwargs):
    """Schema-evolution-tolerant parquet read: a long-lived log sink
    accumulates shards written by DIFFERENT pipeline versions (a
    column added, an int widened), and a plain ``read_parquet`` then
    emits blocks with per-shard schemas — downstream stages crash on
    the shards missing a column, and a ``columns=`` projection that
    names a new column fails outright at the fragment scan.

    Strategy (the per-group prune-pad-union shape):

    1. group the files by their exact (metadata-stripped) schema;
    2. unify the group schemas (``pa.unify_schemas`` — a genuine type
       CONFLICT still fails loudly: silently casting int to string is
       corruption, not evolution);
    3. read each group separately with the group's OWN available
       subset of the projection (column pruning keeps working per
       shard generation), then pad the missing projected columns with
       typed nulls and cast up to the unified field types;
    4. union the groups — one Dataset, one schema, block-stable.

    ``paths``: directory or list of .parquet files. Projection order
    follows ``columns`` (or the unified schema)."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(_glob.glob(os.path.join(paths, "*.parquet")))
        else:
            files = [paths]
    else:
        files = list(paths)
    if not files:
        raise ValueError("read_parquet_evolving: no parquet files")

    groups: dict = {}
    for f in files:
        sch = pq.read_schema(f).remove_metadata()
        groups.setdefault(sch, []).append(f)
    try:
        unified = pa.unify_schemas(list(groups.keys()),
                                   promote_options="permissive")
    except TypeError:  # older pyarrow: no promote_options kwarg
        unified = pa.unify_schemas(list(groups.keys()))
    out_names = list(columns) if columns is not None else list(unified.names)
    missing = [c for c in out_names if c not in unified.names]
    if missing:
        raise ValueError(f"projected columns absent everywhere: {missing}")
    out_schema = pa.schema([unified.field(c) for c in out_names])

    parts = []
    for sch, fs in groups.items():
        avail = [c for c in out_names if c in sch.names]
        ds = read_parquet_clean(fs, columns=avail, **kwargs)

        def pad(t: pa.Table, _avail=tuple(avail)) -> pa.Table:
            cols = {}
            for f_ in out_schema:
                if f_.name in _avail:
                    col = t[f_.name]
                    if not col.type.equals(f_.type):
                        col = pc.cast(col, f_.type)
                    cols[f_.name] = col
                else:
                    cols[f_.name] = pa.nulls(len(t), f_.type)
            return pa.Table.from_arrays(
                [cols[n].combine_chunks()
                 if isinstance(cols[n], pa.ChunkedArray) else cols[n]
                 for n in out_names],
                schema=out_schema,
            )

        parts.append(ds.map_batches(pad, batch_format="pyarrow",
                                    zero_copy_batch=True))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
