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
