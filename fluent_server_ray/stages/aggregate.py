"""Grouped aggregation with partial (combiner) pre-aggregation.

The reference's only true aggregation is the mirror's group-by-tag
collect behind one global mutex (reference ``mirror/mirror.go:26-39``)
— the exact anti-pattern at scale. Here the grouped counts are computed
the scalable way:

1. **partial**: inside ``map_batches``, each Arrow batch is collapsed
   to one row per key via ``Table.group_by`` (pure C++), so what enters
   the shuffle is ~|keys| rows per batch, not every event;
2. **final**: a small ``groupby(keys).sum`` over the partials.

Counts are algebraic, so the two-level aggregate is exact; this is also
the skew treatment — a Zipf-hot ``tag`` contributes ONE partial row per
batch regardless of how many events carry it, which bounds the shuffle
fan-in of a hot key by the number of blocks (the classic salting
argument, pre-applied). An optional explicit salt column is provided
for group-bys whose per-group payload (not count) is hot.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum


def skip_empty(fn):
    """Wrap a table→table batch fn into a generator that yields nothing
    for zero-row outputs. Zero-row blocks entering a Ray ``sort`` /
    ``groupby`` come back as 0-COLUMN tables
    (``ArrowBlockAccessor.sort`` returns ``_empty_table()`` for empty
    input, ray/data/_internal/arrow_block.py), whose empty schema then
    trips the executor's "RefBundle with a different schema" warning on
    every shuffle consuming a filtered stream. Skipping the empty
    output block entirely is semantics-free (no rows) and keeps every
    bundle schema-typed."""

    def gen(batch: pa.Table):
        out = fn(batch)
        if len(out):
            yield out

    return gen


def _partial_counts(keys: list[str]):
    def fn(batch: pa.Table) -> pa.Table:
        # group_by on an empty table yields an empty result with the
        # correct schema, so no special case is needed
        out = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        return out.rename_columns(keys + ["n"])

    return fn


def grouped_counts(ds, keys: list[str], batch_size: int | None = None,
                   final: str = "driver"):
    """``ds.groupby(keys).count()`` with partial pre-aggregation.

    Per-batch combiner (Arrow ``Table.group_by``, fuses into the
    upstream map stage — no shuffle of raw rows), then a final merge of
    the tiny partials. ``final='driver'``: stream the ≤ |keys|×|blocks|
    partial rows to the driver and merge there (grouped-count
    cardinality is bounded, so this is a constant-size reduce — Ray's
    Aggregate operator costs seconds of fixed serial time we don't
    need). ``final='ray'``: use the native groupby (for unbounded key
    cardinality).

    Returns a pyarrow Table (driver) or Dataset (ray) with columns
    ``keys + ['n']`` (int64).
    """
    kwargs = {"batch_format": "pyarrow", "zero_copy_batch": True}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    # skip_empty ONLY on the shuffle path: the driver merge needs the
    # TYPED empty partials to keep key dtypes on all-filtered input,
    # and without a shuffle an empty block triggers no executor warning
    if final == "ray":
        partial = ds.map_batches(skip_empty(_partial_counts(keys)), **kwargs)
        return partial.groupby(keys).aggregate(Sum("n", alias_name="n"))
    partial = ds.map_batches(_partial_counts(keys), **kwargs)
    # stream partial blocks to the driver; merge with one Arrow group_by
    tables = [b for b in partial.iter_batches(batch_size=None, batch_format="pyarrow")]
    if not tables:  # zero input blocks: typed empty result, not a crash
        sch = partial.schema()
        if sch is not None:
            return pa.table(
                {n: pa.array([], type=t) for n, t in zip(sch.names, sch.types)}
            )
        return pa.table(
            {**{k: pa.array([], type=pa.string()) for k in keys},
             "n": pa.array([], type=pa.int64())}
        )
    merged = pa.concat_tables(t for t in tables if len(t) >= 0)
    out = merged.group_by(keys).aggregate([("n", "sum")])
    return out.rename_columns(keys + ["n"])


# merge rule per aggregate: how partial results combine (algebraic
# aggregates only — mean decomposes into sum+count)
_MERGE_FN = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def grouped_agg(ds, keys: list[str], aggs: list[tuple[str, str]],
                batch_size: int | None = None, final: str = "driver"):
    """Generic grouped aggregation with partial (combiner)
    pre-aggregation — the multi-function sibling of
    :func:`grouped_counts`.

    ``aggs``: list of (column, fn) with fn ∈ {sum, min, max, count,
    mean}. Each batch collapses to one row per key via Arrow
    ``Table.group_by`` (pure C++), so the shuffle carries ~|keys| rows
    per block; partials merge with the matching algebraic rule
    (sum→sum, min→min, max→max, count→sum; mean = merged sum / merged
    count — exact, order-free for integer inputs). Output columns are
    named ``<col>_<fn>``.

    ``final='driver'`` (bounded key cardinality): stream the tiny
    partials to the driver and merge with one Arrow group_by; returns a
    sorted pyarrow Table. ``final='ray'`` (UNBOUNDED key cardinality —
    per-conversation / per-user stats where |keys| is O(rows)): the
    merge is Ray's distributed groupby over the partial rows; returns a
    Dataset and the driver never holds the result.
    """
    # mean decomposes: request sum+count partials, divide at the end
    phys: list[tuple[str, str]] = []
    means: list[str] = []
    for col, fn in aggs:
        if fn == "mean":
            means.append(col)
            for sub in (("sum"), ("count")):
                if (col, sub) not in phys:
                    phys.append((col, sub))
        else:
            phys.append((col, fn))
    phys = list(dict.fromkeys(phys))
    out_names = [f"{c}_{f}" for c, f in phys]

    def partial(batch: pa.Table) -> pa.Table:
        cols = keys + [c for c, _ in phys]
        t = batch.select(list(dict.fromkeys(cols)))
        if final == "ray":
            for k in keys:
                if t[k].null_count:
                    # Ray's distributed groupby sorts the key and its
                    # boundary sampling crashes on None-vs-str — fail
                    # loudly instead (a silent crash deep in the sort
                    # is the alternative; cf. NOTES gotcha)
                    raise ValueError(
                        f"grouped_agg(final='ray'): key {k!r} has NULLs"
                        " — canonicalize them upstream (e.g. fill with"
                        " a sentinel) or use final='driver'"
                    )
        out = t.group_by(keys).aggregate([(c, f) for c, f in phys])
        # Arrow names results "<col>_<fn>" already, but keep explicit
        return out.rename_columns(keys + out_names)

    kwargs = {"batch_format": "pyarrow", "zero_copy_batch": True}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    # same skip_empty split as grouped_counts: typed empties feed the
    # driver merge (dtype-stable empty results); the shuffle path drops
    # them (they'd come back 0-column from the sort)
    parts = ds.map_batches(
        skip_empty(partial) if final == "ray" else partial, **kwargs
    )

    if final == "ray":
        from ray.data.aggregate import Max, Min

        _RAY_AGG = {"sum": Sum, "min": Min, "max": Max, "count": Sum}
        merged_ds = parts.groupby(keys).aggregate(
            *[
                _RAY_AGG[f](f"{c}_{f}", alias_name=f"{c}_{f}")
                for c, f in phys
            ]
        )
        requested = list(dict.fromkeys(keys + [f"{c}_{f}" for c, f in aggs]))

        def finish(t: pa.Table) -> pa.Table:
            for col in means:
                t = t.append_column(
                    f"{col}_mean",
                    pc.divide(
                        pc.cast(t[f"{col}_sum"], pa.float64()),
                        pc.cast(t[f"{col}_count"], pa.float64()),
                    ),
                )
            return t.select(requested)

        return merged_ds.map_batches(finish, batch_format="pyarrow",
                                     zero_copy_batch=True)

    tables = list(parts.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tables:
        # typed empty partials, then fall through the SAME final path so
        # the empty result has exactly the requested columns (mean
        # included, decomposed sum/count projected away)
        sch = parts.schema()
        if sch is not None:
            merged = pa.table(
                {n: pa.array([], type=t) for n, t in zip(sch.names, sch.types)}
            )
        else:
            merged = pa.table(
                {**{k: pa.array([], type=pa.string()) for k in keys},
                 **{n: pa.array([], type=pa.int64()) for n in out_names}}
            )
    else:
        merged = pa.concat_tables(tables)
    final = merged.group_by(keys).aggregate(
        [(f"{c}_{f}", _MERGE_FN[f]) for c, f in phys]
    ).rename_columns(keys + out_names)
    for col in means:
        final = final.append_column(
            f"{col}_mean",
            pc.divide(
                pc.cast(final[f"{col}_sum"], pa.float64()),
                pc.cast(final[f"{col}_count"], pa.float64()),
            ),
        )
    requested = keys + [f"{c}_{f}" for c, f in aggs]
    final = final.select(list(dict.fromkeys(requested)))
    return final.sort_by([(k, "ascending") for k in keys])


def hash_bucket_array(values, n_buckets: int):
    """``siphash(value) % n_buckets`` as an int64 numpy array — THE
    bucket-key primitive every combiner-first distinct/join/salt stage
    shares (deterministic fixed-key SipHash via pandas; Python's
    ``hash()`` is process-seeded and never used in the data plane).
    ``values``: numpy array or pyarrow (Chunked)Array; nulls hash as ''
    (strings) / 0 (numerics).

    Numeric keys hash by their FLOAT64 bit pattern regardless of the
    stored dtype: the same key value in int32 / int64 / float64 form
    (e.g. a key column float64-ified by an upstream non-inner
    ``bucketed_hash_join``, or mixed parquet schemas) must land in the
    same bucket, or a chained join/distinct on it would silently drop
    matches. Integers beyond 2^53 can collide into one bucket after
    the cast — harmless: bucketing only co-locates; every downstream
    operator still compares exact key values inside the bucket.
    """
    import numpy as np
    import pandas as pd

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        # a numeric column with ANY null converts to float64-with-NaN —
        # fill nulls (0 — collisions only co-locate a few extra rows,
        # never mis-route) so null-free and nully batches agree.
        if (pa.types.is_integer(values.type)
                or pa.types.is_floating(values.type)) and values.null_count:
            import pyarrow.compute as pc

            values = pc.fill_null(values, 0)
        values = values.to_numpy(zero_copy_only=False)
    values = np.asarray(values)
    if values.dtype == object:  # strings (and mixed): null-safe path
        mask = pd.isna(values)
        if mask.any():
            values = values.copy()
            values[mask] = ""
        h = pd.util.hash_array(values)
    else:  # numeric: canonicalize to float64 so dtype never splits keys
        v = np.ascontiguousarray(values)
        if np.issubdtype(v.dtype, np.number) or v.dtype == bool:
            v = np.nan_to_num(v.astype(np.float64), nan=0.0)
            v = v + 0.0  # -0.0 == 0.0 but their BIT patterns hash apart;
            # +0.0 normalizes the sign so equal keys co-bucket
        h = pd.util.hash_array(v)
    return (h % n_buckets).astype("int64")


def add_salt(ds, key_col: str, n_salts: int = 16, salt_col: str = "_salt"):
    """Add ``salt = (hash(key) + row_position) % n_salts`` for
    two-level aggregation of hot keys (reference's hot-tag list under
    one mutex, ``mirror/mirror.go:30-38``, is the failure mode this
    avoids).

    The row-position term is what makes this a real skew treatment: a
    SINGLE hot key's rows cycle through all ``n_salts`` values within
    every batch, so its partials spread over ``n_salts`` reducers —
    a pure ``hash(key) % n`` would give every row of the hot key the
    same salt and spread nothing. The salt never reaches results (the
    second aggregation level merges it out), so its batch-relative
    component costs no determinism where it matters."""

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        # pandas hash_array is SipHash with a FIXED key — deterministic
        # across processes/nodes (python's hash() is NOT; never use it
        # in the data plane).
        vals = batch[key_col].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(vals, dtype=object))
        spread = h + np.arange(len(batch), dtype=np.uint64)
        salt = pa.array((spread % n_salts).astype("int64"))
        return batch.append_column(salt_col, salt)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def grouped_distinct_count(ds, group_col: str, value_col: str,
                           n_buckets: int = 64, final: str = "driver"):
    """EXACT ``count(DISTINCT value) GROUP BY group`` — the generic
    form of the two-level distinct (cf. ``windows.window_distinct_users``):

    1. per-batch local dedup of (group, value) pairs (Arrow
       ``group_by`` — the combiner: within-block repeats never move);
    2. ONE hash-bucket exchange on the VALUE (all surviving copies of
       one (group, value) pair share its value hash, so they
       co-locate; the bucket key is a bounded small int, never one
       group per distinct pair);
    3. whole-bucket ``drop_duplicates`` + per-group partial counts;
    4. the final merge is :func:`grouped_counts`-shaped over a
       |groups|-bounded key space (``final='ray'`` for unbounded).

    Only distinct pairs ever shuffle — at 100 TB that is
    |groups × distinct values|, not rows. NULL group is its own group
    (SQL GROUP BY); NULL values are not counted (SQL count(DISTINCT)
    ignores NULLs). Output: (group_col, n_distinct).
    """
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        t = t.select([group_col, value_col]).filter(
            pc.is_valid(t[value_col]))
        uniq = t.group_by([group_col, value_col]).aggregate([])
        b = hash_bucket_array(uniq[value_col], n_buckets)
        return uniq.append_column("_vbucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([group_col, value_col])
        out = g.groupby(group_col, sort=False, dropna=False,
                        as_index=False).size()
        out.columns = [group_col, "n_partial"]
        out["n_partial"] = out["n_partial"].astype("int64")
        return out

    parts = (
        ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_vbucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    out = grouped_agg(parts, [group_col], [("n_partial", "sum")],
                      final=final)
    if final == "driver":
        return out.rename_columns([group_col, "n_distinct"])
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "n_distinct"]),
        batch_format="pyarrow", zero_copy_batch=True)


def grouped_distinct_count_sql(group_col: str, value_col: str,
                               table: str = "events") -> str:
    return (f"SELECT {group_col}, CAST(count(DISTINCT {value_col}) "
            f"AS BIGINT) AS n_distinct FROM {table} "
            f"GROUP BY {group_col} ORDER BY {group_col}")


def grouped_exact_median(ds, key_col: str, value_col: str,
                         n_buckets: int = 64):
    """EXACT per-group median (DuckDB ``median()`` semantics over
    DOUBLE: for even counts, ``lo + (hi - lo) * 0.5`` between the two
    middle values) — the exact counterpart of
    :func:`sketches.grouped_binned_quantiles`.

    Distributed selection, never a per-group collect of raw rows:
    each batch collapses to per-``(key, value)`` COUNTS (one Arrow
    group_by — duplicate values merge right there), ONE key-bucket
    exchange co-locates each group's count rows, and the in-bucket
    selection is fully vectorized: global cumsum over the
    (key, value)-sorted counts + ONE ``searchsorted`` call for all
    groups' two middle positions. Per-bucket state is the DISTINCT
    (key, value) pairs of its groups — for continuous unbounded values
    that degrades toward group size (use the histogram quantiles
    instead); for discrete/rounded values it is far smaller.

    NULL values are ignored (SQL ``median``); NULL group keys
    canonicalize to ``''`` on both sides (same convention as
    grouped_binned_quantiles). Returns a Dataset (key, median) sorted
    by key.
    """
    import numpy as np
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        keys = pc.fill_null(pc.cast(t[key_col], pa.string()), "")
        sel = pa.table({key_col: keys, value_col: t[value_col]})
        sel = sel.filter(pc.is_valid(sel[value_col]))
        out = sel.group_by([key_col, value_col]).aggregate(
            [([], "count_all")])
        return out.rename_columns([key_col, value_col, "n"])

    parts = ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                           zero_copy_batch=True)

    def with_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket", pa.array(hash_bucket_array(t[key_col], n_buckets)))

    bucketed = parts.map_batches(skip_empty(with_bucket),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([key_col, value_col], as_index=False, sort=True,
                      dropna=False)["n"].sum()
        keys = g[key_col].to_numpy()
        vals = g[value_col].to_numpy(dtype=np.float64)
        ns = g["n"].to_numpy(dtype=np.int64)
        gcum = np.cumsum(ns)
        # segment starts: first row of each key (rows already key-sorted)
        new_key = np.ones(len(g), dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new_key)
        base = np.where(starts > 0, gcum[starts - 1], 0)
        tot = np.append(gcum[starts[1:] - 1], gcum[-1]) - base
        # two middle positions (0-based) per group; global targets stay
        # inside the segment because pos < tot
        lo_idx = np.searchsorted(gcum, base + (tot - 1) // 2, side="right")
        hi_idx = np.searchsorted(gcum, base + tot // 2, side="right")
        v_lo, v_hi = vals[lo_idx], vals[hi_idx]
        return pd.DataFrame({
            key_col: keys[starts],
            "median": v_lo + (v_hi - v_lo) * 0.5,
        })

    out = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
    return out.sort(key_col)


def grouped_exact_median_sql(key_col: str, value_col: str,
                             table: str) -> str:
    return f"""
SELECT COALESCE(CAST({key_col} AS VARCHAR), '') AS {key_col},
       median({value_col}) AS median
FROM {table} GROUP BY 1 ORDER BY 1
""".strip()


def latest_by_key(ds, key: str, order_cols: list[str], n_buckets: int = 64):
    """Upsert compaction: keep each key's row with the MAXIMUM
    ``order_cols`` tuple — the CDC "latest version wins" reduction
    (log pipelines: the current state of every session/device from an
    append-only event stream; reference analogue: the mirror store
    keeping the latest tag state, ``mirror/mirror.go:30-38``, here
    without the single mutexed map).

    Combiner-first: each batch keeps its local per-key winner (one
    vectorized sort + ``drop_duplicates`` — never a per-key loop),
    ONE key-hash exchange co-locates the ≤ blocks-per-key survivors,
    and the per-bucket pass repeats the same argmax. Output schema ==
    input schema (declared, bucket-occupancy-independent via
    ``groups.map_buckets``), sorted by ``key``."""
    import pandas as pd

    from fluent_server_ray.stages.groups import map_buckets
    from fluent_server_ray.stages.joins import arrow_schema

    sch = arrow_schema(
        ds.map_batches(lambda t: t, batch_format="pyarrow",
                       zero_copy_batch=True)
    ) or arrow_schema(ds)
    if sch is None:
        raise ValueError("latest_by_key: input has no usable Arrow schema")
    sch = pa.schema(  # ray Schema wrapper -> real pa.Schema
        [pa.field(n, t) for n, t in zip(sch.names, sch.types)]
    )
    cols = list(sch.names)
    by = [key] + list(order_cols)
    asc = [True] + [False] * len(order_cols)

    def local(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(by, ascending=asc)
        out = pa.Table.from_pandas(df.drop_duplicates(key)[cols],
                                   preserve_index=False)
        return out.append_column(
            "_bucket", pa.array(hash_bucket_array(out[key], n_buckets))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(by, ascending=asc).drop_duplicates(key)[cols]

    compacted = ds.map_batches(skip_empty(local), batch_format="pyarrow",
                               zero_copy_batch=True)
    return map_buckets(compacted, per_bucket, sch).sort(key)


def latest_by_key_sql(select_cols: list[str], key: str,
                      order_cols: list[str], table: str) -> str:
    order = ", ".join(f"{c} DESC" for c in order_cols)
    cols = ", ".join(select_cols)
    return f"""
SELECT {cols} FROM (
  SELECT {cols},
    row_number() OVER (PARTITION BY {key} ORDER BY {order}) AS _rn
  FROM {table}
) WHERE _rn = 1 ORDER BY {key}
""".strip()


def grouped_mode(ds, group_col: str, value_col: str) -> pa.Table:
    """Per-group MODE (most frequent value, ties → smallest value) —
    the categorical summary mean/median can't give ("which tool
    dominates each sink"). Combiner-first: per-batch (group, value)
    counts, bounded driver merge, one vectorized argmax per group.
    Returns (group, value, n) sorted by group.
    """
    cells = grouped_counts(ds, [group_col, value_col], final="driver")
    import pandas as pd

    df = pd.DataFrame({
        group_col: cells[group_col].to_pylist(),
        value_col: cells[value_col].to_pylist(),
        "n": cells["n"].to_numpy(zero_copy_only=False),
    })
    df = df.sort_values([group_col, "n", value_col],
                        ascending=[True, False, True])
    top = df.groupby(group_col, sort=True).head(1)
    return pa.table({
        group_col: pa.array(top[group_col].to_numpy(dtype=object)),
        value_col: pa.array(top[value_col].to_numpy(dtype=object)),
        "n": pa.array(top["n"].to_numpy().astype("int64")),
    })


def grouped_mode_sql(group_col: str, value_col: str, inner: str) -> str:
    """Mirror over a CTE/table ``inner`` with (group, value)."""
    return f"""
SELECT {group_col}, {value_col}, n FROM (
  SELECT {group_col}, {value_col}, CAST(count(*) AS BIGINT) AS n,
    row_number() OVER (PARTITION BY {group_col}
      ORDER BY count(*) DESC, {value_col}) AS rn
  FROM {inner} GROUP BY {group_col}, {value_col}
) WHERE rn = 1 ORDER BY {group_col}
""".strip()


def maintain_counts(store_dir: str, delta_ds, keys: list[str],
                    delta_id: str) -> pa.Table:
    """Incremental MATERIALIZED-VIEW maintenance for grouped counts:
    fold one delta shard into a persisted count view without
    recomputing history — the steady-state form of the per-sink
    aggregate (a 100 TB store re-counts only the day's arrivals, not
    the corpus). Counts are fully algebraic, so view + delta-partials
    merge exactly; the maintained view equals a full recompute by
    construction, and the driver query pins that equality against the
    full-GROUP-BY oracle.

    Durability protocol (the lineage/chunk-ack shape, reference
    ``message/ack.go:5-20`` ≙ commit-after-write): each application
    writes a NEW epoch directory ``epoch=<n>/`` holding
    ``counts.parquet`` + ``manifest.json`` (the applied-delta-id
    ledger), then atomically swings the ``CURRENT`` pointer file via
    ``os.replace``. A crash between epoch write and pointer swing
    leaves the old epoch current (the delta re-applies cleanly on
    retry); re-applying an ALREADY-LEDGERED ``delta_id`` is a no-op
    returning the current view — at-least-once delivery with
    exactly-once effect. The ledger grows one id per applied delta
    (ids are caller-chosen shard/chunk names, bounded by the number
    of ingest units, not rows).

    ``delta_ds`` must already carry exactly the ``keys`` columns (+
    anything else, ignored). Returns the maintained view
    ``keys + [n]`` sorted by keys.
    """
    import json
    import os

    def _read_current():
        cur_path = os.path.join(store_dir, "CURRENT")
        if not os.path.exists(cur_path):
            return 0, [], None
        with open(cur_path) as f:
            epoch = int(f.read().strip())
        edir = os.path.join(store_dir, f"epoch={epoch}")
        with open(os.path.join(edir, "manifest.json")) as f:
            manifest = json.load(f)
        import pyarrow.parquet as pq
        return epoch, manifest["applied"], pq.read_table(
            os.path.join(edir, "counts.parquet"))

    epoch, applied, view = _read_current()
    if delta_id in applied:
        # replayed delta (lost-ack retry): exactly-once effect
        return view.sort_by([(c, "ascending") for c in keys])

    part = grouped_counts(delta_ds.select_columns(keys), keys,
                          final="driver")
    if view is None:
        merged = part
    else:
        merged = (pa.concat_tables([view, part])
                  .group_by(keys).aggregate([("n", "sum")])
                  .rename_columns(keys + ["n"]))
    merged = merged.sort_by([(c, "ascending") for c in keys])

    import pyarrow.parquet as pq
    new_epoch = epoch + 1
    edir = os.path.join(store_dir, f"epoch={new_epoch}")
    os.makedirs(edir, exist_ok=True)
    pq.write_table(merged, os.path.join(edir, "counts.parquet"))
    with open(os.path.join(edir, "manifest.json"), "w") as f:
        json.dump({"applied": applied + [delta_id]}, f)
    tmp = os.path.join(store_dir, "CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(str(new_epoch))
    os.replace(tmp, os.path.join(store_dir, "CURRENT"))
    return merged
