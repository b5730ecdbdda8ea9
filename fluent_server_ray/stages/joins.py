"""Large-large joins: explicit bucketed hash join + the native path.

The reference has no data-data joins (SURVEY.md §2.4) — its lookups are
broadcast dictionaries (see :mod:`fluent_server_ray.stages.enrich`).
For two genuinely large sides this module provides:

- ``bucketed_hash_join`` — the portable, partitioning-explicit pattern:
  add ``_bucket = siphash(key) % B`` to both sides, one ``groupby``
  shuffle each, then join matching buckets pairwise inside
  ``map_groups``. B controls per-task memory (size B so the smaller
  side's bucket fits a worker heap); skewed keys can be salted into
  sub-buckets upstream (``stages/aggregate.add_salt``). This is the
  documented 100 TB layout: both sides shuffle exactly once, on the
  same key.
- ``native_join`` — Ray Data's hash-partitioned ``Dataset.join``
  (Ray ≥ 2.46): preferred when available; same partitioning story,
  engine-managed.

Both produce identical rows; tests pin them against each other and
against a DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _with_bucket(ds, key: str, n_buckets: int):
    from fluent_server_ray.stages.aggregate import hash_bucket_array, skip_empty

    def add(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket", pa.array(hash_bucket_array(t[key], n_buckets))
        )

    # skip_empty: this is the last map before the groupby shuffle —
    # zero-row blocks (an upstream filter that dropped a whole block)
    # would come back from the shuffle's sort as 0-column tables and
    # trip the executor's schema-divergence warning
    return ds.map_batches(skip_empty(add), batch_format="pyarrow",
                          zero_copy_batch=True)


def arrow_schema(ds, static: bool = False):
    """``ds.schema()`` if present AND carrying real Arrow types, else
    None. A pandas-derived dataset (e.g. a map_groups output) can
    report Python ``type`` entries instead of ``pa.DataType`` —
    unusable for typed padding or key-dtype checks. ``cogrouped`` uses
    this to validate its schema probes; note a PYTHON-typed schema
    does not imply emptiness (probe through an identity pyarrow
    map_batches for that — None there means zero blocks).

    ``static=True`` never executes the plan (``fetch_if_missing=
    False``): None then means "not statically known", not "empty" —
    the caller decides whether discovering it is worth an execution.
    For a side whose lineage contains an all-to-all (a prior bucketed
    op), fetching the schema means producing a first block, which
    means running the WHOLE upstream shuffle — and the real
    consumption then runs it a second time."""
    s = ds.schema(fetch_if_missing=not static)
    if s is None:
        return None
    if not all(isinstance(t, pa.DataType) for t in s.types):
        return None
    return s


def cogrouped(left, right, key: str, right_key: str | None = None,
              n_buckets: int = 32):
    """Co-locate two Datasets by ``siphash(key) % n_buckets`` with ONE
    unioned exchange (rows carry a ``_side`` marker; each side is
    null-padded to the union schema — null buffers only).

    Returns ``(both, lcols, rcols, lfields, rfields)``; callers group
    ``both`` by ``_bucket`` and split each group on ``_side``. This is
    the shared substrate of every keyed two-sided operator here
    (hash join, range join)."""
    right_key = right_key or key

    def resolve(ds, side: str):
        """(dataset, schema) with at most ONE execution of the side.

        Statically-known Arrow schema (parquet read, from_arrow,
        map_buckets output whose sort already pinned it) → free. A
        derived side (map chain / shuffle upstream) would otherwise be
        executed TWICE — once producing a first block for the schema
        probe, once for real — so it materializes FIRST and every
        probe (plus the actual join consumption) reuses the pinned
        blocks. Pandas-typed blocks normalize through a cheap identity
        Arrow wrap over the cached blocks."""
        s = arrow_schema(ds, static=True)
        if s is not None:
            return ds, s
        ds = ds.materialize()
        s = arrow_schema(ds)
        if s is not None:
            return ds, s
        wrapped = ds.map_batches(lambda t: t, batch_format="pyarrow",
                                 zero_copy_batch=True)
        s = arrow_schema(wrapped)
        if s is None:
            raise ValueError(
                f"{side} join side has no usable Arrow schema (empty "
                f"derived dataset?) — check emptiness upstream "
                f"(joins.arrow_schema(ds) is None) and return a typed "
                f"empty result instead"
            )
        return ds, s

    left, lsch = resolve(left, "left")
    right, rsch = resolve(right, "right")
    # normalize both sides to Arrow blocks so downstream pads see
    # Arrow batches (pandas-backed datasets convert here, zero-copy
    # for the already-Arrow majority)
    left = left.map_batches(lambda t: t, batch_format="pyarrow",
                            zero_copy_batch=True)
    right = right.map_batches(lambda t: t, batch_format="pyarrow",
                              zero_copy_batch=True)

    # key-kind sanity: numeric keys hash dtype-canonically (see
    # aggregate.hash_bucket_array), but a string key on one side and a
    # numeric on the other can never co-bucket — fail loudly instead of
    # silently joining nothing.
    def _kind(t: pa.DataType) -> str:
        if pa.types.is_dictionary(t):  # dictionary-encoded column keys
            t = t.value_type           # by its VALUE type (hashing sees
        if pa.types.is_integer(t) or pa.types.is_floating(t) \
                or pa.types.is_boolean(t):  # decoded values either way)
            return "numeric"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "string"
        return str(t)

    lk = lsch.types[lsch.names.index(key)]
    rk = rsch.types[rsch.names.index(right_key)]
    if _kind(lk) != _kind(rk):
        raise ValueError(
            f"cogrouped key dtype mismatch: {key}:{lk} vs {right_key}:{rk}"
        )
    lcols, rcols = list(lsch.names), list(rsch.names)
    lfields = [pa.field(n, t) for n, t in zip(lsch.names, lsch.types)]
    rfields = [pa.field(n, t) for n, t in zip(rsch.names, rsch.types)]
    all_fields = lfields + [f for f in rfields if f.name not in lcols]

    def pad(side: int, have: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {}
            for f in all_fields:
                cols[f.name] = (
                    t[f.name] if f.name in have else pa.nulls(n, f.type)
                )
            out = pa.table(cols)
            return out.append_column(
                "_side", pa.array(np.full(n, side, dtype=np.int8))
            )

        return fn

    l = _with_bucket(
        left.map_batches(pad(0, lcols), batch_format="pyarrow",
                         zero_copy_batch=True),
        key, n_buckets,
    )
    r = _with_bucket(
        right.map_batches(pad(1, rcols), batch_format="pyarrow",
                          zero_copy_batch=True),
        right_key, n_buckets,
    )
    return l.union(r), lcols, rcols, lfields, rfields


def canonical_dtype_map(fields, nullable: set | None = None) -> dict:
    """Column-level pandas dtypes for schema-stable per-bucket output:
    identical in every bucket (a data-dependent per-bucket choice would
    flip block schemas). Columns in ``nullable`` that are integers
    become float64 (NaN-capable); nullable BOOLS become pandas
    ``boolean`` (masked) — ``.astype(bool)`` on a no-match object
    column would coerce NaN to True, silently fabricating values;
    string columns stay untouched."""
    nullable = nullable or set()
    out = {}
    for f in fields:
        if pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
            continue
        if pa.types.is_boolean(f.type):
            out[f.name] = "boolean" if f.name in nullable else np.bool_
            continue
        d = f.type.to_pandas_dtype()
        if f.name in nullable and np.issubdtype(np.dtype(d), np.integer):
            d = np.float64
        out[f.name] = d
    return out


def bucketed_hash_join(
    left,
    right,
    key: str,
    n_buckets: int = 32,
    how: str = "inner",
    right_key: str | None = None,
):
    """Partitioned hash join via per-bucket pandas merges.

    Each side is shuffled once on ``siphash(key) % n_buckets``; a
    per-bucket ``map_groups`` merges the two bucket halves. Rows carry
    a ``_side`` marker through one unioned shuffle so both sides
    co-locate with a single exchange.
    """
    right_key = right_key or key
    both, lcols, rcols, lfields, rfields = cogrouped(
        left, right, key, right_key, n_buckets
    )

    # canonical output SCHEMA: every bucket — empty, one-sided or
    # matched — is coerced to it (stages/groups.py), so block schemas
    # never flip and an all-NaN pandas column can never surface as an
    # Arrow null-typed column. Fill-side integer columns are float64
    # everywhere (NaN-capable, the dtype pandas merge emits for them in
    # matched buckets); a SAME-NAME join key is taken from the keep
    # side by pandas merge and is therefore never null — it keeps its
    # integer type.
    out_fields = lfields + [f for f in rfields if f.name not in lcols
                            or f.name == right_key != key]
    same_key = {key} if right_key == key else set()
    if how == "inner":
        nullable = set()
    elif how == "left":
        nullable = set(rcols) - same_key
    elif how == "right":
        nullable = set(lcols) - same_key
    else:  # outer & friends: same-name key is coalesced, never null
        nullable = (set(lcols) | set(rcols)) - same_key
    out_schema = pa.schema([
        pa.field(
            f.name,
            pa.float64()
            if f.name in nullable and pa.types.is_integer(f.type)
            else f.type,
        )
        for f in out_fields
    ])

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][lcols]
        rg = g[g["_side"] == 1][rcols]
        return lg.merge(rg, left_on=key, right_on=right_key, how=how)

    from fluent_server_ray.stages.groups import map_buckets

    return map_buckets(both, join_bucket, out_schema)


def asof_join(left, right, key: str, left_ts: str = "ts",
              right_ts: str = "ts", attach: dict | None = None,
              direction: str = "backward",
              allow_exact_matches: bool = True, n_buckets: int = 64):
    """Generic TWO-DATASET as-of join: for every left row, the
    temporally closest right row of the same key (``backward`` = most
    recent at-or-before; ``allow_exact_matches=False`` = strictly
    before, SQL ``ASOF JOIN ... ON l.ts > r.ts``). The two-table
    sibling of :func:`windows.asof_prior_event` (which matches within
    one typed stream): sensor readings onto trades, deploy events onto
    log lines, latest user event onto a transcript turn.

    ``attach``: {right_col: output_name} — the right columns to carry;
    matched integer columns come back float64 (NaN = no match, the
    nullable-int convention shared with the other joins; ids must stay
    < 2^53 — asserted in the same way as asof_prior_event).

    Shape: ONE unioned exchange (:func:`cogrouped`), then a single
    ``pd.merge_asof(by=key)`` per bucket — all keys in a bucket merge
    in one C pass. Right-side ts ties break by the (ts, attach-cols)
    sort order; keep right ts unique per key for engine-independent
    results (the same caveat every ASOF engine documents).
    """
    import numpy as np
    import pandas as pd

    attach = dict(attach or {})
    assert attach, "asof_join: pass attach={right_col: out_name}"
    assert key not in attach, (
        "asof_join: attaching the join key is redundant — it is "
        "already on every left row")

    both, lcols, rcols, lfields, rfields = cogrouped(
        left, right, key, key, n_buckets
    )
    # Attaching the right ts column itself ("when was the matched
    # event") is done via a pre-rename copy, so the right_ts→left_ts
    # merge rename below never collides with an attach entry.
    rmap = {key: key, right_ts: left_ts,
            **{rc: out for rc, out in attach.items() if rc != right_ts}}
    out_fields = list(lfields) + [
        pa.field(out, pa.float64()
                 if pa.types.is_integer(next(f.type for f in rfields
                                             if f.name == rc))
                 else next(f.type for f in rfields if f.name == rc))
        for rc, out in attach.items()
    ]
    out_schema = pa.schema(out_fields)
    # The 2^53 precision guard only applies to columns whose matched
    # representation IS float64 — i.e. integer-typed right fields.
    # Timestamps, strings and already-float columns pass through
    # merge_asof in their own dtype losslessly.
    int_outs = [
        out for rc, out in attach.items()
        if pa.types.is_integer(next(f.type for f in rfields
                                    if f.name == rc))
    ]

    # No-match fallback nulls must match the OUTPUT dtype, not float64
    # blanket NaN — a NaN column cannot cast to timestamp/string when
    # the bucket result is coerced to out_schema.
    def _null_series(index, typ):
        if pa.types.is_timestamp(typ):
            return pd.Series(pd.NaT, index=index,
                             dtype=f"datetime64[{typ.unit}]")
        if pa.types.is_floating(typ) or pa.types.is_integer(typ):
            return pd.Series(np.nan, index=index, dtype="float64")
        return pd.Series([None] * len(index), index=index, dtype=object)

    out_types = {f.name: f.type for f in out_fields}

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][lcols].sort_values([left_ts, key])
        rg = g[g["_side"] == 1][rcols]
        if right_ts in attach:
            rg = rg.assign(**{attach[right_ts]: rg[right_ts]})
        rg = rg.rename(columns=rmap)
        rg = rg[[key, left_ts] + list(attach.values())].sort_values(
            [left_ts, key])
        for out in int_outs:
            nums = rg[out].abs()
            if (nums >= float(1 << 53)).any():
                raise ValueError(
                    f"asof_join: {out} exceeds 2^53 — float64 matched "
                    "representation would lose precision")
        if lg.empty or rg.empty:
            return lg.assign(**{o: _null_series(lg.index, out_types[o])
                                for o in attach.values()})
        return pd.merge_asof(lg, rg, on=left_ts, by=key,
                             direction=direction,
                             allow_exact_matches=allow_exact_matches)

    from fluent_server_ray.stages.groups import map_buckets

    return map_buckets(both, per_bucket, out_schema)


def native_join(left, right, key: str, n_partitions: int = 32,
                how: str = "inner"):
    """Ray Data's built-in hash-partitioned join."""
    return left.join(right, join_type=how, num_partitions=n_partitions,
                     on=(key,))


def salted_replicated_join(
    big,
    small,
    key: str,
    right_key: str | None = None,
    n_salts: int = 8,
    n_sub: int = 8,
):
    """Skew-safe inner join of a LARGE, hot-keyed fact side against a
    MEDIUM dim side — the join-shaped sibling of
    ``aggregate.add_salt``'s two-level aggregation: a plain hash join
    sends every row of a hot key to ONE bucket/task (the straggler
    that stalls a 256-node cluster), so instead

    - each big-side row gets ``salt = (siphash(key) + row_pos) %
      n_salts`` — a single hot key's rows cycle across all salts;
    - the small side is REPLICATED once per salt (×``n_salts`` blowup —
      the documented cost: use this when the dim side is too big to
      broadcast but ``n_salts`` copies still fit the object store;
      broadcast enrichment (``stages/enrich``) stays the right tool
      for truly tiny sides);
    - the shuffle key is ``(siphash(key) % n_sub) * n_salts + salt``
      (``n_sub × n_salts`` buckets) so the hot key occupies
      ``n_salts`` buckets instead of one; each bucket holds exactly
      one salt's replica of the dim rows, so an in-bucket merge on the
      key alone is exact (the matching replica is co-located by
      construction, every other replica is elsewhere).

    Inner-join semantics identical to ``bucketed_hash_join(...,
    how='inner')``; tests pin row-set equality. Non-key column names
    must be disjoint across sides (asserted)."""
    import numpy as np

    from fluent_server_ray.stages.aggregate import hash_bucket_array
    from fluent_server_ray.stages.groups import map_buckets

    right_key = right_key or key
    both_probe, lcols, rcols, lfields, rfields = cogrouped(
        big, small, key, right_key, n_buckets=1
    )  # reuse the schema probe + dtype checks; the 1-bucket exchange
    # is never executed — we rebuild the union below with salted buckets
    del both_probe
    overlap = (set(lcols) & set(rcols)) - ({key} if right_key == key
                                           else set())
    if overlap:
        raise ValueError(
            f"salted_replicated_join: non-key column overlap {overlap}"
        )

    all_fields = lfields + [f for f in rfields if f.name not in lcols]

    def pad(side: int, have: list[str], salted: bool):
        def fn(t: pa.Table):
            if len(t) == 0:  # generator UDF: yield nothing; map_buckets
                return       # emits typed empties for hollow partitions
            ks = key if side == 0 else right_key
            h = hash_bucket_array(t[ks], n_sub)
            if salted:  # big side: one salt per row, position-cycled
                salt = (
                    hash_bucket_array(t[ks], n_salts)
                    + np.arange(len(t), dtype=np.int64)
                ) % n_salts
                reps = [(t, salt)]
            else:  # small side: every salt's replica
                reps = [(t, np.full(len(t), s, dtype=np.int64))
                        for s in range(n_salts)]
            for tab, salt_arr in reps:
                cols = {}
                for f in all_fields:
                    cols[f.name] = (
                        tab[f.name] if f.name in have
                        else pa.nulls(len(tab), f.type)
                    )
                out = pa.table(cols)
                out = out.append_column(
                    "_side", pa.array(np.full(len(tab), side, dtype=np.int8))
                )
                yield out.append_column(
                    "_bucket", pa.array(h * n_salts + salt_arr)
                )

        return fn

    l = big.map_batches(pad(0, lcols, True),
                        batch_format="pyarrow", zero_copy_batch=True)
    r = small.map_batches(pad(1, rcols, False),
                          batch_format="pyarrow", zero_copy_batch=True)

    out_fields = lfields + [f for f in rfields if f.name not in lcols
                            or f.name == right_key != key]
    out_schema = pa.schema(out_fields)  # inner join: no fill columns

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][lcols]
        rg = g[g["_side"] == 1][rcols]
        return lg.merge(rg, left_on=key, right_on=right_key, how="inner")

    return map_buckets(l.union(r), join_bucket, out_schema)


def band_join_pairs(ds, id_col: str, value_col: str, eps: int,
                    n_buckets: int = 64):
    """Numeric-proximity self-join: every pair ``id_a < id_b`` whose
    int64 values differ by at most ``eps`` — the band/θ-join family
    (near-duplicate amounts, co-priced items, sensor readings within
    tolerance) that an equality hash join cannot express.

    Grid-cell plan (the standard band-join partitioning): each row
    lands in cell ``v // eps`` and sends ONE ghost copy to cell+1;
    every qualifying pair is then LOCAL to one cell — same-cell pairs
    (native×native, id-ordered) plus cross-cell pairs (ghost from
    cell-1 × native), so no pair forms twice and no distinct pass is
    needed. ONE cell-keyed bucket exchange; per-bucket pair formation
    is a vectorized pandas self-merge. Fan-out per cell is its
    occupancy — a value-skewed corpus concentrates cells exactly like
    every keyed exchange here (documented contract; shrink ``eps`` or
    pre-bucket by a second key for pathological piles).

    NULL ids/values never pair (SQL comparison semantics) and are
    dropped up front. Output: (id_a, id_b, v_a, v_b) sorted.
    """
    import pandas as pd

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)
    from fluent_server_ray.stages.groups import map_buckets

    if eps <= 0:
        raise ValueError(f"eps must be positive, got {eps}")

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok = pc.and_(pc.is_valid(t[id_col]), pc.is_valid(t[value_col]))
        t = t.filter(ok)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = v // eps
        out_id = np.concatenate([ids, ids])
        out_v = np.concatenate([v, v])
        out_cell = np.concatenate([cell, cell + 1])
        ghost = np.concatenate([np.zeros(len(v), dtype=np.int64),
                                np.ones(len(v), dtype=np.int64)])
        tb = pa.table({"id": pa.array(out_id), "v": pa.array(out_v),
                       "cell": pa.array(out_cell),
                       "ghost": pa.array(ghost)})
        return tb.append_column(
            "_bucket", pa.array(hash_bucket_array(tb["cell"], n_buckets)))

    schema = pa.schema([
        pa.field("id_a", pa.int64()), pa.field("id_b", pa.int64()),
        pa.field("v_a", pa.int64()), pa.field("v_b", pa.int64()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        nat = g[g["ghost"] == 0]
        gho = g[g["ghost"] == 1]
        m1 = nat[["id", "v", "cell"]].merge(
            nat[["id", "v", "cell"]], on="cell", suffixes=("_x", "_y"))
        m1 = m1[(m1["id_x"] < m1["id_y"])
                & ((m1["v_x"] - m1["v_y"]).abs() <= eps)]
        m2 = gho[["id", "v", "cell"]].merge(
            nat[["id", "v", "cell"]], on="cell", suffixes=("_x", "_y"))
        m2 = m2[(m2["v_x"] - m2["v_y"]).abs() <= eps]
        both = pd.concat([m1, m2], ignore_index=True)
        a_first = both["id_x"] < both["id_y"]
        ida = both["id_x"].where(a_first, both["id_y"])
        idb = both["id_y"].where(a_first, both["id_x"])
        va = both["v_x"].where(a_first, both["v_y"])
        vb = both["v_y"].where(a_first, both["v_x"])
        return pd.DataFrame({"id_a": ida.to_numpy(),
                             "id_b": idb.to_numpy(),
                             "v_a": va.to_numpy(),
                             "v_b": vb.to_numpy()})

    exploded = ds.select_columns([id_col, value_col]).map_batches(
        skip_empty(explode), batch_format="pyarrow", zero_copy_batch=True)
    return map_buckets(exploded, per_bucket, schema).sort(
        ["id_a", "id_b"])


def band_join_pairs_sql(id_expr: str, value_expr: str, eps: int,
                        table: str) -> str:
    """IEJoin mirror: ``id_expr``/``value_expr`` are SQL expressions
    over ``table`` producing the id and the int64 value."""
    return f"""
WITH c AS (
  SELECT {id_expr} AS id, {value_expr} AS v FROM {table}
)
SELECT x.id AS id_a, y.id AS id_b, x.v AS v_a, y.v AS v_b
FROM c x JOIN c y
  ON y.id > x.id AND y.v BETWEEN x.v - {eps} AND x.v + {eps}
ORDER BY id_a, id_b
""".strip()


def fuzzy_join(left_ds, right_ds, id_col: str = "id",
               text_col: str = "text", max_dist: int = 2,
               prefix_len: int = 64, band_width: int = 8,
               max_band_pairs: int = 5_000_000):
    """Fuzzy (approximate-string) JOIN between two tables: every
    (left, right) pair whose ``text_col`` values are within BYTE-level
    Levenshtein distance ``max_dist`` on their first ``prefix_len``
    codepoints — the record-linkage / entity-resolution primitive
    (match a dirty feed's keys back to a reference table through
    typos). The cross-table sibling of
    :func:`dedup.edit_distance_dupes`, sharing its blocking proof and
    its across-pairs DP kernel (``dedup._pairwise_levenshtein``).

    Blocking (recall 1 within the radius): distance >= |byte-length
    delta| and ``band_width > max_dist``, so a qualifying pair's
    length bands differ by at most 1. LEFT rows replicate to bands
    (b-1, b, b+1); RIGHT rows sit only in their own band; every pair
    is evaluated exactly once — at the right row's band. Candidate
    pairs per band are length-windowed and capped (raises past
    ``max_band_pairs``): this is a bounded-verification-pool operator;
    block on a stronger key first for open-scale feeds.

    Returns a Dataset (id_l, id_r, dist) sorted. NULL text matches
    nothing (dropped); ids must be int64.
    """
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.dedup import _pairwise_levenshtein

    if band_width <= max_dist:
        raise ValueError("band_width must exceed max_dist for "
                         "adjacent-band blocking to be complete")

    def explode(side: int):
        shifts = (-1, 0, 1) if side == 0 else (0,)

        def fn(t: pa.Table):
            t = t.filter(pc.is_valid(t[text_col]))
            pref = pc.utf8_slice_codeunits(
                pc.cast(t[text_col], pa.string()), 0, prefix_len)
            nbytes = pc.binary_length(pref).to_numpy(
                zero_copy_only=False)
            band = (nbytes // band_width).astype(np.int64)
            base = pa.table({
                "_id": pc.cast(t[id_col], pa.int64()),
                "_pref": pref,
                "_nb": pa.array(nbytes.astype(np.int64)),
                "_side": pa.array(
                    np.full(t.num_rows, side, dtype=np.int64)),
            })
            return pa.concat_tables([
                base.append_column("_band", pa.array(band + s))
                for s in shifts])

        return fn

    both = (left_ds.map_batches(skip_empty(explode(0)),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
            .union(right_ds.map_batches(skip_empty(explode(1)),
                                        batch_format="pyarrow",
                                        zero_copy_batch=True)))

    def per_band(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "id_l": np.asarray([], dtype=np.int64),
            "id_r": np.asarray([], dtype=np.int64),
            "dist": np.asarray([], dtype=np.int64),
        })
        g = g.sort_values(["_side", "_nb", "_id"]).reset_index(drop=True)
        side = g["_side"].to_numpy(dtype=np.int64)
        nl = int((side == 0).sum())
        nr = len(g) - nl
        if nl == 0 or nr == 0:
            return empty
        nb = g["_nb"].to_numpy(dtype=np.int64)
        nb_l, nb_r = nb[:nl], nb[nl:]
        lo = np.searchsorted(nb_r, nb_l - max_dist, side="left")
        hi = np.searchsorted(nb_r, nb_l + max_dist, side="right")
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        if total > max_band_pairs:
            raise ValueError(
                f"fuzzy_join: band generates {total} candidate pairs "
                f"> max_band_pairs={max_band_pairs} — block on a "
                "stronger key first")
        li = np.repeat(np.arange(nl), counts)
        starts = np.cumsum(counts) - counts
        rj = (np.arange(total) - np.repeat(starts, counts)
              + np.repeat(lo, counts)) + nl

        enc = [s.encode("utf-8") for s in g["_pref"].tolist()]
        lens = nb
        P = int(lens.max())
        mat = np.zeros((len(g), max(P, 1)), dtype=np.int16)
        if P:
            flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
            rows = np.repeat(np.arange(len(g)), lens)
            cols = (np.arange(int(lens.sum()))
                    - np.repeat(np.cumsum(lens) - lens, lens))
            mat[rows, cols] = flat
        res = _pairwise_levenshtein(mat[li], mat[rj],
                                    lens[li], lens[rj], P)
        ok = res <= max_dist
        if not ok.any():
            return empty
        ids = g["_id"].to_numpy()
        return pd.DataFrame({
            "id_l": ids[li[ok]].astype(np.int64),
            "id_r": ids[rj[ok]].astype(np.int64),
            "dist": res[ok].astype(np.int64),
        })

    return (both.groupby("_band").map_groups(
        per_band, batch_format="pandas").sort(["id_l", "id_r"]))


def fuzzy_join_sql(left_inner: str, right_inner: str,
                   max_dist: int = 2, prefix_len: int = 64) -> str:
    """Mirror: cross join + byte Levenshtein filter (DuckDB's
    ``levenshtein`` is byte-based, matching the engine's contract).
    ``left_inner``/``right_inner`` are relations with (id, text)."""
    return f"""
WITH L AS (SELECT id, substr(text, 1, {prefix_len}) AS p
           FROM {left_inner} WHERE text IS NOT NULL),
R AS (SELECT id, substr(text, 1, {prefix_len}) AS p
      FROM {right_inner} WHERE text IS NOT NULL)
SELECT L.id AS id_l, R.id AS id_r,
  CAST(levenshtein(L.p, R.p) AS BIGINT) AS dist
FROM L, R
WHERE abs(strlen(L.p) - strlen(R.p)) <= {max_dist}
  AND levenshtein(L.p, R.p) <= {max_dist}
ORDER BY id_l, id_r
""".strip()
