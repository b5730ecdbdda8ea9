"""Feature-engineering stages: wide pivot features and global
standardization — the "turn an event log into a per-entity feature
matrix" steps a training-data pipeline runs after routing/cleaning
(the reference stops at grouped collection, ``mirror/mirror.go:26-39``;
these are the analytical steps downstream of it).

Both operators are combiner-first: the pivot ships one wide row per
(key, block) through the shuffle; standardization ships two exact
integer moments per block and broadcasts two scalars back — the corpus
itself never moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pivot_counts(ds, key_col: str, pivot_col: str,
                 values: tuple[str, ...], final: str = "ray"):
    """Crosstab / wide pivot: one row per ``key_col``, one count column
    per *declared* pivot value (``n_<value>``) — the bounded-width
    contract that makes a distributed pivot safe (an undeclared value
    set would need a schema-defining extra pass; callers list the
    handful of columns they want, like SQL's ``FILTER`` clauses).

    Shape: per batch, one vectorized ``pc.equal`` + cast per value adds
    0/1 indicator columns, then :func:`grouped_agg`'s combiner collapses
    the batch to one wide partial row per key — the shuffle carries
    |keys-per-block| rows of small ints. ``final='ray'`` keeps the merge
    distributed for unbounded key cardinality (per-user features).
    """
    from fluent_server_ray.stages.aggregate import grouped_agg

    safe = [(v, f"n_{v}") for v in values]
    for v, _ in safe:
        if not v.replace("_", "").isalnum():
            raise ValueError(f"pivot value not identifier-safe: {v!r}")

    def indicators(t: pa.Table) -> pa.Table:
        cols = {key_col: t[key_col]}
        src = t[pivot_col]
        for v, name in safe:
            cols[name] = pc.cast(
                pc.fill_null(pc.equal(src, v), False), pa.int64()
            )
        return pa.table(cols)

    wide = ds.map_batches(indicators, batch_format="pyarrow",
                          zero_copy_batch=True)
    out = grouped_agg(wide, [key_col],
                      [(name, "sum") for _, name in safe], final=final)
    # grouped_agg names sums "<col>_sum" — restore the declared names
    rename = {f"{name}_sum": name for _, name in safe}
    if hasattr(out, "map_batches"):  # Dataset (final='ray')
        def rn(t: pa.Table) -> pa.Table:
            return t.rename_columns([rename.get(c, c) for c in t.column_names])

        return out.map_batches(rn, batch_format="pyarrow",
                               zero_copy_batch=True)
    return out.rename_columns([rename.get(c, c) for c in out.column_names])


def pivot_counts_sql(key_col: str, pivot_col: str,
                     values: tuple[str, ...], table: str = "events") -> str:
    cols = ", ".join(
        f"CAST(count(*) FILTER ({pivot_col} = '{v}') AS BIGINT) AS n_{v}"
        for v in values
    )
    return (f"SELECT {key_col}, {cols} FROM {table} "
            f"GROUP BY {key_col}")


# ------------------------------------------------ standardization

_SS_SPLIT = 1 << 30  # per-block sum-of-squares splits hi/lo so int64
# partials never overflow (cents^2 ≤ 2.5e15 fits; their per-block SUM
# does not) — the driver reassembles exact Python ints.

_F_SPLIT = 1 << 62  # big-int → double split radix shared with the SQL
# mirrors: see _split_float / _split_float_sql.


def _split_float(z: int) -> float:
    """Deterministic big-int → double, mirrored bit-for-bit by
    ``_split_float_sql``: ``sign · (float(|z| // 2^62)·2^62 +
    float(|z| % 2^62))``. Each int→double cast is on a value < 2^63
    (for |z| < 2^125), so both engines round it once and identically —
    this sidesteps DuckDB's HUGEINT→DOUBLE cast, whose double-rounding
    above 2^64 is the documented divergence class (NOTES round-4
    HHI/burstiness). For |z| < 2^62 this IS ``float(z)``. The tree has
    (up to) three roundings — hi, lo, and the sum — all IEEE
    round-to-nearest in both engines, hence deterministic parity
    rather than correctly-rounded floats; operators using it are
    cross-engine-exact but not last-ulp-true to ``float(z)``."""
    s = -1.0 if z < 0 else 1.0
    a = abs(z)
    return s * (float(a // _F_SPLIT) * 4611686018427387904.0
                + float(a % _F_SPLIT))


def _split_float_sql(expr: str) -> str:
    """The SQL twin of ``_split_float`` for a HUGEINT expression
    (|expr| must stay < 2^125 so the hi word fits BIGINT)."""
    return (f"(CASE WHEN ({expr}) < 0 THEN -1.0 ELSE 1.0 END * ("
            f"CAST(CAST(abs({expr}) // 4611686018427387904 AS BIGINT)"
            f" AS DOUBLE) * 4611686018427387904.0"
            f" + CAST(CAST(abs({expr}) % 4611686018427387904 AS BIGINT)"
            f" AS DOUBLE)))")


def _epoch_day(col):
    """timestamp → int64 days since 1970-01-01 — the shared day
    derivation of every calendar-bucketed operator (mirror:
    ``CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)``).
    NULL passes through as NULL: the CALLER's filter owns the
    NULL-ts contract (every daily op filters NULL ts, matching its
    mirror's ``ts IS NOT NULL``)."""
    return pc.cast(pc.cast(pc.cast(col, pa.date32(), safe=False),
                           pa.int32()), pa.int64())


def _cents(col):
    """round(x*100) → int64 cents — THE cross-engine exactness rule
    shared by every standardization pass and its SQL mirror
    (``CAST(round({col} * 100.0) AS BIGINT)``): half away from zero,
    because Arrow's default is half-to-even and SQL round() is not."""
    return pc.cast(
        pc.round(pc.multiply(col, 100.0),
                 round_mode="half_towards_infinity"),
        pa.int64(),
    )


def zscore(ds, value_col: str = "value", id_col: str = "event_id"):
    """Global z-score standardization of a 2-decimal numeric column in
    two passes: (1) combiner moments — per block one row of exact
    integer partials (n, sum(cents), sum(cents²) split hi/lo); (2) a
    broadcast-scalar map emits ``z = (cents - mean) / std``.

    Cross-engine float contract: both engines derive mean/std from the
    SAME exact integers with the SAME float64 expression tree
    (``float(s)/n``, ``float(ss)/n - mean*mean``, one sqrt), and z is
    one subtract + one divide per row — every step is a correctly
    rounded IEEE op on identical inputs, so the doubles match
    bit-for-bit with the SQL mirror (same discipline as doc_tfidf's
    integer-exact contract). NULL values carry NULL z (excluded from
    the moments).
    """
    def moments(t: pa.Table) -> pa.Table:
        cents = pc.drop_null(_cents(t[value_col])).to_numpy()
        sq = cents * cents
        return pa.table({
            "n": pa.array([len(cents)], type=pa.int64()),
            "s": pa.array([int(cents.sum())], type=pa.int64()),
            "ss_hi": pa.array([int((sq // _SS_SPLIT).sum())], type=pa.int64()),
            "ss_lo": pa.array([int((sq % _SS_SPLIT).sum())], type=pa.int64()),
        })

    parts = ds.map_batches(moments, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    n = sum(r["n"] for r in parts)
    if n == 0:
        raise ValueError(f"zscore: no non-NULL values in {value_col!r}")
    s = sum(r["s"] for r in parts)
    ss = sum(r["ss_hi"] for r in parts) * _SS_SPLIT \
        + sum(r["ss_lo"] for r in parts)
    import math

    mean = float(s) / float(n)
    var = float(ss) / float(n) - mean * mean
    # var can come out a TINY negative from float cancellation on
    # near-constant data — treat ≤ 0 as zero variance instead of
    # letting math.sqrt raise a domain error
    if var <= 0.0:
        raise ValueError("zscore: zero variance")
    std = math.sqrt(var)  # math.sqrt = IEEE correctly-rounded sqrt,
    # matching SQL sqrt() exactly (x ** 0.5 goes through pow and may
    # differ in the last ulp)

    def emit(t: pa.Table) -> pa.Table:
        z = pc.divide(
            pc.subtract(pc.cast(_cents(t[value_col]), pa.float64()), mean),
            std,
        )
        return pa.table({id_col: t[id_col], "z": z})

    return ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)


def zscore_sql(value_col: str = "value", id_col: str = "event_id",
               table: str = "events") -> str:
    """Mirror with the identical float64 expression tree (see
    :func:`zscore`'s contract)."""
    return f"""
WITH c AS (
  SELECT {id_col},
         CAST(round({value_col} * 100.0) AS BIGINT) AS cents
  FROM {table}
), m AS (
  SELECT CAST(sum(cents) AS DOUBLE) / CAST(count(cents) AS DOUBLE) AS mean,
         CAST(sum(cents * cents) AS DOUBLE)
           / CAST(count(cents) AS DOUBLE) AS ex2
  FROM c WHERE cents IS NOT NULL
)
SELECT {id_col},
       (CAST(cents AS DOUBLE) - mean) / sqrt(ex2 - mean * mean) AS z
FROM c, m
""".strip()


def grouped_zscore(ds, group_col: str = "event_type",
                   value_col: str = "value", id_col: str = "event_id"):
    """Per-group z-score — standardization *within* each group (the
    "normalize features per category" step), demonstrating the
    broadcast-small-aggregate-back-to-rows shape: pass 1 collects
    per-(block, group) exact integer moment partials (one Arrow
    ``group_by`` per batch, so the driver merge sees |groups|×|blocks|
    tiny rows, merged with arbitrary-precision Python ints); the
    per-group (mean, std) vectors then broadcast into a map-side
    lookup (``index_in`` + ``take``) — no row-level shuffle or join.

    Contract (matches the SQL mirror exactly): NULL value → NULL z;
    NULL group → NULL z (SQL's join-on-NULL no-match); a zero-variance
    group → NULL z for all its rows. Float derivation is the same
    bit-exact IEEE tree as :func:`zscore`.
    """
    import math

    def moments(t: pa.Table) -> pa.Table:
        cents = _cents(t[value_col])
        sq = pc.multiply(cents, cents)  # ≤ 2.5e15 per row — exact int64
        tmp = pa.table({
            group_col: t[group_col],
            "cents": cents,
            "sq_hi": pc.divide(sq, _SS_SPLIT),
            "sq_lo": pc.subtract(sq, pc.multiply(
                pc.divide(sq, _SS_SPLIT), _SS_SPLIT)),
        })
        out = tmp.group_by([group_col]).aggregate(
            [("cents", "sum"), ("cents", "count"),
             ("sq_hi", "sum"), ("sq_lo", "sum")]
        )
        return out.rename_columns([group_col, "s", "n", "ss_hi", "ss_lo"])

    parts = ds.map_batches(moments, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    acc: dict = {}
    for r in parts:
        g = r[group_col]
        if g is None:  # NULL group never standardizes (SQL join-on-NULL)
            continue
        n, s, hi, lo = acc.get(g, (0, 0, 0, 0))
        # a partial whose batch held only NULL values for this group
        # carries n=0 and None sums (Arrow sum of no values) — coalesce
        acc[g] = (n + r["n"], s + (r["s"] or 0),
                  hi + (r["ss_hi"] or 0), lo + (r["ss_lo"] or 0))

    groups, means, stds = [], [], []
    for g, (n, s, hi, lo) in acc.items():
        groups.append(g)
        if n == 0:
            means.append(None)
            stds.append(None)
            continue
        ss = hi * _SS_SPLIT + lo
        mean = float(s) / float(n)
        var = float(ss) / float(n) - mean * mean
        means.append(mean)
        stds.append(math.sqrt(var) if var > 0 else None)
    groups_arr = pa.array(groups, type=pa.string())
    mean_arr = pa.array(means, type=pa.float64())
    std_arr = pa.array(stds, type=pa.float64())

    def emit(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t[group_col], groups_arr)  # null grp → null idx
        mean_g = pc.take(mean_arr, idx)
        std_g = pc.take(std_arr, idx)
        z = pc.divide(
            pc.subtract(pc.cast(_cents(t[value_col]), pa.float64()), mean_g),
            std_g,
        )
        return pa.table({id_col: t[id_col], group_col: t[group_col], "z": z})

    return ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)


def grouped_zscore_sql(group_col: str = "event_type",
                       value_col: str = "value", id_col: str = "event_id",
                       table: str = "events") -> str:
    return f"""
WITH c AS (
  SELECT {id_col}, {group_col},
         CAST(round({value_col} * 100.0) AS BIGINT) AS cents
  FROM {table}
), m AS (
  SELECT {group_col},
         CAST(sum(cents) AS DOUBLE) / CAST(count(cents) AS DOUBLE) AS mean,
         CAST(sum(cents * cents) AS DOUBLE)
           / CAST(count(cents) AS DOUBLE) AS ex2
  FROM c WHERE cents IS NOT NULL AND {group_col} IS NOT NULL
  GROUP BY {group_col}
)
SELECT c.{id_col}, c.{group_col},
       CASE WHEN m.ex2 - m.mean * m.mean <= 0 THEN NULL
            ELSE (CAST(c.cents AS DOUBLE) - m.mean)
                   / sqrt(m.ex2 - m.mean * m.mean) END AS z
FROM c LEFT JOIN m ON c.{group_col} = m.{group_col}
""".strip()


def percentile_rank(ds, value_col: str = "value",
                    id_col: str = "event_id", lo: float = 0.0,
                    hi: float = 1000.0, bins: int = 1000):
    """Per-row percentile rank against the GLOBAL distribution —
    the CDF feature ("this event's value beats X% of the corpus").

    Bucket-level contract (deterministic, SQL-mirrorable — the same
    fixed-edge histogram rule as ``sketches.binned_quantiles``):
    ``pct = (# non-NULL values in strictly lower buckets) / n``. Pass 1
    builds the histogram from additive per-block bincount partials;
    the tiny cumulative vector then broadcasts into a pure map — two
    exact integers feed one IEEE division, so the doubles match the
    mirror bit-for-bit. NULL value → NULL pct.
    """
    import numpy as np

    from fluent_server_ray.stages.sketches import accumulate_histogram

    width = (hi - lo) / bins
    total = accumulate_histogram(ds, value_col, lo, hi, bins)
    n = int(total.sum())
    if n == 0:
        raise ValueError(f"percentile_rank: no non-NULL {value_col!r}")
    below = np.concatenate([[0], np.cumsum(total)[:-1]])  # strictly-lower
    below_f = below.astype(np.float64)  # exact: counts < 2^53

    def emit(t: pa.Table) -> pa.Table:
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        nanmask = np.isnan(vals)
        idx = np.clip(np.floor((np.nan_to_num(vals, nan=lo) - lo) / width)
                      .astype(np.int64), 0, bins - 1)
        pct = pa.array(below_f[idx] / float(n), type=pa.float64())
        out = pc.if_else(pa.array(nanmask), pa.scalar(None, pa.float64()),
                         pct)
        return pa.table({id_col: t[id_col], "pct": out})

    return ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)


def percentile_rank_sql(value_col: str = "value",
                        id_col: str = "event_id", lo: float = 0.0,
                        hi: float = 1000.0, bins: int = 1000,
                        table: str = "events") -> str:
    width = (hi - lo) / bins

    def bucket(col_ref: str) -> str:
        # one template, instantiated per reference — never a textual
        # rewrite of an already-built expression
        return (f"LEAST(GREATEST(CAST(floor(({col_ref} - {lo}) / {width})"
                f" AS BIGINT), 0), {bins - 1})")

    return f"""
WITH b AS (
  SELECT {bucket(value_col)} AS bucket_idx, count(*) AS c
  FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1
), cum AS (
  SELECT bucket_idx,
         sum(c) OVER (ORDER BY bucket_idx ROWS UNBOUNDED PRECEDING) - c
           AS below
  FROM b
), tot AS (SELECT sum(c) AS n FROM b)
SELECT t.{id_col},
       CASE WHEN t.{value_col} IS NULL THEN NULL
            ELSE CAST(cum.below AS DOUBLE) / CAST(tot.n AS DOUBLE) END
         AS pct
FROM {table} t
LEFT JOIN cum ON {bucket(f"t.{value_col}")} = cum.bucket_idx
CROSS JOIN tot
""".strip()


def rank_in_group(ds, group_col: str = "event_type",
                  value_col: str = "value", id_col: str = "event_id",
                  n_buckets: int = 64):
    """``dense_rank() OVER (PARTITION BY group ORDER BY value DESC)``
    as a distributed operator — the per-partition leaderboard feature
    (rank of an event's value within its type; rank of a doc's quality
    within its source, …).

    Shape: ONE hash-bucket exchange on the group key co-locates each
    partition, then the whole bucket ranks in two C kernels (pandas
    ``groupby.rank(method='dense')`` over every group in the bucket at
    once — never one Python group per key). NULL values rank NULLS
    LAST as SQL does: their rank is NULL here and the oracle filters
    identically (``dense_rank`` over a NULL-containing partition is
    engine-defined; the NULL-value rows emit NULL rank on both sides).
    Output: one row per input row (id, group, value, rk).
    """
    from fluent_server_ray.stages.assembly import _with_bucket

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: a NULL group is its own SQL partition
        rk = (g.groupby(group_col, sort=False, dropna=False)[value_col]
               .rank(method="dense", ascending=False))
        out = g[[id_col, group_col, value_col]].copy()
        # NULL values get NaN rank from pandas — keep as nullable int64
        out["rk"] = rk.astype("Int64")
        return out

    cols = [id_col, group_col, value_col]
    bucketed = _with_bucket(ds.select_columns(cols), group_col, n_buckets)
    out = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
    return out.sort(id_col)


def rank_in_group_sql(group_col: str = "event_type",
                      value_col: str = "value", id_col: str = "event_id",
                      table: str = "events") -> str:
    return f"""
SELECT {id_col}, {group_col}, {value_col},
  CASE WHEN {value_col} IS NULL THEN NULL
       ELSE CAST(dense_rank() OVER (
              PARTITION BY {group_col}
              ORDER BY CASE WHEN {value_col} IS NULL THEN 1 ELSE 0 END,
                       {value_col} DESC) AS BIGINT)
  END AS rk
FROM {table}
ORDER BY {id_col}
""".strip()


def grouped_topk_counts(ds, group_col: str = "event_type",
                        value_col: str = "user_id", k: int = 5,
                        n_buckets: int = 64) -> pa.Table:
    """Per-group top-``k`` values by occurrence count (the "top talkers
    per category" report — per-tag top hosts, per-tool top users).

    Exact at unbounded (group, value) cardinality: per-batch Arrow
    count combiner → ``grouped_agg(final='ray')`` merge (one
    exchange) → per-BLOCK per-group top-k partials (each global
    winner is necessarily in its own block's per-group top-k, so the
    union of block partials contains the answer) → an O(blocks·groups
    ·k) driver merge re-ranks. Ties break (n desc, value asc). Output
    (group, value, n, rank), sorted."""
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def partial(t: pa.Table) -> pa.Table:
        out = (t.select([group_col, value_col])
               .group_by([group_col, value_col])
               .aggregate([([], "count_all")]))
        return out.rename_columns([group_col, value_col, "n"])

    counts = grouped_agg(
        ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True),
        [group_col, value_col], [("n", "sum")], final="ray",
    )

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            [group_col, "n_sum", value_col],
            ascending=[True, False, True])
        return pa.Table.from_pandas(
            df.groupby(group_col, sort=False).head(k),
            preserve_index=False)

    parts = list(
        counts.map_batches(skip_empty(local_topk), batch_format="pyarrow",
                           zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    empty = pa.table({group_col: pa.array([], type=pa.string()),
                      value_col: pa.array([], type=pa.int64()),
                      "n": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64())})
    if not parts:
        return empty
    merged = pa.concat_tables(parts).to_pandas()
    if merged.empty:
        return empty
    merged = merged.sort_values([group_col, "n_sum", value_col],
                                ascending=[True, False, True])
    top = merged.groupby(group_col, sort=False).head(k).copy()
    top["rank"] = top.groupby(group_col, sort=False).cumcount() + 1
    return pa.table({
        group_col: pa.array(top[group_col].to_numpy(), type=pa.string()),
        value_col: pa.array(top[value_col].to_numpy(dtype=np.int64)),
        "n": pa.array(top["n_sum"].to_numpy(dtype=np.int64)),
        "rank": pa.array(top["rank"].to_numpy(dtype=np.int64)),
    })


def grouped_topk_counts_sql(group_col: str = "event_type",
                            value_col: str = "user_id", k: int = 5,
                            table: str = "events") -> str:
    return f"""
WITH c AS (
  SELECT {group_col}, {value_col}, count(*) AS n
  FROM {table} GROUP BY {group_col}, {value_col}
), r AS (
  SELECT {group_col}, {value_col}, CAST(n AS BIGINT) AS n,
    CAST(row_number() OVER (
      PARTITION BY {group_col} ORDER BY n DESC, {value_col}
    ) AS BIGINT) AS rank
  FROM c
)
SELECT * FROM r WHERE rank <= {int(k)}
ORDER BY {group_col}, rank
""".strip()


def winsorize_by_group(ds, group_col: str = "event_type",
                       value_col: str = "value",
                       id_col: str = "event_id",
                       lo: float = 0.0, hi: float = 500.0,
                       bins: int = 500,
                       q_lo: float = 0.05, q_hi: float = 0.95):
    """Per-group quantile capping (winsorization) — the outlier
    treatment of feature pipelines: clamp each value into its group's
    [q_lo, q_hi] band.

    Two-pass global-statistic-then-map shape (cf.
    ``textstats.token_filter_above_quantile``): pass 1 computes the
    per-group thresholds with the additive histogram sketch
    (integer-exact bin rule → the SQL mirror reproduces the thresholds
    bit-for-bit); the bounded (groups × 2) threshold table then
    broadcasts into a pure clamp map. NULL values stay NULL; rows of a
    group with no histogram (all-NULL values) drop, matching the SQL
    inner join. Output (id, group, value, value_w)."""
    from fluent_server_ray.stages.sketches import grouped_binned_quantiles

    thr = grouped_binned_quantiles(ds, group_col, value_col, lo, hi,
                                   bins, qs=(q_lo, q_hi))
    lo_map: dict = {}
    hi_map: dict = {}
    for g, q, bl in zip(thr[group_col].to_pylist(),
                        thr["q"].to_pylist(),
                        thr["bucket_lo"].to_pylist()):
        (lo_map if q == q_lo else hi_map)[g] = bl
    groups = sorted(lo_map)
    g_arr = pa.array(groups, type=pa.string())
    lo_arr = pa.array([lo_map[g] for g in groups], type=pa.float64())
    hi_arr = pa.array([hi_map[g] for g in groups], type=pa.float64())

    def clamp(t: pa.Table) -> pa.Table:
        g = pc.fill_null(pc.cast(t[group_col], pa.string()), "")
        idx = pc.index_in(g, g_arr)
        has = pc.is_valid(idx)
        lo_t = pc.take(lo_arr, idx)
        hi_t = pc.take(hi_arr, idx)
        v = pc.cast(t[value_col], pa.float64())
        clamped = pc.min_element_wise(
            pc.max_element_wise(v, lo_t), hi_t)
        # NULL value must stay NULL (min/max_element_wise skip nulls)
        clamped = pc.if_else(pc.is_valid(v), clamped,
                             pa.scalar(None, type=pa.float64()))
        out = pa.table({
            id_col: t[id_col],
            group_col: t[group_col],
            value_col: t[value_col],
            "value_w": clamped,
        })
        return out.filter(has)  # group without thresholds: inner join

    return ds.map_batches(clamp, batch_format="pyarrow",
                          zero_copy_batch=True)


def winsorize_by_group_sql(group_col: str = "event_type",
                           value_col: str = "value",
                           id_col: str = "event_id",
                           lo: float = 0.0, hi: float = 500.0,
                           bins: int = 500,
                           q_lo: float = 0.05, q_hi: float = 0.95,
                           table: str = "events") -> str:
    from fluent_server_ray.stages.sketches import grouped_binned_quantiles_sql

    qsql = grouped_binned_quantiles_sql(group_col, value_col, lo, hi,
                                        bins, qs=(q_lo, q_hi),
                                        table=table)
    return f"""
WITH qq AS (
  {qsql}
), thr AS (
  SELECT {group_col} AS g,
    max(CASE WHEN q = {q_lo} THEN bucket_lo END) AS lo_t,
    max(CASE WHEN q = {q_hi} THEN bucket_lo END) AS hi_t
  FROM qq GROUP BY {group_col}
)
SELECT e.{id_col}, e.{group_col}, e.{value_col},
  CASE WHEN e.{value_col} IS NULL THEN NULL
       ELSE LEAST(GREATEST(CAST(e.{value_col} AS DOUBLE), thr.lo_t),
                  thr.hi_t) END AS value_w
FROM {table} e
JOIN thr ON COALESCE(CAST(e.{group_col} AS VARCHAR), '') = thr.g
""".strip()


def psi_drift(ds_a, ds_b, group_col: str = "event_type",
              value_col: str = "value", lo: float = 0.0,
              hi: float = 500.0, bins: int = 50):
    """Population Stability Index between two cohorts of the same
    stream (deploy A vs deploy B, week 1 vs week 2) per group — the
    standard drift monitor: PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b),
    with add-one smoothing so empty bins stay finite. Rule of thumb:
    < 0.1 stable, 0.1–0.25 moderate, > 0.25 drifted.

    Each cohort reduces to per-(group, bin) INTEGER histogram partials
    (the additive-sketch combiner — the only thing that crosses the
    cluster); the PSI derivation floors each bin's float term to
    millionths so the Σ is an order-free int64 and the SQL mirror is
    bit-exact. Output: (group, psi_millionths) sorted."""
    import math

    from fluent_server_ray.stages.sketches import grouped_binned_quantiles

    def hist(ds):
        # reuse the grouped histogram combiner via its public builder:
        # bin counts per group (we ignore the quantile rows and rebuild
        # from raw bincounts below for clarity / exactness)
        from fluent_server_ray.stages.aggregate import (grouped_counts,
                                                        skip_empty)

        width = (hi - lo) / bins

        def binify(t: pa.Table) -> pa.Table:
            import numpy as np

            v = t[value_col].to_numpy(zero_copy_only=False)
            ok = ~np.isnan(v)
            idx = np.clip(np.floor((v[ok] - lo) / width), 0,
                          bins - 1).astype(np.int64)
            g = t[group_col].to_numpy(zero_copy_only=False)[ok]
            return pa.table({
                group_col: pa.array(g, type=pa.string()),
                "bin": pa.array(idx),
            })

        return grouped_counts(
            ds.map_batches(skip_empty(binify), batch_format="pyarrow",
                           zero_copy_batch=True),
            [group_col, "bin"],
        )

    ha, hb = hist(ds_a), hist(ds_b)

    def to_map(h):
        out: dict = {}
        for g, b, n in zip(h[group_col].to_pylist(),
                           h["bin"].to_pylist(), h["n"].to_pylist()):
            out[(g, int(b))] = int(n)
        return out

    ma, mb = to_map(ha), to_map(hb)
    groups = sorted({g for g, _ in ma} | {g for g, _ in mb})
    out_g, out_psi = [], []
    for g in groups:
        na = sum(v for (gg, _), v in ma.items() if gg == g)
        nb = sum(v for (gg, _), v in mb.items() if gg == g)
        total = 0
        for b in range(bins):
            ca = ma.get((g, b), 0) + 1  # add-one smoothing
            cb = mb.get((g, b), 0) + 1
            pa_ = float(ca) / float(na + bins)
            pb_ = float(cb) / float(nb + bins)
            total += math.floor((pa_ - pb_) * math.log(pa_ / pb_)
                                * 1_000_000.0)
        out_g.append(g)
        out_psi.append(total)
    return pa.table({group_col: pa.array(out_g, type=pa.string()),
                     "psi_millionths": pa.array(out_psi,
                                                type=pa.int64())})


def psi_drift_sql(pred_a: str, pred_b: str,
                  group_col: str = "event_type",
                  value_col: str = "value", lo: float = 0.0,
                  hi: float = 500.0, bins: int = 50,
                  table: str = "events") -> str:
    """Mirror over two WHERE-predicates selecting the cohorts."""
    width = (hi - lo) / bins

    def hist_cte(name, pred):
        return f"""{name} AS (
  SELECT {group_col} AS g,
    LEAST(GREATEST(CAST(floor(({value_col} - {lo}) / {width}) AS BIGINT),
                   0), {bins - 1}) AS bin,
    count(*) AS c
  FROM {table} WHERE {value_col} IS NOT NULL AND ({pred})
  GROUP BY 1, 2
)"""

    return f"""
WITH {hist_cte('a', pred_a)}, {hist_cte('b', pred_b)},
grids AS (
  SELECT g, gs AS bin FROM (SELECT DISTINCT g FROM (
      SELECT g FROM a UNION ALL SELECT g FROM b))
  CROSS JOIN unnest(generate_series(0, {bins - 1})) AS u(gs)
), na AS (SELECT g, sum(c) AS n FROM a GROUP BY g),
nb AS (SELECT g, sum(c) AS n FROM b GROUP BY g),
terms AS (
  SELECT grids.g, grids.bin,
    (CAST(COALESCE(a.c, 0) + 1 AS DOUBLE)
       / CAST(COALESCE(na.n, 0) + {bins} AS DOUBLE)) AS pa,
    (CAST(COALESCE(b.c, 0) + 1 AS DOUBLE)
       / CAST(COALESCE(nb.n, 0) + {bins} AS DOUBLE)) AS pb
  FROM grids
  LEFT JOIN a ON a.g = grids.g AND a.bin = grids.bin
  LEFT JOIN b ON b.g = grids.g AND b.bin = grids.bin
  LEFT JOIN na ON na.g = grids.g
  LEFT JOIN nb ON nb.g = grids.g
)
SELECT g AS {group_col},
  CAST(sum(CAST(floor((pa - pb) * ln(pa / pb) * 1000000.0) AS BIGINT))
       AS BIGINT) AS psi_millionths
FROM terms GROUP BY g ORDER BY g
""".strip()


def profile_table(ds_factory, columns: list[str]) -> pa.Table:
    """Dataset profiling card — per column: (column, n_rows, n_nulls,
    n_distinct). The pre-flight a pipeline run records next to its
    output (schema drift, null regressions, key-cardinality checks).

    ``ds_factory``: zero-arg callable returning a fresh Dataset (Ray
    re-executes upstream per consumer, so the caller hands us the
    recipe, not a Dataset that would silently re-run anyway).

    Shape: one pruned pass computes n_rows + every column's null count
    (per-batch int partials, O(columns) per block, driver sum); then
    ONE exact two-level distinct per column
    (:func:`sketches.exact_distinct_count` — only distinct values
    shuffle). Cost is deliberately |columns|+1 passes: profile the
    columns you need at 100 TB, not `*`. Float columns are accepted
    (Arrow's group_by and SQL count(DISTINCT) agree on IEEE equality
    for non-NaN data; NaN handling is engine-defined — profile ids /
    categories, not measure columns, if NaNs are possible).
    """
    from fluent_server_ray.stages.sketches import exact_distinct_count

    def null_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_rows": pa.array([len(t)], type=pa.int64()),
            **{f"nn_{c}": pa.array([t[c].null_count], type=pa.int64())
               for c in columns},
        })

    n_rows = 0
    nulls = {c: 0 for c in columns}
    for b in (ds_factory().select_columns(list(columns))
              .map_batches(null_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        n_rows += int(pc.sum(b["n_rows"]).as_py() or 0)
        for c in columns:
            nulls[c] += int(pc.sum(b[f"nn_{c}"]).as_py() or 0)

    distinct = {
        c: exact_distinct_count(
            ds_factory().select_columns([c]), c)
        for c in columns
    }
    cols = sorted(columns)
    return pa.table({
        "column": pa.array(cols, type=pa.string()),
        "n_rows": pa.array([n_rows] * len(cols), type=pa.int64()),
        "n_nulls": pa.array([nulls[c] for c in cols], type=pa.int64()),
        "n_distinct": pa.array([distinct[c] for c in cols],
                               type=pa.int64()),
    })


def profile_table_sql(columns: list[str], table: str = "events") -> str:
    selects = [
        f"SELECT '{c}' AS column, CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(count(*) - count({c}) AS BIGINT) AS n_nulls, "
        f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct FROM {table}"
        for c in sorted(columns)
    ]
    return "\nUNION ALL\n".join(selects) + '\nORDER BY "column"'


def pearson_corr(ds, x_col: str, y_col: str) -> pa.Table:
    """Exact-partials Pearson correlation of two INTEGER columns —
    the corpus-health correlation check (length vs tokens, score vs
    size) as one combiner pass: per block one row of sums
    (n, Σx, Σy, Σxy, Σx², Σy²) carried as DECIMAL STRINGS so a block
    whose Σx² exceeds int64 stays exact (the vectorized int64 path is
    used only when ``n·max|x|·max|y| < 2^63`` proves it safe; else the
    block falls back to numpy object-dtype python-int sums),
    python-int driver merge (overflow-free at any scale), then the
    ``n·Σxy − Σx·Σy`` / ``n·Σx² − (Σx)²`` subtractions in EXACT
    integer arithmetic (float64 would catastrophically cancel for
    large-magnitude columns) with ONE declared float64 division tree
    at the end — evaluated from the same exact integers the SQL
    mirror subtracts in HUGEINT, so the double matches bit-for-bit
    (the zscore/doc_tfidf contract).
    Rows with a NULL in either column are excluded (SQL corr
    semantics). Output: one row (n, corr)."""
    import math

    def moments(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t[x_col]), pc.is_valid(t[y_col]))
        sub = t.filter(mask)
        x = sub[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = sub[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x):
            # NOT np.abs().max(): np.abs(INT64_MIN) wraps to itself,
            # which would under-report the peak and misroute an
            # unsafe block onto the int64 fast path.
            mx = max(int(x.max()), -int(x.min()))
            my = max(int(y.max()), -int(y.min()))
            peak = max(mx * my, mx * mx, my * my)
            if len(x) * max(peak, 1) >= (1 << 63):
                # int64 products/sums could wrap silently — redo the
                # block with python-int (object-dtype) arithmetic.
                x = x.astype(object)
                y = y.astype(object)
        sums = [int(x.sum()) if len(x) else 0,
                int(y.sum()) if len(y) else 0,
                int((x * y).sum()) if len(x) else 0,
                int((x * x).sum()) if len(x) else 0,
                int((y * y).sum()) if len(y) else 0]
        return pa.table({
            "n": pa.array([len(x)], type=pa.int64()),
            "sx": pa.array([str(sums[0])], type=pa.string()),
            "sy": pa.array([str(sums[1])], type=pa.string()),
            "sxy": pa.array([str(sums[2])], type=pa.string()),
            "sxx": pa.array([str(sums[3])], type=pa.string()),
            "syy": pa.array([str(sums[4])], type=pa.string()),
        })

    n = sx = sy = sxy = sxx = syy = 0
    for r in (ds.map_batches(moments, batch_format="pyarrow",
                             zero_copy_batch=True)
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        n += int(pc.sum(r["n"]).as_py() or 0)
        sx += sum(int(v) for v in r["sx"].to_pylist())
        sy += sum(int(v) for v in r["sy"].to_pylist())
        sxy += sum(int(v) for v in r["sxy"].to_pylist())
        sxx += sum(int(v) for v in r["sxx"].to_pylist())
        syy += sum(int(v) for v in r["syy"].to_pylist())
    if n == 0:
        raise ValueError("pearson_corr: no complete rows")
    # n·Σxy − Σx·Σy in EXACT integer arithmetic before any float
    # conversion: for large-magnitude columns the two terms agree to
    # >15 digits and a float64 subtraction cancels to garbage (the
    # mirror does the same subtraction in HUGEINT).
    num_i = n * sxy - sx * sy
    vx_i = n * sxx - sx * sx
    vy_i = n * syy - sy * sy
    if vx_i <= 0 or vy_i <= 0:
        # degenerate (constant) column: the mirror's division by
        # sqrt(0) yields NULL in DuckDB — emit NULL, don't raise (a
        # REGULAR graph makes assortativity's endpoint degrees
        # constant at corpus scale; found by the sf0.1 battery)
        corr = None
    else:
        corr = (float(num_i)
                / (math.sqrt(float(vx_i)) * math.sqrt(float(vy_i))))
    return pa.table({"n": pa.array([n], type=pa.int64()),
                     "corr": pa.array([corr], type=pa.float64())})


def pearson_corr_sql(x_expr: str, y_expr: str, table: str,
                     where: str = "TRUE") -> str:
    """Mirror: same integer sums, the n·Σxy − Σx·Σy subtractions in
    HUGEINT (exact, like the engine's python ints — a DOUBLE
    subtraction would cancel for large-magnitude columns), then the
    same float64 division tree (NOT SQL corr(), whose internal
    accumulation order is engine-defined). The exact integers enter
    float64 via HUGEINT→VARCHAR→DOUBLE: DuckDB's string→double parse
    is correctly rounded like Python's float(int), whereas its direct
    HUGEINT→DOUBLE cast is off by 1 ulp for ~1% of >64-bit values
    (measured: 33/2000 random 64–126-bit ints)."""
    return f"""
WITH src AS (
  SELECT {x_expr} AS x, {y_expr} AS y FROM {table} WHERE {where}
), filt AS (
  SELECT CAST(x AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y
  FROM src WHERE x IS NOT NULL AND y IS NOT NULL
), s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
    sum(x) AS sx, sum(y) AS sy,
    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM filt
)
SELECT CAST(n AS BIGINT) AS n,
  CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
  / (sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
     * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE))) AS corr
FROM s
""".strip()


def grouped_ols_trend(ds, group_col: str = "event_type",
                      x_col: str = "x", y_col: str = "y") -> pa.Table:
    """Per-group OLS trend line of two INTEGER columns — "is this
    sink's value drifting over time?" as one combiner pass
    (:func:`pearson_corr`'s exact-partial discipline, generalized to
    groups): per block one row of sums per group (n, Σx, Σy, Σxy,
    Σx²) carried as DECIMAL STRINGS (int64 fast path only when the
    block-level ``n·peak`` bound proves products safe; else the block
    redoes its sums in python-int object dtype), a python-int driver
    merge over the bounded group set, then

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)

    with numerators/denominator in EXACT ints and ONE float64
    division each (the SQL mirror subtracts in HUGEINT and parses via
    VARCHAR→DOUBLE, the correctly-rounded path). Rows with a NULL in
    either column are excluded per group; a zero-x-variance group
    gets NULL slope/intercept (SQL ``nullif``). Output: one row per
    group (group, n, slope, intercept), sorted by group.
    """
    import pandas as pd

    def moments(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t[x_col]), pc.is_valid(t[y_col]))
        sub = t.filter(mask)
        g = sub[group_col].to_pandas()
        x = sub[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = sub[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x):
            mx = max(int(x.max()), -int(x.min()))
            my = max(int(y.max()), -int(y.min()))
            peak = max(mx * my, mx * mx, my * my)
            if len(x) * max(peak, 1) >= (1 << 63):
                x = x.astype(object)
                y = y.astype(object)
        df = pd.DataFrame({"g": g, "x": x, "y": y,
                           "xy": x * y, "xx": x * x})
        agg = df.groupby("g", dropna=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum")).reset_index()
        gvals = [None if (v is None or v != v) else str(v)
                 for v in agg["g"]]
        return pa.table({
            group_col: pa.array(gvals, type=pa.string()),
            "n": pa.array(agg["n"].to_numpy(dtype="int64")),
            "sx": pa.array([str(int(v)) for v in agg["sx"]]),
            "sy": pa.array([str(int(v)) for v in agg["sy"]]),
            "sxy": pa.array([str(int(v)) for v in agg["sxy"]]),
            "sxx": pa.array([str(int(v)) for v in agg["sxx"]]),
        })

    from fluent_server_ray.stages.aggregate import skip_empty

    acc: dict[str, list[int]] = {}
    for r in (ds.map_batches(skip_empty(moments), batch_format="pyarrow",
                             zero_copy_batch=True)
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        for gv, n, sx, sy, sxy, sxx in zip(
                r[group_col].to_pylist(), r["n"].to_pylist(),
                r["sx"].to_pylist(), r["sy"].to_pylist(),
                r["sxy"].to_pylist(), r["sxx"].to_pylist()):
            a = acc.setdefault(gv, [0, 0, 0, 0, 0])
            a[0] += int(n)
            a[1] += int(sx)
            a[2] += int(sy)
            a[3] += int(sxy)
            a[4] += int(sxx)

    # SQL ORDER BY: NULL group sorts last (DuckDB NULLS LAST)
    groups = sorted(k for k in acc if k is not None)
    if None in acc:
        groups.append(None)
    ns, slopes, icepts = [], [], []
    for gv in groups:
        n, sx, sy, sxy, sxx = acc[gv]
        den = n * sxx - sx * sx
        ns.append(n)
        if den == 0:
            slopes.append(None)
            icepts.append(None)
        else:
            slopes.append(float(n * sxy - sx * sy) / float(den))
            icepts.append(float(sy * sxx - sx * sxy) / float(den))
    return pa.table({
        group_col: pa.array(groups, type=pa.string()),
        "n": pa.array(ns, type=pa.int64()),
        "slope": pa.array(slopes, type=pa.float64()),
        "intercept": pa.array(icepts, type=pa.float64()),
    })


def grouped_ols_trend_sql(group_col: str, x_expr: str, y_expr: str,
                          table: str, where: str = "TRUE") -> str:
    return f"""
WITH src AS (
  SELECT CAST({group_col} AS VARCHAR) AS g, {x_expr} AS x, {y_expr} AS y
  FROM {table} WHERE {where}
), filt AS (
  SELECT g, CAST(x AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y
  FROM src WHERE x IS NOT NULL AND y IS NOT NULL
), s AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n,
    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM filt GROUP BY g
)
SELECT g AS {group_col}, CAST(n AS BIGINT) AS n,
  CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
    / nullif(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE), 0.0)
    AS slope,
  CAST(CAST(sy * sxx - sx * sxy AS VARCHAR) AS DOUBLE)
    / nullif(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE), 0.0)
    AS intercept
FROM s ORDER BY g
""".strip()


def welch_ttest(ds, group_col: str, value_col: str,
                group_a: str, group_b: str) -> pa.Table:
    """Welch's unequal-variance two-sample t-test between two groups'
    values — the A/B experiment readout ("did the new sink change the
    metric?") as ONE combiner pass: per block, exact integer
    (n, Σy, Σy²) partials per group over value-MICROS (decimal-string
    transport with the bound-checked int64 fast path — the
    :func:`pearson_corr` discipline), a python-int driver merge, then
    the statistic in ONE shared float64 expression tree::

        v    = (n·Σy² − (Σy)²) / (n·(n−1))        (sample variance)
        se²  = v_a/n_a + v_b/n_b
        t    = (ȳ_a − ȳ_b) / √se²
        df   = se²² / ((v_a/n_a)²/(n_a−1) + (v_b/n_b)²/(n_b−1))

    where every exact-int → float64 conversion is round-to-nearest
    (the SQL mirror's VARCHAR→DOUBLE path) and the op order matches
    the mirror token-for-token. NULL values are excluded; a group
    with n < 2 or zero pooled variance yields NULL t/df (SQL
    ``nullif``). Output: ONE row
    (n_a, n_b, mean_a, mean_b, t_stat, welch_df).
    """
    import math

    import pandas as pd

    from fluent_server_ray.stages.aggregate import skip_empty

    def moments(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_valid(t[value_col]),
            pc.is_in(pc.cast(t[group_col], pa.string()),
                     value_set=pa.array([group_a, group_b])))
        sub = t.filter(keep)
        g = pc.cast(sub[group_col], pa.string()).to_pandas()
        y = pc.cast(pc.floor(pc.multiply(
            pc.cast(sub[value_col], pa.float64()),
            pa.scalar(1_000_000.0))), pa.int64()
        ).to_numpy(zero_copy_only=False)
        if len(y):
            peak = max(int(y.max()), -int(y.min()))
            if len(y) * max(peak * peak, 1) >= (1 << 63):
                y = y.astype(object)
        df = pd.DataFrame({"g": g, "y": y, "yy": y * y})
        agg = df.groupby("g").agg(
            n=("y", "size"), sy=("y", "sum"),
            syy=("yy", "sum")).reset_index()
        return pa.table({
            "g": pa.array(agg["g"], type=pa.string()),
            "n": pa.array(agg["n"].to_numpy(dtype="int64")),
            "sy": pa.array([str(int(v)) for v in agg["sy"]]),
            "syy": pa.array([str(int(v)) for v in agg["syy"]]),
        })

    acc: dict[str, list[int]] = {group_a: [0, 0, 0], group_b: [0, 0, 0]}
    for r in (ds.map_batches(skip_empty(moments), batch_format="pyarrow",
                             zero_copy_batch=True)
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        for gv, n, sy, syy in zip(r["g"].to_pylist(), r["n"].to_pylist(),
                                  r["sy"].to_pylist(),
                                  r["syy"].to_pylist()):
            a = acc[gv]
            a[0] += int(n)
            a[1] += int(sy)
            a[2] += int(syy)

    def stats(n: int, sy: int, syy: int):
        if n < 2:
            return None, None
        mean = float(sy) / float(n)
        var = float(n * syy - sy * sy) / (float(n) * float(n - 1))
        return mean, var

    na, sya, syya = acc[group_a]
    nb, syb, syyb = acc[group_b]
    ma, va = stats(na, sya, syya)
    mb, vb = stats(nb, syb, syyb)
    t_stat = df_w = None
    if va is not None and vb is not None:
        van = va / float(na)
        vbn = vb / float(nb)
        se2 = van + vbn
        if se2 != 0.0:
            t_stat = (ma - mb) / math.sqrt(se2)
            den = (van * van / float(na - 1)
                   + vbn * vbn / float(nb - 1))
            df_w = (se2 * se2) / den if den != 0.0 else None
    return pa.table({
        "n_a": pa.array([na], type=pa.int64()),
        "n_b": pa.array([nb], type=pa.int64()),
        "mean_a": pa.array([ma], type=pa.float64()),
        "mean_b": pa.array([mb], type=pa.float64()),
        "t_stat": pa.array([t_stat], type=pa.float64()),
        "welch_df": pa.array([df_w], type=pa.float64()),
    })


def welch_ttest_sql(group_col: str, value_expr: str, group_a: str,
                    group_b: str, table: str) -> str:
    def side(g: str, tag: str) -> str:
        return f"""
s_{tag} AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, sum(y) AS sy, sum(y * y) AS syy
  FROM f WHERE g = '{g}'
)""".strip()

    # exact-int → double via the correctly-rounded VARCHAR path;
    # op order mirrors welch_ttest token-for-token
    def mean(tag: str) -> str:
        return (f"CAST(CAST(s_{tag}.sy AS VARCHAR) AS DOUBLE)"
                f" / CAST(s_{tag}.n AS DOUBLE)")

    def var(tag: str) -> str:
        return (f"(CAST(CAST(s_{tag}.n * s_{tag}.syy - s_{tag}.sy *"
                f" s_{tag}.sy AS VARCHAR) AS DOUBLE)"
                f" / (CAST(s_{tag}.n AS DOUBLE)"
                f" * CAST(s_{tag}.n - 1 AS DOUBLE)))")

    van = f"({var('a')} / CAST(s_a.n AS DOUBLE))"
    vbn = f"({var('b')} / CAST(s_b.n AS DOUBLE))"
    se2 = f"({van} + {vbn})"
    return f"""
WITH f AS (
  SELECT CAST({group_col} AS VARCHAR) AS g,
    CAST({value_expr} AS HUGEINT) AS y
  FROM {table}
  WHERE CAST({group_col} AS VARCHAR) IN ('{group_a}', '{group_b}')
    AND {value_expr} IS NOT NULL
), {side(group_a, 'a')}, {side(group_b, 'b')}
SELECT
  CAST(s_a.n AS BIGINT) AS n_a,
  CAST(s_b.n AS BIGINT) AS n_b,
  CASE WHEN s_a.n >= 2 THEN {mean('a')} END AS mean_a,
  CASE WHEN s_b.n >= 2 THEN {mean('b')} END AS mean_b,
  CASE WHEN s_a.n >= 2 AND s_b.n >= 2 THEN
    ({mean('a')} - {mean('b')}) / nullif(sqrt({se2}), 0.0)
  END AS t_stat,
  CASE WHEN s_a.n >= 2 AND s_b.n >= 2 THEN
    ({se2} * {se2})
      / nullif({van} * {van} / CAST(s_a.n - 1 AS DOUBLE)
               + {vbn} * {vbn} / CAST(s_b.n - 1 AS DOUBLE), 0.0)
  END AS welch_df
FROM s_a CROSS JOIN s_b
""".strip()


def robust_outliers(ds, group_col: str = "event_type",
                    value_col: str = "value", id_col: str = "event_id",
                    k: float = 3.0):
    """Median/MAD robust outlier detection per group — the
    skew-immune sibling of the mean/std z-flag (one mass-duplicated
    boilerplate value drags a mean, not a median): a row is an
    outlier when ``|v − median| > k · MAD`` with
    ``MAD = median(|v − median|)`` and ``MAD > 0``.

    Three passes, each bounded: EXACT per-group median via
    :func:`~fluent_server_ray.stages.aggregate.grouped_exact_median`
    (distributed selection over (key, value) counts, DuckDB
    ``median()`` semantics), broadcast of the |groups|-sized median
    map, the same selection over the absolute deviations, then a pure
    filter pass. The deviation column rides a materialized
    (id, group, value, ad) projection — O(rows·32B) in the object
    store, never the driver. NULL values and NULL group keys are
    excluded (the SQL join/WHERE mirror). Returns a Dataset
    (id, group, value) of outliers sorted by id.
    """
    from fluent_server_ray.stages.aggregate import (grouped_exact_median,
                                                    skip_empty)

    def keep_valid(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.is_valid(t[value_col]),
                                pc.is_valid(t[group_col])))

    base = ds.map_batches(skip_empty(keep_valid),
                          batch_format="pyarrow", zero_copy_batch=True)

    meds_tbl = pa.concat_tables(
        grouped_exact_median(base, group_col, value_col)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    med_keys = meds_tbl[group_col].combine_chunks()
    med_vals = meds_tbl["median"].combine_chunks()

    def with_ad(t: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(t[group_col], pa.string()),
                          value_set=med_keys)
        med = pc.take(med_vals, idx)
        ad = pc.abs(pc.subtract(pc.cast(t[value_col], pa.float64()),
                                med))
        return pa.table({
            id_col: t[id_col],
            group_col: t[group_col],
            value_col: t[value_col],
            "_ad": ad,
        })

    dev = base.map_batches(skip_empty(with_ad), batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    mads_tbl = pa.concat_tables(
        grouped_exact_median(dev, group_col, "_ad")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    mad_keys = mads_tbl[group_col].combine_chunks()
    mad_vals = mads_tbl["median"].combine_chunks()

    def flag(t: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(t[group_col], pa.string()),
                          value_set=mad_keys)
        mad = pc.take(mad_vals, idx)
        keep = pc.and_(pc.greater(mad, pa.scalar(0.0)),
                       pc.greater(t["_ad"],
                                  pc.multiply(pa.scalar(float(k)), mad)))
        out = t.filter(pc.fill_null(keep, False))
        return out.select([id_col, group_col, value_col])

    return dev.map_batches(skip_empty(flag), batch_format="pyarrow",
                           zero_copy_batch=True).sort(id_col)


def robust_outliers_sql(group_col: str = "event_type",
                        value_col: str = "value",
                        id_col: str = "event_id", k: float = 3.0,
                        table: str = "events") -> str:
    return f"""
WITH m AS (
  SELECT {group_col}, median({value_col}) AS med
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {group_col} IS NOT NULL
  GROUP BY 1
), d AS (
  SELECT e.{id_col}, e.{group_col}, e.{value_col},
    abs(CAST(e.{value_col} AS DOUBLE) - m.med) AS ad
  FROM {table} e JOIN m USING ({group_col})
  WHERE e.{value_col} IS NOT NULL
), mad AS (
  SELECT {group_col}, median(ad) AS mad FROM d GROUP BY 1
)
SELECT d.{id_col}, d.{group_col}, d.{value_col}
FROM d JOIN mad USING ({group_col})
WHERE mad.mad > 0 AND d.ad > {float(k)} * mad.mad
ORDER BY d.{id_col}
""".strip()


def contingency_chi2(ds, group_col: str = "event_type",
                     value_col: str = "value", tier_width: float = 100.0,
                     n_tiers: int = 4):
    """Chi-square independence diagnostic: the (group × value-tier)
    contingency table with each cell's expected count and chi-square
    contribution — the drift/bias test a data pipeline runs to ask
    "does this metric's distribution depend on the segment?" (a
    routed-traffic analogue: does payload size depend on sink?). Cells
    with big ``contrib`` are the dependence hot spots; Σ contrib is
    the chi-square statistic with (R-1)(C-1) dof.

    Shape: one per-batch combiner (Arrow group_by over ≤ R·C keys) →
    driver merge of integer partials — counts and both margins are
    int64-exact and order-free; each output row then applies ONE fixed
    float expression tree ``expected = (n_row·n_col)/n_total``,
    ``contrib = (n-expected)²/expected`` (int64→float64 casts round to
    nearest identically in numpy and DuckDB, so rows mirror
    bit-for-bit; no float is ever summed across rows). NULL values are
    excluded; tiers are ``clip(floor(value/width), 0, n_tiers-1)``.

    Returns a pyarrow Table (group, tier, n, expected, contrib) sorted.
    """
    from fluent_server_ray.stages.aggregate import grouped_counts

    def tiers(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value_col]))
        v = t[value_col].to_numpy(zero_copy_only=False)
        tier = np.clip(np.floor(v / tier_width).astype(np.int64),
                       0, n_tiers - 1)
        return pa.table({group_col: t[group_col],
                         "tier": pa.array(tier)})

    cells = grouped_counts(
        ds.map_batches(tiers, batch_format="pyarrow", zero_copy_batch=True),
        [group_col, "tier"], final="driver")
    g = cells[group_col].to_pylist()
    tier = cells["tier"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = cells["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    import pandas as pd

    df = pd.DataFrame({group_col: g, "tier": tier, "n": n})
    df["n_row"] = df.groupby(group_col)["n"].transform("sum")
    df["n_col"] = df.groupby("tier")["n"].transform("sum")
    n_total = float(df["n"].sum())
    expected = (df["n_row"].to_numpy().astype(np.float64)
                * df["n_col"].to_numpy().astype(np.float64)) / n_total
    nf = df["n"].to_numpy().astype(np.float64)
    contrib = (nf - expected) ** 2 / expected
    df = df.sort_values([group_col, "tier"])
    order = df.index.to_numpy()
    return pa.table({
        group_col: pa.array(df[group_col].to_numpy(dtype=object)),
        "tier": pa.array(df["tier"].to_numpy()),
        "n": pa.array(df["n"].to_numpy()),
        "expected": pa.array(expected[order], type=pa.float64()),
        "contrib": pa.array(contrib[order], type=pa.float64()),
    })


def contingency_chi2_sql(group_col: str = "event_type",
                         value_col: str = "value",
                         tier_width: float = 100.0, n_tiers: int = 4,
                         table: str = "events") -> str:
    e = (f"(CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE)) "
         f"/ CAST(n_total AS DOUBLE)")
    return f"""
WITH c AS (
  SELECT {group_col},
    LEAST(GREATEST(CAST(floor({value_col} / {tier_width}) AS BIGINT), 0),
          {n_tiers - 1}) AS tier,
    count(*) AS n
  FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2
), m AS (
  SELECT c.*,
    sum(n) OVER (PARTITION BY {group_col}) AS n_row,
    sum(n) OVER (PARTITION BY tier) AS n_col,
    sum(n) OVER () AS n_total
  FROM c
)
SELECT {group_col}, tier, CAST(n AS BIGINT) AS n,
  {e} AS expected,
  ((CAST(n AS DOUBLE) - {e}) ** 2) / ({e}) AS contrib
FROM m ORDER BY {group_col}, tier
""".strip()


def _exact_rank(pairs, value_col: str, id_col: str, rank_name: str,
                n_buckets: int = 64, keep_value: bool = False):
    """Exact row_number() rank by (value DESC, id ASC) over a
    (id, value) Dataset — THE shared histogram rank plan (additive
    distinct-value histogram → broadcast strictly-higher counts → ONE
    value-keyed exchange for the within-value cumcount); the shard
    planner and rank fusion both build on it. Returns a Dataset
    (id[, value], rank_name)."""
    import pandas as pd
    import ray
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import (grouped_agg,
                                                    hash_bucket_array,
                                                    skip_empty)

    def hist_partial(t: pa.Table) -> pa.Table:
        out = t.group_by(value_col).aggregate([([], "count_all")])
        return out.rename_columns([value_col, "c"])

    parts = list(
        pairs.map_batches(skip_empty(hist_partial), batch_format="pyarrow",
                          zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not parts:  # empty corpus → typed empty, not a concat crash
        cols = {id_col: pa.array([], pa.int64())}
        if keep_value:
            cols[value_col] = pa.array([], pa.int64())
        cols[rank_name] = pa.array([], pa.int64())
        return rd.from_arrow(pa.table(cols))
    hist = pa.concat_tables(parts).group_by(value_col).aggregate(
        [("c", "sum")])
    v = hist[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
    c = hist["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(-v, kind="stable")
    v_desc, c_desc = v[order], c[order]
    higher = np.concatenate(([0], np.cumsum(c_desc)[:-1]))
    asc = np.argsort(v_desc, kind="stable")
    hi_ref = ray.put((v_desc[asc], higher[asc]))

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_b", pa.array(hash_bucket_array(t[value_col], n_buckets)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        vals, hi = ray.get(hi_ref)
        g = g.sort_values([value_col, id_col],
                          kind="mergesort").reset_index(drop=True)
        within = g.groupby(value_col, sort=False).cumcount().to_numpy()
        base = hi[np.searchsorted(vals, g[value_col].to_numpy())]
        cols = {id_col: g[id_col].to_numpy()}
        if keep_value:
            cols[value_col] = g[value_col].to_numpy()
        cols[rank_name] = (base + within + 1).astype(np.int64)
        return pd.DataFrame(cols)

    return (pairs.map_batches(add_bucket, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("_b").map_groups(per_bucket, batch_format="pandas"))


def rank_fusion(ds, id_col: str = "doc_id", text_col: str = "text",
                k: int = 60, n_buckets: int = 64):
    """Reciprocal Rank Fusion of two curation signals (Cormack et al.
    2009): alphabetic-character mass and token count, each ranked
    exactly by (signal DESC, id ASC), fused as
    ``rrf = 1/(k+r_alpha) + 1/(k+r_tokens)`` — the standard way to
    blend incomparable quality scores without calibrating them (RRF
    only consumes RANKS, so a heavy-tailed signal can't drown the
    other). Select the top slice of ``rrf`` for curation.

    Both signals extract in one pass; each rank is the histogram plan
    (no global sort), then one bucketed id join aligns them. Ranks are
    int64-exact; ``rrf`` is one fixed two-division float tree per row
    — bit-exact vs the SQL row_number mirror.

    Returns a Dataset (doc_id, rank_alpha, rank_tokens, rrf) sorted.
    """
    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.joins import bucketed_hash_join
    from fluent_server_ray.stages.textstats import TOKEN_RE

    def signals(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "n_alpha": pc.cast(
                pc.count_substring_regex(t[text_col], "[A-Za-z]"),
                pa.int64()),
            "n_tokens": pc.cast(
                pc.count_substring_regex(t[text_col], TOKEN_RE), pa.int64()),
        })

    sig = ds.map_batches(skip_empty(signals), batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    ra = _exact_rank(sig.select_columns([id_col, "n_alpha"]),
                     "n_alpha", id_col, "rank_alpha", n_buckets)
    rb = _exact_rank(sig.select_columns([id_col, "n_tokens"]),
                     "n_tokens", id_col, "rank_tokens", n_buckets)
    j = bucketed_hash_join(ra, rb, key=id_col, n_buckets=n_buckets)

    def finish(t: pa.Table) -> pa.Table:
        r1 = t["rank_alpha"].to_numpy(zero_copy_only=False).astype(np.int64)
        r2 = t["rank_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        rrf = (1.0 / (k + r1).astype(np.float64)
               + 1.0 / (k + r2).astype(np.float64))
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "rank_alpha": pa.array(r1),
            "rank_tokens": pa.array(r2),
            "rrf": pa.array(rrf, type=pa.float64()),
        })

    return (j.map_batches(skip_empty(finish), batch_format="pyarrow",
                          zero_copy_batch=True)
            .sort([id_col]))


def rank_fusion_sql(k: int = 60, table: str = "documents") -> str:
    return f"""
WITH sig AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tokens
  FROM {table}
), r AS (
  SELECT doc_id,
    row_number() OVER (ORDER BY n_alpha DESC, doc_id) AS rank_alpha,
    row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rank_tokens
  FROM sig
)
SELECT doc_id, CAST(rank_alpha AS BIGINT) AS rank_alpha,
  CAST(rank_tokens AS BIGINT) AS rank_tokens,
  1.0 / ({k} + rank_alpha) + 1.0 / ({k} + rank_tokens) AS rrf
FROM r ORDER BY doc_id
""".strip()


def contingency_chi2_cat(ds, a_col: str = "lang", b_col: str = "source"):
    """Categorical × categorical sibling of :func:`contingency_chi2`
    (same margins math, same one-float-tree-per-cell bit-exactness
    contract): does attribute A depend on attribute B — e.g. is a
    corpus's language mix independent of its source feed? NULLs in
    either column are excluded (a NULL category is a data bug the
    profile_table op reports, not a contingency level).

    Returns a pyarrow Table (a, b, n, expected, contrib) sorted.
    """
    import pandas as pd

    from fluent_server_ray.stages.aggregate import grouped_counts

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[a_col]), pc.is_valid(t[b_col])))
        return pa.table({a_col: pc.cast(t[a_col], pa.string()),
                         b_col: pc.cast(t[b_col], pa.string())})

    cells = grouped_counts(
        ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True),
        [a_col, b_col], final="driver")
    df = pd.DataFrame({
        a_col: cells[a_col].to_pylist(),
        b_col: cells[b_col].to_pylist(),
        "n": cells["n"].to_numpy(zero_copy_only=False).astype(np.int64),
    })
    df["n_row"] = df.groupby(a_col)["n"].transform("sum")
    df["n_col"] = df.groupby(b_col)["n"].transform("sum")
    n_total = float(df["n"].sum())
    expected = (df["n_row"].to_numpy().astype(np.float64)
                * df["n_col"].to_numpy().astype(np.float64)) / n_total
    nf = df["n"].to_numpy().astype(np.float64)
    contrib = (nf - expected) ** 2 / expected
    df = df.sort_values([a_col, b_col])
    order = df.index.to_numpy()
    return pa.table({
        a_col: pa.array(df[a_col].to_numpy(dtype=object), pa.string()),
        b_col: pa.array(df[b_col].to_numpy(dtype=object), pa.string()),
        "n": pa.array(df["n"].to_numpy()),
        "expected": pa.array(expected[order], type=pa.float64()),
        "contrib": pa.array(contrib[order], type=pa.float64()),
    })


def contingency_chi2_cat_sql(a_col: str = "lang", b_col: str = "source",
                             table: str = "documents") -> str:
    e = ("(CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE)) "
         "/ CAST(n_total AS DOUBLE)")
    return f"""
WITH c AS (
  SELECT {a_col}, {b_col}, count(*) AS n
  FROM {table}
  WHERE {a_col} IS NOT NULL AND {b_col} IS NOT NULL
  GROUP BY 1, 2
), m AS (
  SELECT c.*,
    sum(n) OVER (PARTITION BY {a_col}) AS n_row,
    sum(n) OVER (PARTITION BY {b_col}) AS n_col,
    sum(n) OVER () AS n_total
  FROM c
)
SELECT {a_col}, {b_col}, CAST(n AS BIGINT) AS n,
  {e} AS expected,
  ((CAST(n AS DOUBLE) - {e}) ** 2) / ({e}) AS contrib
FROM m ORDER BY {a_col}, {b_col}
""".strip()


def cusum_flags(ds, key_col: str = "event_type", ts_col: str = "ts",
                k: int = 70, h: int = 25) -> pa.Table:
    """CUSUM changepoint detection over per-key DAILY volumes (Page
    1954 — the classic sequential drift test): ``S_0 = 0, S_t =
    max(0, S_{t-1} + x_t − k)`` over each key's observed days in
    order, flag when ``S_t > h``. Where the z-score spike monitor
    (:func:`windows.window_anomalies`) sees single-day outliers,
    CUSUM accumulates SMALL sustained shifts — the slow-leak traffic
    drift a per-day threshold misses.

    Daily counts come from the per-batch combiner (bounded: |keys| ×
    |days| rows cross the wire, never events); the recursion itself is
    inherently sequential per key, runs on the driver over that
    bounded table (one vectorized pass per key), and is mirrored by a
    recursive CTE. Pure integers end to end — strict.

    Output: (key, day, n, cusum, flag) sorted; ``day`` = epoch days.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def partial(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[ts_col]))
        t = t.filter(ok)
        us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        out = pa.table({
            "key": pc.cast(t[key_col], pa.string()),
            "day": pa.array(day),
        }).group_by(["key", "day"]).aggregate([([], "count_all")])
        return out.rename_columns(["key", "day", "n"])

    parts = grouped_agg(
        ds.select_columns([key_col, ts_col]).map_batches(
            skip_empty(partial), batch_format="pyarrow",
            zero_copy_batch=True),
        keys=["key", "day"], aggs=[("n", "sum")], final="driver")
    if parts.num_rows == 0:
        return pa.table({key_col: pa.array([], pa.string()),
                         "day": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "cusum": pa.array([], pa.int64()),
                         "flag": pa.array([], pa.bool_())})
    df = parts.to_pandas().sort_values(["key", "day"])
    n = df["n_sum"].to_numpy().astype(np.int64)
    keys = df["key"].to_numpy()
    new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
    s = np.empty(len(n), dtype=np.int64)
    run = 0
    for i in range(len(n)):  # bounded: |keys|×|days| rows, driver-side
        run = max(0, (0 if new_key[i] else run) + int(n[i]) - k)
        s[i] = run
    return pa.table({
        key_col: pa.array(keys, pa.string()),
        "day": pa.array(df["day"].to_numpy().astype(np.int64)),
        "n": pa.array(n),
        "cusum": pa.array(s),
        "flag": pa.array(s > h),
    })


def cusum_flags_sql(key_col: str = "event_type", ts_col: str = "ts",
                    k: int = 70, h: int = 25,
                    table: str = "events") -> str:
    return f"""
WITH RECURSIVE d AS (
  SELECT {key_col} AS key,
    CAST(epoch_us({ts_col}) // 86400000000 AS BIGINT) AS day,
    CAST(count(*) AS BIGINT) AS n
  FROM {table}
  WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
  GROUP BY 1, 2
), r AS (
  SELECT key, day, n,
    row_number() OVER (PARTITION BY key ORDER BY day) AS i
  FROM d
), cus AS (
  SELECT key, day, n, i, greatest(0, n - {k}) AS s
  FROM r WHERE i = 1
  UNION ALL
  SELECT r.key, r.day, r.n, r.i, greatest(0, cus.s + r.n - {k})
  FROM cus JOIN r ON r.key = cus.key AND r.i = cus.i + 1
)
SELECT key AS {key_col}, day, n, CAST(s AS BIGINT) AS cusum,
  s > {h} AS flag
FROM cus ORDER BY {key_col}, day
""".strip()


def ntile(ds, group_col: str, value_col: str, id_col: str,
          q: int = 4, n_buckets: int = 64):
    """SQL ``NTILE(q)`` per group: rows ordered by ``(value, id)``
    within each group are dealt into ``q`` tiles, the first ``n % q``
    tiles one row larger — the exact SQL window semantics (DuckDB,
    Postgres), used for quantile bucketing / cohort quartiles without
    computing explicit quantile boundaries.

    ONE group-keyed bucket exchange; rank and tile are segmented
    vectorized passes over the bucket. NULL groups form their own
    partition; NULL values sort LAST (SQL default) with id tie-break.
    Output: (group, id, value, tile) sorted by (group, id).
    """
    import pandas as pd

    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.groups import map_buckets

    if q <= 0:
        raise ValueError(f"q must be positive, got {q}")

    schema = pa.schema([
        pa.field(group_col, pa.string()),
        pa.field(id_col, pa.int64()),
        pa.field(value_col, pa.float64()),
        pa.field("tile", pa.int64()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # NULLS LAST under ascending order = SQL default
        g = g.sort_values([group_col, value_col, id_col],
                          na_position="last")
        grp = g.groupby(group_col, sort=False, dropna=False)
        n = grp[id_col].transform("size").to_numpy().astype(np.int64)
        r = grp.cumcount().to_numpy().astype(np.int64)
        small = n // q            # base tile size
        n_big = n % q             # first n_big tiles get +1
        cut = n_big * (small + 1)  # rows covered by the big tiles
        tile = np.where(
            r < cut,
            r // np.maximum(small + 1, 1) + 1,
            n_big + (r - cut) // np.maximum(small, 1) + 1,
        ).astype(np.int64)
        return pd.DataFrame({
            group_col: g[group_col].to_numpy(),
            id_col: g[id_col].to_numpy(),
            value_col: g[value_col].to_numpy(),
            "tile": tile,
        })

    bucketed = _with_bucket(
        ds.select_columns([group_col, value_col, id_col]),
        group_col, n_buckets)
    return map_buckets(bucketed, per_bucket, schema).sort(
        [group_col, id_col])


def ntile_sql(group_col: str = "event_type", value_col: str = "value",
              id_col: str = "event_id", q: int = 4,
              table: str = "events") -> str:
    return f"""
SELECT {group_col}, {id_col}, {value_col},
  CAST(ntile({q}) OVER (PARTITION BY {group_col}
       ORDER BY {value_col}, {id_col}) AS BIGINT) AS tile
FROM {table} ORDER BY {group_col}, {id_col}
""".strip()


def mutual_information(ds, a_col: str = "lang", b_col: str = "source"):
    """Mutual information I(A;B) between two categorical columns — the
    information-theoretic sibling of :func:`contingency_chi2_cat`
    (chi-square measures deviation from independence; MI measures the
    SHARED BITS — the feature-selection / redundancy metric).

    Same distributed contingency machinery (per-batch count combiner,
    bounded |A|×|B| cells on the driver). Exactness contract (the
    house rule for logs in oracle-compared expressions): every ln()
    is of an INTEGER argument and floors to integer MICROnats, so the
    per-cell terms sum order-free in int64:
    ``term = n_ab · (L(n_ab·N) − L(n_a) − L(n_b) − L(N) + L(N))``…
    concretely ``L(x) = floor(ln(x)·10^6)`` and
    ``mi_numerator = Σ n_ab·(L(n_ab·N) − L(n_a·n_b))`` with the final
    ``mi_nats = numerator / (N·10^6)`` ONE float division. Note
    ``ln(n_ab·N/(n_a·n_b)) = ln(n_ab·N) − ln(n_a·n_b)`` exactly in
    the floored contract because both arguments are exact integers.

    Returns a 1-row Table (n_total, mi_numerator, mi_nats).
    NULLs in either column are excluded (chi2_cat's rule)."""
    import math

    import pandas as pd

    from fluent_server_ray.stages.aggregate import grouped_counts

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[a_col]),
                             pc.is_valid(t[b_col])))
        return pa.table({a_col: pc.cast(t[a_col], pa.string()),
                         b_col: pc.cast(t[b_col], pa.string())})

    cells = grouped_counts(
        ds.map_batches(proj, batch_format="pyarrow",
                       zero_copy_batch=True),
        [a_col, b_col], final="driver")
    if cells.num_rows == 0:
        return pa.table({"n_total": pa.array([0], pa.int64()),
                         "mi_numerator": pa.array([0], pa.int64()),
                         "mi_nats": pa.array([0.0], pa.float64())})
    df = pd.DataFrame({
        "a": cells[a_col].to_pylist(),
        "b": cells[b_col].to_pylist(),
        "n": cells["n"].to_numpy(zero_copy_only=False).astype(np.int64),
    })
    na = df.groupby("a")["n"].transform("sum").to_numpy()
    nb = df.groupby("b")["n"].transform("sum").to_numpy()
    n_tot = int(df["n"].sum())

    def L(x: int) -> int:
        return math.floor(math.log(x) * 1_000_000)

    # ln() arguments must stay float64-exact (< 2^53) or the SQL
    # mirror's BIGINT→DOUBLE cast could floor a different millionth
    if n_tot * int(df["n"].max()) >= 2 ** 53:
        raise ValueError(
            "mutual_information: cell·total product exceeds the "
            "float64-exact range — pre-bucket one column")
    num = 0
    for n_ab, n_a, n_b in zip(df["n"].to_numpy(), na, nb):
        num += int(n_ab) * (L(int(n_ab) * n_tot) - L(int(n_a) * int(n_b)))
    return pa.table({
        "n_total": pa.array([n_tot], pa.int64()),
        "mi_numerator": pa.array([num], pa.int64()),
        "mi_nats": pa.array([num / (n_tot * 1_000_000)], pa.float64()),
    })


def mutual_information_sql(a_col: str = "lang", b_col: str = "source",
                           table: str = "documents") -> str:
    return f"""
WITH c AS (
  SELECT {a_col} AS a, {b_col} AS b, CAST(count(*) AS BIGINT) AS n
  FROM {table}
  WHERE {a_col} IS NOT NULL AND {b_col} IS NOT NULL
  GROUP BY 1, 2
), m AS (
  SELECT c.*,
    CAST(sum(n) OVER (PARTITION BY a) AS BIGINT) AS na,
    CAST(sum(n) OVER (PARTITION BY b) AS BIGINT) AS nb,
    CAST(sum(n) OVER () AS BIGINT) AS nt
  FROM c
), terms AS (
  SELECT nt,
    n * (CAST(floor(ln(n * nt) * 1000000) AS BIGINT)
         - CAST(floor(ln(na * nb) * 1000000) AS BIGINT)) AS term
  FROM m
)
SELECT CAST(max(nt) AS BIGINT) AS n_total,
  CAST(sum(term) AS BIGINT) AS mi_numerator,
  CAST(sum(term) AS BIGINT)
    / (CAST(max(nt) AS DOUBLE) * 1000000.0) AS mi_nats
FROM terms
""".strip()


# Benford expected first-digit proportions, floored to integer
# millionths of floor(log10(1 + 1/d) * 1e6). PINNED LITERALS on both
# sides of the oracle seam (not recomputed via log10 in SQL) so a
# 1-ulp libm divergence at a flooring boundary can never split the
# engines; tests/test_features.py re-derives them from math.log10.
BENFORD_MILLIONTHS = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def benford_audit(ds, value_col: str = "o_totalprice",
                  group_col: str = "o_orderpriority") -> pa.Table:
    """Benford first-significant-digit audit of a positive currency
    column per group — the classic fabricated-data / ingestion-bug
    screen (a corrupted feed or synthetic-fill column rarely follows
    the log-uniform digit law real financial magnitudes do).

    Exactness contract: the value is fixed to integer CENTS with the
    house rule :func:`_cents` (half away from zero, mirrored as
    ``CAST(round(v*100.0) AS BIGINT)``), the first digit is the first character
    of the cents integer's decimal rendering (pure string/int ops —
    never float log10, whose floor at a power of ten is
    rounding-sensitive), and the expected proportions are the pinned
    :data:`BENFORD_MILLIONTHS` literals. Rows with NULL value/cents<1
    are excluded (no first digit). Distributed shape: the per-batch
    grouped-count combiner; |groups|x9 rows reach the driver.

    Output: (group, digit, n, n_group, expected_millionths) sorted.
    """
    from fluent_server_ray.stages.aggregate import grouped_counts

    def digits(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[value_col]),
                             pc.is_valid(t[group_col])))
        cents = _cents(pc.cast(t[value_col], pa.float64()))
        # filter BEFORE the digit cast: a negative cents value would
        # slice to '-' and crash the int64 parse
        keep = pc.greater_equal(cents, 1)
        cents = cents.filter(keep)
        first = pc.utf8_slice_codeunits(
            pc.cast(cents, pa.string()), 0, 1)
        return pa.table({
            "grp": pc.cast(t[group_col], pa.string()).filter(keep),
            "digit": pc.cast(first, pa.int64()),
        })

    cells = grouped_counts(
        ds.select_columns([value_col, group_col]).map_batches(
            digits, batch_format="pyarrow", zero_copy_batch=True),
        ["grp", "digit"], final="driver")
    import pandas as pd

    df = cells.to_pandas()
    if len(df) == 0:
        return pa.table({
            group_col: pa.array([], pa.string()),
            "digit": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "n_group": pa.array([], pa.int64()),
            "expected_millionths": pa.array([], pa.int64())})
    df = df.sort_values(["grp", "digit"])
    df["n_group"] = df.groupby("grp")["n"].transform("sum")
    df["expected_millionths"] = df["digit"].map(BENFORD_MILLIONTHS)
    return pa.table({
        group_col: pa.array(df["grp"].to_numpy(), pa.string()),
        "digit": pa.array(df["digit"].to_numpy().astype(np.int64)),
        "n": pa.array(df["n"].to_numpy().astype(np.int64)),
        "n_group": pa.array(df["n_group"].to_numpy().astype(np.int64)),
        "expected_millionths": pa.array(
            df["expected_millionths"].to_numpy().astype(np.int64)),
    })


def benford_audit_sql(value_col: str = "o_totalprice",
                      group_col: str = "o_orderpriority",
                      table: str = "orders") -> str:
    vals = ", ".join(f"({d}, {m})" for d, m in BENFORD_MILLIONTHS.items())
    return f"""
WITH b AS (
  SELECT {group_col} AS grp,
    CAST(substr(CAST(CAST(round({value_col} * 100.0) AS BIGINT)
                     AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {group_col} IS NOT NULL
    AND CAST(round({value_col} * 100.0) AS BIGINT) >= 1
), c AS (
  SELECT grp, digit, CAST(count(*) AS BIGINT) AS n
  FROM b GROUP BY 1, 2
), e(digit, expected_millionths) AS (VALUES {vals})
SELECT c.grp AS {group_col}, c.digit, c.n,
  CAST(sum(c.n) OVER (PARTITION BY c.grp) AS BIGINT) AS n_group,
  CAST(e.expected_millionths AS BIGINT) AS expected_millionths
FROM c JOIN e ON c.digit = e.digit
ORDER BY c.grp, c.digit
""".strip()


def association_rules(ds, basket_col: str = "user_id",
                      item_col: str = "event_type",
                      min_support: int = 1, n_buckets: int = 64) -> pa.Table:
    """Market-basket association rules over (basket, item) pairs —
    every ordered rule ``antecedent -> consequent`` between two items
    co-present in a basket, with exact support / confidence / lift
    (Agrawal-Srikant shape, 2-itemsets): the "users who trigger A also
    trigger B" co-behavior mining step.

    Distributed shape: per-batch LOCAL distinct of (basket, item)
    (the combiner — within-block repeats never move), ONE basket-hash
    bucket exchange (each basket's distinct items co-locate; the
    bucket key is a bounded small int, never one group per basket),
    then per-bucket vectorized pair formation (one self-merge) plus
    per-item and distinct-basket partials riding the SAME pass as
    sentinel rows (kind='item'/'total'; the pmi sentinel trick).
    Driver merge is bounded |items|^2 + |items| + 1 rows.

    Integer contract: confidence_millionths = n_both*1e6 // n_ant,
    lift_millionths = n_both*n_baskets*1e6 // (n_ant*n_cons) — python
    ints here, HUGEINT in the mirror; lift fits BIGINT while
    n_baskets*1e6 < 2^63. NULL basket or item rows are excluded.

    Output: (antecedent, consequent, n_both, n_ant, n_cons, n_baskets,
    confidence_millionths, lift_millionths), n_both >= min_support,
    sorted.
    """
    import pandas as pd

    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.groups import map_buckets

    def local_distinct(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[basket_col]),
                             pc.is_valid(t[item_col])))
        return pa.table({
            "basket": pc.cast(t[basket_col], pa.string()),
            "item": pc.cast(t[item_col], pa.string()),
        }).group_by(["basket", "item"]).aggregate([])

    schema = pa.schema([
        pa.field("kind", pa.string()),
        pa.field("a", pa.string()),
        pa.field("b", pa.string()),
        pa.field("n", pa.int64()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["basket", "item"])
        pairs = d.merge(d, on="basket")
        pairs = pairs[pairs["item_x"] != pairs["item_y"]]
        pp = (pairs.groupby(["item_x", "item_y"]).size()
              .reset_index(name="n"))
        items = d.groupby("item").size().reset_index(name="n")
        return pd.DataFrame({
            "kind": (["pair"] * len(pp) + ["item"] * len(items)
                     + ["total"]),
            "a": (list(pp["item_x"]) + list(items["item"]) + [""]),
            "b": (list(pp["item_y"]) + [""] * len(items) + [""]),
            "n": (list(pp["n"]) + list(items["n"])
                  + [d["basket"].nunique()]),
        })

    pre = ds.select_columns([basket_col, item_col]).map_batches(
        local_distinct, batch_format="pyarrow", zero_copy_batch=True)
    parts = map_buckets(
        _with_bucket(pre, "basket", n_buckets), per_bucket, schema)
    # bounded driver merge: <= |items|^2 + |items| + 1 keys
    tables = list(parts.iter_batches(batch_size=None,
                                     batch_format="pyarrow"))
    out_cols = ["antecedent", "consequent", "n_both", "n_ant", "n_cons",
                "n_baskets", "confidence_millionths", "lift_millionths"]
    # zero-block case first: pa.concat_tables([]) raises
    merged = pa.concat_tables(tables) if tables else None
    if merged is None or merged.num_rows == 0:
        return pa.table({c: pa.array(
            [], pa.string() if c in out_cols[:2] else pa.int64())
            for c in out_cols})
    df = (merged.to_pandas().groupby(["kind", "a", "b"], as_index=False)
          ["n"].sum())
    n_baskets = int(df.loc[df["kind"] == "total", "n"].sum())
    item_n = {r.a: int(r.n) for r in
              df[df["kind"] == "item"].itertuples()}
    rules = df[(df["kind"] == "pair")
               & (df["n"] >= min_support)].sort_values(["a", "b"])
    if n_baskets * 1_000_000 >= 2 ** 63:
        raise ValueError("association_rules: lift_millionths would "
                         "overflow BIGINT — scale the support floor")
    ant, cons, n_both, n_ant, n_cons, conf, lift = [], [], [], [], [], [], []
    for r in rules.itertuples():
        na, nc, nb = item_n[r.a], item_n[r.b], int(r.n)
        ant.append(r.a); cons.append(r.b)
        n_both.append(nb); n_ant.append(na); n_cons.append(nc)
        conf.append(nb * 1_000_000 // na)
        lift.append(nb * n_baskets * 1_000_000 // (na * nc))
    return pa.table({
        "antecedent": pa.array(ant, pa.string()),
        "consequent": pa.array(cons, pa.string()),
        "n_both": pa.array(n_both, pa.int64()),
        "n_ant": pa.array(n_ant, pa.int64()),
        "n_cons": pa.array(n_cons, pa.int64()),
        "n_baskets": pa.array([n_baskets] * len(ant), pa.int64()),
        "confidence_millionths": pa.array(conf, pa.int64()),
        "lift_millionths": pa.array(lift, pa.int64()),
    })


def association_rules_sql(basket_col: str = "user_id",
                          item_col: str = "event_type",
                          min_support: int = 1,
                          table: str = "events") -> str:
    return f"""
WITH d AS (
  SELECT DISTINCT CAST({basket_col} AS VARCHAR) AS basket,
                  CAST({item_col} AS VARCHAR) AS item
  FROM {table}
  WHERE {basket_col} IS NOT NULL AND {item_col} IS NOT NULL
), tot AS (
  SELECT CAST(count(DISTINCT basket) AS BIGINT) AS nb FROM d
), s AS (
  SELECT item, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
), p AS (
  SELECT x.item AS a, y.item AS b, CAST(count(*) AS BIGINT) AS n
  FROM d x JOIN d y ON x.basket = y.basket AND x.item <> y.item
  GROUP BY 1, 2
)
SELECT p.a AS antecedent, p.b AS consequent,
  p.n AS n_both, sa.n AS n_ant, sb.n AS n_cons, tot.nb AS n_baskets,
  CAST(CAST(p.n AS HUGEINT) * 1000000 // sa.n AS BIGINT)
    AS confidence_millionths,
  CAST(CAST(p.n AS HUGEINT) * tot.nb * 1000000 // (CAST(sa.n AS HUGEINT) * sb.n)
       AS BIGINT) AS lift_millionths
FROM p, tot
JOIN s sa ON sa.item = p.a
JOIN s sb ON sb.item = p.b
WHERE p.n >= {min_support}
ORDER BY p.a, p.b
""".strip()


def volume_autocorr(ds, key_col: str = "event_type",
                    ts_col: str = "ts") -> pa.Table:
    """Lag-1 autocorrelation of each key's DAILY event volume — the
    seasonality/trend-persistence screen beside :func:`cusum_flags`
    (CUSUM finds sustained level shifts; autocorrelation says whether
    today's volume predicts tomorrow's at all).

    Daily counts come from the same bounded per-batch combiner as
    CUSUM (|keys|x|days| rows cross the wire, never events); the lag
    pairing is SQL ``lag() OVER (PARTITION BY key ORDER BY day)``
    semantics over OBSERVED days (a gap pairs across it, exactly like
    the window function). The correlation follows the
    :func:`pearson_corr` exactness contract: python-int moment sums,
    the n*Sxy - Sx*Sy subtractions in exact integers (HUGEINT in the
    mirror), ONE float64 division tree at the end with the
    HUGEINT->VARCHAR->DOUBLE parse on the SQL side. Keys with < 2 lag
    pairs or zero variance get corr NULL (SQL corr() would too).

    Output: (key, n_pairs, corr) sorted by key.
    """
    import math

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def partial(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[ts_col]))
        t = t.filter(ok)
        us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        out = pa.table({
            "key": pc.cast(t[key_col], pa.string()),
            "day": pa.array(us // 86_400_000_000),
        }).group_by(["key", "day"]).aggregate([([], "count_all")])
        return out.rename_columns(["key", "day", "n"])

    parts = grouped_agg(
        ds.select_columns([key_col, ts_col]).map_batches(
            skip_empty(partial), batch_format="pyarrow",
            zero_copy_batch=True),
        keys=["key", "day"], aggs=[("n", "sum")], final="driver")
    keys_out, np_out, corr_out = [], [], []
    if parts.num_rows:
        df = parts.to_pandas().sort_values(["key", "day"])
        for key, g in df.groupby("key", sort=True):
            n = [int(v) for v in g["n_sum"]]
            xs, ys = n[:-1], n[1:]
            m = len(xs)
            keys_out.append(key)
            np_out.append(m)
            if m < 2:
                corr_out.append(None)
                continue
            sx, sy = sum(xs), sum(ys)
            sxy = sum(a * b for a, b in zip(xs, ys))
            sxx = sum(a * a for a in xs)
            syy = sum(b * b for b in ys)
            num_i = m * sxy - sx * sy
            vx_i = m * sxx - sx * sx
            vy_i = m * syy - sy * sy
            if vx_i <= 0 or vy_i <= 0:
                corr_out.append(None)
                continue
            corr_out.append(float(num_i) / (math.sqrt(float(vx_i))
                                            * math.sqrt(float(vy_i))))
    return pa.table({
        key_col: pa.array(keys_out, pa.string()),
        "n_pairs": pa.array(np_out, pa.int64()),
        "corr": pa.array(corr_out, pa.float64()),
    })


def volume_autocorr_sql(key_col: str = "event_type",
                        ts_col: str = "ts",
                        table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {key_col} AS key,
    CAST(epoch_us({ts_col}) // 86400000000 AS BIGINT) AS day,
    CAST(count(*) AS BIGINT) AS n
  FROM {table}
  WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
  GROUP BY 1, 2
), lagged AS (
  SELECT key, lag(n) OVER (PARTITION BY key ORDER BY day) AS x, n AS y
  FROM daily
), pairs AS (
  SELECT key, CAST(x AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y
  FROM lagged WHERE x IS NOT NULL
), mom AS (
  SELECT key, CAST(count(*) AS HUGEINT) AS m,
    sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
    sum(x*x) AS sxx, sum(y*y) AS syy
  FROM pairs GROUP BY key
), keys AS (SELECT DISTINCT key FROM daily)
SELECT k.key AS {key_col},
  CAST(COALESCE(m.m, 0) AS BIGINT) AS n_pairs,
  CASE WHEN m.m IS NULL OR m.m < 2
         OR m.m*m.sxx - m.sx*m.sx <= 0 OR m.m*m.syy - m.sy*m.sy <= 0
       THEN NULL
       ELSE CAST(CAST(m.m*m.sxy - m.sx*m.sy AS VARCHAR) AS DOUBLE)
            / (sqrt(CAST(CAST(m.m*m.sxx - m.sx*m.sx AS VARCHAR)
                         AS DOUBLE))
               * sqrt(CAST(CAST(m.m*m.syy - m.sy*m.sy AS VARCHAR)
                           AS DOUBLE)))
  END AS corr
FROM keys k LEFT JOIN mom m ON m.key = k.key
ORDER BY k.key
""".strip()


def ks_two_sample(ds, value_col: str = "value",
                  group_col: str = "event_type",
                  group_a: str = "click", group_b: str = "purchase",
                  max_distinct: int = 4_000_000) -> pa.Table:
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    ``value`` distributions of two groups — the distribution-drift
    test beside :func:`psi_drift` (PSI needs binning choices; KS is
    the binning-free max CDF gap, the standard "did this feed's value
    distribution shift" check).

    Exact-integer contract: over the DISTINCT values of the pooled
    sample, ``D = max |F_a - F_b|`` is computed as the integer
    ``d_num = max |cum_a * n_b - cum_b * n_a|`` (python ints; HUGEINT
    in the mirror) with ONE floor division to millionths at the end —
    no float CDFs, so the max is order-free and strict-mirrorable.

    Distributed shape: per-batch (value, group) count combiner (the
    grouped_exact_median caveat applies: per-distinct-value state —
    right for discrete/rounded value spaces; ``max_distinct`` guards
    the driver merge and names :func:`psi_drift` as the open-scale
    continuous path). NULL values are excluded; NaN raises (NaN
    orders above +inf in SQL, numpy sorts it last too but the CDF
    would silently include it). Output: one row
    (n_a, n_b, d_num, ks_millionths).
    """
    from fluent_server_ray.stages.aggregate import grouped_counts

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[value_col]),
                             pc.is_in(t[group_col],
                                      value_set=pa.array(
                                          [group_a, group_b]))))
        v = pc.cast(t[value_col], pa.float64())
        if pc.any(pc.is_nan(v)).as_py():
            raise ValueError("ks_two_sample: NaN value — filter first")
        return pa.table({"v": v,
                         "g": pc.cast(t[group_col], pa.string())})

    cells = grouped_counts(
        ds.select_columns([value_col, group_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["v", "g"], final="driver")
    if cells.num_rows > max_distinct:
        raise ValueError(
            "ks_two_sample: distinct value space exceeds max_distinct "
            "— use psi_drift's binned path for continuous open-scale "
            "columns")
    import pandas as pd

    df = cells.to_pandas()
    na = int(df.loc[df["g"] == group_a, "n"].sum())
    nb = int(df.loc[df["g"] == group_b, "n"].sum())
    if na == 0 or nb == 0:
        raise ValueError("ks_two_sample: a group has no rows")
    if na * nb >= 2 ** 63:
        raise ValueError("ks_two_sample: n_a*n_b exceeds BIGINT — "
                         "d_num would overflow the mirror's output cast")
    wide = (df.pivot_table(index="v", columns="g", values="n",
                           aggfunc="sum", fill_value=0)
            .reindex(columns=[group_a, group_b], fill_value=0)
            .sort_index())
    ca = cb = 0
    d_num = 0
    for x, y in zip(wide[group_a].to_numpy(), wide[group_b].to_numpy()):
        ca += int(x)
        cb += int(y)
        d_num = max(d_num, abs(ca * nb - cb * na))
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "d_num": pa.array([d_num], pa.int64()),
        "ks_millionths": pa.array([d_num * 1_000_000 // (na * nb)],
                                  pa.int64()),
    })


def ks_two_sample_sql(value_col: str = "value",
                      group_col: str = "event_type",
                      group_a: str = "click", group_b: str = "purchase",
                      table: str = "events") -> str:
    return f"""
WITH c AS (
  SELECT {value_col} AS v,
    CAST(count(*) FILTER (WHERE {group_col} = '{group_a}') AS HUGEINT)
      AS xa,
    CAST(count(*) FILTER (WHERE {group_col} = '{group_b}') AS HUGEINT)
      AS xb
  FROM {table}
  WHERE {value_col} IS NOT NULL
    AND {group_col} IN ('{group_a}', '{group_b}')
  GROUP BY 1
), tot AS (
  SELECT sum(xa) AS na, sum(xb) AS nb FROM c
), cum AS (
  SELECT sum(xa) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
         sum(xb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
  FROM c
)
SELECT CAST(tot.na AS BIGINT) AS n_a, CAST(tot.nb AS BIGINT) AS n_b,
  CAST(max(abs(ca * tot.nb - cb * tot.na)) AS BIGINT) AS d_num,
  CAST(max(abs(ca * tot.nb - cb * tot.na)) * 1000000
       // (tot.na * tot.nb) AS BIGINT) AS ks_millionths
FROM cum, tot
GROUP BY tot.na, tot.nb
""".strip()


def volume_xcorr(ds, key_a: str = "click", key_b: str = "purchase",
                 max_lag: int = 3, key_col: str = "event_type",
                 ts_col: str = "ts") -> pa.Table:
    """Lead-lag CROSS-correlation between two keys' daily volume
    series: for every shift in [-max_lag, +max_lag], the Pearson
    correlation of (a[day], b[day + lag]) over days where BOTH are
    observed — "do clicks predict purchases two days later" as data,
    the two-series sibling of :func:`volume_autocorr` (same bounded
    daily combiner, same exact-integer moment contract, same
    HUGEINT->VARCHAR->DOUBLE float tree).

    Every lag emits a row even with no overlapping days (n_pairs = 0,
    corr NULL — the mirror's generate_series LEFT JOIN shape); lags
    with < 2 pairs or zero variance also give NULL.
    Output: (lag, n_pairs, corr) sorted by lag.
    """
    import math

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.is_valid(t[ts_col]),
            pc.is_in(t[key_col], value_set=pa.array([key_a, key_b]))))
        us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        out = pa.table({
            "key": pc.cast(t[key_col], pa.string()),
            "day": pa.array(us // 86_400_000_000),
        }).group_by(["key", "day"]).aggregate([([], "count_all")])
        return out.rename_columns(["key", "day", "n"])

    parts = grouped_agg(
        ds.select_columns([key_col, ts_col]).map_batches(
            skip_empty(partial), batch_format="pyarrow",
            zero_copy_batch=True),
        keys=["key", "day"], aggs=[("n", "sum")], final="driver")
    da, db = {}, {}
    for r in parts.to_pylist():
        (da if r["key"] == key_a else db)[int(r["day"])] = int(r["n_sum"])
    lags, nps, corrs = [], [], []
    for lag in range(-max_lag, max_lag + 1):
        xs, ys = [], []
        for day, x in da.items():
            y = db.get(day + lag)
            if y is not None:
                xs.append(x)
                ys.append(y)
        m = len(xs)
        lags.append(lag)
        nps.append(m)
        if m < 2:
            corrs.append(None)
            continue
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        num_i = m * sxy - sx * sy
        vx_i = m * sxx - sx * sx
        vy_i = m * syy - sy * sy
        if vx_i <= 0 or vy_i <= 0:
            corrs.append(None)
        else:
            corrs.append(float(num_i) / (math.sqrt(float(vx_i))
                                         * math.sqrt(float(vy_i))))
    return pa.table({
        "lag": pa.array(lags, pa.int64()),
        "n_pairs": pa.array(nps, pa.int64()),
        "corr": pa.array(corrs, pa.float64()),
    })


def volume_xcorr_sql(key_a: str = "click", key_b: str = "purchase",
                     max_lag: int = 3, key_col: str = "event_type",
                     ts_col: str = "ts", table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {key_col} AS key,
    CAST(epoch_us({ts_col}) // 86400000000 AS BIGINT) AS day,
    CAST(count(*) AS BIGINT) AS n
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {key_col} IN ('{key_a}', '{key_b}')
  GROUP BY 1, 2
), lags AS (
  SELECT unnest(generate_series(-{max_lag}, {max_lag})) AS lag
), pairs AS (
  SELECT l.lag, CAST(a.n AS HUGEINT) AS x, CAST(b.n AS HUGEINT) AS y
  FROM lags l
  JOIN daily a ON a.key = '{key_a}'
  JOIN daily b ON b.key = '{key_b}' AND b.day = a.day + l.lag
), mom AS (
  SELECT lag, CAST(count(*) AS HUGEINT) AS m,
    sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
    sum(x*x) AS sxx, sum(y*y) AS syy
  FROM pairs GROUP BY lag
)
SELECT l.lag, CAST(COALESCE(mom.m, 0) AS BIGINT) AS n_pairs,
  CASE WHEN mom.m IS NULL OR mom.m < 2
         OR mom.m*mom.sxx - mom.sx*mom.sx <= 0
         OR mom.m*mom.syy - mom.sy*mom.sy <= 0
       THEN NULL
       ELSE CAST(CAST(mom.m*mom.sxy - mom.sx*mom.sy AS VARCHAR)
                 AS DOUBLE)
            / (sqrt(CAST(CAST(mom.m*mom.sxx - mom.sx*mom.sx
                              AS VARCHAR) AS DOUBLE))
               * sqrt(CAST(CAST(mom.m*mom.syy - mom.sy*mom.sy
                                AS VARCHAR) AS DOUBLE)))
  END AS corr
FROM lags l LEFT JOIN mom ON mom.lag = l.lag
ORDER BY l.lag
""".strip()


# RFM tier thresholds — FIXED (not data-dependent quantiles): the
# tiering stays a pure map and the oracle exact (the
# quality_curriculum contract); calibrate offline if needed.
RFM_RECENCY_DAYS = (7, 30)       # <=7d -> 3, <=30d -> 2, else 1
RFM_FREQUENCY = (100, 20)        # >=100 -> 3, >=20 -> 2, else 1
RFM_MONETARY_CENTS = (100_000, 10_000)


def rfm_scores(ds, key_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value", n_buckets: int = 64):
    """RFM customer segmentation (recency / frequency / monetary):
    per key, days since last activity (vs the corpus max day),
    total event count, and summed value in integer CENTS (the
    benford half-away contract), each mapped to a fixed-threshold
    1-3 tier and combined as ``rfm_code = r*100 + f*10 + m`` — the
    classic behavioral-cohort scoring step downstream of routing.

    Combiner-first: per-batch (key -> max day, count, cent sum)
    partials merge distributedly (``grouped_agg(final='ray')`` —
    unbounded key space, nothing key-scaled on the driver); the
    corpus max day is a one-scalar broadcast from the same partial
    pass. NULL value contributes 0 cents (SQL sum ignores NULLs);
    rows with NULL key or ts are excluded.

    Returns a Dataset (key, recency_days, frequency, monetary_cents,
    r_tier, f_tier, m_tier, rfm_code) sorted by key.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_col]),
                             pc.is_valid(t[ts_col])))
        us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = _cents(pc.cast(pc.fill_null(t[value_col], 0.0),
                               pa.float64()))
        return (pa.table({
            "key": pc.cast(t[key_col], pa.int64()),
            "day": pa.array(us // 86_400_000_000),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "cents": cents,
        }).group_by("key").aggregate([("day", "max"), ("one", "sum"),
                                      ("cents", "sum")])
            .rename_columns(["key", "day_max", "n", "cents_sum"]))

    parts = ds.select_columns(
        [key_col, ts_col, value_col]).map_batches(
        skip_empty(partial), batch_format="pyarrow",
        zero_copy_batch=True)
    merged = grouped_agg(parts, keys=["key"],
                         aggs=[("day_max", "max"), ("n", "sum"),
                               ("cents_sum", "sum")],
                         final="ray").materialize()
    # corpus max day: one bounded scalar from the merged partials
    mx = merged.map_batches(
        skip_empty(lambda t: pa.table({
            "m": pa.array([pc.max(t["day_max_max"]).as_py()],
                          pa.int64())})),
        batch_format="pyarrow", zero_copy_batch=True)
    mx_batches = list(mx.iter_batches(batch_size=None,
                                      batch_format="pyarrow"))
    if not mx_batches:
        # empty / fully-filtered input: typed empty, like the mirror
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "key": pa.array([], pa.int64()),
            "recency_days": pa.array([], pa.int64()),
            "frequency": pa.array([], pa.int64()),
            "monetary_cents": pa.array([], pa.int64()),
            "r_tier": pa.array([], pa.int64()),
            "f_tier": pa.array([], pa.int64()),
            "m_tier": pa.array([], pa.int64()),
            "rfm_code": pa.array([], pa.int64()),
        }))
    global_max = max(int(b["m"][0].as_py()) for b in mx_batches)

    r_hi, r_mid = RFM_RECENCY_DAYS
    f_hi, f_mid = RFM_FREQUENCY
    m_hi, m_mid = RFM_MONETARY_CENTS

    def score(t: pa.Table) -> pa.Table:
        rec = global_max - t["day_max_max"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        freq = t["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        mon = t["cents_sum_sum"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        r = np.where(rec <= r_hi, 3, np.where(rec <= r_mid, 2, 1))
        f = np.where(freq >= f_hi, 3, np.where(freq >= f_mid, 2, 1))
        m = np.where(mon >= m_hi, 3, np.where(mon >= m_mid, 2, 1))
        return pa.table({
            "key": t["key"],
            "recency_days": pa.array(rec),
            "frequency": pa.array(freq),
            "monetary_cents": pa.array(mon),
            "r_tier": pa.array(r.astype(np.int64)),
            "f_tier": pa.array(f.astype(np.int64)),
            "m_tier": pa.array(m.astype(np.int64)),
            "rfm_code": pa.array((r * 100 + f * 10 + m)
                                 .astype(np.int64)),
        })

    return merged.map_batches(skip_empty(score), batch_format="pyarrow",
                              zero_copy_batch=True).sort("key")


def rfm_scores_sql(key_col: str = "user_id", ts_col: str = "ts",
                   value_col: str = "value",
                   table: str = "events") -> str:
    r_hi, r_mid = RFM_RECENCY_DAYS
    f_hi, f_mid = RFM_FREQUENCY
    m_hi, m_mid = RFM_MONETARY_CENTS
    return f"""
WITH base AS (
  SELECT CAST({key_col} AS BIGINT) AS key,
    epoch_us({ts_col}) // 86400000000 AS day,
    CAST(round(COALESCE({value_col}, 0.0) * 100.0) AS BIGINT)
      AS cents
  FROM {table}
  WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
), agg AS (
  SELECT key, CAST(max(day) AS BIGINT) AS day_max,
    CAST(count(*) AS BIGINT) AS frequency,
    CAST(sum(cents) AS BIGINT) AS monetary_cents
  FROM base GROUP BY key
), mx AS (SELECT max(day_max) AS gm FROM agg),
t AS (
  SELECT key, CAST(mx.gm - day_max AS BIGINT) AS recency_days,
    frequency, monetary_cents,
    CASE WHEN mx.gm - day_max <= {r_hi} THEN 3
         WHEN mx.gm - day_max <= {r_mid} THEN 2 ELSE 1 END AS r_tier,
    CASE WHEN frequency >= {f_hi} THEN 3
         WHEN frequency >= {f_mid} THEN 2 ELSE 1 END AS f_tier,
    CASE WHEN monetary_cents >= {m_hi} THEN 3
         WHEN monetary_cents >= {m_mid} THEN 2 ELSE 1 END AS m_tier
  FROM agg, mx
)
SELECT key, recency_days, frequency, monetary_cents,
  CAST(r_tier AS BIGINT) AS r_tier, CAST(f_tier AS BIGINT) AS f_tier,
  CAST(m_tier AS BIGINT) AS m_tier,
  CAST(r_tier * 100 + f_tier * 10 + m_tier AS BIGINT) AS rfm_code
FROM t ORDER BY key
""".strip()


def diversified_topk(ds, value_col: str = "value",
                     group_col: str = "user_id",
                     id_col: str = "event_id", k: int = 50,
                     per_group: int = 3, n_buckets: int = 64):
    """Global top-k rows by ``value_col`` with a per-group cap — the
    result-diversification primitive (top purchases overall, but no
    user may occupy more than ``per_group`` slots; top docs per query
    with per-domain caps). Order contract: rank by (value DESC,
    id ASC) both within groups and globally — fully deterministic
    under ties.

    Shape: one group bucket exchange; per bucket a whole-bucket
    segmented rank keeps each group's best ``per_group`` rows (the
    survivors are <= |groups|*per_group); the global top-k is then a
    Ray sort + limit over survivors only. NULL values rank nowhere
    (dropped); NULL group is its own group (SQL PARTITION BY).

    Returns a Dataset (id, group, value) of exactly the top rows,
    value-descending.
    """
    import pandas as pd

    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.groups import map_buckets

    def clean(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value_col]))
        return pa.table({
            "id": pc.cast(t[id_col], pa.int64()),
            "grp": pc.cast(t[group_col], pa.string()),
            "val": pc.cast(t[value_col], pa.float64()),
        })

    schema = pa.schema([
        pa.field("id", pa.int64()),
        pa.field("grp", pa.string()),
        pa.field("val", pa.float64()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["grp", "val", "id"],
                          ascending=[True, False, True])
        rank = g.groupby("grp", sort=False, dropna=False).cumcount()
        return g.loc[rank.to_numpy() < per_group,
                     ["id", "grp", "val"]]

    bucketed = _with_bucket(
        ds.select_columns([id_col, group_col, value_col]).map_batches(
            clean, batch_format="pyarrow", zero_copy_batch=True),
        "grp", n_buckets)
    surv = map_buckets(bucketed, per_bucket, schema)
    return surv.sort(["val", "id"],
                     descending=[True, False]).limit(k)


def diversified_topk_sql(value_col: str = "value",
                         group_col: str = "user_id",
                         id_col: str = "event_id", k: int = 50,
                         per_group: int = 3,
                         table: str = "events") -> str:
    return f"""
WITH r AS (
  SELECT CAST({id_col} AS BIGINT) AS id,
    CAST({group_col} AS VARCHAR) AS grp,
    CAST({value_col} AS DOUBLE) AS val,
    row_number() OVER (PARTITION BY {group_col}
                       ORDER BY {value_col} DESC, {id_col}) AS rn
  FROM {table} WHERE {value_col} IS NOT NULL
)
SELECT id, grp, val FROM r WHERE rn <= {per_group}
ORDER BY val DESC, id LIMIT {k}
""".strip()


def quantile_normalize(ds, value_col: str = "value",
                       group_col: str = "event_type",
                       id_col: str = "event_id",
                       n_buckets: int = 64,
                       max_distinct: int = 4_000_000):
    """Quantile NORMALIZATION across groups: replace each row's value
    with the GLOBAL value at the same within-group quantile position —
    the distribution-alignment step (batch-effect removal / cross-feed
    score calibration: after it, every group's value distribution is a
    subsample of the pooled one, so thresholds mean the same thing in
    every feed).

    Exact rank contract: within a group, a row's 0-based rank r is its
    position under (value, id) order; its normalized value is the
    pooled distribution's order statistic at 0-based position
    ``r * N // n_g`` (floor; always < N). Order statistics come from
    the pooled DISTINCT-value count table (value repeated count times —
    the id tie-break cannot change WHICH VALUE sits at a position), so
    the lookup is one broadcast cumsum + searchsorted per bucket; the
    grouped_exact_median caveat applies (per-distinct-value state;
    ``max_distinct`` guards the driver merge — bin first for
    continuous open-scale columns).

    NULL values are excluded (no rank, no row out); NULL group is its
    own partition. Output: Dataset (id, group, value, normalized)
    sorted by id.
    """
    import pandas as pd

    from fluent_server_ray.stages.aggregate import grouped_counts
    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.groups import map_buckets

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value_col]))
        v = pc.cast(t[value_col], pa.float64())
        if pc.any(pc.is_nan(v)).as_py():
            raise ValueError("quantile_normalize: NaN value — filter "
                             "first (NaN has no order position)")
        return pa.table({
            "id": pc.cast(t[id_col], pa.int64()),
            "grp": pc.cast(t[group_col], pa.string()),
            "v": v,
        })

    cleaned = ds.select_columns([id_col, group_col, value_col]) \
        .map_batches(proj, batch_format="pyarrow",
                     zero_copy_batch=True).materialize()

    dist = grouped_counts(cleaned.select_columns(["v"]), ["v"],
                          final="driver")
    if dist.num_rows == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "id": pa.array([], pa.int64()),
            "grp": pa.array([], pa.string()),
            "v": pa.array([], pa.float64()),
            "normalized": pa.array([], pa.float64())}))
    if dist.num_rows > max_distinct:
        raise ValueError(
            "quantile_normalize: distinct value space exceeds "
            "max_distinct — histogram-bin the column first")
    ddf = dist.to_pandas().sort_values("v")
    gvals = ddf["v"].to_numpy(dtype=np.float64)
    cum = np.cumsum(ddf["n"].to_numpy(dtype=np.int64))
    n_total = int(cum[-1])
    if n_total >= 3_000_000_000:
        raise ValueError("quantile_normalize: r*N exceeds the int64 "
                         "guard — shard by group first")

    schema = pa.schema([
        pa.field("id", pa.int64()),
        pa.field("grp", pa.string()),
        pa.field("v", pa.float64()),
        pa.field("normalized", pa.float64()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["grp", "v", "id"])
        gg = g.groupby("grp", sort=False, dropna=False)
        r = gg.cumcount().to_numpy(dtype=np.int64)
        ng = gg["v"].transform("size").to_numpy(dtype=np.int64)
        idx = r * n_total // ng
        pos = np.searchsorted(cum, idx, side="right")
        return pd.DataFrame({
            "id": g["id"].to_numpy(),
            "grp": g["grp"].to_numpy(),
            "v": g["v"].to_numpy(),
            "normalized": gvals[pos],
        })

    bucketed = _with_bucket(cleaned, "grp", n_buckets)
    return map_buckets(bucketed, per_bucket, schema).sort("id")


def quantile_normalize_sql(value_col: str = "value",
                           group_col: str = "event_type",
                           id_col: str = "event_id",
                           table: str = "events") -> str:
    return f"""
WITH src AS (
  SELECT CAST({id_col} AS BIGINT) AS id,
    CAST({group_col} AS VARCHAR) AS grp,
    CAST({value_col} AS DOUBLE) AS v
  FROM {table} WHERE {value_col} IS NOT NULL
), g AS (
  SELECT id, grp, v,
    row_number() OVER (PARTITION BY grp ORDER BY v, id) - 1 AS r,
    count(*) OVER (PARTITION BY grp) AS ng,
    count(*) OVER () AS n
  FROM src
), o AS (
  SELECT v AS gv, row_number() OVER (ORDER BY v, id) - 1 AS p
  FROM src
)
SELECT g.id, g.grp, g.v, o.gv AS normalized
FROM g JOIN o ON o.p = g.r * g.n // g.ng
ORDER BY g.id
""".strip()


def pareto_shares(ds, key_col: str = "user_id",
                  value_col: str = "value", q: int = 10,
                  n_buckets: int = 64,
                  max_keys: int = 20_000_000) -> pa.Table:
    """Pareto / ABC concentration analysis: rank keys by total
    contribution (integer cents, DESCENDING), deal them into ``q``
    exact NTILE tiles (tile 1 = the heaviest keys) and report each
    tile's key count, cent total and cumulative share of the grand
    total — "the top 10% of users drive what fraction of revenue",
    the whale-curve report behind every mixing/retention decision.

    Distributed shape — with ONE honest cap: per-key cent sums merge
    via ``grouped_agg(final='ray')`` (raw rows never concentrate
    anywhere), but the tiling step reuses :func:`ntile` under a
    single constant group, so the per-key AGGREGATE table (|keys|
    rows — not raw rows) sorts inside ONE worker; ``max_keys`` guards
    that worker's memory and raising it is a deliberate act. Beyond
    the cap, range-partitioned ranking is the path — for the report
    this produces (q cumulative-share rows), tens of millions of keys
    per worker is ample. Value = NEGATED cents (ascending NTILE over
    -cents == descending contribution; key is the deterministic
    tie-break); the per-tile collapse is a bounded ``q``-row merge.
    Keys must be int64-castable (they ride ntile's id slot). A
    per-key sum at or beyond 2^53 raises (the negated sum rides a
    float64 sort key).

    Output: (tile, n_keys, cents, cum_millionths) sorted by tile.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[key_col]))
        cents = _cents(pc.cast(pc.fill_null(t[value_col], 0.0),
                               pa.float64()))
        return (pa.table({"key": pc.cast(t[key_col], pa.int64()),
                          "cents": cents})
                .group_by("key").aggregate([("cents", "sum")])
                .rename_columns(["key", "cents"]))

    agg = grouped_agg(
        ds.select_columns([key_col, value_col]).map_batches(
            skip_empty(partial), batch_format="pyarrow",
            zero_copy_batch=True),
        keys=["key"], aggs=[("cents", "sum")], final="ray").materialize()
    n_keys_total = agg.count()
    if n_keys_total > max_keys:
        raise ValueError(
            "pareto_shares: distinct key count exceeds max_keys — the "
            "single-group tiling step sorts the per-key aggregate in "
            "one worker; raise max_keys deliberately or range-"
            "partition the rank")

    def neg(t: pa.Table) -> pa.Table:
        s = t["cents_sum"].to_numpy(zero_copy_only=False)
        if len(s) and int(np.abs(s).max()) >= 2 ** 53:
            raise ValueError("pareto_shares: per-key sum exceeds the "
                             "float64-exact range")
        return pa.table({
            "grp": pa.array(["all"] * len(s), pa.string()),
            "negs": pa.array((-s).astype(np.float64)),
            "key": t["key"],
        })

    tiled = ntile(agg.map_batches(skip_empty(neg),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True),
                  group_col="grp", value_col="negs", id_col="key",
                  q=q, n_buckets=n_buckets)

    def tile_partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.negate(
            pc.cast(t["negs"], pa.float64())), pa.int64())
        return (pa.table({"tile": t["tile"], "cents": cents,
                          "one": pa.array(
                              np.ones(t.num_rows, np.int64))})
                .group_by("tile").aggregate([("cents", "sum"),
                                             ("one", "sum")])
                .rename_columns(["tile", "cents", "n"]))

    parts = list(tiled.map_batches(skip_empty(tile_partial),
                                   batch_format="pyarrow",
                                   zero_copy_batch=True)
                 .iter_batches(batch_size=None,
                               batch_format="pyarrow"))
    if not parts:
        return pa.table({"tile": pa.array([], pa.int64()),
                         "n_keys": pa.array([], pa.int64()),
                         "cents": pa.array([], pa.int64()),
                         "cum_millionths": pa.array([], pa.int64())})
    merged = (pa.concat_tables(parts).group_by("tile")
              .aggregate([("cents", "sum"), ("n", "sum")])
              .rename_columns(["tile", "cents", "n"])
              .sort_by("tile").to_pandas())
    total = int(merged["cents"].sum())
    cum = 0
    cums = []
    for c in merged["cents"]:
        cum += int(c)
        cums.append(cum * 1_000_000 // total if total else 0)
    return pa.table({
        "tile": pa.array(merged["tile"].to_numpy().astype(np.int64)),
        "n_keys": pa.array(merged["n"].to_numpy().astype(np.int64)),
        "cents": pa.array(merged["cents"].to_numpy().astype(np.int64)),
        "cum_millionths": pa.array(cums, pa.int64()),
    })


def pareto_shares_sql(key_col: str = "user_id",
                      value_col: str = "value", q: int = 10,
                      table: str = "events") -> str:
    return f"""
WITH agg AS (
  SELECT CAST({key_col} AS BIGINT) AS key,
    CAST(sum(CAST(round(COALESCE({value_col}, 0.0) * 100.0)
                  AS BIGINT)) AS BIGINT) AS s
  FROM {table} WHERE {key_col} IS NOT NULL GROUP BY 1
), t AS (
  SELECT key, s,
    CAST(ntile({q}) OVER (ORDER BY -CAST(s AS DOUBLE), key)
         AS BIGINT) AS tile
  FROM agg
), ts AS (
  SELECT tile, CAST(count(*) AS BIGINT) AS n_keys,
    CAST(sum(s) AS BIGINT) AS cents
  FROM t GROUP BY tile
), tot AS (SELECT sum(cents) AS g FROM ts)
SELECT tile, n_keys, cents,
  CAST(CASE WHEN tot.g = 0 THEN 0
       ELSE CAST(sum(cents) OVER (ORDER BY tile
                                  ROWS UNBOUNDED PRECEDING) AS HUGEINT)
            * 1000000 // tot.g END AS BIGINT) AS cum_millionths
FROM ts, tot
ORDER BY tile
""".strip()


def changepoint_split(ds, key_col: str = "event_type",
                      ts_col: str = "ts") -> pa.Table:
    """Single change-point LOCALIZATION per key (binary segmentation,
    one level): over each key's daily volume series, find the split
    that maximizes the between-segment variance reduction —
    :func:`cusum_flags` says THAT a sustained shift happened; this
    says WHEN (the first question an on-call asks).

    Objective: for split after position k of an m-day series with
    prefix sum S_k and total S, the SSE reduction is proportional to
    ``a_k^2 / (k*(m-k))`` with ``a_k = S_k*(m-k) - (S-S_k)*k`` — all
    integers. Exactness contract: both engines rank by the FLOORED
    integer ``gain_scaled = a_k^2 * 10^6 // (k*(m-k))`` with ties
    broken toward the earliest split (two true fractions can floor
    equal; making the floored value the contract keeps argmax
    identical across engines). python ints here, HUGEINT in the
    mirror; a gain past int64 raises.

    Daily counts come from the bounded per-batch combiner (the CUSUM
    shape); the argmax per key runs on the driver over that bounded
    table. Keys observed on < 2 days have no split and are omitted.
    Output: (key, split_day, n_days, gain_scaled) sorted by key —
    ``split_day`` is the first day of the RIGHT segment.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def partial(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[ts_col]))
        t = t.filter(ok)
        us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        out = pa.table({
            "key": pc.cast(t[key_col], pa.string()),
            "day": pa.array(us // 86_400_000_000),
        }).group_by(["key", "day"]).aggregate([([], "count_all")])
        return out.rename_columns(["key", "day", "n"])

    parts = grouped_agg(
        ds.select_columns([key_col, ts_col]).map_batches(
            skip_empty(partial), batch_format="pyarrow",
            zero_copy_batch=True),
        keys=["key", "day"], aggs=[("n", "sum")], final="driver")
    keys_o, days_o, m_o, gain_o = [], [], [], []
    if parts.num_rows:
        import pandas as pd

        df = parts.to_pandas().sort_values(["key", "day"])
        for key, g in df.groupby("key", sort=True):
            y = [int(v) for v in g["n_sum"]]
            days = [int(d) for d in g["day"]]
            m = len(y)
            if m < 2:
                continue
            S = sum(y)
            best_gain = -1
            best_k = None
            s_k = 0
            for k in range(1, m):
                s_k += y[k - 1]
                a = s_k * (m - k) - (S - s_k) * k
                gain = a * a * 1_000_000 // (k * (m - k))
                if gain > best_gain:
                    best_gain, best_k = gain, k
            if best_gain >= 2 ** 63:
                raise ValueError("changepoint_split: gain exceeds "
                                 "BIGINT — rescale the series first")
            keys_o.append(key)
            days_o.append(days[best_k])
            m_o.append(m)
            gain_o.append(best_gain)
    return pa.table({
        key_col: pa.array(keys_o, pa.string()),
        "split_day": pa.array(days_o, pa.int64()),
        "n_days": pa.array(m_o, pa.int64()),
        "gain_scaled": pa.array(gain_o, pa.int64()),
    })


def changepoint_split_sql(key_col: str = "event_type",
                          ts_col: str = "ts",
                          table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {key_col} AS key,
    CAST(epoch_us({ts_col}) // 86400000000 AS BIGINT) AS day,
    CAST(count(*) AS BIGINT) AS n
  FROM {table}
  WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
  GROUP BY 1, 2
), seq AS (
  SELECT key, day, n,
    row_number() OVER (PARTITION BY key ORDER BY day) AS k,
    CAST(sum(n) OVER (PARTITION BY key ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS sk,
    CAST(sum(n) OVER (PARTITION BY key) AS HUGEINT) AS s,
    CAST(count(*) OVER (PARTITION BY key) AS HUGEINT) AS m,
    lead(day) OVER (PARTITION BY key ORDER BY day) AS next_day
  FROM daily
), cand AS (
  SELECT key, next_day AS split_day, CAST(m AS BIGINT) AS n_days,
    CAST((sk*(m-k) - (s-sk)*k) * (sk*(m-k) - (s-sk)*k) * 1000000
         // (k*(m-k)) AS BIGINT) AS gain_scaled,
    row_number() OVER (
      PARTITION BY key
      ORDER BY (sk*(m-k) - (s-sk)*k) * (sk*(m-k) - (s-sk)*k) * 1000000
               // (k*(m-k)) DESC, k) AS rk
  FROM seq WHERE k < m AND m >= 2
)
SELECT key AS {key_col}, CAST(split_day AS BIGINT) AS split_day,
  n_days, gain_scaled
FROM cand WHERE rk = 1 ORDER BY key
""".strip()


# ------------------------------------------------ Theil–Sen trend

def theilsen_trend(ds, group_col: str = "event_type", ts_col: str = "ts",
                   value_col: str = "value") -> pa.Table:
    """Per-group Theil–Sen slope (median of pairwise slopes — the
    robust sibling of :func:`grouped_ols_trend`, breakdown point 29%
    vs OLS's 0) over DAILY totals: x = integer day number, y = daily
    sum of half-away int64 cents.

    Shape: the corpus collapses in one combiner pass to the bounded
    (group × day) daily-cents table (``grouped_agg`` partials — days
    are calendar-bounded, never row-bounded); the driver then forms
    all O(days²) pairwise slopes per group. Each slope is ONE float64
    division of exact ints — identical to the SQL ``(c2-c1) / CAST(d2
    - d1 AS DOUBLE)`` — and the estimate is the LOWER median
    (``sorted[(n-1)//2]``, DuckDB ``quantile_disc(0.5)``), a value
    that EXISTS in the slope set, so the float compare is exact.
    Groups with one day emit NULL slope. Output: (group, n_days,
    n_pairs, slope_cents_per_day), sorted by group.
    """
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.aggregate import grouped_agg

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[value_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[group_col])))
        day = _epoch_day(t[ts_col])
        return pa.table({group_col: t[group_col], "_day": day,
                         "cents": _cents(t[value_col])})

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    daily = grouped_agg(prepped, [group_col, "_day"],
                        [("cents", "sum")], final="driver").to_pandas()

    rows = []
    for g, sub in daily.groupby(group_col, dropna=False, sort=True):
        sub = sub.sort_values("_day")
        d = sub["_day"].to_numpy(dtype=np.int64)
        c = sub["cents_sum"].to_numpy(dtype=np.int64)
        i, j = np.triu_indices(len(d), k=1)
        slopes = (c[j] - c[i]).astype(np.float64) / (d[j] - d[i])
        slopes.sort()
        slope = (float(slopes[(len(slopes) - 1) // 2])
                 if len(slopes) else None)
        rows.append((g, len(d), len(slopes), slope))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "n_days": pa.array([r[1] for r in rows], pa.int64()),
        "n_pairs": pa.array([r[2] for r in rows], pa.int64()),
        "slope_cents_per_day": pa.array([r[3] for r in rows],
                                        pa.float64()),
    })


def theilsen_trend_sql(group_col: str = "event_type",
                       ts_col: str = "ts", value_col: str = "value",
                       table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table} WHERE {value_col} IS NOT NULL
    AND {ts_col} IS NOT NULL AND {group_col} IS NOT NULL
  GROUP BY 1, 2
), pairs AS (
  SELECT a.g, (b.c - a.c) / CAST(b.d - a.d AS DOUBLE) AS slope
  FROM daily a JOIN daily b ON b.g = a.g AND b.d > a.d
), agg AS (
  SELECT g, count(*) AS n_pairs, quantile_disc(slope, 0.5) AS slope
  FROM pairs GROUP BY g
)
SELECT nd.g AS {group_col}, nd.n_days,
  COALESCE(a.n_pairs, 0) AS n_pairs,
  CAST(a.slope AS DOUBLE) AS slope_cents_per_day
FROM (SELECT g, CAST(count(*) AS BIGINT) AS n_days
      FROM daily GROUP BY g) nd
LEFT JOIN agg a ON a.g = nd.g
ORDER BY {group_col}
""".strip()


# ------------------------------------------- Mann-Whitney U (all pairs)

def mannwhitney_pairs(ds, value_col: str = "value",
                      group_col: str = "event_type",
                      max_distinct: int = 4_000_000) -> pa.Table:
    """Mann-Whitney U (Wilcoxon rank-sum) for EVERY unordered pair of
    groups — the nonparametric "did distribution A shift vs B" test
    beside :func:`ks_two_sample` (KS is the max CDF gap; U is the
    rank-sum / AUC view, robust to outliers a t-test would chase).

    Exact-integer contract: ranks are midranks over the pooled pair
    sample, kept DOUBLED so ties stay integral (``r2 = 2*cum_before
    + n_ties + 1``); ``u2_a = 2*U_a = rank_sum2_a - n_a*(n_a+1)`` is
    an exact integer (python ints in the driver, HUGEINT in the
    mirror), and the AUC effect size ``P(a > b) + P(a = b)/2`` is ONE
    floor division to millionths — no float ranks anywhere.

    Distributed shape: one per-batch (value, group) count combiner
    collapses the corpus to the distinct-value histogram (``cells``,
    guarded by ``max_distinct`` — right for discrete/rounded value
    spaces, same caveat as :func:`ks_two_sample`); pair formation
    runs on the bounded G×V driver table. NULLs excluded; NaN raises.
    Output: (group_a, group_b, n_a, n_b, rank_sum2_a, u2_a,
    auc_millionths) sorted by (group_a, group_b).
    """
    from fluent_server_ray.stages.aggregate import grouped_counts

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[value_col]),
                             pc.is_valid(t[group_col])))
        v = pc.cast(t[value_col], pa.float64())
        if pc.any(pc.is_nan(v)).as_py():
            raise ValueError("mannwhitney_pairs: NaN value — filter first")
        return pa.table({"v": v,
                         "g": pc.cast(t[group_col], pa.string())})

    cells = grouped_counts(
        ds.select_columns([value_col, group_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["v", "g"], final="driver")
    if cells.num_rows > max_distinct:
        raise ValueError(
            "mannwhitney_pairs: distinct value space exceeds "
            "max_distinct — bin first for continuous open-scale columns")

    df = cells.to_pandas()
    wide = (df.pivot_table(index="v", columns="g", values="n",
                           aggfunc="sum", fill_value=0).sort_index())
    groups = sorted(wide.columns)
    rows = []
    for i, ga in enumerate(groups):
        xa_all = wide[ga].to_numpy()
        for gb in groups[i + 1:]:
            xb_all = wide[gb].to_numpy()
            keep = (xa_all > 0) | (xb_all > 0)
            xa, xb = xa_all[keep], xb_all[keep]
            na, nb = int(xa.sum()), int(xb.sum())
            if na == 0 or nb == 0:
                continue
            if 2 * na * nb >= 2 ** 63:
                raise ValueError(
                    "mannwhitney_pairs: 2*n_a*n_b exceeds BIGINT — "
                    "u2_a would overflow the mirror's output cast")
            # python-int accumulation: products can pass int64 at
            # open scale even when the output guard holds
            cum = 0
            r2a = 0
            for a_cnt, b_cnt in zip(xa.tolist(), xb.tolist()):
                ties = a_cnt + b_cnt
                r2 = 2 * cum + ties + 1
                r2a += a_cnt * r2
                cum += ties
            u2a = r2a - na * (na + 1)
            rows.append((ga, gb, na, nb, r2a, u2a,
                         u2a * 500_000 // (na * nb)))
    return pa.table({
        "group_a": pa.array([r[0] for r in rows], pa.string()),
        "group_b": pa.array([r[1] for r in rows], pa.string()),
        "n_a": pa.array([r[2] for r in rows], pa.int64()),
        "n_b": pa.array([r[3] for r in rows], pa.int64()),
        "rank_sum2_a": pa.array([r[4] for r in rows], pa.int64()),
        "u2_a": pa.array([r[5] for r in rows], pa.int64()),
        "auc_millionths": pa.array([r[6] for r in rows], pa.int64()),
    })


def mannwhitney_pairs_sql(value_col: str = "value",
                          group_col: str = "event_type",
                          table: str = "events") -> str:
    return f"""
WITH vals AS (
  SELECT {group_col} AS g, {value_col} AS v FROM {table}
  WHERE {value_col} IS NOT NULL AND {group_col} IS NOT NULL
), gs AS (SELECT DISTINCT g FROM vals),
pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
pooled AS (
  SELECT p.ga, p.gb, v.g, v.v
  FROM pairs p JOIN vals v ON v.g IN (p.ga, p.gb)
), ranked AS (
  SELECT ga, gb, g,
    CAST(2 * rank() OVER (PARTITION BY ga, gb ORDER BY v)
         + count(*) OVER (PARTITION BY ga, gb, v) - 1 AS HUGEINT) AS r2
  FROM pooled
), agg AS (
  SELECT ga, gb,
    CAST(count(*) FILTER (WHERE g = ga) AS HUGEINT) AS n_a,
    CAST(count(*) FILTER (WHERE g = gb) AS HUGEINT) AS n_b,
    sum(r2) FILTER (WHERE g = ga) AS r2a
  FROM ranked GROUP BY ga, gb
)
SELECT ga AS group_a, gb AS group_b,
  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  CAST(r2a AS BIGINT) AS rank_sum2_a,
  CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
  CAST((r2a - n_a * (n_a + 1)) * 500000 // (n_a * n_b) AS BIGINT)
    AS auc_millionths
FROM agg
ORDER BY group_a, group_b
""".strip()


# -------------------------------------------- Kaplan-Meier survival

def km_survival(ds, user_col: str = "user_id", ts_col: str = "ts",
                censor_days: int = 7) -> pa.Table:
    """Kaplan-Meier survival / hazard table over per-user lifetimes —
    the survival-analysis view of churn: lifetime t = days between a
    user's first and last event; a user whose last event falls within
    ``censor_days`` of the corpus end is right-CENSORED (still
    active), otherwise their lifetime ended at t (a "death").

    Exact-integer contract: the KM product-limit estimator is kept in
    millionths with a FLOORED integer recurrence ``s_i = s_{i-1} *
    (n_i - d_i) // n_i`` over timepoints in ascending-t order (s_0
    base 1,000,000) — no float product, so the curve is
    bit-mirrorable by the recursive-CTE oracle. Timepoints with only
    censoring keep s unchanged (d = 0).

    Distributed shape: one combiner groupby collapses the corpus to
    per-user (first, last) spans (``final='ray'`` — user cardinality
    is unbounded); the span dataset is materialized ONCE for its two
    consumers (corpus-end max, lifetime histogram); the calendar-
    bounded (t, censored) histogram is the only driver-side table.
    Output: (t_days, n_at_risk, d_events, c_censored,
    survival_millionths) sorted by t_days.
    """
    import numpy as np

    from fluent_server_ray.stages.aggregate import grouped_agg, grouped_counts

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                             pc.is_valid(t[user_col])))
        day = _epoch_day(t[ts_col])
        return pa.table({"u": t[user_col], "day": day})

    spans = grouped_agg(
        ds.select_columns([user_col, ts_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["u"], [("day", "min"), ("day", "max")], final="ray")
    spans = spans.materialize()  # two consumers below, one span pass

    dmax = spans.max("day_max")
    if dmax is None:  # empty / all-NULL corpus: mirror's 0 rows
        return pa.schema([
            ("t_days", pa.int64()), ("n_at_risk", pa.int64()),
            ("d_events", pa.int64()), ("c_censored", pa.int64()),
            ("survival_millionths", pa.int64())]).empty_table()

    def lifetimes(t: pa.Table) -> pa.Table:
        life = pc.subtract(t["day_max"], t["day_min"])
        cens = pc.greater(t["day_max"], dmax - censor_days)
        return pa.table({"t": life, "censored": cens})

    hist = grouped_counts(
        spans.map_batches(lifetimes, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["t", "censored"], final="driver").to_pandas()

    out_fields = [("t_days", pa.int64()), ("n_at_risk", pa.int64()),
                  ("d_events", pa.int64()), ("c_censored", pa.int64()),
                  ("survival_millionths", pa.int64())]
    if hist.empty:  # empty / all-NULL corpus: mirror's 0 rows
        return pa.schema(out_fields).empty_table()
    wide = (hist.pivot_table(index="t", columns="censored", values="n",
                             aggfunc="sum", fill_value=0)
            .reindex(columns=[False, True], fill_value=0).sort_index())
    t_vals = wide.index.to_numpy(dtype=np.int64)
    d = wide[False].to_numpy(dtype=np.int64)
    c = wide[True].to_numpy(dtype=np.int64)
    n_total = int((d + c).sum())
    # n_at_risk at t = users with lifetime >= t (suffix sum)
    n_at_risk = n_total - np.concatenate(
        [[0], np.cumsum(d + c)[:-1]]).astype(np.int64)
    s = 1_000_000
    surv = []
    for ni, di in zip(n_at_risk.tolist(), d.tolist()):
        s = s * (ni - di) // ni
        surv.append(s)
    return pa.table({
        "t_days": pa.array(t_vals, pa.int64()),
        "n_at_risk": pa.array(n_at_risk, pa.int64()),
        "d_events": pa.array(d, pa.int64()),
        "c_censored": pa.array(c, pa.int64()),
        "survival_millionths": pa.array(surv, pa.int64()),
    })


def km_survival_sql(user_col: str = "user_id", ts_col: str = "ts",
                    censor_days: int = 7, table: str = "events") -> str:
    return f"""
WITH RECURSIVE span AS (
  SELECT {user_col} AS u,
    CAST(CAST(min({ts_col}) AS DATE) - DATE '1970-01-01' AS BIGINT) AS d0,
    CAST(CAST(max({ts_col}) AS DATE) - DATE '1970-01-01' AS BIGINT) AS d1
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {user_col} IS NOT NULL
  GROUP BY 1
), lim AS (SELECT max(d1) AS dmax FROM span),
ev AS (
  SELECT d1 - d0 AS t,
    count(*) FILTER (WHERE d1 <= dmax - {censor_days}) AS d,
    count(*) FILTER (WHERE d1 > dmax - {censor_days}) AS c,
    count(*) AS n_t
  FROM span, lim GROUP BY 1
), risk AS (
  SELECT t, d, c,
    sum(n_t) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n_at_risk,
    row_number() OVER (ORDER BY t) AS rn
  FROM ev
), km AS (
  SELECT rn, t, d, c, n_at_risk,
    CAST(1000000 * (n_at_risk - d) // n_at_risk AS BIGINT) AS s
  FROM risk WHERE rn = 1
  UNION ALL
  SELECT r.rn, r.t, r.d, r.c, r.n_at_risk,
    CAST(km.s * (r.n_at_risk - r.d) // r.n_at_risk AS BIGINT)
  FROM risk r JOIN km ON r.rn = km.rn + 1
)
SELECT t AS t_days, CAST(n_at_risk AS BIGINT) AS n_at_risk,
  CAST(d AS BIGINT) AS d_events, CAST(c AS BIGINT) AS c_censored,
  s AS survival_millionths
FROM km ORDER BY t_days
""".strip()


# -------------------------------------- item co-occurrence similarity

def item_cooccurrence(ds, user_col: str = "user_id",
                      item_col: str = "event_type",
                      n_buckets: int = 256) -> pa.Table:
    """Item-item co-occurrence similarity (collaborative-filtering
    style): for every unordered pair of items, how many distinct
    users touched BOTH, with cosine and Jaccard affinity — "users who
    did A also did B" as data.

    Exactness: n_both / n_a / n_b are exact distinct-user counts;
    Jaccard is ONE floor division to millionths; cosine is the
    two-op float tree ``n_both / sqrt(DOUBLE(n_a) * n_b)`` — both
    engines evaluate the identical IEEE expression over exact ints,
    so the compare is bit-exact.

    Distributed shape: one combiner pass collapses the corpus to
    distinct (user, item) rows (``final='ray'`` — user cardinality
    unbounded), materialized ONCE for its two consumers; per-item
    totals are a bounded combiner; pair expansion co-locates each
    user's items with a ``user % n_buckets`` exchange and emits
    per-bucket item×item partials (≤ buckets × items² rows to the
    driver). Output: (item_a, item_b, n_both, n_a, n_b,
    jaccard_millionths, cosine) sorted by (item_a, item_b).
    """
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.aggregate import grouped_counts
    from fluent_server_ray.stages.groups import map_buckets

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[user_col]),
                             pc.is_valid(t[item_col])))
        return pa.table({"u": pc.cast(t[user_col], pa.int64()),
                         "g": pc.cast(t[item_col], pa.string())})

    ut = grouped_counts(
        ds.select_columns([user_col, item_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["u", "g"], final="ray").materialize()  # two consumers below

    totals = grouped_counts(ut, ["g"], final="driver").to_pandas()
    n_item = dict(zip(totals["g"], totals["n"].astype(int)))

    def bucketize(t: pa.Table) -> pa.Table:
        return pa.table({
            "_bucket": pc.cast(
                pc.bit_wise_and(t["u"], n_buckets - 1), pa.int64()),
            "u": t["u"], "g": t["g"]})

    out_schema = pa.schema([("ga", pa.string()), ("gb", pa.string()),
                            ("c", pa.int64())])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[["u", "g"]].merge(df[["u", "g"]], on="u",
                                 suffixes=("_a", "_b"))
        m = m[m["g_a"] < m["g_b"]]
        out = (m.groupby(["g_a", "g_b"], sort=False).size()
               .reset_index(name="c"))
        return out.rename(columns={"g_a": "ga", "g_b": "gb"})

    partials = map_buckets(
        ut.map_batches(bucketize, batch_format="pyarrow",
                       zero_copy_batch=True),
        pair_partial, out_schema)
    # bounded: <= n_buckets * |items|^2 partial rows
    pdf = partials.to_pandas()
    out_fields = [("item_a", pa.string()), ("item_b", pa.string()),
                  ("n_both", pa.int64()), ("n_a", pa.int64()),
                  ("n_b", pa.int64()), ("jaccard_millionths", pa.int64()),
                  ("cosine", pa.float64())]
    if pdf.empty:  # an all-empty partial dataset drops its columns
        return pa.schema(out_fields).empty_table()
    merged = (pdf.groupby(["ga", "gb"], sort=True)["c"]
              .sum().reset_index())

    na = merged["ga"].map(n_item).to_numpy(dtype=np.int64)
    nb = merged["gb"].map(n_item).to_numpy(dtype=np.int64)
    c = merged["c"].to_numpy(dtype=np.int64)
    jac = c * 1_000_000 // (na + nb - c)
    cos = c / np.sqrt(na.astype(np.float64) * nb)
    return pa.table({
        "item_a": pa.array(merged["ga"], pa.string()),
        "item_b": pa.array(merged["gb"], pa.string()),
        "n_both": pa.array(c, pa.int64()),
        "n_a": pa.array(na, pa.int64()),
        "n_b": pa.array(nb, pa.int64()),
        "jaccard_millionths": pa.array(jac, pa.int64()),
        "cosine": pa.array(cos, pa.float64()),
    })


def item_cooccurrence_sql(user_col: str = "user_id",
                          item_col: str = "event_type",
                          table: str = "events") -> str:
    return f"""
WITH ut AS (
  SELECT DISTINCT {user_col} AS u, {item_col} AS g FROM {table}
  WHERE {user_col} IS NOT NULL AND {item_col} IS NOT NULL
), n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY g),
cooc AS (
  SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS c
  FROM ut a JOIN ut b ON a.u = b.u AND a.g < b.g
  GROUP BY 1, 2
)
SELECT ga AS item_a, gb AS item_b, c AS n_both,
  na.n AS n_a, nb.n AS n_b,
  c * 1000000 // (na.n + nb.n - c) AS jaccard_millionths,
  c / sqrt(CAST(na.n AS DOUBLE) * nb.n) AS cosine
FROM cooc
JOIN n na ON na.g = cooc.ga
JOIN n nb ON nb.g = cooc.gb
ORDER BY item_a, item_b
""".strip()


# --------------------------------------------- seasonal dow index

def seasonal_dow_index(ds, group_col: str = "event_type",
                       ts_col: str = "ts",
                       value_col: str = "value") -> pa.Table:
    """Day-of-week seasonal index per group — the multiplicative
    seasonality panel ("Mondays run 1.18× this feed's average day"):
    for each (group, dow), the mean observed-day revenue relative to
    the group's all-days mean, in millionths.

    Exact-integer contract: index = (s_dow / n_dow) / (S / N) =
    ``s_dow * N * 1_000_000 // (n_dow * S)`` — python-int products
    (HUGEINT in the mirror), ONE floor division, no float means.
    Groups with zero total cents emit NULL index. ``dow7`` is the
    epoch-anchored weekday ``epoch_day % 7`` (0 = Thursday) — pure
    integer arithmetic, no locale/week-start divergence between
    engines.

    Distributed shape: one combiner pass collapses the corpus to the
    calendar-bounded (group, day) daily-cents table; everything after
    is driver arithmetic on that bounded table. Output: (group, dow7,
    n_days, cents_sum, index_millionths) sorted by (group, dow7).
    """
    from fluent_server_ray.stages.aggregate import grouped_agg

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[value_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[group_col])))
        day = _epoch_day(t[ts_col])
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "_day": day, "cents": _cents(t[value_col])})

    daily = grouped_agg(
        ds.select_columns([group_col, ts_col, value_col]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "_day"], [("cents", "sum")], final="driver").to_pandas()

    daily["dow7"] = daily["_day"] % 7
    dow = (daily.groupby(["g", "dow7"], sort=True)
           .agg(n_days=("_day", "size"), cents_sum=("cents_sum", "sum"))
           .reset_index())
    tot = (daily.groupby("g", sort=False)
           .agg(st=("cents_sum", "sum"), ct=("_day", "size")))
    idx = []
    for g, nd, s in zip(dow["g"], dow["n_days"], dow["cents_sum"]):
        st, ct = int(tot.loc[g, "st"]), int(tot.loc[g, "ct"])
        idx.append(None if st == 0
                   else int(s) * ct * 1_000_000 // (int(nd) * st))
    return pa.table({
        group_col: pa.array(dow["g"], pa.string()),
        "dow7": pa.array(dow["dow7"].astype("int64"), pa.int64()),
        "n_days": pa.array(dow["n_days"].astype("int64"), pa.int64()),
        "cents_sum": pa.array(dow["cents_sum"].astype("int64"), pa.int64()),
        "index_millionths": pa.array(idx, pa.int64()),
    })


def seasonal_dow_index_sql(group_col: str = "event_type",
                           ts_col: str = "ts", value_col: str = "value",
                           table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {group_col} IS NOT NULL
  GROUP BY 1, 2
), dow AS (
  SELECT g, d % 7 AS dow7, CAST(sum(c) AS HUGEINT) AS s,
         CAST(count(*) AS HUGEINT) AS nd
  FROM daily GROUP BY 1, 2
), tot AS (
  SELECT g, sum(s) AS st, sum(nd) AS ct FROM dow GROUP BY g
)
SELECT dow.g AS {group_col}, CAST(dow7 AS BIGINT) AS dow7,
  CAST(nd AS BIGINT) AS n_days, CAST(s AS BIGINT) AS cents_sum,
  CAST(s * ct * 1000000 // NULLIF(nd * st, 0) AS BIGINT)
    AS index_millionths
FROM dow JOIN tot ON tot.g = dow.g
ORDER BY {group_col}, dow7
""".strip()


# ------------------------------------------- time-weighted average

def twap_by_group(ds, group_col: str = "event_type",
                  ts_col: str = "ts", value_col: str = "value",
                  n_buckets: int = 256) -> pa.Table:
    """Time-weighted average value per group (TWAP): the integral of
    the last-observed-value step function over the group's
    observation span, divided by the span — the "what was the level,
    weighted by how long it held" aggregate a plain mean gets wrong
    under irregular sampling.

    Exact-integer contract: events are ordered by (ts_us, cents) —
    the tie order is part of the contract so simultaneous events
    can't make the integral engine-dependent; the numerator
    Σ cents_i × (t_{i+1} − t_i) is carried as decimal-string /
    python-int partials (HUGEINT in the mirror); the span is
    max(ts) − min(ts); the output level is ONE floor division to
    millicents. Single-event groups emit NULL.

    Distributed shape: the integral is segmented by calendar day —
    each (group, day) cell integrates its own ordered events in a
    ``hash(group, day) % n_buckets`` exchange (partitioning
    assumption: one (group, day) cell fits a worker), emitting one
    bounded partial row (within-day numerator, n, ts_min, ts_max,
    last cents); the driver stitches consecutive observed days with
    the carried last value. Output: (group, n_events, n_days,
    span_us, twap_millicents) sorted by group.
    """
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.groups import map_buckets

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[value_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[group_col])))
        tus = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        day = _epoch_day(t[ts_col])
        # day-keyed buckets: every group's slice of a day co-locates,
        # days round-robin the buckets — balance follows the calendar
        bucket = pc.bit_wise_and(day, n_buckets - 1)
        return pa.table({"_bucket": bucket,
                         "g": pc.cast(t[group_col], pa.string()),
                         "day": day, "tus": tus,
                         "c": _cents(t[value_col])})

    out_schema = pa.schema([
        ("g", pa.string()), ("day", pa.int64()), ("n", pa.int64()),
        ("tmin", pa.int64()), ("tmax", pa.int64()),
        ("c_last", pa.int64()), ("num", pa.string())])

    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (g, day), sub in df.groupby(["g", "day"], sort=False):
            sub = sub.sort_values(["tus", "c"])
            t = sub["tus"].to_numpy(dtype=np.int64)
            c = sub["c"].to_numpy(dtype=np.int64)
            if len(t) > 1:
                dt = t[1:] - t[:-1]
                peak = int(np.abs(c).max()) * int(dt.max()) if len(dt) else 0
                if len(dt) * max(peak, 1) >= (1 << 63):
                    num = sum(int(a) * int(b)
                              for a, b in zip(c[:-1].tolist(), dt.tolist()))
                else:
                    num = int(np.dot(c[:-1], dt))
            else:
                num = 0
            rows.append((g, int(day), len(t), int(t[0]), int(t[-1]),
                         int(c[-1]), str(num)))
        return pd.DataFrame(rows, columns=[
            "g", "day", "n", "tmin", "tmax", "c_last", "num"])

    partials = map_buckets(
        ds.select_columns([group_col, ts_col, value_col]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True),
        day_partial, out_schema)
    pdf = partials.to_pandas()  # bounded: one row per (group, day)
    out_fields = [(group_col, pa.string()), ("n_events", pa.int64()),
                  ("n_days", pa.int64()), ("span_us", pa.int64()),
                  ("twap_millicents", pa.int64())]
    if pdf.empty:
        return pa.schema(out_fields).empty_table()

    rows = []
    for g, sub in pdf.groupby("g", sort=True):
        sub = sub.sort_values("day")
        num = sum(int(s) for s in sub["num"])
        tmins = sub["tmin"].tolist()
        tmaxs = sub["tmax"].tolist()
        lasts = sub["c_last"].tolist()
        for k in range(len(sub) - 1):  # carry across observed days
            num += int(lasts[k]) * (int(tmins[k + 1]) - int(tmaxs[k]))
        span = int(tmaxs[-1]) - int(tmins[0])
        n_ev = int(sub["n"].sum())
        rows.append((g, n_ev, len(sub), span,
                     num * 1000 // span if span > 0 else None))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "n_events": pa.array([r[1] for r in rows], pa.int64()),
        "n_days": pa.array([r[2] for r in rows], pa.int64()),
        "span_us": pa.array([r[3] for r in rows], pa.int64()),
        "twap_millicents": pa.array([r[4] for r in rows], pa.int64()),
    })


def twap_by_group_sql(group_col: str = "event_type",
                      ts_col: str = "ts", value_col: str = "value",
                      table: str = "events") -> str:
    return f"""
WITH e AS (
  SELECT {group_col} AS g, CAST(epoch_us({ts_col}) AS BIGINT) AS tus,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    CAST(round({value_col} * 100.0) AS BIGINT) AS c
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {group_col} IS NOT NULL
), seq AS (
  SELECT g, c, tus, day,
    lead(tus) OVER (PARTITION BY g ORDER BY tus, c) AS nxt
  FROM e
), agg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_events,
    CAST(count(DISTINCT day) AS BIGINT) AS n_days,
    CAST(max(tus) - min(tus) AS HUGEINT) AS span,
    COALESCE(sum(CAST(c AS HUGEINT) * (nxt - tus)), 0) AS num
  FROM seq GROUP BY g
)
SELECT g AS {group_col}, n_events, n_days,
  CAST(span AS BIGINT) AS span_us,
  CAST(num * 1000 // NULLIF(span, 0) AS BIGINT) AS twap_millicents
FROM agg ORDER BY {group_col}
""".strip()


# ------------------------------------------------ trimmed mean

def trimmed_mean(ds, group_col: str = "event_type",
                 value_col: str = "value", trim_pct: int = 10,
                 max_distinct: int = 4_000_000) -> pa.Table:
    """Per-group trimmed mean of cents — drop the lowest and highest
    ``trim_pct`` percent of ROWS (by rank, ties split by multiplicity)
    and average the middle: the robust location estimate between
    median (50% trim) and mean (0%), immune to the tail a plain mean
    chases.

    Exact-integer contract: the kept-rank window is ``lo = floor(n ·
    trim_pct / 100)``, ``hi = n − lo`` (0-based ranks [lo, hi)); each
    distinct value contributes ``overlap([cum, cum+cnt), [lo, hi))``
    copies; the trimmed mean is ONE floor division of exact python-int
    cents·multiplicity products (HUGEINT in the mirror) to
    millicents. Groups where the window is empty (n·(100−2·trim) = 0
    rows kept) emit NULL.

    Distributed shape: one (group, value) count-combiner pass
    collapses the corpus to the distinct-cents histogram
    (``max_distinct``-guarded, the :func:`ks_two_sample` caveat);
    rank windows are driver arithmetic on that bounded table.
    Output: (group, n, n_kept, trimmed_mean_millicents) by group.
    """
    from fluent_server_ray.stages.aggregate import grouped_counts

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[value_col]),
                             pc.is_valid(t[group_col])))
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "c": _cents(t[value_col])})

    cells = grouped_counts(
        ds.select_columns([group_col, value_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "c"], final="driver")
    if cells.num_rows > max_distinct:
        raise ValueError(
            "trimmed_mean: distinct value space exceeds max_distinct — "
            "bin first for continuous open-scale columns")
    df = cells.to_pandas().sort_values(["g", "c"])
    rows = []
    for g, sub in df.groupby("g", sort=True):
        cnt = sub["n"].tolist()
        val = sub["c"].tolist()
        n = sum(int(x) for x in cnt)
        lo = n * trim_pct // 100
        hi = n - lo
        kept = 0
        total = 0
        cum = 0
        for v, c in zip(val, cnt):
            c = int(c)
            k = min(cum + c, hi) - max(cum, lo)
            if k > 0:
                kept += k
                total += int(v) * k
            cum += c
        rows.append((g, n, kept,
                     total * 1000 // kept if kept > 0 else None))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "n_kept": pa.array([r[2] for r in rows], pa.int64()),
        "trimmed_mean_millicents": pa.array([r[3] for r in rows],
                                            pa.int64()),
    })


def trimmed_mean_sql(group_col: str = "event_type",
                     value_col: str = "value", trim_pct: int = 10,
                     table: str = "events") -> str:
    return f"""
WITH c AS (
  SELECT {group_col} AS g,
    CAST(round({value_col} * 100.0) AS BIGINT) AS v,
    CAST(count(*) AS HUGEINT) AS cnt
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {group_col} IS NOT NULL
  GROUP BY 1, 2
), w AS (
  SELECT g, v, cnt,
    sum(cnt) OVER (PARTITION BY g ORDER BY v
                   ROWS UNBOUNDED PRECEDING) - cnt AS cum,
    sum(cnt) OVER (PARTITION BY g) AS n
  FROM c
), k AS (
  SELECT g, v, n,
    least(cum + cnt, n - (n * {trim_pct} // 100))
      - greatest(cum, n * {trim_pct} // 100) AS kept
  FROM w
)
SELECT g AS {group_col}, CAST(max(n) AS BIGINT) AS n,
  CAST(COALESCE(sum(kept) FILTER (WHERE kept > 0), 0) AS BIGINT)
    AS n_kept,
  CAST(sum(CAST(v AS HUGEINT) * kept) FILTER (WHERE kept > 0) * 1000
       // NULLIF(sum(kept) FILTER (WHERE kept > 0), 0) AS BIGINT)
    AS trimmed_mean_millicents
FROM k GROUP BY g ORDER BY g
""".strip()


# --------------------------------------------- Kendall tau-b

def kendall_daily_volumes(ds, key_a: str = "click",
                          key_b: str = "purchase",
                          key_col: str = "event_type",
                          ts_col: str = "ts") -> pa.Table:
    """Kendall tau-b rank correlation between two keys' daily volume
    series over days where BOTH are observed — the rank sibling of
    :func:`volume_xcorr`'s Pearson (monotone association, immune to
    the heavy days that drive a product-moment estimate).

    Exact-integer contract: concordant / discordant / tied pair
    counts are exact ints over the calendar-bounded day-pair set;
    tau-b is the two-op float tree ``(nc − nd) /
    sqrt(DOUBLE((n0−t_a)·(n0−t_b)))`` over exact ints (product < 2^53
    guarded), so the compare is bit-exact. Zero denominator (a
    constant series) emits NULL.

    Distributed shape: one combiner pass collapses the corpus to the
    (key, day) daily-count table; the O(days²) pair sweep is driver
    numpy on that bounded table. Output: one row (n_days, nc, nd,
    ties_a, ties_b, tau_b).
    """
    import math

    import numpy as np

    from fluent_server_ray.stages.aggregate import grouped_counts

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                             pc.is_in(t[key_col], value_set=pa.array(
                                 [key_a, key_b]))))
        day = _epoch_day(t[ts_col])
        return pa.table({"g": pc.cast(t[key_col], pa.string()),
                         "day": day})

    daily = grouped_counts(
        ds.select_columns([key_col, ts_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "day"], final="driver").to_pandas()

    wide = (daily.pivot_table(index="day", columns="g", values="n",
                              aggfunc="sum")
            .reindex(columns=[key_a, key_b]).dropna())
    a = wide[key_a].to_numpy(dtype=np.int64)
    b = wide[key_b].to_numpy(dtype=np.int64)
    n = len(a)
    iu, ju = np.triu_indices(n, k=1)
    da = np.sign(a[ju] - a[iu])
    db = np.sign(b[ju] - b[iu])
    nc = int(((da * db) > 0).sum())
    nd = int(((da * db) < 0).sum())
    ta = int((da == 0).sum())
    tb = int((db == 0).sum())
    n0 = n * (n - 1) // 2
    den2 = (n0 - ta) * (n0 - tb)
    if den2 >= (1 << 53):
        raise ValueError("kendall_daily_volumes: pair-count product "
                         "exceeds exact-double range")
    tau = ((nc - nd) / math.sqrt(float(den2))) if den2 > 0 else None
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "nc": pa.array([nc], pa.int64()),
        "nd": pa.array([nd], pa.int64()),
        "ties_a": pa.array([ta], pa.int64()),
        "ties_b": pa.array([tb], pa.int64()),
        "tau_b": pa.array([tau], pa.float64()),
    })


def kendall_daily_volumes_sql(key_a: str = "click",
                              key_b: str = "purchase",
                              key_col: str = "event_type",
                              ts_col: str = "ts",
                              table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {key_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    CAST(count(*) AS BIGINT) AS n
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {key_col} IN ('{key_a}', '{key_b}')
  GROUP BY 1, 2
), paired AS (
  SELECT a.day, a.n AS va, b.n AS vb
  FROM daily a JOIN daily b ON b.day = a.day
  WHERE a.g = '{key_a}' AND b.g = '{key_b}'
), pairs AS (
  SELECT sign(p2.va - p1.va) AS da, sign(p2.vb - p1.vb) AS db
  FROM paired p1 JOIN paired p2 ON p2.day > p1.day
), agg AS (
  SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM paired) AS n_days,
    CAST(count(*) FILTER (WHERE da * db > 0) AS BIGINT) AS nc,
    CAST(count(*) FILTER (WHERE da * db < 0) AS BIGINT) AS nd,
    CAST(count(*) FILTER (WHERE da = 0) AS BIGINT) AS ta,
    CAST(count(*) FILTER (WHERE db = 0) AS BIGINT) AS tb,
    CAST(count(*) AS BIGINT) AS n0
  FROM pairs
)
SELECT n_days, nc, nd, ta AS ties_a, tb AS ties_b,
  CASE WHEN (n0 - ta) * (n0 - tb) > 0 THEN
    (nc - nd) / sqrt(CAST((n0 - ta) * (n0 - tb) AS DOUBLE))
  ELSE NULL END AS tau_b
FROM agg
""".strip()


# --------------------------------------- linear-interp daily resample

def daily_interpolate(ds, group_col: str = "event_type",
                      ts_col: str = "ts",
                      value_col: str = "value") -> pa.Table:
    """Daily-grid resample with LINEAR interpolation per group: every
    calendar day between a group's first and last observed day gets a
    value — observed days pass their exact daily cents through,
    gap days get the integer-floored linear interpolation between the
    neighboring observed days (the interpolating sibling of the
    forward-fill resampler, for rates rather than levels).

    Exact-integer contract: interp = ``(c_prev·(d_next−d) +
    c_next·(d−d_prev)) // (d_next−d_prev)`` in python ints (HUGEINT
    mirror) — no float lerp, so gap values are engine-identical.

    Distributed shape: one combiner pass to the calendar-bounded
    (group, day) daily-cents table; grid expansion and the
    prev/next sweep are driver numpy on that bounded table.
    Output: (group, day, cents, is_interpolated) sorted by
    (group, day).
    """
    import numpy as np

    from fluent_server_ray.stages.aggregate import grouped_agg

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[value_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[group_col])))
        day = _epoch_day(t[ts_col])
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "_day": day, "cents": _cents(t[value_col])})

    daily = grouped_agg(
        ds.select_columns([group_col, ts_col, value_col]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "_day"], [("cents", "sum")], final="driver").to_pandas()

    out_g, out_d, out_c, out_i = [], [], [], []
    for g, sub in daily.groupby("g", sort=True):
        sub = sub.sort_values("_day")
        d = sub["_day"].to_numpy(dtype=np.int64)
        c = sub["cents_sum"].to_numpy(dtype=np.int64)
        grid = np.arange(d[0], d[-1] + 1, dtype=np.int64)
        # index of previous observed day for every grid day
        prev_idx = np.searchsorted(d, grid, side="right") - 1
        observed = d[prev_idx] == grid
        for day, pi, obs in zip(grid.tolist(), prev_idx.tolist(),
                                observed.tolist()):
            out_g.append(g)
            out_d.append(day)
            out_i.append(not obs)
            if obs:
                out_c.append(int(c[pi]))
            else:
                dp, dn = int(d[pi]), int(d[pi + 1])
                cp, cn = int(c[pi]), int(c[pi + 1])
                out_c.append((cp * (dn - day) + cn * (day - dp))
                             // (dn - dp))
    return pa.table({
        group_col: pa.array(out_g, pa.string()),
        "day": pa.array(out_d, pa.int64()),
        "cents": pa.array(out_c, pa.int64()),
        "is_interpolated": pa.array(out_i, pa.bool_()),
    })


def daily_interpolate_sql(group_col: str = "event_type",
                          ts_col: str = "ts",
                          value_col: str = "value",
                          table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
    CAST(SUM(CAST(round({value_col} * 100.0) AS BIGINT))
         AS HUGEINT) AS c
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {group_col} IS NOT NULL
  GROUP BY 1, 2
), span AS (
  SELECT g, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY g
), grid AS (
  SELECT g, CAST(gs AS BIGINT) AS day
  FROM span CROSS JOIN unnest(generate_series(d0, d1)) AS u(gs)
), j AS (
  SELECT grid.g, grid.day, daily.c,
    max(CASE WHEN daily.c IS NOT NULL THEN grid.day END)
      OVER (PARTITION BY grid.g ORDER BY grid.day
            ROWS UNBOUNDED PRECEDING) AS dp,
    min(CASE WHEN daily.c IS NOT NULL THEN grid.day END)
      OVER (PARTITION BY grid.g ORDER BY grid.day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS dn
  FROM grid LEFT JOIN daily ON daily.g = grid.g AND daily.d = grid.day
), f AS (
  SELECT j.g, j.day, j.c, j.dp, j.dn, cp.c AS cpv, cn.c AS cnv
  FROM j
  LEFT JOIN daily cp ON cp.g = j.g AND cp.d = j.dp
  LEFT JOIN daily cn ON cn.g = j.g AND cn.d = j.dn
)
SELECT g AS {group_col}, day,
  CAST(CASE WHEN c IS NOT NULL THEN c
       ELSE (cpv * (dn - day) + cnv * (day - dp)) // (dn - dp)
       END AS BIGINT) AS cents,
  (c IS NULL) AS is_interpolated
FROM f ORDER BY {group_col}, day
""".strip()


# ----------------------------------------------- runs test

def runs_test_daily(ds, group_col: str = "event_type",
                    ts_col: str = "ts",
                    value_col: str = "value") -> pa.Table:
    """Wald–Wolfowitz runs test per group over the SIGNS of
    day-over-day revenue deltas — "do this feed's daily moves look
    random, or do they streak" (momentum/mean-reversion screen, the
    randomness sibling of :func:`volume_autocorr`). Zero deltas are
    dropped by contract before runs are counted.

    Exactness: n_pos / n_neg / n_runs are exact ints over the
    calendar-bounded delta sequence; the z-score is a FIXED float
    tree over those ints (every intermediate product < 2^53, the
    mirror spells the identical expression), NULL when either sign is
    absent or the variance term is non-positive.

    Distributed shape: one combiner pass to the (group, day) daily
    cents table, driver sweep on the bounded result. Output:
    (group, n_pos, n_neg, n_runs, z) sorted by group.
    """
    import math

    import numpy as np

    from fluent_server_ray.stages.aggregate import grouped_agg

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[value_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[group_col])))
        day = _epoch_day(t[ts_col])
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "_day": day, "cents": _cents(t[value_col])})

    daily = grouped_agg(
        ds.select_columns([group_col, ts_col, value_col]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "_day"], [("cents", "sum")], final="driver").to_pandas()

    rows = []
    for g, sub in daily.groupby("g", sort=True):
        sub = sub.sort_values("_day")
        c = sub["cents_sum"].to_numpy(dtype=np.int64)
        s = np.sign(np.diff(c))
        s = s[s != 0]
        n1 = int((s > 0).sum())
        n2 = int((s < 0).sum())
        r = (1 + int((s[1:] != s[:-1]).sum())) if len(s) else 0
        n = n1 + n2
        if n1 > 0 and n2 > 0 and 2.0 * n1 * n2 > n:
            mu = 2.0 * n1 * n2 / n + 1.0
            var = ((2.0 * n1 * n2 * (2.0 * n1 * n2 - n))
                   / (float(n) * n * (n - 1)))
            z = (float(r) - mu) / math.sqrt(var)
        else:
            z = None
        rows.append((g, n1, n2, r, z))
    return pa.table({
        group_col: pa.array([x[0] for x in rows], pa.string()),
        "n_pos": pa.array([x[1] for x in rows], pa.int64()),
        "n_neg": pa.array([x[2] for x in rows], pa.int64()),
        "n_runs": pa.array([x[3] for x in rows], pa.int64()),
        "z": pa.array([x[4] for x in rows], pa.float64()),
    })


def runs_test_daily_sql(group_col: str = "event_type",
                        ts_col: str = "ts", value_col: str = "value",
                        table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {group_col} IS NOT NULL
  GROUP BY 1, 2
), delta AS (
  SELECT g, d,
    c - lag(c) OVER (PARTITION BY g ORDER BY d) AS dc
  FROM daily
), s AS (
  SELECT g, d, sign(dc) AS sg FROM delta
  WHERE dc IS NOT NULL AND dc <> 0
), runs AS (
  SELECT g, sg, lag(sg) OVER (PARTITION BY g ORDER BY d) AS prev
  FROM s
), agg AS (
  SELECT daily.g,
    COALESCE(r.n_pos, 0) AS n_pos, COALESCE(r.n_neg, 0) AS n_neg,
    COALESCE(r.n_runs, 0) AS n_runs
  FROM (SELECT DISTINCT g FROM daily) daily
  LEFT JOIN (
    SELECT g,
      CAST(count(*) FILTER (WHERE sg = 1) AS BIGINT) AS n_pos,
      CAST(count(*) FILTER (WHERE sg = -1) AS BIGINT) AS n_neg,
      CAST(1 + count(*) FILTER (WHERE prev IS NOT NULL
                                AND sg <> prev) AS BIGINT) AS n_runs
    FROM runs GROUP BY g
  ) r ON r.g = daily.g
)
SELECT g AS {group_col}, n_pos, n_neg, n_runs,
  CASE WHEN n_pos > 0 AND n_neg > 0
            AND 2.0 * n_pos * n_neg > (n_pos + n_neg) THEN
    (CAST(n_runs AS DOUBLE) - (2.0 * n_pos * n_neg
                               / (n_pos + n_neg) + 1.0))
    / sqrt((2.0 * n_pos * n_neg
            * (2.0 * n_pos * n_neg - (n_pos + n_neg)))
           / (CAST(n_pos + n_neg AS DOUBLE) * (n_pos + n_neg)
              * (n_pos + n_neg - 1)))
  ELSE NULL END AS z
FROM agg ORDER BY {group_col}
""".strip()


# ------------------------------------------- churn label generation

def churn_labels(ds, user_col: str = "user_id", ts_col: str = "ts",
                 value_col: str = "value",
                 n_buckets: int = 64):
    """Supervised churn-label materialization: one row per active
    (user, week) with that week's activity features and the LABEL
    "was the user active in week+1" — the label-generation step of a
    churn model's training pipeline, leakage-free by construction
    (features from week w, label from w+1, final observed week
    dropped because its label is unknowable).

    Weeks are ``epoch_day // 7`` (exact integer, engine-identical);
    features are exact counts / cents sums (NULL value counts as 0
    cents but still an event). Distributed shape: one (user, week)
    combiner (``final='ray'`` — user cardinality unbounded),
    materialized ONCE for its three consumers (max-week scalar, both
    join sides); the label is ONE bucketed left self-join on the
    (user, week+1) key. Returns a Dataset (user_id, week, n_events,
    cents_sum, active_next) sorted by (user_id, week).
    """
    from fluent_server_ray.stages.aggregate import grouped_agg
    from fluent_server_ray.stages.joins import bucketed_hash_join

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                             pc.is_valid(t[user_col])))
        day = _epoch_day(t[ts_col])
        return pa.table({
            "u": pc.cast(t[user_col], pa.int64()),
            "w": pc.divide(day, 7),  # epoch days >= 0: trunc == floor
            "c": _cents(pc.fill_null(pc.cast(t[value_col], pa.float64()),
                                     0.0))})

    uw = grouped_agg(
        ds.select_columns([user_col, ts_col, value_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["u", "w"], [("c", "sum"), ("c", "count")],
        final="ray").materialize()

    wmax = uw.max("w")

    def left_side(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["w"], wmax))
        key = pc.binary_join_element_wise(
            pc.cast(t["u"], pa.string()),
            pc.cast(pc.add(t["w"], 1), pa.string()), "#")
        return pa.table({"_k": key, "u": t["u"], "w": t["w"],
                         "n_events": pc.cast(t["c_count"], pa.int64()),
                         "cents_sum": pc.cast(t["c_sum"], pa.int64())})

    def right_side(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["u"], pa.string()),
            pc.cast(t["w"], pa.string()), "#")
        ones = pa.array(np.ones(t.num_rows, dtype=np.int64))
        return pa.table({"_k": key, "_hit": ones})

    joined = bucketed_hash_join(
        uw.map_batches(left_side, batch_format="pyarrow",
                       zero_copy_batch=True),
        uw.map_batches(right_side, batch_format="pyarrow",
                       zero_copy_batch=True),
        key="_k", n_buckets=n_buckets, how="left")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t["u"], pa.int64()),
            "week": pc.cast(t["w"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "cents_sum": pc.cast(t["cents_sum"], pa.int64()),
            "active_next": pc.is_valid(t["_hit"]),
        })

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True).sort(
        ["user_id", "week"])


def churn_labels_sql(user_col: str = "user_id", ts_col: str = "ts",
                     value_col: str = "value",
                     table: str = "events") -> str:
    return f"""
WITH e AS (
  SELECT {user_col} AS u,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT)
      // 7 AS w,
    CAST(round(COALESCE({value_col}, 0.0) * 100.0) AS BIGINT) AS c
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {user_col} IS NOT NULL
), uw AS (
  SELECT u, w, CAST(count(*) AS BIGINT) AS n_events,
    CAST(sum(c) AS BIGINT) AS cents_sum
  FROM e GROUP BY 1, 2
), mx AS (SELECT max(w) AS wmax FROM uw)
SELECT a.u AS {user_col}, CAST(a.w AS BIGINT) AS week,
  a.n_events, a.cents_sum, (b.u IS NOT NULL) AS active_next
FROM uw a LEFT JOIN uw b ON b.u = a.u AND b.w = a.w + 1, mx
WHERE a.w < mx.wmax
ORDER BY {user_col}, week
""".strip()


# -------------------------------------------- weighted quantiles

def weighted_quantiles(ds, group_col: str, value_col: str,
                       weight_col: str,
                       max_distinct: int = 4_000_000) -> pa.Table:
    """Weight-aware order statistics per group: the 25/50/75th
    percentiles of value cents where each row counts ``weight`` times
    — "the median PRICE of a unit sold" rather than of a line item
    (quantity-weighted), the first moment a revenue analysis actually
    wants.

    Exact-integer contract: weights round half-away to int64 (rows
    with weight ≤ 0 are dropped by contract); the q-quantile is the
    smallest value whose cumulative weight reaches ``ceil(q·W)``
    (integer arithmetic, the discrete lower-quantile rule — reduces
    to the unweighted lower median at unit weights). No floats
    anywhere.

    Distributed shape: one (group, value) weight-sum combiner to the
    distinct-cents histogram (``max_distinct`` guard, the
    :func:`ks_two_sample` caveat); quantile picks are a driver cumsum
    on the bounded table. Output: (group, total_weight, p25_cents,
    p50_cents, p75_cents) sorted by group.
    """
    import numpy as np

    from fluent_server_ray.stages.aggregate import grouped_agg

    def proj(t: pa.Table) -> pa.Table:
        wt = pc.cast(pc.round(pc.cast(t[weight_col], pa.float64()),
                              round_mode="half_towards_infinity"),
                     pa.int64())
        keep = pc.and_(pc.and_(pc.is_valid(t[value_col]),
                               pc.is_valid(t[group_col])),
                       pc.greater(pc.fill_null(wt, 0), 0))
        t = t.append_column("_wt", wt).filter(keep)
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "c": _cents(pc.cast(t[value_col],
                                             pa.float64())),
                         "w": t["_wt"]})

    hist = grouped_agg(
        ds.select_columns([group_col, value_col, weight_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "c"], [("w", "sum")], final="driver")
    if hist.num_rows > max_distinct:
        raise ValueError(
            "weighted_quantiles: distinct value space exceeds "
            "max_distinct — bin first for continuous open-scale columns")
    df = hist.to_pandas().sort_values(["g", "c"])
    rows = []
    for g, sub in df.groupby("g", sort=True):
        c = sub["c"].tolist()
        w = [int(x) for x in sub["w_sum"]]
        tw = sum(w)
        cum = np.cumsum(w)

        def pick(num: int, den: int):
            t = (num * tw + den - 1) // den  # ceil(q*W) in ints
            return int(c[int(np.searchsorted(cum, t, side="left"))])

        rows.append((g, tw, pick(1, 4), pick(1, 2), pick(3, 4)))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "total_weight": pa.array([r[1] for r in rows], pa.int64()),
        "p25_cents": pa.array([r[2] for r in rows], pa.int64()),
        "p50_cents": pa.array([r[3] for r in rows], pa.int64()),
        "p75_cents": pa.array([r[4] for r in rows], pa.int64()),
    })


def weighted_quantiles_sql(group_col: str, value_col: str,
                           weight_col: str, table: str) -> str:
    return f"""
WITH src AS (
  SELECT {group_col} AS g,
    CAST(round({value_col} * 100.0) AS BIGINT) AS c,
    CAST(round({weight_col}) AS BIGINT) AS wt
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {group_col} IS NOT NULL
    AND round({weight_col}) > 0
), h AS (
  SELECT g, c, CAST(sum(wt) AS HUGEINT) AS w FROM src GROUP BY 1, 2
), cum AS (
  SELECT g, c,
    sum(w) OVER (PARTITION BY g ORDER BY c
                 ROWS UNBOUNDED PRECEDING) AS cw,
    sum(w) OVER (PARTITION BY g) AS tw
  FROM h
)
SELECT g AS {group_col}, CAST(max(tw) AS BIGINT) AS total_weight,
  CAST(min(CASE WHEN cw >= (tw + 3) // 4 THEN c END) AS BIGINT)
    AS p25_cents,
  CAST(min(CASE WHEN cw >= (tw + 1) // 2 THEN c END) AS BIGINT)
    AS p50_cents,
  CAST(min(CASE WHEN cw >= (3 * tw + 3) // 4 THEN c END) AS BIGINT)
    AS p75_cents
FROM cum GROUP BY g ORDER BY g
""".strip()


# --------------------------------------------- dispersion (Fano)

def fano_dispersion(ds, group_col: str = "event_type",
                    ts_col: str = "ts") -> pa.Table:
    """Fano factor (index of dispersion) of daily event counts per
    group: sample-variance / mean — the Poisson-ness check for an
    arrival process (≈1e6 millionths = Poisson; above = bursty /
    overdispersed, below = regularized), the one-number summary
    beside :func:`volume_autocorr`'s lag structure.

    Exact-integer contract: F = (n·Σc² − (Σc)²) · 1e6 //
    ((n−1)·Σc) over the calendar-bounded daily counts — python-int
    products (HUGEINT mirror), ONE floor division to millionths.
    Groups with a single observed day emit NULL.

    Distributed shape: one (group, day) count combiner; moments are
    driver arithmetic on the bounded table. Output: (group, n_days,
    events_sum, fano_millionths) sorted by group.
    """
    from fluent_server_ray.stages.aggregate import grouped_counts

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                             pc.is_valid(t[group_col])))
        day = _epoch_day(t[ts_col])
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "day": day})

    daily = grouped_counts(
        ds.select_columns([group_col, ts_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "day"], final="driver").to_pandas()

    rows = []
    for g, sub in daily.groupby("g", sort=True):
        c = [int(x) for x in sub["n"]]
        n = len(c)
        s = sum(c)
        q = sum(x * x for x in c)
        fano = ((n * q - s * s) * 1_000_000 // ((n - 1) * s)
                if n > 1 and s > 0 else None)
        rows.append((g, n, s, fano))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "n_days": pa.array([r[1] for r in rows], pa.int64()),
        "events_sum": pa.array([r[2] for r in rows], pa.int64()),
        "fano_millionths": pa.array([r[3] for r in rows], pa.int64()),
    })


def fano_dispersion_sql(group_col: str = "event_type",
                        ts_col: str = "ts",
                        table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
    CAST(count(*) AS HUGEINT) AS c
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {group_col} IS NOT NULL
  GROUP BY 1, 2
), m AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n, sum(c) AS s,
    sum(c * c) AS q
  FROM daily GROUP BY g
)
SELECT g AS {group_col}, CAST(n AS BIGINT) AS n_days,
  CAST(s AS BIGINT) AS events_sum,
  CAST(CASE WHEN n > 1 AND s > 0 THEN
    (n * q - s * s) * 1000000 // ((n - 1) * s)
  ELSE NULL END AS BIGINT) AS fano_millionths
FROM m ORDER BY {group_col}
""".strip()


# --------------------------------------------- Spearman rho

def spearman_daily_volumes(ds, key_a: str = "click",
                           key_b: str = "purchase",
                           key_col: str = "event_type",
                           ts_col: str = "ts") -> pa.Table:
    """Spearman rank correlation between two keys' daily volume
    series over days where BOTH are observed — Pearson on midranks
    (the grade sibling of :func:`kendall_daily_volumes`; Spearman
    weighs the SIZE of rank disagreements, Kendall counts them).

    Exact contract: midranks are kept DOUBLED so ties stay integral
    (the :func:`mannwhitney_pairs` trick); the correlation is the
    :func:`pearson_corr` exact-integer-moment / one-float-tree
    discipline over those doubled ranks — python ints here, HUGEINT
    + VARCHAR→DOUBLE in the mirror, bit-exact. Constant series emit
    NULL.

    Distributed shape: one combiner pass to the (key, day) daily
    counts; ranking and moments are driver arithmetic on the
    calendar-bounded overlap. Output: one row (n_days, rho).
    """
    import math

    import numpy as np

    from fluent_server_ray.stages.aggregate import grouped_counts

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                             pc.is_in(t[key_col], value_set=pa.array(
                                 [key_a, key_b]))))
        day = _epoch_day(t[ts_col])
        return pa.table({"g": pc.cast(t[key_col], pa.string()),
                         "day": day})

    daily = grouped_counts(
        ds.select_columns([key_col, ts_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "day"], final="driver").to_pandas()

    wide = (daily.pivot_table(index="day", columns="g", values="n",
                              aggfunc="sum")
            .reindex(columns=[key_a, key_b]).dropna())
    n = len(wide)

    def rank2(v):
        # doubled average midranks, exact ints
        r = pd.Series(v).rank(method="average").to_numpy() * 2
        return np.rint(r).astype(np.int64)

    import pandas as pd

    if n == 0:
        return pa.table({"n_days": pa.array([0], pa.int64()),
                         "rho": pa.array([None], pa.float64())})
    x = [int(v) for v in rank2(wide[key_a].to_numpy())]
    y = [int(v) for v in rank2(wide[key_b].to_numpy())]
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx = sum(a * a for a in x)
    syy = sum(b * b for b in y)
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    rho = (float(n * sxy - sx * sy)
           / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
           if dx > 0 and dy > 0 else None)
    return pa.table({"n_days": pa.array([n], pa.int64()),
                     "rho": pa.array([rho], pa.float64())})


def spearman_daily_volumes_sql(key_a: str = "click",
                               key_b: str = "purchase",
                               key_col: str = "event_type",
                               ts_col: str = "ts",
                               table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {key_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    CAST(count(*) AS BIGINT) AS n
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {key_col} IN ('{key_a}', '{key_b}')
  GROUP BY 1, 2
), paired AS (
  SELECT a.day, a.n AS va, b.n AS vb
  FROM daily a JOIN daily b ON b.day = a.day
  WHERE a.g = '{key_a}' AND b.g = '{key_b}'
), r AS (
  SELECT
    CAST(2 * rank() OVER (ORDER BY va)
         + count(*) OVER (PARTITION BY va) - 1 AS HUGEINT) AS x,
    CAST(2 * rank() OVER (ORDER BY vb)
         + count(*) OVER (PARTITION BY vb) - 1 AS HUGEINT) AS y
  FROM paired
), s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_days,
  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
    CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
    / (sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
       * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)))
  ELSE NULL END AS rho
FROM s
""".strip()


# ------------------------------------------ new vs returning users

def new_vs_returning(ds, user_col: str = "user_id",
                     ts_col: str = "ts") -> pa.Table:
    """Growth accounting: per calendar day, how many distinct users
    were active and how many of them were NEW (first-ever day) — the
    daily new/returning split a growth dashboard leads with, and the
    flow view of :func:`km_survival`'s stock.

    Distributed shape: one combiner pass yields BOTH per-user first
    days (min over (user,day)) and the distinct (user, day) activity
    set (``final='ray'`` merges — user cardinality unbounded,
    materialized once for its two consumers); each collapses to a
    calendar-bounded per-day count on the driver. Exact integers
    throughout. Output: (day, n_active, n_new, n_returning) sorted.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, grouped_counts

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                             pc.is_valid(t[user_col])))
        day = _epoch_day(t[ts_col])
        return pa.table({"u": pc.cast(t[user_col], pa.int64()),
                         "day": day})

    ud = grouped_counts(
        ds.select_columns([user_col, ts_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["u", "day"], final="ray").materialize()

    # per-day active counts (bounded by calendar)
    def day_partial(t: pa.Table) -> pa.Table:
        return (pa.table({"day": t["day"]}).group_by("day")
                .aggregate([([], "count_all")])
                .rename_columns(["day", "c"]))

    active = grouped_agg(
        ud.map_batches(day_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["day"], [("c", "sum")], final="driver").to_pandas()

    # per-user first day -> per-day new counts
    firsts = grouped_agg(ud, ["u"], [("day", "min")], final="ray")

    def first_partial(t: pa.Table) -> pa.Table:
        return (pa.table({"day": t["day_min"]}).group_by("day")
                .aggregate([([], "count_all")])
                .rename_columns(["day", "c"]))

    new = grouped_agg(
        firsts.map_batches(first_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["day"], [("c", "sum")], final="driver").to_pandas()

    merged = (active.rename(columns={"c_sum": "n_active"})
              .merge(new.rename(columns={"c_sum": "n_new"}),
                     on="day", how="left").sort_values("day"))
    n_new = merged["n_new"].fillna(0).astype("int64")
    return pa.table({
        "day": pa.array(merged["day"].astype("int64"), pa.int64()),
        "n_active": pa.array(merged["n_active"].astype("int64"),
                             pa.int64()),
        "n_new": pa.array(n_new, pa.int64()),
        "n_returning": pa.array(
            merged["n_active"].astype("int64") - n_new, pa.int64()),
    })


def new_vs_returning_sql(user_col: str = "user_id", ts_col: str = "ts",
                         table: str = "events") -> str:
    return f"""
WITH ud AS (
  SELECT DISTINCT {user_col} AS u,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {user_col} IS NOT NULL
), firsts AS (
  SELECT u, min(day) AS d0 FROM ud GROUP BY u
), act AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_active FROM ud GROUP BY day
), nw AS (
  SELECT d0 AS day, CAST(count(*) AS BIGINT) AS n_new
  FROM firsts GROUP BY d0
)
SELECT act.day, act.n_active, COALESCE(nw.n_new, 0) AS n_new,
  act.n_active - COALESCE(nw.n_new, 0) AS n_returning
FROM act LEFT JOIN nw ON nw.day = act.day
ORDER BY act.day
""".strip()


# ----------------------------------------- order fulfillment SLA

def ship_latency_quantiles(orders, lines,
                           n_buckets: int = 64) -> pa.Table:
    """Order-fulfillment SLA panel: days between order date and each
    line's ship date, summarized per order priority as exact
    lower-quantile picks (p50/p90/p99) plus max — "are URGENT orders
    actually shipping faster" as one table.

    Exact-integer contract: latency is whole epoch-day subtraction;
    the q-quantile is the smallest latency whose cumulative count
    reaches ``ceil(q·n)`` (integer rank rule, the
    :func:`weighted_quantiles` convention at unit weights).

    Distributed shape: ONE bucketed hash join ships each line its
    order's (date, priority); the (priority, days) histogram is a
    combiner (calendar-bounded × priorities); picks are driver
    arithmetic. Output: (o_orderpriority, n_lines, p50_days,
    p90_days, p99_days, max_days) sorted by priority.
    """
    import numpy as np

    from fluent_server_ray.stages.aggregate import grouped_counts
    from fluent_server_ray.stages.joins import bucketed_hash_join

    def oc(t: pa.Table) -> pa.Table:
        day = _epoch_day(t["o_orderdate"])
        return pa.table({"okey": pc.cast(t["o_orderkey"], pa.int64()),
                         "oday": day,
                         "prio": pc.cast(t["o_orderpriority"],
                                         pa.string())})

    def lc(t: pa.Table) -> pa.Table:
        day = _epoch_day(t["l_shipdate"])
        return pa.table({"okey": pc.cast(t["l_orderkey"], pa.int64()),
                         "sday": day})

    joined = bucketed_hash_join(
        lines.select_columns(["l_orderkey", "l_shipdate"]).map_batches(
            lc, batch_format="pyarrow", zero_copy_batch=True),
        orders.select_columns(["o_orderkey", "o_orderdate",
                               "o_orderpriority"]).map_batches(
            oc, batch_format="pyarrow", zero_copy_batch=True),
        key="okey", n_buckets=n_buckets)

    def lat(t: pa.Table) -> pa.Table:
        return pa.table({
            "prio": t["prio"],
            "days": pc.subtract(pc.cast(t["sday"], pa.int64()),
                                pc.cast(t["oday"], pa.int64()))})

    hist = grouped_counts(
        joined.map_batches(lat, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["prio", "days"], final="driver").to_pandas()

    rows = []
    for g, sub in hist.groupby("prio", sort=True):
        sub = sub.sort_values("days")
        d = sub["days"].tolist()
        n = int(sub["n"].sum())
        cum = np.cumsum([int(x) for x in sub["n"]])

        def pick(num, den):
            t = (num * n + den - 1) // den
            return int(d[int(np.searchsorted(cum, t, side="left"))])

        rows.append((g, n, pick(1, 2), pick(9, 10), pick(99, 100),
                     int(d[-1])))
    return pa.table({
        "o_orderpriority": pa.array([r[0] for r in rows], pa.string()),
        "n_lines": pa.array([r[1] for r in rows], pa.int64()),
        "p50_days": pa.array([r[2] for r in rows], pa.int64()),
        "p90_days": pa.array([r[3] for r in rows], pa.int64()),
        "p99_days": pa.array([r[4] for r in rows], pa.int64()),
        "max_days": pa.array([r[5] for r in rows], pa.int64()),
    })


def ship_latency_quantiles_sql(orders: str = "orders",
                               lines: str = "lineitem") -> str:
    return f"""
WITH j AS (
  SELECT o.o_orderpriority AS prio,
    CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
         AS BIGINT) AS days
  FROM {lines} l JOIN {orders} o ON o.o_orderkey = l.l_orderkey
), h AS (
  SELECT prio, days, CAST(count(*) AS HUGEINT) AS c FROM j
  GROUP BY 1, 2
), cum AS (
  SELECT prio, days, c,
    sum(c) OVER (PARTITION BY prio ORDER BY days
                 ROWS UNBOUNDED PRECEDING) AS cw,
    sum(c) OVER (PARTITION BY prio) AS n
  FROM h
)
SELECT prio AS o_orderpriority, CAST(max(n) AS BIGINT) AS n_lines,
  CAST(min(CASE WHEN cw >= (n + 1) // 2 THEN days END) AS BIGINT)
    AS p50_days,
  CAST(min(CASE WHEN cw >= (9 * n + 9) // 10 THEN days END) AS BIGINT)
    AS p90_days,
  CAST(min(CASE WHEN cw >= (99 * n + 99) // 100 THEN days END)
       AS BIGINT) AS p99_days,
  CAST(max(days) AS BIGINT) AS max_days
FROM cum GROUP BY prio ORDER BY prio
""".strip()


# --------------------------------------------- trailing EWMA

def ewma_daily(ds, group_col: str = "event_type", ts_col: str = "ts",
               value_col: str = "value", window: int = 7) -> pa.Table:
    """Trailing exponentially-weighted daily revenue per group: on
    the calendar grid between a group's first and last observed day,
    the weighted mean of the trailing ``window+1`` days' cents with
    EXACT binary weights ``2^(window−age)`` (today 2^w … age=window
    1; missing grid days contribute 0) — the smoothed "level" line a
    monitoring dashboard draws, decay math in pure integers (the
    :func:`tags_decayed` power-of-two trick on a calendar grid).

    Exact-integer contract: numerator Σ cents·2^(w−age) and the
    clipped geometric denominator ``2^(w+1) − 2^(w−m)`` (m = ages
    available at the series start) are python ints / HUGEINT;
    the output is ONE floor division to millicents.

    Distributed shape: one combiner pass to the (group, day) daily
    cents; the grid convolution is driver arithmetic on the
    calendar-bounded table. Output: (group, day, ewma_millicents)
    sorted by (group, day).
    """
    from fluent_server_ray.stages.aggregate import grouped_agg

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[value_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[group_col])))
        day = _epoch_day(t[ts_col])
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "_day": day, "cents": _cents(t[value_col])})

    daily = grouped_agg(
        ds.select_columns([group_col, ts_col, value_col]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "_day"], [("cents", "sum")], final="driver").to_pandas()

    out_g, out_d, out_e = [], [], []
    for g, sub in daily.groupby("g", sort=True):
        cmap = {int(d): int(c) for d, c in
                zip(sub["_day"], sub["cents_sum"])}
        d0, d1 = min(cmap), max(cmap)
        for day in range(d0, d1 + 1):
            m = min(window, day - d0)
            num = sum(cmap.get(day - k, 0) * (1 << (window - k))
                      for k in range(m + 1))
            den = (1 << (window + 1)) - (1 << (window - m))
            out_g.append(g)
            out_d.append(day)
            out_e.append(num * 1000 // den)
    return pa.table({
        group_col: pa.array(out_g, pa.string()),
        "day": pa.array(out_d, pa.int64()),
        "ewma_millicents": pa.array(out_e, pa.int64()),
    })


def ewma_daily_sql(group_col: str = "event_type", ts_col: str = "ts",
                   value_col: str = "value", window: int = 7,
                   table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
    CAST(SUM(CAST(round({value_col} * 100.0) AS BIGINT))
         AS HUGEINT) AS c
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {group_col} IS NOT NULL
  GROUP BY 1, 2
), span AS (
  SELECT g, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY g
), grid AS (
  SELECT g, d0, CAST(gs AS BIGINT) AS day
  FROM span CROSS JOIN unnest(generate_series(d0, d1)) AS u(gs)
), num AS (
  SELECT grid.g, grid.day, grid.d0,
    COALESCE(sum(daily.c
                 * (CAST(1 AS HUGEINT)
                    << CAST({window} - (grid.day - daily.d)
                            AS INTEGER))), 0) AS num
  FROM grid LEFT JOIN daily
    ON daily.g = grid.g
   AND grid.day - daily.d BETWEEN 0 AND {window}
  GROUP BY 1, 2, 3
)
SELECT g AS {group_col}, day,
  CAST(num * 1000
       // ((CAST(1 AS HUGEINT) << {window + 1})
           - (CAST(1 AS HUGEINT)
              << CAST({window} - least({window}, day - d0)
                      AS INTEGER))) AS BIGINT) AS ewma_millicents
FROM num ORDER BY {group_col}, day
""".strip()


# --------------------------------------------- MAD outlier days

def outlier_days_mad(ds, group_col: str = "event_type",
                     ts_col: str = "ts", k: int = 3) -> pa.Table:
    """Robust outlier-DAY detection per group: days whose event
    volume deviates from the group's median by more than ``k`` × MAD
    (median absolute deviation) — the holiday/incident screen that
    a mean/stddev z-score misses when the outliers themselves inflate
    the stddev (breakdown point 50% vs 0).

    Exact-integer contract: volumes are counts; median and MAD are
    LOWER medians (``sorted[(n−1)//2]``, values that EXIST in the
    set); the flag is the pure integer comparison ``|v − med| >
    k·MAD``. Groups with MAD = 0 flag nothing by contract (a
    degenerate, near-constant series). Distributed shape: one daily
    count combiner; medians are driver picks on the
    calendar-bounded table. Output: (group, day, volume,
    median_volume, mad) for flagged days, sorted by (group, day).
    """
    import numpy as np

    from fluent_server_ray.stages.aggregate import grouped_counts

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                             pc.is_valid(t[group_col])))
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "day": _epoch_day(t[ts_col])})

    daily = grouped_counts(
        ds.select_columns([group_col, ts_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "day"], final="driver").to_pandas()

    out = {"g": [], "day": [], "volume": [], "med": [], "mad": []}
    for g, sub in daily.groupby("g", sort=True):
        sub = sub.sort_values("day")
        v = sub["n"].to_numpy(dtype=np.int64)
        d = sub["day"].to_numpy(dtype=np.int64)
        med = int(np.sort(v)[(len(v) - 1) // 2])
        dev = np.abs(v - med)
        mad = int(np.sort(dev)[(len(dev) - 1) // 2])
        if mad == 0:
            continue
        hit = dev > k * mad
        out["g"] += [g] * int(hit.sum())
        out["day"] += d[hit].tolist()
        out["volume"] += v[hit].tolist()
        out["med"] += [med] * int(hit.sum())
        out["mad"] += [mad] * int(hit.sum())
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "day": pa.array(out["day"], pa.int64()),
        "volume": pa.array(out["volume"], pa.int64()),
        "median_volume": pa.array(out["med"], pa.int64()),
        "mad": pa.array(out["mad"], pa.int64()),
    })


def outlier_days_mad_sql(group_col: str = "event_type",
                         ts_col: str = "ts", k: int = 3,
                         table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    CAST(count(*) AS BIGINT) AS v
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {group_col} IS NOT NULL
  GROUP BY 1, 2
), ranked AS (
  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, day)
    AS rn, count(*) OVER (PARTITION BY g) AS n
  FROM daily
), med AS (
  SELECT g, max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS med
  FROM ranked GROUP BY g
), dev AS (
  SELECT d.g, d.day, d.v, m.med, abs(d.v - m.med) AS dv
  FROM daily d JOIN med m ON m.g = d.g
), rdev AS (
  SELECT g, dv, row_number() OVER (PARTITION BY g ORDER BY dv, day)
    AS rn, count(*) OVER (PARTITION BY g) AS n
  FROM dev
), mad AS (
  SELECT g, max(CASE WHEN rn = (n + 1) // 2 THEN dv END) AS mad
  FROM rdev GROUP BY g
)
SELECT dev.g AS {group_col}, dev.day, dev.v AS volume,
  dev.med AS median_volume, mad.mad
FROM dev JOIN mad ON mad.g = dev.g
WHERE mad.mad > 0 AND dev.dv > {k} * mad.mad
ORDER BY {group_col}, dev.day
""".strip()


# -------------------------------------------- Kruskal-Wallis H test

def kruskal_by_group(ds, value_col: str = "value",
                     group_col: str = "event_type",
                     max_distinct: int = 4_000_000) -> pa.Table:
    """Kruskal-Wallis H — the k-group extension of
    :func:`mannwhitney_pairs` ("did ANY group's distribution shift?"):
    one omnibus rank test across every group at once instead of
    O(k²) pairwise U tests.

    Exact-integer contract (the mannwhitney device, globalized):
    pooled midranks over ALL groups are kept DOUBLED
    (``r2 = 2*cum_before + n_ties + 1``), so per-group rank sums
    ``R2_i`` are exact integers, and the statistic is a FLOORED
    integer recipe both engines spell identically::

        term_i = (3_000_000 * R2_i**2) // n_i              (per group)
        h_e6   = (Σ term_i) // (N*(N+1)) - 3_000_000*(N+1)
        h_tie_e6 = (h_e6 * (N**3 - N)) // (N**3 - N - T)
        T      = Σ (t**3 - t) over pooled tie groups

    (h = 12/(N(N+1))·ΣR_i²/n_i − 3(N+1) with R_i = R2_i/2 gives the
    3e6 factor.) Intermediates are python ints / HUGEINT; the recipe
    needs ``3e6·(2N·max n_i)² < 2¹²⁷`` — holds to N ≈ 3·10⁷; bin the
    value space first beyond that (same caveat as the U test).

    Distributed shape: ONE per-batch (value, group) count combiner
    collapses the corpus to the distinct-value histogram (guarded by
    ``max_distinct``); everything after runs on the bounded G×V
    driver table. NULLs excluded; NaN raises. Output: one row per
    group (group, n, rank_sum2) + the pooled scalars repeated
    (n_total, tie_sum, h_millionths, h_tie_millionths), sorted by
    group.
    """
    from fluent_server_ray.stages.aggregate import grouped_counts

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[value_col]),
                             pc.is_valid(t[group_col])))
        v = pc.cast(t[value_col], pa.float64())
        if pc.any(pc.is_nan(v)).as_py():
            raise ValueError("kruskal_by_group: NaN value — filter first")
        return pa.table({"v": v,
                         "g": pc.cast(t[group_col], pa.string())})

    cells = grouped_counts(
        ds.select_columns([value_col, group_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["v", "g"], final="driver")
    if cells.num_rows > max_distinct:
        raise ValueError(
            "kruskal_by_group: distinct value space exceeds "
            "max_distinct — bin first for continuous open-scale columns")

    out_fields = [("group", pa.string()), ("n", pa.int64()),
                  ("rank_sum2", pa.int64()), ("n_total", pa.int64()),
                  ("tie_sum", pa.int64()), ("h_millionths", pa.int64()),
                  ("h_tie_millionths", pa.int64())]
    df = cells.to_pandas()
    if df.empty:
        return pa.schema(out_fields).empty_table()
    wide = (df.pivot_table(index="v", columns="g", values="n",
                           aggfunc="sum", fill_value=0).sort_index())
    groups = sorted(wide.columns)
    counts = {g: wide[g].to_numpy() for g in groups}
    # pooled doubled midranks + tie sum over the ordered value grid
    # (python-int accumulation: rank products pass int64 at open scale)
    ties_per_v = np.zeros(len(wide), dtype=np.int64)
    for g in groups:
        ties_per_v += counts[g]
    cum = 0
    r2_grid = []
    tie_sum = 0
    for t_cnt in ties_per_v.tolist():
        r2_grid.append(2 * cum + t_cnt + 1)
        cum += t_cnt
        tie_sum += t_cnt ** 3 - t_cnt
    n_total = cum
    if n_total < 2 or len(groups) < 2:
        raise ValueError("kruskal_by_group: need ≥2 groups and ≥2 rows")
    term_total = 0
    rows = []
    for g in groups:
        c = counts[g].tolist()
        n_g = sum(c)
        if n_g == 0:
            continue
        r2g = sum(cc * r2 for cc, r2 in zip(c, r2_grid))
        term_total += (3_000_000 * r2g * r2g) // n_g
        rows.append((g, n_g, r2g))
    h_e6 = term_total // (n_total * (n_total + 1)) \
        - 3_000_000 * (n_total + 1)
    n3n = n_total ** 3 - n_total
    if n3n - tie_sum == 0:
        raise ValueError("kruskal_by_group: all values tied — H undefined")
    h_tie_e6 = (h_e6 * n3n) // (n3n - tie_sum)
    return pa.table({
        "group": pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "rank_sum2": pa.array([r[2] for r in rows], pa.int64()),
        "n_total": pa.array([n_total] * len(rows), pa.int64()),
        "tie_sum": pa.array([tie_sum] * len(rows), pa.int64()),
        "h_millionths": pa.array([h_e6] * len(rows), pa.int64()),
        "h_tie_millionths": pa.array([h_tie_e6] * len(rows), pa.int64()),
    })


def kruskal_by_group_sql(value_col: str = "value",
                         group_col: str = "event_type",
                         table: str = "events") -> str:
    return f"""
WITH vals AS (
  SELECT {group_col} AS g, {value_col} AS v FROM {table}
  WHERE {value_col} IS NOT NULL AND {group_col} IS NOT NULL
), ranked AS (
  SELECT g,
    CAST(2 * rank() OVER (ORDER BY v)
         + count(*) OVER (PARTITION BY v) - 1 AS HUGEINT) AS r2
  FROM vals
), per_g AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n_g,
    sum(r2) AS r2g
  FROM ranked GROUP BY g
), tie AS (
  SELECT CAST(sum(t * t * t - t) AS HUGEINT) AS tie_sum,
    CAST(sum(t) AS HUGEINT) AS n_total
  FROM (SELECT CAST(count(*) AS HUGEINT) AS t FROM vals GROUP BY v)
), scal AS (
  SELECT
    (SELECT sum((3000000 * r2g * r2g) // n_g) FROM per_g) AS term_total,
    tie_sum, n_total
  FROM tie
), hh AS (
  SELECT n_total, tie_sum,
    term_total // (n_total * (n_total + 1))
      - 3000000 * (n_total + 1) AS h_e6
  FROM scal
)
SELECT p.g AS "group", CAST(p.n_g AS BIGINT) AS n,
  CAST(p.r2g AS BIGINT) AS rank_sum2,
  CAST(h.n_total AS BIGINT) AS n_total,
  CAST(h.tie_sum AS BIGINT) AS tie_sum,
  CAST(h.h_e6 AS BIGINT) AS h_millionths,
  CAST((h.h_e6 * (n_total * n_total * n_total - n_total))
       // (n_total * n_total * n_total - n_total - tie_sum)
       AS BIGINT) AS h_tie_millionths
FROM per_g p CROSS JOIN hh h
ORDER BY "group"
""".strip()


# -------------------------------------------- one-way ANOVA F test

def anova_by_group(ds, value_col: str = "value",
                   group_col: str = "event_type") -> pa.Table:
    """One-way ANOVA F — the parametric omnibus beside
    :func:`kruskal_by_group`: variance *between* group means against
    variance *within* groups, over a 2-decimal numeric column.

    Exact-integer contract: values go through the house ``_cents``
    rule; per-group (n_i, S_i = Σcents, and pooled Q = Σcents²) are
    exact integer combiner partials, and the statistic is a FLOORED
    integer recipe both engines spell identically::

        between_i = (1_000_000 * S_i**2) // n_i            (per group)
        ssb_e6 = Σ between_i - (1_000_000 * S**2) // N
        ssw_e6 = 1_000_000 * Q - Σ between_i
        f_e6   = (ssb_e6 * (N - k) * 1_000_000) // (ssw_e6 * (k - 1))

    Intermediates are python ints / HUGEINT: needs
    ``1e6·S_i² < 2¹²⁷`` — holds to |Σcents| ≈ 4·10¹⁵ per group.

    Distributed shape: ONE combiner pass (grouped n/sum/sum-of-squares
    partials per batch, driver merge over |groups|·|blocks| rows);
    the corpus never moves. NULLs excluded; NaN raises. Output: one
    row per group (group, n, sum_cents) + pooled scalars repeated
    (n_total, ssb_millionths, ssw_millionths, f_millionths), sorted
    by group.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[value_col]),
                             pc.is_valid(t[group_col])))
        v = pc.cast(t[value_col], pa.float64())
        if pc.any(pc.is_nan(v)).as_py():
            raise ValueError("anova_by_group: NaN value — filter first")
        cents = _cents(v)
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "c": cents,
                         "c2": pc.multiply(cents, cents)})

    per_g = grouped_agg(
        ds.select_columns([value_col, group_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["g"], [("c", "sum"), ("c", "count"), ("c2", "sum")],
        final="driver")

    out_fields = [("group", pa.string()), ("n", pa.int64()),
                  ("sum_cents", pa.int64()), ("n_total", pa.int64()),
                  ("ssb_millionths", pa.int64()),
                  ("ssw_millionths", pa.int64()),
                  ("f_millionths", pa.int64())]
    if per_g.num_rows < 2:
        raise ValueError("anova_by_group: need ≥2 groups")
    gs = per_g["g"].to_pylist()
    ns = [int(x) for x in per_g["c_count"].to_pylist()]
    ss = [int(x) for x in per_g["c_sum"].to_pylist()]
    q = sum(int(x) for x in per_g["c2_sum"].to_pylist())
    n_total, s_total, k = sum(ns), sum(ss), len(gs)
    if n_total <= k:
        raise ValueError("anova_by_group: need N > k for the F ratio")
    between = [(1_000_000 * s * s) // n for s, n in zip(ss, ns)]
    ssb_e6 = sum(between) - (1_000_000 * s_total * s_total) // n_total
    ssw_e6 = 1_000_000 * q - sum(between)
    if ssw_e6 <= 0:
        raise ValueError("anova_by_group: zero within-group variance")
    f_e6 = (ssb_e6 * (n_total - k) * 1_000_000) // (ssw_e6 * (k - 1))
    order = sorted(range(k), key=lambda i: gs[i])
    return pa.table({
        "group": pa.array([gs[i] for i in order], pa.string()),
        "n": pa.array([ns[i] for i in order], pa.int64()),
        "sum_cents": pa.array([ss[i] for i in order], pa.int64()),
        "n_total": pa.array([n_total] * k, pa.int64()),
        "ssb_millionths": pa.array([ssb_e6] * k, pa.int64()),
        "ssw_millionths": pa.array([ssw_e6] * k, pa.int64()),
        "f_millionths": pa.array([f_e6] * k, pa.int64()),
    })


def anova_by_group_sql(value_col: str = "value",
                       group_col: str = "event_type",
                       table: str = "events") -> str:
    return f"""
WITH vals AS (
  SELECT {group_col} AS g,
    CAST(round({value_col} * 100.0) AS HUGEINT) AS c
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {group_col} IS NOT NULL
), per_g AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n_g, sum(c) AS s_g,
    sum(c * c) AS q_g
  FROM vals GROUP BY g
), scal AS (
  SELECT CAST(count(*) AS HUGEINT) AS k,
    sum(n_g) AS n_total, sum(s_g) AS s_total, sum(q_g) AS q,
    sum((1000000 * s_g * s_g) // n_g) AS between_sum
  FROM per_g
), ss AS (
  SELECT k, n_total,
    between_sum - (1000000 * s_total * s_total) // n_total AS ssb_e6,
    1000000 * q - between_sum AS ssw_e6
  FROM scal
)
SELECT p.g AS "group", CAST(p.n_g AS BIGINT) AS n,
  CAST(p.s_g AS BIGINT) AS sum_cents,
  CAST(s.n_total AS BIGINT) AS n_total,
  CAST(s.ssb_e6 AS BIGINT) AS ssb_millionths,
  CAST(s.ssw_e6 AS BIGINT) AS ssw_millionths,
  CAST((s.ssb_e6 * (s.n_total - s.k) * 1000000)
       // (s.ssw_e6 * (s.k - 1)) AS BIGINT) AS f_millionths
FROM per_g p CROSS JOIN ss s
ORDER BY "group"
""".strip()


# -------------------------------------------- LOO target encoding

def target_encode_loo(ds, cat_col: str = "o_orderpriority",
                      target_col: str = "o_totalprice",
                      id_col: str = "o_orderkey") -> "ray.data.Dataset":
    """Leave-one-out target encoding — the leakage-safe categorical
    encoder for training data: each row's category is replaced by the
    mean target of all OTHER rows in that category, so a row never
    sees its own label (plain mean encoding leaks the target into the
    feature; LOO is the standard fix).

    Exact-integer contract: the target goes through the house
    ``_cents`` rule and the encoding is one floor division both
    engines spell identically: ``loo_e6 = (1_000_000 * (S_cat -
    cents_i)) // (n_cat - 1)`` (NULL when the row is its category's
    only member). Rows with a NULL category or target are excluded.

    Distributed shape: combiner pass #1 collapses the corpus to
    per-category (n, Σcents) — bounded category cardinality by
    contract — which broadcasts as a plain dict into a second
    vectorized map; the corpus streams through once more and never
    lands on the driver. Output: Dataset (id, category, cents,
    loo_mean_cents_e6) — consume with a sort for deterministic order.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[target_col]),
                             pc.is_valid(t[cat_col])))
        return pa.table({"id": t[id_col],
                         "cat": pc.cast(t[cat_col], pa.string()),
                         "cents": _cents(pc.cast(t[target_col],
                                                 pa.float64()))})

    proj_ds = ds.select_columns(
        [id_col, cat_col, target_col]).map_batches(
        proj, batch_format="pyarrow", zero_copy_batch=True)

    stats = grouped_agg(proj_ds, ["cat"],
                        [("cents", "sum"), ("cents", "count")],
                        final="driver")
    s_map = {c: (int(s), int(n)) for c, s, n in zip(
        stats["cat"].to_pylist(), stats["cents_sum"].to_pylist(),
        stats["cents_count"].to_pylist())}
    if s_map and 1_000_000 * max(abs(s) for s, _ in s_map.values()) \
            >= 2 ** 62:
        raise ValueError(
            "target_encode_loo: 1e6·Σcents would overflow int64 — "
            "encode per-partition or drop to a coarser unit first")

    def encode(t: pa.Table) -> pa.Table:
        cats = t["cat"].to_pylist()
        cents = t["cents"].to_numpy(zero_copy_only=False)
        # bounded-category python loop builds the two lookup arrays;
        # the arithmetic itself is vectorized int64 (floor division —
        # numpy // floors, matching SQL //)
        s_arr = np.array([s_map[c][0] for c in cats], dtype=np.int64)
        n_arr = np.array([s_map[c][1] for c in cats], dtype=np.int64)
        valid = n_arr > 1
        loo = (1_000_000 * (s_arr - cents)) // np.where(valid,
                                                        n_arr - 1, 1)
        return pa.table({
            "id": t["id"], "category": t["cat"], "cents": t["cents"],
            "loo_mean_cents_e6": pc.if_else(
                pa.array(valid), pa.array(loo, pa.int64()),
                pa.scalar(None, pa.int64()))})

    return proj_ds.map_batches(encode, batch_format="pyarrow",
                               zero_copy_batch=True)


def target_encode_loo_sql(cat_col: str = "o_orderpriority",
                          target_col: str = "o_totalprice",
                          id_col: str = "o_orderkey",
                          table: str = "orders") -> str:
    return f"""
WITH vals AS (
  SELECT {id_col} AS id, {cat_col} AS category,
    CAST(round({target_col} * 100.0) AS BIGINT) AS cents
  FROM {table}
  WHERE {target_col} IS NOT NULL AND {cat_col} IS NOT NULL
)
SELECT id, category, cents,
  CASE WHEN count(*) OVER (PARTITION BY category) > 1 THEN
    CAST((1000000 * (sum(cents) OVER (PARTITION BY category) - cents))
         // (count(*) OVER (PARTITION BY category) - 1) AS BIGINT)
  END AS loo_mean_cents_e6
FROM vals
ORDER BY id
""".strip()


# ------------------------------------------ Holt linear smoothing

def holt_trend(ds, group_col: str = "event_type", ts_col: str = "ts",
               alpha=(1, 2), beta=(1, 2)) -> pa.Table:
    """Holt double (level + trend) exponential smoothing of each
    group's daily volume series — the trend-aware sibling of the
    plain EWMA (:func:`ewma_daily` has no slope state; Holt tracks
    "where is the series AND how fast is it moving", the standard
    short-horizon volume forecaster).

    Exact-integer contract (both engines spell the identical
    TRUNCATING division recurrence — toward zero, DuckDB's ``//``
    semantics, NOT Python floor; α = an/ad, β = bn/bd)::

        l_0 = 1e6·y_0,  b_0 = 1e6·(y_1 − y_0)
        l_t = trunc((an·1e6·y_t + (ad−an)·(l_{t−1}+b_{t−1})) / ad)
        b_t = trunc((bn·(l_t − l_{t−1}) + (bd−bn)·b_{t−1}) / bd)

    over the group's OBSERVED days in ascending order (calendar gaps
    are not filled — compose with the daily interpolation op for
    that). Groups with < 2 observed days are dropped (b_0 needs two
    points). The one-step forecast is ``level + trend``.

    Shape: ONE per-batch (group, day) count combiner collapses the
    corpus to the bounded daily table; the recurrence runs vectorized
    per group on the driver (days are calendar-bounded). NULL ts/group
    excluded. Returns (group, n_days, level_millionths,
    trend_millionths, forecast_millionths) sorted by group.
    """
    from fluent_server_ray.stages.aggregate import grouped_counts

    an, ad = alpha
    bn, bd = beta

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                             pc.is_valid(t[group_col])))
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "day": _epoch_day(t[ts_col])})

    daily = grouped_counts(
        ds.select_columns([group_col, ts_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "day"], final="driver")

    out_fields = [("group", pa.string()), ("n_days", pa.int64()),
                  ("level_millionths", pa.int64()),
                  ("trend_millionths", pa.int64()),
                  ("forecast_millionths", pa.int64())]
    df = daily.to_pandas()
    if df.empty:
        return pa.schema(out_fields).empty_table()
    def tdiv(a: int, d: int) -> int:
        # truncate toward zero (DuckDB // semantics); d > 0 always
        return a // d if a >= 0 else -((-a) // d)

    rows = []
    for g, sub in df.sort_values(["g", "day"]).groupby("g", sort=True):
        y = [int(v) for v in sub["n"]]
        if len(y) < 2:
            continue
        lev = 1_000_000 * y[0]
        tr = 1_000_000 * (y[1] - y[0])
        for v in y[1:]:
            prev = lev
            lev = tdiv(an * 1_000_000 * v + (ad - an) * (lev + tr), ad)
            tr = tdiv(bn * (lev - prev) + (bd - bn) * tr, bd)
        rows.append((g, len(y), lev, tr, lev + tr))
    return pa.table({
        "group": pa.array([r[0] for r in rows], pa.string()),
        "n_days": pa.array([r[1] for r in rows], pa.int64()),
        "level_millionths": pa.array([r[2] for r in rows], pa.int64()),
        "trend_millionths": pa.array([r[3] for r in rows], pa.int64()),
        "forecast_millionths": pa.array([r[4] for r in rows],
                                        pa.int64()),
    })


def holt_trend_sql(group_col: str = "event_type", ts_col: str = "ts",
                   alpha=(1, 2), beta=(1, 2),
                   table: str = "events") -> str:
    an, ad = alpha
    bn, bd = beta
    return f"""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    CAST(count(*) AS BIGINT) AS y
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {group_col} IS NOT NULL
  GROUP BY 1, 2
), seq AS MATERIALIZED (
  SELECT g, y, row_number() OVER (PARTITION BY g ORDER BY day) AS rn,
    count(*) OVER (PARTITION BY g) AS nd
  FROM daily
), ok AS (SELECT * FROM seq WHERE nd >= 2),
holt AS (
  SELECT g, nd, CAST(2 AS BIGINT) AS rn,
    ({an} * 1000000 * b.y + ({ad} - {an})
     * (1000000 * a.y + 1000000 * (b.y - a.y))) // {ad} AS lev,
    1000000 * a.y AS prev_lev,
    1000000 * (b.y - a.y) AS tr0
  FROM (SELECT * FROM ok WHERE rn = 1) a
  JOIN (SELECT * FROM ok WHERE rn = 2) b USING (g, nd)
), holt2 AS (
  SELECT g, nd, rn, lev,
    ({bn} * (lev - prev_lev) + ({bd} - {bn}) * tr0) // {bd} AS tr
  FROM holt
), rec AS (
  SELECT g, nd, rn, lev, tr FROM holt2
  UNION ALL
  SELECT r.g, r.nd, s.rn,
    ({an} * 1000000 * s.y + ({ad} - {an}) * (r.lev + r.tr)) // {ad},
    ({bn} * (({an} * 1000000 * s.y + ({ad} - {an}) * (r.lev + r.tr))
             // {ad} - r.lev) + ({bd} - {bn}) * r.tr) // {bd}
  FROM rec r JOIN ok s ON s.g = r.g AND s.rn = r.rn + 1
)
SELECT g AS "group", CAST(nd AS BIGINT) AS n_days,
  CAST(lev AS BIGINT) AS level_millionths,
  CAST(tr AS BIGINT) AS trend_millionths,
  CAST(lev + tr AS BIGINT) AS forecast_millionths
FROM rec WHERE rn = nd
ORDER BY "group"
""".strip()


# ------------------------------------------------ key-skew audit

def key_skew_audit(ds, group_col: str = "event_type",
                   key_col: str = "user_id") -> pa.Table:
    """Partition-key skew audit per group: how concentrated each
    group's rows are on its hottest keys — the diagnostic a shuffle
    planner reads before picking a partitioning key (a top-share near
    1e6 means one key owns the group → salt it; cf. the salted
    aggregation path in stages/aggregate.add_salt).

    Per group: row count ``n``, distinct keys ``n_keys``, hottest-key
    count ``max_key_n``, ``top_share_millionths = 1e6·max//n`` and the
    Herfindahl concentration ``hhi_millionths = 1e6·Σc² // n²``
    (1e6/n_keys = uniform, 1e6 = one key). Σc² and n² accumulate as
    python ints (HUGEINT mirror — squared counts overflow int64 at
    open scale); each output column is range-guarded to BIGINT.

    Shape: the unbounded (group, key) count space merges via the
    distributed groupby; per-group moment partials collapse per block
    (python-int decimal strings) into a driver merge bounded by
    |groups|. NULL group/key rows are excluded (both engines). Output
    sorted by group."""
    from fluent_server_ray.stages.aggregate import grouped_counts, skip_empty

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[group_col]),
                             pc.is_valid(t[key_col])))
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "k": t[key_col]})

    cnt = grouped_counts(
        ds.select_columns([group_col, key_col]).map_batches(
            skip_empty(proj), batch_format="pyarrow",
            zero_copy_batch=True),
        ["g", "k"], final="ray")

    def moment_partial(t: pa.Table) -> pa.Table:
        df = pa.table({"g": t["g"], "n": t["n"]}).to_pandas()
        n = df["n"].astype(object)  # python ints: n² at any scale
        df["sq"] = n * n
        agg = df.groupby("g", sort=False).agg(
            N=("n", "sum"), U=("n", "count"), MX=("n", "max"),
            SS=("sq", "sum")).reset_index()
        return pa.table({
            "g": pa.array(agg["g"], pa.string()),
            "N": pa.array([str(int(v)) for v in agg["N"]]),
            "U": pa.array([int(v) for v in agg["U"]], pa.int64()),
            "MX": pa.array([str(int(v)) for v in agg["MX"]]),
            "SS": pa.array([str(int(v)) for v in agg["SS"]]),
        })

    acc: dict[str, list[int]] = {}
    for r in (cnt.map_batches(skip_empty(moment_partial),
                              batch_format="pyarrow",
                              zero_copy_batch=True)
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        for g, N, U, MX, SS in zip(r["g"].to_pylist(), r["N"].to_pylist(),
                                   r["U"].to_pylist(), r["MX"].to_pylist(),
                                   r["SS"].to_pylist()):
            a = acc.setdefault(g, [0, 0, 0, 0])
            a[0] += int(N)
            a[1] += int(U)
            a[2] = max(a[2], int(MX))
            a[3] += int(SS)

    groups = sorted(acc)
    for g in groups:
        if acc[g][0] >= (1 << 63):
            raise ValueError("key_skew_audit: group count exceeds "
                             "BIGINT — the output cast would overflow")
    return pa.table({
        group_col: pa.array(groups, pa.string()),
        "n": pa.array([acc[g][0] for g in groups], pa.int64()),
        "n_keys": pa.array([acc[g][1] for g in groups], pa.int64()),
        "max_key_n": pa.array([acc[g][2] for g in groups], pa.int64()),
        "top_share_millionths": pa.array(
            [10**6 * acc[g][2] // acc[g][0] for g in groups], pa.int64()),
        "hhi_millionths": pa.array(
            [10**6 * acc[g][3] // (acc[g][0] * acc[g][0])
             for g in groups], pa.int64()),
    })


def key_skew_audit_sql(group_col: str = "event_type",
                       key_col: str = "user_id",
                       table: str = "events") -> str:
    return f"""
WITH cnt AS MATERIALIZED (
  SELECT {group_col} AS g, {key_col} AS k,
    CAST(count(*) AS HUGEINT) AS c
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {key_col} IS NOT NULL
  GROUP BY 1, 2
), agg AS (
  SELECT g, sum(c) AS n, count(*) AS u, max(c) AS mx,
    sum(c * c) AS ss
  FROM cnt GROUP BY g
)
SELECT g AS {group_col}, CAST(n AS BIGINT) AS n,
  CAST(u AS BIGINT) AS n_keys, CAST(mx AS BIGINT) AS max_key_n,
  CAST((1000000 * mx) // n AS BIGINT) AS top_share_millionths,
  CAST((1000000 * ss) // (n * n) AS BIGINT) AS hhi_millionths
FROM agg ORDER BY g
""".strip()


# ------------------------------------- sequential pattern mining

def sequential_patterns(ds, gap: int = 2, k: int = 20,
                        group_col: str = "user_id",
                        type_col: str = "event_type",
                        ts_col: str = "ts", id_col: str = "event_id",
                        n_buckets: int = 64) -> pa.Table:
    """Gap-constrained sequential pattern mining: the top-``k``
    length-3 event-type subsequences by USER support, where
    consecutive pattern elements sit at most ``gap`` positions apart
    in the user's (ts, id)-ordered stream — the behavioral-motif
    report (GSP/PrefixSpan shape at fixed length 3) that the funnel
    and Markov ops can't express (funnels need the steps named up
    front; the Markov matrix sees only adjacent pairs).

    Support counts each user ONCE per pattern (distinct within user).
    Order contract: (ts, id) ascending — the house tie-break. NULL
    user/type/ts rows are excluded.

    Shape: one user-bucket exchange co-locates each user's stream;
    inside a bucket the gap² offset pairs enumerate as SHIFTED-ARRAY
    compares (no per-row python) and collapse to distinct
    (user, pattern) partials; users partition buckets disjointly, so
    per-bucket pattern user-counts sum on the driver — a merge bounded
    by |types|³ pattern rows per bucket. O(gap²·n) work per user."""
    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.groups import map_buckets
    from fluent_server_ray.stages.joins import _with_bucket

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.and_(pc.is_valid(t[group_col]), pc.is_valid(t[type_col])),
            pc.is_valid(t[ts_col])))
        return pa.table({"u": t[group_col], "ty": pc.cast(
            t[type_col], pa.string()), "ts": t[ts_col],
            "eid": t[id_col]})

    bucketed = _with_bucket(
        ds.select_columns([group_col, type_col, ts_col, id_col])
        .map_batches(skip_empty(proj), batch_format="pyarrow",
                     zero_copy_batch=True),
        "u", n_buckets)

    out_schema = pa.schema([
        pa.field("t1", pa.string()), pa.field("t2", pa.string()),
        pa.field("t3", pa.string()), pa.field("n_users", pa.int64()),
    ])

    def per_bucket(g) -> "pd.DataFrame":
        import pandas as pd

        g = g.sort_values(["u", "ts", "eid"])
        u = g["u"].to_numpy()
        ty = g["ty"].to_numpy()
        parts = []
        for d1 in range(1, gap + 1):
            for d2 in range(1, gap + 1):
                off = d1 + d2
                if len(g) <= off:
                    continue
                same = (u[:-off] == u[d1:-d2 if d2 else None][:len(u) - off]) \
                    & (u[:-off] == u[off:])
                if not same.any():
                    continue
                parts.append(pd.DataFrame({
                    "u": u[:-off][same],
                    "t1": ty[:-off][same],
                    "t2": ty[d1:len(u) - d2][same],
                    "t3": ty[off:][same],
                }))
        if not parts:
            return pd.DataFrame({"t1": [], "t2": [], "t3": [],
                                 "n_users": []})
        trip = pd.concat(parts).drop_duplicates()
        out = (trip.groupby(["t1", "t2", "t3"], as_index=False)
               .agg(n_users=("u", "nunique")))
        return out

    parts = map_buckets(bucketed, per_bucket, out_schema)
    tables = list(parts.iter_batches(batch_size=None,
                                     batch_format="pyarrow"))
    merged = (pa.concat_tables(tables) if tables
              else out_schema.empty_table())
    if not len(merged):
        return out_schema.empty_table()
    agg = merged.group_by(["t1", "t2", "t3"]).aggregate(
        [("n_users", "sum")]).rename_columns(
        ["t1", "t2", "t3", "n_users"])
    order = pc.sort_indices(agg, sort_keys=[
        ("n_users", "descending"), ("t1", "ascending"),
        ("t2", "ascending"), ("t3", "ascending")])
    return agg.take(order[:k])


def sequential_patterns_sql(gap: int = 2, k: int = 20,
                            group_col: str = "user_id",
                            type_col: str = "event_type",
                            ts_col: str = "ts",
                            id_col: str = "event_id",
                            table: str = "events") -> str:
    return f"""
WITH e AS MATERIALIZED (
  SELECT {group_col} AS u, CAST({type_col} AS VARCHAR) AS ty,
    row_number() OVER (PARTITION BY {group_col}
                       ORDER BY {ts_col}, {id_col}) AS rn
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {type_col} IS NOT NULL
    AND {ts_col} IS NOT NULL
), pat AS (
  SELECT DISTINCT a.u, a.ty AS t1, b.ty AS t2, c.ty AS t3
  FROM e a
  JOIN e b ON b.u = a.u AND b.rn > a.rn AND b.rn <= a.rn + {gap}
  JOIN e c ON c.u = a.u AND c.rn > b.rn AND c.rn <= b.rn + {gap}
)
SELECT t1, t2, t3, count(*) AS n_users
FROM pat GROUP BY 1, 2, 3
ORDER BY n_users DESC, t1, t2, t3
LIMIT {k}
""".strip()


def holtwinters_trend(ds, group_col: str = "event_type",
                      ts_col: str = "ts", alpha=(1, 2), beta=(1, 4),
                      gamma=(1, 2), period: int = 7) -> pa.Table:
    """Additive Holt-Winters (level + trend + weekly seasonality) over
    each group's daily volume series — :func:`holt_trend`'s
    season-aware sibling (Holt chases the day-of-week wave as trend;
    HW models it, the standard traffic forecaster).

    Contract (both engines spell the identical truncating-division
    recurrence; α=an/ad, β=bn/bd, γ=gn/gd, period m)::

        grid  = CALENDAR days min..max per group, missing days y=0
                (a zero-volume day is real signal for counts)
        l_m   = trunc(1e6·Σy_1..m / m);  b_m = 0
        s_i   = 1e6·y_i − l_m                        (i = 1..m)
        for t = m+1..n:
          l_t = trunc((an·(1e6·y_t − s_{t−m}) + (ad−an)·(l+b)) / ad)
          b_t = trunc((bn·(l_t − l_{t−1}) + (bd−bn)·b) / bd)
          s_t = trunc((gn·(1e6·y_t − l_t) + (gd−gn)·s_{t−m}) / gd)

    One-step forecast = l_n + b_n + s_{n+1−m}. Groups whose grid spans
    < m+1 days are dropped (no post-init step exists). All arithmetic
    is unbounded python ints on the bounded (group, day) table; the
    mirror is a recursive CTE carrying the m seasonal slots as a
    SHIFT-REGISTER of columns. Shape: ONE daily-count combiner pass;
    the recurrence is driver-side over calendar-bounded series.
    Output: (group, n_days, level_millionths, trend_millionths,
    forecast_millionths) sorted by group."""
    from fluent_server_ray.stages.aggregate import grouped_counts

    an, ad = alpha
    bn, bd = beta
    gn, gd = gamma
    m = period

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                             pc.is_valid(t[group_col])))
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "day": _epoch_day(t[ts_col])})

    daily = grouped_counts(
        ds.select_columns([group_col, ts_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "day"], final="driver")

    out_fields = [("group", pa.string()), ("n_days", pa.int64()),
                  ("level_millionths", pa.int64()),
                  ("trend_millionths", pa.int64()),
                  ("forecast_millionths", pa.int64())]
    df = daily.to_pandas()
    if df.empty:
        return pa.schema(out_fields).empty_table()

    def tdiv(a: int, d: int) -> int:
        return a // d if a >= 0 else -((-a) // d)

    rows = []
    for g, sub in df.sort_values(["g", "day"]).groupby("g", sort=True):
        have = {int(d): int(n) for d, n in zip(sub["day"], sub["n"])}
        lo, hi = min(have), max(have)
        n = hi - lo + 1
        if n < m + 1:
            continue
        y = [have.get(lo + i, 0) for i in range(n)]
        lev = tdiv(1_000_000 * sum(y[:m]), m)
        tr = 0
        s = [1_000_000 * y[i] - lev for i in range(m)]  # ring: s[t%m]
        for t in range(m, n):
            sm = s[t % m]  # s_{t−m}
            prev = lev
            lev = tdiv(an * (1_000_000 * y[t] - sm)
                       + (ad - an) * (lev + tr), ad)
            tr = tdiv(bn * (lev - prev) + (bd - bn) * tr, bd)
            s[t % m] = tdiv(gn * (1_000_000 * y[t] - lev)
                            + (gd - gn) * sm, gd)
        rows.append((g, n, lev, tr, lev + tr + s[n % m]))
    if not rows:
        return pa.schema(out_fields).empty_table()
    return pa.table({
        "group": pa.array([r[0] for r in rows], pa.string()),
        "n_days": pa.array([r[1] for r in rows], pa.int64()),
        "level_millionths": pa.array([r[2] for r in rows], pa.int64()),
        "trend_millionths": pa.array([r[3] for r in rows], pa.int64()),
        "forecast_millionths": pa.array([r[4] for r in rows],
                                        pa.int64()),
    })


def holtwinters_trend_sql(group_col: str = "event_type",
                          ts_col: str = "ts", alpha=(1, 2), beta=(1, 4),
                          gamma=(1, 2), period: int = 7,
                          table: str = "events") -> str:
    """Recursive-CTE mirror: the m seasonal slots ride as a SHIFT-
    REGISTER of columns (s1 = s_{t−m+1-oldest … read point}, sm = the
    newest); every step reads s1 and emits (s2..sm, s_new)."""
    an, ad = alpha
    bn, bd = beta
    gn, gd = gamma
    m = period
    s_cols = ", ".join(f"s{i}" for i in range(1, m + 1))
    # init: s_i = 1e6·y_i − l0 for grid days 1..m (rn ascending)
    init_s = ", ".join(
        f"(SELECT 1000000 * y FROM grid x "
        f"WHERE x.g = l.g AND x.rn = {i}) - l.l0 AS s{i}"
        for i in range(1, m + 1))
    shift_s = ", ".join(f"r.s{i}" for i in range(2, m + 1))
    new_lev = (f"({an} * (1000000 * d.y - r.s1) + ({ad} - {an}) "
               f"* (r.lev + r.tr)) // {ad}")
    return f"""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    CAST(count(*) AS BIGINT) AS y
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {group_col} IS NOT NULL
  GROUP BY 1, 2
), span AS MATERIALIZED (
  SELECT g, min(day) AS lo, max(day) AS hi,
    max(day) - min(day) + 1 AS nd
  FROM daily GROUP BY g HAVING max(day) - min(day) + 1 >= {m} + 1
), grid AS MATERIALIZED (
  SELECT c.g, c.day - c.lo + 1 AS rn, COALESCE(d.y, 0) AS y, c.nd
  FROM (SELECT s.g, s.lo, s.nd, CAST(u.gs AS BIGINT) AS day
        FROM span s
        CROSS JOIN unnest(generate_series(s.lo, s.hi)) AS u(gs)) c
  LEFT JOIN daily d ON d.g = c.g AND d.day = c.day
), l0v AS MATERIALIZED (
  SELECT g, (1000000 * sum(y)) // {m} AS l0
  FROM grid WHERE rn <= {m} GROUP BY g
), rec AS (
  SELECT l.g, CAST({m} AS BIGINT) AS rn, l0 AS lev,
    CAST(0 AS BIGINT) AS tr, {init_s}
  FROM l0v l
  UNION ALL
  SELECT r.g, r.rn + 1,
    {new_lev} AS lev,
    ({bn} * (({new_lev}) - r.lev) + ({bd} - {bn}) * r.tr) // {bd},
    {shift_s},
    ({gn} * (1000000 * d.y - ({new_lev}))
     + ({gd} - {gn}) * r.s1) // {gd}
  FROM rec r JOIN grid d ON d.g = r.g AND d.rn = r.rn + 1
)
SELECT r.g AS "group", s.nd AS n_days,
  CAST(r.lev AS BIGINT) AS level_millionths,
  CAST(r.tr AS BIGINT) AS trend_millionths,
  CAST(r.lev + r.tr + r.s1 AS BIGINT) AS forecast_millionths
FROM rec r JOIN span s ON s.g = r.g AND r.rn = s.nd
ORDER BY "group"
""".strip()


# ------------------------------------------- Jarque-Bera normality test

def jarque_bera_by_group(ds, value_col: str = "value",
                         group_col: str = "event_type") -> pa.Table:
    """Jarque-Bera normality test per group — skewness/kurtosis-based
    screen for "is this sink's value distribution still Gaussian?"
    (Jarque & Bera 1980), the omnibus beside the distributional drift
    checks (PSI/KS).

    Exact/deterministic contract: values go through the house
    ``_cents`` rule; each group is SHIFTED by its integer floor-mean
    ``k_g = S_g // n_g`` (central moments are shift-invariant, and the
    residual mean ``Σd/n < 1`` kills the catastrophic cancellation a
    raw-moment recipe would hit) and the power sums Σd¹..Σd⁴ are EXACT
    integers (python ints here, HUGEINT in the mirror — Σd⁴ ≤
    n·max|d|⁴ stays under 2¹²⁷ to n ≈ 10¹² at cents spreads ≤ 10⁵).
    The statistic is ONE declared float64 tree over those exact ints
    (ints enter float64 correctly rounded on both sides — VARCHAR→
    DOUBLE in the mirror per the measured HUGEINT-cast ulp gotcha)::

        mu = s1/n; m2 = s2/n − mu²
        m3 = s3/n − 3·mu·(s2/n) + 2·mu³
        m4 = s4/n − 4·mu·(s3/n) + 6·mu²·(s2/n) − 3·mu⁴
        skew = m3 / (m2·√m2);  kurt = m4 / m2²
        jb = n/6 · (skew² + (kurt−3)²/4)

    — every op IEEE with a fixed shape, so the doubles match
    bit-for-bit. Degenerate groups (m2 ≤ 0: constant value) emit NULL
    skew/kurt/jb. NULL values/groups excluded.

    Distributed shape: pass 1 = per-group (n, Σc) combiner (bounded
    group set, driver merge); the k_g map broadcasts; pass 2 = per-
    block per-group python-int power sums shipped as DECIMAL STRINGS
    (the pearson_corr device — int64 can't hold a single d⁴ at cents
    spreads > ~55k). The corpus streams twice, nothing corpus-sized
    reaches the driver."""
    import ray

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    ds = ds.select_columns([value_col, group_col]).materialize()

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[value_col]),
                             pc.is_valid(t[group_col])))
        v = pc.cast(t[value_col], pa.float64())
        if len(t) and pc.any(pc.is_nan(v)).as_py():
            raise ValueError("jarque_bera_by_group: NaN value — filter"
                             " first")
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "c": _cents(v)})

    base = ds.map_batches(proj, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    per_g = grouped_agg(base, ["g"], [("c", "sum"), ("c", "count")],
                        final="driver")
    out_fields = [("group", pa.string()), ("n", pa.int64()),
                  ("skew", pa.float64()), ("kurt", pa.float64()),
                  ("jb_stat", pa.float64())]
    if not per_g.num_rows:
        return pa.schema(out_fields).empty_table()
    shift = {g: int(s) // int(n) for g, s, n in zip(
        per_g["g"].to_pylist(), per_g["c_sum"].to_pylist(),
        per_g["c_count"].to_pylist())}
    shift_ref = ray.put(shift)

    def power_sums(t: pa.Table) -> pa.Table:
        k_of = ray.get(shift_ref)
        gs = t["g"].to_pylist()
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        ks = np.fromiter((k_of[g] for g in gs), dtype=np.int64,
                         count=len(gs))
        d = (c - ks).astype(object)  # python-int lane: d⁴ can pass 2⁶³
        out: dict[str, list] = {"g": [], "n": [], "s1": [], "s2": [],
                                "s3": [], "s4": []}
        import pandas as _pd

        df = _pd.DataFrame({"g": gs, "d": d})
        for g, sub in df.groupby("g", sort=True):
            dv = sub["d"].to_numpy()
            d2 = dv * dv
            out["g"].append(g)
            out["n"].append(len(dv))
            out["s1"].append(str(int(dv.sum())))
            out["s2"].append(str(int(d2.sum())))
            out["s3"].append(str(int((d2 * dv).sum())))
            out["s4"].append(str(int((d2 * d2).sum())))
        return pa.table({
            "g": pa.array(out["g"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "s1": pa.array(out["s1"], pa.string()),
            "s2": pa.array(out["s2"], pa.string()),
            "s3": pa.array(out["s3"], pa.string()),
            "s4": pa.array(out["s4"], pa.string()),
        })

    acc: dict[str, list] = {}
    for b in base.map_batches(skip_empty(power_sums),
                              batch_format="pyarrow",
                              zero_copy_batch=True).iter_batches(
                                  batch_size=None, batch_format="pyarrow"):
        for g, n, s1, s2, s3, s4 in zip(
                b["g"].to_pylist(), b["n"].to_pylist(),
                b["s1"].to_pylist(), b["s2"].to_pylist(),
                b["s3"].to_pylist(), b["s4"].to_pylist()):
            cur = acc.setdefault(g, [0, 0, 0, 0, 0])
            cur[0] += int(n)
            cur[1] += int(s1)
            cur[2] += int(s2)
            cur[3] += int(s3)
            cur[4] += int(s4)

    rows = {"group": [], "n": [], "skew": [], "kurt": [], "jb_stat": []}
    for g in sorted(acc):
        n, s1, s2, s3, s4 = acc[g]
        nd = float(n)
        mu = float(s1) / nd
        m2 = float(s2) / nd - mu * mu
        rows["group"].append(g)
        rows["n"].append(n)
        if m2 <= 0.0:
            rows["skew"].append(None)
            rows["kurt"].append(None)
            rows["jb_stat"].append(None)
            continue
        import math

        m3 = float(s3) / nd - 3.0 * mu * (float(s2) / nd) \
            + 2.0 * mu * mu * mu
        m4 = float(s4) / nd - 4.0 * mu * (float(s3) / nd) \
            + 6.0 * mu * mu * (float(s2) / nd) - 3.0 * mu * mu * mu * mu
        skew = m3 / (m2 * math.sqrt(m2))
        kurt = m4 / (m2 * m2)
        jb = nd / 6.0 * (skew * skew
                         + (kurt - 3.0) * (kurt - 3.0) / 4.0)
        rows["skew"].append(skew)
        rows["kurt"].append(kurt)
        rows["jb_stat"].append(jb)
    return pa.table({
        "group": pa.array(rows["group"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "skew": pa.array(rows["skew"], pa.float64()),
        "kurt": pa.array(rows["kurt"], pa.float64()),
        "jb_stat": pa.array(rows["jb_stat"], pa.float64()),
    })


def jarque_bera_by_group_sql(value_col: str = "value",
                             group_col: str = "event_type",
                             table: str = "events") -> str:
    return f"""
WITH vals AS MATERIALIZED (
  SELECT {group_col} AS g,
    CAST(round({value_col} * 100.0) AS HUGEINT) AS c
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {group_col} IS NOT NULL
), kk AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n, sum(c) // count(*) AS k
  FROM vals GROUP BY g
), sums AS (
  SELECT v.g, any_value(kk.n) AS n,
    sum(v.c - kk.k) AS s1,
    sum((v.c - kk.k) * (v.c - kk.k)) AS s2,
    sum((v.c - kk.k) * (v.c - kk.k) * (v.c - kk.k)) AS s3,
    sum((v.c - kk.k) * (v.c - kk.k) * (v.c - kk.k) * (v.c - kk.k)) AS s4
  FROM vals v JOIN kk ON kk.g = v.g GROUP BY v.g
), f AS (
  SELECT g, n,
    CAST(CAST(n AS VARCHAR) AS DOUBLE) AS nd,
    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1d,
    CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS s2d,
    CAST(CAST(s3 AS VARCHAR) AS DOUBLE) AS s3d,
    CAST(CAST(s4 AS VARCHAR) AS DOUBLE) AS s4d
  FROM sums
), m AS (
  SELECT g, n, nd, s1d / nd AS mu,
    s2d / nd - (s1d / nd) * (s1d / nd) AS m2, s2d, s3d, s4d
  FROM f
), mm AS (
  SELECT g, n, nd, m2,
    s3d / nd - 3.0 * mu * (s2d / nd) + 2.0 * mu * mu * mu AS m3,
    s4d / nd - 4.0 * mu * (s3d / nd) + 6.0 * mu * mu * (s2d / nd)
      - 3.0 * mu * mu * mu * mu AS m4
  FROM m
), sk AS (
  SELECT g, n, nd, m2,
    CASE WHEN m2 > 0.0 THEN m3 / (m2 * sqrt(m2)) END AS skew,
    CASE WHEN m2 > 0.0 THEN m4 / (m2 * m2) END AS kurt
  FROM mm
)
SELECT g AS "group", CAST(n AS BIGINT) AS n, skew, kurt,
  CASE WHEN m2 > 0.0 THEN
    nd / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
  END AS jb_stat
FROM sk ORDER BY "group"
""".strip()


# --------------------------------------- Brown-Forsythe variance test

def brown_forsythe_by_group(ds, value_col: str = "value",
                            group_col: str = "event_type") -> pa.Table:
    """Brown-Forsythe homogeneity-of-variance test — one-way ANOVA on
    the absolute deviations from each group's MEDIAN (Brown & Forsythe
    1974; the robust Levene variant). Flags "do these sinks have
    different value spreads?" before a pooled-variance method assumes
    they don't.

    Exact contract: values through the house ``_cents`` rule; the
    per-group center is the LOWER MEDIAN (ascending rank ``(n+1)//2``
    — an existing data value, so ``d = |c − med|`` is an exact int64)
    and the F statistic is the same floored-integer recipe as
    :func:`anova_by_group` applied to d (between/ssb/ssw/f in
    millionths — HUGEINT-exact in the mirror, python-int here).

    Distributed shape: pass 1 = per-(group, cents) count combiner
    (bounded: distinct cents of a 2-decimal bounded column ≤ 10⁵ish
    per group — the 100 TB variant of an UNBOUNDED value domain swaps
    the driver selection for the grouped-histogram quantile sketch);
    driver selects each group's rank-``(n+1)//2`` value from the
    cumsum; medians broadcast; pass 2 = per-group (n, Σd, Σd²)
    combiner + the integer F recipe. NULLs excluded; needs ≥2 groups,
    N > k, and nonzero within-spread."""
    import ray

    from fluent_server_ray.stages.aggregate import grouped_agg

    ds = ds.select_columns([value_col, group_col]).materialize()

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[value_col]),
                             pc.is_valid(t[group_col])))
        v = pc.cast(t[value_col], pa.float64())
        if len(t) and pc.any(pc.is_nan(v)).as_py():
            raise ValueError("brown_forsythe_by_group: NaN value —"
                             " filter first")
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "c": _cents(v)})

    base = ds.map_batches(proj, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    hist = grouped_agg(base, ["g", "c"], [("c", "count")], final="driver")
    if not hist.num_rows:
        raise ValueError("brown_forsythe_by_group: no rows")
    import pandas as _pd

    hdf = hist.to_pandas().sort_values(["g", "c"])
    med: dict[str, int] = {}
    for g, sub in hdf.groupby("g", sort=True):
        n_g = int(sub["c_count"].sum())
        target = (n_g + 1) // 2
        cum = sub["c_count"].cumsum().to_numpy()
        pos = int(np.searchsorted(cum, target, side="left"))
        med[g] = int(sub["c"].to_numpy()[pos])
    med_ref = ray.put(med)

    def dev(t: pa.Table) -> pa.Table:
        m_of = ray.get(med_ref)
        gs = t["g"].to_pylist()
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        ms = np.fromiter((m_of[g] for g in gs), dtype=np.int64,
                         count=len(gs))
        d = np.abs(c - ms)
        return pa.table({"g": t["g"], "d": pa.array(d, pa.int64()),
                         "d2": pa.array(d * d, pa.int64())})

    per_g = grouped_agg(
        base.map_batches(dev, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["g"], [("d", "sum"), ("d", "count"), ("d2", "sum")],
        final="driver")
    if per_g.num_rows < 2:
        raise ValueError("brown_forsythe_by_group: need ≥2 groups")
    gs = per_g["g"].to_pylist()
    ns = [int(x) for x in per_g["d_count"].to_pylist()]
    ss = [int(x) for x in per_g["d_sum"].to_pylist()]
    q = sum(int(x) for x in per_g["d2_sum"].to_pylist())
    n_total, k = sum(ns), len(gs)
    if n_total <= k:
        raise ValueError("brown_forsythe_by_group: need N > k")
    between = [(1_000_000 * s * s) // n for s, n in zip(ss, ns)]
    s_total = sum(ss)
    ssb_e6 = sum(between) - (1_000_000 * s_total * s_total) // n_total
    ssw_e6 = 1_000_000 * q - sum(between)
    if ssw_e6 <= 0:
        raise ValueError("brown_forsythe_by_group: zero within-group"
                         " deviation spread")
    f_e6 = (ssb_e6 * (n_total - k) * 1_000_000) // (ssw_e6 * (k - 1))
    order = sorted(range(k), key=lambda i: gs[i])
    return pa.table({
        "group": pa.array([gs[i] for i in order], pa.string()),
        "n": pa.array([ns[i] for i in order], pa.int64()),
        "med_cents": pa.array([med[gs[i]] for i in order], pa.int64()),
        "sum_dev_cents": pa.array([ss[i] for i in order], pa.int64()),
        "n_total": pa.array([n_total] * k, pa.int64()),
        "ssb_millionths": pa.array([ssb_e6] * k, pa.int64()),
        "ssw_millionths": pa.array([ssw_e6] * k, pa.int64()),
        "f_millionths": pa.array([f_e6] * k, pa.int64()),
    })


def brown_forsythe_by_group_sql(value_col: str = "value",
                                group_col: str = "event_type",
                                table: str = "events") -> str:
    return f"""
WITH vals AS MATERIALIZED (
  SELECT {group_col} AS g,
    CAST(round({value_col} * 100.0) AS BIGINT) AS c
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {group_col} IS NOT NULL
), ranked AS (
  SELECT g, c, row_number() OVER (PARTITION BY g ORDER BY c) AS rn,
    count(*) OVER (PARTITION BY g) AS n_g
  FROM vals
), med AS (
  SELECT g, c AS med FROM ranked WHERE rn = (n_g + 1) // 2
), dev AS (
  SELECT v.g, CAST(abs(v.c - m.med) AS HUGEINT) AS d
  FROM vals v JOIN med m ON m.g = v.g
), per_g AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n_g, sum(d) AS s_g,
    sum(d * d) AS q_g
  FROM dev GROUP BY g
), scal AS (
  SELECT CAST(count(*) AS HUGEINT) AS k,
    sum(n_g) AS n_total, sum(s_g) AS s_total, sum(q_g) AS q,
    sum((1000000 * s_g * s_g) // n_g) AS between_sum
  FROM per_g
), ss AS (
  SELECT k, n_total,
    between_sum - (1000000 * s_total * s_total) // n_total AS ssb_e6,
    1000000 * q - between_sum AS ssw_e6
  FROM scal
)
SELECT p.g AS "group", CAST(p.n_g AS BIGINT) AS n,
  CAST(m.med AS BIGINT) AS med_cents,
  CAST(p.s_g AS BIGINT) AS sum_dev_cents,
  CAST(s.n_total AS BIGINT) AS n_total,
  CAST(s.ssb_e6 AS BIGINT) AS ssb_millionths,
  CAST(s.ssw_e6 AS BIGINT) AS ssw_millionths,
  CAST((s.ssb_e6 * (s.n_total - s.k) * 1000000)
       // (s.ssw_e6 * (s.k - 1)) AS BIGINT) AS f_millionths
FROM per_g p JOIN med m ON m.g = p.g CROSS JOIN ss s
ORDER BY "group"
""".strip()


# --------------------------------------- Gini decision-stump scoring

def gini_best_splits(ds, value_col: str = "value",
                     group_col: str = "event_type",
                     positive: str = "purchase",
                     k: int = 10) -> pa.Table:
    """Decision-stump feature scoring: the top-``k`` single-threshold
    splits of a 2-decimal numeric column for predicting a binary
    label, ranked by weighted Gini impurity (CART's split criterion —
    the univariate "is this feature predictive at all?" screen run
    before training anything).

    Split semantics: candidate thresholds are the column's DISTINCT
    cents values; ``x ≤ t`` goes left, ``x > t`` right; thresholds
    whose right side is empty are not splits. Label = (group ==
    positive), NULL group → negative (SQL ``COALESCE(g = p, FALSE)``).
    NULL values excluded.

    Exact-integer contract: for binary labels the weighted impurity
    ``N·G`` is rational with per-side denominators, so the score is a
    floored-millionths recipe both engines spell identically::

        wg_e6(t) = (2_000_000·posL·(nL−posL)) // nL
                 + (2_000_000·posR·(nR−posR)) // nR

    ranked (wg_e6 ASC, threshold ASC) — fully deterministic.

    Distributed shape: ONE combiner pass builds the (cents, label)
    histogram (distinct cents of a bounded 2-decimal column — the
    unbounded-domain variant bins through the quantile sketch first);
    the driver scan is one cumsum over the sorted histogram. The
    corpus never moves. Output: (threshold_cents, n_left, pos_left,
    n_right, pos_right, weighted_gini_e6)."""
    from fluent_server_ray.stages.aggregate import grouped_agg

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value_col]))
        v = pc.cast(t[value_col], pa.float64())
        if len(t) and pc.any(pc.is_nan(v)).as_py():
            raise ValueError("gini_best_splits: NaN value — filter first")
        lab = pc.fill_null(
            pc.equal(pc.cast(t[group_col], pa.string()), positive), False)
        return pa.table({"c": _cents(v),
                         "pos": pc.cast(lab, pa.int64())})

    hist = grouped_agg(
        ds.select_columns([value_col, group_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["c"], [("pos", "sum"), ("pos", "count")], final="driver")
    out_fields = [("threshold_cents", pa.int64()), ("n_left", pa.int64()),
                  ("pos_left", pa.int64()), ("n_right", pa.int64()),
                  ("pos_right", pa.int64()),
                  ("weighted_gini_e6", pa.int64())]
    if hist.num_rows < 2:
        return pa.schema(out_fields).empty_table()
    idx = pc.sort_indices(hist, sort_keys=[("c", "ascending")])
    hist = hist.take(idx)
    cs = [int(x) for x in hist["c"].to_pylist()]
    pos = [int(x) for x in hist["pos_sum"].to_pylist()]
    cnt = [int(x) for x in hist["pos_count"].to_pylist()]
    n_total, p_total = sum(cnt), sum(pos)
    cands = []
    nl = pl = 0
    for i in range(len(cs) - 1):  # last value: empty right side
        nl += cnt[i]
        pl += pos[i]
        nr = n_total - nl
        pr = p_total - pl
        wg = (2_000_000 * pl * (nl - pl)) // nl \
            + (2_000_000 * pr * (nr - pr)) // nr
        cands.append((wg, cs[i], nl, pl, nr, pr))
    cands.sort(key=lambda r: (r[0], r[1]))
    top = cands[:k]
    return pa.table({
        "threshold_cents": pa.array([r[1] for r in top], pa.int64()),
        "n_left": pa.array([r[2] for r in top], pa.int64()),
        "pos_left": pa.array([r[3] for r in top], pa.int64()),
        "n_right": pa.array([r[4] for r in top], pa.int64()),
        "pos_right": pa.array([r[5] for r in top], pa.int64()),
        "weighted_gini_e6": pa.array([r[0] for r in top], pa.int64()),
    })


def gini_best_splits_sql(value_col: str = "value",
                         group_col: str = "event_type",
                         positive: str = "purchase",
                         k: int = 10, table: str = "events") -> str:
    return f"""
WITH vals AS (
  SELECT CAST(round({value_col} * 100.0) AS BIGINT) AS c,
    CASE WHEN coalesce({group_col} = '{positive}', FALSE)
         THEN 1 ELSE 0 END AS pos
  FROM {table} WHERE {value_col} IS NOT NULL
), hist AS (
  SELECT c, CAST(sum(pos) AS BIGINT) AS p, count(*) AS n
  FROM vals GROUP BY c
), cum AS (
  SELECT c,
    sum(n) OVER w AS nl, sum(p) OVER w AS pl,
    (SELECT sum(n) FROM hist) AS n_tot,
    (SELECT sum(p) FROM hist) AS p_tot
  FROM hist
  WINDOW w AS (ORDER BY c ROWS UNBOUNDED PRECEDING)
), splits AS (
  SELECT c AS threshold_cents,
    CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
    CAST(n_tot - nl AS BIGINT) AS n_right,
    CAST(p_tot - pl AS BIGINT) AS pos_right,
    CAST((2000000 * pl * (nl - pl)) // nl
       + (2000000 * (p_tot - pl) * ((n_tot - nl) - (p_tot - pl)))
         // (n_tot - nl) AS BIGINT) AS weighted_gini_e6
  FROM cum WHERE n_tot > nl
)
SELECT * FROM splits
ORDER BY weighted_gini_e6, threshold_cents LIMIT {k}
""".strip()


# --------------------------------------------- self-join size (F2)

def selfjoin_size(ds, key_col: str = "user_id") -> pa.Table:
    """Exact second frequency moment F₂ = Σ_k c_k² of a key column —
    the SELF-JOIN SIZE a planner needs before keying a shuffle on it
    (AMS's "surprise number"; a skewed key makes F₂ ≫ n and the join
    explode). Reported with n_rows and the exact distinct count, plus
    the skew ratio ``f2/n`` (average matches per probe row) as one
    float division over exact ints.

    Shape: per-key counts through the distributed merge (key space
    unbounded → ``final='ray'``); each count block collapses to a
    3-int partial (Σc, Σc², distincts — Σc² in python ints: a hot key
    of 3·10⁹ rows squares past int64) and the driver sums #blocks
    rows. NULL keys are excluded (they join nothing)."""
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def proj(t: pa.Table):
        v = t[key_col]
        v = v.filter(pc.is_valid(v))
        if not len(v):
            return
        yield pa.table({"k": pc.cast(v, pa.int64())})

    counts = grouped_agg(
        ds.select_columns([key_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["k"], [("k", "count")], final="ray")

    def moments(t: pa.Table) -> pa.Table:
        c = t["k_count"].to_numpy(zero_copy_only=False).astype(object)
        return pa.table({
            "n": pa.array([str(int((c).sum()) if len(c) else 0)],
                          pa.string()),
            "f2": pa.array([str(int((c * c).sum()) if len(c) else 0)],
                           pa.string()),
            "d": pa.array([len(c)], pa.int64()),
        })

    n = f2 = d = 0
    for b in counts.map_batches(skip_empty(moments),
                                batch_format="pyarrow",
                                zero_copy_batch=True).iter_batches(
                                    batch_size=None,
                                    batch_format="pyarrow"):
        for sn, sf, sd in zip(b["n"].to_pylist(), b["f2"].to_pylist(),
                              b["d"].to_pylist()):
            n += int(sn)
            f2 += int(sf)
            d += int(sd)
    avg = (float(f2) / float(n)) if n else None
    return pa.table({
        "n_rows": pa.array([n], pa.int64()),
        "n_keys": pa.array([d], pa.int64()),
        "f2": pa.array([f2], pa.int64()),
        "avg_matches_per_row": pa.array([avg], pa.float64()),
    })


def selfjoin_size_sql(key_col: str = "user_id",
                      table: str = "events") -> str:
    return f"""
WITH c AS (
  SELECT CAST(count(*) AS HUGEINT) AS n FROM {table}
  WHERE {key_col} IS NOT NULL GROUP BY {key_col}
)
SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_rows,
  CAST(count(*) AS BIGINT) AS n_keys,
  CAST(coalesce(sum(n * n), 0) AS BIGINT) AS f2,
  CAST(sum(n * n) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
    AS avg_matches_per_row
FROM c
""".strip()


# ----------------------------------------------- maximum drawdown

def max_drawdown_by_group(ds, group_col: str = "event_type",
                          value_col: str = "value",
                          ts_col: str = "ts") -> pa.Table:
    """Maximum drawdown of each group's cumulative daily value curve —
    the worst peak-to-trough drop of the running total (the classic
    equity-curve risk metric, applied to per-sink daily revenue: "how
    bad did the deepest slump get?").

    Exact contract: daily sums in house cents; the curve is the
    running cumsum over OBSERVED days ascending, peak the running max,
    drawdown = peak − cum (all int64); the maximum drawdown and its
    FIRST attaining day (tie → earliest) are reported. NULL ts/group/
    value rows are excluded (daily-op contract).

    Shape: ONE (group, day) combiner pass; the bounded daily grid
    (|groups|·|days|) merges on the driver where the sequential scan
    is a numpy cumsum/cummax per group — the corpus never moves."""
    from fluent_server_ray.stages.aggregate import grouped_agg

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.and_(pc.is_valid(t[value_col]), pc.is_valid(t[group_col])),
            pc.is_valid(t[ts_col])))
        v = pc.cast(t[value_col], pa.float64())
        if len(t) and pc.any(pc.is_nan(v)).as_py():
            raise ValueError("max_drawdown_by_group: NaN value")
        return pa.table({"g": pc.cast(t[group_col], pa.string()),
                         "day": _epoch_day(t[ts_col]),
                         "c": _cents(v)})

    daily = grouped_agg(
        ds.select_columns([group_col, value_col, ts_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["g", "day"], [("c", "sum")], final="driver")
    out_fields = [("group", pa.string()), ("max_drawdown_cents", pa.int64()),
                  ("trough_day", pa.int64()), ("n_days", pa.int64())]
    if not daily.num_rows:
        return pa.schema(out_fields).empty_table()
    df = daily.to_pandas().sort_values(["g", "day"])
    rows = {"group": [], "max_drawdown_cents": [], "trough_day": [],
            "n_days": []}
    for g, sub in df.groupby("g", sort=True):
        cum = sub["c_sum"].to_numpy(dtype=np.int64).cumsum()
        peak = np.maximum.accumulate(cum)
        dd = peak - cum
        i = int(np.argmax(dd))  # first max
        rows["group"].append(g)
        rows["max_drawdown_cents"].append(int(dd[i]))
        rows["trough_day"].append(int(sub["day"].to_numpy()[i]))
        rows["n_days"].append(len(sub))
    return pa.table({
        "group": pa.array(rows["group"], pa.string()),
        "max_drawdown_cents": pa.array(rows["max_drawdown_cents"],
                                       pa.int64()),
        "trough_day": pa.array(rows["trough_day"], pa.int64()),
        "n_days": pa.array(rows["n_days"], pa.int64()),
    })


def max_drawdown_by_group_sql(group_col: str = "event_type",
                              value_col: str = "value",
                              ts_col: str = "ts",
                              table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(floor(CAST(epoch({ts_col}) AS DOUBLE) / 86400.0) AS BIGINT)
      AS day,
    CAST(sum(CAST(round({value_col} * 100.0) AS BIGINT)) AS BIGINT) AS c
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {group_col} IS NOT NULL
    AND {ts_col} IS NOT NULL
  GROUP BY 1, 2
), cum AS (
  SELECT g, day, sum(c) OVER w AS cum
  FROM daily
  WINDOW w AS (PARTITION BY g ORDER BY day ROWS UNBOUNDED PRECEDING)
), curve AS (
  SELECT g, day, cum, max(cum) OVER w AS peak
  FROM cum
  WINDOW w AS (PARTITION BY g ORDER BY day ROWS UNBOUNDED PRECEDING)
), dd AS (
  SELECT g, day, peak - cum AS dd,
    count(*) OVER (PARTITION BY g) AS n_days
  FROM curve
), best AS (
  SELECT g, dd, day, n_days,
    row_number() OVER (PARTITION BY g ORDER BY dd DESC, day) AS rn
  FROM dd
)
SELECT g AS "group", CAST(dd AS BIGINT) AS max_drawdown_cents,
  CAST(day AS BIGINT) AS trough_day, CAST(n_days AS BIGINT) AS n_days
FROM best WHERE rn = 1 ORDER BY "group"
""".strip()


# ----------------------------------------------- window rank movement

RANKDELTA_FROM = "2024-01-01 00:00:00"
RANKDELTA_SPLIT = "2024-01-16 00:00:00"
RANKDELTA_TO = "2024-02-01 00:00:00"


def rank_delta_by_window(ds, key: str = "event_type", ts_col: str = "ts",
                         date_from: str = RANKDELTA_FROM,
                         split: str = RANKDELTA_SPLIT,
                         date_to: str = RANKDELTA_TO) -> pa.Table:
    """Window-over-window rank movement: rank keys by volume in window
    A (``[date_from, split)``) and window B (``[split, date_to)``) and
    report each key's rank shift — the "top movers" leaderboard panel.

    Rank contract: ``ROW_NUMBER`` ordered by (count DESC, key ASC) —
    total order, so ranks can never disagree across engines. Keys
    missing from either window are dropped (INNER semantics).

    Scale shape: one scan collapsing to (window, key) count partials
    (≤ 2·|keys| rows per block); the merge, both rankings and the
    join-back are driver-side over the bounded key set."""
    import datetime as _dt

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    # naive-timestamp epoch micros, timezone-free (datetime.timestamp()
    # would reinterpret the naive literal in the host's local zone)
    def _us(s: str) -> int:
        return (_dt.datetime.fromisoformat(s) - _dt.datetime(1970, 1, 1)
                ) // _dt.timedelta(microseconds=1)

    f_us, s_us, t_us = _us(date_from), _us(split), _us(date_to)

    def partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        keep = pc.and_(pc.greater_equal(ts, f_us), pc.less(ts, t_us))
        keep = pc.fill_null(keep, False)
        t = t.filter(keep)
        ts = ts.filter(keep)
        prep = pa.table({
            "w": pc.if_else(pc.less(ts, s_us), "a", "b"),
            key: t[key],
            "one": pa.array(np.ones(len(t), np.int64)),
        })
        out = prep.group_by(["w", key]).aggregate([("one", "sum")])
        return out.rename_columns(["w", key, "n"])

    merged = grouped_agg(
        ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["w", key], [("n", "sum")])

    def ranked(w: str) -> dict[str, tuple[int, int]]:
        part = merged.filter(pc.equal(merged["w"], w)).sort_by(
            [("n_sum", "descending"), (key, "ascending")])
        return {k: (i + 1, int(n)) for i, (k, n) in enumerate(
            zip(part[key].to_pylist(), part["n_sum"].to_pylist()))}

    ra, rb = ranked("a"), ranked("b")
    keys = sorted(set(ra) & set(rb))
    return pa.table({
        key: pa.array(keys, pa.string()),
        "n_a": pa.array([ra[k][1] for k in keys], pa.int64()),
        "n_b": pa.array([rb[k][1] for k in keys], pa.int64()),
        "rank_a": pa.array([ra[k][0] for k in keys], pa.int64()),
        "rank_b": pa.array([rb[k][0] for k in keys], pa.int64()),
        "rank_delta": pa.array([ra[k][0] - rb[k][0] for k in keys],
                               pa.int64()),
    })


def rank_delta_by_window_sql(key: str = "event_type", ts_col: str = "ts",
                             table: str = "events",
                             date_from: str = RANKDELTA_FROM,
                             split: str = RANKDELTA_SPLIT,
                             date_to: str = RANKDELTA_TO) -> str:
    return f"""
WITH c AS (
  SELECT CASE WHEN {ts_col} < TIMESTAMP '{split}' THEN 'a' ELSE 'b' END
      AS w,
    {key}, count(*) AS n
  FROM {table}
  WHERE {ts_col} >= TIMESTAMP '{date_from}'
    AND {ts_col} < TIMESTAMP '{date_to}'
  GROUP BY 1, 2
), a AS (
  SELECT {key}, n,
    ROW_NUMBER() OVER (ORDER BY n DESC, {key}) AS r
  FROM c WHERE w = 'a'
), b AS (
  SELECT {key}, n,
    ROW_NUMBER() OVER (ORDER BY n DESC, {key}) AS r
  FROM c WHERE w = 'b'
)
SELECT a.{key}, CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
  CAST(a.r AS BIGINT) AS rank_a, CAST(b.r AS BIGINT) AS rank_b,
  CAST(a.r - b.r AS BIGINT) AS rank_delta
FROM a JOIN b USING ({key})
ORDER BY {key}
""".strip()


# ------------------------------------------------ standing-rule audit

# Deterministic default rule set: (rule_id, event_type or None,
# value_lo or None, value_hi or None) — conjunctive predicates, the
# alerting/routing standing-query shape. hi is EXCLUSIVE, lo inclusive.
STANDING_RULES: tuple[tuple[str, str | None, float | None,
                            float | None], ...] = (
    ("big_error", "error", 100.0, None),
    ("small_purchase", "purchase", None, 10.0),
    ("mid_click", "click", 20.0, 80.0),
    ("any_signup", "signup", None, None),
    ("whale_value", None, 250.0, None),
)


def standing_rule_matches(ds, rules=STANDING_RULES,
                          key: str = "event_type",
                          val: str = "value",
                          user: str = "user_id") -> pa.Table:
    """Standing-query (rules-engine) audit: evaluate a broadcast set of
    conjunctive alert rules against every event and report per-rule
    match and distinct-user counts — the fluentd/alerting "which rules
    fire how often, on whom" panel. A row can match several rules.

    Scale shape: the rule set is driver-small and ships in the task
    closure; every rule evaluates as ONE vectorized mask per batch.
    Match counts collapse to per-rule partials (≤ |rules| rows per
    block, driver merge); the distinct-user count pre-collapses to
    (rule, user) pairs per batch and dedups through one distributed
    exchange (user keyspace unbounded → ``grouped_agg(final='ray')``),
    then a bounded per-rule combiner."""
    from fluent_server_ray.stages.aggregate import (grouped_agg,
                                                    grouped_counts,
                                                    skip_empty)

    def pair_partial(t: pa.Table) -> pa.Table:
        chunks = []
        for rid, typ, lo, hi in rules:
            keep = pa.array(np.ones(len(t), bool))
            if typ is not None:
                keep = pc.and_(keep, pc.equal(t[key], typ))
            if lo is not None:
                keep = pc.and_(keep, pc.greater_equal(t[val], lo))
            if hi is not None:
                keep = pc.and_(keep, pc.less(t[val], hi))
            keep = pc.fill_null(keep, False)
            u = pc.cast(t[user], pa.int64()).filter(keep)
            # NULL-user rows COUNT as matches but not as users (mirror:
            # count(*) keeps them, count(DISTINCT user) drops them).
            # grouped_agg(final='ray') refuses NULL keys, so the null
            # flag rides as its own key and user_id is zero-filled.
            chunks.append(pa.table({
                "rule_id": pa.array([rid] * len(u), pa.string()),
                "u_null": pc.is_null(u),
                "user_id": pc.fill_null(u, 0),
            }))
        both = pa.concat_tables(chunks)
        out = both.group_by(["rule_id", "u_null", "user_id"]).aggregate(
            [([], "count_all")])
        return out.rename_columns(["rule_id", "u_null", "user_id", "n"])

    pairs = ds.map_batches(skip_empty(pair_partial),
                           batch_format="pyarrow", zero_copy_batch=True)
    # materialize: two consumers below — without it each final pass
    # would re-execute the whole upstream scan (NOTES gotcha)
    per_pair = grouped_agg(pairs, ["rule_id", "u_null", "user_id"],
                           [("n", "sum")], final="ray").materialize()
    # bounded finals: |rules| rows of matches, |rules| rows of users
    matches = grouped_agg(per_pair, ["rule_id"], [("n_sum", "sum")])
    real_users = per_pair.map_batches(
        skip_empty(lambda t: t.filter(pc.equal(t["u_null"], False))),
        batch_format="pyarrow", zero_copy_batch=True)
    users = grouped_counts(real_users, ["rule_id"])
    n_of = dict(zip(matches["rule_id"].to_pylist(),
                    pc.cast(matches["n_sum_sum"],
                            pa.int64()).to_pylist()))
    u_of = dict(zip(users["rule_id"].to_pylist(),
                    pc.cast(users["n"], pa.int64()).to_pylist()))
    fired = sorted(n_of)
    return pa.table({
        "rule_id": pa.array(fired, pa.string()),
        "n_matches": pa.array([n_of[r] for r in fired], pa.int64()),
        "n_users": pa.array([u_of.get(r, 0) for r in fired],
                            pa.int64()),
    })


def standing_rule_matches_sql(rules=STANDING_RULES,
                              table: str = "events",
                              key: str = "event_type",
                              val: str = "value",
                              user: str = "user_id") -> str:
    arms = []
    for rid, typ, lo, hi in rules:
        conds = []
        if typ is not None:
            conds.append(f"{key} = '{typ}'")
        if lo is not None:
            conds.append(f"{val} >= {lo}")
        if hi is not None:
            conds.append(f"{val} < {hi}")
        where = " AND ".join(conds) if conds else "TRUE"
        arms.append(f"SELECT '{rid}' AS rule_id, {user} AS user_id "
                    f"FROM {table} WHERE {where}")
    union = "\n  UNION ALL ".join(arms)
    return f"""
WITH m AS (
  {union}
)
SELECT rule_id, CAST(count(*) AS BIGINT) AS n_matches,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM m GROUP BY 1 ORDER BY rule_id
""".strip()


# ------------------------------------------- Mann-Kendall trend test

def mann_kendall_trend(ds, group_col: str = "event_type",
                       ts_col: str = "ts",
                       value_col: str = "value") -> pa.Table:
    """Per-group Mann-Kendall trend test over DAILY totals — the
    nonparametric "is there a monotone trend" hypothesis test that
    complements :func:`theilsen_trend` (Theil-Sen estimates the slope;
    Mann-Kendall decides whether ANY monotone drift exists, immune to
    the level of the series). Mann 1945 / Kendall 1975, the standard
    trend screen in monitoring pipelines.

    Exact-integer contract: ``S = Σ_{i<j} sign(c_j - c_i)`` over the
    day-ordered daily-cents series and the tie-corrected variance
    NUMERATOR ``var_num18 = n(n-1)(2n+5) - Σ_t t(t-1)(2t+5)`` (t = tie
    group sizes of equal daily cents) are exact integers on both
    engines; the z statistic is ONE shared float tree
    ``(S ∓ 1) / sqrt(var_num18 / 18.0)`` (continuity-corrected, 0.0 at
    S = 0, NULL when the variance is 0 — constant series or n < 2).

    Shape: the corpus collapses in one combiner pass to the bounded
    (group × day) daily-cents table (days are calendar-bounded); the
    driver forms the O(days²) sign pairs per group — the same bounded
    continuation as Theil-Sen. NULL ts/group/value rows are excluded
    by contract (mirror: ``IS NOT NULL`` × 3). Output: (group, n_days,
    s_stat, var_num18, z), sorted by group.
    """
    import math

    from fluent_server_ray.stages.aggregate import grouped_agg

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[value_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[group_col])))
        day = _epoch_day(t[ts_col])
        return pa.table({group_col: t[group_col], "_day": day,
                         "cents": _cents(t[value_col])})

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    daily = grouped_agg(prepped, [group_col, "_day"],
                        [("cents", "sum")], final="driver").to_pandas()

    rows = []
    for g, sub in daily.groupby(group_col, dropna=False, sort=True):
        sub = sub.sort_values("_day")
        c = sub["cents_sum"].to_numpy(dtype=np.int64)
        n = len(c)
        i, j = np.triu_indices(n, k=1)
        s = int(np.sign(c[j] - c[i]).sum())
        _, tie_counts = np.unique(c, return_counts=True)
        t_arr = tie_counts.astype(np.int64)
        tie_term = int((t_arr * (t_arr - 1) * (2 * t_arr + 5)).sum())
        var_num18 = n * (n - 1) * (2 * n + 5) - tie_term
        if var_num18 <= 0:
            z = None
        elif s > 0:
            z = (s - 1) / math.sqrt(var_num18 / 18.0)
        elif s < 0:
            z = (s + 1) / math.sqrt(var_num18 / 18.0)
        else:
            z = 0.0
        rows.append((g, n, s, var_num18, z))
    return pa.table({
        group_col: pa.array([r[0] for r in rows], pa.string()),
        "n_days": pa.array([r[1] for r in rows], pa.int64()),
        "s_stat": pa.array([r[2] for r in rows], pa.int64()),
        "var_num18": pa.array([r[3] for r in rows], pa.int64()),
        "z": pa.array([r[4] for r in rows], pa.float64()),
    })


def mann_kendall_trend_sql(group_col: str = "event_type",
                           ts_col: str = "ts",
                           value_col: str = "value",
                           table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table} WHERE {value_col} IS NOT NULL
    AND {ts_col} IS NOT NULL AND {group_col} IS NOT NULL
  GROUP BY 1, 2
), s AS (
  SELECT a.g,
    CAST(SUM(CASE WHEN b.c > a.c THEN 1
                  WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM daily a JOIN daily b ON b.g = a.g AND b.d > a.d
  GROUP BY a.g
), ties AS (
  SELECT g, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT g, c, CAST(count(*) AS BIGINT) AS t
        FROM daily GROUP BY g, c) tg
  GROUP BY g
), nd AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY g
)
SELECT nd.g AS {group_col}, nd.n AS n_days,
  COALESCE(s.s, 0) AS s_stat,
  nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tie_term AS var_num18,
  CASE
    WHEN nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tie_term <= 0
      THEN NULL
    WHEN COALESCE(s.s, 0) > 0 THEN
      CAST(COALESCE(s.s, 0) - 1 AS DOUBLE)
      / sqrt(CAST(nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tie_term
                  AS DOUBLE) / 18.0)
    WHEN COALESCE(s.s, 0) < 0 THEN
      CAST(COALESCE(s.s, 0) + 1 AS DOUBLE)
      / sqrt(CAST(nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tie_term
                  AS DOUBLE) / 18.0)
    ELSE 0.0
  END AS z
FROM nd
LEFT JOIN s ON s.g = nd.g
LEFT JOIN ties ON ties.g = nd.g
ORDER BY {group_col}
""".strip()


# ------------------------------------------- McNemar paired test

def mcnemar_paired(ds, type_a: str = "click", type_b: str = "purchase",
                   user_col: str = "user_id",
                   type_col: str = "event_type") -> pa.Table:
    """McNemar's test of marginal homogeneity over PAIRED per-user
    binary outcomes: did users who emit ``type_a`` also emit
    ``type_b``?  The paired sibling of the chi-square independence
    test (:func:`contingency_chi2` compares independent groups;
    McNemar conditions on the SAME subject appearing in both columns
    — the discordant cells b/c alone carry the signal). McNemar 1947.

    Exact-integer contract: the 2×2 cells (n_both, n_a_only, n_b_only,
    n_neither) are exact integer counts; the statistic is ONE shared
    float tree ``(b - c)² / (b + c)`` — an exact-int squared difference
    cast once to DOUBLE and divided by the exact-int discordant total
    (NULL when b + c = 0).

    Shape: per-block combiner collapses to (user, has_a, has_b)
    indicator maxima; the distributed per-user merge (user keyspace
    unbounded → ``final='ray'``) feeds a second bounded combiner that
    counts the four cells — one row per block to the driver. NULL
    users are excluded by contract (mirror: ``user_id IS NOT NULL``).
    Output: one row (n_users, n_both, n_a_only, n_b_only, n_neither,
    mcnemar_chi2).
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def indicators(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[user_col]))
        a = pc.cast(pc.equal(t[type_col], type_a), pa.int64())
        b = pc.cast(pc.equal(t[type_col], type_b), pa.int64())
        prep = pa.table({
            "user": pc.cast(t[user_col], pa.int64()),
            "a": pc.fill_null(a, 0),
            "b": pc.fill_null(b, 0),
        })
        out = prep.group_by(["user"]).aggregate([("a", "max"),
                                                 ("b", "max")])
        return out.rename_columns(["user", "a", "b"])

    per_user = grouped_agg(
        ds.map_batches(skip_empty(indicators), batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["user"], aggs=[("a", "max"), ("b", "max")], final="ray")

    def cells(t: pa.Table) -> pa.Table:
        a = t["a_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n_users": pa.array([len(a)], pa.int64()),
            "n_both": pa.array([int((a * b).sum())], pa.int64()),
            "n_a_only": pa.array([int((a * (1 - b)).sum())], pa.int64()),
            "n_b_only": pa.array([int(((1 - a) * b).sum())], pa.int64()),
        })

    parts = [t for t in per_user.map_batches(
        skip_empty(cells), batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_size=None,
                                           batch_format="pyarrow")]
    if parts:
        merged = pa.concat_tables(parts)
        n_users = int(pc.sum(merged["n_users"]).as_py() or 0)
        n_both = int(pc.sum(merged["n_both"]).as_py() or 0)
        n_a = int(pc.sum(merged["n_a_only"]).as_py() or 0)
        n_b = int(pc.sum(merged["n_b_only"]).as_py() or 0)
    else:
        n_users = n_both = n_a = n_b = 0
    n_neither = n_users - n_both - n_a - n_b
    disc = n_a + n_b
    chi2 = (float((n_a - n_b) * (n_a - n_b)) / float(disc)
            if disc > 0 else None)
    return pa.table({
        "n_users": pa.array([n_users], pa.int64()),
        "n_both": pa.array([n_both], pa.int64()),
        "n_a_only": pa.array([n_a], pa.int64()),
        "n_b_only": pa.array([n_b], pa.int64()),
        "n_neither": pa.array([n_neither], pa.int64()),
        "mcnemar_chi2": pa.array([chi2], pa.float64()),
    })


def mcnemar_paired_sql(type_a: str = "click", type_b: str = "purchase",
                       user_col: str = "user_id",
                       type_col: str = "event_type",
                       table: str = "events") -> str:
    return f"""
WITH u AS (
  SELECT {user_col} AS user_id,
    max(CASE WHEN {type_col} = '{type_a}' THEN 1 ELSE 0 END) AS a,
    max(CASE WHEN {type_col} = '{type_b}' THEN 1 ELSE 0 END) AS b
  FROM {table} WHERE {user_col} IS NOT NULL
  GROUP BY {user_col}
), cells AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
    CAST(COALESCE(sum(a * b), 0) AS BIGINT) AS n_both,
    CAST(COALESCE(sum(a * (1 - b)), 0) AS BIGINT) AS n_a_only,
    CAST(COALESCE(sum((1 - a) * b), 0) AS BIGINT) AS n_b_only,
    CAST(COALESCE(sum((1 - a) * (1 - b)), 0) AS BIGINT) AS n_neither
  FROM u
)
SELECT n_users, n_both, n_a_only, n_b_only, n_neither,
  CASE WHEN n_a_only + n_b_only > 0 THEN
    CAST((n_a_only - n_b_only) * (n_a_only - n_b_only) AS DOUBLE)
    / CAST(n_a_only + n_b_only AS DOUBLE)
  ELSE NULL END AS mcnemar_chi2
FROM cells
""".strip()


# ------------------------------------------- per-user SPRT decisions

def user_sprt_decisions(ds, success_type: str = "purchase",
                        failure_type: str = "click",
                        score_up: int = 7, score_down: int = -4,
                        bound: int = 29,
                        user_col: str = "user_id", ts_col: str = "ts",
                        id_col: str = "event_id",
                        type_col: str = "event_type",
                        n_buckets: int = 64) -> pa.Table:
    """Wald sequential probability ratio test (SPRT, Wald 1945) run
    PER USER over that user's success/failure stream — the sequential
    sibling of the batch A/B t-test (:func:`welch_ttest_ab`): instead
    of one verdict after all the data, each user's stream walks an
    integer score and stops at the FIRST boundary crossing. The
    sequential-decision primitive behind early-stopping experiment
    monitors and per-entity fraud flags.

    Integer-score contract (no logs anywhere): a success step adds
    ``score_up``, a failure step adds ``score_down`` — the defaults
    +7/−4 are the 10×-scaled LLR increments for H0: p = 1/4 vs H1:
    p = 1/2 (ln(p1/p0) = 0.693 → 7, ln((1−p1)/(1−p0)) = −0.405 → −4)
    — and the decision boundary ``±bound`` (default ±29 ≈ 10·ln 19,
    α = β = 0.05). The walk, the crossing step and the decision are
    all exact integers; steps are the user's success/failure events in
    (ts, id) order.

    Shape: one user-bucket exchange; inside a bucket every user's walk
    runs as ONE segmented numpy cumsum + first-crossing argmax (no
    per-user Python). Per-decision partials (≤ 3 rows per bucket)
    merge on the driver. NULL user/ts rows are excluded by contract.
    Output: (decision, n_users, sum_crossing_step) — 'accept_h1' /
    'accept_h0' rows carry the crossing-step mass (avg = sum / n),
    'continue' rows the users whose stream never crossed.
    """
    import pandas as pd

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.groups import map_buckets

    def clean(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[user_col]), pc.is_valid(t[ts_col]))
        keep = pc.and_(keep, pc.is_in(
            t[type_col], value_set=pa.array([success_type,
                                             failure_type])))
        t = t.filter(keep)
        sc = pc.if_else(pc.equal(t[type_col], success_type),
                        score_up, score_down)
        return pa.table({
            "key": pc.cast(t[user_col], pa.string()),
            "_us": t[ts_col].cast(pa.int64()),
            "id": pc.cast(t[id_col], pa.int64()),
            "sc": pc.cast(sc, pa.int64()),
        })

    schema = pa.schema([
        pa.field("decision", pa.string()),
        pa.field("n_users", pa.int64()),
        pa.field("sum_crossing_step", pa.int64()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["key", "_us", "id"])
        keys = g["key"].to_numpy()
        sc = g["sc"].to_numpy(dtype=np.int64)
        # segmented cumsum: global cumsum minus each segment's base
        new_seg = np.ones(len(keys), dtype=bool)
        new_seg[1:] = keys[1:] != keys[:-1]
        seg_starts = np.nonzero(new_seg)[0]
        seg_id = np.cumsum(new_seg) - 1
        gcum = np.cumsum(sc)
        seg_base = np.zeros(seg_starts.size, dtype=np.int64)
        seg_base[1:] = gcum[seg_starts[1:] - 1]
        cum = gcum - seg_base[seg_id]
        step = np.arange(len(keys), dtype=np.int64) - seg_starts[seg_id] + 1
        crossed = (cum >= bound) | (cum <= -bound)
        out_rows = {"accept_h1": [0, 0], "accept_h0": [0, 0],
                    "continue": [0, 0]}
        # first crossing per segment: among crossed positions, the
        # minimum step — vectorized via stable first-occurrence scan
        n_decided = 0
        if crossed.any():
            idx = np.nonzero(crossed)[0]
            segs = seg_id[idx]
            first_mask = np.ones(idx.size, dtype=bool)
            first_mask[1:] = segs[1:] != segs[:-1]
            fidx = idx[first_mask]
            h1 = cum[fidx] >= bound
            out_rows["accept_h1"] = [int(h1.sum()),
                                     int(step[fidx][h1].sum())]
            out_rows["accept_h0"] = [int((~h1).sum()),
                                     int(step[fidx][~h1].sum())]
            n_decided = fidx.size
        out_rows["continue"][0] = seg_starts.size - n_decided
        return pd.DataFrame({
            "decision": list(out_rows),
            "n_users": [v[0] for v in out_rows.values()],
            "sum_crossing_step": [v[1] for v in out_rows.values()],
        })

    bucketed = _with_bucket(
        ds.select_columns([user_col, ts_col, id_col, type_col])
        .map_batches(skip_empty(clean), batch_format="pyarrow",
                     zero_copy_batch=True), "key", n_buckets)
    parts = map_buckets(bucketed, per_bucket, schema)
    agg = grouped_agg(parts, ["decision"],
                      [("n_users", "sum"), ("sum_crossing_step", "sum")],
                      final="driver")
    out = pa.table({
        "decision": agg["decision"],
        "n_users": pc.cast(agg["n_users_sum"], pa.int64()),
        "sum_crossing_step": pc.cast(agg["sum_crossing_step_sum"],
                                     pa.int64()),
    }).filter(pc.greater(pc.cast(agg["n_users_sum"], pa.int64()), 0))
    return out.sort_by([("decision", "ascending")])


def user_sprt_decisions_sql(success_type: str = "purchase",
                            failure_type: str = "click",
                            score_up: int = 7, score_down: int = -4,
                            bound: int = 29,
                            user_col: str = "user_id",
                            ts_col: str = "ts",
                            id_col: str = "event_id",
                            type_col: str = "event_type",
                            table: str = "events") -> str:
    return f"""
WITH s AS (
  SELECT {user_col} AS u, {ts_col} AS ts, {id_col} AS id,
    CASE WHEN {type_col} = '{success_type}' THEN {score_up}
         ELSE {score_down} END AS sc
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {type_col} IN ('{success_type}', '{failure_type}')
), c AS (
  SELECT u,
    sum(sc) OVER (PARTITION BY u ORDER BY ts, id
                  ROWS UNBOUNDED PRECEDING) AS cum,
    row_number() OVER (PARTITION BY u ORDER BY ts, id) AS step
  FROM s
), x AS (
  SELECT u, min(step) AS cross_step
  FROM c WHERE cum >= {bound} OR cum <= -{bound}
  GROUP BY u
), d AS (
  SELECT x.u, x.cross_step,
    CASE WHEN c.cum >= {bound} THEN 'accept_h1'
         ELSE 'accept_h0' END AS decision
  FROM x JOIN c ON c.u = x.u AND c.step = x.cross_step
), labeled AS (
  SELECT au.u, COALESCE(d.decision, 'continue') AS decision,
    COALESCE(d.cross_step, 0) AS cross_step
  FROM (SELECT DISTINCT u FROM s) au
  LEFT JOIN d ON d.u = au.u
)
SELECT decision, CAST(count(*) AS BIGINT) AS n_users,
  CAST(sum(cross_step) AS BIGINT) AS sum_crossing_step
FROM labeled GROUP BY decision ORDER BY decision
""".strip()


# ------------------------------------------- Wilcoxon signed-rank

def wilcoxon_signed_rank(ds, type_a: str = "click",
                         type_b: str = "purchase",
                         user_col: str = "user_id",
                         type_col: str = "event_type",
                         value_col: str = "value",
                         max_distinct: int = 4_000_000) -> pa.Table:
    """Wilcoxon signed-rank test over PAIRED per-user totals — does
    the per-user ``type_b`` spend differ from the ``type_a`` spend?
    The paired-samples member of the rank-test family
    (:func:`mannwhitney_pairs` compares independent groups; this one
    ranks each user's own difference). Wilcoxon 1945.

    Exact-integer contract (the Mann-Whitney discipline): per-user
    difference ``d = Σcents_b - Σcents_a`` (zero-filled sides, zero
    diffs DROPPED per the classic test), ranks of |d| kept DOUBLED so
    midranks stay integral (``r2 = 2·cum_before + n_ties + 1``);
    ``w2_plus = Σ_{d>0} r2`` and the tie-corrected variance NUMERATOR
    ``var_num12 = 2n(n+1)(2n+1) - Σ_t(t³ - t)`` are exact ints; z is
    ONE float tree ``(w2_plus - n(n+1)/2) / sqrt(var_num12 / 12.0)``
    (NULL when the variance is 0 or no nonzero diffs).

    Shape: per-block (user, cents_a, cents_b) combiner → distributed
    per-user merge (``final='ray'``) → per-block |d| histogram
    partials → bounded driver merge (≤ one row per DISTINCT |d|,
    guarded by ``max_distinct``). NULL user/value rows are excluded by
    contract. Output: one row (n_pairs, w2_plus, mean2, var_num12, z).
    """
    import math

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def per_user_partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[user_col]), pc.is_valid(t[value_col]))
        keep = pc.and_(keep, pc.is_in(
            t[type_col], value_set=pa.array([type_a, type_b])))
        t = t.filter(keep)
        cents = _cents(t[value_col])
        is_a = pc.equal(t[type_col], type_a)
        prep = pa.table({
            "user": pc.cast(t[user_col], pa.int64()),
            "ca": pc.if_else(is_a, cents, pa.scalar(0, pa.int64())),
            "cb": pc.if_else(is_a, pa.scalar(0, pa.int64()), cents),
        })
        out = prep.group_by(["user"]).aggregate([("ca", "sum"),
                                                 ("cb", "sum")])
        return out.rename_columns(["user", "ca", "cb"])

    per_user = grouped_agg(
        ds.map_batches(skip_empty(per_user_partial),
                       batch_format="pyarrow", zero_copy_batch=True),
        keys=["user"], aggs=[("ca", "sum"), ("cb", "sum")], final="ray")

    def hist_partial(t: pa.Table) -> pa.Table:
        d = (t["cb_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
             - t["ca_sum"].to_numpy(zero_copy_only=False).astype(
                 np.int64))
        d = d[d != 0]
        if not len(d):
            return pa.table({"ad": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "cpos": pa.array([], pa.int64())})
        prep = pa.table({
            "ad": pa.array(np.abs(d)),
            "c": pa.array(np.ones(len(d), dtype=np.int64)),
            "cpos": pa.array((d > 0).astype(np.int64)),
        })
        out = prep.group_by(["ad"]).aggregate([("c", "sum"),
                                               ("cpos", "sum")])
        return out.rename_columns(["ad", "c", "cpos"])

    hist = grouped_agg(
        per_user.map_batches(skip_empty(hist_partial),
                             batch_format="pyarrow",
                             zero_copy_batch=True),
        keys=["ad"], aggs=[("c", "sum"), ("cpos", "sum")],
        final="driver")
    if len(hist) > max_distinct:
        raise ValueError(
            "wilcoxon_signed_rank: distinct |d| histogram exceeds "
            f"max_distinct={max_distinct}")
    hp = hist.to_pandas().sort_values("ad")
    c = hp["c_sum"].to_numpy(dtype=np.int64)
    cpos = hp["cpos_sum"].to_numpy(dtype=np.int64)
    n = int(c.sum())
    cum_before = np.concatenate([[0], np.cumsum(c)[:-1]])
    r2 = 2 * cum_before + c + 1
    w2 = int((cpos * r2).sum())
    mean2 = n * (n + 1) // 2
    tie_term = int((c.astype(object) ** 3 - c).sum()) if len(c) else 0
    var_num12 = 2 * n * (n + 1) * (2 * n + 1) - tie_term
    z = (float(w2 - mean2) / math.sqrt(var_num12 / 12.0)
         if n > 0 and var_num12 > 0 else None)
    return pa.table({
        "n_pairs": pa.array([n], pa.int64()),
        "w2_plus": pa.array([w2], pa.int64()),
        "mean2": pa.array([mean2], pa.int64()),
        "var_num12": pa.array([var_num12], pa.int64()),
        "z": pa.array([z], pa.float64()),
    })


def wilcoxon_signed_rank_sql(type_a: str = "click",
                             type_b: str = "purchase",
                             user_col: str = "user_id",
                             type_col: str = "event_type",
                             value_col: str = "value",
                             table: str = "events") -> str:
    return f"""
WITH u AS (
  SELECT {user_col} AS user_id,
    SUM(CASE WHEN {type_col} = '{type_b}'
        THEN CAST(round({value_col} * 100.0) AS BIGINT) ELSE 0 END)
    - SUM(CASE WHEN {type_col} = '{type_a}'
        THEN CAST(round({value_col} * 100.0) AS BIGINT) ELSE 0 END)
      AS d
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {value_col} IS NOT NULL
    AND {type_col} IN ('{type_a}', '{type_b}')
  GROUP BY {user_col}
), nz AS (
  SELECT abs(d) AS ad, CASE WHEN d > 0 THEN 1 ELSE 0 END AS pos
  FROM u WHERE d != 0
), h AS (
  SELECT ad, CAST(count(*) AS BIGINT) AS c,
    CAST(sum(pos) AS BIGINT) AS cpos
  FROM nz GROUP BY ad
), r AS (
  SELECT ad, c, cpos,
    2 * COALESCE(sum(c) OVER (ORDER BY ad
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
    + c + 1 AS r2
  FROM h
), agg AS (
  SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS n,
    CAST(COALESCE(sum(cpos * r2), 0) AS BIGINT) AS w2,
    CAST(COALESCE(sum(c * c * c - c), 0) AS BIGINT) AS tie_term
  FROM r
)
SELECT n AS n_pairs, w2 AS w2_plus,
  n * (n + 1) // 2 AS mean2,
  2 * n * (n + 1) * (2 * n + 1) - tie_term AS var_num12,
  CASE WHEN n > 0 AND 2 * n * (n + 1) * (2 * n + 1) - tie_term > 0
    THEN CAST(w2 - n * (n + 1) // 2 AS DOUBLE)
      / sqrt(CAST(2 * n * (n + 1) * (2 * n + 1) - tie_term AS DOUBLE)
             / 12.0)
    ELSE NULL END AS z
FROM agg
""".strip()


# ------------------------------------------- deterministic bootstrap CI

def bootstrap_daily_mean_ci(ds, ts_col: str = "ts",
                            value_col: str = "value",
                            n_boot: int = 1000,
                            alpha_millis: int = 25) -> pa.Table:
    """Percentile-bootstrap confidence interval for the MEAN DAILY
    TOTAL (Efron 1979) — resampling inference beside the parametric
    t/z machinery: no normality assumption, the CI comes from the
    empirical distribution of resampled means.

    Determinism contract: resample ``b`` picks day indices
    ``md5_u64('bs:b:i') % n_days`` (≡ DuckDB ``md5_number_upper``) —
    both engines draw the SAME ``n_boot × n_days`` index matrix, so
    the bootstrap distribution is exactly reproducible (a production
    run would draw real entropy; the percentile math is identical).
    Each resample SUM is an exact int; its mean is ONE float division;
    the CI bounds are ORDER-STATISTIC PICKS of those means (lower =
    ``ceil(alpha·B)``-th smallest, upper = ``ceil((1-alpha)·B)``-th) —
    values that EXIST in the resample set, so the float compare is
    exact. Day indices address the day-ASCENDING daily array on both
    engines.

    Shape: one combiner pass collapses the corpus to the bounded daily
    table; the ``B × n_days`` resampling runs on the driver (30k md5
    draws for a month × 1000 resamples — calendar-bounded, never
    row-bounded). NULL ts/value rows are excluded by contract. Output:
    one row (n_days, n_boot, mean_obs, boot_lo, boot_hi).
    """
    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.aggregate import grouped_agg

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[value_col]),
                             pc.is_valid(t[ts_col])))
        return pa.table({"_day": _epoch_day(t[ts_col]),
                         "cents": _cents(t[value_col])})

    daily = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["_day"], [("cents", "sum")], final="driver").to_pandas()
    daily = daily.sort_values("_day")
    c = daily["cents_sum"].to_numpy(dtype=np.int64)
    n = len(c)
    if n == 0:
        return pa.table({
            "n_days": pa.array([0], pa.int64()),
            "n_boot": pa.array([n_boot], pa.int64()),
            "mean_obs": pa.array([None], pa.float64()),
            "boot_lo": pa.array([None], pa.float64()),
            "boot_hi": pa.array([None], pa.float64()),
        })
    idx = np.fromiter(
        (md5_u64(f"bs:{b}:{i}") % n
         for b in range(n_boot) for i in range(n)),
        dtype=np.int64, count=n_boot * n).reshape(n_boot, n)
    sums = c[idx].sum(axis=1)  # exact: < 2^63 by cents magnitude
    means = np.sort(sums.astype(np.float64) / n)
    k_lo = -(-alpha_millis * n_boot // 1000)          # ceil
    k_hi = -(-(1000 - alpha_millis) * n_boot // 1000)
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "n_boot": pa.array([n_boot], pa.int64()),
        "mean_obs": pa.array([float(int(c.sum())) / n], pa.float64()),
        "boot_lo": pa.array([float(means[k_lo - 1])], pa.float64()),
        "boot_hi": pa.array([float(means[k_hi - 1])], pa.float64()),
    })


def bootstrap_daily_mean_ci_sql(ts_col: str = "ts",
                                value_col: str = "value",
                                n_boot: int = 1000,
                                alpha_millis: int = 25,
                                table: str = "events") -> str:
    k_lo = -(-alpha_millis * n_boot // 1000)
    k_hi = -(-(1000 - alpha_millis) * n_boot // 1000)
    return f"""
WITH daily AS (
  SELECT CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT)
      AS day,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {ts_col} IS NOT NULL
  GROUP BY 1
), d AS (
  SELECT row_number() OVER (ORDER BY day) - 1 AS i, c FROM daily
), nn AS (SELECT count(*) AS n FROM d),
picks AS (
  SELECT b.b, dd.c
  FROM generate_series(0, {n_boot - 1}) AS b(b)
  CROSS JOIN d idx
  JOIN d dd ON dd.i = CAST(
    md5_number_upper('bs:' || CAST(b.b AS VARCHAR) || ':'
                     || CAST(idx.i AS VARCHAR))
    % (SELECT n FROM nn) AS BIGINT)
), rs AS (
  SELECT b, CAST(sum(c) AS DOUBLE) / (SELECT n FROM nn) AS m
  FROM picks GROUP BY b
), ranked AS (
  SELECT m, row_number() OVER (ORDER BY m) AS r FROM rs
)
SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_days,
  CAST({n_boot} AS BIGINT) AS n_boot,
  (SELECT CAST(sum(c) AS DOUBLE) / (SELECT n FROM nn) FROM d)
    AS mean_obs,
  (SELECT m FROM ranked WHERE r = {k_lo}) AS boot_lo,
  (SELECT m FROM ranked WHERE r = {k_hi}) AS boot_hi
""".strip()


# ------------------------------------------- CUPED adjusted A/B means

def cuped_adjusted_means(ds, split_date: str = "2024-01-16",
                         user_col: str = "user_id", ts_col: str = "ts",
                         value_col: str = "value") -> pa.Table:
    """CUPED variance reduction for A/B readouts (Deng et al. 2013):
    adjust each user's POST-period metric by their PRE-period metric
    (``y_adj = y - θ(x - x̄)``, θ = cov(x,y)/var(x) pooled) and report
    per-variant adjusted means — the experimentation-platform
    primitive that shrinks metric variance without touching the
    estimand (E[y_adj] = E[y]). Variant assignment is the
    deterministic ``user_id % 2``.

    Exact-integer contract: per-user pre/post cents sums merge
    distributed; the pooled moments (n, Σx, Σy, Σxy, Σx² — the xy/x²
    sums split hi/lo so int64 partials never wrap) and per-variant
    sums are exact integers reassembled as PYTHON ints (HUGEINT in the
    mirror — the n·Σxy cross products exceed int64); θ, x̄ and each
    adjusted mean are ONE shared float tree each:
    ``θ = (n·Σxy - Σx·Σy) / (n·Σx² - Σx·Σx)``,
    ``mean_adj = (Σy_v - θ·Σx_v + θ·x̄·n_v) / n_v`` with left-to-right
    association mirrored exactly; θ's numerator/denominator pass 2^64
    at bench scale, so both engines float them via the shared
    ``_split_float`` tree (never DuckDB's lossy HUGEINT→DOUBLE cast).
    θ is NULL (means unadjusted) when var(x) = 0.

    Shape: per-block (user, pre, post) combiner → distributed per-user
    merge (``final='ray'``) → one scalar-partials pass per block →
    driver reassembly. NULL user/ts/value rows are excluded by
    contract. Output: (variant, n_users, sum_x_cents, sum_y_cents,
    theta, mean_post, mean_post_adj) sorted by variant.
    """
    import datetime as _dt

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    split_us = int(_dt.datetime.fromisoformat(split_date)
                   .replace(tzinfo=_dt.timezone.utc).timestamp()
                   * 1_000_000)

    def per_user_partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[user_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        cents = _cents(t[value_col])
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        pre = pc.less(us, split_us)
        prep = pa.table({
            "user": pc.cast(t[user_col], pa.int64()),
            "x": pc.if_else(pre, cents, pa.scalar(0, pa.int64())),
            "y": pc.if_else(pre, pa.scalar(0, pa.int64()), cents),
        })
        out = prep.group_by(["user"]).aggregate([("x", "sum"),
                                                 ("y", "sum")])
        return out.rename_columns(["user", "x", "y"])

    per_user = grouped_agg(
        ds.map_batches(skip_empty(per_user_partial),
                       batch_format="pyarrow", zero_copy_batch=True),
        keys=["user"], aggs=[("x", "sum"), ("y", "sum")], final="ray")

    def moments(t: pa.Table) -> pa.Table:
        u = t["user"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["x_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["y_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = u % 2
        if len(x) and max(float(np.abs(x).max()),
                          float(np.abs(y).max())) >= 2.0 ** 31:
            raise ValueError(
                "cuped_adjusted_means: per-user cents sums exceed the "
                "int64-safe product range — rescale upstream")
        xy = x * y
        xx = x * x
        rows = {"n": [], "sx": [], "sy": [],
                "sxy_hi": [], "sxy_lo": [], "sxx_hi": [], "sxx_lo": [],
                "variant": []}
        for vv in (0, 1):
            m = v == vv
            rows["variant"].append(vv)
            rows["n"].append(int(m.sum()))
            rows["sx"].append(int(x[m].sum()))
            rows["sy"].append(int(y[m].sum()))
            rows["sxy_hi"].append(int((xy[m] // _SS_SPLIT).sum()))
            rows["sxy_lo"].append(int((xy[m] % _SS_SPLIT).sum()))
            rows["sxx_hi"].append(int((xx[m] // _SS_SPLIT).sum()))
            rows["sxx_lo"].append(int((xx[m] % _SS_SPLIT).sum()))
        return pa.table({k: pa.array(rows[k], pa.int64())
                         for k in rows})

    parts = [t for t in per_user.map_batches(
        skip_empty(moments), batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_size=None,
                                           batch_format="pyarrow")]
    agg = {vv: {"n": 0, "sx": 0, "sy": 0, "sxy": 0, "sxx": 0}
           for vv in (0, 1)}
    for t in parts:
        for r in t.to_pylist():
            a = agg[r["variant"]]
            a["n"] += r["n"]
            a["sx"] += r["sx"]
            a["sy"] += r["sy"]
            a["sxy"] += r["sxy_hi"] * _SS_SPLIT + r["sxy_lo"]
            a["sxx"] += r["sxx_hi"] * _SS_SPLIT + r["sxx_lo"]
    n = agg[0]["n"] + agg[1]["n"]
    sx = agg[0]["sx"] + agg[1]["sx"]
    sy = agg[0]["sy"] + agg[1]["sy"]
    sxy = agg[0]["sxy"] + agg[1]["sxy"]
    sxx = agg[0]["sxx"] + agg[1]["sxx"]
    den = n * sxx - sx * sx   # python ints — never wrap
    num = n * sxy - sx * sy
    # num/den pass 2^64 at bench scale: use the shared split tree so
    # the mirror never casts a >2^64 HUGEINT to DOUBLE (lossy class)
    theta = (_split_float(num) / _split_float(den)
             if n > 0 and den != 0 else None)
    xbar = float(sx) / float(n) if n > 0 else None

    out = {"variant": [], "n_users": [], "sum_x_cents": [],
           "sum_y_cents": [], "theta": [], "mean_post": [],
           "mean_post_adj": []}
    for vv in (0, 1):
        a = agg[vv]
        if a["n"] == 0:
            continue
        nv = a["n"]
        mean_post = float(a["sy"]) / float(nv)
        if theta is None:
            adj = None
        else:
            adj = (float(a["sy"]) - theta * float(a["sx"])
                   + theta * xbar * float(nv)) / float(nv)
        out["variant"].append(vv)
        out["n_users"].append(nv)
        out["sum_x_cents"].append(a["sx"])
        out["sum_y_cents"].append(a["sy"])
        out["theta"].append(theta)
        out["mean_post"].append(mean_post)
        out["mean_post_adj"].append(adj)
    return pa.table({
        "variant": pa.array(out["variant"], pa.int64()),
        "n_users": pa.array(out["n_users"], pa.int64()),
        "sum_x_cents": pa.array(out["sum_x_cents"], pa.int64()),
        "sum_y_cents": pa.array(out["sum_y_cents"], pa.int64()),
        "theta": pa.array(out["theta"], pa.float64()),
        "mean_post": pa.array(out["mean_post"], pa.float64()),
        "mean_post_adj": pa.array(out["mean_post_adj"], pa.float64()),
    })


def cuped_adjusted_means_sql(split_date: str = "2024-01-16",
                             user_col: str = "user_id",
                             ts_col: str = "ts",
                             value_col: str = "value",
                             table: str = "events") -> str:
    return f"""
WITH u AS (
  SELECT {user_col} AS user_id,
    SUM(CASE WHEN {ts_col} < TIMESTAMP '{split_date}'
        THEN CAST(round({value_col} * 100.0) AS BIGINT) ELSE 0 END)
      AS x,
    SUM(CASE WHEN {ts_col} >= TIMESTAMP '{split_date}'
        THEN CAST(round({value_col} * 100.0) AS BIGINT) ELSE 0 END)
      AS y
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
  GROUP BY {user_col}
), pooled AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM u
), nd AS (
  SELECT n, sx, sy,
    n * sxy - sx * sy AS th_num,
    n * sxx - sx * sx AS th_den
  FROM pooled
), th AS (
  SELECT n, sx,
    CASE WHEN n > 0 AND th_den != 0 THEN
      {_split_float_sql('th_num')} / {_split_float_sql('th_den')}
    ELSE NULL END AS theta,
    CASE WHEN n > 0 THEN CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
    ELSE NULL END AS xbar
  FROM nd
), pv AS (
  SELECT user_id % 2 AS variant, CAST(count(*) AS BIGINT) AS n_users,
    CAST(sum(x) AS BIGINT) AS sum_x_cents,
    CAST(sum(y) AS BIGINT) AS sum_y_cents
  FROM u GROUP BY 1
)
SELECT pv.variant, pv.n_users, pv.sum_x_cents, pv.sum_y_cents,
  th.theta,
  CAST(pv.sum_y_cents AS DOUBLE) / CAST(pv.n_users AS DOUBLE)
    AS mean_post,
  (CAST(pv.sum_y_cents AS DOUBLE) - th.theta
     * CAST(pv.sum_x_cents AS DOUBLE)
   + th.theta * th.xbar * CAST(pv.n_users AS DOUBLE))
  / CAST(pv.n_users AS DOUBLE) AS mean_post_adj
FROM pv, th ORDER BY pv.variant
""".strip()


# ------------------------------------------- weekly periodogram

# cos/sin(2πk/7) in integer millionths, k = 0..6 — PINNED literals
# shared with the SQL mirror below so neither engine touches libm for
# the phase table. Harmonic m addresses the same table at (m·k) % 7.
_COS7_MILLIS = (1000000, 623490, -222521, -900969,
                -900969, -222521, 623490)
_SIN7_MILLIS = (0, 781831, 974928, 433884,
                -433884, -974928, -781831)


def weekly_periodogram(ds, group_col: str = "event_type",
                       ts_col: str = "ts", value_col: str = "value",
                       harmonics: int = 3) -> pa.Table:
    """DFT power of the DAILY cents series at the weekly frequency and
    its harmonics (periods 7, 7/2, 7/3 days) per group — the spectral
    "is there a weekly rhythm?" probe beside the time-domain
    ``seasonal_dow_index``.

    Determinism contract: the phase of epoch-day ``d`` for harmonic
    ``m`` is ``2π(m·d mod 7)/7`` — only 7 distinct angles, pinned as
    the integer-millionth literals above (identical in the SQL
    mirror), so ``S_c(m) = Σ_d c_d·COS7[(m·d)%7]`` and the sine twin
    are EXACT integers accumulated as python ints (c_d is the exact
    int64 daily cents total; the 1e6-scaled products stay well under
    2^63 per day and are summed arbitrary-precision). The only floats
    are one shared tree per row:
    ``x = float(S_c)/(n·1e6); y = float(S_s)/(n·1e6);
    amplitude = 2·sqrt(x² + y²)`` — each cast is on an
    int64-GUARDED value (< 2^63), so the int→double rounds once and
    identically in both engines; casting ``S_c²+S_s²`` (which passes
    2^64 at bench scale) would re-enter DuckDB's HUGEINT→DOUBLE
    double-rounding class (NOTES round-4 HHI/burstiness).
    Days are epoch-anchored (``d = floor(ts / 86400s)``), so the phase
    origin is engine-independent; the series is the RAW daily total
    (no detrend — the m-th bin of a constant offset is nonzero only
    for partial trailing weeks, which is part of the contract).

    Shape: one combiner pass collapses the corpus to the bounded
    (group × day) table; the |groups|·harmonics spectral sums run on
    the driver over that bounded table. NULL group/ts/value rows are
    excluded by contract. Output: (group, harmonic, s_c, s_s,
    amplitude) sorted by (group, harmonic); s_c/s_s are the exact
    millionth-scaled spectral sums (int64 — guarded).
    """
    import math

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[group_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        return pa.table({"g": t[group_col],
                         "_day": _epoch_day(t[ts_col]),
                         "cents": _cents(t[value_col])})

    daily = grouped_agg(
        ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["g", "_day"], [("cents", "sum")], final="driver").to_pandas()

    out = {"g": [], "harmonic": [], "s_c": [], "s_s": [],
           "amplitude": []}
    for g, sub in daily.groupby("g", sort=True):
        d = sub["_day"].to_numpy(dtype=np.int64)
        c = sub["cents_sum"].to_numpy(dtype=np.int64)
        n = len(d)
        for m in range(1, harmonics + 1):
            k = (m * d) % 7
            sc = sum(int(ci) * _COS7_MILLIS[ki]
                     for ci, ki in zip(c, k))
            ss = sum(int(ci) * _SIN7_MILLIS[ki]
                     for ci, ki in zip(c, k))
            if max(abs(sc), abs(ss)) >= 2 ** 63:
                raise ValueError(
                    "weekly_periodogram: spectral sum exceeds int64 — "
                    "rescale value upstream")
            x = float(sc) / (float(n) * 1e6)
            y = float(ss) / (float(n) * 1e6)
            amp = 2.0 * math.sqrt(x * x + y * y)
            out["g"].append(g)
            out["harmonic"].append(m)
            out["s_c"].append(sc)
            out["s_s"].append(ss)
            out["amplitude"].append(amp)
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "harmonic": pa.array(out["harmonic"], pa.int64()),
        "s_c": pa.array(out["s_c"], pa.int64()),
        "s_s": pa.array(out["s_s"], pa.int64()),
        "amplitude": pa.array(out["amplitude"], pa.float64()),
    })


def weekly_periodogram_sql(group_col: str = "event_type",
                           ts_col: str = "ts",
                           value_col: str = "value",
                           harmonics: int = 3,
                           table: str = "events") -> str:
    trig_rows = ",\n    ".join(
        f"({k}, {_COS7_MILLIS[k]}, {_SIN7_MILLIS[k]})"
        for k in range(7))
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
  GROUP BY 1, 2
), trig(k, cosv, sinv) AS (
  VALUES {trig_rows}
), sums AS (
  SELECT d.g, m.m AS harmonic,
    CAST(sum(CAST(d.c AS HUGEINT) * t.cosv) AS BIGINT) AS s_c,
    CAST(sum(CAST(d.c AS HUGEINT) * t.sinv) AS BIGINT) AS s_s,
    count(*) AS n
  FROM daily d
  CROSS JOIN generate_series(1, {harmonics}) AS m(m)
  JOIN trig t ON t.k = (m.m * d.day) % 7
  GROUP BY 1, 2
), amp AS (
  SELECT g, harmonic, s_c, s_s,
    CAST(s_c AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS x,
    CAST(s_s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS y
  FROM sums
)
SELECT g AS {group_col}, harmonic, s_c, s_s,
  2 * sqrt(x * x + y * y) AS amplitude
FROM amp ORDER BY g, harmonic
""".strip()


# ------------------------------------------- paired permutation test

def permutation_sign_test(ds, user_col: str = "user_id",
                          type_col: str = "event_type",
                          value_col: str = "value",
                          type_a: str = "click",
                          type_b: str = "purchase") -> pa.Table:
    """Paired sign-flip permutation (randomization) test for
    ``H0: E[a_u − b_u] = 0`` over per-user cents totals — the
    distribution-free sibling of the t/Wilcoxon machinery: the null
    distribution is the data's own, under random re-signing of each
    user's paired delta (Fisher 1935).

    Determinism contract: permutation ``p``'s sign for user ``u`` is
    BIT ``p`` of ``md5_u64('pt:' || u)`` (≡ DuckDB
    ``md5_number_upper``) — 64 permutations from ONE hash per user,
    identical in both engines (production raises B by drawing more
    hash words). Every statistic is an EXACT integer: per-user delta
    ``d_u = a_cents − b_cents``; observed ``T = Σ d_u``; permuted
    ``T_p = Σ (1−2·bit_p(u))·d_u`` accumulated as python ints;
    ``n_as_extreme = #{p : |T_p| ≥ |T|}``. The only float is the
    add-one Monte-Carlo p ``(n_as_extreme + 1) / 65.0`` — one
    division.

    Shape: per-user deltas merge distributed (``final='ray'``); each
    block then collapses to a 64-row (perm, partial) table — the
    signs depend only on (p, u), so ``T_p`` is combiner-decomposable
    and the exchange carries 64 rows per block; a bounded driver
    merge finishes. Users enter via rows of the two named types with
    non-NULL user/value. Output: one row (n_users, t_obs_cents,
    n_perm, n_as_extreme, p_value).
    """
    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def per_user_partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[user_col]),
                               pc.is_valid(t[value_col])),
                       pc.is_in(t[type_col],
                                value_set=pa.array([type_a, type_b])))
        t = t.filter(keep)
        sign = pc.if_else(pc.equal(t[type_col], type_a),
                          pa.scalar(1, pa.int64()),
                          pa.scalar(-1, pa.int64()))
        prep = pa.table({
            "user": pc.cast(t[user_col], pa.int64()),
            "d": pc.multiply_checked(_cents(t[value_col]), sign),
        })
        out = prep.group_by(["user"]).aggregate([("d", "sum")])
        return out.rename_columns(["user", "d"])

    per_user = grouped_agg(
        ds.map_batches(skip_empty(per_user_partial),
                       batch_format="pyarrow", zero_copy_batch=True),
        keys=["user"], aggs=[("d", "sum")], final="ray")

    def perm_partials(t: pa.Table) -> pa.Table:
        u = t["user"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["d_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(d) and int(np.abs(d).sum()) >= 2 ** 62:
            raise ValueError(
                "permutation_sign_test: block |d| mass exceeds the "
                "int64-safe range — rescale upstream")
        h = np.fromiter((md5_u64(f"pt:{x}") for x in u),
                        dtype=np.uint64, count=len(u))
        # signs matrix: 64 × n, ±1 from the hash bits
        bits = ((h[None, :] >> np.arange(64, dtype=np.uint64)[:, None])
                & np.uint64(1)).astype(np.int64)
        signs = 1 - 2 * bits
        tp = signs @ d                      # exact: Σ|d| < 2^62
        return pa.table({
            "perm": pa.array(np.arange(64, dtype=np.int64)),
            "tp": pa.array(tp, pa.int64()),
            "tobs": pa.array(np.full(64, int(d.sum()), dtype=np.int64)),
            "n": pa.array(np.full(64, len(d), dtype=np.int64)),
        })

    parts = grouped_agg(
        per_user.map_batches(skip_empty(perm_partials),
                             batch_format="pyarrow",
                             zero_copy_batch=True),
        ["perm"], [("tp", "sum"), ("tobs", "sum"), ("n", "sum")],
        final="driver").to_pandas()
    if len(parts) == 0:
        return pa.table({
            "n_users": pa.array([0], pa.int64()),
            "t_obs_cents": pa.array([0], pa.int64()),
            "n_perm": pa.array([64], pa.int64()),
            "n_as_extreme": pa.array([None], pa.int64()),
            "p_value": pa.array([None], pa.float64()),
        })
    # tobs/n were replicated across the 64 perm rows of each block
    # partial, so any merged row carries the full corpus sum
    t_obs = int(parts["tobs_sum"].iloc[0])
    n_users = int(parts["n_sum"].iloc[0])
    tp = parts["tp_sum"].astype("int64").to_numpy()
    n_extreme = int((np.abs(tp) >= abs(t_obs)).sum())
    return pa.table({
        "n_users": pa.array([n_users], pa.int64()),
        "t_obs_cents": pa.array([t_obs], pa.int64()),
        "n_perm": pa.array([64], pa.int64()),
        "n_as_extreme": pa.array([n_extreme], pa.int64()),
        "p_value": pa.array([(n_extreme + 1) / 65.0], pa.float64()),
    })


def permutation_sign_test_sql(user_col: str = "user_id",
                              type_col: str = "event_type",
                              value_col: str = "value",
                              type_a: str = "click",
                              type_b: str = "purchase",
                              table: str = "events") -> str:
    return f"""
WITH u AS (
  SELECT {user_col} AS user_id,
    SUM(CASE WHEN {type_col} = '{type_a}'
        THEN CAST(round({value_col} * 100.0) AS BIGINT)
        ELSE -CAST(round({value_col} * 100.0) AS BIGINT) END) AS d
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {value_col} IS NOT NULL
    AND {type_col} IN ('{type_a}', '{type_b}')
  GROUP BY 1
), perms AS (
  SELECT p.p,
    CAST(sum((1 - 2 * CAST(
      (md5_number_upper('pt:'
         || CAST(CAST(u.user_id AS BIGINT) AS VARCHAR)) >> p.p)
      & 1 AS BIGINT)) * u.d) AS BIGINT) AS tp
  FROM u CROSS JOIN generate_series(0, 63) AS p(p)
  GROUP BY 1
), obs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
    CAST(COALESCE(sum(d), 0) AS BIGINT) AS t_obs FROM u
)
SELECT o.n_users, o.t_obs AS t_obs_cents,
  CAST(64 AS BIGINT) AS n_perm,
  CASE WHEN o.n_users > 0 THEN (
    SELECT CAST(count(*) AS BIGINT) FROM perms
    WHERE abs(tp) >= abs(o.t_obs))
  ELSE NULL END AS n_as_extreme,
  CASE WHEN o.n_users > 0 THEN
    (CAST((SELECT count(*) FROM perms
           WHERE abs(tp) >= abs(o.t_obs)) AS DOUBLE) + 1) / 65.0
  ELSE NULL END AS p_value
FROM obs o
""".strip()


# ------------------------------------------- Wilson score intervals

def wilson_proportion_ci(ds, group_col: str = "event_type",
                         value_col: str = "value",
                         threshold_cents: int = 5000) -> pa.Table:
    """Wilson score 95% interval for the per-group proportion of
    high-value rows (``cents ≥ threshold``) — the proportion-CI
    primitive (Wilson 1927): unlike the Wald interval it never leaves
    [0,1] and behaves at k=0/k=n, which is exactly the regime of rare
    segments in a funnel readout.

    Determinism contract: k and n are exact integer counts merged by
    combiner; z is the pinned DECIMAL literal ``1.959964`` (parsed to
    the same double by both engines — no inverse-CDF at runtime). The
    interval is one shared float tree, mirrored operation-for-
    operation in the SQL (each intermediate is a double both sides):
    ``phat=k/n; z2=z·z; denom=1+z2/n;
    center=(phat + z2/(2n))/denom;
    half=z·sqrt(phat·(1−phat)/n + z2/(4·(n·n)))/denom``.
    NULL group/value rows are excluded by contract. Output:
    (group, n, k, phat, wilson_lo, wilson_hi) sorted by group.
    """
    import math

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[group_col]),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        hi = pc.cast(pc.greater_equal(_cents(t[value_col]),
                                      threshold_cents), pa.int64())
        return pa.table({"g": t[group_col], "k": hi,
                         "one": pa.array(np.ones(len(t), np.int64))})

    agg = grouped_agg(
        ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["g"], [("k", "sum"), ("one", "sum")],
        final="driver").to_pandas()
    z = 1.959964
    rows = {"g": [], "n": [], "k": [], "phat": [], "lo": [], "hi": []}
    for _, r in agg.sort_values("g").iterrows():
        n, k = int(r["one_sum"]), int(r["k_sum"])
        phat = k / n
        z2 = z * z
        denom = 1.0 + z2 / n
        center = (phat + z2 / (2.0 * n)) / denom
        half = (z * math.sqrt(phat * (1.0 - phat) / n
                              + z2 / (4.0 * _split_float(n * n)))
                / denom)
        rows["g"].append(r["g"])
        rows["n"].append(n)
        rows["k"].append(k)
        rows["phat"].append(phat)
        rows["lo"].append(center - half)
        rows["hi"].append(center + half)
    return pa.table({
        group_col: pa.array(rows["g"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "k": pa.array(rows["k"], pa.int64()),
        "phat": pa.array(rows["phat"], pa.float64()),
        "wilson_lo": pa.array(rows["lo"], pa.float64()),
        "wilson_hi": pa.array(rows["hi"], pa.float64()),
    })


def wilson_proportion_ci_sql(group_col: str = "event_type",
                             value_col: str = "value",
                             threshold_cents: int = 5000,
                             table: str = "events") -> str:
    return f"""
WITH agg AS (
  SELECT {group_col} AS g, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN CAST(round({value_col} * 100.0) AS BIGINT)
        >= {threshold_cents} THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {value_col} IS NOT NULL
  GROUP BY 1
), t AS (
  SELECT g, n, k,
    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS phat,
    1.959964 * 1.959964 AS z2,
    1.0 + (1.959964 * 1.959964) / CAST(n AS DOUBLE) AS denom
  FROM agg
), ctr AS (
  SELECT g, n, k, phat,
    (phat + z2 / (2.0 * CAST(n AS DOUBLE))) / denom AS center,
    1.959964 * sqrt(phat * (1.0 - phat) / CAST(n AS DOUBLE)
      + z2 / (4.0 * {_split_float_sql('CAST(n AS HUGEINT) * n')}))
      / denom
      AS half
  FROM t
)
SELECT g AS {group_col}, n, k, phat,
  center - half AS wilson_lo, center + half AS wilson_hi
FROM ctr ORDER BY g
""".strip()


# ------------------------------------------- two-feature OLS

def ols_hour_dow(ds, ts_col: str = "ts",
                 value_col: str = "value") -> pa.Table:
    """Multiple linear regression of cents on (hour-of-day, epoch
    day-of-week index) via the exact normal equations — the
    closed-form multivariate sibling of the simple-trend operators:
    ``y = β0 + β1·hour + β2·dow``.

    Determinism contract: the nine moment sums (n, Σh, Σw, Σh², Σhw,
    Σw², Σy, Σhy, Σwy) are EXACT integers (hour = ``(us // 3.6e9) %
    24``, dow = ``(us // 86.4e9) % 7`` — integer floor-divs on the
    raw microsecond ticks, no calendar/locale path; y in cents),
    merged as python ints (HUGEINT in the mirror). The 3×3 system
    solves by CRAMER'S RULE with arbitrary-precision integer
    determinants; the only floats are the three final divisions
    ``_split_float(det_i) / _split_float(det)`` (mirrored by
    ``_split_float_sql`` — the determinants scale as n³·moments and
    pass 2^64 near n ≈ 3e5 rows, where DuckDB's HUGEINT→DOUBLE cast
    double-rounds). Singular design
    (det = 0) yields NULL betas. At oracle scale the HUGEINT
    determinant holds to n ≈ 1e10 rows; the engine's python ints are
    unbounded. NULL ts/value rows are excluded by contract.
    Output: one row (n, beta0, beta_hour, beta_dow).
    """
    from fluent_server_ray.stages.aggregate import skip_empty

    def moments(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[ts_col]), pc.is_valid(t[value_col]))
        t = t.filter(keep)
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        y = _cents(t[value_col]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = (us // 3_600_000_000) % 24
        w = (us // 86_400_000_000) % 7
        vals = {
            "n": len(y),
            "sh": int(h.sum()), "sw": int(w.sum()),
            "shh": int((h * h).sum()), "shw": int((h * w).sum()),
            "sww": int((w * w).sum()),
            "sy": int(y.sum()),
            "shy": int((h * y).sum()), "swy": int((w * y).sum()),
        }
        return pa.table({k: pa.array([v], pa.int64())
                         for k, v in vals.items()})

    parts = [t for t in ds.map_batches(
        skip_empty(moments), batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_size=None,
                                           batch_format="pyarrow")]
    tot = {k: 0 for k in ("n", "sh", "sw", "shh", "shw", "sww",
                          "sy", "shy", "swy")}
    for t in parts:
        for r in t.to_pylist():
            for k in tot:
                tot[k] += r[k]
    n, sh, sw = tot["n"], tot["sh"], tot["sw"]
    shh, shw, sww = tot["shh"], tot["shw"], tot["sww"]
    sy, shy, swy = tot["sy"], tot["shy"], tot["swy"]
    det = (n * (shh * sww - shw * shw)
           - sh * (sh * sww - shw * sw)
           + sw * (sh * shw - shh * sw))
    if n == 0 or det == 0:
        b0 = b1 = b2 = None
    else:
        d0 = (sy * (shh * sww - shw * shw)
              - sh * (shy * sww - shw * swy)
              + sw * (shy * shw - shh * swy))
        d1 = (n * (shy * sww - shw * swy)
              - sy * (sh * sww - shw * sw)
              + sw * (sh * swy - shy * sw))
        d2 = (n * (shh * swy - shy * shw)
              - sh * (sh * swy - shy * sw)
              + sy * (sh * shw - shh * sw))
        # dets scale as n^3·moments and pass 2^64 around n ~ 3e5 rows:
        # shared split tree, not DuckDB's lossy HUGEINT→DOUBLE cast
        fdet = _split_float(det)
        b0 = _split_float(d0) / fdet
        b1 = _split_float(d1) / fdet
        b2 = _split_float(d2) / fdet
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "beta0": pa.array([b0], pa.float64()),
        "beta_hour": pa.array([b1], pa.float64()),
        "beta_dow": pa.array([b2], pa.float64()),
    })


def ols_hour_dow_sql(ts_col: str = "ts", value_col: str = "value",
                     table: str = "events") -> str:
    return f"""
WITH m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(h) AS HUGEINT) AS sh, CAST(sum(w) AS HUGEINT) AS sw,
    CAST(sum(h * h) AS HUGEINT) AS shh,
    CAST(sum(h * w) AS HUGEINT) AS shw,
    CAST(sum(w * w) AS HUGEINT) AS sww,
    CAST(sum(y) AS HUGEINT) AS sy,
    CAST(sum(h * y) AS HUGEINT) AS shy,
    CAST(sum(w * y) AS HUGEINT) AS swy
  FROM (
    SELECT (epoch_us({ts_col}) // 3600000000) % 24 AS h,
      (epoch_us({ts_col}) // 86400000000) % 7 AS w,
      CAST(round({value_col} * 100.0) AS BIGINT) AS y
    FROM {table}
    WHERE {ts_col} IS NOT NULL AND {value_col} IS NOT NULL
  )
), d AS (
  SELECT n,
    n * (shh * sww - shw * shw)
      - sh * (sh * sww - shw * sw)
      + sw * (sh * shw - shh * sw) AS det,
    sy * (shh * sww - shw * shw)
      - sh * (shy * sww - shw * swy)
      + sw * (shy * shw - shh * swy) AS d0,
    n * (shy * sww - shw * swy)
      - sy * (sh * sww - shw * sw)
      + sw * (sh * swy - shy * sw) AS d1,
    n * (shh * swy - shy * shw)
      - sh * (sh * swy - shy * sw)
      + sy * (sh * shw - shh * sw) AS d2
  FROM m
)
SELECT CAST(n AS BIGINT) AS n,
  CASE WHEN n > 0 AND det != 0
    THEN {_split_float_sql('d0')} / {_split_float_sql('det')}
  END AS beta0,
  CASE WHEN n > 0 AND det != 0
    THEN {_split_float_sql('d1')} / {_split_float_sql('det')}
  END AS beta_hour,
  CASE WHEN n > 0 AND det != 0
    THEN {_split_float_sql('d2')} / {_split_float_sql('det')}
  END AS beta_dow
FROM d
""".strip()


# ------------------------------------------- Cochran's Q

def cochran_q(ds, user_col: str = "user_id",
              type_col: str = "event_type",
              treatments: tuple = ("view", "click",
                                   "purchase")) -> pa.Table:
    """Cochran's Q test for k matched binary treatments (Cochran
    1950) — the k-treatment generalization of McNemar: did the same
    users "succeed" at equal rates across the k event types, where
    success = the user emitted ≥1 event of that type?

    Exact-integer contract: with column totals ``C_j`` (users
    succeeding at treatment j), row totals ``R_i`` (treatments user i
    succeeded at) and ``N = ΣC = ΣR``, the statistic reduces to
    ``Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²)`` — numerator and
    denominator are exact python ints; Q is ONE float division
    (NULL when the denominator is 0, i.e. every user succeeds at all
    or none). Users enter via rows of the named types with non-NULL
    user id.

    Shape: per-block (user × treatment) any-flags → distributed
    per-user max-merge (``final='ray'``) → per-block scalar partials
    (ΣC_j, ΣR, ΣR², n) → bounded driver reassembly. Output: one row
    (n_users, c_<treatment>..., q_num, q_den, q_stat).
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    k = len(treatments)

    def flags(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[user_col]),
                       pc.is_in(t[type_col],
                                value_set=pa.array(list(treatments))))
        t = t.filter(keep)
        cols = {"user": pc.cast(t[user_col], pa.int64())}
        for tr in treatments:
            cols[f"t_{tr}"] = pc.cast(pc.equal(t[type_col], tr),
                                      pa.int64())
        prep = pa.table(cols)
        out = prep.group_by(["user"]).aggregate(
            [(f"t_{tr}", "max") for tr in treatments])
        return out.rename_columns(["user"]
                                  + [f"t_{tr}" for tr in treatments])

    per_user = grouped_agg(
        ds.map_batches(skip_empty(flags), batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["user"], aggs=[(f"t_{tr}", "max") for tr in treatments],
        final="ray")

    def partials(t: pa.Table) -> pa.Table:
        mats = np.column_stack([
            t[f"t_{tr}_max"].to_numpy(zero_copy_only=False)
            .astype(np.int64) for tr in treatments])
        r = mats.sum(axis=1)
        vals = {"n": len(mats), "sr": int(r.sum()),
                "srr": int((r * r).sum())}
        for j, tr in enumerate(treatments):
            vals[f"c_{tr}"] = int(mats[:, j].sum())
        return pa.table({kk: pa.array([v], pa.int64())
                         for kk, v in vals.items()})

    parts = [t for t in per_user.map_batches(
        skip_empty(partials), batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_size=None,
                                           batch_format="pyarrow")]
    tot = {kk: 0 for kk in (["n", "sr", "srr"]
                            + [f"c_{tr}" for tr in treatments])}
    for t in parts:
        for r in t.to_pylist():
            for kk in tot:
                tot[kk] += r[kk]
    cs = [tot[f"c_{tr}"] for tr in treatments]
    n_big = sum(cs)
    num = (k - 1) * (k * sum(c * c for c in cs) - n_big * n_big)
    den = k * n_big - tot["srr"]
    if max(abs(num), abs(den)) >= 2 ** 63:
        raise ValueError("cochran_q: statistic exceeds int64 — "
                         "shard the user population upstream")
    q = float(num) / float(den) if den != 0 else None
    out = {"n_users": pa.array([tot["n"]], pa.int64())}
    for tr in treatments:
        out[f"c_{tr}"] = pa.array([tot[f"c_{tr}"]], pa.int64())
    out["q_num"] = pa.array([num], pa.int64())
    out["q_den"] = pa.array([den], pa.int64())
    out["q_stat"] = pa.array([q], pa.float64())
    return pa.table(out)


def cochran_q_sql(user_col: str = "user_id",
                  type_col: str = "event_type",
                  treatments: tuple = ("view", "click", "purchase"),
                  table: str = "events") -> str:
    k = len(treatments)
    in_list = ", ".join(f"'{tr}'" for tr in treatments)
    flag_cols = ",\n    ".join(
        f"MAX(CASE WHEN {type_col} = '{tr}' THEN 1 ELSE 0 END)"
        f" AS t_{tr}" for tr in treatments)
    c_sums = ",\n    ".join(
        f"CAST(COALESCE(sum(t_{tr}), 0) AS BIGINT) AS c_{tr}"
        for tr in treatments)
    r_expr = " + ".join(f"t_{tr}" for tr in treatments)
    c_sq = " + ".join(
        f"CAST(c_{tr} AS HUGEINT) * c_{tr}" for tr in treatments)
    n_expr = " + ".join(f"c_{tr}" for tr in treatments)
    c_list = ", ".join(f"c_{tr}" for tr in treatments)
    return f"""
WITH u AS (
  SELECT {user_col} AS user_id,
    {flag_cols}
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {type_col} IN ({in_list})
  GROUP BY 1
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
    {c_sums},
    CAST(COALESCE(sum(CAST(({r_expr}) AS HUGEINT)
        * ({r_expr})), 0) AS HUGEINT) AS srr
  FROM u
), st AS (
  SELECT n_users, {c_list}, srr,
    CAST(({k} - 1) * ({k} * ({c_sq})
      - CAST(({n_expr}) AS HUGEINT) * ({n_expr})) AS BIGINT) AS q_num,
    CAST({k} * CAST(({n_expr}) AS HUGEINT) - srr AS BIGINT) AS q_den
  FROM agg
)
SELECT n_users, {c_list}, q_num, q_den,
  CASE WHEN q_den != 0
    THEN CAST(q_num AS DOUBLE) / CAST(q_den AS DOUBLE) END AS q_stat
FROM st
""".strip()


# ------------------------------------------- daily-series motif

def daily_motif(ds, group_col: str = "event_type", ts_col: str = "ts",
                value_col: str = "value", w: int = 7) -> pa.Table:
    """Time-series motif discovery over the daily cents series (the
    matrix-profile primitive, Yeh 2016, computed exactly): per group,
    the pair of non-overlapping length-``w`` windows with the minimum
    sum of squared differences — "which two weeks looked most alike?".

    Determinism contract: windows index the OBSERVED day-ascending
    sequence (positional, not calendar — gaps close up, documented);
    SSD is an exact integer (int64-guarded; HUGEINT in the mirror);
    the argmin tie-breaks on smallest ``(i, j)`` lexicographically.
    Groups with fewer than ``2w`` observed days have no valid pair and
    are absent from the output. NULL group/ts/value rows are excluded
    by contract.

    Shape: one combiner pass → bounded (group × day) table → per-group
    O(m²·w) window scan on the driver (m = days − w + 1; calendar-
    bounded, never row-bounded). Output: (group, n_days, i, j, ssd)
    sorted by group.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[group_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        return pa.table({"g": t[group_col],
                         "_day": _epoch_day(t[ts_col]),
                         "cents": _cents(t[value_col])})

    daily = grouped_agg(
        ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["g", "_day"], [("cents", "sum")], final="driver").to_pandas()

    out = {"g": [], "n_days": [], "i": [], "j": [], "ssd": []}
    for g, sub in daily.groupby("g", sort=True):
        c = (sub.sort_values("_day")["cents_sum"]
             .to_numpy(dtype=np.int64))
        n = len(c)
        if n < 2 * w:
            continue
        m = n - w + 1
        win = np.lib.stride_tricks.sliding_window_view(c, w)
        diff = win[:, None, :] - win[None, :, :]     # int64, exact
        if len(diff) and int(np.abs(diff).max()) > 1_000_000_000:
            # w·diff² must stay under 2^63 for the exact int64 SSD
            raise ValueError("daily_motif: daily deltas exceed the "
                             "int64-exact SSD range — rescale value "
                             "upstream")
        ssd = (diff * diff).sum(axis=-1)             # exact int64
        ii, jj = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
        ssd[jj < ii + w] = np.iinfo(np.int64).max    # mask overlap
        flat = np.argmin(ssd)              # row-major: min (i, j) ties
        bi, bj = divmod(int(flat), m)
        out["g"].append(g)
        out["n_days"].append(n)
        out["i"].append(bi)
        out["j"].append(bj)
        out["ssd"].append(int(ssd[bi, bj]))
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "n_days": pa.array(out["n_days"], pa.int64()),
        "i": pa.array(out["i"], pa.int64()),
        "j": pa.array(out["j"], pa.int64()),
        "ssd": pa.array(out["ssd"], pa.int64()),
    })


def daily_motif_sql(group_col: str = "event_type", ts_col: str = "ts",
                    value_col: str = "value", w: int = 7,
                    table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
  GROUP BY 1, 2
), d AS (
  SELECT g, row_number() OVER (PARTITION BY g ORDER BY day) - 1 AS i,
    c, count(*) OVER (PARTITION BY g) AS n
  FROM daily
), pairs AS (
  SELECT a.g, a.i AS i, b.i AS j, a.n
  FROM d a JOIN d b ON b.g = a.g AND b.i >= a.i + {w}
  WHERE a.i + {w} - 1 < a.n AND b.i + {w} - 1 < b.n
), ssd AS (
  SELECT p.g, p.i, p.j, p.n,
    SUM(CAST(x.c - y.c AS HUGEINT) * (x.c - y.c)) AS ssd
  FROM pairs p
  CROSS JOIN generate_series(0, {w - 1}) AS t(t)
  JOIN d x ON x.g = p.g AND x.i = p.i + t.t
  JOIN d y ON y.g = p.g AND y.i = p.j + t.t
  GROUP BY 1, 2, 3, 4
), pick AS (
  SELECT g, n, i, j, ssd,
    row_number() OVER (PARTITION BY g ORDER BY ssd, i, j) AS rn
  FROM ssd
)
SELECT g AS {group_col}, CAST(n AS BIGINT) AS n_days,
  CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
  CAST(ssd AS BIGINT) AS ssd
FROM pick WHERE rn = 1 ORDER BY g
""".strip()


# ------------------------------------------- Allan variance

def allan_variance(ds, group_col: str = "event_type",
                   ts_col: str = "ts", value_col: str = "value",
                   taus: tuple = (1, 2, 4)) -> pa.Table:
    """Multi-scale Allan variance of the daily cents series (Allan
    1966) — the stability/noise-floor diagnostic: for averaging span
    ``τ`` days, ``σ²(τ) = Σ(ȳ_{k+1} − ȳ_k)² / (2(K−1))`` over the
    K non-overlapping τ-day block means. White noise falls as 1/τ;
    a flat/rising curve exposes drift — the spectral-family sibling
    of the periodogram from the time domain.

    Determinism contract: blocks tile the OBSERVED day-ascending
    sequence positionally (trailing partial block dropped); the engine
    carries block SUMS ``S_k`` (exact ints, python-int accumulated),
    so the numerator is the exact integer ``Σ(S_{k+1} − S_k)²`` and
    the variance is ONE float tree
    ``float(num) / float(2 · (K−1) · τ · τ)`` (block mean = S/τ pulled
    out of the square). Groups contribute a τ row only when K ≥ 2.
    NULL group/ts/value rows are excluded by contract. Output:
    (group, tau, n_blocks, avar_num, avar) sorted by (group, tau).
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[group_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        return pa.table({"g": t[group_col],
                         "_day": _epoch_day(t[ts_col]),
                         "cents": _cents(t[value_col])})

    daily = grouped_agg(
        ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["g", "_day"], [("cents", "sum")], final="driver").to_pandas()

    out = {"g": [], "tau": [], "k": [], "num": [], "avar": []}
    for g, sub in daily.groupby("g", sort=True):
        c = (sub.sort_values("_day")["cents_sum"]
             .to_numpy(dtype=np.int64))
        for tau in taus:
            k = len(c) // tau
            if k < 2:
                continue
            s = c[:k * tau].reshape(k, tau).sum(axis=1)
            d = np.diff(s)
            num = sum(int(x) * int(x) for x in d)
            if num >= 2 ** 63:
                raise ValueError("allan_variance: numerator exceeds "
                                 "int64 — rescale value upstream")
            out["g"].append(g)
            out["tau"].append(tau)
            out["k"].append(k)
            out["num"].append(num)
            out["avar"].append(
                float(num) / float(2 * (k - 1) * tau * tau))
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "tau": pa.array(out["tau"], pa.int64()),
        "n_blocks": pa.array(out["k"], pa.int64()),
        "avar_num": pa.array(out["num"], pa.int64()),
        "avar": pa.array(out["avar"], pa.float64()),
    })


def allan_variance_sql(group_col: str = "event_type",
                       ts_col: str = "ts", value_col: str = "value",
                       taus: tuple = (1, 2, 4),
                       table: str = "events") -> str:
    tau_rows = ", ".join(f"({t})" for t in taus)
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
  GROUP BY 1, 2
), d AS (
  SELECT g, row_number() OVER (PARTITION BY g ORDER BY day) - 1 AS i, c
  FROM daily
), taus(tau) AS (VALUES {tau_rows}),
blocks AS (
  SELECT d.g, t.tau, d.i // t.tau AS k, SUM(d.c) AS s,
    count(*) AS cnt
  FROM d CROSS JOIN taus t
  GROUP BY 1, 2, 3
), full_blocks AS (
  SELECT g, tau, k, s FROM blocks WHERE cnt = tau
), diffs AS (
  SELECT g, tau, s - lag(s) OVER (PARTITION BY g, tau ORDER BY k)
    AS dd
  FROM full_blocks
), agg AS (
  SELECT g, tau, CAST(count(dd) AS BIGINT) + 1 AS n_blocks,
    CAST(SUM(CAST(dd AS HUGEINT) * dd) AS BIGINT) AS avar_num
  FROM diffs GROUP BY 1, 2
)
SELECT g AS {group_col}, CAST(tau AS BIGINT) AS tau, n_blocks,
  avar_num,
  CAST(avar_num AS DOUBLE)
    / CAST(2 * (n_blocks - 1) * tau * tau AS DOUBLE) AS avar
FROM agg WHERE n_blocks >= 2 ORDER BY g, tau
""".strip()


# ------------------------------------------- Haar wavelet energy

def haar_energy(ds, group_col: str = "event_type", ts_col: str = "ts",
                value_col: str = "value",
                max_levels: int = 5) -> pa.Table:
    """Unnormalized Haar wavelet detail energy per dyadic level over
    the daily cents series — the multi-resolution decomposition
    (Haar 1910; Mallat's pyramid): level ℓ's detail coefficients are
    pairwise differences of level ℓ−1's pairwise sums, so the energy
    ladder localizes variance by time scale (day-to-day vs
    fortnightly) — the time-domain complement of the periodogram's
    frequency bins.

    Determinism contract: the series is the OBSERVED day-ascending
    daily totals (positional); at EVERY level only complete pairs
    propagate (an odd trailing element is dropped at that level —
    contract, mirrored exactly); coefficients are UNNORMALIZED
    (s = a+b, d = a−b — all exact ints, python-int accumulated; the
    usual 1/√2 factors would leave the integers). ``energy_ℓ = Σ d²``
    is an exact int (int64-guarded; HUGEINT in the mirror). NULL
    group/ts/value rows are excluded by contract. Output:
    (group, level, n_pairs, energy) sorted by (group, level); a level
    appears only when it has ≥1 complete pair.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[group_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        return pa.table({"g": t[group_col],
                         "_day": _epoch_day(t[ts_col]),
                         "cents": _cents(t[value_col])})

    daily = grouped_agg(
        ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["g", "_day"], [("cents", "sum")], final="driver").to_pandas()

    out = {"g": [], "level": [], "n_pairs": [], "energy": []}
    for g, sub in daily.groupby("g", sort=True):
        x = [int(v) for v in
             sub.sort_values("_day")["cents_sum"].to_numpy()]
        for lvl in range(1, max_levels + 1):
            m = len(x) // 2
            if m == 0:
                break
            a, b = x[0:2 * m:2], x[1:2 * m:2]
            energy = sum((ai - bi) * (ai - bi)
                         for ai, bi in zip(a, b))
            if energy >= 2 ** 63:
                raise ValueError("haar_energy: level energy exceeds "
                                 "int64 — rescale value upstream")
            out["g"].append(g)
            out["level"].append(lvl)
            out["n_pairs"].append(m)
            out["energy"].append(energy)
            x = [ai + bi for ai, bi in zip(a, b)]
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "level": pa.array(out["level"], pa.int64()),
        "n_pairs": pa.array(out["n_pairs"], pa.int64()),
        "energy": pa.array(out["energy"], pa.int64()),
    })


def haar_energy_sql(group_col: str = "event_type", ts_col: str = "ts",
                    value_col: str = "value", max_levels: int = 5,
                    table: str = "events") -> str:
    ctes = [f"""daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
  GROUP BY 1, 2
)""", f"""l0 AS (
  SELECT g, row_number() OVER (PARTITION BY g ORDER BY day) - 1 AS i,
    c AS s
  FROM daily
)"""]
    selects = []
    for k in range(1, max_levels + 1):
        ctes.append(f"""l{k}r AS (
  SELECT g, i // 2 AS i, SUM(s) AS s,
    SUM(CASE WHEN i % 2 = 0 THEN s ELSE -s END) AS dd,
    count(*) AS cnt
  FROM l{k - 1} GROUP BY 1, 2
)""")
        ctes.append(f"l{k} AS (SELECT g, i, s, dd FROM l{k}r "
                    "WHERE cnt = 2)")
        selects.append(
            f"SELECT g, {k} AS level, CAST(count(*) AS BIGINT)"
            " AS n_pairs,\n  CAST(SUM(CAST(dd AS HUGEINT) * dd)"
            f" AS BIGINT) AS energy\nFROM l{k} GROUP BY g")
    union = "\nUNION ALL\n".join(selects)
    return (f"WITH {', '.join(ctes)}\n"
            f"SELECT g AS {group_col}, level, n_pairs, energy FROM (\n"
            f"{union}\n) ORDER BY 1, 2").strip()


# ------------------------------------------- pairwise perm + BH

def pairwise_permutation_bh(ds, user_col: str = "user_id",
                            type_col: str = "event_type",
                            value_col: str = "value",
                            q_millis: int = 50,
                            n_buckets: int = 64) -> pa.Table:
    """All-pairs paired sign-flip permutation tests across event
    types, with EXACT Benjamini–Hochberg FDR correction (Benjamini &
    Hochberg 1995) over the resulting p-values — the multiple-testing
    composite: every type pair (a < b) gets the 64-permutation test of
    ``H0: E[a_cents − b_cents] = 0`` over per-user totals, then BH at
    ``q = q_millis/1000`` decides which pairs survive.

    Determinism contract: permutation p's sign for user u in pair
    (a, b) is bit p of ``md5_u64('pt2:' || a || ':' || b || ':' || u)``
    — per-pair hash streams, identical in the mirror. All test
    statistics are exact ints (python-int accumulated); the exact
    p-value is the rational ``(ne+1)/65`` and the BH step-up runs on
    CROSS-MULTIPLIED INTEGERS — rank r survives iff
    ``(ne_r + 1)·1000·m ≤ r·65·q_millis`` (m = pairs tested; ranks
    sort by (ne, a, b) — ties in ne share a p so the cutoff is
    order-independent) — so the reject set is bit-reproducible; the
    only float is the reported p (one division per pair).

    Shape: per-block (user, type) combiner → distributed per-user-type
    merge → ONE user-bucket exchange co-locating each user's types →
    per-bucket partials for every local pair × 64 perms (≤ |pairs|·64
    rows per bucket) → bounded driver merge + BH. A user missing one
    side of a pair contributes delta = its present side (other side
    0) and still counts — contract. NULL user/value rows excluded.
    Output: (type_a, type_b, n_users, t_obs_cents, n_as_extreme,
    p_value, bh_reject) sorted by (type_a, type_b).
    """
    import pandas as pd

    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.assembly import _with_bucket

    def per_ut(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[user_col]),
                               pc.is_valid(t[type_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        prep = pa.table({"user": pc.cast(t[user_col], pa.int64()),
                         "ty": t[type_col],
                         "c": _cents(t[value_col])})
        out = prep.group_by(["user", "ty"]).aggregate([("c", "sum")])
        return out.rename_columns(["user", "ty", "c"])

    per_user_type = grouped_agg(
        ds.map_batches(skip_empty(per_ut), batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["user", "ty"], aggs=[("c", "sum")], final="ray")
    # materialized once: consumed by the global type-set probe AND the
    # bucket exchange (the reduced user×type table is the working set)
    per_user_type = per_user_type.materialize()
    global_types = sorted(per_user_type.unique("ty"))

    bit_idx = np.arange(64, dtype=np.uint64)[:, None]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        piv = (g.pivot_table(index="user", columns="ty",
                             values="c_sum", aggfunc="sum")
               .sort_index()
               .reindex(columns=global_types))   # GLOBAL pair space —
        # a bucket missing one side of a pair still contributes its
        # one-sided users' deltas
        users = piv.index.to_numpy(dtype=np.int64)
        types = global_types
        rows = {"ta": [], "tb": [], "perm": [], "tp": [],
                "nu": [], "tobs": []}
        for ai in range(len(types)):
            for bi in range(ai + 1, len(types)):
                ta, tb = types[ai], types[bi]
                ca = piv[ta].to_numpy()
                cb = piv[tb].to_numpy()
                has = ~(np.isnan(ca) & np.isnan(cb))
                if len(has) and max(np.nanmax(np.abs(ca), initial=0),
                                    np.nanmax(np.abs(cb),
                                              initial=0)) >= 2.0 ** 53:
                    raise ValueError(
                        "pairwise_permutation_bh: per-user cents "
                        "exceed float64-exact pivot range")
                d = (np.nan_to_num(ca[has])
                     - np.nan_to_num(cb[has])).astype(np.int64)
                uu = users[has]
                if len(d) == 0:
                    continue
                if int(np.abs(d).sum()) >= 2 ** 62:
                    raise ValueError(
                        "pairwise_permutation_bh: block delta mass "
                        "exceeds the int64-safe range")
                h = np.fromiter(
                    (md5_u64(f"pt2:{ta}:{tb}:{x}") for x in uu),
                    dtype=np.uint64, count=len(uu))
                signs = 1 - 2 * ((h[None, :] >> bit_idx)
                                 & np.uint64(1)).astype(np.int64)
                tp = signs @ d
                rows["ta"].extend([ta] * 64)
                rows["tb"].extend([tb] * 64)
                rows["perm"].extend(range(64))
                rows["tp"].extend(int(x) for x in tp)
                rows["nu"].extend([len(d)] * 64)
                rows["tobs"].extend([int(d.sum())] * 64)
        return pd.DataFrame(rows, columns=["ta", "tb", "perm", "tp",
                                           "nu", "tobs"])

    bucketed = _with_bucket(per_user_type, "user", n_buckets)
    parts = grouped_agg(
        bucketed.groupby("_bucket").map_groups(
            per_bucket, batch_format="pandas"),
        ["ta", "tb", "perm"],
        [("tp", "sum"), ("nu", "sum"), ("tobs", "sum")],
        final="driver").to_pandas()

    cols = ("type_a", "type_b", "n_users", "t_obs_cents",
            "n_as_extreme", "p_value", "bh_reject")
    if len(parts) == 0:
        return pa.table({c: pa.array(
            [], pa.string() if c.startswith("type") else
            pa.bool_() if c == "bh_reject" else
            pa.float64() if c == "p_value" else pa.int64())
            for c in cols})
    recs = []
    for (ta, tb), sub in parts.groupby(["ta", "tb"], sort=True):
        tobs = int(sub["tobs_sum"].iloc[0])
        nu = int(sub["nu_sum"].iloc[0])
        tp = sub["tp_sum"].astype("int64").to_numpy()
        ne = int((np.abs(tp) >= abs(tobs)).sum())
        recs.append([ta, tb, nu, tobs, ne])
    m = len(recs)
    order = sorted(range(m), key=lambda i: (recs[i][4], recs[i][0],
                                            recs[i][1]))
    r_star, ne_star = 0, None
    for r, i in enumerate(order, start=1):
        if (recs[i][4] + 1) * 1000 * m <= r * 65 * q_millis:
            r_star, ne_star = r, recs[i][4]
    return pa.table({
        "type_a": pa.array([r[0] for r in recs], pa.string()),
        "type_b": pa.array([r[1] for r in recs], pa.string()),
        "n_users": pa.array([r[2] for r in recs], pa.int64()),
        "t_obs_cents": pa.array([r[3] for r in recs], pa.int64()),
        "n_as_extreme": pa.array([r[4] for r in recs], pa.int64()),
        "p_value": pa.array([(r[4] + 1) / 65.0 for r in recs],
                            pa.float64()),
        "bh_reject": pa.array(
            [ne_star is not None and r[4] <= ne_star for r in recs],
            pa.bool_()),
    })


def pairwise_permutation_bh_sql(user_col: str = "user_id",
                                type_col: str = "event_type",
                                value_col: str = "value",
                                q_millis: int = 50,
                                table: str = "events") -> str:
    return f"""
WITH ut AS (
  SELECT {user_col} AS u, {type_col} AS ty,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {type_col} IS NOT NULL
    AND {value_col} IS NOT NULL
  GROUP BY 1, 2
), types AS (SELECT DISTINCT ty FROM ut),
pairs AS (
  SELECT a.ty AS ta, b.ty AS tb
  FROM types a JOIN types b ON a.ty < b.ty
), peru AS (
  SELECT p.ta, p.tb, ut.u,
    SUM(CASE WHEN ut.ty = p.ta THEN ut.c ELSE -ut.c END) AS d
  FROM pairs p JOIN ut ON ut.ty IN (p.ta, p.tb)
  GROUP BY 1, 2, 3
), perms AS (
  SELECT ta, tb, pp.p,
    CAST(sum((1 - 2 * CAST((md5_number_upper(
      'pt2:' || ta || ':' || tb || ':'
      || CAST(CAST(u AS BIGINT) AS VARCHAR)) >> pp.p)
      & 1 AS BIGINT)) * d) AS BIGINT) AS tp
  FROM peru CROSS JOIN generate_series(0, 63) AS pp(p)
  GROUP BY 1, 2, 3
), obs AS (
  SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_users,
    CAST(sum(d) AS BIGINT) AS t_obs
  FROM peru GROUP BY 1, 2
), ext AS (
  SELECT o.ta, o.tb, o.n_users, o.t_obs,
    (SELECT CAST(count(*) AS BIGINT) FROM perms pr
     WHERE pr.ta = o.ta AND pr.tb = o.tb
       AND abs(pr.tp) >= abs(o.t_obs)) AS ne
  FROM obs o
), mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ext),
ranked AS (
  SELECT e.*, row_number() OVER (ORDER BY e.ne, e.ta, e.tb) AS rn,
    (SELECT m FROM mm) AS m
  FROM ext e
), rstar AS (
  SELECT max(rn) AS r FROM ranked
  WHERE (ne + 1) * 1000 * m <= rn * 65 * {q_millis}
)
SELECT ta AS type_a, tb AS type_b, n_users,
  t_obs AS t_obs_cents, ne AS n_as_extreme,
  (CAST(ne AS DOUBLE) + 1) / 65.0 AS p_value,
  COALESCE(ne <= (SELECT ne FROM ranked
                  WHERE rn = (SELECT r FROM rstar)), FALSE)
    AS bh_reject
FROM ranked ORDER BY ta, tb
""".strip()


# ------------------------------------------- difference-in-differences

def did_estimate(ds, split_date: str = "2024-01-16",
                 user_col: str = "user_id", ts_col: str = "ts",
                 value_col: str = "value") -> pa.Table:
    """Difference-in-differences over the deterministic ``user_id %
    2`` variant split and a pre/post date split — the 2×2 causal
    readout beside CUPED: ``DiD = (ȳ_treat,post − ȳ_treat,pre) −
    (ȳ_ctrl,post − ȳ_ctrl,pre)`` where each cell mean averages
    PER-USER cents totals (a user enters a cell iff they have ≥1 row
    in that period).

    Exact-integer contract: per-(user, period) cents totals merge
    distributed; cell sums and user counts are exact ints; the four
    means and the DiD are ONE shared float tree (each mean a single
    division, then the two subtractions — mirrored exactly). NULL
    user/ts/value rows excluded. Output: one row per cell
    (variant, period, n_users, sum_cents, mean_cents) plus the
    summary columns (did) replicated — flat 4-row table sorted by
    (variant, period).
    """
    import datetime as _dt

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    split_us = int(_dt.datetime.fromisoformat(split_date)
                   .replace(tzinfo=_dt.timezone.utc).timestamp()
                   * 1_000_000)

    def per_up(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[user_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        prep = pa.table({
            "user": pc.cast(t[user_col], pa.int64()),
            "period": pc.cast(pc.greater_equal(us, split_us),
                              pa.int64()),
            "c": _cents(t[value_col]),
        })
        out = prep.group_by(["user", "period"]).aggregate([("c",
                                                            "sum")])
        return out.rename_columns(["user", "period", "c"])

    per_user_period = grouped_agg(
        ds.map_batches(skip_empty(per_up), batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["user", "period"], aggs=[("c", "sum")], final="ray")

    def cells(t: pa.Table) -> pa.Table:
        u = t["user"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["period"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = u % 2
        rows = {"variant": [], "period": [], "n": [], "s": []}
        for vv in (0, 1):
            for pp in (0, 1):
                m = (v == vv) & (p == pp)
                rows["variant"].append(vv)
                rows["period"].append(pp)
                rows["n"].append(int(m.sum()))
                rows["s"].append(int(c[m].sum()))
        return pa.table({k: pa.array(rows[k], pa.int64())
                         for k in rows})

    parts = [t for t in per_user_period.map_batches(
        skip_empty(cells), batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_size=None,
                                           batch_format="pyarrow")]
    agg = {(v, p): {"n": 0, "s": 0} for v in (0, 1) for p in (0, 1)}
    for t in parts:
        for r in t.to_pylist():
            a = agg[(r["variant"], r["period"])]
            a["n"] += r["n"]
            a["s"] += r["s"]

    def mean(v, p):
        a = agg[(v, p)]
        return (float(a["s"]) / float(a["n"])) if a["n"] else None

    m00, m01 = mean(0, 0), mean(0, 1)
    m10, m11 = mean(1, 0), mean(1, 1)
    did = ((m11 - m10) - (m01 - m00)
           if None not in (m00, m01, m10, m11) else None)
    out = {"variant": [], "period": [], "n_users": [],
           "sum_cents": [], "mean_cents": [], "did": []}
    for v in (0, 1):
        for p in (0, 1):
            a = agg[(v, p)]
            out["variant"].append(v)
            out["period"].append(p)
            out["n_users"].append(a["n"])
            out["sum_cents"].append(a["s"])
            out["mean_cents"].append(mean(v, p))
            out["did"].append(did)
    return pa.table({
        "variant": pa.array(out["variant"], pa.int64()),
        "period": pa.array(out["period"], pa.int64()),
        "n_users": pa.array(out["n_users"], pa.int64()),
        "sum_cents": pa.array(out["sum_cents"], pa.int64()),
        "mean_cents": pa.array(out["mean_cents"], pa.float64()),
        "did": pa.array(out["did"], pa.float64()),
    })


def did_estimate_sql(split_date: str = "2024-01-16",
                     user_col: str = "user_id", ts_col: str = "ts",
                     value_col: str = "value",
                     table: str = "events") -> str:
    return f"""
WITH up AS (
  SELECT {user_col} AS u,
    CASE WHEN {ts_col} >= TIMESTAMP '{split_date}'
      THEN 1 ELSE 0 END AS period,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
  GROUP BY 1, 2
), cells AS (
  SELECT u % 2 AS variant, period,
    CAST(count(*) AS BIGINT) AS n_users,
    CAST(sum(c) AS BIGINT) AS sum_cents
  FROM up GROUP BY 1, 2
), grid AS (
  SELECT v.v AS variant, p.p AS period,
    COALESCE(c.n_users, 0) AS n_users,
    COALESCE(c.sum_cents, 0) AS sum_cents
  FROM (VALUES (0), (1)) v(v)
  CROSS JOIN (VALUES (0), (1)) p(p)
  LEFT JOIN cells c ON c.variant = v.v AND c.period = p.p
), means AS (
  SELECT variant, period, n_users, sum_cents,
    CASE WHEN n_users > 0 THEN
      CAST(sum_cents AS DOUBLE) / CAST(n_users AS DOUBLE)
    END AS mean_cents
  FROM grid
), d AS (
  SELECT
    (max(CASE WHEN variant = 1 AND period = 1 THEN mean_cents END)
     - max(CASE WHEN variant = 1 AND period = 0 THEN mean_cents END))
    - (max(CASE WHEN variant = 0 AND period = 1 THEN mean_cents END)
       - max(CASE WHEN variant = 0 AND period = 0
             THEN mean_cents END)) AS did,
    CAST(sum(CASE WHEN n_users = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_empty
  FROM means
)
SELECT m.variant, m.period, m.n_users, m.sum_cents, m.mean_cents,
  CASE WHEN d.n_empty = 0 THEN d.did END AS did
FROM means m, d ORDER BY m.variant, m.period
""".strip()


# ------------------------------------------- Hodges-Lehmann

def hodges_lehmann(ds, group_col: str = "event_type",
                   ts_col: str = "ts",
                   value_col: str = "value") -> pa.Table:
    """One-sample Hodges–Lehmann location estimate of the daily cents
    series per group (Hodges & Lehmann 1963) — the median of all
    Walsh averages ``(c_i + c_j)/2, i ≤ j``: the robust location
    sibling of the trimmed mean with the efficiency of the Wilcoxon
    test.

    Determinism contract: work on DOUBLED values — Walsh SUMS
    ``S = c_i + c_j`` are exact ints; with M = n(n+1)/2 pairs the
    picks are ORDER STATISTICS ``lo = ceil(M/2)``-th and
    ``hi = floor(M/2)+1``-th smallest S (equal when M is odd), and
    the estimate is the uniform float tree ``(S_lo + S_hi) / 4.0`` —
    values that exist in the sum multiset, so comparisons are exact.
    NULL group/ts/value rows excluded. Output: (group, n_days,
    n_pairs, hl2_lo, hl2_hi, hl) sorted by group; the O(days²) pair
    scan runs on the bounded daily table (calendar-bounded).
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[group_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        return pa.table({"g": t[group_col],
                         "_day": _epoch_day(t[ts_col]),
                         "cents": _cents(t[value_col])})

    daily = grouped_agg(
        ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["g", "_day"], [("cents", "sum")], final="driver").to_pandas()

    out = {"g": [], "n": [], "m": [], "lo": [], "hi": [], "hl": []}
    for g, sub in daily.groupby("g", sort=True):
        c = sub["cents_sum"].to_numpy(dtype=np.int64)
        n = len(c)
        iu = np.triu_indices(n)
        sums = np.sort(c[iu[0]] + c[iu[1]])
        m = len(sums)
        lo = int(sums[(m + 1) // 2 - 1])
        hi = int(sums[m // 2])
        out["g"].append(g)
        out["n"].append(n)
        out["m"].append(m)
        out["lo"].append(lo)
        out["hi"].append(hi)
        out["hl"].append((lo + hi) / 4.0)
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "n_days": pa.array(out["n"], pa.int64()),
        "n_pairs": pa.array(out["m"], pa.int64()),
        "hl2_lo": pa.array(out["lo"], pa.int64()),
        "hl2_hi": pa.array(out["hi"], pa.int64()),
        "hl": pa.array(out["hl"], pa.float64()),
    })


def hodges_lehmann_sql(group_col: str = "event_type",
                       ts_col: str = "ts", value_col: str = "value",
                       table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
  GROUP BY 1, 2
), d AS (
  SELECT g, row_number() OVER (PARTITION BY g ORDER BY day) AS i, c
  FROM daily
), walsh AS (
  SELECT a.g, a.c + b.c AS s
  FROM d a JOIN d b ON b.g = a.g AND b.i >= a.i
), ranked AS (
  SELECT g, s, row_number() OVER (PARTITION BY g ORDER BY s) AS rn,
    count(*) OVER (PARTITION BY g) AS m
  FROM walsh
), agg AS (
  SELECT g, max(m) AS m,
    max(CASE WHEN rn = (m + 1) // 2 THEN s END) AS lo,
    max(CASE WHEN rn = m // 2 + 1 THEN s END) AS hi
  FROM ranked GROUP BY g
), nn AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_days FROM d GROUP BY g
)
SELECT a.g AS {group_col}, nn.n_days, CAST(a.m AS BIGINT) AS n_pairs,
  CAST(a.lo AS BIGINT) AS hl2_lo, CAST(a.hi AS BIGINT) AS hl2_hi,
  (CAST(a.lo AS DOUBLE) + CAST(a.hi AS DOUBLE)) / 4.0 AS hl
FROM agg a JOIN nn USING (g) ORDER BY a.g
""".strip()


# ------------------------------------------- capture-recapture

def capture_recapture(ds, user_col: str = "user_id",
                      ts_col: str = "ts") -> pa.Table:
    """Chapman capture–recapture estimate of the underlying user
    population from two consecutive calendar weeks of activity
    (Chapman 1951) — the data-quality/coverage primitive: ``N̂ =
    (n1+1)(n2+1)/(m+1) − 1`` where n1/n2 are the distinct users seen
    in each week and m the users seen in both.

    Weeks are epoch-anchored (``week = epoch_day // 7``); week 1 is
    the EARLIEST week with data, week 2 the next calendar week (zero
    users if silent). Counts are exact ints merged distributed (per-
    user presence flags via max — the corpus never gathers); N̂ is
    the float tree ``float((n1+1)·(n2+1)) / float(m+1) − 1.0``. NULL
    user/ts rows excluded. Output: one row (week1, n1, n2, m,
    n_chapman).
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def wk_min(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[user_col]), pc.is_valid(t[ts_col]))
        t = t.filter(keep)
        # epoch days are non-negative here, so truncate == floor;
        # mirrored by SQL `// 7`
        wk = pc.divide(_epoch_day(t[ts_col]), 7)
        return pa.table({"wk": pa.array(
            [pc.min(wk).as_py()], pa.int64())})

    mins = [r["wk"] for t in ds.map_batches(
        skip_empty(wk_min), batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_size=None,
                                           batch_format="pyarrow")
        for r in t.to_pylist() if r["wk"] is not None]
    if not mins:
        return pa.table({
            "week1": pa.array([None], pa.int64()),
            "n1": pa.array([0], pa.int64()),
            "n2": pa.array([0], pa.int64()),
            "m": pa.array([0], pa.int64()),
            "n_chapman": pa.array([None], pa.float64()),
        })
    w1 = int(min(mins))

    def flags(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[user_col]), pc.is_valid(t[ts_col]))
        t = t.filter(keep)
        wk = pc.divide(_epoch_day(t[ts_col]), 7)
        prep = pa.table({
            "user": pc.cast(t[user_col], pa.int64()),
            "in1": pc.cast(pc.equal(wk, w1), pa.int64()),
            "in2": pc.cast(pc.equal(wk, w1 + 1), pa.int64()),
        })
        out = prep.group_by(["user"]).aggregate([("in1", "max"),
                                                 ("in2", "max")])
        return out.rename_columns(["user", "in1", "in2"])

    per_user = grouped_agg(
        ds.map_batches(skip_empty(flags), batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["user"], aggs=[("in1", "max"), ("in2", "max")],
        final="ray")

    def counts(t: pa.Table) -> pa.Table:
        a = t["in1_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["in2_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n1": pa.array([int(a.sum())], pa.int64()),
            "n2": pa.array([int(b.sum())], pa.int64()),
            "m": pa.array([int((a & b).sum())], pa.int64()),
        })

    n1 = n2 = m = 0
    for t in per_user.map_batches(
            skip_empty(counts), batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_size=None,
                                               batch_format="pyarrow"):
        for r in t.to_pylist():
            n1 += r["n1"]
            n2 += r["n2"]
            m += r["m"]
    nhat = float((n1 + 1) * (n2 + 1)) / float(m + 1) - 1.0
    return pa.table({
        "week1": pa.array([w1], pa.int64()),
        "n1": pa.array([n1], pa.int64()),
        "n2": pa.array([n2], pa.int64()),
        "m": pa.array([m], pa.int64()),
        "n_chapman": pa.array([nhat], pa.float64()),
    })


def capture_recapture_sql(user_col: str = "user_id",
                          ts_col: str = "ts",
                          table: str = "events") -> str:
    return f"""
WITH base AS (
  SELECT {user_col} AS u,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) // 7
      AS wk
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
), w1 AS (SELECT min(wk) AS w1 FROM base),
flags AS (
  SELECT u,
    MAX(CASE WHEN wk = (SELECT w1 FROM w1) THEN 1 ELSE 0 END) AS in1,
    MAX(CASE WHEN wk = (SELECT w1 FROM w1) + 1 THEN 1 ELSE 0 END)
      AS in2
  FROM base GROUP BY u
), agg AS (
  SELECT CAST(COALESCE(sum(in1), 0) AS BIGINT) AS n1,
    CAST(COALESCE(sum(in2), 0) AS BIGINT) AS n2,
    CAST(COALESCE(sum(in1 * in2), 0) AS BIGINT) AS m
  FROM flags
)
SELECT (SELECT CAST(w1 AS BIGINT) FROM w1) AS week1, n1, n2, m,
  CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / CAST(m + 1 AS DOUBLE) - 1.0
    AS n_chapman
FROM agg
""".strip()


# ------------------------------------------- record days

def record_days(ds, group_col: str = "event_type", ts_col: str = "ts",
                value_col: str = "value") -> pa.Table:
    """Records-process audit of the daily cents series per group: how
    many days set a STRICT new all-time daily maximum (the first day
    always does), and when the last record fell — the
    "are we still growing?" probe (for an i.i.d. series the expected
    record count is the harmonic number H_n ≈ ln n; far more records
    means trend).

    Exact contract: records compare exact int64 daily totals against
    the strict prefix max (day-ascending). NULL group/ts/value rows
    excluded. Output: (group, n_days, n_records, last_record_day,
    max_cents) sorted by group; driver scan over the bounded daily
    table.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[group_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        return pa.table({"g": t[group_col],
                         "_day": _epoch_day(t[ts_col]),
                         "cents": _cents(t[value_col])})

    daily = grouped_agg(
        ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["g", "_day"], [("cents", "sum")], final="driver").to_pandas()

    out = {"g": [], "n": [], "rec": [], "last": [], "mx": []}
    for g, sub in daily.groupby("g", sort=True):
        sub = sub.sort_values("_day")
        c = sub["cents_sum"].to_numpy(dtype=np.int64)
        days = sub["_day"].to_numpy(dtype=np.int64)
        runmax = np.maximum.accumulate(c)
        is_rec = np.empty(len(c), dtype=bool)
        is_rec[0] = True
        is_rec[1:] = c[1:] > runmax[:-1]
        out["g"].append(g)
        out["n"].append(len(c))
        out["rec"].append(int(is_rec.sum()))
        out["last"].append(int(days[is_rec][-1]))
        out["mx"].append(int(c.max()))
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "n_days": pa.array(out["n"], pa.int64()),
        "n_records": pa.array(out["rec"], pa.int64()),
        "last_record_day": pa.array(out["last"], pa.int64()),
        "max_cents": pa.array(out["mx"], pa.int64()),
    })


def record_days_sql(group_col: str = "event_type", ts_col: str = "ts",
                    value_col: str = "value",
                    table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
  GROUP BY 1, 2
), w AS (
  SELECT g, day, c,
    max(c) OVER (PARTITION BY g ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
  FROM daily
), rec AS (
  SELECT g, day, c,
    (prevmax IS NULL OR c > prevmax) AS is_rec
  FROM w
)
SELECT g AS {group_col}, CAST(count(*) AS BIGINT) AS n_days,
  CAST(sum(CASE WHEN is_rec THEN 1 ELSE 0 END) AS BIGINT)
    AS n_records,
  CAST(max(CASE WHEN is_rec THEN day END) AS BIGINT)
    AS last_record_day,
  CAST(max(c) AS BIGINT) AS max_cents
FROM rec GROUP BY g ORDER BY g
""".strip()


# ------------------------------------------- Kendall's W

def kendalls_w(ds, judge_col: str = "ts", item_col: str = "event_type",
               value_col: str = "value") -> pa.Table:
    """Kendall's coefficient of concordance W (Kendall & Babington
    Smith 1939) over repeated weekly rankings: each epoch WEEK ranks
    the event types by total cents — W ∈ [0,1] answers "is the type
    leaderboard stable across weeks?" (1 = identical rankings).

    Determinism contract: the (week × type) grid is COMPLETE — a type
    silent in a week ranks with total 0 (contract); ranks are DOUBLED
    midranks (ties stay integral); with m weeks, n types, doubled rank
    sums R2_i and per-week tie terms ``T_w = Σ(t³−t)``,
    ``W = 3·Σ(R2_i − m(n+1))² / (m²(n³−n) − m·ΣT_w)`` — numerator and
    denominator are exact python ints, W is ONE float division (NULL
    when the denominator is 0, e.g. all values tied everywhere).
    NULL item/judge/value rows excluded. Output: one row (n_weeks,
    n_items, w_num, w_den, kendalls_w).
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[item_col]),
                               pc.is_valid(t[judge_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        wk = pc.divide(_epoch_day(t[judge_col]), 7)
        return pa.table({"wk": wk, "it": t[item_col],
                         "cents": _cents(t[value_col])})

    cells = grouped_agg(
        ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["wk", "it"], [("cents", "sum")], final="driver").to_pandas()
    if len(cells) == 0:
        return pa.table({
            "n_weeks": pa.array([0], pa.int64()),
            "n_items": pa.array([0], pa.int64()),
            "w_num": pa.array([None], pa.int64()),
            "w_den": pa.array([None], pa.int64()),
            "kendalls_w": pa.array([None], pa.float64()),
        })
    grid = (cells.pivot_table(index="it", columns="wk",
                              values="cents_sum", aggfunc="sum")
            .fillna(0).astype("int64").sort_index())
    n, m = grid.shape
    r2_sums = np.zeros(n, dtype=object)
    t_sum = 0
    for w in grid.columns:
        c = grid[w].to_numpy()
        order = np.argsort(c, kind="mergesort")
        # doubled midranks ascending: 2*rank with ties averaged
        r2 = np.empty(n, dtype=np.int64)
        i = 0
        while i < n:
            j = i
            while j + 1 < n and c[order[j + 1]] == c[order[i]]:
                j += 1
            # positions i..j (0-based) share doubled midrank (i+j+2)
            r2[order[i:j + 1]] = i + j + 2
            t = j - i + 1
            if t > 1:
                t_sum += t * t * t - t
            i = j + 1
        r2_sums = r2_sums + r2
    mean2 = m * (n + 1)
    s2 = sum(int(x - mean2) ** 2 for x in r2_sums)
    den = m * m * (n ** 3 - n) - m * t_sum
    num = 3 * s2
    if max(abs(num), abs(den)) >= 2 ** 63:
        raise ValueError("kendalls_w: statistic exceeds int64 — "
                         "reduce the item space upstream")
    w_val = float(num) / float(den) if den != 0 else None
    return pa.table({
        "n_weeks": pa.array([m], pa.int64()),
        "n_items": pa.array([n], pa.int64()),
        "w_num": pa.array([num], pa.int64()),
        "w_den": pa.array([den], pa.int64()),
        "kendalls_w": pa.array([w_val], pa.float64()),
    })


def kendalls_w_sql(judge_col: str = "ts", item_col: str = "event_type",
                   value_col: str = "value",
                   table: str = "events") -> str:
    return f"""
WITH base AS (
  SELECT CAST(CAST({judge_col} AS DATE) - DATE '1970-01-01' AS BIGINT)
      // 7 AS wk,
    {item_col} AS it,
    CAST(round({value_col} * 100.0) AS BIGINT) AS c
  FROM {table}
  WHERE {item_col} IS NOT NULL AND {judge_col} IS NOT NULL
    AND {value_col} IS NOT NULL
), cells AS (
  SELECT wk, it, CAST(sum(c) AS BIGINT) AS c
  FROM base GROUP BY wk, it
), weeks AS (SELECT DISTINCT wk FROM cells),
items AS (SELECT DISTINCT it FROM cells),
grid AS (
  SELECT w.wk, i.it, COALESCE(c.c, 0) AS c
  FROM weeks w CROSS JOIN items i
  LEFT JOIN cells c ON c.wk = w.wk AND c.it = i.it
), ranked AS (
  SELECT wk, it, c,
    CAST(rank() OVER (PARTITION BY wk ORDER BY c) AS BIGINT) AS rlo,
    CAST(count(*) OVER (PARTITION BY wk, c) AS BIGINT) AS t
  FROM grid
), r2 AS (
  -- doubled midrank = rlo + (rlo + t - 1) = 2*rlo + t - 1
  SELECT it, CAST(sum(2 * rlo + t - 1) AS BIGINT) AS r2
  FROM ranked GROUP BY it
), ties AS (
  SELECT CAST(COALESCE(sum(CASE WHEN rn = 1 AND t > 1
      THEN t * t * t - t ELSE 0 END), 0) AS BIGINT) AS t_sum
  FROM (SELECT t, row_number() OVER (PARTITION BY wk, c) AS rn
        FROM ranked)
), dims AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM weeks) AS m,
    (SELECT CAST(count(*) AS BIGINT) FROM items) AS n
), agg AS (
  SELECT d.m, d.n,
    CAST(3 * sum(CAST(r2.r2 - d.m * (d.n + 1) AS HUGEINT)
                 * (r2.r2 - d.m * (d.n + 1))) AS BIGINT) AS num,
    CAST(d.m * d.m * (CAST(d.n AS HUGEINT) * d.n * d.n - d.n)
         - d.m * (SELECT t_sum FROM ties) AS BIGINT) AS den
  FROM r2, dims d GROUP BY d.m, d.n
)
SELECT m AS n_weeks, n AS n_items, num AS w_num, den AS w_den,
  CASE WHEN den != 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
  END AS kendalls_w
FROM agg
""".strip()


# ------------------------------------------- hash collision audit

def hash_collision_audit(ds, key_col: str = "user_id",
                         bits: int = 20) -> pa.Table:
    """Surrogate-key collision audit: map every distinct key through
    the truncated hash ``md5_u64('sk:' || key) % 2^bits`` and count
    collisions — the birthday-bound check a pipeline runs before
    committing to a b-bit shard/surrogate key (expected collisions ≈
    k²/2^{bits+1}).

    Exact counts, fully distributed: distinct keys merge via
    ``final='ray'``; hashed buckets group via a second distributed
    exchange; the block partials (groups, collided groups, excess
    keys) are scalar sums. Output: one row (n_keys, n_slots_used,
    n_colliding_slots, n_excess_keys, slot_bits).
    """
    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    mod = 1 << bits

    def dk(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[key_col]))
        out = pa.table({"k": pc.cast(t[key_col], pa.int64())}) \
            .group_by(["k"]).aggregate([([], "count_all")])
        return out.rename_columns(["k", "one"])

    distinct = grouped_agg(
        ds.map_batches(skip_empty(dk), batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["k"], aggs=[("one", "sum")], final="ray")

    def hashed(t: pa.Table) -> pa.Table:
        ks = t["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.fromiter((md5_u64(f"sk:{k}") % mod for k in ks),
                        dtype=np.int64, count=len(ks))
        return pa.table({"h": pa.array(h),
                         "one": pa.array(np.ones(len(ks), np.int64))})

    slots = grouped_agg(
        distinct.map_batches(skip_empty(hashed),
                             batch_format="pyarrow",
                             zero_copy_batch=True),
        keys=["h"], aggs=[("one", "sum")], final="ray")

    def partials(t: pa.Table) -> pa.Table:
        c = t["one_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n_keys": pa.array([int(c.sum())], pa.int64()),
            "n_slots": pa.array([len(c)], pa.int64()),
            "n_coll": pa.array([int((c > 1).sum())], pa.int64()),
            "n_excess": pa.array([int((c[c > 1] - 1).sum())],
                                 pa.int64()),
        })

    tot = {"n_keys": 0, "n_slots": 0, "n_coll": 0, "n_excess": 0}
    for t in slots.map_batches(
            skip_empty(partials), batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_size=None,
                                               batch_format="pyarrow"):
        for r in t.to_pylist():
            for k in tot:
                tot[k] += r[k]
    return pa.table({
        "n_keys": pa.array([tot["n_keys"]], pa.int64()),
        "n_slots_used": pa.array([tot["n_slots"]], pa.int64()),
        "n_colliding_slots": pa.array([tot["n_coll"]], pa.int64()),
        "n_excess_keys": pa.array([tot["n_excess"]], pa.int64()),
        "slot_bits": pa.array([bits], pa.int64()),
    })


def hash_collision_audit_sql(key_col: str = "user_id",
                             bits: int = 20,
                             table: str = "events") -> str:
    mod = 1 << bits
    return f"""
WITH dk AS (
  SELECT DISTINCT {key_col} AS k FROM {table}
  WHERE {key_col} IS NOT NULL
), slots AS (
  SELECT CAST(md5_number_upper('sk:'
      || CAST(CAST(k AS BIGINT) AS VARCHAR)) % {mod} AS BIGINT) AS h,
    count(*) AS c
  FROM dk GROUP BY 1
)
SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS n_keys,
  CAST(count(*) AS BIGINT) AS n_slots_used,
  CAST(COALESCE(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS n_colliding_slots,
  CAST(COALESCE(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END), 0)
    AS BIGINT) AS n_excess_keys,
  CAST({bits} AS BIGINT) AS slot_bits
FROM slots
""".strip()


# ------------------------------------------- LIS / LDS

def daily_lis(ds, group_col: str = "event_type", ts_col: str = "ts",
              value_col: str = "value") -> pa.Table:
    """Longest strictly increasing and strictly decreasing
    subsequences of the daily cents series per group — the
    combinatorial trend-persistence probe (a monotone regime shows as
    LIS ≈ n; for an i.i.d. series both run ≈ 2√n, Erdős–Szekeres):
    unlike run/streak stats these see NON-CONTIGUOUS monotone
    structure.

    Exact contract: strict comparisons on exact int64 daily totals,
    day-ascending positional order. Engine side is patience sorting
    (O(n log n)) on the bounded daily table; the mirror walks the same
    DAG with a UNION-deduplicated recursive CTE (state ≤ n² rows per
    group — calendar-bounded). NULL group/ts/value rows excluded.
    Output: (group, n_days, lis, lds) sorted by group.
    """
    import bisect

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[group_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        return pa.table({"g": t[group_col],
                         "_day": _epoch_day(t[ts_col]),
                         "cents": _cents(t[value_col])})

    daily = grouped_agg(
        ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["g", "_day"], [("cents", "sum")], final="driver").to_pandas()

    def lis_len(seq):
        tails = []
        for x in seq:
            i = bisect.bisect_left(tails, x)   # strict increase
            if i == len(tails):
                tails.append(x)
            else:
                tails[i] = x
        return len(tails)

    out = {"g": [], "n": [], "lis": [], "lds": []}
    for g, sub in daily.groupby("g", sort=True):
        c = [int(v) for v in
             sub.sort_values("_day")["cents_sum"].to_numpy()]
        out["g"].append(g)
        out["n"].append(len(c))
        out["lis"].append(lis_len(c))
        out["lds"].append(lis_len([-x for x in c]))
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "n_days": pa.array(out["n"], pa.int64()),
        "lis": pa.array(out["lis"], pa.int64()),
        "lds": pa.array(out["lds"], pa.int64()),
    })


def daily_lis_sql(group_col: str = "event_type", ts_col: str = "ts",
                  value_col: str = "value",
                  table: str = "events") -> str:
    return f"""
WITH RECURSIVE daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
  GROUP BY 1, 2
), d AS (
  SELECT g, row_number() OVER (PARTITION BY g ORDER BY day) AS i, c
  FROM daily
), up(g, i, len) AS (
  SELECT g, i, 1 FROM d
  UNION
  SELECT b.g, b.i, u.len + 1
  FROM up u JOIN d a ON a.g = u.g AND a.i = u.i
  JOIN d b ON b.g = a.g AND b.i > a.i AND b.c > a.c
), dn(g, i, len) AS (
  SELECT g, i, 1 FROM d
  UNION
  SELECT b.g, b.i, u.len + 1
  FROM dn u JOIN d a ON a.g = u.g AND a.i = u.i
  JOIN d b ON b.g = a.g AND b.i > a.i AND b.c < a.c
), nn AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_days FROM d GROUP BY g
)
SELECT nn.g AS {group_col}, nn.n_days,
  (SELECT CAST(max(len) AS BIGINT) FROM up WHERE up.g = nn.g) AS lis,
  (SELECT CAST(max(len) AS BIGINT) FROM dn WHERE dn.g = nn.g) AS lds
FROM nn ORDER BY nn.g
""".strip()


# ------------------------------------------- Rousseeuw-Croux Sn

def sn_scale(ds, group_col: str = "event_type", ts_col: str = "ts",
             value_col: str = "value") -> pa.Table:
    """Rousseeuw–Croux Sn robust scale of the daily cents series per
    group (Rousseeuw & Croux 1993) — the 50%-breakdown scale estimator
    that, unlike MAD, needs no location estimate and keeps 58%
    Gaussian efficiency: ``Sn* = lomed_i himed_{j≠i} |x_i − x_j|``.

    Exact contract: the nested medians are ORDER-STATISTIC PICKS on
    exact int64 daily totals — ``himed`` is the ``(⌊n/2⌋+1)``-th
    smallest of row i's n−1 absolute differences, ``lomed`` the
    ``⌊(n+1)/2⌋``-th smallest of those n picks — values that EXIST in
    the difference multiset, so both engines pick identical integers
    (the 1.1926 consistency constant is left OFF — contract; apply it
    downstream). Groups need n ≥ 2. NULL group/ts/value rows excluded.
    O(n²) on the calendar-bounded daily table. Output:
    (group, n_days, sn_cents) sorted by group.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[group_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        return pa.table({"g": t[group_col],
                         "_day": _epoch_day(t[ts_col]),
                         "cents": _cents(t[value_col])})

    daily = grouped_agg(
        ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["g", "_day"], [("cents", "sum")], final="driver").to_pandas()

    out = {"g": [], "n": [], "sn": []}
    for g, sub in daily.groupby("g", sort=True):
        c = sub["cents_sum"].to_numpy(dtype=np.int64)
        n = len(c)
        if n < 2:
            continue
        k_hi = n // 2 + 1                   # himed rank among n-1
        if k_hi > n - 1:
            # n == 2: the himed rank doesn't exist among 1 diff — the
            # mirror's rank pick comes back NULL; match it
            out["g"].append(g)
            out["n"].append(n)
            out["sn"].append(None)
            continue
        diffs = np.abs(c[:, None] - c[None, :])
        picks = []
        for i in range(n):
            row = np.delete(diffs[i], i)
            picks.append(int(np.partition(row, k_hi - 1)[k_hi - 1]))
        k_lo = (n + 1) // 2
        sn = int(np.partition(np.asarray(picks), k_lo - 1)[k_lo - 1])
        out["g"].append(g)
        out["n"].append(n)
        out["sn"].append(sn)
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "n_days": pa.array(out["n"], pa.int64()),
        "sn_cents": pa.array(out["sn"], pa.int64()),
    })


def sn_scale_sql(group_col: str = "event_type", ts_col: str = "ts",
                 value_col: str = "value",
                 table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
  GROUP BY 1, 2
), d AS (
  SELECT g, row_number() OVER (PARTITION BY g ORDER BY day) AS i, c,
    count(*) OVER (PARTITION BY g) AS n
  FROM daily
), diffs AS (
  SELECT a.g, a.i, a.n, abs(a.c - b.c) AS ad
  FROM d a JOIN d b ON b.g = a.g AND b.i != a.i
), hi AS (
  SELECT g, i, max(n) AS n,
    max(CASE WHEN rn = max_rank THEN ad END) AS himed
  FROM (SELECT *, row_number() OVER (PARTITION BY g, i ORDER BY ad)
          AS rn, n // 2 + 1 AS max_rank
        FROM diffs)
  GROUP BY g, i
), lo AS (
  SELECT g, max(n) AS n,
    max(CASE WHEN rn = (n + 1) // 2 THEN himed END) AS sn
  FROM (SELECT *, row_number() OVER (PARTITION BY g ORDER BY himed, i)
          AS rn FROM hi)
  GROUP BY g
)
SELECT g AS {group_col}, CAST(n AS BIGINT) AS n_days,
  CAST(sn AS BIGINT) AS sn_cents
FROM lo WHERE n >= 2 ORDER BY g
""".strip()


# ------------------------------------------- burstiness

def burstiness(ds, group_col: str = "event_type",
               user_col: str = "user_id", ts_col: str = "ts",
               n_buckets: int = 64) -> pa.Table:
    """Goh–Barabási burstiness of inter-event times per event type
    (Goh & Barabási 2008): ``B = (σ − μ)/(σ + μ)`` over the pooled
    WITHIN-USER gap seconds — B → −1 for clockwork streams, 0 for
    Poisson, → +1 for extreme bursts. Gaps are computed inside each
    user's per-type stream (cross-user gaps are meaningless), pooled
    per type.

    Exact contract: gaps are exact integer seconds (µs floor-div;
    (ts, event_id) tie order); the pooled moments (n, Σd, Σd² split
    hi/lo) merge as exact ints; μ, the population variance
    ``(n·SS − S²)/(n·n)`` and B are ONE shared float tree (B NULL
    when σ + μ = 0). NULL user/ts rows excluded; users contribute
    gaps only from their 2nd event per type on.

    Shape: ONE user-bucket exchange; per bucket the lag/diff is a
    segmented pandas kernel over all (user, type) streams at once;
    per-type moment partials merge on the driver (|types|·buckets
    rows). Output: (group, n_gaps, sum_gap_s, mu, sigma, burstiness)
    sorted by group.
    """
    import math

    import pandas as pd

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.assembly import _with_bucket

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[user_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[group_col]))
        t = t.filter(keep)
        return pa.table({
            user_col: t[user_col],
            "g": t[group_col],
            "_s": pc.divide(
                t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
                1_000_000),
            "_id": t["event_id"],
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "g", "_s", "_id"],
                          kind="mergesort")
        gap = g.groupby([user_col, "g"], sort=False)["_s"].diff()
        ok = gap.notna()
        d = gap[ok].astype("int64")
        ty = g["g"][ok]
        agg = pd.DataFrame({"ty": ty, "d": d})
        if agg.empty:
            # typed empty: dtype-stable partials for the driver merge
            return pd.DataFrame({
                "g": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="int64"),
                "ss_hi": pd.Series([], dtype="int64"),
                "ss_lo": pd.Series([], dtype="int64"),
            })
        # gap ≤ corpus span in seconds, so d² fits int64 comfortably;
        # only the SUM of squares needs the hi/lo split
        sq = agg["d"].to_numpy(dtype=np.int64) ** 2
        agg["ss_hi"] = sq // _SS_SPLIT
        agg["ss_lo"] = sq % _SS_SPLIT
        out = (agg.groupby("ty", as_index=False)
               .agg(n=("d", "size"), s=("d", "sum"),
                    ss_hi=("ss_hi", "sum"), ss_lo=("ss_lo", "sum")))
        return out.rename(columns={"ty": "g"})

    cols = ds.select_columns([user_col, group_col, ts_col, "event_id"])
    bucketed = _with_bucket(
        cols.map_batches(skip_empty(prep), batch_format="pyarrow",
                         zero_copy_batch=True),
        user_col, n_buckets)
    parts = grouped_agg(
        bucketed.groupby("_bucket").map_groups(
            per_bucket, batch_format="pandas"),
        ["g"], [("n", "sum"), ("s", "sum"), ("ss_hi", "sum"),
                ("ss_lo", "sum")], final="driver").to_pandas()

    out = {"g": [], "n": [], "s": [], "mu": [], "sig": [], "b": []}
    for _, r in parts.sort_values("g").iterrows():
        n = int(r["n_sum"])
        s = int(r["s_sum"])
        ss = int(r["ss_hi_sum"]) * _SS_SPLIT + int(r["ss_lo_sum"])
        if ss >= 2 ** 63 or abs(s) >= 2 ** 53:
            raise ValueError("burstiness: moment exceeds the exactly-"
                             "convertible range — rescale upstream")
        # E[d²] − μ² with every int→double under 2^63: the
        # (n·SS − S²)/n² form's numerator tops 2^64 around sf0.2,
        # where DuckDB's hugeint→double cast double-rounds (NOTES
        # gotcha). Clamp: the subtraction can go −ε at σ≈0 and both
        # engines must take the same max-with-0 branch.
        mu = float(s) / float(n)
        var = max(float(ss) / float(n) - mu * mu, 0.0)
        sig = math.sqrt(var)
        b = (sig - mu) / (sig + mu) if sig + mu != 0 else None
        out["g"].append(r["g"])
        out["n"].append(n)
        out["s"].append(s)
        out["mu"].append(mu)
        out["sig"].append(sig)
        out["b"].append(b)
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "n_gaps": pa.array(out["n"], pa.int64()),
        "sum_gap_s": pa.array(out["s"], pa.int64()),
        "mu": pa.array(out["mu"], pa.float64()),
        "sigma": pa.array(out["sig"], pa.float64()),
        "burstiness": pa.array(out["b"], pa.float64()),
    })


def burstiness_sql(group_col: str = "event_type",
                   user_col: str = "user_id", ts_col: str = "ts",
                   table: str = "events") -> str:
    return f"""
WITH base AS (
  SELECT {user_col} AS u, {group_col} AS g,
    epoch_us({ts_col}) // 1000000 AS s, event_id
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {group_col} IS NOT NULL
), gaps AS (
  SELECT g,
    s - lag(s) OVER (PARTITION BY u, g ORDER BY s, event_id) AS d
  FROM base
), agg AS (
  SELECT g, CAST(count(d) AS BIGINT) AS n,
    CAST(sum(d) AS BIGINT) AS s,
    CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS ss
  FROM gaps WHERE d IS NOT NULL GROUP BY g
), st AS (
  SELECT g, n, s,
    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
    sqrt(GREATEST(
      CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)) AS sigma
  FROM agg
)
SELECT g AS {group_col}, n AS n_gaps, s AS sum_gap_s, mu, sigma,
  CASE WHEN sigma + mu != 0
    THEN (sigma - mu) / (sigma + mu) END AS burstiness
FROM st ORDER BY g
""".strip()


# ------------------------------------------- Hoover index

def hoover_index(ds, group_col: str = "event_type",
                 user_col: str = "user_id",
                 value_col: str = "value") -> pa.Table:
    """Hoover (Robin Hood) inequality index of per-user cents totals
    per group — "what share of total value would have to move between
    users to equalize them": ``H = Σ|x_i − μ| / (2·Σx)``. The
    redistribution-share complement of the rank-based Gini already in
    the registry.

    Exact contract: with n users and total S, ``|x_i − μ| = |n·x_i −
    S| / n``, so the deviation mass ``D = Σ|n·x_i − S|`` is an EXACT
    integer (hi/lo-split partials; python-int recombine) and
    ``H = float(D) / float(2·n·S)`` is ONE division (NULL when
    2·n·S = 0). NULL user/value rows excluded.

    Shape: distributed per-(group, user) merge, materialized once for
    its two consumers — the bounded (group, n, S) probe and the
    deviation pass (n/S broadcast via closure). Output:
    (group, n_users, total_cents, dev_mass, hoover) sorted by group.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def per_gu(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[group_col]),
                               pc.is_valid(t[user_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        prep = pa.table({"g": t[group_col],
                         "user": pc.cast(t[user_col], pa.int64()),
                         "c": _cents(t[value_col])})
        out = prep.group_by(["g", "user"]).aggregate([("c", "sum")])
        return out.rename_columns(["g", "user", "c"])

    per_gu_ds = grouped_agg(
        ds.map_batches(skip_empty(per_gu), batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["g", "user"], aggs=[("c", "sum")],
        final="ray").materialize()

    def totals(t: pa.Table) -> pa.Table:
        sub = pa.table({"g": t["g"], "c": t["c_sum"],
                        "one": pa.array(np.ones(len(t), np.int64))})
        out = sub.group_by(["g"]).aggregate([("c", "sum"),
                                             ("one", "sum")])
        return out.rename_columns(["g", "s", "n"])

    tot = grouped_agg(
        per_gu_ds.map_batches(skip_empty(totals),
                              batch_format="pyarrow",
                              zero_copy_batch=True),
        ["g"], [("s", "sum"), ("n", "sum")],
        final="driver").to_pandas()
    ns = {r["g"]: (int(r["n_sum"]), int(r["s_sum"]))
          for _, r in tot.iterrows()}

    def dev(t: pa.Table) -> pa.Table:
        gs = t["g"].to_pylist()
        x = t["c_sum"].to_numpy(zero_copy_only=False).astype(object)
        rows = {"g": [], "hi": [], "lo": []}
        import pandas as pd

        df = pd.DataFrame({"g": gs, "x": x})
        for g, sub in df.groupby("g", sort=False):
            n, s = ns[g]
            d = sum(abs(n * int(v) - s) for v in sub["x"])
            rows["g"].append(g)
            rows["hi"].append(int(d // _SS_SPLIT))
            rows["lo"].append(int(d % _SS_SPLIT))
        return pa.table({"g": pa.array(rows["g"], pa.string()),
                         "hi": pa.array(rows["hi"], pa.int64()),
                         "lo": pa.array(rows["lo"], pa.int64())})

    parts = grouped_agg(
        per_gu_ds.map_batches(skip_empty(dev), batch_format="pyarrow",
                              zero_copy_batch=True),
        ["g"], [("hi", "sum"), ("lo", "sum")],
        final="driver").to_pandas()

    out = {"g": [], "n": [], "s": [], "d": [], "h": []}
    for _, r in parts.sort_values("g").iterrows():
        g = r["g"]
        n, s = ns[g]
        d = int(r["hi_sum"]) * _SS_SPLIT + int(r["lo_sum"])
        if d >= 2 ** 63:
            raise ValueError("hoover_index: deviation mass exceeds "
                             "int64 — rescale value upstream")
        den = 2 * n * s
        out["g"].append(g)
        out["n"].append(n)
        out["s"].append(s)
        out["d"].append(d)
        # den = 2·n·s passes 2^64 at 10^12-turn scale: shared split
        # tree, never DuckDB's lossy HUGEINT→DOUBLE cast
        out["h"].append(float(d) / _split_float(den)
                        if den != 0 else None)
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "n_users": pa.array(out["n"], pa.int64()),
        "total_cents": pa.array(out["s"], pa.int64()),
        "dev_mass": pa.array(out["d"], pa.int64()),
        "hoover": pa.array(out["h"], pa.float64()),
    })


def hoover_index_sql(group_col: str = "event_type",
                     user_col: str = "user_id",
                     value_col: str = "value",
                     table: str = "events") -> str:
    return f"""
WITH u AS (
  SELECT {group_col} AS g, {user_col} AS user_id,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {user_col} IS NOT NULL
    AND {value_col} IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT)
    AS s
  FROM u GROUP BY g
), devs AS (
  SELECT u.g, CAST(sum(abs(CAST(t.n AS HUGEINT) * u.c - t.s))
    AS BIGINT) AS d
  FROM u JOIN tot t USING (g) GROUP BY u.g
)
SELECT t.g AS {group_col}, t.n AS n_users, t.s AS total_cents,
  d.d AS dev_mass,
  CASE WHEN 2 * CAST(t.n AS HUGEINT) * t.s != 0 THEN
    CAST(d.d AS DOUBLE)
    / {_split_float_sql('2 * CAST(t.n AS HUGEINT) * t.s')}
  END AS hoover
FROM tot t JOIN devs d USING (g) ORDER BY t.g
""".strip()


# ------------------------------------------- empirical return periods

def return_periods(ds, group_col: str = "event_type",
                   ts_col: str = "ts", value_col: str = "value",
                   k: int = 3) -> pa.Table:
    """Empirical return periods of the most extreme DAYS per group —
    the extreme-value-analysis readout (Weibull plotting positions):
    the day ranked r-th largest among n observed days recurs about
    every ``T = (n+1)/r`` days. Answers "was Tuesday a once-a-month
    spike or a once-a-quarter one?" without fitting a tail.

    Exact contract: ranks are dense positions in the exact int64
    daily-cents order, ties broken by EARLIER day (contract — both
    engines sort (cents DESC, day ASC)); ``T`` is the single division
    ``float(n + 1) / float(r)``. Top-``k`` days per group (fewer when
    n < k). NULL group/ts/value rows excluded. Output: (group, day,
    cents, rank, n_days, return_period_days) sorted by (group, rank).
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[group_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        return pa.table({"g": t[group_col],
                         "_day": _epoch_day(t[ts_col]),
                         "cents": _cents(t[value_col])})

    daily = grouped_agg(
        ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["g", "_day"], [("cents", "sum")], final="driver").to_pandas()

    out = {"g": [], "day": [], "c": [], "r": [], "n": [], "t": []}
    for g, sub in daily.groupby("g", sort=True):
        sub = sub.sort_values(["cents_sum", "_day"],
                              ascending=[False, True])
        n = len(sub)
        for r, (_, row) in enumerate(sub.head(k).iterrows(), start=1):
            out["g"].append(g)
            out["day"].append(int(row["_day"]))
            out["c"].append(int(row["cents_sum"]))
            out["r"].append(r)
            out["n"].append(n)
            out["t"].append(float(n + 1) / float(r))
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "day": pa.array(out["day"], pa.int64()),
        "cents": pa.array(out["c"], pa.int64()),
        "rank": pa.array(out["r"], pa.int64()),
        "n_days": pa.array(out["n"], pa.int64()),
        "return_period_days": pa.array(out["t"], pa.float64()),
    })


def return_periods_sql(group_col: str = "event_type",
                       ts_col: str = "ts", value_col: str = "value",
                       k: int = 3, table: str = "events") -> str:
    return f"""
WITH daily AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    SUM(CAST(round({value_col} * 100.0) AS BIGINT)) AS c
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
  GROUP BY 1, 2
), ranked AS (
  SELECT g, day, c,
    row_number() OVER (PARTITION BY g ORDER BY c DESC, day) AS r,
    count(*) OVER (PARTITION BY g) AS n
  FROM daily
)
SELECT g AS {group_col}, day, c AS cents, CAST(r AS BIGINT) AS rank,
  CAST(n AS BIGINT) AS n_days,
  CAST(n + 1 AS DOUBLE) / CAST(r AS DOUBLE) AS return_period_days
FROM ranked WHERE r <= {k} ORDER BY g, r
""".strip()


# ------------------------------------------- circadian hour entropy

def hour_entropy(ds, group_col: str = "event_type",
                 ts_col: str = "ts") -> pa.Table:
    """Shannon entropy of the 24-hour activity distribution per group
    — the circadian-concentration probe (0 = all activity in one
    hour, ln 24 ≈ 3.178 = uniform around the clock), the entropy
    sibling of the hour-profile TVD.

    Determinism contract: with hour counts c_h and total n, the
    engine carries the exact integer ``term = Σ c_h·(L(n) − L(c_h))``
    under the house floored-log map ``L(x) = floor(1e6·ln(x))``
    (integer inputs only — same contract as the Markov entropy rate;
    the 1e-6 floor absorbs last-ulp ln wobble off measure-zero
    boundaries), and the entropy is the float tree
    ``(float(term) / float(n)) / 1e6`` nats. Hours are
    ``(epoch_us // 3.6e9) % 24``. NULL group/ts rows excluded.
    Output: (group, n, term, entropy_nats) sorted by group.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[group_col]), pc.is_valid(t[ts_col]))
        t = t.filter(keep)
        us = (t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({
            "g": t[group_col],
            "h": pa.array((us // 3_600_000_000) % 24, pa.int64()),
            "one": pa.array(np.ones(len(t), np.int64)),
        })

    cells = grouped_agg(
        ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["g", "h"], [("one", "sum")], final="driver").to_pandas()

    def L(x):
        return int(np.floor(np.log(float(x)) * 1_000_000))

    out = {"g": [], "n": [], "term": [], "e": []}
    for g, sub in cells.groupby("g", sort=True):
        c = sub["one_sum"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        ln_n = L(n)
        term = sum(int(ch) * (ln_n - L(int(ch))) for ch in c)
        out["g"].append(g)
        out["n"].append(n)
        out["term"].append(term)
        out["e"].append((float(term) / float(n)) / 1_000_000.0)
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "term": pa.array(out["term"], pa.int64()),
        "entropy_nats": pa.array(out["e"], pa.float64()),
    })


def hour_entropy_sql(group_col: str = "event_type", ts_col: str = "ts",
                     table: str = "events") -> str:
    return f"""
WITH cells AS (
  SELECT {group_col} AS g,
    (epoch_us({ts_col}) // 3600000000) % 24 AS h,
    CAST(count(*) AS BIGINT) AS c
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {ts_col} IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY g
), agg AS (
  SELECT c.g, t.n,
    CAST(sum(c.c * (CAST(floor(1000000 * ln(t.n)) AS HUGEINT)
                    - CAST(floor(1000000 * ln(c.c)) AS HUGEINT)))
      AS BIGINT) AS term
  FROM cells c JOIN tot t USING (g)
  GROUP BY c.g, t.n
)
SELECT g AS {group_col}, n, term,
  (CAST(term AS DOUBLE) / CAST(n AS DOUBLE)) / 1000000.0
    AS entropy_nats
FROM agg ORDER BY g
""".strip()
