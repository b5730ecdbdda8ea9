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


def fd_violations(ds, lhs: str, rhs: str) -> pa.Table:
    """Functional-dependency audit: does ``lhs`` determine ``rhs``?
    Counts the lhs values that map to MORE THAN ONE distinct rhs —
    the normalization / join-safety check (a dimension key that
    "mostly" determines its attribute is a silent fan-out join bug
    waiting to happen). The dependency-discovery sibling of
    :func:`profile_table` (that one characterizes columns alone; this
    one tests a relationship between two).

    Distributed: exact distinct-rhs-per-lhs via
    :func:`aggregate.grouped_distinct_count`'s value-hash exchange
    (only distinct pairs move), then a bounded histogram collapse —
    the lhs key space never reaches the driver as rows, only as
    counts. NULL lhs rows are EXCLUDED (a NULL determinant determines
    nothing — the standard FD-discovery rule, and what lets the lhs
    key ride the distributed merge); NULL rhs rows are excluded too,
    so an lhs observed ONLY with NULL rhs does not count toward
    ``n_lhs`` (no evidence either way — both engines agree). Output:
    one row (n_lhs, n_violating, violation_rate_millionths,
    max_distinct_rhs).
    """
    from fluent_server_ray.stages.aggregate import (
        grouped_distinct_count, skip_empty)

    def drop_null_lhs(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t[lhs]))

    nd = grouped_distinct_count(
        ds.select_columns([lhs, rhs]).map_batches(
            drop_null_lhs, batch_format="pyarrow",
            zero_copy_batch=True),
        lhs, rhs, final="ray")

    def collapse(t: pa.Table) -> pa.Table:
        n = t["n_distinct"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_lhs": pa.array([len(n)], pa.int64()),
            "n_violating": pa.array([int((n > 1).sum())], pa.int64()),
            "max_d": pa.array([int(n.max()) if len(n) else 0],
                              pa.int64()),
        })

    parts = list(nd.map_batches(skip_empty(collapse),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
                 .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not parts:
        return pa.table({"n_lhs": pa.array([0], pa.int64()),
                         "n_violating": pa.array([0], pa.int64()),
                         "violation_rate_millionths": pa.array(
                             [0], pa.int64()),
                         "max_distinct_rhs": pa.array([0], pa.int64())})
    merged = pa.concat_tables(parts)
    n_lhs = int(pc.sum(merged["n_lhs"]).as_py() or 0)
    n_v = int(pc.sum(merged["n_violating"]).as_py() or 0)
    mx = int(pc.max(merged["max_d"]).as_py() or 0)
    rate = n_v * 1_000_000 // n_lhs if n_lhs else 0
    return pa.table({
        "n_lhs": pa.array([n_lhs], pa.int64()),
        "n_violating": pa.array([n_v], pa.int64()),
        "violation_rate_millionths": pa.array([rate], pa.int64()),
        "max_distinct_rhs": pa.array([mx], pa.int64()),
    })


def fd_violations_sql(lhs: str, rhs: str, table: str) -> str:
    return f"""
WITH d AS (
  SELECT {lhs} AS l, CAST(count(DISTINCT {rhs}) AS BIGINT) AS nd
  FROM {table}
  WHERE {lhs} IS NOT NULL AND {rhs} IS NOT NULL
  GROUP BY {lhs}
)
SELECT CAST(count(*) AS BIGINT) AS n_lhs,
  CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT) AS n_violating,
  CAST(CASE WHEN count(*) = 0 THEN 0
       ELSE CAST(count(*) FILTER (WHERE nd > 1) AS HUGEINT) * 1000000
            // count(*) END AS BIGINT) AS violation_rate_millionths,
  CAST(COALESCE(max(nd), 0) AS BIGINT) AS max_distinct_rhs
FROM d
""".strip()


def order_audit(ds, key_col: str = "conv_id",
                seq_col: str = "turn_idx", ts_col: str = "ts",
                n_buckets: int = 64) -> pa.Table:
    """Sequence-sanity audit: within each key, walking rows in
    ``seq_col`` order, how many ADJACENT steps have a non-increasing
    timestamp? The clock-skew / replay detector for event streams
    (the reference preserves intra-chunk order but trusts client
    clocks — ``message/time.go`` decodes whatever arrives; this
    measures how often that trust is violated).

    One key bucket exchange; whole-bucket segmented shift compare.
    Rows with NULL seq or ts are excluded (no position). Output: one
    row (n_keys, n_steps, n_inversions, inversion_rate_millionths).
    """
    import pandas as pd

    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.groups import map_buckets

    def clean(t: pa.Table) -> pa.Table:
        # NULL key excluded: SQL's count(DISTINCT key) would not
        # count it, and a row without a sequence identity has no
        # adjacency anyway
        t = t.filter(pc.and_(pc.and_(pc.is_valid(t[seq_col]),
                                     pc.is_valid(t[ts_col])),
                             pc.is_valid(t[key_col])))
        return pa.table({
            "key": pc.cast(t[key_col], pa.string()),
            "seq": pc.cast(t[seq_col], pa.int64()),
            "us": t[ts_col].cast(pa.int64()),
        })

    schema = pa.schema([pa.field("n_keys", pa.int64()),
                        pa.field("n_steps", pa.int64()),
                        pa.field("n_inv", pa.int64())])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # seq must be unique within key (transcripts contract) — on a
        # seq tie the adjacent order, and so the inversion count, is
        # engine-defined on both sides
        g = g.sort_values(["key", "seq"])
        grp = g.groupby("key", sort=False, dropna=False)
        head = grp.cumcount().to_numpy() == 0
        cur = g["us"].astype("Int64")  # nullable: shift stays exact
        prev = cur.shift(1)            # head rows masked below
        step = ~head
        inv = step & (cur <= prev).fillna(False).to_numpy()
        return pd.DataFrame({
            "n_keys": [int(head.sum())],
            "n_steps": [int(step.sum())],
            "n_inv": [int(inv.sum())],
        })

    bucketed = _with_bucket(
        ds.select_columns([key_col, seq_col, ts_col]).map_batches(
            clean, batch_format="pyarrow", zero_copy_batch=True),
        "key", n_buckets)
    parts = list(map_buckets(bucketed, per_bucket, schema)
                 .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not parts:  # empty / all-filtered: the zero row, not a crash
        nk = ns = ni = 0
    else:
        merged = pa.concat_tables(parts)
        nk = int(pc.sum(merged["n_keys"]).as_py() or 0)
        ns = int(pc.sum(merged["n_steps"]).as_py() or 0)
        ni = int(pc.sum(merged["n_inv"]).as_py() or 0)
    return pa.table({
        "n_keys": pa.array([nk], pa.int64()),
        "n_steps": pa.array([ns], pa.int64()),
        "n_inversions": pa.array([ni], pa.int64()),
        "inversion_rate_millionths": pa.array(
            [ni * 1_000_000 // ns if ns else 0], pa.int64()),
    })


def order_audit_sql(inner: str, prelude: str = "") -> str:
    """Mirror over ``inner`` — a relation with (key, seq, us).
    ``prelude``: extra CTE definitions (ending with a comma) spliced
    before the audit's own CTE."""
    return f"""
WITH {prelude}s AS (
  SELECT key, seq, us,
    lag(us) OVER (PARTITION BY key ORDER BY seq) AS prev
  FROM {inner}
  WHERE seq IS NOT NULL AND us IS NOT NULL AND key IS NOT NULL
)
SELECT CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
  CAST(count(prev) AS BIGINT) AS n_steps,
  CAST(count(*) FILTER (WHERE us <= prev) AS BIGINT) AS n_inversions,
  CAST(CASE WHEN count(prev) = 0 THEN 0
       ELSE CAST(count(*) FILTER (WHERE us <= prev) AS HUGEINT)
            * 1000000 // count(prev) END AS BIGINT)
    AS inversion_rate_millionths
FROM s
""".strip()


def column_topk(ds, columns: list[str], k: int = 5,
                n_buckets: int = 64) -> pa.Table:
    """The profiler's "common values" panel: per column, the top-``k``
    most frequent values with counts (ties -> smallest value) — what a
    human looks at right after :func:`profile_table`'s cardinalities
    ("fine, 9 distinct — WHICH nine?").

    The :func:`textstats.vocab_top_words` shape generalized across
    columns: per-batch local counts of (col, rendered value), ONE
    value-hash exchange, per-bucket sum + per-column top-k, then an
    O(buckets x cols x k) driver merge — value spaces stay unbounded
    end to end. Value identity: ints and timestamps render as exact
    decimal strings (epoch micros for timestamps), strings pass
    through; FLOAT columns are refused (top-k of a continuous measure
    is meaningless and its cross-engine string rendering is not
    contractual — bin first). NULLs are not values (excluded).

    Output: (col, v, n, rank) sorted by (col, rank).
    """
    import pandas as pd

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)
    from fluent_server_ray.stages.joins import arrow_schema

    sch = arrow_schema(ds, static=True)
    if sch is None:
        raise ValueError("column_topk: dataset schema unavailable")
    type_of = dict(zip(sch.names, sch.types))
    kinds = {c: _classify(type_of[c]) for c in columns}
    if any(kinds[c] == "float" for c in columns):
        raise ValueError("column_topk: float columns are not "
                         "supported — bin continuous measures first")

    def partial(t: pa.Table) -> pa.Table:
        outs = []
        for c in columns:
            valid = t[c].drop_null()
            if kinds[c] == "str":
                v = valid.combine_chunks()
            else:
                v = pc.cast(_canon_num(valid, kinds[c]), pa.string())
            sub = (pa.table({"col": pa.array([c] * len(v), pa.string()),
                             "v": v})
                   .group_by(["col", "v"])
                   .aggregate([([], "count_all")])
                   .rename_columns(["col", "v", "n"]))
            outs.append(sub)
        out = pa.concat_tables(outs)
        return out.append_column(
            "_bucket", pa.array(hash_bucket_array(out["v"], n_buckets)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby(["col", "v"], sort=False)["n"].sum()
             .reset_index())
        s = s.sort_values(["col", "n", "v"],
                          ascending=[True, False, True])
        return s.groupby("col", sort=False).head(k)[["col", "v", "n"]]

    tops = (ds.select_columns(columns)
            .map_batches(skip_empty(partial), batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))
    parts = list(tops.iter_batches(batch_size=None,
                                   batch_format="pyarrow"))
    if not parts:
        return pa.table({"col": pa.array([], pa.string()),
                         "v": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    df = (pa.concat_tables(parts).to_pandas()
          .sort_values(["col", "n", "v"],
                       ascending=[True, False, True]))
    df = df.groupby("col", sort=False).head(k)
    df["rank"] = df.groupby("col", sort=False).cumcount() + 1
    return pa.table({
        "col": pa.array(df["col"].to_numpy(dtype=object), pa.string()),
        "v": pa.array(df["v"].to_numpy(dtype=object), pa.string()),
        "n": pa.array(df["n"].to_numpy().astype(np.int64)),
        "rank": pa.array(df["rank"].to_numpy().astype(np.int64)),
    })


def column_topk_sql(kinds: dict[str, str], k: int, table: str) -> str:
    """Mirror: per-column UNION ALL of ranked value counts. ``kinds``
    as in :func:`profile_table_sql` (no 'float')."""
    branches = []
    for c in sorted(kinds):
        kind = kinds[c]
        if kind == "str":
            vexpr = c
        elif kind == "timestamp":
            vexpr = f"CAST(epoch_us({c}) AS VARCHAR)"
        else:
            vexpr = f"CAST(CAST({c} AS BIGINT) AS VARCHAR)"
        branches.append(f"""
  SELECT '{c}' AS col, {vexpr} AS v, CAST(count(*) AS BIGINT) AS n,
    CAST(row_number() OVER (ORDER BY count(*) DESC, {vexpr})
         AS BIGINT) AS rank
  FROM {table} WHERE {c} IS NOT NULL
  GROUP BY {vexpr} QUALIFY rank <= {k}""".rstrip())
    return ("SELECT * FROM (" + "\n  UNION ALL".join(branches)
            + "\n) ORDER BY col, rank")


def order_reconciliation(orders, lines):
    """Financial reconciliation audit: every order's header total vs
    the sum of its line charges (``extendedprice × (1−discount) ×
    (1+tax)``), with orphan detection on both sides — the
    invoice-vs-ledger check a billing pipeline runs nightly.

    Exactness: the per-line charge is the FIXED float tree
    ``round(ep × (1−disc) × (1+tax) × 100)`` to cents (left-assoc
    multiplies, half-away round — both engines evaluate the identical
    IEEE expression), then exact int64 sums. ``status``: 'ok' /
    'mismatch' (cents differ) / 'no_lines' (header without lines) /
    'no_order' (lines without header, total and diff NULL).

    Distributed shape: per-batch charge combiner collapses lineitem
    to per-order (sum, count) partials merged distributed
    (``final='ray'`` — order cardinality unbounded); ONE bucketed
    outer hash join against headers; output stays a Dataset (the
    audit is order-sized), sorted by key for the deterministic
    mirror. Returns (o_orderkey, total_cents, lines_cents, n_lines,
    diff_cents, status).
    """
    from fluent_server_ray.stages.aggregate import grouped_agg
    from fluent_server_ray.stages.joins import bucketed_hash_join

    def line_charges(t: pa.Table) -> pa.Table:
        ep = pc.cast(t["l_extendedprice"], pa.float64())
        disc = pc.cast(t["l_discount"], pa.float64())
        tax = pc.cast(t["l_tax"], pa.float64())
        prod = pc.multiply(pc.multiply(ep, pc.subtract(1.0, disc)),
                           pc.add(1.0, tax))
        cents = pc.cast(pc.round(pc.multiply(prod, 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({"okey": pc.cast(t["l_orderkey"], pa.int64()),
                         "charge": cents})

    lc = grouped_agg(
        lines.select_columns(["l_orderkey", "l_extendedprice",
                              "l_discount", "l_tax"]).map_batches(
            line_charges, batch_format="pyarrow", zero_copy_batch=True),
        ["okey"], [("charge", "sum"), ("charge", "count")],
        final="ray")

    def header(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(t["o_totalprice"], pa.float64()), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"okey": pc.cast(t["o_orderkey"], pa.int64()),
                         "total_cents": cents})

    oc = orders.select_columns(["o_orderkey", "o_totalprice"]).map_batches(
        header, batch_format="pyarrow", zero_copy_batch=True)

    joined = bucketed_hash_join(oc, lc, key="okey", how="outer")

    def finish(t: pa.Table) -> pa.Table:
        total = t["total_cents"]
        lsum = t["charge_sum"]
        nl = t["charge_count"]
        has_order = pc.is_valid(total)
        has_lines = pc.is_valid(nl)
        # join fill-side numerics ride as float64: exact only < 2^53
        mx = pc.max(pc.abs(pc.fill_null(lsum, 0.0))).as_py()
        if mx is not None and mx >= 2.0 ** 53:
            raise ValueError("order_reconciliation: per-order cents "
                             "sum exceeds exact float64 range")
        lsum0 = pc.cast(pc.fill_null(lsum, 0.0), pa.int64())
        nl0 = pc.cast(pc.fill_null(nl, 0), pa.int64())
        total_i = pc.cast(total, pa.int64())
        diff = pc.subtract(total_i, lsum0)
        status = pc.if_else(
            pc.invert(has_order), pa.scalar("no_order"),
            pc.if_else(pc.invert(has_lines), pa.scalar("no_lines"),
                       pc.if_else(pc.equal(total_i, lsum0),
                                  pa.scalar("ok"),
                                  pa.scalar("mismatch"))))
        return pa.table({
            "o_orderkey": pc.cast(t["okey"], pa.int64()),
            "total_cents": total_i,
            "lines_cents": lsum0,
            "n_lines": nl0,
            "diff_cents": diff,
            "status": status,
        })

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True).sort("o_orderkey")


def order_reconciliation_sql(orders: str = "orders",
                             lines: str = "lineitem") -> str:
    return f"""
WITH lc AS (
  SELECT l_orderkey AS okey,
    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                        * (1.0 + l_tax) * 100.0) AS BIGINT))
         AS BIGINT) AS lines_cents,
    CAST(count(*) AS BIGINT) AS n_lines
  FROM {lines} GROUP BY 1
), oc AS (
  SELECT o_orderkey AS okey,
    CAST(round(o_totalprice * 100.0) AS BIGINT) AS total_cents
  FROM {orders}
)
SELECT COALESCE(oc.okey, lc.okey) AS o_orderkey,
  oc.total_cents AS total_cents,
  COALESCE(lc.lines_cents, 0) AS lines_cents,
  COALESCE(lc.n_lines, 0) AS n_lines,
  oc.total_cents - COALESCE(lc.lines_cents, 0) AS diff_cents,
  CASE WHEN oc.okey IS NULL THEN 'no_order'
       WHEN lc.okey IS NULL THEN 'no_lines'
       WHEN oc.total_cents = lc.lines_cents THEN 'ok'
       ELSE 'mismatch' END AS status
FROM oc FULL JOIN lc ON lc.okey = oc.okey
ORDER BY o_orderkey
""".strip()


def id_gap_audit(ds, id_col: str = "event_id",
                 bucket_width: int = 1 << 20) -> pa.Table:
    """Sequence-completeness audit: the missing ranges of an integer
    id space — "which event_ids never arrived" as [gap_start,
    gap_end] intervals between the observed min and max (the ingest
    counterpart of a ledger's missing-invoice-number check; duplicate
    ids are irrelevant here, :func:`order_reconciliation`-style
    audits catch those).

    Distributed shape: ids hash nowhere — they RANGE-partition by
    ``id // bucket_width``, each bucket finds its internal gaps with
    a sorted-diff kernel and reports its (min, max) boundary; the
    driver stitches cross-bucket gaps from the bounded per-bucket
    boundary table. Empty buckets between occupied ones surface as
    one stitched gap. Output: (gap_start, gap_end, n_missing) sorted,
    exact.
    """
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.groups import map_buckets

    def prep(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64())
        ids = ids.filter(pc.is_valid(ids))
        if pc.any(pc.less(ids, 0)).as_py():
            raise ValueError("id_gap_audit: negative ids — the "
                             "range partitioner assumes non-negative")
        return pa.table({"_bucket": pc.divide(ids, bucket_width),
                         "id": ids})

    out_schema = pa.schema([("kind", pa.string()),
                            ("a", pa.int64()), ("b", pa.int64())])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(df["id"].to_numpy(dtype=np.int64))
        rows = [("span", int(ids[0]), int(ids[-1]))]
        cut = np.flatnonzero(np.diff(ids) > 1)
        for k in cut.tolist():
            rows.append(("gap", int(ids[k]) + 1, int(ids[k + 1]) - 1))
        return pd.DataFrame(rows, columns=["kind", "a", "b"])

    parts = map_buckets(
        ds.select_columns([id_col]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True),
        per_bucket, out_schema).to_pandas()
    empty = pa.schema([("gap_start", pa.int64()),
                       ("gap_end", pa.int64()),
                       ("n_missing", pa.int64())])
    if parts.empty:
        return empty.empty_table()
    gaps = [(int(a), int(b))
            for _, a, b in parts[parts["kind"] == "gap"].itertuples(
                index=False, name=None)]
    spans = (parts[parts["kind"] == "span"].sort_values("a")
             [["a", "b"]].to_numpy())
    for k in range(len(spans) - 1):  # stitch across bucket boundaries
        if spans[k + 1][0] - spans[k][1] > 1:
            gaps.append((int(spans[k][1]) + 1, int(spans[k + 1][0]) - 1))
    gaps.sort()
    return pa.table({
        "gap_start": pa.array([g[0] for g in gaps], pa.int64()),
        "gap_end": pa.array([g[1] for g in gaps], pa.int64()),
        "n_missing": pa.array([g[1] - g[0] + 1 for g in gaps],
                              pa.int64()),
    })


def id_gap_audit_sql(id_col: str = "event_id",
                     table: str = "events",
                     where: str = "TRUE") -> str:
    return f"""
WITH ids AS (
  SELECT DISTINCT CAST({id_col} AS BIGINT) AS id FROM {table}
  WHERE {id_col} IS NOT NULL AND {where}
), nxt AS (
  SELECT id, lead(id) OVER (ORDER BY id) AS nid FROM ids
)
SELECT id + 1 AS gap_start, nid - 1 AS gap_end,
  nid - id - 1 AS n_missing
FROM nxt WHERE nid - id > 1
ORDER BY gap_start
""".strip()


# ----------------------------------------- inclusion-dependency audit

def inclusion_audit(edges: list[tuple[str, "ray.data.Dataset", str,
                                      pa.Table, str]]) -> pa.Table:
    """Inclusion-dependency discovery: for each candidate (child
    column ⊆ parent column?) pair, the fraction of the child's
    DISTINCT values present in the parent — the schema-inference
    sibling of the row-level ``fk_integrity_audit`` (that one counts
    VIOLATING ROWS of declared FKs; this one scores candidate edges at
    distinct-value granularity, the standard IND-discovery metric).

    ``edges``: (name, child Dataset, child_col, parent pa.Table,
    parent_col) — the parent side is a dim-sized table read
    driver-side (IND discovery against another fact-sized column
    would use the distinct-exchange anti-join instead, as
    fk_integrity_audit's large-parent path does).

    Scale shape per edge: per-batch LOCAL dedup of child values → the
    distinct values flow through Ray's distributed distinct (only
    distincts shuffle) → each distinct block counts itself and its
    broadcast-parent membership (two ints per block). Containment is
    one floor division in millionths — exact. NULL child values are
    excluded (SQL IN semantics: NULL is never contained).

    Output: one row per edge (edge, n_distinct, n_contained,
    containment_e6), sorted by edge name."""
    import ray

    rows = {"edge": [], "n_distinct": [], "n_contained": [],
            "containment_e6": []}
    for name, child, child_col, parent, parent_col in sorted(
            edges, key=lambda e: e[0]):
        pvals = pc.unique(pc.cast(parent[parent_col], pa.int64()))
        pref = ray.put(pvals)

        def local_unique(t: pa.Table, col=child_col) -> pa.Table:
            v = t[col]
            v = pc.cast(v.filter(pc.is_valid(v)), pa.int64())
            return pa.table({"v": pc.unique(v)})

        distinct = child.map_batches(
            local_unique, batch_format="pyarrow", zero_copy_batch=True
        ).groupby("v").count()

        def contained_partial(t: pa.Table, ref=pref) -> pa.Table:
            inside = pc.is_in(t["v"], value_set=ray.get(ref))
            n_in = pc.sum(pc.cast(inside, pa.int64())).as_py() or 0
            return pa.table({
                "nd": pa.array([len(t)], pa.int64()),
                "nc": pa.array([int(n_in)], pa.int64()),
            })

        nd = nc = 0
        for b in distinct.map_batches(
                contained_partial, batch_format="pyarrow",
                zero_copy_batch=True).iter_batches(
                    batch_size=None, batch_format="pyarrow"):
            if b.num_rows:
                nd += int(pc.sum(b["nd"]).as_py() or 0)
                nc += int(pc.sum(b["nc"]).as_py() or 0)
        rows["edge"].append(name)
        rows["n_distinct"].append(nd)
        rows["n_contained"].append(nc)
        rows["containment_e6"].append(
            (1_000_000 * nc) // nd if nd else None)
    return pa.table({
        "edge": pa.array(rows["edge"], pa.string()),
        "n_distinct": pa.array(rows["n_distinct"], pa.int64()),
        "n_contained": pa.array(rows["n_contained"], pa.int64()),
        "containment_e6": pa.array(rows["containment_e6"], pa.int64()),
    })


INCLUSION_EDGES_SQL: list[tuple[str, str, str, str, str]] = [
    ("events.user_id->customer.c_custkey",
     "events", "user_id", "customer", "c_custkey"),
    ("lineitem.l_partkey->part.p_partkey",
     "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders.o_custkey->customer.c_custkey",
     "orders", "o_custkey", "customer", "c_custkey"),
    ("part.p_size->nation.n_nationkey",
     "part", "p_size", "nation", "n_nationkey"),
]


def inclusion_audit_sql() -> str:
    parts = []
    for name, ct, cc, pt, pk in sorted(INCLUSION_EDGES_SQL,
                                       key=lambda e: e[0]):
        parts.append(f"""
SELECT '{name}' AS edge,
  CAST(count(*) AS BIGINT) AS n_distinct,
  CAST(count(*) FILTER (WHERE hit) AS BIGINT) AS n_contained,
  CASE WHEN count(*) > 0 THEN
    CAST((1000000 * count(*) FILTER (WHERE hit)) // count(*) AS BIGINT)
  END AS containment_e6
FROM (
  -- distinct-to-distinct LEFT JOIN is 1:(0|1): no fan-out
  SELECT c.v, (p.{pk} IS NOT NULL) AS hit
  FROM (SELECT DISTINCT CAST({cc} AS BIGINT) AS v FROM {ct}
        WHERE {cc} IS NOT NULL) c
  LEFT JOIN (SELECT DISTINCT {pk} FROM {pt}) p ON p.{pk} = c.v
)""".strip())
    return "\nUNION ALL\n".join(parts) + "\nORDER BY edge"


def merkle_fingerprint(ds, id_col: str = "event_id",
                       type_col: str = "event_type",
                       value_col: str = "value",
                       n_buckets: int = 64):
    """Two-level Merkle fingerprint of a keyed table — the content-
    addressable integrity audit (replication checks, snapshot diffs):
    every row hashes to ``md5('r:' || id || ':' || type || ':' ||
    cents)`` (lowercase hex); rows hash-partition into ``md5_u64('mb:'
    || id) % n_buckets`` leaves; each leaf digest is the md5 of its
    row hashes CONCATENATED IN ASCENDING HEX ORDER; the root (bucket
    −1) is the md5 of the leaf digests concatenated in bucket order.
    Two replicas agree iff the root agrees, and a mismatch localizes
    to the differing leaves — O(changed buckets) re-sync, not a full
    rescan.

    Deterministic by construction (md5 + total orders only); NULL
    id/type/value rows are excluded by contract. Shape: per-batch row
    hashing (vectorized md5 loop) → ONE bucket exchange → per-bucket
    sort + digest → ≤ n_buckets rows to the driver for the root.
    Output: (bucket, n_rows, digest) with the root as bucket −1,
    sorted by bucket.
    """
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.features import _cents

    def row_hash(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[id_col]),
                               pc.is_valid(t[type_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype("int64")
        tys = t[type_col].to_pylist()
        cs = _cents(t[value_col]).to_numpy(zero_copy_only=False)
        hx = [hashlib.md5(f"r:{i}:{ty}:{c}".encode()).hexdigest()
              for i, ty, c in zip(ids, tys, cs)]
        bk = np.fromiter((md5_u64(f"mb:{i}") % n_buckets for i in ids),
                         dtype=np.int64, count=len(ids))
        return pa.table({"_bucket": pa.array(bk),
                         "h": pa.array(hx, pa.string())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_bucket"].iloc[0])
        hs = sorted(g["h"])
        return pd.DataFrame({
            "bucket": [b],
            "n_rows": [len(hs)],
            "digest": [hashlib.md5("".join(hs).encode()).hexdigest()],
        })

    cols = ds.select_columns([id_col, type_col, value_col])
    leaves = (cols.map_batches(skip_empty(row_hash),
                               batch_format="pyarrow",
                               zero_copy_batch=True)
              .groupby("_bucket").map_groups(per_bucket,
                                             batch_format="pandas")
              .to_pandas())          # bounded: <= n_buckets rows
    if leaves.empty:
        # all-empty mapped datasets drop columns (pandas gotcha) —
        # rebuild the typed empty frame before the root digest
        leaves = pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                               "n_rows": pd.Series([], dtype="int64"),
                               "digest": pd.Series([], dtype="object")})
    leaves = leaves.sort_values("bucket").reset_index(drop=True)
    # empty corpus: NULL root (mirrors string_agg over zero rows)
    root = (hashlib.md5("".join(leaves["digest"]).encode()).hexdigest()
            if len(leaves) else None)
    out = pd.concat([
        pd.DataFrame({"bucket": [-1],
                      "n_rows": [int(leaves["n_rows"].sum())],
                      "digest": [root]}),
        leaves,
    ], ignore_index=True).sort_values("bucket")
    return pa.table({
        "bucket": pa.array(out["bucket"].astype("int64")),
        "n_rows": pa.array(out["n_rows"].astype("int64")),
        "digest": pa.array(out["digest"], pa.string()),
    })


def merkle_fingerprint_sql(id_col: str = "event_id",
                           type_col: str = "event_type",
                           value_col: str = "value",
                           n_buckets: int = 64,
                           table: str = "events") -> str:
    return f"""
WITH rh AS (
  SELECT CAST(md5_number_upper(
      'mb:' || CAST(CAST({id_col} AS BIGINT) AS VARCHAR))
      % {n_buckets} AS BIGINT) AS b,
    md5('r:' || CAST(CAST({id_col} AS BIGINT) AS VARCHAR) || ':'
        || {type_col} || ':'
        || CAST(CAST(round({value_col} * 100.0) AS BIGINT)
                AS VARCHAR)) AS h
  FROM {table}
  WHERE {id_col} IS NOT NULL AND {type_col} IS NOT NULL
    AND {value_col} IS NOT NULL
), bd AS (
  SELECT b AS bucket, CAST(count(*) AS BIGINT) AS n_rows,
    md5(string_agg(h, '' ORDER BY h)) AS digest
  FROM rh GROUP BY b
), root AS (
  SELECT CAST(-1 AS BIGINT) AS bucket,
    CAST(COALESCE(sum(n_rows), 0) AS BIGINT) AS n_rows,
    md5(string_agg(digest, '' ORDER BY bucket)) AS digest
  FROM bd
)
SELECT * FROM bd
UNION ALL SELECT * FROM root
ORDER BY bucket
""".strip()


_FD_COLS = ("o_orderkey", "o_custkey", "o_orderstatus",
            "o_orderdate", "o_orderpriority")


def fd_discovery(ds, cols: tuple = _FD_COLS):
    """Pairwise functional-dependency DISCOVERY over a table's
    non-float columns — the schema-mining sweep behind key detection
    and normalization advice (the fixed-pair sibling is the
    orders_fd_audit contract): for every ORDERED pair (A, B),
    ``A → B`` holds iff every A value maps to exactly one B, i.e.
    ``|distinct A| = |distinct (A, B)|`` over rows where BOTH are
    non-NULL (the no-evidence exclusion, shared with fd_audit).

    Shape: ONE pass emits per-block DISTINCT (pair, a, b) triples for
    all pairs at once (values rendered per-column injectively: ints
    and epoch-us as decimal strings, strings as-is); a distributed
    distinct merge, then bounded per-pair counts (triples and distinct
    lhs) — the corpus moves once, not per pair. Output:
    (col_a, col_b, n_distinct_a, n_distinct_ab, fd_holds) for all
    ordered pairs, sorted.
    """
    import numpy as np
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def render(col):
        if pa.types.is_timestamp(col.type):
            return pc.cast(pc.cast(col.cast(pa.timestamp("us")),
                                   pa.int64()), pa.string())
        if pa.types.is_floating(col.type):
            raise TypeError("fd_discovery: float columns need the "
                            "profile render contract — exclude them")
        return pc.cast(col, pa.string())

    def triples(t: pa.Table) -> pa.Table:
        rendered = {c: render(t[c]) for c in cols}
        parts = []
        for a in cols:
            for b in cols:
                if a == b:
                    continue
                sub = pa.table({"a": rendered[a], "b": rendered[b]})
                sub = sub.filter(pc.and_(pc.is_valid(sub["a"]),
                                         pc.is_valid(sub["b"])))
                sub = sub.group_by(["a", "b"]).aggregate([])
                parts.append(pa.table({
                    "pair": pa.array([f"{a}->{b}"] * len(sub),
                                     pa.string()),
                    "a": sub["a"], "b": sub["b"],
                    "one": pa.array(np.ones(len(sub), np.int64)),
                }))
        return pa.concat_tables(parts)

    distinct = grouped_agg(
        ds.select_columns(list(cols)).map_batches(
            skip_empty(triples), batch_format="pyarrow",
            zero_copy_batch=True),
        keys=["pair", "a", "b"], aggs=[("one", "sum")], final="ray")

    # distinct triples can be large (~|distinct value pairs|), so the
    # per-pair counts run as two more DISTRIBUTED groupbys; only the
    # |pairs|-bounded count tables reach the driver
    nab = grouped_agg(distinct, ["pair"], [("one_sum", "count")],
                      final="driver").to_pandas()
    lhs = grouped_agg(
        distinct.map_batches(
            lambda t: t.select(["pair", "a"]).group_by(["pair", "a"])
            .aggregate([([], "count_all")])
            .rename_columns(["pair", "a", "c"]),
            batch_format="pyarrow", zero_copy_batch=True),
        keys=["pair", "a"], aggs=[("c", "count")], final="ray")
    na = grouped_agg(lhs, ["pair"], [("c_count", "count")],
                     final="driver").to_pandas()

    merged = (nab.rename(columns={"one_sum_count": "n_ab"})
              .merge(na.rename(columns={"c_count_count": "n_a"}),
                     on="pair"))
    # pairs with ZERO co-non-null rows yield no triples at all — the
    # mirror still emits them (counts 0, fd vacuously TRUE); complete
    # the grid so both engines return the same row set
    import pandas as _pd

    all_pairs = _pd.DataFrame(
        {"pair": [f"{a}->{b}" for a in cols for b in cols if a != b]})
    merged = (all_pairs.merge(merged, on="pair", how="left")
              .fillna({"n_a": 0, "n_ab": 0}).sort_values("pair"))
    ca = merged["pair"].str.split("->").str[0]
    cb = merged["pair"].str.split("->").str[1]
    return pa.table({
        "col_a": pa.array(ca, pa.string()),
        "col_b": pa.array(cb, pa.string()),
        "n_distinct_a": pa.array(merged["n_a"].astype("int64")),
        "n_distinct_ab": pa.array(merged["n_ab"].astype("int64")),
        "fd_holds": pa.array(
            (merged["n_a"] == merged["n_ab"]).to_numpy(), pa.bool_()),
    })


def fd_discovery_sql(cols: tuple = _FD_COLS,
                     table: str = "orders") -> str:
    selects = []
    for a in cols:
        for b in cols:
            if a == b:
                continue
            selects.append(f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
  (SELECT CAST(count(DISTINCT {a}) AS BIGINT) FROM {table}
   WHERE {a} IS NOT NULL AND {b} IS NOT NULL) AS n_distinct_a,
  (SELECT CAST(count(*) AS BIGINT) FROM
     (SELECT DISTINCT {a}, {b} FROM {table}
      WHERE {a} IS NOT NULL AND {b} IS NOT NULL)) AS n_distinct_ab""")
    union = "\nUNION ALL\n".join(selects)
    return (f"SELECT col_a, col_b, n_distinct_a, n_distinct_ab,\n"
            f"  n_distinct_a = n_distinct_ab AS fd_holds FROM (\n"
            f"{union}\n) ORDER BY col_a, col_b").strip()
