"""Structured field extraction from string payloads — the fluentd
"parser filter" analog.

The reference stores record payloads verbatim as opaque msgpack maps
(`mirror/mirror.go:26-39`); a real log pipeline's next step is parsing
semi-structured string fields (JSON props, logfmt, key=value) into
typed columns so downstream relational operators can prune and
aggregate on them. Expressed as ONE vectorized Arrow
``extract_regex`` kernel per field — no Python row loop, no JSON
parser object per row, no shuffle.

Patterns are RE2 and shared verbatim between the engine and the
DuckDB mirror (named group on the engine side, positional group in
SQL) — the oracle cannot drift. Non-matching rows yield NULL in both
(DuckDB's ``regexp_extract`` returns ``''`` on no-match, normalized
with ``NULLIF`` before the ``TRY_CAST``).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# (out_col, RE2 pattern body — the part around the capture, arrow type,
# SQL type). The engine wraps the capture as (?P<col>...), SQL keeps it
# positional. Default extracts the integer "k" out of the synthetic
# events' JSON props ({"k": N}).
PROPS_FIELDS = (
    ("k", r'"k":\s*(-?[0-9]+)', pa.int64(), "BIGINT"),
)


def _named(pattern_body: str, col: str) -> str:
    """Positional group → named group: rewrite the first CAPTURING
    paren — one that isn't escaped (``\\(``) and isn't a ``(?``
    construct (non-capturing / lookaround / flags) — mirroring SQL's
    "group 1" counting exactly."""
    out, n = re.subn(r"(?<!\\)\((?!\?)", f"(?P<{col}>", pattern_body,
                     count=1)
    if not n:
        raise ValueError(
            f"field pattern for {col!r} has no capturing group: "
            f"{pattern_body!r}"
        )
    return out


def _try_cast(arr: pa.Array | pa.ChunkedArray, typ: pa.DataType):
    """Cast with SQL ``TRY_CAST`` semantics: a value the target type
    cannot hold becomes NULL instead of failing the batch (the fast
    path is one vectorized cast; the per-value fallback runs only for
    batches that actually contain an overflowing match)."""
    try:
        return pc.cast(arr, typ)
    except (pa.ArrowInvalid, pa.lib.ArrowNotImplementedError):
        vals = arr.to_pylist()
        conv = []
        for v in vals:
            if v is None:
                conv.append(None)
                continue
            try:
                if pa.types.is_integer(typ):
                    iv = int(v)
                    # reject out-of-range instead of wrapping
                    pa.scalar(iv, type=typ)
                    conv.append(iv)
                elif pa.types.is_floating(typ):
                    conv.append(float(v))
                else:
                    conv.append(v)
            except (ValueError, OverflowError, pa.ArrowInvalid):
                conv.append(None)
        return pa.array(conv, type=typ)


def extract_fields(ds, fields=PROPS_FIELDS, src_col: str = "props",
                   id_cols: tuple[str, ...] = ("event_id",)):
    """Extract typed columns from a string payload column. Output:
    id cols + one typed column per field (NULL where the pattern does
    not match). Embarrassingly parallel — a pure map stage."""

    # validate + rewrite patterns EAGERLY (a bad pattern fails on the
    # driver at build time, not as a RayTaskError mid-stream)
    named = [(col, _named(body, col), typ) for col, body, typ, _ in fields]

    def fn(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in id_cols}
        src = t[src_col]
        for col, rx, typ in named:
            st = pc.extract_regex(src, rx)
            cols[col] = _try_cast(pc.struct_field(st, col), typ)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def extract_fields_sql(fields=PROPS_FIELDS, src_col: str = "props",
                       id_cols: tuple[str, ...] = ("event_id",),
                       table: str = "events") -> str:
    exprs = []
    for col, body, _, sql_t in fields:
        body_sql = body.replace("'", "''")
        exprs.append(
            f"TRY_CAST(NULLIF(regexp_extract({src_col}, '{body_sql}', 1),"
            f" '') AS {sql_t}) AS {col}"
        )
    return (
        f"SELECT {', '.join(id_cols)}, {', '.join(exprs)} FROM {table}"
    )


# ------------------------------------------------ grep filter

def grep_filter(ds, include: tuple[str, ...] = (),
                exclude: tuple[str, ...] = (), field: str = "text"):
    """fluentd ``filter_grep`` semantics: keep a row iff ALL
    ``include`` patterns match the field (AND, like multiple
    ``<regexp>`` directives) and NO ``exclude`` pattern matches (OR
    over ``<exclude>`` directives). Pure vectorized per-batch kernel
    (one ``match_substring_regex`` per pattern), no shuffle; NULL
    field values never match (kept only when ``include`` is empty and
    no exclude matches — identical to the SQL mirror's NULL-safe
    COALESCE)."""

    def fn(t: pa.Table) -> pa.Table:
        src = t[field]
        mask = pa.array([True] * len(t)) if len(t) else pa.array([], type=pa.bool_())
        for rx in include:
            m = pc.fill_null(pc.match_substring_regex(src, rx), False)
            mask = pc.and_(mask, m)
        for rx in exclude:
            m = pc.fill_null(pc.match_substring_regex(src, rx), False)
            mask = pc.and_(mask, pc.invert(m))
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def grep_filter_sql(include: tuple[str, ...] = (),
                    exclude: tuple[str, ...] = (), field: str = "text",
                    select: str = "*", table: str = "documents") -> str:
    def esc(rx: str) -> str:
        return rx.replace("'", "''")

    preds = [
        f"COALESCE(regexp_matches({field}, '{esc(rx)}'), FALSE)"
        for rx in include
    ] + [
        f"NOT COALESCE(regexp_matches({field}, '{esc(rx)}'), FALSE)"
        for rx in exclude
    ]
    where = " AND ".join(preds) if preds else "TRUE"
    return f"SELECT {select} FROM {table} WHERE {where}"


# ------------------------------- log template mining (Drain-lite)

# masking order matters: quoted strings first (digits inside quotes
# become part of <S>, not <N>), then number runs. Shared verbatim with
# the SQL mirror — both engines run RE2.
TEMPLATE_MASKS = (
    (r'"[^"]*"', "<S>"),
    (r"[0-9]+", "<N>"),
)


def log_templates(ds, text_col: str = "text"):
    """Log-template mining — the Drain-style first step of log
    analytics (group the unbounded message stream into its few
    generating templates): mask variable parts (quoted strings,
    number runs) with fixed placeholders, then count per template.

    Shape: the masking is two vectorized ``replace_substring_regex``
    kernels fused into the read stage; counting is the combiner-first
    grouped count with a DISTRIBUTED final merge (``final='ray'``) —
    the template space is bounded in practice (that is the point of
    templating) but nothing here assumes it. NULL text templates as
    the empty string (COALESCE on both sides). Output:
    (template, n_events) sorted by template.

    Reference tie-in: the reference ships raw events to sinks
    (`mirror/mirror.go:26-39`); template counts are the standard first
    dashboard a log pipeline derives from that stream.
    """
    from fluent_server_ray.stages.aggregate import grouped_counts

    def to_template(t: pa.Table) -> pa.Table:
        s = t[text_col]
        if s.null_count:
            s = pc.fill_null(s, "")
        for rx, repl in TEMPLATE_MASKS:
            s = pc.replace_substring_regex(s, rx, repl)
        return pa.table({"template": s})

    masked = ds.map_batches(to_template, batch_format="pyarrow",
                            zero_copy_batch=True)
    counted = grouped_counts(masked, ["template"], final="ray")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"template": t["template"],
                         "n_events": pc.cast(t["n"], pa.int64())})

    return counted.map_batches(rename, batch_format="pyarrow",
                               zero_copy_batch=True).sort("template")


def log_templates_sql(text_col: str = "text",
                      source_cte: str = "transcripts") -> str:
    expr = f"COALESCE({text_col}, '')"
    for rx, repl in TEMPLATE_MASKS:
        expr = f"regexp_replace({expr}, '{rx}', '{repl}', 'g')"
    return f"""
SELECT {expr} AS template, CAST(count(*) AS BIGINT) AS n_events
FROM {source_cte} GROUP BY 1 ORDER BY template
""".strip()


def props_audit(ds, group_col: str = "event_type",
                props_col: str = "props") -> pa.Table:
    """Semi-structured payload AUDIT: per group, how many rows carry a
    well-formed ``{"k": <int>}`` payload, and the min/max/sum of the
    extracted value — the schema-conformance gate a log pipeline runs
    before trusting free-form JSON columns (fluentd parser-plugin
    shape: one declared schema, count the rows that violate it).

    Vectorized both sides: ONE compiled-regex match + extract per
    batch (Arrow C++ kernels — no per-row json.loads loop), per-batch
    Arrow group_by partials (n / n_valid / n_null / k min / max /
    sum), bounded driver merge with the matching algebraic rules. All
    integers; no floats anywhere.

    Returns (group, n, n_null, n_valid, k_min, k_max, k_sum) sorted;
    k_min/k_max are NULL for groups with no valid payload.
    """
    import numpy as np

    from fluent_server_ray.stages.aggregate import skip_empty

    pat = r'^\{"k": (-?[0-9]+)\}$'

    def partial(t: pa.Table) -> pa.Table:
        g = pc.cast(t[group_col], pa.string())
        p = t[props_col]
        null = pc.is_null(p)
        ext = pc.extract_regex(pc.fill_null(pc.cast(p, pa.string()), ""),
                               pattern=r'^\{"k": (?P<k>-?[0-9]+)\}$')
        valid = pc.is_valid(ext)
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        tbl = pa.table({
            "g": g,
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "nul": pc.cast(null, pa.int64()),
            "val": pc.cast(valid, pa.int64()),
            "k": k,  # null where invalid — min/max/sum skip nulls
        })
        out = tbl.group_by("g").aggregate(
            [("one", "sum"), ("nul", "sum"), ("val", "sum"),
             ("k", "min"), ("k", "max"), ("k", "sum")])
        return out.rename_columns(
            ["g", "n", "n_null", "n_valid", "k_min", "k_max", "k_sum"])

    parts = list(
        ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not parts:
        return pa.table({
            group_col: pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "n_null": pa.array([], pa.int64()),
            "n_valid": pa.array([], pa.int64()),
            "k_min": pa.array([], pa.int64()),
            "k_max": pa.array([], pa.int64()),
            "k_sum": pa.array([], pa.int64()),
        })
    merged = (pa.concat_tables(parts).group_by("g").aggregate(
        [("n", "sum"), ("n_null", "sum"), ("n_valid", "sum"),
         ("k_min", "min"), ("k_max", "max"), ("k_sum", "sum")]))
    out = merged.rename_columns(
        ["g", "n", "n_null", "n_valid", "k_min", "k_max", "k_sum"])
    out = out.rename_columns([group_col] + out.column_names[1:])
    return out.sort_by([(group_col, "ascending")])


def props_audit_sql(group_col: str = "event_type",
                    props_col: str = "props",
                    table: str = "events") -> str:
    pat = r'^\{"k": (-?[0-9]+)\}$'
    return f"""
WITH x AS (
  SELECT {group_col},
    {props_col} IS NULL AS p_null,
    regexp_matches(COALESCE({props_col}, ''), '{pat}') AS valid,
    CASE WHEN regexp_matches(COALESCE({props_col}, ''), '{pat}')
      THEN CAST(regexp_extract(COALESCE({props_col}, ''), '{pat}', 1)
                AS BIGINT) END AS k
  FROM {table}
)
SELECT {group_col},
  CAST(count(*) AS BIGINT) AS n,
  CAST(count(*) FILTER (WHERE p_null) AS BIGINT) AS n_null,
  CAST(count(*) FILTER (WHERE valid) AS BIGINT) AS n_valid,
  min(k) AS k_min, max(k) AS k_max, CAST(sum(k) AS BIGINT) AS k_sum
FROM x GROUP BY {group_col} ORDER BY {group_col}
""".strip()


# ------------------------------------------------ reshape: melt

def melt(ds, id_cols: tuple[str, ...], value_cols: tuple[str, ...],
         var_name: str = "variable", value_name: str = "value",
         value_type: pa.DataType | None = None):
    """UNPIVOT / melt: wide → long, the reshape inverse of
    :func:`features.pivot_counts` (a feature matrix goes wide for
    model consumption and back to long for storage/aggregation —
    both directions belong in the engine).

    Pure per-batch Arrow concat (one slice per value column, no
    Python row loop, no shuffle); all value columns cast to one
    declared ``value_type`` (default: the first value column's type),
    mirroring SQL UNPIVOT's single value column.
    """
    def fn(t: pa.Table) -> pa.Table:
        vt = value_type or t.schema.field(value_cols[0]).type
        parts = []
        for vc in value_cols:
            cols = {c: t[c] for c in id_cols}
            cols[var_name] = pa.array([vc] * t.num_rows, pa.string())
            cols[value_name] = pc.cast(t[vc], vt)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def json_key_profile(ds, src_col: str = "props") -> pa.Table:
    """Schema DISCOVERY over a schemaless JSON column — per observed
    top-level key: how many rows carry it and how many distinct values
    it takes. The batch answer to "what is actually inside ``Stuff``"
    (the reference's open-schema tail, ``msg/option.go:7`` — unknown
    option keys preserved as an untyped map; this operator is how a
    reader decides which of those keys deserve real columns).

    Factorize-then-parse (the pseudonymize house trick): each batch
    collapses to DISTINCT doc strings + counts (Arrow group_by — the
    combiner), the unbounded distinct-doc space merges distributedly
    (``grouped_agg(final='ray')``), and ``json.loads`` runs ONCE per
    distinct document inside tasks — the Python cost scales with
    |distinct docs|, never rows. The exploded (key, value, n) set
    materializes once and feeds both aggregates.

    Value-identity contract (bit-matched to DuckDB's JSON
    normalization, probed: ints/floats/bools/strings/nested objects
    all render identically): values canonicalize via
    ``json.dumps(v, separators=(',', ':'), ensure_ascii=False)``;
    JSON ``null`` maps to SQL NULL (present for ``n_present``,
    excluded from ``n_distinct`` — SQL ``count(DISTINCT)``). Non-object
    documents (scalars/arrays) contribute no keys (DuckDB
    ``json_keys`` returns []); NULL docs are skipped; malformed JSON
    raises (the mirror errors there too). Top-level keys are
    schema-sized (bounded) — the final merges are driver-side; the
    VALUE space is unbounded and only ever moves as distinct pairs.

    Output: (key, n_present, n_distinct) sorted by key.
    """
    import json

    from fluent_server_ray.stages.aggregate import (grouped_agg,
                                                    grouped_distinct_count,
                                                    skip_empty)

    def doc_counts(t: pa.Table) -> pa.Table:
        col = t.filter(pc.is_valid(t[src_col]))[src_col]
        return (pa.table({"doc": pc.cast(col, pa.string())})
                .group_by("doc").aggregate([([], "count_all")])
                .rename_columns(["doc", "n"]))

    distinct_docs = grouped_agg(
        ds.select_columns([src_col]).map_batches(
            skip_empty(doc_counts), batch_format="pyarrow",
            zero_copy_batch=True),
        keys=["doc"], aggs=[("n", "sum")], final="ray")

    def explode(t: pa.Table) -> pa.Table:
        keys, vals, ns = [], [], []
        def no_dups(pairs):
            d = dict(pairs)
            if len(d) != len(pairs):
                # DuckDB json_keys returns BOTH copies of a
                # duplicated key while json.loads keeps the last —
                # refuse rather than silently diverge from the mirror
                raise ValueError(
                    "json_key_profile: duplicate top-level key in "
                    "a document — engines disagree on duplicate-key "
                    "JSON; normalize the feed first")
            return d

        for doc, n in zip(t["doc"].to_pylist(),
                          t["n_sum"].to_pylist()):
            # malformed raises, like the mirror
            obj = json.loads(doc, object_pairs_hook=no_dups)
            if not isinstance(obj, dict):
                continue
            for k, v in obj.items():
                keys.append(k)
                vals.append(None if v is None else json.dumps(
                    v, separators=(",", ":"), ensure_ascii=False))
                ns.append(n)
        return pa.table({"key": pa.array(keys, pa.string()),
                         "val": pa.array(vals, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    exploded = distinct_docs.map_batches(
        skip_empty(explode), batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    present = grouped_agg(exploded, keys=["key"],
                          aggs=[("n", "sum")], final="driver")
    nd = grouped_distinct_count(exploded, "key", "val", final="driver")
    pmap = {r["key"]: int(r["n_sum"]) for r in present.to_pylist()}
    dmap = {r["key"]: int(r["n_distinct"]) for r in nd.to_pylist()}
    ks = sorted(pmap)
    return pa.table({
        "key": pa.array(ks, pa.string()),
        "n_present": pa.array([pmap[k] for k in ks], pa.int64()),
        "n_distinct": pa.array([dmap.get(k, 0) for k in ks],
                               pa.int64()),
    })


def json_key_profile_sql(src_col: str = "props",
                         table: str = "events") -> str:
    return f"""
WITH k AS (
  SELECT {src_col} AS doc, unnest(json_keys({src_col})) AS key
  FROM {table} WHERE {src_col} IS NOT NULL
), v AS (
  SELECT key,
    CAST(json_extract(doc, '$."' || key || '"') AS VARCHAR) AS val
  FROM k
)
SELECT key, CAST(count(*) AS BIGINT) AS n_present,
  CAST(count(DISTINCT val) AS BIGINT) AS n_distinct
FROM v GROUP BY key ORDER BY key
""".strip()


def json_schema_drift(ds, src_col: str = "props",
                      ts_col: str = "ts") -> pa.Table:
    """Day-over-day JSON schema drift: for each consecutive pair of
    OBSERVED key-bearing days, the Jaccard overlap of the two days'
    top-level key sets plus added/removed key counts — the monitor a
    log pipeline owner reads to catch a producer silently changing its
    payload schema (:func:`json_key_profile` is the static census;
    this is its temporal derivative).

    Same parse contract as :func:`json_key_profile` (factorize-then-
    parse, duplicate-key docs refused, non-object docs contribute no
    keys, NULL ts/doc skipped). Shape: per-batch DISTINCT (day, doc)
    combiner → distributed distinct → json.loads once per distinct
    (day, doc) → the bounded distinct (day, key) table drives a
    driver-side consecutive-day scan (days × keys is schema-sized).

    Output: (day_a, day_b, n_keys_a, n_keys_b, n_common,
    jaccard_millionths, n_added, n_removed) sorted by day_a."""
    import json

    from fluent_server_ray.stages.aggregate import (grouped_counts,
                                                    skip_empty)
    from fluent_server_ray.stages.features import _epoch_day

    def day_docs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                             pc.is_valid(t[src_col])))
        return (pa.table({"day": _epoch_day(t[ts_col]),
                          "doc": pc.cast(t[src_col], pa.string())})
                .group_by(["day", "doc"]).aggregate([]))

    distinct = grouped_counts(
        ds.select_columns([ts_col, src_col]).map_batches(
            skip_empty(day_docs), batch_format="pyarrow",
            zero_copy_batch=True),
        ["day", "doc"], final="ray")

    def explode(t: pa.Table) -> pa.Table:
        days, keys = [], []

        def no_dups(pairs):
            d = dict(pairs)
            if len(d) != len(pairs):
                raise ValueError(
                    "json_schema_drift: duplicate top-level key in a "
                    "document — engines disagree on duplicate-key "
                    "JSON; normalize the feed first")
            return d

        for day, doc in zip(t["day"].to_pylist(), t["doc"].to_pylist()):
            obj = json.loads(doc, object_pairs_hook=no_dups)
            if not isinstance(obj, dict):
                continue
            for k in obj:
                days.append(day)
                keys.append(k)
        return pa.table({"day": pa.array(days, pa.int64()),
                         "key": pa.array(keys, pa.string())})

    dk = grouped_counts(
        distinct.map_batches(skip_empty(explode), batch_format="pyarrow",
                             zero_copy_batch=True),
        ["day", "key"], final="driver")  # bounded: days × schema keys

    out_schema = pa.schema([
        pa.field("day_a", pa.int64()), pa.field("day_b", pa.int64()),
        pa.field("n_keys_a", pa.int64()), pa.field("n_keys_b", pa.int64()),
        pa.field("n_common", pa.int64()),
        pa.field("jaccard_millionths", pa.int64()),
        pa.field("n_added", pa.int64()), pa.field("n_removed", pa.int64()),
    ])
    by_day: dict[int, set] = {}
    for d, k in zip(dk["day"].to_pylist(), dk["key"].to_pylist()):
        by_day.setdefault(int(d), set()).add(k)
    days = sorted(by_day)
    if len(days) < 2:
        return out_schema.empty_table()
    rows = []
    for a, b in zip(days, days[1:]):
        ka, kb = by_day[a], by_day[b]
        common = len(ka & kb)
        union = len(ka) + len(kb) - common
        rows.append((a, b, len(ka), len(kb), common,
                     10**6 * common // union,
                     len(kb) - common, len(ka) - common))
    cols = list(zip(*rows))
    return pa.table({f.name: pa.array(list(c), f.type)
                     for f, c in zip(out_schema, cols)})


def json_schema_drift_sql(src_col: str = "props", ts_col: str = "ts",
                          table: str = "events") -> str:
    return f"""
WITH dk AS MATERIALIZED (
  SELECT DISTINCT
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    unnest(json_keys({src_col})) AS key
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {src_col} IS NOT NULL
), days AS MATERIALIZED (
  SELECT day, row_number() OVER (ORDER BY day) AS rn
  FROM (SELECT DISTINCT day FROM dk)
), pr AS (
  SELECT a.day AS day_a, b.day AS day_b
  FROM days a JOIN days b ON b.rn = a.rn + 1
), cnt AS MATERIALIZED (
  SELECT day, CAST(count(*) AS BIGINT) AS nk FROM dk GROUP BY 1
), com AS (
  SELECT p.day_a, p.day_b, CAST(count(*) AS BIGINT) AS c
  FROM pr p
  JOIN dk a ON a.day = p.day_a
  JOIN dk b ON b.day = p.day_b AND b.key = a.key
  GROUP BY 1, 2
)
SELECT p.day_a, p.day_b, ca.nk AS n_keys_a, cb.nk AS n_keys_b,
  COALESCE(com.c, 0) AS n_common,
  CAST((1000000 * COALESCE(com.c, 0))
       // (ca.nk + cb.nk - COALESCE(com.c, 0)) AS BIGINT)
    AS jaccard_millionths,
  cb.nk - COALESCE(com.c, 0) AS n_added,
  ca.nk - COALESCE(com.c, 0) AS n_removed
FROM pr p
JOIN cnt ca ON ca.day = p.day_a
JOIN cnt cb ON cb.day = p.day_b
LEFT JOIN com ON com.day_a = p.day_a AND com.day_b = p.day_b
ORDER BY p.day_a
""".strip()


# ------------------------------------- record_transformer (fluentd)

# computed-field mini-language — the vectorizable core of fluentd's
# filter_record_transformer (reference-adjacent: fluentd's
# record_transformer templates `${record["x"]}`; here each add is a
# declared op so both the engine map and the SQL mirror generate from
# ONE spec):
#   ("len", col)                 → character length (NULL-propagating)
#   ("hour", ts_col)             → hour-of-day of a timestamp
#   ("segment", col, delim, i)   → i-th delim-segment (NULL when absent)
#   ("concat", [col_a, col_b], sep) → a ∥ sep ∥ b (NULL if either NULL)
#   ("const", value)             → constant string

def record_transform(ds, add: dict[str, tuple] | None = None,
                     rename: dict[str, str] | None = None,
                     remove: list[str] | None = None):
    """Declarative add/rename/remove record reshaping — fluentd's
    ``filter_record_transformer`` as ONE zero-copy ``map_batches``
    stage: every computed field is a vectorized Arrow/pandas kernel,
    adds append in spec order, renames and removals are pure schema
    ops. Returns a Dataset."""
    import pandas as pd

    add = dict(add or {})
    rename = dict(rename or {})
    remove = list(remove or [])

    def apply(t: pa.Table) -> pa.Table:
        for name, spec in add.items():
            op = spec[0]
            if op == "len":
                col = pc.cast(pc.utf8_length(t[spec[1]]), pa.int64())
            elif op == "hour":
                col = pc.cast(pc.hour(t[spec[1]]), pa.int64())
            elif op == "segment":
                _, src, delim, idx = spec
                s = t[src].to_pandas().str.split(delim, regex=False).str[idx]
                col = pa.array(s.where(pd.notna(s), None), pa.string())
            elif op == "concat":
                _, srcs, sep = spec
                col = pc.binary_join_element_wise(
                    *[pc.cast(t[c], pa.string()) for c in srcs], sep)
            elif op == "const":
                col = pa.array([spec[1]] * len(t), pa.string())
            else:
                raise ValueError(f"record_transform: unknown op {op!r}")
            t = t.append_column(name, col)
        for old, new in rename.items():
            t = t.rename_columns([new if c == old else c
                                  for c in t.column_names])
        if remove:
            t = t.drop_columns(remove)
        return t

    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True)


def record_transform_select_sql(input_cols: list[str],
                                add: dict[str, tuple] | None = None,
                                rename: dict[str, str] | None = None,
                                remove: list[str] | None = None) -> str:
    """The SELECT list mirroring :func:`record_transform` over the same
    input columns — generated from the SAME spec so the two can't
    drift."""
    add = dict(add or {})
    rename = dict(rename or {})
    remove = set(remove or [])
    cols = []
    for c in input_cols:
        if c in remove:
            continue
        cols.append(f"{c} AS {rename[c]}" if c in rename else c)
    for name, spec in add.items():
        op = spec[0]
        if op == "len":
            expr = f"CAST(length({spec[1]}) AS BIGINT)"
        elif op == "hour":
            expr = f"CAST(hour({spec[1]}) AS BIGINT)"
        elif op == "segment":
            _, src, delim, idx = spec
            expr = f"string_split({src}, '{delim}')[{idx + 1}]"
        elif op == "concat":
            _, srcs, sep = spec
            expr = f" || '{sep}' || ".join(
                f"CAST({c} AS VARCHAR)" for c in srcs)
        elif op == "const":
            expr = f"'{spec[1]}'"
        else:
            raise ValueError(f"record_transform_select_sql: {op!r}")
        cols.append(f"{expr} AS {name}")
    return ", ".join(cols)
