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
    # positional group -> named group (first '(' that isn't '(?')
    return pattern_body.replace("(", f"(?P<{col}>", 1)


def extract_fields(ds, fields=PROPS_FIELDS, src_col: str = "props",
                   id_cols: tuple[str, ...] = ("event_id",)):
    """Extract typed columns from a string payload column. Output:
    id cols + one typed column per field (NULL where the pattern does
    not match). Embarrassingly parallel — a pure map stage."""

    def fn(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in id_cols}
        src = t[src_col]
        for col, body, typ, _ in fields:
            st = pc.extract_regex(src, _named(body, col))
            cols[col] = pc.cast(pc.struct_field(st, col), typ)
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
