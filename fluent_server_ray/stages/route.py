"""Tag-match router: fluentd ``<match>`` first-match-wins semantics.

The reference routes every event through a single configured handler
(reference ``defaultreader/reader.go:22,48,71,99``) while its client
configs show the general tag-``Match`` pattern language
(reference ``contrib/config/A.cfg`` ``[OUTPUT] Match *``, ``B.cfg``,
``C.cfg``). This module implements the full fluentd match-pattern
semantics over the derived ``tag`` column:

- patterns are ordered; the FIRST matching pattern wins;
- ``*`` matches exactly one dotted tag part (``a.*`` matches ``a.b``
  but not ``a.b.c`` nor ``a``);
- ``**`` matches zero or more parts (``a.**`` matches ``a``, ``a.b``,
  ``a.b.c``); bare ``**`` matches everything;
- unmatched rows fall through to the ``reject.unmatched`` sink,
  invalid rows (failed arity guards ≙ reference
  ``message/session.go:139-147``) always go to ``reject.invalid``.

Patterns compile once (per actor) to anchored RE2 regexes; routing is
vectorized: one ``match_substring_regex`` pass per pattern over the
still-unassigned rows — O(patterns) kernel calls per batch, no Python
row loop. ``routes_sql_case`` emits the equivalent DuckDB ``CASE``
expression *from the same compiled regexes*, so the SQL oracle and the
Ray stage cannot drift.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

UNMATCHED_SINK = "reject.unmatched"
INVALID_SINK = "reject.invalid"

# Default route table for the flagship pipeline. Ordered, first match
# wins; overlapping patterns (tool.*.search before tool.**) pin the
# first-match semantics; ** is the catch-all (≙ `Match *` in
# contrib/config/A.cfg).
DEFAULT_ROUTES: list[tuple[str, str]] = [
    ("err.**", "errors"),
    ("tool.*.search", "search_tools"),
    ("tool.**", "tools"),
    ("msg.user", "user_msgs"),
    ("**", "catchall"),
]


def glob_to_regex(pattern: str) -> str:
    """fluentd match glob → anchored RE2 regex (shared by Ray + SQL oracle).

    A pattern already starting with ``^`` is treated as a raw anchored
    regex and passed through verbatim — the escape hatch used by the
    fluent-bit config loader (``config.parse_fluentbit_outputs``), whose
    ``Match`` wildcards (``*`` = any characters, not one dotted part)
    don't fit fluentd glob semantics."""
    if pattern.startswith("^"):
        return pattern
    parts = pattern.split(".")
    # consecutive '**' parts are semantically one (zero-or-more twice);
    # collapsing them keeps the translation below correct ('**.**')
    collapsed: list[str] = []
    for p in parts:
        if p == "**" and collapsed and collapsed[-1] == "**":
            continue
        collapsed.append(p)
    if collapsed == ["**"]:
        return "^.*$"
    return "^" + _join(collapsed) + "$"


def _join(parts: list[str]) -> str:
    """Compose regex for dotted glob parts with correct separators."""
    segs: list[str] = []
    n = len(parts)
    for i, part in enumerate(parts):
        last = i == n - 1
        if part == "**":
            if last:
                segs.append("(?:\\..*)?" if segs else ".*")
            else:
                segs.append("\\.(?:[^.]+\\.)*" if segs else "(?:[^.]+\\.)*")
            continue
        body = "[^.]+" if part == "*" else re.escape(part)
        prev_dstar = i > 0 and parts[i - 1] == "**"
        if segs and not prev_dstar:
            segs.append("\\.")
        segs.append(body)
    return "".join(segs)


class RouteStage:
    """Callable class: compiles the route table once per actor
    (≙ per-session reader factory, reference ``message/session.go:57-60``),
    then assigns a ``sink`` column per batch, first match wins.
    """

    def __init__(self, routes: list[tuple[str, str]] | None = None) -> None:
        routes = routes if routes is not None else DEFAULT_ROUTES
        self.compiled: list[tuple[str, str]] = [
            (glob_to_regex(p), sink) for p, sink in routes
        ]

    def route_values(self, tags: pa.Array) -> pa.Array:
        """First-match routing of a (small) array of tag values."""
        n = len(tags)
        sink = pa.nulls(n, pa.string())
        unassigned = pa.array([True] * n) if n else pa.array([], type=pa.bool_())
        for regex, sink_name in self.compiled:
            hit = pc.and_(unassigned, pc.match_substring_regex(tags, regex))
            sink = pc.if_else(hit, pa.scalar(sink_name), sink)
            unassigned = pc.and_(unassigned, pc.invert(hit))
        return pc.fill_null(sink, UNMATCHED_SINK)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tag = pc.fill_null(batch["tag"], "")
        # tag cardinality ≪ row count in a log stream: dictionary-encode
        # and run the pattern regexes over the DISTINCT tags only, then
        # broadcast the verdicts back through the indices — O(uniques ×
        # patterns) instead of O(rows × patterns)
        if isinstance(tag, pa.ChunkedArray):
            tag = tag.combine_chunks()
        enc = pc.dictionary_encode(tag)
        sink_per_value = self.route_values(enc.dictionary)
        sink = pc.take(sink_per_value, enc.indices)
        if "is_valid" in batch.column_names:
            sink = pc.if_else(batch["is_valid"], sink, pa.scalar(INVALID_SINK))
        return batch.append_column("sink", sink)


def routes_sql_case(routes: list[tuple[str, str]] | None = None) -> str:
    """DuckDB CASE expression equivalent to :class:`RouteStage`, built
    from the SAME compiled regexes (single source of truth).

    Uses ``regexp_matches`` (substring semantics) on the UNSTRIPPED
    pattern — exactly what the engine's ``match_substring_regex``
    evaluates. Generated glob patterns are '^...$'-anchored so the
    semantics coincide with a full match; raw-regex escape-hatch
    patterns (leading '^', any anchor shape) pass through verbatim
    instead of having their first/last characters stripped. The tag is
    COALESCEd to '' to mirror the engine's ``fill_null`` (a NULL tag
    routes to the catchall, not the reject sink)."""
    routes = routes if routes is not None else DEFAULT_ROUTES
    whens = []
    for pattern, sink in routes:
        rx = glob_to_regex(pattern).replace("'", "''")
        whens.append(
            f"WHEN regexp_matches(COALESCE(tag, ''), '{rx}') THEN '{sink}'"
        )
    return (
        "CASE WHEN NOT is_valid THEN 'reject.invalid' "
        + " ".join(whens)
        + f" ELSE '{UNMATCHED_SINK}' END"
    )


def apply_route(ds, routes: list[tuple[str, str]] | None = None,
                batch_size: int = 32768, concurrency=None):
    """Filter heartbeats (consumed, produce nothing — reference
    ``message/session.go:124-137``) then assign sinks via an actor-pool
    stage. The heartbeat filter is fused into the routing batch fn (one
    pass, no extra stage)."""
    if concurrency is None:
        from fluent_server_ray.stages.enrich import pool_limits

        concurrency = pool_limits()

    class RouteAndFilter(RouteStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.invert(batch["is_heartbeat"]))
            return super().__call__(batch)

    return ds.map_batches(
        RouteAndFilter,
        fn_constructor_kwargs={"routes": routes},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def retag(ds, rules: list[tuple[str, str]], tag_col: str = "tag"):
    """fluentd ``rewrite_tag_filter`` semantics: the FIRST rule whose
    RE2 pattern matches the tag rewrites it (one replacement, \\1
    backrefs supported); unmatched tags pass through unchanged. Pure
    vectorized per-batch kernel — one ``match_substring_regex`` +
    masked ``replace_substring_regex`` per rule, no shuffle, no
    Python row loop. Patterns/replacements are shared verbatim with
    the SQL mirror's CASE chain."""

    def fn(t: pa.Table) -> pa.Table:
        tag = t[tag_col]
        decided = pa.array([False] * len(t), type=pa.bool_())
        result = tag
        for rx, repl in rules:
            m = pc.fill_null(pc.match_substring_regex(tag, rx), False)
            apply = pc.and_(m, pc.invert(decided))
            replaced = pc.replace_substring_regex(
                tag, pattern=rx, replacement=repl, max_replacements=1
            )  # ONE replacement = DuckDB regexp_replace's default
            result = pc.if_else(apply, replaced, result)
            decided = pc.or_(decided, m)
        idx = t.column_names.index(tag_col)
        return t.set_column(idx, tag_col, result)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def retag_case_sql(rules: list[tuple[str, str]],
                   tag_col: str = "tag") -> str:
    """The CASE expression mirroring :func:`retag` (first match wins),
    to be SELECTed in place of the tag column."""
    def esc(s: str) -> str:
        return s.replace("'", "''")

    branches = "\n       ".join(
        f"WHEN regexp_matches({tag_col}, '{esc(rx)}') "
        f"THEN regexp_replace({tag_col}, '{esc(rx)}', '{esc(repl)}')"
        for rx, repl in rules
    )
    return f"CASE {branches}\n       ELSE {tag_col} END"


def copy_route(ds, routes: list[tuple[str, str]], tag_col: str = "tag"):
    """fluentd ``copy``-output fan-out: one output row per (input row,
    MATCHING route) — every route whose pattern matches gets a copy
    (the multi-store ``<match> @type copy`` shape), unlike
    :class:`RouteStage`'s first-match-wins. A row matching nothing
    falls through to ``reject.unmatched`` exactly once.

    Vectorized like the router: patterns evaluate over the
    dictionary-encoded DISTINCT tags only; each route contributes one
    filtered slice per batch (output size is the fan-out — the
    operator's purpose — but pattern work stays O(uniques×patterns)).
    """
    compiled = [(glob_to_regex(p), sink) for p, sink in routes]

    def fn(t: pa.Table) -> pa.Table:
        tag = pc.fill_null(t[tag_col], "")
        if isinstance(tag, pa.ChunkedArray):
            tag = tag.combine_chunks()
        enc = pc.dictionary_encode(tag)
        parts = []
        matched = pa.array(np.zeros(len(t), dtype=bool))
        for rx, sink in compiled:
            hit_u = pc.match_substring_regex(enc.dictionary, rx)
            hit = pc.fill_null(pc.take(hit_u, enc.indices), False)
            sub = t.filter(hit)
            if sub.num_rows:
                parts.append(sub.append_column(
                    "sink", pa.array([sink] * sub.num_rows,
                                     type=pa.string())
                ))
            matched = pc.or_(matched, hit)
        un = t.filter(pc.invert(matched))
        if un.num_rows:
            parts.append(un.append_column(
                "sink", pa.array([UNMATCHED_SINK] * un.num_rows,
                                 type=pa.string())
            ))
        if not parts:
            return t.slice(0, 0).append_column(
                "sink", pa.array([], type=pa.string())
            )
        return pa.concat_tables(parts)

    from fluent_server_ray.stages.aggregate import skip_empty

    return ds.map_batches(skip_empty(fn), batch_format="pyarrow",
                          zero_copy_batch=True)


def copy_route_sql(routes: list[tuple[str, str]], tag_col: str = "tag",
                   source: str = "routed",
                   cols: str = "conv_id, turn_idx, tag") -> str:
    """Per-route UNION ALL mirror built from the SAME compiled regexes
    (single source of truth with the engine)."""
    def esc(rx: str) -> str:
        return glob_to_regex(rx).replace("'", "''")

    t = f"COALESCE({tag_col}, '')"
    selects = [
        f"SELECT {cols}, '{sink}' AS sink FROM {source} "
        f"WHERE regexp_matches({t}, '{esc(p)}')"
        for p, sink in routes
    ]
    none = " AND ".join(
        f"NOT regexp_matches({t}, '{esc(p)}')" for p, _ in routes
    )
    selects.append(
        f"SELECT {cols}, '{UNMATCHED_SINK}' AS sink FROM {source} "
        f"WHERE {none}"
    )
    return "\nUNION ALL\n".join(selects)
