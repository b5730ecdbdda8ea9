"""Vectorized grok/regex parse stage.

The Ray-native restatement of the reference's per-session frame parsing
(reference ``message/session.go:79-122`` dispatcher,
``message/mode.go:11-54`` mode dispatch, ``message/entry.go:11-35``
entry decode, ``defaultreader/reader.go:79-115`` forward-mode reader):
instead of peeking msgpack codes per event on a socket, one
``map_batches`` stage runs RE2 kernels (``pyarrow.compute``) over the
whole ``text`` column of a zero-copy Arrow batch and emits the parsed
struct columns:

- ``parsed_tool``  — tool name from ``CALL tool=<name> ...``
- ``error_code``   — 3-digit code from ``ERR-<nnn>``
- ``msg``          — payload word from ``msg=<word>``
- ``is_heartbeat`` — empty-text rows ≙ msgpack nil heartbeat frames
  (reference ``message/session.go:124-137``; consumed, never routed)
- ``is_valid``     — null ``conv_id``/``text`` ≙ malformed frames
  (arity guards, reference ``message/session.go:139-147``); invalid
  rows flow to the reject sink, mirroring the reference's error reply
  rather than a crash
- ``kind``         — ``tool`` | ``err`` | ``msg`` (the parse branch that
  fired, ≙ mode dispatch in ``message/mode.go:11-54``)
- ``tag``          — derived dotted routing key
  ``<kind>.<role>[.<parsed_tool>]``, mirroring client-side tag
  assignment (reference ``contrib/js/index.js:4,21,34`` tag prefixing)

``ParseStage`` is a callable class so per-actor setup happens once per
worker (≙ the per-session reader factory, reference
``message/session.go:57-60``); the regex kernels themselves are RE2,
identical semantics to DuckDB's ``regexp_extract`` — the SQL mirror is
:data:`PARSE_SQL_CTES`.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TOOL_RE = r"CALL tool=(\w+)"
ERR_RE = r"ERR-([0-9]{3})"
MSG_RE = r"msg=([^ ]+)"

# DuckDB mirror (composes on top of a `transcripts` CTE).
PARSE_SQL_CTES = f"""
parsed0 AS (
  SELECT conv_id, turn_idx, role, tool, text, ts,
    COALESCE(regexp_extract(text, 'CALL tool=(\\w+)', 1), '') AS parsed_tool,
    COALESCE(regexp_extract(text, 'ERR-([0-9]{{3}})', 1), '') AS error_code,
    COALESCE(regexp_extract(text, 'msg=([^ ]+)', 1), '') AS msg,
    COALESCE(text = '', FALSE) AS is_heartbeat,
    conv_id IS NOT NULL AND text IS NOT NULL AS is_valid
  FROM transcripts
),
parsed AS (
  SELECT *,
    CASE WHEN parsed_tool <> '' THEN 'tool'
         WHEN error_code <> '' THEN 'err'
         ELSE 'msg' END AS kind,
    CASE WHEN parsed_tool <> '' THEN 'tool.' || role || '.' || parsed_tool
         WHEN error_code <> '' THEN 'err.' || role
         ELSE 'msg.' || role END AS tag
  FROM parsed0
)
""".strip()


def _extract(text: pa.ChunkedArray | pa.Array, pattern: str, group: str) -> pa.Array:
    """regexp_extract with DuckDB semantics ('' when no match or null input)."""
    named = pattern.replace("(", f"(?P<{group}>", 1)
    hit = pc.struct_field(pc.extract_regex(text, named), group)
    return pc.fill_null(hit, "")


def parse_batch(batch: pa.Table, columns: list[str] | None = None) -> pa.Table:
    """Arrow in → Arrow out; no Python row loops.

    ``columns=None``: full output (input cols + all 7 parsed cols).
    ``columns=[...]``: projected fast path — only the kernels whose
    outputs are (transitively) requested run, and only the requested
    columns survive, which cuts bytes/row through every downstream
    copy (filter, shuffle). ``tag`` pulls in the tool/err extracts;
    ``msg`` / ``kind`` are skipped unless asked for. Same kernels, same
    values — parity with the full path is pinned in tests.
    """
    # accept dictionary-encoded string inputs (the compact-read path:
    # `read_dictionary=` keeps low-cardinality columns dict-encoded
    # through parquet decode and the read→process plasma hop; decode
    # ONCE here, where the string kernels need flat arrays)
    for i, f in enumerate(batch.schema):
        if pa.types.is_dictionary(f.type):
            batch = batch.set_column(
                i, f.name, pc.cast(batch[f.name], f.type.value_type)
            )
    text = batch["text"]
    role = batch["role"]
    need = None if columns is None else set(columns)

    def wanted(*names: str) -> bool:
        return need is None or bool(need.intersection(names))

    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for name in batch.column_names:
        if need is None or name in need:
            cols[name] = batch[name]

    need_tag = wanted("tag")
    parsed_tool = error_code = None
    if need_tag or wanted("parsed_tool", "kind"):
        parsed_tool = _extract(text, TOOL_RE, "t")
    if need_tag or wanted("error_code", "kind"):
        error_code = _extract(text, ERR_RE, "e")
    if wanted("parsed_tool"):
        cols["parsed_tool"] = parsed_tool
    if wanted("error_code"):
        cols["error_code"] = error_code
    if wanted("msg"):
        cols["msg"] = _extract(text, MSG_RE, "m")
    if wanted("is_heartbeat"):
        # null text is a MALFORMED frame (reject sink), not a heartbeat —
        # only a genuinely empty text is the nil-frame analogue
        cols["is_heartbeat"] = pc.fill_null(pc.equal(text, ""), False)
    if wanted("is_valid"):
        cols["is_valid"] = pc.and_(
            pc.is_valid(batch["conv_id"]), pc.is_valid(text)
        )

    if parsed_tool is not None:
        has_tool = pc.not_equal(parsed_tool, "")
    if error_code is not None:
        has_err = pc.not_equal(error_code, "")
    if wanted("kind"):
        cols["kind"] = pc.if_else(
            has_tool,
            pa.scalar("tool"),
            pc.if_else(has_err, pa.scalar("err"), pa.scalar("msg")),
        )
    if need_tag:
        role_f = pc.fill_null(role, "")
        cols["tag"] = pc.if_else(
            has_tool,
            pc.binary_join_element_wise("tool.", role_f, ".", parsed_tool, ""),
            pc.if_else(
                has_err,
                pc.binary_join_element_wise("err.", role_f, ""),
                pc.binary_join_element_wise("msg.", role_f, ""),
            ),
        )
    return pa.table(cols)


class ParseStage:
    """Callable-class form for ``map_batches(ParseStage, concurrency=N)``.

    Setup-once-per-actor slot (≙ reader factory per session, reference
    ``options/options.go:29-35``); the body is :func:`parse_batch`.
    """

    def __init__(self) -> None:
        # RE2 patterns are compiled lazily by Arrow's kernel cache; this
        # __init__ exists as the per-worker setup hook for subclasses
        # (custom grammars load their pattern tables here).
        self.patterns = (TOOL_RE, ERR_RE, MSG_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return parse_batch(batch)


def apply_parse(ds, batch_size: int = 32768, concurrency=None):
    """Attach the parse stage to a Dataset (zero-copy Arrow batches)."""
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        parse_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        **kwargs,
    )
