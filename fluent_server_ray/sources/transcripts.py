"""Transcript-turn source.

The engine's primary input is a Parquet table of multi-turn
conversation / agent transcripts with columns
``(conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp)`` — one row per turn ≙ one reference
*event* (reference ``message/message.go:11-15``: ``(tag, ts, record)``;
the tag is derived later by parsing, reference
``defaultreader/reader.go:86-96``).

Two ways to obtain such a table:

1. ``read_transcripts(path)`` — read an existing transcripts Parquet
   (produced by :mod:`fluent_server_ray.sources.synth` or by a user).

2. ``read_transcripts(sf_dir)`` pointed at a driver testdata dir —
   derives a deterministic transcripts table **row-wise** from the
   shared ``events`` table. The exact same derivation is expressed as
   the DuckDB SQL CTE :data:`TRANSCRIPTS_SQL_CTE`, so an independent
   SQL oracle can reproduce the input bit-for-bit. Every expression is
   integer/string-only (no float formatting) so Arrow and DuckDB agree
   byte-for-byte.

Derivation spec (row-wise over
``events(event_id, ts, user_id, event_type, value, props)``):

- ``conv_id  = 'conv-' || user_id``
- ``turn_idx = int32(event_id)`` (unique, monotone per conv; stable
  order key — density is not required by any downstream semantics)
- ``role     = ROLES[(event_id + user_id) % 4]``
- ``m = event_id % 10`` selects the text template:
    - ``m < 3``  → tool call   ``CALL tool=<t> args={"q":"<event_type>"}``
    - ``m in (3,4)`` → error   ``ERR-<nnn> <event_type> failed``
    - ``m == 5`` → empty text  (heartbeat ≙ msgpack nil frame,
      reference ``message/session.go:124-137``)
    - else       → message     ``msg=<event_type> user=<u> k=<k>``
- ``tool = TOOLS[(event_id // 10) % 3]`` for tool-call rows else ``''``
- ``ts`` passed through unchanged.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("search", "bash", "browser")

TRANSCRIPT_SCHEMA_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# DuckDB mirror of derive_transcripts_batch. Keep in lockstep — the
# equality is pinned by tests/test_pipeline_oracle.py (parse/route
# stages vs the TRANSCRIPTS_SQL_CTE mirror) and tests/test_properties.py.
TRANSCRIPTS_SQL_CTE = """
transcripts AS (
  SELECT
    'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
    CAST(event_id AS INTEGER) AS turn_idx,
    CASE (event_id + user_id) % 4
      WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
      WHEN 2 THEN 'system' ELSE 'tool' END AS role,
    CASE
      WHEN event_id % 10 < 3 THEN
        'CALL tool=' ||
        CASE (event_id // 10) % 3
          WHEN 0 THEN 'search' WHEN 1 THEN 'bash' ELSE 'browser' END ||
        ' args={"q":"' || event_type || '"}'
      WHEN event_id % 10 < 5 THEN
        'ERR-' || lpad(CAST(event_id % 1000 AS VARCHAR), 3, '0') ||
        ' ' || event_type || ' failed'
      WHEN event_id % 10 = 5 THEN ''
      ELSE
        'msg=' || event_type || ' user=' || CAST(user_id AS VARCHAR) ||
        ' k=' || CAST(event_id % 7 AS VARCHAR)
    END AS text,
    CASE WHEN event_id % 10 < 3 THEN
      CASE (event_id // 10) % 3
        WHEN 0 THEN 'search' WHEN 1 THEN 'bash' ELSE 'browser' END
    ELSE '' END AS tool,
    ts
  FROM events
)
""".strip()


def _mod(arr, n: int):
    """Integer modulo for non-negative ints (pyarrow 16 lacks pc.modulo;
    integer pc.divide truncates, so sub(x, mul(div(x,n), n)) is exact)."""
    return pc.subtract(arr, pc.multiply(pc.divide(arr, n), n))


def _floordiv(arr, n: int):
    return pc.divide(arr, n)


def _take_vocab(vocab: tuple[str, ...], idx: pa.Array) -> pa.Array:
    """Vectorized vocab[i] via dictionary take (no Python row loop)."""
    return pc.take(pa.array(vocab, type=pa.string()), pc.cast(idx, pa.int64()))


def _int_str(arr) -> pa.Array:
    return pc.cast(arr, pa.string())


def derive_transcripts_batch(batch: pa.Table) -> pa.Table:
    """events batch (Arrow) → transcripts batch (Arrow). Zero Python row loops.

    Mirrors :data:`TRANSCRIPTS_SQL_CTE` exactly.
    """
    eid = batch["event_id"]
    uid = batch["user_id"]
    etype = batch["event_type"]

    conv_id = pc.binary_join_element_wise("conv-", _int_str(uid), "")
    turn_idx = pc.cast(eid, pa.int32())
    role = _take_vocab(ROLES, _mod(pc.add(eid, uid), 4))

    m = _mod(eid, 10)
    tool_name = _take_vocab(TOOLS, _mod(_floordiv(eid, 10), 3))
    is_tool = pc.less(m, 3)
    tool = pc.if_else(is_tool, tool_name, "")

    call_text = pc.binary_join_element_wise(
        "CALL tool=", tool_name, ' args={"q":"', etype, '"}', ""
    )
    err_text = pc.binary_join_element_wise(
        "ERR-",
        pc.utf8_lpad(_int_str(_mod(eid, 1000)), 3, "0"),
        " ",
        etype,
        " failed",
        "",
    )
    msg_text = pc.binary_join_element_wise(
        "msg=", etype, " user=", _int_str(uid), " k=", _int_str(_mod(eid, 7)), ""
    )
    text = pc.if_else(
        is_tool,
        call_text,
        pc.if_else(
            pc.less(m, 5),
            err_text,
            pc.if_else(pc.equal(m, 5), pa.scalar("", type=pa.string()), msg_text),
        ),
    )

    cols = {
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
    }
    if "ts" in batch.column_names:  # absent when pruned at the read
        cols["ts"] = batch["ts"]
    return pa.table(cols)


def read_transcripts(path: str, columns: list[str] | None = None,
                     **read_kwargs):
    """Return a ``ray.data.Dataset`` of transcript turns.

    - ``path`` ending in ``.parquet`` or a dir of transcript parquet →
      read directly (column-pruned to the transcript schema, or to
      ``columns`` — prune-at-the-read: a counts-only consumer that
      never touches ``ts``/``turn_idx`` should not decode them).
    - a driver testdata dir containing ``events.parquet`` → read the
      events table (only the needed columns leave storage) and derive
      transcripts via one zero-copy ``map_batches``.

    ``**read_kwargs`` pass through to ``ray.data.read_parquet`` — in
    particular ``filesystem=`` carries an authenticated
    ``pyarrow.fs.FileSystem`` (S3 credentials, mTLS-fronted object
    store): the engine's analogue of the reference's TLS listener
    credentials (``server/tls.go:9-38`` — transport auth happens at the
    storage layer here, not per connection).
    """
    from fluent_server_ray.sources.pq import read_parquet_clean

    events = os.path.join(path, "events.parquet")
    if os.path.isdir(path) and os.path.exists(events):
        ev_cols = ["event_id", "user_id", "event_type"]
        if columns is None or "ts" in columns:
            ev_cols.append("ts")
        ds = read_parquet_clean(events, columns=ev_cols, **read_kwargs)

        def derive(batch: pa.Table) -> pa.Table:
            out = derive_transcripts_batch(batch)
            return out.select(columns) if columns is not None else out

        return ds.map_batches(
            derive, batch_format="pyarrow", zero_copy_batch=True
        )
    return read_parquet_clean(path, columns=columns or TRANSCRIPT_SCHEMA_COLS,
                           **read_kwargs)


def _coerce_transcripts(want: list[str]):
    """Batch fn coercing an inferred-schema source (JSONL / CSV) to the
    canonical transcript schema in one vectorized cast pass — one
    shared contract so downstream stages see bit-identical input
    regardless of wire format. ``ts`` accepts ISO-8601 strings (zone
    offsets normalize to UTC wall time) or numeric epoch SECONDS (the
    fluentd ``time`` convention; fractional seconds kept to µs).
    Missing keys raise; extra keys are dropped."""
    target = {
        "conv_id": pa.string(), "turn_idx": pa.int32(),
        "role": pa.string(), "text": pa.string(), "tool": pa.string(),
        "ts": pa.timestamp("us"),
    }

    def coerce(t: pa.Table) -> pa.Table:
        missing = [c for c in want if c not in t.column_names]
        if missing:
            raise ValueError(
                f"transcript record lacks keys {missing}; "
                f"got {t.column_names}"
            )
        cols = {}
        for c in want:
            arr = t[c]
            ty = target[c]
            if pa.types.is_timestamp(ty) and not pa.types.is_timestamp(
                    arr.type):
                if pa.types.is_integer(arr.type) or pa.types.is_floating(
                        arr.type):
                    # numeric epoch = SECONDS (a bare int64→timestamp
                    # cast would reinterpret them as µs and silently
                    # produce 1970 dates)
                    us = pc.round(pc.multiply(
                        pc.cast(arr, pa.float64()), 1_000_000.0))
                    arr = pc.cast(pc.cast(us, pa.int64()), ty)
                else:
                    # ISO-8601: Arrow's cast handles fractional seconds
                    # (strptime's %f doesn't) but rejects zone offsets
                    # on a naive target — normalize via tz=UTC
                    try:
                        arr = pc.cast(arr, ty)
                    except pa.ArrowInvalid:
                        arr = pc.cast(
                            pc.cast(arr, pa.timestamp(ty.unit, tz="UTC")),
                            ty,
                        )
            elif arr.type != ty:
                arr = pc.cast(arr, ty)
            cols[c] = arr
        return pa.table(cols)

    return coerce


def read_transcripts_csv(path: str, columns: list[str] | None = None,
                         **read_kwargs):
    """Transcript turns from CSV with a header row — the fluentd
    ``in_tail`` + csv-parser ingestion format (one record per line,
    ``keys`` from the header). NULL vs empty string follows the only
    convention CSV can express both under: an UNQUOTED empty field is
    NULL (the Parquet source's null ``tool``), a QUOTED ``""`` is the
    empty string (heartbeat turns have empty ``text``) — i.e. write
    with QUOTE_NONNUMERIC. The batch is coerced to the canonical
    transcript schema by the same shared cast pass as the JSONL source
    (:func:`_coerce_transcripts`) — conv_id/role/text/tool:string,
    turn_idx:int32, ts:timestamp[us] from ISO-8601 or epoch seconds."""
    from pyarrow import csv as pacsv
    import ray.data as rd

    read_kwargs.setdefault(
        "convert_options",
        pacsv.ConvertOptions(strings_can_be_null=True,
                             quoted_strings_can_be_null=False),
    )
    ds = rd.read_csv(path, **read_kwargs)
    want = columns or TRANSCRIPT_SCHEMA_COLS
    return ds.map_batches(_coerce_transcripts(want), batch_format="pyarrow",
                          zero_copy_batch=True)


def read_transcripts_jsonl(path: str, columns: list[str] | None = None,
                           **read_kwargs):
    """Transcript turns from newline-delimited JSON — the fluentd-side
    ingestion format (``in_tail`` + json parser emits one JSON record
    per line; reference deployments front the forward protocol with
    exactly such tails). One record per turn with the transcript
    schema's keys; ``ts`` as an ISO-8601 string (with or without a
    zone offset — offsets normalize to UTC wall time) or a numeric
    epoch in SECONDS (the fluentd ``time`` convention; fractional
    seconds kept to µs).

    Arrow's JSON reader infers per-block types, so the batch is coerced
    to the canonical transcript schema (conv_id/role/text/tool:string,
    turn_idx:int32, ts:timestamp[us]) in one vectorized cast pass —
    downstream stages see bit-identical input whether the turns arrived
    as Parquet or JSONL. Missing keys raise; extra keys are dropped."""
    import ray.data as rd

    ds = rd.read_json(path, **read_kwargs)
    want = columns or TRANSCRIPT_SCHEMA_COLS
    return ds.map_batches(_coerce_transcripts(want), batch_format="pyarrow",
                          zero_copy_batch=True)
