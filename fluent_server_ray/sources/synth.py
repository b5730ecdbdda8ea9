"""Deterministic synthetic transcripts generator (seeded, no external data).

Produces the engine's primary input shape at arbitrary scale:
``(conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp[us])`` — dense ``turn_idx`` per
conversation, Zipf-skewed conversation lengths (hot ``conv_id`` keys to
exercise salted repartitioning), and a ``text`` grammar embedding the
structures the parse stage extracts:

- plain message ``msg=<word> ...`` ≙ reference golden records
  ``{"message":"foo"}`` (reference ``message/session_test.go:142-144``)
- tool invocation ``CALL tool=<name> args={...}``
- error marker ``ERR-<nnn> <word> failed``
- empty text ≙ heartbeat frames (reference ``message/session.go:124-137``)
- a small fraction of null text / null conv_id rows ≙ malformed frames
  (arity guards, reference ``message/session.go:139-147``) — these must
  land in the reject sink.

Timestamps start at the reference's golden epoch ``1441588984``
(reference ``message/entry_test.go:26,30``) with deterministic per-turn
increments; a mix of second-aligned and microsecond-offset values
mirrors the reference's dual second/EventTime encodings
(reference ``message/time.go:19-53``).

Generation is vectorized numpy; writing shards the output into
``n_files`` Parquet files so downstream file-level lineage/resume has
real shards to work with.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fluent_server_ray.sources.transcripts import ROLES, TOOLS

WORDS = ("foo", "bar", "beuha", "aussi", "magic", "follow", "bof", "hello", "world")
GOLDEN_EPOCH_S = 1441588984  # reference message/entry_test.go:26


def generate_transcripts(
    out_dir: str,
    n_convs: int = 200,
    mean_turns: int = 10,
    seed: int = 42,
    n_files: int = 4,
    zipf_a: float = 1.5,
    frac_bad: float = 0.002,
) -> list[str]:
    """Write a deterministic transcripts corpus; return the file paths."""
    rng = np.random.default_rng(seed)

    turns_per_conv = np.minimum(
        rng.zipf(zipf_a, size=n_convs) * max(1, mean_turns // 3), mean_turns * 200
    ).astype(np.int64)
    n = int(turns_per_conv.sum())

    conv_idx = np.repeat(np.arange(n_convs), turns_per_conv)
    turn_idx = np.concatenate([np.arange(k) for k in turns_per_conv]).astype(np.int32)

    conv_id = np.char.add("conv-", conv_idx.astype("U12"))
    role = np.array(ROLES)[rng.integers(0, len(ROLES), size=n)]

    m = rng.integers(0, 10, size=n)
    tool_pick = np.array(TOOLS)[rng.integers(0, len(TOOLS), size=n)]
    word = np.array(WORDS)[rng.integers(0, len(WORDS), size=n)]
    code = rng.integers(0, 1000, size=n)

    call_text = np.char.add(
        np.char.add("CALL tool=", tool_pick),
        np.char.add(' args={"q":"', np.char.add(word, '"}')),
    )
    err_text = np.char.add(
        np.char.add("ERR-", np.char.zfill(code.astype("U3"), 3)),
        np.char.add(" ", np.char.add(word, " failed")),
    )
    msg_text = np.char.add(
        np.char.add("msg=", word),
        np.char.add(" k=", (code % 7).astype("U1")),
    )
    text = np.where(m < 3, call_text, np.where(m < 5, err_text, msg_text))
    text = np.where(m == 5, "", text)  # heartbeats
    tool = np.where(m < 3, tool_pick, "")

    # event time: golden epoch + per-conv offset + per-turn increment;
    # half the turns second-aligned, half carry microsecond precision.
    base_us = (
        GOLDEN_EPOCH_S * 1_000_000
        + conv_idx * 3_600_000_000
        + turn_idx.astype(np.int64) * 1_000_000
    )
    sub_us = rng.integers(0, 1_000_000, size=n) * (rng.integers(0, 2, size=n))
    ts = (base_us + sub_us).astype("datetime64[us]")

    tbl = pa.table(
        {
            "conv_id": pa.array(conv_id, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(text, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts),
        }
    )

    # malformed frames: null text / null conv_id on a deterministic subset
    if frac_bad > 0 and n > 0:
        n_bad = max(2, int(n * frac_bad))
        bad_rows = rng.choice(n, size=n_bad, replace=False)
        text_col = tbl["text"].to_numpy(zero_copy_only=False).astype(object)
        conv_col = tbl["conv_id"].to_numpy(zero_copy_only=False).astype(object)
        half = n_bad // 2
        text_col[bad_rows[:half]] = None
        conv_col[bad_rows[half:]] = None
        tbl = tbl.set_column(0, "conv_id", pa.array(conv_col, type=pa.string()))
        tbl = tbl.set_column(3, "text", pa.array(text_col, type=pa.string()))

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    # shard by conversation (not by row) so a conversation never spans files
    bounds = np.linspace(0, n_convs, n_files + 1).astype(int)
    conv_arr = tbl["conv_id"]
    for i in range(n_files):
        import pyarrow.compute as pc

        lo, hi = bounds[i], bounds[i + 1]
        mask = pa.array((conv_idx >= lo) & (conv_idx < hi))
        shard = tbl.filter(mask)
        p = os.path.join(out_dir, f"transcripts-{i:04d}.parquet")
        pq.write_table(shard, p)
        paths.append(p)
    return paths
