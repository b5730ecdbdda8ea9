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

Each output file is generated independently from a per-shard seed
(``seed + shard``), so generation parallelizes over shards (Ray tasks
when a Ray session exists) and a shard's bytes never depend on how many
workers produced the corpus. String assembly uses Arrow kernels —
``np.char.*`` is ~100x slower.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from fluent_server_ray.sources.transcripts import ROLES, TOOLS

WORDS = ("foo", "bar", "beuha", "aussi", "magic", "follow", "bof", "hello", "world")
GOLDEN_EPOCH_S = 1441588984  # reference message/entry_test.go:26


def _generate_shard(
    path: str,
    conv_lo: int,
    conv_hi: int,
    seed: int,
    mean_turns: int,
    zipf_a: float,
    frac_bad: float,
) -> str:
    """Generate conversations [conv_lo, conv_hi) into one parquet file.
    Fully determined by the arguments."""
    rng = np.random.default_rng(seed)
    n_convs = conv_hi - conv_lo

    turns_per_conv = np.minimum(
        rng.zipf(zipf_a, size=n_convs) * max(1, mean_turns // 3), mean_turns * 200
    ).astype(np.int64)
    n = int(turns_per_conv.sum())

    conv_idx = np.repeat(np.arange(conv_lo, conv_hi), turns_per_conv)
    # vectorized per-conv 0..k-1: global index minus each conv's start offset
    starts = np.concatenate(([0], np.cumsum(turns_per_conv)[:-1]))
    turn_idx = (np.arange(n) - np.repeat(starts, turns_per_conv)).astype(np.int32)

    pcj = pc.binary_join_element_wise
    conv_id = pcj("conv-", pc.cast(pa.array(conv_idx), pa.string()), "")
    role = pa.array(np.array(ROLES)[rng.integers(0, len(ROLES), size=n)])

    m = rng.integers(0, 10, size=n)
    tool_pick = pa.array(np.array(TOOLS)[rng.integers(0, len(TOOLS), size=n)])
    word = pa.array(np.array(WORDS)[rng.integers(0, len(WORDS), size=n)])
    code = rng.integers(0, 1000, size=n)

    call_text = pcj("CALL tool=", tool_pick, ' args={"q":"', word, '"}', "")
    err_text = pcj(
        "ERR-",
        pc.utf8_lpad(pc.cast(pa.array(code), pa.string()), 3, "0"),
        " ",
        word,
        " failed",
        "",
    )
    msg_text = pcj(
        "msg=", word, " k=", pc.cast(pa.array(code % 7), pa.string()), ""
    )
    is_call = pa.array(m < 3)
    is_err = pa.array((m >= 3) & (m < 5))
    is_hb = pa.array(m == 5)
    text = pc.if_else(is_call, call_text, pc.if_else(is_err, err_text, msg_text))
    text = pc.if_else(is_hb, pa.scalar("", type=pa.string()), text)
    tool = pc.if_else(is_call, tool_pick, pa.scalar("", type=pa.string()))

    # event time: golden epoch + per-conv offset + per-turn increment;
    # half the turns second-aligned, half carry microsecond precision.
    base_us = (
        GOLDEN_EPOCH_S * 1_000_000
        + conv_idx * 3_600_000_000
        + turn_idx.astype(np.int64) * 1_000_000
    )
    sub_us = rng.integers(0, 1_000_000, size=n) * (rng.integers(0, 2, size=n))
    ts = (base_us + sub_us).astype("datetime64[us]")

    # malformed frames: null text / null conv_id on a deterministic subset
    if frac_bad > 0 and n > 0:
        n_bad = max(2, int(n * frac_bad))
        bad_rows = rng.choice(n, size=n_bad, replace=False)
        half = n_bad // 2
        null_s = pa.scalar(None, type=pa.string())
        text_mask = np.zeros(n, dtype=bool)
        text_mask[bad_rows[:half]] = True
        conv_mask = np.zeros(n, dtype=bool)
        conv_mask[bad_rows[half:]] = True
        text = pc.if_else(pa.array(text_mask), null_s, text)
        conv_id = pc.if_else(pa.array(conv_mask), null_s, conv_id)

    tbl = pa.table(
        {
            "conv_id": conv_id,
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pa.array(ts),
        }
    )
    pq.write_table(tbl, path)
    return path


def generate_transcripts(
    out_dir: str,
    n_convs: int = 200,
    mean_turns: int = 10,
    seed: int = 42,
    n_files: int = 4,
    zipf_a: float = 1.5,
    frac_bad: float = 0.002,
    parallel: bool | None = None,
) -> list[str]:
    """Write a deterministic transcripts corpus; return the file paths.

    ``parallel=None`` auto-detects: shards generate as Ray tasks when a
    Ray session is up (corpus bytes are identical either way — each
    shard is a pure function of (range, seed+shard))."""
    os.makedirs(out_dir, exist_ok=True)
    bounds = np.linspace(0, n_convs, n_files + 1).astype(int)
    jobs = [
        (
            os.path.join(out_dir, f"transcripts-{i:04d}.parquet"),
            int(bounds[i]),
            int(bounds[i + 1]),
            seed + i,
            mean_turns,
            zipf_a,
            frac_bad,
        )
        for i in range(n_files)
    ]

    if parallel is None:
        try:
            import ray

            parallel = ray.is_initialized() and n_files > 1
        except ImportError:
            parallel = False

    if parallel:
        import ray

        gen = ray.remote(_generate_shard)
        return ray.get([gen.remote(*j) for j in jobs])
    return [_generate_shard(*j) for j in jobs]
