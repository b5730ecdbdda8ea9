"""fluentd Forward-protocol (v1) frame decoding → Arrow batches.

Lets a user of the reference feed their existing wire-format data —
files of msgpack-encoded forward frames — straight into this engine:
``read_forward_frames(paths)`` yields a ``ray.data.Dataset`` with the
canonical event columns ``(tag, ts, record_json)`` plus chunk metadata.

Semantics mirror the reference exactly (this is a from-scratch Python
implementation over the public ``msgpack`` library, not a port of the
Go code):

- **frame** = msgpack array, first element the tag string; 2..5
  elements (frames >5 "flood" / <2 "too short" are rejected —
  reference ``message/session.go:139-147``); a msgpack nil frame is a
  heartbeat and produces nothing (``message/session.go:124-137``).
- **mode dispatch** by the element after the tag (reference
  ``message/mode.go:11-54``): array → Forward (list of entries);
  bin → PackedForward (blob of concatenated entries; gzip-wrapped when
  the option says ``compressed: "gzip"``, reference
  ``defaultreader/reader.go:53-59``); str → rejected legacy
  PackedForward ("PackedForward is old"); uint32/int32/ext →
  Message (single inline entry).
- **entry** = ``[timestamp, record-map]`` 2-array (reference
  ``message/entry.go:11-35``).
- **timestamp** encodings (reference ``message/time.go:12-60``):
  msgpack uint32/int32 unix seconds, or ext type 0 with 8 bytes —
  big-endian u32 seconds + u32 nanoseconds (fluentd EventTime).
  FixedExt and other codes are rejected.
- **chunk option**: 3rd element map with ``chunk``/``size``/
  ``compressed`` and open ``Stuff`` keys (reference
  ``message/options.go:8-37``, ``msg/option.go:3-8``); the chunk id is
  surfaced per row for at-least-once dedup/ack bookkeeping
  (reference ``message/mode.go:56-68``).

Intra-chunk entry order is preserved (reference
``defaultreader/reader.go:85-103``): rows carry ``entry_idx``.
"""

from __future__ import annotations

import gzip as _gzip
import io
import json
import struct
from datetime import datetime, timezone

import pyarrow as pa

try:
    import msgpack
except ImportError:  # pragma: no cover - msgpack ships in this env
    msgpack = None

FLOOD_LIMIT = 5  # reference message/session.go:140
MIN_FRAME = 2  # reference message/session.go:143


class FrameError(ValueError):
    pass


def _decode_event_time(obj):
    """msgpack value → (unix_sec, nanos) per the reference's DecodeTime."""
    if isinstance(obj, int):
        # uint32/int32 unix seconds (reference message/time.go:19-30)
        return obj, 0
    if isinstance(obj, msgpack.ExtType):
        if obj.code != 0:
            raise FrameError(f"unknown ext id {obj.code}")
        if len(obj.data) != 8:
            raise FrameError(f"unknown ext id size {len(obj.data)}")
        sec, nsec = struct.unpack(">II", obj.data)
        return sec, nsec
    raise FrameError(f"unknown time type {type(obj).__name__}")


def _entry(obj):
    """[ts, record] 2-array → (sec, nsec, record) (reference entry.go)."""
    if not isinstance(obj, (list, tuple)):
        raise FrameError(f"not an array: {obj!r}")
    if len(obj) != 2:
        raise FrameError(f"bad array length {len(obj)}")
    sec, nsec = _decode_event_time(obj[0])
    record = obj[1]
    if not isinstance(record, dict):
        raise FrameError("record is not a map")
    return sec, nsec, record


def _option(obj):
    """Chunk-option map → dict with known keys + open Stuff
    (reference message/options.go:8-37)."""
    opt = {"chunk": "", "size": None, "compressed": "", "stuff": {}}
    if not isinstance(obj, dict):
        return opt
    for k, v in obj.items():
        key = k.decode() if isinstance(k, bytes) else k
        if key == "chunk":
            opt["chunk"] = v.decode() if isinstance(v, bytes) else v
        elif key == "size":
            opt["size"] = int(v)
        elif key == "compressed":
            opt["compressed"] = v.decode() if isinstance(v, bytes) else v
        else:
            opt["stuff"][key] = v
    return opt


def decode_frame(frame) -> tuple[list[tuple[int, int, dict]], dict]:
    """One decoded msgpack frame → (ordered entries, option).

    Returns ([], {}) for heartbeats. Raises FrameError for invalid
    frames (the caller routes those to the reject sink, like the
    reference replying with an error instead of crashing).
    """
    if frame is None:  # heartbeat (reference message/session.go:124-137)
        return [], {}
    if not isinstance(frame, (list, tuple)):
        raise FrameError(f"not an array: {frame!r}")
    l = len(frame)
    if l > FLOOD_LIMIT:
        raise FrameError("flood")
    if l < MIN_FRAME:
        raise FrameError("too short")
    tag = frame[0]
    if isinstance(tag, bytes):
        tag = tag.decode()
    if not isinstance(tag, str):
        raise FrameError("first element must be the tag string")

    second = frame[1]
    opt = {}
    if isinstance(second, (list, tuple)):  # Forward mode
        entries = [_entry(e) for e in second]
        if l >= 3:
            opt = _option(frame[2])
    elif isinstance(second, str):
        raise FrameError("PackedForward is old")  # reference mode.go:30
    elif isinstance(second, bytes):  # PackedForward
        if l >= 3:
            opt = _option(frame[2])
        blob = second
        if opt.get("compressed") == "gzip":
            try:
                blob = _gzip.decompress(blob)
            except Exception as err:  # corrupt gzip → reject row, not a
                raise FrameError(f"bad gzip blob: {err}")  # task crash
        try:
            unpacker = msgpack.Unpacker(io.BytesIO(blob), raw=False,
                                        strict_map_key=False)
            entries = [_entry(e) for e in unpacker]
        except FrameError:
            raise
        except Exception as err:  # garbage msgpack inside the blob
            raise FrameError(f"bad packed blob: {err}")
    elif isinstance(second, (int, msgpack.ExtType)) \
            and not isinstance(second, bool):  # Message mode (bool IS an
        # int in Python but a distinct msgpack code the reference rejects)
        sec, nsec = _decode_event_time(second)
        if l < 3 or not isinstance(frame[2], dict):
            raise FrameError("message mode needs a record map")
        entries = [(sec, nsec, frame[2])]
        if l >= 4:
            opt = _option(frame[3])
    else:
        raise FrameError(f"bad code {type(second).__name__}")

    return [(tag, *e) for e in entries], opt


def frames_to_table(raw: bytes, chunk_default: str = "") -> pa.Table:
    """A byte stream of consecutive msgpack frames → one Arrow table
    with columns (tag, ts, record_json, chunk, entry_idx, is_valid).

    Invalid frames become one is_valid=False row each (reject-sink
    routing); heartbeats produce nothing.
    """
    if msgpack is None:
        raise ImportError("msgpack not available")
    tags, ts_ns, recs, chunks, idxs, valid = [], [], [], [], [], []
    unpacker = msgpack.Unpacker(io.BytesIO(raw), raw=False, strict_map_key=False)
    for frame in unpacker:
        try:
            entries, opt = decode_frame(frame)
        except FrameError as err:
            tags.append("")
            ts_ns.append(None)
            recs.append(json.dumps({"error": str(err)}))
            chunks.append(chunk_default)
            idxs.append(0)
            valid.append(False)
            continue
        chunk = (opt or {}).get("chunk", "") or chunk_default
        for i, (tag, sec, nsec, record) in enumerate(entries):
            try:
                tsv = sec * 1_000_000_000 + nsec
                if not -(2**63) < tsv < 2**63:
                    raise ValueError("timestamp outside int64-ns range")
                # bytes map keys (legal msgpack, strict_map_key=False)
                # would TypeError inside json.dumps
                rec = json.dumps(record, sort_keys=True, default=str)
            except (TypeError, ValueError, OverflowError) as err:
                tags.append("")
                ts_ns.append(None)
                recs.append(json.dumps({"error": f"bad entry: {err}"}))
                chunks.append(chunk)
                idxs.append(i)
                valid.append(False)
                continue
            tags.append(tag)
            ts_ns.append(tsv)
            recs.append(rec)
            chunks.append(chunk)
            idxs.append(i)
            valid.append(True)
    return pa.table(
        {
            "tag": pa.array(tags, type=pa.string()),
            "ts": pa.array(ts_ns, type=pa.timestamp("ns")),
            "record_json": pa.array(recs, type=pa.string()),
            "chunk": pa.array(chunks, type=pa.string()),
            "entry_idx": pa.array(idxs, type=pa.int32()),
            "is_valid": pa.array(valid, type=pa.bool_()),
        }
    )


def read_forward_frames(paths):
    """Dataset over files of raw msgpack forward frames. Each file is a
    shard (≙ a connection's chunk stream); decode happens inside
    map_batches tasks, one file per row in, many event rows out."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for blob, path in zip(
            batch["bytes"].to_pylist(), batch["path"].to_pylist()
        ):
            t = frames_to_table(blob)
            t = t.append_column(
                "source_file", pa.array([path] * len(t), type=pa.string())
            )
            tables.append(t)
        return pa.concat_tables(tables) if tables else frames_to_table(b"")

    return ds.map_batches(decode, batch_format="pyarrow")


# --- encoding helpers (for tests and for producing golden fixtures) ---

def event_time_ext(sec: int, nsec: int) -> "msgpack.ExtType":
    """fluentd EventTime: ext type 0, 8B big-endian (sec, nsec)
    (reference message/time.go:31-53)."""
    return msgpack.ExtType(0, struct.pack(">II", sec, nsec))


def pack_frames(frames) -> bytes:
    out = b""
    for f in frames:
        out += msgpack.packb(f, use_bin_type=True)
    return out


def ts_to_datetime(sec: int, nsec: int) -> datetime:
    from datetime import timedelta

    return datetime.fromtimestamp(sec, tz=timezone.utc).replace(
        tzinfo=None
    ) + timedelta(microseconds=nsec / 1000)


# ------------------------------------------------------------- writer

def table_to_frames(t: pa.Table, chunk_size: int = 500,
                    compress: bool = False) -> bytes:
    """Events table (tag, ts, record_json[, ...]) → msgpack Forward
    frames, one frame per (tag, ≤chunk_size entries) run, each with a
    chunk option carrying a deterministic chunk id and declared size
    (the format the reference serves; enables engine → fluentd-consumer
    export and byte-level round-trip tests). ``compress=True`` emits
    CompressedPackedForward (gzip blob + ``compressed: "gzip"``)."""
    import hashlib

    if msgpack is None:
        raise ImportError("msgpack not available")
    tags = t["tag"].to_pylist()
    ts_col = t["ts"].to_pylist()
    recs = t["record_json"].to_pylist()
    frames = b""
    i = 0
    n = len(t)
    while i < n:
        tag = tags[i]
        j = i
        entries = []
        while j < n and tags[j] == tag and len(entries) < chunk_size:
            ts = ts_col[j]
            if ts is None:
                ev_time = 0
            else:
                ns = int(ts.value) if hasattr(ts, "value") else int(
                    ts.timestamp() * 1e9
                )
                sec, nsec = divmod(ns, 1_000_000_000)
                ev_time = event_time_ext(sec, nsec) if nsec else sec
            entries.append([ev_time, json.loads(recs[j] or "{}")])
            j += 1
        blob = b"".join(
            msgpack.packb(e, use_bin_type=True) for e in entries
        )
        # chunk id = hash of the CONTENT (tag + packed entries), not the
        # table-relative position: positional ids collide across
        # blocks/files ("chunk 0 of tag t" everywhere) and the
        # at-least-once dedup would silently drop later files' rows as
        # replays. Content-identical chunks sharing an id is the
        # protocol's own retry semantics (same bytes = same chunk).
        chunk_id = hashlib.md5(
            tag.encode() + b"\x00" + blob
        ).hexdigest()[:22] + "=="
        opt = {"chunk": chunk_id, "size": len(entries)}
        if compress:
            frame = [tag, _gzip.compress(blob), {**opt, "compressed": "gzip"}]
        else:
            frame = [tag, entries, opt]
        frames += msgpack.packb(frame, use_bin_type=True)
        i = j
    return frames


def write_forward_frames(ds, out_dir: str, compress: bool = False) -> list[str]:
    """Dataset of events → one frame file per block (shard-addressed,
    deterministic names)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for bi, batch in enumerate(
        ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        p = os.path.join(out_dir, f"frames-{bi:05d}.msgpack")
        with open(p, "wb") as f:
            f.write(table_to_frames(batch, compress=compress))
        paths.append(p)
    return paths
