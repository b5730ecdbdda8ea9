"""Reference-conformance fixtures: the exact golden literals from the
reference's test suite (FIXTURES.md §4 / SURVEY.md §5.2), decoded by
the from-scratch forward-protocol reader and the admission functions.
"""

import gzip
import hashlib

import msgpack
import pytest

from fluent_server_ray.sources.fluentfmt import (
    FrameError,
    decode_frame,
    event_time_ext,
    frames_to_table,
    pack_frames,
)

GOLDEN_TS = 1441588984  # reference message/entry_test.go:26
GOLDEN_CHUNK = "p8n9gmxTQVC8/nh2wlKKeQ=="  # reference session_test.go:146


def test_message_mode_single_event():
    """≙ reference defaultreader/reader_test.go:63-69 (message mode)."""
    entries, opt = decode_frame(["myTag", GOLDEN_TS, {"message": "foo"}])
    assert entries == [("myTag", GOLDEN_TS, 0, {"message": "foo"})]


def test_forward_mode_order_preserved():
    """≙ reference reader_test.go:71-85: 2 entries, input order kept."""
    entries, _ = decode_frame(
        [
            "tag.name",
            [[GOLDEN_TS, {"message": "foo"}], [GOLDEN_TS + 1, {"message": "bar"}]],
        ]
    )
    assert [e[3]["message"] for e in entries] == ["foo", "bar"]
    assert [e[1] for e in entries] == [GOLDEN_TS, GOLDEN_TS + 1]


def test_packed_forward_blob():
    """≙ reference reader_test.go:87-104: concatenated msgpack entries."""
    blob = msgpack.packb([GOLDEN_TS, {"message": "foo"}]) + msgpack.packb(
        [GOLDEN_TS + 1, {"message": "bar"}]
    )
    entries, opt = decode_frame(["myTag", blob, {"size": 2}])
    assert len(entries) == 2
    assert opt["size"] == 2


def test_compressed_packed_forward():
    """≙ reference defaultreader/reader.go:53-59 (gzip blob)."""
    blob = msgpack.packb([GOLDEN_TS, {"beuha": "aussi", "age": 42}])
    entries, _ = decode_frame(
        ["beuha", gzip.compress(blob), {"compressed": "gzip"}]
    )
    assert entries == [("beuha", GOLDEN_TS, 0, {"beuha": "aussi", "age": 42})]


def test_event_time_ext_round_trip():
    """≙ reference message/time_test.go:32-38 (ext 0, 8B BE sec+nsec)."""
    ext = event_time_ext(GOLDEN_TS, 123_456_789)
    entries, _ = decode_frame(["t", [[ext, {"k": "v"}]]])
    assert entries[0][1] == GOLDEN_TS
    assert entries[0][2] == 123_456_789


def test_chunk_id_surfaces_in_table():
    """≙ reference session_test.go:124-159: chunk option → ack/lineage id."""
    raw = pack_frames(
        [
            [
                "tag.name",
                [[GOLDEN_TS, {"message": "foo"}]],
                {"chunk": GOLDEN_CHUNK, "size": 1},
            ]
        ]
    )
    t = frames_to_table(raw)
    assert t["chunk"].to_pylist() == [GOLDEN_CHUNK]
    assert t["tag"].to_pylist() == ["tag.name"]
    # golden timestamp: 1441588984 = 2015-09-07T01:23:04Z
    assert str(t["ts"][0].as_py()) == "2015-09-07 01:23:04"


def test_heartbeat_produces_nothing():
    """≙ reference message/session.go:124-137 (msgpack nil frame)."""
    assert decode_frame(None) == ([], {})
    t = frames_to_table(pack_frames([None, None]))
    assert len(t) == 0


@pytest.mark.parametrize(
    "frame,msg",
    [
        (["t", [[1, {}]], {}, {}, {}, {}], "flood"),  # arity > 5
        (["t"], "too short"),  # arity < 2
        (["t", "legacy-str-blob"], "PackedForward is old"),
        (["t", [[GOLDEN_TS, {"k": 1}, "extra"]]], "bad array length"),
    ],
)
def test_invalid_frames_rejected(frame, msg):
    """≙ reference message/session.go:139-147 + mode.go:29-31."""
    with pytest.raises(FrameError, match=msg):
        decode_frame(frame)


def test_invalid_frame_routes_to_reject_row():
    raw = pack_frames([["t"], ["ok", GOLDEN_TS, {"name": "Bob", "age": 42}]])
    t = frames_to_table(raw)
    assert t["is_valid"].to_pylist() == [False, True]


def test_fixed_ext_rejected():
    """≙ reference message/time.go:54-55 (FixedExt refused)."""
    import struct

    bad = msgpack.ExtType(0, struct.pack(">I", 1))  # wrong length (4B)
    with pytest.raises(FrameError, match="size"):
        decode_frame(["t", [[bad, {}]]])
    with pytest.raises(FrameError, match="unknown ext id"):
        decode_frame(["t", [[msgpack.ExtType(3, b"12345678"), {}]]])


def test_forward_frames_dataset(ray_session, tmp_path):
    """End-to-end: msgpack frame files → Dataset of events (S1 ≙
    read path; ordered entry_idx ≙ intra-chunk order O2)."""
    from fluent_server_ray.sources.fluentfmt import read_forward_frames

    raw = pack_frames(
        [
            ["tag_prefix.my_tag", [[GOLDEN_TS, {"from": "userA", "to": "userB"}],
                                   [GOLDEN_TS + 1, {"magic": 0.5}]],
             {"chunk": GOLDEN_CHUNK}],
            None,  # heartbeat
            ["follow", GOLDEN_TS + 2, {"beuha": "aussi"}],
        ]
    )
    p = tmp_path / "frames-000.msgpack"
    p.write_bytes(raw)
    df = read_forward_frames([str(p)]).to_pandas()
    assert len(df) == 3
    assert list(df["tag"]) == ["tag_prefix.my_tag", "tag_prefix.my_tag", "follow"]
    assert list(df["entry_idx"]) == [0, 1, 0]
    assert df["chunk"].iloc[0] == GOLDEN_CHUNK


# ----- admission (control-plane) conformance -----

def test_shared_key_digest_matches_reference_algebra():
    """≙ reference session_test.go:190-204 + ping.go:63-74:
    sha512(salt + hostname + nonce + shared_key)."""
    from fluent_server_ray.functions.admission import (
        shared_key_hexdigest,
        validate_shared_key,
    )

    nonce = b"0123456789abcdef"
    want = hashlib.sha512(
        b"my_salt" + b"client.example.com" + nonce + b"beuha"
    ).hexdigest()
    assert shared_key_hexdigest("my_salt", "client.example.com", nonce, "beuha") == want

    ping = {
        "shared_key_salt": "my_salt",
        "client_hostname": "client.example.com",
        "shared_key_hexdigest": want,
    }
    validate_shared_key(ping, nonce, "beuha")  # no raise
    with pytest.raises(ValueError, match="shared key mismatch"):
        validate_shared_key(ping, nonce, "wrong")


def test_password_digest_matches_reference_algebra():
    """≙ reference ping_test.go:11-34: sha512(salt + user + password)."""
    from fluent_server_ray.functions.admission import (
        password_hexdigest,
        validate_password,
    )

    digest = hashlib.sha512(b"salt" + b"bob" + b"sponge").hexdigest()
    assert password_hexdigest(b"salt", "bob", b"sponge") == digest

    users = lambda u: b"sponge" if u == "bob" else None
    validate_password(
        {"username": "bob", "password": digest}, b"salt", users
    )
    with pytest.raises(ValueError, match="unknown user"):
        validate_password({"username": "eve", "password": digest}, b"salt", users)
    with pytest.raises(ValueError, match="username is mandatory"):
        validate_password({"username": "", "password": digest}, b"salt", users)


def test_pong_shape():
    """≙ reference session_test.go:206-223: 5-ary PONG with server proof."""
    from fluent_server_ray.functions.admission import pong, shared_key_hexdigest

    nonce = b"n" * 16
    p = pong(True, "", "server.example.com", "my_salt", nonce, "beuha")
    assert p[:4] == ["PONG", True, "", "server.example.com"]
    assert p[4] == shared_key_hexdigest("my_salt", "server.example.com", nonce, "beuha")
    assert pong(False, "nope", "s", "", nonce, "k")[1:3] == [False, "nope"]


def test_writer_round_trip(ray_session, tmp_path):
    """table → forward frames → reader == original (incl. ns timestamps
    and gzip PackedForward), completing wire-format round-tripping."""
    import pyarrow as pa

    from fluent_server_ray.sources.fluentfmt import (
        frames_to_table,
        table_to_frames,
    )

    src = pa.table(
        {
            "tag": ["a.b", "a.b", "c"],
            "ts": pa.array(
                [GOLDEN_TS * 1_000_000_000 + 123, GOLDEN_TS * 1_000_000_000,
                 (GOLDEN_TS + 5) * 1_000_000_000],
                type=pa.timestamp("ns"),
            ),
            "record_json": ['{"m": "x"}', '{"m": "y"}', '{"z": 1}'],
        }
    )
    for compress in (False, True):
        frames = table_to_frames(src, compress=compress)
        back = frames_to_table(frames)
        assert back["tag"].to_pylist() == ["a.b", "a.b", "c"]
        assert back["record_json"].to_pylist() == [
            '{"m": "x"}', '{"m": "y"}', '{"z": 1}'
        ]
        assert back["ts"].to_pylist() == src["ts"].to_pylist()
        assert all(c.endswith("==") for c in back["chunk"].to_pylist())


def test_udp_echo_round_trip():
    """S3: a datagram comes back verbatim from the echo socket —
    the reference's own test shape (server/server_test.go:59-84 sends
    one byte and asserts the identical byte returns)."""
    import socket

    from fluent_server_ray.functions.udp_echo import serve_udp_echo

    srv, stop, _ = serve_udp_echo(port=0)
    try:
        port = srv.getsockname()[1]
        client = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        client.settimeout(5)
        client.sendto(b"h", ("127.0.0.1", port))
        data, _ = client.recvfrom(1024)
        assert data == b"h"
        # multi-byte payload up to the reference's 1024-byte cap
        payload = bytes(range(256)) * 4
        client.sendto(payload, ("127.0.0.1", port))
        data, _ = client.recvfrom(2048)
        assert data == payload
        client.close()
    finally:
        stop()


def test_jsonl_source_matches_parquet_source(ray_session, tmp_path):
    """The same turns arriving as newline-delimited JSON (fluentd
    in_tail+json shape) coerce to a bit-identical transcript table:
    per-turn text equality under (conv_id, turn_idx) order, schema
    included — so every downstream stage is source-agnostic."""
    import pandas as pd

    from fluent_server_ray.sources.transcripts import (
        read_transcripts, read_transcripts_jsonl)
    from tests.conftest import SF_SMALL

    ref = read_transcripts(SF_SMALL).to_pandas()
    p = tmp_path / "turns.jsonl"
    ref.to_json(p, orient="records", lines=True,
                date_format="iso", date_unit="us")

    got = read_transcripts_jsonl(str(p)).to_pandas()
    key = ["conv_id", "turn_idx"]
    a = ref.sort_values(key).reset_index(drop=True)
    b = got.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])

    # column pruning works and missing keys fail loudly
    pruned = read_transcripts_jsonl(str(p), columns=["conv_id", "text"])
    assert pruned.schema().names == ["conv_id", "text"]
    bad = tmp_path / "bad.jsonl"
    bad.write_text('{"conv_id": "c", "text": "t"}\n')
    import pytest as _pytest
    with _pytest.raises(Exception, match="lacks keys"):
        read_transcripts_jsonl(str(bad)).materialize()


def test_jsonl_source_ts_shapes(ray_session, tmp_path):
    """ts arrives as epoch SECONDS (fluentd time convention — a bare
    int64→timestamp cast would read them as µs and produce 1970
    dates), fractional seconds, or ISO-8601 WITH a zone offset
    (normalized to UTC wall time). One convention per stream — a JSON
    column can't mix number and string types."""
    from fluent_server_ray.sources.transcripts import read_transcripts_jsonl

    def row(idx, ts):
        return (f'{{"conv_id":"c","turn_idx":{idx},"role":"user",'
                f'"text":"x","tool":"","ts":{ts}}}')

    cases = [
        (row(0, "1700000000"), "2023-11-14 22:13:20"),
        (row(1, "1700000000.5"), "2023-11-14 22:13:20.500000"),
        (row(2, '"2023-11-14T22:13:20.25+02:00"'),
         "2023-11-14 20:13:20.250000"),  # +02:00 → UTC wall time
        (row(3, '"2023-11-14T22:13:20.25"'),
         "2023-11-14 22:13:20.250000"),  # naive stays as-is
    ]
    for i, (line, want) in enumerate(cases):
        p = tmp_path / f"t{i}.jsonl"
        p.write_text(line + "\n")
        got = read_transcripts_jsonl(str(p)).to_pandas()
        assert str(got["ts"].iloc[0]) == want, (line, want)


def test_csv_source_matches_parquet_source(ray_session, tmp_path):
    """The same turns arriving as CSV (fluentd in_tail+csv shape)
    coerce to a bit-identical transcript table through the shared
    coercion pass — incl. NULL tool (empty field) and ISO timestamps."""
    import pandas as pd

    from fluent_server_ray.sources.transcripts import (
        read_transcripts, read_transcripts_csv)
    from tests.conftest import SF_SMALL

    ref = read_transcripts(SF_SMALL).to_pandas()
    p = tmp_path / "turns.csv"
    out = ref.copy()
    out["ts"] = out["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    # QUOTE_NONNUMERIC: quoted "" = empty string, bare empty = NULL —
    # the one convention that round-trips both (see source docstring)
    import csv as _csv
    out.to_csv(p, index=False, quoting=_csv.QUOTE_NONNUMERIC)

    got = read_transcripts_csv(str(p)).to_pandas()
    key = ["conv_id", "turn_idx"]
    a = ref.sort_values(key).reset_index(drop=True)
    b = got.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])

    # epoch-seconds ts + pruning + loud missing keys
    p2 = tmp_path / "epoch.csv"
    p2.write_text("conv_id,turn_idx,role,text,tool,ts\n"
                  "c,0,user,x,,1700000000.5\n")
    got = read_transcripts_csv(str(p2)).to_pandas()
    assert str(got["ts"].iloc[0]) == "2023-11-14 22:13:20.500000"
    assert got["tool"].isna().all()  # empty CSV field = NULL
    pruned = read_transcripts_csv(str(p2), columns=["conv_id", "text"])
    assert pruned.schema().names == ["conv_id", "text"]
    bad = tmp_path / "bad.csv"
    bad.write_text("conv_id,text\nc,t\n")
    import pytest as _pytest
    with _pytest.raises(Exception, match="lacks keys"):
        read_transcripts_csv(str(bad)).materialize()


def test_read_parquet_evolving_shards(ray_session, tmp_path):
    """Shards written by different pipeline versions (missing column,
    narrower int) read as ONE schema: missing columns null-fill,
    narrow ints widen, per-group column pruning keeps working, and a
    projection naming the new column succeeds over old shards."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fluent_server_ray.sources.pq import read_parquet_evolving

    old = pa.table({
        "conv_id": pa.array(["a", "b"]),
        "turn_idx": pa.array([0, 1], type=pa.int32()),  # narrow int
        "text": pa.array(["hi", "ho"]),
    })
    new = pa.table({
        "conv_id": pa.array(["c"]),
        "turn_idx": pa.array([0], type=pa.int64()),
        "text": pa.array(["yo"]),
        "tool": pa.array(["bash"]),  # column added in v2
    })
    pq.write_table(old, tmp_path / "old.parquet")
    pq.write_table(new, tmp_path / "new.parquet")

    ds = read_parquet_evolving(str(tmp_path),
                               columns=["conv_id", "turn_idx", "tool"])
    df = ds.to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert list(df.columns) == ["conv_id", "turn_idx", "tool"]
    assert df.turn_idx.tolist() == [0, 1, 0]
    assert df.tool.tolist()[:2] == [None, None] and df.tool[2] == "bash"
    sch = ds.schema()
    assert dict(zip(sch.names, sch.types))["turn_idx"] == pa.int64()

    with pytest.raises(ValueError, match="absent everywhere"):
        read_parquet_evolving(str(tmp_path), columns=["nope"])

    # genuine type conflict fails loudly
    bad = pa.table({"conv_id": pa.array([1], type=pa.int64()),
                    "turn_idx": pa.array([0], type=pa.int64()),
                    "text": pa.array(["x"])})
    pq.write_table(bad, tmp_path / "bad.parquet")
    with pytest.raises(Exception):
        read_parquet_evolving(str(tmp_path)).to_pandas()
