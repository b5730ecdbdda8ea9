"""Forward wire-data pipeline: routing by wire tag, chunk-ack lineage,
cross-shard replay dedup (the full at-least-once story over real
fluentd frames)."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from fluent_server_ray.sources.fluentfmt import pack_frames

ROUTES = [
    ("app.*", "apps"),
    ("db.**", "dbs"),
    ("**", "rest"),
]


def _write(path, frames):
    path.write_bytes(pack_frames(frames))
    return str(path)


@pytest.fixture()
def frame_dir(tmp_path):
    f1 = _write(
        tmp_path / "conn-0.msgpack",
        [
            ["app.web", [[100, {"m": "a"}], [101, {"m": "b"}]], {"chunk": "c-1"}],
            ["db.primary.q", 102, {"q": "x"}],
            None,
        ],
    )
    f2 = _write(
        tmp_path / "conn-1.msgpack",
        [
            # client re-sends chunk c-1 (never saw the ack) + new chunk
            ["app.web", [[100, {"m": "a"}], [101, {"m": "b"}]], {"chunk": "c-1"}],
            ["other.tag", [[103, {"m": "c"}]], {"chunk": "c-2"}],
        ],
    )
    return tmp_path, [f1, f2]


def _sink_rows(out):
    files = sorted(glob.glob(os.path.join(str(out), "sinks", "**", "*.parquet"),
                             recursive=True))
    frames = []
    for f in files:
        df = pq.read_table(f).to_pandas()
        for part in f.split(os.sep):
            if part.startswith("sink="):
                df["sink"] = part[len("sink="):]
        frames.append(df)
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


def test_forward_pipeline_routes_and_acks(ray_session, frame_dir, tmp_path):
    from fluent_server_ray.pipelines.forward_pipeline import run_forward_pipeline

    _, files = frame_dir
    out = tmp_path / "out"
    summary = run_forward_pipeline(files, str(out), routes=ROUTES)

    # replayed chunk c-1 in conn-1 was dropped: 2 app rows, 1 db, 1 other
    assert summary["rows"] == 4
    assert summary["sinks"] == {"apps": 2, "dbs": 1, "rest": 1}
    assert summary["acked_chunks"] == ["c-1", "c-2"]

    rows = _sink_rows(out)
    assert set(rows["tag"]) == {"app.web", "db.primary.q", "other.tag"}
    # wire order within the chunk preserved
    app = rows[rows["sink"] == "apps"].sort_values("entry_idx")
    assert [r["m"] for r in app["record_json"].map(eval)] == ["a", "b"]


def test_forward_pipeline_resume_skips_acked(ray_session, frame_dir, tmp_path):
    from fluent_server_ray.pipelines.forward_pipeline import run_forward_pipeline

    _, files = frame_dir
    out = tmp_path / "out2"
    s1 = run_forward_pipeline(files[:1], str(out), routes=ROUTES)
    assert s1["rows"] == 3
    # resume with the full list: conn-0 skipped (committed), conn-1's
    # replay of c-1 dropped because c-1 is in the acked manifest
    s2 = run_forward_pipeline(files, str(out), routes=ROUTES)
    assert s2["rows"] == 4
    assert s2["acked_chunks"] == ["c-1", "c-2"]
    rows = _sink_rows(out)
    assert len(rows) == 4
    assert not rows.duplicated(["chunk", "entry_idx", "tag"]).any()


def test_hostile_frames_become_reject_rows(ray_session):
    """Corrupt gzip blobs, garbage packed msgpack, bytes record keys,
    out-of-range timestamps and bool mode codes must each produce one
    is_valid=False reject row — never crash the decode task."""
    import msgpack
    import pyarrow as pa

    from fluent_server_ray.sources.fluentfmt import frames_to_table

    frames = b"".join(
        msgpack.packb(f, use_bin_type=True)
        for f in [
            ["t.ok", [[1441588984, {"k": 1}]], {}],       # good
            ["t.gz", b"not-gzip", {"compressed": "gzip"}],  # corrupt gzip
            ["t.pk", b"\xc1\xc1\xc1", {}],                # garbage packed
            ["t.ts", [[2**40, {"k": 1}]], {}],            # ts overflow
            [b"t.bk".decode(), [[1, {b"\xff\xfe": 1}]], {}],  # bytes key
            ["t.bool", True, {}],                          # bool mode code
        ]
    )
    t = frames_to_table(frames)
    df = t.to_pandas()
    good = df[df["is_valid"]]
    bad = df[~df["is_valid"]]
    assert len(good) == 1 and good.iloc[0]["tag"] == "t.ok"
    assert len(bad) == 5  # every hostile frame surfaced, none crashed


def test_empty_shard_commits_and_resumes(ray_session, tmp_path):
    """A heartbeat-only shard (zero routed rows) must write an empty
    sink dir, COMMIT its lineage record, and be skipped on resume —
    not crash before the ack and re-crash forever."""
    import msgpack

    from fluent_server_ray.pipelines.forward_pipeline import run_forward_pipeline

    p = tmp_path / "hb.msgpack"
    p.write_bytes(msgpack.packb(None) * 3)  # heartbeats only
    out = tmp_path / "out"
    s1 = run_forward_pipeline([str(p)], str(out), routes=[("**", "all")])
    assert s1["rows"] == 0 and s1["shards"] == 1
    s2 = run_forward_pipeline([str(p)], str(out), routes=[("**", "all")])
    assert s2["rows"] == 0 and s2["shards"] == 1  # resume no-op


def test_chunk_ids_content_addressed(ray_session, tmp_path):
    """Two blocks with the same tag but different events must emit
    DIFFERENT chunk ids (positional ids collided across files and the
    at-least-once dedup dropped the second file's rows as replays)."""
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.pipelines.forward_pipeline import run_forward_pipeline
    from fluent_server_ray.sources.fluentfmt import write_forward_frames

    def block(vals, ts0):
        return pd.DataFrame(
            {
                "tag": ["t.a"] * len(vals),
                "ts": pd.to_datetime([ts0 + i for i in range(len(vals))],
                                     unit="s"),
                "record_json": [f'{{"v": {v}}}' for v in vals],
            }
        )

    d1, d2 = block([1, 2], 1441588984), block([3, 4], 1441589984)
    ds = rd.from_pandas(d1).union(rd.from_pandas(d2)).repartition(2)
    frames_dir = tmp_path / "frames"
    paths = write_forward_frames(ds, str(frames_dir))
    assert len(paths) >= 2
    out = tmp_path / "out"
    summary = run_forward_pipeline(paths, str(out), routes=[("**", "all")])
    # all 4 events survive: no cross-file chunk-id collision dropped rows
    assert summary["rows"] == 4
    assert len(set(summary["acked_chunks"])) == len(summary["acked_chunks"])
