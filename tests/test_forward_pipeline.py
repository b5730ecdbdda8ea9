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
