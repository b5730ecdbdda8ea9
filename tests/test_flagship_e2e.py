"""End-to-end flagship pipeline over the synthetic sharded corpus:
sinks on disk, lineage manifests, resume semantics (≙ the reference's
chunk-ack / client-replay protocol, message/mode.go:56-68), reject
sinks for malformed rows, and the per-turn text invariant.
"""

import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


def _load_sinks(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "sinks", "**", "*.parquet"),
                             recursive=True))
    frames = []
    for f in files:
        df = pq.read_table(f).to_pandas()
        # hive partition column
        for part in f.split(os.sep):
            if part.startswith("sink="):
                df["sink"] = part[len("sink="):]
        frames.append(df)
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


def test_flagship_run_and_invariants(ray_session, synth_dir, out_dir):
    from fluent_server_ray.pipelines.flagship import run_pipeline

    summary = run_pipeline(synth_dir, out_dir)
    assert summary["shards"] == 4
    assert summary["rows"] > 0

    sinks = _load_sinks(out_dir)
    # reject sinks caught the malformed rows
    assert (sinks["sink"] == "reject.invalid").sum() > 0
    # no heartbeat (empty-text) rows were routed
    routed_valid = sinks[sinks["sink"] != "reject.invalid"]
    assert not (routed_valid["text"].fillna("") == "").any()

    # per-turn text equality under stable (conv_id, turn_idx) order vs raw input
    raw = pd.concat(
        [pq.read_table(f).to_pandas() for f in sorted(glob.glob(f"{synth_dir}/*.parquet"))],
        ignore_index=True,
    )
    expect = raw[raw["text"].notna() & (raw["text"] != "") & raw["conv_id"].notna()]
    got = sinks[sinks["sink"] != "reject.invalid"]
    a = expect[["conv_id", "turn_idx", "text"]].sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    b = got[["conv_id", "turn_idx", "text"]].sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # summary totals == sink row counts
    assert summary["rows"] == len(sinks)
    by_sink = sinks.groupby("sink").size().to_dict()
    assert summary["sinks"] == by_sink


def test_resume_skips_committed_and_is_idempotent(ray_session, synth_dir, out_dir):
    from fluent_server_ray.pipelines.flagship import run_pipeline
    from fluent_server_ray.state.lineage import committed_shards

    shards = sorted(glob.glob(f"{synth_dir}/*.parquet"))

    # "crash" after two shards: run only a prefix
    run_pipeline(synth_dir, out_dir, shards=shards[:2])
    assert len(committed_shards(out_dir)) == 2
    partial = _load_sinks(out_dir)

    # resume: full shard list; committed shards must be skipped
    summary = run_pipeline(synth_dir, out_dir, shards=shards)
    assert len(committed_shards(out_dir)) == 4

    full = _load_sinks(out_dir)
    # no duplicates, no loss: every (conv_id, turn_idx) exactly once
    keys = full[full["conv_id"].notna()][["conv_id", "turn_idx"]]
    assert not keys.duplicated().any()
    assert len(full) > len(partial)
    assert summary["rows"] == len(full)

    # a third run is a complete no-op (byte-identical manifests)
    before = json.dumps(summary, sort_keys=True)
    again = run_pipeline(synth_dir, out_dir, shards=shards)
    assert json.dumps(again, sort_keys=True) == before


def test_replayed_shard_does_not_duplicate(ray_session, synth_dir, out_dir):
    """Replay of an uncommitted shard overwrites its output (idempotent
    deterministic paths), mirroring at-least-once + ack."""
    from fluent_server_ray.pipelines.flagship import run_pipeline
    from fluent_server_ray.state.lineage import _lineage_dir

    shards = sorted(glob.glob(f"{synth_dir}/*.parquet"))
    run_pipeline(synth_dir, out_dir, shards=shards[:1])
    # simulate crash-after-write-before-ack: delete the lineage record
    for f in os.listdir(_lineage_dir(out_dir)):
        os.remove(os.path.join(_lineage_dir(out_dir), f))
    n_before = len(_load_sinks(out_dir))
    run_pipeline(synth_dir, out_dir, shards=shards[:1])  # replay
    assert len(_load_sinks(out_dir)) == n_before


def test_concurrent_shards_equal_sequential(ray_session, synth_dir, tmp_path):
    """Overlapped commit units produce identical manifests and sinks."""
    from fluent_server_ray.pipelines.flagship import run_pipeline

    seq = run_pipeline(synth_dir, str(tmp_path / "seq"))
    par = run_pipeline(synth_dir, str(tmp_path / "par"), max_concurrent_shards=3)
    assert seq == par
    a = _load_sinks(str(tmp_path / "seq")).sort_values(
        ["conv_id", "turn_idx"], na_position="first").reset_index(drop=True)
    b = _load_sinks(str(tmp_path / "par")).sort_values(
        ["conv_id", "turn_idx"], na_position="first").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a.sort_index(axis=1), b.sort_index(axis=1), check_dtype=False
    )


def test_read_transcripts_filesystem_passthrough(ray_session):
    """S2 (TLS listener → storage credentials): read_transcripts accepts
    an explicit authenticated pyarrow FileSystem and reads through it
    (reference server/tls.go:9-38 re-expressed at the storage layer).
    LocalFileSystem stands in for a credentialed S3FileSystem — same
    injection point."""
    from pyarrow import fs as pafs

    from fluent_server_ray.sources.transcripts import read_transcripts
    from tests.conftest import SF_SMALL

    via_fs = read_transcripts(SF_SMALL, filesystem=pafs.LocalFileSystem())
    plain = read_transcripts(SF_SMALL)
    assert via_fs.count() == plain.count() > 0


def test_duplicate_shard_ids_fail_fast(ray_session, tmp_path):
    """Two identical input paths in one run would silently overwrite one
    sink dir/manifest — the run must refuse up front."""
    import pytest

    from fluent_server_ray.pipelines.flagship import run_pipeline
    from tests.conftest import SF_SMALL

    p = f"{SF_SMALL}/events.parquet"
    with pytest.raises(ValueError, match="duplicate shard ids"):
        run_pipeline(SF_SMALL, str(tmp_path / "out"), shards=[p, p])


def test_conv_bucketed_sink_layout(ray_session, synth_dir, tmp_path):
    """conv_buckets=N: every sink partitions by the persisted
    conversation bucket; a bucket holds ALL turns of its conversations
    (the one-partitioning-key co-location invariant), buckets union to
    the exact unbucketed output, and read_sink(conv_bucket=k) prunes to
    one bucket's files."""
    import glob

    import pandas as pd

    from fluent_server_ray.pipelines.flagship import run_pipeline
    from fluent_server_ray.pipelines.mirror_view import read_sink

    flat_out = str(tmp_path / "flat")
    bck_out = str(tmp_path / "bucketed")
    s1 = run_pipeline(synth_dir, flat_out)
    s2 = run_pipeline(synth_dir, bck_out, conv_buckets=4)
    assert s1["sinks"] == s2["sinks"]  # bucketing never changes counts

    assert glob.glob(f"{bck_out}/sinks/*/sink=*/cbucket=*/*.parquet")

    whole = read_sink(bck_out, "errors").to_pandas()
    parts = [
        read_sink(bck_out, "errors", conv_bucket=k).to_pandas()
        for k in range(4)
        if glob.glob(f"{bck_out}/sinks/*/sink=errors/cbucket={k}/*.parquet")
    ]
    got = pd.concat(parts, ignore_index=True)
    cols = ["conv_id", "turn_idx", "text"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        whole[cols].sort_values(cols).reset_index(drop=True),
    )
    # co-location: no conversation spans two buckets
    seen: dict = {}
    for k, p in enumerate(parts):
        for c in p["conv_id"].unique():
            assert seen.setdefault(c, k) == k
    # and matches the flat output exactly
    flat = read_sink(flat_out, "errors").to_pandas()
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        flat[cols].sort_values(cols).reset_index(drop=True),
    )


def test_stale_lineage_scheme_fails_fast(ray_session, tmp_path):
    """Lineage committed under a different shard-id scheme for the same
    input must refuse to resume (silent double-counting guard)."""
    import pytest

    from fluent_server_ray.pipelines.flagship import run_pipeline
    from fluent_server_ray.state.lineage import commit_shard
    from tests.conftest import SF_SMALL

    out = str(tmp_path / "out")
    commit_shard(out, "legacy-id", {
        "input_file": f"{SF_SMALL}/events.parquet",
        "row_count": 1, "per_sink_counts": {"x": 1},
    })
    with pytest.raises(ValueError, match="different shard-id scheme"):
        run_pipeline(SF_SMALL, out, shards=[f"{SF_SMALL}/events.parquet"])


def test_time_partitioned_sink_layout(ray_session, synth_dir, tmp_path):
    """time_partition='day': every sink slices by event time
    (tslice=YYYY-MM-DD hive dirs), slices union to the exact flat
    output, read_sink(time_slice=...) prunes to one slice, the slice
    composes with conv_buckets (nests inside), and resuming with a
    different time_partition refuses."""
    import glob

    import pandas as pd
    import pytest

    from fluent_server_ray.pipelines.flagship import run_pipeline
    from fluent_server_ray.pipelines.mirror_view import read_sink

    flat_out = str(tmp_path / "flat")
    t_out = str(tmp_path / "timed")
    s1 = run_pipeline(synth_dir, flat_out)
    s2 = run_pipeline(synth_dir, t_out, time_partition="day")
    assert s1["sinks"] == s2["sinks"]  # slicing never changes counts

    days = sorted({
        p.split("tslice=")[1].split("/")[0]
        for p in glob.glob(f"{t_out}/sinks/*/sink=errors/tslice=*")
    })
    assert days and all(len(d) == 10 for d in days)  # YYYY-MM-DD

    whole = read_sink(t_out, "errors").to_pandas()
    parts = [read_sink(t_out, "errors", time_slice=d).to_pandas()
             for d in days]
    got = pd.concat(parts, ignore_index=True)
    cols = ["conv_id", "turn_idx", "text"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        whole[cols].sort_values(cols).reset_index(drop=True),
    )
    # each slice holds exactly its day's rows (event time, not arrival)
    for d, p in zip(days, parts):
        assert (p["time_slice"] == d).all()
        assert (p["ts"].dt.strftime("%Y-%m-%d") == d).all()
    # flat equality
    flat = read_sink(flat_out, "errors").to_pandas()
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        flat[cols].sort_values(cols).reset_index(drop=True),
    )
    # layout contract: resume with a different slicing refuses
    with pytest.raises(ValueError, match="time_partition"):
        run_pipeline(synth_dir, t_out, time_partition="hour")
    with pytest.raises(ValueError, match="time_partition"):
        run_pipeline(synth_dir, t_out)
    # resume with the SAME layout is the usual no-op
    assert run_pipeline(synth_dir, t_out,
                        time_partition="day")["sinks"] == s1["sinks"]

    # composes with conv_buckets: slice nests inside the bucket
    both_out = str(tmp_path / "both")
    s3 = run_pipeline(synth_dir, both_out, conv_buckets=4,
                      time_partition="day")
    assert s3["sinks"] == s1["sinks"]
    assert glob.glob(
        f"{both_out}/sinks/*/sink=*/cbucket=*/tslice=*/*.parquet")
    one = read_sink(both_out, "errors", conv_bucket=1,
                    time_slice=days[0]).to_pandas()
    if len(one):
        assert (one["conv_bucket"] == 1).all()
        assert (one["time_slice"] == days[0]).all()
