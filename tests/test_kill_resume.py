"""True crash-resume: SIGKILL a run_pipeline subprocess mid-run, rerun,
assert byte-consistent sinks with no duplicates or loss (FIXTURES.md §5
item 4; ≙ the client-replay-after-lost-ack protocol the reference
serves, message/mode.go:56-68)."""

import glob
import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pyarrow.parquet as pq

DRIVER = """
import sys, os
sys.path.insert(0, {repo!r})
os.chdir({repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from fluent_server_ray.pipelines.flagship import run_pipeline
run_pipeline({src!r}, {out!r})
ray.shutdown()
"""

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sigkill_mid_run_then_resume(ray_session, synth_dir, tmp_path):
    out = str(tmp_path / "out")

    proc = subprocess.Popen(
        [sys.executable, "-c", DRIVER.format(repo=REPO, src=synth_dir, out=out)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    # wait until at least one shard manifest is committed, then KILL -9
    lineage = os.path.join(out, "_lineage")
    deadline = time.time() + 180
    while time.time() < deadline:
        if os.path.isdir(lineage) and any(
            f.endswith(".json") for f in os.listdir(lineage)
        ):
            break
        if proc.poll() is not None:
            break  # finished before we could kill — still a valid (weak) run
        time.sleep(0.2)
    if proc.poll() is None:
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait()

    committed_after_kill = {
        f for f in os.listdir(lineage) if f.endswith(".json")
    } if os.path.isdir(lineage) else set()

    # resume in THIS session (fresh engine state, same out dir)
    from fluent_server_ray.pipelines.flagship import run_pipeline

    summary = run_pipeline(synth_dir, out)
    assert summary["shards"] == 4

    # every (conv_id, turn_idx) exactly once across all sinks; totals
    # equal an independent read of the input
    files = sorted(glob.glob(os.path.join(out, "sinks", "**", "*.parquet"),
                             recursive=True))
    sinks = pd.concat([pq.read_table(f).to_pandas() for f in files],
                      ignore_index=True)
    keys = sinks[sinks["conv_id"].notna()][["conv_id", "turn_idx"]]
    assert not keys.duplicated().any(), "duplicates after crash-resume"

    raw = pd.concat(
        [pq.read_table(f).to_pandas()
         for f in sorted(glob.glob(f"{synth_dir}/*.parquet"))],
        ignore_index=True,
    )
    expect_rows = (raw["text"].notna() & (raw["text"] != "")).sum() + (
        raw["text"].isna().sum()
    )
    assert len(sinks) == expect_rows, (len(sinks), expect_rows)
    # shards committed before the kill were not reprocessed (their
    # manifests survived verbatim)
    still_there = {
        f for f in os.listdir(lineage) if f.endswith(".json")
    }
    assert committed_after_kill <= still_there


DRIVER_BUCKETED = """
import sys, os
sys.path.insert(0, {repo!r})
os.chdir({repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from fluent_server_ray.pipelines.flagship import run_pipeline
run_pipeline({src!r}, {out!r}, conv_buckets=4)
ray.shutdown()
"""


def test_sigkill_resume_under_bucketed_layout(ray_session, synth_dir, tmp_path):
    """Crash-resume with conv_buckets: no duplicates/loss, the layout
    contract survives the crash (resume with the SAME conv_buckets
    succeeds; every file sits under a cbucket dir), and bucket-pruned
    reads still union to the whole."""
    out = str(tmp_path / "out")

    proc = subprocess.Popen(
        [sys.executable, "-c",
         DRIVER_BUCKETED.format(repo=REPO, src=synth_dir, out=out)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    lineage = os.path.join(out, "_lineage")
    deadline = time.time() + 180
    while time.time() < deadline:
        if os.path.isdir(lineage) and any(
            f.endswith(".json") for f in os.listdir(lineage)
        ):
            break
        if proc.poll() is not None:
            break
        time.sleep(0.2)
    if proc.poll() is None:
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait()

    from fluent_server_ray.pipelines.flagship import run_pipeline

    summary = run_pipeline(synth_dir, out, conv_buckets=4)
    assert summary["shards"] == 4

    files = sorted(glob.glob(os.path.join(out, "sinks", "**", "*.parquet"),
                             recursive=True))
    assert files and all("cbucket=" in f for f in files)
    sinks = pd.concat([pq.read_table(f).to_pandas() for f in files],
                      ignore_index=True)
    keys = sinks[sinks["conv_id"].notna()][["conv_id", "turn_idx"]]
    assert not keys.duplicated().any(), "duplicates after crash-resume"


def test_delete_convs_flat_and_bucketed(ray_session, tmp_path):
    """Right-to-be-forgotten: tombstoned conversations vanish from
    every sink, lineage counts reconcile, a repeat delete rewrites
    nothing, and in a bucketed layout untouched cbucket files keep
    their bytes."""
    import glob
    import os

    from fluent_server_ray.pipelines.flagship import (
        delete_convs,
        run_pipeline,
    )
    from fluent_server_ray.pipelines.mirror_view import read_sink
    from fluent_server_ray.state.lineage import load_manifests

    sf = "/root/testdata/sf0.001"
    for buckets in (None, 8):
        out = str(tmp_path / f"run_{buckets}")
        s = run_pipeline(sf, out, conv_buckets=buckets)
        victims = ["conv-1", "conv-7"]
        before = {
            snk: read_sink(out, snk, ordered=False).to_pandas()
            for snk in s["sinks"]
        }
        n_victim = sum((df.conv_id.isin(victims)).sum()
                       for df in before.values())
        assert n_victim > 0
        if buckets:
            mtimes = {f: os.path.getmtime(f) for f in glob.glob(
                f"{out}/sinks/**/*.parquet", recursive=True)}
        rep = delete_convs(out, victims)
        assert rep["rows_deleted"] == n_victim
        total_after = 0
        for snk in s["sinks"]:
            df = read_sink(out, snk, ordered=False).to_pandas()
            assert not df.conv_id.isin(victims).any()
            total_after += len(df)
        assert total_after == s["rows"] - n_victim
        m = load_manifests(out)[0]
        assert m["row_count"] == s["rows"] - n_victim
        assert m["deletes_applied"] == n_victim
        assert sum(m["per_sink_counts"].values()) == total_after
        if buckets:
            # partition-selective: candidate set pruned to the
            # victims' cbuckets; within those only matching files moved
            untouched = [f for f, t in mtimes.items()
                         if os.path.getmtime(f) == t]
            assert len(untouched) >= 1
            assert rep["files_scanned"] < len(mtimes)
        rep2 = delete_convs(out, victims)   # idempotent
        assert rep2["rows_deleted"] == 0 and rep2["files_rewritten"] == 0
        # resume after surgery stays a no-op
        s2 = run_pipeline(sf, out, conv_buckets=buckets)
        assert s2["rows"] == s["rows"] - n_victim


def test_compact_run_and_repair(ray_session, tmp_path):
    """Multi-file sink dirs compact to one file with identical rows;
    a simulated crash mid-swap rolls forward via repair_compaction."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    from fluent_server_ray.pipelines.flagship import (
        compact_run,
        repair_compaction,
        run_pipeline,
    )
    from fluent_server_ray.pipelines.mirror_view import read_sink

    out = str(tmp_path / "run")
    s = run_pipeline("/root/testdata/sf0.001", out)
    # fabricate small files: split one sink's single file into three
    d = os.path.dirname(sorted(glob.glob(
        f"{out}/sinks/*/sink=catchall/*.parquet"))[0])
    t = pq.read_table(sorted(glob.glob(f"{d}/*.parquet")))
    for f in glob.glob(f"{d}/*.parquet"):
        os.remove(f)
    n = t.num_rows
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3),
                                  (2 * n // 3, n)]):
        pq.write_table(t.slice(lo, hi - lo), f"{d}/part-{i}.parquet")
    before = read_sink(out, "catchall", ordered=True).to_pandas()

    rep = compact_run(out)
    assert rep["dirs_compacted"] == 1
    assert len(glob.glob(f"{d}/*.parquet")) == 1
    after = read_sink(out, "catchall", ordered=True).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(before.reset_index(drop=True),
                                  after.reset_index(drop=True))
    # crash simulation: live dir renamed away, .compacting completed
    shutil.copytree(d, d + ".compacting")
    shutil.move(d, d + ".gone")
    assert repair_compaction(out)["repaired"] == 1
    assert sorted(glob.glob(f"{d}/*.parquet"))
    shutil.rmtree(d + ".gone")
    # counts survive the whole ordeal
    final = read_sink(out, "catchall", ordered=True).to_pandas()
    assert len(final) == s["sinks"]["catchall"]


def test_delete_convs_crash_heals_lineage(ray_session, tmp_path):
    """Crash between file surgery and lineage commit: manifests go
    stale, but the next delete (or reconcile) re-derives counts from
    observed parquet metadata and heals them; remnant .old dirs are
    neither read nor scrubbed."""
    import glob
    import os
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from fluent_server_ray.pipelines.flagship import (
        delete_convs,
        reconcile_lineage,
        run_pipeline,
    )
    from fluent_server_ray.pipelines.mirror_view import read_sink
    from fluent_server_ray.state.lineage import load_manifests

    out = str(tmp_path / "run")
    s = run_pipeline("/root/testdata/sf0.001", out)
    # simulate the crash: scrub ONE file by hand, no lineage commit
    f = sorted(glob.glob(f"{out}/sinks/*/sink=errors/*.parquet"))[0]
    t = pq.read_table(f)
    kept = t.filter(pc.invert(pc.equal(t["conv_id"], "conv-1")))
    n_gone = t.num_rows - kept.num_rows
    assert n_gone > 0
    pq.write_table(kept, f)
    assert load_manifests(out)[0]["per_sink_counts"]["errors"] \
        == s["sinks"]["errors"]          # stale
    # plant a compaction remnant holding the OLD bytes
    d = os.path.dirname(f)
    shutil.copytree(d, d + ".old")

    rep = delete_convs(out, ["conv-1"])   # the documented repeat
    m = load_manifests(out)[0]
    assert m["per_sink_counts"]["errors"] == s["sinks"]["errors"] - n_gone
    assert m["deletes_applied"] == rep["rows_deleted"] + n_gone
    df = read_sink(out, "errors", ordered=False).to_pandas()
    assert not (df.conv_id == "conv-1").any()
    assert not os.path.isdir(d + ".old")  # repaired away, not scrubbed
    # reconcile alone is idempotent
    assert reconcile_lineage(out)["reconciled"] == 0


def test_delete_time_slices_retention(ray_session, tmp_path):
    """Retention by time slice: dropping slices older than a cutoff is
    a directory unlink, lineage reconciles from observed files, reads
    prune correctly, and the repeat call is a no-op."""
    import glob

    import pytest

    from fluent_server_ray.pipelines.flagship import (
        delete_time_slices,
        run_pipeline,
    )
    from fluent_server_ray.pipelines.mirror_view import read_sink
    from fluent_server_ray.state.lineage import load_manifests

    flat = str(tmp_path / "flat")
    run_pipeline("/root/testdata/sf0.001", flat)
    with pytest.raises(ValueError, match="time_partition"):
        delete_time_slices(flat, before="2024-01-02")
    # pinned read against an unsliced layout refuses instead of
    # reading as silently empty
    from fluent_server_ray.pipelines.mirror_view import read_sink as _rs
    with pytest.raises(ValueError, match="time_partition"):
        _rs(flat, "errors", time_slice="2024-01-02")
    with pytest.raises(ValueError, match="conv_buckets"):
        _rs(flat, "errors", conv_bucket=0)

    out = str(tmp_path / "run")
    s = run_pipeline("/root/testdata/sf0.001", out, time_partition="day")
    days = sorted({
        p.split("tslice=")[1]
        for p in glob.glob(f"{out}/sinks/*/sink=*/tslice=*")
    })
    assert len(days) >= 2
    cutoff = days[1]
    keep = read_sink(out, "errors").to_pandas()
    expect_kept = (keep["time_slice"] >= cutoff).sum()

    with pytest.raises(ValueError, match="exactly one"):
        delete_time_slices(out)
    rep = delete_time_slices(out, before=cutoff)
    assert rep["rows_deleted"] > 0
    m_total = sum(sum(m["per_sink_counts"].values())
                  for m in load_manifests(out))
    assert m_total == s["rows"] - rep["rows_deleted"]
    after = read_sink(out, "errors").to_pandas()
    assert len(after) == expect_kept
    assert (after["time_slice"] >= cutoff).all()
    # repeat = no-op
    rep2 = delete_time_slices(out, before=cutoff)
    assert rep2 == {"dirs_deleted": 0, "rows_deleted": 0, "per_sink": {}}
    # named-slice deletion drops exactly that slice (per_sink is per
    # sink; the read above covered only 'errors')
    rep3 = delete_time_slices(out, slices=[days[-1]])
    assert rep3["per_sink"].get("errors", 0) == (
        after["time_slice"] == days[-1]).sum()
    assert rep3["rows_deleted"] >= rep3["per_sink"].get("errors", 0)


def _index_texts(index_dir):
    """Per-partition distinct text sets of a build_text_index layout."""
    import glob as _glob

    out = {}
    for d in sorted(_glob.glob(os.path.join(index_dir, "hpart=*"))):
        part = os.path.basename(d)
        texts = set()
        for f in _glob.glob(os.path.join(d, "*.parquet")):
            texts |= set(pq.read_table(f, columns=["text"])
                         ["text"].to_pylist())
        out[part] = texts
    return out


DRIVER_INDEX_BUILD = """
import sys, os
sys.path.insert(0, {repo!r})
os.chdir({repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from fluent_server_ray.sources.pq import read_parquet_clean
from fluent_server_ray.stages.dedup import build_text_index
docs = read_parquet_clean({src!r}).select_columns(["doc_id", "text"])
build_text_index(docs, {idx!r}, n_parts=16)
ray.shutdown()
"""


def test_sigkill_mid_index_build_then_rebuild(ray_session, tmp_path):
    """SIGKILL a build_text_index subprocess mid-run: the atomic
    .building publish means the index path either does not exist or is
    the COMPLETE index; repair + rebuild from a fresh session yields a
    probe result identical to a clean one-shot build."""
    import shutil

    from fluent_server_ray.sources.pq import read_parquet_clean
    from fluent_server_ray.stages.dedup import (
        build_text_index,
        dedup_against_index,
        repair_text_index,
    )

    src = "/root/testdata/sf0.001/documents.parquet"
    idx = str(tmp_path / "idx")
    building = idx + ".building"

    proc = subprocess.Popen(
        [sys.executable, "-c",
         DRIVER_INDEX_BUILD.format(repo=REPO, src=src, idx=idx)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    # kill as soon as the builder starts materializing files
    deadline = time.time() + 180
    while time.time() < deadline:
        if os.path.isdir(building) or os.path.isdir(idx):
            break
        if proc.poll() is not None:
            break
        time.sleep(0.05)
    if proc.poll() is None:
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait()

    # atomic-publish contract: the live path is absent or complete —
    # never a half-written partial
    killed_mid_build = not os.path.isdir(idx)

    rep = repair_text_index(idx) if os.path.isdir(idx) else None
    if killed_mid_build:
        # the remnant (if any) sits at .building; rebuild from scratch
        shutil.rmtree(building, ignore_errors=True)
        docs = read_parquet_clean(src).select_columns(["doc_id", "text"])
        build_text_index(docs, idx, n_parts=16)
    else:
        assert rep == {"files_dropped": 0, "building_cleared": False}

    # index-content equality vs a clean one-shot build (per-partition
    # distinct text sets), plus probe equality on a novel-row shard
    clean = str(tmp_path / "clean")
    docs = read_parquet_clean(src).select_columns(["doc_id", "text"])
    build_text_index(docs, clean, n_parts=16)
    assert _index_texts(idx) == _index_texts(clean)
    probe = pd.DataFrame({"doc_id": [1_000_000],
                          "text": ["never-indexed sentinel"]})
    import ray.data as rd

    a = dedup_against_index(rd.from_pandas(probe), idx,
                            n_parts=16).to_pandas()
    b = dedup_against_index(rd.from_pandas(probe), clean,
                            n_parts=16).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    assert list(a["doc_id"]) == [1_000_000]


def test_index_extend_crash_repair_idempotent(ray_session, tmp_path):
    """A truncated part file (simulated crash mid-EXTEND) is dropped by
    repair_text_index, and RE-RUNNING the same extend leaves probe
    results equal to the never-crashed sequence."""
    import glob as _glob

    import ray.data as rd

    from fluent_server_ray.stages.dedup import (
        build_text_index,
        dedup_against_index,
        repair_text_index,
    )

    base = pd.DataFrame({"doc_id": range(6),
                         "text": [f"t{i}" for i in range(6)]})
    ext = pd.DataFrame({"doc_id": range(10, 16),
                        "text": [f"t{i}" for i in range(3, 9)]})
    for name in ("crashed", "clean"):
        build_text_index(rd.from_pandas(base), str(tmp_path / name),
                         n_parts=4)

    idx = str(tmp_path / "crashed")
    # extend, then truncate one of the extend's files mid-byte
    build_text_index(rd.from_pandas(ext), idx, n_parts=4)
    files = sorted(_glob.glob(f"{idx}/hpart=*/*.parquet"),
                   key=os.path.getmtime)
    victim = files[-1]
    data = open(victim, "rb").read()
    open(victim, "wb").write(data[: max(4, len(data) // 2)])

    rep = repair_text_index(idx)
    assert rep["files_dropped"] == 1
    # re-run the SAME extend (the at-least-once re-delivery)
    build_text_index(rd.from_pandas(ext), idx, n_parts=4)

    clean = str(tmp_path / "clean")
    build_text_index(rd.from_pandas(ext), clean, n_parts=4)
    assert _index_texts(idx) == _index_texts(clean)
    # probe: t0..t8 all indexed (drop), one sentinel survives — same
    # result through the crashed-and-repaired index as the clean one
    probe = pd.DataFrame(
        {"doc_id": list(range(100, 109)) + [999],
         "text": [f"t{i}" for i in range(9)] + ["sentinel"]})
    a = dedup_against_index(rd.from_pandas(probe), idx,
                            n_parts=4).to_pandas()
    b = dedup_against_index(rd.from_pandas(probe), clean,
                            n_parts=4).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    assert list(a["doc_id"]) == [999]


def test_minhash_index_extend_crash_repair_idempotent(ray_session, tmp_path):
    """The minhash-index sibling of the text-index crash test: a
    truncated band file (simulated mid-EXTEND crash) is dropped by
    repair_minhash_index, and re-running the same extend leaves probe
    results equal to the never-crashed sequence."""
    import glob as _glob

    import ray.data as rd

    from fluent_server_ray.stages.dedup import (
        build_minhash_index,
        near_dups_against_index,
        repair_minhash_index,
    )

    rng = __import__("numpy").random.default_rng(7)
    vocab = [f"w{i}" for i in range(80)]
    base = pd.DataFrame({
        "doc_id": range(8),
        "text": [" ".join(rng.choice(vocab, size=30)) for _ in range(8)],
    })
    ext = pd.DataFrame({
        "doc_id": range(10, 14),
        "text": [base["text"][i] + " zz" for i in range(4)],  # near-dups
    })
    probe = pd.DataFrame({
        "doc_id": range(100, 104),
        "text": [base["text"][i] + " qq" for i in range(4)],
    })

    for name in ("crashed", "clean"):
        build_minhash_index(rd.from_pandas(base),
                            str(tmp_path / name), n_parts=8)

    idx = str(tmp_path / "crashed")
    build_minhash_index(rd.from_pandas(ext), idx, n_parts=8)
    files = sorted(_glob.glob(f"{idx}/bands/bpart=*/*.parquet"),
                   key=os.path.getmtime)
    victim = files[-1]
    data = open(victim, "rb").read()
    open(victim, "wb").write(data[: max(4, len(data) // 2)])

    rep = repair_minhash_index(idx)
    assert rep["files_dropped"] == 1
    build_minhash_index(rd.from_pandas(ext), idx, n_parts=8)

    clean = str(tmp_path / "clean")
    build_minhash_index(rd.from_pandas(ext), clean, n_parts=8)
    a = near_dups_against_index(rd.from_pandas(probe), idx,
                                threshold=0.5).to_pandas()
    b = near_dups_against_index(rd.from_pandas(probe), clean,
                                threshold=0.5).to_pandas()
    cols = ["doc_a", "doc_b"]
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0  # the planted near-dups are found


def test_sigkill_mid_join_query_rerun_identical(ray_session, tmp_path):
    """SIGKILL a subprocess mid bucketed-hash-join pipeline, then run
    the same query in THIS session: leftover engine/spill state from
    the killed run must not leak into the rerun (result equals the
    DuckDB oracle)."""
    import duckdb

    driver = """
import sys, os
sys.path.insert(0, {repo!r})
os.chdir({repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import importlib.util
spec = importlib.util.spec_from_file_location("__ray_entry__", os.path.join({repo!r}, "__ray_entry__.py"))
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
res = m.queries()["anti_join_customers"]("/root/testdata/sf0.001")
import pandas as pd
df = res.to_pandas() if hasattr(res, "to_pandas") else res
print(len(df))
ray.shutdown()
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", driver.format(repo=REPO)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    time.sleep(2.5)  # mid-pipeline for this corpus size
    if proc.poll() is None:
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(REPO, "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    res = m.queries()["anti_join_customers"]("/root/testdata/sf0.001")
    df = res.to_pandas() if hasattr(res, "to_pandas") else res

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')")
    want = con.execute(m.oracle_sql()["anti_join_customers"]).df()
    cols = sorted(df.columns)
    assert cols == sorted(want.columns)
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_retention_can_empty_store_and_old_named_outdir(
        ray_session, tmp_path):
    """Review regressions: (1) a cutoff that empties every shard must
    reconcile lineage to ZERO, not leave it stale; (2) an out_dir
    whose own name ends in .old must not hide its data from readers
    and surgery."""
    import pytest

    from fluent_server_ray.pipelines.flagship import (
        delete_time_slices,
        run_pipeline,
    )
    from fluent_server_ray.pipelines.mirror_view import read_sink
    from fluent_server_ray.state.lineage import load_manifests

    out = str(tmp_path / "experiment.old")  # adversarial name
    s = run_pipeline("/root/testdata/sf0.001", out,
                     time_partition="day")
    # readers see the data despite the .old-suffixed out_dir
    assert len(read_sink(out, "errors").to_pandas()) \
        == s["sinks"]["errors"]

    rep = delete_time_slices(out, before="9999-99-99")
    assert rep["rows_deleted"] == s["rows"]
    m = load_manifests(out)
    assert sum(mm["row_count"] for mm in m) == 0
    assert sum(mm["deletes_applied"] for mm in m) == s["rows"]
    assert all(sum(mm["per_sink_counts"].values()) == 0 for mm in m)
    with pytest.raises(FileNotFoundError):
        read_sink(out, "errors")
