"""HyperLogLog: accuracy within theoretical bounds, merge = union,
determinism across processes."""

import numpy as np
import pytest

from fluent_server_ray.stages.sketches import HyperLogLog


@pytest.mark.parametrize("n", [100, 10_000, 200_000])
def test_hll_accuracy(n):
    h = HyperLogLog(p=12)
    vals = np.asarray([f"v{i}" for i in range(n)], dtype=object)
    h.add_values(vals)
    est = h.estimate()
    # standard error ~1.04/sqrt(2^12) ≈ 1.6%; allow 5% plus small-n slack
    assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_equals_union():
    a, b, u = HyperLogLog(), HyperLogLog(), HyperLogLog()
    va = np.asarray([f"a{i}" for i in range(5000)], dtype=object)
    vb = np.asarray([f"b{i}" for i in range(5000)], dtype=object)
    overlap = np.asarray([f"a{i}" for i in range(2500)], dtype=object)
    a.add_values(va)
    b.add_values(np.concatenate([vb, overlap]))
    u.add_values(np.concatenate([va, vb]))
    merged = HyperLogLog.deserialize(a.serialize()).merge(
        HyperLogLog.deserialize(b.serialize())
    )
    assert merged.estimate() == pytest.approx(u.estimate(), rel=1e-9)


def test_hll_duplicates_dont_inflate():
    h = HyperLogLog()
    vals = np.asarray(["same"] * 100_000 + ["other"], dtype=object)
    h.add_values(vals)
    assert 1 <= h.estimate() <= 4


def test_approx_distinct_dataset(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.sketches import approx_distinct

    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet",
                         columns=["user_id"])
    import duckdb

    exact = duckdb.sql(
        "SELECT count(DISTINCT user_id) FROM "
        "read_parquet('/root/testdata/sf0.01/events.parquet')"
    ).fetchone()[0]
    est = approx_distinct(ds, "user_id")
    assert abs(est - exact) / exact < 0.05


def test_bloom_filter_no_false_negatives_and_low_fpr():
    from fluent_server_ray.stages.sketches import BloomFilter

    members = np.asarray([f"in-{i}" for i in range(20_000)], dtype=object)
    others = np.asarray([f"out-{i}" for i in range(20_000)], dtype=object)
    bf = BloomFilter(n_items=len(members), fpr=0.01)
    bf.add(members)
    assert bf.contains(members).all()  # Bloom property: zero false negatives
    fpr = bf.contains(others).mean()
    assert fpr < 0.03, fpr


def test_bloom_merge_is_union():
    from fluent_server_ray.stages.sketches import BloomFilter

    a_vals = np.asarray([f"a{i}" for i in range(5000)], dtype=object)
    b_vals = np.asarray([f"b{i}" for i in range(5000)], dtype=object)
    a = BloomFilter(10_000, 0.01); a.add(a_vals)
    b = BloomFilter(10_000, 0.01); b.add(b_vals)
    a.merge(b)
    assert a.contains(a_vals).all() and a.contains(b_vals).all()
