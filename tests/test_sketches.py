"""HyperLogLog: accuracy within theoretical bounds, merge = union,
determinism across processes."""

import numpy as np
import pandas as pd
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


def test_misra_gries_guarantees():
    """MG bound: every key above W/(m+1) survives, and estimates
    undercount by at most W/(m+1) — checked against exact counts on a
    skewed stream with capacity << distinct keys; merge order
    consistency checked by splitting the stream."""
    import numpy as np

    from fluent_server_ray.stages.sketches import MisraGries

    rng = np.random.default_rng(13)
    keys = [f"k{int(z)}" for z in rng.zipf(1.3, size=20_000) % 2000]
    exact: dict = {}
    for k in keys:
        exact[k] = exact.get(k, 0) + 1
    W = len(keys)
    m = 64

    whole = MisraGries(m).update_counts(keys, [1] * len(keys))
    half = MisraGries(m).update_counts(keys[:10_000], [1] * 10_000)
    half.merge(MisraGries(m).update_counts(keys[10_000:], [1] * 10_000))

    for sk in (whole, half):
        err = W / (m + 1)
        for k, true_n in exact.items():
            est = sk.counters.get(k, 0)
            assert est <= true_n  # never overcounts
            assert true_n - est <= err, (k, true_n, est)
            if true_n > err:
                assert k in sk.counters  # heavy keys always survive


def test_misra_gries_exact_when_capacity_suffices():
    from fluent_server_ray.stages.sketches import MisraGries

    mg = MisraGries(100).update_counts(list("aabbbc"), [1] * 6)
    assert mg.top(3) == [("b", 3), ("a", 2), ("c", 1)]


def test_kmv_exact_regime_and_merge(ray_session):
    """Distinct < k: the sketch IS the hash set — estimate and jaccard
    are exact; merging block sketches == one global sketch."""
    import ray.data as rd

    from fluent_server_ray.stages.sketches import KMVSketch, kmv_sketch

    a = KMVSketch(64); a.add_values(np.arange(40))
    b = KMVSketch(64); b.add_values(np.arange(20, 60))
    assert a.estimate() == 40.0 and b.estimate() == 40.0
    assert a.jaccard(b) == 20 / 60  # |∩|=20, |∪|=60, union fits k
    # distributed build == local build
    ds = rd.from_pandas(pd.DataFrame({"v": np.arange(40)})).repartition(4)
    d = kmv_sketch(ds, "v", k=64)
    assert d.estimate() == 40.0
    assert sorted(d.hashes) == sorted(a.hashes)
    # serialize round-trip
    r = KMVSketch.deserialize(a.serialize())
    assert r.k == a.k and (r.hashes == a.hashes).all()


def test_kmv_estimator_accuracy():
    """Approximate regime: distinct and jaccard estimates land within
    the standard ~1/sqrt(k) error band on a 50k-distinct set."""
    from fluent_server_ray.stages.sketches import KMVSketch

    n = 50_000
    a = KMVSketch(1024); a.add_values(np.arange(n))
    b = KMVSketch(1024); b.add_values(np.arange(n // 2, n + n // 2))
    est = a.estimate()
    assert abs(est - n) / n < 0.15
    j = a.jaccard(b)   # true J = (n/2) / (3n/2) = 1/3
    assert abs(j - 1 / 3) < 0.08


def test_exact_distinct_count(ray_session):
    """The exact twin the HLL row is checked against: equals DuckDB
    count(DISTINCT); NULLs uncounted; empty dataset -> 0."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.sketches import exact_distinct_count

    ds = rd.from_pandas(pd.DataFrame(
        {"u": ["a", "b", "a", None, "c", "b", None]}))
    assert exact_distinct_count(ds, "u") == 3

    events = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                             columns=["user_id"])
    exact = duckdb.sql(
        "SELECT count(DISTINCT user_id) FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()[0]
    assert exact_distinct_count(events, "user_id") == exact

    empty = rd.from_pandas(pd.DataFrame({"u": pd.array([], dtype="string")}))
    assert exact_distinct_count(empty, "u") == 0
