"""Skew handling: salted two-level aggregation is exact (counts are
algebraic) and the salt is deterministic across processes."""

import pandas as pd
import pyarrow as pa


def test_salted_two_level_counts_equal_plain(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import add_salt, grouped_counts
    from ray.data.aggregate import Sum

    # Zipf-hot key: 'hot' dominates (the reference's hot-tag list under
    # one mutex, mirror/mirror.go:30-38, is the failure mode)
    df = pd.DataFrame({"tag": ["hot"] * 5000 + ["cold%d" % i for i in range(500)]})
    ds = rd.from_pandas(df)

    plain = grouped_counts(ds, ["tag"]).to_pandas()

    salted = add_salt(rd.from_pandas(df), "tag", n_salts=8)
    # level 1: count per (tag, salt) — hot key spread over 8 reducers
    lvl1 = grouped_counts(salted, ["tag", "_salt"], final="ray")
    # level 2: sum the partials per tag
    lvl2 = (
        lvl1.groupby("tag").aggregate(Sum("n", alias_name="n")).to_pandas()
    )

    a = plain.sort_values("tag").reset_index(drop=True)
    b = lvl2.sort_values("tag").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert int(a.loc[a["tag"] == "hot", "n"].iloc[0]) == 5000


def test_salt_deterministic_across_workers(ray_session):
    """pd.util.hash_array is fixed-key SipHash — same salt everywhere
    (python hash() would differ per process and break repartitioning)."""
    import ray

    from fluent_server_ray.stages.aggregate import add_salt
    import ray.data as rd

    df = pd.DataFrame({"k": [f"key-{i}" for i in range(100)]})

    @ray.remote
    def salts_in_subprocess():
        import pandas as pd_
        import numpy as np

        h = pd_.util.hash_array(
            np.asarray([f"key-{i}" for i in range(100)], dtype=object)
        )
        return (h % 8).tolist()

    local = add_salt(rd.from_pandas(df), "k", n_salts=8).to_pandas()
    remote = ray.get(salts_in_subprocess.remote())
    assert local["_salt"].tolist() == remote


def test_large_lookup_set_fast_path(ray_session):
    """Multi-million-key broadcast lookup uses the cached-index path
    and returns identical results to the small-set path."""
    import pyarrow as pa

    from fluent_server_ray.stages import enrich

    big = {f"k-{i}": f"v-{i % 5}" for i in range(600_000)}
    ref = enrich.put_lookup(big)
    batch = pa.array([f"k-{i}" for i in range(0, 1200_000, 2)])  # half missing
    out = enrich.lookup_column(batch, ref, default="dflt")
    # spot-check: present keys map, absent keys default
    got = out.to_pylist()
    assert got[0] == "v-0" and got[1] == "v-2"
    assert got[-1] == "dflt"  # k-1199998 not in the map
    # small-set path parity on a subset
    small_ref = enrich.put_lookup({k: big[k] for k in list(big)[:1000]})
    sub = pa.array(list(big)[:1000])
    a = enrich.lookup_column(sub, small_ref).to_pylist()
    b = [big[k] for k in list(big)[:1000]]
    assert a == b
