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


def test_salt_spreads_single_hot_key(ray_session):
    """THE point of salting: one hot key's rows must land on many
    salts (a per-key-constant salt would keep the hot key on one
    reducer and spread nothing)."""
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import add_salt

    df = pd.DataFrame({"k": ["hot"] * 1000})
    out = add_salt(rd.from_pandas(df), "k", n_salts=8).to_pandas()
    counts = out["_salt"].value_counts()
    assert len(counts) == 8  # all salts used
    assert counts.max() <= 1000 // 8 + 8  # ~uniform spread


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
