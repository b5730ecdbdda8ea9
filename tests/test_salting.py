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
