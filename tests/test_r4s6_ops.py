"""Hand-computed pins for the round-4 sixth-session operators:
Benford audit, association rules, daily-volume autocorrelation,
column profiler."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def test_benford_constants_match_log10():
    from fluent_server_ray.stages.features import BENFORD_MILLIONTHS

    for d in range(1, 10):
        assert BENFORD_MILLIONTHS[d] == math.floor(
            math.log10(1 + 1 / d) * 1_000_000)


def test_benford_audit_hand(ray_session):
    from fluent_server_ray.stages.features import benford_audit

    ds = rd.from_arrow(pa.table({
        "v": pa.array([12.34, 19.99, 2.50, 0.004, 0.005, None, 123.0],
                      pa.float64()),
        "g": pa.array(["a", "a", "a", "a", "a", "a", "b"], pa.string()),
    }))
    got = benford_audit(ds, "v", "g").to_pandas()
    # cents: 1234->1, 1999->1, 250->2, 0 (excluded), 1->1, null
    # (excluded), 12300->1
    assert got.values.tolist() == [
        ["a", 1, 3, 4, 301029],
        ["a", 2, 1, 4, 176091],
        ["b", 1, 1, 1, 301029],
    ]


def test_association_rules_hand(ray_session):
    from fluent_server_ray.stages.features import association_rules

    # two blocks: cross-block duplicate (u1, A) must dedup
    t1 = pa.table({"u": pa.array([1, 1, 2, 2], pa.int64()),
                   "i": pa.array(["A", "B", "A", "B"], pa.string())})
    t2 = pa.table({"u": pa.array([1, 2, 3], pa.int64()),
                   "i": pa.array(["A", "C", "A"], pa.string())})
    got = association_rules(rd.from_arrow([t1, t2]), "u", "i").to_pandas()
    rows = {(r.antecedent, r.consequent): r for r in got.itertuples()}
    # baskets: 1:{A,B} 2:{A,B,C} 3:{A}; supports A=3 B=2 C=1, nb=3
    assert set(rows) == {("A", "B"), ("B", "A"), ("A", "C"), ("C", "A"),
                         ("B", "C"), ("C", "B")}
    r = rows[("A", "B")]
    assert (r.n_both, r.n_ant, r.n_cons, r.n_baskets) == (2, 3, 2, 3)
    assert r.confidence_millionths == 2 * 1_000_000 // 3
    assert r.lift_millionths == 2 * 3 * 1_000_000 // (3 * 2)
    r = rows[("C", "A")]  # confidence 1.0, lift 1.0
    assert r.confidence_millionths == 1_000_000
    assert r.lift_millionths == 1_000_000
    # min_support filters
    got2 = association_rules(rd.from_arrow([t1, t2]), "u", "i",
                             min_support=2).to_pandas()
    assert set(zip(got2["antecedent"], got2["consequent"])) == {
        ("A", "B"), ("B", "A")}


def _events(days_counts, key="x"):
    us, keys = [], []
    for day, n in days_counts:
        for j in range(n):
            us.append(day * 86_400_000_000 + j)
            keys.append(key)
    return pa.table({
        "event_type": pa.array(keys, pa.string()),
        "ts": pa.array(us, pa.timestamp("us")),
    })


def test_volume_autocorr_hand(ray_session):
    from fluent_server_ray.stages.features import volume_autocorr

    # key x: counts 1,2,3,4 on consecutive days -> perfect lag-1 corr
    # key y: only 2 observed days -> 1 pair -> NULL
    # key z: constant counts -> zero variance -> NULL
    # key w: gap days 0,5,6 -> lag pairs over OBSERVED days
    t = pa.concat_tables([
        _events([(0, 1), (1, 2), (2, 3), (3, 4)], "x"),
        _events([(0, 1), (1, 5)], "y"),
        _events([(0, 2), (1, 2), (2, 2)], "z"),
        _events([(0, 1), (5, 2), (6, 4)], "w"),
    ])
    got = volume_autocorr(rd.from_arrow(t)).to_pandas()
    assert list(got["event_type"]) == ["w", "x", "y", "z"]
    assert list(got["n_pairs"]) == [2, 3, 1, 2]
    x = got.set_index("event_type")["corr"]
    assert x["x"] == pytest.approx(1.0)
    assert pd.isna(x["y"]) and pd.isna(x["z"])
    # w: pairs (1,2),(2,4) -> perfect positive
    assert x["w"] == pytest.approx(1.0)


def test_profile_table_hand(ray_session):
    from fluent_server_ray.stages.profile import profile_table

    t1 = pa.table({
        "i": pa.array([5, -3, None], pa.int64()),
        "f": pa.array([1.5, -0.0, 2.5], pa.float64()),
        "s": pa.array(["b", None, "a"], pa.string()),
        "ts": pa.array([1_000_000, 2_000_000, None], pa.timestamp("us")),
    })
    t2 = pa.table({
        "i": pa.array([5, 7], pa.int64()),
        "f": pa.array([0.0, 1.5], pa.float64()),
        "s": pa.array(["a", "c"], pa.string()),
        "ts": pa.array([500_000, None], pa.timestamp("us")),
    })
    got = profile_table(rd.from_arrow([t1, t2])).to_pandas()
    by = got.set_index("col")
    assert (got["n_rows"] == 5).all()
    assert by.loc["i", "n_nulls"] == 1
    assert by.loc["i", "n_distinct"] == 3          # 5, -3, 7
    assert by.loc["i", "min_num"] == -3.0
    assert by.loc["i", "max_num"] == 7.0
    # -0.0 and 0.0 are ONE distinct value and min renders as 0.0
    assert by.loc["f", "n_distinct"] == 3          # 1.5, 0.0, 2.5
    assert by.loc["f", "min_num"] == 0.0
    assert str(by.loc["f", "min_num"]) == "0.0"    # not "-0.0"
    assert by.loc["s", "n_nulls"] == 1
    assert by.loc["s", "n_distinct"] == 3
    assert by.loc["s", "min_str"] == "a"
    assert by.loc["s", "max_str"] == "c"
    assert pd.isna(by.loc["s", "min_num"])
    assert by.loc["ts", "min_num"] == 500_000.0    # epoch micros
    assert by.loc["ts", "n_nulls"] == 2


def test_profile_table_guards(ray_session):
    from fluent_server_ray.stages.profile import profile_table

    nan_ds = rd.from_arrow(pa.table({
        "f": pa.array([1.0, float("nan")], pa.float64())}))
    # the NaN guard fires inside a Ray task -> RayTaskError wrapper
    with pytest.raises(Exception, match="NaN"):
        profile_table(nan_ds)
    big = rd.from_arrow(pa.table({
        "i": pa.array([2 ** 53], pa.int64())}))
    with pytest.raises(ValueError, match="float64-exact"):
        profile_table(big)
    lst = rd.from_arrow(pa.table({
        "l": pa.array([[1, 2]], pa.list_(pa.int64()))}))
    with pytest.raises(ValueError, match="unsupported column type"):
        profile_table(lst)


def _edge_tbl(pairs):
    return pa.table({
        "lo": pa.array([p[0] for p in pairs], pa.string()),
        "hi": pa.array([p[1] for p in pairs], pa.string()),
    })


# path a-b-c-d-e peels one node per round (multi-round), triangle
# x-y-z survives as the 2-core; e-x bridges them
_KCORE_EDGES = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                ("e", "x"), ("x", "y"), ("y", "z"), ("x", "z")]


def test_kcore_multi_round_peel(ray_session):
    from fluent_server_ray.stages.graph import kcore

    got = kcore(_edge_tbl(_KCORE_EDGES), k=2).to_pandas()
    assert got.values.tolist() == [["x", 2], ["y", 2], ["z", 2]]
    # k above the max degree: empty typed result
    empty = kcore(_edge_tbl(_KCORE_EDGES), k=4)
    assert empty.num_rows == 0
    assert empty.schema.names == ["node", "deg"]
    with pytest.raises(ValueError, match="k must be"):
        kcore(_edge_tbl(_KCORE_EDGES), k=0)


def test_kcore_driver_vs_distributed_parity(ray_session):
    from fluent_server_ray.stages.graph import kcore

    a = kcore(_edge_tbl(_KCORE_EDGES), k=2).to_pandas()
    b = kcore(_edge_tbl(_KCORE_EDGES), k=2,
              driver_max_edges=0, n_buckets=4).to_pandas()
    assert a.values.tolist() == b.values.tolist()


def test_maintain_counts_ledger(ray_session, tmp_path):
    from fluent_server_ray.stages.aggregate import maintain_counts

    store = str(tmp_path / "view")
    import os
    os.makedirs(store)

    def shard(types):
        return rd.from_arrow(pa.table({
            "k": pa.array(types, pa.string())}))

    v1 = maintain_counts(store, shard(["a", "a", "b"]), ["k"], "s1")
    assert v1.to_pydict() == {"k": ["a", "b"], "n": [2, 1]}
    v2 = maintain_counts(store, shard(["b", "c"]), ["k"], "s2")
    assert v2.to_pydict() == {"k": ["a", "b", "c"], "n": [2, 2, 1]}
    # replayed delta id: exactly-once effect, view unchanged
    v3 = maintain_counts(store, shard(["b", "c"]), ["k"], "s2")
    assert v3.to_pydict() == v2.to_pydict()
    with open(os.path.join(store, "CURRENT")) as f:
        assert f.read().strip() == "2"


def test_maintain_counts_crash_window(ray_session, tmp_path):
    """A crash AFTER the new epoch dir is written but BEFORE the
    CURRENT pointer swings must leave the old view current, and the
    retry must apply cleanly (at-least-once -> exactly-once)."""
    import json
    import os

    import pyarrow.parquet as pq

    from fluent_server_ray.stages.aggregate import maintain_counts

    store = str(tmp_path / "view")
    os.makedirs(store)

    def shard(types):
        return rd.from_arrow(pa.table({
            "k": pa.array(types, pa.string())}))

    maintain_counts(store, shard(["a"]), ["k"], "s1")
    # fabricate the crash remnant: orphan epoch=2 never pointed at
    edir = os.path.join(store, "epoch=2")
    os.makedirs(edir)
    pq.write_table(pa.table({"k": pa.array(["zz"], pa.string()),
                             "n": pa.array([99], pa.int64())}),
                   os.path.join(edir, "counts.parquet"))
    with open(os.path.join(edir, "manifest.json"), "w") as f:
        json.dump({"applied": ["s1", "s2"]}, f)
    # retry of s2 re-applies against the CURRENT (epoch=1) view,
    # overwriting the orphan remnant
    v = maintain_counts(store, shard(["b"]), ["k"], "s2")
    assert v.to_pydict() == {"k": ["a", "b"], "n": [1, 1]}
    with open(os.path.join(store, "CURRENT")) as f:
        assert f.read().strip() == "2"


def test_merge_intervals_hand(ray_session):
    from fluent_server_ray.stages.windows import merge_intervals

    t = pa.table({
        "k": pa.array(["u", "u", "u", "u", "v", None, "u"], pa.string()),
        "s": pa.array([0, 5, 20, 40, 7, 1, None], pa.int64()),
        "e": pa.array([10, 20, 30, 50, 9, 3, 99], pa.int64()),
    })
    got = merge_intervals(rd.from_arrow(t), "k", "s", "e",
                          n_buckets=4).to_pandas()
    # u: (0,10)+(5,20) overlap, (20,30) TOUCHES -> one span (0,30,3);
    # (40,50) separate. v: single. NULL key own partition. NULL start
    # row dropped.
    recs = [[r["key"], r["start"], r["end"], r["n_merged"]]
            for _, r in got.iterrows()]
    assert [x for x in recs if x[0] == "u"] == [
        ["u", 0, 30, 3], ["u", 40, 50, 1]]
    assert [x for x in recs if x[0] == "v"] == [["v", 7, 9, 1]]
    assert [x for x in recs if x[0] is None] == [[None, 1, 3, 1]]
    assert len(recs) == 4


def test_json_key_profile_hand(ray_session):
    from fluent_server_ray.stages.fields import json_key_profile

    docs = [
        '{"a": 1, "b": "x"}',
        '{"a": 1, "b": "y"}',
        '{"a": 2, "c": null}',       # null: present, not distinct
        '{"a": 1, "b": "x"}',        # duplicate doc (factorize path)
        '[1, 2]',                     # array: no keys
        '"scalar"',                   # scalar: no keys
        None,                         # NULL doc skipped
        '{"d": {"z": 1}, "c": null}',  # nested object value
    ]
    ds = rd.from_arrow(pa.table({"props": pa.array(docs, pa.string())}))
    got = json_key_profile(ds).to_pandas()
    by = got.set_index("key")
    assert list(got["key"]) == ["a", "b", "c", "d"]
    assert by.loc["a", "n_present"] == 4
    assert by.loc["a", "n_distinct"] == 2          # 1, 2
    assert by.loc["b", "n_present"] == 3
    assert by.loc["b", "n_distinct"] == 2          # "x", "y"
    assert by.loc["c", "n_present"] == 2
    assert by.loc["c", "n_distinct"] == 0          # only nulls
    assert by.loc["d", "n_present"] == 1
    assert by.loc["d", "n_distinct"] == 1
    bad = rd.from_arrow(pa.table({
        "props": pa.array(['{"a": }'], pa.string())}))
    with pytest.raises(Exception, match="Expecting value"):
        json_key_profile(bad)


def test_ks_two_sample_hand(ray_session):
    from fluent_server_ray.stages.features import ks_two_sample

    t = pa.table({
        "value": pa.array([1.0, 1.0, 2.0, 2.0, 3.0, 9.9],
                          pa.float64()),
        "event_type": pa.array(["a", "a", "a", "b", "b", "other"],
                               pa.string()),
    })
    got = ks_two_sample(rd.from_arrow(t), "value", "event_type",
                        "a", "b").to_pandas()
    # a: [1,1,2] b: [2,3]; cum@1: |2*2-0*3|=4; @2: |6-3|=3; @3: 0
    assert got.values.tolist() == [[3, 2, 4, 4 * 1_000_000 // 6]]
    # identical distributions -> D = 0
    t2 = pa.table({
        "value": pa.array([1.0, 2.0, 1.0, 2.0], pa.float64()),
        "event_type": pa.array(["a", "a", "b", "b"], pa.string()),
    })
    got2 = ks_two_sample(rd.from_arrow(t2), "value", "event_type",
                         "a", "b").to_pandas()
    assert got2["d_num"].tolist() == [0]
    with pytest.raises(ValueError, match="no rows"):
        ks_two_sample(rd.from_arrow(t2), "value", "event_type",
                      "a", "zzz")
    nan_t = pa.table({
        "value": pa.array([float("nan"), 1.0], pa.float64()),
        "event_type": pa.array(["a", "b"], pa.string()),
    })
    with pytest.raises(Exception, match="NaN"):
        ks_two_sample(rd.from_arrow(nan_t), "value", "event_type",
                      "a", "b")


def test_readability_hand(ray_session):
    from fluent_server_ray.stages.textstats import (apply_doc_stage,
                                                    readability_batch)

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["Hi there. Ok!", "", None, "abc def"],
                         pa.string()),
    }))
    got = apply_doc_stage(docs, readability_batch).to_pandas()
    by = got.set_index("doc_id")
    assert (by.loc[1, ["letters", "words", "sentences"]].tolist()
            == [9, 3, 2])
    # the exact declared float tree
    assert by.loc[1, "cli"] == (0.0588 * (9.0 * 100.0 / 3.0)
                                - 0.296 * (2.0 * 100.0 / 3.0) - 15.8)
    assert by.loc[2, "words"] == 0 and pd.isna(by.loc[2, "cli"])
    assert pd.isna(by.loc[3, "cli"])
    assert by.loc[4, "sentences"] == 0
    assert by.loc[4, "cli"] == (0.0588 * (6.0 * 100.0 / 2.0)
                                - 0.296 * 0.0 - 15.8)


def _brute_lev(a: str, b: str) -> int:
    ab, bb = a.encode(), b.encode()
    prev = list(range(len(bb) + 1))
    for i, ca in enumerate(ab, 1):
        cur = [i]
        for j, cb in enumerate(bb, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(bb)]


def test_fuzzy_join_hand(ray_session):
    from fluent_server_ray.stages.joins import fuzzy_join

    lefts = ["kitten", "apple pie", "zzzzzzz", None, "short",
             "abcdefg"]
    rights = ["sitten", "apple pis", "kitten", "shorts",
              "unrelated x", "abcdefgh"]
    left = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(lefts, pa.string())}))
    right = rd.from_arrow(pa.table({
        "id": pa.array([11, 12, 13, 14, 15, 16], pa.int64()),
        "text": pa.array(rights, pa.string())}))
    got = fuzzy_join(left, right, max_dist=2, prefix_len=16,
                     band_width=4).to_pandas()
    expect = sorted(
        (li + 1, rj + 11, _brute_lev(a[:16], b[:16]))
        for li, a in enumerate(lefts) if a is not None
        for rj, b in enumerate(rights)
        if _brute_lev(a[:16], b[:16]) <= 2)
    assert [tuple(r) for r in got.values.tolist()] == expect
    # exact match and a CROSS-BAND pair (7 bytes = band 1 vs
    # 8 bytes = band 2 at band_width=4) must both be present
    assert (1, 13, 0) in expect and (6, 16, 1) in expect
    with pytest.raises(ValueError, match="band_width"):
        fuzzy_join(left, right, max_dist=4, band_width=4)


def _ev(rows):
    return rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
    }))


def test_multi_funnel_hand(ray_session):
    from fluent_server_ray.stages.windows import multi_funnel

    ds = _ev([
        (1, "s", 100), (1, "c", 200), (1, "p", 300),   # completes
        (2, "c", 50), (2, "s", 100),                   # click BEFORE
        (3, "s", 0), (3, "c", 10), (3, "p", 5000),     # outside T
        (4, "s", 100), (4, "c", 200),                  # no purchase
        # greedy: anchor s@100, clicks at 50 (before) and 400 ->
        # picks 400; purchase at 300 < 400 -> NOT counted
        (5, "s", 100), (5, "c", 50), (5, "c", 400), (5, "p", 300),
    ])
    got = multi_funnel(ds, steps=("s", "c", "p"), within_seconds=1000,
                       n_buckets=4).to_pandas()
    by = got.set_index("user_id")
    assert bool(by.loc[1, "completed"]) is True
    assert pd.isna(by.loc[2, "step2_ts"])          # strict-after
    assert bool(by.loc[2, "completed"]) is False
    assert by.loc[3, "step3_ts"] is not pd.NaT
    assert bool(by.loc[3, "completed"]) is False   # window exceeded
    assert pd.isna(by.loc[4, "step3_ts"])
    assert by.loc[5, "step2_ts"] == pd.Timestamp(400, unit="s")
    assert pd.isna(by.loc[5, "step3_ts"])          # greedy contract
    assert len(got) == 5


def test_volume_xcorr_hand(ray_session):
    from fluent_server_ray.stages.features import volume_xcorr

    rows = []
    for day, n in [(0, 1), (1, 2), (2, 3)]:
        rows += [(1, "a", day * 86_400 + j) for j in range(n)]
    for day, n in [(1, 2), (2, 4), (3, 6)]:
        rows += [(1, "b", day * 86_400 + j) for j in range(n)]
    got = volume_xcorr(_ev(rows), key_a="a", key_b="b",
                       max_lag=3).to_pandas().set_index("lag")
    assert got.loc[1, "n_pairs"] == 3
    assert got.loc[1, "corr"] == pytest.approx(1.0)  # b = 2*a shifted
    assert got.loc[-3, "n_pairs"] == 0
    assert pd.isna(got.loc[-3, "corr"])
    assert len(got) == 7


def test_rfm_scores_hand(ray_session):
    from fluent_server_ray.stages.features import rfm_scores

    day = 86_400
    t = pa.table({
        "user_id": pa.array([1] * 25 + [2] * 2, pa.int64()),
        "ts": pa.array([40 * day * 1_000_000] * 25
                       + [1 * day * 1_000_000] * 2,
                       pa.timestamp("us")),
        "value": pa.array([50.0] * 25 + [600.0, None], pa.float64()),
    })
    got = rfm_scores(rd.from_arrow(t)).to_pandas().set_index("key")
    # user 1: recency 0 (tier 3), freq 25 (tier 2), 125000c (tier 3)
    assert got.loc[1, ["recency_days", "frequency",
                       "monetary_cents"]].tolist() == [0, 25, 125000]
    assert got.loc[1, "rfm_code"] == 323
    # user 2: recency 39d (tier 1), freq 2 (tier 1), 60000c (tier 2;
    # NULL value contributes 0 cents)
    assert got.loc[2, ["recency_days", "frequency",
                       "monetary_cents"]].tolist() == [39, 2, 60000]
    assert got.loc[2, "rfm_code"] == 112


def test_diversified_topk_hand(ray_session):
    from fluent_server_ray.stages.features import diversified_topk

    t = pa.table({
        "event_id": pa.array(list(range(10)), pa.int64()),
        "user_id": pa.array([1] * 6 + [2] * 4, pa.int64()),
        "value": pa.array([100.0, 90, 80, 70, 60, 50,
                           40, 30, 20, 10], pa.float64()),
    })
    got = diversified_topk(rd.from_arrow(t), k=5, per_group=2,
                           n_buckets=4).to_pandas()
    # both users capped at their best 2 -> only 4 survivors for k=5
    assert got["id"].tolist() == [0, 1, 6, 7]
    assert got["val"].tolist() == [100.0, 90.0, 40.0, 30.0]
    got3 = diversified_topk(rd.from_arrow(t), k=5, per_group=3,
                            n_buckets=4).to_pandas()
    assert got3["id"].tolist() == [0, 1, 2, 6, 7]


def test_sorted_neighborhood_hand(ray_session):
    from fluent_server_ray.stages.dedup import sorted_neighborhood_pairs

    texts = ["alpha one", "alph two", "beta x", "betty y", None,
             "alpz q", "gamma z"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(7)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = sorted_neighborhood_pairs(ds, key_len=4, window=3,
                                    n_buckets=4).to_pandas()
    # brute-force twin: rank by (4-codepoint prefix, id), pairs with
    # rank distance < window
    order = sorted((t[:4], i) for i, t in enumerate(texts)
                   if t is not None)
    expect = sorted(
        (min(order[i][1], order[j][1]), max(order[i][1], order[j][1]),
         j - i)
        for i in range(len(order)) for j in range(i + 1, len(order))
        if j - i < 3)
    assert [tuple(r) for r in got.values.tolist()] == expect
    # windows must SPAN key boundaries (the SNM point): an
    # (alph*, beta*) cross-key pair exists
    keys = {i: (t[:4] if t else None) for i, t in enumerate(texts)}
    assert any(keys[a] != keys[b] for a, b, _ in expect)


def test_vocab_growth_hand(ray_session):
    from fluent_server_ray.stages.textstats import vocab_growth

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 9], pa.int64()),
        "text": pa.array(["a b", "b c", None, "c d d", "far out"],
                         pa.string()),
    }))
    got = vocab_growth(ds, boundaries=[1, 3, 4]).to_pandas()
    # doc 9 is beyond the last boundary: contributes nothing
    assert got.values.tolist() == [
        [1, 1, 2, 2],    # docs {1}: 2 tokens, vocab {a,b}
        [3, 2, 4, 3],    # + doc 2: 4 tokens, vocab {a,b,c}
        [4, 3, 7, 4],    # + doc 4: 7 tokens, vocab {a,b,c,d}
    ]


def test_sliding_distinct_users_hand(ray_session):
    from fluent_server_ray.stages.windows import sliding_distinct_users

    t = pa.table({
        "user_id": pa.array([1, 1, 2, 3], pa.int64()),
        # seconds 0, 1700, 1900, 3700 with width 3600 slide 1800
        "ts": pa.array([0, 1_700_000_000, 1_900_000_000,
                        3_700_000_000], pa.timestamp("us")),
    })
    got = sliding_distinct_users(
        rd.from_arrow(t), width_seconds=3600,
        slide_seconds=1800).to_pandas()
    # windows covering each event: t=0 -> [-1800, 0]; t=1700 ->
    # [-1800, 0]; t=1900 -> [0, 1800]; t=3700 -> [1800, 3600]
    assert got.values.tolist() == [
        [-1800, 1], [0, 2], [1800, 2], [3600, 1]]


def test_rolling_agg_hand(ray_session):
    from fluent_server_ray.stages.windows import rolling_frame_sum

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 10], pa.int64()),
        "user_id": pa.array([7, 7, 7, 7, 8], pa.int64()),
        "ts": pa.array([100, 200, 300, 400, 50],
                       pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, None, 4.0, 9.995], pa.float64()),
    })
    got = rolling_frame_sum(rd.from_arrow(t), window_rows=2,
                      n_buckets=4).to_pandas()
    by = got.set_index("id")
    # user 7 cents: 100, 200, 0 (NULL occupies a slot), 400
    assert by.loc[1, "rolling_sum_cents"] == 100
    assert by.loc[2, "rolling_sum_cents"] == 300
    assert by.loc[3, "rolling_sum_cents"] == 200   # 200 + 0
    assert by.loc[4, "rolling_sum_cents"] == 400   # 0 + 400
    assert by.loc[4, "rolling_n"] == 2
    # 9.995 * 100.0 = 999.4999... in float64 — the contract IS the
    # shared float expression (both engines agree on 999)
    assert by.loc[10, "cents"] == 999
    assert by.loc[10, "rolling_n"] == 1


def test_transfer_labels_hand(ray_session):
    from fluent_server_ray.stages.dedup import transfer_labels

    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([1, 2, 5], pa.int64()),
        "doc_b": pa.array([2, 3, 6], pa.int64()),
    }))
    labels = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 5, 6], pa.int64()),
        "label": pa.array(["en", None, "fr", None, None],
                          pa.string()),
    }))
    got = transfer_labels(pairs, labels, n_buckets=4).to_pandas()
    by = got.set_index("doc_id")
    assert by.loc[1, "label"] == "en"          # keeps own
    assert by.loc[3, "label"] == "fr"          # keeps own
    # node 2: component mode of {en, fr} -> tie -> smallest ('en')
    assert by.loc[2, "label"] == "en"
    # component {5, 6}: no labeled member -> NULL
    assert pd.isna(by.loc[5, "label"]) and pd.isna(by.loc[6, "label"])
    assert list(by.index) == [1, 2, 3, 5, 6]


# ---- self-review regression pins (session code-review findings) ----


def test_benford_negative_values_no_crash(ray_session):
    from fluent_server_ray.stages.features import benford_audit

    ds = rd.from_arrow(pa.table({
        "v": pa.array([-5.0, -0.01, 12.34], pa.float64()),
        "g": pa.array(["a", "a", "a"], pa.string()),
    }))
    got = benford_audit(ds, "v", "g").to_pandas()
    # negatives excluded (cents < 1), never a '-' digit-parse crash
    assert got.values.tolist() == [["a", 1, 1, 1, 301029]]


def test_volume_autocorr_single_day_key(ray_session):
    import duckdb

    from fluent_server_ray.stages.features import (volume_autocorr,
                                                   volume_autocorr_sql)

    t = pa.concat_tables([
        _events([(0, 1), (1, 2), (2, 3)], "multi"),
        _events([(5, 4)], "solo"),      # ONE observed day
    ])
    got = volume_autocorr(rd.from_arrow(t)).to_pandas()
    by = got.set_index("event_type")
    assert by.loc["solo", "n_pairs"] == 0
    assert pd.isna(by.loc["solo", "corr"])
    # the mirror must keep the single-day key too
    con = duckdb.connect()
    con.register("events_arrow", t.to_pandas())
    sql = volume_autocorr_sql(table="events_arrow")
    odf = con.execute(sql).fetchdf()
    assert sorted(odf["event_type"]) == ["multi", "solo"]
    assert int(odf.set_index("event_type").loc["solo",
                                               "n_pairs"]) == 0


def test_sliding_distinct_null_rows(ray_session):
    from fluent_server_ray.stages.windows import sliding_distinct_users

    t = pa.table({
        "user_id": pa.array([1, None, 2], pa.int64()),
        "ts": pa.array([3_600_000_000, 3_600_000_000, None],
                       pa.timestamp("us")),
    })
    got = sliding_distinct_users(rd.from_arrow(t), 3600,
                                 1800).to_pandas()
    # only user 1 at t=3600 survives; NULL user / NULL ts excluded
    assert got.values.tolist() == [[1800, 1], [3600, 1]]
    with pytest.raises(ValueError, match="multiple of slide"):
        sliding_distinct_users(rd.from_arrow(t), 3600, 1000)


def test_empty_input_typed_results(ray_session):
    from fluent_server_ray.stages.features import (association_rules,
                                                   rfm_scores)
    from fluent_server_ray.stages.textstats import vocab_growth

    empty_ev = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "value": pa.array([], pa.float64()),
        "event_type": pa.array([], pa.string()),
    }))
    r = rfm_scores(empty_ev)
    assert r.count() == 0
    a = association_rules(empty_ev, "user_id", "event_type")
    assert a.num_rows == 0
    assert a.schema.names[:2] == ["antecedent", "consequent"]
    empty_docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    v = vocab_growth(empty_docs, boundaries=[10, 20]).to_pandas()
    assert v.values.tolist() == [[10, 0, 0, 0], [20, 0, 0, 0]]


def test_json_key_profile_duplicate_key_raises(ray_session):
    from fluent_server_ray.stages.fields import json_key_profile

    ds = rd.from_arrow(pa.table({
        "props": pa.array(['{"a": 1, "a": 2}'], pa.string())}))
    with pytest.raises(Exception, match="duplicate top-level key"):
        json_key_profile(ds)


def test_cube_counts_hand(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from fluent_server_ray.pipelines.relational import cube_order_counts

    # includes a genuinely-NULL status row: the lvl column is what
    # keeps that fine row distinguishable from the priority marginal
    pq.write_table(pa.table({
        "o_orderpriority": pa.array(["P1", "P1", "P2", "P2"],
                                    pa.string()),
        "o_orderstatus": pa.array(["O", "F", "O", None], pa.string()),
    }), str(tmp_path / "orders.parquet"))
    got = cube_order_counts(str(tmp_path)).to_pandas()
    rows = {(r["o_orderpriority"], r["o_orderstatus"], r["lvl"]): r["n"]
            for _, r in got.iterrows()}
    assert rows[("P1", "O", 0)] == 1 and rows[("P1", "F", 0)] == 1
    assert rows[("P2", None, 0)] == 1       # FINE row w/ NULL status
    assert rows[("P1", None, 1)] == 2       # priority marginal
    assert rows[("P2", None, 1)] == 2
    assert rows[(None, "O", 2)] == 2        # status marginal
    assert rows[(None, None, 2)] == 1       # status-NULL marginal
    assert rows[(None, None, 3)] == 4       # grand total
    assert len(rows) == len(got)            # (a, b, lvl) is unique


def test_quantile_normalize_hand(ray_session):
    from fluent_server_ray.stages.features import quantile_normalize

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "event_type": pa.array(["a", "a", "a", "b", "b", "b", "b"],
                               pa.string()),
        "value": pa.array([10.0, 20.0, 30.0, 1.0, 2.0, 2.0, None],
                          pa.float64()),
    })
    got = quantile_normalize(rd.from_arrow(t),
                             n_buckets=4).to_pandas()
    by = got.set_index("id")
    # pooled sorted: [1, 2, 2, 10, 20, 30], N=6
    # group a (ng=3): ranks 0,1,2 -> idx 0,2,4 -> values 1, 2, 20
    assert by.loc[1, "normalized"] == 1.0
    assert by.loc[2, "normalized"] == 2.0
    assert by.loc[3, "normalized"] == 20.0
    # group b (ng=3, NULL row excluded): same idx -> same values:
    # distributions align exactly
    assert by.loc[4, "normalized"] == 1.0
    assert by.loc[5, "normalized"] == 2.0
    assert by.loc[6, "normalized"] == 20.0
    assert 7 not in by.index                # NULL value: no row


def test_fd_violations_hand(ray_session):
    from fluent_server_ray.stages.profile import fd_violations

    t = pa.table({
        "l": pa.array(["a", "a", "b", "b", "b", "c", None],
                      pa.string()),
        "r": pa.array(["x", "x", "x", "y", "z", None, "q"],
                      pa.string()),
    })
    got = fd_violations(rd.from_arrow(t), "l", "r").to_pandas()
    # a -> {x} ok; b -> {x,y,z} violates (3); c has ONLY NULL rhs ->
    # no evidence, not counted; NULL lhs row EXCLUDED
    assert got.values.tolist() == [
        [2, 1, 1_000_000 // 2, 3]]


def test_order_audit_hand(ray_session):
    from fluent_server_ray.stages.profile import order_audit

    t = pa.table({
        "conv_id": pa.array(["c1"] * 4 + ["c2"] * 2 + ["c3"],
                            pa.string()),
        "turn_idx": pa.array([0, 1, 2, 3, 0, 1, 0], pa.int32()),
        "ts": pa.array([10, 20, 20, 5, 100, 200, None],
                       pa.timestamp("us")),
    })
    got = order_audit(rd.from_arrow(t), n_buckets=4).to_pandas()
    # c1 steps: 10->20 ok, 20->20 inversion (<=), 20->5 inversion;
    # c2: one ok step; c3: NULL ts row dropped -> no key
    assert got.values.tolist() == [
        [2, 4, 2, 2 * 1_000_000 // 4]]


def test_pareto_shares_hand(ray_session):
    from fluent_server_ray.stages.features import pareto_shares

    t = pa.table({
        "user_id": pa.array([1, 1, 2, 3, 4], pa.int64()),
        "value": pa.array([5.0, 5.0, 6.0, 3.0, 1.0], pa.float64()),
    })
    # sums (cents): u1=1000, u2=600, u3=300, u4=100; total 2000
    got = pareto_shares(rd.from_arrow(t), q=2,
                        n_buckets=4).to_pandas()
    # tile 1 = {u1, u2} (1600), tile 2 = {u3, u4} (400)
    assert got.values.tolist() == [
        [1, 2, 1600, 1600 * 1_000_000 // 2000],
        [2, 2, 400, 1_000_000],
    ]


def test_changepoint_split_hand(ray_session):
    from fluent_server_ray.stages.features import changepoint_split

    # key x: 5 days of counts [1, 1, 1, 5, 5] — level shift at day 3
    # key solo: one day only -> no split, omitted
    t = pa.concat_tables([
        _events([(0, 1), (1, 1), (2, 1), (3, 5), (4, 5)], "x"),
        _events([(9, 4)], "solo"),
    ])
    got = changepoint_split(rd.from_arrow(t)).to_pandas()
    assert list(got["event_type"]) == ["x"]
    assert got["split_day"].tolist() == [3]
    assert got["n_days"].tolist() == [5]
    # k=3: a = 3*2 - 10*3 = -24; gain = 576e6 // 6 = 96e6
    assert got["gain_scaled"].tolist() == [96_000_000]


def test_audit_ops_empty_and_null_edges(ray_session):
    import duckdb

    from fluent_server_ray.stages.features import (pareto_shares,
                                                   pareto_shares_sql)
    from fluent_server_ray.stages.profile import (fd_violations,
                                                  fd_violations_sql,
                                                  order_audit)

    # order_audit: all rows filtered -> the zero row, not a crash;
    # NULL keys excluded like SQL count(DISTINCT)
    t = pa.table({
        "conv_id": pa.array([None, "c"], pa.string()),
        "turn_idx": pa.array([0, None], pa.int32()),
        "ts": pa.array([1, 2], pa.timestamp("us")),
    })
    got = order_audit(rd.from_arrow(t), n_buckets=4).to_pandas()
    assert got.values.tolist() == [[0, 0, 0, 0]]

    con = duckdb.connect()
    # fd mirror on an empty pair set returns 0s (not NULLs)
    con.execute("CREATE TABLE e1 (l VARCHAR, r VARCHAR)")
    assert con.execute(fd_violations_sql("l", "r", "e1")).fetchall() \
        == [(0, 0, 0, 0)]
    # pareto: zero grand total -> cum shares 0 in BOTH engines
    zt = pa.table({"user_id": pa.array([1, 2], pa.int64()),
                   "value": pa.array([0.0, 0.0], pa.float64())})
    gz = pareto_shares(rd.from_arrow(zt), q=2,
                       n_buckets=4).to_pandas()
    assert gz["cum_millionths"].tolist() == [0, 0]
    con.register("e2", zt.to_pandas())
    oz = con.execute(pareto_shares_sql(q=2, table="e2")).fetchdf()
    assert oz["cum_millionths"].tolist() == [0, 0]
    # engine empty input
    ez = fd_violations(rd.from_arrow(pa.table({
        "l": pa.array([], pa.string()),
        "r": pa.array([], pa.string())})), "l", "r").to_pandas()
    assert ez.values.tolist() == [[0, 0, 0, 0]]


def test_column_topk_hand(ray_session):
    from fluent_server_ray.stages.profile import column_topk

    t1 = pa.table({
        "s": pa.array(["a", "a", "b", None], pa.string()),
        "i": pa.array([7, 7, 7, 2], pa.int64()),
        "ts": pa.array([1_000_000] * 4, pa.timestamp("us")),
    })
    t2 = pa.table({
        "s": pa.array(["b", "c"], pa.string()),
        "i": pa.array([2, 2], pa.int64()),
        "ts": pa.array([2_000_000, 1_000_000], pa.timestamp("us")),
    })
    got = column_topk(rd.from_arrow([t1, t2]),
                      ["s", "i", "ts"], k=2,
                      n_buckets=4).to_pandas()
    rows = [tuple(r) for r in got.values.tolist()]
    # s: a=2, b=2 tie -> 'a' first (value asc); c=1 cut at k=2
    assert [r for r in rows if r[0] == "s"] == [
        ("s", "a", 2, 1), ("s", "b", 2, 2)]
    # i: 7 and 2 both 3x -> STRING tie-break: "2" < "7"
    assert ("i", "2", 3, 1) in rows and ("i", "7", 3, 2) in rows
    # ts renders as epoch micros
    assert ("ts", "1000000", 5, 1) in rows
    assert len(rows) == 6
    with pytest.raises(ValueError, match="float columns"):
        column_topk(rd.from_arrow(pa.table({
            "f": pa.array([1.0], pa.float64())})), ["f"])
