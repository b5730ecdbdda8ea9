"""Hand-computed pins for the round-4 eighth-session operators:
Mann-Whitney U pairs, and later additions this session."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _events(groups, values):
    return rd.from_arrow(pa.table({
        "event_type": pa.array(groups, pa.string()),
        "value": pa.array(values, pa.float64()),
    }))


def test_mannwhitney_no_ties_hand(ray_session):
    from fluent_server_ray.stages.features import mannwhitney_pairs

    # a: [1, 3], b: [2, 4]; pooled ranks 1..4 (no ties)
    # rank_sum_a = 1 + 3 = 4 -> r2a = 8; u2a = 8 - 2*3 = 2 (U_a = 1)
    # auc = 1 / 4 -> 250000 millionths
    got = mannwhitney_pairs(
        _events(["a", "a", "b", "b"], [1.0, 3.0, 2.0, 4.0])).to_pandas()
    assert got.values.tolist() == [["a", "b", 2, 2, 8, 2, 250000]]


def test_mannwhitney_ties_midrank(ray_session):
    from fluent_server_ray.stages.features import mannwhitney_pairs

    # a: [1, 2], b: [2, 3]; ties at 2 share midrank 2.5 (r2 = 5)
    # r2a = 2*1 + 5 = 7; u2a = 7 - 2*3 = 1 (U_a = 0.5)
    # auc = 0.5/4 = 0.125 -> 125000
    got = mannwhitney_pairs(
        _events(["a", "a", "b", "b"], [1.0, 2.0, 2.0, 3.0])).to_pandas()
    assert got.values.tolist() == [["a", "b", 2, 2, 7, 1, 125000]]


def test_mannwhitney_all_pairs_and_nulls(ray_session):
    from fluent_server_ray.stages.features import mannwhitney_pairs

    got = mannwhitney_pairs(_events(
        ["a", "b", "c", "c", "a"],
        [1.0, 2.0, 3.0, 4.0, None])).to_pandas()
    # NULL a-value dropped -> a has 1 row. pairs: (a,b) (a,c) (b,c)
    assert got["group_a"].tolist() == ["a", "a", "b"]
    assert got["group_b"].tolist() == ["b", "c", "c"]
    # (a,b): a=[1] b=[2] -> rank_a=1 r2a=2 u2a=2-2=0 auc=0
    row = got.iloc[0]
    assert [row.n_a, row.n_b, row.rank_sum2_a, row.u2_a,
            row.auc_millionths] == [1, 1, 2, 0, 0]
    # (b,c): b=[2] c=[3,4] -> rank_b=1 r2a=2 u2a=2-2=0
    row = got.iloc[2]
    assert [row.n_a, row.n_b, row.u2_a] == [1, 2, 0]


def test_mannwhitney_scipy_parity(ray_session):
    from fluent_server_ray.stages.features import mannwhitney_pairs

    rng = np.random.default_rng(7)
    va = np.round(rng.normal(10, 3, 200), 1)
    vb = np.round(rng.normal(11, 3, 150), 1)
    got = mannwhitney_pairs(_events(
        ["a"] * 200 + ["b"] * 150,
        np.concatenate([va, vb]).tolist())).to_pandas()
    # independent midrank reference via pandas
    pooled = pd.Series(np.concatenate([va, vb]))
    ranks = pooled.rank(method="average")
    r_a = float(ranks[:200].sum())
    u_a = r_a - 200 * 201 / 2
    row = got.iloc[0]
    assert row.rank_sum2_a == int(round(2 * r_a))
    assert row.u2_a == int(round(2 * u_a))
    assert row.auc_millionths == int(2 * u_a) * 500_000 // (200 * 150)


def _ev_ts(users, days):
    ts = pa.array([np.datetime64(f"2024-01-{d:02d}", "us") for d in days],
                  pa.timestamp("us"))
    return rd.from_arrow(pa.table({
        "user_id": pa.array(users, pa.int64()), "ts": ts}))


def test_km_survival_hand(ray_session):
    from fluent_server_ray.stages.features import km_survival

    # day numbers within Jan 2024; corpus max day = 11 (u1 last)
    # u1: 1..11 (t=10, last=11 > 11-7 -> censored)
    # u2: 1..4  (t=3, last=4 <= 4 -> death)
    # u3: 3..3  (t=0, death)
    # u4: 2..10 (t=8, last=10 > 4 -> censored)
    ds = _ev_ts([1, 1, 2, 2, 3, 4, 4], [1, 11, 1, 4, 3, 2, 10])
    got = km_survival(ds).to_pandas()
    assert got["t_days"].tolist() == [0, 3, 8, 10]
    assert got["n_at_risk"].tolist() == [4, 3, 2, 1]
    assert got["d_events"].tolist() == [1, 1, 0, 0]
    assert got["c_censored"].tolist() == [0, 0, 1, 1]
    # s: 1e6*3//4=750000; *2//3=500000; censor rows unchanged
    assert got["survival_millionths"].tolist() == [
        750000, 500000, 500000, 500000]


def test_km_survival_all_censored(ray_session):
    from fluent_server_ray.stages.features import km_survival

    # everyone's last event within the censor window -> no deaths,
    # survival stays 1e6
    ds = _ev_ts([1, 2], [10, 11])
    got = km_survival(ds).to_pandas()
    assert got["d_events"].sum() == 0
    assert (got["survival_millionths"] == 1_000_000).all()


def test_item_cooccurrence_hand(ray_session):
    from fluent_server_ray.stages.features import item_cooccurrence

    # u1: {a,b}; u2: {a,b,c}; u3: {a}; duplicates must not inflate
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "a", "b", "c", "a"],
                               pa.string()),
    }))
    got = item_cooccurrence(ds).to_pandas()
    # pairs: (a,b) c=2 na=3 nb=2; (a,c) c=1 na=3 nb=1; (b,c) c=1
    assert got["item_a"].tolist() == ["a", "a", "b"]
    assert got["item_b"].tolist() == ["b", "c", "c"]
    assert got["n_both"].tolist() == [2, 1, 1]
    assert got["n_a"].tolist() == [3, 3, 2]
    assert got["n_b"].tolist() == [2, 1, 1]
    # jaccard: 2/(3+2-2)=2/3 -> 666666; 1/3 -> 333333; 1/2 -> 500000
    assert got["jaccard_millionths"].tolist() == [666666, 333333, 500000]
    assert got["cosine"].tolist() == [
        2 / np.sqrt(3.0 * 2), 1 / np.sqrt(3.0 * 1), 1 / np.sqrt(2.0 * 1)]


def test_item_cooccurrence_no_pairs(ray_session):
    from fluent_server_ray.stages.features import item_cooccurrence

    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 2], pa.int64()),
        "event_type": pa.array(["a", "b"], pa.string()),
    }))
    got = item_cooccurrence(ds).to_pandas()
    assert len(got) == 0


def test_seasonal_dow_hand(ray_session):
    from fluent_server_ray.stages.features import seasonal_dow_index

    # 2024-01-01 is a Monday; epoch_day % 7: Thu=0 so Mon=4, Tue=5
    # group a: Mon 1.00, Mon 3.00 (same day sums to 400c),
    #          Tue(2024-01-02) 2.00 -> daily: Mon 400, Tue 200
    # overall mean/day = 600/2 = 300
    # Mon index = 400/300 = 1333333; Tue = 200/300 = 666666
    ts = pa.array([np.datetime64("2024-01-01", "us"),
                   np.datetime64("2024-01-01", "us"),
                   np.datetime64("2024-01-02", "us")], pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 3, pa.string()), "ts": ts,
        "value": pa.array([1.0, 3.0, 2.0], pa.float64())}))
    got = seasonal_dow_index(ds).to_pandas()
    assert got["dow7"].tolist() == [4, 5]
    assert got["n_days"].tolist() == [1, 1]
    assert got["cents_sum"].tolist() == [400, 200]
    assert got["index_millionths"].tolist() == [1333333, 666666]


def test_seasonal_dow_zero_total_null(ray_session):
    from fluent_server_ray.stages.features import seasonal_dow_index

    ts = pa.array([np.datetime64("2024-01-01", "us")], pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["z"], pa.string()), "ts": ts,
        "value": pa.array([0.0], pa.float64())}))
    got = seasonal_dow_index(ds).to_pandas()
    assert got["index_millionths"].isna().all()


def test_twap_hand_cross_day(ray_session):
    from fluent_server_ray.stages.features import twap_by_group

    # group a: (day1 00:00, 1.00), (day1 12:00, 3.00), (day2 00:00, 2.00)
    # integral: 100c*12h + 300c*12h -> span 24h
    # twap = (100*12 + 300*12)/24 = 200 cents -> 200000 millicents
    ts = pa.array([np.datetime64("2024-01-01T00:00:00", "us"),
                   np.datetime64("2024-01-01T12:00:00", "us"),
                   np.datetime64("2024-01-02T00:00:00", "us")],
                  pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 3, pa.string()), "ts": ts,
        "value": pa.array([1.0, 3.0, 2.0], pa.float64())}))
    got = twap_by_group(ds).to_pandas()
    assert got.values.tolist() == [
        ["a", 3, 2, 86400_000000, 200000]]


def test_twap_tie_order_contract(ray_session):
    from fluent_server_ray.stages.features import twap_by_group

    # two simultaneous events at t0 (cents 100 and 300): the LARGER
    # cents carries the forward gap by the (ts, cents) contract
    ts = pa.array([np.datetime64("2024-01-01T00:00:00", "us")] * 2
                  + [np.datetime64("2024-01-01T01:00:00", "us")],
                  pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 3, pa.string()), "ts": ts,
        "value": pa.array([3.0, 1.0, 5.0], pa.float64())}))
    got = twap_by_group(ds).to_pandas()
    # ordered: (t0,100),(t0,300),(t1,500): num = 100*0 + 300*3600e6
    # span 3600e6 -> twap 300 cents
    assert got["twap_millicents"].tolist() == [300000]


def test_twap_single_event_null(ray_session):
    from fluent_server_ray.stages.features import twap_by_group

    ts = pa.array([np.datetime64("2024-01-01T00:00:00", "us")],
                  pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"], pa.string()), "ts": ts,
        "value": pa.array([1.0], pa.float64())}))
    got = twap_by_group(ds).to_pandas()
    assert got["span_us"].tolist() == [0]
    assert got["twap_millicents"].isna().all()


def test_boolean_search_hand(ray_session):
    from fluent_server_ray.stages.textstats import boolean_search

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b a c",      # has a,b no x -> hit, n=3
            "a a",          # missing b
            "a b x",        # excluded by x
            "b  a",         # double space: empty token dropped -> hit
        ], pa.string()),
    })
    got = boolean_search(rd.from_arrow(t), must=["a", "b"],
                         must_not=["x"]).to_pandas()
    assert got["doc_id"].tolist() == [1, 4]
    assert got["n_hits"].tolist() == [3, 2]


def test_boolean_search_requires_must(ray_session):
    from fluent_server_ray.stages.textstats import boolean_search

    with pytest.raises(ValueError):
        boolean_search(rd.from_items([{"doc_id": 1, "text": "a"}]),
                       must=[])


def test_clustering_coefficients_hand(ray_session):
    from fluent_server_ray.stages.graph import clustering_coefficients

    # triangle a-b-c plus pendant d on a:
    # a: deg 3, tri 1 -> 2*1e6//6 = 333333
    # b,c: deg 2, tri 1 -> 1e6
    # d: deg 1 -> NULL
    t = pa.table({
        "lo": pa.array(["a", "a", "b", "a"], pa.string()),
        "hi": pa.array(["b", "c", "c", "d"], pa.string()),
    })
    got = clustering_coefficients(rd.from_arrow(t)).to_pandas()
    assert got["node"].tolist() == ["a", "b", "c", "d"]
    assert got["degree"].tolist() == [3, 2, 2, 1]
    assert got["n_triangles"].tolist() == [1, 1, 1, 0]
    cm = got["clustering_millionths"]
    assert cm.tolist()[:3] == [333333, 1000000, 1000000]
    assert pd.isna(cm.iloc[3])


def test_clustering_dedups_and_canonicalizes(ray_session):
    from fluent_server_ray.stages.graph import clustering_coefficients

    # duplicate edges in both orders + self-loop must not inflate
    t = pa.table({
        "lo": pa.array(["b", "a", "a", "x"], pa.string()),
        "hi": pa.array(["a", "b", "a", "x"], pa.string()),
    })
    got = clustering_coefficients(rd.from_arrow(t)).to_pandas()
    assert got["node"].tolist() == ["a", "b"]
    assert got["degree"].tolist() == [1, 1]


def test_trimmed_mean_hand(ray_session):
    from fluent_server_ray.stages.features import trimmed_mean

    # group a: cents 0,100,200,300,...,900 (10 rows), trim 10% ->
    # lo=1 hi=9: keep 100..800 -> mean 450c = 450000 millicents
    ds = _events(["a"] * 10, [i * 1.0 for i in range(10)])
    got = trimmed_mean(ds).to_pandas()
    assert got.values.tolist() == [["a", 10, 8, 450000]]


def test_trimmed_mean_tie_split(ray_session):
    from fluent_server_ray.stages.features import trimmed_mean

    # 10 rows all ties at 100c except one 0c and one 900c:
    # [0, 100 x8, 900]; lo=1 hi=9 keeps 100 x8 -> mean 100c
    ds = _events(["a"] * 10, [0.0] + [1.0] * 8 + [9.0])
    got = trimmed_mean(ds).to_pandas()
    assert got.values.tolist() == [["a", 10, 8, 100000]]


def test_trimmed_mean_small_group_no_trim(ray_session):
    from fluent_server_ray.stages.features import trimmed_mean

    # n=3, 10% trim -> lo=0 hi=3: nothing dropped; mean of 1,2,6
    # cents 100,200,600 -> 300c
    ds = _events(["a"] * 3, [1.0, 2.0, 6.0])
    got = trimmed_mean(ds).to_pandas()
    assert got.values.tolist() == [["a", 3, 3, 300000]]


def test_trimmed_mean_50pct_empty_window(ray_session):
    from fluent_server_ray.stages.features import trimmed_mean

    # trim 50% on n=2: lo=1 hi=1 -> zero kept -> NULL
    ds = _events(["a", "a"], [1.0, 2.0])
    got = trimmed_mean(ds, trim_pct=50).to_pandas()
    assert got["n_kept"].tolist() == [0]
    assert got["trimmed_mean_millicents"].isna().all()


def _two_series(days_a, days_b):
    """events: key 'click' with counts per day via repeats, same for
    'purchase' — days_a/b are {day: count} dicts (Jan 2024)."""
    gs, ts = [], []
    for g, dd in (("click", days_a), ("purchase", days_b)):
        for d, cnt in dd.items():
            gs += [g] * cnt
            ts += [np.datetime64(f"2024-01-{d:02d}", "us")] * cnt
    return rd.from_arrow(pa.table({
        "event_type": pa.array(gs, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us"))}))


def test_kendall_perfect_concordance(ray_session):
    from fluent_server_ray.stages.features import kendall_daily_volumes

    ds = _two_series({1: 1, 2: 2, 3: 3}, {1: 2, 2: 4, 3: 6})
    got = kendall_daily_volumes(ds).to_pandas()
    assert got["n_days"].tolist() == [3]
    assert got["nc"].tolist() == [3]
    assert got["nd"].tolist() == [0]
    assert got["tau_b"].tolist() == [1.0]


def test_kendall_with_ties(ray_session):
    from fluent_server_ray.stages.features import kendall_daily_volumes

    # a: 1,1,2 ; b: 1,2,2 over days 1,2,3
    # pairs: (1,2): da=0 tie_a; (1,3): da>0 db>0 conc; (2,3): db=0 tie_b
    ds = _two_series({1: 1, 2: 1, 3: 2}, {1: 1, 2: 2, 3: 2})
    got = kendall_daily_volumes(ds).to_pandas()
    assert [got["nc"][0], got["nd"][0], got["ties_a"][0],
            got["ties_b"][0]] == [1, 0, 1, 1]
    # tau = 1 / sqrt((3-1)*(3-1)) = 0.5
    assert got["tau_b"].tolist() == [0.5]


def test_kendall_constant_series_null(ray_session):
    from fluent_server_ray.stages.features import kendall_daily_volumes

    ds = _two_series({1: 2, 2: 2}, {1: 1, 2: 3})
    got = kendall_daily_volumes(ds).to_pandas()
    assert got["tau_b"].isna().all()


def test_autocomplete_hand(ray_session):
    from fluent_server_ray.stages.textstats import autocomplete_topk

    t = pa.table({"text": pa.array([
        "apple apply apple ant x",   # 'x' too short, dropped
        "apply banana band apple",
    ], pa.string())})
    got = autocomplete_topk(rd.from_arrow(t), k=2).to_pandas()
    # prefix 'an': ant(1). 'ap': apple(3), apply(2). 'ba': banana,
    # band tie at 1 -> 'band' < 'banana'? no: 'banana' < 'band'
    rows = got.values.tolist()
    assert rows == [
        ["an", 1, "ant", 1],
        ["ap", 1, "apple", 3],
        ["ap", 2, "apply", 2],
        ["ba", 1, "banana", 1],
        ["ba", 2, "band", 1],
    ]


def test_concordance_hand(ray_session):
    from fluent_server_ray.stages.textstats import concordance

    t = pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": pa.array([
            "x a b c y",        # match at pos 3 (c? no: term='b')
            "b tail one two",   # match at pos 1: empty left
        ], pa.string()),
    })
    got = concordance(rd.from_arrow(t), "b", width=2).to_pandas()
    assert got["doc_id"].tolist() == [7, 8]
    assert got["pos"].tolist() == [3, 1]
    assert got["left_ctx"].tolist() == ["x a", ""]
    assert got["right_ctx"].tolist() == ["c y", "tail one"]


def test_concordance_multiple_occurrences_and_empties(ray_session):
    from fluent_server_ray.stages.textstats import concordance

    t = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["q  q z"], pa.string()),  # double space
    })
    got = concordance(rd.from_arrow(t), "q", width=1).to_pandas()
    # non-empty positions: q=1, q=2, z=3
    assert got["pos"].tolist() == [1, 2]
    assert got["left_ctx"].tolist() == ["", "q"]
    assert got["right_ctx"].tolist() == ["q", "z"]


def test_order_reconciliation_hand(ray_session):
    from fluent_server_ray.stages.profile import order_reconciliation

    orders = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([10.0, 5.0, 7.0], pa.float64()),
    }))
    # order 1 lines: 5.00 + (5.00 * 0.9 * 1.1 = 4.95) = 9.95 mismatch?
    # keep simple: exact 5+5=10 ok; order 2 gets 6.00 mismatch;
    # order 3 no lines; order 9 orphan lines
    lines = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 9], pa.int64()),
        "l_extendedprice": pa.array([5.0, 5.0, 6.0, 1.0], pa.float64()),
        "l_discount": pa.array([0.0] * 4, pa.float64()),
        "l_tax": pa.array([0.0] * 4, pa.float64()),
    }))
    got = order_reconciliation(orders, lines).to_pandas()
    assert got["o_orderkey"].tolist() == [1, 2, 3, 9]
    assert got["status"].tolist() == ["ok", "mismatch", "no_lines",
                                      "no_order"]
    assert got["lines_cents"].tolist() == [1000, 600, 0, 100]
    assert got["diff_cents"].fillna(-1).tolist() == [0, -100, 700, -1]


def test_order_reconciliation_discount_tax_tree(ray_session):
    from fluent_server_ray.stages.profile import order_reconciliation

    # 100.00 * (1-0.05) * (1+0.08) = 102.60 exactly in the float tree
    orders = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_totalprice": pa.array([102.60], pa.float64()),
    }))
    lines = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([1], pa.int64()),
        "l_extendedprice": pa.array([100.0], pa.float64()),
        "l_discount": pa.array([0.05], pa.float64()),
        "l_tax": pa.array([0.08], pa.float64()),
    }))
    got = order_reconciliation(orders, lines).to_pandas()
    assert got["status"].tolist() == ["ok"]
    assert got["lines_cents"].tolist() == [10260]


def test_assortativity_star_negative(ray_session):
    from fluent_server_ray.stages.graph import degree_assortativity

    # star K1,3: hub degree 3, leaves 1 -> perfectly disassortative
    t = pa.table({"lo": pa.array(["h", "h", "h"], pa.string()),
                  "hi": pa.array(["a", "b", "c"], pa.string())})
    got = degree_assortativity(rd.from_arrow(t)).to_pandas()
    assert got["n"].tolist() == [6]
    assert got["corr"].tolist() == [-1.0]


def test_assortativity_mixed_parity(ray_session):
    from fluent_server_ray.stages.graph import degree_assortativity

    # path a-b-c-d: stub degree pairs (1,2),(2,1),(2,2),(2,2),(2,1),(1,2)
    t = pa.table({"lo": pa.array(["a", "b", "c"], pa.string()),
                  "hi": pa.array(["b", "c", "d"], pa.string())})
    got = degree_assortativity(rd.from_arrow(t)).to_pandas()
    x = np.array([1, 2, 2, 2, 2, 1], dtype=float)
    y = np.array([2, 1, 2, 2, 1, 2], dtype=float)
    ref = np.corrcoef(x, y)[0, 1]
    assert got["corr"].tolist() == [pytest.approx(ref, abs=1e-12)]


def test_daily_interp_hand(ray_session):
    from fluent_server_ray.stages.features import daily_interpolate

    # days 1 and 4 observed (100c, 400c): days 2,3 lerp to 200, 300
    ts = pa.array([np.datetime64("2024-01-01", "us"),
                   np.datetime64("2024-01-04", "us")], pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a", "a"], pa.string()), "ts": ts,
        "value": pa.array([1.0, 4.0], pa.float64())}))
    got = daily_interpolate(ds).to_pandas()
    assert got["cents"].tolist() == [100, 200, 300, 400]
    assert got["is_interpolated"].tolist() == [False, True, True, False]


def test_daily_interp_floor_and_observed_sum(ray_session):
    from fluent_server_ray.stages.features import daily_interpolate

    # observed day sums: day1 has TWO events (1.0 + 0.5 -> 150c);
    # day3 = 200c; gap day2 = (150*1 + 200*1)//2 = 175
    ts = pa.array([np.datetime64("2024-01-01", "us"),
                   np.datetime64("2024-01-01T05:00", "us"),
                   np.datetime64("2024-01-03", "us")], pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 3, pa.string()), "ts": ts,
        "value": pa.array([1.0, 0.5, 2.0], pa.float64())}))
    got = daily_interpolate(ds).to_pandas()
    assert got["cents"].tolist() == [150, 175, 200]


def test_id_gap_audit_hand(ray_session):
    from fluent_server_ray.stages.profile import id_gap_audit

    # ids: 1,2,3, 7, 9 (dup 9) -> gaps [4,6] and [8,8]
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 7, 9, 9], pa.int64())}))
    got = id_gap_audit(ds).to_pandas()
    assert got.values.tolist() == [[4, 6, 3], [8, 8, 1]]


def test_id_gap_audit_cross_bucket_stitch(ray_session):
    from fluent_server_ray.stages.profile import id_gap_audit

    # bucket_width=4: buckets {0,1}, (empty bucket), {9}: the gap
    # [2,8] spans an empty bucket and must stitch into one interval
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([0, 1, 9], pa.int64())}))
    got = id_gap_audit(ds, bucket_width=4).to_pandas()
    assert got.values.tolist() == [[2, 8, 7]]


def test_id_gap_audit_dense_no_gaps(ray_session):
    from fluent_server_ray.stages.profile import id_gap_audit

    ds = rd.from_arrow(pa.table({
        "event_id": pa.array(list(range(10)), pa.int64())}))
    got = id_gap_audit(ds, bucket_width=4).to_pandas()
    assert len(got) == 0


def _daily_series(vals):
    ts = pa.array([np.datetime64(f"2024-01-{d+1:02d}", "us")
                   for d in range(len(vals))], pa.timestamp("us"))
    return rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * len(vals), pa.string()),
        "ts": ts, "value": pa.array(vals, pa.float64())}))


def test_runs_test_hand(ray_session):
    from fluent_server_ray.stages.features import runs_test_daily

    # daily cents 100,200,150,250,240,260 -> deltas +,-,+,-,+
    # n_pos=3 n_neg=2, runs: + - + - + = 5
    got = runs_test_daily(
        _daily_series([1.0, 2.0, 1.5, 2.5, 2.4, 2.6])).to_pandas()
    assert [got["n_pos"][0], got["n_neg"][0], got["n_runs"][0]] == [3, 2, 5]
    import math
    n1, n2, n, r = 3, 2, 5, 5
    mu = 2.0 * n1 * n2 / n + 1.0
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) / (float(n) * n * (n - 1))
    assert got["z"][0] == (float(r) - mu) / math.sqrt(var)


def test_runs_test_zero_deltas_dropped(ray_session):
    from fluent_server_ray.stages.features import runs_test_daily

    # flat then one up move: deltas 0,0,+ -> n_pos=1 n_neg=0 -> z NULL
    got = runs_test_daily(
        _daily_series([1.0, 1.0, 1.0, 2.0])).to_pandas()
    assert [got["n_pos"][0], got["n_neg"][0], got["n_runs"][0]] == [1, 0, 1]
    assert got["z"].isna().all()


def test_runs_test_monotone_streak(ray_session):
    from fluent_server_ray.stages.features import runs_test_daily

    # strictly increasing: one run of +; var term 2*n1*n2=0 -> NULL
    got = runs_test_daily(
        _daily_series([1.0, 2.0, 3.0, 4.0])).to_pandas()
    assert [got["n_pos"][0], got["n_neg"][0], got["n_runs"][0]] == [3, 0, 1]
    assert got["z"].isna().all()


def test_simpson_diversity_hand(ray_session):
    from fluent_server_ray.stages.textstats import (
        simpson_diversity_by_source)

    t = pa.table({
        "source": pa.array(["s1", "s1", "s2"], pa.string()),
        "text": pa.array(["a a b", "a", "x y"], pa.string()),
    })
    got = simpson_diversity_by_source(rd.from_arrow(t)).to_pandas()
    # s1: words a:3 b:1, N=4 -> S = 3*2 + 0 = 6; λ = 6/(4*3) = 0.5
    # s2: x:1 y:1, N=2 -> S=0 -> 0
    assert got["source"].tolist() == ["s1", "s2"]
    assert got["n_tokens"].tolist() == [4, 2]
    assert got["sum_nn1"].tolist() == [6, 0]
    assert got["simpson_millionths"].tolist() == [500000, 0]


def test_simpson_single_token_null(ray_session):
    from fluent_server_ray.stages.textstats import (
        simpson_diversity_by_source)

    t = pa.table({"source": pa.array(["s"], pa.string()),
                  "text": pa.array(["only"], pa.string())})
    got = simpson_diversity_by_source(rd.from_arrow(t)).to_pandas()
    assert got["simpson_millionths"].isna().all()


def test_churn_labels_hand(ray_session):
    from fluent_server_ray.stages.features import churn_labels

    # weeks (epoch_day//7): 2024-01-01 = day 19723 -> week 2817
    # (days 19719..19725); 2024-01-08 -> 2818; 2024-01-15 -> 2819
    # u1 active w0 and w1 -> (w0, active_next=True), (w1: last week
    # observed overall is w2 via u2, so w1 emits active_next=False)
    # u2 active w2 only -> dropped (w2 == wmax)
    ts = pa.array([np.datetime64("2024-01-01", "us"),
                   np.datetime64("2024-01-01T05:00", "us"),
                   np.datetime64("2024-01-08", "us"),
                   np.datetime64("2024-01-15", "us")], pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()), "ts": ts,
        "value": pa.array([1.0, 2.0, 3.0, None], pa.float64())}))
    got = churn_labels(ds).to_pandas()
    w0 = 19723 // 7
    assert got["user_id"].tolist() == [1, 1]
    assert got["week"].tolist() == [w0, w0 + 1]
    assert got["n_events"].tolist() == [2, 1]
    assert got["cents_sum"].tolist() == [300, 300]
    assert got["active_next"].tolist() == [True, False]


def test_weighted_quantiles_hand(ray_session):
    from fluent_server_ray.stages.features import weighted_quantiles

    # values (cents) 100 w=1, 200 w=2, 300 w=1: W=4
    # p25 target ceil(4/4)=1 -> 100; p50 ceil(2)=2 -> 200;
    # p75 ceil(3)=3 -> 200 (cum at 200 is 3)
    t = pa.table({
        "g": pa.array(["a"] * 3, pa.string()),
        "v": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "w": pa.array([1.0, 2.0, 1.0], pa.float64()),
    })
    got = weighted_quantiles(rd.from_arrow(t), "g", "v", "w").to_pandas()
    assert got.values.tolist() == [["a", 4, 100, 200, 200]]


def test_weighted_quantiles_unit_weights_match_lower_median(ray_session):
    from fluent_server_ray.stages.features import weighted_quantiles

    t = pa.table({
        "g": pa.array(["a"] * 4, pa.string()),
        "v": pa.array([4.0, 1.0, 3.0, 2.0], pa.float64()),
        "w": pa.array([1.0] * 4, pa.float64()),
    })
    got = weighted_quantiles(rd.from_arrow(t), "g", "v", "w").to_pandas()
    # lower median of 100,200,300,400 -> 200
    assert got["p50_cents"].tolist() == [200]


def test_weighted_quantiles_zero_weight_dropped(ray_session):
    from fluent_server_ray.stages.features import weighted_quantiles

    t = pa.table({
        "g": pa.array(["a", "a"], pa.string()),
        "v": pa.array([9.0, 1.0], pa.float64()),
        "w": pa.array([0.0, 2.0], pa.float64()),
    })
    got = weighted_quantiles(rd.from_arrow(t), "g", "v", "w").to_pandas()
    assert got.values.tolist() == [["a", 2, 100, 100, 100]]


def test_fano_hand(ray_session):
    from fluent_server_ray.stages.features import fano_dispersion

    # daily counts: day1=1, day2=3 -> n=2 s=4 q=10
    # num = 2*10 - 16 = 4; den = 1*4 -> fano = 1.0 -> 1000000
    ts = pa.array([np.datetime64("2024-01-01", "us"),
                   np.datetime64("2024-01-02", "us"),
                   np.datetime64("2024-01-02T01:00", "us"),
                   np.datetime64("2024-01-02T02:00", "us")],
                  pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 4, pa.string()), "ts": ts}))
    got = fano_dispersion(ds).to_pandas()
    assert got.values.tolist() == [["a", 2, 4, 1000000]]


def test_fano_single_day_null(ray_session):
    from fluent_server_ray.stages.features import fano_dispersion

    ts = pa.array([np.datetime64("2024-01-01", "us")] * 3,
                  pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 3, pa.string()), "ts": ts}))
    got = fano_dispersion(ds).to_pandas()
    assert got["fano_millionths"].isna().all()


def test_spearman_perfect_monotone(ray_session):
    from fluent_server_ray.stages.features import spearman_daily_volumes

    ds = _two_series({1: 1, 2: 2, 3: 4}, {1: 10, 2: 20, 3: 21})
    got = spearman_daily_volumes(ds).to_pandas()
    assert got["n_days"].tolist() == [3]
    # the declared tree: 24 / (sqrt(24)*sqrt(24)), not literal 1.0
    import math
    assert got["rho"].tolist() == [24.0 / (math.sqrt(24.0)
                                           * math.sqrt(24.0))]
    assert got["rho"][0] == pytest.approx(1.0, abs=1e-12)


def test_spearman_ties_match_scipy_style(ray_session):
    from fluent_server_ray.stages.features import spearman_daily_volumes

    # a: 1,2,2,3 ; b: 4,3,3,1 over 4 days (ties in both)
    ds = _two_series({1: 1, 2: 2, 3: 2, 4: 3},
                     {1: 4, 2: 3, 3: 3, 4: 1})
    got = spearman_daily_volumes(ds).to_pandas()
    a = pd.Series([1, 2, 2, 3]).rank().to_numpy()
    b = pd.Series([4, 3, 3, 1]).rank().to_numpy()
    ref = np.corrcoef(a, b)[0, 1]
    assert got["rho"].tolist() == [pytest.approx(ref, abs=1e-12)]


def test_spearman_constant_null(ray_session):
    from fluent_server_ray.stages.features import spearman_daily_volumes

    ds = _two_series({1: 2, 2: 2}, {1: 1, 2: 3})
    got = spearman_daily_volumes(ds).to_pandas()
    assert got["rho"].isna().all()


def test_gate_funnel_hand(ray_session):
    from fluent_server_ray.pipelines.curation import curation_gate_funnel

    long_alpha = " ".join(["alpha"] * 25)          # passes both gates
    long_numeric = " ".join(["123456"] * 25)       # fails alpha ratio
    short = "too short"                            # fails token gate
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([long_alpha, long_alpha, long_numeric, short],
                         pa.string()),
    })
    got = curation_gate_funnel(rd.from_arrow(t)).to_pandas()
    # input 4; tokens>=20: docs 1,2,3 -> 3; alpha: 1,2 -> 2;
    # dedup: 1 distinct text; sample: keeper doc_id=1, md5('1')[:2]?
    import hashlib
    kept = 1 if hashlib.md5(b"1").hexdigest()[:2] < "80" else 0
    assert got["stage"].tolist() == [
        "input", "min_tokens", "alpha_ratio", "exact_dedup", "sample"]
    assert got["n_docs"].tolist() == [4, 3, 2, 1, kept]


def test_l_diversity_hand(ray_session):
    from fluent_server_ray.stages.hygiene import l_diversity

    # class (a): users 1,1,2 -> n=3 l=2; class (b): users 3,3 -> l=1
    # NULL sensitive excluded
    t = pa.table({
        "q": pa.array(["a", "a", "a", "b", "b", "b"], pa.string()),
        "s": pa.array([1, 1, 2, 3, 3, None], pa.int64()),
    })
    got = l_diversity(rd.from_arrow(t), ["q"], "s",
                      l_min=2).to_pandas()
    assert got["q"].tolist() == ["a", "b"]
    assert got["n"].tolist() == [3, 2]
    assert got["l_distinct"].tolist() == [2, 1]
    assert got["at_risk"].tolist() == [False, True]


def test_new_vs_returning_hand(ray_session):
    from fluent_server_ray.stages.features import new_vs_returning

    # u1 active day1+day2 (dup event day1); u2 active day2 only
    ds = _ev_ts([1, 1, 1, 2], [1, 1, 2, 2])
    got = new_vs_returning(ds).to_pandas()
    d1 = 19723  # 2024-01-01
    assert got["day"].tolist() == [d1, d1 + 1]
    assert got["n_active"].tolist() == [1, 2]
    assert got["n_new"].tolist() == [1, 1]
    assert got["n_returning"].tolist() == [0, 1]


def test_role_transition_latency_hand(ray_session):
    from fluent_server_ray.stages.assembly import role_transition_latency

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array(["c1"] * 3 + ["c2"] * 2, pa.string()),
        "turn_idx": pa.array([0, 1, 2, 0, 1], pa.int64()),
        "role": pa.array(["user", "assistant", "user",
                          "user", "assistant"], pa.string()),
        "ts": pa.array([t0, t0 + np.timedelta64(2, "s"),
                        t0 + np.timedelta64(5, "s"),
                        t0, t0 + np.timedelta64(4, "s")],
                       pa.timestamp("us")),
    }))
    got = role_transition_latency(ds).to_pandas()
    # user->assistant: gaps 2s, 4s -> n=2 max=4e6 mean=3e6
    # assistant->user: gap 3s -> n=1
    assert got["prev_role"].tolist() == ["assistant", "user"]
    assert got["role"].tolist() == ["user", "assistant"]
    assert got["n"].tolist() == [1, 2]
    assert got["max_us"].tolist() == [3_000_000, 4_000_000]
    assert got["mean_us"].tolist() == [3_000_000, 3_000_000]


def test_ship_latency_hand(ray_session):
    from fluent_server_ray.stages.features import ship_latency_quantiles

    d0 = np.datetime64("2024-01-01", "us")
    orders = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([d0, d0], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT"],
                                    pa.string()),
    }))
    # latencies: 1,1,2,10 -> n=4: p50 target 2 -> 1; p90 target 4
    # -> 10; p99 target 4 -> 10; max 10
    lines = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_shipdate": pa.array([d0 + np.timedelta64(d, "D")
                                for d in [1, 1, 2, 10]],
                               pa.timestamp("us")),
    }))
    got = ship_latency_quantiles(orders, lines).to_pandas()
    assert got.values.tolist() == [["1-URGENT", 4, 1, 10, 10, 10]]


def test_ewma_daily_hand(ray_session):
    from fluent_server_ray.stages.features import ewma_daily

    # days 0,2 observed (100c, 300c), window=2 (weights 4,2,1)
    # day0: m=0 den=4 (2^3-2^2) num=100*4 -> 100000
    # day1: m=1 den=6 num=100*2 -> 33333 (200000//6)
    # day2: m=2 den=7 num=300*4+0*2+100*1=1300 -> 1300000//7=185714
    ts = pa.array([np.datetime64("2024-01-01", "us"),
                   np.datetime64("2024-01-03", "us")], pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a", "a"], pa.string()), "ts": ts,
        "value": pa.array([1.0, 3.0], pa.float64())}))
    got = ewma_daily(ds, window=2).to_pandas()
    assert got["ewma_millicents"].tolist() == [
        100000, 200000 // 6, 1300000 // 7]


def test_null_ts_contract_daily_ops(ray_session):
    """NULL-ts rows are excluded by contract in every daily op (the
    self-review found they previously corrupted or crashed)."""
    from fluent_server_ray.stages.features import (daily_interpolate,
                                                   ewma_daily,
                                                   runs_test_daily,
                                                   seasonal_dow_index,
                                                   theilsen_trend)

    ts = pa.array([np.datetime64("2024-01-01", "us"),
                   np.datetime64("2024-01-02", "us"), None],
                  pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a", "a", "a"], pa.string()), "ts": ts,
        "value": pa.array([1.0, 2.0, 3.0], pa.float64())}))
    assert theilsen_trend(ds).to_pandas()["n_days"].tolist() == [2]
    assert len(seasonal_dow_index(ds).to_pandas()) == 2
    assert daily_interpolate(ds).to_pandas()["cents"].tolist() == [
        100, 200]
    assert len(ewma_daily(ds).to_pandas()) == 2
    assert runs_test_daily(ds).to_pandas()["n_pos"].tolist() == [1]


def test_null_group_contract_theilsen(ray_session):
    from fluent_server_ray.stages.features import theilsen_trend

    ts = pa.array([np.datetime64("2024-01-01", "us")] * 2,
                  pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a", None], pa.string()), "ts": ts,
        "value": pa.array([1.0, 2.0], pa.float64())}))
    got = theilsen_trend(ds).to_pandas()
    assert got["event_type"].tolist() == ["a"]


def test_km_survival_empty_corpus(ray_session):
    from fluent_server_ray.stages.features import km_survival

    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us"))}))
    got = km_survival(ds).to_pandas()
    assert len(got) == 0
    assert list(got.columns) == ["t_days", "n_at_risk", "d_events",
                                 "c_censored", "survival_millionths"]


def test_clustering_empty_edges(ray_session):
    from fluent_server_ray.stages.graph import clustering_coefficients

    t = pa.table({"lo": pa.array([], pa.string()),
                  "hi": pa.array([], pa.string())})
    got = clustering_coefficients(rd.from_arrow(t)).to_pandas()
    assert len(got) == 0


def test_session_entry_exit_hand(ray_session):
    from fluent_server_ray.stages.windows import session_entry_exit

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    # u1: [view, click] (one session, 10min apart), then after 2h
    #     a bounce [purchase]
    # u2: single [view] bounce
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([t0, t0 + np.timedelta64(10, "m"),
                        t0 + 3 * h, t0], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "event_type": pa.array(["view", "click", "purchase", "view"],
                               pa.string()),
    }))
    got = session_entry_exit(ds).to_pandas()
    assert got.values.tolist() == [
        ["purchase", "purchase", 1, 1],
        ["view", "click", 1, 0],
        ["view", "view", 1, 1],
    ]


def test_outlier_days_mad_hand(ray_session):
    from fluent_server_ray.stages.features import outlier_days_mad

    # daily volumes: 2,3,3,3,20 -> med 3, dev 1,0,0,0,17 -> mad 0?
    # sorted dev: 0,0,0,1,17 -> lower median 0 -> mad 0, no flags.
    # use 2,3,4,5,50: med 4, dev 2,1,0,1,46, sorted 0,1,1,2,46
    # -> mad 1; flag dev > 3: day5 (46)
    counts = [2, 3, 4, 5, 50]
    gs, ts = [], []
    for d, c in enumerate(counts):
        gs += ["a"] * c
        ts += [np.datetime64(f"2024-01-{d+1:02d}", "us")
               + np.timedelta64(i, "m") for i in range(c)]
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(gs, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us"))}))
    got = outlier_days_mad(ds).to_pandas()
    assert got.values.tolist() == [["a", 19727, 50, 4, 1]]


def test_outlier_days_mad_zero_mad_no_flags(ray_session):
    from fluent_server_ray.stages.features import outlier_days_mad

    counts = [3, 3, 3, 30]
    gs, ts = [], []
    for d, c in enumerate(counts):
        gs += ["a"] * c
        ts += [np.datetime64(f"2024-01-{d+1:02d}", "us")
               + np.timedelta64(i, "m") for i in range(c)]
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(gs, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us"))}))
    got = outlier_days_mad(ds).to_pandas()
    assert len(got) == 0


def test_cross_source_dup_histogram_hand(ray_session):
    from fluent_server_ray.stages.dedup import cross_source_dup_histogram

    t = pa.table({
        "text": pa.array(["x", "x", "x", "y", "y", "z", "x"],
                         pa.string()),
        "source": pa.array(["s1", "s2", "s3", "s1", "s1", "s2", "s1"],
                           pa.string()),
    })
    # x in {s1,s2,s3} (k=3), y only s1, z only s2
    got = cross_source_dup_histogram(rd.from_arrow(t)).to_pandas()
    assert got.values.tolist() == [[3, 1]]


def test_cross_source_dup_histogram_none(ray_session):
    from fluent_server_ray.stages.dedup import cross_source_dup_histogram

    t = pa.table({"text": pa.array(["a", "b"], pa.string()),
                  "source": pa.array(["s1", "s2"], pa.string())})
    got = cross_source_dup_histogram(rd.from_arrow(t)).to_pandas()
    assert len(got) == 0


def test_cross_source_prefix_key_mode(ray_session):
    from fluent_server_ray.stages.dedup import cross_source_dup_histogram

    # different texts, same 2-token prefix across 2 sources
    t = pa.table({
        "text": pa.array(["a  b c", "a b d", "x y"], pa.string()),
        "source": pa.array(["s1", "s2", "s1"], pa.string()),
    })
    got = cross_source_dup_histogram(rd.from_arrow(t),
                                     key_tokens=2).to_pandas()
    assert got.values.tolist() == [[2, 1]]
