"""Hand-computed pins for the round-4 ninth-session operators:
Kruskal-Wallis H, one-way ANOVA F, LOO target encoding, t-closeness."""

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


# -------------------------------------------------- Kruskal-Wallis

def test_kruskal_hand_no_ties(ray_session):
    from fluent_server_ray.stages.features import kruskal_by_group

    # a: [1, 2], b: [3, 4] — ranks 1..4, R_a = 3, R_b = 7, N = 4
    # H = 12/(4*5) * (9/2 + 49/2) - 3*5 = 0.6*29 - 15 = 2.4
    # doubled: R2_a = 6, R2_b = 14
    # term = 3e6*36//2 + 3e6*196//2 = 54e6 + 294e6 = 348e6
    # h_e6 = 348e6 // 20 - 3e6*5 = 17.4e6 - 15e6 = 2_400_000
    got = kruskal_by_group(
        _events(["a", "a", "b", "b"], [1.0, 2.0, 3.0, 4.0])).to_pandas()
    assert got["group"].tolist() == ["a", "b"]
    assert got["rank_sum2"].tolist() == [6, 14]
    assert got["h_millionths"].tolist() == [2_400_000] * 2
    # no ties: tie correction is identity
    assert got["h_tie_millionths"].tolist() == [2_400_000] * 2
    assert got["tie_sum"].tolist() == [0, 0]


def test_kruskal_scipy_parity(ray_session):
    from fluent_server_ray.stages.features import kruskal_by_group

    rng = np.random.default_rng(7)
    groups = ["a"] * 40 + ["b"] * 30 + ["c"] * 50
    vals = np.concatenate([
        np.round(rng.normal(10, 2, 40), 2),
        np.round(rng.normal(11, 2, 30), 2),
        np.round(rng.normal(10.5, 2, 50), 2)]).tolist()
    got = kruskal_by_group(_events(groups, vals)).to_pandas()
    try:
        from scipy.stats import kruskal
    except ImportError:
        pytest.skip("scipy not available")
    ref = kruskal(vals[:40], vals[40:70], vals[70:]).statistic
    # tie-corrected H should match scipy to the floored millionth
    assert abs(got["h_tie_millionths"].iloc[0] / 1e6 - ref) < 2e-6


def test_kruskal_null_excluded(ray_session):
    from fluent_server_ray.stages.features import kruskal_by_group

    got = kruskal_by_group(_events(
        ["a", "a", "b", "b", None],
        [1.0, 2.0, 3.0, 4.0, 100.0])).to_pandas()
    assert got["n_total"].tolist() == [4, 4]


# -------------------------------------------------- one-way ANOVA

def test_anova_hand(ray_session):
    from fluent_server_ray.stages.features import anova_by_group

    # cents: a = [100, 200], b = [300, 400]
    # S_a=300 n=2, S_b=700 n=2, S=1000 N=4, Q=10000+40000+90000+160000=300000
    # between = 1e6*90000//2 + 1e6*490000//2 = 45e9 + 245e9 = 290e9
    # ssb = 290e9 - 1e6*1e6//4 = 290e9 - 250e9 = 40e9  (SSB = 40000 c²)
    # ssw = 1e6*300000 - 290e9 = 10e9                  (SSW = 10000 c²)
    # F = (40e9 * 2 * 1e6) // (10e9 * 1) = 8e6 -> F = 8.0
    got = anova_by_group(
        _events(["a", "a", "b", "b"], [1.0, 2.0, 3.0, 4.0])).to_pandas()
    assert got["group"].tolist() == ["a", "b"]
    assert got["sum_cents"].tolist() == [300, 700]
    assert got["ssb_millionths"].tolist() == [40_000_000_000] * 2
    assert got["ssw_millionths"].tolist() == [10_000_000_000] * 2
    assert got["f_millionths"].tolist() == [8_000_000] * 2


def test_anova_scipy_parity(ray_session):
    from fluent_server_ray.stages.features import anova_by_group

    rng = np.random.default_rng(11)
    groups = ["a"] * 35 + ["b"] * 45 + ["c"] * 20
    vals = np.concatenate([
        np.round(rng.normal(10, 2, 35), 2),
        np.round(rng.normal(12, 2, 45), 2),
        np.round(rng.normal(11, 2, 20), 2)]).tolist()
    got = anova_by_group(_events(groups, vals)).to_pandas()
    try:
        from scipy.stats import f_oneway
    except ImportError:
        pytest.skip("scipy not available")
    ref = f_oneway(vals[:35], vals[35:80], vals[80:]).statistic
    assert abs(got["f_millionths"].iloc[0] / 1e6 - ref) < 2e-5


def test_anova_zero_within_raises(ray_session):
    from fluent_server_ray.stages.features import anova_by_group

    with pytest.raises(ValueError, match="within"):
        anova_by_group(_events(["a", "a", "b"], [1.0, 1.0, 2.0]))


# -------------------------------------------- LOO target encoding

def test_target_encode_loo_hand(ray_session):
    from fluent_server_ray.stages.features import target_encode_loo

    ds = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderpriority": pa.array(["x", "x", "x", "y"], pa.string()),
        "o_totalprice": pa.array([1.0, 2.0, 3.0, 9.0], pa.float64()),
    }))
    got = (target_encode_loo(ds).to_pandas()
           .sort_values("id").reset_index(drop=True))
    # category x: S=600 cents over 3 rows. id 1 -> (600-100)/2 = 250 c
    assert got["loo_mean_cents_e6"].tolist()[:3] == [
        250_000_000, 200_000_000, 150_000_000]
    # singleton category y: NULL
    assert pd.isna(got["loo_mean_cents_e6"].iloc[3])


def test_target_encode_loo_never_sees_self(ray_session):
    from fluent_server_ray.stages.features import target_encode_loo

    # one huge outlier: its OWN encoding must exclude it
    ds = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderpriority": pa.array(["x", "x", "x"], pa.string()),
        "o_totalprice": pa.array([1.0, 1.0, 1000.0], pa.float64()),
    }))
    got = (target_encode_loo(ds).to_pandas()
           .sort_values("id").reset_index(drop=True))
    # outlier row's encoding = mean of the two 1.0 rows = 100 cents
    assert got["loo_mean_cents_e6"].iloc[2] == 100_000_000
    # the small rows see the outlier: (100 + 100000)/2 = 50050 cents
    assert got["loo_mean_cents_e6"].iloc[0] == 50_050_000_000


# ------------------------------------------------------ t-closeness

def _tc_input(classes, cents):
    return rd.from_arrow(pa.table({
        "cls": pa.array(classes, pa.string()),
        "cents": pa.array(cents, pa.int64()),
    }))


def test_t_closeness_hand(ray_session):
    from fluent_server_ray.stages.hygiene import t_closeness

    # grid (unit=1): values 1, 2. global g = [2, 2], N = 4
    # class a = [1, 1] (c=[2,0], n=2): cum_1 = 2*4 - 2*2 = 4
    #   emd = 1e6*4 // (1 * 2 * 4) = 500000  (a holds only low values)
    # class b = [2, 2]: cum_1 = 0*4 - 2*2 = -4 -> 500000
    got = t_closeness(
        _tc_input(["a", "a", "b", "b"], [1, 1, 2, 2]),
        ["cls"], lambda t: t["cents"], t_max_e6=400_000,
        unit=1).to_pandas()
    assert got["cls"].tolist() == ["a", "b"]
    assert got["emd_millionths"].tolist() == [500_000, 500_000]
    assert got["at_risk"].tolist() == [True, True]


def test_t_closeness_identical_distribution_is_zero(ray_session):
    from fluent_server_ray.stages.hygiene import t_closeness

    got = t_closeness(
        _tc_input(["a", "a", "b", "b"], [1, 2, 1, 2]),
        ["cls"], lambda t: t["cents"], t_max_e6=0,
        unit=1).to_pandas()
    assert got["emd_millionths"].tolist() == [0, 0]
    assert got["at_risk"].tolist() == [False, False]


def test_t_closeness_unit_buckets(ray_session):
    from fluent_server_ray.stages.hygiene import t_closeness

    # unit=100: cents 150 and 199 share bucket 1; 250 -> bucket 2
    got = t_closeness(
        _tc_input(["a", "a", "b"], [150, 199, 250]),
        ["cls"], lambda t: t["cents"], t_max_e6=999_999,
        unit=100).to_pandas()
    # grid = [1, 2], g = [2, 1], N = 3
    # a: c=[2,0] n=2 -> cum_1 = 2*3 - 2*2 = 2 -> 1e6*2 // (1*2*3) = 333333
    assert got.loc[got.cls == "a", "emd_millionths"].iloc[0] == 333_333


# ------------------------------------------- trigram wildcard search

def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_wildcard_search_like_semantics(ray_session):
    from fluent_server_ray.stages.textstats import wildcard_search

    got = wildcard_search(_docs([
        "abc def ghi",          # ordered match
        "def abc ghi",          # 'def' before 'abc' — still has both,
                                # but ghi after: %abc%ghi% matches
        "ghi abc",              # ghi BEFORE abc only -> no match
        "abcghi",               # adjacent literals, '%' matches empty
        "abXghi",               # trigram 'abc' absent -> pruned
        None,                   # NULL text -> excluded
        "abc\nghi",             # % crosses newlines
    ]), pattern="%abc%ghi%").to_pandas()
    assert got["doc_id"].tolist() == [0, 1, 3, 6]


def test_wildcard_search_trigram_false_positive_filtered(ray_session):
    from fluent_server_ray.stages.textstats import wildcard_search

    # doc contains every trigram of both literals but in the wrong
    # ORDER — the prefilter admits it, the regex verify must drop it
    # (count(), not to_pandas(): Ray drops columns on all-empty)
    assert wildcard_search(_docs(["window merge"]),
                           pattern="%merge%window%").count() == 0


def test_wildcard_search_overlapping_literals(ray_session):
    from fluent_server_ray.stages.textstats import wildcard_search

    # LIKE '%aba%bab%' on 'ababab': aba at 0, bab may start at 3 (>= 3)
    got = wildcard_search(_docs(["ababab", "ababX"]),
                          pattern="%aba%bab%").to_pandas()
    assert got["doc_id"].tolist() == [0]


def test_wildcard_search_guards(ray_session):
    from fluent_server_ray.stages.textstats import wildcard_search

    with pytest.raises(ValueError, match="anchored"):
        wildcard_search(_docs(["x"]), pattern="abc%")
    with pytest.raises(ValueError, match="3 chars"):
        wildcard_search(_docs(["x"]), pattern="%ab%")
    with pytest.raises(ValueError, match="'_'"):
        wildcard_search(_docs(["x"]), pattern="%a_c%")


# ------------------------------------- spell candidates (SymSpell)

def test_lev1_kernel():
    from fluent_server_ray.stages.textstats import _lev1

    assert _lev1("abc", "abc") == 0
    assert _lev1("abc", "abd") == 1      # substitution
    assert _lev1("abc", "abcd") == 1     # insertion at end
    assert _lev1("abc", "xabc") == 1     # insertion at front
    assert _lev1("abc", "ac") == 1       # deletion
    assert _lev1("ab", "ba") == 2        # transposition is 2 edits
    assert _lev1("abc", "axy") == 2
    assert _lev1("abc", "abcde") == 2    # length gap > 1


def test_spell_candidates_hand(ray_session):
    from fluent_server_ray.stages.textstats import spell_candidates

    # vocab (len>=4, count>=2): 'merge' x3, 'marge' x2
    # top-2 queries: delete 2nd char -> 'mrge', 'mrge' (dedup) + 'mrge'?
    # merge -> mrge ; marge -> mrge  => ONE query 'mrge'
    # matches: lev('mrge','merge')=1, lev('mrge','marge')=1
    docs = _docs(["merge merge marge", "merge marge zzz"])
    got = spell_candidates(docs, n_queries=2, min_len=4,
                           min_count=2).to_pandas()
    assert got["query"].tolist() == ["mrge", "mrge"]
    assert got["word"].tolist() == ["marge", "merge"]
    assert got["n"].tolist() == [2, 3]
    assert got["dist"].tolist() == [1, 1]


def test_spell_candidates_no_cross_join_false_hits(ray_session):
    from fluent_server_ray.stages.textstats import spell_candidates

    # 'gremlin' shares no deletion key with 'mrge'-like queries; a
    # query word itself appears at dist 0 when it IS a vocab word
    docs = _docs(["wind wind wind gremlin gremlin gremlin"])
    got = spell_candidates(docs, n_queries=1, min_len=4,
                           min_count=2).to_pandas()
    # top word by freq: gremlin (tie count 3 vs wind 3 -> 'gremlin'
    # before 'wind' asc) -> query 'gemlin'; only gremlin within 1
    assert got["word"].tolist() == ["gremlin"]
    assert got["dist"].tolist() == [1]


# ------------------------------------ link prediction (RA index)

def _edges(pairs):
    return rd.from_arrow(pa.table({
        "lo": pa.array([p[0] for p in pairs], pa.string()),
        "hi": pa.array([p[1] for p in pairs], pa.string()),
    }))


def test_link_prediction_hand(ray_session):
    from fluent_server_ray.stages.graph import link_prediction_ra

    # star around c: a-c, b-c, d-c plus edge a-b.
    # deg: a=2 b=2 c=3 d=1. non-edges: (a,d),(b,d),(a?,b edge)...
    # common neighbor of (a,d) = {c} -> ra = 1e6//3 = 333333, common 1
    # (b,d): same. (a,b) IS an edge -> excluded.
    got = link_prediction_ra(
        _edges([("a", "c"), ("b", "c"), ("c", "d"), ("a", "b")]),
        k=10).to_pandas()
    assert got[["lo", "hi"]].values.tolist() == [["a", "d"], ["b", "d"]]
    assert got["ra_millionths"].tolist() == [333_333, 333_333]
    assert got["common"].tolist() == [1, 1]


def test_link_prediction_dense_vs_distributed_parity(ray_session):
    from fluent_server_ray.stages.graph import link_prediction_ra

    rng = np.random.default_rng(5)
    nodes = [f"n{i:02d}" for i in range(30)]
    pairs = set()
    while len(pairs) < 80:
        i, j = rng.integers(0, 30, 2)
        if i != j:
            pairs.add((nodes[min(i, j)], nodes[max(i, j)]))
    dense = link_prediction_ra(_edges(sorted(pairs)), k=25).to_pandas()
    dist = link_prediction_ra(_edges(sorted(pairs)), k=25,
                              max_dense_nodes=0).to_pandas()
    pd.testing.assert_frame_equal(dense, dist)


def test_link_prediction_wedge_guard(ray_session):
    from fluent_server_ray.stages.graph import link_prediction_ra

    with pytest.raises(ValueError, match="wedges"):
        link_prediction_ra(
            _edges([("a", "c"), ("b", "c"), ("c", "d")]),
            k=5, max_dense_nodes=0, max_wedges=1)


# ------------------------------------------------ term burstiness

def test_term_burstiness_hand(ray_session):
    from fluent_server_ray.stages.textstats import term_burstiness

    # 3 docs: 'x x x', 'x y', '' -> D=3
    # x: cf=4 df=2 s2=9+1=10 burst=2e6
    #   var = 1e6*(3*10-16)//9 = 14e6//9 = 1555555
    # y: cf=1 df=1 s2=1 burst=1e6; var = 1e6*(3-1)//9 = 222222
    got = term_burstiness(_docs(["x x x", "x y", ""]), k=5).to_pandas()
    assert got["word"].tolist() == ["x", "y"]
    assert got["cf"].tolist() == [4, 1]
    assert got["df"].tolist() == [2, 1]
    assert got["burst_millionths"].tolist() == [2_000_000, 1_000_000]
    assert got["var_millionths"].tolist() == [1_555_555, 222_222]


def test_term_burstiness_null_text_counts_in_d(ray_session):
    from fluent_server_ray.stages.textstats import term_burstiness

    # NULL text does NOT count toward D (mirrors text IS NOT NULL)
    got = term_burstiness(_docs(["x", None]), k=5).to_pandas()
    # D=1: var = 1e6*(1*1-1)//1 = 0
    assert got["var_millionths"].tolist() == [0]


def test_term_burstiness_topk_cut(ray_session):
    from fluent_server_ray.stages.textstats import term_burstiness

    got = term_burstiness(
        _docs(["a a a b b c"]), k=2).to_pandas()
    assert got["word"].tolist() == ["a", "b"]


# ------------------------------------- Jensen-Shannon divergence

def test_jsd_identical_sources_zero(ray_session):
    from fluent_server_ray.stages.textstats import source_js_divergence

    ds = rd.from_arrow(pa.table({
        "source": pa.array(["s1", "s2"], pa.string()),
        "text": pa.array(["a b c", "a b c"], pa.string()),
    }))
    got = source_js_divergence(ds).to_pandas()
    # identical distributions: every log term is ln(1) -> floor 0 or -1
    # (floor of exactly 0 is 0 here: 2*a*nb == a*nb + b*na)
    assert got["term_a"].tolist() == [0]
    assert got["term_b"].tolist() == [0]
    assert got["jsd_nats"].tolist() == [0.0]


def test_jsd_disjoint_sources_ln2(ray_session):
    from fluent_server_ray.stages.textstats import source_js_divergence

    # disjoint vocabularies: JSD = ln 2 = 0.693147...
    ds = rd.from_arrow(pa.table({
        "source": pa.array(["s1", "s2"], pa.string()),
        "text": pa.array(["a a b", "c d d"], pa.string()),
    }))
    got = source_js_divergence(ds).to_pandas()
    assert abs(got["jsd_nats"].iloc[0] - np.log(2)) < 2e-6


def test_jsd_symmetric_and_sorted(ray_session):
    from fluent_server_ray.stages.textstats import source_js_divergence

    ds = rd.from_arrow(pa.table({
        "source": pa.array(["b", "a", "c"], pa.string()),
        "text": pa.array(["x y", "x z", "y z"], pa.string()),
    }))
    got = source_js_divergence(ds).to_pandas()
    assert got[["source_a", "source_b"]].values.tolist() == [
        ["a", "b"], ["a", "c"], ["b", "c"]]
    # symmetric inputs (each pair shares exactly one word): same jsd
    assert len(set(got["jsd_nats"].round(9))) == 1
