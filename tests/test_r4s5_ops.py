"""Hand-computed pins for the round-4 fifth-session operators:
prompt/completion mining, FIM transform, vocab coverage, stratified
split, triangle counting, band join, CUSUM drift."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _tr(rows):
    return rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
    }))


def test_prompt_completion_pairs(ray_session):
    from fluent_server_ray.stages.assembly import prompt_completion_pairs

    ds = _tr([
        ("c1", 0, "user", "q1"),
        ("c1", 1, "assistant", "a1"),
        ("c1", 2, "user", "q2"),
        ("c1", 3, "user", "q3"),          # user→user: no pair at 2
        ("c1", 4, "assistant", "a3"),     # pair (3, q3, a3)
        ("c2", 0, "assistant", "hello"),  # assistant-first: no pair
        ("c2", 1, "user", "tail"),        # conv ends on user: no pair
    ])
    got = prompt_completion_pairs(ds).to_pandas()
    assert got.values.tolist() == [
        ["c1", 0, "q1", "a1"],
        ["c1", 3, "q3", "a3"],
    ]
    # conv boundary: c2's trailing user never pairs with c1/later rows
    assert (got["conv_id"] != "c2").all()


def test_fim_transform_pins(ray_session):
    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.assembly import fim_transform

    texts = ["hello world", "", None, "abc"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = fim_transform(ds).to_pandas().set_index("doc_id")
    # reassembly property: stripping the sentinels recovers the text
    for i, txt in [(1, "hello world"), (4, "abc")]:
        lo, hi = int(got.loc[i, "cut_lo"]), int(got.loc[i, "cut_hi"])
        c1 = md5_u64(f"{i}#1") % (len(txt) + 1)
        c2 = md5_u64(f"{i}#2") % (len(txt) + 1)
        assert (lo, hi) == (min(c1, c2), max(c1, c2))
        assert got.loc[i, "fim_text"] == (
            "<PRE>" + txt[:lo] + "<SUF>" + txt[hi:] + "<MID>"
            + txt[lo:hi])
    assert got.loc[2, "fim_text"] == "<PRE><SUF><MID>"  # empty text
    assert got.loc[3, "fim_text"] is None               # NULL text
    assert pd.isna(got.loc[3, "cut_lo"])


def test_vocab_coverage_hand(ray_session):
    from fluent_server_ray.stages.textstats import vocab_coverage

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        # counts: a=4, b=3, c=1, d=1 -> top-2 vocab {a, b}
        "text": pa.array(["a a b", "a b c", "a b  d", ""], pa.string()),
    }))
    got = (vocab_coverage(ds, k=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["n_tokens"].tolist() == [3, 3, 3, 0]
    assert got["n_in_vocab"].tolist() == [3, 2, 2, 0]
    assert got["coverage_ppm"].tolist()[:3] == [1000000, 666666, 666666]
    assert pd.isna(got["coverage_ppm"].iloc[3])


def test_stratified_split_exact_quotas(ray_session):
    from fluent_server_ray.stages.sampling import stratified_split

    n = 40
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "source": pa.array(["s0" if i < 30 else "s1" for i in range(n)],
                           pa.string()),
    }))
    got = stratified_split(ds, val_ppm=200_000,
                           test_ppm=100_000).to_pandas()
    by = got.groupby(["source", "split"]).size()
    # exact quotas: 30 -> 6 val / 3 test / 21 train; 10 -> 2/1/7
    assert by[("s0", "val")] == 6 and by[("s0", "test")] == 3
    assert by[("s0", "train")] == 21
    assert by[("s1", "val")] == 2 and by[("s1", "test")] == 1
    assert by[("s1", "train")] == 7
    # determinism: rerun is byte-identical
    again = stratified_split(ds, val_ppm=200_000,
                             test_ppm=100_000).to_pandas()
    assert got.equals(again)
    with pytest.raises(ValueError):
        stratified_split(ds, val_ppm=900_000, test_ppm=200_000)


def test_triangle_count_hand_graphs(ray_session):
    from fluent_server_ray.stages.graph import triangle_count

    def tri(pairs):
        t = pa.table({
            "lo": pa.array([p[0] for p in pairs], pa.string()),
            "hi": pa.array([p[1] for p in pairs], pa.string()),
        })
        return triangle_count(t).to_pandas().iloc[0].to_dict()

    # K4: 4 triangles; duplicate + reversed + self-loop edges collapse
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
          ("b", "d"), ("c", "d"), ("b", "a"), ("c", "c"), ("a", "b")]
    got = tri(k4)
    assert got == {"n_nodes": 4, "n_edges": 6, "n_triangles": 4}
    # path graph: none
    assert tri([("a", "b"), ("b", "c"), ("c", "d")])["n_triangles"] == 0
    # hub + one closing edge: exactly 1 (the hub's other wedges stay
    # open — the curse-of-the-last-reducer shape)
    hub = [("h", f"x{i}") for i in range(20)] + [("x0", "x1")]
    got = tri(hub)
    assert got["n_triangles"] == 1 and got["n_edges"] == 21
    # empty edge set
    assert tri([])["n_triangles"] == 0


def test_band_join_pairs_hand(ray_session):
    from fluent_server_ray.stages.joins import band_join_pairs

    vals = {1: 0, 2: 5, 3: 10, 4: 22, 5: -3, 6: -14}
    ds = rd.from_arrow(pa.table({
        "id": pa.array(list(vals), pa.int64()),
        "v": pa.array(list(vals.values()), pa.int64()),
    }))
    got = band_join_pairs(ds, "id", "v", eps=10).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    # |0-5|,|0-10|(= eps),|5-10|,|0--3|,|5--3|,|10--3|? 13>10 no,
    # |-3--14|=11>10 no, |22-*| all >10
    assert pairs == {(1, 2), (1, 3), (2, 3), (1, 5), (2, 5)}
    # values ride along, a-side id strictly smaller
    assert (got["id_a"] < got["id_b"]).all()
    row = got[(got["id_a"] == 1) & (got["id_b"] == 5)].iloc[0]
    assert (row["v_a"], row["v_b"]) == (0, -3)
    with pytest.raises(ValueError):
        band_join_pairs(ds, "id", "v", eps=0)


def test_cusum_flags_hand(ray_session):
    from fluent_server_ray.stages.features import cusum_flags

    # type A: days 0,1,2 with counts 3,1,4; k=2 -> S = 1, 0, 2
    # type B: days 0,2 with counts 5,1 -> S = 3, 2
    rows = ([("A", 0)] * 3 + [("A", 1)] * 1 + [("A", 2)] * 4
            + [("B", 0)] * 5 + [("B", 2)] * 1)
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array(
            [np.datetime64(86400 * r[1], "s") for r in rows]
        ).cast(pa.timestamp("us")),
    }))
    got = cusum_flags(ds, k=2, h=2).to_pandas()
    assert got["cusum"].tolist() == [1, 0, 2, 3, 2]
    assert got["flag"].tolist() == [False, False, False, True, False]


def test_ntile_exact_sql_semantics(ray_session):
    from fluent_server_ray.stages.features import ntile

    # group A: 10 rows, q=4 -> tile sizes 3,3,2,2; B: 2 rows -> 1,2
    ds = rd.from_arrow(pa.table({
        "g": pa.array(["A"] * 10 + ["B"] * 2, pa.string()),
        "v": pa.array([5.0, 1.0, 3.0, 2.0, 4.0, 9.0, 7.0, 6.0, 8.0,
                       None, 1.0, 0.0], pa.float64()),
        "id": pa.array(list(range(12)), pa.int64()),
    }))
    got = ntile(ds, "g", "v", "id", q=4).to_pandas()
    a = got[got["g"] == "A"].sort_values("v", na_position="last")
    assert a["tile"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    # NULL value sorts LAST (SQL default) -> last tile
    assert int(got[(got["g"] == "A") & got["v"].isna()]["tile"]) == 4
    b = got[got["g"] == "B"].sort_values("v")
    assert b["tile"].tolist() == [1, 2]
    with pytest.raises(ValueError):
        ntile(ds, "g", "v", "id", q=0)


def _ev(rows):
    """(user, sec, type, id) rows -> events-shaped dataset."""
    return rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[1], "s") for r in rows]).cast(
            pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "event_id": pa.array([r[3] for r in rows], pa.int64()),
    }))


def test_event_motifs_hand(ray_session):
    from fluent_server_ray.stages.windows import event_motifs

    ds = _ev([
        (1, 0, "a", 1), (1, 1, "b", 2), (1, 2, "c", 3), (1, 3, "a", 4),
        (2, 0, "a", 5), (2, 1, "b", 6), (2, 2, "c", 7),
        (3, 5, "x", 8), (3, 6, "y", 9),          # too short: no trigram
    ])
    got = event_motifs(ds).to_pandas()
    assert got.values.tolist() == [["a>b>c", 2], ["b>c>a", 1]]


def test_event_markov_hand(ray_session):
    from fluent_server_ray.stages.windows import event_markov_probs

    # user 1: a->b, b->a, a->b ; user 2: a->b   => n(a,b)=3, n(b,a)=1
    ds = _ev([(1, 0, "a", 1), (1, 1, "b", 2), (1, 2, "a", 3),
              (1, 3, "b", 4), (2, 0, "a", 5), (2, 1, "b", 6)])
    got = event_markov_probs(ds, alpha=1).to_pandas()
    m = {(r.src, r.dst): (r.n, r.p_millionths)
         for r in got.itertuples()}
    # states {a,b}, V=2; row a total 3: p(a->a)=(0+1)e6//(3+2),
    # p(a->b)=(3+1)e6//5; row b total 1: p(b->a)=(1+1)e6//3, p(b->b)=1e6//3
    assert m[("a", "a")] == (0, 200_000)
    assert m[("a", "b")] == (3, 800_000)
    assert m[("b", "a")] == (1, 666_666)
    assert m[("b", "b")] == (0, 333_333)


def test_k_anonymity_hand(ray_session):
    from fluent_server_ray.stages.hygiene import k_anonymity

    ds = rd.from_arrow(pa.table({
        "zip": pa.array(["11", "11", "11", "22", "22", None],
                        pa.string()),
        "age": pa.array([30, 30, 30, 40, 41, 30], pa.int64()),
    }))
    got = k_anonymity(ds, ["zip", "age"], k=2).to_pandas()
    rows = {(r.zip, r.age): (r.n, r.at_risk) for r in got.itertuples()}
    assert rows[("11", 30)] == (3, False)
    assert rows[("22", 40)] == (1, True)
    assert rows[("22", 41)] == (1, True)
    # NULL quasi-id value is its own (at-risk) class
    null_row = got[got["zip"].isna()]
    assert len(null_row) == 1 and bool(null_row["at_risk"].iloc[0])
    with pytest.raises(ValueError):
        k_anonymity(ds, ["zip"], k=0)


def test_bfs_distances_hand(ray_session):
    from fluent_server_ray.stages.graph import bfs_distances

    # directed: s->a->b->c->d (chain), s->x, c->s (cycle back)
    edges = pa.table({
        "src": pa.array(["s", "a", "b", "c", "s", "c"], pa.string()),
        "dst": pa.array(["a", "b", "c", "d", "x", "s"], pa.string()),
    })
    got = bfs_distances(edges, "s", max_depth=3).to_pandas()
    dist = dict(zip(got["node"], got["dist"]))
    # depth cap 3: d (depth 4) absent; cycle back to s keeps dist 0
    assert dist == {"s": 0, "a": 1, "b": 2, "c": 3, "x": 1}
    # deeper cap reaches d; nothing else changes
    got4 = bfs_distances(edges, "s", max_depth=4).to_pandas()
    assert dict(zip(got4["node"], got4["dist"]))["d"] == 4
    # isolated source: just itself at distance 0
    lone = bfs_distances(edges, "zzz", max_depth=2).to_pandas()
    assert dict(zip(lone["node"], lone["dist"])) == {"zzz": 0}


def test_mutual_information_hand(ray_session):
    import math

    from fluent_server_ray.stages.features import mutual_information

    def mk(counts):
        rows_a, rows_b = [], []
        for (a, b), n in counts.items():
            rows_a += [a] * n
            rows_b += [b] * n
        return rd.from_arrow(pa.table({
            "lang": pa.array(rows_a, pa.string()),
            "source": pa.array(rows_b, pa.string()),
        }))

    # perfectly independent 2x2 (proportional cells): MI exactly 0
    # because n_ab*N == na*nb in every cell -> floored logs cancel
    indep = mk({("en", "web"): 4, ("en", "book"): 2,
                ("fr", "web"): 8, ("fr", "book"): 4})
    got = mutual_information(indep).to_pandas().iloc[0]
    assert got["mi_numerator"] == 0 and got["mi_nats"] == 0.0

    # perfectly dependent (diagonal): MI = ln(2) with equal halves
    dep = mk({("en", "web"): 5, ("fr", "book"): 5})
    got = mutual_information(dep).to_pandas().iloc[0]
    L = lambda x: math.floor(math.log(x) * 1_000_000)
    expect = 5 * (L(5 * 10) - L(5 * 5)) * 2
    assert got["mi_numerator"] == expect
    assert abs(got["mi_nats"] - math.log(2)) < 1e-5


def test_triangle_count_driver_vs_distributed_parity(ray_session):
    """The dense driver continuation and the distributed
    degree-oriented plan count identically (forced via
    max_dense_nodes=0)."""
    import numpy as np

    rng = np.random.default_rng(7)
    n = 30
    pairs = sorted({tuple(sorted((f"n{a}", f"n{b}")))
                    for a, b in rng.integers(0, n, size=(120, 2))
                    if a != b})
    from fluent_server_ray.stages.graph import triangle_count

    t = pa.table({"lo": pa.array([p[0] for p in pairs], pa.string()),
                  "hi": pa.array([p[1] for p in pairs], pa.string())})
    fast = triangle_count(t).to_pandas().iloc[0].to_dict()
    dist = triangle_count(t, max_dense_nodes=0).to_pandas() \
        .iloc[0].to_dict()
    assert fast == dist
    assert fast["n_edges"] == len(pairs)
