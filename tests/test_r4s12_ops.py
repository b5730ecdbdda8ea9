"""Hand-computed pins for the TPC-H Q5/Q10/Q14 adaptations: local
supplier volume, returned-item customers, promo revenue share."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_SMALL = "/root/testdata/sf0.001"


def _ts(s):
    return pd.Timestamp(s)


def _duck(sf_dir, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


# ------------------------------------------------- Q5 local supplier

def _write_q5(tmp_path):
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["N0", "N1", "N2"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([100, 101, 102], pa.int64()),
        "s_nationkey": pa.array([0, 1, 2], pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11, 12], pa.int64()),
        "c_nationkey": pa.array([0, 1, 2], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([10, 11, 12, 10], pa.int64()),
        "o_orderdate": pa.array(
            [_ts("1996-02-01"), _ts("1996-03-01"), _ts("1996-04-01"),
             _ts("1995-01-01")],  # order 4 outside the window
            pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # order 1 (cust nation 0): supplier 100 (nation 0) matches,
        # supplier 101 (nation 1) does not; order 2 (nation 1):
        # supplier 101 matches; order 3 is in EUROPE (filtered);
        # order 4 outside the date window.
        "l_orderkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
        "l_suppkey": pa.array([100, 101, 101, 102, 100], pa.int64()),
        "l_extendedprice": pa.array([10.0, 99.0, 20.0, 5.0, 7.0]),
        "l_discount": pa.array([0.0, 0.0, 0.5, 0.0, 0.0]),
        "l_shipdate": pa.array([_ts("1996-02-10")] * 5,
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))


def test_local_supplier_volume_hand(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import local_supplier_volume

    _write_q5(tmp_path)
    got = local_supplier_volume(str(tmp_path)).to_pandas()
    # N0: 10.00 → 1000 cents; N1: 20·0.5 = 10.00 → 1000 cents.
    want = pd.DataFrame({"n_name": ["N0", "N1"],
                         "revenue_cents": [1000, 1000]})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_local_supplier_volume_matches_duckdb(ray_session):
    from fluent_server_ray.pipelines.relational import (
        local_supplier_volume, local_supplier_volume_sql)

    got = local_supplier_volume(SF_SMALL).to_pandas()
    con = _duck(SF_SMALL, ["region", "nation", "supplier", "customer",
                           "orders", "lineitem"])
    want = con.execute(local_supplier_volume_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_local_supplier_volume_empty_region(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import local_supplier_volume

    _write_q5(tmp_path)
    got = local_supplier_volume(str(tmp_path), region="NOWHERE")
    assert got.num_rows == 0
    assert got.schema.names == ["n_name", "revenue_cents"]


# --------------------------------------------- Q10 returned items

def test_returned_item_customers_hand(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import returned_item_customers

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 11], pa.int64()),
        "o_orderdate": pa.array([_ts("1996-07-15"), _ts("1996-08-15")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([10.0, 20.0, 30.0]),
        "l_discount": pa.array([0.0, 0.5, 0.0]),
        "l_returnflag": pa.array(["R", "R", "N"], pa.string()),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11], pa.int64()),
        "c_name": pa.array(["Alice", "Bob"], pa.string()),
        "c_acctbal": pa.array([1.25, 9.0]),
        "c_nationkey": pa.array([0, 0], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": pa.array(["N0"], pa.string()),
    }), str(tmp_path / "nation.parquet"))
    got = returned_item_customers(str(tmp_path)).to_pandas()
    # cust 10: 1000 + 1000 = 2000 cents of returned revenue; order 2's
    # only line is flag N → cust 11 contributes nothing.
    want = pd.DataFrame({
        "c_custkey": [10], "c_name": ["Alice"], "rev_cents": [2000],
        "c_acctbal_cents": [125], "n_name": ["N0"]})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_returned_item_customers_matches_duckdb(ray_session):
    from fluent_server_ray.pipelines.relational import (
        returned_item_customers, returned_item_customers_sql)

    got = returned_item_customers(SF_SMALL).to_pandas()
    con = _duck(SF_SMALL, ["customer", "orders", "lineitem", "nation"])
    want = con.execute(returned_item_customers_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ----------------------------------------------- Q14 promo revenue

def test_promo_revenue_share_hand(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import promo_revenue_share

    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["PROMO", "STANDARD"], pa.string()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 1], pa.int64()),
        "l_extendedprice": pa.array([10.0, 30.0, 40.0]),
        "l_discount": pa.array([0.0, 0.0, 0.75]),
        "l_shipdate": pa.array(
            [_ts("1996-03-05"), _ts("1996-03-06"), _ts("1996-05-01")],
            pa.timestamp("us")),  # third line outside the month
    }), str(tmp_path / "lineitem.parquet"))
    got = promo_revenue_share(str(tmp_path)).to_pandas()
    assert got["promo_cents"].iloc[0] == 1000
    assert got["total_cents"].iloc[0] == 4000
    assert got["promo_share_pct"].iloc[0] == 100.0 * 1000.0 / 4000.0


def test_promo_revenue_share_empty_window(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import promo_revenue_share

    pq.write_table(pa.table({
        "p_partkey": pa.array([1], pa.int64()),
        "p_type": pa.array(["PROMO"], pa.string()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1], pa.int64()),
        "l_extendedprice": pa.array([10.0]),
        "l_discount": pa.array([0.0]),
        "l_shipdate": pa.array([_ts("1990-01-01")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    got = promo_revenue_share(str(tmp_path)).to_pandas()
    assert got["promo_cents"].iloc[0] == 0
    assert got["total_cents"].iloc[0] == 0
    assert pd.isna(got["promo_share_pct"].iloc[0])


def test_promo_revenue_share_matches_duckdb(ray_session):
    from fluent_server_ray.pipelines.relational import (
        promo_revenue_share, promo_revenue_share_sql)

    got = promo_revenue_share(SF_SMALL).to_pandas()
    con = _duck(SF_SMALL, ["lineitem", "part"])
    want = con.execute(promo_revenue_share_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# -------------------------------------------- Naive Bayes classifier

def test_naive_bayes_hand(ray_session):
    import math

    import ray.data as rd
    from fluent_server_ray.stages.textstats import naive_bayes_classify

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 5, 0], pa.int64()),
        "text": pa.array(["x x y", "x", "y y", "x y z", "zz qq"],
                         pa.string()),
        "lang": pa.array(["A", "A", "B", None, None], pa.string()),
    }))
    got = naive_bayes_classify(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    # model: vocab {x,y} V=2; A: x=3,y=1,n=4; B: y=2,n=2; priors 2/3,1/3
    lp = {("x", "A"): (3 + 1) / (4 + 2), ("y", "A"): (1 + 1) / (4 + 2),
          ("x", "B"): (0 + 1) / (2 + 2), ("y", "B"): (2 + 1) / (2 + 2)}
    m = {k: math.floor(math.log(v) * 1_000_000) for k, v in lp.items()}
    pa_ = math.floor(math.log(2 / 3) * 1_000_000)
    pb_ = math.floor(math.log(1 / 3) * 1_000_000)
    # doc 5 "x y z": z is OOV and ignored
    sa = pa_ + m[("x", "A")] + m[("y", "A")]
    sb = pb_ + m[("x", "B")] + m[("y", "B")]
    assert sa > sb
    # doc 0 "zz qq": all OOV → prior-only argmax = A
    want = pd.DataFrame({
        "doc_id": [0, 5], "pred_lang": ["A", "A"],
        "score_millionths": [pa_, sa]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_naive_bayes_tie_breaks_by_class_name(ray_session):
    import ray.data as rd
    from fluent_server_ray.stages.textstats import naive_bayes_classify

    # perfectly symmetric classes → every holdout score ties → the
    # lexicographically smallest class must win on both sides
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 0], pa.int64()),
        "text": pa.array(["x", "x", "x"], pa.string()),
        "lang": pa.array(["B", "A", None], pa.string()),
    }))
    got = naive_bayes_classify(ds).to_pandas()
    assert got["pred_lang"].tolist() == ["A"]


def test_naive_bayes_matches_duckdb(ray_session):
    import duckdb

    from fluent_server_ray.stages.textstats import (
        naive_bayes_classify, naive_bayes_classify_sql)
    from fluent_server_ray.sources.pq import read_parquet_clean

    got = naive_bayes_classify(
        read_parquet_clean(f"{SF_SMALL}/documents.parquet")
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = _duck(SF_SMALL, ["documents"])
    want = con.execute(naive_bayes_classify_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ----------------------------------- Jarque-Bera / Brown-Forsythe

def test_jarque_bera_hand(ray_session):
    import math

    import ray.data as rd
    from fluent_server_ray.stages.features import jarque_bera_by_group

    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 4 + ["b"] * 3, pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 7.0, 7.0, 7.0]),
    }))
    got = jarque_bera_by_group(ds).to_pandas()
    # group a: cents [100..400], shift k=250, d=[-150,-50,50,150]
    # s1=0 s2=50000 s3=0 s4=1025000000
    nd = 4.0
    m2 = 50000.0 / nd
    m4 = 1025000000.0 / nd
    kurt = m4 / (m2 * m2)
    jb = nd / 6.0 * (0.0 + (kurt - 3.0) * (kurt - 3.0) / 4.0)
    a = got[got["group"] == "a"].iloc[0]
    assert a["skew"] == 0.0
    assert a["kurt"] == kurt
    assert a["jb_stat"] == jb
    # group b: constant → degenerate → NULLs
    b = got[got["group"] == "b"].iloc[0]
    assert pd.isna(b["skew"]) and pd.isna(b["kurt"]) \
        and pd.isna(b["jb_stat"])
    assert int(b["n"]) == 3


def test_jarque_bera_matches_duckdb(ray_session):
    from fluent_server_ray.sources.pq import read_parquet_clean
    from fluent_server_ray.stages.features import (
        jarque_bera_by_group, jarque_bera_by_group_sql)

    got = jarque_bera_by_group(
        read_parquet_clean(f"{SF_SMALL}/events.parquet",
                           columns=["event_type", "value"])).to_pandas()
    con = _duck(SF_SMALL, ["events"])
    want = con.execute(jarque_bera_by_group_sql()).df()
    # bit-exact float contract — no tolerance
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def test_brown_forsythe_hand(ray_session):
    import ray.data as rd
    from fluent_server_ray.stages.features import brown_forsythe_by_group

    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 4 + ["b"] * 3, pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 10.0, 10.0, 30.0]),
    }))
    got = brown_forsythe_by_group(ds).to_pandas()
    # lower medians: a → rank (4+1)//2=2 → 200 cents; b → rank 2 → 1000
    assert got["med_cents"].tolist() == [200, 1000]
    # deviations: a [100,0,100,200]; b [0,0,2000]
    ns, ss = [4, 3], [400, 2000]
    q = (100**2 + 0 + 100**2 + 200**2) + (0 + 0 + 2000**2)
    between = [(1_000_000 * s * s) // n for s, n in zip(ss, ns)]
    s_tot, n_tot, k = sum(ss), sum(ns), 2
    ssb = sum(between) - (1_000_000 * s_tot * s_tot) // n_tot
    ssw = 1_000_000 * q - sum(between)
    f_e6 = (ssb * (n_tot - k) * 1_000_000) // (ssw * (k - 1))
    assert got["f_millionths"].tolist() == [f_e6, f_e6]
    assert got["ssb_millionths"].iloc[0] == ssb
    assert got["ssw_millionths"].iloc[0] == ssw


def test_brown_forsythe_matches_duckdb(ray_session):
    from fluent_server_ray.sources.pq import read_parquet_clean
    from fluent_server_ray.stages.features import (
        brown_forsythe_by_group, brown_forsythe_by_group_sql)

    got = brown_forsythe_by_group(
        read_parquet_clean(f"{SF_SMALL}/events.parquet",
                           columns=["event_type", "value"])).to_pandas()
    con = _duck(SF_SMALL, ["events"])
    want = con.execute(brown_forsythe_by_group_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


# ------------------------------------ Gini stump / inclusion audit

def test_gini_best_splits_hand(ray_session):
    import ray.data as rd
    from fluent_server_ray.stages.features import gini_best_splits

    # values 1,2,3,4; positives at 3 and 4 → perfect split at t=200
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["x", "x", "purchase", "purchase", None],
                               pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, None]),
    }))
    got = gini_best_splits(ds).to_pandas()
    best = got.iloc[0]
    assert best["threshold_cents"] == 200
    assert best["weighted_gini_e6"] == 0
    assert best["n_left"] == 2 and best["pos_left"] == 0
    assert best["n_right"] == 2 and best["pos_right"] == 2
    # 3 candidate thresholds (100,200,300); 400 has empty right side
    assert len(got) == 3


def test_gini_best_splits_matches_duckdb(ray_session):
    from fluent_server_ray.sources.pq import read_parquet_clean
    from fluent_server_ray.stages.features import (
        gini_best_splits, gini_best_splits_sql)

    got = gini_best_splits(
        read_parquet_clean(f"{SF_SMALL}/events.parquet",
                           columns=["event_type", "value"])).to_pandas()
    con = _duck(SF_SMALL, ["events"])
    want = con.execute(gini_best_splits_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_inclusion_audit_hand(ray_session):
    import ray.data as rd
    from fluent_server_ray.stages.profile import inclusion_audit

    child = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 3, None], pa.int64())}))
    parent = pa.table({"p": pa.array([1, 2, 9], pa.int64())})
    got = inclusion_audit([("e1", child, "k", parent, "p")]).to_pandas()
    # distinct child = {1,2,3}; contained = {1,2} → 2/3
    assert got["n_distinct"].tolist() == [3]
    assert got["n_contained"].tolist() == [2]
    assert got["containment_e6"].tolist() == [(1_000_000 * 2) // 3]


def test_inclusion_audit_matches_duckdb(ray_session):
    import __ray_entry__ as entry
    from fluent_server_ray.stages.profile import inclusion_audit_sql

    got = entry.queries()["inclusion_audit"](SF_SMALL).to_pandas()
    con = _duck(SF_SMALL, ["events", "lineitem", "part", "orders",
                           "customer", "nation"])
    want = con.execute(inclusion_audit_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------- perceptual hash / soundex pairs

def test_phash_batch_hand(ray_session):
    from fluent_server_ray.stages.multimodal import phash_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["abc", "", None], pa.string()),
    })
    got = phash_batch(t)
    # empty/NULL payloads emit no signature
    assert got["doc_id"].to_pylist() == [1]
    # "abc": L=3, spans of chars 0,1,2 = (0·63//3, 1·63//3, 2·63//3)
    # = (0, 21, 42); pixels = ord mod 256 at those spans, 0 elsewhere
    p = [0] * 63
    p[0], p[21], p[42] = ord("a"), ord("b"), ord("c")
    s = sum(p)
    code = sum(1 << k for k in range(63) if 63 * p[k] >= s)
    assert got["phash"].to_pylist() == [code]


def test_phash_dupes_identical_texts_pair_at_zero(ray_session):
    import ray.data as rd
    from fluent_server_ray.stages.multimodal import phash_dupes

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["hello world", "hello world",
                          "zzzz completely different qqqq"], pa.string()),
    }))
    got = phash_dupes(ds).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    pair = got[(got["doc_a"] == 1) & (got["doc_b"] == 2)]
    assert len(pair) == 1 and pair["hamming"].iloc[0] == 0


def test_phash_dupes_matches_duckdb(ray_session):
    from fluent_server_ray.stages.multimodal import (
        phash_dupes, phash_dupes_sql)
    from fluent_server_ray.sources.pq import read_parquet_clean

    got = phash_dupes(
        read_parquet_clean(f"{SF_SMALL}/documents.parquet")
    ).to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    con = _duck(SF_SMALL, ["documents"])
    want = con.execute(phash_dupes_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_soundex_classics():
    from fluent_server_ray.stages.textstats import soundex

    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"   # h/w never separate codes
    assert soundex("Tymczak") == "T522"
    assert soundex("Pfister") == "P236"    # first-letter code merge
    assert soundex("Honeyman") == "H555"
    assert soundex("a") == "A000"          # pad


def test_soundex_sql_matches_python(ray_session):
    import duckdb

    from fluent_server_ray.stages.textstats import _soundex_sql, soundex

    words = ["Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister",
             "Honeyman", "a", "hw", "widget", "rod", "red", "bolt",
             "steel", "shiny", "aeiou", "bbbbb"]
    con = duckdb.connect()
    got = con.execute(
        "SELECT " + _soundex_sql("w") + " FROM (SELECT unnest(?) AS w)",
        [words]).fetchall()
    assert [r[0] for r in got] == [soundex(w) for w in words]


def test_phonetic_word_pairs_hand(ray_session):
    import ray.data as rd
    from fluent_server_ray.stages.textstats import phonetic_word_pairs

    ds = rd.from_arrow(pa.table({
        "text": pa.array(["robert rupert", "robert x9 bolt"], pa.string()),
    }))
    got = phonetic_word_pairs(ds).to_pandas()
    # x9 excluded (non-alpha); only robert/rupert share R163
    assert got["word_a"].tolist() == ["robert"]
    assert got["word_b"].tolist() == ["rupert"]
    assert got["n_a"].tolist() == [2]  # df of robert carried out


def test_phonetic_word_pairs_bucket_cap(ray_session):
    import pytest
    import ray.data as rd
    from fluent_server_ray.stages.textstats import phonetic_word_pairs

    ds = rd.from_arrow(pa.table({
        "text": pa.array(["rat rate rati rato ratu"], pa.string())}))
    with pytest.raises(ValueError, match="max_bucket"):
        phonetic_word_pairs(ds, max_bucket=3)


# -------------------------------------------------- Q6 / Q7 / Q8

def test_forecast_revenue_delta_hand(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import forecast_revenue_delta

    pq.write_table(pa.table({
        "l_extendedprice": pa.array([100.0, 100.0, 100.0, 100.0]),
        "l_discount": pa.array([0.05, 0.01, 0.05, 0.05]),
        "l_quantity": pa.array([10.0, 10.0, 30.0, 10.0]),
        "l_shipdate": pa.array(
            [_ts("1996-06-01"), _ts("1996-06-01"), _ts("1996-06-01"),
             _ts("1999-01-01")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    got = forecast_revenue_delta(str(tmp_path)).to_pandas()
    # only row 1 passes (band + qty + year): 100·0.05 = 5.00 → 500
    assert got["revenue_cents"].iloc[0] == 500
    assert got["n_lines"].iloc[0] == 1


def test_q6_q7_q8_match_duckdb(ray_session):
    from fluent_server_ray.pipelines.relational import (
        forecast_revenue_delta, forecast_revenue_delta_sql,
        nation_market_share, nation_market_share_sql,
        nation_volume_shipping, nation_volume_shipping_sql)

    con = _duck(SF_SMALL, ["lineitem", "orders", "customer", "supplier",
                           "nation", "region", "part"])
    for fn, sql in [(forecast_revenue_delta, forecast_revenue_delta_sql),
                    (nation_volume_shipping, nation_volume_shipping_sql),
                    (nation_market_share, nation_market_share_sql)]:
        got = fn(SF_SMALL).to_pandas()
        want = con.execute(sql()).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)


def test_nation_volume_shipping_unknown_nation(ray_session):
    from fluent_server_ray.pipelines.relational import nation_volume_shipping

    got = nation_volume_shipping(SF_SMALL, nation_a="NO_SUCH")
    assert got.num_rows == 0
    assert got.schema.names == ["supp_nation", "cust_nation", "l_year",
                                "revenue_cents"]


# ------------------------------------------------ MMR re-ranking

def test_mmr_prefers_diversity_over_redundancy(ray_session):
    import ray.data as rd
    from fluent_server_ray.stages.similarity import mmr_topk

    # id 1 and 2 are near-dups highly relevant to the query; id 3 is
    # slightly less relevant but diverse — MMR at λ=0.7 must pick
    # (1, 3), where pure relevance top-2 would pick (1, 2)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(
            [[1.0, 0.0, 0.0], [0.96, 0.3, 0.0], [0.95, 0.31, 0.0],
             [0.95, -0.3, 0.0]],
            pa.list_(pa.float32())),
    }))
    got = mmr_topk(ds, query_id=0, k=2, pool=3).to_pandas()
    assert got["vec_id"].tolist() == [1, 3]
    assert got["rank"].tolist() == [1, 2]


def test_mmr_matches_duckdb(ray_session):
    from fluent_server_ray.sources.pq import read_parquet_clean
    from fluent_server_ray.stages.similarity import mmr_topk, mmr_topk_sql

    got = mmr_topk(
        read_parquet_clean(f"{SF_SMALL}/embeddings.parquet")).to_pandas()
    con = _duck(SF_SMALL, ["embeddings"])
    want = con.execute(mmr_topk_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mmr_missing_query_returns_typed_empty(ray_session):
    from fluent_server_ray.sources.pq import read_parquet_clean
    from fluent_server_ray.stages.similarity import mmr_topk

    got = mmr_topk(read_parquet_clean(f"{SF_SMALL}/embeddings.parquet"),
                   query_id=10**9)
    assert got.num_rows == 0
    assert got.schema.names == ["rank", "vec_id"]


# --------------------------- next-word / self-join F2 / drawdown

def test_next_word_topk_hand(ray_session):
    import ray.data as rd
    from fluent_server_ray.stages.textstats import next_word_topk

    ds = rd.from_arrow(pa.table({
        "text": pa.array(["a b", "a b", "a c", "b z", "x y"], pa.string()),
    }))
    got = next_word_topk(ds, top_m=2, k=2).to_pandas()
    # prefix totals (non-final positions): a=3, b=1, x=1 → top-2 by
    # (total DESC, w1 ASC) = a, b
    a = got[got["w1"] == "a"]
    assert a["w2"].tolist() == ["b", "c"]  # counts 2, 1
    assert a["n"].tolist() == [2, 1]
    assert got[got["w1"] == "b"]["w2"].tolist() == ["z"]
    assert "x" not in set(got["w1"])


def test_next_word_topk_matches_duckdb(ray_session):
    import __ray_entry__ as entry
    from fluent_server_ray.stages.textstats import next_word_topk_sql

    got = entry.queries()["doc_next_words"](SF_SMALL).to_pandas()
    con = _duck(SF_SMALL, ["documents"])
    want = con.execute(next_word_topk_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_selfjoin_size_hand(ray_session):
    import ray.data as rd
    from fluent_server_ray.stages.features import selfjoin_size

    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3, None], pa.int64())}))
    got = selfjoin_size(ds).to_pandas()
    assert got["n_rows"].iloc[0] == 6          # NULL excluded
    assert got["n_keys"].iloc[0] == 3
    assert got["f2"].iloc[0] == 9 + 4 + 1
    assert got["avg_matches_per_row"].iloc[0] == 14.0 / 6.0


def test_max_drawdown_hand(ray_session):
    import ray.data as rd
    from fluent_server_ray.stages.features import max_drawdown_by_group

    # daily cents: +500, -300, +100 → cum 500,200,300; peak 500,500,500
    # → drawdown 0,300,200 → max 300 on day 1
    base = pd.Timestamp("2024-01-01")
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 3, pa.string()),
        "value": pa.array([5.0, -3.0, 1.0]),
        "ts": pa.array([base, base + pd.Timedelta(days=1),
                        base + pd.Timedelta(days=2)], pa.timestamp("us")),
    }))
    got = max_drawdown_by_group(ds).to_pandas()
    assert got["max_drawdown_cents"].iloc[0] == 300
    assert got["trough_day"].iloc[0] == int(
        (base + pd.Timedelta(days=1)).timestamp() // 86400)
    assert got["n_days"].iloc[0] == 3


def test_f2_and_drawdown_match_duckdb(ray_session):
    from fluent_server_ray.sources.pq import read_parquet_clean
    from fluent_server_ray.stages.features import (
        max_drawdown_by_group, max_drawdown_by_group_sql, selfjoin_size,
        selfjoin_size_sql)

    con = _duck(SF_SMALL, ["events"])
    got = selfjoin_size(
        read_parquet_clean(f"{SF_SMALL}/events.parquet",
                           columns=["user_id"])).to_pandas()
    want = con.execute(selfjoin_size_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
    got = max_drawdown_by_group(
        read_parquet_clean(f"{SF_SMALL}/events.parquet",
                           columns=["event_type", "value", "ts"])
    ).to_pandas()
    want = con.execute(max_drawdown_by_group_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------- record_transformer

def test_record_transform_hand(ray_session):
    import ray.data as rd
    from fluent_server_ray.stages.fields import record_transform

    ds = rd.from_arrow(pa.table({
        "tag": pa.array(["a.b.c", "solo", None], pa.string()),
        "text": pa.array(["hello", None, "x"], pa.string()),
        "role": pa.array(["user", "agent", "user"], pa.string()),
        "tool": pa.array(["search", None, "calc"], pa.string()),
        "ts": pa.array([pd.Timestamp("2024-01-01 13:45"),
                        pd.Timestamp("2024-01-02 00:05"),
                        pd.Timestamp("2024-01-03 23:59")],
                       pa.timestamp("us")),
    }))
    got = record_transform(
        ds,
        add={"msg_len": ("len", "text"), "ts_hour": ("hour", "ts"),
             "tag_head": ("segment", "tag", ".", 0),
             "role_tool": ("concat", ["role", "tool"], ":")},
        rename={"tool": "tool_name"},
        remove=["text"],
    ).to_pandas()
    assert "text" not in got.columns and "tool" not in got.columns
    assert got["tool_name"].tolist() == ["search", None, "calc"]
    assert got["msg_len"].tolist() == [5, None, 1] or \
        [None if pd.isna(x) else int(x)
         for x in got["msg_len"]] == [5, None, 1]
    assert got["ts_hour"].tolist() == [13, 0, 23]
    assert got["tag_head"].tolist() == ["a", "solo", None]
    # concat propagates NULL (SQL || semantics)
    assert got["role_tool"].tolist() == ["user:search", None, "user:calc"]


def test_record_transform_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    got = entry.queries()["transcripts_record_transform"](
        SF_SMALL).to_pandas().sort_values(
            ["conv_id", "turn_idx"]).reset_index(drop=True)
    con = _duck(SF_SMALL, ["events"])
    want = con.execute(entry.oracle_sql()[
        "transcripts_record_transform"]).df().sort_values(
            ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)
