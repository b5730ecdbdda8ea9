"""Hand-computed pins for the TPC-H classic join shapes (Q17/Q18/Q22
adaptations): small-quantity revenue, big-volume customers, dormant
high-balance customers."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_SMALL = "/root/testdata/sf0.001"


def _ts(s):
    return pd.Timestamp(s)


# --------------------------------------------- Q17 small-qty revenue

def _write_q17(tmp_path):
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "l_quantity": pa.array([1.0, 10.0, 10.0, 10.0, 5.0, 5.0]),
        "l_extendedprice": pa.array([7.5, 90.0, 90.0, 90.0, 40.0, 40.0]),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["B1", "B2"], pa.string()),
    }), str(tmp_path / "part.parquet"))


def test_small_qty_revenue_hand(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import small_qty_revenue

    _write_q17(tmp_path)
    # part 1: qty cents [100,1000,1000,1000] sum=3100 c=4;
    # 5·qc·4 < 3100 ⟺ qc < 155 → only the qty-1 row (price 750 cents).
    # part 2: 5·500·2 = 5000 ≥ 1000 → no small rows, brand B2 absent.
    got = small_qty_revenue(str(tmp_path)).to_pandas()
    want = pd.DataFrame({"p_brand": ["B1"], "revenue_cents": [750],
                         "n_small": [1]})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_small_qty_revenue_matches_duckdb(ray_session):
    from fluent_server_ray.pipelines.relational import (
        small_qty_revenue, small_qty_revenue_sql)

    got = small_qty_revenue(SF_SMALL).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF_SMALL}/lineitem.parquet')")
    con.execute(f"CREATE VIEW part AS SELECT * FROM "
                f"read_parquet('{SF_SMALL}/part.parquet')")
    want = con.execute(small_qty_revenue_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------ Q18 big-volume customers

def test_big_volume_customers_hand(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import big_volume_customers

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_quantity": pa.array([200.0, 150.0, 100.0]),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 11], pa.int64()),
        "o_orderdate": pa.array([_ts("1999-03-04"), _ts("1999-05-06")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([100.0, 5.0]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11], pa.int64()),
        "c_name": pa.array(["Alice", "Bob"], pa.string()),
    }), str(tmp_path / "customer.parquet"))

    # order 1: 35000 qty-cents > 30000 cutoff; order 2: 10000 → dropped
    got = big_volume_customers(str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["c_custkey"] == 10 and r["c_name"] == "Alice"
    assert r["o_orderkey"] == 1
    assert r["total_price_cents"] == 10000
    assert r["sum_qty_cents"] == 35000


def test_big_volume_customers_empty_result(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import big_volume_customers

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1], pa.int64()),
        "l_quantity": pa.array([1.0]),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([10], pa.int64()),
        "o_orderdate": pa.array([_ts("1999-03-04")], pa.timestamp("us")),
        "o_totalprice": pa.array([1.0]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10], pa.int64()),
        "c_name": pa.array(["Alice"], pa.string()),
    }), str(tmp_path / "customer.parquet"))
    got = big_volume_customers(str(tmp_path))
    assert got.num_rows == 0
    assert got.schema.names == ["c_custkey", "c_name", "o_orderkey",
                                "o_orderdate", "total_price_cents",
                                "sum_qty_cents"]


# --------------------------------------- Q22 dormant balance screen

def test_dormant_high_balance_hand(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import (
        dormant_high_balance_customers)

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_mktsegment": pa.array(["S1", "S1", "S2", "S2"], pa.string()),
        "c_acctbal": pa.array([100.0, 50.0, -10.0, 100.0]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        # cust 1 ordered AFTER the cutoff (active); cust 4 only before
        "o_custkey": pa.array([1, 4], pa.int64()),
        "o_orderdate": pa.array([_ts("2001-01-01"), _ts("1996-01-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))

    # positive balances: 10000+5000+10000 → sum 25000, n 3;
    # bal·3 > 25000 keeps custs 1 and 4; cust 1 is active → only 4.
    got = dormant_high_balance_customers(str(tmp_path)).to_pandas()
    want = pd.DataFrame({"c_mktsegment": ["S2"], "n_cust": [1],
                         "bal_cents": [10000]})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_dormant_no_positive_balances(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import (
        dormant_high_balance_customers)

    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_mktsegment": pa.array(["S1"], pa.string()),
        "c_acctbal": pa.array([-5.0]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([], pa.int64()),
        "o_orderdate": pa.array([], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    got = dormant_high_balance_customers(str(tmp_path))
    # SQL mirror: bal·0 > NULL is never true → empty, not a crash
    assert got.num_rows == 0


# ------------------------------------------------ Cohen's kappa

def _docs(rows):
    return pa.table({
        "doc_id": pa.array(range(1, len(rows) + 1), pa.int64()),
        "lang": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


def test_langid_kappa_hand(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.textstats import langid_kappa

    # preds: en, de, de, unknown → agree 2 of 4
    # rows: en 2, de 1, fr 1; cols: en 1, de 2, unknown 1
    # pe = 2·1 + 1·2 = 4; po = 2/4; kappa = (4·2−4)/(16−4) = 1/3
    ds = rd.from_arrow(_docs([
        ("en", "the cat"), ("en", "der hund ist"),
        ("de", "der und"), ("fr", "xyz"),
    ]))
    got = langid_kappa(ds).to_pandas()
    assert got["n_items"].tolist() == [4]
    assert got["agree_n"].tolist() == [2]
    assert got["po_millionths"].tolist() == [500_000]
    assert got["pe_millionths"].tolist() == [250_000]
    assert got["kappa_millionths"].tolist() == [333_333]


def test_langid_kappa_negative_and_null(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.textstats import langid_kappa

    # systematic disagreement → kappa −1 (truncating division exact)
    ds = rd.from_arrow(_docs([("en", "der ist"), ("de", "the and")]))
    got = langid_kappa(ds).to_pandas()
    assert got["kappa_millionths"].tolist() == [-1_000_000]

    # single class both sides → N² == pe → NULL kappa, not a crash
    ds1 = rd.from_arrow(_docs([("en", "the"), ("en", "the and")]))
    got1 = langid_kappa(ds1).to_pandas()
    assert got1["po_millionths"].tolist() == [1_000_000]
    assert pd.isna(got1["kappa_millionths"]).all()


def test_langid_kappa_matches_duckdb(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from fluent_server_ray.stages.textstats import (langid_kappa,
                                                    langid_kappa_sql)

    t = _docs([("en", "the cat"), ("en", "der hund ist"),
               ("de", "der und"), ("fr", "le et la"), (None, "xyz")])
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = langid_kappa(rd.from_arrow(t)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(langid_kappa_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# -------------------------------------------- feature hashing

def test_feature_hash_hand(ray_session):
    import ray.data as rd

    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.textstats import feature_hash_vectors

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["x x", ""], pa.string()),
    }))
    got = feature_hash_vectors(ds, dim=64).to_pandas()
    # doc 2 is empty → no rows; doc 1: both tokens identical → one
    # cell with |weight| 2 at the md5 bucket
    assert len(got) == 1
    sign = 1 if md5_u64("s#x") % 2 == 0 else -1
    assert got.iloc[0]["doc_id"] == 1
    assert got.iloc[0]["dim"] == md5_u64("x") % 64
    assert got.iloc[0]["weight"] == 2 * sign


def test_feature_hash_matches_duckdb(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from fluent_server_ray.stages.textstats import (
        feature_hash_vectors, feature_hash_vectors_sql)

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c a", "the quick brown fox", None],
                         pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = feature_hash_vectors(rd.from_arrow(t), dim=8).to_pandas()
    got = got.sort_values(["doc_id", "dim"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(feature_hash_vectors_sql(dim=8)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------- HITS hubs/authorities

def _hits_edges():
    return pa.table({
        "src": pa.array(["A", "A", "D"], pa.string()),
        "dst": pa.array(["B", "C", "B"], pa.string()),
        "w": pa.array([1, 1, 1], pa.int64()),
    })


def test_hits_hand(ray_session):
    from fluent_server_ray.stages.graph import hits

    # round 1: a = {B:1e6, C:5e5}; h = {A:1e6, D:666666}
    # round 2: a_raw B=1666666, C=1e6 → a C = 1e12//1666666 = 600000
    #          h_raw A=1600000, D=1e6 → h D = 1e12//16e5 = 625000
    got = hits(_hits_edges(), n_iters=2).to_pandas()
    rows = {r["node"]: (r["hub_millionths"], r["auth_millionths"])
            for _, r in got.iterrows()}
    assert rows["A"] == (1_000_000, 0)
    assert rows["B"] == (0, 1_000_000)
    assert rows["C"] == (0, 600_000)
    assert rows["D"] == (625_000, 0)


def test_hits_empty(ray_session):
    from fluent_server_ray.stages.graph import hits

    got = hits(pa.table({
        "src": pa.array([], pa.string()),
        "dst": pa.array([], pa.string()),
        "w": pa.array([], pa.int64()),
    }))
    assert got.num_rows == 0


def test_hits_matches_duckdb(ray_session):
    from fluent_server_ray.stages.graph import hits, hits_sql_rounds

    chain = ("WITH trans AS (SELECT * FROM (VALUES "
             "('A','B',3),('A','C',1),('D','B',2),('B','D',5)) "
             "AS t(src, dst, w))")
    # hits_sql_rounds appends to an existing chain: strip the WITH
    sql = hits_sql_rounds("WITH " + chain[5:], n_iters=3)
    got = hits(pa.table({
        "src": pa.array(["A", "A", "D", "B"], pa.string()),
        "dst": pa.array(["B", "C", "B", "D"], pa.string()),
        "w": pa.array([3, 1, 2, 5], pa.int64()),
    }), n_iters=3).to_pandas()
    want = duckdb.connect().execute(sql).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# -------------------------------------------------- key-skew audit

def test_key_skew_hand(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.features import key_skew_audit

    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["x", "x", "x", "x", "y", None, "x"],
                               pa.string()),
        "user_id": pa.array([1, 1, 1, 2, 5, 6, None], pa.int64()),
    }))
    got = key_skew_audit(ds).to_pandas()
    # x: counts {1:3, 2:1} → n 4, keys 2, max 3, top 750000,
    #    hhi = 1e6·(9+1)//16 = 625000; y: single key → 1e6 / 1e6
    want = pd.DataFrame({
        "event_type": ["x", "y"], "n": [4, 1], "n_keys": [2, 1],
        "max_key_n": [3, 1],
        "top_share_millionths": [750_000, 1_000_000],
        "hhi_millionths": [625_000, 1_000_000],
    })
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_key_skew_matches_duckdb(ray_session, tmp_path):
    import ray.data as rd

    from fluent_server_ray.stages.features import (key_skew_audit,
                                                   key_skew_audit_sql)

    t = pa.table({
        "event_type": pa.array(["a", "a", "b", "b", "b", "a"],
                               pa.string()),
        "user_id": pa.array([1, 2, 3, 3, 3, 1], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = key_skew_audit(rd.from_arrow(t)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(key_skew_audit_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# -------------------------------------- cluster-granular splits

def test_split_by_cluster_hand(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.assembly import (split_by_cluster,
                                                   split_of)

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["A", "A", "B", None, None], pa.string()),
    }))
    got = split_by_cluster(ds).to_pandas().sort_values("doc_id")
    # clusters: {1,2} (text A), {3}, {4,5} (NULL → '' fingerprint)
    assert got["rep_id"].tolist() == [1, 1, 3, 4, 4]
    exp = {r: split_of(pa.array([r], pa.int64()))[0].as_py()
           for r in (1, 3, 4)}
    assert got["split"].tolist() == [exp[1], exp[1], exp[3],
                                     exp[4], exp[4]]
    # the leakage-free property: one split per cluster
    assert got.groupby("rep_id")["split"].nunique().max() == 1


def test_split_by_cluster_matches_duckdb(ray_session, tmp_path):
    import ray.data as rd

    from fluent_server_ray.stages.assembly import (split_by_cluster,
                                                   split_by_cluster_sql)

    t = pa.table({
        "doc_id": pa.array(range(1, 31), pa.int64()),
        "text": pa.array([f"doc {i % 7}" for i in range(30)],
                         pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = (split_by_cluster(rd.from_arrow(t)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(split_by_cluster_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------ blocking-quality eval

def test_blocking_eval_hand(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.dedup import blocking_eval

    ds = rd.from_arrow(pa.table({
        "text": pa.array(["aaaa X", "AAAA  x", "aaaa y", "bbbb z",
                          "aaaa X", None], pa.string()),
    }))
    got = blocking_eval(ds, prefix_len=4).to_pandas()
    # blocks (raw 4-char prefix): aaaa×3 → 3 cand pairs
    # truth (normalized): 'aaaa x'×3 → 3 pairs
    # tp: ('aaaa','aaaa x') holds docs 1&5 only → 1 pair
    assert got["cand_pairs"].tolist() == [3]
    assert got["true_pairs"].tolist() == [3]
    assert got["tp_pairs"].tolist() == [1]
    assert got["precision_millionths"].tolist() == [333_333]
    assert got["recall_millionths"].tolist() == [333_333]


def test_blocking_eval_empty_and_nulls(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.dedup import blocking_eval

    ds = rd.from_arrow(pa.table({
        "text": pa.array([None, "only one"], pa.string()),
    }))
    got = blocking_eval(ds, prefix_len=4).to_pandas()
    assert got["cand_pairs"].tolist() == [0]
    assert pd.isna(got["precision_millionths"]).all()
    assert pd.isna(got["recall_millionths"]).all()


def test_blocking_eval_matches_duckdb(ray_session, tmp_path):
    import ray.data as rd

    from fluent_server_ray.stages.dedup import (blocking_eval,
                                                blocking_eval_sql)

    t = pa.table({
        "text": pa.array(
            [f"prefix{i % 3} body {i % 5}" for i in range(40)]
            + ["PREFIX0 body 0", None], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = blocking_eval(rd.from_arrow(t), prefix_len=7).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(blocking_eval_sql(prefix_len=7)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------- sequential patterns

def test_seq_patterns_hand(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.features import sequential_patterns

    ts = pd.to_datetime([1, 2, 3, 4, 5, 11, 12, 13], unit="s")
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 2, 2], pa.int64()),
        "event_type": pa.array(["A", "B", "C", "A", "B",
                                "A", "B", "C"], pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_id": pa.array(range(8), pa.int64()),
    }))
    got = sequential_patterns(ds, gap=2, k=20).to_pandas()
    # user 1 [A,B,C,A,B] yields 8 distinct gap≤2 triples; user 2
    # [A,B,C] yields only (A,B,C) → support 2, everything else 1
    assert len(got) == 8
    top = got.iloc[0]
    assert (top["t1"], top["t2"], top["t3"], top["n_users"]) == \
        ("A", "B", "C", 2)
    assert (got["n_users"].iloc[1:] == 1).all()


def test_seq_patterns_matches_duckdb(ray_session, tmp_path):
    import ray.data as rd

    from fluent_server_ray.stages.features import (
        sequential_patterns, sequential_patterns_sql)

    n = 200
    t = pa.table({
        "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
        "event_type": pa.array(
            [["x", "y", "z", "w"][(i * i) % 4] for i in range(n)],
            pa.string()),
        "ts": pa.array(pd.to_datetime([i // 3 for i in range(n)],
                                      unit="s"), pa.timestamp("us")),
        "event_id": pa.array(range(n), pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = sequential_patterns(rd.from_arrow(t), gap=2, k=15).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(sequential_patterns_sql(gap=2, k=15)).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


# ------------------------------------------- tokenizer fertility

def test_token_fertility_hand(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.textstats import token_fertility_by_lang

    ds = rd.from_arrow(pa.table({
        "lang": pa.array(["en", "en", None], pa.string()),
        "text": pa.array(["the cat", "don't stop", "a b"], pa.string()),
    }))
    got = token_fertility_by_lang(ds).to_pandas()
    rows = {r["lang"]: r for _, r in got.iterrows()}
    # en: ws 2+2=4; bpe "the"," cat"=2 and "don","'t"," stop"=3 → 5
    assert rows["en"]["n_ws_tokens"] == 4
    assert rows["en"]["n_bpe_tokens"] == 5
    assert rows["en"]["fertility_millionths"] == 1_250_000
    assert rows["unknown"]["n_ws_tokens"] == 2


def test_token_fertility_matches_duckdb(ray_session, tmp_path):
    import ray.data as rd

    from fluent_server_ray.stages.textstats import (
        token_fertility_by_lang, token_fertility_sql)

    t = pa.table({
        "lang": pa.array(["en", "de", "de", None, "zz"], pa.string()),
        "text": pa.array(["the cat sat", "der hund 123", "a-b c!",
                          "x y", None], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = token_fertility_by_lang(rd.from_arrow(t)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(token_fertility_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------- JSON schema drift

def _drift_events():
    ts = pd.to_datetime([0, 10, 86400, 2 * 86400, 20], unit="s")
    return pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "props": pa.array(['{"a":1,"b":2}', '{"a":1}', '{"b":1,"c":2}',
                           '{"c":null}', "[1,2]"], pa.string()),
    })


def test_json_schema_drift_hand(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.fields import json_schema_drift

    got = json_schema_drift(rd.from_arrow(_drift_events())).to_pandas()
    # day0 {a,b} → day1 {b,c}: common 1/union 3; day1 → day2 {c}
    want = pd.DataFrame({
        "day_a": [0, 1], "day_b": [1, 2],
        "n_keys_a": [2, 2], "n_keys_b": [2, 1],
        "n_common": [1, 1],
        "jaccard_millionths": [333_333, 500_000],
        "n_added": [1, 0], "n_removed": [1, 1],
    })
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_json_schema_drift_matches_duckdb(ray_session, tmp_path):
    import ray.data as rd

    from fluent_server_ray.stages.fields import (json_schema_drift,
                                                 json_schema_drift_sql)

    t = _drift_events()
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = json_schema_drift(rd.from_arrow(t)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(json_schema_drift_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_json_schema_drift_single_day(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.fields import json_schema_drift

    t = pa.table({
        "ts": pa.array(pd.to_datetime([0, 5], unit="s"),
                       pa.timestamp("us")),
        "props": pa.array(['{"a":1}', '{"b":1}'], pa.string()),
    })
    assert json_schema_drift(rd.from_arrow(t)).num_rows == 0


# --------------------------------------- Markov chain entropy rate

def test_markov_entropy_hand(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.windows import markov_entropy_rate

    t = pa.table({
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array(pd.to_datetime([1, 2, 3], unit="s"),
                       pa.timestamp("us")),
        "event_type": pa.array(["A", "A", "B"], pa.string()),
        "event_id": pa.array([1, 2, 3], pa.int64()),
    })
    got = markov_entropy_rate(rd.from_arrow(t)).to_pandas()
    # transitions (A,A),(A,B): H = 2·floor(1e6·ln2)/(2·1e6) nats
    assert got["n_transitions"].tolist() == [2]
    assert got["n_states"].tolist() == [2]
    assert abs(got["entropy_nats"].iloc[0] - 0.693147) < 1e-12


def test_markov_entropy_degenerate(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.windows import markov_entropy_rate

    # deterministic chain → zero entropy; single event → empty
    t = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array(pd.to_datetime([1, 2], unit="s"),
                       pa.timestamp("us")),
        "event_type": pa.array(["A", "B"], pa.string()),
        "event_id": pa.array([1, 2], pa.int64()),
    })
    got = markov_entropy_rate(rd.from_arrow(t)).to_pandas()
    assert got["entropy_nats"].tolist() == [0.0]
    t1 = t.slice(0, 1)
    assert markov_entropy_rate(rd.from_arrow(t1)).num_rows == 0


def test_markov_entropy_matches_duckdb(ray_session, tmp_path):
    import ray.data as rd

    from fluent_server_ray.stages.windows import (markov_entropy_rate,
                                                  markov_entropy_rate_sql)

    n = 120
    t = pa.table({
        "user_id": pa.array([i % 5 for i in range(n)], pa.int64()),
        "ts": pa.array(pd.to_datetime([i for i in range(n)], unit="s"),
                       pa.timestamp("us")),
        "event_type": pa.array(
            [["x", "y", "z"][(i * 7) % 3] for i in range(n)],
            pa.string()),
        "event_id": pa.array(range(n), pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = markov_entropy_rate(rd.from_arrow(t)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(markov_entropy_rate_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------- Q15 top-supplier revenue

def test_top_supplier_hand_with_tie(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import top_supplier_revenue

    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 2, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 50.0, 999.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
        "l_shipdate": pa.array(
            [_ts("1996-02-01"), _ts("1996-02-02"), _ts("1996-03-01"),
             _ts("1997-01-01")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
    }), str(tmp_path / "supplier.parquet"))

    got = top_supplier_revenue(str(tmp_path)).to_pandas()
    # suppliers 1 and 2 tie at 10000 cents; 3 ships outside the window
    want = pd.DataFrame({"s_suppkey": [1, 2], "s_name": ["S1", "S2"],
                         "total_revenue_cents": [10000, 10000]})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_top_supplier_empty_window(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import top_supplier_revenue

    pq.write_table(pa.table({
        "l_suppkey": pa.array([1], pa.int64()),
        "l_extendedprice": pa.array([1.0]),
        "l_discount": pa.array([0.0]),
        "l_shipdate": pa.array([_ts("1999-01-01")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_name": pa.array(["S1"], pa.string()),
    }), str(tmp_path / "supplier.parquet"))
    got = top_supplier_revenue(str(tmp_path))
    assert got.num_rows == 0
    assert got.schema.names == ["s_suppkey", "s_name",
                                "total_revenue_cents"]


# ------------------------------------------- contamination score

def test_contamination_score_hand(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.hygiene import contamination_score

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 5], pa.int64()),
        "text": pa.array(["a b c x", "a b c d", "z z", "a b c d e"],
                         pa.string()),
    }))
    got = (contamination_score(ds, k=3, bench_mod=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # bench = doc 2 → grams {a b c, b c d}
    # doc 1 {a b c, b c x} → 1/2; doc 3 < 3 tokens → NULL;
    # doc 5 {a b c, b c d, c d e} → 2/3
    assert got["doc_id"].tolist() == [1, 3, 5]
    assert got["n_grams"].tolist() == [2, 0, 3]
    assert got["n_hit"].tolist() == [1, 0, 2]
    assert got["contamination_millionths"].iloc[0] == 500_000
    assert pd.isna(got["contamination_millionths"].iloc[1])
    assert got["contamination_millionths"].iloc[2] == 666_666


def test_contamination_score_matches_duckdb(ray_session, tmp_path):
    import ray.data as rd

    from fluent_server_ray.stages.hygiene import (contamination_score,
                                                  contamination_score_sql)

    t = pa.table({
        "doc_id": pa.array(range(1, 25), pa.int64()),
        "text": pa.array(
            [f"w{i % 4} w{(i + 1) % 4} w{(i + 2) % 4} w{(i + 3) % 5}"
             for i in range(24)], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = (contamination_score(rd.from_arrow(t), k=3, bench_mod=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(contamination_score_sql(k=3, bench_mod=5)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ----------------------------------------- Holt-Winters seasonal

def _hw_events(days_counts, group="x"):
    groups, ts = [], []
    for day, n in days_counts:
        for _ in range(n):
            groups.append(group)
            ts.append(day * 86400)
    return pa.table({
        "event_type": pa.array(groups, pa.string()),
        "ts": pa.array(pd.to_datetime(ts, unit="s"), pa.timestamp("us")),
    })


def test_holtwinters_hand(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.features import holtwinters_trend

    # m=2, α=1/2, β=1/4, γ=1/2, y=[2,4,6,8]:
    # l0=3e6, s=[−1e6,1e6]; t=2: l=5e6 tr=5e5 s0=0;
    # t=3: l=6.25e6 tr=687500 s1=1375000; forecast=l+tr+s0
    got = holtwinters_trend(
        rd.from_arrow(_hw_events([(0, 2), (1, 4), (2, 6), (3, 8)])),
        period=2).to_pandas()
    assert got["group"].tolist() == ["x"]
    assert got["n_days"].tolist() == [4]
    assert got["level_millionths"].tolist() == [6_250_000]
    assert got["trend_millionths"].tolist() == [687_500]
    assert got["forecast_millionths"].tolist() == [6_937_500]


def test_holtwinters_short_series_dropped(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.features import holtwinters_trend

    got = holtwinters_trend(
        rd.from_arrow(_hw_events([(0, 2), (6, 3)])), period=7)
    # span 7 days < period+1 → dropped
    assert got.num_rows == 0


def test_holtwinters_matches_duckdb_with_gaps(ray_session, tmp_path):
    import ray.data as rd

    from fluent_server_ray.stages.features import (holtwinters_trend,
                                                   holtwinters_trend_sql)

    # two groups, calendar gaps (zero-filled), 18-day spans, m=7
    rows = []
    for g_i, g in enumerate(["a", "b"]):
        for d in range(0, 18):
            if (d + g_i) % 4 == 0:
                continue  # missing days
            rows.extend([(d, 1 + ((d * (g_i + 2)) % 5))])
        t = _hw_events(rows, group=g)
        rows = []
        if g_i == 0:
            acc = t
        else:
            acc = pa.concat_tables([acc, t])
    pq.write_table(acc, str(tmp_path / "events.parquet"))
    got = holtwinters_trend(rd.from_arrow(acc)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(holtwinters_trend_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------ basket part pairs

def test_part_basket_hand(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import part_basket_pairs

    pq.write_table(pa.table({
        # order 1: {10, 20, 30} (20 duplicated); order 2: {10, 20}
        "l_orderkey": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([10, 20, 20, 30, 10, 20], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    got = part_basket_pairs(str(tmp_path), k=10).to_pandas()
    want = pd.DataFrame({
        "part_a": [10, 10, 20], "part_b": [20, 30, 30], "n": [2, 1, 1]})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_part_basket_matches_duckdb(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import (
        part_basket_pairs, part_basket_pairs_sql)

    n = 300
    pq.write_table(pa.table({
        "l_orderkey": pa.array([i // 4 for i in range(n)], pa.int64()),
        "l_partkey": pa.array([(i * 13) % 9 for i in range(n)],
                              pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    got = part_basket_pairs(str(tmp_path), k=12).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{tmp_path}/lineitem.parquet')")
    want = con.execute(part_basket_pairs_sql(k=12)).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)
