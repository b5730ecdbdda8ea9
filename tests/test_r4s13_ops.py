"""Hand-computed pins + DuckDB parity for the session-13 TPC-H shapes:
Q4 late orders, Q19 disjunctive revenue, Q9 profit, Q11 screen,
Q16 supplier counts, Q20 excess share, Q2 groupwise min, Q21 sole-late."""

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


def _cmp(ray_df, duck_df):
    assert sorted(ray_df.columns) == sorted(duck_df.columns)
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = duck_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ----------------------------------------------- Q4 late-order counts

def _write_q4(tmp_path):
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array(
            [_ts("1996-01-10"), _ts("1996-02-01"), _ts("1996-03-01"),
             _ts("1995-06-01")],  # order 4 outside the window
            pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["1-URGENT", "1-URGENT", "5-LOW", "1-URGENT"], pa.string()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # order 1: two late lines (still ONE order); order 2: exactly
        # 90 days -> NOT late (strict >); order 3: 91 days -> late;
        # order 4: late but outside the date window.
        "l_orderkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
        "l_shipdate": pa.array(
            [_ts("1996-06-01"), _ts("1997-01-01"), _ts("1996-05-01"),
             _ts("1996-05-31"), _ts("1999-01-01")],
            pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))


def test_q4_hand_pin(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import \
        late_order_priority_counts

    _write_q4(tmp_path)
    out = late_order_priority_counts(
        str(tmp_path), date_from="1996-01-01 00:00:00",
        date_to="1996-04-01 00:00:00", late_days=90).to_pandas()
    assert out.to_dict("records") == [
        {"o_orderpriority": "1-URGENT", "n_late_orders": 1},
        {"o_orderpriority": "5-LOW", "n_late_orders": 1},
    ]


def test_q4_matches_oracle(ray_session):
    from fluent_server_ray.pipelines.relational import (
        late_order_priority_counts, late_order_priority_counts_sql)

    ray_df = late_order_priority_counts(SF_SMALL).to_pandas()
    duck_df = _duck(SF_SMALL, ["orders", "lineitem"]).execute(
        late_order_priority_counts_sql()).df()
    assert len(ray_df) > 0
    _cmp(ray_df, duck_df)


# --------------------------------------------- Q19 disjunctive revenue

def _write_q19(tmp_path):
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["Brand#1", "Brand#2", "Brand#9"],
                            pa.string()),
        "p_size": pa.array([5, 30, 1], pa.int64()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        # line 1: brand 1, size 5 in [1,15], qty 11 at band edge -> in;
        # line 2: brand 1 but qty 12 outside [1,11] -> out;
        # line 3: brand 2 but size 30 outside [1,25] -> out;
        # line 4: brand 9 matches no disjunct -> out.
        "l_partkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_quantity": pa.array([11.0, 12.0, 15.0, 25.0]),
        "l_extendedprice": pa.array([100.0, 100.0, 100.0, 100.0]),
        "l_discount": pa.array([0.25, 0.0, 0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))


def test_q19_hand_pin(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import \
        disjunctive_band_revenue

    _write_q19(tmp_path)
    out = disjunctive_band_revenue(str(tmp_path)).to_pandas()
    # 100 * 0.75 = 75.00 -> 7500 cents, one qualifying line
    assert out.to_dict("records") == [
        {"revenue_cents": 7500, "n_lines": 1}]


def test_q19_matches_oracle(ray_session):
    from fluent_server_ray.pipelines.relational import (
        disjunctive_band_revenue, disjunctive_band_revenue_sql)

    ray_df = disjunctive_band_revenue(SF_SMALL).to_pandas()
    duck_df = _duck(SF_SMALL, ["lineitem", "part"]).execute(
        disjunctive_band_revenue_sql()).df()
    assert int(ray_df["n_lines"][0]) > 0
    _cmp(ray_df, duck_df)


# ------------------------------------------------ Q9 nation-year profit

def _write_q9(tmp_path):
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt"], pa.string()),
        "p_retailprice": pa.array([10.0, 99.0]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([100, 101], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["ALPHA", "BETA"], pa.string()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        # row 3 is a non-widget part (filtered); rows 1+4 fold into
        # (ALPHA, 1996); row 4's cost exceeds its revenue (negative
        # profit contribution).
        "l_partkey": pa.array([1, 1, 2, 1], pa.int64()),
        "l_suppkey": pa.array([100, 101, 100, 100], pa.int64()),
        "l_quantity": pa.array([2.0, 1.0, 9.0, 4.0]),
        "l_extendedprice": pa.array([100.0, 50.0, 77.0, 20.0]),
        "l_discount": pa.array([0.0, 0.5, 0.0, 0.25]),
        "l_shipdate": pa.array(
            [_ts("1996-05-05"), _ts("1997-01-01"), _ts("1996-06-01"),
             _ts("1996-12-31")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))


def test_q9_hand_pin(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import nation_year_profit

    _write_q9(tmp_path)
    out = nation_year_profit(str(tmp_path)).to_pandas()
    # ALPHA 1996: (10000-1000) + (1500-2000) = 8500
    # BETA  1997: 2500-500 = 2000
    assert out.to_dict("records") == [
        {"n_name": "ALPHA", "o_year": 1996, "profit_cents": 8500},
        {"n_name": "BETA", "o_year": 1997, "profit_cents": 2000},
    ]


def test_q9_matches_oracle(ray_session):
    from fluent_server_ray.pipelines.relational import (
        nation_year_profit, nation_year_profit_sql)

    ray_df = nation_year_profit(SF_SMALL).to_pandas()
    duck_df = _duck(SF_SMALL, ["lineitem", "part", "supplier",
                               "nation"]).execute(
        nation_year_profit_sql()).df()
    assert len(ray_df) > 0
    _cmp(ray_df, duck_df)


# ------------------------------------------- Q11 important-part screen

def test_q11_hand_pin(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import \
        part_revenue_important

    pq.write_table(pa.table({
        # revenues 100, 100, 400 cents; total 600, n=3:
        # keep iff 4*3*r > 5*600 <=> r > 250 -> only part 3
        "l_partkey": pa.array([1, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([1.0, 1.0, 4.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = part_revenue_important(str(tmp_path)).to_pandas()
    assert out.to_dict("records") == [
        {"l_partkey": 3, "revenue_cents": 400}]


def test_q11_matches_oracle(ray_session):
    from fluent_server_ray.pipelines.relational import (
        part_revenue_important, part_revenue_important_sql)

    ray_df = part_revenue_important(SF_SMALL).to_pandas()
    duck_df = _duck(SF_SMALL, ["lineitem"]).execute(
        part_revenue_important_sql()).df()
    assert len(ray_df) > 0
    _cmp(ray_df, duck_df)


# ------------------------------------- Q16 supplier counts by attrs

def _write_q16(tmp_path):
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["Brand#2", "Brand#2", "Brand#1"],
                            pa.string()),
        "p_type": pa.array(["SMALL", "PROMO", "SMALL"], pa.string()),
        "p_size": pa.array([10, 10, 10], pa.int64()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([7, 8, 9], pa.int64()),
        "s_acctbal": pa.array([5000.0, 100.0, 3000.0]),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        # part 2 excluded (PROMO), part 3 excluded (Brand#1),
        # supplier 8 excluded (acctbal < 2000); supplier 7 appears
        # twice for part 1 -> still ONE distinct supplier.
        "l_partkey": pa.array([1, 1, 1, 1, 2, 3], pa.int64()),
        "l_suppkey": pa.array([7, 7, 8, 9, 7, 7], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))


def test_q16_hand_pin(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import \
        part_attr_supplier_counts

    _write_q16(tmp_path)
    out = part_attr_supplier_counts(str(tmp_path)).to_pandas()
    assert out.to_dict("records") == [
        {"p_brand": "Brand#2", "p_type": "SMALL", "p_size": 10,
         "supplier_cnt": 2}]


def test_q16_matches_oracle(ray_session):
    from fluent_server_ray.pipelines.relational import (
        part_attr_supplier_counts, part_attr_supplier_counts_sql)

    ray_df = part_attr_supplier_counts(SF_SMALL).to_pandas()
    duck_df = _duck(SF_SMALL, ["lineitem", "part", "supplier"]).execute(
        part_attr_supplier_counts_sql()).df()
    assert len(ray_df) > 0
    _cmp(ray_df, duck_df)


# --------------------------------------- Q20 excess-share suppliers

def _write_q20(tmp_path):
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt"], pa.string()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([7, 8], pa.int64()),
        "s_name": pa.array(["S7", "S8"], pa.string()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        # part 1 in-window: supp 7 ships 6 of 10 (>50% -> winner),
        # supp 8 ships 4; supp 8's dominant row is on part 2 (not
        # name-matched) and a 1998 row is excluded by the window.
        "l_partkey": pa.array([1, 1, 1, 2, 1], pa.int64()),
        "l_suppkey": pa.array([7, 7, 8, 8, 8], pa.int64()),
        "l_quantity": pa.array([4.0, 2.0, 4.0, 9.0, 50.0]),
        "l_shipdate": pa.array(
            [_ts("1997-02-01"), _ts("1997-06-01"), _ts("1997-08-01"),
             _ts("1997-03-01"), _ts("1998-03-01")],
            pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))


def test_q20_hand_pin(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import \
        excess_share_suppliers

    _write_q20(tmp_path)
    out = excess_share_suppliers(str(tmp_path)).to_pandas()
    assert out.to_dict("records") == [{"s_suppkey": 7, "s_name": "S7"}]


def test_q20_matches_oracle(ray_session):
    from fluent_server_ray.pipelines.relational import (
        excess_share_suppliers, excess_share_suppliers_sql)

    ray_df = excess_share_suppliers(SF_SMALL).to_pandas()
    duck_df = _duck(SF_SMALL, ["lineitem", "part", "supplier"]).execute(
        excess_share_suppliers_sql()).df()
    assert len(ray_df) > 0
    _cmp(ray_df, duck_df)


# ---------------------------------------- Q2 groupwise-min supplier

def _write_q2(tmp_path):
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_regionkey": pa.array([0, 1], pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        # supplier 9 is in EUROPE -> out of region
        "s_suppkey": pa.array([7, 8, 9], pa.int64()),
        "s_name": pa.array(["S7", "S8", "S9"], pa.string()),
        "s_nationkey": pa.array([0, 0, 1], pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt"], pa.string()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        # part 1: supp 7 min 5.00, supp 8 min 5.00 -> TIE keeps both;
        # supp 9's cheaper 1.00 is outside the region. part 2: supp 8
        # min is 3.00 (its 9.00 row is not the min).
        "l_partkey": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "l_suppkey": pa.array([7, 7, 8, 9, 8, 8], pa.int64()),
        "l_extendedprice": pa.array([5.0, 6.0, 5.0, 1.0, 9.0, 3.0]),
    }), str(tmp_path / "lineitem.parquet"))


def test_q2_hand_pin(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import \
        part_min_price_supplier

    _write_q2(tmp_path)
    out = part_min_price_supplier(str(tmp_path)).to_pandas()
    assert out.to_dict("records") == [
        {"p_partkey": 1, "p_name": "red widget", "s_suppkey": 7,
         "s_name": "S7", "min_price_cents": 500},
        {"p_partkey": 1, "p_name": "red widget", "s_suppkey": 8,
         "s_name": "S8", "min_price_cents": 500},
        {"p_partkey": 2, "p_name": "blue bolt", "s_suppkey": 8,
         "s_name": "S8", "min_price_cents": 300},
    ]


def test_q2_matches_oracle(ray_session):
    from fluent_server_ray.pipelines.relational import (
        part_min_price_supplier, part_min_price_supplier_sql)

    ray_df = part_min_price_supplier(SF_SMALL).to_pandas()
    duck_df = _duck(SF_SMALL, ["lineitem", "part", "supplier", "nation",
                               "region"]).execute(
        part_min_price_supplier_sql()).df()
    assert len(ray_df) > 0
    _cmp(ray_df, duck_df)


# ------------------------------------------ Q21 sole-late suppliers

def _write_q21(tmp_path):
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array(
            [_ts("1996-01-01"), _ts("1996-01-01"), _ts("1996-01-01")],
            pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([7, 8], pa.int64()),
        "s_name": pa.array(["S7", "S8"], pa.string()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        # order 1: supp 7 late, supp 8 on time -> blame supp 7;
        # order 2: both late -> nobody blamed (nl=2);
        # order 3: single-supplier order, late -> excluded (ns=1).
        "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_suppkey": pa.array([7, 8, 7, 8, 7], pa.int64()),
        "l_shipdate": pa.array(
            [_ts("1996-06-01"), _ts("1996-01-15"), _ts("1996-06-01"),
             _ts("1996-07-01"), _ts("1996-06-01")],
            pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))


def test_q21_hand_pin(ray_session, tmp_path):
    from fluent_server_ray.pipelines.relational import \
        sole_late_supplier_counts

    _write_q21(tmp_path)
    out = sole_late_supplier_counts(str(tmp_path)).to_pandas()
    assert out.to_dict("records") == [
        {"s_suppkey": 7, "s_name": "S7", "numwait": 1}]


def test_q21_matches_oracle(ray_session):
    from fluent_server_ray.pipelines.relational import (
        sole_late_supplier_counts, sole_late_supplier_counts_sql)

    ray_df = sole_late_supplier_counts(SF_SMALL).to_pandas()
    duck_df = _duck(SF_SMALL, ["lineitem", "orders",
                               "supplier"]).execute(
        sole_late_supplier_counts_sql()).df()
    assert len(ray_df) > 0
    _cmp(ray_df, duck_df)


# ------------------------------------------------- gazetteer tagging

def test_gazetteer_hand_pin(ray_session):
    import ray

    from fluent_server_ray.stages.textstats import gazetteer_tags

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "join the big table join",   # ops:2 qualifiers:1 objects:1
            "nothing matches here",      # no hits -> no rows
            "sort",                      # ops:1
        ], pa.string()),
    }))
    out = gazetteer_tags(ds).to_pandas().sort_values(
        ["doc_id", "category"]).reset_index(drop=True)
    assert out.to_dict("records") == [
        {"doc_id": 1, "category": "objects", "n_hits": 1},
        {"doc_id": 1, "category": "ops", "n_hits": 2},
        {"doc_id": 1, "category": "qualifiers", "n_hits": 1},
        {"doc_id": 3, "category": "ops", "n_hits": 1},
    ]


def test_gazetteer_matches_oracle(ray_session):
    from fluent_server_ray.sources.pq import read_parquet_clean
    from fluent_server_ray.stages.textstats import (gazetteer_tags,
                                                    gazetteer_tags_sql)

    ds = read_parquet_clean(f"{SF_SMALL}/documents.parquet")
    ray_df = gazetteer_tags(ds).to_pandas()
    duck_df = _duck(SF_SMALL, ["documents"]).execute(
        gazetteer_tags_sql()).df()
    assert len(ray_df) > 0
    _cmp(ray_df, duck_df)


# --------------------------------------------- window rank movement

def test_rank_delta_hand_pin(ray_session):
    import ray

    from fluent_server_ray.stages.features import rank_delta_by_window

    ds = ray.data.from_arrow(pa.table({
        # window a: x=2, y=1 -> ranks x1 y2; window b: y=3, x=1 ->
        # ranks y1 x2; z only in b (dropped); one row out of range.
        "event_type": pa.array(["x", "x", "y", "y", "y", "y", "x", "z",
                                "x"], pa.string()),
        "ts": pa.array(
            [_ts("2024-01-02"), _ts("2024-01-03"), _ts("2024-01-04"),
             _ts("2024-01-20"), _ts("2024-01-21"), _ts("2024-01-22"),
             _ts("2024-01-25"), _ts("2024-01-26"), _ts("2024-03-01")],
            pa.timestamp("us")),
    }))
    out = rank_delta_by_window(ds).to_pandas()
    assert out.to_dict("records") == [
        {"event_type": "x", "n_a": 2, "n_b": 1, "rank_a": 1,
         "rank_b": 2, "rank_delta": -1},
        {"event_type": "y", "n_a": 1, "n_b": 3, "rank_a": 2,
         "rank_b": 1, "rank_delta": 1},
    ]


def test_rank_delta_matches_oracle(ray_session):
    from fluent_server_ray.sources.pq import read_parquet_clean
    from fluent_server_ray.stages.features import (
        rank_delta_by_window, rank_delta_by_window_sql)

    ds = read_parquet_clean(f"{SF_SMALL}/events.parquet",
                            columns=["event_type", "ts"])
    ray_df = rank_delta_by_window(ds).to_pandas()
    duck_df = _duck(SF_SMALL, ["events"]).execute(
        rank_delta_by_window_sql()).df()
    assert len(ray_df) > 0
    _cmp(ray_df, duck_df)


# --------------------------------------- nested denormalization

def test_nest_order_lines_hand_pin(ray_session):
    import ray

    from fluent_server_ray.stages.assembly import nest_order_lines

    ds = ray.data.from_arrow(pa.table({
        "l_orderkey": pa.array([2, 1, 1], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1], pa.int32()),
        "l_partkey": pa.array([9, 5, 4], pa.int64()),
        "l_quantity": pa.array([3.0, 1.0, 2.0]),
        "l_extendedprice": pa.array([30.0, 10.0, 20.5]),
    }))
    out = nest_order_lines(ds).to_pandas().sort_values(
        "o_orderkey").reset_index(drop=True)
    assert out.to_dict("records") == [
        {"o_orderkey": 1,
         "lines_json": '[{"ln":1,"pk":4,"qty_cents":200,'
                       '"price_cents":2050},'
                       '{"ln":2,"pk":5,"qty_cents":100,'
                       '"price_cents":1000}]',
         "n_lines": 2, "total_price_cents": 3050},
        {"o_orderkey": 2,
         "lines_json": '[{"ln":1,"pk":9,"qty_cents":300,'
                       '"price_cents":3000}]',
         "n_lines": 1, "total_price_cents": 3000},
    ]
    # the nested payload is REAL json that round-trips to the flat rows
    import json

    rows = json.loads(out["lines_json"][0])
    assert [r["pk"] for r in rows] == [4, 5]


def test_nest_order_lines_matches_oracle(ray_session):
    from fluent_server_ray.sources.pq import read_parquet_clean
    from fluent_server_ray.stages.assembly import (nest_order_lines,
                                                   nest_order_lines_sql)

    ds = read_parquet_clean(
        f"{SF_SMALL}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey",
                 "l_quantity", "l_extendedprice"])
    ray_df = nest_order_lines(ds).to_pandas()
    duck_df = _duck(SF_SMALL, ["lineitem"]).execute(
        nest_order_lines_sql()).df()
    assert len(ray_df) > 0
    _cmp(ray_df, duck_df)


# ------------------------------------------- standing-rule audit

def test_rule_matches_hand_pin(ray_session):
    import ray

    from fluent_server_ray.stages.features import standing_rule_matches

    ds = ray.data.from_arrow(pa.table({
        # user 1 fires big_error twice (n_matches 2, n_users 1);
        # value 250 fires whale_value (lo inclusive); the 99.99 error
        # misses big_error's lo; purchase 10.0 misses hi (exclusive)
        "event_type": pa.array(["error", "error", "error", "purchase",
                                "purchase", "view"], pa.string()),
        "value": pa.array([150.0, 200.0, 99.99, 10.0, 9.99, 250.0]),
        "user_id": pa.array([1, 1, 2, 3, 3, 4], pa.int64()),
    }))
    out = standing_rule_matches(ds).to_pandas()
    assert out.to_dict("records") == [
        {"rule_id": "big_error", "n_matches": 2, "n_users": 1},
        {"rule_id": "small_purchase", "n_matches": 1, "n_users": 1},
        {"rule_id": "whale_value", "n_matches": 1, "n_users": 1},
    ]


def test_rule_matches_matches_oracle(ray_session):
    from fluent_server_ray.sources.pq import read_parquet_clean
    from fluent_server_ray.stages.features import (
        standing_rule_matches, standing_rule_matches_sql)

    ds = read_parquet_clean(f"{SF_SMALL}/events.parquet",
                            columns=["event_type", "value", "user_id"])
    ray_df = standing_rule_matches(ds).to_pandas()
    duck_df = _duck(SF_SMALL, ["events"]).execute(
        standing_rule_matches_sql()).df()
    assert len(ray_df) > 0
    _cmp(ray_df, duck_df)


# --------------------------------------------------- JSONL round-trip

def test_jsonl_roundtrip_preserves_rows(ray_session, tmp_path):
    import ray

    from fluent_server_ray.sources.jsonl import read_jsonl, write_jsonl

    t = pa.table({
        "event_type": pa.array(["a", "b", "a"], pa.string()),
        "value": pa.array([1.25, 327.53, 0.03]),
        "user_id": pa.array([7, 8, 7], pa.int64()),
        "ts": pa.array([_ts("2024-01-01 12:34:56.789"),
                        _ts("2024-01-02"), _ts("2024-01-03")],
                       pa.timestamp("us")),
    })
    out = str(tmp_path / "jl")
    write_jsonl(ray.data.from_arrow(t), out)
    back = read_jsonl(out, ts_cols=("ts",)).to_pandas().sort_values(
        ["user_id", "event_type", "value"]).reset_index(drop=True)
    orig = t.to_pandas().sort_values(
        ["user_id", "event_type", "value"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        back[sorted(back.columns)], orig[sorted(orig.columns)],
        check_dtype=False)


def test_jsonl_roundtrip_query_matches_oracle(ray_session):
    import __ray_entry__ as e

    ray_df = e.queries()["events_jsonl_roundtrip"](SF_SMALL).to_pandas()
    duck_df = _duck(SF_SMALL, ["events"]).execute(
        e.oracle_sql()["events_jsonl_roundtrip"]).df()
    _cmp(ray_df, duck_df)


# ----------------------------------------------------- CSV round-trip

def test_csv_roundtrip_preserves_rows(ray_session, tmp_path):
    import ray

    from fluent_server_ray.sources.csvsrc import (read_csv_dir,
                                                  write_csv_dir)

    t = pa.table({
        "event_type": pa.array(["a", "b", "a"], pa.string()),
        # 0.1 has no exact binary repr: Arrow CSV must round-trip it
        "value": pa.array([0.1, 327.53, 1e-12]),
        "user_id": pa.array([7, 8, 7], pa.int64()),
        "ts": pa.array([_ts("2024-01-01 12:34:56.789012"),
                        _ts("2024-01-02"), _ts("2024-01-03")],
                       pa.timestamp("us")),
    })
    out = str(tmp_path / "csv")
    write_csv_dir(ray.data.from_arrow(t), out)
    back = read_csv_dir(out, ts_cols=("ts",)).to_pandas().sort_values(
        ["user_id", "event_type", "value"]).reset_index(drop=True)
    orig = t.to_pandas().sort_values(
        ["user_id", "event_type", "value"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        back[sorted(back.columns)], orig[sorted(orig.columns)],
        check_dtype=False)


def test_csv_roundtrip_query_matches_oracle(ray_session):
    import __ray_entry__ as e

    ray_df = e.queries()["events_csv_roundtrip"](SF_SMALL).to_pandas()
    duck_df = _duck(SF_SMALL, ["events"]).execute(
        e.oracle_sql()["events_csv_roundtrip"]).df()
    _cmp(ray_df, duck_df)


def test_rule_matches_null_user_contract(ray_session, tmp_path):
    """NULL user_id rows count as matches but not as users — exactly
    the mirror's count(*) vs count(DISTINCT user_id) split."""
    import ray

    from fluent_server_ray.stages.features import (
        standing_rule_matches, standing_rule_matches_sql)

    t = pa.table({
        "event_type": pa.array(["error", "error", "signup"],
                               pa.string()),
        "value": pa.array([150.0, 200.0, 1.0]),
        "user_id": pa.array([None, 1, None], pa.int64()),
    })
    out = standing_rule_matches(ray.data.from_arrow(t)).to_pandas()
    assert out.to_dict("records") == [
        {"rule_id": "big_error", "n_matches": 2, "n_users": 1},
        # all-null-user rule: matches counted, zero distinct users
        {"rule_id": "any_signup", "n_matches": 1, "n_users": 0},
    ] or out.to_dict("records") == [
        {"rule_id": "any_signup", "n_matches": 1, "n_users": 0},
        {"rule_id": "big_error", "n_matches": 2, "n_users": 1},
    ]
    pq.write_table(t, str(tmp_path / "events.parquet"))
    duck_df = _duck(str(tmp_path), ["events"]).execute(
        standing_rule_matches_sql()).df()
    _cmp(out, duck_df)


# --------------------------------------------- hard-negative mining

def test_hard_negatives_hand_pin(ray_session):
    import ray

    from fluent_server_ray.stages.similarity import hard_negative_topk

    t = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(
            [[1.0, 0.0], [0.99, 0.14], [0.0, 1.0], [0.7, 0.7]],
            pa.list_(pa.float32())),
        # vec 1 is the closest to query 0 but SHARES its label ->
        # excluded; nearest negatives are 3 then 2
        "label": pa.array([0, 0, 1, 1], pa.int32()),
    })
    out = hard_negative_topk(ray.data.from_arrow(t), [0], k=2)
    assert out.to_dict("records") == [
        {"query_id": 0, "neighbor_id": 3, "rank": 1},
        {"query_id": 0, "neighbor_id": 2, "rank": 2},
    ]


def test_hard_negatives_matches_oracle(ray_session):
    import __ray_entry__ as e

    out = e.queries()["embedding_hard_negatives"](SF_SMALL)
    duck_df = _duck(SF_SMALL, ["embeddings"]).execute(
        e.oracle_sql()["embedding_hard_negatives"]).df()
    assert len(out) > 0
    _cmp(out, duck_df)


# ------------------------------------------------ kNN label audit

def test_knn_classify_hand_pin(ray_session):
    import ray

    from fluent_server_ray.stages.similarity import knn_classify

    t = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        # query 0 at (1,0): neighbors ranked 1,3,2; k=3 votes are
        # labels [0, 1, 1] -> majority predicts 1, stored label is 0
        # -> flagged incorrect (the mislabeled-sample screen).
        "embedding": pa.array(
            [[1.0, 0.0], [0.99, 0.14], [0.0, 1.0], [0.7, 0.7]],
            pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1, 1], pa.int32()),
    })
    out = knn_classify(ray.data.from_arrow(t), [0], k=3).to_pandas()
    assert out.to_dict("records") == [
        {"query_id": 0, "predicted_label": 1, "true_label": 0,
         "correct": False}]


def test_knn_classify_matches_oracle(ray_session):
    import __ray_entry__ as e

    out = e.queries()["embedding_knn_label_audit"](SF_SMALL).to_pandas()
    duck_df = _duck(SF_SMALL, ["embeddings"]).execute(
        e.oracle_sql()["embedding_knn_label_audit"]).df()
    assert len(out) > 0
    _cmp(out, duck_df)
