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
