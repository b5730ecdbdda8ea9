"""Large-large join parity: explicit bucketed hash join vs Ray's native
hash join vs pandas reference, including keys missing from one side."""

import pandas as pd
import pytest


@pytest.fixture()
def sides(ray_session):
    import ray.data as rd

    left = pd.DataFrame({"k": [1, 2, 3, 4, 5, 7], "lv": list("abcdef")})
    right = pd.DataFrame(
        {"k": [2, 2, 3, 6, 7], "rv": [20, 21, 30, 60, 70]}
    )
    return rd.from_pandas(left), rd.from_pandas(right), left, right


def _norm(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_bucketed_join_matches_pandas(sides):
    from fluent_server_ray.stages.joins import bucketed_hash_join

    l, r, lpd, rpd = sides
    got = bucketed_hash_join(l, r, key="k", n_buckets=4).to_pandas()
    want = lpd.merge(rpd, on="k")
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_native_join_matches_pandas(sides):
    from fluent_server_ray.stages.joins import native_join

    l, r, lpd, rpd = sides
    got = native_join(l, r, key="k", n_partitions=4).to_pandas()
    want = lpd.merge(rpd, on="k")
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_bucketed_join_different_key_names(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.joins import bucketed_hash_join

    l = rd.from_pandas(pd.DataFrame({"a": [1, 2], "x": ["p", "q"]}))
    r = rd.from_pandas(pd.DataFrame({"b": [2, 3], "y": ["r", "s"]}))
    got = bucketed_hash_join(l, r, key="a", right_key="b").to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["x"] == "q" and got.iloc[0]["y"] == "r"


def test_bucketed_left_join_schema_stable(ray_session, sides):
    """how='left': the fill side's int columns are float64 in EVERY
    bucket (NaN-capable, no per-bucket schema drift), values match
    pandas merge."""
    import pandas as pd

    from fluent_server_ray.stages.joins import bucketed_hash_join

    l, r, lpd, rpd = sides
    got = bucketed_hash_join(l, r, key="k", n_buckets=4, how="left").to_pandas()
    want = lpd.merge(rpd, on="k", how="left")
    assert str(got["rv"].dtype) == "float64"
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False,
    )
    assert got["rv"].isna().sum() == want["rv"].isna().sum() > 0


def test_range_join_overlap_guard_and_null_intervals(ray_session):
    """Same-named non-key columns on both sides fail fast (the union
    schema would silently collapse them); null interval bounds drop out
    like SQL NULL comparisons instead of crashing the matcher."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from fluent_server_ray.stages.windows import range_join

    left = pd.DataFrame({"k": [1, 1, 2], "event_id": [10, 11, 20],
                         "ts": [5.0, 15.0, 5.0]})
    right = pd.DataFrame({"k": [1, 1, 2], "win_id": [100, 101, 200],
                          "lo": [0.0, 10.0, np.nan],
                          "hi": [10.0, 20.0, np.nan]})

    out = range_join(rd.from_pandas(left), rd.from_pandas(right),
                     key_col="k", ts_col="ts").to_pandas()
    got = set(zip(out["event_id"], out["win_id"]))
    assert got == {(10, 100), (11, 101)}  # null window matches nothing

    clash = right.rename(columns={"win_id": "ts"})  # ts on both sides
    with pytest.raises(ValueError, match="BOTH sides"):
        range_join(rd.from_pandas(left), rd.from_pandas(clash),
                   key_col="k", ts_col="ts").to_pandas()


def test_shipping_priority_matches_oracle(ray_session):
    """TPC-H Q3 shape (chained custkey→orderkey bucketed joins, pushed
    segment/date filters, distributed per-order revenue, block-local
    top-k): exact equality vs DuckDB at sf0.001, including the
    (revenue DESC, o_orderkey) tie-break order."""
    import duckdb

    from fluent_server_ray.pipelines import relational as rel
    from tests.conftest import SF_SMALL

    out = rel.shipping_priority(SF_SMALL).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    odf = con.execute(rel.shipping_priority_sql()).df()
    assert list(out.columns) == list(odf.columns)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), odf.reset_index(drop=True),
        check_dtype=False,
    )


def test_shipping_priority_empty_match_is_typed(ray_session, tmp_path):
    """Zero matching rows (no customer in the segment) returns a typed
    empty table with the contract schema, never an ArrowInvalid from an
    empty concat."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fluent_server_ray.pipelines import relational as rel

    d = tmp_path
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], type=pa.int64()),
        "c_mktsegment": ["MACHINERY"],  # never BUILDING
    }), d / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10], type=pa.int64()),
        "o_custkey": pa.array([1], type=pa.int64()),
        "o_orderdate": pa.array([pd.Timestamp("1997-01-01")],
                                type=pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT"],
    }), d / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10], type=pa.int64()),
        "l_extendedprice": [100.0],
        "l_discount": [0.0],
        "l_shipdate": pa.array([pd.Timestamp("1999-01-01")],
                               type=pa.timestamp("us")),
    }), d / "lineitem.parquet")

    out = rel.shipping_priority(str(d))
    assert out.num_rows == 0
    assert out.column_names == ["o_orderkey", "rev_cents_sum",
                                "o_orderdate", "o_orderpriority"]


def test_asof_join_generic_two_datasets(ray_session):
    """Two-dataset as-of: backward strict/exact matching vs DuckDB
    ASOF LEFT JOIN; unmatched rows NaN; empty sides typed."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.joins import asof_join

    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "k": [1, 1, 2, 3],
        "ts": [base + pd.Timedelta(minutes=m) for m in (0, 5, 2, 1)],
        "lid": [100, 101, 102, 103],
    })
    right = pd.DataFrame({
        "k": [1, 1, 2],
        "ts": [base + pd.Timedelta(minutes=m) for m in (0, 3, 9)],
        "eid": [10, 20, 30],
    })
    got = (asof_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                     attach={"eid": "prior_eid"},
                     allow_exact_matches=False)
           .to_pandas().sort_values("lid").reset_index(drop=True))
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute("""
SELECT l.k, l.ts, l.lid, CAST(r.eid AS DOUBLE) AS prior_eid
FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts > r.ts
ORDER BY l.lid""").df()
    pd.testing.assert_frame_equal(got, want)
    # exact-match variant picks the equal-ts row
    got2 = (asof_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                      attach={"eid": "prior_eid"})
            .to_pandas().sort_values("lid").reset_index(drop=True))
    assert got2.loc[got2.lid == 100, "prior_eid"].iloc[0] == 10.0


def test_asof_join_nonint_attach_and_right_ts(ray_session):
    """The 2^53 precision guard applies ONLY to integer attach
    columns: attaching a datetime (or string) column must not raise
    even though its numeric image exceeds 2^53 ns. Attaching the
    right timestamp itself ('when was the matched event') works via
    the pre-rename copy instead of clobbering the merge rename."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.joins import asof_join

    base = pd.Timestamp("2024-01-01")  # ~1.7e18 ns >= 2^53
    left = pd.DataFrame({
        "k": [1, 1, 2],
        "ts": [base + pd.Timedelta(minutes=m) for m in (5, 1, 7)],
        "lid": [100, 101, 102],
    })
    right = pd.DataFrame({
        "k": [1, 2],
        "ts": [base + pd.Timedelta(minutes=m) for m in (2, 9)],
        "note": ["first", "second"],
        "created_at": [base - pd.Timedelta(days=d) for d in (1, 2)],
    })
    got = (asof_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                     attach={"created_at": "prior_created",
                             "note": "prior_note",
                             "ts": "matched_ts"})
           .to_pandas().sort_values("lid").reset_index(drop=True))
    # lid=100 (k=1, t+5) matches right (k=1, t+2); lid=101 (t+1) has
    # no prior; lid=102 (k=2, t+7) precedes the k=2 right row (t+9).
    assert got.loc[0, "prior_note"] == "first"
    assert got.loc[0, "prior_created"] == base - pd.Timedelta(days=1)
    assert got.loc[0, "matched_ts"] == base + pd.Timedelta(minutes=2)
    assert pd.isna(got.loc[1, "prior_note"])
    assert pd.isna(got.loc[1, "matched_ts"])
    assert pd.isna(got.loc[2, "prior_note"])
    # integer attach columns DO keep the guard
    import pytest
    right_big = pd.DataFrame({
        "k": [1], "ts": [base], "big": [np.int64(1 << 60)],
    })
    with pytest.raises(ValueError, match="2\\^53"):
        asof_join(rd.from_pandas(left), rd.from_pandas(right_big), "k",
                  attach={"big": "prior_big"}).materialize()


def test_asof_join_bucket_invariance_vs_global_merge_asof(ray_session):
    """Randomized pin: for several seeds, asof_join's bucketed result
    equals ONE global pandas merge_asof, for every n_buckets — the
    bucket exchange must be invisible in the result."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.joins import asof_join

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        nl, nr = 60, 40
        left = pd.DataFrame({
            "k": rng.integers(0, 6, nl),
            "ts": rng.integers(0, 1000, nl).astype("int64"),
            "lid": np.arange(nl, dtype="int64"),
        })
        right = pd.DataFrame({
            "k": rng.integers(0, 6, nr),
            # unique ts per key so tie-break order can't differ
            "ts": (np.arange(nr, dtype="int64") * 13 + seed),
            "rid": np.arange(nr, dtype="int64") + 1000,
        })
        want = pd.merge_asof(
            left.sort_values(["ts", "k"]),
            right.rename(columns={"rid": "prior_rid"})
                 .sort_values(["ts", "k"]),
            on="ts", by="k", direction="backward",
        ).sort_values("lid").reset_index(drop=True)
        want["prior_rid"] = want["prior_rid"].astype("float64")
        for nb in (1, 3, 64):
            got = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                             "k", attach={"rid": "prior_rid"},
                             n_buckets=nb)
                   .to_pandas().sort_values("lid").reset_index(drop=True))
            pd.testing.assert_frame_equal(
                got[["k", "ts", "lid", "prior_rid"]],
                want[["k", "ts", "lid", "prior_rid"]],
                check_dtype=False)


def test_asof_join_bucket_with_no_right_rows_nonfloat_attach(ray_session):
    """Round-4 review fix: a bucket holding left rows but ZERO right
    rows used to assign blanket np.nan to every attach output — a
    float64 column that cannot cast to the timestamp/string output
    schema. Right keyed entirely away from the left keys forces the
    empty-right fallback in every left bucket; timestamp and string
    attach outputs must come back as typed nulls."""
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.joins import asof_join

    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "k": [2, 2, 5],
        "ts": [base + pd.Timedelta(minutes=m) for m in (1, 2, 3)],
        "lid": [1, 2, 3],
    })
    right = pd.DataFrame({
        "k": [9],  # never matches any left key
        "ts": [base],
        "note": ["x"],
        "evt": [base - pd.Timedelta(days=1)],
    })
    got = (asof_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                     attach={"evt": "prior_evt", "note": "prior_note",
                             "ts": "matched_ts"}, n_buckets=16)
           .to_pandas().sort_values("lid").reset_index(drop=True))
    assert len(got) == 3
    assert got.prior_evt.isna().all()
    assert got.prior_note.isna().all()
    assert got.matched_ts.isna().all()
    assert str(got.prior_evt.dtype).startswith("datetime64")
    assert str(got.matched_ts.dtype).startswith("datetime64")


def test_fk_integrity_audit_both_paths(ray_session, tmp_path):
    """Orphans and NULL keys detected exactly; the broadcast fast path
    and the distinct-key join path agree edge for edge."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fluent_server_ray.pipelines.relational import (
        FK_EDGES,
        fk_integrity_audit,
    )

    sf = str(tmp_path)
    # minimal warehouse: every FK edge present, with seeded defects
    pq.write_table(pa.table({"r_regionkey": pa.array([0, 1], pa.int64()),
                             "r_name": ["a", "b"]}), f"{sf}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": ["x", "y", "z"],
        "n_regionkey": pa.array([0, 1, 9], pa.int64()),  # 9 = orphan
    }), f"{sf}/nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11], pa.int64()),
        "c_nationkey": pa.array([0, None], pa.int64()),  # one NULL
    }), f"{sf}/customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([20], pa.int64()),
        "s_nationkey": pa.array([2], pa.int64()),
    }), f"{sf}/supplier.parquet")
    pq.write_table(pa.table({"p_partkey": pa.array([30, 31], pa.int64())}),
                   f"{sf}/part.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([40, 41, 42], pa.int64()),
        "o_custkey": pa.array([10, 99, None], pa.int64()),  # orphan+null
    }), f"{sf}/orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([40, 40, 77], pa.int64()),   # 77 orphan
        "l_partkey": pa.array([30, 31, 30], pa.int64()),
        "l_suppkey": pa.array([20, 20, 55], pa.int64()),    # 55 orphan
    }), f"{sf}/lineitem.parquet")

    fast = fk_integrity_audit(sf).to_pandas().set_index("fk")
    slow = fk_integrity_audit(sf, broadcast_max_rows=0
                              ).to_pandas().set_index("fk")
    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) == len(FK_EDGES) == 7
    assert fast.loc["orders.o_custkey->customer"].tolist() == [3, 1, 1]
    assert fast.loc["lineitem.l_orderkey->orders"].tolist() == [3, 0, 1]
    assert fast.loc["lineitem.l_suppkey->supplier"].tolist() == [3, 0, 1]
    assert fast.loc["nation.n_regionkey->region"].tolist() == [3, 0, 1]
    assert fast.loc["customer.c_nationkey->nation"].tolist() == [2, 1, 0]
    assert fast.loc["lineitem.l_partkey->part"].tolist() == [3, 0, 0]
    assert fast.loc["supplier.s_nationkey->nation"].tolist() == [1, 0, 0]
