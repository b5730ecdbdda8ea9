"""Hand-computed pins + DuckDB parity for the session-14 operators:
Mann-Kendall trend, McNemar paired test, rolling frame median,
randomized-response private counts, SPRT daily decision, peak interval
concurrency, Wilcoxon signed-rank, Arrow IPC round-trip, weighted
shortest paths."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def _duck_one(df, sql, view="events"):
    con = duckdb.connect()
    con.register(view, df)
    return con.execute(sql).df()


def _cmp(ray_df, duck_df):
    assert sorted(ray_df.columns) == sorted(duck_df.columns)
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = duck_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ------------------------------------------------ Mann-Kendall

def test_mann_kendall_hand_pin(ray_session):
    """Two groups: 'up' strictly increasing daily sums (S = n(n-1)/2),
    'tie' with tied daily values exercising the tie correction."""
    from fluent_server_ray.stages.features import mann_kendall_trend

    ts = pd.to_datetime(
        ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
         "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"])
    df = pd.DataFrame({
        "event_type": ["up"] * 4 + ["tie"] * 4,
        "ts": ts,
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 5.0, 1.0],
    })
    out = mann_kendall_trend(rd.from_pandas(df)).to_pandas()
    up = out[out.event_type == "up"].iloc[0]
    # strictly increasing: S = 6, no ties -> var_num18 = 4*3*13 = 156
    assert up.s_stat == 6 and up.var_num18 == 156
    assert up.z == (6 - 1) / np.sqrt(156 / 18.0)
    tie = out[out.event_type == "tie"].iloc[0]
    # series 500,500,500,100 cents: sign pairs = 3*(-1) vs 3 zero-pairs
    # -> S = -3; ties: one group of 3 -> 3*2*11 = 66; 156 - 66 = 90
    assert tie.s_stat == -3 and tie.var_num18 == 90
    assert tie.z == (-3 + 1) / np.sqrt(90 / 18.0)


def test_mann_kendall_constant_series_null_z(ray_session):
    from fluent_server_ray.stages.features import mann_kendall_trend

    df = pd.DataFrame({
        "event_type": ["c"] * 3,
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
        "value": [2.0, 2.0, 2.0],
    })
    out = mann_kendall_trend(rd.from_pandas(df)).to_pandas()
    # all-tied series: variance numerator 0 -> z NULL, S = 0
    assert out.s_stat.iloc[0] == 0 and out.var_num18.iloc[0] == 0
    assert pd.isna(out.z.iloc[0])


def test_mann_kendall_duck_parity(ray_session):
    from fluent_server_ray.stages.features import (mann_kendall_trend,
                                                   mann_kendall_trend_sql)

    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 20 * 86400, n), unit="s"),
        "value": np.round(rng.normal(50, 20, n), 2),
    })
    got = mann_kendall_trend(rd.from_pandas(df)).to_pandas()
    want = _duck_one(df, mann_kendall_trend_sql())
    _cmp(got, want)


# ------------------------------------------------ McNemar

def test_mcnemar_hand_pin(ray_session):
    from fluent_server_ray.stages.features import mcnemar_paired

    df = pd.DataFrame({
        # u1: both; u2: click only; u3/u4: purchase only; u5: neither
        "user_id": [1, 1, 2, 3, 4, 5],
        "event_type": ["click", "purchase", "click", "purchase",
                       "purchase", "view"],
    })
    out = mcnemar_paired(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out.n_users == 5 and out.n_both == 1
    assert out.n_a_only == 1 and out.n_b_only == 2 and out.n_neither == 1
    assert out.mcnemar_chi2 == float((1 - 2) ** 2) / 3.0


def test_mcnemar_no_discordant_null(ray_session):
    from fluent_server_ray.stages.features import mcnemar_paired

    df = pd.DataFrame({"user_id": [1, 1], "event_type":
                       ["click", "purchase"]})
    out = mcnemar_paired(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out.n_both == 1 and pd.isna(out.mcnemar_chi2)


# ------------------------------------------------ rolling median

def test_rolling_median_hand_pin(ray_session):
    from fluent_server_ray.stages.windows import rolling_frame_median

    ts = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [9, 9, 9, 9],
        "ts": [ts] * 4,
        "value": [0.05, 0.03, 0.08, 0.01],
    })
    out = (rolling_frame_median(rd.from_pandas(df), window_rows=3)
           .to_pandas().sort_values("id"))
    # cents 5,3,8,1; frames: [5], [5,3], [5,3,8], [3,8,1]
    assert out.rolling_median.tolist() == [5.0, 4.0, 5.0, 3.0]


def test_rolling_median_duck_parity(ray_session):
    from fluent_server_ray.stages.windows import (rolling_frame_median,
                                                  rolling_frame_median_sql)

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 12, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
        "value": np.round(rng.normal(20, 9, n), 2),
    })
    # duplicate-ts collisions within a user exercise the (ts, id) order
    got = (rolling_frame_median(rd.from_pandas(df), n_buckets=4)
           .to_pandas())
    want = _duck_one(df, rolling_frame_median_sql())
    _cmp(got, want)
