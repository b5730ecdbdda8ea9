"""Hand-computed pins + DuckDB parity for the session-15 operators:
percentile-bootstrap CI for the mean daily total and CUPED-adjusted
A/B means."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
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


# ------------------------------------------------ bootstrap CI

def test_bootstrap_ci_brute_force_pin(ray_session):
    """Tiny corpus: recompute the md5-indexed resample means with a
    straight numpy loop and check the order-statistic picks exactly."""
    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.features import bootstrap_daily_mean_ci

    ts = pd.to_datetime(
        ["2024-01-01", "2024-01-01", "2024-01-02", "2024-01-03",
         "2024-01-04", "2024-01-05"])
    df = pd.DataFrame({"ts": ts,
                       "value": [1.25, 2.0, 10.0, 3.5, 7.0, 0.75]})
    n_boot, alpha = 200, 25
    out = bootstrap_daily_mean_ci(rd.from_pandas(df), n_boot=n_boot,
                                  alpha_millis=alpha).to_pandas()
    daily = np.array([325, 1000, 350, 700, 75], dtype=np.int64)
    n = len(daily)
    means = np.sort([
        daily[[md5_u64(f"bs:{b}:{i}") % n for i in range(n)]].sum() / n
        for b in range(n_boot)])
    k_lo = -(-alpha * n_boot // 1000)
    k_hi = -(-(1000 - alpha) * n_boot // 1000)
    row = out.iloc[0]
    assert row.n_days == n and row.n_boot == n_boot
    assert row.mean_obs == daily.sum() / n
    assert row.boot_lo == means[k_lo - 1]
    assert row.boot_hi == means[k_hi - 1]
    assert row.boot_lo <= row.mean_obs <= row.boot_hi


def test_bootstrap_ci_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (
        bootstrap_daily_mean_ci, bootstrap_daily_mean_ci_sql)

    rng = np.random.default_rng(7)
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 14 * 86400, 300), unit="s")
    df = pd.DataFrame({"ts": ts,
                       "value": rng.integers(-50, 5000, 300) / 100.0})
    df.loc[5, "value"] = None
    df.loc[7, "ts"] = None
    out = bootstrap_daily_mean_ci(rd.from_pandas(df), n_boot=150,
                                  alpha_millis=50).to_pandas()
    duck = _duck_one(df, bootstrap_daily_mean_ci_sql(n_boot=150,
                                                     alpha_millis=50))
    _cmp(out, duck)


def test_bootstrap_ci_empty_corpus(ray_session):
    from fluent_server_ray.stages.features import bootstrap_daily_mean_ci

    df = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01"]),
                       "value": [None]}).astype({"value": "float64"})
    out = bootstrap_daily_mean_ci(rd.from_pandas(df)).to_pandas()
    assert len(out) == 1 and out.iloc[0].n_days == 0
    assert pd.isna(out.iloc[0].mean_obs)


# ------------------------------------------------ CUPED

def test_cuped_hand_pin(ray_session):
    """4 users, hand-computed θ and adjusted means. Pre = before the
    split date, post = on/after; variant = user_id % 2."""
    from fluent_server_ray.stages.features import cuped_adjusted_means

    # user: (pre cents, post cents)
    # u0: (100, 200)  u1: (200, 400)  u2: (300, 500)  u3: (400, 900)
    rows = []
    for u, (x, y) in enumerate([(100, 200), (200, 400),
                                (300, 500), (400, 900)]):
        rows.append((u, "2024-01-10", x / 100.0))
        rows.append((u, "2024-01-20", y / 100.0))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    out = cuped_adjusted_means(
        rd.from_pandas(df), split_date="2024-01-16").to_pandas()
    n, sx, sy = 4, 1000, 2000
    sxy = 100 * 200 + 200 * 400 + 300 * 500 + 400 * 900
    sxx = 100**2 + 200**2 + 300**2 + 400**2
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    xbar = sx / n
    assert list(out.variant) == [0, 1]
    v0 = out.iloc[0]
    assert v0.n_users == 2 and v0.sum_x_cents == 400
    assert v0.sum_y_cents == 700
    assert v0.theta == theta
    assert v0.mean_post == 350.0
    assert v0.mean_post_adj == (700 - theta * 400 + theta * xbar * 2) / 2
    v1 = out.iloc[1]
    assert v1.mean_post_adj == (1300 - theta * 600 + theta * xbar * 2) / 2
    # CUPED preserves the pooled mean: weighted avg of adjusted means
    pooled = (v0.mean_post_adj * v0.n_users
              + v1.mean_post_adj * v1.n_users) / n
    assert abs(pooled - sy / n) < 1e-9


def test_cuped_zero_variance_theta_null(ray_session):
    """All users share the same pre value -> var(x) = 0 -> θ NULL and
    adjusted means NULL (unadjusted contract)."""
    from fluent_server_ray.stages.features import cuped_adjusted_means

    rows = []
    for u in range(4):
        rows.append((u, "2024-01-10", 1.0))
        rows.append((u, "2024-01-20", float(u + 1)))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    out = cuped_adjusted_means(
        rd.from_pandas(df), split_date="2024-01-16").to_pandas()
    assert out.theta.isna().all() and out.mean_post_adj.isna().all()
    assert list(out.mean_post) == [200.0, 300.0]  # cents


def test_cuped_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (
        cuped_adjusted_means, cuped_adjusted_means_sql)

    rng = np.random.default_rng(11)
    n = 400
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 30 * 86400, n), unit="s")
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": ts,
        "value": rng.integers(-200, 20000, n) / 100.0,
    })
    df.loc[3, "value"] = None
    df.loc[9, "user_id"] = None
    out = cuped_adjusted_means(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, cuped_adjusted_means_sql())
    _cmp(out, duck)


# ------------------------------------------------ ORC round-trip

def test_orc_roundtrip_bit_exact(ray_session, tmp_path):
    """ORC keeps int64/double/string values bit-exact; timestamps read
    back at ns and re-cast to us via ts_cols (exact — values originate
    at us)."""
    from fluent_server_ray.sources.orc import read_orc_dir, write_orc_dir

    t = pa.table({
        "ts": pa.array([1_700_000_000_123_456, 1],
                       pa.timestamp("us")),
        "x": pa.array([0.1 + 0.2, 1e-300], pa.float64()),
        "s": pa.array(["héllo", None], pa.string()),
        "i": pa.array([2**62, -5], pa.int64()),
    })
    out = str(tmp_path / "orc")
    write_orc_dir(rd.from_arrow(t), out)
    back_parts = [b for b in read_orc_dir(out, ts_cols=("ts",))
                  .iter_batches(batch_size=None, batch_format="pyarrow")]
    back = pa.concat_tables(back_parts)
    back = back.select(t.column_names)
    assert back.schema.equals(t.schema)
    assert back.sort_by([("i", "ascending")]).equals(
        t.sort_by([("i", "ascending")]))
