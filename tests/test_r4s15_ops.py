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


# ------------------------------------------------ weekly periodogram

def test_periodogram_pure_weekly_signal(ray_session):
    """A daily series that IS cos(2πd/7) (scaled) concentrates power
    in harmonic 1: amplitude_1 recovers the wave's amplitude, and the
    exact spectral sums match a hand numpy computation."""
    from fluent_server_ray.stages.features import (
        _COS7_MILLIS, _SIN7_MILLIS, weekly_periodogram)

    days = np.arange(28)          # 4 full weeks starting at epoch day 0
    cents = np.array([10000 + 5000 * _COS7_MILLIS[d % 7] // 1000000
                      for d in days], dtype=np.int64)
    ts = pd.to_datetime(days * 86400, unit="s")
    df = pd.DataFrame({"event_type": "a", "ts": ts,
                       "value": cents / 100.0})
    out = weekly_periodogram(rd.from_pandas(df)).to_pandas()
    for m in (1, 2, 3):
        row = out[out.harmonic == m].iloc[0]
        k = (m * days) % 7
        sc = sum(int(c) * _COS7_MILLIS[kk] for c, kk in zip(cents, k))
        ss = sum(int(c) * _SIN7_MILLIS[kk] for c, kk in zip(cents, k))
        assert row.s_c == sc and row.s_s == ss
    # harmonic 1 dominates; amplitude ≈ the 5000-cent wave (50.0 units
    # in cents scale — amplitude is in cents here)
    a1 = out[out.harmonic == 1].iloc[0].amplitude
    a2 = out[out.harmonic == 2].iloc[0].amplitude
    assert a1 > 10 * max(a2, 1e-9)
    assert abs(a1 - 5000.0) / 5000.0 < 0.01


def test_periodogram_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (
        weekly_periodogram, weekly_periodogram_sql)

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 30 * 86400, n), unit="s"),
        "value": rng.integers(-100, 10000, n) / 100.0,
    })
    df.loc[0, "value"] = None
    out = weekly_periodogram(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, weekly_periodogram_sql())
    _cmp(out, duck)


# ------------------------------------------------ permutation test

def test_permutation_sign_test_brute_force(ray_session):
    """Recompute all 64 permuted statistics with a python loop from
    the same md5 bits; n_as_extreme and p must match exactly."""
    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.features import permutation_sign_test

    rng = np.random.default_rng(5)
    rows = []
    for u in range(30):
        for _ in range(rng.integers(1, 4)):
            rows.append((u, "click", rng.integers(1, 500) / 100.0))
        if rng.random() < 0.7:
            rows.append((u, "purchase", rng.integers(1, 900) / 100.0))
    rows.append((99, "view", 5.0))       # excluded type
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "value"])
    out = permutation_sign_test(rd.from_pandas(df)).to_pandas().iloc[0]

    d = {}
    for _, r in df.iterrows():
        if r.event_type == "click":
            d[r.user_id] = d.get(r.user_id, 0) + round(r.value * 100)
        elif r.event_type == "purchase":
            d[r.user_id] = d.get(r.user_id, 0) - round(r.value * 100)
    t_obs = sum(d.values())
    n_ext = 0
    for p in range(64):
        tp = sum((1 - 2 * ((md5_u64(f"pt:{u}") >> p) & 1)) * dv
                 for u, dv in d.items())
        if abs(tp) >= abs(t_obs):
            n_ext += 1
    assert out.n_users == len(d)
    assert out.t_obs_cents == t_obs
    assert out.n_as_extreme == n_ext
    assert out.p_value == (n_ext + 1) / 65.0


def test_permutation_sign_test_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (
        permutation_sign_test, permutation_sign_test_sql)

    rng = np.random.default_rng(17)
    n = 300
    df = pd.DataFrame({
        "user_id": rng.integers(0, 50, n),
        "event_type": rng.choice(["click", "purchase", "view"], n),
        "value": rng.integers(-100, 5000, n) / 100.0,
    })
    df.loc[2, "user_id"] = None
    out = permutation_sign_test(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, permutation_sign_test_sql())
    _cmp(out, duck)


# ------------------------------------------------ Wilson CI

def test_wilson_ci_hand_pin(ray_session):
    """k=3 of n=10 at threshold 50.00: classic Wilson numbers; also
    k=0 stays ≥ 0 and k=n stays ≤ 1 (the Wald interval wouldn't)."""
    from fluent_server_ray.stages.features import wilson_proportion_ci

    df = pd.DataFrame({
        "event_type": ["a"] * 10 + ["z"] * 3 + ["f"] * 2,
        "value": [60.0] * 3 + [10.0] * 7 + [0.5] * 3 + [99.0] * 2,
    })
    out = wilson_proportion_ci(rd.from_pandas(df)).to_pandas()
    a = out[out.event_type == "a"].iloc[0]
    assert a.n == 10 and a.k == 3 and a.phat == 0.3
    assert 0.10 < a.wilson_lo < 0.11 and 0.60 < a.wilson_hi < 0.61
    z = out[out.event_type == "z"].iloc[0]      # k = 0
    assert z.k == 0 and z.wilson_lo == 0.0 and z.wilson_hi > 0
    f = out[out.event_type == "f"].iloc[0]      # k = n
    assert f.k == 2 and f.wilson_hi < 1.0 + 1e-12 and f.wilson_lo < 1.0


def test_wilson_ci_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (
        wilson_proportion_ci, wilson_proportion_ci_sql)

    rng = np.random.default_rng(23)
    n = 400
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": rng.integers(0, 12000, n) / 100.0,
    })
    out = wilson_proportion_ci(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, wilson_proportion_ci_sql())
    _cmp(out, duck)


# ------------------------------------------------ OLS hour+dow

def test_ols_recovers_planted_coefficients(ray_session):
    """Noise-free y = 700 + 3·hour·100 + (-5)·dow·100 cents must be
    recovered exactly (integer design, exact Cramer solve)."""
    from fluent_server_ray.stages.features import ols_hour_dow

    rng = np.random.default_rng(2)
    secs = rng.integers(0, 30 * 86400, 500)
    us = secs.astype("int64") * 1_000_000
    h = (us // 3_600_000_000) % 24
    w = (us // 86_400_000_000) % 7
    cents = 700 + 300 * h - 500 * w
    df = pd.DataFrame({"ts": pd.to_datetime(us, unit="us"),
                       "value": cents / 100.0})
    out = ols_hour_dow(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out.n == 500
    assert abs(out.beta0 - 700.0) < 1e-6
    assert abs(out.beta_hour - 300.0) < 1e-8
    assert abs(out.beta_dow - (-500.0)) < 1e-8


def test_ols_singular_design_null(ray_session):
    """All rows in one hour of one day -> collinear design -> NULLs."""
    from fluent_server_ray.stages.features import ols_hour_dow

    df = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 05:10:00"] * 5),
        "value": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    out = ols_hour_dow(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out.n == 5 and pd.isna(out.beta0)


def test_ols_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (ols_hour_dow,
                                                   ols_hour_dow_sql)

    rng = np.random.default_rng(31)
    n = 600
    df = pd.DataFrame({
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 30 * 86400, n), unit="s"),
        "value": rng.integers(-300, 20000, n) / 100.0,
    })
    df.loc[4, "ts"] = None
    out = ols_hour_dow(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, ols_hour_dow_sql())
    _cmp(out, duck)


# ------------------------------------------------ clamped balance

def test_clamped_balance_brute_force(ray_session):
    """Per-user sequential max(0, b+d) replay must equal the max-plus
    identity output, including clamp counts."""
    from fluent_server_ray.stages.windows import clamped_balance

    rng = np.random.default_rng(13)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, n),
        "event_id": np.arange(n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 86400, n), unit="s"),
        "event_type": rng.choice(["purchase", "click", "view"], n),
        "value": rng.integers(1, 5000, n) / 100.0,
    })
    out = clamped_balance(rd.from_pandas(df)).to_pandas() \
        .set_index("user_id").sort_index()

    sub = df[df.event_type.isin(["purchase", "click"])].copy()
    sub["cents"] = (sub.value * 100).round().astype("int64")
    sub["d"] = np.where(sub.event_type == "purchase",
                        sub.cents, -sub.cents)
    for u, g in sub.sort_values(["ts", "event_id"]).groupby("user_id"):
        b, clamps, mins, s = 0, 0, 0, 0
        for d in g["d"]:
            if b + d < 0:
                clamps += 1
            b = max(0, b + d)
            s += d
            mins = min(mins, s)
        row = out.loc[u]
        assert row.final_balance_cents == b, u
        assert row.clamp_count == clamps, u
        assert row.n_events == len(g), u


def test_clamped_balance_duckdb_parity(ray_session):
    from fluent_server_ray.stages.windows import (clamped_balance,
                                                  clamped_balance_sql)

    rng = np.random.default_rng(41)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 30, n),
        "event_id": np.arange(n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 7 * 86400, n), unit="s"),
        "event_type": rng.choice(["purchase", "click", "view"], n),
        "value": rng.integers(1, 9000, n) / 100.0,
    })
    out = clamped_balance(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, clamped_balance_sql())
    _cmp(out, duck)


# ------------------------------------------------ OHLC bars

def test_ohlc_hand_pin(ray_session):
    """One group, one day, known order: open/close follow (ts, id)
    tie-break including equal timestamps."""
    from fluent_server_ray.stages.windows import ohlc_daily_bars

    ts = pd.to_datetime(["2024-01-01 01:00", "2024-01-01 01:00",
                         "2024-01-01 02:00", "2024-01-01 00:30"])
    df = pd.DataFrame({
        "event_type": ["a"] * 4,
        "ts": ts,
        "event_id": [7, 3, 1, 9],
        "value": [5.00, 1.00, 2.50, 4.00],
    })
    out = ohlc_daily_bars(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out.open_cents == 400          # 00:30 first
    assert out.close_cents == 250         # 02:00 last
    # equal-ts pair orders by event_id: id 3 (100) before id 7 (500)
    assert out.low_cents == 100 and out.high_cents == 500
    assert out.n == 4


def test_ohlc_multiblock_merge(ray_session):
    """Force many blocks so the driver merge re-picks open/close
    across block partials; compare against a single-frame pandas
    reference."""
    from fluent_server_ray.stages.windows import ohlc_daily_bars

    rng = np.random.default_rng(19)
    n = 600
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 5 * 86400, n), unit="s"),
        "event_id": np.arange(n),
        "value": rng.integers(1, 10000, n) / 100.0,
    })
    ds = rd.from_pandas(df).repartition(16)
    out = ohlc_daily_bars(ds).to_pandas()

    ref = df.copy()
    ref["cents"] = (ref.value * 100).round().astype("int64")
    ref["day"] = (ref.ts.astype("int64") // (86400 * 10**9))
    ref = ref.sort_values(["event_type", "day", "ts", "event_id"])
    g = ref.groupby(["event_type", "day"])
    exp = pd.DataFrame({
        "open_cents": g["cents"].first(),
        "high_cents": g["cents"].max(),
        "low_cents": g["cents"].min(),
        "close_cents": g["cents"].last(),
        "n": g["cents"].size().astype("int64"),
    }).reset_index()
    _cmp(out, exp.rename(columns={"day": "day"}))


def test_ohlc_duckdb_parity(ray_session):
    from fluent_server_ray.stages.windows import (ohlc_daily_bars,
                                                  ohlc_daily_bars_sql)

    rng = np.random.default_rng(29)
    n = 400
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y", "z"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 4 * 86400, n), unit="s"),
        "event_id": np.arange(n),
        "value": rng.integers(-500, 10000, n) / 100.0,
    })
    out = ohlc_daily_bars(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, ohlc_daily_bars_sql())
    _cmp(out, duck)


# ------------------------------------------------ Cochran's Q

def test_cochran_q_hand_pin(ray_session):
    """Textbook layout: 4 users with known success patterns across
    3 treatments; Q from the reduced integer formula."""
    from fluent_server_ray.stages.features import cochran_q

    # user: (view, click, purchase)
    patterns = {0: (1, 1, 0), 1: (1, 0, 0), 2: (1, 1, 1), 3: (0, 1, 0)}
    rows = []
    for u, (v, c, p) in patterns.items():
        if v:
            rows.append((u, "view"))
        if c:
            rows.append((u, "click"))
        if p:
            rows.append((u, "purchase"))
        rows.append((u, "error"))          # excluded type
    df = pd.DataFrame(rows, columns=["user_id", "event_type"])
    out = cochran_q(rd.from_pandas(df)).to_pandas().iloc[0]
    cs = [3, 3, 1]
    rs = [2, 1, 3, 1]
    N = sum(cs)
    num = 2 * (3 * sum(c * c for c in cs) - N * N)
    den = 3 * N - sum(r * r for r in rs)
    assert out.n_users == 4
    assert [out.c_view, out.c_click, out.c_purchase] == cs
    assert out.q_num == num and out.q_den == den
    assert out.q_stat == num / den


def test_cochran_q_degenerate_denominator(ray_session):
    """Every user succeeds at every treatment -> q_den = 0 -> NULL."""
    from fluent_server_ray.stages.features import cochran_q

    rows = [(u, t) for u in range(3)
            for t in ("view", "click", "purchase")]
    df = pd.DataFrame(rows, columns=["user_id", "event_type"])
    out = cochran_q(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out.q_den == 0 and pd.isna(out.q_stat)


def test_cochran_q_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import cochran_q, cochran_q_sql

    rng = np.random.default_rng(37)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 60, n),
        "event_type": rng.choice(
            ["view", "click", "purchase", "error"], n),
    })
    out = cochran_q(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, cochran_q_sql())
    _cmp(out, duck)


# ------------------------------------------------ daily motif

def test_daily_motif_planted_pair(ray_session):
    """Plant an identical week at positions 2 and 14 in an otherwise
    noisy series: the motif must find exactly that pair with SSD 0."""
    from fluent_server_ray.stages.features import daily_motif

    rng = np.random.default_rng(9)
    cents = rng.integers(100, 100000, 24).astype("int64")
    week = rng.integers(100, 100000, 7).astype("int64")
    cents[2:9] = week
    cents[14:21] = week
    ts = pd.to_datetime(np.arange(24) * 86400 + 1_700_000_000,
                        unit="s")
    df = pd.DataFrame({"event_type": "a", "ts": ts,
                       "value": cents / 100.0})
    out = daily_motif(rd.from_pandas(df)).to_pandas().iloc[0]
    assert (out.i, out.j, out.ssd) == (2, 14, 0)
    assert out.n_days == 24


def test_daily_motif_short_series_absent(ray_session):
    from fluent_server_ray.stages.features import daily_motif

    ts = pd.to_datetime(np.arange(13) * 86400, unit="s")
    df = pd.DataFrame({"event_type": "a", "ts": ts,
                       "value": np.ones(13)})
    out = daily_motif(rd.from_pandas(df)).to_pandas()
    assert len(out) == 0          # needs >= 2w = 14 observed days


def test_daily_motif_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (daily_motif,
                                                   daily_motif_sql)

    rng = np.random.default_rng(43)
    n = 800
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 25 * 86400, n), unit="s"),
        "value": rng.integers(-100, 9000, n) / 100.0,
    })
    out = daily_motif(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, daily_motif_sql())
    _cmp(out, duck)


# ------------------------------------------------ Allan variance

def test_allan_white_noise_scaling_and_pin(ray_session):
    """Hand series 1,3,2,4 (cents 100,300,200,400): τ=1 num =
    (2²+(-1)²+2²)·100² = 90000, τ=2 blocks (400, 600) → num = 40000."""
    from fluent_server_ray.stages.features import allan_variance

    ts = pd.to_datetime(np.arange(4) * 86400, unit="s")
    df = pd.DataFrame({"event_type": "a", "ts": ts,
                       "value": [1.0, 3.0, 2.0, 4.0]})
    out = allan_variance(rd.from_pandas(df)).to_pandas()
    t1 = out[out.tau == 1].iloc[0]
    assert t1.n_blocks == 4 and t1.avar_num == 90000
    assert t1.avar == 90000 / (2 * 3 * 1 * 1)
    t2 = out[out.tau == 2].iloc[0]
    assert t2.n_blocks == 2 and t2.avar_num == 40000
    assert t2.avar == 40000 / (2 * 1 * 2 * 2)
    assert (out.tau == 4).sum() == 0      # K < 2 at τ=4


def test_allan_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (allan_variance,
                                                   allan_variance_sql)

    rng = np.random.default_rng(47)
    n = 700
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y", "z"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 30 * 86400, n), unit="s"),
        "value": rng.integers(-200, 8000, n) / 100.0,
    })
    out = allan_variance(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, allan_variance_sql())
    _cmp(out, duck)


# ------------------------------------------------ Haar energy

def test_haar_energy_hand_pin(ray_session):
    """Series cents (100,300,200,200,500): level 1 pairs (100,300),
    (200,200) -> energy 40000, leftover 500 dropped; level 2 pairs
    (400,400) -> energy 0."""
    from fluent_server_ray.stages.features import haar_energy

    ts = pd.to_datetime(np.arange(5) * 86400, unit="s")
    df = pd.DataFrame({"event_type": "a", "ts": ts,
                       "value": [1.0, 3.0, 2.0, 2.0, 5.0]})
    out = haar_energy(rd.from_pandas(df)).to_pandas()
    l1 = out[out.level == 1].iloc[0]
    assert l1.n_pairs == 2 and l1.energy == 40000
    l2 = out[out.level == 2].iloc[0]
    assert l2.n_pairs == 1 and l2.energy == 0
    assert len(out) == 2          # level 3 has no complete pair


def test_haar_total_energy_conservation(ray_session):
    """Parseval for the unnormalized pyramid: Σ_ℓ energy_ℓ / 2^ℓ +
    (top sums' energy) / 2^L = Σ x² when n is a power of two."""
    from fluent_server_ray.stages.features import haar_energy

    rng = np.random.default_rng(3)
    cents = rng.integers(1, 1000, 16).astype("int64")
    ts = pd.to_datetime(np.arange(16) * 86400, unit="s")
    df = pd.DataFrame({"event_type": "a", "ts": ts,
                       "value": cents / 100.0})
    out = haar_energy(rd.from_pandas(df)).to_pandas()
    assert list(out.level) == [1, 2, 3, 4]
    # reconstruct the top-level sum to close the Parseval identity
    tops = cents.copy()
    for _ in range(4):
        tops = tops[0::2] + tops[1::2]
    total = sum(e / 2 ** l for l, e in zip(out.level, out.energy))
    total += float(tops[0] ** 2) / 2 ** 4
    assert abs(total - float((cents ** 2).sum())) < 1e-6


def test_haar_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (haar_energy,
                                                   haar_energy_sql)

    rng = np.random.default_rng(53)
    n = 600
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 29 * 86400, n), unit="s"),
        "value": rng.integers(-100, 7000, n) / 100.0,
    })
    out = haar_energy(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, haar_energy_sql())
    _cmp(out, duck)


# ------------------------------------------------ pairwise perm BH

def test_pairwise_bh_brute_force(ray_session):
    """Recompute every pair's statistic and the BH step-up in plain
    python from the same md5 bits; the reject set must match."""
    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.features import pairwise_permutation_bh

    rng = np.random.default_rng(61)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "event_type": rng.choice(["click", "purchase", "view"], n),
        # big asymmetry so at least one pair rejects
        "value": np.where(
            rng.choice(["click", "purchase", "view"], n) == "click",
            rng.integers(4000, 9000, n),
            rng.integers(1, 50, n)) / 100.0,
    })
    out = (pairwise_permutation_bh(rd.from_pandas(df)).to_pandas()
           .set_index(["type_a", "type_b"]).sort_index())

    cents = (df.value * 100).round().astype("int64")
    types = sorted(df.event_type.unique())
    recs = {}
    for ai in range(len(types)):
        for bi in range(ai + 1, len(types)):
            ta, tb = types[ai], types[bi]
            d = {}
            for u, ty, c in zip(df.user_id, df.event_type, cents):
                if ty == ta:
                    d[u] = d.get(u, 0) + int(c)
                elif ty == tb:
                    d[u] = d.get(u, 0) - int(c)
            tobs = sum(d.values())
            ne = 0
            for p in range(64):
                tp = sum(
                    (1 - 2 * ((md5_u64(f"pt2:{ta}:{tb}:{u}") >> p) & 1))
                    * dv for u, dv in d.items())
                if abs(tp) >= abs(tobs):
                    ne += 1
            recs[(ta, tb)] = (len(d), tobs, ne)
    m = len(recs)
    order = sorted(recs, key=lambda k: (recs[k][2], k))
    ne_star = None
    for r, key in enumerate(order, start=1):
        if (recs[key][2] + 1) * 1000 * m <= r * 65 * 50:
            ne_star = recs[key][2]
    for key, (nu, tobs, ne) in recs.items():
        row = out.loc[key]
        assert row.n_users == nu and row.t_obs_cents == tobs
        assert row.n_as_extreme == ne
        assert row.bh_reject == (ne_star is not None and ne <= ne_star)


def test_pairwise_bh_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (
        pairwise_permutation_bh, pairwise_permutation_bh_sql)

    rng = np.random.default_rng(67)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 50, n),
        "event_type": rng.choice(
            ["click", "purchase", "view", "error"], n),
        "value": rng.integers(-100, 9000, n) / 100.0,
    })
    df.loc[1, "value"] = None
    out = pairwise_permutation_bh(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, pairwise_permutation_bh_sql())
    _cmp(out, duck)


# ------------------------------------------------ CDC apply

def test_cdc_apply_sequential_replay(ray_session):
    """Brute-force per-user dict replay (insert/update/delete with
    existence checks) must match the vectorized boundary-segment
    output exactly."""
    from fluent_server_ray.stages.windows import cdc_apply

    rng = np.random.default_rng(71)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 25, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 86400, n), unit="s"),
        "event_id": np.arange(n),
        "event_type": rng.choice(
            ["signup", "click", "error", "view"], n,
            p=[0.2, 0.5, 0.2, 0.1]),
        "value": rng.integers(1, 10000, n) / 100.0,
    })
    out = cdc_apply(rd.from_pandas(df)).to_pandas() \
        .set_index("user_id").sort_index()

    state, stats = {}, {}
    sub = df[df.event_type.isin(["signup", "click", "error"])]
    for _, r in sub.sort_values(["ts", "event_id"]).iterrows():
        u, c = r.user_id, round(r.value * 100)
        st = stats.setdefault(u, dict(n_ops=0, n_ins=0,
                                      n_upd_applied=0,
                                      n_upd_skipped=0, n_del=0))
        st["n_ops"] += 1
        if r.event_type == "signup":
            state[u] = c
            st["n_ins"] += 1
        elif r.event_type == "click":
            if u in state:
                state[u] = c
                st["n_upd_applied"] += 1
            else:
                st["n_upd_skipped"] += 1
        else:
            state.pop(u, None)
            st["n_del"] += 1
    assert set(out.index) == set(state)
    for u, c in state.items():
        row = out.loc[u]
        assert row.final_value_cents == c, u
        for k, v in stats[u].items():
            assert row[k] == v, (u, k)


def test_cdc_apply_duckdb_parity(ray_session):
    from fluent_server_ray.stages.windows import cdc_apply, cdc_apply_sql

    rng = np.random.default_rng(73)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 5 * 86400, n), unit="s"),
        "event_id": np.arange(n),
        "event_type": rng.choice(["signup", "click", "error"], n),
        "value": rng.integers(1, 8000, n) / 100.0,
    })
    out = cdc_apply(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, cdc_apply_sql())
    _cmp(out, duck)


# ------------------------------------------------ sentence stats

def test_sentence_stats_hand_pin(ray_session):
    from fluent_server_ray.stages.textstats import sentence_stats

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["One. Two words! Three?? Done",
                 "No terminator here",
                 "!. . "],
    })
    out = (sentence_stats(rd.from_pandas(df)).to_pandas()
           .set_index("doc_id").sort_index())
    r1 = out.loc[1]
    # split CONSUMES the terminator run: "One"|"Two words"|"Three"|"Done"
    assert r1.n_sentences == 4
    assert r1.max_sentence_chars == 9 and r1.min_sentence_chars == 3
    assert r1.total_sentence_chars == 3 + 9 + 5 + 4
    assert out.loc[2].n_sentences == 1
    r3 = out.loc[3]                     # terminators only -> no segments
    assert r3.n_sentences == 0 and r3.total_sentence_chars == 0
    assert pd.isna(r3.max_sentence_chars)


def test_sentence_stats_duckdb_parity(ray_session):
    from fluent_server_ray.stages.textstats import (sentence_stats,
                                                    sentence_stats_sql)

    rng = np.random.default_rng(79)
    words = ["alpha", "beta", "gamma!", "delta.", "eps?"]
    texts = [" ".join(rng.choice(words, rng.integers(1, 30)))
             for _ in range(200)]
    df = pd.DataFrame({"doc_id": range(200), "text": texts})
    out = sentence_stats(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, sentence_stats_sql(), view="documents")
    _cmp(out, duck)


# ------------------------------------------------ FIFO allocation

def test_fifo_allocation_hand_pin(ray_session):
    """User 1: lots 300, 500, 200; demand 600 -> lot1 full, lot2
    partial 300, lot3 untouched. User 2: demand only."""
    from fluent_server_ray.stages.windows import fifo_allocation

    rows = [
        (1, "2024-01-01 00:00", 0, "purchase", 3.00),
        (1, "2024-01-01 01:00", 1, "purchase", 5.00),
        (1, "2024-01-01 02:00", 2, "purchase", 2.00),
        (1, "2024-01-01 03:00", 3, "click", 6.00),
        (2, "2024-01-01 00:00", 4, "click", 1.00),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "event_type", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    out = fifo_allocation(rd.from_pandas(df)).to_pandas() \
        .set_index("user_id").sort_index()
    u1 = out.loc[1]
    assert u1.n_lots == 3 and u1.supply_cents == 1000
    assert u1.demand_cents == 600 and u1.matched_cents == 600
    assert u1.n_lots_full == 1 and u1.partial_lot_cents == 300
    u2 = out.loc[2]
    assert u2.n_lots == 0 and u2.demand_cents == 100
    assert u2.matched_cents == 0 and u2.partial_lot_cents == 0


def test_fifo_allocation_duckdb_parity(ray_session):
    from fluent_server_ray.stages.windows import (fifo_allocation,
                                                  fifo_allocation_sql)

    rng = np.random.default_rng(83)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 30, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 3 * 86400, n), unit="s"),
        "event_id": np.arange(n),
        "event_type": rng.choice(["purchase", "click", "view"], n),
        "value": rng.integers(-100, 6000, n) / 100.0,
    })
    out = fifo_allocation(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, fifo_allocation_sql())
    _cmp(out, duck)


# ------------------------------------------------ DiD

def test_did_hand_pin(ray_session):
    """Control (+100 pre->post), treatment (+300 pre->post):
    DiD = +200 cents exactly."""
    from fluent_server_ray.stages.features import did_estimate

    rows = []
    # users 0,2 control; 1,3 treatment
    for u, (pre, post) in {0: (100, 200), 2: (300, 400),
                           1: (100, 400), 3: (500, 800)}.items():
        rows.append((u, "2024-01-10", pre / 100.0))
        rows.append((u, "2024-01-20", post / 100.0))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    out = did_estimate(rd.from_pandas(df),
                       split_date="2024-01-16").to_pandas()
    assert len(out) == 4 and (out.did == 200.0).all()
    cell = out.set_index(["variant", "period"])
    assert cell.loc[(0, 0)].mean_cents == 200.0
    assert cell.loc[(1, 1)].mean_cents == 600.0


def test_did_empty_cell_null(ray_session):
    """No treatment users in the pre period -> DiD NULL."""
    from fluent_server_ray.stages.features import did_estimate

    rows = [(0, "2024-01-10", 1.0), (0, "2024-01-20", 2.0),
            (1, "2024-01-20", 3.0)]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    out = did_estimate(rd.from_pandas(df),
                       split_date="2024-01-16").to_pandas()
    assert out.did.isna().all()


def test_did_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (did_estimate,
                                                   did_estimate_sql)

    rng = np.random.default_rng(89)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 60, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 30 * 86400, n), unit="s"),
        "value": rng.integers(-100, 9000, n) / 100.0,
    })
    out = did_estimate(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, did_estimate_sql())
    _cmp(out, duck)


# ------------------------------------------------ Hodges-Lehmann

def test_hodges_lehmann_brute_force(ray_session):
    """Walsh-average median recomputed with a python double loop."""
    from fluent_server_ray.stages.features import hodges_lehmann

    rng = np.random.default_rng(97)
    n_days = 9
    cents = rng.integers(100, 100000, n_days)
    ts = pd.to_datetime(np.arange(n_days) * 86400, unit="s")
    df = pd.DataFrame({"event_type": "a", "ts": ts,
                       "value": cents / 100.0})
    out = hodges_lehmann(rd.from_pandas(df)).to_pandas().iloc[0]
    sums = sorted(int(cents[i]) + int(cents[j])
                  for i in range(n_days) for j in range(i, n_days))
    m = len(sums)
    lo, hi = sums[(m + 1) // 2 - 1], sums[m // 2]
    assert out.n_pairs == m and out.hl2_lo == lo and out.hl2_hi == hi
    assert out.hl == (lo + hi) / 4.0
    # single-day group degenerates to the value itself
    df1 = pd.DataFrame({"event_type": "b",
                        "ts": pd.to_datetime(["2024-01-01"]),
                        "value": [7.0]})
    r = hodges_lehmann(rd.from_pandas(df1)).to_pandas().iloc[0]
    assert r.hl == 700.0 and r.n_pairs == 1


def test_hodges_lehmann_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (hodges_lehmann,
                                                   hodges_lehmann_sql)

    rng = np.random.default_rng(101)
    n = 600
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y", "z"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 28 * 86400, n), unit="s"),
        "value": rng.integers(-100, 8000, n) / 100.0,
    })
    out = hodges_lehmann(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, hodges_lehmann_sql())
    _cmp(out, duck)


# ------------------------------------------------ capture-recapture

def test_capture_recapture_hand_pin(ray_session):
    """Week 1 users {0,1,2,3}, week 2 users {2,3,4}: n1=4, n2=3, m=2,
    Chapman = 5*4/3 - 1."""
    from fluent_server_ray.stages.features import capture_recapture

    rows = []
    for u in (0, 1, 2, 3):
        rows.append((u, "2024-01-01"))        # epoch week w
    for u in (2, 3, 4):
        rows.append((u, "2024-01-09"))        # next epoch week
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["ts"] = pd.to_datetime(df["ts"])
    out = capture_recapture(rd.from_pandas(df)).to_pandas().iloc[0]
    assert (out.n1, out.n2, out.m) == (4, 3, 2)
    assert out.n_chapman == float(5 * 4) / 3.0 - 1.0


def test_capture_recapture_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (capture_recapture,
                                                   capture_recapture_sql)

    rng = np.random.default_rng(103)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 80, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 21 * 86400, n), unit="s"),
    })
    out = capture_recapture(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, capture_recapture_sql())
    _cmp(out, duck)


# ------------------------------------------------ record days

def test_record_days_hand_pin(ray_session):
    """Daily cents 300,100,400,400,500: records at days 0,2,4 (ties
    are NOT records)."""
    from fluent_server_ray.stages.features import record_days

    cents = [300, 100, 400, 400, 500]
    ts = pd.to_datetime(np.arange(5) * 86400, unit="s")
    df = pd.DataFrame({"event_type": "a", "ts": ts,
                       "value": np.array(cents) / 100.0})
    out = record_days(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out.n_records == 3
    assert out.last_record_day == 4 and out.max_cents == 500


def test_record_days_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (record_days,
                                                   record_days_sql)

    rng = np.random.default_rng(107)
    n = 500
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 30 * 86400, n), unit="s"),
        "value": rng.integers(-100, 9000, n) / 100.0,
    })
    out = record_days(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, record_days_sql())
    _cmp(out, duck)


# ------------------------------------------------ extractive summary

def test_extractive_summary_picks_rare_sentence(ray_session):
    """Corpus where 'zebra quagga' appears once: the sentence holding
    the rare terms outscores the boilerplate sentence repeated in
    every doc."""
    from fluent_server_ray.stages.textstats import extractive_summary

    boiler = "the cat sat"
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"{boiler}. zebra quagga here. {boiler}",
                 f"{boiler}. {boiler}",
                 f"{boiler}"],
    })
    out = (extractive_summary(rd.from_pandas(df)).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[1].best_idx == 2
    assert out.loc[1].best_sentence == "zebra quagga here"
    assert out.loc[1].n_sentences == 3
    # all-boilerplate doc: tie on score -> earliest sentence
    assert out.loc[2].best_idx == 1


def test_extractive_summary_duckdb_parity(ray_session):
    from fluent_server_ray.stages.textstats import (
        extractive_summary, extractive_summary_sql)

    rng = np.random.default_rng(109)
    words = ["alpha", "beta", "gamma", "delta", "rare1", "rare2"]
    texts = []
    for i in range(150):
        sents = [" ".join(rng.choice(words[:4], rng.integers(1, 6)))
                 for _ in range(rng.integers(1, 5))]
        if i % 17 == 0:
            sents.append("rare1 rare2")
        texts.append(". ".join(sents))
    df = pd.DataFrame({"doc_id": range(150), "text": texts})
    df.loc[3, "text"] = None
    out = extractive_summary(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, extractive_summary_sql(), view="documents")
    _cmp(out, duck)


# ------------------------------------------------ charset profile

def test_charset_profile_hand_pin(ray_session):
    from fluent_server_ray.stages.textstats import charset_profile

    df = pd.DataFrame({"doc_id": [1],
                       "text": ["Ab1 ?\txZ\n9é€"]})
    out = charset_profile(rd.from_pandas(df)).to_pandas().iloc[0]
    # chars: A b 1 SP ? TAB x Z NL 9 é €  -> 12
    assert out.n_chars == 12
    assert out.n_alpha == 4          # A b x Z
    assert out.n_digit == 2          # 1 9
    assert out.n_space == 3          # SP TAB NL
    assert out.n_punct == 1          # ?
    assert out.n_other == 2          # é €


def test_charset_profile_duckdb_parity(ray_session):
    from fluent_server_ray.stages.textstats import (charset_profile,
                                                    charset_profile_sql)

    rng = np.random.default_rng(113)
    pool = list("abcXYZ019 \t\n.!?-_éß日本")
    texts = ["".join(rng.choice(pool, rng.integers(0, 60)))
             for _ in range(200)]
    df = pd.DataFrame({"doc_id": range(200), "text": texts})
    out = charset_profile(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, charset_profile_sql(), view="documents")
    _cmp(out, duck)


# ------------------------------------------------ Merkle fingerprint

def test_merkle_fingerprint_localizes_change(ray_session):
    """Same table -> identical digests everywhere; flip ONE row's
    value -> the root and EXACTLY ONE leaf change."""
    from fluent_server_ray.stages.profile import merkle_fingerprint

    rng = np.random.default_rng(127)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "event_type": rng.choice(["a", "b"], n),
        "value": rng.integers(1, 9000, n) / 100.0,
    })
    f1 = merkle_fingerprint(rd.from_pandas(df)).to_pandas() \
        .set_index("bucket")
    f1b = merkle_fingerprint(rd.from_pandas(df).repartition(7)) \
        .to_pandas().set_index("bucket")
    pd.testing.assert_frame_equal(f1, f1b)   # block-layout-proof

    df2 = df.copy()
    df2.loc[42, "value"] += 0.01
    f2 = merkle_fingerprint(rd.from_pandas(df2)).to_pandas() \
        .set_index("bucket")
    diff = f1["digest"] != f2["digest"]
    assert diff.loc[-1]                      # root changed
    assert diff.drop(index=-1).sum() == 1    # exactly one leaf


def test_merkle_fingerprint_duckdb_parity(ray_session):
    from fluent_server_ray.stages.profile import (merkle_fingerprint,
                                                  merkle_fingerprint_sql)

    rng = np.random.default_rng(131)
    n = 400
    df = pd.DataFrame({
        "event_id": rng.permutation(10000)[:n],
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": rng.integers(-100, 9000, n) / 100.0,
    })
    df.loc[5, "value"] = None
    out = merkle_fingerprint(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, merkle_fingerprint_sql())
    _cmp(out, duck)


# ------------------------------------------------ Yule's K

def test_yules_k_hand_pin(ray_session):
    """'a a a b b c' : V_1=1, V_2=1, V_3=1, N=6 ->
    S = 1+4+9 = 14, K = 10^4 * (14-6)/36."""
    from fluent_server_ray.stages.textstats import yules_k

    df = pd.DataFrame({"source": ["s", "s"],
                       "text": ["a a a b", "b c"]})
    out = yules_k(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out.n_tokens == 6 and out.n_types == 3
    assert out.s_m2vm == 14
    assert out.yules_k == 10000.0 * 8.0 / 36.0


def test_yules_k_duckdb_parity(ray_session):
    from fluent_server_ray.stages.textstats import yules_k, yules_k_sql

    rng = np.random.default_rng(137)
    words = [f"w{i}" for i in range(40)]
    df = pd.DataFrame({
        "source": rng.choice(["s1", "s2"], 200),
        "text": [" ".join(rng.choice(words, rng.integers(1, 30)))
                 for _ in range(200)],
    })
    out = yules_k(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, yules_k_sql(), view="documents")
    _cmp(out, duck)


# ------------------------------------------------ Kendall's W

def test_kendalls_w_perfect_concordance(ray_session):
    """Two weeks with the SAME type ordering -> W = 1; reversing one
    week's ordering with n=2, m=2 -> W = 0."""
    from fluent_server_ray.stages.features import kendalls_w

    rows = []
    for wk_day, vals in ((0, {"a": 1.0, "b": 2.0, "c": 3.0}),
                         (7, {"a": 10.0, "b": 20.0, "c": 30.0})):
        for ty, v in vals.items():
            rows.append((pd.Timestamp("1970-01-01")
                         + pd.Timedelta(days=wk_day), ty, v))
    df = pd.DataFrame(rows, columns=["ts", "event_type", "value"])
    out = kendalls_w(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out.n_weeks == 2 and out.n_items == 3
    assert out.kendalls_w == 1.0

    rows2 = [(pd.Timestamp("1970-01-01"), "a", 1.0),
             (pd.Timestamp("1970-01-01"), "b", 2.0),
             (pd.Timestamp("1970-01-08"), "a", 2.0),
             (pd.Timestamp("1970-01-08"), "b", 1.0)]
    df2 = pd.DataFrame(rows2, columns=["ts", "event_type", "value"])
    out2 = kendalls_w(rd.from_pandas(df2)).to_pandas().iloc[0]
    assert out2.kendalls_w == 0.0


def test_kendalls_w_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (kendalls_w,
                                                   kendalls_w_sql)

    rng = np.random.default_rng(139)
    n = 600
    df = pd.DataFrame({
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 28 * 86400, n), unit="s"),
        "event_type": rng.choice(["a", "b", "c", "d"], n),
        "value": rng.integers(-100, 9000, n) / 100.0,
    })
    out = kendalls_w(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, kendalls_w_sql())
    _cmp(out, duck)


# ------------------------------------------------ hash collisions

def test_hash_collision_audit_brute_force(ray_session):
    """Tiny slot space (bits=3) forces collisions; recount in
    python from the same md5 stream."""
    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.features import hash_collision_audit

    users = list(range(30))
    df = pd.DataFrame({"user_id": users * 3})
    out = hash_collision_audit(rd.from_pandas(df),
                               bits=3).to_pandas().iloc[0]
    from collections import Counter
    cnt = Counter(md5_u64(f"sk:{u}") % 8 for u in users)
    assert out.n_keys == 30
    assert out.n_slots_used == len(cnt)
    assert out.n_colliding_slots == sum(1 for c in cnt.values()
                                        if c > 1)
    assert out.n_excess_keys == sum(c - 1 for c in cnt.values()
                                    if c > 1)


def test_hash_collision_audit_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (
        hash_collision_audit, hash_collision_audit_sql)

    rng = np.random.default_rng(149)
    df = pd.DataFrame({"user_id": rng.integers(0, 500, 800)})
    out = hash_collision_audit(rd.from_pandas(df), bits=6).to_pandas()
    duck = _duck_one(df, hash_collision_audit_sql(bits=6))
    _cmp(out, duck)


# ------------------------------------------------ LIS / LDS

def test_daily_lis_hand_pin(ray_session):
    """Series 1,3,2,4,0 (cents): LIS = 3 (1,3,4 or 1,2,4),
    LDS = 3 (3,2,0)."""
    from fluent_server_ray.stages.features import daily_lis

    cents = [100, 300, 200, 400, 0]
    ts = pd.to_datetime(np.arange(5) * 86400, unit="s")
    df = pd.DataFrame({"event_type": "a", "ts": ts,
                       "value": np.array(cents) / 100.0})
    out = daily_lis(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out.n_days == 5 and out.lis == 3 and out.lds == 3
    # monotone series: lis = n, lds = 1
    df2 = pd.DataFrame({"event_type": "b", "ts": ts,
                        "value": [1.0, 2.0, 3.0, 4.0, 5.0]})
    out2 = daily_lis(rd.from_pandas(df2)).to_pandas().iloc[0]
    assert out2.lis == 5 and out2.lds == 1


def test_daily_lis_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import daily_lis, daily_lis_sql

    rng = np.random.default_rng(151)
    n = 500
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 25 * 86400, n), unit="s"),
        "value": rng.integers(-100, 9000, n) / 100.0,
    })
    out = daily_lis(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, daily_lis_sql())
    _cmp(out, duck)


# ------------------------------------------------ cohort LTV

def test_cohort_ltv_hand_pin(ray_session):
    """Two users in cohort week W (one never purchases — dilutes
    LTV), one user a week later."""
    from fluent_server_ray.stages.windows import cohort_ltv

    rows = [
        (1, "1970-01-01", "purchase", 2.00),   # u1 cohort wk0
        (1, "1970-01-09", "purchase", 3.00),   # age 1
        (2, "1970-01-02", "click", 9.00),      # u2 cohort wk0, no rev
        (3, "1970-01-09", "purchase", 5.00),   # u3 cohort wk1
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                     "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    out = cohort_ltv(rd.from_pandas(df)).to_pandas() \
        .set_index(["cohort_week", "age_weeks"]).sort_index()
    c0a0 = out.loc[(0, 0)]
    assert c0a0.n_users == 2 and c0a0.revenue_cents == 200
    assert c0a0.ltv_per_user == 100.0
    c0a1 = out.loc[(0, 1)]
    assert c0a1.revenue_cents == 300
    assert c0a1.cum_revenue_cents == 500
    assert c0a1.ltv_per_user == 250.0
    c1a0 = out.loc[(1, 0)]
    assert c1a0.n_users == 1 and c1a0.ltv_per_user == 500.0


def test_cohort_ltv_duckdb_parity(ray_session):
    from fluent_server_ray.stages.windows import cohort_ltv, cohort_ltv_sql

    rng = np.random.default_rng(157)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 50, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 28 * 86400, n), unit="s"),
        "event_type": rng.choice(["purchase", "click", "view"], n),
        "value": rng.integers(1, 9000, n) / 100.0,
    })
    out = cohort_ltv(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, cohort_ltv_sql())
    _cmp(out, duck)


# ------------------------------------------------ word dropout

def test_word_dropout_brute_force(ray_session):
    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.hygiene import word_dropout

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta gamma delta epsilon zeta",
                 "solo",
                 "   "],
    })
    out = (word_dropout(rd.from_pandas(df), p_millis=300).to_pandas()
           .set_index("doc_id").sort_index())
    toks = df.loc[0, "text"].split()
    kept = [w for p, w in enumerate(toks, start=1)
            if md5_u64(f"wd:1:{p}") % 1000 >= 300]
    r = out.loc[1]
    assert r.n_tokens == 6
    assert r.n_dropped == 6 - len(kept)
    assert r.text_aug == " ".join(kept)
    assert out.loc[2].n_tokens == 1
    assert 3 not in out.index          # token-less doc absent


def test_word_dropout_duckdb_parity(ray_session):
    from fluent_server_ray.stages.hygiene import (word_dropout,
                                                  word_dropout_sql)

    rng = np.random.default_rng(163)
    words = ["aa", "bb", "cc", "dd"]
    df = pd.DataFrame({
        "doc_id": range(200),
        "text": [" ".join(rng.choice(words, rng.integers(1, 25)))
                 for _ in range(200)],
    })
    out = word_dropout(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, word_dropout_sql(), view="documents")
    _cmp(out, duck)


# ------------------------------------------------ FD discovery

def test_fd_discovery_planted_dependency(ray_session):
    """b = f(a) holds; a = f(b) fails (two a's share a b); NULL rows
    are no evidence."""
    from fluent_server_ray.stages.profile import fd_discovery

    df = pd.DataFrame({
        "x": pd.array([1, 1, 2, 3, None], dtype="Int64"),
        "y": pd.array([10, 10, 20, 20, 99], dtype="Int64"),
    })
    out = (fd_discovery(rd.from_pandas(df), cols=("x", "y"))
           .to_pandas().set_index(["col_a", "col_b"]))
    xy = out.loc[("x", "y")]
    assert bool(xy.fd_holds) and xy.n_distinct_a == 3
    yx = out.loc[("y", "x")]
    assert not bool(yx.fd_holds)
    assert yx.n_distinct_a == 2 and yx.n_distinct_ab == 3


def test_fd_discovery_duckdb_parity(ray_session):
    from fluent_server_ray.stages.profile import (fd_discovery,
                                                  fd_discovery_sql)

    rng = np.random.default_rng(167)
    n = 400
    df = pd.DataFrame({
        "k": np.arange(n),
        "g": rng.integers(0, 7, n),
        "s": rng.choice(["p", "q", "r"], n),
        "t": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 5, n), unit="D"),
    })
    cols = ("k", "g", "s", "t")
    out = fd_discovery(rd.from_pandas(df), cols=cols).to_pandas()
    duck = _duck_one(df, fd_discovery_sql(cols=cols, table="orders"),
                     view="orders")
    _cmp(out, duck)


# ------------------------------------------------ review regressions

def test_extractive_summary_vocab_missing_sentence(ray_session):
    """Sentence whose only token exists in the vocab solely in its
    terminator-attached form ('Wow.' vs 'Wow') scores 0, not NaN —
    engine/mirror parity on the degenerate doc."""
    from fluent_server_ray.stages.textstats import (
        extractive_summary, extractive_summary_sql)

    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["Wow. It works.", "plain text here"]})
    out = extractive_summary(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, extractive_summary_sql(), view="documents")
    _cmp(out, duck)
    r1 = out[out.doc_id == 1].iloc[0]
    assert r1.n_sentences == 2


def test_cohort_ltv_null_event_type(ray_session):
    """NULL event_type rows are non-revenue activity, not poison."""
    from fluent_server_ray.stages.windows import cohort_ltv, cohort_ltv_sql

    df = pd.DataFrame({
        "user_id": [1, 1, 2],
        "ts": pd.to_datetime(["1970-01-01", "1970-01-02",
                              "1970-01-09"]),
        "event_type": [None, "purchase", None],
        "value": [5.0, 2.0, 3.0],
    })
    out = cohort_ltv(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, cohort_ltv_sql())
    _cmp(out, duck)
    assert out[(out.cohort_week == 0)
               & (out.age_weeks == 0)].revenue_cents.iloc[0] == 200


def test_fd_discovery_all_null_column(ray_session):
    """A fully-NULL column has zero co-non-null evidence with every
    partner: those pairs still appear (counts 0, vacuously TRUE) —
    same row set as the mirror."""
    from fluent_server_ray.stages.profile import (fd_discovery,
                                                  fd_discovery_sql)

    df = pd.DataFrame({
        "x": pd.array([1, 2, 3], dtype="Int64"),
        "y": pd.array([None, None, None], dtype="Int64"),
    })
    out = fd_discovery(rd.from_pandas(df), cols=("x", "y")).to_pandas()
    duck = _duck_one(df, fd_discovery_sql(cols=("x", "y"),
                                          table="orders"),
                     view="orders")
    _cmp(out, duck)
    assert len(out) == 2
    ny = out.set_index(["col_a", "col_b"]).loc[("y", "x")]
    assert ny.n_distinct_a == 0 and bool(ny.fd_holds)


# ------------------------------------------------ Sn scale

def test_sn_scale_brute_force(ray_session):
    """Nested-median picks recomputed with a plain double loop."""
    from fluent_server_ray.stages.features import sn_scale

    rng = np.random.default_rng(173)
    n_days = 11
    cents = rng.integers(100, 50000, n_days)
    ts = pd.to_datetime(np.arange(n_days) * 86400, unit="s")
    df = pd.DataFrame({"event_type": "a", "ts": ts,
                       "value": cents / 100.0})
    out = sn_scale(rd.from_pandas(df)).to_pandas().iloc[0]
    k_hi = n_days // 2 + 1
    picks = []
    for i in range(n_days):
        row = sorted(abs(int(cents[i]) - int(cents[j]))
                     for j in range(n_days) if j != i)
        picks.append(row[k_hi - 1])
    k_lo = (n_days + 1) // 2
    assert out.sn_cents == sorted(picks)[k_lo - 1]
    assert out.n_days == n_days


def test_sn_scale_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import sn_scale, sn_scale_sql

    rng = np.random.default_rng(179)
    n = 500
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y", "z"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 28 * 86400, n), unit="s"),
        "value": rng.integers(-200, 9000, n) / 100.0,
    })
    out = sn_scale(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, sn_scale_sql())
    _cmp(out, duck)


# ------------------------------------------------ burstiness

def test_burstiness_clockwork_vs_bursty(ray_session):
    """Perfectly regular gaps -> sigma=0 -> B = -1; highly dispersed
    gaps -> B > 0."""
    from fluent_server_ray.stages.features import burstiness

    rows = []
    for i in range(20):                      # clockwork: gap = 100 s
        rows.append((1, "reg", 100 * i, i))
    bursty = [0, 1, 2, 3, 4, 10000, 10001, 10002, 20000]
    for k, s in enumerate(bursty):           # bursts
        rows.append((1, "bur", s, 100 + k))
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "s",
                                     "event_id"])
    df["ts"] = pd.to_datetime(df["s"], unit="s")
    out = (burstiness(rd.from_pandas(
        df[["user_id", "event_type", "ts", "event_id"]]))
        .to_pandas().set_index("event_type"))
    assert out.loc["reg"].burstiness == -1.0
    assert out.loc["reg"].sigma == 0.0
    assert out.loc["bur"].burstiness > 0.2


def test_burstiness_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (burstiness,
                                                   burstiness_sql)

    rng = np.random.default_rng(181)
    n = 700
    df = pd.DataFrame({
        "user_id": rng.integers(0, 30, n),
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 20 * 86400, n), unit="s"),
        "event_id": np.arange(n),
    })
    out = burstiness(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, burstiness_sql())
    _cmp(out, duck)


# ------------------------------------------------ Hoover index

def test_hoover_hand_pin(ray_session):
    """Users with cents 100, 300: mu=200, D=|2*100-400|+|2*300-400| =
    400, H = 400/(2*2*400) = 0.25 (move 25% of mass to equalize).
    Perfect equality -> H = 0."""
    from fluent_server_ray.stages.features import hoover_index

    df = pd.DataFrame({
        "event_type": ["a", "a", "b", "b"],
        "user_id": [1, 2, 1, 2],
        "value": [1.0, 3.0, 2.0, 2.0],
    })
    out = (hoover_index(rd.from_pandas(df)).to_pandas()
           .set_index("event_type"))
    a = out.loc["a"]
    assert a.dev_mass == 400 and a.hoover == 0.25
    assert out.loc["b"].hoover == 0.0


def test_hoover_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (hoover_index,
                                                   hoover_index_sql)

    rng = np.random.default_rng(191)
    n = 600
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y", "z"], n),
        "user_id": rng.integers(0, 50, n),
        "value": rng.integers(-100, 9000, n) / 100.0,
    })
    out = hoover_index(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, hoover_index_sql())
    _cmp(out, duck)


# ------------------------------------------------ verbosity panel

def test_verbosity_by_tenant_oracle(ray_session):
    """Flagship-path composite: engine combiner vs the pipeline-CTE
    mirror at sf0.001, plus a ratio sanity check."""
    import duckdb as _duck

    import __ray_entry__ as entry
    from fluent_server_ray import oracle

    sf = "/root/testdata/sf0.001"
    out = entry.queries()["transcripts_verbosity_by_tenant"](sf) \
        .to_pandas()
    con = _duck.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    duck = con.execute(oracle.verbosity_by_tenant_sql()).df()
    _cmp(out, duck)
    r = out.iloc[0]
    assert r.verbosity_ratio == r.assistant_chars / r.user_chars


# ------------------------------------------------ HHI + hour TVD

def test_nation_hhi_hand_pin(ray_session):
    """One nation, customers with 100/300 cents: HHI = (1+9)/16."""
    from fluent_server_ray.pipelines.relational import (
        nation_customer_hhi, nation_customer_hhi_sql)
    import tempfile, os
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="hhi_")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": pa.array(["X"], pa.string()),
    }), f"{d}/nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([0, 0], pa.int64()),
    }), f"{d}/customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 2], pa.int64()),
        "o_totalprice": pa.array([1.0, 2.0, 1.0], pa.float64()),
    }), f"{d}/orders.parquet")
    out = nation_customer_hhi(d).to_pandas().iloc[0]
    assert out.n_customers == 2 and out.total_cents == 400
    assert out.hhi == (100**2 + 300**2) / 400**2


def test_hour_profile_distance_oracle(ray_session):
    """Flagship-path composite vs the pipeline-CTE mirror; identical
    profiles give tvd 0, disjoint give 1."""
    import duckdb as _duck

    from fluent_server_ray import pipelines
    from fluent_server_ray.pipelines.flagship import (
        tenant_hour_profile_distance, tenant_hour_profile_distance_sql)

    sf = "/root/testdata/sf0.001"
    out = tenant_hour_profile_distance(sf).to_pandas()
    con = _duck.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    duck = con.execute(tenant_hour_profile_distance_sql()).df()
    _cmp(out, duck)
    assert ((out.tvd >= 0) & (out.tvd <= 1)).all()


# ------------------------------------------------ threshold crossing

def test_threshold_crossing_brute_force(ray_session):
    """First prefix >= threshold recomputed sequentially, including
    never-crossing and negative-delay cases."""
    from fluent_server_ray.stages.windows import threshold_crossing

    rng = np.random.default_rng(197)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 86400, n), unit="s"),
        "event_id": np.arange(n),
        "value": rng.integers(-200, 900, n) / 100.0,
    })
    thr = 2000
    out = threshold_crossing(rd.from_pandas(df),
                             threshold_cents=thr).to_pandas() \
        .set_index("user_id").sort_index()
    for u, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        cum, hit = 0, None
        for _, r in g.iterrows():
            cum += round(r.value * 100)
            if hit is None and cum >= thr:
                hit = (int(r.ts.value // 1000), int(r.event_id), cum)
        row = out.loc[u]
        assert row.total_cents == cum
        if hit is None:
            assert not row.crossed and pd.isna(row.cross_ts_us)
        else:
            assert row.crossed
            assert (row.cross_ts_us, row.cross_event_id,
                    row.cross_cum_cents) == hit


def test_threshold_crossing_duckdb_parity(ray_session):
    from fluent_server_ray.stages.windows import (threshold_crossing,
                                                  threshold_crossing_sql)

    rng = np.random.default_rng(199)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 30, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 3 * 86400, n), unit="s"),
        "event_id": np.arange(n),
        "value": rng.integers(-100, 800, n) / 100.0,
    })
    out = threshold_crossing(rd.from_pandas(df),
                             threshold_cents=1500).to_pandas()
    duck = _duck_one(df, threshold_crossing_sql(threshold_cents=1500))
    _cmp(out, duck)


# ------------------------------------------------ salt plan

def test_tenant_salt_plan_oracle(ray_session):
    import duckdb as _duck

    from fluent_server_ray.pipelines.flagship import (
        tenant_salt_plan, tenant_salt_plan_sql)

    sf = "/root/testdata/sf0.001"
    out = tenant_salt_plan(sf, target_rows=50).to_pandas()
    con = _duck.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    duck = con.execute(tenant_salt_plan_sql(target_rows=50)).df()
    _cmp(out, duck)
    assert (out.salt_factor >= 1).all()
    assert (out.is_hot == (out.salt_factor > 1)).all()


# ------------------------------------------------ Kish ESS

def test_kish_ess_hand_pin(ray_session):
    """Weights 1,1,1,1 -> ESS = n; weights 4,0 -> ESS = 1 (one doc
    carries all mass)."""
    from fluent_server_ray.stages.textstats import kish_ess

    df = pd.DataFrame({
        "source": ["a"] * 4 + ["b"] * 2,
        "text": ["w"] * 4 + ["x y z q", ""],
    })
    out = (kish_ess(rd.from_pandas(df)).to_pandas()
           .set_index("source"))
    a = out.loc["a"]
    assert a.n_docs == 4 and a.sum_w == 4 and a.ess == 4.0
    b = out.loc["b"]
    assert b.n_docs == 2 and b.sum_w == 4 and b.sum_w2 == 16
    assert b.ess == 1.0


def test_kish_ess_duckdb_parity(ray_session):
    from fluent_server_ray.stages.textstats import kish_ess, kish_ess_sql

    rng = np.random.default_rng(211)
    df = pd.DataFrame({
        "source": rng.choice(["s1", "s2", "s3"], 300),
        "text": [" ".join(["w"] * rng.integers(0, 40))
                 for _ in range(300)],
    })
    out = kish_ess(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, kish_ess_sql(), view="documents")
    _cmp(out, duck)


# ------------------------------------------------ tag prefix rollup

def test_tag_prefix_rollup_oracle_and_hierarchy(ray_session):
    """Level-1 counts must sum to the routed row total; every prefix
    count >= the sum of its children at the next level."""
    import duckdb as _duck

    from fluent_server_ray.pipelines.flagship import (
        tag_prefix_rollup, tag_prefix_rollup_sql)

    sf = "/root/testdata/sf0.001"
    out = tag_prefix_rollup(sf).to_pandas()
    con = _duck.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    duck = con.execute(tag_prefix_rollup_sql()).df()
    _cmp(out, duck)
    assert out[out.level == 1].n.sum() == 900   # routed rows
    for _, r in out[out.level == 1].iterrows():
        kids = out[(out.level == 2)
                   & out.prefix.str.startswith(r.prefix + ".")]
        assert kids.n.sum() <= r.n


# ------------------------------------------------ return periods

def test_return_periods_hand_pin(ray_session):
    """Daily cents 500,300,500,100: rank-1 is the EARLIER 500-day;
    T = 5/1, 5/2, 5/3."""
    from fluent_server_ray.stages.features import return_periods

    cents = [500, 300, 500, 100]
    ts = pd.to_datetime(np.arange(4) * 86400, unit="s")
    df = pd.DataFrame({"event_type": "a", "ts": ts,
                       "value": np.array(cents) / 100.0})
    out = return_periods(rd.from_pandas(df)).to_pandas()
    assert list(out["rank"]) == [1, 2, 3]
    assert list(out.day) == [0, 2, 1]
    assert list(out.return_period_days) == [5.0, 2.5, 5 / 3]


def test_return_periods_duckdb_parity(ray_session):
    from fluent_server_ray.stages.features import (return_periods,
                                                   return_periods_sql)

    rng = np.random.default_rng(223)
    n = 500
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y"], n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 30 * 86400, n), unit="s"),
        "value": rng.integers(-100, 9000, n) / 100.0,
    })
    out = return_periods(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, return_periods_sql())
    _cmp(out, duck)


# ------------------------------------------------ review-2 regressions

def test_sn_scale_two_day_group_null(ray_session):
    """n = 2: the himed rank doesn't exist among one diff — engine and
    mirror both emit the row with NULL sn_cents."""
    from fluent_server_ray.stages.features import sn_scale, sn_scale_sql

    df = pd.DataFrame({
        "event_type": ["b", "b", "a", "a", "a"],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02",
                              "2024-01-01", "2024-01-02",
                              "2024-01-03"]),
        "value": [1.0, 2.0, 3.0, 1.0, 9.0],
    })
    out = sn_scale(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, sn_scale_sql())
    _cmp(out, duck)
    b = out[out.event_type == "b"].iloc[0]
    assert b.n_days == 2 and pd.isna(b.sn_cents)


def test_burstiness_constant_gaps_no_domain_error(ray_session):
    """σ = 0 via the clamped E[d²] − μ² tree: the −ε case must clamp,
    not raise, and still mirror the SQL."""
    from fluent_server_ray.stages.features import (burstiness,
                                                   burstiness_sql)

    rows = [(1, "t", 97 * i, i) for i in range(50)]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "s",
                                     "event_id"])
    df["ts"] = pd.to_datetime(df["s"], unit="s")
    df = df[["user_id", "event_type", "ts", "event_id"]]
    out = burstiness(rd.from_pandas(df)).to_pandas()
    duck = _duck_one(df, burstiness_sql())
    _cmp(out, duck)
    assert out.iloc[0].sigma == 0.0 and out.iloc[0].burstiness == -1.0


# ------------------------------------------------ tool baskets + entropy

def test_tool_basket_pairs_oracle(ray_session):
    import duckdb as _duck

    from fluent_server_ray.pipelines.flagship import (
        tool_basket_pairs, tool_basket_pairs_sql)

    sf = "/root/testdata/sf0.001"
    out = tool_basket_pairs(sf).to_pandas()
    con = _duck.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    duck = con.execute(tool_basket_pairs_sql()).df()
    _cmp(out, duck)
    assert (out.n_both <= out[["n_a", "n_b"]].min(axis=1)).all()


def test_hour_entropy_extremes(ray_session):
    """All events in one hour -> entropy 0; uniform over two hours ->
    ln 2 (within the 1e-6 floored-log contract)."""
    from fluent_server_ray.stages.features import (hour_entropy,
                                                   hour_entropy_sql)

    rows = ([("one", 3600 * 5 + i) for i in range(40)]
            + [("two", 3600 * (i % 2) + i) for i in range(40)])
    df = pd.DataFrame(rows, columns=["event_type", "s"])
    df["ts"] = pd.to_datetime(df["s"], unit="s")
    out = (hour_entropy(rd.from_pandas(df[["event_type", "ts"]]))
           .to_pandas().set_index("event_type"))
    assert out.loc["one"].entropy_nats == 0.0
    assert abs(out.loc["two"].entropy_nats - np.log(2)) < 1e-5
    duck = _duck_one(df[["event_type", "ts"]], hour_entropy_sql())
    _cmp(out.reset_index(), duck)
