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


# ------------------------------------------------ randomized response

def test_rr_private_counts_hand_pin(ray_session):
    """Debias identity: with the deterministic coin, estimate =
    (4*reported - n)/2 exactly; reported diverges from true only on
    flipped events."""
    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.hygiene import rr_private_daily_counts

    n = 40
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-05"),
        "event_type": ["purchase" if i % 3 == 0 else "view"
                       for i in range(n)],
    })
    out = rr_private_daily_counts(rd.from_pandas(df)).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    x = np.array([1 if i % 3 == 0 else 0 for i in range(n)])
    flip = np.array([md5_u64(f"rr:{i}") % 4 == 0 for i in range(n)])
    rep = int(np.where(flip, 1 - x, x).sum())
    assert row.n == n and row.n_true == x.sum()
    assert row.n_reported == rep
    assert row.dp_estimate == (4 * rep - n) / 2.0


def test_rr_coin_matches_duckdb(ray_session):
    from fluent_server_ray.functions.hashing import md5_u64

    con = duckdb.connect()
    for i in (0, 1, 7, 123456789):
        want = con.execute(
            f"SELECT md5_number_upper('rr:' || CAST({i} AS VARCHAR)) "
            f"% 4").fetchone()[0]
        assert md5_u64(f"rr:{i}") % 4 == want


# ------------------------------------------------ per-user SPRT

def test_sprt_hand_pin(ray_session):
    """u1: 5 straight purchases -> cum 7,14,21,28,35 crosses +29 at
    step 5. u2: 8 straight clicks -> cum -4.. -32 crosses -29 at step
    8. u3: 1 purchase -> never crosses -> continue."""
    from fluent_server_ray.stages.features import user_sprt_decisions

    ts = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(5):
        rows.append((1, ts + pd.Timedelta(seconds=i), i, "purchase"))
    for i in range(8):
        rows.append((2, ts + pd.Timedelta(seconds=i), 100 + i, "click"))
    rows.append((3, ts, 200, "purchase"))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "event_type"])
    out = (user_sprt_decisions(rd.from_pandas(df))
           .to_pandas().set_index("decision"))
    assert out.loc["accept_h1"].n_users == 1
    assert out.loc["accept_h1"].sum_crossing_step == 5
    assert out.loc["accept_h0"].n_users == 1
    assert out.loc["accept_h0"].sum_crossing_step == 8
    assert out.loc["continue"].n_users == 1
    assert out.loc["continue"].sum_crossing_step == 0


def test_sprt_duck_parity(ray_session):
    from fluent_server_ray.stages.features import (user_sprt_decisions,
                                                   user_sprt_decisions_sql)

    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 25, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 5 * 86400, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(
            ["click", "purchase", "view"], n, p=[0.4, 0.35, 0.25]),
    })
    got = user_sprt_decisions(rd.from_pandas(df), n_buckets=4).to_pandas()
    want = _duck_one(df, user_sprt_decisions_sql())
    _cmp(got, want)


# ------------------------------------------------ Wilcoxon signed-rank

def test_wilcoxon_hand_pin(ray_session):
    """Diffs (purchase - click cents): u1 +100, u2 -50, u3 +50,
    u4 0 (dropped). |d| ranks: 50->tie pair (doubled midranks 3,3),
    100 -> 5 (doubled 2*2+1+1=6? no: cum_before=2, c=1 -> r2=6).
    w2_plus = r2(100) + r2(50 for u3) = 6 + 3 = 9; n=3, mean2=6."""
    from fluent_server_ray.stages.features import wilcoxon_signed_rank

    df = pd.DataFrame({
        "user_id": [1, 1, 2, 2, 3, 3, 4, 4],
        "event_type": ["click", "purchase"] * 4,
        "value": [1.0, 2.0,    # u1: +100
                  1.0, 0.5,    # u2: -50
                  0.5, 1.0,    # u3: +50
                  2.0, 2.0],   # u4: 0 -> dropped
    })
    out = wilcoxon_signed_rank(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out.n_pairs == 3
    # |d| = 50,50,100: midranks (1.5,1.5,3) doubled = (3,3,6)
    assert out.w2_plus == 3 + 6
    assert out.mean2 == 3 * 4 // 2
    # var_num12 = 2*3*4*7 - (2^3-2) = 168 - 6 = 162
    assert out.var_num12 == 162
    assert out.z == (9 - 6) / np.sqrt(162 / 12.0)


def test_wilcoxon_scipy_formula_parity(ray_session):
    """Against the closed-form no-ties case: n distinct diffs,
    var_num12 = 2n(n+1)(2n+1), W+ = classic rank sum."""
    from fluent_server_ray.stages.features import wilcoxon_signed_rank

    # purchases strictly exceed clicks by distinct amounts: all d > 0,
    # |d| = 100, 200, ..., 500 -> W+ = 1+2+3+4+5 = 15 (doubled 30)
    rows = []
    for u in range(1, 6):
        rows.append((u, "click", 1.0))
        rows.append((u, "purchase", 1.0 + u))
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "value"])
    out = wilcoxon_signed_rank(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out.n_pairs == 5 and out.w2_plus == 30
    assert out.var_num12 == 2 * 5 * 6 * 11


# ------------------------------------------------ peak concurrency

def test_peak_concurrency_hand_pin(ray_session):
    """Three overlapping intervals on one day: [0,10), [5,15), [8,9)
    (seconds) -> depth 3 in [8,9); a second day with one interval."""
    from fluent_server_ray.stages.windows import peak_concurrency

    base = pd.Timestamp("2024-01-01")
    day2 = pd.Timestamp("2024-01-02")
    df = pd.DataFrame({
        # durations come from event_id % 600
        "ts": [base, base + pd.Timedelta(seconds=5),
               base + pd.Timedelta(seconds=8), day2],
        "event_id": [10, 610, 1201, 30],  # durations 10, 10, 1, 30
    })
    out = peak_concurrency(rd.from_pandas(df)).to_pandas()
    d1 = out[out.day == (base - pd.Timestamp("1970-01-01")).days].iloc[0]
    assert d1.peak_concurrency == 3
    assert d1.peak_at_us == (base + pd.Timedelta(seconds=8)).value // 1000
    d2 = out[out.day == (day2 - pd.Timestamp("1970-01-01")).days].iloc[0]
    assert d2.peak_concurrency == 1


def test_peak_concurrency_zero_length_never_counts(ray_session):
    from fluent_server_ray.stages.windows import peak_concurrency

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({"ts": [base], "event_id": [600]})  # dur 0
    out = peak_concurrency(rd.from_pandas(df)).to_pandas()
    # +1 and -1 collapse at one instant: peak is 0, never 1
    assert out.peak_concurrency.tolist() == [0]


def test_peak_concurrency_duck_parity(ray_session):
    from fluent_server_ray.stages.windows import (peak_concurrency,
                                                  peak_concurrency_sql)

    rng = np.random.default_rng(5)
    n = 800
    df = pd.DataFrame({
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 4 * 86400, n), unit="s"),
        "event_id": rng.integers(0, 100_000, n),
    })
    got = peak_concurrency(rd.from_pandas(df)).to_pandas()
    want = _duck_one(df, peak_concurrency_sql())
    _cmp(got, want)


# ------------------------------------------------ weighted SSSP

def _sssp_weight(x, y):
    from fluent_server_ray.functions.hashing import md5_u64

    return 1 + md5_u64(f"{x}\x1f{y}") % 9


def test_weighted_sssp_hand_pin(ray_session):
    """Line graph a-b-c plus direct edge a-c: dist(c) must take the
    cheaper of w(a,c) vs w(a,b)+w(b,c) — md5-derived weights."""
    from fluent_server_ray.stages.graph import weighted_sssp

    edges = pa.table({"lo": ["a", "a", "b"], "hi": ["b", "c", "c"]})
    out = weighted_sssp(rd.from_arrow(edges), "a").to_pandas()
    wab = _sssp_weight("a", "b")
    wac = _sssp_weight("a", "c")
    wbc = _sssp_weight("b", "c")
    d = dict(zip(out.node, out.dist))
    assert d["a"] == 0 and d["b"] == min(wab, wac + wbc)
    assert d["c"] == min(wac, wab + wbc)


def test_weighted_sssp_dense_vs_distributed_parity(ray_session):
    from fluent_server_ray.stages.graph import weighted_sssp

    rng = np.random.default_rng(13)
    names = [f"n{i}" for i in range(14)]
    los, his = [], []
    for _ in range(30):
        x, y = rng.choice(14, 2, replace=False)
        a, b = sorted((names[x], names[y]))
        los.append(a); his.append(b)
    edges = pa.table({"lo": los, "hi": his})
    dense = weighted_sssp(rd.from_arrow(edges), "n0").to_pandas()
    dist = weighted_sssp(rd.from_arrow(edges), "n0",
                         max_dense_edges=0, n_buckets=2).to_pandas()
    pd.testing.assert_frame_equal(dense.reset_index(drop=True),
                                  dist.reset_index(drop=True))


def test_weighted_sssp_cost_cap_excludes_far_nodes(ray_session):
    from fluent_server_ray.stages.graph import weighted_sssp

    edges = pa.table({"lo": ["a"], "hi": ["b"]})
    w = _sssp_weight("a", "b")
    out = weighted_sssp(rd.from_arrow(edges), "a",
                        cost_cap=w - 1).to_pandas()
    assert out.node.tolist() == ["a"]  # b is past the cap


# ------------------------------------------------ Arrow IPC round-trip

def test_ipc_roundtrip_bit_exact(ray_session, tmp_path):
    """IPC keeps schema and values bit-exact — including microsecond
    timestamps and full-precision doubles (the lossy-text formats
    can't promise this)."""
    from fluent_server_ray.sources.ipc import read_ipc_dir, write_ipc_dir

    t = pa.table({
        "ts": pa.array([1_700_000_000_123_456, 1],
                       pa.timestamp("us")),
        "x": pa.array([0.1 + 0.2, 1e-300], pa.float64()),
        "s": pa.array(["héllo", None], pa.string()),
    })
    out = str(tmp_path / "ipc")
    write_ipc_dir(rd.from_arrow(t), out)
    back_parts = [b for b in read_ipc_dir(out).iter_batches(
        batch_size=None, batch_format="pyarrow")]
    back = pa.concat_tables(back_parts)
    assert back.schema.equals(t.schema)
    assert back.sort_by([("ts", "ascending")]).equals(
        t.sort_by([("ts", "ascending")]))
