"""Hand-computed pins for RAKE keyphrases and Holt trend smoothing."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


# ------------------------------------------------------- RAKE

def test_rake_hand(ray_session):
    from fluent_server_ray.stages.textstats import rake_keyphrases

    ds = rd.from_arrow(pa.table({"text": pa.array([
        "red apple and green apple",
        "red apple is good",
    ], pa.string())}))
    got = rake_keyphrases(ds, k=10).to_pandas()
    # phrases: "red apple"×2, "green apple"×1, "good"×1
    # word scores (deg/freq ×1e6): red 4/2→2e6, apple 6/3→2e6,
    # green 2/1→2e6, good 1/1→1e6
    # phrase scores: red apple 4e6, green apple 4e6, good 1e6
    want = pd.DataFrame({
        "phrase": ["green apple", "red apple", "good"],
        "n": [1, 2, 1],
        "score_millionths": [4_000_000, 4_000_000, 1_000_000],
    })
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_rake_empty_and_all_stop(ray_session):
    from fluent_server_ray.stages.textstats import rake_keyphrases

    ds = rd.from_arrow(pa.table({"text": pa.array(
        ["the and of", None, ""], pa.string())}))
    got = rake_keyphrases(ds, k=10)
    assert got.num_rows == 0


# ------------------------------------------------- Holt trend

def _events_table(days_counts, group="x"):
    groups, ts = [], []
    for day, n in days_counts:
        for _ in range(n):
            groups.append(group)
            ts.append(day * 86400)
    return pa.table({
        "event_type": pa.array(groups, pa.string()),
        "ts": pa.array(pd.to_datetime(ts, unit="s")),
    })


def test_holt_hand_increasing(ray_session):
    from fluent_server_ray.stages.features import holt_trend

    # y = [2, 4, 8]; alpha = beta = 1/2
    # l0=2e6 b0=2e6; t1: l=(4e6+4e6)//2=4e6, b=(2e6+2e6)//2=2e6
    # t2: l=(8e6+6e6)//2=7e6, b=(3e6+2e6)//2=2.5e6 → forecast 9.5e6
    got = holt_trend(rd.from_arrow(
        _events_table([(0, 2), (1, 4), (2, 8)]))).to_pandas()
    assert got["group"].tolist() == ["x"]
    assert got["n_days"].tolist() == [3]
    assert got["level_millionths"].tolist() == [7_000_000]
    assert got["trend_millionths"].tolist() == [2_500_000]
    assert got["forecast_millionths"].tolist() == [9_500_000]


def test_holt_single_day_dropped(ray_session):
    from fluent_server_ray.stages.features import holt_trend

    got = holt_trend(rd.from_arrow(_events_table([(0, 5)])))
    assert got.num_rows == 0


def test_holt_negative_trend_matches_duckdb(ray_session, tmp_path):
    """Decreasing series exercise negative intermediate values where
    DuckDB's truncate-toward-zero // differs from Python floor — the
    Ray recurrence must track the SQL contract exactly."""
    from fluent_server_ray.stages.features import holt_trend, holt_trend_sql

    tabs = [_events_table([(0, 97), (1, 31), (3, 17), (4, 5), (9, 2)],
                          group="down"),
            _events_table([(0, 1), (2, 50), (5, 3), (6, 44)],
                          group="zig")]
    tbl = pa.concat_tables(tabs)
    path = str(tmp_path / "events.parquet")
    import pyarrow.parquet as pq
    pq.write_table(tbl, path)

    got = holt_trend(rd.from_arrow(tbl)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    want = con.execute(holt_trend_sql()).df()
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)
