"""Hand-computed pins for the round-4 seventh-session operators:
skyline (Pareto frontier), gaps-and-islands streaks, phrase /
proximity search, Theil-Sen trend, weighted median, role patterns."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def test_skyline_sweep_hand():
    from fluent_server_ray.stages.frontier import _sweep

    # points (x min, y max): (1,5) (2,7) (2,3) (3,8) (1,5) dup
    x = np.array([1, 2, 2, 3, 1], dtype=np.int64)
    y = np.array([5, 7, 3, 8, 5], dtype=np.int64)
    xs, ys = _sweep(x, y)
    # (1,5): nothing cheaper — keep. (2,7): 7>5 keep. (2,3): dominated
    # by (2,7). (3,8): 8>7 keep. dup (1,5) collapses.
    assert xs.tolist() == [1, 2, 3]
    assert ys.tolist() == [5, 7, 8]


def test_skyline_strictness_ties():
    from fluent_server_ray.stages.frontier import _sweep

    # equal price, later date dominates; equal date, lower price wins
    x = np.array([1, 1, 2], dtype=np.int64)
    y = np.array([4, 9, 9], dtype=np.int64)
    xs, ys = _sweep(x, y)
    assert list(zip(xs.tolist(), ys.tolist())) == [(1, 9)]


def test_skyline_2d_distributed(ray_session):
    from fluent_server_ray.stages.frontier import skyline_2d

    # two blocks; cross-block domination must resolve at the merge
    t1 = pa.table({"x": pa.array([10, 20], pa.int64()),
                   "y": pa.array([1, 100], pa.int64())})
    t2 = pa.table({"x": pa.array([5, 30], pa.int64()),
                   "y": pa.array([1, 100], pa.int64())})
    got = skyline_2d(rd.from_arrow([t1, t2]), "x", "y")
    # (5,1) kills (10,1); (20,100) kills (30,100)
    assert got.column("x").to_pylist() == [5, 20]
    assert got.column("y").to_pylist() == [1, 100]


def test_skyline_empty(ray_session):
    from fluent_server_ray.stages.frontier import skyline_2d

    t = pa.table({"x": pa.array([], pa.int64()),
                  "y": pa.array([], pa.int64())})
    got = skyline_2d(rd.from_arrow(t), "x", "y")
    assert got.num_rows == 0


def test_longest_streak_hand(ray_session):
    from fluent_server_ray.stages.windows import longest_streak

    # u1 active on days 1,2,3, 7, 9,10 -> longest 3, active 6
    # u2 active one day (two events same day dedup) -> 1, 1
    days = [1, 2, 3, 7, 9, 10, 5, 5]
    users = [1, 1, 1, 1, 1, 1, 2, 2]
    ts = pa.array(
        [(np.datetime64("1970-01-01") + np.timedelta64(d, "D"))
         .astype("datetime64[us]") for d in days], pa.timestamp("us"))
    t = pa.table({"user_id": pa.array(users, pa.int64()), "ts": ts})
    got = (longest_streak(rd.from_arrow(t)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert got.values.tolist() == [[1, 6, 3], [2, 1, 1]]


def test_longest_streak_cross_block_island(ray_session):
    from fluent_server_ray.stages.windows import longest_streak

    # the island spans two blocks: days 4,5 in block A, 6 in block B
    def mk(days):
        return pa.table({
            "user_id": pa.array([9] * len(days), pa.int64()),
            "ts": pa.array(
                [(np.datetime64("1970-01-01") + np.timedelta64(d, "D"))
                 .astype("datetime64[us]") for d in days], pa.timestamp("us")),
        })
    got = longest_streak(rd.from_arrow([mk([4, 5]), mk([6, 5])])).to_pandas()
    assert got.values.tolist() == [[9, 3, 3]]


def test_state_intervals_hand(ray_session):
    from fluent_server_ray.stages.windows import state_intervals

    # u1: A A B A -> runs A(2), B(1), A(1); run_id 1,2,3
    us = [10, 20, 30, 40]
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_type": pa.array(["A", "A", "B", "A"], pa.string()),
        "event_id": pa.array([100, 101, 102, 103], pa.int64()),
        "ts": pa.array(us, pa.timestamp("us")),
    })
    got = (state_intervals(rd.from_arrow(t)).to_pandas()
           .sort_values("run_id").reset_index(drop=True))
    assert got[["event_type", "run_id", "start_us", "end_us",
                "n_events"]].values.tolist() == [
        ["A", 1, 10, 20, 2], ["B", 2, 30, 30, 1], ["A", 3, 40, 40, 1]]


def test_state_intervals_null_state_run(ray_session):
    from fluent_server_ray.stages.windows import state_intervals

    # two consecutive NULL states form ONE run (IS DISTINCT FROM)
    t = pa.table({
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": pa.array(["A", None, None], pa.string()),
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([10, 20, 30], pa.timestamp("us")),
    })
    got = state_intervals(rd.from_arrow(t)).to_pandas()
    assert len(got) == 2
    nullrun = got[got["event_type"].isna()].iloc[0]
    assert (nullrun["n_events"], nullrun["run_id"]) == (2, 2)


def test_phrase_match_hand(ray_session):
    from fluent_server_ray.stages.textstats import phrase_match

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b a b",        # "a b" twice
            "a  b",           # double space: still adjacent tokens
            "b a",            # wrong order
            "a x b",          # gap 2 — not a phrase
        ], pa.string()),
    })
    got = (phrase_match(rd.from_arrow(t), "a", "b", window=1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.values.tolist() == [[1, 2], [2, 1]]


def test_proximity_window(ray_session):
    from fluent_server_ray.stages.textstats import phrase_match

    t = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["a x y b z b"], pa.string()),
    })
    # b at distances 3 and 5 after a; window=3 counts one, window=5 two
    for win, want in ((1, 0), (3, 1), (5, 2)):
        got = phrase_match(rd.from_arrow(t), "a", "b", window=win).to_pandas()
        n = 0 if len(got) == 0 else int(got["n_occurrences"].iloc[0])
        assert n == want, (win, n)


def test_phrase_match_same_word(ray_session):
    from fluent_server_ray.stages.textstats import phrase_match

    t = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["a a a"], pa.string()),
    })
    got = phrase_match(rd.from_arrow(t), "a", "a", window=1).to_pandas()
    assert got.values.tolist() == [[7, 2]]


def test_theilsen_hand(ray_session):
    from fluent_server_ray.stages.features import theilsen_trend

    # one group, days 0,1,2 with cents 0, 100, 400 (values 0,1,4)
    # slopes: (100-0)/1=100, (400-0)/2=200, (400-100)/1=300
    # lower median of [100,200,300] = 200
    ts = pa.array([np.datetime64("2024-01-01", "us"),
                   np.datetime64("2024-01-02", "us"),
                   np.datetime64("2024-01-03", "us")], pa.timestamp("us"))
    t = pa.table({"event_type": pa.array(["a"] * 3, pa.string()),
                  "ts": ts,
                  "value": pa.array([0.0, 1.0, 4.0], pa.float64())})
    got = theilsen_trend(rd.from_arrow(t)).to_pandas()
    assert got.values.tolist() == [["a", 3, 3, 200.0]]


def test_theilsen_single_day_null_slope(ray_session):
    from fluent_server_ray.stages.features import theilsen_trend

    t = pa.table({"event_type": pa.array(["a", "a"], pa.string()),
                  "ts": pa.array([np.datetime64("2024-01-01", "us")] * 2,
                                 pa.timestamp("us")),
                  "value": pa.array([1.0, 2.0], pa.float64())})
    got = theilsen_trend(rd.from_arrow(t)).to_pandas()
    assert got["n_days"].tolist() == [1]
    assert got["n_pairs"].tolist() == [0]
    assert got["slope_cents_per_day"].isna().all()


def test_theilsen_even_pairs_lower_median(ray_session):
    from fluent_server_ray.stages.features import theilsen_trend

    # 4 days -> 6 pairs; lower median = sorted[(6-1)//2] = sorted[2]
    days = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    vals = [0.0, 1.0, 1.0, 5.0]
    t = pa.table({"event_type": pa.array(["g"] * 4, pa.string()),
                  "ts": pa.array([np.datetime64(d, "us") for d in days],
                                 pa.timestamp("us")),
                  "value": pa.array(vals, pa.float64())})
    got = theilsen_trend(rd.from_arrow(t)).to_pandas()
    # cents 0,100,100,500 at d 0..3; slopes: 100,50,500/3,0,200,400
    # sorted: 0,50,100,166.67,200,400 -> lower median 100
    assert got["slope_cents_per_day"].tolist() == [100.0]
