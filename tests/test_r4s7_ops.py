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
