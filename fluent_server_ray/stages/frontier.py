"""Pareto-frontier (skyline) queries over a Dataset.

The classic two-criteria non-dominated-set operator (Börzsönyi,
Kossmann & Stocker, "The Skyline Operator", ICDE 2001 — public
literature): return every distinct point not dominated by another
(dominating = at-least-as-good on both axes, strictly better on one).
Reference-parity anchor: the reference engine's comparator-driven
sorted views over event streams (``event/event.go:21-33``) are the
1-criterion special case; the skyline generalizes selection-by-order
to two competing criteria ("cheapest for its recency").

Ray-Data-first shape: the 2-D skyline admits an exact
local-then-merge decomposition — a block's dominated points are
dominated by a witness inside the same block, so a per-block
vectorized sweep (lexsort + running-max, no Python row loop) kills
almost everything where the data lives, and only the per-block
frontier candidates (expected O(log n) per block for random data)
travel. The final sweep over the gathered candidates is the same
kernel; its input is bounded and enforced by ``max_candidates``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_I64_MIN = np.iinfo(np.int64).min


def _sweep(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact distinct-point 2-D skyline (minimize x, maximize y) of
    int64 arrays: sort (x asc, y desc), keep rows whose y strictly
    exceeds the running max of every earlier row. Equal-(x, y)
    duplicates collapse (the second copy never strictly exceeds), and
    the strict ``>`` implements the "strictly better on one axis"
    dominance rule — same discipline as the SQL window mirror."""
    if not len(x):
        return x.astype(np.int64), y.astype(np.int64)
    order = np.lexsort((-y, x))
    xs, ys = x[order], y[order]
    run = np.maximum.accumulate(ys)
    prev = np.empty_like(run)
    prev[0] = _I64_MIN
    prev[1:] = run[:-1]
    keep = ys > prev
    return xs[keep], ys[keep]


def skyline_2d(ds, x_col: str, y_col: str,
               out_x: str = "x", out_y: str = "y",
               max_candidates: int = 2_000_000) -> pa.Table:
    """Distinct-point skyline of (minimize ``x_col``, maximize
    ``y_col``) over int64 columns. Returns a pyarrow Table
    (out_x, out_y) sorted by out_x ascending.

    Scale: the per-block sweep is where the reduction happens — each
    block ships only its own frontier. The driver-side final merge is
    bounded by the candidate union (expected O(blocks · log rows/block)
    for non-adversarial data); ``max_candidates`` raises on the
    adversarial anti-chain corpus (every point on the frontier) where
    no skyline algorithm can produce a small answer anyway.
    """
    from fluent_server_ray.stages.aggregate import skip_empty

    def local(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[x_col]), pc.is_valid(t[y_col])))
        x = pc.cast(t[x_col], pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(t[y_col], pa.int64()).to_numpy(zero_copy_only=False)
        xs, ys = _sweep(x.astype(np.int64), y.astype(np.int64))
        return pa.table({out_x: pa.array(xs, type=pa.int64()),
                         out_y: pa.array(ys, type=pa.int64())})

    parts = ds.map_batches(skip_empty(local), batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    if len(parts) > max_candidates:
        raise ValueError(
            f"skyline_2d: {len(parts)} frontier candidates exceed "
            f"max_candidates={max_candidates} — an anti-chain corpus; "
            "the skyline itself is corpus-sized")
    if not parts:
        return pa.table({out_x: pa.array([], type=pa.int64()),
                         out_y: pa.array([], type=pa.int64())})
    x = np.fromiter((r[out_x] for r in parts), dtype=np.int64,
                    count=len(parts))
    y = np.fromiter((r[out_y] for r in parts), dtype=np.int64,
                    count=len(parts))
    xs, ys = _sweep(x, y)
    return pa.table({out_x: pa.array(xs, type=pa.int64()),
                     out_y: pa.array(ys, type=pa.int64())})


def orders_skyline(ds) -> pa.Table:
    """Order-book skyline: the distinct (price, date) points where no
    other order is both at-most-as-expensive and at-least-as-recent
    (with one strict) — "cheapest order for its recency". Price in
    half-away int64 cents (the house ``_cents`` contract), date as
    integer days since 1970-01-01 (both sides integer — no float in
    the compare)."""
    from fluent_server_ray.stages.features import _cents

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "price_cents": _cents(t["o_totalprice"]),
            "day_num": pc.cast(
                pc.cast(t["o_orderdate"], pa.date32(), safe=False),
                pa.int32()).cast(pa.int64()),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    return skyline_2d(prepped, "price_cents", "day_num",
                      out_x="price_cents", out_y="day_num")


def orders_skyline_sql(table: str = "orders") -> str:
    """Mirror: DISTINCT integer points, then the identical sweep as a
    window — keep a row iff its day strictly exceeds the max day over
    all rows earlier in (price ASC, day DESC) order."""
    return f"""
WITH pts AS (
  SELECT DISTINCT
    CAST(round(o_totalprice * 100.0) AS BIGINT) AS price_cents,
    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
      AS day_num
  FROM {table}
), sw AS (
  SELECT price_cents, day_num,
    MAX(day_num) OVER (
      ORDER BY price_cents ASC, day_num DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM pts
)
SELECT price_cents, day_num FROM sw
WHERE pm IS NULL OR day_num > pm
ORDER BY price_cents
""".strip()
