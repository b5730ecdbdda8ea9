"""Windowed / sessionized aggregation over an ordered event log.

Ray Data has no event-time windows; the idiomatic shape (per the Ray
Data docs guidance for stream-shaped workloads) is: partition by key,
sort within partition, window inside ``groupby(key).map_groups``.
The reference carries event time but never windows (the mirror
accumulates forever, reference ``mirror/mirror.go:26-39``); these
operators are the streaming-analytics capability a log pipeline needs
on top.

Ordering assumption: within a key, rows are processed in
``(ts, event_id)`` order — the deterministic strengthening of the
reference's per-chunk wire order (``defaultreader/reader.go:85-103``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sessionize(ds, gap_seconds: int = 1800, key_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id"):
    """Session windows: a new session starts when the gap from the
    previous event of the same key exceeds ``gap_seconds``.

    Returns one row per session: (user_id, session_id, n_events,
    first_event, last_event) with session_id numbered 0.. per key in
    time order.

    Shape: ONE hash-bucket exchange on the key, then segmented pandas
    kernels over every key in the bucket at once (groupby-diff →
    per-key cumsum → one grouped agg) — a native groupby(key) would
    dispatch one pandas group per key, and per-group overhead
    dominates at corpus-scale key cardinality. NULL keys form one
    partition (SQL PARTITION BY semantics, dropna=False).
    """
    from fluent_server_ray.stages.assembly import _with_bucket

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col])
        grp = g.groupby(key_col, sort=False, dropna=False)
        gap = grp[ts_col].diff().dt.total_seconds().fillna(0.0)
        new_s = gap > gap_seconds
        sid = new_s.groupby(g[key_col], sort=False,
                            dropna=False).cumsum().astype("int64")
        out = (g.assign(_sid=sid)
               .groupby([key_col, "_sid"], sort=False, dropna=False)
               .agg(n_events=(id_col, "size"),
                    first_event=(id_col, "min"),
                    last_event=(id_col, "max"))
               .reset_index()
               .rename(columns={"_sid": "session_id"}))
        return out[[key_col, "session_id", "n_events",
                    "first_event", "last_event"]]

    cols = [key_col, ts_col, id_col]
    bucketed = _with_bucket(ds.select_columns(cols), key_col, 64)
    return bucketed.groupby("_bucket").map_groups(per_bucket,
                                                  batch_format="pandas")


def sessionize_sql(gap_seconds: int = 1800, table: str = "events") -> str:
    return f"""
WITH gapped AS (
  SELECT user_id, event_id, ts,
    CASE WHEN epoch(ts - lag(ts) OVER w) > {gap_seconds} THEN 1 ELSE 0 END AS new_s
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, event_id,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gapped
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
  count(*) AS n_events,
  min(event_id) AS first_event, max(event_id) AS last_event
FROM sessions GROUP BY user_id, session_id
""".strip()


def tumbling_counts(ds, width_seconds: int = 3600, key_col: str = "event_type",
                    ts_col: str = "ts"):
    """Tumbling event-time windows: count per (key, window_start).
    Expressed without map_groups: the window id is a row-wise column,
    then it's a plain grouped count (partial+final via grouped_counts'
    combiner pattern) — the fully-shuffle-minimal shape."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_counts

    def add_window(t: pa.Table) -> pa.Table:
        # canonicalize the STORAGE unit first: a timestamp[ns] column
        # (the forward-protocol source emits ns) would otherwise yield
        # 'seconds' that are off 1000x; us matches the SQL epoch_us
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        secs = pc.divide(us, 1_000_000)
        win = pc.multiply(pc.divide(secs, width_seconds), width_seconds)
        return pa.table({key_col: t[key_col], "window_start": win})

    win_ds = ds.map_batches(add_window, batch_format="pyarrow",
                            zero_copy_batch=True)
    return grouped_counts(win_ds, [key_col, "window_start"])


def tumbling_counts_sql(width_seconds: int = 3600, table: str = "events",
                        key_col: str = "event_type") -> str:
    return f"""
SELECT {key_col},
  ((epoch_us(ts) // 1000000) // {width_seconds}) * {width_seconds} AS window_start,
  count(*) AS n
FROM {table} GROUP BY 1, 2
""".strip()


def asof_prior_event(ds, left_type: str = "error", right_type: str = "click",
                     key_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id"):
    """As-of join within a key: for each `left_type` event, the most
    recent `right_type` event of the same key at-or-before its
    timestamp (≤, pandas merge_asof semantics = SQL ASOF JOIN).

    Partitioning: one groupby shuffle on the key; both sides co-locate
    in the same group (rows carry their type), then a per-group sorted
    merge_asof. Assumes timestamps are unique per key (ties would be
    engine-dependent); the reference carries event time but never
    compares it (SURVEY.md §2.10) — this is a beyond-reference
    streaming-analytics operator.
    """
    import pandas as pd

    pcol = "prior_" + right_type

    # dtype canonicalization: the prior-event id is float64 (NaN for
    # "no prior"), matching what a nullable BIGINT becomes in pandas —
    # so the engine and any SQL oracle produce byte-identical frames.
    # float64 is exact only up to 2^53 — ids beyond that
    # (snowflake-style) would silently corrupt, so the cast asserts and
    # fails LOUDLY; such corpora need a nullable-Int64 variant on BOTH
    # sides (engine + oracle CAST).
    _ID_MAX = float(1 << 53)

    return _asof_event(ds, left_type, right_type, key_col, ts_col,
                       id_col, pcol, direction="backward",
                       tolerance=None, id_max=_ID_MAX)


def _asof_event(ds, left_type: str, right_type: str, key_col: str,
                ts_col: str, id_col: str, out_col: str, direction: str,
                tolerance, id_max: float, n_buckets: int = 64):
    """Shared as-of body: ONE hash-bucket exchange on the key, then a
    single ``pd.merge_asof(by=key)`` per bucket — every key in the
    bucket merges in one C pass (a native groupby(key) would dispatch
    one pandas group per key; per-group overhead dominates at corpus
    scale). ``tolerance`` (seconds, optional) bounds the match
    distance; right-side ties on ts break by (ts, id) sort order."""
    import pandas as pd

    from fluent_server_ray.stages.assembly import _with_bucket

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        nums = pd.to_numeric(g[id_col], errors="coerce").abs()
        # >= not >: the comparison itself upcasts int64 to float64, so
        # 2^53+1 rounds DOWN to exactly 2^53 and a strict > would wave
        # through the first lossy value; rejecting the (representable)
        # boundary too is the conservative price
        if (nums >= id_max).any():
            raise ValueError(
                f"asof join: {id_col} exceeds 2^53; the float64 "
                "matched-id representation would lose precision — use "
                "a nullable-Int64 variant on both engine and oracle "
                "sides"
            )
        lg = g[g["event_type"] == left_type].sort_values([ts_col, id_col])
        rg = g[g["event_type"] == right_type].sort_values([ts_col, id_col])
        if lg.empty:
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"),
                 out_col: pd.Series(dtype="float64")}
            )
        if rg.empty:
            return pd.DataFrame(
                {id_col: lg[id_col].to_numpy(dtype="int64"),
                 out_col: np.full(len(lg), np.nan)}
            )
        m = pd.merge_asof(
            lg[[key_col, ts_col, id_col]],
            rg[[key_col, ts_col, id_col]].rename(columns={id_col: out_col}),
            on=ts_col,
            by=key_col,
            direction=direction,
            tolerance=tolerance,
            allow_exact_matches=True,
        )
        return m[[id_col, out_col]].astype(
            {id_col: "int64", out_col: "float64"}
        )

    cols = [key_col, ts_col, id_col, "event_type"]
    bucketed = _with_bucket(ds.select_columns(cols), key_col, n_buckets)
    out = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
    # map_groups emits buckets in nondeterministic order; pin the output
    # order (id_col is unique — a total order) so value hashes are stable.
    return out.sort(id_col)


def asof_next_event(ds, left_type: str = "error", right_type: str = "click",
                    tolerance_seconds: int = 1800,
                    key_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id"):
    """FORWARD as-of join with a match-distance bound: for each
    `left_type` event, the EARLIEST `right_type` event of the same key
    at-or-after its timestamp and within ``tolerance_seconds`` — the
    "did a click follow this error soon enough" remediation probe (the
    time-reversed sibling of :func:`asof_prior_event`; DuckDB's ASOF
    JOIN can't carry the tolerance, so the oracle is the exact
    row_number formulation)."""
    import pandas as pd

    return _asof_event(ds, left_type, right_type, key_col, ts_col,
                       id_col, "next_" + right_type,
                       direction="forward",
                       tolerance=pd.Timedelta(seconds=tolerance_seconds),
                       id_max=float(1 << 53))


def asof_next_event_sql(left_type: str = "error",
                        right_type: str = "click",
                        tolerance_seconds: int = 1800,
                        table: str = "events") -> str:
    """Exact forward-asof-with-tolerance oracle: rank candidate rights
    per left by (ts, id) and keep rank 1 (ASOF JOIN allows only one
    inequality, so the tolerance needs the general formulation)."""
    return f"""
WITH lefts AS (SELECT * FROM {table} WHERE event_type = '{left_type}'),
rights AS (SELECT * FROM {table} WHERE event_type = '{right_type}'),
pairs AS (
  SELECT e.event_id, c.event_id AS cid,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY c.ts, c.event_id) AS rn
  FROM lefts e JOIN rights c
    ON c.user_id = e.user_id
   AND c.ts >= e.ts
   AND c.ts <= e.ts + INTERVAL {tolerance_seconds} SECOND
)
SELECT e.event_id,
       CAST(p.cid AS DOUBLE) AS next_{right_type}
FROM lefts e LEFT JOIN (SELECT event_id, cid FROM pairs WHERE rn = 1) p
  USING (event_id)
ORDER BY e.event_id
""".strip()


def asof_prior_event_sql(left_type: str = "error", right_type: str = "click",
                         table: str = "events") -> str:
    """LEFT ASOF JOIN so lefts with no prior right survive with NULL
    (matching merge_asof). The prior id is CAST to DOUBLE and the rows
    ORDERed so dtype + row order match the engine exactly (nullable
    BIGINT → float64 with NaN in pandas)."""
    return f"""
SELECT e.event_id, CAST(c.event_id AS DOUBLE) AS prior_{right_type}
FROM (SELECT * FROM {table} WHERE event_type = '{left_type}') e
ASOF LEFT JOIN (SELECT * FROM {table} WHERE event_type = '{right_type}') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
ORDER BY e.event_id
""".strip()


def range_join(left_ds, right_ds, key_col: str, ts_col: str = "ts",
               lo_col: str = "lo", hi_col: str = "hi", n_buckets: int = 32):
    """Keyed range join: left rows matched to right INTERVALS of the
    same key where ``lo <= ts < hi`` (the "which window contains this
    event" primitive).

    Layout: ONE co-located shuffle on the key (the shared
    ``joins.cogrouped`` exchange — both sides move once), then
    per-key vectorized matching inside each bucket: intervals sort by
    ``lo`` and each event's candidate window span comes from two
    ``np.searchsorted`` probes against ``[ts - max_width, ts]`` —
    O((E+W)·log W + matches) per key, never the E×W cross product a
    join-then-filter would expand before filtering. Output: left
    columns + the matched interval's columns (inner semantics; events
    in no window drop out).

    Skew note: a key whose deeply-overlapping windows each contain
    most events has output ~E×W — that blowup is the answer itself,
    not an artifact; salt upstream if one key dominates.
    """
    from fluent_server_ray.stages.joins import canonical_dtype_map, cogrouped

    both, lcols, rcols, lfields, rfields = cogrouped(
        left_ds, right_ds, key_col, key_col, n_buckets
    )
    overlap = (set(lcols) & set(rcols)) - {key_col}
    if overlap:
        raise ValueError(
            f"range_join: columns {sorted(overlap)} exist on BOTH sides; "
            "the co-grouped union schema would collapse them (silent "
            "overwrite) — rename the right side's copies first"
        )
    rcols_out = [c for c in rcols if c != key_col]
    # column-level canonical dtypes (shared policy with
    # bucketed_hash_join: empty buckets must not flip the block schema)
    dtype_map = canonical_dtype_map(lfields + rfields)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][lcols]
        rg = g[g["_side"] == 1][rcols]
        outs = []
        rg_by_key = dict(tuple(rg.groupby(key_col, sort=False)))
        for key, le in lg.groupby(key_col, sort=False):
            ri = rg_by_key.get(key)
            if ri is None or not len(ri):
                continue
            # null bounds never match (SQL comparison semantics) and
            # would poison max_w/searchsorted — drop them up front
            ri = ri.dropna(subset=[lo_col, hi_col]).sort_values(lo_col)
            if not len(ri):
                continue
            los = ri[lo_col].to_numpy()
            his = ri[hi_col].to_numpy()
            # inverted intervals (lo > hi) match nothing; a negative
            # max_w would make a > b below and np.repeat(-1) crash the
            # task, so clamp the scan width at a typed zero (hit
            # filtering still excludes the inverted rows themselves)
            max_w = (his - los).max()
            zero_w = max_w - max_w
            if max_w < zero_w:
                max_w = zero_w
            ts = le[ts_col].to_numpy()
            # candidate windows: lo in (ts - max_width, ts]
            a = np.searchsorted(los, ts - max_w, side="right")
            b = np.searchsorted(los, ts, side="right")
            n_cand = np.maximum(b - a, 0)
            if not n_cand.sum():
                continue
            li = np.repeat(np.arange(len(le)), n_cand)
            wi = np.concatenate(
                [np.arange(x, y) for x, y in zip(a, b) if y > x]
            )
            hit = his[wi] > ts[li]  # lo <= ts already by construction
            li, wi = li[hit], wi[hit]
            out = le.iloc[li].reset_index(drop=True)
            for c in rcols_out:
                out[c] = ri[c].to_numpy()[wi]
            outs.append(out)
        if not outs:
            empty = pd.DataFrame(columns=lcols + rcols_out)
            return empty.astype(
                {c: d for c, d in dtype_map.items() if c in empty.columns}
            )
        res = pd.concat(outs, ignore_index=True)
        return res.astype(
            {c: d for c, d in dtype_map.items() if c in res.columns}
        )

    return both.groupby("_bucket").map_groups(per_bucket,
                                              batch_format="pandas")


def sliding_counts(ds, width_seconds: int = 3600, slide_seconds: int = 1800,
                   key_col: str = "event_type", ts_col: str = "ts"):
    """Sliding event-time windows: count per (key, window_start) where
    each row belongs to width/slide overlapping windows.

    Row-wise explode, fully vectorized: for each of the width//slide
    phase shifts, the row's window start is one integer expression —
    the explode is a concat of per-phase projections (no Python rows),
    then the combiner-counts pattern. width must be a multiple of
    slide.
    """
    assert width_seconds % slide_seconds == 0
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_counts

    n_phases = width_seconds // slide_seconds

    def explode(t: pa.Table) -> pa.Table:
        # canonicalize the STORAGE unit first: a timestamp[ns] column
        # (the forward-protocol source emits ns) would otherwise yield
        # 'seconds' that are off 1000x; us matches the SQL epoch_us
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        secs = pc.divide(us, 1_000_000)
        parts = []
        for phase in range(n_phases):
            shift = phase * slide_seconds
            base = pc.subtract(secs, shift)
            win = pc.add(
                pc.multiply(pc.divide(base, width_seconds), width_seconds),
                shift,
            )
            parts.append(pa.table({key_col: t[key_col], "window_start": win}))
        return pa.concat_tables(parts)

    win_ds = ds.map_batches(explode, batch_format="pyarrow",
                            zero_copy_batch=True)
    return grouped_counts(win_ds, [key_col, "window_start"])


FUNNEL_WINDOW_SECONDS = 86400


def funnel(ds, start_type: str = "signup", goal_type: str = "purchase",
           within_seconds: int = FUNNEL_WINDOW_SECONDS,
           key_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type", n_buckets: int = 64):
    """Conversion-funnel analysis: for every key with at least one
    ``start_type`` event, did a ``goal_type`` event occur within
    ``within_seconds`` AFTER the first start? (signup→purchase,
    error→restart, view→click — the sequence-pattern query the
    reference's forever-accumulating mirror can never answer,
    ``mirror/mirror.go:26-39``.)

    Physical shape: the read pushes ``event_type IN (start, goal)`` so
    only the two funnel stages leave storage; ONE hash-bucket exchange
    on the key co-locates each key's events; inside a bucket the
    first-start (groupby min) and the goal probe (merge + interval
    mask + isin) are whole-bucket pandas C kernels. Output:
    (key, first_<start>_ts, converted) sorted by key.
    """
    from fluent_server_ray.stages.assembly import _with_bucket

    first_col = f"first_{start_type}_ts"

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        first = (g.loc[g[type_col] == start_type]
                  .groupby(key_col, sort=False)[ts_col].min())
        goals = g.loc[g[type_col] == goal_type, [key_col, ts_col]]
        gm = goals.merge(first.rename("_a"), left_on=key_col,
                         right_index=True)
        hit = gm.loc[
            (gm[ts_col] >= gm["_a"])
            & (gm[ts_col] <= gm["_a"] + pd.Timedelta(seconds=within_seconds)),
            key_col,
        ].unique()
        return pd.DataFrame(
            {
                key_col: first.index.to_numpy(),
                first_col: first.to_numpy(),
                "converted": first.index.isin(hit),
            }
        )

    cols = [key_col, type_col, ts_col]
    bucketed = _with_bucket(ds.select_columns(cols), key_col, n_buckets)
    out = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
    return out.sort(key_col)


def funnel_sql(start_type: str = "signup", goal_type: str = "purchase",
               within_seconds: int = FUNNEL_WINDOW_SECONDS,
               table: str = "events") -> str:
    first_col = f"first_{start_type}_ts"
    return f"""
WITH fa AS (
  SELECT user_id, min(ts) AS {first_col} FROM {table}
  WHERE event_type = '{start_type}' GROUP BY user_id
), hit AS (
  SELECT DISTINCT fa.user_id FROM fa JOIN {table} e
    ON e.user_id = fa.user_id AND e.event_type = '{goal_type}'
   AND e.ts >= fa.{first_col}
   AND e.ts <= fa.{first_col} + INTERVAL {within_seconds} SECOND
)
SELECT fa.user_id, fa.{first_col},
  fa.user_id IN (SELECT user_id FROM hit) AS converted
FROM fa ORDER BY fa.user_id
""".strip()


def window_distinct_users(ds, width_seconds: int = 3600,
                          key_col: str = "user_id", ts_col: str = "ts",
                          n_buckets: int = 64):
    """EXACT distinct-count per tumbling window (distinct users per
    hour — the cardinality dashboard query; the mergeable-sketch
    sibling is ``sketches.hll_distinct`` when ±2% error is fine).

    Two-level distinct: per-batch local dedup of (window, key) pairs
    (Arrow ``group_by`` — collapses within-batch repeats before
    anything moves), then one hash-bucket exchange on the key
    (co-locating every remaining duplicate of a pair) with a
    whole-bucket ``drop_duplicates``, then a bounded per-window count
    via the grouped-counts combiner. Only distinct (window, key) pairs
    ever shuffle — at 100 TB that is |windows×active users|, not rows.
    Output: (window_start, n_users).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import (grouped_counts,
                                                    hash_bucket_array,
                                                    skip_empty)

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        secs = pc.divide(us, 1_000_000)
        win = pc.multiply(pc.divide(secs, width_seconds), width_seconds)
        pairs = pa.table({"window_start": win, key_col: t[key_col]})
        u = pairs.group_by(["window_start", key_col]).aggregate([])
        return u.append_column(
            "_bucket", pa.array(hash_bucket_array(u[key_col], n_buckets))
        )

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["window_start", key_col])[
            ["window_start", key_col]
        ]

    pairs = (
        ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(bucket_distinct, batch_format="pandas")
    )
    counts = grouped_counts(pairs, ["window_start"])
    return counts.rename_columns(["window_start", "n_users"]).sort_by(
        [("window_start", "ascending")]
    )


def window_distinct_users_sql(width_seconds: int = 3600,
                              table: str = "events") -> str:
    return f"""
SELECT ((epoch_us(ts) // 1000000) // {width_seconds}) * {width_seconds}
         AS window_start,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM {table} GROUP BY 1 ORDER BY 1
""".strip()


def late_flags(ds, delay_seconds: int = 1800, ts_col: str = "ts",
               id_col: str = "event_id"):
    """Watermark late-data flagging — the late-arrival handling the
    reference lacks entirely (it carries event time but never compares
    it to anything, SURVEY §2.10): ``watermark = max(event_time) -
    delay``; rows strictly before the watermark are flagged late (a
    live pipeline would route them to a quarantine sink via the same
    tag-router).

    Two passes, both narrow: a per-batch max combiner reduces to ONE
    timestamp on the driver (O(blocks) rows), the watermark broadcasts
    as a plain scalar inside the flag closure, and the flag itself is
    a pure vectorized comparison — no shuffle anywhere."""
    import datetime

    import pyarrow as pa
    import pyarrow.compute as pc

    def max_part(t: pa.Table):
        if len(t) == 0:
            return
        col = t[ts_col]
        yield pa.table(
            {ts_col: pa.array([pc.max(col).as_py()], type=col.type)}
        )

    parts = ds.map_batches(max_part, batch_format="pyarrow",
                           zero_copy_batch=True)
    max_ts = None
    ts_type = None
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        v = b[ts_col][0].as_py()
        ts_type = b[ts_col].type
        if max_ts is None or v > max_ts:
            max_ts = v
    if max_ts is None:
        # empty corpus: no watermark exists — emit a TYPED empty result
        # (mapping the empty blocks would lose the schema entirely)
        import ray.data as rd

        sch = ds.schema()
        id_type = dict(zip(sch.names, sch.types))[id_col]
        return rd.from_arrow(
            pa.table({id_col: pa.array([], type=id_type),
                      "is_late": pa.array([], type=pa.bool_())})
        )
    wm = max_ts - datetime.timedelta(seconds=delay_seconds)
    wm_scalar = pa.scalar(wm, type=ts_type)

    def flag(t: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: t[id_col],
             "is_late": pc.less(t[ts_col], wm_scalar)}
        )

    return ds.map_batches(flag, batch_format="pyarrow",
                          zero_copy_batch=True)


def late_flags_sql(delay_seconds: int = 1800, table: str = "events") -> str:
    return (
        f"SELECT event_id, ts < (SELECT max(ts) - INTERVAL {delay_seconds}"
        f" SECOND FROM {table}) AS is_late FROM {table}"
    )


def sliding_counts_sql(width_seconds: int = 3600, slide_seconds: int = 1800,
                       table: str = "events") -> str:
    n_phases = width_seconds // slide_seconds
    selects = []
    for phase in range(n_phases):
        shift = phase * slide_seconds
        selects.append(
            f"SELECT event_type, "
            f"(((epoch_us(ts) // 1000000) - {shift}) // {width_seconds})"
            f" * {width_seconds} + {shift} AS window_start FROM {table}"
        )
    union = "\nUNION ALL\n".join(selects)
    return (
        f"SELECT event_type, window_start, count(*) AS n FROM (\n{union}\n)"
        " GROUP BY event_type, window_start"
    )


def window_topk(ds, key_col: str = "tag", ts_col: str = "ts",
                width_seconds: int = 3600, k: int = 3,
                n_buckets: int = 64):
    """Trending keys: top-``k`` keys per tumbling event-time window by
    count (the dashboard/alerting shape over the routed stream).

    Scale shape: row-wise window id + the grouped-count combiner
    (shuffle carries (key, window, n) partials, never raw rows) merged
    through Ray's distributed groupby (windows are unbounded over a
    10^12-turn stream — never a driver merge), then ONE hash-bucket
    exchange on ``window_start`` with a per-bucket vectorized rank
    (segmented cumcount over every window in the bucket at once).
    Deterministic tie-break (n DESC, key ASC). Output:
    (key_col, window_start, n, rank)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_counts
    from fluent_server_ray.stages.assembly import _with_bucket

    def add_window(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        secs = pc.divide(us, 1_000_000)
        win = pc.multiply(pc.divide(secs, width_seconds), width_seconds)
        return pa.table({key_col: t[key_col], "window_start": win})

    win_ds = ds.map_batches(add_window, batch_format="pyarrow",
                            zero_copy_batch=True)
    counts = grouped_counts(win_ds, [key_col, "window_start"], final="ray")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["window_start", "n", key_col],
                          ascending=[True, False, True])
        # dropna=False: a NULL-ts row yields a NULL window, which SQL's
        # PARTITION BY ranks as its own partition — pandas would DROP
        # the NaN group and the later astype(int64) would crash on NaN
        rank = g.groupby("window_start", sort=False,
                         dropna=False).cumcount() + 1
        g = g.assign(rank=rank.astype("int64"))
        return g.loc[g["rank"] <= k,
                     [key_col, "window_start", "n", "rank"]]

    bucketed = _with_bucket(counts, "window_start", n_buckets)
    return bucketed.groupby("_bucket").map_groups(per_bucket,
                                                  batch_format="pandas")


def window_topk_sql(key_col: str = "tag", ts_col: str = "ts",
                    width_seconds: int = 3600, k: int = 3,
                    table: str = "routed") -> str:
    return f"""
SELECT {key_col}, window_start, n, CAST(rank AS BIGINT) AS rank FROM (
  SELECT {key_col}, window_start, n,
         row_number() OVER (PARTITION BY window_start
                            ORDER BY n DESC, {key_col}) AS rank
  FROM (
    SELECT {key_col},
      ((epoch_us({ts_col}) // 1000000) // {width_seconds}) * {width_seconds}
        AS window_start,
      count(*) AS n
    FROM {table} GROUP BY 1, 2
  )
) WHERE rank <= {k}
""".strip()


def retention_cohorts(ds, width_seconds: int = 604800,
                      key_col: str = "user_id", ts_col: str = "ts",
                      n_buckets: int = 64):
    """Cohort retention: users grouped by the window of their FIRST
    event (the cohort), counted in every later window they appear in —
    the (cohort, offset) retention triangle every growth dashboard
    draws, and for training-data pipelines the contributor-churn view
    of a crawl (how long a source keeps producing).

    Scale shape (user cardinality is O(rows) — no driver merge of
    per-user state): per-batch DISTINCT (key, window) pairs via Arrow
    ``group_by`` (the combiner — a user's thousandth event this week
    moves nothing), ONE hash-bucket exchange on the key co-locates
    each user's windows, and inside a bucket the cohort (min window,
    a ``transform('min')``) and offsets are whole-bucket C kernels
    emitting (cohort, offset) partial counts. The final merge is the
    grouped-counts combiner over a BOUNDED key space (windows²/2).
    Output: (cohort_window, window_offset, n_users) sorted.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.assembly import _with_bucket

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        win = pc.divide(us, width_seconds * 1_000_000)
        pairs = pa.table({key_col: t[key_col], "_w": win})
        return pairs.group_by([key_col, "_w"]).aggregate([])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([key_col, "_w"])
        cohort = g.groupby(key_col, sort=False)["_w"].transform("min")
        out = pd.DataFrame({
            "cohort_window": cohort.to_numpy(),
            "window_offset": (g["_w"] - cohort).to_numpy(),
        })
        part = out.value_counts(["cohort_window", "window_offset"],
                                sort=False).reset_index(name="n_users")
        part["n_users"] = part["n_users"].astype("int64")
        return part

    pairs = ds.select_columns([key_col, ts_col]).map_batches(
        skip_empty(partial), batch_format="pyarrow", zero_copy_batch=True)
    bucketed = _with_bucket(pairs, key_col, n_buckets)
    parts = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                   batch_format="pandas")
    from fluent_server_ray.stages.aggregate import grouped_agg

    out = grouped_agg(parts, ["cohort_window", "window_offset"],
                      [("n_users", "sum")], final="driver")
    return out.rename_columns(
        ["cohort_window", "window_offset", "n_users"])


def retention_cohorts_sql(width_seconds: int = 604800,
                          key_col: str = "user_id", ts_col: str = "ts",
                          table: str = "events") -> str:
    return f"""
WITH uw AS (
  SELECT DISTINCT {key_col},
    (epoch_us({ts_col}) // 1000000) // {width_seconds} AS w
  FROM {table}
), c AS (
  SELECT {key_col}, min(w) AS cohort_window FROM uw GROUP BY {key_col}
)
SELECT c.cohort_window, uw.w - c.cohort_window AS window_offset,
  CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN c USING ({key_col})
GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def window_anomalies(ds, width_seconds: int = 3600,
                     threshold: float = 2.0,
                     key_col: str = "event_type",
                     ts_col: str = "ts") -> pa.Table:
    """Traffic-spike detection — the monitoring query a log pipeline
    exists for: tumbling per-(key, window) counts, standardized within
    each key, windows with |z| ≥ ``threshold`` flagged.

    The DISTRIBUTED part is the count (:func:`tumbling_counts`'
    combiner shape — raw events shuffle as tiny partials only); the
    z-scoring then runs on the bounded (keys × windows) count table
    with the exact-integer moment tree of ``features.grouped_zscore``
    (int sums in arbitrary-precision Python, one float derivation
    mirrored verbatim in SQL). Windows with no events have no row and
    therefore don't pull the mean down (documented; densify upstream
    if zero-windows should count). Zero-variance keys flag nothing.
    Output: (key, window_start, n, z) sorted."""
    import math

    import pyarrow as pa

    wc = tumbling_counts(ds, width_seconds, key_col, ts_col)
    if len(wc) == 0:
        return pa.table({key_col: pa.array([], type=pa.string()),
                         "window_start": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64()),
                         "z": pa.array([], type=pa.float64())})
    keys = wc[key_col].to_pylist()
    cents = [int(v) * 100 for v in wc["n"].to_pylist()]
    acc: dict = {}
    for g, c in zip(keys, cents):
        n, s, ss = acc.get(g, (0, 0, 0))
        acc[g] = (n + 1, s + c, ss + c * c)
    stats = {}
    for g, (n, s, ss) in acc.items():
        mean = float(s) / float(n)
        var = float(ss) / float(n) - mean * mean
        stats[g] = (mean, math.sqrt(var) if var > 0 else None)
    out_k, out_w, out_n, out_z = [], [], [], []
    wins = wc["window_start"].to_pylist()
    ns = wc["n"].to_pylist()
    for g, w, n_, c in zip(keys, wins, ns, cents):
        mean, std = stats[g]
        if std is None:
            continue
        z = (float(c) - mean) / std
        if abs(z) >= threshold:
            out_k.append(g)
            out_w.append(w)
            out_n.append(n_)
            out_z.append(z)
    out = pa.table({key_col: pa.array(out_k, type=pa.string()),
                    "window_start": pa.array(out_w, type=pa.int64()),
                    "n": pa.array(out_n, type=pa.int64()),
                    "z": pa.array(out_z, type=pa.float64())})
    return out.sort_by([(key_col, "ascending"),
                        ("window_start", "ascending")])


def window_anomalies_sql(width_seconds: int = 3600,
                         threshold: float = 2.0,
                         table: str = "events",
                         key_col: str = "event_type") -> str:
    return f"""
WITH wc AS (
  {tumbling_counts_sql(width_seconds, table, key_col)}
), c AS (
  SELECT {key_col}, window_start, n,
         CAST(n * 100 AS BIGINT) AS cents
  FROM wc
), m AS (
  SELECT {key_col},
    CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean,
    CAST(sum(cents * cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS ex2
  FROM c GROUP BY {key_col}
)
SELECT c.{key_col}, c.window_start, c.n,
  (CAST(c.cents AS DOUBLE) - m.mean) / sqrt(m.ex2 - m.mean * m.mean) AS z
FROM c JOIN m USING ({key_col})
WHERE m.ex2 - m.mean * m.mean > 0
  AND abs((CAST(c.cents AS DOUBLE) - m.mean)
          / sqrt(m.ex2 - m.mean * m.mean)) >= {threshold}
ORDER BY {key_col}, window_start
""".strip()


def throttle(ds, key_col: str = "event_type", ts_col: str = "ts",
             id_col: str = "event_id", width_seconds: int = 600,
             limit: int = 5, n_buckets: int = 64):
    """fluent-plugin-throttle semantics: keep at most ``limit`` events
    per (key, tumbling window), first-come by ``(ts, id)`` — the
    rate-limit stage in front of a paid sink (alerting, indexing).

    Shape: the window id is a row-wise column (same epoch arithmetic
    as :func:`tumbling_counts` — byte-identical to the SQL mirror),
    then ONE hash-bucket exchange on the key co-locates each (key,
    window) partition; inside a bucket the quota is one vectorized
    ``groupby.cumcount() < limit`` over every partition at once. NULL
    keys form their own partition (SQL ``PARTITION BY``). Output: the
    SURVIVING rows (id, key, window_start), sorted by id.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.assembly import _with_bucket

    def add_window(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        secs = pc.divide(us, 1_000_000)
        win = pc.multiply(pc.divide(secs, width_seconds), width_seconds)
        return pa.table({
            id_col: t[id_col], key_col: t[key_col],
            "window_start": win,
            "_us": us,  # tie-break at full precision, not window secs
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_us", id_col])
        seq = g.groupby([key_col, "window_start"], sort=False,
                        dropna=False).cumcount()
        out = g.loc[seq < limit, [id_col, key_col, "window_start"]]
        return out

    win_ds = ds.map_batches(add_window, batch_format="pyarrow",
                            zero_copy_batch=True)
    bucketed = _with_bucket(win_ds, key_col, n_buckets)
    out = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
    return out.sort(id_col)


def throttle_sql(key_col: str = "event_type", ts_col: str = "ts",
                 id_col: str = "event_id", width_seconds: int = 600,
                 limit: int = 5, table: str = "events") -> str:
    return f"""
SELECT {id_col}, {key_col}, window_start FROM (
  SELECT {id_col}, {key_col},
    ((epoch_us({ts_col}) // 1000000) // {width_seconds})
      * {width_seconds} AS window_start,
    row_number() OVER (
      PARTITION BY {key_col},
        ((epoch_us({ts_col}) // 1000000) // {width_seconds})
      ORDER BY {ts_col}, {id_col}) AS rn
  FROM {table}
)
WHERE rn <= {limit}
ORDER BY {id_col}
""".strip()


def rolling_agg(ds, k: int = 5, key_col: str = "user_id",
                ts_col: str = "ts", id_col: str = "event_id",
                value_col: str = "value", n_buckets: int = 64):
    """Per-key rolling aggregate over the last ``k`` rows (inclusive),
    ordered by ``(ts, id)`` — the moving-average feature of per-user
    behavioral pipelines (``ROWS k-1 PRECEDING`` in SQL).

    Integer-exact contract: the value floors to int64 MICROS
    (``floor(value · 1e6)`` — one IEEE multiply + floor, identical on
    both engines), rolling sums are int64 cumsum differences (never a
    float accumulation whose order could drift), and the exposed mean
    is ONE float64 division. NULL values follow SQL window semantics:
    excluded from sum and count; an all-NULL window yields NULL sum
    and mean. NULL keys form their own partition.

    Shape: ONE hash-bucket exchange on the key co-locates each key's
    rows; inside a bucket the rolling window is a vectorized
    cumsum-minus-shift over the whole sorted bucket (a row ``k`` back
    is in the same key iff its cumcount ≥ k — the frame never needs a
    per-key Python loop). Rows carry only (id, key, ts-micros, value
    micros). Output: (id, key, roll_sum_micros, roll_n, roll_mean)
    sorted by id.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.assembly import _with_bucket

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        vm = pc.floor(pc.multiply(pc.cast(t[value_col], pa.float64()),
                                  pa.scalar(1_000_000.0)))
        return pa.table({
            id_col: t[id_col], key_col: t[key_col], "_us": us,
            "_vm": pc.cast(vm, pa.int64()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "_us", id_col],
                          na_position="first").reset_index(drop=True)
        grp = g.groupby(key_col, sort=False, dropna=False)
        seq = grp.cumcount().to_numpy()
        s = g["_vm"]
        nn = s.notna().to_numpy()
        vm_filled = s.fillna(0).to_numpy(dtype="int64")
        cs = np.cumsum(vm_filled)
        cn = np.cumsum(nn.astype(np.int64))
        # window width w = min(seq+1, k); the exclusive prefix row is
        # idx-w — for seq < k that is the row just BEFORE this key's
        # first row (the global cumsum there is exactly the prior
        # keys' prefix), for seq >= k it is the same key k rows back
        idx = np.arange(len(g))
        w = np.minimum(seq + 1, k)
        pidx = idx - w
        valid = pidx >= 0
        prev_cs = np.where(valid, cs[np.maximum(pidx, 0)], 0)
        prev_cn = np.where(valid, cn[np.maximum(pidx, 0)], 0)
        roll_sum = cs - prev_cs
        roll_n = cn - prev_cn
        mean = np.where(roll_n > 0,
                        roll_sum.astype(np.float64)
                        / np.maximum(roll_n, 1).astype(np.float64),
                        np.nan)
        out = pd.DataFrame({
            id_col: g[id_col],
            key_col: g[key_col],
            "roll_sum_micros": pd.array(roll_sum, dtype="Int64"),
            "roll_n": roll_n,
            "roll_mean": mean,
        })
        out.loc[roll_n == 0, "roll_sum_micros"] = pd.NA
        return out

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    bucketed = _with_bucket(prepped, key_col, n_buckets)
    out = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
    return out.sort(id_col)


def rolling_agg_sql(k: int = 5, key_col: str = "user_id",
                    ts_col: str = "ts", id_col: str = "event_id",
                    value_col: str = "value",
                    table: str = "events") -> str:
    return f"""
WITH v AS (
  SELECT {id_col}, {key_col}, {ts_col},
    CAST(floor({value_col} * 1000000) AS BIGINT) AS vm
  FROM {table}
)
SELECT {id_col}, {key_col},
  -- CAST: sum(BIGINT) is HUGEINT, which pandas fetches as float64
  -- ("6550000.0" vs the engine's "6550000" under the CSV hash)
  CAST(sum(vm) OVER w AS BIGINT) AS roll_sum_micros,
  count(vm) OVER w AS roll_n,
  CAST(sum(vm) OVER w AS DOUBLE) / nullif(count(vm) OVER w, 0)
    AS roll_mean
FROM v
WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
             ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)
ORDER BY {id_col}
""".strip()


def interarrival_gaps(ds, key_cols: tuple[str, ...] = ("user_id",
                                                       "event_type"),
                      ts_col: str = "ts", id_col: str = "event_id",
                      out_col: str = "gap_sec", n_buckets: int = 64):
    """Per-key inter-arrival gaps in whole seconds: for each
    ``key_cols`` group (e.g. a user's clicks), the differences between
    consecutive epoch-second values ordered by (second, id) — the raw
    material for burstiness/engagement-cadence dashboards. The first
    event of a group yields no row (SQL ``lag`` NULL).

    One hash-bucket exchange on the FIRST key column (a group's rows
    co-locate; the remaining key columns subsort inside the bucket),
    then a fully vectorized per-bucket sort + shifted diff. Emits
    (key_cols[-1], gap) rows — the downstream quantile sketch needs
    only the grouping label and the gap.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)

    def prep(t: pa.Table) -> pa.Table:
        sec = pc.divide(
            pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()),
            1_000_000)
        cols = {k: t[k] for k in key_cols}
        cols["_sec"] = sec
        cols["_id"] = t[id_col]
        out = pa.table(cols)
        return out.append_column(
            "_b", pa.array(hash_bucket_array(t[key_cols[0]], n_buckets)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ks = list(key_cols)
        g = g.sort_values(ks + ["_sec", "_id"],
                          kind="mergesort").reset_index(drop=True)
        gap = g["_sec"].diff()
        same = pd.Series(True, index=g.index)
        for k in ks:
            same &= g[k].eq(g[k].shift()) | (g[k].isna()
                                             & g[k].shift().isna())
        keep = same & gap.notna()
        out = pd.DataFrame({
            key_cols[-1]: g.loc[keep, key_cols[-1]],
            out_col: gap[keep].astype("int64"),
        })
        if not len(out):
            return pd.DataFrame({
                key_cols[-1]: pd.Series([], dtype=g[key_cols[-1]].dtype),
                out_col: pd.Series([], dtype="int64"),
            })
        return out

    return (
        ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
    )


def interarrival_gaps_subquery_sql(key_cols: tuple[str, ...] = (
        "user_id", "event_type"), ts_col: str = "ts",
        id_col: str = "event_id", out_col: str = "gap_sec",
        table: str = "events") -> str:
    """The gap extraction as a parenthesized FROM-able subquery — feed
    it to :func:`~fluent_server_ray.stages.sketches.grouped_binned_quantiles_sql`
    as its ``table``."""
    part = ", ".join(key_cols)
    return (
        f"(SELECT {key_cols[-1]}, sec - lag(sec) OVER ("
        f"PARTITION BY {part} ORDER BY sec, {id_col}) AS {out_col} "
        f"FROM (SELECT {part}, {id_col}, "
        f"epoch_us({ts_col}) // 1000000 AS sec FROM {table})) AS gaps"
    )


def touch_attribution(ds, target_type: str = "purchase",
                      touch_types: tuple = ("view", "click"),
                      window_sec: int = 86400,
                      key_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id", n_buckets: int = 64):
    """First/last-touch ATTRIBUTION: for every ``target_type`` event
    (the conversion), the earliest and latest ``touch_types`` event of
    the same key inside the lookback window ``[ts-W, ts]``, plus the
    touch count — the marketing / agent-action attribution query
    ("which view/click led to this purchase"), which needs BOTH ends
    of the window and so can't be served by a single as-of join.

    One hash-bucket exchange on the key; inside a bucket the whole
    answer is four ``pd.merge_asof(by=key)`` C kernels: (1) backward
    with tolerance=W → last touch, (2) forward from ``ts-W`` with
    tolerance=W → first touch, (3) backward unbounded over a per-key
    touch counter → touches ≤ ts, (4) strict-backward at ``ts-W`` →
    touches < ts-W; count = (3)-(4). Touch ties on ts break by
    (ts, id) — first takes the min id, last the max, mirroring SQL
    ``first(... ORDER BY ts, id)`` / ``last``. Matched ids ride as
    float64 (NaN = no touch, ids asserted < 2^53 — the shared
    nullable-int convention).

    Returns a Dataset (purchase_id, user_id, first_touch_id,
    first_touch_type, last_touch_id, last_touch_type, n_touches)
    sorted by purchase_id.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.groups import map_buckets

    w_us = int(window_sec) * 1_000_000
    keep = set(touch_types) | {target_type}

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"],
                              value_set=pa.array(sorted(keep))))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if len(ids) and float(np.abs(ids).max()) >= float(1 << 53):
            raise ValueError("touch_attribution: ids exceed 2^53 — "
                             "float64 matched-id would lose precision")
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            key_col: pc.cast(t[key_col], pa.int64()),
            "event_type": pc.cast(t["event_type"], pa.string()),
            "_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                           pa.int64()),
        })

    out_schema = pa.schema([
        pa.field("purchase_id", pa.int64()),
        pa.field(key_col, pa.int64()),
        pa.field("first_touch_id", pa.float64()),
        pa.field("first_touch_type", pa.string()),
        pa.field("last_touch_id", pa.float64()),
        pa.field("last_touch_type", pa.string()),
        pa.field("n_touches", pa.int64()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pur = g[g["event_type"] == target_type]
        # merge_asof wants the ON key sorted GLOBALLY (by= groups are
        # resolved internally); sorting (_us, id) keeps each key's
        # subsequence in (ts, id) order, which is the tie-break rule
        tou = (g[g["event_type"] != target_type]
               .sort_values(["_us", id_col],
                            kind="mergesort").reset_index(drop=True))
        if pur.empty:
            return pd.DataFrame({f.name: pd.Series(dtype=f.type.to_pandas_dtype())
                                 for f in out_schema}).astype(
                {"first_touch_type": "object", "last_touch_type": "object"})
        tou["_c"] = tou.groupby(key_col, sort=False).cumcount()
        base = pd.DataFrame({
            "purchase_id": pur[id_col].to_numpy(),
            key_col: pur[key_col].to_numpy(),
            "_us": pur["_us"].to_numpy(),
            "_lo": pur["_us"].to_numpy() - w_us,
        })
        rt = tou.rename(columns={id_col: "_tid", "event_type": "_tty"})
        rcols = [key_col, "_us", "_tid", "_tty", "_c"]

        def asof(left, on_left, on_right, direction, tol, allow_exact,
                 attach):
            lo = left.sort_values([on_left, "purchase_id"],
                                  kind="mergesort")
            r = rt[rcols].rename(columns={"_us": on_right}) \
                if on_right != "_us" else rt[rcols]
            m = pd.merge_asof(
                lo, r, left_on=on_left, right_on=on_right, by=key_col,
                direction=direction,
                tolerance=None if tol is None else tol,
                allow_exact_matches=allow_exact)
            return m.set_index("purchase_id")[attach]

        last = asof(base[["purchase_id", key_col, "_us"]], "_us", "_us",
                    "backward", w_us, True, ["_tid", "_tty"])
        first = asof(base[["purchase_id", key_col, "_lo"]], "_lo", "_us",
                     "forward", w_us, True, ["_tid", "_tty"])
        hi = asof(base[["purchase_id", key_col, "_us"]], "_us", "_us",
                  "backward", None, True, ["_c"])
        lo_c = asof(base[["purchase_id", key_col, "_lo"]], "_lo", "_us",
                    "backward", None, False, ["_c"])
        idx = base["purchase_id"].to_numpy()
        n_le = np.nan_to_num(hi["_c"].reindex(idx).to_numpy(),
                             nan=-1.0) + 1.0
        n_lt = np.nan_to_num(lo_c["_c"].reindex(idx).to_numpy(),
                             nan=-1.0) + 1.0
        return pd.DataFrame({
            "purchase_id": idx,
            key_col: base[key_col].to_numpy(),
            "first_touch_id": first["_tid"].reindex(idx).to_numpy(
                dtype="float64"),
            "first_touch_type": first["_tty"].reindex(idx).to_numpy(
                dtype=object),
            "last_touch_id": last["_tid"].reindex(idx).to_numpy(
                dtype="float64"),
            "last_touch_type": last["_tty"].reindex(idx).to_numpy(
                dtype=object),
            "n_touches": (n_le - n_lt).astype(np.int64),
        })

    pre_ds = ds.map_batches(skip_empty(pre), batch_format="pyarrow",
                            zero_copy_batch=True)
    bucketed = _with_bucket(pre_ds, key_col, n_buckets)
    out = map_buckets(bucketed, per_bucket, out_schema)
    return out.sort(["purchase_id"])


def touch_attribution_sql(target_type: str = "purchase",
                          touch_types: tuple = ("view", "click"),
                          window_sec: int = 86400,
                          table: str = "events") -> str:
    tt = ", ".join(f"'{t}'" for t in sorted(touch_types))
    w_us = int(window_sec) * 1_000_000
    return f"""
WITH t AS (
  SELECT * FROM {table} WHERE event_type IN ({tt})
), p AS (
  SELECT * FROM {table} WHERE event_type = '{target_type}'
)
SELECT p.event_id AS purchase_id, p.user_id,
  CAST(first(t.event_id ORDER BY t.ts, t.event_id) AS DOUBLE)
    AS first_touch_id,
  first(t.event_type ORDER BY t.ts, t.event_id) AS first_touch_type,
  CAST(last(t.event_id ORDER BY t.ts, t.event_id) AS DOUBLE)
    AS last_touch_id,
  last(t.event_type ORDER BY t.ts, t.event_id) AS last_touch_type,
  CAST(count(t.event_id) AS BIGINT) AS n_touches
FROM p LEFT JOIN t ON t.user_id = p.user_id
  AND epoch_us(t.ts) <= epoch_us(p.ts)
  AND epoch_us(t.ts) >= epoch_us(p.ts) - {w_us}
GROUP BY p.event_id, p.user_id
ORDER BY purchase_id
""".strip()


def daily_ffill(ds, key_col: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", value_col: str = "value",
                n_buckets: int = 64):
    """Regular-grid RESAMPLE with forward fill: for every key, one row
    per calendar day from its first to its last event, carrying the
    day-close value forward across gap days — the telemetry/feature
    pipeline step that turns an irregular event stream into the
    fixed-frequency series a model consumes ("daily account balance"
    from sparse transactions).

    Day-close = last event of the day by (ts, id) — the deterministic
    tie rule shared with the attribution/as-of family. One key-bucket
    exchange; per bucket everything is vectorized: an Arrow-side sort,
    a groupby-last for closes, ``np.repeat``/``arange`` for the grid,
    one ``merge_asof(by=key)`` for the fill. The value column passes
    through UNCHANGED (no arithmetic), so floats hash-match any
    engine. Grid size = Σ per-key day spans — bounded by time span,
    not event count.

    Returns a Dataset (key, day, value) sorted, day = int64 epoch day.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.groups import map_buckets

    def pre(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        return pa.table({
            key_col: pc.cast(t[key_col], pa.int64()),
            "_us": us,
            id_col: pc.cast(t[id_col], pa.int64()),
            value_col: pc.cast(t[value_col], pa.float64()),
            "day": pc.divide(us, pa.scalar(86_400_000_000, pa.int64())),
        })

    out_schema = pa.schema([
        pa.field(key_col, pa.int64()),
        pa.field("day", pa.int64()),
        pa.field(value_col, pa.float64()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "_us", id_col], kind="mergesort")
        closes = g.groupby([key_col, "day"], as_index=False,
                           sort=True).last()[[key_col, "day", value_col]]
        span = closes.groupby(key_col, as_index=False).agg(
            d0=("day", "min"), d1=("day", "max"))
        lens = (span["d1"] - span["d0"] + 1).to_numpy()
        keys = np.repeat(span[key_col].to_numpy(), lens)
        starts = np.repeat(span["d0"].to_numpy(), lens)
        offs = np.concatenate([np.arange(n) for n in lens]) \
            if len(lens) else np.asarray([], dtype=np.int64)
        grid = pd.DataFrame({key_col: keys, "day": starts + offs})
        grid = grid.sort_values("day", kind="mergesort")
        closes = closes.sort_values("day", kind="mergesort")
        m = pd.merge_asof(grid, closes, on="day", by=key_col,
                          direction="backward")
        return m.sort_values([key_col, "day"])

    pre_ds = ds.map_batches(skip_empty(pre), batch_format="pyarrow",
                            zero_copy_batch=True)
    bucketed = _with_bucket(pre_ds, key_col, n_buckets)
    return map_buckets(bucketed, per_bucket, out_schema).sort(
        [key_col, "day"])


def daily_ffill_sql(key_col: str = "user_id", value_col: str = "value",
                    table: str = "events") -> str:
    return f"""
WITH e AS (
  SELECT {key_col}, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
    ts, event_id, CAST({value_col} AS DOUBLE) AS v
  FROM {table}
), closes AS (
  SELECT {key_col}, day, last(v ORDER BY ts, event_id) AS v
  FROM e GROUP BY {key_col}, day
), span AS (
  SELECT {key_col}, min(day) AS d0, max(day) AS d1
  FROM closes GROUP BY {key_col}
), grid AS (
  SELECT {key_col}, unnest(generate_series(d0, d1)) AS day FROM span
)
SELECT g.{key_col}, g.day, c.v AS {value_col}
FROM grid g ASOF JOIN closes c
  ON g.{key_col} = c.{key_col} AND g.day >= c.day
ORDER BY g.{key_col}, g.day
""".strip()


def decayed_counts(ds, key_col: str = "tag", ts_col: str = "ts",
                   half_life_days: int = 1):
    """Recency-DECAYED heavy hitters: per key,
    ``Σ floor(1e6 · 2^(-age/half_life))`` with age in whole days
    behind the corpus max — the trend score that lets yesterday's
    spike outrank last month's steady drone (plain counts can't).

    Exactness: ages are integers, so with half_life 1 the decay
    ``2^-age`` is an EXACT binary power — every per-row weight is the
    same int64 on any engine (floor of an exact double product), and
    the sums are order-free integer adds. Two combiner passes (max
    day, then weight sums), both driver-merged (bounded key space).

    Returns a pyarrow Table (key, decayed_millionths, n) sorted by
    decayed DESC, key ASC.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    assert half_life_days == 1, "exactness argument holds for 2^-age"

    def day_col(t: pa.Table):
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        return pc.divide(us, pa.scalar(86_400_000_000, pa.int64()))

    def max_partial(t: pa.Table) -> pa.Table:
        d = day_col(t)
        return pa.table({"m": pa.array([pc.max(d).as_py()], pa.int64())})

    parts = list(
        ds.map_batches(skip_empty(max_partial), batch_format="pyarrow",
                       zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not parts:
        return pa.table({key_col: pa.array([], pa.string()),
                         "decayed_millionths": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    max_day = max(int(p["m"].to_numpy().max()) for p in parts)

    def weights(t: pa.Table) -> pa.Table:
        age = (max_day - day_col(t).to_numpy(zero_copy_only=False)
               ).astype(np.float64)
        w = np.floor(1_000_000.0 * np.power(2.0, -age)).astype(np.int64)
        return pa.table({key_col: t[key_col], "w": pa.array(w)})

    agg = grouped_agg(
        ds.map_batches(skip_empty(weights), batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=[key_col], aggs=[("w", "sum"), ("w", "count")],
        final="driver")
    out = pa.table({
        key_col: agg[key_col],
        "decayed_millionths": agg["w_sum"],
        "n": agg["w_count"],
    })
    return out.sort_by([("decayed_millionths", "descending"),
                        (key_col, "ascending")])


def decayed_counts_sql(key_col: str = "tag",
                       inner: str = "routed") -> str:
    """Mirror over a CTE ``inner`` with (key, ts). Caller prepends the
    WITH chain."""
    return f"""
SELECT {key_col},
  CAST(sum(CAST(floor(1000000 * power(2.0,
    -CAST((SELECT max(epoch_us(ts) // 86400000000) FROM {inner})
      - epoch_us(ts) // 86400000000 AS DOUBLE))) AS BIGINT)) AS BIGINT)
    AS decayed_millionths,
  CAST(count(*) AS BIGINT) AS n
FROM {inner} GROUP BY {key_col}
ORDER BY decayed_millionths DESC, {key_col}
""".strip()


def pit_window_features(turns, events, window_sec: int = 3600,
                        key_col: str = "user_id", ts_col: str = "ts",
                        n_buckets: int = 64):
    """POINT-IN-TIME windowed feature join — the feature-store
    primitive: for every left row (a transcript turn), the same key's
    event count and value sum over ``[ts-W, ts)`` — STRICTLY before
    the row's own timestamp, the leakage-safe contract (an event at
    the turn's exact ts could already be downstream of it).

    ``turns`` needs (conv_id, turn_idx, key, ts); ``events`` needs
    (key, ts, event_id, value). One unioned cogroup exchange
    (:func:`joins.cogrouped`); per bucket, per-key prefix counters
    (count + value-MICROS cumsum — integer, so window sums are exact
    prefix differences, mirroring SQL integer sums regardless of float
    summation order) and two strict-backward ``merge_asof`` lookups
    whose difference is the window aggregate.

    Returns (conv_id, turn_idx, n_events_w, value_micros_w) sorted.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.groups import map_buckets
    from fluent_server_ray.stages.joins import cogrouped

    w_us = int(window_sec) * 1_000_000

    def prep_l(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        return pa.table({
            "conv_id": pc.cast(t["conv_id"], pa.string()),
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            key_col: pc.cast(t[key_col], pa.int64()),
            "_us": us,
        })

    def prep_r(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        v = t["value"].to_numpy(zero_copy_only=False)
        micros = np.where(np.isnan(v), 0,
                          np.floor(v * 1_000_000.0)).astype(np.int64)
        return pa.table({
            key_col: pc.cast(t[key_col], pa.int64()),
            "_us": us,
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "_vm": pa.array(micros),
        })

    lt = turns.map_batches(skip_empty(prep_l), batch_format="pyarrow",
                           zero_copy_batch=True)
    rt = events.map_batches(skip_empty(prep_r), batch_format="pyarrow",
                            zero_copy_batch=True)
    both, lcols, rcols, _, _ = cogrouped(lt, rt, key_col,
                                         n_buckets=n_buckets)

    out_schema = pa.schema([
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int64()),
        pa.field("n_events_w", pa.int64()),
        pa.field("value_micros_w", pa.int64()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][lcols]
        rg = (g[g["_side"] == 1][rcols]
              .sort_values(["_us", "event_id"], kind="mergesort")
              .reset_index(drop=True))
        if lg.empty:
            return pd.DataFrame({f.name: pd.Series(
                dtype=f.type.to_pandas_dtype()) for f in out_schema
            }).astype({"conv_id": "object"})
        rg["_c"] = rg.groupby(key_col, sort=False).cumcount()
        rg["_cv"] = rg.groupby(key_col, sort=False)["_vm"].cumsum()
        base = lg.assign(_lo=lg["_us"] - w_us,
                         _key=np.arange(len(lg)))

        def look(on_col):
            lo = base.sort_values([on_col, "_key"], kind="mergesort")
            m = pd.merge_asof(
                lo, rg[[key_col, "_us", "_c", "_cv"]],
                left_on=on_col, right_on="_us", by=key_col,
                direction="backward", allow_exact_matches=False,
                suffixes=("", "_r"))
            m = m.set_index("_key")
            c = np.nan_to_num(m["_c"].to_numpy(), nan=-1.0) + 1.0
            cv = np.nan_to_num(m["_cv"].to_numpy(), nan=0.0)
            # _cv of the matched row already includes its own _vm;
            # no-match -> 0 events seen -> 0 mass
            order = m.index.to_numpy()
            return c, cv, order

        c_hi, v_hi, o_hi = look("_us")
        c_lo, v_lo, o_lo = look("_lo")
        hi = pd.DataFrame({"c": c_hi, "v": v_hi}, index=o_hi).sort_index()
        lo = pd.DataFrame({"c": c_lo, "v": v_lo}, index=o_lo).sort_index()
        return pd.DataFrame({
            "conv_id": base["conv_id"].to_numpy(dtype=object),
            "turn_idx": base["turn_idx"].to_numpy(dtype="int64"),
            "n_events_w": (hi["c"].to_numpy()
                           - lo["c"].to_numpy()).astype(np.int64),
            "value_micros_w": (hi["v"].to_numpy()
                               - lo["v"].to_numpy()).astype(np.int64),
        })

    out = map_buckets(both, per_bucket, out_schema)
    return out.sort(["conv_id", "turn_idx"])


def pit_window_features_sql(window_sec: int = 3600) -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE

    w_us = int(window_sec) * 1_000_000
    return (
        "WITH " + TRANSCRIPTS_SQL_CTE + f""",
t AS (
  SELECT conv_id, turn_idx, ts,
    CAST(substr(conv_id, 6) AS BIGINT) AS user_id
  FROM transcripts
)
SELECT t.conv_id, t.turn_idx,
  CAST(count(e.event_id) AS BIGINT) AS n_events_w,
  CAST(COALESCE(sum(CAST(floor(e.value * 1000000.0) AS BIGINT)), 0)
       AS BIGINT) AS value_micros_w
FROM t LEFT JOIN events e ON e.user_id = t.user_id
  AND epoch_us(e.ts) < epoch_us(t.ts)
  AND epoch_us(e.ts) >= epoch_us(t.ts) - {w_us}
GROUP BY t.conv_id, t.turn_idx
ORDER BY t.conv_id, t.turn_idx"""
    )


def weekly_growth(ds, key_col: str = "event_type", ts_col: str = "ts"):
    """Week-over-week traffic growth per key: counts per (key, epoch
    week) plus the percent change vs the key's PREVIOUS calendar week
    (NULL for a key's first week, and gaps are real gaps — a missing
    week does not chain) — the trend dashboard row above the raw
    tumbling counts.

    Counts are combiner partials (bounded: keys × weeks) merged on the
    driver; the lag and one float division per row happen there, in a
    fixed expression ``(n - prev)/prev`` mirroring SQL lag(). Week =
    ``epoch_us // (7·86400·1e6)`` — fixed seven-day buckets anchored
    at the epoch (SQL mirror identical; no ISO-week locale hazards).

    Returns (key, week, n, pct_change) sorted.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_counts

    wk_us = 7 * 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        return pa.table({
            key_col: pc.cast(t[key_col], pa.string()),
            "week": pc.divide(us, pa.scalar(wk_us, pa.int64())),
        })

    cells = grouped_counts(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        [key_col, "week"], final="driver")
    df = pd.DataFrame({
        key_col: cells[key_col].to_pylist(),
        "week": cells["week"].to_numpy(zero_copy_only=False).astype(
            np.int64),
        "n": cells["n"].to_numpy(zero_copy_only=False).astype(np.int64),
    }).sort_values([key_col, "week"]).reset_index(drop=True)
    prev = df.groupby(key_col, sort=False)["n"].shift()
    prev_week = df.groupby(key_col, sort=False)["week"].shift()
    contiguous = (df["week"] - prev_week) == 1
    nf = df["n"].to_numpy().astype(np.float64)
    pv = prev.to_numpy()
    pct = np.where(contiguous.to_numpy(), (nf - pv) / pv, np.nan)
    return pa.table({
        key_col: pa.array(df[key_col].to_numpy(dtype=object), pa.string()),
        "week": pa.array(df["week"].to_numpy()),
        "n": pa.array(df["n"].to_numpy()),
        "pct_change": pa.array(pct, pa.float64()),
    })


def weekly_growth_sql(key_col: str = "event_type",
                      table: str = "events") -> str:
    wk_us = 7 * 86_400_000_000
    return f"""
WITH c AS (
  SELECT {key_col},
    CAST(epoch_us(ts) // {wk_us} AS BIGINT) AS week,
    CAST(count(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1, 2
)
SELECT {key_col}, week, n,
  CASE WHEN week - lag(week) OVER w = 1
    THEN (CAST(n AS DOUBLE) - CAST(lag(n) OVER w AS DOUBLE))
         / CAST(lag(n) OVER w AS DOUBLE) END AS pct_change
FROM c WINDOW w AS (PARTITION BY {key_col} ORDER BY week)
ORDER BY {key_col}, week
""".strip()


def dow_hour_profile(ds, key_col: str = "event_type", ts_col: str = "ts"):
    """Day-of-week × hour traffic profile per key — the weekly-rhythm
    heatmap behind capacity planning and anomaly baselines ("is Monday
    09:00 supposed to look like this?"). ISO weekday (Mon=1..Sun=7,
    Arrow ``day_of_week(count_from_zero=False, week_start=1)`` ≡ SQL
    ``isodow``) and UTC hour; plain combiner-first grouped counts over
    the bounded (key × 7 × 24) cell space.

    Returns (key, dow, hour, n) sorted.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_counts

    def prep(t: pa.Table) -> pa.Table:
        ts = pc.cast(t[ts_col], pa.timestamp("us"))
        return pa.table({
            key_col: pc.cast(t[key_col], pa.string()),
            "dow": pc.cast(pc.day_of_week(ts, count_from_zero=False,
                                          week_start=1), pa.int64()),
            "hour": pc.cast(pc.hour(ts), pa.int64()),
        })

    out = grouped_counts(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        [key_col, "dow", "hour"], final="driver")
    return out.sort_by([(key_col, "ascending"), ("dow", "ascending"),
                        ("hour", "ascending")])


def dow_hour_profile_sql(key_col: str = "event_type",
                         table: str = "events") -> str:
    return f"""
SELECT {key_col}, CAST(isodow(ts) AS BIGINT) AS dow,
  CAST(hour(ts) AS BIGINT) AS hour,
  CAST(count(*) AS BIGINT) AS n
FROM {table} GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""".strip()


def _event_sequences(ds, user_col: str, ts_col: str, type_col: str,
                     id_col: str, n_buckets: int):
    """Shared per-user ordered-sequence exchange: NULL user/ts/type
    rows drop (SQL concat/partition semantics), then ONE user-bucket
    exchange; callers run segmented shifts inside the bucket. Order
    contract: (ts, id) — total because ids are unique."""
    import pyarrow.compute as pc

    from fluent_server_ray.stages.assembly import _with_bucket

    def pre(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t[user_col]),
                             pc.is_valid(t[ts_col])),
                     pc.is_valid(t[type_col]))
        t = t.filter(ok)
        return pa.table({
            "u": pc.cast(t[user_col], pa.int64()),
            "ts_us": t[ts_col].cast(pa.int64()),
            "id": pc.cast(t[id_col], pa.int64()),
            "typ": pc.cast(t[type_col], pa.string()),
        })

    cols = [user_col, ts_col, type_col, id_col]
    pruned = ds.select_columns(cols).map_batches(
        pre, batch_format="pyarrow", zero_copy_batch=True)
    return _with_bucket(pruned, "u", n_buckets)


def event_motifs(ds, user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type", id_col: str = "event_id",
                 top_k: int = 50, n_buckets: int = 64) -> pa.Table:
    """Sequential-pattern mining, order-3 motifs: the corpus's most
    frequent CONSECUTIVE event-type trigrams within per-user
    timelines — the behavioral-sequence sibling of
    :func:`textstats.bigram_top` (sessions instead of sentences).
    What funnel() checks for ONE hypothesized pattern, this mines
    from the data.

    ONE user-bucket exchange; motif formation is two segmented shifts
    over the whole bucket (no per-user Python); the unbounded motif
    space then merges through the vocab-top-k shape (local count
    combiner → motif-bucket exchange → per-bucket top-k →
    O(buckets·k) driver merge). Ties: (n DESC, motif ASC).
    Returns a Table (motif, n)."""
    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)
    from fluent_server_ray.stages.groups import map_buckets

    bucketed = _event_sequences(ds, user_col, ts_col, type_col,
                                id_col, n_buckets)
    part_schema = pa.schema([pa.field("motif", pa.string()),
                             pa.field("n", pa.int64()),
                             pa.field("_bucket", pa.int64())])

    def motifs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts_us", "id"])
        grp = g.groupby("u", sort=False)
        t2 = grp["typ"].shift(-1)
        t3 = grp["typ"].shift(-2)
        ok = t3.notna().to_numpy()
        m = (g["typ"].str.cat(t2, sep=">", na_rep="")
             .str.cat(t3, sep=">", na_rep=""))[ok]
        c = m.value_counts()
        arr = c.index.to_numpy(dtype=object)
        return pd.DataFrame({
            "motif": arr,
            "n": c.to_numpy().astype(np.int64),
            "_bucket": hash_bucket_array(
                pa.array(arr, pa.string()), n_buckets),
        })

    parts = map_buckets(bucketed, motifs, part_schema)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("motif", sort=False)["n"].sum().reset_index()
        s = s.sort_values(["n", "motif"],
                          ascending=[False, True]).head(top_k)
        return s[["motif", "n"]]

    top_schema = pa.schema([pa.field("motif", pa.string()),
                            pa.field("n", pa.int64())])
    tops = map_buckets(parts, per_bucket, top_schema)
    merged = tops.to_pandas()  # bounded: ≤ n_buckets × top_k rows
    if merged.empty:
        return pa.table({"motif": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    merged = merged.sort_values(["n", "motif"],
                                ascending=[False, True]).head(top_k)
    return pa.table({
        "motif": pa.array(merged["motif"].to_numpy(), pa.string()),
        "n": pa.array(merged["n"].to_numpy(), pa.int64()),
    })


def event_motifs_sql(user_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type",
                     id_col: str = "event_id", top_k: int = 50,
                     table: str = "events") -> str:
    return f"""
WITH s AS (
  SELECT {type_col} AS t1,
    lead({type_col}, 1) OVER w AS t2,
    lead({type_col}, 2) OVER w AS t3
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {type_col} IS NOT NULL
  WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col}, {id_col})
)
SELECT t1 || '>' || t2 || '>' || t3 AS motif, count(*) AS n
FROM s WHERE t3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, motif LIMIT {top_k}
""".strip()


def event_markov_probs(ds, user_col: str = "user_id",
                       ts_col: str = "ts",
                       type_col: str = "event_type",
                       id_col: str = "event_id",
                       alpha: int = 1, n_buckets: int = 64) -> pa.Table:
    """Laplace-smoothed first-order Markov transition model over
    per-user event-type sequences: the FULL |states|² matrix with
    ``p = (n + α)·10^6 // (row_total + α·|states|)`` in integer
    millionths — train the tiny behavioral model distributedly, read
    the probabilities exactly. States are the event taxonomy (bounded
    by contract — the driver holds |states|² cells, never events).

    Same user-bucket exchange as :func:`event_motifs`; pair counts
    cross the wire as per-bucket partials. Unseen transitions get the
    smoothing floor — that is the point of α.
    Output: (src, dst, n, p_millionths) sorted."""
    from fluent_server_ray.stages.aggregate import grouped_agg
    from fluent_server_ray.stages.groups import map_buckets

    bucketed = _event_sequences(ds, user_col, ts_col, type_col,
                                id_col, n_buckets)
    pair_schema = pa.schema([pa.field("src", pa.string()),
                             pa.field("dst", pa.string()),
                             pa.field("n", pa.int64())])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts_us", "id"])
        grp = g.groupby("u", sort=False)
        t2 = grp["typ"].shift(-1)
        ok = t2.notna().to_numpy()
        d = pd.DataFrame({"src": g["typ"].to_numpy()[ok],
                          "dst": t2.to_numpy()[ok]})
        c = d.groupby(["src", "dst"], sort=False).size().reset_index()
        c.columns = ["src", "dst", "n"]
        return c

    parts = map_buckets(bucketed, pairs, pair_schema)
    counts = grouped_agg(parts, keys=["src", "dst"],
                         aggs=[("n", "sum")], final="driver")
    if counts.num_rows == 0:
        return pa.table({"src": pa.array([], pa.string()),
                         "dst": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "p_millionths": pa.array([], pa.int64())})
    df = counts.to_pandas()  # bounded: |states|² by contract
    states = sorted(set(df["src"]) | set(df["dst"]))
    v = len(states)
    full = pd.MultiIndex.from_product([states, states],
                                      names=["src", "dst"]).to_frame(
        index=False)
    full = full.merge(df.rename(columns={"n_sum": "n"}),
                      on=["src", "dst"], how="left")
    full["n"] = full["n"].fillna(0).astype(np.int64)
    row_tot = full.groupby("src", sort=False)["n"].transform("sum")
    p = ((full["n"] + alpha) * 1_000_000) // (row_tot + alpha * v)
    return pa.table({
        "src": pa.array(full["src"].to_numpy(), pa.string()),
        "dst": pa.array(full["dst"].to_numpy(), pa.string()),
        "n": pa.array(full["n"].to_numpy(), pa.int64()),
        "p_millionths": pa.array(p.to_numpy().astype(np.int64)),
    })


def event_markov_probs_sql(user_col: str = "user_id",
                           ts_col: str = "ts",
                           type_col: str = "event_type",
                           id_col: str = "event_id",
                           alpha: int = 1,
                           table: str = "events") -> str:
    return f"""
WITH s AS (
  SELECT {type_col} AS src, lead({type_col}) OVER w AS dst
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {type_col} IS NOT NULL
  WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col}, {id_col})
), c AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM s
  WHERE dst IS NOT NULL GROUP BY 1, 2
), states AS (
  SELECT DISTINCT src AS st FROM c
  UNION SELECT DISTINCT dst FROM c
), nv AS (SELECT count(*) AS v FROM states),
grid AS (
  SELECT a.st AS src, b.st AS dst FROM states a CROSS JOIN states b
), full_ AS (
  SELECT g.src, g.dst, COALESCE(c.n, 0) AS n
  FROM grid g LEFT JOIN c ON g.src = c.src AND g.dst = c.dst
)
SELECT src, dst, CAST(n AS BIGINT) AS n,
  CAST(((n + {alpha}) * 1000000)
       // (sum(n) OVER (PARTITION BY src)
           + {alpha} * (SELECT v FROM nv)) AS BIGINT) AS p_millionths
FROM full_ ORDER BY src, dst
""".strip()


def merge_intervals(ds, key_col: str = "user_id",
                    start_col: str = "s", end_col: str = "e",
                    n_buckets: int = 64):
    """Per-key interval UNION (merge overlapping/touching intervals
    into maximal covered spans) — the coverage primitive behind
    "actual connected time", SLA uptime stitching, and span-level
    dedup of annotated ranges. :func:`sessionize` cuts on GAPS between
    points; this merges EXTENTS with real durations — the two halves
    of the islands family.

    Semantics (SQL gaps-and-islands): intervals sort (start, end)
    within key; an interval starts a new island iff its start is
    STRICTLY greater than the running max end of its predecessors
    (touching intervals — start == prev end — merge, standard union
    semantics). Start/end are int64 (micros or any monotone unit);
    NULL key is its own partition (SQL PARTITION BY); NULL start/end
    rows are dropped (no extent).

    One key-hash bucket exchange; per bucket the island detection is
    whole-bucket vectorized (segmented cummax + cumsum — never
    per-group Python). Output: (key, start, end, n_merged) — the
    merged spans — sorted.
    """
    import pyarrow.compute as pc

    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.groups import map_buckets

    def clean(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[start_col]),
                             pc.is_valid(t[end_col])))
        return pa.table({
            "key": pc.cast(t[key_col], pa.string()),
            "s": pc.cast(t[start_col], pa.int64()),
            "e": pc.cast(t[end_col], pa.int64()),
        })

    schema = pa.schema([
        pa.field("key", pa.string()),
        pa.field("start", pa.int64()),
        pa.field("end", pa.int64()),
        pa.field("n_merged", pa.int64()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["key", "s", "e"], na_position="first")
        grp = g.groupby("key", sort=False, dropna=False)
        # segmented cummax + shift, both cythonized; nullable Int64
        # keeps the shift EXACT (an int64->float64 shift would lose
        # precision past 2^53)
        cm = grp["e"].cummax().astype("Int64").shift(1)
        head = grp.cumcount().to_numpy() == 0
        s = g["s"].to_numpy()
        pm = cm.fillna(np.iinfo(np.int64).min).to_numpy(
            dtype=np.int64)
        brk = head | (s > pm)
        island = np.cumsum(brk)
        out = pd.DataFrame({
            "key": g["key"].to_numpy(), "island": island,
            "s": s, "e": g["e"].to_numpy()})
        m = out.groupby(["key", "island"], sort=False, dropna=False).agg(
            start=("s", "min"), end=("e", "max"),
            n_merged=("s", "size")).reset_index()
        return m[["key", "start", "end", "n_merged"]]

    bucketed = _with_bucket(
        ds.map_batches(clean, batch_format="pyarrow",
                       zero_copy_batch=True), "key", n_buckets)
    return map_buckets(bucketed, per_bucket, schema).sort(
        ["key", "start", "end"])


def merge_intervals_sql(inner: str, key_col: str = "key") -> str:
    """Mirror over ``inner`` (a subquery/CTE named relation with
    columns (key, s, e)): running-max-end islands, strict-greater
    break rule, touching intervals merge."""
    return f"""
WITH iv AS (SELECT * FROM {inner} WHERE s IS NOT NULL AND e IS NOT NULL),
r AS (
  SELECT {key_col} AS key, s, e,
    max(e) OVER (PARTITION BY {key_col} ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS prev_max
  FROM iv
), b AS (
  SELECT key, s, e,
    CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS brk
  FROM r
), isl AS (
  SELECT key, s, e,
    sum(brk) OVER (PARTITION BY key ORDER BY s, e
                   ROWS UNBOUNDED PRECEDING) AS island
  FROM b
)
SELECT key, CAST(min(s) AS BIGINT) AS start,
  CAST(max(e) AS BIGINT) AS "end",
  CAST(count(*) AS BIGINT) AS n_merged
FROM isl GROUP BY key, island
ORDER BY key, start, "end"
""".strip()


def multi_funnel(ds, steps=("signup", "click", "purchase"),
                 within_seconds: int = 7 * 86400,
                 key_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type", n_buckets: int = 64):
    """N-step conversion funnel with GREEDY-EARLIEST chain semantics:
    for every key with at least one ``steps[0]`` event, walk the
    sequence — step 1 anchors at the key's earliest step-1 event, each
    later step takes its earliest event STRICTLY AFTER the previous
    step's chosen event — and the funnel completes iff every step
    matched and the last step is within ``within_seconds`` of the
    anchor. The n-ary generalization of :func:`funnel` (two fixed
    stages there); greedy-earliest is the standard product-analytics
    contract and is exactly mirrorable as a chain of min-after-min
    CTEs.

    Read pushes ``type IN steps``; ONE key bucket exchange; per bucket
    each step resolves with whole-bucket C kernels (merge previous
    anchor + strict-after mask + groupby min — never per-key Python).
    Output: (key, step1_ts..stepN_ts, completed) sorted by key; keys
    missing step 1 are absent, later missing steps leave NULL ts and
    completed = false.
    """
    if len(steps) < 2:
        raise ValueError("multi_funnel: need at least 2 steps")
    from fluent_server_ray.stages.assembly import _with_bucket

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        anchor = (g.loc[g[type_col] == steps[0]]
                  .groupby(key_col, sort=False)[ts_col].min())
        if len(anchor) == 0:
            # typed empty: an anchorless bucket must not emit an
            # object-dtype frame (null-typed Arrow block downstream)
            cols = {key_col: pd.Series([], dtype=g[key_col].dtype)}
            for j in range(1, len(steps) + 1):
                cols[f"step{j}_ts"] = pd.Series(
                    [], dtype=g[ts_col].dtype)
            cols["completed"] = pd.Series([], dtype=bool)
            return pd.DataFrame(cols)
        out = pd.DataFrame({key_col: anchor.index.to_numpy(),
                            "step1_ts": anchor.to_numpy()})
        prev = anchor.rename("_prev")
        # unnamed index: a named (key_col) index on the merge's right
        # side makes the later groupby(key_col) ambiguous
        prev.index.name = None
        for i, st in enumerate(steps[1:], start=2):
            ev = g.loc[g[type_col] == st, [key_col, ts_col]]
            m = ev.merge(prev, left_on=key_col, right_index=True)
            m = m[m[ts_col] > m["_prev"]]
            nxt = m.groupby(key_col, sort=False)[ts_col].min()
            if len(nxt):
                out[f"step{i}_ts"] = out[key_col].map(nxt)
            else:  # keep the ts dtype: an all-miss map degrades to
                out[f"step{i}_ts"] = pd.Series(  # float64 NaN
                    pd.NaT, index=out.index, dtype=g[ts_col].dtype)
            prev = nxt.rename("_prev")
            prev.index.name = None
        last = out[f"step{len(steps)}_ts"]
        out["completed"] = (
            last.notna()
            & (last - out["step1_ts"]
               <= pd.Timedelta(seconds=within_seconds)))
        return out

    import pyarrow.compute as pc

    def keep_steps(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[type_col],
                                 value_set=pa.array(list(steps))))

    cols = [key_col, type_col, ts_col]
    flt = ds.select_columns(cols).map_batches(
        keep_steps, batch_format="pyarrow", zero_copy_batch=True)
    bucketed = _with_bucket(flt, key_col, n_buckets)
    return bucketed.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas").sort(key_col)


def multi_funnel_sql(steps=("signup", "click", "purchase"),
                     within_seconds: int = 7 * 86400,
                     table: str = "events") -> str:
    parts = [f"""
WITH e1 AS (
  SELECT user_id, min(ts) AS t1 FROM {table}
  WHERE event_type = '{steps[0]}' GROUP BY user_id
)""".strip()]
    prev = "e1"
    for i, st in enumerate(steps[1:], start=2):
        cols = ", ".join(f"t{j}" for j in range(1, i))
        parts.append(f""", e{i} AS (
  SELECT p.user_id, {", ".join(f"p.t{j}" for j in range(1, i))},
    min(x.ts) AS t{i}
  FROM {prev} p LEFT JOIN {table} x
    ON x.user_id = p.user_id AND x.event_type = '{st}'
    AND x.ts > p.t{i - 1}
  GROUP BY p.user_id, {cols}
)""")
        prev = f"e{i}"
    n = len(steps)
    sel = ", ".join(f"t{j} AS step{j}_ts" for j in range(1, n + 1))
    parts.append(f"""
SELECT user_id, {sel},
  (t{n} IS NOT NULL AND
   epoch_us(t{n}) - epoch_us(t1)
     <= CAST({within_seconds} AS BIGINT) * 1000000)
    AS completed
FROM e{n} ORDER BY user_id""")
    return "".join(parts)


def sliding_distinct_users(ds, width_seconds: int = 3600,
                           slide_seconds: int = 1800,
                           key_col: str = "user_id",
                           ts_col: str = "ts", n_buckets: int = 64):
    """EXACT distinct-count per SLIDING window — the non-mergeable
    sibling of :func:`window_distinct_users` (tumbling) and
    :func:`sliding_counts` (counts slide trivially; DISTINCT cannot be
    merged across overlapping panes, so each row replicates to its
    width/slide covering windows BEFORE the two-level distinct).

    Phase-shift explode (the :func:`sliding_counts` idiom — one
    integer expression per phase, no Python rows) -> per-batch local
    dedup of (window, key) -> ONE key-hash exchange + whole-bucket
    drop_duplicates -> bounded per-window counts. Only distinct
    (window x key) pairs shuffle. Output: (window_start, n_users).
    """
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import (grouped_counts,
                                                    hash_bucket_array,
                                                    skip_empty)

    if width_seconds % slide_seconds != 0:
        raise ValueError("sliding_distinct_users: width must be a "
                         "multiple of slide (windows must tile)")
    n_phases = width_seconds // slide_seconds

    def partial(t: pa.Table) -> pa.Table:
        # NULL ts would degrade the int64 seconds to float64 NaN
        # (block schema flip); NULL key would count as a user while
        # SQL count(DISTINCT) ignores it — both excluded, and the
        # mirror carries the same WHERE
        t = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                             pc.is_valid(t[key_col])))
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        # numpy // FLOORS like SQL's // — pc.divide truncates toward
        # zero and would misplace pre-epoch (negative-second) events
        secs = us // 1_000_000
        parts = []
        for phase in range(n_phases):
            shift = phase * slide_seconds
            win = ((secs - shift) // width_seconds) * width_seconds + shift
            parts.append(pa.table({"window_start": pa.array(win),
                                   key_col: t[key_col]}))
        u = (pa.concat_tables(parts)
             .group_by(["window_start", key_col]).aggregate([]))
        return u.append_column(
            "_bucket",
            pa.array(hash_bucket_array(u[key_col], n_buckets)))

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["window_start", key_col])[
            ["window_start", key_col]]

    pairs = (ds.select_columns([key_col, ts_col])
             .map_batches(skip_empty(partial), batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("_bucket")
             .map_groups(bucket_distinct, batch_format="pandas"))
    counts = grouped_counts(pairs, ["window_start"])
    return counts.rename_columns(["window_start", "n_users"]).sort_by(
        [("window_start", "ascending")])


def sliding_distinct_users_sql(width_seconds: int = 3600,
                               slide_seconds: int = 1800,
                               table: str = "events") -> str:
    n_phases = width_seconds // slide_seconds
    selects = []
    for phase in range(n_phases):
        shift = phase * slide_seconds
        selects.append(
            f"SELECT user_id, "
            f"(((epoch_us(ts) // 1000000) - {shift}) // {width_seconds})"
            f" * {width_seconds} + {shift} AS window_start"
            f" FROM {table}"
            f" WHERE ts IS NOT NULL AND user_id IS NOT NULL")
    union = "\nUNION ALL\n".join(selects)
    return (f"SELECT window_start, CAST(count(DISTINCT user_id) AS "
            f"BIGINT) AS n_users FROM (\n{union}\n) "
            "GROUP BY 1 ORDER BY 1")


def rolling_frame_sum(ds, key_col: str = "user_id", ts_col: str = "ts",
                value_col: str = "value", id_col: str = "event_id",
                window_rows: int = 5, n_buckets: int = 64):
    """Per-key ROLLING sum over the last ``window_rows`` events in
    (ts, id) order — SQL's ``ROWS BETWEEN k-1 PRECEDING AND CURRENT
    ROW`` frame, with SQL's frame/NULL contract exactly (a NULL-value
    row OCCUPIES a frame slot; ``count(*) OVER w`` counts it).
    Complement of :func:`rolling_agg` above, which implements the
    pandas-reference contract instead (NULL values EXCLUDED from the
    frame, micros scale, rolling mean included) — the two differ
    whenever a frame contains NULLs; both are deliberate.

    Exactness: values fix to integer CENTS (half-away) and the rolling
    sum is the difference of two segmented int64 cumsums (cumsum minus
    its ``window_rows``-shifted self, nullable Int64 so the shift
    never degrades to float64) — order-free, strict. One key bucket
    exchange; everything inside is cythonized segmented kernels.
    NULL value rows participate with 0 cents but still occupy a frame
    slot (SQL sum-over-frame ignores NULL values, not NULL rows);
    NULL key is its own partition. Output: (id, key, cents,
    rolling_sum_cents, rolling_n) sorted by (key, ts, id).
    """
    import pyarrow.compute as pc

    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.groups import map_buckets

    from fluent_server_ray.stages.features import _cents

    def clean(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.fill_null(t[value_col], 0.0), pa.float64())
        return pa.table({
            "id": pc.cast(t[id_col], pa.int64()),
            "key": pc.cast(t[key_col], pa.string()),
            "_us": t[ts_col].cast(pa.int64()),
            "cents": _cents(v),
        })

    schema = pa.schema([
        pa.field("id", pa.int64()),
        pa.field("key", pa.string()),
        pa.field("cents", pa.int64()),
        pa.field("rolling_sum_cents", pa.int64()),
        pa.field("rolling_n", pa.int64()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["key", "_us", "id"])
        grp = g.groupby("key", sort=False, dropna=False)
        cs = grp["cents"].cumsum().astype("Int64")
        prev = cs.groupby(
            g["key"].to_numpy(), sort=False, dropna=False
        ).shift(window_rows).fillna(0).astype("int64")
        pos = grp.cumcount().to_numpy()
        return pd.DataFrame({
            "id": g["id"].to_numpy(),
            "key": g["key"].to_numpy(),
            "cents": g["cents"].to_numpy(),
            "rolling_sum_cents": (cs.to_numpy(dtype="int64")
                                  - prev.to_numpy()),
            "rolling_n": np.minimum(pos + 1, window_rows),
        })

    bucketed = _with_bucket(
        ds.select_columns([id_col, key_col, ts_col, value_col])
        .map_batches(clean, batch_format="pyarrow",
                     zero_copy_batch=True), "key", n_buckets)
    return map_buckets(bucketed, per_bucket, schema).sort(
        ["key", "id"])


def rolling_frame_sum_sql(key_col: str = "user_id", ts_col: str = "ts",
                    value_col: str = "value",
                    id_col: str = "event_id", window_rows: int = 5,
                    table: str = "events") -> str:
    return f"""
SELECT CAST({id_col} AS BIGINT) AS id,
  CAST({key_col} AS VARCHAR) AS key,
  CAST(round(COALESCE({value_col}, 0.0) * 100.0) AS BIGINT)
    AS cents,
  CAST(sum(CAST(round(COALESCE({value_col}, 0.0) * 100.0)
               AS BIGINT))
       OVER w AS BIGINT) AS rolling_sum_cents,
  CAST(count(*) OVER w AS BIGINT) AS rolling_n
FROM {table}
WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
             ROWS BETWEEN {window_rows - 1} PRECEDING
             AND CURRENT ROW)
ORDER BY key, id
""".strip()


# --------------------------------------------- gaps and islands

def longest_streak(ds, key_col: str = "user_id", ts_col: str = "ts",
                   n_buckets: int = 64):
    """Longest run of consecutive active DAYS per key — the classic
    gaps-and-islands query (activity streaks, uptime runs): distinct
    active days per key, islands found via the ``day - rank`` anchor
    (consecutive days share an anchor), answer = longest island.

    Shape: per-batch combiner collapses to DISTINCT (key, day) pairs
    (an Arrow group_by — the day grid is tiny relative to events), ONE
    key-bucket exchange, then a segmented pandas kernel over every key
    in the bucket at once (cumcount anchor → island sizes → per-key
    max + sum). Returns (key, n_active_days, longest_streak) as a
    Dataset — per-key results never gather on the driver.
    """
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.assembly import _with_bucket

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(pc.cast(t[ts_col], pa.date32(), safe=False),
                              pa.int32()), pa.int64())
        pairs = pa.table({key_col: t[key_col], "_day": day})
        return pairs.group_by([key_col, "_day"]).aggregate([])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g[[key_col, "_day"]].drop_duplicates()
             .sort_values([key_col, "_day"]))
        grp = g.groupby(key_col, sort=False, dropna=False)
        anchor = g["_day"].to_numpy() - grp.cumcount().to_numpy()
        runs = (g.assign(_anchor=anchor)
                .groupby([key_col, "_anchor"], sort=False, dropna=False)
                .size().rename("len").reset_index())
        out = (runs.groupby(key_col, sort=False, dropna=False)["len"]
               .agg(n_active_days="sum", longest_streak="max")
               .reset_index())
        out["n_active_days"] = out["n_active_days"].astype("int64")
        out["longest_streak"] = out["longest_streak"].astype("int64")
        return out

    cols = ds.select_columns([key_col, ts_col])
    bucketed = _with_bucket(
        cols.map_batches(skip_empty(partial), batch_format="pyarrow",
                         zero_copy_batch=True),
        key_col, n_buckets)
    return bucketed.groupby("_bucket").map_groups(per_bucket,
                                                  batch_format="pandas")


def longest_streak_sql(key_col: str = "user_id", ts_col: str = "ts",
                       table: str = "events") -> str:
    return f"""
WITH d AS (
  SELECT DISTINCT {key_col},
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
  FROM {table}
), r AS (
  SELECT {key_col}, day,
    row_number() OVER (PARTITION BY {key_col} ORDER BY day) AS rn
  FROM d
), runs AS (
  SELECT {key_col}, count(*) AS len
  FROM r GROUP BY {key_col}, day - rn
)
SELECT {key_col}, CAST(sum(len) AS BIGINT) AS n_active_days,
  CAST(max(len) AS BIGINT) AS longest_streak
FROM runs GROUP BY {key_col}
""".strip()


def state_intervals(ds, key_col: str = "user_id",
                    state_col: str = "event_type", ts_col: str = "ts",
                    id_col: str = "event_id", n_buckets: int = 64):
    """Run-length state intervals (SCD-style history construction):
    per key in (ts, id) order, collapse each maximal run of consecutive
    equal states into one interval row (key, state, run_id, start_us,
    end_us, n_events) — turning an event log into a validity-interval
    history table. ``run_id`` is 1-based per key in time order.

    ONE key-bucket exchange; inside a bucket the run detection is a
    segmented shift-compare + cumsum over all keys at once (no per-key
    Python). NULL states compare equal to NULL (SQL IS DISTINCT FROM
    semantics), so a NULL run is one interval, not many.
    """
    from fluent_server_ray.stages.assembly import _with_bucket

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "_us", id_col])
        grp = g.groupby(key_col, sort=False, dropna=False)
        prev = grp[state_col].shift()
        cur = g[state_col]
        same = (prev == cur) | (prev.isna() & cur.isna())
        run_id = ((~same).groupby(g[key_col], sort=False, dropna=False)
                  .cumsum().astype("int64"))
        out = (g.assign(_run=run_id)
               .groupby([key_col, state_col, "_run"], sort=False,
                        dropna=False)
               .agg(start_us=("_us", "min"), end_us=("_us", "max"),
                    n_events=(id_col, "size"))
               .reset_index()
               .rename(columns={"_run": "run_id"}))
        out["n_events"] = out["n_events"].astype("int64")
        return out[[key_col, state_col, "run_id", "start_us", "end_us",
                    "n_events"]]

    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import skip_empty

    def add_us(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        return pa.table({key_col: t[key_col], state_col: t[state_col],
                         id_col: t[id_col], "_us": us})

    prepped = ds.select_columns(
        [key_col, state_col, ts_col, id_col]
    ).map_batches(skip_empty(add_us), batch_format="pyarrow",
                  zero_copy_batch=True)
    bucketed = _with_bucket(prepped, key_col, n_buckets)
    return bucketed.groupby("_bucket").map_groups(per_bucket,
                                                  batch_format="pandas")


def state_intervals_sql(key_col: str = "user_id",
                        state_col: str = "event_type",
                        ts_col: str = "ts", id_col: str = "event_id",
                        table: str = "events") -> str:
    return f"""
WITH o AS (
  SELECT {key_col}, {state_col}, {id_col},
    epoch_us({ts_col}) AS us,
    CASE WHEN lag({state_col}) OVER w IS DISTINCT FROM {state_col}
         THEN 1 ELSE 0 END AS new_run
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col})
), runs AS (
  SELECT {key_col}, {state_col}, us, {id_col},
    sum(new_run) OVER (PARTITION BY {key_col} ORDER BY us, {id_col}
                       ROWS UNBOUNDED PRECEDING) AS run_id
  FROM o
)
SELECT {key_col}, {state_col}, CAST(run_id AS BIGINT) AS run_id,
  min(us) AS start_us, max(us) AS end_us, count(*) AS n_events
FROM runs GROUP BY {key_col}, {state_col}, run_id
""".strip()


def session_entry_exit(ds, gap_seconds: int = 1800,
                       key_col: str = "user_id", ts_col: str = "ts",
                       id_col: str = "event_id",
                       type_col: str = "event_type") -> pa.Table:
    """Session entry/exit panel — the web-analytics landing/exit
    report over :func:`sessionize`'s windows: for every (entry event
    type, exit event type) pair, how many sessions took that path and
    how many were single-event bounces.

    Same session rule and (ts, id) tie order as :func:`sessionize`;
    entry/exit are the first/last event's type under that order.
    Distributed shape: one key-bucket exchange, segmented sessionizer
    per bucket, bucket-LOCAL (entry, exit, n, bounce) counts — the
    exchange result is bounded by |types|² per bucket, merged on the
    driver. Output: (entry_type, exit_type, n_sessions, n_bounce)
    sorted.
    """
    from fluent_server_ray.stages.assembly import _with_bucket

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col])
        grp = g.groupby(key_col, sort=False, dropna=False)
        gap = grp[ts_col].diff().dt.total_seconds().fillna(0.0)
        new_s = gap > gap_seconds
        sid = new_s.groupby(g[key_col], sort=False,
                            dropna=False).cumsum().astype("int64")
        s = (g.assign(_sid=sid)
             .groupby([key_col, "_sid"], sort=False, dropna=False)
             .agg(entry=(type_col, "first"), exit=(type_col, "last"),
                  n=(type_col, "size")).reset_index())
        out = (s.groupby(["entry", "exit"], sort=False, dropna=False)
               .agg(n_sessions=("n", "size"),
                    n_bounce=("n", lambda x: int((x == 1).sum())))
               .reset_index())
        return out

    cols = [key_col, ts_col, id_col, type_col]
    bucketed = _with_bucket(ds.select_columns(cols), key_col, 64)
    parts = bucketed.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas")
    pdf = parts.to_pandas()  # bounded: <= buckets x |types|^2 rows
    if pdf.empty:
        return pa.schema([("entry_type", pa.string()),
                          ("exit_type", pa.string()),
                          ("n_sessions", pa.int64()),
                          ("n_bounce", pa.int64())]).empty_table()
    m = (pdf.groupby(["entry", "exit"], sort=True, dropna=False)
         .agg(n_sessions=("n_sessions", "sum"),
              n_bounce=("n_bounce", "sum")).reset_index())
    return pa.table({
        "entry_type": pa.array(m["entry"], pa.string()),
        "exit_type": pa.array(m["exit"], pa.string()),
        "n_sessions": pa.array(m["n_sessions"].astype("int64"),
                               pa.int64()),
        "n_bounce": pa.array(m["n_bounce"].astype("int64"), pa.int64()),
    })


def session_entry_exit_sql(gap_seconds: int = 1800,
                           table: str = "events") -> str:
    return f"""
WITH gapped AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN epoch(ts - lag(ts) OVER w) > {gap_seconds}
         THEN 1 ELSE 0 END AS new_s
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_type, ts, event_id,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
  FROM gapped
), ranked AS (
  SELECT user_id, sid, event_type,
    row_number() OVER (PARTITION BY user_id, sid
                       ORDER BY ts, event_id) AS rn,
    row_number() OVER (PARTITION BY user_id, sid
                       ORDER BY ts DESC, event_id DESC) AS rd,
    count(*) OVER (PARTITION BY user_id, sid) AS n
  FROM sess
), per AS (
  SELECT user_id, sid,
    max(CASE WHEN rn = 1 THEN event_type END) AS entry,
    max(CASE WHEN rd = 1 THEN event_type END) AS exit_t,
    max(n) AS n
  FROM ranked GROUP BY 1, 2
)
SELECT entry AS entry_type, exit_t AS exit_type,
  CAST(count(*) AS BIGINT) AS n_sessions,
  CAST(count(*) FILTER (WHERE n = 1) AS BIGINT) AS n_bounce
FROM per GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def markov_entropy_rate(ds, user_col: str = "user_id",
                        ts_col: str = "ts",
                        type_col: str = "event_type",
                        id_col: str = "event_id",
                        n_buckets: int = 64) -> pa.Table:
    """Entropy rate of the empirical event-type Markov chain: the
    average per-step unpredictability of user behavior,
    ``H = Σ_ij (c_ij/T)·ln(r_i/c_ij)`` over the transition counts
    ``c_ij`` (row sums ``r_i``, total ``T``) — ONE number that says
    whether streams are route-predictable (H→0: the Markov model
    compresses them) or noise (H→ln|states|); the scalar summary of
    :func:`event_markov_probs`' full matrix.

    Integer-log device (the source_token_kl contract,
    ``L(x) = floor(1e6·ln(x))``): ``term = Σ c_ij·(L(r_i)−L(c_ij))``
    accumulates as python ints over the BOUNDED |states|² count table;
    the one float at the end is ``DOUBLE(term) / (DOUBLE(T)·1e6)`` —
    a fixed two-node tree both engines spell identically.

    Shape: same user-bucket exchange as :func:`event_markov_probs`
    (per-bucket pair-count partials); everything after is driver math
    over |states|² rows. Returns ONE row (n_transitions, n_states,
    entropy_nats) — empty when no user has two events."""
    import math

    from fluent_server_ray.stages.aggregate import grouped_agg
    from fluent_server_ray.stages.groups import map_buckets

    bucketed = _event_sequences(ds, user_col, ts_col, type_col,
                                id_col, n_buckets)
    pair_schema = pa.schema([pa.field("src", pa.string()),
                             pa.field("dst", pa.string()),
                             pa.field("n", pa.int64())])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts_us", "id"])
        grp = g.groupby("u", sort=False)
        t2 = grp["typ"].shift(-1)
        ok = t2.notna().to_numpy()
        d = pd.DataFrame({"src": g["typ"].to_numpy()[ok],
                          "dst": t2.to_numpy()[ok]})
        c = d.groupby(["src", "dst"], sort=False).size().reset_index()
        c.columns = ["src", "dst", "n"]
        return c

    parts = map_buckets(bucketed, pairs, pair_schema)
    counts = grouped_agg(parts, keys=["src", "dst"],
                         aggs=[("n", "sum")], final="driver")
    out_schema = pa.schema([
        pa.field("n_transitions", pa.int64()),
        pa.field("n_states", pa.int64()),
        pa.field("entropy_nats", pa.float64()),
    ])
    if counts.num_rows == 0:
        return out_schema.empty_table()

    srcs = counts["src"].to_pylist()
    dsts = counts["dst"].to_pylist()
    ns = [int(x) for x in counts["n_sum"].to_pylist()]
    total = sum(ns)
    row_tot: dict[str, int] = {}
    for s, n in zip(srcs, ns):
        row_tot[s] = row_tot.get(s, 0) + n

    def L(x: int) -> int:
        return math.floor(1_000_000 * math.log(x))

    term = sum(n * (L(row_tot[s]) - L(n)) for s, n in zip(srcs, ns))
    if total >= (1 << 63):
        raise ValueError("markov_entropy_rate: transition count "
                         "exceeds BIGINT — the output cast would "
                         "overflow")
    return pa.table({
        "n_transitions": pa.array([total], pa.int64()),
        "n_states": pa.array([len(set(srcs) | set(dsts))], pa.int64()),
        "entropy_nats": pa.array(
            [float(term) / (float(total) * 1_000_000.0)], pa.float64()),
    })


def markov_entropy_rate_sql(user_col: str = "user_id",
                            ts_col: str = "ts",
                            type_col: str = "event_type",
                            id_col: str = "event_id",
                            table: str = "events") -> str:
    return f"""
WITH s AS (
  SELECT {type_col} AS src, lead({type_col}) OVER w AS dst
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {type_col} IS NOT NULL
  WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col}, {id_col})
), c AS MATERIALIZED (
  SELECT src, dst, CAST(count(*) AS HUGEINT) AS n FROM s
  WHERE dst IS NOT NULL GROUP BY 1, 2
), r AS MATERIALIZED (
  SELECT src, sum(n) AS rt FROM c GROUP BY 1
), agg AS (
  SELECT CAST(sum(c.n) AS HUGEINT) AS t,
    sum(c.n * (CAST(floor(1000000 * ln(r.rt)) AS HUGEINT)
               - CAST(floor(1000000 * ln(c.n)) AS HUGEINT))) AS term,
    (SELECT count(*) FROM (SELECT src AS st FROM c
                           UNION SELECT dst FROM c)) AS ns
  FROM c JOIN r ON c.src = r.src
)
SELECT CAST(t AS BIGINT) AS n_transitions,
  CAST(ns AS BIGINT) AS n_states,
  CAST(term AS DOUBLE) / (CAST(t AS DOUBLE) * 1000000.0)
    AS entropy_nats
FROM agg WHERE t IS NOT NULL AND t > 0
""".strip()


# --------------------------------------------- rolling order statistics

def rolling_frame_median(ds, key_col: str = "user_id", ts_col: str = "ts",
                         value_col: str = "value",
                         id_col: str = "event_id",
                         window_rows: int = 7, n_buckets: int = 64):
    """Per-key ROLLING MEDIAN over the last ``window_rows`` events in
    (ts, id) order — the order-statistic member of the rolling-frame
    family (:func:`rolling_frame_sum` is the additive member; a median
    can't be expressed as a cumsum difference, it needs the frame's
    sorted contents). The robust smoother monitoring pipelines run
    where a rolling mean would chase spikes.

    Exactness contract: values fix to integer CENTS (half-away);
    the frame median is pandas' skiplist rolling median ≡ DuckDB's
    windowed ``median()`` — the middle cents value for odd frames
    (exact int → float64), the interpolated ``(a + b) / 2`` of the two
    middle ints for even frames (one float add + halve on exactly
    representable ints — verified bit-equal across engines). NULL
    value rows are EXCLUDED by contract (mirror ``value IS NOT NULL``)
    so frame slots and frame values never diverge between the pandas
    position-window and SQL's NULL-skipping aggregate.

    Shape: one key bucket exchange; inside a bucket every key's series
    runs through one C-implemented groupby-rolling kernel. NULL key is
    its own partition. Output: (id, key, cents, rolling_median) sorted
    by (key, id).
    """
    import pyarrow.compute as pc

    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.features import _cents
    from fluent_server_ray.stages.groups import map_buckets

    def clean(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value_col]))
        return pa.table({
            "id": pc.cast(t[id_col], pa.int64()),
            "key": pc.cast(t[key_col], pa.string()),
            "_us": t[ts_col].cast(pa.int64()),
            "cents": _cents(t[value_col]),
        })

    schema = pa.schema([
        pa.field("id", pa.int64()),
        pa.field("key", pa.string()),
        pa.field("cents", pa.int64()),
        pa.field("rolling_median", pa.float64()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["key", "_us", "id"])
        med = (g.groupby("key", sort=False, dropna=False)["cents"]
               .rolling(window_rows, min_periods=1).median()
               .reset_index(level=0, drop=True))
        return pd.DataFrame({
            "id": g["id"].to_numpy(),
            "key": g["key"].to_numpy(),
            "cents": g["cents"].to_numpy(),
            "rolling_median": med.reindex(g.index).to_numpy(),
        })

    bucketed = _with_bucket(
        ds.select_columns([id_col, key_col, ts_col, value_col])
        .map_batches(clean, batch_format="pyarrow",
                     zero_copy_batch=True), "key", n_buckets)
    return map_buckets(bucketed, per_bucket, schema).sort(
        ["key", "id"])


def rolling_frame_median_sql(key_col: str = "user_id",
                             ts_col: str = "ts",
                             value_col: str = "value",
                             id_col: str = "event_id",
                             window_rows: int = 7,
                             table: str = "events") -> str:
    return f"""
SELECT CAST({id_col} AS BIGINT) AS id,
  CAST({key_col} AS VARCHAR) AS key,
  CAST(round({value_col} * 100.0) AS BIGINT) AS cents,
  CAST(median(CAST(round({value_col} * 100.0) AS BIGINT))
       OVER w AS DOUBLE) AS rolling_median
FROM {table}
WHERE {value_col} IS NOT NULL
WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
             ROWS BETWEEN {window_rows - 1} PRECEDING
             AND CURRENT ROW)
ORDER BY key, id
""".strip()


# --------------------------------------------- peak interval concurrency

def peak_concurrency(ds, ts_col: str = "ts", id_col: str = "event_id",
                     dur_mod: int = 600):
    """Per-day PEAK CONCURRENCY of activity intervals — the sweep-line
    question :func:`merge_intervals` doesn't answer (union coverage
    says how much time was busy; this says how DEEP the busiest moment
    was — the capacity-planning number). Intervals are the session
    extents ``[ts, ts + (id % dur_mod) s)`` in integer micros (the
    :func:`merge_intervals` recipe); each interval belongs to its
    START day by contract.

    Exactness/order contract: boundary deltas (+1 at start, −1 at end)
    aggregate PER DISTINCT TIMESTAMP before the running sum — the
    "after all peers" value, which is what SQL's default RANGE window
    frame computes — so tie order can never change the result.
    Zero-length intervals (id % dur_mod = 0) contribute +1 −1 at one
    timestamp and never count, on both engines. The peak and its
    FIRST attaining timestamp are exact integers.

    Shape: one combiner pass collapses each block to per-(day,
    timestamp) delta sums; the distributed per-(day, t) merge bounds
    the exchange by distinct boundary instants; the per-day sweep
    (sort + cumsum + argmax) runs in one pandas kernel per day group.
    The sweep is inherently sequential WITHIN a day — day is the
    partition key, so depth scales with cluster width across days.
    NULL ts/id rows are excluded by contract. Output: (day,
    peak_concurrency, peak_at_us) sorted by day.
    """
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.features import _epoch_day

    def deltas(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                             pc.is_valid(t[id_col])))
        day = _epoch_day(t[ts_col]).to_numpy(zero_copy_only=False)
        # explicit us cast: a pandas-born Dataset carries ns precision,
        # and nanos would silently shrink every interval 1000x
        s_us = (t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
                .to_numpy(zero_copy_only=False))
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        e_us = s_us + (ids % dur_mod) * 1_000_000
        prep = pa.table({
            "day": pa.array(np.concatenate([day, day])),
            "t": pa.array(np.concatenate([s_us, e_us])),
            "delta": pa.array(np.concatenate(
                [np.ones(len(s_us), dtype=np.int64),
                 -np.ones(len(s_us), dtype=np.int64)])),
        })
        out = prep.group_by(["day", "t"]).aggregate([("delta", "sum")])
        return out.rename_columns(["day", "t", "delta"])

    merged = grouped_agg(
        ds.map_batches(skip_empty(deltas), batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["day", "t"], aggs=[("delta", "sum")], final="ray")

    schema = pa.schema([
        pa.field("day", pa.int64()),
        pa.field("peak_concurrency", pa.int64()),
        pa.field("peak_at_us", pa.int64()),
    ])

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("t")
        cum = g["delta_sum"].to_numpy(dtype=np.int64).cumsum()
        peak = int(cum.max())
        at = int(g["t"].to_numpy()[int(np.argmax(cum))])
        return pd.DataFrame({"day": [int(g["day"].iloc[0])],
                             "peak_concurrency": [peak],
                             "peak_at_us": [at]})

    out = merged.groupby("day").map_groups(sweep, batch_format="pandas")
    parts = [t for t in out.iter_batches(batch_size=None,
                                         batch_format="pyarrow")]
    if not parts:
        return schema.empty_table()
    return (pa.concat_tables([t.cast(schema) for t in parts])
            .sort_by([("day", "ascending")]))


def peak_concurrency_sql(ts_col: str = "ts", id_col: str = "event_id",
                         dur_mod: int = 600,
                         table: str = "events") -> str:
    return f"""
WITH iv AS (
  SELECT
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    epoch_us({ts_col}) AS s_us,
    epoch_us({ts_col})
      + (CAST({id_col} AS BIGINT) % {dur_mod}) * 1000000 AS e_us
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {id_col} IS NOT NULL
), b AS (
  SELECT day, s_us AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT day, e_us AS t, -1 AS delta FROM iv
), c AS (
  SELECT day, t,
    sum(delta) OVER (PARTITION BY day ORDER BY t) AS cum
  FROM b
), peaks AS (
  SELECT day, max(cum) AS peak FROM c GROUP BY day
)
SELECT p.day, CAST(p.peak AS BIGINT) AS peak_concurrency,
  CAST(min(c.t) AS BIGINT) AS peak_at_us
FROM peaks p JOIN c ON c.day = p.day AND c.cum = p.peak
GROUP BY p.day, p.peak
ORDER BY p.day
""".strip()


def clamped_balance(ds, key_col: str = "user_id", ts_col: str = "ts",
                    type_col: str = "event_type",
                    value_col: str = "value",
                    credit_type: str = "purchase",
                    debit_type: str = "click",
                    n_buckets: int = 64):
    """Floor-at-zero running balance per key — the constrained-scan
    primitive (prepaid wallets, inventory that can't go negative,
    rate-limit token buckets): ``b_i = max(0, b_{i-1} + d_i)`` with
    ``b_0 = 0`` over per-key deltas ordered by (ts, id).

    The clamp recurrence LOOKS sequential but closes under the
    max-plus identity ``b_i = S_i − min(0, min_{j≤i} S_j)`` (S = plain
    prefix sum), so it computes from two segmented kernels — a cumsum
    and an exclusive running min — with no per-row Python. A clamp
    fires at ``i`` iff ``S_i`` is a strict new prefix minimum below 0
    (equivalently ``b_{i-1} + d_i < 0``). All arithmetic is exact
    int64 cents; credits are ``credit_type`` rows (+cents), debits
    ``debit_type`` rows (−cents); other types are excluded. Tie order
    within a key is (ts, event_id) — contractual. NULL key/ts/value
    rows are excluded by contract.

    Shape: ONE key-bucket exchange; each bucket runs the segmented
    numpy kernels over all its keys at once. Returns per key
    (key, n_events, final_balance_cents, min_prefix_cents,
    clamp_count) as a Dataset — never on the driver.
    """
    import numpy as np
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.features import _cents

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[key_col]),
                               pc.is_valid(t[ts_col])),
                       pc.and_(pc.is_valid(t[value_col]),
                               pc.is_in(t[type_col], value_set=pa.array(
                                   [credit_type, debit_type]))))
        t = t.filter(keep)
        sign = pc.if_else(pc.equal(t[type_col], credit_type),
                          pa.scalar(1, pa.int64()),
                          pa.scalar(-1, pa.int64()))
        return pa.table({
            key_col: t[key_col],
            "_us": t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "_id": t["event_id"],
            "_d": pc.multiply_checked(_cents(t[value_col]), sign),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "_us", "_id"], kind="mergesort")
        k = g[key_col].to_numpy()
        d = g["_d"].to_numpy(dtype=np.int64)
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        seg = np.cumsum(new) - 1
        # segmented cumsum: subtract the running total at each key start
        cs = np.cumsum(d)
        base = np.zeros(seg[-1] + 1, dtype=np.int64)
        starts = np.nonzero(new)[0]
        base[1:] = cs[starts[1:] - 1]
        s = cs - base[seg]
        # segmented running min of s (groupby cummin — C kernel, no
        # bias trick: a 2^62·seg offset would wrap int64 at seg ≥ 2)
        runmin = pd.Series(s).groupby(seg).cummin().to_numpy(
            dtype=np.int64)
        # exclusive prefix min (min over j < i), empty -> 0-clip later
        excl = np.empty_like(runmin)
        excl[1:] = runmin[:-1]
        excl[new] = np.int64(2 ** 62)          # "no prior" sentinel
        clamp = s < np.minimum(excl, 0)
        n = np.bincount(seg)
        ends = np.nonzero(np.append(new[1:], True))[0]
        out = pd.DataFrame({
            key_col: k[starts],
            "n_events": n.astype("int64"),
            "final_balance_cents":
                (s[ends] - np.minimum(runmin[ends], 0)).astype("int64"),
            "min_prefix_cents": runmin[ends].astype("int64"),
            "clamp_count": np.bincount(seg, weights=clamp)
                .astype("int64"),
        })
        return out

    cols = ds.select_columns(list(dict.fromkeys(
        [key_col, ts_col, type_col, value_col, "event_id"])))
    bucketed = _with_bucket(
        cols.map_batches(skip_empty(prep), batch_format="pyarrow",
                         zero_copy_batch=True),
        key_col, n_buckets)
    return bucketed.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas")


def clamped_balance_sql(key_col: str = "user_id", ts_col: str = "ts",
                        type_col: str = "event_type",
                        value_col: str = "value",
                        credit_type: str = "purchase",
                        debit_type: str = "click",
                        table: str = "events") -> str:
    return f"""
WITH d AS (
  SELECT {key_col}, event_id, {ts_col},
    CASE WHEN {type_col} = '{credit_type}'
      THEN CAST(round({value_col} * 100.0) AS BIGINT)
      ELSE -CAST(round({value_col} * 100.0) AS BIGINT) END AS delta
  FROM {table}
  WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
    AND {type_col} IN ('{credit_type}', '{debit_type}')
), s0 AS (
  SELECT {key_col}, event_id, {ts_col}, delta,
    SUM(delta) OVER (PARTITION BY {key_col}
      ORDER BY {ts_col}, event_id ROWS UNBOUNDED PRECEDING) AS s
  FROM d
), s AS (
  SELECT {key_col}, delta, s,
    MIN(s) OVER (PARTITION BY {key_col} ORDER BY {ts_col}, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mprev
  FROM s0
)
SELECT {key_col}, CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(delta) - LEAST(0, min(s)) AS BIGINT)
    AS final_balance_cents,
  CAST(min(s) AS BIGINT) AS min_prefix_cents,
  CAST(sum(CASE WHEN s < LEAST(COALESCE(mprev, 0), 0)
      THEN 1 ELSE 0 END) AS BIGINT) AS clamp_count
FROM s GROUP BY {key_col}
""".strip()


def ohlc_daily_bars(ds, group_col: str = "event_type",
                    ts_col: str = "ts", value_col: str = "value"):
    """Daily OHLC bars per group — the bar-aggregation primitive
    (candlesticks, per-day sensor summaries): open = first cents by
    (ts, event_id), high/low = max/min, close = last, n = row count.

    Open/close are ORDER STATISTICS, not algebraic aggregates, but
    they still combine: each block emits per (group, day) its own
    first/last (keyed by the (us, event_id) tie-breaker — contractual,
    event_id is unique) and min/max/count; the driver merge re-picks
    first/last across block partials by the same key. The partial
    table is bounded by |groups|·|days|·blocks. All values exact int64
    cents. NULL group/ts/value rows are excluded by contract.
    Output: (group, day, open_cents, high_cents, low_cents,
    close_cents, n) sorted by (group, day).
    """
    import numpy as np
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.features import _cents, _epoch_day

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[group_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        df = pa.table({
            "g": t[group_col],
            "day": _epoch_day(t[ts_col]),
            "us": t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "id": t["event_id"],
            "c": _cents(t[value_col]),
        }).to_pandas()
        df = df.sort_values(["g", "day", "us", "id"], kind="mergesort")
        grp = df.groupby(["g", "day"], sort=False)
        head = grp.head(1).rename(columns={
            "us": "o_us", "id": "o_id", "c": "o_c"})
        tail = grp.tail(1).rename(columns={
            "us": "c_us", "id": "c_id", "c": "c_c"})
        agg = grp["c"].agg(lo="min", hi="max", n="size").reset_index()
        out = agg.merge(head, on=["g", "day"]).merge(
            tail, on=["g", "day"])
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(out[[
            "g", "day", "o_us", "o_id", "o_c",
            "c_us", "c_id", "c_c", "lo", "hi", "n"]],
            preserve_index=False)

    parts = [t.to_pandas() for t in ds.select_columns(
        [group_col, ts_col, value_col, "event_id"]).map_batches(
            skip_empty(partial), batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_size=None,
                                               batch_format="pyarrow")]
    parts = [p for p in parts if len(p)]
    if not parts:
        return pa.table({
            group_col: pa.array([], pa.string()),
            "day": pa.array([], pa.int64()),
            "open_cents": pa.array([], pa.int64()),
            "high_cents": pa.array([], pa.int64()),
            "low_cents": pa.array([], pa.int64()),
            "close_cents": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        })
    allp = pd.concat(parts, ignore_index=True)
    opens = (allp.sort_values(["g", "day", "o_us", "o_id"],
                              kind="mergesort")
             .groupby(["g", "day"], sort=False).head(1)
             [["g", "day", "o_c"]])
    closes = (allp.sort_values(["g", "day", "c_us", "c_id"],
                               kind="mergesort")
              .groupby(["g", "day"], sort=False).tail(1)
              [["g", "day", "c_c"]])
    aggs = (allp.groupby(["g", "day"], sort=True)
            .agg(low_cents=("lo", "min"), high_cents=("hi", "max"),
                 n=("n", "sum")).reset_index())
    out = aggs.merge(opens, on=["g", "day"]).merge(
        closes, on=["g", "day"]).sort_values(["g", "day"])
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "day": pa.array(out["day"].astype("int64")),
        "open_cents": pa.array(out["o_c"].astype("int64")),
        "high_cents": pa.array(out["high_cents"].astype("int64")),
        "low_cents": pa.array(out["low_cents"].astype("int64")),
        "close_cents": pa.array(out["c_c"].astype("int64")),
        "n": pa.array(out["n"].astype("int64")),
    })


def ohlc_daily_bars_sql(group_col: str = "event_type",
                        ts_col: str = "ts", value_col: str = "value",
                        table: str = "events") -> str:
    return f"""
WITH d AS (
  SELECT {group_col} AS g,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    {ts_col} AS ts, event_id,
    CAST(round({value_col} * 100.0) AS BIGINT) AS c
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
), w AS (
  SELECT g, day, c,
    row_number() OVER (PARTITION BY g, day
                       ORDER BY ts, event_id) AS rn_a,
    row_number() OVER (PARTITION BY g, day
                       ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM d
)
SELECT g AS {group_col}, day,
  CAST(max(CASE WHEN rn_a = 1 THEN c END) AS BIGINT) AS open_cents,
  CAST(max(c) AS BIGINT) AS high_cents,
  CAST(min(c) AS BIGINT) AS low_cents,
  CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS close_cents,
  CAST(count(*) AS BIGINT) AS n
FROM w GROUP BY g, day ORDER BY g, day
""".strip()


def cdc_apply(ds, key_col: str = "user_id", ts_col: str = "ts",
              type_col: str = "event_type", value_col: str = "value",
              insert_type: str = "signup", update_type: str = "click",
              delete_type: str = "error", n_buckets: int = 64):
    """Replay a CDC log onto an (initially empty) keyed table — the
    upsert-apply primitive of every lakehouse MERGE: per key, ops in
    (ts, event_id) order with INSERT (upsert: sets the row), UPDATE
    (sets the value IFF the row currently exists, else a skipped
    no-op), DELETE (tombstone: removes IFF exists).

    The replay LOOKS sequential, but existence only changes at
    BOUNDARY ops (insert/delete), so it vectorizes: segment each
    key's stream at boundaries; an update applies iff its segment
    opens with an insert; the key exists at the end iff its LAST
    boundary is an insert; the final value is the last applied
    set-op's cents. All values exact int64 cents; tie order
    (ts, event_id) contractual. NULL key/ts/value rows excluded.

    Shape: ONE key-bucket exchange; per bucket the segmentation is
    pandas C kernels (cumsum / transform-first / tail). Returns only
    keys EXISTING at end: (key, final_value_cents, n_ops, n_ins,
    n_upd_applied, n_upd_skipped, n_del) as a Dataset.
    """
    import numpy as np
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.features import _cents

    type_map = {insert_type: "I", update_type: "U", delete_type: "D"}

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[key_col]),
                               pc.is_valid(t[ts_col])),
                       pc.and_(pc.is_valid(t[value_col]),
                               pc.is_in(t[type_col], value_set=pa.array(
                                   list(type_map)))))
        t = t.filter(keep)
        op = t[type_col].to_pandas().map(type_map).to_numpy()
        return pa.table({
            key_col: t[key_col],
            "_us": t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "_id": t["event_id"],
            "_op": pa.array(op, pa.string()),
            "_c": _cents(t[value_col]),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "_us", "_id"], kind="mergesort")
        boundary = g["_op"].isin(["I", "D"])
        seg = boundary.groupby(g[key_col]).cumsum()
        # seg increments AT each boundary row, so each seg>0 group's
        # first row IS its boundary op
        bop = (g["_op"].where(boundary)
               .groupby([g[key_col], seg]).transform("first"))
        applied_u = (g["_op"] == "U") & (bop == "I")
        is_set = (g["_op"] == "I") | applied_u
        per = g.groupby(key_col, sort=True)
        stats = pd.DataFrame({
            "n_ops": per.size().astype("int64"),
            "n_ins": (g["_op"] == "I").groupby(g[key_col]).sum()
                .astype("int64"),
            "n_upd_applied": applied_u.groupby(g[key_col]).sum()
                .astype("int64"),
            "n_upd_skipped": ((g["_op"] == "U") & ~applied_u)
                .groupby(g[key_col]).sum().astype("int64"),
            "n_del": (g["_op"] == "D").groupby(g[key_col]).sum()
                .astype("int64"),
        })
        last_bop = bop.groupby(g[key_col]).last()
        exists = last_bop == "I"
        finals = (g[is_set.to_numpy()]
                  .groupby(key_col, sort=True)["_c"].last())
        out = stats[exists.reindex(stats.index, fill_value=False)]
        out = out.join(finals.rename("final_value_cents"))
        out["final_value_cents"] = (out["final_value_cents"]
                                    .astype("int64"))
        return out.reset_index().rename(columns={"index": key_col})[
            [key_col, "final_value_cents", "n_ops", "n_ins",
             "n_upd_applied", "n_upd_skipped", "n_del"]]

    cols = ds.select_columns(list(dict.fromkeys(
        [key_col, ts_col, type_col, value_col, "event_id"])))
    bucketed = _with_bucket(
        cols.map_batches(skip_empty(prep), batch_format="pyarrow",
                         zero_copy_batch=True),
        key_col, n_buckets)
    return bucketed.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas")


def cdc_apply_sql(key_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  value_col: str = "value",
                  insert_type: str = "signup",
                  update_type: str = "click",
                  delete_type: str = "error",
                  table: str = "events") -> str:
    return f"""
WITH log AS (
  SELECT {key_col}, {ts_col} AS ts, event_id,
    CASE {type_col} WHEN '{insert_type}' THEN 'I'
      WHEN '{update_type}' THEN 'U' ELSE 'D' END AS op,
    CAST(round({value_col} * 100.0) AS BIGINT) AS c
  FROM {table}
  WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
    AND {type_col} IN ('{insert_type}', '{update_type}',
                       '{delete_type}')
), w AS (
  SELECT *,
    last_value(CASE WHEN op IN ('I', 'D') THEN op END IGNORE NULLS)
      OVER (PARTITION BY {key_col} ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS last_b
  FROM log
), applied AS (
  SELECT *,
    (op = 'I' OR (op = 'U' AND last_b = 'I')) AS is_set
  FROM w
), finals AS (
  SELECT {key_col}, c AS final_value_cents
  FROM (SELECT *, row_number() OVER (PARTITION BY {key_col}
          ORDER BY ts DESC, event_id DESC) AS rn
        FROM applied WHERE is_set)
  WHERE rn = 1
), stats AS (
  SELECT {key_col},
    CAST(count(*) AS BIGINT) AS n_ops,
    CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_ins,
    CAST(sum(CASE WHEN op = 'U' AND last_b = 'I' THEN 1 ELSE 0 END)
      AS BIGINT) AS n_upd_applied,
    CAST(sum(CASE WHEN op = 'U'
        AND (last_b IS NULL OR last_b != 'I') THEN 1 ELSE 0 END)
      AS BIGINT) AS n_upd_skipped,
    CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_del,
    max(CASE WHEN rn_last = 1 THEN last_b END) AS end_b
  FROM (SELECT *, row_number() OVER (PARTITION BY {key_col}
          ORDER BY ts DESC, event_id DESC) AS rn_last FROM w)
  GROUP BY {key_col}
)
SELECT s.{key_col}, f.final_value_cents, s.n_ops, s.n_ins,
  s.n_upd_applied, s.n_upd_skipped, s.n_del
FROM stats s JOIN finals f USING ({key_col})
WHERE s.end_b = 'I'
""".strip()


def fifo_allocation(ds, key_col: str = "user_id", ts_col: str = "ts",
                    type_col: str = "event_type",
                    value_col: str = "value",
                    supply_type: str = "purchase",
                    demand_type: str = "click",
                    n_buckets: int = 64):
    """FIFO lot allocation per key — the inventory/cost-matching
    primitive (FIFO cost basis, credit consumption): supply lots are
    ``supply_type`` rows in (ts, event_id) order; total demand is the
    key's ``demand_type`` cents sum; demand consumes lots first-in-
    first-out. Per-lot consumption has the closed form
    ``clamp(D − S_{i−1}, 0, lot_i)`` (S = supply prefix sum), so the
    whole allocation reduces to one segmented cumsum — no sequential
    replay.

    All quantities exact int64 cents; rows with cents ≤ 0 are
    excluded on BOTH sides (monotone prefix contract); NULL
    key/ts/value rows excluded. Keys appear when they have ≥1 supply
    or demand row. Output per key: (key, n_lots, supply_cents,
    demand_cents, matched_cents, n_lots_full, partial_lot_cents)
    where ``n_lots_full = #{i : S_i ≤ D}`` and ``partial_lot_cents =
    min(D, T) − S_{n_full}`` (the slice taken from the first open
    lot). Returned as a Dataset via one key-bucket exchange.
    """
    import numpy as np
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.features import _cents

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[key_col]),
                               pc.is_valid(t[ts_col])),
                       pc.and_(pc.is_valid(t[value_col]),
                               pc.is_in(t[type_col], value_set=pa.array(
                                   [supply_type, demand_type]))))
        t = t.filter(keep)
        c = _cents(t[value_col])
        t = pa.table({
            key_col: t[key_col],
            "_us": t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "_id": t["event_id"],
            "_sup": pc.equal(t[type_col], supply_type),
            "_c": c,
        }).filter(pc.greater(c, 0))
        return t

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "_us", "_id"], kind="mergesort")
        sup = g[g["_sup"]]
        dem = g[~g["_sup"]]
        d_tot = dem.groupby(key_col, sort=True)["_c"].sum()
        s_cum = sup.groupby(key_col, sort=False)["_c"].cumsum()
        lots = pd.DataFrame({key_col: sup[key_col], "s": s_cum})
        keys = sorted(set(g[key_col]))
        out = []
        dmap = d_tot.to_dict()
        grouped_s = {k: v["s"].to_numpy(dtype=np.int64)
                     for k, v in lots.groupby(key_col, sort=False)}
        for k in keys:
            D = int(dmap.get(k, 0))
            s = grouped_s.get(k, np.empty(0, dtype=np.int64))
            T = int(s[-1]) if len(s) else 0
            n_full = int((s <= D).sum())
            s_full = int(s[n_full - 1]) if n_full else 0
            matched = min(D, T)
            out.append((k, len(s), T, D, matched, n_full,
                        matched - s_full))
        return pd.DataFrame(out, columns=[
            key_col, "n_lots", "supply_cents", "demand_cents",
            "matched_cents", "n_lots_full", "partial_lot_cents"])

    cols = ds.select_columns(list(dict.fromkeys(
        [key_col, ts_col, type_col, value_col, "event_id"])))
    bucketed = _with_bucket(
        cols.map_batches(skip_empty(prep), batch_format="pyarrow",
                         zero_copy_batch=True),
        key_col, n_buckets)
    return bucketed.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas")


def fifo_allocation_sql(key_col: str = "user_id", ts_col: str = "ts",
                        type_col: str = "event_type",
                        value_col: str = "value",
                        supply_type: str = "purchase",
                        demand_type: str = "click",
                        table: str = "events") -> str:
    return f"""
WITH rows_ AS (
  SELECT {key_col}, {ts_col} AS ts, event_id,
    {type_col} = '{supply_type}' AS sup,
    CAST(round({value_col} * 100.0) AS BIGINT) AS c
  FROM {table}
  WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
    AND {type_col} IN ('{supply_type}', '{demand_type}')
    AND CAST(round({value_col} * 100.0) AS BIGINT) > 0
), dem AS (
  SELECT {key_col}, CAST(sum(c) AS BIGINT) AS d
  FROM rows_ WHERE NOT sup GROUP BY 1
), lots AS (
  SELECT {key_col},
    SUM(c) OVER (PARTITION BY {key_col} ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS s
  FROM rows_ WHERE sup
), keys AS (SELECT DISTINCT {key_col} FROM rows_),
sup_agg AS (
  SELECT k.{key_col},
    CAST(COALESCE(count(l.s), 0) AS BIGINT) AS n_lots,
    CAST(COALESCE(max(l.s), 0) AS BIGINT) AS t,
    CAST(COALESCE(sum(CASE WHEN l.s <= COALESCE(dm.d, 0)
        THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_full,
    CAST(COALESCE(max(CASE WHEN l.s <= COALESCE(dm.d, 0)
        THEN l.s END), 0) AS BIGINT) AS s_full,
    CAST(COALESCE(dm.d, 0) AS BIGINT) AS d
  FROM keys k
  LEFT JOIN dem dm USING ({key_col})
  LEFT JOIN lots l USING ({key_col})
  GROUP BY k.{key_col}, dm.d
)
SELECT {key_col}, n_lots, t AS supply_cents, d AS demand_cents,
  LEAST(d, t) AS matched_cents, n_full AS n_lots_full,
  LEAST(d, t) - s_full AS partial_lot_cents
FROM sup_agg
""".strip()


def cohort_ltv(ds, user_col: str = "user_id", ts_col: str = "ts",
               type_col: str = "event_type", value_col: str = "value",
               revenue_type: str = "purchase", n_buckets: int = 64):
    """Cohort lifetime-value curve — the growth-accounting readout
    beside retention: users cohort by their FIRST-activity epoch week
    (any event type); each (cohort, age) cell accumulates the
    cohort's ``revenue_type`` cents in that age week; the curve is
    cumulative revenue per cohort user by age.

    Exact contract: cohort membership and revenue are exact int
    counts/cents (a cohort user with no purchases still dilutes the
    per-user LTV — contract); ``ltv_per_user`` is ONE float division
    per row on the driver-side cumulative (the (cohort × age) grid is
    calendar-bounded). Ages with no revenue but ≥1 active cohort
    member appear with 0 revenue; fully silent ages are ABSENT
    (contract — mirrored). NULL user/ts/value rows excluded.

    Shape: per-(user, week) combiner → distributed per-user merge →
    ONE user-bucket exchange (cohort = min week inside the bucket) →
    bounded (cohort, age) driver merge + cumsum. Output:
    (cohort_week, age_weeks, n_users, revenue_cents,
    cum_revenue_cents, ltv_per_user) sorted by (cohort_week, age).
    """
    import numpy as np
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.features import _cents, _epoch_day

    def per_uw(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[user_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        wk = pc.divide(_epoch_day(t[ts_col]), 7)
        # fill_null: NULL event_type is non-revenue (mirror's CASE
        # WHEN hits the ELSE 0 branch), not a NULL rev that would
        # poison the cell sum
        rev = pc.if_else(pc.fill_null(pc.equal(t[type_col],
                                               revenue_type), False),
                         _cents(t[value_col]),
                         pa.scalar(0, pa.int64()))
        prep = pa.table({"user": pc.cast(t[user_col], pa.int64()),
                         "wk": wk, "rev": rev})
        out = prep.group_by(["user", "wk"]).aggregate([("rev", "sum")])
        return out.rename_columns(["user", "wk", "rev"])

    per_user_week = grouped_agg(
        ds.map_batches(skip_empty(per_uw), batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["user", "wk"], aggs=[("rev", "sum")], final="ray")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cohort = g.groupby("user")["wk"].transform("min")
        out = pd.DataFrame({
            "cohort": cohort.astype("int64"),
            "age": (g["wk"] - cohort).astype("int64"),
            "rev": g["rev_sum"].astype("int64"),
            "new_user": (g["wk"] == cohort).astype("int64"),
        })
        return (out.groupby(["cohort", "age"], as_index=False)
                .agg(rev=("rev", "sum"), new_user=("new_user", "sum")))

    bucketed = _with_bucket(per_user_week, "user", n_buckets)
    cells = grouped_agg(
        bucketed.groupby("_bucket").map_groups(
            per_bucket, batch_format="pandas"),
        ["cohort", "age"], [("rev", "sum"), ("new_user", "sum")],
        final="driver").to_pandas()

    cells = cells.sort_values(["cohort", "age"]).reset_index(drop=True)
    rows = {"cohort": [], "age": [], "n": [], "rev": [], "cum": [],
            "ltv": []}
    for cohort, sub in cells.groupby("cohort", sort=True):
        n_users = int(sub[sub["age"] == 0]["new_user_sum"].sum())
        cum = 0
        for _, r in sub.iterrows():
            cum += int(r["rev_sum"])
            rows["cohort"].append(int(cohort))
            rows["age"].append(int(r["age"]))
            rows["n"].append(n_users)
            rows["rev"].append(int(r["rev_sum"]))
            rows["cum"].append(cum)
            rows["ltv"].append(float(cum) / float(n_users)
                               if n_users else None)
    return pa.table({
        "cohort_week": pa.array(rows["cohort"], pa.int64()),
        "age_weeks": pa.array(rows["age"], pa.int64()),
        "n_users": pa.array(rows["n"], pa.int64()),
        "revenue_cents": pa.array(rows["rev"], pa.int64()),
        "cum_revenue_cents": pa.array(rows["cum"], pa.int64()),
        "ltv_per_user": pa.array(rows["ltv"], pa.float64()),
    })


def cohort_ltv_sql(user_col: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type",
                   value_col: str = "value",
                   revenue_type: str = "purchase",
                   table: str = "events") -> str:
    return f"""
WITH uw AS (
  SELECT {user_col} AS u,
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) // 7
      AS wk,
    SUM(CASE WHEN {type_col} = '{revenue_type}'
        THEN CAST(round({value_col} * 100.0) AS BIGINT)
        ELSE 0 END) AS rev
  FROM {table}
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
  GROUP BY 1, 2
), coh AS (
  SELECT u, wk, rev, min(wk) OVER (PARTITION BY u) AS cohort
  FROM uw
), cells AS (
  SELECT cohort, wk - cohort AS age,
    CAST(sum(rev) AS BIGINT) AS revenue_cents,
    CAST(sum(CASE WHEN wk = cohort THEN 1 ELSE 0 END) AS BIGINT)
      AS new_users
  FROM coh GROUP BY 1, 2
), sized AS (
  SELECT cohort, age, revenue_cents,
    CAST(sum(revenue_cents) OVER (PARTITION BY cohort ORDER BY age
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents,
    CAST(sum(CASE WHEN age = 0 THEN new_users ELSE 0 END)
      OVER (PARTITION BY cohort) AS BIGINT) AS n_users
  FROM cells
)
SELECT cohort AS cohort_week, age AS age_weeks, n_users,
  revenue_cents, cum_revenue_cents,
  CASE WHEN n_users > 0 THEN
    CAST(cum_revenue_cents AS DOUBLE) / CAST(n_users AS DOUBLE)
  END AS ltv_per_user
FROM sized ORDER BY cohort_week, age_weeks
""".strip()


def threshold_crossing(ds, key_col: str = "user_id", ts_col: str = "ts",
                       value_col: str = "value",
                       threshold_cents: int = 50000,
                       n_buckets: int = 64):
    """First-passage time per key: the earliest event at which the
    key's CUMULATIVE cents (ordered by (ts, event_id)) reaches the
    threshold — the credit-limit / lifetime-value-milestone trigger
    ("when did this account cross $500?").

    Exact contract: the running sum is exact int64 cents; the crossing
    is the FIRST prefix ≥ threshold (negative values may delay or
    prevent it — the scan is over the true signed prefix, not a
    monotone bound); keys that never cross report NULLs but still
    appear with their totals. Tie order (ts, event_id) contractual;
    NULL key/ts/value rows excluded.

    Shape: ONE key-bucket exchange; segmented cumsum + first-True
    argmax per bucket. Output per key: (key, n_events, total_cents,
    crossed, cross_ts_us, cross_event_id, cross_cum_cents) as a
    Dataset.
    """
    import numpy as np
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.features import _cents

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(t[key_col]),
                               pc.is_valid(t[ts_col])),
                       pc.is_valid(t[value_col]))
        t = t.filter(keep)
        return pa.table({
            key_col: t[key_col],
            "_us": t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "_id": t["event_id"],
            "_c": _cents(t[value_col]),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "_us", "_id"], kind="mergesort")
        k = g[key_col].to_numpy()
        c = g["_c"].to_numpy(dtype=np.int64)
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        seg = np.cumsum(new) - 1
        cs = np.cumsum(c)
        starts = np.nonzero(new)[0]
        base = np.zeros(seg[-1] + 1, dtype=np.int64)
        base[1:] = cs[starts[1:] - 1]
        s = cs - base[seg]
        hit = s >= threshold_cents
        # first hit per segment: argmax over hit with segment offsets
        df = pd.DataFrame({"seg": seg, "hit": hit,
                           "pos": np.arange(len(g))})
        first = (df[df.hit].groupby("seg")["pos"].min())
        ends = np.nonzero(np.append(new[1:], True))[0]
        n = np.bincount(seg)
        rows = {
            key_col: k[starts],
            "n_events": n.astype("int64"),
            "total_cents": s[ends].astype("int64"),
        }
        cross_ts, cross_id, cross_cum, crossed = [], [], [], []
        for sidx in range(len(starts)):
            if sidx in first.index:
                p = int(first.loc[sidx])
                crossed.append(True)
                cross_ts.append(int(g["_us"].iloc[p]))
                cross_id.append(int(g["_id"].iloc[p]))
                cross_cum.append(int(s[p]))
            else:
                crossed.append(False)
                cross_ts.append(None)
                cross_id.append(None)
                cross_cum.append(None)
        out = pd.DataFrame(rows)
        out["crossed"] = pd.array(crossed, dtype="boolean")
        out["cross_ts_us"] = pd.array(cross_ts, dtype="Int64")
        out["cross_event_id"] = pd.array(cross_id, dtype="Int64")
        out["cross_cum_cents"] = pd.array(cross_cum, dtype="Int64")
        return out

    cols = ds.select_columns(list(dict.fromkeys(
        [key_col, ts_col, value_col, "event_id"])))
    bucketed = _with_bucket(
        cols.map_batches(skip_empty(prep), batch_format="pyarrow",
                         zero_copy_batch=True),
        key_col, n_buckets)
    return bucketed.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas")


def threshold_crossing_sql(key_col: str = "user_id", ts_col: str = "ts",
                           value_col: str = "value",
                           threshold_cents: int = 50000,
                           table: str = "events") -> str:
    return f"""
WITH d AS (
  SELECT {key_col}, epoch_us({ts_col}) AS us, event_id,
    CAST(round({value_col} * 100.0) AS BIGINT) AS c
  FROM {table}
  WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
    AND {value_col} IS NOT NULL
), s AS (
  SELECT {key_col}, us, event_id,
    SUM(c) OVER (PARTITION BY {key_col} ORDER BY us, event_id
                 ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
), hits AS (
  SELECT {key_col}, us, event_id, cum,
    row_number() OVER (PARTITION BY {key_col}
                       ORDER BY us, event_id) AS rn
  FROM s WHERE cum >= {threshold_cents}
), tot AS (
  SELECT {key_col}, CAST(count(*) AS BIGINT) AS n_events,
    CAST(sum(c) AS BIGINT) AS total_cents
  FROM d GROUP BY {key_col}
)
SELECT t.{key_col}, t.n_events, t.total_cents,
  h.rn IS NOT NULL AS crossed,
  CAST(h.us AS BIGINT) AS cross_ts_us,
  CAST(h.event_id AS BIGINT) AS cross_event_id,
  CAST(h.cum AS BIGINT) AS cross_cum_cents
FROM tot t LEFT JOIN hits h ON h.{key_col} = t.{key_col} AND h.rn = 1
""".strip()
