"""Property-based tests (hypothesis): the router's glob semantics and
the forward-protocol codec hold for arbitrary inputs, not just the
golden fixtures."""

import re

import msgpack
from hypothesis import given, settings, strategies as st

from fluent_server_ray.sources.fluentfmt import (
    decode_frame,
    event_time_ext,
    frames_to_table,
    pack_frames,
)
from fluent_server_ray.stages.route import glob_to_regex

tag_part = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1, max_size=6
)
tags = st.lists(tag_part, min_size=1, max_size=4).map(".".join)
pattern_part = st.one_of(tag_part, st.just("*"), st.just("**"))
patterns = st.lists(pattern_part, min_size=1, max_size=4).map(".".join)


def _oracle_match(pattern: str, tag: str) -> bool:
    """Independent reference implementation of fluentd glob matching
    via recursive part-walk (no regex)."""
    pp, tp = pattern.split("."), tag.split(".")

    def walk(i: int, j: int) -> bool:
        if i == len(pp):
            return j == len(tp)
        if pp[i] == "**":
            # zero or more parts
            return any(walk(i + 1, k) for k in range(j, len(tp) + 1))
        if j >= len(tp):
            return False
        if pp[i] == "*" or pp[i] == tp[j]:
            return walk(i + 1, j + 1)
        return False

    return walk(0, 0)


@settings(max_examples=300, deadline=None)
@given(pattern=patterns, tag=tags)
def test_glob_regex_equals_recursive_oracle(pattern, tag):
    rx = glob_to_regex(pattern)
    got = re.fullmatch(rx[1:-1], tag) is not None
    assert got == _oracle_match(pattern, tag), (pattern, tag, rx)


json_scalars = st.one_of(
    st.text(max_size=12),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
)
records = st.dictionaries(st.text(min_size=1, max_size=8), json_scalars,
                          min_size=0, max_size=5)


@settings(max_examples=150, deadline=None)
@given(
    tag=tags,
    entries=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2**31 - 1), records),
        min_size=1,
        max_size=5,
    ),
)
def test_forward_round_trip(tag, entries):
    """pack(forward frame) → decode == original, order preserved."""
    frame = [tag, [[ts, rec] for ts, rec in entries]]
    got, _ = decode_frame(msgpack.unpackb(
        msgpack.packb(frame, use_bin_type=True), raw=False,
        strict_map_key=False,
    ))
    assert len(got) == len(entries)
    for (want_ts, want_rec), (gtag, gsec, gnsec, grec) in zip(entries, got):
        assert gtag == tag
        assert gsec == want_ts and gnsec == 0
        assert grec == want_rec


@settings(max_examples=100, deadline=None)
@given(sec=st.integers(min_value=0, max_value=2**32 - 1),
       nsec=st.integers(min_value=0, max_value=999_999_999))
def test_event_time_round_trip(sec, nsec):
    entries, _ = decode_frame(["t", [[event_time_ext(sec, nsec), {"k": 1}]]])
    assert entries[0][1] == sec and entries[0][2] == nsec


@settings(max_examples=50, deadline=None)
@given(n_heartbeats=st.integers(min_value=0, max_value=5),
       tag=tags)
def test_heartbeats_never_produce_rows(n_heartbeats, tag):
    frames = [None] * n_heartbeats + [[tag, [[1, {"a": 1}]]]]
    t = frames_to_table(pack_frames(frames))
    assert len(t) == 1
    assert t["tag"][0].as_py() == tag


@settings(max_examples=60, deadline=None)
@given(
    entries=st.lists(
        st.tuples(tags,
                  st.integers(min_value=0, max_value=2**31 - 1),
                  records),
        min_size=1,
        max_size=8,
    ),
    compress=st.booleans(),
)
def test_writer_reader_round_trip_property(entries, compress):
    """write_forward_frames' encoder round-trips arbitrary event tables
    (tags, second-precision timestamps, scalar records, both plain and
    gzip PackedForward)."""
    import json as _json

    import pyarrow as pa

    from fluent_server_ray.sources.fluentfmt import (
        frames_to_table,
        table_to_frames,
    )

    src = pa.table(
        {
            "tag": [t for t, _, _ in entries],
            "ts": pa.array(
                [s * 1_000_000_000 for _, s, _ in entries],
                type=pa.timestamp("ns"),
            ),
            "record_json": [
                _json.dumps(r, sort_keys=True) for _, _, r in entries
            ],
        }
    )
    back = frames_to_table(table_to_frames(src, compress=compress))
    assert back["tag"].to_pylist() == src["tag"].to_pylist()
    assert back["ts"].to_pylist() == src["ts"].to_pylist()
    got = [_json.loads(x) for x in back["record_json"].to_pylist()]
    want = [r for _, _, r in entries]
    assert got == want


text_like = st.one_of(
    st.text(max_size=40),  # arbitrary unicode incl. regex metachars
    st.builds(lambda t, w: f"CALL tool={t} args={w}", tag_part, st.text(max_size=10)),
    st.builds(lambda n, w: f"ERR-{n:03d} {w} failed",
              st.integers(min_value=0, max_value=999), st.text(max_size=10)),
    st.builds(lambda w: f"msg={w}", st.text(min_size=1, max_size=10)),
    st.just(""),
)


@settings(max_examples=40, deadline=None)
@given(texts=st.lists(text_like, min_size=1, max_size=25),
       roles=st.lists(tag_part, min_size=1, max_size=25))
def test_parse_batch_matches_duckdb_on_arbitrary_text(texts, roles):
    """The vectorized RE2 parse agrees with DuckDB's regexp_extract on
    ANY text — quotes, unicode, regex metacharacters, empties — not
    just the grammar's happy path (the single-source-of-truth guard)."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from fluent_server_ray.stages.parse import parse_batch

    n = min(len(texts), len(roles))
    texts, roles = texts[:n], roles[:n]
    batch = pa.table(
        {
            "conv_id": [f"c{i}" for i in range(n)],
            "turn_idx": list(range(n)),
            "role": roles,
            "text": texts,
            "tool": [""] * n,
            "ts": [0] * n,
        }
    )
    got = parse_batch(batch).to_pandas()[
        ["parsed_tool", "error_code", "msg", "is_heartbeat", "kind", "tag"]
    ]

    con = duckdb.connect()
    df_in = pd.DataFrame({"text": texts, "role": roles})
    con.register("t_in", df_in)
    want = con.execute(r"""
      WITH p0 AS (
        SELECT role, text,
          COALESCE(regexp_extract(text, 'CALL tool=(\w+)', 1), '') AS parsed_tool,
          COALESCE(regexp_extract(text, 'ERR-([0-9]{3})', 1), '') AS error_code,
          COALESCE(regexp_extract(text, 'msg=([^ ]+)', 1), '') AS msg,
          COALESCE(text = '', FALSE) AS is_heartbeat
        FROM t_in)
      SELECT parsed_tool, error_code, msg, is_heartbeat,
        CASE WHEN parsed_tool <> '' THEN 'tool'
             WHEN error_code <> '' THEN 'err' ELSE 'msg' END AS kind,
        CASE WHEN parsed_tool <> '' THEN 'tool.' || role || '.' || parsed_tool
             WHEN error_code <> '' THEN 'err.' || role
             ELSE 'msg.' || role END AS tag
      FROM p0
    """).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )


def _fluentbit_oracle_match(pattern: str, tag: str) -> bool:
    """Recursive reference implementation of fluent-bit's Match
    wildcard: '*' = any run of characters (dots included)."""
    if not pattern:
        return not tag
    if pattern[0] == "*":
        return any(
            _fluentbit_oracle_match(pattern[1:], tag[i:])
            for i in range(len(tag) + 1)
        )
    return bool(tag) and pattern[0] == tag[0] and _fluentbit_oracle_match(
        pattern[1:], tag[1:]
    )


@given(
    pattern=st.text(alphabet="ab.*", min_size=0, max_size=8),
    tag=st.text(alphabet="ab.", min_size=0, max_size=10),
)
@settings(max_examples=300, deadline=None)
def test_fluentbit_match_regex_equals_recursive_oracle(pattern, tag):
    from fluent_server_ray.config import fluentbit_match_to_regex

    rx = re.compile(fluentbit_match_to_regex(pattern))
    assert bool(rx.fullmatch(tag)) == _fluentbit_oracle_match(pattern, tag), (
        pattern, tag,
    )


@given(
    st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1),
             min_size=1, max_size=50),
    st.sampled_from([8, 64, 256]),
)
@settings(max_examples=50, deadline=None)
def test_hash_bucket_dtype_invariance(keys, n_buckets):
    """The same key value must land in the same bucket regardless of
    its stored dtype (int32/int64/float64 — e.g. a key column
    float64-ified by a non-inner join), and -0.0 must co-bucket with
    0 — otherwise a chained join/distinct silently drops matches."""
    import numpy as np

    from fluent_server_ray.stages.aggregate import hash_bucket_array

    a64 = hash_bucket_array(np.asarray(keys, dtype=np.int64), n_buckets)
    a32 = hash_bucket_array(np.asarray(keys, dtype=np.int32), n_buckets)
    af = hash_bucket_array(np.asarray(keys, dtype=np.float64), n_buckets)
    assert (a64 == a32).all() and (a64 == af).all()

    z = hash_bucket_array(np.asarray([0.0, -0.0, 0], dtype=np.float64), 256)
    assert z[0] == z[1] == z[2]


# ---------------------------------------------------------------- chunking

texts_or_null = st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.text(alphabet="abcx", min_size=0, max_size=3),
            min_size=0, max_size=12,
        ).map(" ".join),
    ),
    min_size=1, max_size=8,
)


@given(docs=texts_or_null, window=st.integers(1, 6), stride=st.integers(1, 6))
@settings(max_examples=25, deadline=None)
def test_chunk_windows_matches_pure_python_spec(ray_session, docs, window,
                                                stride):
    """The vectorized chunker equals the obvious per-doc Python spec:
    one chunk per start in range(0, n_tokens, stride), chunk =
    tokens[start : start+window] re-joined; NULL text → nothing.
    Guards the offsets arithmetic of the monotone-shrink fast path."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.assembly import chunk_windows

    t = pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs, type=pa.string()),
    })
    got = sorted(map(tuple, chunk_windows(
        rd.from_arrow(t), window=window, stride=stride
    ).to_pandas().itertuples(index=False)))

    want = []
    for i, text in enumerate(docs):
        if text is None:
            continue
        toks = text.split(" ")
        for start in range(0, len(toks), stride):
            want.append((i, start // stride,
                         " ".join(toks[start:start + window])))
    assert got == sorted(want)


@given(docs=texts_or_null, vocab=st.lists(
    st.text(alphabet="abcx", min_size=1, max_size=3),
    min_size=1, max_size=6, unique=True))
@settings(max_examples=25, deadline=None)
def test_encode_with_vocab_matches_pure_python_spec(ray_session, docs, vocab):
    """id = first index in vocab, OOV = -1, empty tokens vanish,
    tokenless docs emit no row."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.textstats import encode_with_vocab

    t = pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs, type=pa.string()),
    })
    got = sorted(map(tuple, encode_with_vocab(rd.from_arrow(t), vocab)
                     .to_pandas().itertuples(index=False)))
    want = []
    for i, text in enumerate(docs):
        if text is None:
            continue
        toks = [w for w in text.split(" ") if w]
        if not toks:
            continue
        ids = [vocab.index(w) if w in vocab else -1 for w in toks]
        want.append((i, ",".join(map(str, ids))))
    assert got == sorted(want)


# ---------------- round-4 fifth-session operator properties ----------------


@given(
    iv=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-5, 20),
                  st.integers(0, 12)),
        min_size=1, max_size=25),
)
@settings(max_examples=15, deadline=None)
def test_merge_intervals_matches_python_union(ray_session, iv):
    """The bucketed segmented-cummax island merge equals the obvious
    per-key python interval union (touching extents merge; duplicates
    and inverted extents included by construction)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.windows import merge_intervals

    keys = [f"k{a}" for a, _, _ in iv]
    starts = [s for _, s, _ in iv]
    ends = [s + d for _, s, d in iv]
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "s": pa.array(starts, pa.int64()),
                  "e": pa.array(ends, pa.int64())})
    got = [tuple(r) for r in merge_intervals(
        rd.from_arrow(t), "k", "s", "e", n_buckets=4)
        .to_pandas().values.tolist()]

    want = []
    df = pd.DataFrame({"k": keys, "s": starts, "e": ends})
    for k, g in df.groupby("k", sort=True):
        cur = None
        for s, e in sorted(zip(g["s"], g["e"])):
            if cur is None or s > cur[1]:
                if cur is not None:
                    want.append((k, cur[0], cur[1], cur[2]))
                cur = [s, e, 1]
            else:
                cur[1] = max(cur[1], e)
                cur[2] += 1
        want.append((k, cur[0], cur[1], cur[2]))
    assert sorted(got) == sorted(want)


@given(
    lefts=st.lists(st.text(alphabet="abcé ", min_size=0, max_size=9),
                   min_size=1, max_size=8),
    rights=st.lists(st.text(alphabet="abcé ", min_size=0, max_size=9),
                    min_size=1, max_size=8),
    max_dist=st.integers(0, 2),
)
@settings(max_examples=15, deadline=None)
def test_fuzzy_join_matches_brute_force(ray_session, lefts, rights,
                                        max_dist):
    """Band blocking is complete and exactly-once vs an all-pairs
    byte-Levenshtein brute force (multibyte chars included — byte
    bands differ from char lengths)."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.joins import fuzzy_join

    def lev(a, b):
        ab, bb = a.encode(), b.encode()
        prev = list(range(len(bb) + 1))
        for i, ca in enumerate(ab, 1):
            cur = [i]
            for j, cb in enumerate(bb, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[len(bb)]

    left = rd.from_arrow(pa.table({
        "id": pa.array(range(len(lefts)), pa.int64()),
        "text": pa.array(lefts, pa.string())}))
    right = rd.from_arrow(pa.table({
        "id": pa.array(range(100, 100 + len(rights)), pa.int64()),
        "text": pa.array(rights, pa.string())}))
    got = [tuple(r) for r in fuzzy_join(
        left, right, max_dist=max_dist, prefix_len=8,
        band_width=max_dist + 2)
        .to_pandas().values.tolist()]
    want = sorted(
        (i, 100 + j, lev(a[:8], b[:8]))
        for i, a in enumerate(lefts)
        for j, b in enumerate(rights)
        if lev(a[:8], b[:8]) <= max_dist)
    assert got == want


@given(
    ev=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 2),
                  st.integers(0, 30)),
        min_size=1, max_size=30),
    within=st.integers(1, 20),
)
@settings(max_examples=15, deadline=None)
def test_multi_funnel_matches_greedy_python(ray_session, ev, within):
    """The bucketed min-after-min chain equals the obvious per-user
    greedy walk (duplicate timestamps, missing steps, out-of-order
    arrivals all generated)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.windows import multi_funnel

    steps = ("s0", "s1", "s2")
    users = [u for u, _, _ in ev]
    types = [f"s{k}" for _, k, _ in ev]
    tss = [t for _, _, t in ev]
    t = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "ts": pa.array([x * 1_000_000 for x in tss],
                       pa.timestamp("us")),
    })
    got = multi_funnel(rd.from_arrow(t), steps=steps,
                       within_seconds=within,
                       n_buckets=4).to_pandas()

    df = pd.DataFrame({"u": users, "ty": types, "ts": tss})
    if len(got) == 0:
        # 0-row to_pandas drops columns (known gotcha) — valid only
        # when NO user has an anchor step
        assert not (df["ty"] == "s0").any()
        return
    for u, g in df.groupby("u"):
        s0 = g.loc[g["ty"] == "s0", "ts"]
        if s0.empty:
            assert u not in set(got["user_id"])
            continue
        row = got[got["user_id"] == u].iloc[0]
        prev = s0.min()
        assert row["step1_ts"] == pd.Timestamp(int(prev), unit="s")
        chain = [prev]
        for stn in ("s1", "s2"):
            cand = g.loc[(g["ty"] == stn) & (g["ts"] > prev), "ts"]
            if cand.empty:
                prev = None
                break
            prev = cand.min()
            chain.append(prev)
        if prev is None:
            assert not bool(row["completed"])
        else:
            assert row["step3_ts"] == pd.Timestamp(int(chain[2]),
                                                   unit="s")
            assert bool(row["completed"]) == (
                chain[2] - chain[0] <= within)


@given(
    texts=st.lists(st.one_of(
        st.none(), st.text(alphabet="abxy", min_size=0, max_size=6)),
        min_size=1, max_size=14),
    window=st.integers(1, 5),
)
@settings(max_examples=15, deadline=None)
def test_sorted_neighborhood_matches_rank_spec(ray_session, texts,
                                               window):
    """The histogram+cumcount rank and ghost-bucket pairing equal the
    obvious sorted-sequence window spec (duplicate keys, NULLs and
    window > corpus all generated)."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.dedup import sorted_neighborhood_pairs

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    got = [tuple(r) for r in sorted_neighborhood_pairs(
        ds, key_len=3, window=window, n_buckets=4)
        .to_pandas().values.tolist()]
    order = sorted((t[:3], i) for i, t in enumerate(texts)
                   if t is not None)
    want = sorted(
        (min(order[i][1], order[j][1]),
         max(order[i][1], order[j][1]), j - i)
        for i in range(len(order)) for j in range(i + 1, len(order))
        if j - i < window)
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2),
                  st.one_of(st.none(), st.integers(-4, 4))),
        min_size=1, max_size=20),
)
@settings(max_examples=15, deadline=None)
def test_quantile_normalize_matches_rank_spec(ray_session, rows):
    """Within-group ranks onto pooled order statistics — vs the
    obvious python spec over (value, id) order (duplicate values and
    NULLs generated)."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.features import quantile_normalize

    ids = list(range(len(rows)))
    grps = [f"g{a}" for a, _ in rows]
    vals = [None if v is None else float(v) for _, v in rows]
    t = pa.table({"event_id": pa.array(ids, pa.int64()),
                  "event_type": pa.array(grps, pa.string()),
                  "value": pa.array(vals, pa.float64())})
    got = quantile_normalize(rd.from_arrow(t),
                             n_buckets=4).to_pandas()
    keep = [(i, g, v) for i, g, v in zip(ids, grps, vals)
            if v is not None]
    if not keep:
        assert len(got) == 0
        return
    pooled = [v for _, _, v in sorted(keep,
                                      key=lambda r: (r[2], r[0]))]
    n = len(pooled)
    want = {}
    for g in set(x[1] for x in keep):
        members = sorted([(v, i) for i, gg, v in keep if gg == g])
        ng = len(members)
        for r, (v, i) in enumerate(members):
            want[i] = pooled[r * n // ng]
    by = got.set_index("id")
    for i, w in want.items():
        assert by.loc[i, "normalized"] == w
    assert len(got) == len(want)


# ---------------- round-4 eighth-session operator properties ----------------


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]),
                  st.integers(-50, 50)),
        min_size=1, max_size=60),
    trim=st.sampled_from([0, 10, 25, 40]),
)
@settings(max_examples=15, deadline=None)
def test_trimmed_mean_matches_sorted_slice(ray_session, rows, trim):
    """Histogram rank-window trim equals the obvious sort-and-slice
    per group (ties and duplicates included by construction)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.features import trimmed_mean

    t = pa.table({
        "event_type": pa.array([g for g, _ in rows], pa.string()),
        "value": pa.array([v / 100.0 for _, v in rows], pa.float64()),
    })
    got = trimmed_mean(rd.from_arrow(t), trim_pct=trim).to_pandas()
    df = pd.DataFrame(rows, columns=["g", "c"])
    for _, r in got.iterrows():
        vals = sorted(df.loc[df["g"] == r["event_type"], "c"].tolist())
        n = len(vals)
        lo = n * trim // 100
        kept = vals[lo:n - lo]
        assert r["n"] == n
        assert r["n_kept"] == len(kept)
        if kept:
            assert r["trimmed_mean_millicents"] == (
                sum(kept) * 1000 // len(kept))
        else:
            assert pd.isna(r["trimmed_mean_millicents"])


@given(
    ids=st.lists(st.integers(0, 40), min_size=1, max_size=40),
    width=st.sampled_from([4, 8, 64]),
)
@settings(max_examples=15, deadline=None)
def test_id_gap_audit_matches_python_spec(ray_session, ids, width):
    """Bucketed gap detection + boundary stitch equals the obvious
    sorted-unique scan, for any bucket width."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.profile import id_gap_audit

    ds = rd.from_arrow(pa.table({
        "event_id": pa.array(ids, pa.int64())}))
    got = id_gap_audit(ds, bucket_width=width).to_pandas()
    u = sorted(set(ids))
    exp = []
    for a, b in zip(u, u[1:]):
        if b - a > 1:
            exp.append([a + 1, b - 1, b - a - 1])
    assert got.values.tolist() == exp


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5),
                  st.integers(-20, 20)),
        min_size=2, max_size=40),
)
@settings(max_examples=15, deadline=None)
def test_twap_matches_brute_integral(ray_session, rows):
    """Day-segmented integration + boundary stitch equals the brute
    whole-series integral under the (ts, cents) tie order."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.features import twap_by_group

    # rows: (group idx, day offset, value) with intra-day hour spread
    gs = [f"g{g}" for g, _, _ in rows]
    ts = [np.datetime64("2024-01-01", "us")
          + np.timedelta64(d * 24 + (i % 5), "h")
          for i, (_, d, _) in enumerate(rows)]
    vals = [v / 10.0 for _, _, v in rows]
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(gs, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array(vals, pa.float64())}))
    got = twap_by_group(ds).to_pandas().set_index("event_type")

    df = pd.DataFrame({
        "g": gs, "t": [t.astype("int64") for t in ts],
        "c": [round(v * 100) for v in vals]})
    for g, sub in df.groupby("g"):
        sub = sub.sort_values(["t", "c"])
        t = sub["t"].tolist()
        c = sub["c"].tolist()
        num = sum(int(c[i]) * (t[i + 1] - t[i])
                  for i in range(len(t) - 1))
        span = t[-1] - t[0]
        r = got.loc[g]
        assert r["span_us"] == span
        if span > 0:
            assert r["twap_millicents"] == num * 1000 // span
        else:
            assert pd.isna(r["twap_millicents"])


# ---------------- round-4 session-15 operator properties ----------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4),            # user
                  st.integers(0, 5000),         # seconds offset
                  st.sampled_from(["purchase", "click", "view"]),
                  st.integers(1, 500)),         # cents (positive)
        min_size=1, max_size=80),
)
@settings(max_examples=15, deadline=None)
def test_clamped_balance_matches_sequential_replay(ray_session, rows):
    """max-plus identity == the obvious per-event max(0, b+d) loop,
    for any interleaving of credits/debits (equal timestamps break
    ties by event_id)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.windows import clamped_balance

    df = pd.DataFrame(rows, columns=["user_id", "off", "event_type",
                                     "cents"])
    df["event_id"] = np.arange(len(df))
    df["ts"] = (pd.Timestamp("2024-01-01")
                + pd.to_timedelta(df["off"], unit="s"))
    df["value"] = df["cents"] / 100.0
    got = clamped_balance(
        rd.from_pandas(df[["user_id", "ts", "event_type", "value",
                           "event_id"]])).to_pandas()
    if got.empty:          # all rows excluded -> typed empty frame
        got = pd.DataFrame(columns=["user_id", "final_balance_cents",
                                    "clamp_count", "n_events"])
    got = got.set_index("user_id").sort_index()

    sub = df[df.event_type.isin(["purchase", "click"])]
    seen = set()
    for u, g in sub.sort_values(["ts", "event_id"]).groupby("user_id"):
        seen.add(u)
        b, clamps = 0, 0
        for _, r in g.iterrows():
            d = int(r.cents) if r.event_type == "purchase" \
                else -int(r.cents)
            if b + d < 0:
                clamps += 1
            b = max(0, b + d)
        row = got.loc[u]
        assert row.final_balance_cents == b
        assert row.clamp_count == clamps
        assert row.n_events == len(g)
    assert set(got.index) == seen


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3),
                  st.integers(0, 3000),
                  st.sampled_from(["signup", "click", "error"]),
                  st.integers(1, 300)),
        min_size=1, max_size=80),
)
@settings(max_examples=15, deadline=None)
def test_cdc_apply_matches_dict_replay(ray_session, rows):
    """Boundary-segmented vectorized replay == the obvious stateful
    dict replay with existence checks."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.windows import cdc_apply

    df = pd.DataFrame(rows, columns=["user_id", "off", "event_type",
                                     "cents"])
    df["event_id"] = np.arange(len(df))
    df["ts"] = (pd.Timestamp("2024-01-01")
                + pd.to_timedelta(df["off"], unit="s"))
    df["value"] = df["cents"] / 100.0
    got = cdc_apply(
        rd.from_pandas(df[["user_id", "ts", "event_type", "value",
                           "event_id"]])).to_pandas()
    if got.empty:          # no user exists at end -> typed empty frame
        got = pd.DataFrame(columns=["user_id", "final_value_cents"])
    got = got.set_index("user_id").sort_index()

    state = {}
    for _, r in df.sort_values(["ts", "event_id"]).iterrows():
        u, c = r.user_id, int(r.cents)
        if r.event_type == "signup":
            state[u] = c
        elif r.event_type == "click":
            if u in state:
                state[u] = c
        else:
            state.pop(u, None)
    assert set(got.index) == set(state)
    for u, c in state.items():
        assert got.loc[u].final_value_cents == c


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3),
                  st.integers(0, 3000),
                  st.sampled_from(["purchase", "click"]),
                  st.integers(1, 400)),
        min_size=1, max_size=60),
)
@settings(max_examples=15, deadline=None)
def test_fifo_allocation_matches_greedy_loop(ray_session, rows):
    """Closed-form clamp == the obvious greedy FIFO lot-consumption
    loop."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.windows import fifo_allocation

    df = pd.DataFrame(rows, columns=["user_id", "off", "event_type",
                                     "cents"])
    df["event_id"] = np.arange(len(df))
    df["ts"] = (pd.Timestamp("2024-01-01")
                + pd.to_timedelta(df["off"], unit="s"))
    df["value"] = df["cents"] / 100.0
    got = fifo_allocation(
        rd.from_pandas(df[["user_id", "ts", "event_type", "value",
                           "event_id"]])).to_pandas() \
        .set_index("user_id").sort_index()

    for u, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        lots = [int(c) for c, t in zip(g.cents, g.event_type)
                if t == "purchase"]
        demand = sum(int(c) for c, t in zip(g.cents, g.event_type)
                     if t == "click")
        rem, full, partial = demand, 0, 0
        for lot in lots:
            if rem >= lot:
                rem -= lot
                full += 1
            else:
                partial = rem
                rem = 0
                break
        row = got.loc[u]
        assert row.n_lots == len(lots)
        assert row.matched_cents == min(demand, sum(lots))
        assert row.n_lots_full == full
        assert row.partial_lot_cents == partial


@given(seq=st.lists(st.integers(-100, 100), min_size=1, max_size=25))
@settings(max_examples=20, deadline=None)
def test_daily_lis_matches_quadratic_dp(ray_session, seq):
    """Patience-sort LIS/LDS == the O(n²) DP on arbitrary daily
    series (duplicates force the strictness contract)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.features import daily_lis

    ts = pd.to_datetime(np.arange(len(seq)) * 86400, unit="s")
    df = pd.DataFrame({"event_type": "a", "ts": ts,
                       "value": np.array(seq) / 100.0})
    got = daily_lis(rd.from_pandas(df)).to_pandas().iloc[0]

    def dp(s, up=True):
        best = [1] * len(s)
        for i in range(len(s)):
            for j in range(i):
                if (s[j] < s[i]) if up else (s[j] > s[i]):
                    best[i] = max(best[i], best[j] + 1)
        return max(best)

    assert got.lis == dp(seq, True)
    assert got.lds == dp(seq, False)
