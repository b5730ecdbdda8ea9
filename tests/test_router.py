"""fluentd match-glob semantics, pinned (reference `contrib/config/*.cfg`
`Match *` and fluentd <match> docs; first-match-wins like fluentd)."""

import re

import pyarrow as pa

from fluent_server_ray.stages.route import (
    DEFAULT_ROUTES,
    INVALID_SINK,
    UNMATCHED_SINK,
    RouteStage,
    glob_to_regex,
)

CASES = [
    # (pattern, tag, should_match)
    ("*", "a", True),
    ("*", "a.b", False),
    ("a.*", "a.b", True),
    ("a.*", "a.b.c", False),
    ("a.*", "a", False),
    ("**", "", True),
    ("**", "a.b.c", True),
    ("a.**", "a", True),
    ("a.**", "a.b", True),
    ("a.**", "a.b.c", True),
    ("a.**", "b.a", False),
    ("a.**.c", "a.c", True),
    ("a.**.c", "a.b.c", True),
    ("a.**.c", "a.b.b2.c", True),
    ("a.**.c", "a.cx", False),
    ("tag.name", "tag.name", True),  # reference message/session_test.go:140
    ("tag.name", "tag.names", False),
    ("tag_prefix.*", "tag_prefix.my_tag", True),  # reference contrib/js/index.js:4,34
    ("err.**", "err.user", True),
    ("tool.*.search", "tool.assistant.search", True),
    ("tool.*.search", "tool.assistant.bash", False),
]


def test_glob_to_regex_semantics():
    for pattern, tag, want in CASES:
        rx = glob_to_regex(pattern)
        got = re.fullmatch(rx.strip("^$"), tag) is not None
        assert got == want, f"{pattern!r} vs {tag!r}: want {want}, regex {rx}"


def test_first_match_wins_and_rejects():
    stage = RouteStage(DEFAULT_ROUTES)
    batch = pa.table(
        {
            "tag": [
                "err.user",               # errors (even though ** also matches)
                "tool.assistant.search",  # search_tools, not tools
                "tool.assistant.bash",    # tools
                "msg.user",               # user_msgs
                "msg.system",             # catchall
            ],
            "is_valid": [True, True, True, True, False],
        }
    )
    out = stage(batch)
    assert out["sink"].to_pylist() == [
        "errors",
        "search_tools",
        "tools",
        "user_msgs",
        INVALID_SINK,
    ]


def test_unmatched_goes_to_reject():
    stage = RouteStage([("only.this", "s1")])
    out = stage(pa.table({"tag": ["something.else"], "is_valid": [True]}))
    assert out["sink"].to_pylist() == [UNMATCHED_SINK]


def test_empty_batch():
    stage = RouteStage(DEFAULT_ROUTES)
    out = stage(
        pa.table(
            {
                "tag": pa.array([], type=pa.string()),
                "is_valid": pa.array([], type=pa.bool_()),
            }
        )
    )
    assert len(out) == 0 and "sink" in out.column_names


def test_retag_first_match_wins_and_backrefs(ray_session):
    """fluentd rewrite_tag_filter: first matching rule applies (later
    matches ignored), \\1 backrefs work, one replacement only,
    unmatched and NULL tags pass through."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.route import retag

    t = pa.table({"tag": ["tool.assistant.search", "err.user",
                          "msg.user", None, "err.err."]})
    rules = [(r"^tool\.assistant\.(\w+)", r"hot.\1"),
             (r"^err\.", "errors.all"),
             (r"hot\.", "never.reached")]  # would match rule-1 output,
    # but rewriting is on the ORIGINAL tag and first match wins
    out = retag(rd.from_arrow(t), rules).to_pandas()["tag"].tolist()
    assert out == ["hot.search", "errors.alluser", "msg.user", None,
                   "errors.allerr."]


def test_throttle_limit_and_determinism(ray_session):
    """≤ limit survivors per (key, window); the survivors are the
    FIRST by (ts, id) — ties on ts broken by id."""
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.windows import throttle

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(10):  # all in one hour window, same ts → id ties
        rows.append((i, "a", base))
    rows.append((100, "a", base + dt.timedelta(hours=2)))  # new window
    rows.append((200, "b", base))
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[1] for r in rows], type=pa.string()),
        "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
    })
    out = throttle(rd.from_arrow(t), limit=3).to_pandas()
    kept = sorted(out["event_id"].tolist())
    assert kept == [0, 1, 2, 100, 200]


def test_copy_route_fan_out_semantics(ray_session):
    """All-matches fan-out: a tag matching two routes emits two rows;
    unmatched (and NULL) tags fall through to reject.unmatched exactly
    once; pattern work is per distinct tag."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.route import UNMATCHED_SINK, copy_route

    t = pa.table({
        "i": pa.array([0, 1, 2, 3], type=pa.int64()),
        "tag": ["tool.user.search", "tool.user.bash", "msg.user", None],
    })
    routes = [("tool.**", "tools"), ("*.*.search", "search")]
    out = copy_route(rd.from_arrow(t), routes).to_pandas()
    got = sorted(zip(out["i"], out["sink"]))
    assert got == [
        (0, "search"), (0, "tools"),       # two copies
        (1, "tools"),
        (2, UNMATCHED_SINK),
        (3, UNMATCHED_SINK),               # NULL tag matches nothing
    ]
