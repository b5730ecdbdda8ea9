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
