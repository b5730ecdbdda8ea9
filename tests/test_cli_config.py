"""Config loaders + CLI parsing (fluent-bit [OUTPUT] Match blocks ≙
reference contrib/config/A.cfg; first-match order preserved).

fluent-bit ``Match`` wildcards are fluent-bit-semantic: ``*`` matches
ANY characters (dots included), unlike fluentd globs — the loader
translates them to raw regexes the router passes through."""

import json

from fluent_server_ray.config import (
    fluentbit_match_to_regex,
    load_routes,
    parse_fluentbit_outputs,
)


def test_parse_fluentbit_outputs_order_preserved():
    cfg = """
# comment
[INPUT]
    Name   random
    Interval_Sec 1

[OUTPUT]
    Match  err.*
    Name   errors

[OUTPUT]
    Match  *
    Name   catch_one

[OUTPUT]
    Match  **
"""
    routes = parse_fluentbit_outputs(cfg)
    assert routes == [
        (fluentbit_match_to_regex("err.*"), "errors"),
        (fluentbit_match_to_regex("*"), "catch_one"),
        (fluentbit_match_to_regex("**"), "sink2"),
    ]


def test_fluentbit_match_star_matches_dotted_tags():
    """fluent-bit `Match *` matches every tag, dotted included (its `*`
    is any-chars) — previously this compiled to fluentd's one-part `*`
    and silently rejected every dotted tag."""
    from fluent_server_ray.stages.route import RouteStage

    import pyarrow as pa

    stage = RouteStage(parse_fluentbit_outputs("[OUTPUT]\n Match *\n Name all\n"))
    tags = pa.array(["a", "a.b", "err.timeout.x", ""])
    assert stage.route_values(tags).to_pylist() == ["all"] * 4


def test_fluentbit_match_prefix_wildcard_any_chars():
    """fluent-bit `a.*` matches `a.b.c` (any chars), and `a*` matches
    `abc` — neither is expressible as a fluentd one-part glob."""
    from fluent_server_ray.stages.route import RouteStage

    import pyarrow as pa

    stage = RouteStage(
        parse_fluentbit_outputs(
            "[OUTPUT]\n Match a.*\n Name dotted\n"
            "[OUTPUT]\n Match a*\n Name prefixed\n"
        )
    )
    tags = pa.array(["a.b", "a.b.c", "abc", "b.a"])
    assert stage.route_values(tags).to_pylist() == [
        "dotted", "dotted", "prefixed", "reject.unmatched"
    ]


def test_load_routes_json(tmp_path):
    p = tmp_path / "routes.json"
    p.write_text(json.dumps({"routes": [
        {"match": "tool.**", "sink": "tools"},
        {"match": "**", "sink": "rest"},
    ]}))
    assert load_routes(str(p)) == [("tool.**", "tools"), ("**", "rest")]


def test_load_routes_cfg(tmp_path):
    p = tmp_path / "fluentbit.cfg"
    p.write_text("[OUTPUT]\n Match beuha\n Name beuha_sink\n")
    assert load_routes(str(p)) == [("^beuha$", "beuha_sink")]


def test_cli_run_counts_mirror_end_to_end(tmp_path):
    """Drive the actual CLI (subprocess): run -> counts -> mirror."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    out = str(tmp_path / "cli_out")

    routes = tmp_path / "routes.cfg"
    routes.write_text("[OUTPUT]\n Match err.**\n Name errs\n[OUTPUT]\n Match **\n Name rest\n")

    r = subprocess.run(
        [sys.executable, "-m", "fluent_server_ray", "run",
         "--input", "/root/testdata/sf0.001", "--out", out,
         "--routes", str(routes)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-800:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows"] == 900
    assert summary["sinks"]["errs"] == 200

    c = subprocess.run(
        [sys.executable, "-m", "fluent_server_ray", "counts", "--out", out],
        cwd=repo, env=env, capture_output=True, text=True, timeout=60,
    )
    assert json.loads(c.stdout.strip()) == summary["sinks"]

    m = subprocess.run(
        [sys.executable, "-m", "fluent_server_ray", "mirror", "--out", out],
        cwd=repo, env=env, capture_output=True, text=True, timeout=120,
    )
    view = json.loads(m.stdout.strip())
    assert sum(len(v) for v in view.values()) == 900


def test_init_kwargs_cluster_vs_local():
    """Under `ray job submit` (RAY_JOB_ID) or an explicit cluster
    RAY_ADDRESS the CLI must JOIN the hosting cluster; standalone it
    starts a local session sized by RAY_GRAFT_CPUS."""
    from fluent_server_ray.__main__ import _init_kwargs

    assert _init_kwargs({"RAY_JOB_ID": "0100"}) == {"address": "auto"}
    assert _init_kwargs({"RAY_ADDRESS": "ray://head:10001"}) == {
        "address": "auto"}
    local = _init_kwargs({"RAY_ADDRESS": "local", "RAY_GRAFT_CPUS": "8"})
    assert local["address"] == "local" and local["num_cpus"] == 8
    assert _init_kwargs({})["address"] == "local"


def test_cli_index_build_dedup_compact(tmp_path):
    """Drive the index CLI (subprocess): build -> dedup(+extend) ->
    compact; survivors are exactly the texts absent from the corpus,
    and the extension makes them dedup next time."""
    import json
    import os
    import subprocess
    import sys

    import pandas as pd

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    pd.DataFrame({"doc_id": range(6),
                  "text": ["a", "b", "c", "a", "b", "x"]}).to_parquet(
        tmp_path / "corpus.parquet")
    pd.DataFrame({"doc_id": [10, 11, 12],
                  "text": ["a", "new", "x"]}).to_parquet(
        tmp_path / "shard.parquet")
    idx = str(tmp_path / "idx")

    def cli(*a):
        r = subprocess.run(
            [sys.executable, "-m", "fluent_server_ray", "index", *a],
            cwd=repo, env=env, capture_output=True, text=True, timeout=240,
        )
        assert r.returncode == 0, r.stderr[-800:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    cli("build", "--index", idx,
        "--input", str(tmp_path / "corpus.parquet"), "--n-parts", "4")
    d = cli("dedup", "--index", idx,
            "--input", str(tmp_path / "shard.parquet"),
            "--out", str(tmp_path / "survivors"), "--n-parts", "4")
    assert d["survivors"] == 1
    surv = pd.read_parquet(tmp_path / "survivors")
    assert list(surv["text"]) == ["new"]
    c = cli("compact", "--index", idx, "--n-parts", "4")
    assert c["rows"] == 5  # {a,b,c,x} + extended {new}
    assert c["files_after"] <= c["files_before"]
