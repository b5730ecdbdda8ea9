"""Config loaders + CLI parsing (fluent-bit [OUTPUT] Match blocks ≙
reference contrib/config/A.cfg; first-match order preserved)."""

import json

from fluent_server_ray.config import load_routes, parse_fluentbit_outputs


def test_parse_fluentbit_outputs_order_preserved():
    cfg = """
# comment
[INPUT]
    Name   random
    Interval_Sec 1

[OUTPUT]
    Match  err.**
    Name   errors

[OUTPUT]
    Match  *
    Name   catch_one

[OUTPUT]
    Match  **
"""
    routes = parse_fluentbit_outputs(cfg)
    assert routes == [("err.**", "errors"), ("*", "catch_one"), ("**", "sink2")]


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
    assert load_routes(str(p)) == [("beuha", "beuha_sink")]


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
