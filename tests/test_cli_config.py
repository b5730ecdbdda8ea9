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
