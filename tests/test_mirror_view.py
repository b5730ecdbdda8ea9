"""Mirror JSON view ≙ reference mirror HTTP endpoint + the JS client's
`magic` round-trip probe (reference contrib/js/index.js:33-44: emit a
sentinel, query the mirror, find it under the expected tag)."""

import json


def test_magic_round_trip(ray_session, tmp_path):
    from fluent_server_ray.pipelines.forward_pipeline import run_forward_pipeline
    from fluent_server_ray.pipelines.mirror_view import (
        mirror_counts,
        mirror_json,
        write_mirror_json,
    )
    from fluent_server_ray.sources.fluentfmt import pack_frames

    magic = 0.4215
    p = tmp_path / "conn.msgpack"
    p.write_bytes(
        pack_frames(
            [
                ["tag_prefix.my_tag", [[1441588984,
                                        {"name": "Bob", "age": 42, "magic": magic}]],
                 {"chunk": "cc"}],
                ["other", 1441588985, {"x": 1}],
            ]
        )
    )
    out = tmp_path / "out"
    run_forward_pipeline([str(p)], str(out), routes=[("**", "all")])

    view = mirror_json(str(out))
    assert "tag_prefix.my_tag" in view
    events = view["tag_prefix.my_tag"]
    assert len(events) == 1
    record = json.loads(events[0]["record"]["record_json"])
    assert record["magic"] == magic  # the sentinel survived end-to-end
    assert events[0]["ts"].startswith("2015-09-07")

    assert mirror_counts(str(out)) == {"all": 2}
    path = write_mirror_json(str(out))
    assert json.load(open(path))["other"][0]["record"]["record_json"]


def test_mirror_http_magic_round_trip(ray_session, tmp_path):
    """The reference's live probe, end-to-end over real HTTP: run the
    pipeline, GET the mirror endpoint, find the emitted `magic` record
    under its tag (reference contrib/js/index.js:33-44 against
    mirror/mirror.go:41-47)."""
    import threading
    import urllib.error
    import urllib.request

    from fluent_server_ray.pipelines.forward_pipeline import run_forward_pipeline
    from fluent_server_ray.pipelines.mirror_view import serve_mirror
    from fluent_server_ray.sources.fluentfmt import pack_frames

    magic = 0.777
    p = tmp_path / "conn.msgpack"
    p.write_bytes(
        pack_frames(
            [["tag_prefix.my_tag",
              [[1441588984, {"name": "Bob", "magic": magic}]],
              {"chunk": "cc"}]]
        )
    )
    out = tmp_path / "out"
    run_forward_pipeline([str(p)], str(out), routes=[("**", "all")])

    srv = serve_mirror(str(out), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        view = json.loads(urllib.request.urlopen(f"{base}/").read())
        events = view["tag_prefix.my_tag"]
        assert json.loads(events[0]["record"]["record_json"])["magic"] == magic
        counts = json.loads(urllib.request.urlopen(f"{base}/counts").read())
        assert counts == {"all": 1}
        try:
            urllib.request.urlopen(f"{base}/nope")
            assert False, "404 expected"
        except urllib.error.HTTPError as err:
            assert err.code == 404
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=5)


def test_mirror_http_limit_per_tag_cap(ray_session, tmp_path):
    """GET / is capped per tag by default (an accidental full-corpus
    GET can't materialize the store); ?full=1 explicitly overrides."""
    import threading
    import urllib.request

    from fluent_server_ray.pipelines.forward_pipeline import run_forward_pipeline
    from fluent_server_ray.pipelines.mirror_view import serve_mirror
    from fluent_server_ray.sources.fluentfmt import pack_frames

    p = tmp_path / "conn.msgpack"
    entries = [[1441588984 + i, {"i": i}] for i in range(10)]
    p.write_bytes(pack_frames([["t.a", entries, {"chunk": "cc"}]]))
    out = tmp_path / "out"
    run_forward_pipeline([str(p)], str(out), routes=[("**", "all")])

    srv = serve_mirror(str(out), port=0, limit_per_tag=3)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        capped = json.loads(urllib.request.urlopen(f"{base}/").read())
        assert len(capped["t.a"]) == 3
        full = json.loads(urllib.request.urlopen(f"{base}/?full=1").read())
        assert len(full["t.a"]) == 10
        # paged per-tag route: pages tile the full tag list in order
        p1 = json.loads(urllib.request.urlopen(
            f"{base}/tag/t.a?offset=0&limit=4").read())
        p2 = json.loads(urllib.request.urlopen(
            f"{base}/tag/t.a?offset=4&limit=4").read())
        p3 = json.loads(urllib.request.urlopen(
            f"{base}/tag/t.a?offset=8&limit=4").read())
        assert [len(p1), len(p2), len(p3)] == [4, 4, 2]
        assert p1 + p2 + p3 == full["t.a"]
        none = json.loads(urllib.request.urlopen(
            f"{base}/tag/absent?limit=4").read())
        assert none == []
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=5)


def test_mirror_http_order_recent(ray_session, tmp_path):
    """?order=recent serves each tag ts-DESCENDING (the reference's
    event comparator, event/event.go:21-33) over real HTTP — full view,
    capped view (global most-recent cut, not first-files-win), and the
    paged per-tag route."""
    import threading
    import urllib.request

    from fluent_server_ray.pipelines.forward_pipeline import run_forward_pipeline
    from fluent_server_ray.pipelines.mirror_view import serve_mirror
    from fluent_server_ray.sources.fluentfmt import pack_frames

    # two files so the recent view must merge across files: the later
    # timestamps live in the FIRST-sorted file
    p1 = tmp_path / "a.msgpack"
    p1.write_bytes(pack_frames(
        [["t.a", [[1441589000 + i, {"i": 100 + i}] for i in range(5)],
          {"chunk": "c1"}]]))
    p2 = tmp_path / "b.msgpack"
    p2.write_bytes(pack_frames(
        [["t.a", [[1441588900 + i, {"i": i}] for i in range(5)],
          {"chunk": "c2"}]]))
    out = tmp_path / "out"
    run_forward_pipeline([str(p1), str(p2)], str(out), routes=[("**", "all")])

    srv = serve_mirror(str(out), port=0, limit_per_tag=3)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        full = json.loads(urllib.request.urlopen(
            f"{base}/?full=1&order=recent").read())
        ts = [e["ts"] for e in full["t.a"]]
        assert ts == sorted(ts, reverse=True) and len(ts) == 10
        # capped recent = the GLOBAL 3 newest, which straddle files
        capped = json.loads(urllib.request.urlopen(
            f"{base}/?order=recent").read())
        assert [e["ts"] for e in capped["t.a"]] == ts[:3]
        # paged per-tag recent view tiles the same ordering
        q1 = json.loads(urllib.request.urlopen(
            f"{base}/tag/t.a?order=recent&offset=0&limit=6").read())
        q2 = json.loads(urllib.request.urlopen(
            f"{base}/tag/t.a?order=recent&offset=6&limit=6").read())
        assert q1 + q2 == full["t.a"]
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=5)


def test_read_sink_ordered(ray_session, synth_dir, tmp_path):
    from fluent_server_ray.pipelines.flagship import run_pipeline
    from fluent_server_ray.pipelines.mirror_view import read_sink

    out = str(tmp_path / "o")
    run_pipeline(synth_dir, out)
    df = read_sink(out, "errors").to_pandas()
    assert len(df) > 0
    assert (df["sink"] == "errors").all() if "sink" in df.columns else True
    key = list(zip(df["conv_id"], df["turn_idx"]))
    assert key == sorted(key)  # stable global order re-established

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_sink(out, "no.such.sink")
