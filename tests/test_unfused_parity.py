"""The unfused (separate parse / enrich-actor-pool / route-actor-pool)
layout must produce exactly the fused single-stage result."""

import pandas as pd

from tests.conftest import SF_SMALL


def test_fused_and_unfused_agree(ray_session):
    from fluent_server_ray.pipelines.flagship import build_routed

    cols = ["conv_id", "turn_idx", "tag", "tenant", "sink", "text"]
    fused = build_routed(SF_SMALL, fused=True).select_columns(cols).to_pandas()
    unfused = build_routed(SF_SMALL, fused=False).select_columns(cols).to_pandas()
    a = fused.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = unfused.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_projected_parity_with_full_path(ray_session):
    """The projected fast path (build_routed(columns=...)) returns
    exactly the full path's output restricted to those columns — same
    rows, same values — for every consumer shape the queries use."""
    import pandas as pd

    from fluent_server_ray.pipelines.flagship import build_routed
    from tests.conftest import SF_SMALL

    full = build_routed(SF_SMALL).to_pandas()
    for cols in (
        ["sink", "role", "tool", "tag"],
        ["conv_id", "turn_idx", "tag", "tenant", "sink"],
        ["tenant"],
    ):
        proj = build_routed(SF_SMALL, columns=cols).to_pandas()
        a = proj[cols].sort_values(cols).reset_index(drop=True)
        b = full[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_parse_batch_projected_matches_full(ray_session):
    """parse_batch(columns=...) runs fewer kernels but must agree with
    the full parse on every requested column — including adversarial
    text where several patterns co-occur."""
    import pyarrow as pa

    from fluent_server_ray.stages.parse import parse_batch

    batch = pa.table(
        {
            "conv_id": ["a", "a", None, "b", "c"],
            "turn_idx": pa.array([0, 1, 2, 3, 4], type=pa.int32()),
            "role": ["user", None, "tool", "assistant", "system"],
            "text": [
                "CALL tool=search args=1 ERR-123 msg=x",  # all three
                "",                                        # heartbeat
                None,                                      # malformed
                "ERR-007 boom msg=why",
                "plain words only",
            ],
            "tool": ["", "", "", "", ""],
            "ts": pa.array([0, 1, 2, 3, 4], type=pa.timestamp("us")),
        }
    )
    full = parse_batch(batch)
    for cols in (
        ["tag", "is_heartbeat", "is_valid", "role", "tool"],
        ["msg", "error_code"],
        ["kind", "parsed_tool"],
        ["is_heartbeat"],
    ):
        proj = parse_batch(batch, columns=cols)
        assert proj.column_names == [
            c for c in full.column_names if c in cols
        ] or set(proj.column_names) == set(cols)
        for c in cols:
            assert proj[c].to_pylist() == full[c].to_pylist(), c


def test_parse_batch_accepts_dictionary_input(ray_session):
    """The compact-read path (`read_dictionary=` on low-cardinality
    columns) feeds dictionary-encoded arrays into the fused stage —
    parse_batch must decode once and produce IDENTICAL output to the
    flat-string path (including the tag joins over role)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fluent_server_ray.stages.parse import parse_batch

    flat = pa.table(
        {
            "conv_id": ["a", "a", "b", "c"],
            "role": ["user", "assistant", None, "system"],
            "text": ["CALL tool=search args=1", "", "ERR-007 boom",
                     "msg=hello k=1"],
            "tool": ["", "search", "", ""],
        }
    )
    dicted = pa.table(
        {
            "conv_id": flat["conv_id"],
            "role": pc.dictionary_encode(flat["role"].combine_chunks()),
            "text": flat["text"],
            "tool": pc.dictionary_encode(flat["tool"].combine_chunks()),
        }
    )
    a = parse_batch(flat)
    b = parse_batch(dicted)
    assert a.schema.equals(b.schema)  # decoded back to flat strings
    assert a.equals(b)
