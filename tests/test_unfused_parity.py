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
