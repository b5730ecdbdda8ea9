"""Flagship pipeline stages vs an independent DuckDB oracle at sf0.001.

The same checks the driver runs at sf0.01: row-count + schema +
order-insensitive value equality per stage (parse / enrich / route /
aggregate), plus per-turn text equality under stable (conv_id,
turn_idx) ordering — the generalization of the reference's JS `magic`
round-trip probe (reference contrib/js/index.js:33-44).
"""

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMALL


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con


def _cmp(ray_df: pd.DataFrame, duck_df: pd.DataFrame):
    assert sorted(ray_df.columns) == sorted(duck_df.columns)
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = duck_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.fixture(scope="module")
def routed(ray_session):
    from fluent_server_ray.pipelines.flagship import build_routed

    return build_routed(SF_SMALL)


def test_parse_matches_oracle(ray_session):
    from fluent_server_ray import oracle
    from fluent_server_ray.sources.transcripts import read_transcripts
    from fluent_server_ray.stages.parse import apply_parse

    ds = apply_parse(read_transcripts(SF_SMALL))
    ray_df = ds.to_pandas()[
        ["conv_id", "turn_idx", "role", "tool", "text", "parsed_tool",
         "error_code", "msg", "is_heartbeat", "kind", "tag"]
    ]
    duck_df = _con(SF_SMALL).execute(oracle.parse_sql()).df()
    _cmp(ray_df, duck_df)


def test_route_matches_oracle(ray_session, routed):
    from fluent_server_ray import oracle

    ray_df = routed.to_pandas()[["conv_id", "turn_idx", "tag", "tenant", "sink"]]
    duck_df = _con(SF_SMALL).execute(oracle.route_sql()).df()
    _cmp(ray_df, duck_df)


def test_sink_counts_match_oracle(ray_session, routed):
    from fluent_server_ray import oracle
    from fluent_server_ray.stages.aggregate import grouped_counts

    ray_df = grouped_counts(routed, ["sink", "role", "tool", "tag"]).to_pandas()
    duck_df = _con(SF_SMALL).execute(oracle.sink_counts_sql()).df()
    _cmp(ray_df, duck_df)


def test_tenant_counts_match_oracle(ray_session, routed):
    from fluent_server_ray import oracle
    from fluent_server_ray.stages.aggregate import grouped_counts

    ray_df = grouped_counts(routed, ["tenant"]).to_pandas()
    duck_df = _con(SF_SMALL).execute(oracle.tenant_counts_sql()).df()
    _cmp(ray_df, duck_df)


def test_per_turn_text_equality_under_stable_order(ray_session, routed):
    """North-rule invariant: routed output preserves per-turn text
    byte-for-byte, comparable under stable (conv_id, turn_idx) sort."""
    ray_df = (
        routed.to_pandas()[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    duck_df = (
        _con(SF_SMALL)
        .execute(
            "WITH " + __import__("fluent_server_ray.sources.transcripts",
                                 fromlist=["TRANSCRIPTS_SQL_CTE"]).TRANSCRIPTS_SQL_CTE
            + " SELECT conv_id, turn_idx, text FROM transcripts WHERE text <> ''"
            " ORDER BY conv_id, turn_idx"
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ray_df, duck_df, check_dtype=False)
