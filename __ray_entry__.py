"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship routed dataset on sf0.001.
``queries()`` — one callable per implemented operator/pipeline
(SURVEY.md §2); each takes ``sf_dir`` and returns a Dataset /
DataFrame / Table.
``oracle_sql()`` — the DuckDB-equivalent SQL for each query (omitted
for genuinely non-SQL-expressible ops → rows-only check).

Ray is initialised by the driver BEFORE this module is imported:
nothing here (or in fluent_server_ray) calls ``ray.init()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from fluent_server_ray import oracle
from fluent_server_ray.pipelines.flagship import build_routed
from fluent_server_ray.sources.transcripts import read_transcripts
from fluent_server_ray.stages.aggregate import grouped_counts
from fluent_server_ray.stages.parse import apply_parse

PARSE_COLS = [
    "conv_id", "turn_idx", "role", "tool", "text", "parsed_tool",
    "error_code", "msg", "is_heartbeat", "kind", "tag",
]


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return build_routed("/root/testdata/sf0.001")


# ----- flagship pipeline queries (transcripts derived from events) -----

def _q_parse(sf_dir: str):
    return apply_parse(read_transcripts(sf_dir)).select_columns(PARSE_COLS)


def _q_route(sf_dir: str):
    return build_routed(sf_dir).select_columns(
        ["conv_id", "turn_idx", "tag", "tenant", "sink"]
    )


def _q_sink_counts(sf_dir: str):
    return grouped_counts(build_routed(sf_dir), ["sink", "role", "tool", "tag"])


def _q_tenant_counts(sf_dir: str):
    return grouped_counts(build_routed(sf_dir), ["tenant"])


def _q_heartbeat_stats(sf_dir: str):
    return grouped_counts(apply_parse(read_transcripts(sf_dir)), ["is_heartbeat"])


def _q_first_turn(sf_dir: str):
    """First turn per conversation under stable (conv_id, turn_idx)
    order — pins the ordering invariant (north rule / reference
    intra-chunk order, defaultreader/reader.go:85-103)."""
    import pandas as pd

    def first_row(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx")
        return pd.DataFrame(
            {
                "conv_id": [g["conv_id"].iloc[0]],
                "first_text": [g["text"].iloc[0]],
                "first_turn": [g["turn_idx"].iloc[0]],
            }
        )

    return (
        build_routed(sf_dir)
        .select_columns(["conv_id", "turn_idx", "text"])
        .groupby("conv_id")
        .map_groups(first_row, batch_format="pandas")
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "transcripts_parse": _q_parse,
        "transcripts_route": _q_route,
        "transcripts_sink_counts": _q_sink_counts,
        "transcripts_tenant_counts": _q_tenant_counts,
        "transcripts_heartbeat_stats": _q_heartbeat_stats,
        "transcripts_first_turn": _q_first_turn,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts_parse": oracle.parse_sql(),
        "transcripts_route": oracle.route_sql(),
        "transcripts_sink_counts": oracle.sink_counts_sql(),
        "transcripts_tenant_counts": oracle.tenant_counts_sql(),
        "transcripts_heartbeat_stats": oracle.heartbeat_stats_sql(),
        "transcripts_first_turn": oracle.first_turn_sql(),
    }
