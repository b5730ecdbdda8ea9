"""DuckDB oracle SQL composition.

Each flagship-pipeline stage has a SQL mirror built from the SAME
constants/regexes as the Ray stage (single source of truth — see
``sources/transcripts.py:TRANSCRIPTS_SQL_CTE``,
``stages/parse.py:PARSE_SQL_CTES``, ``stages/route.py:routes_sql_case``,
``stages/enrich.py:TENANT_SQL_EXPR``). The driver runs these against
its pre-registered views (``events`` etc.) to verify the Ray results.
"""

from __future__ import annotations

from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE
from fluent_server_ray.stages.enrich import TENANT_SQL_EXPR
from fluent_server_ray.stages.parse import PARSE_SQL_CTES
from fluent_server_ray.stages.route import routes_sql_case


def with_pipeline_ctes(extra: str = "") -> str:
    """WITH clause: transcripts → parsed0 → parsed → enriched → routed."""
    routed_case = routes_sql_case()
    ctes = f"""WITH {TRANSCRIPTS_SQL_CTE},
{PARSE_SQL_CTES},
enriched AS (
  SELECT *, {TENANT_SQL_EXPR} AS tenant FROM parsed
),
routed AS (
  SELECT *, {routed_case} AS sink
  FROM enriched
  WHERE NOT is_heartbeat
)"""
    if extra:
        ctes += ",\n" + extra
    return ctes


def parse_sql() -> str:
    return (
        with_pipeline_ctes()
        + "\nSELECT conv_id, turn_idx, role, tool, text, parsed_tool, "
        "error_code, msg, is_heartbeat, kind, tag FROM parsed"
    )


def route_sql() -> str:
    return (
        with_pipeline_ctes()
        + "\nSELECT conv_id, turn_idx, tag, tenant, sink FROM routed"
    )


def sink_counts_sql() -> str:
    return (
        with_pipeline_ctes()
        + "\nSELECT sink, role, tool, tag, count(*) AS n FROM routed"
        " GROUP BY sink, role, tool, tag"
    )


def tenant_counts_sql() -> str:
    return (
        with_pipeline_ctes()
        + "\nSELECT tenant, count(*) AS n FROM routed GROUP BY tenant"
    )


def heartbeat_stats_sql() -> str:
    return (
        with_pipeline_ctes()
        + "\nSELECT is_heartbeat, count(*) AS n FROM parsed GROUP BY is_heartbeat"
    )


def first_turn_sql() -> str:
    """First turn text per conversation under stable (conv_id, turn_idx)
    order — the per-turn-text-equality/ordering probe."""
    return (
        with_pipeline_ctes()
        + "\nSELECT conv_id, arg_min(text, turn_idx) AS first_text,"
        " min(turn_idx) AS first_turn FROM routed GROUP BY conv_id"
    )
