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


def verbosity_by_tenant_sql() -> str:
    """Per-tenant role-verbosity panel over ROUTED turns: assistant vs
    user character mass and turn counts, plus the assistant/user char
    ratio — the 'who is doing the talking' usage readout (lengths are
    CHARACTERS ≡ DuckDB ``length``; the ratio is one float division,
    NULL when the tenant has no user characters)."""
    return (
        with_pipeline_ctes()
        + """
SELECT tenant,
  CAST(sum(CASE WHEN role = 'assistant' THEN length(text)
      ELSE 0 END) AS BIGINT) AS assistant_chars,
  CAST(sum(CASE WHEN role = 'user' THEN length(text)
      ELSE 0 END) AS BIGINT) AS user_chars,
  CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
    AS BIGINT) AS assistant_turns,
  CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
    AS user_turns,
  CASE WHEN sum(CASE WHEN role = 'user' THEN length(text)
       ELSE 0 END) > 0 THEN
    CAST(sum(CASE WHEN role = 'assistant' THEN length(text)
        ELSE 0 END) AS DOUBLE)
    / CAST(sum(CASE WHEN role = 'user' THEN length(text)
        ELSE 0 END) AS DOUBLE) END AS verbosity_ratio
FROM routed GROUP BY tenant"""
    )
