from fluent_server_ray.stages.parse import ParseStage, PARSE_SQL_CTES  # noqa: F401
from fluent_server_ray.stages.route import (  # noqa: F401
    DEFAULT_ROUTES,
    RouteStage,
    glob_to_regex,
    routes_sql_case,
)
from fluent_server_ray.stages.enrich import EnrichStage, build_tenant_map, TENANT_SQL_EXPR  # noqa: F401
from fluent_server_ray.stages.aggregate import grouped_counts  # noqa: F401
