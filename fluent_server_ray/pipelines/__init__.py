from fluent_server_ray.pipelines.flagship import (  # noqa: F401
    build_routed,
    run_pipeline,
)
