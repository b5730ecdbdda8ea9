from fluent_server_ray.state.lineage import (  # noqa: F401
    commit_shard,
    committed_shards,
    load_manifests,
)
