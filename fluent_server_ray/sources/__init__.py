from fluent_server_ray.sources.transcripts import (  # noqa: F401
    TRANSCRIPTS_SQL_CTE,
    derive_transcripts_batch,
    read_transcripts,
)
from fluent_server_ray.sources.synth import generate_transcripts  # noqa: F401
