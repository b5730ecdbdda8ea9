import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # deterministic block order — same contract as __ray_entry__
    ctx.execution_options.preserve_order = True
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    """Deterministic synthetic transcripts corpus shared by tests."""
    from fluent_server_ray.sources.synth import generate_transcripts

    d = str(tmp_path_factory.mktemp("transcripts"))
    generate_transcripts(d, n_convs=120, mean_turns=12, seed=42, n_files=4)
    return d
