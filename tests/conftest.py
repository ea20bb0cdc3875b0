import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session", autouse=True)
def _quiet_ray_data():
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
    except Exception:
        pass
    yield


@pytest.fixture(scope="session")
def small_stream(tmp_path_factory):
    """Deterministic small transcript stream (FIXTURES.md family A)."""
    from quanta_ray.fixtures import TranscriptParams, make_stream

    d = tmp_path_factory.mktemp("stream_small")
    params = TranscriptParams(n_convs=60, seed=42, n_epochs=5)
    files = make_stream(str(d), params)
    return files, params
