"""Session-scoped Ray fixture — the ONLY place tests own a Ray session."""

from __future__ import annotations

import pytest


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
    from hmse_ray.util import tune_data_context

    tune_data_context(4)
    yield ray
    ray.shutdown()
