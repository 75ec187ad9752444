"""Session-scoped Ray + shared fixtures (one ray.init per pytest session)."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    if not ray.is_initialized():
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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Smoke-size transcript fixtures (FIXTURES.md §1: ~1k turns / 50 convs)."""
    from ocr_poc_ray.synth import write_fixtures

    out = tmp_path_factory.mktemp("transcripts")
    paths = write_fixtures(str(out), n_turns=1_200, n_convs=50, seed=42, row_group_size=100)
    return paths
