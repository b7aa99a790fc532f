from __future__ import annotations

import pandas as pd
import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_tokens():
    from podcast_audio_feature_extraction_ray import fixtures

    return fixtures.tiny()


@pytest.fixture(scope="session")
def tiny_df(tiny_tokens) -> pd.DataFrame:
    return tiny_tokens.to_pandas()


@pytest.fixture(scope="session")
def small_tokens():
    from podcast_audio_feature_extraction_ray import fixtures

    return fixtures.token_table(4_000, n_docs=60, seed=7)
