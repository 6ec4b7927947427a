"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

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
    import warnings

    from ray.data import DataContext

    # Ray 2.49 self-deprecation: DataContext is a dataclass whose fields
    # use_push_based_shuffle / use_polars still exist with defaults, so
    # the dataclass __init__ itself trips the deprecating __setattr__ on
    # FIRST construction (ray/data/context.py:589,603) — not repo code.
    # Construct the driver-process context eagerly under suppression so
    # the suite's warnings summary stays clean.
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore",
            category=DeprecationWarning,
            message=r".*(use_push_based_shuffle|use_polars).*",
        )
        ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
