import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract).

    ``GRAFT_TEST_OBJSTORE_GB`` caps the object store so the sharded
    parallel runner (scripts/partest.py) can host several concurrent
    4-CPU clusters on one box; unset (the serial driver gate) keeps
    Ray's default sizing."""
    import ray
    if not ray.is_initialized():
        gb = os.environ.get("GRAFT_TEST_OBJSTORE_GB")
        extra = ({"object_store_memory": int(gb) * 2 ** 30} if gb else {})
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR", **extra)
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_parquet(tmp_path_factory):
    """The deterministic cc_pages fixture corpus written once as parquet."""
    from pypdfium2_ray.sources.fixtures import write_cc_parquet
    path = str(tmp_path_factory.mktemp("ccdata") / "cc_pages.parquet")
    write_cc_parquet(path)
    return path
