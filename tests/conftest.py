from __future__ import annotations

import pytest

from stop_sync_osm_atlas_spark.fixtures.generator import Fixture, generate, write_fixture
from stop_sync_osm_atlas_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixture_1k() -> Fixture:
    return generate(1000)


@pytest.fixture(scope="session")
def fixture_paths(fixture_1k, tmp_path_factory) -> dict[str, str]:
    root = tmp_path_factory.mktemp("fx1k")
    return write_fixture(fixture_1k, str(root))


# kwargs that make the planted hot bucket (~5% of 1000 rows) exceed the
# salting threshold, exercising the skew path in every cascade test
ND_KW = {"hot_threshold": 40}


@pytest.fixture(scope="session")
def nd_kwargs() -> dict:
    return dict(ND_KW)
