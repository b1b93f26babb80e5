import pytest

from project_cascade_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("cascade-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
