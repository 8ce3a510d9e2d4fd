import pytest

from graft.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("graft-tests", master="local[4]", extra_conf={
        "spark.sql.shuffle.partitions": "4",
    })
    yield s
    s.stop()
