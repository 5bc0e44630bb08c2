import pytest

from pywdcollections_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pywdcollections-tests", cores=4, shuffle_partitions=8)
    yield s
