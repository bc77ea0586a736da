import pytest


@pytest.fixture(scope="session")
def spark():
    from nerpii_spark.session import get_spark

    s = get_spark(app_name="nerpii_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
