import pytest


@pytest.fixture(scope="session")
def spark():
    from fsharp_data_validation_spark.sources.session import get_spark

    s = get_spark(app="tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
