import pytest


@pytest.fixture(scope="session")
def spark():
    from pdfi_spark.pipeline import make_spark

    session = make_spark("pdfi-tests", master="local[4]", shuffle_partitions=8)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()
