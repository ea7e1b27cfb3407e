import pytest

from nyc_tlc_trip_data_pipelines_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("engine-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
