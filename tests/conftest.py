import pytest

from etl_aws_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
