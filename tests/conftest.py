import pytest

from xcube_stac_spark.session import get_spark
from xcube_stac_spark import synth


@pytest.fixture(scope="session")
def spark():
    s = get_spark("xss-tests", master="local[8]", extra_conf={"spark.driver.memory": "8g"})
    yield s


@pytest.fixture(scope="session")
def sf0001_dir():
    return synth.generate("sf0.001")


@pytest.fixture(scope="session")
def sf001_dir():
    return synth.generate("sf0.01")
