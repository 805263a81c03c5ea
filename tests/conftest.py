import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from servico_ocr_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4,
                  app_name="servico-ocr-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
