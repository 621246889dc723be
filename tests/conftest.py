import os

import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = f"{TESTDATA}/sf0.001"
SF_CORRECT = f"{TESTDATA}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from ocr_spark.plans.session import get_spark

    spark = get_spark("ocr_spark_tests", cpus=8)
    yield spark
    spark.stop()
