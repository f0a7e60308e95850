import pytest


@pytest.fixture(scope="session")
def spark():
    from glm_ocr_spark.pipeline import get_spark

    s = get_spark(app="glm-ocr-spark-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()
