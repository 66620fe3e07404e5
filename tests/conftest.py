from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_spark.session import get_spark

    s = get_spark("ocr_spark-tests", master="local[8]", shuffle_partitions=16)
    yield s
    s.stop()
