from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from dsm2dtm_spark.session import get_spark

    s = get_spark("dsm2dtm-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
