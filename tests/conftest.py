"""Shared session-scoped Spark fixture (local[*], small shuffle width for
test speed; mirrors the engine defaults otherwise)."""

from __future__ import annotations

import pytest

from graphblas_algorithms_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="gas-tests",
        cores=8,
        shuffle_partitions=8,
        driver_memory="8g",
        extra_conf={
            # tiny data: keep scheduling overhead down
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        },
    )
    yield s
    s.stop()
