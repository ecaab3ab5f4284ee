from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from mobsos_event_log_generator_spark.session import get_spark

    # Small shuffle-partition count: test data is tiny and task-launch
    # overhead dominates otherwise. Production default stays in session.py.
    spark = get_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMOKE)
