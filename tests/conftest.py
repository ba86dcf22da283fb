from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from samba_tv_ingest_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Small local session for tests; shuffle partitions kept low so the
    # many tiny-fixture jobs don't pay 32-task scheduling overhead.
    return get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
                     shuffle_partitions=8)
