import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stripe_sync_engine_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# The suite is thousands of TINY sf0.001 jobs whose cost is fixed
# scheduler/round-trip latency, not compute (a full run logs ~12s of
# user+sys CPU against ~2600s of wall) — wide local masters only add
# per-job overhead. Measured on tests/test_changefeed.py: local[32]
# 153-166s, local[8] 134s, local[4] 152s. Pin local[8] by default;
# an explicit $SPARK_GRAFT_CPUS still wins (setdefault).
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
