from __future__ import annotations

import tempfile

import pytest

from visual_asset_management_system_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Isolated warehouse per test session (r15): the package default
    # pins spark.sql.warehouse.dir next to the repo, which every
    # get_spark() process shares — a concurrent bench/probe session
    # rewriting its bucketed tables mid-suite makes this session's
    # cached file listings dangle (FAILED_READ_FILE.FILE_NOT_EXIST,
    # 54 such failures observed in one r15 run). A throwaway temp dir
    # keeps the suite hermetic; product sessions are unaffected.
    warehouse = tempfile.mkdtemp(prefix="vams-test-warehouse-")
    s = get_spark(
        app_name="spark-vams-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield s
    s.stop()
