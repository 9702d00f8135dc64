from __future__ import annotations

import os

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from talkdesk_async_etl_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "4"))
    wh = str(tmp_path_factory.mktemp("spark_warehouse"))
    s = build_session(
        app_name="tde_tests",
        cpus=cpus,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()
