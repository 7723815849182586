import os

import pytest

from solr_map_reduce_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight scale/medium variants of contracts that a "
        "fast-tier sibling already covers; skipped unless SMRS_RUN_SLOW=1 "
        "so the default suite fits the external driver's time budget "
        "(r13 verdict #2a — the full suite outgrew it).  CI/round-close "
        "runs set SMRS_RUN_SLOW=1 for the full tier.",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SMRS_RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow tier (set SMRS_RUN_SLOW=1 to run; fast siblings "
        "cover the same contracts)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="smrs-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    import os

    return os.environ.get("SMRS_TEST_SF", SF_SMOKE)


def load(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
