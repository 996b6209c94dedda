from __future__ import annotations

import os
import sys

import duckdb
import pytest

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

# Location-independence (VERDICT r3 #4): Spark's Python workers are
# forked by the JVM with the environment's PYTHONPATH, not the pytest
# process's sys.path — without this, every mapInPandas/applyInPandas
# test fails worker-side with ModuleNotFoundError when pytest runs
# from outside the repo. Export it BEFORE the JVM starts (the env var
# for forked workers, the executorEnv conf for completeness on a real
# cluster deploy).
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH")
    else _REPO_ROOT
)

from lakehouse_homeserver_spark.session import get_spark  # noqa: E402
from lakehouse_homeserver_spark.sources import TABLES  # noqa: E402

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="lakehouse-tests",
        extra_conf={
            "spark.executorEnv.PYTHONPATH": os.environ["PYTHONPATH"]
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB connection with fixture tables registered as views —
    mirrors the driver's oracle harness."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()
