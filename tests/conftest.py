from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

FIXTURES = Path(__file__).resolve().parent / "fixtures"
TESTDATA = Path(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"))


@pytest.fixture(scope="session")
def spark():
    from fineweb_domain_analyzer_spark.session import get_spark

    spark = get_spark(
        app_name="fineweb-spark-tests",
        master="local[4]",
        extra_confs={"spark.sql.shuffle.partitions": "8", "spark.ui.enabled": "false"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def fixtures_dir() -> Path:
    return FIXTURES


@pytest.fixture(scope="session")
def sf_dir() -> Path:
    return TESTDATA / "sf0.001"
