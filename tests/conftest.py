import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from mcp_trino_spark.session import get_spark

    return get_spark("pytest")


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
