from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from blockchain2graphdb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Scratch root shared by tests and the store-backed queries (gitignored).
# It is safe to delete between sessions; recreate it up front so
# tempfile.TemporaryDirectory(dir=...) callers never race a missing root.
os.makedirs(os.path.join(REPO_ROOT, ".tmp"), exist_ok=True)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
