from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from blockchain2graphdb_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

# Scratch root shared by tests and the store-backed queries (gitignored).
# It is safe to delete between sessions; recreate it up front so
# tempfile.TemporaryDirectory(dir=...) callers never race a missing root.
os.makedirs("/root/repo/.tmp", exist_ok=True)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
