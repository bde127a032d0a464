"""Differential tests: every oracle-backed registry query must match its
DuckDB oracle exactly (the driver's t2 gate, run here at sf0.001 for
speed — tools/verify_local.py covers sf0.01).
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.catalog import TABLES
from conftest import SF_DIR
from tools.verify_local import compare

SPECS = registry.load_all()
ORACLE_KEYS = sorted(k for k, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_KEYS = sorted(k for k, s in SPECS.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(name, spark, duck):
    spec = SPECS[name]
    sdf = spec.builder(spark, SF_DIR).toPandas()
    odf = duck.sql(spec.oracle).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_runs(name, spark):
    spec = SPECS[name]
    df = spec.builder(spark, SF_DIR)
    rows = df.collect()
    assert rows is not None  # must execute; empty results are legal
    assert len(df.columns) > 0
