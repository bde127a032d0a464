"""Differential tests: every oracle-backed registry query must match its
DuckDB oracle exactly (the driver's t2 gate, run here at sf0.001 for
speed — tools/verify_local.py covers sf0.01).
"""

from __future__ import annotations

import duckdb
import pytest

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.catalog import TABLES
from conftest import SF_DIR
from tools.verify_local import compare

SPECS = registry.load_all()
ORACLE_KEYS = sorted(k for k, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_KEYS = sorted(k for k, s in SPECS.items() if s.oracle is None)

# The whole module IS the differential sweep (the driver-gate check at
# sf0.001, one test per key). It stays in the full lane, but carries
# its own marker so the fast iteration lane can skip it — the same
# coverage is a one-command standalone run via tools/verify_local.py.
pytestmark = pytest.mark.sweep


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


def test_duckdb_integer_division_truncates(duck):
    """Exact-twin oracles (embedding_quantize, kmeans_exact) depend on
    integer division truncating toward zero on both engines. The
    sign-explicit form used in the quantize oracle is truncation under
    EITHER // convention; pin both facts so a DuckDB upgrade that
    switches `//` to floor-for-integers fails loudly here rather than
    as a silent hash mismatch (ADVICE r5)."""
    row = duck.sql(
        "SELECT -7 // 2 AS plain, "
        "CASE WHEN -7 >= 0 THEN (-7) // 2 ELSE -((7) // 2) END AS signed_form"
    ).fetchone()
    assert row[1] == -3  # the form the oracle uses: always truncation
    assert row[0] == -3  # current DuckDB `//` truncates for integers


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_runs(name, spark):
    spec = SPECS[name]
    df = spec.builder(spark, SF_DIR)
    rows = df.collect()
    assert rows is not None  # must execute; empty results are legal
    assert len(df.columns) > 0
