"""Production layout (chain/layout.py): round-trip fidelity, shuffle-free
co-located joins, and partition-pruned reorg reads."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from blockchain2graphdb_spark.chain import fixtures
from blockchain2graphdb_spark.chain.derive import address_stats
from blockchain2graphdb_spark.chain.layout import drop_layout, read_layout, write_layout
from blockchain2graphdb_spark.plans.inspect import plan_string


@pytest.fixture(scope="module")
def layout(spark):
    chain = fixtures.generate(n_blocks=16, seed=7)
    tables = chain.to_spark(spark)
    prefix = "lt_" + uuid.uuid4().hex[:8]
    write_layout(spark, tables, prefix)
    yield tables, read_layout(spark, prefix)
    drop_layout(spark, prefix)


def _rows(df):
    return sorted(map(tuple, df.select(sorted(df.columns)).collect()))


def test_layout_round_trip(spark, layout):
    raw, persisted = layout
    for name, df in raw.items():
        assert _rows(persisted[name]) == _rows(df), name


def test_bucketed_tx_output_join_has_no_shuffle(spark, layout):
    _, persisted = layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tx = persisted["transactions"]
        out = persisted["outputs"]
        joined = tx.join(out, "tx_hash").select("tx_hash", "output_id")
        plan = plan_string(joined)
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_derived_stats_identical_on_layout(spark, layout):
    raw, persisted = layout
    a = address_stats(raw["transactions"], raw["outputs"], raw["inputs"])
    b = address_stats(
        persisted["transactions"], persisted["outputs"], persisted["inputs"]
    )
    assert _rows(a) == _rows(b)


def test_height_bucket_prunes_partitions(spark, layout):
    """A height filter must reach the scan as a partition filter on the
    derived bucket column when expressed through it."""
    _, persisted = layout
    prefix_blocks = persisted["blocks"]
    # read the raw catalog table (with height_bucket) for the plan check
    name = [t for t in spark.catalog.listTables() if t.name.endswith("_blocks")][0]
    raw_tbl = spark.table(name.name)
    plan = plan_string(raw_tbl.where(F.col("height_bucket") == 0))
    assert "PartitionFilters: [isnotnull(height_bucket" in plan, plan
    assert prefix_blocks.count() == 16
