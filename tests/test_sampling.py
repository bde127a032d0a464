"""Stratified sampling: determinism under a fixed seed and per-stratum
proportions within binomial tolerance."""

from __future__ import annotations

import pyspark.sql.functions as F

from blockchain2graphdb_spark import registry

SPECS = registry.load_all()


def test_sample_stratified_deterministic(spark, sf_dir):
    a = sorted(r["c_custkey"] for r in SPECS["sample_stratified"].builder(spark, sf_dir).collect())
    b = sorted(r["c_custkey"] for r in SPECS["sample_stratified"].builder(spark, sf_dir).collect())
    assert a == b and len(a) > 0


def test_sample_stratified_proportions(spark, sf_dir):
    from blockchain2graphdb_spark.catalog import table

    got = (
        SPECS["sample_stratified"].builder(spark, sf_dir)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("total"))
    )
    rows = got.join(totals, "c_mktsegment").collect()
    assert rows
    for r in rows:
        target = 0.2 if r["c_mktsegment"] == "BUILDING" else 0.05
        # 4 sigma binomial tolerance
        sigma = (target * (1 - target) / r["total"]) ** 0.5
        assert abs(r["n"] / r["total"] - target) < 4 * sigma + 0.02, r
