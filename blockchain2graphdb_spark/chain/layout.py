"""Production table layout (ARCHITECTURE.md §2): the physical design
that makes the chain workload shuffle-light at 100 TB, executable on
local fixtures so the property is *testable*, not aspirational.

| Table        | Layout                                   | Pays for |
|--------------|------------------------------------------|----------|
| blocks       | partitioned by height bucket             | reorg = drop trailing partitions; resume = max(height) in last bucket |
| transactions | bucketed by tx_hash                      | tx↔output/input joins co-locate |
| outputs      | bucketed by tx_hash                      | J5/J6 expansion without shuffle |
| inputs       | bucketed by spending_tx_hash             | spend-side join co-locates |

Bucketed writes go through the session catalog (`saveAsTable` — Spark's
bucketing metadata lives in the metastore); `read_layout` hands back
plain DataFrames. A bucketed-bucketed equi-join on the bucket key plans
with NO shuffle Exchange (asserted in tests/test_layout.py), which at
100 TB is the difference between a map-side merge and re-shuffling the
two largest tables in the system on every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("blocks", "transactions", "outputs", "inputs")
HEIGHT_BUCKET = 1000  # blocks per partition; ~600 partitions for mainnet


def write_layout(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    prefix: str,
    n_buckets: int = 8,
) -> dict[str, str]:
    """Persist the four chain tables under catalog names
    `<prefix>_<table>`; returns the name mapping."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    names = {t: f"{prefix}_{t}" for t in TABLES}

    (
        tables["blocks"]
        .withColumn("height_bucket", (F.col("height") / HEIGHT_BUCKET).cast("int"))
        .write.partitionBy("height_bucket")
        .mode("overwrite")
        .saveAsTable(names["blocks"])
    )
    (
        tables["transactions"]
        .write.bucketBy(n_buckets, "tx_hash")
        .sortBy("tx_hash")
        .mode("overwrite")
        .saveAsTable(names["transactions"])
    )
    (
        tables["outputs"]
        .write.bucketBy(n_buckets, "tx_hash")
        .sortBy("tx_hash")
        .mode("overwrite")
        .saveAsTable(names["outputs"])
    )
    (
        tables["inputs"]
        .write.bucketBy(n_buckets, "spending_tx_hash")
        .sortBy("spending_tx_hash")
        .mode("overwrite")
        .saveAsTable(names["inputs"])
    )
    return names


def read_layout(spark: SparkSession, prefix: str) -> dict[str, DataFrame]:
    out = {t: spark.table(f"{prefix}_{t}") for t in TABLES}
    out["blocks"] = out["blocks"].drop("height_bucket")
    return out


def drop_layout(spark: SparkSession, prefix: str) -> None:
    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
