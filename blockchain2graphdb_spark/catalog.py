"""Fixture-table catalog: loaders for the driver-generated parquet tables
(TESTDATA.md) plus session normalization applied before every query.

At 100 TB these reads would be partitioned-table scans; everything here is
a plain `spark.read.parquet` so Catalyst's Parquet source handles predicate
pushdown / column pruning / partition pruning unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def prep(spark: SparkSession) -> SparkSession:
    """Pin runtime confs the correctness gate depends on.

    Idempotent; called by every query builder because the driver owns the
    SparkSession and we must not depend on its defaults. UTC makes
    timestamp collection match DuckDB's naive timestamps.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # fixture scale never needs the 200-partition default; AQE coalesces
    # further. (A real cluster deployment sizes this to cores × 2-3.)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    return spark


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; have {TABLES}")
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS) — Spark's TimestampType caps
    at microseconds, so read nanos as long and floor-divide to micros
    (DuckDB twin for raw-ts outputs: epoch_ns(ts) // 1000). Sub-microsecond
    truncation only matters when a predicate boundary falls inside the
    truncated nanos, which the oracle queries avoid."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def events_raw_schema(spark: SparkSession, sf_dir: str):
    """Raw file schema (ts as long nanos) for the streaming file source."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema
