"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``blockchain2graphdb_spark``; this module is the
thin contract shim over its query registry (one entry per operator of
SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.catalog import DEFAULT_SF_DIR, prep, table
from blockchain2graphdb_spark.exact import dec2, money_sum


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the relational spine
    (scan → filter → join → aggregate → sort) in one plan — pricing
    summary by return flag and customer market segment."""
    prep(spark)
    li = table(spark, DEFAULT_SF_DIR, "lineitem")
    orders = table(spark, DEFAULT_SF_DIR, "orders")
    cust = table(spark, DEFAULT_SF_DIR, "customer")
    revenue = (dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))).alias("rev")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_returnflag", "c_mktsegment")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_returnflag", "c_mktsegment")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query key (omitted => rows-only)."""
    return registry.oracle_sql()
