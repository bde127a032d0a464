"""Exact-arithmetic helpers for cross-engine (Spark vs DuckDB) bitwise
result equality.

Why: the driver hashes values; double summation is order-dependent, and
Spark/DuckDB accumulate in different orders. All fixture money columns are
exact 2-decimal values, so casting them to DECIMAL(18,2) recovers the
intended value exactly in both engines (rounding to the nearest decimal of
a double that sits ~1e-13 from the target never crosses a 0.005 midpoint).
All sums/products then happen in decimal (associative, exact) and only the
final result is cast back to double — bit-identical on both sides.

At 100 TB this costs nothing extra: decimal aggregation is codegen'd
JVM-side and the partial/final aggregate split is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# matching DuckDB fragment: CAST(x AS DECIMAL(18,2))
def dec2(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def money_sum(c: Column | str, alias: str) -> Column:
    """SUM over exact decimals, surfaced as double.

    DuckDB twin: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS alias
    """
    return F.sum(dec2(c)).cast("double").alias(alias)


def money_avg(c: Column | str, alias: str) -> Column:
    """AVG as exact-decimal SUM divided by COUNT in double.

    (Decimal division scale rules differ between engines; double division
    of identical inputs does not.)
    DuckDB twin:
      CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
        / CAST(COUNT(x) AS DOUBLE) AS alias
    """
    col = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec2(col)).cast("double") / F.count(col).cast("double")).alias(alias)
