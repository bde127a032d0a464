"""Scoped session-conf discipline for plan-forcing operators.

Several keys must force Catalyst down a specific physical path
(runtime bloom filters, AQE skew splitting, tiny-iteration partition
sizing) with confs that would be WRONG for every other key in the
driver-owned session. The contract, established by
join_bloom_runtime_filter and pinned by the restoration asserts in
tests/test_plans.py: set the confs, EAGERLY materialize inside the
scope, restore on the way out — no other key's plan ever sees them.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def scoped_confs(spark: SparkSession, confs: dict[str, str]):
    """Set `confs`, yield, RESTORE the previous values (always)."""
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
