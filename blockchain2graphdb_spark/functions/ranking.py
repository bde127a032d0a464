"""Distributed global ranking without an unpartitioned window.

`bucketed_global_rank` is the reusable form of the two-pass rank
sort_by_key pioneered (VERDICT_r04's scale-killer fix): a global
row_number() OVER (ORDER BY ...) funnels the whole table through ONE
WindowExec partition, so instead

  1. bucket each row by a deterministic, data-derived prefix of the
     sort order (a value band / calendar month — never sampled range
     boundaries, so re-evaluation cannot reassign rows);
  2. per-bucket counts -> cumulative offsets via a theta-join over the
     O(#buckets) count table (no window at all);
  3. rank WITHIN buckets (Window.partitionBy(bucket) — distributed);
  4. pos = bucket offset + in-bucket row_number.

The caller guarantees the bucket is a monotone function of the leading
sort key (strictly earlier bucket => strictly earlier sort order), which
makes the composed rank identical to the global one. At 100 TB bucket
granularity is the skew lever (month -> day -> hour; wider bands ->
narrower) — same trick as distributed zipWithIndex's partition offsets.

The bucket must also be NON-NULL for every row: both passes join back
on the bucket column, and an equi-join never matches NULL keys, so a
NULL bucket would silently drop the row. Rather than document-and-hope,
`_guarded_bucket` raises at execution time on the first NULL bucket.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _guarded_bucket(bucket: Column) -> Column:
    """The bucket expression with a loud NULL guard: the two-pass shape
    equi-joins back on the bucket, and NULL never equi-matches, so a
    NULL bucket is a silently dropped row. `raise_error` fires on the
    first offending row at execution time (ADVICE r10)."""
    return F.when(bucket.isNotNull(), bucket).otherwise(
        F.raise_error(
            F.lit(
                "bucketed rank/prefix-sum contract violation: null bucket "
                "(bucket must be a non-null monotone function of the "
                "leading sort key)"
            )
        )
    )


def bucketed_prefix_sums(
    df: DataFrame,
    bucket: Column,
    order: Sequence[Column],
    vals: dict[str, Column],
) -> DataFrame:
    """Running SUM of each `vals[alias]` over the global (bucket, order)
    order without an unpartitioned window — the prefix-sum sibling of
    `bucketed_global_rank` (same two-pass shape: per-bucket totals,
    O(#buckets) broadcast theta-join offsets, in-bucket cumulative
    windows partitioned by bucket). Same contract: `bucket` monotone
    with the sort order, `order` a unique total order within each
    bucket. Values must be exact (integer/decimal) for the result to be
    order-independent. All cumulative columns share ONE offsets join and
    ONE in-bucket window pass. Lazy — adds no jobs."""
    names = list(vals)
    d = df.withColumn("_b", _guarded_bucket(bucket))
    for i, name in enumerate(names):
        d = d.withColumn(f"_v{i}", vals[name])
    sums = d.groupBy("_b").agg(
        *[F.sum(f"_v{i}").alias(f"_s{i}") for i in range(len(names))]
    )
    earlier = sums.select(
        F.col("_b").alias("_b2"),
        *[F.col(f"_s{i}").alias(f"_s{i}2") for i in range(len(names))],
    )
    offsets = (
        sums.join(F.broadcast(earlier), F.col("_b2") < F.col("_b"), "left")
        .groupBy("_b")
        .agg(
            *[
                F.coalesce(F.sum(f"_s{i}2"), F.lit(0)).alias(f"_off{i}")
                for i in range(len(names))
            ]
        )
    )
    w = W.partitionBy("_b").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    out = d.join(F.broadcast(offsets), "_b")
    for i, name in enumerate(names):
        out = out.withColumn(
            name, (F.col(f"_off{i}") + F.sum(f"_v{i}").over(w)).cast("long")
        )
    return out.drop(
        "_b",
        *[f"_off{i}" for i in range(len(names))],
        *[f"_v{i}" for i in range(len(names))],
    )


def bucketed_prefix_sum(
    df: DataFrame,
    bucket: Column,
    order: Sequence[Column],
    val: Column,
    alias: str = "cum",
) -> DataFrame:
    """Single-value form of `bucketed_prefix_sums` (kept for the
    existing call sites; same contract)."""
    return bucketed_prefix_sums(df, bucket, order, {alias: val})


def bucketed_global_rank(
    df: DataFrame, bucket: Column, order: Sequence[Column]
) -> DataFrame:
    """Return `df` plus `pos` (1-based global rank, long) and `n_total`
    (long). `bucket` must ascend with the sort order (negate a value
    band for DESC ranks); `order` must be a unique total order within
    each bucket. Lazy — adds no jobs, no checkpoints."""
    d = df.withColumn("_b", _guarded_bucket(bucket))
    counts = d.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    earlier = counts.select(F.col("_b").alias("_b2"), F.col("_n").alias("_n2"))
    offsets = (
        counts.join(F.broadcast(earlier), F.col("_b2") < F.col("_b"), "left")
        .groupBy("_b")
        .agg(F.coalesce(F.sum("_n2"), F.lit(0)).alias("_off"))
    )
    tot = counts.agg(F.sum("_n").cast("long").alias("n_total"))
    inb = F.row_number().over(W.partitionBy("_b").orderBy(*order))
    return (
        d.join(F.broadcast(offsets), "_b")
        .crossJoin(F.broadcast(tot))
        .withColumn("pos", (F.col("_off") + inb).cast("long"))
        .drop("_b", "_off")
    )
