"""Time-series operators over the S3 process-log event table (SURVEY.md
§2.13 extension surface): hierarchical time-bucket rollups and
gap-filled last-observation-carried-forward resampling — the
"hypertable" pair every metrics/feature-store pipeline runs before
training-data extraction.

All bucket math is integer division on unix-micro bigints (catalog
normalization), so results are bit-identical across Spark and DuckDB
regardless of the fixture's timestamp encoding.

Scale notes (100 TB):
  * `hypertable_rollup` computes the fine grain (hour) from raw once,
    then derives the coarse grain (day) by RE-AGGREGATING THE HOUR
    PARTIALS — counts sum, decimal sums sum, mins/maxes min/max — so
    the day pass reads the (tiny) hourly aggregate, never the raw
    table twice. That is the continuous-aggregate/materialized-rollup
    shape: at 100 TB the raw scan happens exactly once per grain
    hierarchy, and every aggregate is map-side combinable.
  * `gap_fill_locf` is keyed by user_id end-to-end: per-(user, bucket)
    last-event selection is one partitioned window, the dense bucket
    grid is a per-user `sequence()` explode (bounded by the time span,
    independent of event count), and the carry-forward is an
    unbounded-preceding `last(ignorenulls)` window over buckets —
    partition-local, never a global sort. One shuffle partitioning
    (by user_id) serves all three stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import prep, table
from ..exact import dec2
from ..registry import query

_HOUR_US = 3_600 * 1_000_000
_DAY_US = 24 * _HOUR_US


@query(
    "hypertable_rollup",
    oracle=f"""
    WITH e AS (
      SELECT event_type, epoch_ns(ts) // 1000 AS us, value FROM events
    ),
    hour AS (
      SELECT event_type,
             (us // {_HOUR_US}) * {_HOUR_US} AS bucket_start_us,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS dsum,
             MIN(value) AS min_value,
             MAX(value) AS max_value
      FROM e GROUP BY event_type, us // {_HOUR_US}
    ),
    day AS (
      SELECT event_type,
             (bucket_start_us // {_DAY_US}) * {_DAY_US} AS bucket_start_us,
             SUM(n) AS n,
             SUM(dsum) AS dsum,
             MIN(min_value) AS min_value,
             MAX(max_value) AS max_value
      FROM hour GROUP BY event_type, bucket_start_us // {_DAY_US}
    )
    SELECT 'hour' AS grain, event_type,
           CAST(bucket_start_us AS BIGINT) AS bucket_start_us,
           CAST(n AS BIGINT) AS n,
           CAST(dsum AS DOUBLE) AS sum_value, min_value, max_value
    FROM hour
    UNION ALL
    SELECT 'day', event_type, CAST(bucket_start_us AS BIGINT),
           CAST(n AS BIGINT), CAST(dsum AS DOUBLE), min_value, max_value
    FROM day
    """,
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-grain time-bucket rollup (hour + day) with the day grain
    derived from the hour partials, not the raw table — the
    continuous-aggregate pattern (count/sum/min/max are all
    re-aggregable). Money-style sums go through DECIMAL(18,2)
    (exact.py) so the double surfaced at the end is bit-identical
    across engines; min/max of doubles are input values, hash-safe
    as-is."""
    prep(spark)
    e = table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us"), "value"
    )
    hour = e.groupBy(
        "event_type",
        (F.expr(f"us div {_HOUR_US}") * _HOUR_US).alias("bucket_start_us"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec2("value")).alias("dsum"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    # materialize the hour grain once: without this the union's two
    # branches each re-derive it from raw (two FileScans in the static
    # plan — verified with .explain); the hourly aggregate is
    # cardinality |event_type| x |hours|, i.e. tiny relative to raw,
    # which is exactly the continuous-aggregate contract
    hour = hour.localCheckpoint(eager=True)
    day = hour.groupBy(
        "event_type",
        (F.expr(f"bucket_start_us div {_DAY_US}") * _DAY_US).alias("bucket_start_us"),
    ).agg(
        F.sum("n").alias("n"),
        F.sum("dsum").alias("dsum"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )

    def finish(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "event_type",
            "bucket_start_us",
            "n",
            F.col("dsum").cast("double").alias("sum_value"),
            "min_value",
            "max_value",
        )

    return finish(hour, "hour").unionAll(finish(day, "day"))


@query(
    "gap_fill_locf",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us, value FROM events
    ),
    ranked AS (
      SELECT user_id, us // {_HOUR_US} AS bkt, value,
             row_number() OVER (PARTITION BY user_id, us // {_HOUR_US}
                                ORDER BY us DESC, event_id DESC) AS rn
      FROM e
    ),
    obs AS (SELECT user_id, bkt, value FROM ranked WHERE rn = 1),
    span AS (
      SELECT user_id, MIN(bkt) AS lo, MAX(bkt) AS hi FROM obs GROUP BY user_id
    ),
    grid AS (
      SELECT s.user_id, s.lo + t.i AS bkt
      FROM span s, UNNEST(range(s.hi - s.lo + 1)) AS t(i)
    ),
    joined AS (
      SELECT g.user_id, g.bkt, o.value
      FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.bkt = g.bkt
    )
    SELECT user_id,
           CAST(bkt * {_HOUR_US} AS BIGINT) AS bucket_start_us,
           last_value(value IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY bkt
                   ROWS UNBOUNDED PRECEDING) AS value_filled,
           CAST(value IS NULL AS BOOLEAN) AS was_gap
    FROM joined
    """,
)
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly resample per user with last-observation-carried-
    forward fill — the time-series feature-extraction primitive
    (TimescaleDB `time_bucket_gapfill` + `locf`). Per-bucket value =
    the latest event's value (ties broken by event_id, so the choice
    is deterministic); missing buckets inside each user's observed
    span are materialized via `sequence()` and filled by an
    unbounded-preceding `last(ignorenulls)` window. The first bucket
    of every span is observed by construction, so the fill is total.
    Values pass through unaggregated (exact 2-decimal doubles) —
    nothing reorders float arithmetic on either engine."""
    prep(spark)
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), "value"
    )
    e = e.withColumn("bkt", F.expr(f"us div {_HOUR_US}"))
    pick = W.partitionBy("user_id", "bkt").orderBy(F.desc("us"), F.desc("event_id"))
    obs = (
        e.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select("user_id", "bkt", "value")
    )
    span = obs.groupBy("user_id").agg(F.min("bkt").alias("lo"), F.max("bkt").alias("hi"))
    grid = span.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("bkt")
    )
    joined = grid.join(obs, ["user_id", "bkt"], "left")
    carry = W.partitionBy("user_id").orderBy("bkt").rowsBetween(W.unboundedPreceding, 0)
    return joined.select(
        "user_id",
        (F.col("bkt") * _HOUR_US).alias("bucket_start_us"),
        F.last("value", ignorenulls=True).over(carry).alias("value_filled"),
        F.col("value").isNull().alias("was_gap"),
    )


@query(
    "rolling_dau",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT (epoch_ns(ts) // 1000) // {_DAY_US} AS day, user_id
      FROM events
    ),
    dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day),
    spread AS (
      SELECT du.day + t.i AS day, du.user_id
      FROM du, UNNEST(range(7)) AS t(i)
    ),
    wau AS (
      SELECT day, COUNT(DISTINCT user_id) AS wau_trailing FROM spread GROUP BY day
    )
    SELECT CAST(d.day * {_DAY_US} AS BIGINT) AS day_start_us,
           CAST(d.dau AS BIGINT) AS dau,
           CAST(w.wau_trailing AS BIGINT) AS wau_trailing
    FROM dau d JOIN wau w ON w.day = d.day
    """,
)
def rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + trailing-7-day active users per observed day
    — the engagement rollup every product pipeline computes. The
    trailing-window DISTINCT is NOT a windowed count-distinct (Spark
    has none, and a range-join would rescan 7× per day): each (day,
    user) pair is EXPANDED to the 7 future days it keeps the user
    "active" for (a map-side `sequence` explode, the gap_fill grid
    technique), and one count-distinct per target day finishes it.
    7× row expansion of the DEDUPLICATED (day, user) table — tiny next
    to raw events — against zero repeated scans; at 100 TB the
    expansion shuffles once on day. Days outside the observed set are
    dropped by the final join (dau's day set)."""
    prep(spark)
    du = (
        table(spark, sf_dir, "events")
        .select(F.unix_micros("ts").alias("us"), "user_id")
        .select(F.expr(f"us div {_DAY_US}").alias("day"), "user_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    spread = du.select(
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day"), "user_id"
    )
    wau = spread.groupBy("day").agg(F.countDistinct("user_id").alias("wau_trailing"))
    return dau.join(wau, "day").select(
        (F.col("day") * _DAY_US).alias("day_start_us"),
        F.col("dau").cast("long").alias("dau"),
        F.col("wau_trailing").cast("long").alias("wau_trailing"),
    )
