"""Event-log behavioral analytics (SURVEY §2.13 X9-adjacent, over the S3
process-log source family): ordered funnel conversion and weekly cohort
retention — the two classic event-analytics rollups, both value-hash
oracle-checked.

All timestamp math happens on unix-micro bigints (see catalog._events)
and week bucketing is pure integer division — no engine-specific
calendar semantics anywhere, so results are bit-identical across
Spark and DuckDB.

Scale notes (100 TB): every stage is keyed by user_id — one shuffle
partitioning serves the per-user mins, the ordered-step joins (each a
per-user aggregate joined back, never a cross join), and the cohort
assignment. The funnel's per-step frames are single-row aggregates
(map-side combinable counts), so the final union is driver-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import prep, table
from ..registry import query

_WEEK_US = 7 * 24 * 3600 * 1_000_000

# Ordered funnel over the fixture's browse→buy path.
_FUNNEL_STEPS = ("view", "click", "purchase")


@query(
    "funnel_conversion",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events
    ),
    s1 AS (
      SELECT user_id, MIN(us) AS t1 FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.us) AS t2
      FROM e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.us >= s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.us) AS t3
      FROM e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.us >= s2.t2
      GROUP BY e.user_id
    )
    SELECT 1 AS step_idx, 'view' AS step,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT CAST(COUNT(*) AS BIGINT) FROM s3)
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked at-or-after their
    first view, then purchased at-or-after that first qualifying click.

    Each step is `min-timestamp aggregate → join back → filtered min` —
    the per-user sequential-pattern shape (a bounded MATCH_RECOGNIZE).
    Step frames shrink monotonically, and every join is keyed on
    user_id; nothing is ever pairwise.
    """
    prep(spark)
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )

    def first_at_or_after(prev: DataFrame, prev_t: str, step: str, out_t: str) -> DataFrame:
        return (
            e.join(prev, "user_id")
            .where((F.col("event_type") == step) & (F.col("us") >= F.col(prev_t)))
            .groupBy("user_id")
            .agg(F.min("us").alias(out_t))
        )

    s1 = (
        e.where(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = first_at_or_after(s1, "t1", _FUNNEL_STEPS[1], "t2")
    s3 = first_at_or_after(s2, "t2", _FUNNEL_STEPS[2], "t3")

    def count_frame(df: DataFrame, idx: int, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(idx).alias("step_idx"), F.lit(name).alias("step"), "n_users"
        )

    return (
        count_frame(s1, 1, "view")
        .unionByName(count_frame(s2, 2, "click"))
        .unionByName(count_frame(s3, 3, "purchase"))
    )


@query(
    "cohort_retention",
    oracle=f"""
    WITH e AS (
      SELECT user_id, (epoch_ns(ts) // 1000) // {_WEEK_US} AS w FROM events
    ),
    uw AS (SELECT DISTINCT user_id, w FROM e),
    c AS (SELECT user_id, MIN(w) AS cw FROM uw GROUP BY user_id)
    SELECT CAST(c.cw AS BIGINT) AS cohort_week,
           CAST(uw.w - c.cw AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM uw JOIN c USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-active
    week (epoch-week index — pure integer division, no calendar), counted
    in every subsequent week they were active.

    distinct(user, week) → per-user min week → join back → count per
    (cohort, offset). The distinct and the min reuse the same user_id
    hash partitioning; the join is keyed, the result is |weeks|² rows
    at most — tiny regardless of corpus size.
    """
    prep(spark)
    uw = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(f"unix_micros(ts) div {_WEEK_US}").alias("w"),
        )
        .distinct()
    )
    c = uw.groupBy("user_id").agg(F.min("w").alias("cw"))
    return (
        uw.join(c, "user_id")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.col("w") - F.col("cw")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
