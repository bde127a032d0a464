"""Experimentation readouts over the event log (SURVEY §2.13 X18
family): CUPED variance reduction and funnel time-to-convert — the two
measurement primitives an A/B platform layers on top of the
ab_test_zscore / chi2 readouts (evalrank.py, mlprep.py).

Reference parity: the reference has no experimentation surface; these
extend the mandated training-pipeline analytics (BASELINE.json
north_star) the same way cohort_retention / funnel_conversion do.

Determinism: all timestamp math is unix-micro bigints (catalog
conventions), money becomes exact integer cents, and every cross-row
statistic is built from DECIMAL(38,0)/HUGEINT moment sums (the
corr_pairs discipline) — only final ratios touch doubles, quantized to
int micros.

Scale notes (100 TB): both operators reduce the event log to O(#users)
rows with ONE user-keyed aggregate, then compute O(1)/O(#users)
statistics on that reduction; quantiles use the bucketed two-pass rank
(never an unpartitioned window over the full log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import prep, table
from ..exact import dec2
from ..functions.ranking import bucketed_global_rank
from ..registry import query

_D38 = "decimal(38,0)"


@query(
    "cuped_adjustment",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS us,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    cut AS (SELECT (MIN(us) + MAX(us)) // 2 AS cutoff FROM e),
    u AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN us < cutoff THEN cents ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN us >= cutoff THEN cents ELSE 0 END)
                  AS BIGINT) AS y
      FROM e, cut GROUP BY user_id
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM u
    )
    SELECT n,
           CAST(sx AS BIGINT) AS sum_pre_cents,
           CAST(sy AS BIGINT) AS sum_post_cents,
           CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6)
                AS BIGINT) AS theta_micros,
           CAST(ROUND((CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE))
                      * (CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * syy - sy * sy AS DOUBLE)) * 1e6)
                AS BIGINT) AS var_reduction_micros
    FROM m
    """,
)
def cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data): split
    the event calendar at its midpoint, reduce to per-user pre-period
    (covariate X) and post-period (metric Y) spend in exact cents, and
    report theta = Cov(X,Y)/Var(X) plus the variance-reduction factor
    rho^2 = theta * Cov/Var(Y) an adjusted metric Y - theta(X - mean X)
    would achieve. The calendar midpoint is DATA-DERIVED integer math
    ((min+max) div 2 on unix micros) so fixture-calendar drift cannot
    desync the two engines (STATUS round-9 date-domain rule). The five
    moment sums accumulate exactly (DECIMAL(38,0) / HUGEINT); the
    n*Sxy - Sx*Sy cancellations happen in exact arithmetic (corr_pairs
    discipline); theta and rho^2 are final double ratios of identical
    exact integers, int-micros quantized.

    Scale shape: one user-keyed conditional aggregate collapses the log
    to O(#users); one map-side-combinable moment aggregate collapses
    that to a single row. The cutoff is a 1-row broadcast, not a
    collect. No windows, no pairwise joins."""
    prep(spark)
    e = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        (dec2("value") * 100).cast("long").alias("cents"),
    )
    cut = e.agg(
        F.expr("(min(us) + max(us)) div 2").cast("long").alias("cutoff")
    )
    u = (
        e.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("us") < F.col("cutoff"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("us") >= F.col("cutoff"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )
    xd, yd = F.col("x").cast(_D38), F.col("y").cast(_D38)
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xd).cast(_D38).alias("sx"),
        F.sum(yd).cast(_D38).alias("sy"),
        F.sum(xd * F.col("x")).cast(_D38).alias("sxx"),
        F.sum(yd * F.col("y")).cast(_D38).alias("syy"),
        F.sum(xd * F.col("y")).cast(_D38).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cxy = (n * F.col("sxy") - sx * sy).cast("double")
    cxx = (n * F.col("sxx") - sx * sx).cast("double")
    cyy = (n * F.col("syy") - sy * sy).cast("double")
    return m.select(
        "n",
        sx.cast("long").alias("sum_pre_cents"),
        sy.cast("long").alias("sum_post_cents"),
        F.round(cxy / cxx * 1e6).cast("long").alias("theta_micros"),
        F.round((cxy / cxx) * (cxy / cyy) * 1e6)
        .cast("long")
        .alias("var_reduction_micros"),
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events
    ),
    s1 AS (
      SELECT user_id, MIN(us) AS t1 FROM e
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.us) AS t2
      FROM e JOIN s1 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.us >= s1.t1
      GROUP BY e.user_id
    ),
    d AS (
      SELECT s1.user_id, s2.t2 - s1.t1 AS delta_us
      FROM s1 JOIN s2 USING (user_id)
    ),
    ranked AS (
      SELECT delta_us,
             row_number() OVER (ORDER BY delta_us, user_id) AS pos,
             COUNT(*) OVER () AS n
      FROM d
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
           CAST(MIN(delta_us) AS BIGINT) AS min_us,
           CAST(MAX(delta_us) AS BIGINT) AS max_us,
           CAST(MIN(CASE WHEN pos = (n + 1) // 2 THEN delta_us END)
                AS BIGINT) AS median_us,
           CAST(MIN(CASE WHEN pos = (9 * n + 9) // 10 THEN delta_us END)
                AS BIGINT) AS p90_us
    FROM ranked
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every user whose first
    purchase happens at-or-after their first signup (the
    funnel_conversion step semantics, behavior.py:71), the latency
    between the two, summarized as exact rank-based min / lower-median
    / ceil-p90 / max in integer microseconds. Quantiles are VALUES AT
    EXACT RANKS ((n+1) div 2 and ceil(0.9 n) over the unique
    (delta, user_id) order) — no interpolation, so no float midpoint
    parity exposure (iqr_outliers discipline, mlprep.py:851).

    Scale shape: two user-keyed min-aggregates and one user-keyed join
    collapse the log to O(#converted) rows; the rank pass is
    bucketed_global_rank (per-bucket counts + broadcast offsets +
    in-bucket windows — never one WindowExec partition); the final
    summary is a single map-side-combinable aggregate."""
    prep(spark)
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s1 = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        e.join(s1, "user_id")
        .where((F.col("event_type") == "purchase") & (F.col("us") >= F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    d = s1.join(s2, "user_id").select(
        "user_id", (F.col("t2") - F.col("t1")).alias("delta_us")
    )
    # bucket by delta-hour band: monotone with the (delta_us, user_id)
    # sort order as required by the two-pass rank contract
    ranked = bucketed_global_rank(
        d,
        F.expr("delta_us div 3600000000"),
        [F.col("delta_us"), F.col("user_id")],
    )
    n, pos = F.col("n_total"), F.col("pos")
    med_pos = F.expr("(n_total + 1) div 2")
    p90_pos = F.expr("(9 * n_total + 9) div 10")
    return ranked.agg(
        F.max(n).cast("long").alias("n_converted"),
        F.min("delta_us").cast("long").alias("min_us"),
        F.max("delta_us").cast("long").alias("max_us"),
        F.min(F.when(pos == med_pos, F.col("delta_us"))).cast("long").alias("median_us"),
        F.min(F.when(pos == p90_pos, F.col("delta_us"))).cast("long").alias("p90_us"),
    )
