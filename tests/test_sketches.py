"""Sketch-op quality gates: approx_percentile vs exact percentile, and
HLL shard-merge vs direct sketch vs true distinct count."""

from __future__ import annotations

import pyspark.sql.functions as F

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.catalog import table

SPECS = registry.load_all()


def test_approx_percentile_within_rank_bracket(spark, sf_dir):
    """approx_percentile returns an actual data value (no interpolation),
    so value-distance to the interpolated exact percentile is bounded by
    the local gap between order statistics, not by sketch error. The
    right invariant is a RANK bracket: approx p50 ∈ [exact p40, p60],
    approx p95 ∈ [exact p90, p99]."""
    approx = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in SPECS["agg_approx_percentile"].builder(spark, sf_dir).collect()
    }
    brackets = {
        r["event_type"]: r
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.40)").alias("p40"),
            F.expr("percentile(value, 0.60)").alias("p60"),
            F.expr("percentile(value, 0.90)").alias("p90"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .collect()
    }
    assert set(approx) == set(brackets)
    for et, (a50, a95) in approx.items():
        b = brackets[et]
        assert b["p40"] <= a50 <= b["p60"], (et, a50, b["p40"], b["p60"])
        assert b["p90"] <= a95 <= b["p99"], (et, a95, b["p90"], b["p99"])


def test_hll_merge_equals_direct_sketch(spark, sf_dir):
    """Merging per-year shards must give the same estimate as sketching
    the whole column at once (mergeability is the entire point), and
    land within HLL error of the true distinct count."""
    merged = SPECS["agg_hll_merge"].builder(spark, sf_dir).collect()[0][
        "distinct_customers"
    ]
    o = table(spark, sf_dir, "orders")
    direct = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("d")
    ).collect()[0]["d"]
    true = o.select("o_custkey").distinct().count()
    assert merged == direct
    assert abs(merged - true) <= 0.05 * true, (merged, true)


# --------------------------------------------------------- count-min


def test_countmin_estimates_dominate_true_counts(spark, sf_dir):
    """The CMS guarantee: for every user, min over depths of the
    user's bucket count >= the user's true event count; and per depth
    the sketch conserves total mass."""
    import hashlib

    import pyspark.sql.functions as F

    from blockchain2graphdb_spark import registry
    from blockchain2graphdb_spark.catalog import table

    cells = {
        (r["depth"], r["bucket"]): r["cnt"]
        for r in registry.load_all()["sketch_countmin"].builder(spark, sf_dir).collect()
    }
    truth = {
        r["user_id"]: r["n"]
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(truth.values())
    for d in range(4):
        assert sum(c for (dd, _), c in cells.items() if dd == d) == total, d
    for uid, n in truth.items():
        est = min(
            cells[(d, int(hashlib.md5(f"{d}:{uid}".encode()).hexdigest()[:4], 16) % 1024)]
            for d in range(4)
        )
        assert est >= n, uid
