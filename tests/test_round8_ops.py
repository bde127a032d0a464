"""Round-8 operator tests: plan-shape assertions for the new
time-series / linkage / scoring operators plus the re-aggregation and
fill-totality invariants their docstrings claim (SURVEY.md §4/§5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.catalog import table
from blockchain2graphdb_spark.exact import dec2
from blockchain2graphdb_spark.plans.inspect import executed_plan_string, plan_string

from conftest import SF_DIR

SPECS = registry.load_all()


def _df(name, spark):
    return SPECS[name].builder(spark, SF_DIR)


def test_hypertable_day_equals_day_from_raw(spark):
    """The continuous-aggregate invariant: the day grain derived from
    hour partials must equal a direct day aggregation of the raw table
    (counts/decimal sums are associative, min/max idempotent)."""
    _DAY_US = 24 * 3600 * 1_000_000
    rolled = {
        tuple(r)
        for r in _df("hypertable_rollup", spark)
        .where(F.col("grain") == "day")
        .drop("grain")
        .collect()
    }
    e = table(spark, SF_DIR, "events").select(
        "event_type", F.unix_micros("ts").alias("us"), "value"
    )
    direct = {
        tuple(r)
        for r in e.groupBy(
            "event_type",
            (F.expr(f"us div {_DAY_US}") * _DAY_US).alias("bucket_start_us"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("value")).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert rolled == direct


def test_gap_fill_is_total_and_dense(spark):
    """Every grid bucket gets a non-null fill (the span's first bucket is
    observed by construction), and per-user buckets are hour-contiguous."""
    rows = _df("gap_fill_locf", spark).collect()
    assert rows and all(r.value_filled is not None for r in rows)
    _HOUR_US = 3600 * 1_000_000
    by_user: dict[int, list[int]] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.bucket_start_us)
    for buckets in by_user.values():
        buckets.sort()
        assert all(b - a == _HOUR_US for a, b in zip(buckets, buckets[1:]))


def test_gap_fill_carries_last_observation(spark):
    """A was_gap row's fill equals the nearest preceding observed value."""
    rows = sorted(
        _df("gap_fill_locf", spark).collect(),
        key=lambda r: (r.user_id, r.bucket_start_us),
    )
    last_obs: dict[int, float] = {}
    for r in rows:
        if r.was_gap:
            assert r.value_filled == last_obs[r.user_id]
        else:
            last_obs[r.user_id] = r.value_filled


def test_record_linkage_blocking_is_equi_join(spark):
    """Candidate generation must be a blocking-key hash/merge equi-join —
    a Cartesian or nested-loop pairwise compare is the scale-killer the
    blocking stage exists to avoid."""
    s = executed_plan_string(_df("record_linkage", spark))
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert "HashJoin" in s or "SortMergeJoin" in s, s


def test_record_linkage_partitions_entities(spark):
    """Entity assignment is a partition of the input: every record
    appears exactly once, entity sizes are consistent, and every
    fixture block of 10 consecutive names collapses to one entity."""
    rows = _df("record_linkage", spark).collect()
    keys = [r.c_custkey for r in rows]
    assert len(keys) == len(set(keys))
    from collections import Counter

    sizes = Counter(r.entity_id for r in rows)
    assert all(sizes[r.entity_id] == r.entity_size for r in rows)
    for r in rows:
        assert r.entity_id == (r.c_custkey // 10) * 10


def test_join_skew_report_is_take_ordered(spark):
    """The top-10 cut must plan as TakeOrderedAndProject (no global
    sort), with the 1-row total broadcast."""
    s = plan_string(_df("join_skew_report", spark))
    assert "TakeOrderedAndProject" in s, s
    assert "BroadcastExchange" in s, s


def test_surprisal_and_band_filters_stay_jvm_side(spark):
    """The scoring joins must not fall back to row-at-a-time Python and
    must broadcast their 1-row aggregate sides."""
    for key in ("text_surprisal", "doc_length_band"):
        s = plan_string(_df(key, spark))
        assert "BatchEvalPython" not in s, key
        assert "BroadcastExchange" in s, key


def test_label_propagation_is_fixpoint_on_stars(spark):
    """On the star-contraction wallet graph every component has diameter
    2 through its hub, so 3 deterministic LPA rounds must agree with
    connected components on the grouping (hub-labeled communities =
    wallet components)."""
    lpa = {r.part: r.community for r in _df("label_propagation", spark).collect()}
    cc = {r.part: r.component for r in _df("wallet_components", spark).collect()}
    assert set(lpa) == set(cc)
    # LPA communities refine or equal the connected components: two nodes
    # in different components can never share a community label
    for node, comm in lpa.items():
        assert cc[node] == cc[comm]


def test_dedup_embedding_exact_finds_seeded_dups(spark):
    """Every seeded re-ingest (vec_id % 10 == 0, shifted by 1e6) must
    land in a group of >= 2 keeping the original id; unseeded vectors
    stay singletons keeping themselves."""
    rows = _df("dedup_embedding_exact", spark).collect()
    by_id = {r.vec_id: r for r in rows}
    for r in rows:
        if r.vec_id >= 1_000_000:
            orig = r.vec_id - 1_000_000
            assert r.keep_id == by_id[orig].keep_id == orig
            assert r.group_size >= 2
        elif r.vec_id % 10 != 0:
            assert r.keep_id == r.vec_id and r.group_size == 1


def test_sample_priority_is_complete():
    """_SAMPLE_PRIORITY is the entire sampling schedule — load_all()
    silently ignores names missing from it, so completeness must be
    pinned: every registry key appears exactly once and nothing extra."""
    from blockchain2graphdb_spark.registry import _SAMPLE_PRIORITY

    assert len(_SAMPLE_PRIORITY) == len(set(_SAMPLE_PRIORITY))
    assert set(_SAMPLE_PRIORITY) == set(SPECS)


def test_session_funnel_gap_is_sessionize_batch_gap():
    """session_funnel promises sessionize_batch semantics; the constants
    must be the same object so a tuning cannot desync them."""
    from blockchain2graphdb_spark.operators.behavior import _SF_GAP_US
    from blockchain2graphdb_spark.operators.pipeline import _SESSION_GAP_US

    assert _SF_GAP_US is _SESSION_GAP_US


def test_spatial_joins_are_cell_equi_joins(spark):
    """Spatial candidates must come from the grid-cell equi-join — a
    Cartesian/nested-loop distance compare is the O(N^2) scale-killer
    the grid exists to avoid — and the kNN cut must compile to
    WindowGroupLimit."""
    for key in ("spatial_radius_join", "spatial_knn"):
        s = plan_string(_df(key, spark))
        assert "CartesianProduct" not in s, key
        assert "BroadcastNestedLoopJoin" not in s, key
    assert "WindowGroupLimit" in plan_string(_df("spatial_knn", spark))


def test_spatial_radius_matches_bruteforce(spark):
    """Grid-bucketed result == brute-force all-pairs on the same cloud
    (the recall-completeness proof: cell size = radius guarantees every
    true neighbor is inside the 3x3 probe window)."""
    from blockchain2graphdb_spark.operators.spatial import _R2, _points

    pts = _points(spark, SF_DIR).collect()
    brute = {
        (p.id, q.id)
        for p in pts
        for q in pts
        if p.id < q.id and (p.x - q.x) ** 2 + (p.y - q.y) ** 2 <= _R2
    }
    grid = {(r.a, r.b) for r in _df("spatial_radius_join", spark).collect()}
    assert grid == brute


def test_psi_terms_are_nonnegative_and_distributions_sum_to_one(spark):
    """Each PSI term (p-q)ln(p/q) is >= 0 by construction (same sign
    factors), and the smoothed p/q over the full 10-bin spine each sum
    to exactly 1 — the invariant the bin-spine fix exists for."""
    rows = _df("split_drift_psi", spark).collect()
    assert len(rows) == 10
    assert all(r.psi_nanos >= 0 for r in rows)
    ttr = sum(r.n_train for r in rows)
    tva = sum(r.n_val for r in rows)
    assert abs(sum((r.n_train + 1) / (ttr + 10) for r in rows) - 1.0) < 1e-12
    assert abs(sum((r.n_val + 1) / (tva + 10) for r in rows) - 1.0) < 1e-12


def test_cusum_telescopes_to_zero(spark):
    """S_k = sum(n_i*D - total) telescopes: the final day's cusum per
    type is total*D - total*D = 0 exactly — any nonzero tail means the
    walk lost or double-counted a day."""
    rows = _df("cusum_drift", spark).collect()
    last = {}
    for r in sorted(rows, key=lambda r: r.day_start_us):
        last[r.event_type] = r.cusum_scaled
    assert last and all(v == 0 for v in last.values())


def test_seasonality_indices_recompute_and_average_to_one(spark):
    """Recompute every seasonal index from the emitted integer counts
    and compare to seasonal_nanos (a regression in the index math or
    slot bucketing must fail this), then check the day-count-weighted
    mean of the RECOMPUTED indices is 1 per type."""
    rows = _df("seasonality_profile", spark).collect()
    assert rows
    from collections import defaultdict

    per_type = defaultdict(list)
    for r in rows:
        per_type[r.event_type].append(r)
    for rs in per_type.values():
        total = sum(r.n_events for r in rs)
        total_days = sum(r.n_days for r in rs)
        wsum = 0.0
        for r in rs:
            idx = r.n_events * total_days / (r.n_days * total)
            # <=1 nano tolerance: Python round() is banker's, the
            # engines' ROUND is HALF_UP (STATUS determinism rules)
            assert abs(r.seasonal_nanos - idx * 1e9) <= 1, r
            wsum += idx * r.n_days
        assert abs(wsum - total_days) < 1e-6


def test_chi2_is_nonnegative_and_marginals_consistent(spark):
    """Chi-square >= 0 and the reported table dimensions match the
    fixture's segment/nation cardinalities."""
    r = _df("chi2_association", spark).collect()[0]
    assert r.chi2_nanos >= 0
    from blockchain2graphdb_spark.catalog import table as _t

    cust = _t(spark, SF_DIR, "customer")
    assert r.n_rows == cust.select("c_mktsegment").distinct().count()
    assert r.n_cols == cust.select("c_nationkey").distinct().count()


def test_spatial_grid_handles_hot_cell(spark):
    """Skew stress: a degenerate cloud where EVERY point shares one
    location (the worst single-cell hotspot) must still produce the
    complete pairwise set through the grid join — correctness under
    maximal cell skew, the AQE-skew territory the module docstring
    claims. 200 coincident points -> C(200,2) = 19900 zero-distance
    pairs, plus kNN returning exactly 3 neighbors per point."""
    from pyspark.sql import functions as F

    from blockchain2graphdb_spark.operators.spatial import _R2, _probe_home

    n = 200
    pts = spark.range(n).select(
        F.col("id"), F.lit(5_000).alias("x"), F.lit(5_000).alias("y")
    )
    probe, home, d2 = _probe_home(pts)
    pairs = (
        probe.join(home, ["cx", "cy"])
        .where(F.col("a") < F.col("b"))
        .where(d2 <= _R2)
        .select("a", "b")
    )
    assert pairs.count() == n * (n - 1) // 2
    cand = (
        probe.join(home, ["cx", "cy"])
        .where(F.col("a") != F.col("b"))
        .select("a", "b", d2.alias("d2"))
        .where(F.col("d2") <= _R2)
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("a").orderBy("d2", "b")
    knn = cand.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)
    per_a = knn.groupBy("a").count().collect()
    assert len(per_a) == n and all(r["count"] == 3 for r in per_a)
