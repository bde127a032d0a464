"""Behavioral analytics (operators/behavior.py) and the curation
composite: semantic invariants + synthetic ordered-sequence fixtures.
"""

from __future__ import annotations

import os
import tempfile

from blockchain2graphdb_spark.paths import tmp_root
from datetime import datetime, timedelta

import pyspark.sql.functions as F

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.catalog import table

SPECS = registry.load_all()

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write_events(spark, tmp, rows):
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        os.path.join(tmp, "events.parquet")
    )


# --------------------------------------------------------------- funnel


def test_funnel_counts_monotone(spark, sf_dir):
    rows = sorted(
        SPECS["funnel_conversion"].builder(spark, sf_dir).collect(),
        key=lambda r: r["step_idx"],
    )
    assert [r["step"] for r in rows] == ["view", "click", "purchase"]
    assert rows[0]["n_users"] >= rows[1]["n_users"] >= rows[2]["n_users"]


def test_funnel_requires_order(spark):
    """A user whose click precedes every view must NOT count as step 2."""
    from blockchain2graphdb_spark.operators.behavior import funnel_conversion

    base = datetime(2024, 1, 1)
    rows = [
        # user 1: view -> click -> purchase, in order: counts everywhere
        (0, base, 1, "view", 0.0, "{}"),
        (1, base + timedelta(minutes=1), 1, "click", 0.0, "{}"),
        (2, base + timedelta(minutes=2), 1, "purchase", 0.0, "{}"),
        # user 2: click BEFORE its only view: step 1 only
        (3, base, 2, "click", 0.0, "{}"),
        (4, base + timedelta(minutes=1), 2, "view", 0.0, "{}"),
        # user 3: view -> click, purchase before the click: stops at 2
        (5, base, 3, "view", 0.0, "{}"),
        (6, base + timedelta(minutes=1), 3, "purchase", 0.0, "{}"),
        (7, base + timedelta(minutes=2), 3, "click", 0.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_events(spark, tmp, rows)
        got = {r["step"]: r["n_users"] for r in funnel_conversion(spark, tmp).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_timestamp_counts(spark):
    """`at-or-after` semantics: a click at the exact view instant counts."""
    from blockchain2graphdb_spark.operators.behavior import funnel_conversion

    base = datetime(2024, 1, 1)
    rows = [
        (0, base, 1, "view", 0.0, "{}"),
        (1, base, 1, "click", 0.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_events(spark, tmp, rows)
        got = {r["step"]: r["n_users"] for r in funnel_conversion(spark, tmp).collect()}
    assert got["click"] == 1


# --------------------------------------------------------------- cohort


def test_cohort_week_zero_covers_all_users(spark, sf_dir):
    df = SPECS["cohort_retention"].builder(spark, sf_dir)
    rows = df.collect()
    assert all(r["week_offset"] >= 0 for r in rows)
    week0 = sum(r["n_users"] for r in rows if r["week_offset"] == 0)
    total_users = (
        table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    # every user is by definition active in their own cohort week
    assert week0 == total_users


def test_cohort_retention_never_exceeds_cohort_size(spark, sf_dir):
    rows = SPECS["cohort_retention"].builder(spark, sf_dir).collect()
    size = {
        r["cohort_week"]: r["n_users"] for r in rows if r["week_offset"] == 0
    }
    for r in rows:
        assert r["n_users"] <= size[r["cohort_week"]], r


# ----------------------------------------------------- curation pipeline


def test_curation_pipeline_partitions_corpus(spark, sf_dir):
    rows = SPECS["curation_pipeline"].builder(spark, sf_dir).collect()
    total = table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    assert {r["status"] for r in rows} <= {"kept", "duplicate", "too_short", "low_quality"}
    assert {r["split"] for r in rows} <= {"train", "val", "test"}


def test_curation_pipeline_duplicate_count_matches_exact_dedup(spark, sf_dir):
    rows = SPECS["curation_pipeline"].builder(spark, sf_dir).collect()
    n_dup = sum(r["n_docs"] for r in rows if r["status"] == "duplicate")
    docs = table(spark, sf_dir, "documents")
    expected = docs.count() - docs.select("text").distinct().count()
    assert n_dup == expected


# --------------------------------------------------------- transitions


def test_event_transitions_conserve_events(spark, sf_dir):
    """Each user with n events contributes exactly n-1 transitions, so
    total transitions = total events - distinct users."""
    rows = SPECS["event_transitions"].builder(spark, sf_dir).collect()
    ev = table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_transitions"] for r in rows) == n_events - n_users
    for r in rows:
        assert 1 <= r["n_users"] <= r["n_transitions"]


def test_event_transitions_orders_by_time(spark):
    """Transition direction must follow event time (ties by event_id),
    not input order: a reversed-row-order fixture still yields
    view→click, never click→view."""
    import tempfile

    from blockchain2graphdb_spark.operators.behavior import event_transitions

    base = datetime(2024, 1, 1)
    rows = [
        # written click-first, but view happens first in event time
        (2, base + timedelta(minutes=5), 1, "click", 0.0, "{}"),
        (1, base, 1, "view", 0.0, "{}"),
        # same-timestamp tie: event_id 3 then 4
        (4, base + timedelta(minutes=9), 2, "purchase", 0.0, "{}"),
        (3, base + timedelta(minutes=9), 2, "view", 0.0, "{}"),
    ]
    with tempfile.TemporaryDirectory(dir=tmp_root()) as tmp:
        _write_events(spark, tmp, rows)
        got = {
            (r["prev_type"], r["next_type"]): r["n_transitions"]
            for r in event_transitions(spark, tmp).collect()
        }
    assert got == {("view", "click"): 1, ("view", "purchase"): 1}


# --------------------------------------------------------------- scd2


def test_scd2_intervals_chain_and_alternate(spark, sf_dir):
    """Per user: versions are dense 1..n, intervals chain exactly
    (valid_to(v) == valid_from(v+1), last is NULL/current), and
    consecutive versions always change status."""
    rows = SPECS["scd2_history"].builder(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for u, vs in by_user.items():
        vs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in vs] == list(range(1, len(vs) + 1)), u
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"], u
            assert a["status"] != b["status"], u
        assert vs[-1]["valid_to_us"] is None, u


def test_scd2_single_user_shuffle(spark, sf_dir):
    """All window passes and the change-point filter share one
    hashpartitioning(user_id) exchange."""
    from blockchain2graphdb_spark.plans.inspect import count_nodes, plan_string

    df = SPECS["scd2_history"].builder(spark, sf_dir)
    assert count_nodes(df, "Exchange") == 1, plan_string(df)


def test_orders_rfm_partitions_all_customers(spark, sf_dir):
    """Every ordering customer gets exactly one segment; thresholds are
    honored (champions are recent AND frequent)."""
    rows = registry.load_all()["orders_rfm"].builder(spark, sf_dir).collect()
    n_cust = (
        table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert len(rows) == n_cust
    for r in rows:
        assert r["segment"] in {"champion", "recent", "loyal", "dormant"}
        if r["segment"] == "champion":
            assert r["recency_days"] <= 90 and r["frequency"] >= 10
        if r["segment"] == "dormant":
            assert r["recency_days"] > 90 and r["frequency"] < 10
        assert r["recency_days"] >= 0 and r["monetary"] > 0
