"""Round-10 operator tests.

Covers VERDICT r9's action list: the de-weakened auc_exact /
ks_statistic (no unpartitioned Window AT ALL — stricter than the
registry-wide sweep, which excuses windows over aggregates), and the
round-10 additions as they land.
"""

from __future__ import annotations

import pytest

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.plans.inspect import plan_string

from conftest import SF_DIR

SPECS = registry.load_all()


def _all_unpartitioned_windows(df) -> list[str]:
    """EVERY empty-partitionSpec Window in the optimized plan — no
    bounded-input exemption (the sweep's `unpartitioned_unbounded_
    windows` excuses windows over aggregates; these two keys must not
    have even those, per VERDICT r9 #2: score cardinality is unbounded
    so the per-score histogram is NOT a bounded input)."""
    out: list[str] = []

    def walk(node) -> None:
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            out.append(node.simpleString(120))
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


@pytest.mark.parametrize("name", ["auc_exact", "ks_statistic"])
def test_score_sweep_has_no_unpartitioned_window_at_all(name, spark):
    """The cumulative-over-histogram shape must run bucketed (score
    bands -> broadcast offsets -> in-band windows): zero
    empty-partitionSpec Window nodes anywhere in the plan."""
    df = SPECS[name].builder(spark, SF_DIR)
    bad = _all_unpartitioned_windows(df)
    assert not bad, f"{name}: {bad}"
    assert "BroadcastHashJoin" in plan_string(df)
