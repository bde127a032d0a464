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


def test_wallet_cc_oracle_poison_guard_fires_when_unconverged():
    """The unrolled hash-min oracle must FAIL LOUDLY (poison part = -1)
    when given too few rounds for the graph, instead of shipping wrong
    component labels: a 10-link part chain cannot converge in 1 round
    but does (with pointer jumping) in 5 — plus ONE settle round for the
    guard's last-two-rounds comparison to observe quiescence."""
    import duckdb
    import pandas as pd

    from blockchain2graphdb_spark.operators.graphops import _wallet_cc_oracle

    # orders i = {part i, part i+1}: star edges form a path 1-2-...-11
    rows = []
    for i in range(1, 11):
        rows.append({"l_orderkey": i, "l_partkey": i})
        rows.append({"l_orderkey": i, "l_partkey": i + 1})
    con = duckdb.connect()
    con.register("lineitem", pd.DataFrame(rows))
    short = con.sql(_wallet_cc_oracle(1)).df()
    assert (short["part"] == -1).any(), "guard must fire on unconverged unroll"
    ok = con.sql(_wallet_cc_oracle(6)).df()
    assert not (ok["part"] == -1).any()
    assert (ok["component"] == 1).all(), "path collapses to min label 1"


def test_iqr_outliers_single_row_matches_oracle(spark, tmp_path):
    """ADVICE r9: with n == 1 both quartile target ranks collapse onto
    the same row; q3 selection must be `pos == q3_pos` (not
    `pos != q1_pos`, which yields NULL and diverges from the oracle's
    CASE). Differential pin on a 1-row orders table."""
    import duckdb
    import pandas as pd

    pd.DataFrame(
        {
            "o_orderkey": [7],
            "o_custkey": [1],
            "o_orderstatus": ["F"],
            "o_totalprice": [123.45],
            "o_orderdate": pd.to_datetime(["2024-01-01"]).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"],
        }
    ).to_parquet(tmp_path / "orders.parquet")
    got = (
        SPECS["iqr_outliers"]
        .builder(spark, str(tmp_path))
        .toPandas()
        .sort_index(axis=1)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS "
        f"SELECT * FROM read_parquet('{tmp_path}/orders.parquet')"
    )
    want = con.sql(SPECS["iqr_outliers"].oracle).df().sort_index(axis=1)
    assert got["q1"].iloc[0] == got["q3"].iloc[0] == 123.45
    assert got["n_outliers"].iloc[0] == 0
    pd.testing.assert_frame_equal(
        got.astype("float64"), want.astype("float64"), check_like=True
    )
