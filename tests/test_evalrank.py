"""X18 eval-metric operator tests: each statistic is re-derived in
pure pandas/numpy from the same fixture and compared exactly (the
auc_exact test discipline), plus plan-shape assertions (no
unpartitioned data windows; NDCG's top-k is WindowGroupLimit).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.catalog import table
from blockchain2graphdb_spark.plans.inspect import (
    has_node,
    unpartitioned_unbounded_windows,
)

from conftest import SF_DIR

SPECS = registry.load_all()


def _df(name, spark):
    return SPECS[name].builder(spark, SF_DIR)


def _orders(spark) -> pd.DataFrame:
    return (
        table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .toPandas()
    )


def test_ks_matches_pandas_ecdf(spark):
    """The cleared-denominator KS max equals the max ECDF gap computed
    directly over sorted pooled values, and D is in [0, 1]."""
    r = _df("ks_statistic", spark).collect()[0]
    o = _orders(spark)
    a = np.sort(o.loc[o.o_orderstatus == "F", "o_totalprice"].to_numpy())
    b = np.sort(o.loc[o.o_orderstatus != "F", "o_totalprice"].to_numpy())
    pooled = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, pooled, side="right")
    f2 = np.searchsorted(b, pooled, side="right")
    num = np.abs(f1.astype(np.int64) * len(b) - f2.astype(np.int64) * len(a)).max()
    assert (r.n1, r.n2) == (len(a), len(b))
    assert r.ks_num == num
    assert abs(r.ks_d - num / (len(a) * len(b))) < 1e-15
    assert 0.0 <= r.ks_d <= 1.0


def test_ndcg_matches_pandas(spark):
    """Per-query NDCG@10 equals the direct per-group computation, and
    every NDCG is in [0, 1] with dcg <= idcg."""
    rows = {r.qry: r for r in _df("ndcg_at_k", spark).collect()}
    o = _orders(spark)
    o["rel"] = o.o_orderstatus.map({"F": 2, "P": 1}).fillna(0).astype(int)
    for qry, g in o.groupby("o_orderpriority"):
        top = g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        dcg = sum(
            round(rel * math.log(2.0) / math.log(i + 2) * 1e9)
            for i, rel in enumerate(top.rel.head(10))
        )
        ideal = g.sort_values(["rel", "o_orderkey"], ascending=[False, True])
        idcg = sum(
            round(rel * math.log(2.0) / math.log(i + 2) * 1e9)
            for i, rel in enumerate(ideal.rel.head(10))
        )
        r = rows[qry]
        assert r.dcg_nanos == dcg, qry
        assert r.idcg_nanos == idcg, qry
        assert r.dcg_nanos <= r.idcg_nanos
        assert 0.0 <= r.ndcg <= 1.0


def test_gini_matches_numpy(spark):
    """Per-class Gini equals the sorted-rank formula computed in numpy,
    and every coefficient is in [0, 1) (non-negative values)."""
    rows = {r.cat: r for r in _df("gini_concentration", spark).collect()}
    o = _orders(spark)
    o["cents"] = (o.o_totalprice * 100).round().astype(np.int64)
    for cat, g in o.groupby("o_orderpriority"):
        x = np.sort(g.cents.to_numpy())
        n = len(x)
        ranks = np.arange(1, n + 1, dtype=np.int64)
        num = 2 * int((ranks * x).sum()) - (n + 1) * int(x.sum())
        den = n * int(x.sum())
        r = rows[cat]
        assert r.n == n
        assert r.gini_nanos == round(num / den * 1e9), cat
        assert 0 <= r.gini_nanos < 1_000_000_000


def test_kappa_matches_manual_formula(spark):
    """The cleared-denominator kappa equals the textbook (po-pe)/(1-pe)
    from the pandas contingency table, and sits in [-1, 1]."""
    r = _df("cohens_kappa", spark).collect()[0]
    o = _orders(spark)
    a = o.o_totalprice >= 150000
    b = o.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    yy, yn = int((a & b).sum()), int((a & ~b).sum())
    ny, nn = int((~a & b).sum()), int((~a & ~b).sum())
    assert (r.yy, r.yn, r.ny, r.nn) == (yy, yn, ny, nn)
    n = yy + yn + ny + nn
    po = (yy + nn) / n
    pe = ((yy + yn) * (yy + ny) + (ny + nn) * (yn + nn)) / (n * n)
    assert r.kappa_nanos == round((po - pe) / (1 - pe) * 1e9)
    assert -1_000_000_000 <= r.kappa_nanos <= 1_000_000_000


def test_calibration_bins_partition_and_bound(spark):
    """All 10 decile bins appear, their counts partition the table, and
    each bin's mean prediction lies inside the bin's permille range."""
    rows = sorted(_df("calibration_bins", spark).collect(), key=lambda r: r.bin)
    assert [r.bin for r in rows] == list(range(10))
    total = table(spark, SF_DIR, "orders").count()
    assert sum(r.n for r in rows) == total
    for r in rows:
        lo, hi = r.bin * 100_000, r.bin * 100_000 + 99_000
        assert lo <= r.mean_p_micros <= hi
        assert 0 <= r.pos_rate_micros <= 1_000_000
        assert 0 <= r.n_pos <= r.n


def test_evalrank_plan_shapes(spark):
    """No unpartitioned unbounded window ever sees data-scale input
    (KS cumulates over the per-score aggregate — exempt by the bounded
    rule), and NDCG's rank filters compile to WindowGroupLimit."""
    for key in (
        "ks_statistic",
        "ndcg_at_k",
        "gini_concentration",
        "cohens_kappa",
        "calibration_bins",
    ):
        assert unpartitioned_unbounded_windows(_df(key, spark)) == [], key
    assert has_node(_df("ndcg_at_k", spark), "WindowGroupLimit")


def test_ab_test_matches_python(spark):
    """Bucket counts and the pooled z equal the direct computation."""
    import hashlib
    import math

    r = _df("ab_test_zscore", spark).collect()[0]
    o = _orders(spark)
    nib = o.o_orderkey.map(
        lambda k: int(hashlib.md5(f"ab{k}".encode()).hexdigest()[0], 16)
    )
    a = nib < 8
    y = o.o_orderstatus == "F"
    n_a, n_b = int(a.sum()), int((~a).sum())
    c_a, c_b = int((a & y).sum()), int((~a & y).sum())
    assert (r.n_a, r.n_b, r.c_a, r.c_b) == (n_a, n_b, c_a, c_b)
    pool = (c_a + c_b) / (n_a + n_b)
    z = (c_a / n_a - c_b / n_b) / math.sqrt(
        pool * (1 - pool) * (1 / n_a + 1 / n_b)
    )
    assert r.z_micros == round(z * 1e6)
    # the hash split is near-even
    assert abs(n_a - n_b) < 0.2 * (n_a + n_b)
