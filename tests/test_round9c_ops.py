"""Round-9 batch-3 operator tests: MAD, entropy profile, RRF fusion,
and the dedup cluster histogram — each re-derived in numpy/pandas from
the fixture (the auc_exact discipline) plus plan-shape checks.
"""

from __future__ import annotations

import math

import numpy as np

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


def test_mad_matches_numpy(spark):
    """Doubled-integer median and quadrupled MAD equal the numpy
    interpolating median computation exactly."""
    r = _df("mad_robust", spark).collect()[0]
    prices = [
        row.o_totalprice
        for row in table(spark, SF_DIR, "orders").select("o_totalprice").collect()
    ]
    cents = np.sort(np.round(np.array(prices) * 100).astype(np.int64))
    n = len(cents)
    k1, k2 = (n + 1) // 2, (n + 2) // 2
    med2 = int(cents[k1 - 1] + cents[k2 - 1])
    dev2 = np.sort(np.abs(2 * cents - med2))
    mad4 = int(dev2[k1 - 1] + dev2[k2 - 1])
    assert (r.n, r.med2_cents, r.mad4_cents) == (n, med2, mad4)
    assert abs(r.median - np.median(cents) / 100) < 1e-9
    assert abs(r.mad - np.median(np.abs(cents - np.median(cents))) / 100) < 1e-9


def test_entropy_matches_python(spark):
    """Each profiled column's entropy equals the direct -p ln p sum
    over exact counts, and normalized entropy is within [0, ln k]."""
    rows = {r.col_name: r for r in _df("entropy_profile", spark).collect()}
    sources = {
        "events.event_type": ("events", "event_type"),
        "documents.lang": ("documents", "lang"),
        "documents.source": ("documents", "source"),
        "customer.c_mktsegment": ("customer", "c_mktsegment"),
    }
    assert set(rows) == set(sources)
    for name, (tbl, col) in sources.items():
        vals = [r[0] for r in table(spark, SF_DIR, tbl).select(col).collect()]
        counts: dict = {}
        for v in vals:
            counts[v] = counts.get(v, 0) + 1
        tot = len(vals)
        want = sum(
            round(-(c / tot) * math.log(c / tot) * 1e9) for c in counts.values()
        )
        r = rows[name]
        assert r.n_rows == tot
        assert r.n_distinct == len(counts)
        assert r.entropy_nanos == want
        # each of k per-value terms may round up by <= 0.5 nano
        assert 0 <= r.entropy_nanos <= math.log(len(counts)) * 1e9 + len(counts)


def test_rrf_matches_pandas(spark):
    """Fused top-5 per brand equals the direct recomputation, and the
    plan cuts via WindowGroupLimit."""
    rows = _df("rrf_fusion", spark).collect()
    parts = (
        table(spark, SF_DIR, "part")
        .select("p_brand", "p_partkey", "p_retailprice", "p_size")
        .toPandas()
    )
    by_brand: dict = {}
    for brand, g in parts.groupby("p_brand"):
        r1 = {
            k: i + 1
            for i, k in enumerate(
                g.sort_values(
                    ["p_retailprice", "p_partkey"], ascending=[False, True]
                ).p_partkey
            )
        }
        r2 = {
            k: i + 1
            for i, k in enumerate(
                g.sort_values(["p_size", "p_partkey"], ascending=[False, True]).p_partkey
            )
        }
        fused = sorted(
            (
                (-(round(1e9 / (60 + r1[k])) + round(1e9 / (60 + r2[k]))), k)
                for k in r1
            ),
        )[:5]
        by_brand[brand] = {
            k: (r1[k], r2[k], -s, i + 1) for i, (s, k) in enumerate(fused)
        }
    assert len(rows) == sum(len(v) for v in by_brand.values())
    for r in rows:
        w1, w2, ws, wrank = by_brand[r.p_brand][r.p_partkey]
        assert (r.r1, r.r2, r.rrf_nanos, r.rank_fused) == (w1, w2, ws, wrank)
    assert has_node(_df("rrf_fusion", spark), "WindowGroupLimit")


def test_cluster_histogram_partitions_corpus(spark):
    """Histogram buckets partition the corpus and agree with
    dedup_exact's per-cluster copy counts."""
    hist = _df("dedup_cluster_histogram", spark).collect()
    total = table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in hist) == total
    copies: dict = {}
    for r in _df("dedup_exact", spark).collect():
        copies[r.n_copies] = copies.get(r.n_copies, 0) + 1
    assert {r.cluster_size: r.n_clusters for r in hist} == copies
    for r in hist:
        assert r.n_docs == r.cluster_size * r.n_clusters


def test_batch3_no_unpartitioned_data_windows(spark):
    for key in (
        "mad_robust",
        "entropy_profile",
        "rrf_fusion",
        "dedup_cluster_histogram",
        "ngram_novelty",
        "scan_schema_evolution",
    ):
        assert unpartitioned_unbounded_windows(_df(key, spark)) == [], key


def test_association_rules_match_pandas(spark):
    """Top-20 rules equal the direct pandas support/confidence/lift
    computation, and the cut is a TakeOrdered, not a global sort."""
    import itertools

    li = (
        table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    n_orders = len(baskets)
    c_item: dict = {}
    c_pair: dict = {}
    for ps in baskets.values():
        for p in ps:
            c_item[p] = c_item.get(p, 0) + 1
        for a, b in itertools.combinations(sorted(ps), 2):
            c_pair[(a, b)] = c_pair.get((a, b), 0) + 1
    rules = []
    for (a, b), cab in c_pair.items():
        if cab < 2:
            continue
        for ante, cons in ((a, b), (b, a)):
            lift = round(cab * n_orders * 1e9 / (c_item[ante] * c_item[cons]))
            conf = round(cab * 1e9 / c_item[ante])
            rules.append((-lift, ante, cons, cab, conf))
    rules.sort()
    want = rules[:20]
    got = _df("association_rules", spark).collect()
    assert len(got) == len(want)
    for r, (nlift, ante, cons, cab, conf) in zip(got, want):
        assert (r.antecedent, r.consequent) == (ante, cons)
        assert (r.c_ab, r.confidence_nanos, r.lift_nanos) == (cab, conf, -nlift)
        assert (r.c_ante, r.c_cons) == (c_item[ante], c_item[cons])
    from blockchain2graphdb_spark.plans.inspect import plan_string

    assert "TakeOrderedAndProject" in plan_string(_df("association_rules", spark))


def test_percentile_summary_matches_numpy(spark):
    """Each nearest-rank cut equals the sorted-array selection."""
    r = _df("percentile_summary", spark).collect()[0]
    prices = [
        row.o_totalprice
        for row in table(spark, SF_DIR, "orders").select("o_totalprice").collect()
    ]
    cents = np.sort(np.round(np.array(prices) * 100).astype(np.int64))
    n = len(cents)
    assert r.n == n
    for p in (10, 25, 50, 75, 90, 99):
        k = (p * n + 99) // 100
        assert getattr(r, f"p{p}_cents") == int(cents[k - 1]), p
    # monotone
    cuts = [getattr(r, f"p{p}_cents") for p in (10, 25, 50, 75, 90, 99)]
    assert cuts == sorted(cuts)


def test_weighted_sample_matches_python_and_is_take_ordered(spark):
    """E-S keys equal the direct log-domain computation; the sample is
    the true top-100; heavier rows are over-represented vs uniform."""
    import hashlib
    import math

    orders = (
        table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    keys = []
    for r in orders:
        h = int(hashlib.md5(f"ws{r.o_orderkey}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967296.0
        keys.append(
            (-round(math.log(u) / r.o_totalprice * 1e9), r.o_orderkey, r.o_totalprice)
        )
    keys.sort()
    want = keys[:100]
    got = _df("weighted_sample_topk", spark).collect()
    assert len(got) == 100
    for g, (nk, k, w) in zip(got, want):
        assert (g.o_orderkey, g.es_nanos) == (k, -nk)
        assert g.weight == w
    # weight-proportional: the sampled mean weight exceeds the corpus mean
    corpus_mean = sum(r.o_totalprice for r in orders) / len(orders)
    sample_mean = sum(g.weight for g in got) / len(got)
    assert sample_mean > corpus_mean
    from blockchain2graphdb_spark.plans.inspect import plan_string

    assert "TakeOrderedAndProject" in plan_string(_df("weighted_sample_topk", spark))


def test_dq_expectations_clean_fixture(spark):
    """The fixture satisfies every expectation; n_checked matches the
    table sizes; the rule set is complete and ordered."""
    rows = sorted(_df("dq_expectations", spark).collect(), key=lambda r: r.rule_id)
    assert [r.rule_id for r in rows] == [1, 2, 3, 4, 5]
    n_orders = table(spark, SF_DIR, "orders").count()
    n_li = table(spark, SF_DIR, "lineitem").count()
    for r in rows:
        assert r.n_violations == 0, r.rule
        assert r.n_checked == (n_li if r.rule_id == 4 else n_orders)
