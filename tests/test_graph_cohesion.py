"""join_salted parity and clustering_coefficient semantics."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.catalog import table

SPECS = registry.load_all()


def test_join_salted_equals_unsalted(spark, sf_dir):
    """The salted composite-key join must be indistinguishable from the
    plain join it accelerates."""
    got = {
        r["s_nationkey"]: (r["n_lines"], r["sum_qty"])
        for r in SPECS["join_salted"].builder(spark, sf_dir).collect()
    }
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    from blockchain2graphdb_spark.exact import money_sum

    want = {
        r["s_nationkey"]: (r["n_lines"], r["sum_qty"])
        for r in li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_lines"), money_sum("l_quantity", "sum_qty"))
        .collect()
    }
    assert got == want and got


def _write_graph(spark, tmp, order_parts, part_ids):
    """order_parts: list of (orderkey, partkey); all parts get p_size=50."""
    spark.createDataFrame(
        [(o, p) for o, p in order_parts], "l_orderkey long, l_partkey long"
    ).write.parquet(os.path.join(tmp, "lineitem.parquet"))
    spark.createDataFrame(
        [(p, 50) for p in part_ids], "p_partkey long, p_size int"
    ).write.parquet(os.path.join(tmp, "part.parquet"))


def test_clustering_coefficient_complete_graph(spark):
    """K4 (one order containing 4 parts): every node has coeff 1.0."""
    from blockchain2graphdb_spark.operators.graphops import clustering_coefficient

    with tempfile.TemporaryDirectory() as tmp:
        _write_graph(spark, tmp, [(1, p) for p in (1, 2, 3, 4)], [1, 2, 3, 4])
        rows = clustering_coefficient(spark, tmp).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["degree"] == 3 and r["n_closed"] == 3 and r["coeff"] == 1.0, r


def test_clustering_coefficient_path_graph(spark):
    """Path 1-2-3 (two 2-part orders): middle node has 2 unconnected
    neighbors -> coeff 0; endpoints have degree 1 -> coeff 0."""
    from blockchain2graphdb_spark.operators.graphops import clustering_coefficient

    with tempfile.TemporaryDirectory() as tmp:
        _write_graph(spark, tmp, [(1, 1), (1, 2), (2, 2), (2, 3)], [1, 2, 3])
        rows = {r["node"]: r for r in clustering_coefficient(spark, tmp).collect()}
    assert rows[2]["degree"] == 2 and rows[2]["n_closed"] == 0 and rows[2]["coeff"] == 0.0
    assert rows[1]["degree"] == 1 and rows[1]["coeff"] == 0.0
    assert rows[3]["degree"] == 1 and rows[3]["coeff"] == 0.0


def test_clustering_coefficient_bounds(spark, sf_dir):
    rows = SPECS["clustering_coefficient"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["coeff"] <= 1.0, r
        assert 0 <= r["n_closed"] <= r["degree"] * (r["degree"] - 1) // 2, r


# ------------------------------------------------------ neighbor_jaccard


def test_neighbor_jaccard_triangle_identity(spark, sf_dir):
    """Cross-operator conservation: a common neighbor of edge (a,b) is
    exactly a triangle through that edge, and each triangle has 3 edges,
    so sum(n_common) over all canonical edges = 3 x triangle_count."""
    rows = SPECS["neighbor_jaccard"].builder(spark, sf_dir).collect()
    n_tri = SPECS["triangle_count"].builder(spark, sf_dir).collect()[0]["n_triangles"]
    assert sum(r["n_common"] for r in rows) == 3 * n_tri
    for r in rows:
        # endpoints are neighbors of each other but never common, so
        # union >= 2 and jaccard stays in (0, 1); 1.0 needs identical
        # closed neighborhoods, possible only with n_union == n_common
        assert r["n_common"] >= 0 and r["n_union"] >= 2, r
        assert 0.0 <= r["jaccard"] < 1.0 or r["n_common"] == r["n_union"], r


def test_neighbor_jaccard_small_graphs(spark):
    """K3: each edge's endpoints share exactly the third node; path
    1-2-3: the end edges share nothing."""
    from blockchain2graphdb_spark.operators.graphops import neighbor_jaccard

    with tempfile.TemporaryDirectory() as tmp:
        _write_graph(spark, tmp, [(1, p) for p in (1, 2, 3)], [1, 2, 3])
        rows = {(r["a"], r["b"]): r for r in neighbor_jaccard(spark, tmp).collect()}
    assert set(rows) == {(1, 2), (1, 3), (2, 3)}
    for r in rows.values():
        # N(1)={2,3}, N(2)={1,3}: common {3}, union {1,2,3}
        assert r["n_common"] == 1 and r["n_union"] == 3
        assert r["jaccard"] == 0.333333

    with tempfile.TemporaryDirectory() as tmp:
        _write_graph(spark, tmp, [(1, 1), (1, 2), (2, 2), (2, 3)], [1, 2, 3])
        rows = {(r["a"], r["b"]): r for r in neighbor_jaccard(spark, tmp).collect()}
    assert set(rows) == {(1, 2), (2, 3)}
    for r in rows.values():
        assert r["n_common"] == 0 and r["jaccard"] == 0.0


# ------------------------------------------------------------ k-core


def _python_kcore(edges, k):
    """Reference peel: edges = set of canonical (a,b); returns
    {node: degree in the k-core}."""
    from collections import defaultdict

    cur = set(edges)
    while True:
        deg = defaultdict(int)
        for a, b in cur:
            deg[a] += 1
            deg[b] += 1
        weak = {n for n, d in deg.items() if d < k}
        if not weak:
            return dict(deg)
        cur = {(a, b) for a, b in cur if a not in weak and b not in weak}


def test_kcore_matches_python_peel(spark, sf_dir):
    """Exact parity with an independent pure-Python peel on the same
    co-purchase edge list — both the dense support-1 graph at k=3 and
    the registered support-2 / k=2 configuration."""
    from blockchain2graphdb_spark.operators.graphops import (
        _KCORE_K,
        _KCORE_MIN_SUPPORT,
        _copurchase_pairs,
        _copurchase_pairs_support,
        kcore,
        kcore_membership,
    )

    pairs, _ = _copurchase_pairs(spark, sf_dir, checkpoint=False)
    edges = {(r["a"], r["b"]) for r in pairs.collect()}
    want = _python_kcore(edges, 3)
    got = {
        r["node"]: r["core_degree"]
        for r in kcore(spark, sf_dir, k=3).collect()
    }
    assert got == want and got

    sp_pairs, _ = _copurchase_pairs_support(spark, sf_dir, _KCORE_MIN_SUPPORT)
    sp_edges = {(r["a"], r["b"]) for r in sp_pairs.collect()}
    want2 = _python_kcore(sp_edges, _KCORE_K)
    got2 = {
        r["node"]: r["core_degree"]
        for r in kcore_membership(spark, sf_dir).collect()
    }
    assert got2 == want2 and got2


def test_kcore_small_graphs(spark):
    """K4 survives a 3-core intact; a path has an empty 2-core; a
    triangle with a pendant keeps only the triangle in its 2-core."""
    from blockchain2graphdb_spark.operators.graphops import kcore

    with tempfile.TemporaryDirectory() as tmp:
        _write_graph(spark, tmp, [(1, p) for p in (1, 2, 3, 4)], [1, 2, 3, 4])
        rows = {r["node"]: r["core_degree"] for r in kcore(spark, tmp).collect()}
    assert rows == {1: 3, 2: 3, 3: 3, 4: 3}

    with tempfile.TemporaryDirectory() as tmp:
        # triangle 1-2-3 plus pendant 4 on node 3 (orders: one 3-part, one 2-part)
        _write_graph(spark, tmp, [(1, 1), (1, 2), (1, 3), (2, 3), (2, 4)], [1, 2, 3, 4])
        rows = {r["node"]: r["core_degree"] for r in kcore(spark, tmp, k=2).collect()}
    assert rows == {1: 2, 2: 2, 3: 2}
