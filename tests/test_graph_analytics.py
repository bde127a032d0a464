"""PageRank (pregel-based) against an independent NumPy power iteration,
plus BFS sanity on a hand-built graph."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from blockchain2graphdb_spark.operators.graphops import pagerank_ranks


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_pagerank_matches_power_iteration(spark):
    # canonical a<b edge list of a small asymmetric graph
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)]
    got = {
        r["id"]: r["rank"]
        for r in pagerank_ranks(_pairs(spark, edges), n_iter=10).collect()
    }

    # independent reference: same fixed-iteration scheme on the
    # symmetrized adjacency, rank_v = 0.15 + 0.85 * sum_u rank_u/deg_u
    n = 5
    adj = np.zeros((n, n))
    for a, b in edges:
        adj[a, b] = adj[b, a] = 1
    deg = adj.sum(axis=1)
    rank = np.ones(n)
    for _ in range(10):
        rank = 0.15 + 0.85 * (adj.T @ (rank / deg))

    assert set(got) == set(range(n))
    for v in range(n):
        assert abs(got[v] - rank[v]) < 1e-9, (v, got[v], rank[v])
    # degree-2 hub 2 outranks the degree-1 leaf 4
    assert got[2] > got[4]


def test_pagerank_uniform_on_regular_graph(spark):
    # a 4-cycle is 2-regular: every vertex must get the same rank
    edges = [(0, 1), (1, 2), (2, 3), (0, 3)]
    ranks = [r["rank"] for r in pagerank_ranks(_pairs(spark, edges)).collect()]
    assert len(ranks) == 4
    assert max(ranks) - min(ranks) < 1e-12


def test_bfs_distance_levels(spark, sf_dir):
    from blockchain2graphdb_spark import registry

    df = registry.load_all()["bfs_distance"].builder(spark, sf_dir)
    rows = df.collect()
    dists = {r["dist"] for r in rows}
    assert dists <= {0, 1, 2, 3}
    assert 0 in dists  # seeds present
