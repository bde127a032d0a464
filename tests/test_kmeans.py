"""Lloyd's k-means (operators/ann_ivf.kmeans_fit) against an independent
NumPy reference: same deterministic init, same quantized arithmetic →
identical assignments and centroids."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from blockchain2graphdb_spark.catalog import table
from blockchain2graphdb_spark.functions.vectors import quantize
from blockchain2graphdb_spark.operators.ann_ivf import kmeans_fit

K, ITERS = 8, 3


def _numpy_kmeans(X: np.ndarray, ids: np.ndarray, k: int, n_iter: int):
    order = np.argsort(ids)
    X, ids = X[order], ids[order]
    cents = X[:k].astype(np.float64)
    for _ in range(n_iter):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes the first (lowest cell) on ties
        cents = np.stack(
            [
                X[assign == c].mean(axis=0) if (assign == c).any() else cents[c]
                for c in range(k)
            ]
        )
    return ids, assign, cents


def test_kmeans_matches_numpy(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    pts = emb.select("vec_id", quantize("embedding").alias("q"))
    assign, cents = kmeans_fit(pts, k=K, n_iter=ITERS)

    pdf = pts.orderBy("vec_id").toPandas()
    ids = pdf["vec_id"].to_numpy()
    X = np.array([np.array(q, dtype=np.float64) for q in pdf["q"]])
    nids, nassign, ncents = _numpy_kmeans(X, ids, K, ITERS)
    # spark cells are the init vectors' vec_ids (the k lowest)
    cell_of = dict(zip(range(K), sorted(ids)[:K]))

    got = {r["vec_id"]: r["cell"] for r in assign.collect()}
    exp = {int(i): cell_of[int(a)] for i, a in zip(nids, nassign)}
    assert got == exp

    got_c = {
        r["cell"]: np.array(r["c"]) for r in cents.collect()
    }
    for c in range(K):
        cell = cell_of[c]
        if cell in got_c:
            assert np.array_equal(got_c[cell], ncents[c]), cell


def test_kmeans_query_stable(spark, sf_dir):
    from blockchain2graphdb_spark import registry

    q = registry.load_all()["kmeans_embeddings"].builder
    a = [tuple(r) for r in q(spark, sf_dir).collect()]
    b = [tuple(r) for r in q(spark, sf_dir).collect()]
    assert a == b
    assert sum(r[1] for r in a) == 500  # every vector assigned exactly once


def test_kmeans_keeps_empty_cluster_centroids(spark):
    """A cluster that loses all members must keep its previous centroid
    (the Lloyd's convention): two far-apart heavy groups plus two init
    points inside one of them — at least one init cell empties, yet the
    codebook stays at k entries."""
    import pyspark.sql.functions as F

    rows = []
    # ids 0..3 are the init centroids: 0,1 near origin; 2,3 at 1000
    for i, base in [(0, 0), (1, 1), (2, 1000), (3, 1001)]:
        rows.append((i, [base, base]))
    # heavy mass at 500 pulls everything to whichever centroid wins;
    # cells for the losing duplicates empty out
    for i in range(4, 40):
        rows.append((i, [500 + (i % 3), 500 - (i % 3)]))
    pts = spark.createDataFrame(rows, "vec_id long, q array<long>")
    assign, cents = kmeans_fit(pts, k=4, n_iter=3)
    assert cents.count() == 4  # no vanished cells
    used = {r["cell"] for r in assign.select("cell").distinct().collect()}
    assert used <= {0, 1, 2, 3}
    # every point assigned exactly once
    assert assign.count() == 40


def test_kmeans_exact_python_parity(spark, sf_dir):
    """Integer-Lloyd replayed in pure Python reproduces kmeans_exact's
    assignments bit-for-bit (the cross-engine determinism claim checked
    against a third implementation)."""
    from blockchain2graphdb_spark.catalog import table
    from blockchain2graphdb_spark.operators.ann_ivf import (
        _KMX_K,
        _KMX_ROUNDS,
        kmeans_exact,
    )

    import math

    def half_up(v):
        # Spark/DuckDB round() is HALF_UP (away from zero); Python's
        # built-in round is banker's
        return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))

    emb = {
        r["vec_id"]: [half_up(float(x) * 1000) for x in r["embedding"]]
        for r in table(spark, sf_dir, "embeddings").collect()
    }
    cents = {cid: emb[cid][:] for cid in range(_KMX_K)}

    def assign():
        out = {}
        for vid, qv in emb.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(qv, cv)), cid)
                for cid, cv in cents.items()
            )
            out[vid] = best[1]
        return out

    for _ in range(_KMX_ROUNDS):
        a = assign()
        members = {}
        for vid, cid in a.items():
            members.setdefault(cid, []).append(emb[vid])
        def tdiv(s, n):
            # Spark `div` and DuckDB `//` truncate toward zero;
            # Python `//` floors — they differ on negative sums
            return -((-s) // n) if s < 0 else s // n

        for cid, vs in members.items():
            n = len(vs)
            cents[cid] = [tdiv(sum(col), n) for col in zip(*vs)]
    want = assign()
    got = {r["vec_id"]: r["cluster"] for r in kmeans_exact(spark, sf_dir).collect()}
    assert got == want and len(set(got.values())) > 1
