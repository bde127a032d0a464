"""ngram_novelty and scan_schema_evolution tests: full Python
recomputation of the novelty ratios and a structural check that the
evolved read really merges two file generations.
"""

from __future__ import annotations

import hashlib

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.catalog import table
from blockchain2graphdb_spark.operators.relational import _schema_evolution_dir

from conftest import SF_DIR

SPECS = registry.load_all()


def _df(name, spark):
    return SPECS[name].builder(spark, SF_DIR)


def test_ngram_novelty_matches_python(spark):
    """Per-doc novelty equals the direct set computation over word
    3-grams, for every doc in the new slice."""
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    grams = {}
    for r in docs:
        toks = [t for t in r.text.split(" ") if t]
        if len(toks) < 3:
            continue
        gs = {
            hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()
            for i in range(len(toks) - 2)
        }
        grams[r.doc_id] = gs
    ref = set()
    for did, gs in grams.items():
        if did % 4 != 0:
            ref |= gs
    rows = {r.doc_id: r for r in _df("ngram_novelty", spark).collect()}
    want = {did for did in grams if did % 4 == 0}
    assert set(rows) == want
    for did in want:
        gs = grams[did]
        novel = len(gs - ref)
        r = rows[did]
        assert r.n_grams == len(gs)
        assert r.n_novel == novel
        assert r.novelty_micros == round(novel * 1e6 / len(gs))
        assert 0 <= r.novelty_micros <= 1_000_000


def test_schema_evolution_merges_generations(spark):
    """The merged read sees the evolved column, gen-1 rows land in the
    LEGACY bucket, and totals partition the orders table."""
    import os

    d = _schema_evolution_dir(SF_DIR)
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert sorted(files) == ["part-gen1.parquet", "part-gen2.parquet"]
    rows = {r.priority: r for r in _df("scan_schema_evolution", spark).collect()}
    orders = table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).collect()
    n_even = sum(1 for r in orders if r.o_orderkey % 2 == 0)
    assert rows["LEGACY"].n_orders == n_even
    assert sum(r.n_orders for r in rows.values()) == len(orders)
    # every non-legacy bucket is a real priority from gen-2 rows
    prios = {r.o_orderpriority for r in orders if r.o_orderkey % 2 == 1}
    assert set(rows) - {"LEGACY"} == prios


def test_corrupt_quarantine_counts(spark):
    """Quarantine count equals the seeded corruption rate; good rows
    are neither dropped nor healed."""
    rows = {r.status: r for r in _df("scan_corrupt_quarantine", spark).collect()}
    orders = table(spark, SF_DIR, "orders").select("o_orderkey").collect()
    n_bad = sum(1 for r in orders if r.o_orderkey % 97 == 0)
    assert rows["_CORRUPT"].n_rows == n_bad
    assert rows["_CORRUPT"].total is None
    assert sum(r.n_rows for r in rows.values()) == len(orders)
