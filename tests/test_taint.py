"""Taint-flow propagation (chain/taint.py): exact parity with a pure-
Python replay of the same hop-bounded proportional-haircut update, plus
the seed-floor and range invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blockchain2graphdb_spark.chain import fixtures
from blockchain2graphdb_spark.chain.taint import spend_edges, taint_flow

N_ITER = 16


@pytest.fixture(scope="module")
def chain():
    return fixtures.generate(n_blocks=20, seed=7)


@pytest.fixture(scope="module")
def tables(chain, spark):
    return chain.to_spark(spark)


@pytest.fixture(scope="module")
def seed_addr(chain):
    genesis_hash = min(chain.blocks, key=lambda b: b[2])[0]
    cb = next(t[0] for t in chain.transactions if t[4] and t[1] == genesis_hash)
    return next(o[4] for o in chain.outputs if o[0] == cb)


def _python_replay(chain, seed_addr, n_iter):
    """Mirror of the Pregel update: messages along spend edges, summed
    per destination, max with the seed floor, early stop at fixpoint."""
    seed_floor = {oid: (1.0 if addr == seed_addr else 0.0)
                  for _tx, _oi, oid, _v, addr in chain.outputs}
    value = {oid: v for _tx, _oi, oid, v, _a in chain.outputs}
    ins_by_tx: dict[str, list[str]] = {}
    for sp, oid in chain.inputs:
        ins_by_tx.setdefault(sp, []).append(oid)
    outs_by_tx: dict[str, list[str]] = {}
    for tx, _oi, oid, _v, _a in chain.outputs:
        outs_by_tx.setdefault(tx, []).append(oid)
    edges = []
    for tx, srcs in ins_by_tx.items():
        total = sum(value[s] for s in srcs)
        for s in srcs:
            for d in outs_by_tx.get(tx, []):
                edges.append((s, d, value[s] / total))
    taint = dict(seed_floor)
    for _ in range(n_iter):
        msgs: dict[str, float] = {}
        for s, d, w in edges:
            msgs[d] = msgs.get(d, 0.0) + taint[s] * w
        new = dict(taint)
        for d, m in msgs.items():
            new[d] = max(seed_floor[d], m)
        if new == taint:
            break
        taint = new
    return taint


@pytest.mark.parametrize("threshold", [100_000, 0])  # driver path / Pregel path
def test_taint_matches_python_replay(spark, tables, chain, seed_addr, threshold):
    seeds = spark.createDataFrame([(seed_addr,)], "address string")
    got = {
        r["output_id"]: r["taint"]
        for r in taint_flow(
            tables, seeds, n_iter=N_ITER, driver_threshold=threshold
        ).collect()
    }
    exp = _python_replay(chain, seed_addr, N_ITER)
    assert set(got) == set(exp)
    for oid in exp:
        assert abs(got[oid] - exp[oid]) < 1e-9, (oid, got[oid], exp[oid])
    # the chain actually propagates: some non-seed output is tainted
    tainted_downstream = [
        oid for oid, t in exp.items() if t > 0
        and next(a for tx, _oi, o, _v, a in chain.outputs if o == oid) != seed_addr
    ]
    assert tainted_downstream, "fixture produced no downstream taint"


def test_taint_seed_floor_and_range(spark, tables, seed_addr, chain):
    seeds = spark.createDataFrame([(seed_addr,)], "address string")
    out = taint_flow(tables, seeds, n_iter=N_ITER)
    bad = out.where((F.col("taint") < 0) | (F.col("taint") > 1 + 1e-9)).count()
    assert bad == 0
    floors = out.where(F.col("address") == seed_addr).select("taint").collect()
    assert floors and all(r["taint"] == 1.0 for r in floors)


def test_spend_edge_weights_sum_to_one_per_tx(spark, tables):
    """Proportional haircut invariant: incoming weights per created
    output sum to 1 (every spending tx fully distributes its input)."""
    e = spend_edges(tables)
    sums = e.groupBy("dst").agg(F.sum("w").alias("s")).collect()
    assert sums and all(abs(r["s"] - 1.0) < 1e-9 for r in sums)
