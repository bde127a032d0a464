"""Exact sf1 witnesses for the five keys the r15 differential sweep
excluded (VERDICT r15 #2) — parity pins instead of quadratic oracles.

The r15 sf1 sweep left five keys without an exact-value witness at the
synthesized decade, all because their DuckDB oracles are infeasible
there (recursive-CTE components over corpus-scale graphs, all-pairs
kNN), not because of any Spark limit. Each gets the cheapest exact
check that does not trust the code under test:

* wallet_components  — pure-Python union-find over the same
  star-contraction edges (the sf0.1 parity test, run at sf1).
* bfs_distance       — pure-Python frontier BFS over the bipartite
  part-order incidence (no projected edge list, same as the plan).
* record_linkage     — pure-Python replay: 17-char-prefix blocking,
  Levenshtein<=1 verify (two-pointer distance<=1 check), union-find
  clustering, min-custkey entity ids, partition sizes.
* dedup_cluster_keep_best — Python components + packed-max keeper
  selection over the VERIFIED PAIRS Spark produces
  (dedup_minhash_exact is itself differentially sf1-green, so the
  pair set carries its own witness; what this adds is the
  components + keeper stage at sf1).
* label_noise_knn    — since its r16 re-registration on LSH-bucketed
  candidates the full DuckDB differential IS feasible at sf1; run via
  tools/verify_local.py (this script just records that fact).

Usage:
    python3 tools/sf1_witness.py             # all five
    python3 tools/sf1_witness.py KEY [...]   # subset

Prints one PASS/FAIL line per key and a trailing JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF1 = os.path.join(REPO, ".tmp", "testdata", "sf1")


class UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        r = x
        while p[r] != r:
            r = p[r]
        while p[x] != r:
            p[x], x = r, p[x]
        return r

    def union(self, a: int, b: int) -> None:
        p = self.parent
        p.setdefault(a, a)
        p.setdefault(b, b)
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            p[hi] = lo

    def labels(self) -> dict[int, int]:
        return {n: self.find(n) for n in self.parent}


def _lineitem_pairs():
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{SF1}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return t.column("l_orderkey").to_numpy(), t.column("l_partkey").to_numpy()


def witness_wallet_components(spark) -> tuple[bool, str]:
    from blockchain2graphdb_spark import registry

    out = registry.load_all()["wallet_components"].builder(spark, SF1).toPandas()
    o, p = _lineitem_pairs()
    # star contraction: every part in an order links to the order's min part
    order_min: dict[int, int] = {}
    for ok, pk in zip(o.tolist(), p.tolist()):
        cur = order_min.get(ok)
        if cur is None or pk < cur:
            order_min[ok] = pk
    uf = UnionFind()
    for ok, pk in zip(o.tolist(), p.tolist()):
        src = order_min[ok]
        if src != pk:
            uf.union(src, pk)
        else:
            uf.parent.setdefault(pk, pk)
    expect = uf.labels()
    got = dict(zip(out.part.astype(int), out.component.astype(int)))
    return got == expect, f"{len(got)} nodes, {len(set(expect.values()))} components"


def witness_bfs_distance(spark) -> tuple[bool, str]:
    import pyarrow.parquet as pq

    from blockchain2graphdb_spark import registry

    out = registry.load_all()["bfs_distance"].builder(spark, SF1).toPandas()
    o, p = _lineitem_pairs()
    part_orders: dict[int, list[int]] = defaultdict(list)
    order_parts: dict[int, list[int]] = defaultdict(list)
    for ok, pk in zip(o.tolist(), p.tolist()):
        part_orders[pk].append(ok)
        order_parts[ok].append(pk)
    pt = pq.read_table(f"{SF1}/part.parquet", columns=["p_partkey", "p_size"])
    seeds = {
        k
        for k, s in zip(
            pt.column("p_partkey").to_pylist(), pt.column("p_size").to_pylist()
        )
        if s == 50
    }
    expect: dict[int, int] = {s: 0 for s in seeds}
    frontier = set(seeds)
    seen = set(seeds)
    for h in (1, 2, 3):
        orders = {ok for pk in frontier for ok in part_orders.get(pk, ())}
        nxt = {pk for ok in orders for pk in order_parts[ok]} - seen
        for pk in nxt:
            expect[pk] = h
        seen |= nxt
        frontier = nxt
    got = dict(zip(out.node.astype(int), out.dist.astype(int)))
    return got == expect, f"{len(got)} nodes reached within 3 hops"


def _within1(s: str, t: str) -> bool:
    """Levenshtein distance <= 1, two-pointer (no DP)."""
    if s == t:
        return True
    ls, lt = len(s), len(t)
    if ls == lt:
        return sum(a != b for a, b in zip(s, t)) <= 1
    if abs(ls - lt) > 1:
        return False
    if ls > lt:
        s, t, ls, lt = t, s, lt, ls
    i = 0
    while i < ls and s[i] == t[i]:
        i += 1
    return s[i:] == t[i + 1 :]


def witness_record_linkage(spark) -> tuple[bool, str]:
    import pyarrow.parquet as pq

    from blockchain2graphdb_spark import registry

    out = registry.load_all()["record_linkage"].builder(spark, SF1).toPandas()
    ct = pq.read_table(f"{SF1}/customer.parquet", columns=["c_custkey", "c_name"])
    keys = ct.column("c_custkey").to_pylist()
    names = ct.column("c_name").to_pylist()
    blocks: dict[str, list[int]] = defaultdict(list)
    name_of = dict(zip(keys, names))
    for k, n in zip(keys, names):
        blocks[n[:17]].append(k)
    uf = UnionFind()
    n_pairs = 0
    for members in blocks.values():
        members.sort()
        for i, a in enumerate(members):
            na = name_of[a]
            for b in members[i + 1 :]:
                if _within1(na, name_of[b]):
                    n_pairs += 1
                    uf.union(a, b)
    labels = uf.labels()
    entity = {k: labels.get(k, k) for k in keys}
    sizes = defaultdict(int)
    for e in entity.values():
        sizes[e] += 1
    expect = {k: (entity[k], sizes[entity[k]]) for k in keys}
    got = {
        int(r.c_custkey): (int(r.entity_id), int(r.entity_size))
        for r in out.itertuples()
    }
    return got == expect, f"{len(keys)} records, {n_pairs} verified pairs"


def witness_dedup_cluster_keep_best(spark) -> tuple[bool, str]:
    import pyarrow.parquet as pq

    from blockchain2graphdb_spark import registry
    from blockchain2graphdb_spark.operators.dedup import (
        _DCKB_PACK,
        dedup_minhash_exact,
    )

    out = (
        registry.load_all()["dedup_cluster_keep_best"].builder(spark, SF1).toPandas()
    )
    # verified pairs from the differentially sf1-green upstream key
    pairs = dedup_minhash_exact(spark, SF1).select("doc_a", "doc_b").toPandas()
    uf = UnionFind()
    for a, b in zip(pairs.doc_a.astype(int), pairs.doc_b.astype(int)):
        uf.union(int(a), int(b))
    labels = uf.labels()
    dt = pq.read_table(f"{SF1}/documents.parquet", columns=["doc_id", "text"])
    docs = {
        int(k): t
        for k, t in zip(dt.column("doc_id").to_pylist(), dt.column("text").to_pylist())
        if k < 200
    }
    corpus: dict[int, int] = {}  # doc_id -> n_chars over base + twins
    for k, t in docs.items():
        corpus[k] = len(t)
        corpus[k + 1_000_000] = len(t[: int(len(t) * 0.9)])
    clusters: dict[int, list[int]] = defaultdict(list)
    for k in corpus:
        clusters[labels.get(k, k)].append(k)
    expect = {}
    for cid, members in clusters.items():
        packed = max(
            n * _DCKB_PACK + (_DCKB_PACK - 1 - d)
            for d, n in ((m, corpus[m]) for m in members)
        )
        expect[cid] = (
            len(members),
            _DCKB_PACK - 1 - packed % _DCKB_PACK,
            packed // _DCKB_PACK,
        )
    got = {
        int(r.cluster_id): (
            int(r.cluster_size),
            int(r.keeper_doc_id),
            int(r.keeper_len),
        )
        for r in out.itertuples()
    }
    return got == expect, f"{len(got)} clusters over {len(corpus)} docs"


WITNESSES = {
    "wallet_components": witness_wallet_components,
    "bfs_distance": witness_bfs_distance,
    "record_linkage": witness_record_linkage,
    "dedup_cluster_keep_best": witness_dedup_cluster_keep_best,
}


def main() -> None:
    from blockchain2graphdb_spark.session import get_spark

    keys = sys.argv[1:] or list(WITNESSES)
    unknown = [k for k in keys if k not in WITNESSES]
    if unknown:
        print(
            f"unknown keys {unknown} (label_noise_knn runs via verify_local"
            " — its oracle is sf1-feasible since r16)"
        )
        sys.exit(2)
    spark = get_spark("sf1_witness")
    results = {}
    for k in keys:
        t0 = time.time()
        ok, detail = WITNESSES[k](spark)
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {k}: {detail} ({dt:.1f}s)")
        results[k] = {"pass": ok, "detail": detail, "sec": round(dt, 1)}
    all_ok = all(r["pass"] for r in results.values())
    print(json.dumps({"pass": all_ok, "keys": results}))
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
