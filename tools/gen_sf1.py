"""Synthesize a deterministic sf1.0 fixture from sf0.1 (VERDICT r14 #1).

The driver-generated fixtures stop at sf0.1 (~600k lineitem rows), so
every scaling-slope claim rests on decades where fixed per-round
overhead dominates. This derives one more decade: a 10x replica of
sf0.1 with KEY-REMAPPED replication — replica i (0..9) adds
`i * stride` to every column in a key DOMAIN, where each domain's
stride equals the DOMAIN SIZE (keys stay DENSE 0..10N-1, preserving
the driver generator's dense-from-0 contract that operators like
subtree_rollup document and rely on), so replicas are disjoint,
`key // stride` reads back the replica id, and every foreign key
lands on the matching replica's parent (FK closure is inherited from
sf0.1 closure, replica by replica). No randomness anywhere: the
output is a pure function of the input fixture.

What this scaling DOES preserve (by construction, replica-wise):
  - every per-key-group distribution (lines per order, orders per
    customer, events per user, parts per supplier) — each replica is
    an exact copy under renamed keys;
  - all value/date/text/embedding distributions (copied verbatim);
  - `region`/`nation` stay FIXED (not replicated) and un-remapped,
    exactly how TPC-H itself scales — each replica's customers and
    suppliers reference the same 25 nations, so nation/region join
    fan-in grows 10x (realistic: dimension tables don't grow with
    facts).

Skew it DOES add (documented per VERDICT r14 #1; both engines of the
differential harness see the same data, so none of this affects the
oracle gate):
  - text of `documents` is copied verbatim, so every sf0.1 document
    has exactly 10 byte-identical copies at sf1: the exact-dup rate is
    10x by construction and near-dup clusters become 10-cliques —
    dedup keys at the sf0.1→sf1 step measure the dup-heavy regime
    (in-cluster candidate pairs grow ~quadratically), which is a
    property of this data, not of the plans;
  - `embeddings` vectors are copied verbatim: every point has 10
    exact geometric duplicates, so distance ties are systematic and
    only id-tie-broken top-k is deterministic (the repo convention
    already requires that);
  - names (c_name/s_name/p_name) repeat across replicas under
    different keys — key-grain queries are unaffected, name-grain
    cardinalities grow only 1x.

Output: /root/repo/.tmp/testdata/sf1/*.parquet (gitignored — ~170 MB
of derived data; regenerate with this script, never commit).

Usage:
    python3 tools/gen_sf1.py            # write + verify FK closure
    python3 tools/gen_sf1.py --check    # verify an existing output only
    python3 tools/gen_sf1.py --sf 3     # sf3 = 30 replicas -> .tmp/testdata/sf3
                                        # (VERDICT r15 #3: a second
                                        # post-AQE-transition point)
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
# Defaults build sf1 (10 replicas of sf0.1); --sf N scales both the
# replica count (10*N) and the output dir (.tmp/testdata/sfN). Module
# globals so check() sees the same configuration as generate().
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".tmp", "testdata", "sf1",
)
REPLICAS = 10

# key domain -> (stride, [(table, column), ...]); strides equal the
# DOMAIN SIZE (sf0.1 keys are dense 0..N-1, asserted below), so sf1
# keys are dense 0..10N-1 — matching the driver generator's
# dense-from-0 property, which several operators state as a CONTRACT
# (subtree_rollup's path-enumeration == edge-recursion equivalence
# holds exactly when every arithmetic ancestor exists; the first,
# power-of-10-stride build of this fixture broke that density and the
# differential gate caught it). `key // stride` is still the replica
# id.
DOMAINS: dict[str, tuple[int, list[tuple[str, str]]]] = {
    "custkey": (15_000, [("customer", "c_custkey"), ("orders", "o_custkey")]),
    "orderkey": (150_000, [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]),
    "partkey": (20_000, [("part", "p_partkey"), ("lineitem", "l_partkey")]),
    "suppkey": (1_000, [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")]),
    "event_id": (100_000, [("events", "event_id")]),
    "user_id": (1_500, [("events", "user_id")]),
    "doc_id": (5_000, [("documents", "doc_id")]),
    "vec_id": (2_000, [("embeddings", "vec_id")]),
}

REPLICATED = [
    "customer", "orders", "lineitem", "part", "supplier",
    "events", "documents", "embeddings",
]
FIXED = ["region", "nation"]  # dimension tables do not grow with facts

# FK edges verified after generation: (child, fk, parent, pk)
FK_EDGES = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _table_domains(name: str) -> list[tuple[str, int]]:
    """[(column, stride)] for the key columns of one table."""
    out = []
    for stride, cols in DOMAINS.values():
        for tbl, col in cols:
            if tbl == name:
                out.append((col, stride))
    return out


# --perturb mode (VERDICT r15 #5): the verbatim-copy build gives every
# document 10 byte-identical replicas, so dedup keys' sf0.1->sf1 step
# measures the fixture's dup-clique regime, not the plans. The
# perturbed build keeps the dup RATE scale-invariant while preserving
# every within-replica similarity relationship EXACTLY:
#   - documents: replica i>0 suffixes every whitespace token with
#     "r<i>" — every shingle/word changes, so cross-replica Jaccard is
#     0, while within a replica doc A ~ doc B exactly as in sf0.1 (the
#     same transformation is applied to both sides);
#   - embeddings: replica i>0 multiplies elementwise by a deterministic
#     +/-1 sign pattern s_i (md5-derived per (replica, dim)). Since
#     s_d^2 = 1, every within-replica dot product <s∘x, s∘y> = <x, y>
#     is preserved bit-exactly; cross-replica cosines scramble to
#     ~N(0, 1/sqrt(64)) — far below every dup threshold.
PERTURB = False


def _sign_pattern(i: int, dim: int) -> list[int]:
    import hashlib

    return [
        1 if int(hashlib.md5(f"pert:{i}:{d}".encode()).hexdigest()[0], 16) < 8 else -1
        for d in range(dim)
    ]


def _perturb_replica(name: str, t: pa.Table, i: int) -> pa.Table:
    if not PERTURB or i == 0:
        return t
    if name == "documents":
        idx = t.schema.get_field_index("text")
        texts = t.column("text").to_pylist()
        tag = f"r{i}"
        new = [
            " ".join(w + tag for w in x.split(" ")) if x is not None else None
            for x in texts
        ]
        return t.set_column(idx, t.schema.field(idx), pa.array(new, t.schema.field(idx).type))
    if name == "embeddings":
        idx = t.schema.get_field_index("embedding")
        embs = t.column("embedding").to_pylist()
        dim = len(embs[0])
        s = _sign_pattern(i, dim)
        new = [
            [v * f for v, f in zip(e, s)] if e is not None else None for e in embs
        ]
        return t.set_column(idx, t.schema.field(idx), pa.array(new, t.schema.field(idx).type))
    return t


def generate() -> None:
    os.makedirs(DST, exist_ok=True)
    for name in FIXED:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(src, f"{DST}/{name}.parquet")
        print(f"{name}: copied fixed ({src.num_rows} rows)")
    for name in REPLICATED:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        keyed = _table_domains(name)
        for col, stride in keyed:
            mx = pc.max(src[col]).as_py()
            assert mx < stride, f"{name}.{col} max {mx} >= stride {stride}"
            mn = pc.min(src[col]).as_py()
            assert mn >= 0, f"{name}.{col} min {mn} < 0"
        replicas = [src]
        for i in range(1, REPLICAS):
            t = src
            for col, stride in keyed:
                idx = t.schema.get_field_index(col)
                shifted = pc.add(
                    pc.cast(t[col], pa.int64()), pa.scalar(i * stride, pa.int64())
                )
                shifted = pc.cast(shifted, t.schema.field(idx).type)
                t = t.set_column(idx, t.schema.field(idx), shifted)
            replicas.append(_perturb_replica(name, t, i))
        out = pa.concat_tables(replicas)
        # multiple row groups => multiple Spark input splits (mappers),
        # so AQE skew-split and parallel scans behave like real inputs
        pq.write_table(out, f"{DST}/{name}.parquet", row_group_size=512 * 1024)
        print(f"{name}: {src.num_rows} -> {out.num_rows} rows")


def check() -> None:
    import duckdb

    con = duckdb.connect()
    for name in FIXED + REPLICATED:
        p = f"{DST}/{name}.parquet"
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
        )
        src_n = pq.read_metadata(f"{SRC}/{name}.parquet").num_rows
        got_n = con.execute(f"SELECT COUNT(*) FROM {name}").fetchone()[0]
        want = src_n * (REPLICAS if name in REPLICATED else 1)
        assert got_n == want, f"{name}: {got_n} != {want}"
    # FK closure: every child key must hit a parent key
    for child, fk, parent, pk in FK_EDGES:
        n = con.execute(
            f"SELECT COUNT(*) FROM {child} c LEFT JOIN {parent} p"
            f" ON c.{fk} = p.{pk} WHERE p.{pk} IS NULL"
        ).fetchone()[0]
        assert n == 0, f"FK {child}.{fk} -> {parent}.{pk}: {n} orphans"
        print(f"FK {child}.{fk} -> {parent}.{pk}: closed")
    # primary keys stay unique AND DENSE after remapping (dense-from-0
    # is an operator contract — see DOMAINS comment)
    for name, _, _, pk in [
        ("customer", 0, 0, "c_custkey"), ("orders", 0, 0, "o_orderkey"),
        ("part", 0, 0, "p_partkey"), ("supplier", 0, 0, "s_suppkey"),
        ("events", 0, 0, "event_id"), ("documents", 0, 0, "doc_id"),
        ("embeddings", 0, 0, "vec_id"),
    ]:
        dup, mn, mx, cnt = con.execute(
            f"SELECT COUNT(*) - COUNT(DISTINCT {pk}), MIN({pk}), MAX({pk}),"
            f" COUNT(*) FROM {name}"
        ).fetchone()
        assert dup == 0, f"{name}.{pk} not unique after remap"
        assert mn == 0 and mx == cnt - 1, (
            f"{name}.{pk} not dense 0..N-1: min={mn} max={mx} n={cnt}"
        )
    # replica-wise distribution preservation: lines-per-order histogram
    # at sf1 must be exactly 10x the sf0.1 histogram
    con.execute(
        f"CREATE VIEW li01 AS SELECT * FROM"
        f" read_parquet('{SRC}/lineitem.parquet')"
    )
    h01 = dict(con.execute(
        "SELECT n, COUNT(*) FROM (SELECT COUNT(*) AS n FROM li01"
        " GROUP BY l_orderkey) GROUP BY n"
    ).fetchall())
    h1 = dict(con.execute(
        "SELECT n, COUNT(*) FROM (SELECT COUNT(*) AS n FROM lineitem"
        " GROUP BY l_orderkey) GROUP BY n"
    ).fetchall())
    assert h1 == {k: v * REPLICAS for k, v in h01.items()}, "histogram drift"
    print("lines-per-order histogram: exactly 10x sf0.1 at every point")
    print("== sf1 check OK ==")


def main() -> None:
    global DST, REPLICAS, PERTURB
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="verify only")
    ap.add_argument(
        "--sf", type=int, default=1,
        help="target scale factor (integer); replicas = 10*sf, output"
        " .tmp/testdata/sf<N>",
    )
    ap.add_argument(
        "--perturb", action="store_true",
        help="scale-invariant-dup build (documents token-suffixed,"
        " embeddings sign-flipped per replica) -> .tmp/testdata/sf<N>p",
    )
    args = ap.parse_args()
    if args.sf != 1:
        REPLICAS = 10 * args.sf
        DST = os.path.join(os.path.dirname(DST), f"sf{args.sf}")
    if args.perturb:
        PERTURB = True
        DST = DST + "p"
    if not args.check:
        generate()
    check()


if __name__ == "__main__":
    main()
