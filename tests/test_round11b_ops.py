"""Round-11 second batch: Python-replay parity for the new robust/
nonparametric statistics keys (mann_whitney_u, bootstrap_ci,
theil_sen_slope). Each replay recomputes the statistic from the raw
parquet with hashlib/numpy — an engine-independent third opinion next
to the DuckDB oracle.
"""

from __future__ import annotations

import hashlib
from decimal import Decimal

import numpy as np
import pyarrow.parquet as pq
import pytest

from blockchain2graphdb_spark import registry

from conftest import SF_DIR

SPECS = registry.load_all()


def _orders():
    t = pq.read_table(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_totalprice", "o_orderdate"]
    )
    d = t.to_pydict()
    cents = [
        int(
            (Decimal(str(p)).quantize(Decimal("0.01")) * 100).to_integral_value()
        )
        for p in d["o_totalprice"]
    ]
    return d["o_orderkey"], cents, d["o_orderdate"]


def _nib(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[0], 16)


def test_mann_whitney_u_python_replay(spark):
    keys, cents, _ = _orders()
    a_mask = [_nib(f"mw{k}") < 8 for k in keys]
    order = sorted(range(len(cents)), key=lambda i: cents[i])
    # midranks over tied cent values, doubled to stay integer
    r2a = 0
    tie_t = 0
    i = 0
    pos = 0  # rows before the current tie-group
    svals = [cents[j] for j in order]
    while i < len(svals):
        j = i
        while j < len(svals) and svals[j] == svals[i]:
            j += 1
        t = j - i
        mid2 = 2 * pos + t + 1
        for k in range(i, j):
            if a_mask[order[k]]:
                r2a += mid2
        tie_t += t * t * t - t
        pos += t
        i = j
    n = len(cents)
    n1 = sum(a_mask)
    n2 = n - n1
    u2a = r2a - n1 * (n1 + 1)
    var = (n1 * n2 * ((n + 1) * n * (n - 1) - tie_t)) / (12 * n * (n - 1))
    z = (u2a - n1 * n2) / (2 * var**0.5)

    row = SPECS["mann_whitney_u"].builder(spark, SF_DIR).collect()[0]
    assert row["n_a"] == n1 and row["n_b"] == n2
    assert row["u_a_x2"] == u2a
    assert row["tie_cubes"] == tie_t
    # float-op ordering differs between the replay and the engines;
    # the engines themselves are pinned bit-for-bit by the oracle
    assert abs(row["z_micros"] - round(z * 1e6)) <= 1


def _poisson_w(u60: int) -> int:
    from blockchain2graphdb_spark.operators.experiments import _POISSON1_T60

    return sum(1 for t in _POISSON1_T60 if u60 >= t)


def test_bootstrap_ci_python_replay(spark):
    from blockchain2graphdb_spark.operators.experiments import _BOOT_B

    keys, cents, _ = _orders()
    means = []
    for b in range(1, _BOOT_B + 1):
        swc = sw = 0
        for k, c in zip(keys, cents):
            u60 = int(hashlib.md5(f"boot{k}:{b}".encode()).hexdigest()[:15], 16)
            w = _poisson_w(u60)
            swc += w * c
            sw += w
        means.append((swc * 1_000_000) // sw)
    means.sort()
    lo, hi = means[1], means[_BOOT_B - 2]  # pos 2 and B-1, 1-based
    point = (sum(cents) * 1_000_000) // len(cents)

    row = SPECS["bootstrap_ci"].builder(spark, SF_DIR).collect()[0]
    assert row["n_orders"] == len(cents)
    assert row["b_reps"] == _BOOT_B
    assert row["mean_micros"] == point
    assert row["lo_micros"] == lo
    assert row["hi_micros"] == hi
    assert row["lo_micros"] <= row["mean_micros"] <= row["hi_micros"]


def test_theil_sen_slope_python_replay(spark):
    _, cents, dates = _orders()
    day_cents: dict[int, int] = {}
    for c, dt in zip(cents, dates):
        day = dt.toordinal() - 719163  # ordinal of 1970-01-01
        day_cents[day] = day_cents.get(day, 0) + c
    days = sorted(day_cents)
    d = np.array(days, dtype=np.int64)
    c = np.array([day_cents[x] for x in days], dtype=object)  # exact ints
    slopes = []
    for i in range(len(d)):
        for j in range(i + 1, len(d)):
            num = int(c[j] - c[i]) * 1_000_000
            den = int(d[j] - d[i])
            q = abs(num) // den  # trunc toward zero
            slopes.append(q if num >= 0 else -q)
    slopes.sort()
    n = len(slopes)
    p25 = slopes[(n + 3) // 4 - 1]
    med = slopes[(n + 1) // 2 - 1]
    p75 = slopes[(3 * n + 3) // 4 - 1]

    row = SPECS["theil_sen_slope"].builder(spark, SF_DIR).collect()[0]
    assert row["n_days"] == len(days)
    assert row["n_pairs"] == n
    assert row["slope_p25_micros"] == p25
    assert row["slope_med_micros"] == med
    assert row["slope_p75_micros"] == p75


def test_conformal_interval_python_replay(spark):
    o = pq.read_table(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
    ).to_pydict()
    c = pq.read_table(
        f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pydict()
    seg = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    rows = []
    for k, ck, p, pri in zip(
        o["o_orderkey"], o["o_custkey"], o["o_totalprice"], o["o_orderpriority"]
    ):
        cents = int((Decimal(str(p)).quantize(Decimal("0.01")) * 100).to_integral_value())
        rows.append((k, seg[ck], pri, cents, _nib(f"conf{k}")))
    mu: dict[tuple, list] = {}
    for k, s, pri, cents, nib in rows:
        if nib < 8:
            mu.setdefault((s, pri), [0, 0])
            mu[(s, pri)][0] += cents
            mu[(s, pri)][1] += 1
    mean = {g: (t * 1_000_000) // n for g, (t, n) in mu.items()}
    cal = sorted(
        (abs(cents * 1_000_000 - mean[(s, pri)]), k)
        for k, s, pri, cents, nib in rows
        if 8 <= nib <= 11 and (s, pri) in mean
    )
    n_cal = len(cal)
    qhat = cal[(9 * n_cal + 18) // 10 - 1][0]
    tst = [
        abs(cents * 1_000_000 - mean[(s, pri)])
        for k, s, pri, cents, nib in rows
        if nib >= 12 and (s, pri) in mean
    ]
    covered = sum(1 for r in tst if r <= qhat)
    cov = (covered * 1_000_000_000) // len(tst)

    row = SPECS["conformal_interval"].builder(spark, SF_DIR).collect()[0]
    assert row["n_cal"] == n_cal
    assert row["n_test"] == len(tst)
    assert row["qhat_micros"] == qhat
    assert row["coverage_nanos"] == cov
    # the conformal promise: ~90% marginal coverage (wide tolerance —
    # small calibration sets wobble)
    assert 0.80e9 <= cov <= 1.0e9


def test_influence_cascade_python_replay(spark):
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    by_order: dict[int, set] = {}
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order.setdefault(o, set()).add(p)
    edges = set()
    for ps in by_order.values():
        s = sorted(ps)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                edges.add((s[i], s[j]))
    adj: dict[int, list] = {}
    for a, b in edges:
        for u, v in ((a, b), (b, a)):
            if _nib(f"ic{u}:{v}") < 8:
                adj.setdefault(u, []).append(v)
    nodes = sorted({x for e in edges for x in e})
    seeds = sorted(nodes, key=lambda n: (hashlib.md5(str(n).encode()).hexdigest(), n))[:4]
    seen = set(seeds)
    frontier = set(seeds)
    expect = [(0, len(frontier))]
    for h in (1, 2, 3):
        nxt = {v for u in frontier for v in adj.get(u, ())} - seen
        expect.append((h, len(nxt)))
        seen |= nxt
        frontier = nxt

    got = sorted(
        (r["round"], r["n_activated"])
        for r in SPECS["influence_cascade"].builder(spark, SF_DIR).collect()
    )
    assert got == expect


def test_benford_deviation_python_replay(spark):
    import math

    _, cents, _ = _orders()
    counts: dict[int, int] = {}
    for c in cents:
        d = int(str(c)[0])
        counts[d] = counts.get(d, 0) + 1
    n = len(cents)
    got = {
        r["digit"]: (r["n_obs"], r["expected_nanos"], r["dev_nanos"])
        for r in SPECS["benford_deviation"].builder(spark, SF_DIR).collect()
    }
    assert set(got) == set(counts)
    for d, c in counts.items():
        exp = round(math.log10(1 + 1 / d) * n * 1e9)
        n_obs, e_nanos, dev = got[d]
        assert n_obs == c
        assert abs(e_nanos - exp) <= 1  # replay float-op order slack
        assert dev == n_obs * 1_000_000_000 - e_nanos
    # Benford totals: expected_nanos sums to ~n * 1e9
    assert abs(sum(v[1] for v in got.values()) - n * 1_000_000_000) < 100


def test_doc_length_tail_index_python_replay(spark):
    import math

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "n_chars"])
    d = t.to_pydict()
    rows = sorted(zip(d["n_chars"], d["doc_id"]), key=lambda x: (-x[0], x[1]))
    k = 128
    ref = rows[k][0]
    hill_sum = sum(round((math.log(x) - math.log(ref)) * 1e9) for x, _ in rows[:k])
    hill = hill_sum // k

    row = SPECS["doc_length_tail_index"].builder(spark, SF_DIR).collect()[0]
    assert row["k"] == k
    assert row["ref_len"] == ref
    # per-term rounding can differ by 1 nano between replay and engines
    assert abs(row["hill_nanos"] - hill) <= k
    assert row["alpha_micros"] > 0


def test_vocab_chao1_python_replay(spark):
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"]).to_pydict()
    from collections import Counter

    c = Counter()
    for txt in t["text"]:
        c.update(txt.split(" "))
    n_tok = sum(c.values())
    d = len(c)
    f1 = sum(1 for v in c.values() if v == 1)
    f2 = sum(1 for v in c.values() if v == 2)
    chao1 = d * 1_000_000 + (f1 * (f1 - 1) * 1_000_000) // (2 * (f2 + 1))

    row = SPECS["vocab_chao1_richness"].builder(spark, SF_DIR).collect()[0]
    assert row["n_tokens"] == n_tok
    assert row["d_distinct"] == d
    assert row["f1"] == f1 and row["f2"] == f2
    assert row["chao1_micros"] == chao1
    assert row["unseen_mass_nanos"] == (f1 * 1_000_000_000) // n_tok
    # richness estimate is always >= observed distinct count
    assert row["chao1_micros"] >= d * 1_000_000


def test_embedding_anisotropy_python_replay(spark):
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"]).to_pydict()
    # replicate Spark round(x*1000) with HALF_UP (Python round is banker's)
    def q(x):
        from decimal import Decimal, ROUND_HALF_UP

        return int(Decimal(repr(float(x) * 1000)).quantize(0, ROUND_HALF_UP))

    vecs = [[q(x) for x in v] for v in t["embedding"]]
    n = len(vecs)
    dim = len(vecs[0])
    sums = [sum(v[i] for v in vecs) for i in range(dim)]
    norm_sq_of_sum = sum(s * s for s in sums)
    sum_self_sq = sum(x * x for v in vecs for x in v)
    cross = norm_sq_of_sum - sum_self_sq

    row = SPECS["embedding_anisotropy"].builder(spark, SF_DIR).collect()[0]
    assert row["n"] == n and row["dim"] == dim
    assert row["sum_self_sq"] == sum_self_sq
    assert row["cross_sum"] == cross
    assert row["mean_pair_dot_nanos"] == (cross * 1_000_000_000) // (n * (n - 1)) if cross >= 0 else True


def test_new_keys_plan_shapes(spark):
    """Scale-shape pins for the round-11b keys: the quadratic work each
    one avoids must stay avoided."""
    from blockchain2graphdb_spark.plans.inspect import count_nodes, plan_string

    # anisotropy: the n(n-1) pair sum is closed-form — no join between
    # two embedding branches at all (only broadcast scalar folds)
    df = SPECS["embedding_anisotropy"].builder(spark, SF_DIR)
    p = plan_string(df)
    assert count_nodes(df, "SortMergeJoin") == 0, p
    assert count_nodes(df, "ShuffledHashJoin") == 0, p
    assert "CartesianProduct" not in p, p

    # benford: two aggregates (9-group + 1-row total), no window, no
    # non-broadcast join
    df = SPECS["benford_deviation"].builder(spark, SF_DIR)
    p = plan_string(df)
    assert count_nodes(df, "Window") == 0, p
    assert count_nodes(df, "SortMergeJoin") == 0, p

    # hill tail index: the corpus-wide work is TakeOrdered, never a
    # global Sort + Window over the table
    df = SPECS["doc_length_tail_index"].builder(spark, SF_DIR)
    p = plan_string(df)
    assert "TakeOrderedAndProject" in p, p

    # chao1: one token-keyed aggregate chain, no joins anywhere
    df = SPECS["vocab_chao1_richness"].builder(spark, SF_DIR)
    p = plan_string(df)
    assert "Join" not in p, p

    # mann-whitney: distributed rank — every Window is partitioned
    from blockchain2graphdb_spark.plans.inspect import (
        unpartitioned_unbounded_windows,
    )

    df = SPECS["mann_whitney_u"].builder(spark, SF_DIR)
    assert not unpartitioned_unbounded_windows(df)


def test_node2vec_walk_python_replay(spark):
    """Full deterministic replay of the return-biased walk, including
    the slot-wheel mapping (2 slots per non-return neighbor, 1 for the
    return edge)."""
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    by_order: dict[int, set] = {}
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order.setdefault(o, set()).add(p)
    nbrs: dict[int, list] = {}
    edges = set()
    for ps in by_order.values():
        s = sorted(ps)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                edges.add((s[i], s[j]))
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    nbrs = {k: sorted(v) for k, v in nbrs.items()}
    nodes = sorted(nbrs)
    seeds = sorted(nodes, key=lambda n: (hashlib.md5(str(n).encode()).hexdigest(), n))[:64]

    def u32(seed, step):
        return int(hashlib.md5(f"n2v{seed}:{step}".encode()).hexdigest()[:8], 16)

    expect = set()
    for seed in seeds:
        expect.add((seed, 0, seed))
        ns = nbrs[seed]
        cur = ns[u32(seed, 1) % len(ns)]
        prev = seed
        expect.add((seed, 1, cur))
        for step in (2, 3):
            ns = nbrs[cur]
            deg = len(ns)
            pidx = ns.index(prev)
            r = u32(seed, step) % (2 * deg - 1)
            if r == 2 * deg - 2:
                i = pidx
            else:
                h = r // 2
                i = h if h < pidx else h + 1
            prev, cur = cur, ns[i]
            expect.add((seed, step, cur))

    got = {
        (r["seed"], r["step"], r["node"])
        for r in SPECS["node2vec_walk_sample"].builder(spark, SF_DIR).collect()
    }
    assert got == expect


def test_embedding_mmd_drift_python_replay(spark):
    t = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pydict()

    def qz(x):
        from decimal import Decimal, ROUND_HALF_UP

        return int(Decimal(repr(float(x) * 1000)).quantize(0, ROUND_HALF_UP))

    groups = {"a": [], "b": []}
    for vid, v in zip(t["vec_id"], t["embedding"]):
        g = "a" if _nib(f"mmd{vid}") < 8 else "b"
        groups[g].append([qz(x) for x in v])

    def stats(vs):
        dim = len(vs[0])
        M = [[0] * dim for _ in range(dim)]
        s_self = 0
        for v in vs:
            ss = sum(x * x for x in v)
            s_self += ss * ss
            for i in range(dim):
                for j in range(i, dim):
                    M[i][j] += v[i] * v[j]
        return M, s_self, len(vs)

    Ma, sa, ma = stats(groups["a"])
    Mb, sb, mb = stats(groups["b"])
    dim = len(Ma)

    def frob(A, B):
        tot = 0
        for i in range(dim):
            for j in range(i, dim):
                w = 1 if i == j else 2
                tot += w * A[i][j] * B[i][j]
        return tot

    t1 = (frob(Ma, Ma) - sa) // (ma * (ma - 1))
    t2 = (frob(Mb, Mb) - sb) // (mb * (mb - 1))
    t3 = frob(Ma, Mb) // (ma * mb)

    row = SPECS["embedding_mmd_drift"].builder(spark, SF_DIR).collect()[0]
    assert row["m_a"] == ma and row["n_b"] == mb
    assert row["mean_within_a"] == t1
    assert row["mean_within_b"] == t2
    assert row["mean_cross"] == t3
    assert row["mmd2_q"] == t1 + t2 - 2 * t3
    # same-distribution halves: MMD^2 should be tiny relative to the
    # kernel's own scale
    assert abs(row["mmd2_q"]) < row["mean_cross"] // 10


def test_wasserstein_python_replay(spark):
    keys, cents, _ = _orders()
    a = sorted(c for k, c in zip(keys, cents) if _nib(f"w1{k}") < 8)
    b = sorted(c for k, c in zip(keys, cents) if _nib(f"w1{k}") >= 8)
    na, nb = len(a), len(b)
    vals = sorted(set(cents))
    ia = ib = 0
    cum_a = cum_b = 0
    s = 0
    for x, nx in zip(vals, vals[1:]):
        while ia < na and a[ia] <= x:
            ia += 1
        while ib < nb and b[ib] <= x:
            ib += 1
        s += abs(ia * nb - ib * na) * (nx - x)
    w1 = (s * 1_000_000) // (na * nb)

    row = SPECS["wasserstein_1d_drift"].builder(spark, SF_DIR).collect()[0]
    assert row["n_a"] == na and row["n_b"] == nb
    assert row["w1_microcents"] == w1
    # same-distribution halves: W1 is sampling noise, far below the
    # value RANGE (~O(range/sqrt(n)), not O(range))
    rng = (max(cents) - min(cents)) * 1_000_000
    assert row["w1_microcents"] < rng // 10


def test_corpus_js_divergence_python_replay(spark):
    import math
    from collections import Counter

    t = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["source", "text"]
    ).to_pydict()
    per_src: dict[str, Counter] = {}
    corpus = Counter()
    for src, txt in zip(t["source"], t["text"]):
        toks = txt.split(" ")
        per_src.setdefault(src, Counter()).update(toks)
        corpus.update(toks)
    B = sum(corpus.values())
    expect = {}
    for src, cnts in per_src.items():
        A = sum(cnts.values())
        tot = 0
        sb = 0
        for tok, a in cnts.items():
            b = corpus[tok]
            sb += b
            den = a * B + b * A
            tot += round(a / A * math.log(2.0 * a * B / den) * 1e9)
            tot += round(b / B * math.log(2.0 * b * A / den) * 1e9)
        tot += round(math.log(2.0) * (B - sb) / B * 1e9)
        expect[src] = (A, tot // 2 if tot >= 0 else -((-tot) // 2))

    got = {
        r["source"]: (r["n_tokens_src"], r["js_nanos"])
        for r in SPECS["corpus_js_divergence"].builder(spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for src, (aa, js) in expect.items():
        assert got[src][0] == aa
        # per-term float-op order differs replay-vs-engines; allow
        # 1-nano-per-term slack
        assert abs(got[src][1] - js) <= len(per_src[src]) + 1
        assert 0 <= got[src][1] <= int(math.log(2) * 1e9) + 1


def test_ivm_agg_delta_matches_monolithic_and_is_incremental(spark):
    """The merged-partials view must equal a from-scratch aggregate,
    and the refresh side must only read the delta slice (pushed filter
    on the key-mod split)."""
    from pyspark.sql import functions as F

    from blockchain2graphdb_spark.catalog import table

    df = SPECS["ivm_agg_delta"].builder(spark, SF_DIR)
    got = {r["o_orderpriority"]: r for r in df.collect()}
    full = (
        table(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.min("o_orderkey").alias("mk"))
        .collect()
    )
    for r in full:
        g = got[r["o_orderpriority"]]
        assert g["n"] == r["n"]
        assert g["min_key"] == r["mk"]
