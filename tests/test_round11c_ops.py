"""Round-11 third batch: semantic pins for the data-management /
calibration / linkage keys added this session (compaction_bin_pack,
linkage_blocking_quality, isotonic_calibration, quantile_normalize).
Each test recomputes the expected answer from the raw parquet with
pandas/numpy — an engine-independent third opinion next to the DuckDB
oracle.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.plans.inspect import (
    count_nodes,
    plan_string,
)

from conftest import SF_DIR
import pytest

SPECS = registry.load_all()


def _cents(x) -> int:
    from decimal import Decimal

    return int((Decimal(str(x)).quantize(Decimal("0.01")) * 100).to_integral_value())


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark div / DuckDB // semantics —
    BOTH truncate toward zero, unlike Python's floor //)."""
    q = abs(a) // b
    return -q if a < 0 else q


def _df(name, spark):
    return SPECS[name].builder(spark, SF_DIR)


# ---------------------------------------------------------------------------
# compaction_bin_pack


def test_compaction_bins_partition_rows(spark):
    """Every input row lands in exactly one bin, and bins per partition
    are contiguous from 0 (offset packing leaves no gaps)."""
    out = _df("compaction_bin_pack", spark).collect()
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet", columns=["l_returnflag"])
    assert sum(r.rows_total for r in out) == li.num_rows
    by_part = {}
    for r in out:
        by_part.setdefault(r.part_key, []).append(r.bin)
    for part, bins in by_part.items():
        assert sorted(bins) == list(range(len(bins))), part


def test_compaction_layout_is_size_desc(spark):
    """Size-DESC layout: the largest file in bin b is >= the largest
    file in bin b+1 of the same partition (FFD ordering means file
    sizes are non-increasing along the laid-out sequence)."""
    out = _df("compaction_bin_pack", spark).collect()
    by_part = {}
    for r in out:
        by_part.setdefault(r.part_key, {})[r.bin] = r
    for part, bins in by_part.items():
        for b in range(len(bins) - 1):
            assert bins[b].largest_file >= bins[b + 1].largest_file, (part, b)
            # within one laid-out prefix, the next bin's largest file
            # cannot exceed the previous bin's smallest
            assert bins[b].smallest_file >= bins[b + 1].largest_file, (part, b)


def test_compaction_plan_single_window(spark):
    """The plan is: one aggregate (inventory), one keyed window
    (layout), one aggregate (bins) — no second sort of the data."""
    df = _df("compaction_bin_pack", spark)
    assert count_nodes(df, "Window") == 1, plan_string(df)


# ---------------------------------------------------------------------------
# linkage_blocking_quality


def test_blocking_quality_python_replay(spark):
    row = _df("linkage_blocking_quality", spark).collect()[0]
    t = pq.read_table(f"{SF_DIR}/customer.parquet").to_pydict()
    n = len(t["c_custkey"])
    recs = list(
        zip(
            t["c_custkey"],
            t["c_nationkey"],
            t["c_mktsegment"],
            [_tdiv(_cents(b), 1000) for b in t["c_acctbal"]],
        )
    )
    from collections import Counter

    truth = n_caught = 0
    by_band = {}
    for k, nat, seg, band in recs:
        by_band.setdefault((seg, band), []).append((k, nat))
    for members in by_band.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                truth += 1
                if members[i][1] == members[j][1]:
                    n_caught += 1
    blocks = Counter((nat, seg) for _, nat, seg, _ in recs)
    n_cand = sum(m * (m - 1) // 2 for m in blocks.values())
    assert row.n_records == n
    assert row.n_all_pairs == n * (n - 1) // 2
    assert row.n_true == truth
    assert row.n_caught == n_caught
    assert row.n_cand == n_cand
    assert row.completeness_nanos == n_caught * 10**9 // truth
    assert (
        row.reduction_nanos
        == 10**9 - n_cand * 10**9 // (n * (n - 1) // 2)
    )


def test_blocking_quality_never_materializes_candidates(spark):
    """The candidate count is sum(m*(m-1)/2) over block counts — the
    plan must not contain a second self-join producing candidate pairs
    (exactly one join: the band equi-join for truth pairs)."""
    df = _df("linkage_blocking_quality", spark)
    plan = plan_string(df)
    joins = sum(
        plan.count(j)
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    # truth-pair join + the three O(1)-row result joins; anything more
    # means candidates got materialized
    assert joins <= 4, plan


# ---------------------------------------------------------------------------
# isotonic_calibration


def test_isotonic_fit_matches_sequential_pav(spark):
    """The minimax (max-min interval average) form must equal the
    classic sequential pool-adjacent-violators fit, and be monotone."""
    rows = sorted(_df("isotonic_calibration", spark).collect())
    iso = [r.iso_nanos for r in rows]
    assert iso == sorted(iso)
    # sequential weighted PAV over the same bins, exact rationals
    from fractions import Fraction

    stack = []  # (pos_sum, cnt_sum, n_bins)
    for r in rows:
        stack.append([r.n_pos, r.n, 1])
        while len(stack) > 1 and Fraction(stack[-2][0], stack[-2][1]) > Fraction(
            stack[-1][0], stack[-1][1]
        ):
            s2 = stack.pop()
            s1 = stack.pop()
            stack.append([s1[0] + s2[0], s1[1] + s2[1], s1[2] + s2[2]])
    fit = []
    for pos, cnt, nb in stack:
        fit.extend([pos * 10**9 // cnt] * nb)
    assert iso == fit


def test_isotonic_single_data_aggregate(spark):
    """Only ONE aggregate touches the orders scan; everything above it
    operates on the <=50-row bin table via broadcast joins."""
    df = _df("isotonic_calibration", spark)
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


# ---------------------------------------------------------------------------
# quantile_normalize


def test_quantile_normalize_python_replay(spark):
    rows = _df("quantile_normalize", spark).collect()
    t = pq.read_table(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_totalprice", "o_orderdate"]
    ).to_pydict()
    from decimal import Decimal

    keys = t["o_orderkey"]
    a = {
        k: int(
            (Decimal(str(p)).quantize(Decimal("0.01")) * 100).to_integral_value()
        )
        for k, p in zip(keys, t["o_totalprice"])
    }
    epoch = __import__("datetime").date(1970, 1, 1)
    b = {
        k: (d.date() - epoch).days * 100 for k, d in zip(keys, t["o_orderdate"])
    }
    order_a = sorted(keys, key=lambda k: (a[k], k))
    sorted_b = sorted((b[k], k) for k in keys)
    expect = {
        k: (i + 1, a[k], sorted_b[i][0]) for i, k in enumerate(order_a)
    }
    assert len(rows) == len(keys)
    for r in rows:
        pos, ac, bc = expect[r.o_orderkey]
        assert (r.pos, r.a_cents, r.b_cents) == (pos, ac, bc), r
        assert r.qnorm_x2_cents == ac + bc


def test_quantile_normalize_no_global_window(spark):
    from blockchain2graphdb_spark.plans.inspect import (
        unpartitioned_unbounded_windows,
    )

    df = _df("quantile_normalize", spark)
    assert not unpartitioned_unbounded_windows(df), plan_string(df)


# ---------------------------------------------------------------------------
# embedding_pca_power


@pytest.mark.slow  # >9s measured r13; full lane still runs it
def test_pca_power_aligns_with_numpy_eigenvector(spark):
    """The 12-round integer power iteration must align (|cosine| >
    0.999) with numpy's exact top covariance eigenvector."""
    import numpy as np

    rows = sorted(_df("embedding_pca_power", spark).collect())
    v = np.array([r.v_micros for r in rows], dtype=float)
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    x = np.array(
        [np.round(np.asarray(e, dtype=float) * 1000) for e in emb["embedding"].to_pylist()]
    )
    cov = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999, cos


@pytest.mark.slow  # >9s measured r13; full lane still runs it
def test_pca_power_scale_is_max_component(spark):
    """Renormalization contract: max |component| == 1e6 exactly."""
    rows = _df("embedding_pca_power", spark).collect()
    assert max(abs(r.v_micros) for r in rows) == 1_000_000


# ---------------------------------------------------------------------------
# attribution_markov


def test_markov_attribution_matches_exact_linear_solve(spark):
    """The 24-round integer absorption iteration must sit within 0.5%
    of the exact (I - Q)^-1 b linear solve, for the full chain and
    every removal variant; shares must sum to <= 1e9."""
    import numpy as np
    import duckdb

    rows = _df("attribution_markov", spark).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    trans = con.execute(
        """
        WITH e0 AS (SELECT user_id, event_id, event_type,
                           epoch_ns(ts)//1000 AS us FROM events),
        pu AS (SELECT user_id, MIN(us) AS pu FROM e0
               WHERE event_type='purchase' GROUP BY 1),
        t AS (SELECT e0.user_id, e0.event_type AS ch, e0.us, e0.event_id,
                     CASE WHEN pu.user_id IS NOT NULL THEN 1 ELSE 0 END AS conv
              FROM e0 LEFT JOIN pu ON pu.user_id=e0.user_id
              WHERE e0.event_type<>'purchase'
                AND (pu.pu IS NULL OR e0.us<pu.pu)),
        seq AS (SELECT user_id, ch, conv,
                LAG(ch) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev,
                ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY us DESC, event_id DESC) AS rdesc
                FROM t)
        SELECT src, dst, COUNT(*) AS cnt FROM (
          SELECT COALESCE(prev,'START') AS src, ch AS dst FROM seq
          UNION ALL
          SELECT ch, CASE WHEN conv=1 THEN 'CONV' ELSE 'NULL' END
          FROM seq WHERE rdesc=1
          UNION ALL
          SELECT 'START','CONV' FROM pu
          LEFT JOIN (SELECT DISTINCT user_id FROM t) tt
            ON tt.user_id=pu.user_id WHERE tt.user_id IS NULL
        ) GROUP BY 1,2
        """
    ).fetchall()
    states = sorted({s for s, _, _ in trans})
    idx = {s: i for i, s in enumerate(states)}
    out = {}
    for s, _, c in trans:
        out[s] = out.get(s, 0) + c

    def solve(removed=None):
        n = len(states)
        q = np.zeros((n, n))
        b = np.zeros(n)
        for s, d, c in trans:
            if removed and d == removed:
                continue
            pr = c / out[s]
            if d == "CONV":
                b[idx[s]] += pr
            elif d != "NULL":
                q[idx[s], idx[d]] += pr
        return np.linalg.solve(np.eye(n) - q, b)[idx["START"]]

    full_exact = solve()
    assert rows, rows
    for r in rows:
        assert abs(r.p_full_nanos / 1e9 - full_exact) < 5e-3, r
        assert abs(r.p_removed_nanos / 1e9 - solve(r.channel)) < 5e-3, r
        assert r.removal_effect_nanos == r.p_full_nanos - r.p_removed_nanos
    assert sum(r.share_nanos for r in rows) <= 10**9


# ---------------------------------------------------------------------------
# graph_diameter_lb


def test_diameter_lb_python_replay(spark):
    """Double-sweep result must match a networkx-free Python BFS replay
    of the same co-purchase graph, and LB >= first-sweep eccentricity."""
    row = _df("graph_diameter_lb", spark).collect()[0]
    import hashlib
    from collections import deque

    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    by_order = {}
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order.setdefault(o, set()).add(p)
    adj = {}
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)

    def bfs(src):
        dist = {src: 0}
        dq = deque([src])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        return dist

    seed = min(adj, key=lambda n: (hashlib.md5(str(n).encode()).hexdigest(), n))
    d1 = bfs(seed)
    ecc1 = max(d1.values())
    far = min((n for n in d1 if d1[n] == ecc1))
    d2 = bfs(far)
    assert row.seed_node == seed
    assert row.far_node == far
    assert row.ecc_seed == ecc1
    assert row.diameter_lb == max(d2.values())
    assert row.diameter_lb >= row.ecc_seed
    assert row.n_nodes == len(adj)
    assert row.n_reached == len(d2)


# ---------------------------------------------------------------------------
# diff_in_diff / sprt_sequential / pr_curve_points


def test_diff_in_diff_python_replay(spark):
    import hashlib
    from decimal import Decimal

    row = _df("diff_in_diff", spark).collect()[0]
    t = pq.read_table(
        f"{SF_DIR}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"],
    ).to_pydict()
    us = [v.timestamp() * 1e6 for v in t["ts"]]
    us = [int(round(v)) for v in us]
    cut = (min(us) + max(us)) // 2
    per = {}
    for uid, u, et, val in zip(t["user_id"], us, t["event_type"], t["value"]):
        c = (
            int((Decimal(str(val)).quantize(Decimal("0.01")) * 100).to_integral_value())
            if et == "purchase"
            else 0
        )
        pre, post = per.get(uid, (0, 0))
        if u < cut:
            pre += c
        else:
            post += c
        per[uid] = (pre, post)

    def arm(uid):
        return int(hashlib.md5(f"dd{uid}".encode()).hexdigest()[0], 16) < 8

    cells = {True: [0, 0, 0], False: [0, 0, 0]}  # n, s_pre, s_post
    for uid, (pre, post) in per.items():
        cell = cells[arm(uid)]
        cell[0] += 1
        cell[1] += pre
        cell[2] += post
    mtp = cells[True][1] * 10**9 // cells[True][0]
    mtq = cells[True][2] * 10**9 // cells[True][0]
    mcp = cells[False][1] * 10**9 // cells[False][0]
    mcq = cells[False][2] * 10**9 // cells[False][0]
    assert (row.n_treat, row.n_ctrl) == (cells[True][0], cells[False][0])
    assert (row.m_treat_pre_nanos, row.m_treat_post_nanos) == (mtp, mtq)
    assert (row.m_ctrl_pre_nanos, row.m_ctrl_post_nanos) == (mcp, mcq)
    assert row.did_nanos == (mtq - mtp) - (mcq - mcp)


def test_sprt_first_crossing_python_replay(spark):
    from blockchain2graphdb_spark.operators.experiments import (
        _SPRT_A,
        _SPRT_B,
        _SPRT_L0,
        _SPRT_L1,
    )

    row = _df("sprt_sequential", spark).collect()[0]
    t = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_id", "ts", "event_type"]
    ).to_pydict()
    evs = sorted(
        zip(
            [int(round(v.timestamp() * 1e6)) for v in t["ts"]],
            t["event_id"],
            t["event_type"],
        )
    )
    llr = 0
    cross_pos = 0
    cross_llr = 0
    for i, (_, _, et) in enumerate(evs, start=1):
        llr += _SPRT_L1 if et == "purchase" else _SPRT_L0
        if cross_pos == 0 and (llr >= _SPRT_A or llr <= _SPRT_B):
            cross_pos, cross_llr = i, llr
    assert row.n_obs == len(evs)
    assert row.llr_final_nanos == llr
    assert row.first_cross_pos == cross_pos
    assert row.llr_at_cross_nanos == cross_llr
    expect = (
        "continue"
        if cross_pos == 0
        else ("accept_h1" if cross_llr >= _SPRT_A else "accept_h0")
    )
    assert row.decision == expect


def test_pr_curve_is_monotone_and_anchored(spark):
    """Recall is non-increasing in threshold; the lowest threshold
    recalls everything; tp/fp sum to the prefix size everywhere."""
    rows = sorted(_df("pr_curve_points", spark).collect())
    assert rows[0].recall_nanos == 10**9  # threshold = min score
    recalls = [r.recall_nanos for r in rows]
    assert recalls == sorted(recalls, reverse=True)
    for r in rows:
        assert 0 <= r.precision_nanos <= 10**9
        assert r.tp + r.fp >= r.tp >= 0


# ---------------------------------------------------------------------------
# stream_sprt


def test_stream_sprt_matches_python_walk(spark):
    """The streaming per-arm fold must equal a per-arm Python walk over
    the time-ordered log (state carried correctly across micro-batch
    boundaries, order preserved by the time-split replay)."""
    import hashlib

    from blockchain2graphdb_spark.operators.experiments import (
        _SPRT_A,
        _SPRT_B,
        _SPRT_L0,
        _SPRT_L1,
    )

    rows = {r.arm: r for r in _df("stream_sprt", spark).collect()}
    t = pq.read_table(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "ts", "event_type", "user_id"],
    ).to_pydict()
    evs = sorted(
        zip(
            [int(round(v.timestamp() * 1e6)) for v in t["ts"]],
            t["event_id"],
            t["event_type"],
            t["user_id"],
        )
    )
    walks = {0: [0, 0, 0, 0], 1: [0, 0, 0, 0]}  # n, llr, cpos, cllr
    for _, _, et, uid in evs:
        a = 1 if int(hashlib.md5(f"sp{uid}".encode()).hexdigest()[0], 16) < 8 else 0
        w = walks[a]
        w[0] += 1
        w[1] += _SPRT_L1 if et == "purchase" else _SPRT_L0
        if w[2] == 0 and (w[1] >= _SPRT_A or w[1] <= _SPRT_B):
            w[2], w[3] = w[0], w[1]
    for a, (n, llr, cpos, cllr) in walks.items():
        r = rows[a]
        assert (r.n_obs, r.llr_final_nanos) == (n, llr), (a, r)
        assert (r.first_cross_pos, r.llr_at_cross_nanos) == (cpos, cllr), (a, r)


# ---------------------------------------------------------------------------
# scan_fixed_width / text_hashing_vectorizer


def test_fixed_width_roundtrip_lossless(spark):
    """The rendered fixed-width rollup equals the same rollup straight
    off the parquet (render -> text scan -> offset parse is lossless)."""
    from decimal import Decimal

    rows = {r.status: r for r in _df("scan_fixed_width", spark).collect()}
    t = pq.read_table(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
    ).to_pydict()
    agg = {}
    for k, st, p, d in zip(
        t["o_orderkey"], t["o_orderstatus"], t["o_totalprice"], t["o_orderdate"]
    ):
        cents = int(
            (Decimal(str(p)).quantize(Decimal("0.01")) * 100).to_integral_value()
        )
        a = agg.setdefault(st, [0, 0, "9999-99-99", 0])
        a[0] += 1
        a[1] += cents
        a[2] = min(a[2], d.date().isoformat())
        a[3] = max(a[3], k)
    assert set(rows) == set(agg)
    for st, (n, cents, first, mk) in agg.items():
        r = rows[st]
        assert (r.n_orders, r.cents_total, r.first_date, r.max_key) == (
            n,
            cents,
            first,
            mk,
        ), st


def test_hashing_vectorizer_python_replay(spark):
    import hashlib
    import re
    from collections import Counter

    rows = _df("text_hashing_vectorizer", spark).collect()
    t = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    expect = Counter()
    terms = {}
    for did, txt in zip(t["doc_id"], t["text"]):
        for tok in re.split(r"[^a-z]+", txt.lower()):
            if not tok:
                continue
            b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 32
            expect[(did, b)] += 1
            terms.setdefault((did, b), set()).add(tok)
    assert len(rows) == len(expect)
    for r in rows:
        assert r.n_tokens == expect[(r.doc_id, r.bucket)], r
        assert r.n_terms == len(terms[(r.doc_id, r.bucket)]), r


# ---------------------------------------------------------------------------
# window_cume_dist / expected_calibration_error / bollinger_bands /
# forecast_baseline_error


def test_cume_dist_matches_row_level_definition(spark):
    """cum(n)/total per distinct value == the CUME_DIST every row of
    that value would get, and the last value of a partition hits 1."""
    rows = _df("window_cume_dist", spark).collect()
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(r)
    for flag, rs in by_flag.items():
        rs.sort(key=lambda r: r.qty)
        tot = sum(r.n for r in rs)
        cum = 0
        for r in rs:
            cum += r.n
            assert r.cume_nanos == cum * 10**9 // tot, (flag, r.qty)
        assert rs[-1].cume_nanos == 10**9, flag


def test_ece_equals_binwise_recomputation(spark):
    row = _df("expected_calibration_error", spark).collect()[0]
    bins = {r.bin: r for r in SPECS["calibration_bins"].builder(spark, SF_DIR).collect()}
    gaps = {
        b: abs(r.sum_permille * 10**6 - r.n_pos * 10**9) for b, r in bins.items()
    }
    n = sum(r.n for r in bins.values())
    assert row.n_bins == len(bins)
    assert row.n_total == n
    assert row.ece_nanos == sum(gaps.values()) // n
    assert row.mce_nanos == max(gaps[b] // bins[b].n for b in bins)


def test_bollinger_matches_numpy_rolling(spark):
    import numpy as np

    rows = sorted(_df("bollinger_bands", spark).collect(), key=lambda r: r.day)
    cents = [r.cents for r in rows]
    for i, r in enumerate(rows):
        lo = max(0, i - 6)
        win = np.array(cents[lo : i + 1], dtype=float)
        assert r.n7 == len(win)
        assert r.mean_nanos == int(sum(cents[lo : i + 1])) * 10**9 // len(win)
        sd = float(win.std())  # population
        assert abs(r.sd_nanos / 1e9 - sd) < 1e-3 * max(1.0, sd), (r.day, sd)


def test_forecast_baseline_python_replay(spark):
    rows = {r.event_type: r for r in _df("forecast_baseline_error", spark).collect()}
    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["ts", "event_type"]).to_pydict()
    from collections import Counter

    daily = Counter()
    for ts, et in zip(t["ts"], t["event_type"]):
        daily[(et, int(round(ts.timestamp() * 1e6)) // (24 * 3600 * 1_000_000))] += 1
    series = {}
    for (et, day), n in sorted(daily.items()):
        series.setdefault(et, []).append(n)
    for et, ns in series.items():
        r = rows[et]
        e1 = [abs(b - a) for a, b in zip(ns, ns[1:])]
        e7 = [abs(ns[i] - ns[i - 7]) for i in range(7, len(ns))]
        assert r.n_scored_naive == len(e1)
        assert r.mae_naive_nanos == sum(e1) * 10**9 // len(e1)
        assert r.n_scored_seasonal == len(e7)
        assert r.mae_seasonal_nanos == sum(e7) * 10**9 // len(e7)


# ---------------------------------------------------------------------------
# cohort_ltv / adversarial_validation


def test_cohort_ltv_python_replay(spark):
    from decimal import Decimal

    rows = _df("cohort_ltv", spark).collect()
    t = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "event_type", "value"]
    ).to_pydict()
    week = 7 * 24 * 3600 * 1_000_000
    first = {}
    per = {}
    recs = []
    for uid, ts, et, val in zip(
        t["user_id"], t["ts"], t["event_type"], t["value"]
    ):
        w = int(round(ts.timestamp() * 1e6)) // week
        c = (
            int((Decimal(str(val)).quantize(Decimal("0.01")) * 100).to_integral_value())
            if et == "purchase"
            else 0
        )
        recs.append((uid, w, c))
        first[uid] = min(first.get(uid, w), w)
    sizes = {}
    for uid, cw in first.items():
        sizes[cw] = sizes.get(cw, 0) + 1
    for uid, w, c in recs:
        cw = first[uid]
        per[(cw, w - cw)] = per.get((cw, w - cw), 0) + c
    assert len(rows) == len(per)
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    for cw, rs in by_cohort.items():
        rs.sort(key=lambda r: r.week_offset)
        cum = 0
        for r in rs:
            assert r.cents_in_week == per[(cw, r.week_offset)]
            cum += r.cents_in_week
            assert r.cum_cents == cum
            assert r.cohort_users == sizes[cw]
            assert r.ltv_per_user_nanos == cum * 10**9 // sizes[cw]


def test_adversarial_validation_null_is_calibrated(spark):
    """A content-random md5 split must be near-indistinguishable:
    separability well under 0.1 (AUC within 0.05 of chance), and the
    counts must reflect the 12/16 train share."""
    row = _df("adversarial_validation", spark).collect()[0]
    n = row.n_test + row.n_train
    assert 0.15 < row.n_test / n < 0.35  # 4/16 expected
    assert row.separability < 0.1, row


# ---------------------------------------------------------------------------
# eigenvector_centrality


def test_eigenvector_centrality_matches_numpy(spark):
    import numpy as np

    rows = _df("eigenvector_centrality", spark).collect()
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    by_order = {}
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order.setdefault(o, set()).add(p)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                edges.add((a, b))
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    a = np.zeros((len(nodes), len(nodes)))
    for x, y in edges:
        a[idx[x], idx[y]] = 1
        a[idx[y], idx[x]] = 1
    vals, vecs = np.linalg.eigh(a)
    top = np.abs(vecs[:, -1])
    order = sorted(nodes, key=lambda n: (-top[idx[n]], n))[:50]
    got = [r.node for r in rows]
    # ranking parity on the top-50 (integer iteration vs eigh), and
    # score parity within quantization
    assert got == order, (got[:5], order[:5])
    mx = max(top)
    for r in rows:
        assert abs(r.v_micros / 1e6 - top[idx[r.node]] / mx) < 1e-3, r


# ---------------------------------------------------------------------------
# psm_att / uplift_by_decile


def test_psm_att_python_replay(spark):
    import hashlib
    from decimal import Decimal

    row = _df("psm_att", spark).collect()[0]
    t = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type", "value"]
    ).to_pydict()
    per = {}
    for uid, et, val in zip(t["user_id"], t["event_type"], t["value"]):
        x, y = per.get(uid, (0, 0))
        x += 1
        if et == "purchase":
            y += int(
                (Decimal(str(val)).quantize(Decimal("0.01")) * 100).to_integral_value()
            )
        per[uid] = (x, y)
    treats, ctrls = [], []
    for uid, (x, y) in per.items():
        arm = int(hashlib.md5(f"ps{uid}".encode()).hexdigest()[0], 16) < 8
        (treats if arm else ctrls).append((uid, x, y))
    by_band = {}
    for cid, cx, cy in ctrls:
        by_band.setdefault(cx // 4, []).append((cid, cx, cy))
    diffs = []
    for tid, tx, ty in treats:
        cands = by_band.get(tx // 4)
        if not cands:
            continue
        cid, cx, cy = min(cands, key=lambda c: (abs(tx - c[1]), c[0]))
        diffs.append(ty - cy)
    assert row.n_treat == len(treats)
    assert row.n_matched == len(diffs)
    sd = sum(diffs)
    assert row.sum_diff_cents == sd
    expect = 0 if not diffs else (1 if sd >= 0 else -1) * (abs(sd) * 10**9 // len(diffs))
    assert row.att_nanos == expect


def test_uplift_decile_python_replay(spark):
    import hashlib

    rows = {r.decile: r for r in _df("uplift_by_decile", spark).collect()}
    t = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type"]
    ).to_pydict()
    conv = {}
    for uid, et in zip(t["user_id"], t["event_type"]):
        conv[uid] = conv.get(uid, 0) or (1 if et == "purchase" else 0)
    cells = {}
    for uid, c in conv.items():
        treat = int(hashlib.md5(f"up{uid}".encode()).hexdigest()[0], 16) < 8
        dec = (int(hashlib.md5(f"us{uid}".encode()).hexdigest()[:8], 16) % 1000) // 100
        k = cells.setdefault(dec, [0, 0, 0, 0])
        if treat:
            k[0] += 1
            k[2] += c
        else:
            k[1] += 1
            k[3] += c
    assert set(rows) == set(cells)
    for dec, (nt, nc, ct, cc) in cells.items():
        r = rows[dec]
        assert (r.n_treat, r.n_ctrl, r.conv_treat, r.conv_ctrl) == (nt, nc, ct, cc)
        if nt > 0 and nc > 0:
            assert r.uplift_nanos == ct * 10**9 // nt - cc * 10**9 // nc
        else:
            assert r.uplift_nanos is None


# ---------------------------------------------------------------------------
# feature_pit_join / k_anonymity_audit


def test_pit_join_is_strictly_before(spark):
    """The leakage contract: each view's features equal the purchase
    aggregates STRICTLY before its (us, kind, event_id) position — an
    equal-timestamp purchase is never visible."""
    from decimal import Decimal

    rows = _df("feature_pit_join", spark).collect()
    t = pq.read_table(
        f"{SF_DIR}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type", "value"],
    ).to_pydict()
    timeline = {}
    for uid, eid, ts, et, val in zip(
        t["user_id"], t["event_id"], t["ts"], t["event_type"], t["value"]
    ):
        if et not in ("view", "purchase"):
            continue
        us = int(round(ts.timestamp() * 1e6))
        kind = 0 if et == "view" else 1
        cents = (
            int((Decimal(str(val)).quantize(Decimal("0.01")) * 100).to_integral_value())
            if kind
            else 0
        )
        timeline.setdefault(uid, []).append((us, kind, eid, cents))
    expect = {}
    for uid, evs in timeline.items():
        n = spend = 0
        for us, kind, eid, cents in sorted(evs):
            if kind == 0:
                expect[eid] = (n, spend)
            else:
                n += 1
                spend += cents
    assert len(rows) == len(expect)
    for r in rows:
        assert (r.n_prior_purchases, r.prior_spend_cents) == expect[r.event_id], r


def test_k_anonymity_python_replay(spark):
    from collections import Counter

    row = _df("k_anonymity_audit", spark).collect()[0]
    t = pq.read_table(
        f"{SF_DIR}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    ).to_pydict()
    groups = Counter(
        (n, s, _tdiv(_cents(b), 100000))
        for n, s, b in zip(t["c_nationkey"], t["c_mktsegment"], t["c_acctbal"])
    )
    ks = list(groups.values())
    assert row.n_groups == len(ks)
    assert row.min_k == min(ks)
    assert row.n_groups_below_5 == sum(1 for k in ks if k < 5)
    assert row.n_rows_at_risk == sum(k for k in ks if k < 5)
    assert row.n_rows == sum(ks)


# ---------------------------------------------------------------------------
# gini_split_points / neyman_allocation / l_diversity_audit


def test_gini_best_split_matches_sklearn_free_scan(spark):
    """argmax(purity) == argmin(weighted Gini) computed directly with
    exact fractions; per-threshold counts replayed from raw data."""
    import hashlib
    from fractions import Fraction

    rows = sorted(_df("gini_split_points", spark).collect())
    t = pq.read_table(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    ).to_pydict()
    pts = {}
    for k, st in zip(t["o_orderkey"], t["o_orderstatus"]):
        f = int(hashlib.md5(f"p{k}".encode()).hexdigest()[:8], 16) % 1000
        n, pos = pts.get(f, (0, 0))
        pts[f] = (n + 1, pos + (1 if st == "F" else 0))
    fs = sorted(pts)
    nt = sum(n for n, _ in pts.values())
    pt = sum(p for _, p in pts.values())
    nl = pl = 0
    best = None
    got = {r.threshold: r for r in rows}
    for f in fs:
        nl += pts[f][0]
        pl += pts[f][1]
        nr, prr = nt - nl, pt - pl
        if nr == 0:
            assert f not in got
            continue
        r = got[f]
        assert (r.n_left, r.pos_left, r.n_right, r.pos_right) == (nl, pl, nr, prr)
        if nl and nr:
            gini = Fraction(nl) - Fraction(pl * pl + (nl - pl) ** 2, nl)
            gini += Fraction(nr) - Fraction(prr * prr + (nr - prr) ** 2, nr)
            if best is None or gini < best[0]:
                best = (gini, f)
    spark_best = max(rows, key=lambda r: (r.purity_nanos, -r.threshold))
    assert spark_best.threshold == best[1]


def test_neyman_allocations_sum_to_budget(spark):
    rows = _df("neyman_allocation", spark).collect()
    assert sum(r.n_alloc for r in rows) == 1000
    # bigger N*S gets at least as many seats (up to the +-1 remainder)
    srt = sorted(rows, key=lambda r: r.nh * r.sd_nanos)
    for a, b in zip(srt, srt[1:]):
        assert b.n_alloc >= a.n_alloc - 1


def test_l_diversity_python_replay(spark):
    row = _df("l_diversity_audit", spark).collect()[0]
    t = pq.read_table(
        f"{SF_DIR}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    ).to_pydict()
    groups = {}
    for n, s, b in zip(t["c_nationkey"], t["c_mktsegment"], t["c_acctbal"]):
        g = groups.setdefault((n, _tdiv(_cents(b), 100000)), [0, set()])
        g[0] += 1
        g[1].add(s)
    assert row.n_groups == len(groups)
    assert row.min_l == min(len(s) for _, s in groups.values())
    assert row.n_homogeneous_groups == sum(
        1 for _, s in groups.values() if len(s) < 2
    )
    assert row.n_rows_at_risk == sum(
        k for k, s in groups.values() if len(s) < 2
    )


# ---------------------------------------------------------------------------
# similarity_join_prefix / nelson_aalen


def test_prefix_filter_is_complete_and_pruning(spark):
    """Every Jaccard>=0.8 pair survives (completeness vs a brute-force
    Python scan over the bounded subset) AND the prefix candidate set
    is strictly smaller than the full token-join candidate set."""
    import re

    rows = _df("similarity_join_prefix", spark).collect()
    got = {(r.a, r.b) for r in rows}
    t = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    docs = {}
    for did, txt in zip(t["doc_id"], t["text"]):
        if did < 150:
            docs[did] = set(x for x in re.split(r"[^a-z]+", txt.lower()) if x)
            cut = txt[: int(len(txt) * 0.9)]
            docs[did + 1_000_000] = set(
                x for x in re.split(r"[^a-z]+", cut.lower()) if x
            )
    ids = sorted(docs)
    expect = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(docs[a] & docs[b])
            union = len(docs[a] | docs[b])
            if inter * 5 >= union * 4:
                expect.add((a, b))
    assert got == expect
    for r in rows:
        a, b = r.a, r.b
        assert r.inter == len(docs[a] & docs[b])
        assert r.union_sz == len(docs[a] | docs[b])
        assert r.jaccard_nanos == r.inter * 10**9 // r.union_sz


def test_nelson_aalen_vs_km_relationship(spark):
    """H(t) is non-decreasing, each increment equals d/n at that day,
    and the risk sets match kaplan_meier's exactly."""
    na = sorted(_df("nelson_aalen", spark).collect(), key=lambda r: r.day)
    km = {
        r.day: r
        for r in SPECS["kaplan_meier"].builder(spark, SF_DIR).collect()
    }
    prev = 0
    for r in na:
        inc = r.cum_hazard_nanos - prev
        assert inc == r.n_events * 10**9 // r.n_risk, r
        assert inc >= 0
        prev = r.cum_hazard_nanos
        k = km[r.day]
        assert (k.n_risk, k.n_events, k.n_censored) == (
            r.n_risk,
            r.n_events,
            r.n_censored,
        )
