"""Round-9 third-batch operator tests: exact embedding covariance,
hierarchy subtree rollup via path enumeration, and runtime (dynamic)
partition pruning (SURVEY.md §4/§5 test strategy: numpy/pandas parity
pins the math, plan assertions pin the scale shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.catalog import table
from blockchain2graphdb_spark.plans.inspect import plan_string

from conftest import SF_DIR

SPECS = registry.load_all()


def _df(name, spark):
    return SPECS[name].builder(spark, SF_DIR)


# ------------------------------------------------- embedding covariance


def test_embedding_covariance_numpy_parity(spark):
    """cov_n2 == n * S_ij - S_i * S_j over the quantized vectors,
    recomputed with numpy int64 matrices — exact equality, no slack."""
    out = _df("embedding_covariance", spark).toPandas()
    vecs = (
        table(spark, SF_DIR, "embeddings")
        .select("embedding")
        .toPandas()["embedding"]
    )
    q = np.rint(np.stack(vecs.to_numpy()).astype(np.float64) * 1000).astype(
        np.int64
    )
    n = q.shape[0]
    s = q.sum(axis=0)
    sij = q.T @ q  # d x d exact in int64 at fixture scale
    expect = n * sij - np.outer(s, s)
    assert len(out) == q.shape[1] * (q.shape[1] + 1) // 2
    for r in out.itertuples():
        assert expect[r.i - 1, r.j - 1] == r.cov_n2, (r.i, r.j)


def test_embedding_covariance_diag_nonneg(spark):
    """Diagonal entries are n^2 * variance >= 0."""
    out = _df("embedding_covariance", spark)
    bad = out.where((F.col("i") == F.col("j")) & (F.col("cov_n2") < 0)).count()
    assert bad == 0


def test_embedding_covariance_single_scan_no_pairwise(spark):
    """The d^2 cross moments come from generator + hash aggregate —
    no join touches the n-sized side (joins are the 3 broadcast
    folds onto the 2080-row moment table)."""
    p = plan_string(_df("embedding_covariance", spark))
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    # formatted plans list each node twice (tree + detail): 3 joins -> 6
    assert p.count("BroadcastHashJoin") + p.count("BroadcastNestedLoopJoin") <= 6


# ---------------------------------------------------- subtree rollup


def test_subtree_rollup_pandas_parity(spark):
    """Subtree totals match a pandas recomputation that walks the
    parent function explicitly per node."""
    out = (
        _df("subtree_rollup", spark)
        .toPandas()
        .set_index("node")
        .sort_index()
    )
    part = (
        table(spark, SF_DIR, "part")
        .select(
            "p_partkey",
            (F.col("p_retailprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("c"),
        )
        .toPandas()
    )
    agg: dict[int, list[int]] = {}
    for p, c in zip(part.p_partkey, part.c):
        node = int(p)
        chain = [node]
        while node >= 10:
            node //= 10
            chain.append(node)
        for a in chain:
            e = agg.setdefault(a, [0, 0])
            e[0] += 1
            e[1] += int(c)
    assert len(out) == len(agg)
    for a, (cnt, cents) in agg.items():
        assert out.loc[a, "n_subtree"] == cnt
        assert out.loc[a, "subtree_cents"] == cents


def test_subtree_rollup_is_joinless(spark):
    """Path enumeration: one generator + one aggregate, zero joins."""
    p = plan_string(_df("subtree_rollup", spark))
    assert "Join" not in p
    assert "Generate" in p and "HashAggregate" in p


def test_subtree_root_covers_everything(spark):
    """Every part rolls up into some depth-1 root (node < 10), and the
    roots' subtree counts sum to the part count."""
    out = _df("subtree_rollup", spark).toPandas()
    n_parts = table(spark, SF_DIR, "part").count()
    roots = out[out.node < 10]
    assert roots.n_subtree.sum() == n_parts


# ------------------------------------- runtime (dynamic) partition pruning


def test_dpp_plan_has_dynamicpruning(spark):
    """The fact scan's PartitionFilters carry a dynamicpruning
    subquery — runtime pruning, not just the statically propagated
    predicate."""
    df = _df("join_partition_prune_runtime", spark)
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in p
    assert "PartitionFilters" in p


def test_dpp_matches_unpartitioned_join(spark):
    """Pruned-scan results equal the same join over the flat table."""
    out = (
        _df("join_partition_prune_runtime", spark)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    ev = table(spark, SF_DIR, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .where(
            F.conv(F.substring(F.md5("event_type"), 1, 1), 16, 10).cast("long")
            % 2
            == 0
        )
    )
    flat = (
        ev.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        )
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    pd.testing.assert_frame_equal(out, flat)


def test_dpp_keeps_a_proper_subset(spark):
    """The parity filter keeps some types and drops others — the
    pruning is real, not vacuous."""
    out = _df("join_partition_prune_runtime", spark).toPandas()
    n_types = (
        table(spark, SF_DIR, "events").select("event_type").distinct().count()
    )
    assert 0 < len(out) < n_types


# -------------------------- distributed CC witness at corpus scale


def test_wallet_components_sf01_unionfind_parity(spark):
    """Corpus-scale witness for the DISTRIBUTED Shiloach-Vishkin path:
    at sf0.1 the wallet graph is ~900k (symmetrized) edges — far past
    driver_threshold, so the scale path runs — and the recursive-CTE
    oracle is infeasible in DuckDB there (quadratic on the giant
    component). A pure-Python union-find over the same
    star-contraction edges supplies the exact expected labels."""
    sf = "/root/testdata/sf0.1"
    out = SPECS["wallet_components"].builder(spark, sf).toPandas()
    li = (
        table(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .toPandas()
    )
    src = li.groupby("l_orderkey").l_partkey.transform("min")
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(src.to_numpy(), li.l_partkey.to_numpy()):
        a, b = int(a), int(b)
        if a == b:
            continue
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    expect = {n: find(n) for n in parent}
    got = dict(zip(out.part.astype(int), out.component.astype(int)))
    assert got == expect


# ------------------------------------ native recursive CTE hierarchy


def test_recursive_cte_matches_arithmetic_walk(spark):
    """The WITH RECURSIVE walk agrees with a direct arithmetic
    recomputation of depth (number of div-10 steps to the root) and
    root per node."""
    out = (
        _df("recursive_cte_hierarchy", spark)
        .toPandas()
        .set_index("node")
        .sort_index()
    )
    keys = table(spark, SF_DIR, "part").select("p_partkey").toPandas().p_partkey
    assert len(out) == len(keys)
    for p in keys:
        node, depth = int(p), 0
        while node >= 10:
            node //= 10
            depth += 1
        assert out.loc[p, "depth"] == depth
        assert out.loc[p, "root"] == node


def test_recursive_cte_consistent_with_subtree_rollup(spark):
    """Roots found by the recursive walk are exactly the depth-1 roots
    subtree_rollup aggregates into (node < 10)."""
    roots = set(
        _df("recursive_cte_hierarchy", spark)
        .select("root")
        .distinct()
        .toPandas()
        .root
    )
    rollup_roots = set(
        _df("subtree_rollup", spark).where(F.col("node") < 10).toPandas().node
    )
    assert roots == rollup_roots


# --------------------------------------------- VARIANT path extraction


def test_variant_extract_matches_plain_groupby(spark):
    """The VARIANT round-trip (build JSON -> parse_json ->
    try_variant_get) loses nothing: results equal the direct
    aggregate over the raw columns."""
    out = (
        _df("variant_extract", spark).toPandas().set_index("t").sort_index()
    )
    ev = table(spark, SF_DIR, "events")
    direct = (
        ev.groupBy(F.col("event_type").alias("t"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("user_id").cast("long").alias("u_sum"),
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("cents_sum"),
        )
        .toPandas()
        .set_index("t")
        .sort_index()
    )
    pd.testing.assert_frame_equal(out, direct)


# ----------------------------------- list_rank quad-stride pointer jump


def test_list_rank_long_chain_quad_stride(spark):
    """A 150-node shuffled-id chain (4 quad-stride barriers: 4^4 >=
    150) plus a singleton ranks exactly."""
    import random

    from blockchain2graphdb_spark.graph.components import list_rank

    random.seed(7)
    ids = list(range(1000, 1150))
    random.shuffle(ids)
    rows = (
        [(ids[0], None)]
        + [(ids[k], ids[k - 1]) for k in range(1, 150)]
        + [(5, None)]
    )
    df = spark.createDataFrame(rows, "id long, parent long")
    out = {r.id: r.pos for r in list_rank(df, "id", "parent").collect()}
    expect = {ids[k]: k + 1 for k in range(150)}
    expect[5] = 1
    assert out == expect


# --------------------------------------- join-view incremental refresh


def test_ivm_join_delta_matches_monolithic(spark):
    """The delta algebra (dA:B0 + A0:dB + dA:dB folded with the old
    view) reproduces the from-scratch join bit-for-bit."""
    out = (
        _df("ivm_join_delta", spark)
        .toPandas()
        .set_index("o_orderstatus")
        .sort_index()
    )
    orders = table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus")
    li = table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", F.col("l_extendedprice").cast("decimal(18,2)").alias("p")
    )
    full = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("p").cast("double").alias("price_sum"),
        )
        .toPandas()
        .set_index("o_orderstatus")
        .sort_index()
    )
    pd.testing.assert_frame_equal(out, full)


def test_ivm_join_delta_has_exactly_four_join_terms(spark):
    """Plan evidence: exactly the four IVM terms join (old view + three
    delta terms) — no fifth join recomputing the unsplit bases."""
    p = plan_string(_df("ivm_join_delta", spark))
    joins = sum(
        p.count(j)
        for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    )
    # formatted plans list each node twice (tree + detail): 4 joins -> 8
    assert joins == 8, joins


# ------------------------------------------------ CDC feed compaction


def test_cdc_apply_pandas_parity(spark):
    """Last-writer-wins compaction matches a pandas replay of the same
    derived feed."""
    row = _df("cdc_apply", spark).collect()[0]
    o = (
        table(spark, SF_DIR, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .toPandas()
    )
    state: dict[int, int | None] = {}
    for k, c in zip(o.k, o.cents):
        state[int(k)] = int(c)
    for k, c in zip(o.k, o.cents):
        if k % 3 == 0:
            state[int(k)] = int(c) + 500
    for k in o.k:
        if k % 5 == 0:
            state.pop(int(k), None)
    live = [v for v in state.values() if v is not None]
    assert row.n_live == len(live)
    assert row.cents_sum == sum(live)
    assert row.n_updated_tail == sum(1 for v in live if v % 1000 == 500)


def test_cdc_apply_uses_window_group_limit(spark):
    """The per-key latest compiles to a WindowGroupLimit partial top-1,
    not a full window materialization."""
    p = plan_string(_df("cdc_apply", spark))
    assert "WindowGroupLimit" in p


# --------------------------------------------- interval-overlap join


def test_interval_overlap_pandas_parity(spark):
    """Grid-bucketed pair counts match a quadratic pandas sweep."""
    out = (
        _df("join_interval_overlap", spark)
        .toPandas()
        .set_index("l_suppkey")
        .sort_index()
    )
    li = table(spark, SF_DIR, "lineitem").toPandas()
    li = li[
        (li.l_shipdate >= pd.Timestamp("1997-01-01"))
        & (li.l_shipdate < pd.Timestamp("1998-01-01"))
    ]
    epoch = pd.Timestamp("1970-01-01")
    s = (li.l_shipdate.dt.normalize() - epoch).dt.days.to_numpy()
    e = s + (li.l_quantity.astype("int64") % 30 + 1).to_numpy()
    key = list(
        zip(li.l_suppkey, li.l_orderkey, li.l_linenumber, li.l_partkey)
    )
    counts: dict[int, int] = {}
    idx_by_supp: dict[int, list[int]] = {}
    for i, k in enumerate(key):
        idx_by_supp.setdefault(int(k[0]), []).append(i)
    for supp, idxs in idx_by_supp.items():
        c = 0
        for x in range(len(idxs)):
            for y in range(len(idxs)):
                i, j = idxs[x], idxs[y]
                if key[i][1:] < key[j][1:] and s[i] < e[j] and s[j] < e[i]:
                    c += 1
        if c:
            counts[supp] = c
    assert dict(zip(out.index, out.n_pairs)) == counts


def test_interval_overlap_no_cartesian(spark):
    """The plan joins on (supplier, week-cell) equi-keys — no
    cartesian/nested-loop pair generation."""
    p = plan_string(_df("join_interval_overlap", spark))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# ---------------------------------------------- Python UDTF (lateral)


def test_udtf_lateral_matches_relational_twin(spark):
    """The @udtf lateral form equals the JVM-side tokenize + groupBy."""
    out = (
        _df("udtf_lateral", spark)
        .toPandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    rel = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .where(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .where(F.col("tf") >= 3)
        .toPandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, rel)


# --------------------------------------------------------- ORC source


def test_scan_orc_pushes_filters(spark):
    """The residue filter and column pruning reach the ORC scan."""
    p = plan_string(_df("scan_orc", spark))
    assert "PushedFilters" in p
    assert "orc" in p.lower()


def test_scan_orc_matches_parquet(spark):
    """ORC round-trip preserves values: same aggregate from parquet."""
    out = (
        _df("scan_orc", spark).toPandas().set_index("o_orderstatus").sort_index()
    )
    pq_side = (
        table(spark, SF_DIR, "orders")
        .where(F.col("o_orderkey") % 4 == 1)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("price_sum"),
        )
        .toPandas()
        .set_index("o_orderstatus")
        .sort_index()
    )
    pd.testing.assert_frame_equal(out, pq_side)


# -------------------------------------------- streaming CDC state fold


def test_stream_cdc_apply_equals_batch_twin(spark):
    """The streaming versioned-state fold lands on exactly the batch
    cdc_apply result."""
    s_row = _df("stream_cdc_apply", spark).collect()[0]
    b_row = _df("cdc_apply", spark).collect()[0]
    assert s_row.asDict() == b_row.asDict()
