"""Round-9 operator tests: semantic invariants and plan shapes for the
OHLC/EWMA time-series pair, the skip-gram/walk training-data
generators, and the target-encode/AUC/DBSCAN ML trio (SURVEY.md §4/§5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.catalog import table
from blockchain2graphdb_spark.plans.inspect import (
    plan_string,
    unpartitioned_unbounded_windows,
)

from conftest import SF_DIR

SPECS = registry.load_all()


def _df(name, spark):
    return SPECS[name].builder(spark, SF_DIR)


# ---------------------------------------------------------------- OHLC


def test_ohlc_bounds_and_counts(spark):
    """open/close lie within [low, high] on every candle, and candle
    counts re-aggregate to the raw event count per type."""
    rows = _df("resample_ohlc", spark).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n >= 1
    per_type = {}
    for r in rows:
        per_type[r.event_type] = per_type.get(r.event_type, 0) + r.n
    raw = {
        r.event_type: r.n
        for r in table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_type == raw


def test_ohlc_single_keyed_shuffle(spark):
    """The window pick and the candle aggregate share one (event_type,
    bucket) partitioning — no second data shuffle, no unpartitioned
    window."""
    df = _df("resample_ohlc", spark)
    assert not unpartitioned_unbounded_windows(df)
    # one real exchange for the keyed window+agg; anything further must
    # be a reuse, not a second repartitioning of the data
    plan = plan_string(df)
    assert plan.count("Exchange") <= 2, plan


# ---------------------------------------------------------------- EWMA


def test_ewma_head_and_denominator_geometry(spark):
    """Each user's first event renormalizes to the plain value
    (ewma_micros == cv * 10000), and every denominator is one of the
    telescoped partial-weight sums 256 - 2^(8-m)."""
    rows = _df("ewma_trailing", spark).collect()
    assert rows
    valid_dens = {256 - (1 << (8 - m)) for m in range(1, 9)}
    firsts = {}
    for r in rows:
        assert r.den in valid_dens, r
        key = (r.us, r.event_id)
        if r.user_id not in firsts or key < firsts[r.user_id][0]:
            firsts[r.user_id] = (key, r)
    for _, r in firsts.values():
        assert r.den == 128
        assert r.ewma_micros == r.cv * 10000


# ------------------------------------------------------------ skipgram


def test_skipgram_pairs_canonical_and_ranked(spark):
    """Pairs are canonicalized (a < b), self-pairs excluded, and the
    top-100 is ordered by (count DESC, a, b)."""
    rows = _df("skipgram_pairs", spark).collect()
    assert 0 < len(rows) <= 100
    keys = [(-r.c_ab, r.a, r.b) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r.a < r.b
        assert 1 <= r.c_ab
        assert r.c_a >= 1 and r.c_b >= 1


def test_skipgram_topk_is_take_ordered_not_global_sort(spark):
    plan = plan_string(_df("skipgram_pairs", spark))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Cartesian" not in plan, plan


# --------------------------------------------------------------- walks


def test_walks_are_real_trajectories(spark):
    """Every seed yields exactly steps 0..3 with alternating node types,
    and every consecutive (order, part) hop is a real lineitem edge."""
    rows = _df("random_walk_sample", spark).collect()
    assert rows
    by_seed = {}
    for r in rows:
        by_seed.setdefault(r.seed, {})[r.step] = r
    edges = {
        (r.o, r.p)
        for r in table(spark, SF_DIR, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .collect()
    }
    for seed, steps in by_seed.items():
        assert set(steps) == {0, 1, 2, 3}
        assert [steps[t].node_type for t in range(4)] == [
            "order", "part", "order", "part",
        ]
        assert steps[0].node == seed
        assert (steps[0].node, steps[1].node) in edges
        assert (steps[2].node, steps[1].node) in edges
        assert (steps[2].node, steps[3].node) in edges


def test_walks_deterministic_across_invocations(spark):
    """The hash-driven picks are a pure function of the data — two
    independent builds produce identical trajectories."""
    a = sorted(map(tuple, _df("random_walk_sample", spark).collect()))
    b = sorted(map(tuple, _df("random_walk_sample", spark).collect()))
    assert a == b


# ------------------------------------------------------- target encode


def test_target_encode_shrinks_toward_global_mean(spark):
    """Smoothing must pull every category's encoding strictly between
    its raw mean and the global mean (or onto them), and category
    counts must cover the table."""
    rows = _df("target_encode", spark).collect()
    orders = (
        table(spark, SF_DIR, "orders")
        .select("o_orderpriority", "o_totalprice")
        .toPandas()
    )
    g_mean = orders.o_totalprice.mean()
    assert sum(r.n for r in rows) == len(orders)
    for r in rows:
        raw_mean = orders[orders.o_orderpriority == r.cat].o_totalprice.mean()
        # enc_micros is micros-of-cents, trunc-divided once (r15 form:
        # the raw num/den rational was dropped — its numerator grows
        # O(S*N) and overflowed int64 at the sf1 decade)
        enc = r.enc_micros / 1e6 / 100.0
        lo, hi = min(raw_mean, g_mean), max(raw_mean, g_mean)
        assert lo - 1e-6 <= enc <= hi + 1e-6
        # replay the exact integer formation in Python bigints
        sub = orders[orders.o_orderpriority == r.cat]
        s_cat = int(round(sub.o_totalprice.sum() * 100))
        s_tot = int(round(orders.o_totalprice.sum() * 100))
        n_tot = len(orders)
        want = (s_cat * n_tot + 10 * s_tot) * 1_000_000 // (n_tot * (r.n + 10))
        assert r.enc_micros == want


# ----------------------------------------------------------------- AUC


def test_auc_matches_pandas_rank_formula(spark):
    """Exact AUC equals the tie-aware Mann-Whitney computation from
    pandas average ranks."""
    r = _df("auc_exact", spark).collect()[0]
    orders = (
        table(spark, SF_DIR, "orders")
        .select("o_orderstatus", "o_totalprice")
        .toPandas()
    )
    pos = orders.o_orderstatus == "F"
    ranks = orders.o_totalprice.rank(method="average")
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    auc = (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert (r.n_pos, r.n_neg) == (n_pos, n_neg)
    assert abs(r.auc - auc) < 1e-12
    assert 0.0 <= r.auc <= 1.0


# -------------------------------------------------------------- DBSCAN


def test_dbscan_core_matches_bruteforce(spark):
    """Grid-bucketed eps-neighbor counts equal the O(N^2) brute force on
    the small fixture — the cell join loses no neighbors."""
    rows = _df("dbscan_core", spark).collect()
    pts = np.array([[r.id, r.x, r.y] for r in rows])
    xy = pts[:, 1:].astype(np.int64)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(axis=2)
    within = (d2 <= 150 * 150).sum(axis=1) - 1  # minus self
    got = {int(r.id): (r.n_in_eps, r.is_core) for r in rows}
    for i, pid in enumerate(pts[:, 0]):
        n = int(within[i])
        assert got[int(pid)] == (n, n + 1 >= 4)


def test_dbscan_is_cell_equi_join(spark):
    plan = plan_string(_df("dbscan_core", spark))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan


# ----------------------------------------------- embedding cosine dedup


def test_embedding_cosine_dedup_threshold_does_real_work(spark):
    """The x1.02 rescale cohort must be recovered (cosine ~1 after
    quantization; >= 45/50 allows rare sign-LSH boundary flips); a
    x0.6+0.25 shifted copy must NEVER match its own original (the
    offset swamps the original direction) — though shifted copies
    legitimately match EACH OTHER, all being near the constant vector;
    and every surfaced cosine clears the threshold."""
    rows = _df("dedup_embedding_cosine", spark).collect()
    assert rows
    rescued = {r.a for r in rows if r.b == r.a + 1_000_000}
    assert len(rescued) >= 45, len(rescued)
    assert not any(r.b == r.a + 2_000_000 for r in rows)
    for r in rows:
        assert r.cosine >= 0.95 - 1e-12
        assert r.a < r.b


def test_embedding_cosine_dedup_is_bucket_join(spark):
    plan = plan_string(_df("dedup_embedding_cosine", spark))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan


# -------------------------------------------------- lift / onehot / bins


def test_lift_gain_is_monotone_and_totals(spark):
    """Cumulative gain is nondecreasing and ends at exactly 1.0 (1e9
    nanos); deciles differ by at most one row; totals cover the table."""
    rows = sorted(_df("lift_gain_table", spark).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(10))
    sizes = {r.n_rows for r in rows}
    assert max(sizes) - min(sizes) <= 1
    gains = [r.cum_gain_nanos for r in rows]
    assert gains == sorted(gains)
    assert gains[-1] == 1_000_000_000
    n_orders = table(spark, SF_DIR, "orders").count()
    assert sum(r.n_rows for r in rows) == n_orders


def test_onehot_rows_are_one_hot(spark):
    """Exactly one indicator fires per row (incl. the OTHER column)."""
    df = _df("onehot_encode", spark)
    ind = [c for c in df.columns if c.startswith("seg_")]
    bad = df.where(sum(F.col(c) for c in ind) != 1).count()
    assert bad == 0


def test_quantile_bucketize_edges_nest(spark):
    """Equi-depth bins: sizes differ by at most one and each bin's hi
    <= the next bin's lo (edges from the same aggregate can't cross)."""
    rows = sorted(_df("quantile_bucketize", spark).collect(), key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(4))
    sizes = [r.n_rows for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


def test_bucketed_rank_matches_global_row_number(spark):
    """The two-pass rank helper reproduces the unpartitioned
    row_number exactly (bucket monotonicity contract holds)."""
    from blockchain2graphdb_spark.functions.ranking import bucketed_global_rank
    from pyspark.sql import Window as W2

    cust = table(spark, SF_DIR, "customer").select("c_custkey", "c_acctbal")
    got = {
        (r.c_custkey, r.pos)
        for r in bucketed_global_rank(
            cust,
            F.floor(F.col("c_acctbal") / 1000).cast("long"),
            [F.col("c_acctbal"), F.col("c_custkey")],
        ).collect()
    }
    want = {
        (r.c_custkey, r.pos)
        for r in cust.select(
            "c_custkey",
            F.row_number()
            .over(W2.orderBy("c_acctbal", "c_custkey"))
            .cast("long")
            .alias("pos"),
        ).collect()
    }
    assert got == want


# --------------------------------------- eval metrics / stats (batch 2)


def test_confusion_cells_partition_the_table(spark):
    """tp+fp+fn+tn == |orders| and every derived rate is in [0, 1e9]."""
    r = _df("confusion_threshold", spark).collect()[0]
    assert r.tp + r.fp + r.fn + r.tn == table(spark, SF_DIR, "orders").count()
    for c in ("precision_nanos", "recall_nanos", "f1_nanos", "accuracy_nanos"):
        assert 0 <= r[c] <= 1_000_000_000
    # F1 is the harmonic mean: between min and max of precision/recall
    assert min(r.precision_nanos, r.recall_nanos) - 1 <= r.f1_nanos
    assert r.f1_nanos <= max(r.precision_nanos, r.recall_nanos) + 1


def test_woe_iv_matches_numpy(spark):
    """WOE/IV against a NumPy recomputation from raw counts."""
    import math

    cust = table(spark, SF_DIR, "customer").select("c_mktsegment", "c_acctbal")
    pdf = cust.toPandas()
    good = pdf[pdf.c_acctbal >= 0].groupby("c_mktsegment").size()
    bad = pdf[pdf.c_acctbal < 0].groupby("c_mktsegment").size()
    tg, tb = int(good.sum()), int(bad.sum())
    for r in _df("woe_iv", spark).collect():
        ng, nb = int(good.get(r.c_mktsegment, 0)), int(bad.get(r.c_mktsegment, 0))
        assert (r.n_good, r.n_bad) == (ng, nb)
        woe = math.log((2 * ng + 1) * tb / ((2 * nb + 1) * tg))
        assert abs(r.woe_nanos - round(woe * 1e9)) <= 1
        iv = (ng / tg - nb / tb) * woe
        assert abs(r.iv_nanos - round(iv * 1e9)) <= 1


def test_mutual_information_nonnegative_and_bounded(spark):
    """MI >= 0 (within quantization) and <= min(H(X), H(Y)) proxy via
    ln of the smaller cardinality."""
    import math

    r = _df("mutual_information", spark).collect()[0]
    assert r.mi_nanos >= -r.n_cells  # each cell rounds within 0.5 nano
    n_seg = table(spark, SF_DIR, "customer").select("c_mktsegment").distinct().count()
    assert r.mi_nats <= math.log(n_seg) + 1e-6


def test_corr_pairs_matches_numpy(spark):
    """Pearson r against numpy.corrcoef on the same cents-quantized
    columns, per return flag."""
    li = table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    pdf = li.toPandas()
    for r in _df("corr_pairs", spark).collect():
        g = pdf[pdf.l_returnflag == r.l_returnflag]
        x = (g.l_quantity * 100).round().astype("int64")
        y = (g.l_extendedprice * 100).round().astype("int64")
        want = np.corrcoef(x, y)[0, 1]
        assert abs(r.corr_nanos / 1e9 - want) < 1e-6
        assert r.n == len(g)


def test_iqr_outliers_fences_and_count(spark):
    """Fences bracket the quartiles and the outlier census matches a
    pandas recount with the same rank-based quartile definition."""
    r = _df("iqr_outliers", spark).collect()[0]
    assert r.q1 <= r.q3
    assert r.lo_fence <= r.q1 and r.q3 <= r.hi_fence
    pdf = table(spark, SF_DIR, "orders").select("o_totalprice").toPandas()
    pc = (pdf.o_totalprice * 100).round().astype("int64").sort_values().to_numpy()
    n = len(pc)
    q1c, q3c = int(pc[(n + 3) // 4 - 1]), int(pc[(3 * n + 3) // 4 - 1])
    lo2, hi2 = 2 * q1c - 3 * (q3c - q1c), 2 * q3c + 3 * (q3c - q1c)
    want = int(((2 * pc < lo2) | (2 * pc > hi2)).sum())
    assert r.n_outliers == want and r.n == n


def test_acf_lag_zero_equivalent_and_range(spark):
    """ACF values lie in [-1, 1] (within quantization) and num/den are
    consistent with the published ratio."""
    rows = _df("acf_lags", spark).collect()
    assert {r.lag for r in rows} <= set(range(1, 8))
    for r in rows:
        assert abs(r.acf_nanos) <= 1_000_000_001
        assert r.acf_nanos == round(r.num / r.den * 1e9)


def test_trend_ols_matches_numpy_polyfit(spark):
    """Slope/intercept against numpy.polyfit on the same daily series."""
    from blockchain2graphdb_spark.operators.timeseries import _daily_counts

    daily = _daily_counts(spark, SF_DIR).toPandas()
    for r in _df("trend_ols", spark).collect():
        g = daily[daily.event_type == r.event_type]
        slope, intercept = np.polyfit(g.day.astype(float), g.n.astype(float), 1)
        assert abs(r.slope_nanos / 1e9 - slope) < 1e-5
        assert abs(r.intercept_nanos / 1e9 - intercept) < max(
            1e-4, abs(intercept) * 1e-7
        )


def test_window_lead_nth_semantics(spark):
    """For one customer: lead is the next row's price, nth_value(2) is
    null on the first row and the second order's price after."""
    df = _df("window_lead_nth", spark)
    orders = (
        table(spark, SF_DIR, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .toPandas()
    )
    got = df.toPandas().set_index("o_orderkey")
    g = (
        orders[orders.o_custkey == orders.o_custkey.iloc[0]]
        .sort_values(["o_orderdate", "o_orderkey"])
        .reset_index(drop=True)
    )
    for i, row in g.iterrows():
        want_next = g.o_totalprice[i + 1] if i + 1 < len(g) else None
        want_second = g.o_totalprice[1] if i >= 1 else None
        gr = got.loc[row.o_orderkey]
        assert (gr.next_price == want_next) or (
            want_next is None and pd.isna(gr.next_price)
        )
        assert (gr.second_price == want_second) or (
            want_second is None and pd.isna(gr.second_price)
        )


def test_new_stats_ops_have_no_unpartitioned_data_windows(spark):
    """The batch-2 stats operators never put an unpartitioned unbounded
    window over data-scale input (tiny aggregate tables are exempt by
    construction: iqr/corr/MI plans contain none at all)."""
    for key in ("corr_pairs", "mutual_information", "confusion_threshold",
                "woe_iv", "iqr_outliers"):
        assert unpartitioned_unbounded_windows(_df(key, spark)) == [], key


# -------------------------------- containment / outliers / readability


def test_containment_catches_seeded_twins(spark):
    """Every anchor-detected twin pair is reported with the twin as the
    contained side at containment ~1.0 (verbatim extract)."""
    rows = _df("dedup_containment", spark).collect()
    assert rows
    twins = [r for r in rows if r.contained_doc >= 2_000_000]
    assert len(twins) >= len(rows) * 0.9  # corpus has few natural pairs
    for r in rows:
        assert r.contained_doc != r.container_doc
        assert 0 < r.n_inter <= r.n_small
        assert r.containment_nanos >= 800_000_000
    for r in twins:
        # extract of the container: every 3-gram of the twin exists in it
        if r.container_doc == r.contained_doc - 2_000_000:
            assert r.containment_nanos == 1_000_000_000


def test_embedding_outlier_matches_numpy(spark):
    """d2n2 equals the numpy n^2-scaled squared distance to the label
    centroid, and each label surfaces its true argmax."""
    emb = table(spark, SF_DIR, "embeddings").toPandas()
    got = _df("embedding_outlier_topk", spark).toPandas()
    assert (got.groupby("label").size() == 5).all()
    for label, g in got.groupby("label"):
        sub = emb[emb.label == label]
        q = np.round(np.stack(sub.embedding.to_numpy()).astype(np.float64) * 1000)
        n = len(sub)
        s = q.sum(axis=0)
        d2n2 = ((n * q - s) ** 2).sum(axis=1)
        want_top = d2n2.max()
        top = g.sort_values(["d2n2", "vec_id"], ascending=[False, True]).iloc[0]
        assert top.d2n2 == int(want_top)
        by_id = dict(zip(sub.vec_id, d2n2))
        for r in g.itertuples():
            assert by_id[r.vec_id] == r.d2n2


def test_readability_matches_python(spark):
    """Flesch score against a pure-Python recount on 25 docs."""
    import re as _re

    docs = table(spark, SF_DIR, "documents").limit(25).toPandas()
    got = _df("text_readability", spark).toPandas().set_index("doc_id")
    for r in docs.itertuples():
        words = max(len([t for t in _re.split(r"[^a-z]+", r.text.lower()) if t]), 1)
        sents = max(len(_re.findall(r"[.!?]+", r.text)), 1)
        syls = max(len(_re.findall(r"[aeiouy]+", r.text.lower())), 1)
        g = got.loc[r.doc_id]
        assert (g.n_words, g.n_sentences, g.n_syllables) == (words, sents, syls)
        want = 206.835 - 1.015 * words / sents - 84.6 * syls / words
        assert abs(g.flesch_micros - round(want * 1e6)) <= 1


# ------------------------------------------------------ partition prune


def test_partition_prune_reaches_the_scan(spark):
    """The event_type filter must appear as a PartitionFilter (directory
    pruning), not a data filter, and only pruned-partition files are
    read; results equal the unpartitioned scan's."""
    df = _df("scan_partition_prune", spark)
    plan = plan_string(df)
    assert "PartitionFilters" in plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters:" in ln][0]
    assert "event_type" in pf and "click" in pf, pf
    want = {
        (r.user_id, r.n_clicks, round(r.value_sum, 2))
        for r in table(spark, SF_DIR, "events")
        .where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clicks"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        )
        .collect()
    }
    got = {(r.user_id, r.n_clicks, round(r.value_sum, 2)) for r in df.collect()}
    assert got == want


# --------------------------------------------- hashing trick / group CV


def test_feature_hashing_buckets_cover_all_features(spark):
    """Every distinct feature string lands in exactly one bucket and
    the census row counts re-total to 2x the customer count."""
    rows = _df("feature_hashing", spark).collect()
    n_cust = table(spark, SF_DIR, "customer").count()
    assert sum(r.n_rows for r in rows) == 2 * n_cust
    assert all(0 <= r.bucket < 32 for r in rows)
    assert all(r.n_features >= 1 for r in rows)
    n_seg = (
        table(spark, SF_DIR, "customer").select("c_mktsegment").distinct().count()
    )
    n_nat = (
        table(spark, SF_DIR, "customer").select("c_nationkey").distinct().count()
    )
    assert sum(r.n_features for r in rows) == n_seg + n_nat


def test_group_kfold_keeps_users_whole(spark):
    """Each user appears in exactly one fold (group integrity) and
    event counts re-total to the table."""
    rows = _df("group_kfold", spark).collect()
    ev = table(spark, SF_DIR, "events")
    assert sum(r.n_events for r in rows) == ev.count()
    assert sum(r.n_users for r in rows) == ev.select("user_id").distinct().count()
    assert all(0 <= r.fold < 5 for r in rows)


# --------------------------------------------------------- session paths


def test_session_path_topk_matches_pandas(spark):
    """Full pandas recompute: gap-sessionize, in-session trigrams only
    (no session-boundary leakage), global top-20 by (n DESC, path)."""
    from blockchain2graphdb_spark.catalog import SESSION_GAP_US

    ev = (
        table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "event_type", F.unix_micros("ts").alias("us"))
        .toPandas()
        .sort_values(["user_id", "us", "event_id"])
    )
    counts = {}
    for _, g in ev.groupby("user_id"):
        rows = list(g.itertuples())
        sess, prev_us = 0, None
        tagged = []
        for r in rows:
            if prev_us is None or r.us - prev_us > SESSION_GAP_US:
                sess += 1
            prev_us = r.us
            tagged.append((sess, r.event_type))
        for i in range(len(tagged) - 2):
            if tagged[i][0] == tagged[i + 2][0]:
                p = ">".join(t for _, t in tagged[i : i + 3])
                counts[p] = counts.get(p, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.path, r.n) for r in _df("session_path_topk", spark).collect()]
    assert got == want


def test_session_path_topk_is_take_ordered(spark):
    plan = plan_string(_df("session_path_topk", spark))
    assert "TakeOrderedAndProject" in plan, plan
