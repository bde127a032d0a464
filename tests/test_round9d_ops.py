"""Round-9 second-batch operator tests: CUPED / time-to-convert
experiment readouts, multi-feature OLS, winsorization, group-median
imputation, TWAP, the Zipf-law fit, and zone-map file skipping
(SURVEY.md §4/§5 test strategy: numpy/pandas parity pins the math,
plan assertions pin the scale shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.catalog import table
from blockchain2graphdb_spark.operators.relational import _zonemap_plan
from blockchain2graphdb_spark.plans.inspect import (
    plan_string,
    pushed_filters,
    unpartitioned_unbounded_windows,
)

from conftest import SF_DIR

SPECS = registry.load_all()

_DAY_US = 24 * 3_600 * 1_000_000


def _df(name, spark):
    return SPECS[name].builder(spark, SF_DIR)


def _events_pd(spark):
    return (
        table(spark, SF_DIR, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("us"),
            (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
        )
        .toPandas()
    )


# ---------------------------------------------------------------- CUPED


def test_cuped_numpy_parity(spark):
    """theta and rho^2 match a float64 numpy recomputation of the same
    per-user pre/post reduction (within quantization slack)."""
    row = _df("cuped_adjustment", spark).collect()[0]
    e = _events_pd(spark)
    cutoff = (e.us.min() + e.us.max()) // 2
    g = e.assign(
        x=np.where(e.us < cutoff, e.cents, 0),
        y=np.where(e.us >= cutoff, e.cents, 0),
    ).groupby("user_id")[["x", "y"]].sum()
    assert row.n == len(g)
    cov = np.cov(g.x, g.y, ddof=0)
    theta = cov[0, 1] / cov[0, 0]
    rho2 = cov[0, 1] ** 2 / (cov[0, 0] * cov[1, 1])
    assert abs(row.theta_micros - round(theta * 1e6)) <= 2
    assert abs(row.var_reduction_micros - round(rho2 * 1e6)) <= 2
    assert 0 <= row.var_reduction_micros <= 1_000_000


def test_cuped_single_row_reduction_plan(spark):
    """The whole readout is aggregates — no windows, no per-user join
    fan-out beyond the single broadcast cutoff row."""
    df = _df("cuped_adjustment", spark)
    assert not unpartitioned_unbounded_windows(df)
    assert "BroadcastNestedLoopJoin" in plan_string(df)  # the 1-row cutoff


# ------------------------------------------------- funnel time-to-convert


def test_time_to_convert_pandas_parity(spark):
    """Exact nearest-rank latency quantiles match a pandas
    recomputation of first-signup -> first-qualifying-purchase."""
    row = _df("funnel_time_to_convert", spark).collect()[0]
    e = _events_pd(spark)
    s1 = e[e.event_type == "signup"].groupby("user_id").us.min()
    deltas = []
    for uid, t1 in s1.items():
        p = e[(e.user_id == uid) & (e.event_type == "purchase") & (e.us >= t1)]
        if len(p):
            deltas.append(p.us.min() - t1)
    deltas.sort()
    n = len(deltas)
    assert row.n_converted == n
    assert row.min_us == deltas[0] and row.max_us == deltas[-1]
    assert row.median_us == deltas[(n + 1) // 2 - 1]
    assert row.p90_us == deltas[(9 * n + 9) // 10 - 1]


# ---------------------------------------------------------------- OLS


def test_ols_multi_numpy_parity(spark):
    """Closed-form exact betas match numpy lstsq on the same design
    matrix (float64 path agrees to far below the micro quantum)."""
    row = _df("ols_multi", spark).collect()[0]
    li = (
        table(spark, SF_DIR, "lineitem")
        .select(
            F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("x1"),
            (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long").alias("x2"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("y"),
        )
        .toPandas()
    )
    A = np.column_stack([li.x1, li.x2, np.ones(len(li))])
    beta, *_ = np.linalg.lstsq(A, li.y.to_numpy(float), rcond=None)
    assert row.n == len(li)
    assert abs(row.beta1_micros - round(beta[0] * 1e6)) <= 20
    assert abs(row.beta2_micros - round(beta[1] * 1e6)) <= 20
    assert abs(row.intercept_tenth_cents - round(beta[2] * 1e2)) <= 20


def test_ols_multi_is_one_aggregate(spark):
    """The regression is a single reduce: no joins, no windows, one
    exchange for the global aggregate."""
    plan = plan_string(_df("ols_multi", spark))
    assert "Join" not in plan
    # one real exchange (the formatted plan prints each node twice)
    assert plan.count("+- Exchange") <= 1, plan


# ------------------------------------------------------------- winsorize


def test_winsorized_mean_pandas_parity(spark):
    """Fences and per-segment winsorized means match pandas
    nearest-rank quantiles + clip."""
    rows = {r.c_mktsegment: r for r in _df("winsorized_mean", spark).collect()}
    c = (
        table(spark, SF_DIR, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").alias("pc"),
        )
        .toPandas()
        .sort_values(["pc", "c_custkey"])
        .reset_index(drop=True)
    )
    n = len(c)
    lo = c.pc.iloc[(5 * n + 99) // 100 - 1]
    hi = c.pc.iloc[(95 * n + 99) // 100 - 1]
    for seg, g in c.groupby("c_mktsegment"):
        r = rows[seg]
        assert r.n == len(g)
        clipped = g.pc.clip(lo, hi)
        assert r.mean_winsor_micros == round(clipped.sum() / len(g) * 1e4)
        assert r.n_clipped == int(((g.pc < lo) | (g.pc > hi)).sum())
        assert r.mean_raw_micros == round(g.pc.sum() / len(g) * 1e4)


# ------------------------------------------------------------ imputation


def test_impute_group_median_semantics(spark):
    """Non-missing rows keep their value; missing rows all receive
    their type's median of survivors; the mask rate is ~1/16."""
    out = _df("impute_group_median", spark).toPandas()
    e = _events_pd(spark).merge(out, on=["event_id", "event_type"])
    kept = e[e.was_missing == 0]
    assert (kept.cents_imputed == kept.cents).all()
    rate = out.was_missing.mean()
    assert 0.01 < rate < 0.15  # ~1/16 with binomial slack
    meds = (
        kept.sort_values(["cents", "event_id"])
        .groupby("event_type")
        .cents.apply(lambda s: s.iloc[(len(s) + 1) // 2 - 1])
    )
    miss = e[e.was_missing == 1]
    assert (miss.cents_imputed.to_numpy() == meds.loc[miss.event_type].to_numpy()).all()


def test_impute_windows_are_partitioned(spark):
    assert not unpartitioned_unbounded_windows(_df("impute_group_median", spark))


# ---------------------------------------------------------------- TWAP


def test_twap_bounds_and_coverage(spark):
    """Each (user, day) TWAP lies within that group's [min, max] value,
    and covered time = midnight minus first event (contiguous holding
    periods tile the rest of the day exactly)."""
    out = _df("time_weighted_avg", spark).toPandas()
    e = _events_pd(spark)
    e["day"] = e.us // _DAY_US
    g = e.groupby(["user_id", "day"])
    agg = g.agg(lo=("cents", "min"), hi=("cents", "max"), first_us=("us", "min"),
                n=("cents", "size"))
    m = out.merge(agg, on=["user_id", "day"])
    assert len(m) == len(out) == len(agg)
    assert (m.n_events == m.n).all()
    assert (m.twap_micros >= m.lo * 1e4 - 1).all()
    assert (m.twap_micros <= m.hi * 1e4 + 1).all()
    expect_cover = (m.day + 1) * _DAY_US - m.first_us
    assert (m.covered_us == expect_cover).all()


def test_twap_single_keyed_shuffle(spark):
    """Window and aggregate share the (user, day) partitioning."""
    df = _df("time_weighted_avg", spark)
    assert not unpartitioned_unbounded_windows(df)
    assert plan_string(df).count("Exchange") <= 2


# ---------------------------------------------------------------- Zipf


def test_zipf_fit_numpy_parity(spark):
    """Slope/r2 match numpy polyfit over the same top-1000 log-log
    points, slope is negative (frequency decays with rank)."""
    row = _df("zipf_fit", spark).collect()[0]
    tf = (
        table(spark, SF_DIR, "documents")
        .select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .count()
        .toPandas()
        .sort_values(["count", "t"], ascending=[False, True])
        .reset_index(drop=True)
    )
    head = tf.iloc[:1000]
    x = np.log(np.arange(1, len(head) + 1, dtype=float))
    y = np.log(head["count"].to_numpy(float))
    slope, _ = np.polyfit(x, y, 1)
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert row.vocab_size == len(tf)
    assert row.n_ranks == min(1000, len(tf))
    assert row.total_tokens == int(tf["count"].sum())
    assert abs(row.slope_micros - round(slope * 1e6)) <= 50
    assert abs(row.r2_micros - round(r2 * 1e6)) <= 50
    assert row.slope_micros < 0


# -------------------------------------------------------------- zone map


def test_zonemap_actually_skips_files(spark):
    """The footer plan keeps a strict subset of the 16 range-clustered
    files, and the surviving scan still carries the pushed row filter."""
    files, kept, lo, hi = _zonemap_plan(SF_DIR)
    assert len(files) >= 8
    assert 0 < len(kept) < len(files)
    df = _df("scan_zonemap_skip", spark)
    assert any("o_custkey" in f for f in pushed_filters(df))


def test_zonemap_matches_full_scan(spark):
    """Skipping is an optimization, not a filter: results equal the
    same aggregate over the unpruned catalog table."""
    row = _df("scan_zonemap_skip", spark).collect()[0]
    o = table(spark, SF_DIR, "orders")
    m = o.agg(F.max("o_custkey").alias("m")).collect()[0].m
    lo, hi = m // 4, m // 4 + m // 10
    full = (
        o.where(F.col("o_custkey").between(lo, hi))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_custkey").alias("mn"),
            F.max("o_custkey").alias("mx"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("s"),
        )
        .collect()[0]
    )
    assert (row.n_orders, row.min_custkey, row.max_custkey) == (full.n, full.mn, full.mx)
    assert abs(row.price_sum - full.s) < 1e-6


# ----------------------------------------------------- weighted median


def test_weighted_median_numpy_parity(spark):
    """Lower weighted median per flag matches an explicit numpy
    cumulative-weight sweep."""
    out = (
        SPECS["weighted_median"]
        .builder(spark, SF_DIR)
        .toPandas()
        .set_index("flag")
        .sort_index()
    )
    li = (
        table(spark, SF_DIR, "lineitem")
        .select(
            "l_returnflag",
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .toPandas()
    )
    for flag, grp in li.groupby("l_returnflag"):
        g = grp.groupby("cents").w.sum().sort_index()
        cum = g.cumsum()
        tot = int(g.sum())
        med = int(cum.index[(2 * cum >= tot).argmax()])
        assert out.loc[flag, "wmedian_cents"] == med
        assert out.loc[flag, "total_weight"] == tot


# ------------------------------------------- gap detect / stickiness


def test_gap_detect_pandas_parity(spark):
    """Per-user gap intervals match a pandas diff over the distinct
    activity calendar."""
    out = SPECS["gap_detect"].builder(spark, SF_DIR).toPandas()
    e = _events_pd(spark)
    days = (
        e.assign(day=e.us // _DAY_US)[["user_id", "day"]]
        .drop_duplicates()
        .sort_values(["user_id", "day"])
    )
    expect = []
    for uid, grp in days.groupby("user_id"):
        d = grp.day.to_numpy()
        for i in range(1, len(d)):
            if d[i] - d[i - 1] >= 2:
                expect.append((uid, d[i - 1] + 1, d[i] - 1, d[i] - d[i - 1] - 1))
    got = sorted(map(tuple, out.to_numpy().tolist()))
    assert got == sorted(expect)


def test_stickiness_bounds_and_dau(spark):
    """0 < stickiness <= 1e9, and DAU matches the calendar; MAU >= DAU
    always (the window contains the day itself)."""
    out = SPECS["stickiness_dau_mau"].builder(spark, SF_DIR).toPandas()
    assert ((out.stickiness_nanos > 0) & (out.stickiness_nanos <= 10**9)).all()
    assert (out.mau >= out.dau).all()
    e = _events_pd(spark)
    dau = (
        e.assign(day=e.us // _DAY_US)[["user_id", "day"]]
        .drop_duplicates()
        .groupby("day")
        .size()
    )
    got = out.set_index("day").dau.sort_index()
    assert (got == dau.sort_index()).all()


# -------------------------------------------- linear attribution


def test_attribution_linear_conserves_credited_cents(spark):
    """Every credited purchase's cents land exactly once: channel sums
    equal the total cents of purchases that HAVE at least one touch."""
    out = SPECS["attribution_linear"].builder(spark, SF_DIR).toPandas()
    ev = _events_pd(spark)
    p = ev[ev.event_type == "purchase"]
    t = ev[ev.event_type.isin(["click", "view"])]
    total = 0
    by_user = {u: g for u, g in t.groupby("user_id")}
    for r in p.itertuples():
        g = by_user.get(r.user_id)
        if g is None:
            continue
        n = (
            (g.us < r.us) & (g.us >= r.us - 7 * _DAY_US)
        ).sum()
        if n > 0:
            total += int(r.cents)
    assert int(out.credited_cents.sum()) == total


# --------------------------------------- clamped running balance


def test_clamped_balance_matches_sequential_fold(spark):
    """The reflection-identity windows equal the literal sequential
    b_t = max(0, b_{t-1} + x_t) recursion replayed in Python."""
    out = (
        SPECS["inventory_clamped_balance"]
        .builder(spark, SF_DIR)
        .toPandas()
        .set_index("part")
        .sort_index()
    )
    li = (
        table(spark, SF_DIR, "lineitem")
        .select(
            F.col("l_partkey").alias("part"),
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("day"),
            F.when(
                F.col("l_orderkey") % 2 == 0, F.col("l_quantity").cast("long")
            )
            .otherwise(-F.col("l_quantity").cast("long"))
            .alias("q"),
        )
        .toPandas()
    )
    net = li.groupby(["part", "day"]).q.sum().reset_index()
    for part, grp in net.sort_values("day").groupby("part"):
        b = 0
        peak = 0
        zero_days = 0
        for x in grp.q:
            b = max(0, b + int(x))
            peak = max(peak, b)
            zero_days += b == 0
        assert out.loc[part, "final_bal"] == b, part
        assert out.loc[part, "peak_bal"] == peak, part
        assert out.loc[part, "days_at_zero"] == zero_days, part
