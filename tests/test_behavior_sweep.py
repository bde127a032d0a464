"""Interval-sweep concurrency and last-touch attribution tests: full
pandas recomputation from the raw fixture (sessionization included), a
direct pin of the bucketed_prefix_sum helper against a plain cumsum,
and plan-shape sweeps.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from blockchain2graphdb_spark import registry
from blockchain2graphdb_spark.catalog import SESSION_GAP_US, table
from blockchain2graphdb_spark.functions.ranking import bucketed_prefix_sum
from blockchain2graphdb_spark.plans.inspect import unpartitioned_unbounded_windows

from conftest import SF_DIR

SPECS = registry.load_all()


def _df(name, spark):
    return SPECS[name].builder(spark, SF_DIR)


def _events(spark) -> pd.DataFrame:
    return (
        table(spark, SF_DIR, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.unix_micros("ts").alias("us"),
        )
        .toPandas()
        .sort_values(["user_id", "us", "event_id"])
        .reset_index(drop=True)
    )


def _sessions(ev: pd.DataFrame) -> pd.DataFrame:
    """Pandas twin of sessionize_batch: per-user gap walk -> intervals."""
    out = []
    for uid, g in ev.groupby("user_id"):
        prev = None
        s0 = e0 = None
        for us in g.us:
            if prev is None or us - prev > SESSION_GAP_US:
                if s0 is not None:
                    out.append((uid, s0, e0))
                s0 = us
            e0 = us
            prev = us
        out.append((uid, s0, e0))
    return pd.DataFrame(out, columns=["user_id", "s0", "e0"])


def test_concurrency_matches_pandas_sweep(spark):
    r = _df("concurrent_sessions_max", spark).collect()[0]
    sess = _sessions(_events(spark))
    deltas: dict[int, int] = {}
    for _, row in sess.iterrows():
        deltas[row.s0] = deltas.get(row.s0, 0) + 1
        deltas[row.e0 + 1] = deltas.get(row.e0 + 1, 0) - 1
    conc = 0
    best = (-1, None)
    for us in sorted(deltas):
        conc += deltas[us]
        if conc > best[0]:
            best = (conc, us)
    assert r.n_sessions == len(sess)
    assert r.max_concurrent == best[0]
    assert r.at_us == best[1]


def test_attribution_matches_pandas(spark):
    rows = {r.channel: r for r in _df("attribution_last_touch", spark).collect()}
    ev = _events(spark)
    got: dict[str, list] = {}
    for _, g in ev.groupby("user_id"):
        last = None
        for _, row in g.iterrows():
            if row.event_type == "purchase":
                got.setdefault(last or "none", []).append(row.value)
            if row.event_type in ("click", "view"):
                last = row.event_type
    assert set(rows) == set(got)
    for ch, vals in got.items():
        assert rows[ch].n_conversions == len(vals)
        # exact-decimal sum == float sum of 2-decimal values at this size
        assert abs(rows[ch].revenue - round(sum(vals), 2)) < 1e-6
    total = sum(r.n_conversions for r in rows.values())
    assert total == int((ev.event_type == "purchase").sum())


def test_bucketed_prefix_sum_equals_plain_cumsum(spark):
    """The two-pass prefix sum equals a single-partition running sum on
    an adversarial layout (negative values, bucket boundaries, empty
    buckets between occupied ones)."""
    data = [(i * 7 % 50, i, (-1) ** i * (i % 5 + 1)) for i in range(200)]
    df = spark.createDataFrame(data, "k long, id long, v long")
    got = (
        bucketed_prefix_sum(
            df, F.expr("k div 10"), [F.col("k"), F.col("id")], F.col("v"), "cum"
        )
        .orderBy("k", "id")
        .collect()
    )
    run = 0
    for row, (_, _, v) in zip(got, sorted(data, key=lambda t: (t[0], t[1]))):
        run += v
        assert row.cum == run


def test_sweep_ops_have_no_unpartitioned_data_windows(spark):
    for key in ("concurrent_sessions_max", "attribution_last_touch"):
        assert unpartitioned_unbounded_windows(_df(key, spark)) == [], key


def test_kaplan_meier_matches_python(spark):
    """Risk sets, event counts, and cumulative ln-survival equal the
    direct computation; the saturated terminal day surfaces NULL."""
    import math

    ev = _events(spark)
    durations = []
    for _, g in ev.groupby("user_id"):
        t0 = g.us.min()
        purchases = g.loc[g.event_type == "purchase", "us"]
        if len(purchases):
            durations.append((1, (purchases.min() - t0) // 86_400_000_000))
        else:
            durations.append((0, (g.us.max() - t0) // 86_400_000_000))
    per_day: dict = {}
    for obs, day in durations:
        d, c = per_day.get(day, (0, 0))
        per_day[day] = (d + obs, c + (1 - obs))
    rows = {r.day: r for r in SPECS["kaplan_meier"].builder(spark, SF_DIR).collect()}
    n_risk = len(durations)
    cum = 0
    prev_risk = None
    for day in sorted(per_day):
        d, c = per_day[day]
        if d > 0:
            r = rows[day]
            assert (r.n_risk, r.n_events, r.n_censored) == (n_risk, d, c)
            if d < n_risk:
                cum += round(math.log(1 - d / n_risk) * 1e9)
                assert r.ln_surv_nanos == cum
            else:
                assert r.ln_surv_nanos is None
            if prev_risk is not None:
                assert r.n_risk < prev_risk
            prev_risk = r.n_risk
        n_risk -= d + c
    assert set(rows) == {day for day, (d, _) in per_day.items() if d > 0}


def test_skyline_matches_bruteforce(spark):
    """The window-algorithm skyline equals the quadratic dominance
    check per brand."""
    parts = (
        table(spark, SF_DIR, "part")
        .select("p_brand", "p_partkey", "p_retailprice", "p_size")
        .toPandas()
    )
    want = set()
    for brand, g in parts.groupby("p_brand"):
        rows = list(g.itertuples(index=False))
        for p in rows:
            dominated = any(
                q.p_retailprice <= p.p_retailprice
                and q.p_size >= p.p_size
                and (q.p_retailprice < p.p_retailprice or q.p_size > p.p_size)
                for q in rows
            )
            if not dominated:
                want.add((brand, p.p_partkey))
    got = {
        (r.p_brand, r.p_partkey)
        for r in SPECS["skyline_pareto"].builder(spark, SF_DIR).collect()
    }
    assert got == want
