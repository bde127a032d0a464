"""Relational core: scans, filters/point-lookups, the join family,
aggregations, set ops, sorts/limits (SURVEY.md §2.1–2.4, §2.6–2.7).

Each query re-expresses a reference operation (cited as
BlockchainToGraph.java:B / TransactionGraph.java:T line numbers) on the
driver fixture tables. The reference does these row-at-a-time through
Gremlin point lookups (~50 `g.V().has("name", k)` sites, B:176 etc.);
here every one is a set-oriented Catalyst plan: indexed point lookups
become pushed-down parquet filters, existence probes become semi-joins,
traversal hops become equi-joins that AQE can broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import prep, table
from ..exact import dec2, money_avg, money_sum
from ..plans.iterate import local_checkpoint
from ..registry import query

# ---------------------------------------------------------------------------
# §2.1 scans


@query(
    "scan_parquet",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-06-01 00:00:00'
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 (B:361 BlockFileLoader sequential scan) as a columnar scan.

    Projection+filter reach the parquet reader (PushedFilters / 3-column
    ReadSchema in `.explain`), replacing the reference's whole-object
    decode of every block.
    """
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_quantity").where(
        F.col("l_shipdate") < F.lit("1995-06-01").cast("timestamp")
    )


@query(
    "export_edges",
    oracle="""
    SELECT CAST(o_custkey AS VARCHAR) AS src,
           CAST(o_orderkey AS VARCHAR) AS dst,
           'placed' AS rel
    FROM orders
    UNION ALL
    SELECT CAST(l_orderkey AS VARCHAR) AS src,
           CAST(l_partkey AS VARCHAR) AS dst,
           'contains' AS rel
    FROM lineitem
    """,
)
def export_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 (B:1248 GraphML whole-graph export) as an edge-list projection.

    The graph is normalized relations, so "export" is a union of FK
    projections — written out with df.write.parquet/csv by the sink layer
    (tests cover the write path).
    """
    prep(spark)
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    placed = orders.select(
        F.col("o_custkey").cast("string").alias("src"),
        F.col("o_orderkey").cast("string").alias("dst"),
        F.lit("placed").alias("rel"),
    )
    contains = li.select(
        F.col("l_orderkey").cast("string").alias("src"),
        F.col("l_partkey").cast("string").alias("dst"),
        F.lit("contains").alias("rel"),
    )
    return placed.unionByName(contains)


# ---------------------------------------------------------------------------
# §2.2 filters / point lookups / existence


@query(
    "filter_point",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey = 7",
)
def filter_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: indexed point lookup `g.V().has("name", x)` (B:176 et al.).

    The composite-index seek (T:158) becomes a pushed-down parquet
    predicate + min/max row-group skipping; at scale a batch of N lookups
    is one semi-join, not N seeks.
    """
    prep(spark)
    return (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") == 7)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


@query(
    "filter_conjunctive",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT' AND o_totalprice > 100000
    """,
)
def filter_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: label+property conjunctive filter (B:40 has("Block","BlockHeight",0))."""
    prep(spark)
    return (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 100000)
        )
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: existence probe `.hasNext()` (B:176, B:212...) as LEFT SEMI JOIN.

    The reference's dedup/upsert branching does one indexed probe per row;
    the set-oriented form is one shuffle (or broadcast) semi-join.
    """
    prep(spark)
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: negated existence (B:449 `!g.V().has(...).hasNext()`) as LEFT ANTI JOIN."""
    prep(spark)
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# §2.3 join family


@query(
    "join_inner",
    oracle="""
    SELECT o_orderkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 300000
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join (every Gremlin out()/in() hop, e.g. J4 B:578).

    customer is the smaller side but SCALES with the data (not
    broadcastable at 100 TB), so it carries no hint: the parquet scan
    has size stats, Catalyst broadcasts it while it fits and AQE/SMJ
    takes over beyond the threshold.
    """
    prep(spark)
    orders = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    cust = table(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@query(
    "join_left",
    oracle="""
    SELECT c_custkey, o_orderkey
    FROM customer LEFT JOIN orders
      ON o_custkey = c_custkey AND o_orderstatus = 'F'
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join — absent from the reference, declared surface (§2.3 checklist)."""
    prep(spark)
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    cond = (cust.c_custkey == orders.o_custkey) & (orders.o_orderstatus == "F")
    return cust.join(orders, cond, "left").select("c_custkey", "o_orderkey")


@query(
    "join_semi",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi on a filtered probe side (F3/J3 shape)."""
    prep(spark)
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    return part.join(li, part.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti (resume/skip semantics M6, B:444–457)."""
    prep(spark)
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    return part.join(li, part.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


@query(
    "one_hop_join",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_name
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_quantity >= 48
    """,
)
def one_hop_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: output→address owner lookup (B:578 out("locked")) — a 1-hop FK join."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 48)
    part = table(spark, sf_dir, "part")
    return li.join(part, li.l_partkey == part.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_name"
    )


@query(
    "expand_children",
    oracle="""
    SELECT o_orderkey, l_linenumber, l_partkey
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-03-01 00:00:00'
    """,
)
def expand_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/J6: block→transactions 1:N expansion (B:763 out("has"))."""
    prep(spark)
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-03-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "l_linenumber", "l_partkey"
    )


@query(
    "two_hop_join",
    oracle="""
    SELECT c_custkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey
    """,
)
def two_hop_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: 2-hop incident-transaction traversal (B:583 in("locked").in("output")).

    address←output←tx becomes customer→orders→lineitem; the per-vertex
    loop collapses into two equi-joins + one hash aggregate.
    """
    prep(spark)
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    rev = (dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))).alias("rev")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@query(
    "counterparties",
    oracle="""
    SELECT c_custkey, COUNT(DISTINCT l_suppkey) AS n_counterparties
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey
    """,
)
def counterparties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+A8: 3-hop counterparty traversal with HashSet dedup (B:950–983).

    The reference walks address←output←tx←output→address per address and
    dedups in a Java HashSet; here it is a chained equi-join +
    COUNT(DISTINCT) — Catalyst plans partial/final distinct aggregation,
    and at 100 TB the HLL variant (agg_approx_count_distinct) avoids the
    exact-distinct shuffle.
    """
    prep(spark)
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey")
        .agg(F.countDistinct("l_suppkey").alias("n_counterparties"))
    )


@query(
    "self_transfer_flag",
    oracle="""
    SELECT n_nationkey, COUNT(*) AS n_local_lineitems
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey  = o_custkey
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE c_nationkey = s_nationkey
    GROUP BY n_nationkey
    """,
)
def self_transfer_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: self-transfer detection (B:873–882 TransactionIsBetweenOneAddress).

    "Both sides of the transfer are the same party" — here: lineitems whose
    customer and supplier share a nation, counted per nation.
    """
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        # supplier scales with the data — unhinted, stats-driven;
        # nation is a FIXED 25 rows at any scale — hinted
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .where(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), nation.n_nationkey == cust.c_nationkey)
        .groupBy("n_nationkey")
        .agg(F.count(F.lit(1)).alias("n_local_lineitems"))
    )


@query(
    "join_range",
    oracle="""
    SELECT a.event_id, COUNT(*) AS n_following
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    GROUP BY a.event_id
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join — declared surface (§2.3 checklist).

    Equi on user_id + range on ts: Catalyst plans SMJ/SHJ on the equi key
    with the range as a post-filter, so it scales as a keyed join, not a
    cartesian product.
    """
    prep(spark)
    ev = table(spark, sf_dir, "events")
    a = ev.alias("a")
    b = ev.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        a.join(b, cond)
        .groupBy(F.col("a.event_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_following"))
    )


@query(
    "join_asof",
    oracle="""
    SELECT event_id,
           LAST_VALUE(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_error_id
    FROM events
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — for each event, the most recent *prior* 'error' event
    of the same user. Declared surface (§2.3 checklist).

    Expressed as a window `last(..., ignorenulls)` instead of a per-row
    backward scan: one sort per partition key, no N² probing.
    """
    prep(spark)
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_err = F.last(
        F.when(F.col("event_type") == "error", F.col("event_id")), ignorenulls=True
    ).over(w)
    return ev.select("event_id", last_err.alias("last_error_id"))


@query(
    "join_full",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey, c.n_cust, s.n_supp
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — declared surface (§2.3 checklist); also the core
    of the M2 MERGE fold (maintenance.upsert_merge)."""
    prep(spark)
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    ca, sa = c.alias("c"), s.alias("s")
    return ca.join(sa, F.col("c.nationkey") == F.col("s.nationkey"), "full_outer").select(
        F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias("nationkey"),
        "n_cust",
        "n_supp",
    )


@query(
    "join_salted",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join — the manual hot-key mitigation for a skewed join
    (companion to `agg_salted`, which salts an aggregate). The fact side
    gets a deterministic salt in [0, R); the dimension side is exploded
    into R replicas keyed (suppkey, salt); joining on the composite key
    spreads each hot supplier over R reducers. The result is provably
    identical to the unsalted join (the oracle IS the unsalted join).

    At 100 TB this is the fallback when AQE skew-split can't help —
    e.g. a skewed key that also feeds a following aggregate, where the
    pre-salted partitioning is reused by the partial agg. R replicates
    only the SMALL side (R×|dim| rows), never the fact side.
    """
    prep(spark)
    R = 8
    li = table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(R))
    )
    sup = (
        table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(R - 1))))
    )
    return (
        li.join(
            sup,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (li["salt"] == sup["salt"]),
        )
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            money_sum("l_quantity", "sum_qty"),
        )
    )


@query(
    "join_skew_salted",
    oracle="""
    WITH f AS (
      SELECT CASE WHEN l_partkey % 10 < 7 THEN 0 ELSE l_partkey END AS hk,
             l_quantity
      FROM lineitem
    ),
    d AS (
      SELECT CASE WHEN p_partkey % 10 < 7 THEN 0 ELSE p_partkey END AS hk,
             CAST(MIN(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS dim_cents,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1
    )
    SELECT f.hk,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           MAX(d.dim_cents) AS dim_cents,
           MAX(d.n_parts) AS n_parts
    FROM f JOIN d ON d.hk = f.hk
    GROUP BY f.hk
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end skew mitigation on a HOT key (VERDICT r9 #5 —
    `join_skew_report` only *reports* skew; this key fixes it). The
    fixture's keys are near-uniform, so the hot key is derived
    deterministically on BOTH engines: part keys with `key % 10 < 7`
    collapse onto key 0, putting ~70% of the fact rows on one join key
    (skew_factor ≈ 0.7·|keys| — the reference's hot `name`-index probe,
    T:158, at shuffle-join scale). The mitigation is the salted
    composite join: fact rows get a deterministic salt in [0, R), the
    dimension side is exploded into R replicas, and the (hk, salt)
    equi-join spreads key 0's rows over R reducers instead of one. A
    `shuffle_hash` hint pins the shuffle-join path the demo is about —
    at this fixture scale Spark would otherwise broadcast the tiny dim
    (which is the RIGHT plan when the dim fits; salting is for when it
    doesn't). The oracle is the UNSALTED join, so a green row proves
    salting changes the schedule, never the result. Plan shape pinned
    by tests/test_round11_ops.py::test_join_skew_salted_plan_shape
    (shuffle join on the composite key, Generate for the dim replicas,
    no broadcast on the fact join)."""
    prep(spark)
    R = 8
    hot_f = F.when(F.col("l_partkey") % 10 < 7, F.lit(0)).otherwise(
        F.col("l_partkey")
    )
    fact = (
        table(spark, sf_dir, "lineitem")
        .select(
            hot_f.cast("long").alias("hk"),
            "l_quantity",
            # salt from per-row identity, NOT the join key (the hot key's
            # rows must spread across ALL R buckets)
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(R)).alias(
                "salt"
            ),
        )
    )
    hot_d = F.when(F.col("p_partkey") % 10 < 7, F.lit(0)).otherwise(
        F.col("p_partkey")
    )
    dim = (
        table(spark, sf_dir, "part")
        .groupBy(hot_d.cast("long").alias("hk"))
        .agg(
            F.min((F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("dim_cents"),
            F.count(F.lit(1)).cast("long").alias("n_parts"),
        )
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(R - 1))))
        .hint("shuffle_hash")
    )
    return (
        fact.join(
            dim,
            (fact["hk"] == dim["hk"]) & (fact["salt"] == dim["salt"]),
        )
        .groupBy(fact["hk"].alias("hk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            money_sum("l_quantity", "sum_qty"),
            F.max("dim_cents").cast("long").alias("dim_cents"),
            F.max("n_parts").cast("long").alias("n_parts"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations


@query(
    "agg_count",
    oracle="SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey",
)
def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: BlockTransactionCount (B:538–540) as a hash-aggregate count."""
    prep(spark)
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "agg_sum",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: TransactionBalance/BlockBalance sums (B:784, B:1011, B:1037)."""
    prep(spark)
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(money_sum("l_quantity", "sum_qty"), money_sum("l_extendedprice", "sum_price"))
    )


@query(
    "agg_sum_coalesce",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(COALESCE(NULLIF(CAST(l_tax AS DECIMAL(18,2)), 0), 0)) AS DOUBLE) AS sum_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_sum_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: null-coalesced fee sum (B:788–793 tx.getFee() may be null)."""
    prep(spark)
    tax = F.coalesce(F.nullif(dec2("l_tax"), F.lit(0).cast("decimal(18,2)")), F.lit(0).cast("decimal(18,2)"))
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum(tax).cast("double").alias("sum_tax"))
    )


@query(
    "agg_signed_sum",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2))
                         ELSE -CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS net_value
    FROM events GROUP BY user_id
    """,
)
def agg_signed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: running AddressBalance = Σ received − Σ spent (B:856–857, B:912–914).

    The reference mutates one row per spend/receive; this is one signed
    aggregation over the event log.
    """
    prep(spark)
    signed = F.when(F.col("event_type") == "purchase", dec2("value")).otherwise(-dec2("value"))
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum(signed).cast("double").alias("net_value"))
    )


@query(
    "agg_min_max",
    oracle="""
    SELECT user_id,
           epoch_ns(MIN(ts)) // 1000 AS first_seen_us,
           epoch_ns(MAX(ts)) // 1000 AS last_seen_us
    FROM events GROUP BY user_id
    """,
)
def agg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: AddressFirstAppearDate / AddressLastAppearDate (B:858–859, B:583–589).

    Timestamps surface as integer epoch-microseconds: the fixture stores
    nanosecond precision, which Spark truncates to micros on read, so the
    comparable representation on both engines is floor(ns/1000).
    """
    prep(spark)
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("first_seen_us"),
            F.unix_micros(F.max("ts")).alias("last_seen_us"),
        )
    )


@query(
    "agg_conditional_count",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors
    FROM events GROUP BY user_id
    """,
)
def agg_conditional_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: direction-split counts (B:863–867 AddressInput/OutputTransactionCount)."""
    prep(spark)
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts FROM lineitem GROUP BY l_suppkey",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 exact form: distinct counterparties (B:950–983 HashSet dedup)."""
    prep(spark)
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("n_parts"))
    )


@query("agg_approx_count_distinct")  # rows-only: HLL sketches differ across engines
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 at 100 TB: approx_count_distinct (HLL++) — the scale path that
    replaces the exact-distinct shuffle. Rows-only check (sketch estimates
    are engine-specific); the exact twin is `agg_count_distinct`.
    """
    prep(spark)
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.approx_count_distinct("l_partkey", 0.01).alias("n_parts_approx"))
    )


@query(
    "agg_first_seen_count",
    oracle="""
    WITH ranked AS (
      SELECT user_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n_new_users
    FROM ranked WHERE rn = 1 GROUP BY 1
    """,
)
def agg_first_seen_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: TransactionNewAddressCount (B:1077–1080) — count of first-ever
    appearances per period, via a window instead of per-row existence probes."""
    prep(spark)
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("ts", "event_id"))
    return (
        ev.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_new_users"))
    )


@query(
    "agg_self_transfer",
    oracle="""
    SELECT c_custkey, COUNT(*) AS n_local
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    WHERE EXISTS (
      SELECT 1 FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      WHERE l_orderkey = o_orderkey AND s_nationkey = c_nationkey
    )
    GROUP BY c_custkey
    """,
)
def agg_self_transfer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: AddressBetweenAddressTransactionCount (B:876–877) — per party,
    how many of its transactions have it on both sides (here: an order with
    at least one same-nation supplier), via semi-join then count."""
    prep(spark)
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    oc = orders.join(cust, cust.c_custkey == orders.o_custkey).select(
        "o_orderkey", "c_custkey", "c_nationkey"
    )
    ls = li.join(supp, supp.s_suppkey == li.l_suppkey).select(
        "l_orderkey", "s_nationkey"
    )
    probe = ls.withColumnRenamed("l_orderkey", "o_orderkey").withColumnRenamed(
        "s_nationkey", "c_nationkey"
    )
    return (
        oc.join(probe, ["o_orderkey", "c_nationkey"], "left_semi")
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_local"))
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: HashSet-union dedup (B:722–733) as dropDuplicates."""
    prep(spark)
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets / CUBE — declared surface (§2.4 'absent in reference')."""
    prep(spark)
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(money_sum("l_quantity", "sum_qty"))
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(c_custkey) AS n_customers
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation dimension hierarchy."""
    prep(spark)
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    return (
        region.join(nation, nation.n_regionkey == region.r_regionkey)
        .join(cust, cust.c_nationkey == nation.n_nationkey)
        .rollup("r_name", "n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@query(
    "agg_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(value) AS DOUBLE) AS avg_value
    FROM events GROUP BY event_type
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summary statistics — declared surface (§2.4)."""
    prep(spark)
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            money_avg("value", "avg_value"),
        )
    )


@query(
    "agg_collect_set",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set (declared surface §2.4) — sorted for determinism and
    joined to a scalar string: the driver's canonicalizer sorts rows via
    pandas, which cannot hash list-valued cells (round-1 red row)."""
    prep(spark)
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("c_mktsegment")), ","
            ).alias("segments")
        )
    )


@query(
    "pivot_table",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F"
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (declared surface): one shuffle with conditional aggregation,
    pivot values enumerated so no extra distinct-values pass runs."""
    prep(spark)
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec2("l_quantity")).cast("double"))
    )


@query(
    "agg_salted",
    oracle="SELECT event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total FROM events GROUP BY event_type",
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation — the manual skew-mitigation pattern
    (ARCHITECTURE.md §3): pre-aggregate on (key, salt) to flatten a hot
    key across partitions, then merge partials per key. The oracle is the
    plain GROUP BY, proving salting is semantics-preserving. (For
    algebraic aggregates Spark's partial aggregation already does this;
    the explicit form is for non-algebraic pipelines and demos the
    technique the 100 TB path uses on skewed address keys.)"""
    prep(spark)
    ev = table(spark, sf_dir, "events")
    salted = ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum(dec2("value")).alias("pt")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"), F.sum("pt").cast("double").alias("total")
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / limits / top-k


@query(
    "sort_by_key",
    oracle="""
    SELECT o_orderkey,
           ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS pos
    FROM orders
    """,
)
def sort_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: total order by timestamp (B:66–77 blockComparator + Collections.sort).

    Materialized as a global rank so the order is observable under the
    driver's order-insensitive hash — WITHOUT an unpartitioned window
    (row_number() over a global ORDER BY funnels the whole table through
    ONE WindowExec partition; VERDICT_r04 flagged that as the repo's one
    scale-killer). Two-pass bucketed rank instead:

      1. bucket each row by a deterministic prefix of the sort key
         (orderdate month — data-derived, no sampled range boundaries,
         so re-evaluation can't reassign rows);
      2. per-bucket counts -> cumulative offsets, as a theta-join over
         the ~|months|-row count table (sum of counts of strictly
         earlier buckets) — no window at all, so not even the bounded
         cumulative pass touches WindowExec;
      3. broadcast the offsets back and rank WITHIN buckets
         (Window.partitionBy(bucket) — distributed);
      4. pos = bucket offset + in-bucket row_number.

    Plan: one map-side bucket projection, one tiny aggregate, one
    broadcast join, one partitioned window — every wide stage keyed by
    bucket. At 100 TB the bucket granularity is the skew lever (month ->
    day -> hour keeps per-bucket rows bounded); same trick as the
    partition-offset rank used by distributed zipWithIndex.
    """
    prep(spark)
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("_b"),
    )
    counts = o.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    earlier = counts.select(F.col("_b").alias("_b2"), F.col("_n").alias("_n2"))
    offsets = (
        counts.join(F.broadcast(earlier), F.col("_b2") < F.col("_b"), "left")
        .groupBy("_b")
        .agg(F.coalesce(F.sum("_n2"), F.lit(0)).alias("_off"))
    )
    inb = F.row_number().over(
        W.partitionBy("_b").orderBy("o_orderdate", "o_orderkey")
    )
    return (
        o.join(F.broadcast(offsets), "_b")
        .select("o_orderkey", (F.col("_off") + inb).cast("long").alias("pos"))
    )


@query(
    "limit_n",
    oracle="SELECT o_orderkey, o_orderdate FROM orders ORDER BY o_orderkey LIMIT 5",
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: take-first `.next()` (B:44 etc.) generalized to ORDER BY ... LIMIT n."""
    prep(spark)
    return table(spark, sf_dir, "orders").orderBy("o_orderkey").select("o_orderkey", "o_orderdate").limit(5)


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (no full sort, no full shuffle)."""
    prep(spark)
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.7 set operations


@query(
    "set_union",
    oracle="SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HashSet union across sides (B:722–733) as UNION DISTINCT."""
    prep(spark)
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — declared surface (§2.7, absent from the reference)."""
    prep(spark)
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — declared surface (§2.7)."""
    prep(spark)
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT DISTINCT (exceptAll is the bag variant)


@query(
    "join_asof_pandas",
    oracle="""
    SELECT c.event_id,
           (SELECT p.event_id FROM events p
            WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
              AND p.ts < c.ts
            ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS last_purchase_id
    FROM events c WHERE c.event_type = 'click'
    """,
)
def join_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, Arrow/pandas scale path (SURVEY §4.3.4): co-partition
    by key, sort within group, `pd.merge_asof` per group.

    The window form (`join_asof`) is ideal when both sides share one
    table; this form is the general two-relation as-of at 100 TB — one
    shuffle on the key, then per-group sorted merges in Arrow batches
    with no cross-group state. Strictly-earlier semantics
    (allow_exact_matches=False), ties on equal right-side ts broken to
    the max event_id by the (ts, event_id) sort + backward take-last.
    """
    prep(spark)
    import pandas as pd

    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    ).select("user_id", "event_id", "event_type", "ts")

    def asof(pdf: pd.DataFrame) -> pd.DataFrame:
        clicks = pdf[pdf.event_type == "click"].sort_values(["ts", "event_id"])
        purch = pdf[pdf.event_type == "purchase"].sort_values(["ts", "event_id"])
        if clicks.empty:
            return pd.DataFrame({"event_id": [], "last_purchase_id": []})
        right = purch[["ts", "event_id"]].rename(
            columns={"event_id": "last_purchase_id"}
        )
        m = pd.merge_asof(
            clicks[["ts", "event_id"]],
            right,
            on="ts",
            direction="backward",
            allow_exact_matches=False,
        )
        return m[["event_id", "last_purchase_id"]].astype(
            {"event_id": "int64", "last_purchase_id": "Int64"}
        )

    return ev.groupBy("user_id").applyInPandas(
        asof, "event_id long, last_purchase_id long"
    )


@query("sample_stratified")  # rows-only: engine-local RNG (seeded, deterministic per engine)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling for training-data pipelines: `sampleBy` draws
    a per-stratum Bernoulli sample (20% BUILDING, 5% everything else)
    in one scan — no shuffle, no collect; the seed pins the sample
    across runs. Proportion/determinism properties pinned in
    tests/test_sampling.py."""
    prep(spark)
    cust = table(spark, sf_dir, "customer")
    segs = [r["c_mktsegment"] for r in cust.select("c_mktsegment").distinct().collect()]
    fractions = {s: (0.2 if s == "BUILDING" else 0.05) for s in segs}
    return cust.sampleBy("c_mktsegment", fractions, seed=42).select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "sample_hash_stratified",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM (
      SELECT c_custkey, c_mktsegment,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey
             ) AS rn
      FROM customer
    ) WHERE rn <= CASE WHEN c_mktsegment = 'BUILDING' THEN 100 ELSE 25 END
    """,
)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sampling: rank each stratum by md5 of the
    key and keep the first k — the deterministic counterpart to
    `sample_stratified`'s Bernoulli draw, identical across engines and
    runs (training-data pipelines pin samples this way so a re-run of a
    100 TB corpus yields byte-identical splits). A CONSTANT rn bound is
    filtered first: InferWindowGroupLimit only fires on literal bounds,
    and the resulting WindowGroupLimit keeps ≤max(k) rows per group on
    every map partition before the shuffle (plan-asserted); the exact
    per-stratum CASE bound then refines. `sample_stratified` remains
    the shuffle-free scan path when cross-engine reproducibility isn't
    required."""
    from pyspark.sql import Window as W

    prep(spark)
    cust = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.md5(F.col("c_custkey").cast("string")), F.col("c_custkey")
    )
    k = F.when(F.col("c_mktsegment") == "BUILDING", 100).otherwise(25)
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 100)  # literal bound => WindowGroupLimit
        .where(F.col("rn") <= k)
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_cust,
           GROUPING(r_name) + 2 * GROUPING(n_name) AS gid
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form behind cube/rollup (§2.4): three
    aggregation granularities in ONE shuffle (Expand + single hash
    aggregate), vs three separate scans+shuffles if issued naively."""
    prep(spark)
    from .sqlsuite import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name, n_name,
               COUNT(*) AS n_cust,
               CAST(GROUPING(r_name) + 2 * GROUPING(n_name) AS INT) AS gid
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        """
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95
    FROM events GROUP BY event_type
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (declared surface §2.4) with linear
    interpolation — identical definition on both engines (Spark
    `percentile` ≙ DuckDB `quantile_cont`), rounded to 6 to absorb
    interpolation-order float noise. At 100 TB the declared scale path
    is `approx_percentile` (mergeable t-digest-style sketch, constant
    memory per group); the exact form is the correctness anchor."""
    prep(spark)
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        )
    )


@query(
    "histogram_bins",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 600000 THEN 13
                     ELSE FLOOR(o_totalprice / 50000) + 1 END AS BIGINT) AS bin,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
)
def histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket + one hash aggregate — the
    single-pass binning primitive (data profiling / quality dashboards).
    Bin ids are exact integers; only min/max per bin touch floats."""
    prep(spark)
    return (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12)).alias(
                "bin"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "tpch_q12_shape",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (fixtures lack l_shipmode/l_commitdate, so
    l_linestatus stands in for shipmode): priority-split conditional
    counts over a fact-fact join."""
    prep(spark)
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query("agg_approx_percentile")  # rows-only: sketch-based, engine-specific
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declared scale path of agg_percentile: approx_percentile's
    mergeable sketch — constant memory per group at any cardinality.
    Accuracy vs the exact form is pinned in tests/test_sketches.py."""
    prep(spark)
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("p50"),
            F.approx_percentile("value", F.lit(0.95), F.lit(10000)).alias("p95"),
        )
    )


@query("agg_hll_merge")  # rows-only: sketch binaries are engine-specific
def agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch pattern behind count-distinct at 100 TB:
    per-shard HLL sketches (here: one per order-year) merged into a
    global distinct-customer estimate with hll_union_agg — partial
    state is a few KB per shard regardless of row count, and shards
    can be computed on different clusters/days and merged later.
    Merge-vs-direct equality is pinned in tests/test_sketches.py."""
    prep(spark)
    o = table(spark, sf_dir, "orders")
    shards = o.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    return shards.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_customers")
    )


@query(
    "agg_argmax",
    oracle="""
    SELECT o_custkey, o_orderkey AS biggest_order,
           ROUND(o_totalprice, 2) AS biggest_total
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders) t
    WHERE rn = 1
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / arg_max (declared surface §2.4): the row-valued
    aggregate behind "which order was the customer's largest" — one
    hash aggregate, no window, no self-join. Tie-broken by
    (totalprice, orderkey) so both engines pick the same row."""
    prep(spark)
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "max_by(o_orderkey, struct(o_totalprice, o_orderkey))"
            ).alias("biggest_order"),
            F.round(F.max("o_totalprice"), 2).alias("biggest_total"),
        )
    )


@query(
    "agg_mode",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(q AS BIGINT) AS mode_qty, CAST(cnt AS BIGINT) AS mode_count
    FROM (
      SELECT l_returnflag, l_linestatus, q, cnt,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                                ORDER BY cnt DESC, q) AS rn
      FROM (
        SELECT l_returnflag, l_linestatus,
               CAST(l_quantity AS BIGINT) AS q, COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2, 3
      )
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group (§2.4 extra): the most frequent
    l_quantity per (returnflag, linestatus), deterministically
    tie-broken toward the smallest value — Spark's built-in `mode()`
    breaks ties arbitrarily, so the engine-portable form is two hash
    aggregates: per-(group, value) counts, then max_by over
    (count, -value). No window, no sort; both shuffles carry tiny
    grouped keys, and the first agg is map-side combinable — the 100 TB
    shape for any "most common value" profile question."""
    prep(spark)
    counted = (
        table(spark, sf_dir, "lineitem")
        .groupBy(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast("long").alias("q"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counted.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr("max_by(q, struct(cnt, -q))").cast("long").alias("mode_qty"),
        F.max("cnt").cast("long").alias("mode_count"),
    )


@query(
    "sketch_countmin",
    oracle="""
    WITH rows_d AS (
      SELECT user_id, d FROM events, (SELECT UNNEST(range(4)) AS d)
    ),
    b AS (
      SELECT d,
        ((((instr('0123456789abcdef', substr(md5(d || ':' || user_id), 1, 1)) - 1) * 16
         + (instr('0123456789abcdef', substr(md5(d || ':' || user_id), 2, 1)) - 1)) * 16
         + (instr('0123456789abcdef', substr(md5(d || ':' || user_id), 3, 1)) - 1)) * 16
         + (instr('0123456789abcdef', substr(md5(d || ':' || user_id), 4, 1)) - 1)) % 1024 AS bucket
      FROM rows_d
    )
    SELECT CAST(d AS BIGINT) AS depth, CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM b GROUP BY 1, 2
    """,
)
def sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A-decl companion: Count-Min sketch of per-user event volume —
    the mergeable frequency sketch (4 rows × 1024 buckets) that answers
    "roughly how many events did user X generate?" in O(1) at any
    corpus size. Unlike the HLL key (engine-local binary, rows-only),
    the CMS is DETERMINISTIC given its hash family — buckets here are
    the first 4 hex chars of md5(depth ':' user_id) — so the sketch
    itself value-hash matches a SQL replay exactly.

    Build = one groupBy over (depth, bucket): map-side combinable,
    4·1024 cells max regardless of corpus size, and two sketches merge
    by cell-wise addition (the property that makes it a shard-and-merge
    aggregate at 100 TB). Point estimates (min over depths) dominate
    true counts — the CMS guarantee — pinned in tests.
    """
    prep(spark)
    ev = table(spark, sf_dir, "events").select("user_id")
    rows_d = ev.select(
        "user_id", F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("d")
    )
    hex4 = F.substring(
        F.md5(
            F.concat(
                F.col("d").cast("string"), F.lit(":"), F.col("user_id").cast("string")
            ).cast("binary")
        ),
        1,
        4,
    )
    bucket = F.conv(hex4, 16, 10).cast("long") % 1024
    return (
        rows_d.select(F.col("d").cast("long").alias("depth"), bucket.alias("bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --- multi-format sources (S-family): the same logical table served
# from CSV and JSON-lines files, proving the source abstraction is
# format-independent. The text files are derived ONCE from the nation
# fixture (pure pyarrow, deterministic bytes, stage+rename — the
# blockfile/replay idiom, keyed on the fixture's identity) and scanned
# back with an EXPLICIT schema: schema inference is a whole-extra pass
# over 100 TB and type-drift roulette, so production text scans always
# pin the schema.


def _sf_cache_tag(sf_dir: str) -> str:
    """Tag a derived-cache dir with the fixture ROOT's identity, not just
    its basename: two roots sharing a basename (/a/sf0.1 and /b/sf0.1)
    must never share a tag, or a cold-cache cleanup for one can
    delete-and-race the other's live cache (ADVICE r10). The abs-path
    hash scopes the stale-glob to this exact root; size+mtime (appended
    by each caller) scope it to this exact fixture generation."""
    import hashlib
    import os

    p = os.path.abspath(sf_dir.rstrip("/"))
    return f"{os.path.basename(p)}-{hashlib.md5(p.encode()).hexdigest()[:8]}"


def _text_source_dir(sf_dir: str, fmt: str) -> str:
    import os

    import pyarrow.parquet as pq

    from ..paths import tmp_root

    src = os.path.join(sf_dir, "nation.parquet")
    st = os.stat(src)
    sf_tag = _sf_cache_tag(sf_dir)
    d = os.path.join(
        tmp_root(), f"textsrc_{fmt}_{sf_tag}_{st.st_size}_{st.st_mtime_ns}"
    )
    if os.path.isdir(d):
        return d
    # fixture regenerated since the last derivation: drop stale dirs for
    # this (format, scale factor) ONLY — an unscoped glob would delete
    # another scale factor's live derivation out from under its lazy
    # DataFrames (same scoping as the streaming replay dirs)
    import glob as _glob
    import shutil

    for stale in _glob.glob(os.path.join(tmp_root(), f"textsrc_{fmt}_{sf_tag}_*")):
        shutil.rmtree(stale, ignore_errors=True)
    rows = pq.read_table(src).to_pylist()
    rows.sort(key=lambda r: r["n_nationkey"])
    stage = d + ".staging"
    os.makedirs(stage, exist_ok=True)
    with open(os.path.join(stage, "part-000.txt"), "w", newline="") as f:
        if fmt == "csv":
            # csv.writer (QUOTE_MINIMAL) keeps the derivation correct
            # even if a name ever contains a comma/quote/newline — naive
            # f-string concatenation would silently corrupt such rows
            import csv

            # lineterminator='\n': csv.writer defaults to CRLF with
            # newline='' files; keep the fixture's LF byte format
            w = csv.writer(f, lineterminator="\n")
            w.writerow(["n_nationkey", "n_name", "n_regionkey"])
            for r in rows:
                w.writerow([r["n_nationkey"], r["n_name"], r["n_regionkey"]])
        else:  # jsonl
            import json

            for r in rows:
                f.write(
                    json.dumps(
                        {
                            "n_nationkey": r["n_nationkey"],
                            "n_name": r["n_name"],
                            "n_regionkey": r["n_regionkey"],
                        },
                        sort_keys=True,
                    )
                    + "\n"
                )
    shutil.rmtree(d, ignore_errors=True)
    os.rename(stage, d)
    return d


_TEXT_SRC_ORACLE = """
    SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations,
           MIN(n_name) AS first_name,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
    FROM nation GROUP BY n_regionkey
"""

_TEXT_SRC_SCHEMA = "n_nationkey long, n_name string, n_regionkey long"


@query("scan_csv", oracle=_TEXT_SRC_ORACLE)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family: CSV source with an explicit schema (header skipped) —
    the same per-region rollup the parquet path produces, proving scan
    results are format-independent. At 100 TB: explicit schema (no
    inference pass), and the rollup pushes column pruning into the text
    reader."""
    prep(spark)
    d = _text_source_dir(sf_dir, "csv")
    df = spark.read.schema(_TEXT_SRC_SCHEMA).option("header", "true").csv(d)
    return df.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_nations"),
        F.min("n_name").alias("first_name"),
        F.sum("n_nationkey").cast("long").alias("key_sum"),
    )


@query("scan_jsonl", oracle=_TEXT_SRC_ORACLE)
def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family: JSON-lines source with an explicit schema — same
    contract as `scan_csv`; line-delimited JSON is the splittable form
    (a single JSON array is one unsplittable record at any size)."""
    prep(spark)
    d = _text_source_dir(sf_dir, "jsonl")
    df = spark.read.schema(_TEXT_SRC_SCHEMA).json(d)
    return df.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_nations"),
        F.min("n_name").alias("first_name"),
        F.sum("n_nationkey").cast("long").alias("key_sum"),
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events
    ),
    m AS (
      SELECT event_id, us,
             LAST_VALUE(CASE WHEN event_type = 'error' THEN us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_err_us
      FROM e
    )
    SELECT event_id,
           CASE WHEN last_err_us IS NOT NULL
                 AND us - last_err_us <= 3600000000
                THEN CAST(us - last_err_us AS BIGINT) END AS staleness_us
    FROM m
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance (kdb `aj` / pandas
    merge_asof(tolerance=...) / TimescaleDB LOCF-with-max-gap): each
    event picks up the time since the user's most recent prior 'error'
    ONLY if that error is within 1 hour — older matches are treated as
    no-match, the semantics every sensor/feature-store join needs so a
    stale reading never leaks into a feature. Same single-sort window
    form as join_asof (no N² probing, one partitioning on the key);
    the tolerance is a post-window predicate on the matched timestamp,
    so it costs nothing and pushes nothing extra through the shuffle.
    All math on unix-micro bigints — cross-engine exact."""
    prep(spark)
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_err_us = F.last(
        F.when(F.col("event_type") == "error", F.col("us")), ignorenulls=True
    ).over(w)
    m = ev.withColumn("last_err_us", last_err_us)
    tol = 3_600_000_000
    return m.select(
        "event_id",
        F.when(
            F.col("last_err_us").isNotNull()
            & ((F.col("us") - F.col("last_err_us")) <= tol),
            (F.col("us") - F.col("last_err_us")).cast("long"),
        ).alias("staleness_us"),
    )


def _partitioned_events_dir(sf_dir: str) -> str:
    """Hive-layout derivation of events partitioned by event_type
    (event_type=<v>/part.parquet), content-keyed to the fixture like
    _text_source_dir so regeneration invalidates it."""
    import glob as _glob
    import os
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..paths import tmp_root

    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    sf_tag = _sf_cache_tag(sf_dir)
    d = os.path.join(
        tmp_root(), f"evpart_{sf_tag}_{st.st_size}_{st.st_mtime_ns}"
    )
    if os.path.isdir(d):
        return d
    for stale in _glob.glob(os.path.join(tmp_root(), f"evpart_{sf_tag}_*")):
        shutil.rmtree(stale, ignore_errors=True)
    t = pq.read_table(src, columns=["event_id", "user_id", "value", "event_type"])
    stage = d + ".staging"
    for v in sorted(set(t.column("event_type").to_pylist())):
        sub = t.filter(pc.equal(t.column("event_type"), v)).drop(["event_type"])
        pdir = os.path.join(stage, f"event_type={v}")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(sub, os.path.join(pdir, "part-000.parquet"))
    os.replace(stage, d)
    return d


@query(
    "scan_partition_prune",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_clicks,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    WHERE event_type = 'click'
    GROUP BY user_id
    """,
)
def scan_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family scale story: scan a HIVE-PARTITIONED copy of events
    (event_type=<v>/ directories — the layout a 100 TB event lake
    actually uses, typically by day/hour) with a filter on the
    partition column. The filter becomes a PartitionFilter — Spark
    lists only the matching directory and the other partitions are
    never opened, the difference between scanning 100 TB and scanning
    one day of it (tests assert the PartitionFilters line and that the
    pruned plan reads a single partition directory). Results match the
    unpartitioned oracle exactly: partitioning is a layout choice, not
    a semantics choice.

    Scale shape: partition pruning composes with column pruning (only
    user_id/value reach the reader) and the aggregate is map-side
    combinable; exact-decimal value sums per the exact.py contract."""
    prep(spark)
    d = _partitioned_events_dir(sf_dir)
    df = spark.read.parquet(d).where(F.col("event_type") == "click")
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_clicks"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
    )


def _schema_evolution_dir(sf_dir: str) -> str:
    """Two-generation parquet directory derived from orders: gen-1
    files lack o_orderpriority (the pre-migration schema), gen-2 files
    carry it — the layout a long-lived lake accumulates as producers
    upgrade. Content-keyed to the fixture like _partitioned_events_dir
    so regeneration invalidates it."""
    import glob as _glob
    import os
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    sf_tag = _sf_cache_tag(sf_dir)
    from ..paths import tmp_root

    d = os.path.join(tmp_root(), f"schemaevo_{sf_tag}_{st.st_size}_{st.st_mtime_ns}")
    if os.path.isdir(d):
        return d
    for stale in _glob.glob(os.path.join(tmp_root(), f"schemaevo_{sf_tag}_*")):
        shutil.rmtree(stale, ignore_errors=True)
    t = pq.read_table(
        src, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]
    )
    parity = pc.bit_wise_and(t.column("o_orderkey"), 1)
    stage = d + ".staging"
    os.makedirs(stage, exist_ok=True)
    old = t.filter(pc.equal(parity, 0)).drop(["o_orderpriority"])
    new = t.filter(pc.equal(parity, 1))
    pq.write_table(old, os.path.join(stage, "part-gen1.parquet"))
    pq.write_table(new, os.path.join(stage, "part-gen2.parquet"))
    os.replace(stage, d)
    return d


@query(
    "scan_schema_evolution",
    oracle="""
    WITH v AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
               AS o_orderpriority
      FROM orders
    )
    SELECT COALESCE(o_orderpriority, 'LEGACY') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM v GROUP BY 1
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family schema evolution: read a mixed-generation parquet
    directory (half the files predate the o_orderpriority column) with
    mergeSchema=true — Spark unions the footers' schemas and fills the
    missing column with NULL for old files, exactly DuckDB's
    union_by_name. The query coalesces the evolved column to a
    'LEGACY' bucket and aggregates — the read path every long-lived
    lake needs when producers upgrade without rewriting history. The
    oracle models the same evolution in pure SQL over the original
    table (odd keys = gen-2 rows that carry the column), so the merged
    read is checked value-for-value, not just schema-for-schema.

    Scale shape: mergeSchema costs one footer read per FILE at
    planning (no data scan); at 100 TB the lake pins the merged schema
    in a metastore/Delta log instead, but the per-file missing-column
    NULL fill is the same executor-side mechanism. Column pruning
    still reaches the reader; the aggregate is map-side combinable
    with exact-decimal sums."""
    prep(spark)
    d = _schema_evolution_dir(sf_dir)
    df = spark.read.option("mergeSchema", "true").parquet(d)
    return (
        df.select(
            F.coalesce(F.col("o_orderpriority"), F.lit("LEGACY")).alias("priority"),
            "o_totalprice",
        )
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(dec2("o_totalprice")).cast("double").alias("total"),
        )
    )


@query(
    "skyline_pareto",
    oracle="""
    SELECT p.p_brand, p.p_partkey, p.p_retailprice,
           CAST(p.p_size AS BIGINT) AS p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_brand = p.p_brand
        AND q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline per brand (minimize price, maximize size — the
    "cheapest for its size" frontier): the multi-criteria dominance
    operator behind product/candidate shortlisting. The ORACLE states
    the semantics as the quadratic NOT EXISTS; the Spark plan uses the
    2-D skyline WINDOW algorithm instead — sort each brand by price,
    then a part survives iff (a) it holds its price group's max size
    (an equal-priced larger part dominates via strict size) and (b)
    its size strictly exceeds the running max size over all STRICTLY
    cheaper price groups (a cheaper part with >= size dominates via
    strict price). Ties on (price, size) are mutually non-dominating
    and both survive. No self-join, no pairwise work — O(n log n) per
    brand vs the oracle's O(n²).

    Scale shape: one (brand, price) aggregate (map-side combinable
    max), one window over that per-price table partitioned by brand,
    and one keyed join back — a single brand-keyed shuffle chain; at
    higher dimensions this degrades to block-nested skyline with
    local-skyline pre-pruning (skyline(∪ partitions' skylines) ==
    skyline(all) because dominance is transitive)."""
    from pyspark.sql import Window as W

    prep(spark)
    parts = table(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_retailprice", F.col("p_size").cast("long").alias("p_size")
    )
    per_price = parts.groupBy("p_brand", "p_retailprice").agg(
        F.max("p_size").alias("grp_max")
    )
    w_prev = (
        W.partitionBy("p_brand")
        .orderBy("p_retailprice")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    frontier = per_price.select(
        "p_brand",
        "p_retailprice",
        "grp_max",
        F.max("grp_max").over(w_prev).alias("prev_cummax"),
    )
    return (
        parts.join(frontier, ["p_brand", "p_retailprice"])
        .where(
            (F.col("p_size") == F.col("grp_max"))
            & (
                F.col("prev_cummax").isNull()
                | (F.col("p_size") > F.col("prev_cummax"))
            )
        )
        .select("p_brand", "p_partkey", "p_retailprice", "p_size")
    )


def _corrupt_jsonl_dir(sf_dir: str) -> str:
    """JSONL derivation of orders with SEEDED corruption: every line
    whose o_orderkey % 97 == 0 is truncated mid-record (unparseable).
    Content-keyed to the fixture like _text_source_dir."""
    import glob as _glob
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    from ..paths import tmp_root

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    sf_tag = _sf_cache_tag(sf_dir)
    d = os.path.join(
        tmp_root(), f"corruptsrc_{sf_tag}_{st.st_size}_{st.st_mtime_ns}"
    )
    if os.path.isdir(d):
        return d
    for stale in _glob.glob(os.path.join(tmp_root(), f"corruptsrc_{sf_tag}_*")):
        shutil.rmtree(stale, ignore_errors=True)
    rows = pq.read_table(
        src, columns=["o_orderkey", "o_orderstatus", "o_totalprice"]
    ).to_pylist()
    rows.sort(key=lambda r: r["o_orderkey"])
    stage = d + ".staging"
    os.makedirs(stage, exist_ok=True)
    with open(os.path.join(stage, "part-000.jsonl"), "w") as f:
        for r in rows:
            line = json.dumps(
                {
                    "o_orderkey": r["o_orderkey"],
                    "o_orderstatus": r["o_orderstatus"],
                    "o_totalprice": r["o_totalprice"],
                },
                sort_keys=True,
            )
            if r["o_orderkey"] % 97 == 0:
                line = line[: len(line) // 2]  # truncated mid-record
            f.write(line + "\n")
    os.replace(stage, d)
    return d


@query(
    "scan_corrupt_quarantine",
    oracle="""
    WITH lab AS (
      SELECT o_orderstatus, o_totalprice,
             CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END AS bad
      FROM orders
    )
    SELECT COALESCE(CASE WHEN bad = 0 THEN o_orderstatus END, '_CORRUPT')
             AS status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN bad = 0
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS total
    FROM lab GROUP BY 1
    """,
)
def scan_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family resilience: scan a JSONL feed containing malformed
    records (truncated mid-line — the reality of any 100 TB external
    delivery) in PERMISSIVE mode with a _corrupt_record quarantine
    column: good rows parse, bad rows surface as a counted '_CORRUPT'
    bucket instead of failing the job (or silently vanishing, as
    DROPMALFORMED would). The oracle re-derives which rows were seeded
    corrupt from the generation rule (o_orderkey % 97), so the
    quarantine COUNT and the good-row aggregates are value-checked,
    proving the parser neither drops good rows nor heals bad ones.

    Scale shape: per-line JSON parsing is the scan itself (no extra
    pass); the quarantine projection is map-side; one
    O(#statuses + 1)-row aggregate. At 100 TB the same plan writes the
    corrupt bucket to a badRecordsPath-style side sink instead of
    counting it."""
    prep(spark)
    d = _corrupt_jsonl_dir(sf_dir)
    schema = (
        "o_orderkey bigint, o_orderstatus string, o_totalprice double,"
        " _corrupt_record string"
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(d)
    )
    status = F.when(
        F.col("_corrupt_record").isNotNull(), F.lit("_CORRUPT")
    ).otherwise(F.col("o_orderstatus"))
    good_total = F.when(
        F.col("_corrupt_record").isNull(), dec2("o_totalprice")
    )
    return (
        df.select(status.alias("status"), good_total.alias("gt"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("gt").cast("double").alias("total"),
        )
    )


def _zonemap_orders_dir(sf_dir: str) -> str:
    """Derivation of orders as 16 RANGE-CLUSTERED parquet files
    (sorted by o_custkey, sliced contiguously — the layout a clustered
    / Z-ordered lake table maintains so file-level min/max stats are
    tight). Content-keyed to the fixture like _partitioned_events_dir
    so regeneration invalidates it."""
    import glob as _glob
    import os
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..paths import tmp_root

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    sf_tag = _sf_cache_tag(sf_dir)
    d = os.path.join(tmp_root(), f"zonemap_{sf_tag}_{st.st_size}_{st.st_mtime_ns}")
    if os.path.isdir(d):
        return d
    for stale in _glob.glob(os.path.join(tmp_root(), f"zonemap_{sf_tag}_*")):
        shutil.rmtree(stale, ignore_errors=True)
    t = pq.read_table(src, columns=["o_orderkey", "o_custkey", "o_totalprice"])
    t = t.take(pc.sort_indices(t, sort_keys=[("o_custkey", "ascending"),
                                             ("o_orderkey", "ascending")]))
    stage = d + ".staging"
    os.makedirs(stage, exist_ok=True)
    n_files = 16
    step = -(-t.num_rows // n_files)
    for i in range(n_files):
        sl = t.slice(i * step, step)
        if sl.num_rows:
            pq.write_table(sl, os.path.join(stage, f"part-{i:03d}.parquet"))
    os.replace(stage, d)
    return d


def _zonemap_plan(sf_dir: str) -> tuple[list[str], list[str], int, int]:
    """File-skipping plan from parquet FOOTER zone maps only (no data
    read): returns (all_files, kept_files, lo, hi) where [lo, hi] is
    the data-derived o_custkey probe band (max/4 .. max/4 + max/10,
    pure integer math on the footer max so fixture drift cannot desync
    the oracle) and kept_files are those whose [min, max] stats
    intersect it."""
    import os

    import pyarrow.parquet as pq

    d = _zonemap_orders_dir(sf_dir)
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    stats = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index("o_custkey")
        lo_f = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi_f = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        stats.append((f, lo_f, hi_f))
    m = max(h for _, _, h in stats)
    lo, hi = m // 4, m // 4 + m // 10
    kept = [f for f, lo_f, hi_f in stats if hi_f >= lo and lo_f <= hi]
    return files, kept, lo, hi


@query(
    "scan_zonemap_skip",
    oracle="""
    WITH band AS (
      SELECT MAX(o_custkey) // 4 AS lo,
             MAX(o_custkey) // 4 + MAX(o_custkey) // 10 AS hi
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_custkey) AS BIGINT) AS min_custkey,
           CAST(MAX(o_custkey) AS BIGINT) AS max_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS price_sum
    FROM orders, band
    WHERE o_custkey BETWEEN band.lo AND band.hi
    """,
)
def scan_zonemap_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family scale story #2 (the non-hive sibling of
    scan_partition_prune): file skipping via parquet footer ZONE MAPS.
    The derivation writes orders as 16 range-clustered files (sorted by
    o_custkey — what a clustered/Z-ordered lake table maintains); the
    scan planner reads ONLY the footers, keeps the files whose
    o_custkey [min, max] intersect the probe band, and hands Spark just
    those paths — the manifest-pruning step Iceberg/Delta data skipping
    performs before any row is read, and the difference between
    opening 16 files and opening 2 at 100 TB. The surviving files are
    still scanned with the row-level predicate (zone maps overlap at
    boundaries; skipping is an optimization, never a filter), so
    results match the full-scan oracle exactly. The probe band is pure
    integer math on the footer max (max/4 .. max/4 + max/10), so the
    oracle derives the identical band from MAX(o_custkey).

    Scale shape: pruning cost is O(#files) metadata reads (a manifest
    scan, no Spark job); the data scan then reads ~1/8 of the files,
    with predicate pushdown active inside each (tests assert files
    were actually skipped and the plan carries the pushed filter)."""
    prep(spark)
    _, kept, lo, hi = _zonemap_plan(sf_dir)
    df = spark.read.parquet(*kept).where(F.col("o_custkey").between(lo, hi))
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.min("o_custkey").cast("long").alias("min_custkey"),
        F.max("o_custkey").cast("long").alias("max_custkey"),
        F.sum(dec2("o_totalprice")).cast("double").alias("price_sum"),
    )


@query(
    "join_partition_prune_runtime",
    oracle="""
    WITH dim AS (
      SELECT event_type FROM (SELECT DISTINCT event_type FROM events)
      WHERE CAST(('0x' || substr(md5(event_type), 1, 1)) AS BIGINT) % 2 = 0
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events e JOIN dim USING (event_type)
    GROUP BY e.event_type
    """,
)
def join_partition_prune_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-family scale story #3 (after static partition pruning and
    zone-map file skipping): DYNAMIC partition pruning. The fact side
    is the hive-partitioned event lake (partition column event_type);
    the dim side is a tiny type dimension filtered on an md5-nibble
    parity attribute. Catalyst's PartitionPruning rule reuses the dim
    broadcast as a dynamicpruning#N subquery inside the fact scan's
    PartitionFilters (it also constraint-propagates the key-derived
    parity predicate statically — both prunings coexist in the plan;
    with a dim attribute not derived from the key, only the dynamic
    one would remain),
    so only the surviving partitions' directories are ever listed or
    read — at 100 TB this is the difference between scanning 2/5 of
    the lake and all of it, decided at RUNTIME from the dim data.
    Plan-asserted in tests (dynamicpruning present; results identical
    to the unpartitioned oracle join)."""
    prep(spark)
    d = _partitioned_events_dir(sf_dir)
    fact = spark.read.parquet(d)
    dim = (
        table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .where(
            F.conv(F.substring(F.md5("event_type"), 1, 1), 16, 10).cast("long") % 2
            == 0
        )
    )
    return (
        fact.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        )
    )



@query(
    "join_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT l_suppkey AS supp, l_orderkey AS ok, l_linenumber AS ln,
             l_partkey AS pk,
             (CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS s,
             (CAST(l_shipdate AS DATE) - DATE '1970-01-01')
               + CAST(l_quantity AS BIGINT) % 30 + 1 AS e
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    )
    SELECT a.supp AS l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM iv a JOIN iv b
      ON a.supp = b.supp
     AND (a.ok, a.ln, a.pk) < (b.ok, b.ln, b.pk)
     AND a.s < b.e AND b.s < a.e
    GROUP BY a.supp
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap SELF-join (the genomics / double-booking shape;
    distinct from `join_range`'s point-in-band probe): per supplier,
    count pairs of 1997 shipments whose [ship, ship + qty%30 + 1) day
    intervals overlap. The oracle states the quadratic join; the Spark
    plan reduces it to an EQUI-join by bucketing every interval onto
    the epoch-week grid cells it spans (explode of a <=6-element
    sequence), joining on (supplier, week-cell), deduplicating pairs
    that share multiple cells, then applying the exact overlap
    predicate — at 100 TB the cross product never forms: candidates
    are bounded by cell co-residency (the spatial_knn grid trick on
    the time axis). All interval arithmetic is integer epoch-days
    (datediff from the epoch; the NTZ fixture timestamps never meet a
    timezone); pair identity is the
    strict lexicographic row-key order, identical on both engines."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    day = F.datediff(
        F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    iv = li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(
        F.col("l_suppkey").alias("supp"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_partkey").alias("pk"),
        day.alias("s"),
        (day + F.col("l_quantity").cast("long") % 30 + 1).alias("e"),
    )
    cells = iv.select(
        "*", F.explode(F.sequence(F.expr("s div 7"), F.expr("(e - 1) div 7"))).alias("wk")
    )
    a = cells.select(*[F.col(c).alias(f"a_{c}") for c in cells.columns])
    b = cells.select(*[F.col(c).alias(f"b_{c}") for c in cells.columns])
    key_a = F.struct("a_ok", "a_ln", "a_pk")
    key_b = F.struct("b_ok", "b_ln", "b_pk")
    pairs = (
        a.join(
            b,
            (F.col("a_supp") == F.col("b_supp")) & (F.col("a_wk") == F.col("b_wk")),
        )
        .where(
            (key_a < key_b)
            & (F.col("a_s") < F.col("b_e"))
            & (F.col("b_s") < F.col("a_e"))
        )
        .select("a_supp", "a_ok", "a_ln", "a_pk", "b_ok", "b_ln", "b_pk")
        .distinct()
    )
    return pairs.groupBy(F.col("a_supp").alias("l_suppkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


def _orc_orders_dir(sf_dir: str) -> str:
    """Derivation of orders as an ORC dataset (written once by Spark
    itself on first use, content-keyed to the fixture like
    _zonemap_orders_dir so regeneration invalidates it). ORC is the
    second columnar format the engine reads natively; the content is
    byte-identical to orders.parquet so the parquet oracle checks the
    ORC reader."""
    import os

    from ..paths import tmp_root

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    sf_tag = _sf_cache_tag(sf_dir)
    return os.path.join(
        tmp_root(), f"orcorders_{sf_tag}_{st.st_size}_{st.st_mtime_ns}"
    )


@query(
    "scan_orc",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS price_sum
    FROM orders
    WHERE o_orderkey % 4 = 1
    GROUP BY o_orderstatus
    """,
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family format axis: the same orders relation served from ORC
    (Spark's second built-in columnar format — the path a lake with
    mixed-format history needs). The derivation is written by Spark
    from the parquet original on first use, so the oracle (running on
    parquet) checks the ORC reader end-to-end: schema mapping, decimal
    round-trip, and predicate pushdown (the key-mod residue filter and
    column pruning reach the ORC scan exactly like parquet —
    `PushedFilters` appears in the plan for both formats)."""
    import glob as _glob
    import os
    import shutil

    prep(spark)
    d = _orc_orders_dir(sf_dir)
    sf_tag = _sf_cache_tag(sf_dir)
    if not os.path.isdir(d):
        # stale-cache cleanup scoped to THIS sf (like the evpart_/
        # schemaevo_/zonemap_ siblings): an unscoped glob would delete —
        # and could race — other scale factors' live ORC caches.
        for stale in _glob.glob(
            os.path.join(os.path.dirname(d), f"orcorders_{sf_tag}_*")
        ):
            shutil.rmtree(stale, ignore_errors=True)
        stage = d + ".staging"
        table(spark, sf_dir, "orders").write.mode("overwrite").orc(stage)
        os.replace(stage, d)
    df = spark.read.orc(d)
    return (
        df.where(F.col("o_orderkey") % 4 == 1)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("price_sum"),
        )
    )


def _fixed_width_dir(sf_dir: str) -> str:
    """Derive a fixed-width text rendering of `orders` under .tmp
    (same identity-keyed caching as `_text_source_dir`). Layout:
    orderkey 12 (zero-padded) | status 1 | total cents 14 (zero-
    padded) | orderdate 10 (yyyy-mm-dd) — 37 chars per record, the
    mainframe/COBOL copybook shape."""
    import glob as _glob
    import os
    import shutil
    from decimal import Decimal

    import pyarrow.parquet as pq

    from ..paths import tmp_root

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    sf_tag = _sf_cache_tag(sf_dir)
    d = os.path.join(tmp_root(), f"fixedw_{sf_tag}_{st.st_size}_{st.st_mtime_ns}")
    if os.path.isdir(d):
        return d
    for stale in _glob.glob(os.path.join(tmp_root(), f"fixedw_{sf_tag}_*")):
        shutil.rmtree(stale, ignore_errors=True)
    rows = pq.read_table(
        src, columns=["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    ).to_pylist()
    rows.sort(key=lambda r: r["o_orderkey"])
    stage = d + ".staging"
    os.makedirs(stage, exist_ok=True)
    with open(os.path.join(stage, "part-000.txt"), "w", newline="\n") as f:
        for r in rows:
            cents = int(
                (
                    Decimal(str(r["o_totalprice"])).quantize(Decimal("0.01")) * 100
                ).to_integral_value()
            )
            f.write(
                f"{r['o_orderkey']:012d}"
                f"{r['o_orderstatus']:.1s}"
                f"{cents:014d}"
                f"{r['o_orderdate'].date().isoformat():.10s}\n"
            )
    os.rename(stage, d)
    return d


@query(
    "scan_fixed_width",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents_total,
           MIN(CAST(CAST(o_orderdate AS DATE) AS VARCHAR)) AS first_date,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders GROUP BY 1
    """,
)
def scan_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family: FIXED-WIDTH record source — the mainframe/copybook
    layout (zero-padded numeric fields at fixed byte offsets, no
    delimiters) that legacy feeds still arrive in. Orders are rendered
    to a 37-char layout once under .tmp (identity-keyed cache, the
    scan_csv derivation discipline) and read back with `spark.read
    .text` + substring/cast parsing; the per-status rollup must equal
    the same rollup straight off the parquet — proving the render →
    text scan → offset-parse round trip is lossless (cents survive as
    exact integers; dates as ISO strings).

    Scale shape (100 TB): text files split by line; parsing is pure
    per-row JVM substring/cast expressions inside whole-stage codegen
    (no regex, no UDF), then ONE map-side-combinable aggregate. An
    explicit layout means no inference pass over the data."""
    prep(spark)
    d = _fixed_width_dir(sf_dir)
    raw = spark.read.text(d)
    parsed = raw.select(
        F.substring("value", 1, 12).cast("long").alias("o_orderkey"),
        F.substring("value", 13, 1).alias("status"),
        F.substring("value", 14, 14).cast("long").alias("cents"),
        F.substring("value", 28, 10).alias("date_str"),
    )
    return parsed.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("cents_total"),
        F.min("date_str").alias("first_date"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )


@query(
    "countmin_calibration",
    oracle="""
    WITH rows_d AS (
      SELECT user_id, d FROM events, (SELECT UNNEST(range(4)) AS d)
    ),
    b AS (
      SELECT user_id, d,
        ((((instr('0123456789abcdef', substr(md5(d || ':' || user_id), 1, 1)) - 1) * 16
         + (instr('0123456789abcdef', substr(md5(d || ':' || user_id), 2, 1)) - 1)) * 16
         + (instr('0123456789abcdef', substr(md5(d || ':' || user_id), 3, 1)) - 1)) * 16
         + (instr('0123456789abcdef', substr(md5(d || ':' || user_id), 4, 1)) - 1)) % 1024 AS bucket
      FROM rows_d
    ),
    cells AS (
      SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM b GROUP BY 1, 2
    ),
    probes AS (SELECT DISTINCT user_id, d, bucket FROM b),
    est AS (
      SELECT p.user_id, CAST(MIN(c.cnt) AS BIGINT) AS est
      FROM probes p JOIN cells c ON c.d = p.d AND c.bucket = p.bucket
      GROUP BY p.user_id
    ),
    exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS tru
      FROM events GROUP BY user_id
    )
    SELECT CAST(LEAST((10 * (e.est - x.tru)) // x.tru, 10) AS BIGINT)
             AS over_decile,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(e.est - x.tru) AS BIGINT) AS overcount_sum
    FROM est e JOIN exact x ON x.user_id = e.user_id
    GROUP BY 1 ORDER BY 1
    """,
)
def countmin_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN ESTIMATOR CALIBRATION — `minhash_estimate_calibration`'s
    sibling for the frequency sketch: every tracked key's point
    estimate (min over the 4 depths of its cell counts) against its
    exact count, histogrammed by relative OVERCOUNT decile
    floor(10·(est−true)/true), capped at 10 (CMS never undercounts —
    the one-sided guarantee this audit verifies empirically, plus HOW
    FAR the 1024-bucket width overshoots at this key cardinality: the
    sizing readout before trusting the sketch on a heavier-tailed
    corpus). The ratio is integer cross-multiplied; the summed
    overcount is exact.

    Scale shape: the sketch build is the `sketch_countmin` shape
    (≤4·1024 cells, map-side combinable); probes are one distinct
    (key, depth, bucket) projection equi-joined against the broadcast
    cell table; two hash aggregates end it."""
    prep(spark)
    ev = table(spark, sf_dir, "events").select("user_id")
    rows_d = ev.select(
        "user_id", F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("d")
    )
    hex4 = F.substring(
        F.md5(
            F.concat(
                F.col("d").cast("string"), F.lit(":"), F.col("user_id").cast("string")
            ).cast("binary")
        ),
        1,
        4,
    )
    b = rows_d.select(
        "user_id",
        F.col("d").cast("long").alias("d"),
        (F.conv(hex4, 16, 10).cast("long") % 1024).alias("bucket"),
    )
    cells = b.groupBy("d", "bucket").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    probes = b.distinct()
    est = (
        probes.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").cast("long").alias("est"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("tru"))
    return (
        est.join(exact, "user_id")
        .groupBy(
            F.expr("LEAST((10 * (est - tru)) div tru, 10)")
            .cast("long")
            .alias("over_decile")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.col("est") - F.col("tru")).cast("long").alias("overcount_sum"),
        )
        .orderBy("over_decile")
    )


def _bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The runtime-bloom-filter demonstration join (shared by the
    registry key and its plan-pin test): lineitem joined to a
    SELECTIVE order subset (urgent + high-value) on the shuffle key,
    monthly rollup. With broadcast suppressed and the application-side
    scan threshold at 0, Catalyst's InjectRuntimeFilter rewrites the
    fact side to `might_contain(bloom_agg(o_orderkey), l_orderkey)` —
    rows that cannot join are dropped BEFORE the shuffle."""
    sel = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 200000)
        )
        .select("o_orderkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (dec2("l_extendedprice") * 100).cast("long").alias("cents"),
        F.substring(F.col("l_shipdate").cast("string"), 1, 7).alias("month"),
    )
    return (
        li.join(sel, li["l_orderkey"] == sel["o_orderkey"])
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _with_bloom_confs(spark: SparkSession, fn):
    """Scope the two bloom-forcing confs around fn() and RESTORE them —
    the session is driver-owned and other keys' plan pins depend on the
    defaults (the prep() idempotence contract)."""
    from ..plans.confs import scoped_confs

    with scoped_confs(spark, _BLOOM_CONFS):
        return fn()


@query(
    "join_bloom_runtime_filter",
    oracle="""
    SELECT substr(CAST(l_shipdate AS VARCHAR), 1, 7) AS month,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderpriority = '1-URGENT'
      AND o_totalprice > 200000
    GROUP BY 1
    """,
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-family scale story #4 (after static pruning, zone-map
    skipping, and dynamic partition pruning): RUNTIME BLOOM-FILTER
    semi-join reduction. When one side of a shuffle join carries a
    selective predicate, Catalyst builds a bloom sketch of its join
    keys in a one-row subquery and injects
    `might_contain(..., xxhash64(l_orderkey))` into the OTHER side's
    scan — at 100 TB the fact rows that cannot join die at the scan,
    not after the shuffle (the 20x shuffle-byte cut DPP cannot give
    when the fact is not partitioned by the key). The two forcing
    confs (scan-size threshold, broadcast suppression — at fixture
    scale the dim would broadcast and need no bloom) are SCOPED
    around an eager materialization and restored, so no other key's
    plan ever sees them; the plan pin lives in test_plans.py.
    Results are conf-independent — the oracle is the plain join."""
    prep(spark)
    return _with_bloom_confs(
        spark, lambda: local_checkpoint(_bloom_join(spark, sf_dir))
    )


_SKEW_AQE_CONFS = {
    # AQE skew-join defaults are sized for production partitions
    # (256 MB threshold); at fixture scale they are scoped DOWN so the
    # deliberately-hot partition (~70% of the fact on one key) trips
    # the same detector a 100 TB hot key would trip at the defaults.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
    # the dim must not broadcast, or there is no shuffle join to split
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _with_skew_aqe_confs(spark: SparkSession, fn):
    """Scope the skew-forcing confs around fn() and RESTORE them (the
    join_bloom_runtime_filter discipline: the session is driver-owned
    and other keys' plan pins depend on the defaults)."""
    from ..plans.confs import scoped_confs

    with scoped_confs(spark, _SKEW_AQE_CONFS):
        return fn()


def _skew_aqe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    hot_f = F.when(F.col("l_partkey") % 10 < 7, F.lit(0)).otherwise(
        F.col("l_partkey")
    )
    # Each fixture file is ONE parquet row group = ONE map task, and
    # AQE splits a skewed reduce partition at MAPPER boundaries — with
    # a single mapper there is nothing to split. The round-robin
    # repartition(8) simulates the many-mapper shuffle a real cluster
    # scan produces (at 100 TB the fact side has thousands of map
    # tasks and this exchange would not exist).
    fact = (
        table(spark, sf_dir, "lineitem")
        .select(hot_f.cast("long").alias("hk"), "l_returnflag", "l_quantity")
        .repartition(8)
    )
    # The dim is built as cold-projection UNION hot-1-row-aggregate, NOT
    # a groupBy(hk): a groupBy's output is already hash-partitioned on
    # hk, the join requirement is then satisfied with NO dim-side
    # shuffle stage, and OptimizeSkewedJoin — which pattern-matches
    # SMJ(Sort(shuffle), Sort(shuffle)) because splitting the skewed
    # side means replicating the OTHER side's shuffle partition — never
    # fires. The union's unknown partitioning forces the fresh
    # ENSURE_REQUIREMENTS exchange the rule needs. Values are identical
    # to the groupBy (cold hk are unique, MIN of one row is the row).
    hot_mask = F.col("p_partkey") % 10 < 7
    cents = (F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
    part_t = table(spark, sf_dir, "part")
    cold = part_t.where(~hot_mask).select(
        F.col("p_partkey").cast("long").alias("hk"),
        cents.alias("dim_cents"),
    )
    # groupBy on the constant key, NOT a global agg: a global aggregate
    # emits one (hk=0, dim_cents=NULL) row even when no part rows are
    # hot, while the oracle's GROUP BY emits none (ADVICE r13). The
    # grouped form yields zero rows on empty input; the downstream
    # union still has unknown partitioning, so the fresh
    # ENSURE_REQUIREMENTS exchange OptimizeSkewedJoin needs survives.
    hot = (
        part_t.where(hot_mask)
        .groupBy(F.lit(0).cast("long").alias("hk"))
        .agg(F.min(cents).cast("long").alias("dim_cents"))
    )
    dim = cold.unionByName(hot)
    # the aggregate key (l_returnflag) is NOT the join key (hk), so the
    # aggregate needs its own shuffle no matter what — splitting the
    # skewed join partition therefore costs AQE no EXTRA shuffle and
    # OptimizeSkewedJoin applies without forceOptimizeSkewedJoin
    return (
        fact.join(dim, "hk")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            money_sum("l_quantity", "sum_qty"),
            F.sum("dim_cents").cast("long").alias("sum_dim_cents"),
        )
    )


@query(
    "join_skew_aqe_split",
    oracle="""
    WITH f AS (
      SELECT CASE WHEN l_partkey % 10 < 7 THEN 0 ELSE l_partkey END AS hk,
             l_returnflag, l_quantity
      FROM lineitem
    ),
    d AS (
      SELECT CASE WHEN p_partkey % 10 < 7 THEN 0 ELSE p_partkey END AS hk,
             CAST(MIN(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS dim_cents
      FROM part GROUP BY 1
    )
    SELECT f.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(d.dim_cents) AS BIGINT) AS sum_dim_cents
    FROM f JOIN d ON d.hk = f.hk
    GROUP BY 1
    """,
)
def join_skew_aqe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-family scale story #5 — RUNTIME skew-join splitting, the one
    Catalyst scale feature not yet plan-pinned (VERDICT r12 #8) and
    the complement of `join_skew_salted`: salting is the STATIC
    mitigation you write into the query; AQE's OptimizeSkewedJoin is
    the DYNAMIC one the engine applies from the actual shuffle-map
    sizes at runtime, with no query rewrite. Same deliberately-hot
    derived key as the salted demo (part keys with `key % 10 < 7`
    collapse onto key 0, ~70% of fact rows on one join key — the
    reference's hot `name`-index probe, T:158, at shuffle-join
    scale): the skewed map partition is split into
    advisory-size chunks and the matching dim partition is
    replicated per chunk, so key 0's rows spread over many reducers —
    what salting does by hand, decided from runtime statistics
    instead. The forcing confs (threshold scaled to fixture bytes,
    broadcast suppression — the tiny dim would otherwise broadcast,
    which at fixture scale is the RIGHT plan) are SCOPED around an
    eager materialization and restored; a round-robin repartition(8)
    stands in for the many-mapper shuffle a real cluster scan
    produces, because AQE splits a skewed partition at MAPPER
    boundaries and the one-row-group fixture file is a single mapper. The executed plan's
    `skew=true` sort-merge join plus the conf restoration are pinned
    by tests/test_plans.py::test_skew_aqe_split_plan_and_restore; a
    green oracle row proves the split changes the schedule, never the
    result (the oracle is the plain unsalted, unsplit join)."""
    prep(spark)
    return _with_skew_aqe_confs(
        spark, lambda: local_checkpoint(_skew_aqe_join(spark, sf_dir))
    )
