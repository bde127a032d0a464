"""Deterministic random-walk sampling over the order–part bipartite
graph (SURVEY.md §2.13 X17): the DeepWalk/node2vec corpus generator —
fixed-length walks from a seed set, each step choosing a neighbor by a
HASH of (walk id, step) instead of an RNG, so the "random" walk is a
pure function of the data and replays identically on any engine,
any partitioning, any retry.

Reference parity: the reference's graph layer stops at stored
traversals (DimaYakov/blockchain2graphdb TraversalSource usage,
B:1100–1180); walk-corpus extraction is part of the training-data
surface this engine adds on top (SURVEY §2.13).

Scale notes (100 TB):
  * The adjacency (src, idx, dst) and degree tables are built once
    with one partitioned window / one aggregate over the DISTINCT edge
    list — never recomputed per step.
  * Each step is two keyed equi-joins (frontier→degree to compute the
    target index, then frontier→adjacency on (src, idx)) — no
    degree-sized fan-out: the adjacency join matches EXACTLY ONE row
    per walk because idx is a join key, so shuffle volume is O(#walks)
    per step regardless of hub degrees.
  * Walk length is a compile-time constant (3 hops), so the whole plan
    is one linear Catalyst DAG — no iterative driver loop, no
    checkpoint lifecycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import prep, table
from ..registry import query

_SEED_MOD = 50  # every 50th order key seeds a walk
_STEPS = 3  # order -> part -> order -> part


def _hash_pick(seed_col: F.Column, step: int) -> F.Column:
    """First 8 md5 hex digits of "<seed>:<step>" as a non-negative
    bigint (< 2^32). Spark conv(hex,16,10) ≡ DuckDB '0x…'::BIGINT —
    the pinned portable hex→int equivalence (spatial.py)."""
    key = F.concat(seed_col.cast("string"), F.lit(f":{step}"))
    return F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10).cast("long")


def _oracle() -> str:
    def pick(step: int) -> str:
        return (
            f"('0x' || substr(md5(CAST(seed AS VARCHAR) || ':{step}'), 1, 8))"
            f"::BIGINT"
        )

    return f"""
    WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    adj_op AS (
      SELECT o, p, row_number() OVER (PARTITION BY o ORDER BY p) - 1 AS idx
      FROM e
    ),
    deg_op AS (SELECT o, COUNT(*) AS deg FROM e GROUP BY o),
    adj_po AS (
      SELECT p, o, row_number() OVER (PARTITION BY p ORDER BY o) - 1 AS idx
      FROM e
    ),
    deg_po AS (SELECT p, COUNT(*) AS deg FROM e GROUP BY p),
    seeds AS (
      SELECT DISTINCT l_orderkey AS seed FROM lineitem
      WHERE l_orderkey % {_SEED_MOD} = 0
    ),
    s1 AS (
      SELECT s.seed, a.p AS node
      FROM seeds s
      JOIN deg_op d ON d.o = s.seed
      JOIN adj_op a ON a.o = s.seed AND a.idx = {pick(1)} % d.deg
    ),
    s2 AS (
      SELECT s.seed, a.o AS node
      FROM s1 s
      JOIN deg_po d ON d.p = s.node
      JOIN adj_po a ON a.p = s.node AND a.idx = {pick(2)} % d.deg
    ),
    s3 AS (
      SELECT s.seed, a.p AS node
      FROM s2 s
      JOIN deg_op d ON d.o = s.node
      JOIN adj_op a ON a.o = s.node AND a.idx = {pick(3)} % d.deg
    )
    SELECT seed, CAST(0 AS BIGINT) AS step, 'order' AS node_type,
           CAST(seed AS BIGINT) AS node
    FROM seeds
    UNION ALL SELECT seed, 1, 'part', CAST(node AS BIGINT) FROM s1
    UNION ALL SELECT seed, 2, 'order', CAST(node AS BIGINT) FROM s2
    UNION ALL SELECT seed, 3, 'part', CAST(node AS BIGINT) FROM s3
    """


@query("random_walk_sample", oracle=_oracle())
def random_walk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step deterministic walks over the order↔part bipartite graph
    from every {_SEED_MOD}th order: step t moves from the current node
    to its neighbor with index md5(seed, t) mod degree, neighbors
    ranked by id — the DeepWalk corpus generator with the RNG replaced
    by a content hash, so walks are reproducible across engines and
    retries (the md5-bucket split_assign philosophy applied to graph
    sampling). Output is the flattened (seed, step, node_type, node)
    trajectory table a skip-gram trainer consumes.

    Scale shape: adjacency + degree built once from the distinct edge
    list (one window, one aggregate); each step is two keyed
    equi-joins with exactly one adjacency match per walk (idx is a
    join key — no hub fan-out); the walk count is |seeds|, constant
    per step. Walk length is a literal, so the plan is linear —
    no driver iteration."""
    prep(spark)
    e = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj_op = e.select(
        "o", "p", (F.row_number().over(W.partitionBy("o").orderBy("p")) - 1).alias("idx")
    )
    deg_op = e.groupBy("o").agg(F.count(F.lit(1)).alias("deg"))
    adj_po = e.select(
        "p", "o", (F.row_number().over(W.partitionBy("p").orderBy("o")) - 1).alias("idx")
    )
    deg_po = e.groupBy("p").agg(F.count(F.lit(1)).alias("deg"))

    seeds = (
        e.select(F.col("o").alias("seed"))
        .where(F.col("seed") % _SEED_MOD == 0)
        .distinct()
    )

    def step(cur: DataFrame, t: int) -> DataFrame:
        """cur: (seed, node). Odd t: order->part; even t: part->order."""
        deg, adj, src, dst = (
            (deg_op, adj_op, "o", "p") if t % 2 == 1 else (deg_po, adj_po, "p", "o")
        )
        tgt = cur.join(deg, cur["node"] == deg[src]).select(
            "seed", "node", (_hash_pick(F.col("seed"), t) % F.col("deg")).alias("idx")
        )
        return tgt.join(adj, (tgt["node"] == adj[src]) & (tgt["idx"] == adj["idx"])).select(
            "seed", F.col(dst).alias("node")
        )

    s1 = step(seeds.select("seed", F.col("seed").alias("node")), 1)
    s2 = step(s1, 2)
    s3 = step(s2, 3)

    def out(df: DataFrame, t: int, node_type: str) -> DataFrame:
        return df.select(
            "seed",
            F.lit(t).cast("long").alias("step"),
            F.lit(node_type).alias("node_type"),
            F.col("node").cast("long").alias("node"),
        )

    start = seeds.select("seed", F.col("seed").alias("node"))
    return (
        out(start, 0, "order")
        .unionAll(out(s1, 1, "part"))
        .unionAll(out(s2, 2, "order"))
        .unionAll(out(s3, 3, "part"))
    )
