"""Entity resolution / record linkage (SURVEY.md §2.13 extension
surface): blocking-key candidate generation → edit-distance
verification → connected components → canonical entity ids — the
classic three-stage dedup-of-records pipeline (Fellegi–Sunter style
blocking, deterministic verify), sharing the components machinery with
wallet clustering (graph/components.py).

Scale notes (100 TB): candidate pairs come ONLY from an equi-join on
the blocking key — never an all-pairs comparison; the Levenshtein
verify runs inside blocks (JVM-side `levenshtein`, no Python); the
verified-pair graph is a sliver of the input by construction, so the
components step operates on a tiny edge list. Entity assignment is a
single left join back to the full record table — records without any
verified match default to their own key (singleton entities), exactly
the label-assignment pattern of dedup.minhash_clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import prep, table
from ..graph.components import connected_components
from ..registry import query

_RECORD_LINKAGE_ORACLE = """
    WITH RECURSIVE c AS (
      SELECT c_custkey, c_name, substr(c_name, 1, 17) AS blk FROM customer
    ),
    pairs AS (
      SELECT a.c_custkey AS s, b.c_custkey AS d
      FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    ),
    sym AS (
      SELECT s, d FROM pairs UNION SELECT d, s FROM pairs
    ),
    reach AS (
      SELECT c_custkey AS node, c_custkey AS comp FROM c
      UNION
      SELECT s.d AS node, r.comp FROM reach r JOIN sym s ON s.s = r.node
    ),
    comp AS (
      SELECT node, MIN(comp) AS entity_id FROM reach GROUP BY node
    )
    SELECT node AS c_custkey, entity_id,
           CAST(COUNT(*) OVER (PARTITION BY entity_id) AS BIGINT) AS entity_size
    FROM comp
    """


@query("record_linkage", oracle=_RECORD_LINKAGE_ORACLE)
def record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over customer records: block on the 17-char
    name prefix (bounded blocks — ≤10 records each in the fixture's
    zero-padded naming, and in production whatever the blocking key
    yields), generate candidate pairs by blocking-key equi-join with
    a < b orientation, verify with Levenshtein ≤ 1 (JVM built-in),
    cluster verified matches with connected components, and assign
    entity_id = min custkey per cluster. Unmatched records become
    singleton entities via the left-join default. Deterministic
    end-to-end, so the recursive-CTE oracle replays it exactly."""
    prep(spark)
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.substring("c_name", 1, 17).alias("blk")
    )
    a = cust.select(
        F.col("blk"), F.col("c_custkey").alias("s"), F.col("c_name").alias("name_s")
    )
    b = cust.select(
        F.col("blk"), F.col("c_custkey").alias("d"), F.col("c_name").alias("name_d")
    )
    pairs = (
        a.join(b, "blk")
        .where(F.col("s") < F.col("d"))
        .where(F.levenshtein("name_s", "name_d") <= 1)
        .select("s", "d")
    )
    comp = connected_components(pairs, "s", "d", canonical=True)
    out = (
        cust.join(
            comp.select(F.col("node").alias("c_custkey"), "comp"), "c_custkey", "left"
        )
        .select(
            "c_custkey",
            F.coalesce(F.col("comp"), F.col("c_custkey")).alias("entity_id"),
        )
    )
    return out.withColumn(
        "entity_size",
        F.count(F.lit(1)).over(W.partitionBy("entity_id")).cast("long"),
    )
