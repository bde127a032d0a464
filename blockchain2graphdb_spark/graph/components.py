"""Iterative graph algorithms as DataFrame fixpoints (SURVEY.md §4.3.1).

Catalyst has no fixpoint operator, so the two genuinely iterative pieces
of the surface live here:

* `connected_components` — min-label propagation over an undirected edge
  list. Converges in O(diameter) keyed-join rounds; each round is one
  shuffle on the node key. Lineage is cut with `localCheckpoint` every
  round so the plan does not grow with the iteration count (the classic
  iterative-DataFrame failure mode). At 100 TB the same loop holds:
  label propagation is the alternating-join formulation of
  large-star/small-star, skewed mega-components are handled by AQE skew
  splitting on the join key, and convergence is detected with a cheap
  aggregate rather than a collect of the frontier.

* `list_rank` — pointer-jumping (path doubling) over parent links:
  O(log chain-length) self-joins instead of the reference's O(n)
  parent-at-a-time walk (B:43–46 repeat/until, B:392–412 buffer sort).

This implements what the reference only stubbed: wallet clustering
(AddressWalletID, TransactionGraph.java:137, is declared but never
computed — BlockchainToGraph.java:29/58/896 leave the counter at 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """Undirected connected components; returns (node, component) where
    component = min node id in the component. Deterministic."""
    directed = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    sym = (
        directed.union(directed.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()  # single dedup pass after symmetrization
        .localCheckpoint(eager=True)
    )

    comp = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "comp", F.col("node")
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(comp, sym.b == comp.node)
            .select(F.col("a").alias("node"), "comp")
            .groupBy("node")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = comp.join(nbr_min, "node", "left").select(
            "node",
            "comp",
            F.least(
                F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
            ).alias("new_comp"),
        )
        # pointer doubling (comp := comp[comp]): labels are node ids, so a
        # second hop through the mapping halves the rounds to convergence
        # (the shortcutting step of large-star/small-star)
        lut = stepped.select(
            F.col("node").alias("lk"), F.col("new_comp").alias("lv")
        )
        # one materialization per round: checkpoint the (old, new) pair,
        # then both the convergence probe and the next iteration read it
        joined = (
            stepped.join(lut, stepped.new_comp == lut.lk, "left")
            .select(
                "node",
                "comp",
                F.coalesce(F.col("lv"), F.col("new_comp")).alias("new_comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = joined.where(F.col("new_comp") != F.col("comp")).limit(1).count()
        comp = joined.select("node", F.col("new_comp").alias("comp"))
        if changed == 0:
            break
    return comp


def list_rank(links: DataFrame, id_col: str = "id", parent_col: str = "parent") -> DataFrame:
    """Position of each node in its chain (1-based), from (id, parent)
    links alone, parent NULL at the head. Pointer jumping: each round
    rewrites ptr -> ptr's ptr and accumulates the skipped distance, so a
    chain of length L resolves in ceil(log2 L) self-joins.
    """
    cur = links.select(
        F.col(id_col).alias("id"),
        F.col(parent_col).alias("ptr"),
        F.when(F.col(parent_col).isNull(), F.lit(0)).otherwise(F.lit(1)).alias("dist"),
    ).localCheckpoint(eager=True)

    while cur.where(F.col("ptr").isNotNull()).limit(1).count() > 0:
        a = cur.alias("x")
        b = cur.select(
            F.col("id").alias("b_id"), F.col("ptr").alias("b_ptr"), F.col("dist").alias("b_dist")
        ).alias("y")
        cur = (
            a.join(b, F.col("x.ptr") == F.col("y.b_id"), "left")
            .select(
                F.col("x.id").alias("id"),
                F.when(F.col("x.ptr").isNull(), F.lit(None))
                .otherwise(F.col("y.b_ptr"))
                .alias("ptr"),
                (
                    F.col("x.dist")
                    + F.when(
                        F.col("x.ptr").isNull() | F.col("y.b_dist").isNull(), F.lit(0)
                    ).otherwise(F.col("y.b_dist"))
                ).alias("dist"),
            )
            .localCheckpoint(eager=True)
        )
    return cur.select("id", (F.col("dist") + 1).alias("pos"))
