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
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    broadcast_nodes: int = 4_000_000,
    canonical: bool = False,
    probe_every: int = 2,
) -> DataFrame:
    """Undirected connected components; returns (node, component) where
    component = min node id in the component. Deterministic.

    Checkpointed plans surface as LogicalRDDs with no size statistics,
    so Catalyst (and AQE) never broadcast the per-node label table and
    every round shuffles the full edge list. The node count is known
    after the first materialization — when it fits comfortably in the
    driver/executors (<= broadcast_nodes), hint `broadcast` on the
    label side explicitly: each round then streams the checkpointed
    edges map-side with zero edge shuffle. Past the threshold the hint
    is dropped and rounds run as keyed shuffles with AQE skew handling
    — the 100 TB path.

    canonical=True declares every input edge oriented src < dst
    (true for star-contraction and a<b candidate-pair builders), so
    symmetrization cannot put one pair in both orientations and the
    whole-edge-list dedup shuffle is skipped — at 100 TB that is a
    full extra pass over the largest table in the job. Duplicate rows
    are permitted and absorbed by the min-label aggregation; callers
    whose duplication factor is small (a handful per group) should
    NOT pre-distinct — the dedup shuffle costs more than the
    duplicates inflate the rounds (measured on wallet_components).
    """
    directed = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    sym = directed.union(
        directed.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    if not canonical:
        sym = sym.distinct()  # single dedup pass after symmetrization
    # lazy checkpoint + count: the count action materializes the
    # checkpoint, so the short-circuit gate and the materialization are
    # ONE driver-visible job instead of two
    sym = sym.localCheckpoint(eager=False)
    n_edges = sym.count()

    # tiny graphs short-circuit to driver-side union-find: the
    # distributed loop costs a handful of jobs per round, which
    # dominates below ~10^5 edges (e.g. the verified-pair graphs of
    # near-dup dedup). Same labels (component = min member) either way.
    if n_edges <= 100_000:
        spark = sym.sparkSession
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for a, b in sym.collect():
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min so the final relabel is the min member
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        rows = [(n, find(n)) for n in parent]
        return spark.createDataFrame(rows, sym.schema).toDF("node", "comp")

    comp = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "comp", F.col("node")
    )
    n_nodes = comp.count()
    hint = F.broadcast if n_nodes <= broadcast_nodes else (lambda df: df)
    for i in range(max_iter):
        nbr_min = (
            sym.join(hint(comp), sym.b == comp.node)
            .select(F.col("a").alias("node"), "comp")
            .groupBy("node")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = comp.join(hint(nbr_min), "node", "left").select(
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
            stepped.join(hint(lut), stepped.new_comp == lut.lk, "left")
            .select(
                "node",
                "comp",
                F.coalesce(F.col("lv"), F.col("new_comp")).alias("new_comp"),
            )
            .localCheckpoint(eager=True)
        )
        comp = joined.select("node", F.col("new_comp").alias("comp"))
        # amortized convergence probe: pointer doubling converges in
        # O(log diameter) rounds, so a probe per round spends more
        # driver-visible jobs (scheduler latency × rounds) than the at
        # most one extra no-op round the amortization can cost. An
        # already-converged round is a fixpoint (new_comp == comp
        # everywhere), so extra rounds never change labels.
        if (i + 1) % probe_every == 0 or i == max_iter - 1:
            changed = (
                joined.where(F.col("new_comp") != F.col("comp")).limit(1).count()
            )
            if changed == 0:
                break
    return comp


def list_rank(
    links: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    broadcast_nodes: int = 4_000_000,
    max_iter: int = 64,
    probe_every: int = 2,
) -> DataFrame:
    """Position of each node in its chain (1-based), from (id, parent)
    links alone, parent NULL at the head. Pointer jumping: each round
    rewrites ptr -> ptr's ptr and accumulates the skipped distance, so a
    chain of length L resolves in ceil(log2 L) self-joins.

    Same checkpoint-loses-stats story as connected_components: the
    lookup side of each self-join is hinted broadcast while the node
    count (known after the first materialization) stays under
    broadcast_nodes; above it, shuffled self-joins.

    The liveness probe is amortized to every `probe_every` rounds: the
    loop bound is deterministic (ceil(log2 L) jumps), resolved rounds
    are no-ops (null ptr keeps dist unchanged), and a probe per round
    costs more fixed scheduler latency than the at most one extra no-op
    round. max_iter (chains up to 2^64) is a divergence backstop only.
    """
    cur = links.select(
        F.col(id_col).alias("id"),
        F.col(parent_col).alias("ptr"),
        F.when(F.col(parent_col).isNull(), F.lit(0)).otherwise(F.lit(1)).alias("dist"),
    ).localCheckpoint(eager=False)
    # lazy checkpoint: this count both materializes it and sizes the hint
    hint = F.broadcast if cur.count() <= broadcast_nodes else (lambda df: df)

    for i in range(max_iter):
        a = cur.alias("x")
        b = cur.select(
            F.col("id").alias("b_id"), F.col("ptr").alias("b_ptr"), F.col("dist").alias("b_dist")
        ).alias("y")
        cur = (
            a.join(hint(b), F.col("x.ptr") == F.col("y.b_id"), "left")
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
        if (i + 1) % probe_every == 0:
            if cur.where(F.col("ptr").isNotNull()).limit(1).count() == 0:
                break
    return cur.select("id", (F.col("dist") + 1).alias("pos"))


def incremental_components(
    labels: DataFrame, new_edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Incremental maintenance for connected components: fold a batch of
    new edges into an existing (node, comp) labeling WITHOUT touching
    unaffected components.

    The reference's incremental story is per-row read-modify-write
    (M2); the declarative equivalent: (1) resolve the new edges'
    endpoints to current component ids, (2) the only components that
    can change are those touched by a new edge — restrict the existing
    labeling to them, (3) treat each retained label row (node → comp)
    as an edge and re-run min-label propagation over that small
    subgraph plus the new edges, (4) union with the untouched labels.
    Work is O(size of affected components + batch), not O(graph) — at
    100 TB a micro-batch of edges re-labels a few components, and
    label rows for everything else are never read past the semi-join.

    Equivalence to full recomputation is pinned in tests.
    """
    edges = new_edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    endpoints = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .distinct()
    )
    touched_comps = (
        labels.join(endpoints, "node", "left_semi").select("comp").distinct()
    )
    affected = labels.join(touched_comps, "comp", "left_semi")
    untouched = labels.join(touched_comps, "comp", "left_anti")

    # label rows as edges keep previously-merged nodes connected; new
    # nodes appear only in `edges`
    sub_edges = affected.select(
        F.col("node").alias("src"), F.col("comp").alias("dst")
    ).union(edges.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    relabeled = connected_components(sub_edges)
    return untouched.unionByName(relabeled.select("node", "comp"))
