"""Gremlin-shaped traversal DSL compiling to DataFrame plans.

The reference's entire query surface is Gremlin fluent traversals
(`g.V().has("name", x).in("locked").out("output")...`, ~50 sites in
BlockchainToGraph.java). A user of the reference keeps that shape here —
but every step extends a *declarative plan* that Catalyst optimizes
(join reordering, broadcast, pushdown), instead of executing a step-at-
a-time walk per vertex.

Model: vertex tables keyed by label; edges declared as (src_label,
name, dst_label, src_key, dst_key) over FK columns (SURVEY.md §1.6).
Supported steps mirror the reference's usage: V(label) / has / out /
in_ / values / count / limit / dedup / toDF.

Example — the reference's 3-hop counterparty walk (B:952–963):

    g = chain_graph(tables)
    (g.V("Address").has("address", a)
      .in_("locked").in_("output").in_("input").out("locked")
      .values("address").dedup())
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Edge:
    src_label: str
    name: str
    dst_label: str
    src_key: str  # column on the src vertex table
    dst_key: str  # column on the dst vertex table


class PropertyGraph:
    def __init__(self, vertices: dict[str, DataFrame], edges: list[Edge]):
        self.vertices = vertices
        self._out = {(e.src_label, e.name): e for e in edges}
        self._in = {(e.dst_label, e.name): e for e in edges}

    def V(self, label: str) -> "Traversal":
        return Traversal(self, label, self.vertices[label])

    def find(self, pattern: str) -> DataFrame:
        """GraphFrames-style motif finding: `"(a)-[has]->(b); (b)-[output]->(c)"`
        returns one row per match with columns `<name>_<vertexcol>`.
        Each triple compiles to one equi-join; Catalyst reorders and
        broadcasts as usual, so a motif is exactly as fast as the same
        hand-written join tree. Vertex labels are inferred from the edge
        declarations (a name must resolve to one label across triples)."""
        import re

        triples = []
        for part in pattern.split(";"):
            m = re.fullmatch(r"\s*\((\w+)\)-\[(\w+)\]->\((\w+)\)\s*", part)
            if not m:
                raise ValueError(f"bad motif triple: {part!r}")
            triples.append(m.groups())

        by_name = {e.name: e for e in self._out.values()}
        labels: dict[str, str] = {}
        for a, ename, b in triples:
            e = by_name.get(ename)
            if e is None:
                raise KeyError(f"unknown edge {ename!r}")
            for name, lbl in ((a, e.src_label), (b, e.dst_label)):
                if labels.setdefault(name, lbl) != lbl:
                    raise ValueError(
                        f"{name!r} used as both {labels[name]} and {lbl}"
                    )

        def aliased(name: str) -> DataFrame:
            df = self.vertices[labels[name]]
            return df.select(
                [F.col(c).alias(f"{name}_{c}") for c in df.columns]
            )

        result: DataFrame | None = None
        bound: set[str] = set()
        for a, ename, b in triples:
            e = by_name[ename]
            cond = F.col(f"{a}_{e.src_key}") == F.col(f"{b}_{e.dst_key}")
            if result is None:
                result = aliased(a)
                bound.add(a)
            if a in bound and b in bound:
                result = result.where(cond)  # closing edge of a cycle
            elif a in bound:
                result = result.join(aliased(b), cond)
                bound.add(b)
            elif b in bound:
                result = result.join(aliased(a), cond)
                bound.add(a)
            else:
                raise ValueError(
                    "motif triples must connect to the previous ones in order"
                )
        return result


class Traversal:
    """An immutable builder; every step returns a new Traversal wrapping a
    bigger DataFrame plan. Nothing executes until a terminal step."""

    def __init__(self, g: PropertyGraph, label: str, df: DataFrame):
        self._g = g
        self._label = label
        self._df = df

    # -- filter steps (F1/F2) -----------------------------------------
    def has(self, column: str, value) -> "Traversal":
        return Traversal(self._g, self._label, self._df.where(F.col(column) == value))

    def where(self, cond) -> "Traversal":
        return Traversal(self._g, self._label, self._df.where(cond))

    # -- hop steps (J1–J7): each is an equi-join ----------------------
    def out(self, edge: str) -> "Traversal":
        e = self._g._out.get((self._label, edge))
        if e is None:
            raise KeyError(f"no out-edge {edge!r} from {self._label}")
        dst = self._g.vertices[e.dst_label]
        joined = self._df.select(F.col(e.src_key).alias("__k")).join(
            dst, dst[e.dst_key] == F.col("__k")
        ).drop("__k")
        return Traversal(self._g, e.dst_label, joined)

    def in_(self, edge: str) -> "Traversal":
        e = self._g._in.get((self._label, edge))
        if e is None:
            raise KeyError(f"no in-edge {edge!r} into {self._label}")
        src = self._g.vertices[e.src_label]
        joined = self._df.select(F.col(e.dst_key).alias("__k")).join(
            src, src[e.src_key] == F.col("__k")
        ).drop("__k")
        return Traversal(self._g, e.src_label, joined)

    # -- iteration (J8) ----------------------------------------------
    def repeat_out_until_leaf(self, edge: str, max_iter: int = 10_000) -> "Traversal":
        """J8: `repeat(out(e)).until(not out(e))` (B:43–46) — advance the
        whole frontier one hop per round, emitting vertices the moment
        they have no outgoing `e`. Each round is one set-oriented join
        (the frontier moves together), so a chain of length n costs n
        *joins*, not n driver round-trips per vertex; for materialized
        orderings prefer the O(1) max-height lookup (`chain_tip`)."""
        e = self._g._out.get((self._label, edge))
        if e is None:
            raise KeyError(f"no out-edge {edge!r} from {self._label}")
        frontier = self
        leaves: DataFrame | None = None
        # out(e) follows src_key -> dst_table[dst_key]; a vertex is
        # terminal when no destination row points back at its src_key
        claimed = (
            self._g.vertices[e.dst_label]
            .select(F.col(e.dst_key).alias("__claimed"))
            .where(F.col("__claimed").isNotNull())
            .distinct()
        )
        for _ in range(max_iter):
            leaf_df = frontier._df.join(
                claimed,
                frontier._df[e.src_key] == F.col("__claimed"),
                "left_anti",
            )
            leaves = leaf_df if leaves is None else leaves.unionByName(leaf_df)
            nxt = frontier.out(edge)
            if not nxt.hasNext():
                break
            frontier = nxt
        return Traversal(self._g, self._label, leaves.distinct())

    # -- projection / terminal steps (F4, O3) -------------------------
    def values(self, *columns: str) -> "Traversal":
        return Traversal(self._g, self._label, self._df.select(*columns))

    def dedup(self) -> "Traversal":
        return Traversal(self._g, self._label, self._df.distinct())

    def limit(self, n: int) -> "Traversal":
        return Traversal(self._g, self._label, self._df.limit(n))

    def toDF(self) -> DataFrame:
        return self._df

    def count(self) -> int:
        return self._df.count()

    def hasNext(self) -> bool:
        """F3 existence probe — planned as a LIMIT 1, not a scan."""
        return bool(self._df.limit(1).take(1))


def chain_graph(tables: dict[str, DataFrame]) -> PropertyGraph:
    """The reference's graph (SURVEY.md §1.2–1.3) over the normalized
    tables: labels Block/Transaction/Output/Address, edges chain/has/
    output/input/locked."""
    outputs = tables["outputs"]
    addresses = outputs.select("address").distinct()
    # the `input` edge (Output→Transaction) joins through the inputs table;
    # represent it by materializing the spending tx onto the output row
    spent = tables["inputs"].select(
        F.col("spent_output_id").alias("output_id"),
        F.col("spending_tx_hash"),
    )
    outputs_x = outputs.join(spent, "output_id", "left")
    vertices = {
        "Block": tables["blocks"],
        "Transaction": tables["transactions"],
        "Output": outputs_x,
        "Address": addresses,
    }
    edges = [
        Edge("Block", "chain", "Block", "hash", "prev_hash"),  # parent -> child
        Edge("Block", "has", "Transaction", "hash", "block_hash"),
        Edge("Transaction", "output", "Output", "tx_hash", "tx_hash"),
        Edge("Output", "input", "Transaction", "spending_tx_hash", "tx_hash"),
        Edge("Output", "locked", "Address", "address", "address"),
    ]
    return PropertyGraph(vertices, edges)
