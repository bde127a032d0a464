"""GraphML export (SURVEY.md §2.1 S5): the whole-graph export the
reference declared but left commented out
(BlockchainToGraph.java:1248–1249, `graph.io(IoCore.graphml())`).

GraphML is a single XML document, so this is an export *boundary*, not
a distributed operator: node/edge fragments are rendered per partition
on the executors (`mapPartitions`-shaped via RDD, no driver-side row
loop building strings row-at-a-time in Python), then streamed to one
file in partition order. For 100 TB graphs the right export is the
partitioned parquet/CSV edge list (`export_edges`); GraphML exists for
interchange with single-node tools (Gephi, NetworkX, TinkerPop) at
subgraph scale, and this writer refuses nothing — it just streams.
"""

from __future__ import annotations

from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import DataFrame

_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
)
_FOOTER = "</graph>\n</graphml>\n"

# attribute values go through quoteattr (escape() leaves '"' alone, which
# would break the double-quoted attributes); key ids are quoteattr'd from
# the SAME raw string in the declaration and every <data> element, so an
# exotic column name can never mismatch between the two


def _key_decls(vertex_attrs: list[str], edge_attrs: list[str]) -> str:
    decls = []
    for a in vertex_attrs:
        decls.append(
            f"<key id={quoteattr('v_' + a)} for=\"node\" "
            f"attr.name={quoteattr(a)} attr.type=\"string\"/>"
        )
    for a in edge_attrs:
        decls.append(
            f"<key id={quoteattr('e_' + a)} for=\"edge\" "
            f"attr.name={quoteattr(a)} attr.type=\"string\"/>"
        )
    return "\n".join(decls) + ("\n" if decls else "")


def write_graphml(
    vertices: DataFrame,  # must have `id`; other columns become <data>
    edges: DataFrame,  # must have `src`, `dst`; other columns become <data>
    path: str,
) -> None:
    """Stream (vertices, edges) to a GraphML file at `path` (local fs)."""
    v_attrs = [c for c in vertices.columns if c != "id"]
    e_attrs = [c for c in edges.columns if c not in ("src", "dst")]

    def node_xml(row) -> str:
        data = "".join(
            f"<data key={quoteattr('v_' + a)}>{escape(str(row[a]))}</data>"
            for a in v_attrs
            if row[a] is not None
        )
        return f"<node id={quoteattr(str(row['id']))}>{data}</node>"

    def edge_xml(row) -> str:
        data = "".join(
            f"<data key={quoteattr('e_' + a)}>{escape(str(row[a]))}</data>"
            for a in e_attrs
            if row[a] is not None
        )
        return (
            f"<edge source={quoteattr(str(row['src']))} "
            f"target={quoteattr(str(row['dst']))}>{data}</edge>"
        )

    # fragments rendered executor-side, one string per partition
    v_parts = vertices.rdd.mapPartitions(
        lambda rows: ["\n".join(node_xml(r) for r in rows)]
    )
    e_parts = edges.rdd.mapPartitions(
        lambda rows: ["\n".join(edge_xml(r) for r in rows)]
    )

    with open(path, "w", encoding="utf-8") as f:
        f.write(_HEADER)
        f.write(_key_decls(v_attrs, e_attrs))
        f.write('<graph id="G" edgedefault="directed">\n')
        # toLocalIterator streams one partition at a time through the
        # driver — bounded memory regardless of graph size
        for frag in v_parts.toLocalIterator():
            if frag:
                f.write(frag + "\n")
        for frag in e_parts.toLocalIterator():
            if frag:
                f.write(frag + "\n")
        f.write(_FOOTER)
