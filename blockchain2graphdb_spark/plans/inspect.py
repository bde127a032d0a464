"""Physical-plan inspection (SURVEY.md §4): the ".explain and iterate"
loop formalized, so plan properties are *asserted* (tests/test_plans.py)
instead of eyeballed — filters stay pushed down, small dims stay
broadcast, Python stays Arrow-vectorized, top-k stays rank-limited.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


def executed_plan_string(df: DataFrame) -> str:
    """Final (post-AQE) physical plan — runs the query. Use when the
    property only shows after adaptive replanning (codegen ids, runtime
    join switches)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def has_node(df: DataFrame, node: str) -> bool:
    return node in plan_string(df)


def count_nodes(df: DataFrame, node: str) -> int:
    """Count operator nodes named exactly `node` in the physical plan.

    Matches the formatted explain's per-node detail lines ("(n) Exchange")
    rather than raw substrings, so explain-formatting changes can't skew
    the count, and look-alike nodes (ReusedExchange for Exchange,
    WindowGroupLimit for Window) never inflate it.
    """
    pat = re.compile(rf"^\(\d+\)\s+{re.escape(node)}(\s|$|\[)")
    return sum(
        1
        for line in plan_string(df).splitlines()
        if pat.match(line.strip())
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet scan."""
    out = []
    for line in plan_string(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            body = line.split(":", 1)[1].strip().strip("[]")
            if body:
                out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries — what column pruning left on each scan."""
    return [
        line.strip().split(":", 1)[1].strip()
        for line in plan_string(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def unpartitioned_unbounded_windows(df: DataFrame) -> list[str]:
    """Window nodes with NO partitionBy whose input is UNBOUNDED — the
    single-executor scale-killer VERDICT_r04 flagged in sort_by_key
    (WindowExec funnels the whole child through one partition when the
    partition spec is empty).

    Walks the optimized logical plan: an empty-partitionSpec Window is
    acceptable only when some descendant bounds its input cardinality —
    a Limit (top-k ranks) or an Aggregate (windows over group summaries,
    e.g. cumulative offsets over per-month counts). Everything else is
    returned as a violation.
    """
    out: list[str] = []

    def bounded(node) -> bool:
        stack = [node.children().apply(i) for i in range(node.children().size())]
        while stack:
            n = stack.pop()
            nm = n.getClass().getSimpleName()
            if nm in ("GlobalLimit", "LocalLimit", "Limit", "Aggregate"):
                return True
            for i in range(n.children().size()):
                stack.append(n.children().apply(i))
        return False

    def walk(node) -> None:
        nm = node.getClass().getSimpleName()
        if nm == "Window" and node.partitionSpec().isEmpty() and not bounded(node):
            out.append(node.simpleString(120))
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def uses_row_python(df: DataFrame) -> bool:
    """True if any stage is a row-at-a-time Python UDF (BatchEvalPython).
    Arrow-vectorized stages (ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas) are the sanctioned slow path and don't count."""
    return "BatchEvalPython" in plan_string(df)
