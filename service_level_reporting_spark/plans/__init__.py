"""Physical-plan inspection and linting.

The engine's scale posture (SCALE.md) is a set of PLAN properties —
pushdown reaches the scan, dims broadcast, aggregation splits
partial/final, no cartesian products, no row-at-a-time Python in JVM-side
operators. This module turns those properties into checkable facts so
tests (and operators' own CI) assert them instead of hoping:

    facts = plan_facts(df)
    assert facts["n_broadcast_hash_joins"] >= 3
    lint(df)   # raises on cartesian products / BatchEvalPython

Spark's public surface for this is ``df.explain("formatted")`` — text, not
a tree — so the parsing here is deliberately shallow (substring facts over
stable node names), which has survived Spark 3.x→4.x unchanged.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

# Nodes that should never appear in a scalable plan unless the operator
# opted in (similarity's tile kernel is mapInPandas — ArrowEvalPython /
# MapInPandas nodes are the sanctioned Python markers, BatchEvalPython is
# the row-at-a-time one that is always a bug here).
FORBIDDEN_NODES = ("CartesianProduct", "BatchEvalPython")


def formatted_plan(df: DataFrame) -> str:
    """``df.explain("formatted")`` as a string (the API only prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_facts(df: DataFrame) -> dict:
    """Shallow structured facts about the physical plan."""
    p = formatted_plan(df)
    read_schemas = re.findall(r"ReadSchema: (\S+)", p)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    return {
        "plan": p,
        "n_exchanges": p.count("Exchange"),
        "n_broadcast_hash_joins": p.count("BroadcastHashJoin"),
        "n_sort_merge_joins": p.count("SortMergeJoin"),
        "n_hash_aggregates": p.count("HashAggregate"),
        "has_partial_agg": "partial_" in p,
        "has_codegen": "codegen id" in p,
        "pushed_filters": [f for f in pushed if f.strip()],
        "read_schemas": read_schemas,
        "python_nodes": [n for n in ("BatchEvalPython", "ArrowEvalPython",
                                     "MapInPandas", "FlatMapGroupsInPandas")
                         if n in p],
        "forbidden_nodes": [n for n in FORBIDDEN_NODES if n in p],
    }


class PlanLintError(AssertionError):
    pass


def lint(df: DataFrame, *, allow: tuple[str, ...] = ()) -> dict:
    """Raise PlanLintError if the plan contains a forbidden node.

    Returns the facts dict on success so callers can chain assertions.
    ``allow`` whitelists specific node names for operators that opted in.
    """
    facts = plan_facts(df)
    bad = [n for n in facts["forbidden_nodes"] if n not in allow]
    if bad:
        raise PlanLintError(
            f"forbidden plan nodes {bad}; plan:\n{facts['plan']}")
    return facts
