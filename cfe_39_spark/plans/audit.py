"""Physical-plan audit helpers (SURVEY.md §4.1: 'rely on Catalyst; verify
with explain').

The engine's performance contract is a set of *plan shapes* — filters
pushed into the parquet scan, small sides broadcast, top-k via
TakeOrderedAndProject, zero Python eval nodes on hot paths.  These helpers
turn those shapes into assertable strings so tests (and operators' own
self-checks) catch a silent regression to a worse plan, which at 100 TB is
the difference between minutes and days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PYTHON_EVAL_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def plan_string(df: DataFrame) -> str:
    """Full logical+physical plan text (what `.explain('extended')` prints)."""
    qe = df._jdf.queryExecution()
    return qe.toString() + "\n" + qe.executedPlan().toString()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan, '' if none."""
    p = plan_string(df)
    return p.split("PushedFilters")[1][:400] if "PushedFilters" in p else ""


def read_schema(df: DataFrame) -> str:
    """The ReadSchema section of the scan — the column-pruning witness."""
    p = plan_string(df)
    return p.split("ReadSchema")[1][:400] if "ReadSchema" in p else ""


def has_node(df: DataFrame, *nodes: str) -> bool:
    p = plan_string(df)
    return any(n in p for n in nodes)


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Python-eval physical nodes present in the plan (hot paths want [])."""
    p = plan_string(df)
    return [n for n in PYTHON_EVAL_NODES if n in p]


def count_exchanges(df: DataFrame) -> int:
    """Shuffle-exchange count — the scale-cost headline of a plan.
    Counts the PHYSICAL plan only (plan_string also embeds the optimizer's
    rendering of the same plan, which would double-count)."""
    physical = df._jdf.queryExecution().executedPlan().toString()
    return physical.count("Exchange hashpartitioning")
