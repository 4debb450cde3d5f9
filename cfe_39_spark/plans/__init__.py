"""Plan-audit helpers: assertable physical-plan shapes."""

from .audit import (  # noqa: F401
    count_exchanges,
    has_node,
    plan_string,
    pushed_filters,
    python_eval_nodes,
    read_schema,
)
