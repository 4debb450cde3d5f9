"""Query-contract registry: importing this package registers every pack."""

from .base import REGISTRY, Query, register, table  # noqa: F401
from . import cdcq, dedup, multimodal, relational, similarity, textops, udfs  # noqa: F401,E402

__all__ = ["REGISTRY", "Query", "register", "table"]
