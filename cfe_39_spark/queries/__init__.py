"""Query-contract registry: importing this package registers every pack."""

from .base import REGISTRY, Query, register, table  # noqa: F401
from . import relational  # noqa: F401,E402

__all__ = ["REGISTRY", "Query", "register", "table"]
