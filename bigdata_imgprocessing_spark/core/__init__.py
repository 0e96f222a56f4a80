from .catalog import TABLES, table
from .registry import ORACLES, QUERIES, query
from .session import build_session, ensure_utc

__all__ = [
    "TABLES",
    "table",
    "ORACLES",
    "QUERIES",
    "query",
    "build_session",
    "ensure_utc",
]
