"""Named, oracle-checked queries — the driver-contract surface.

Importing this package registers every query into
``core.registry.QUERIES`` / ``ORACLES``.
"""

from ..core.registry import ORACLES, QUERIES

from . import relational  # noqa: F401  (registration side effect)

__all__ = ["QUERIES", "ORACLES"]
