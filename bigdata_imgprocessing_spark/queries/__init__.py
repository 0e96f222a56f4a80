"""Named, oracle-checked queries — the driver-contract surface.

Importing this package registers every query into
``core.registry.QUERIES`` / ``ORACLES``.
"""

from ..core.registry import ORACLES, QUERIES

from . import advanced  # noqa: F401
from . import curation  # noqa: F401
from . import dedup  # noqa: F401
from . import images  # noqa: F401
from . import multimodal  # noqa: F401
from . import relational  # noqa: F401  (registration side effect)
from . import similarity  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import text  # noqa: F401
from . import timeseries  # noqa: F401

__all__ = ["QUERIES", "ORACLES"]
