"""Operator registry aggregation: importing this package pulls in every
operator module so their ``@query`` registrations land in
``QUERIES`` / ``ORACLES`` (consumed by ``__spark_entry__.py``)."""

from __future__ import annotations

from .registry import ORACLES, QUERIES, query, t  # noqa: F401
from . import relational  # noqa: F401, E402

# extension modules register on import; keep the list explicit so a
# broken module is an import error, not silent missing coverage
_MODULES = ["relational"]

from . import sources_sinks  # noqa: E402
from . import evolution_queries  # noqa: E402
from . import dedup  # noqa: E402
from . import similarity  # noqa: E402
from . import text  # noqa: E402
from . import multimodal  # noqa: E402
from ..streaming import queries as streaming_queries  # noqa: E402

_MODULES += [
    "evolution_queries", "dedup", "similarity", "text", "multimodal",
    "streaming.queries",
]
