"""Operator registry aggregation: importing this package pulls in every
operator module so their ``@query`` registrations land in
``QUERIES`` / ``ORACLES`` (consumed by ``__spark_entry__.py``)."""

from __future__ import annotations

from .registry import ORACLES, QUERIES, query, t  # noqa: F401
from . import relational  # noqa: F401, E402

# extension modules register on import; keep the list explicit so a
# broken module is an import error, not silent missing coverage
_MODULES = ["relational"]

for _m in ("evolution_queries", "dedup", "similarity", "text", "multimodal"):
    try:
        __import__(f"{__name__}.{_m}")
        _MODULES.append(_m)
    except ImportError:
        pass
