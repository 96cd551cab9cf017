"""Query plans: the engine's public query surface.

Each module registers named queries with the registry; the driver
contract (``__spark_entry__.py``) exposes them via ``queries()`` /
``oracle_sql()``. Import ``registry`` and call ``all_queries()`` to get
the full set.
"""

from . import registry

__all__ = ["registry"]
