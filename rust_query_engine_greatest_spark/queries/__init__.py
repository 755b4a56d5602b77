"""Query inventory: every implemented operator/query from SURVEY.md §2
is registered here with (a) an idiomatic PySpark builder and (b) an
equivalent DuckDB oracle SQL string, mirroring the reference's
differential-vs-oracle test methodology (`tests/greatest_test.py:29-90`,
with DuckDB replacing "Spark as oracle" since this engine IS Spark).
"""

from .base import REGISTRY, Query, register  # noqa: F401

# Importing these modules populates REGISTRY.
from . import tpch  # noqa: F401, E402
from . import relational  # noqa: F401, E402
from . import functions_q  # noqa: F401, E402
from . import pipeline_q  # noqa: F401, E402
from . import events_q  # noqa: F401, E402
from . import streaming_q  # noqa: F401, E402
from . import sources_q  # noqa: F401, E402
from . import harness_q  # noqa: F401, E402
from . import subqueries_q  # noqa: F401, E402

__all__ = ["REGISTRY", "Query", "register"]
