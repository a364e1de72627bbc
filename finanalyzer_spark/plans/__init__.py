"""Query plan registry — the engine's public query surface.

Importing this package registers every query module; the registry maps
query name → (PySpark callable, DuckDB oracle SQL). ``__spark_entry__``
and ``bench.py`` are thin views over it.
"""

from .registry import REGISTRY, QuerySpec, query  # noqa: F401

# Import for side effect: each module registers its queries.
from . import core  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import eventsops  # noqa: E402,F401
from . import finance  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import mlops  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import retrieval  # noqa: E402,F401
from . import clustering  # noqa: E402,F401
from . import profile  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import sketches  # noqa: E402,F401
from . import warcops  # noqa: E402,F401
