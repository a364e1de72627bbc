"""Sources & sinks: CSV registry seed, external-feed fetch kernel,
partitioned parquet writers (SURVEY.md §2.1).
"""

from .csvseed import read_tickers_csv  # noqa: F401
from .fetcher import FakeFeed, fetch_history, fetch_info  # noqa: F401
from .parquet import write_partitioned, append_dedup  # noqa: F401
