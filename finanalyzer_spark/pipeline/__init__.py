"""The reference's ETL jobs re-expressed as Spark jobs (SURVEY §3, §7
Phase 3): bootstrap, incremental update, full fill."""

from .finjobs import (  # noqa: F401
    FinStore,
    bootstrap_registry,
    update_history,
    fill_all_history,
)
