"""Structured Streaming surface (SURVEY.md §2.9, §7 Phase 6).

The reference's incremental semantics map onto streaming concepts:

| reference behavior                         | streaming construct        |
|--------------------------------------------|----------------------------|
| per-key incremental cursor (findatabase.py:211-222) | source offsets    |
| today-or-yesterday freshness tolerance (:217)       | watermark lateness |
| post-hoc dedup (redundancy.sql)            | dropDuplicates in watermark|
| daily refresh cadence (:62)                | trigger interval           |
"""

from .events import (  # noqa: F401
    read_events_stream,
    streaming_tumbling_counts,
    streaming_sliding_sums,
    streaming_session_windows,
    streaming_dedup,
    run_to_completion,
)
