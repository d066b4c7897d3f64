"""Structured Streaming extension (no reference counterpart, SURVEY §2.10)."""

from .events import (dedup_within_watermark, interval_join, rate_events,
                     session_aggregate, sliding_counts, tumbling_counts,
                     with_watermark, write_foreach_batch)

__all__ = ["tumbling_counts", "sliding_counts", "session_aggregate",
           "dedup_within_watermark", "with_watermark", "write_foreach_batch",
           "interval_join", "rate_events"]
