"""Structured Streaming extension (no reference counterpart, SURVEY §2.10)."""

from .events import (dedup_within_watermark, file_events, interval_join,
                     kafka_events, kafka_shaped_file_source,
                     parse_kafka_records, rate_events, session_aggregate,
                     sliding_counts, tumbling_counts, with_watermark,
                     write_foreach_batch, write_kafka_shaped)

__all__ = ["tumbling_counts", "sliding_counts", "session_aggregate",
           "dedup_within_watermark", "with_watermark", "write_foreach_batch",
           "interval_join", "rate_events", "file_events", "kafka_events",
           "kafka_shaped_file_source", "parse_kafka_records",
           "write_kafka_shaped"]
