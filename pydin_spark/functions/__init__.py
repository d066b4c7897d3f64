"""Scale helpers: skew-aware joins, bucketing, partition sizing,
lakehouse/stored-state maintenance."""

from .maintenance import (compact, compact_if_fragmented,
                          dataset_stats, maintain_states,
                          write_partitioned)
from .skew import (bloom_prefilter_join, bucketed_table, explain_has,
                   salted_join, top_keys)

__all__ = ["salted_join", "top_keys", "bucketed_table", "explain_has",
           "bloom_prefilter_join", "compact", "compact_if_fragmented",
           "dataset_stats", "maintain_states", "write_partitioned"]
