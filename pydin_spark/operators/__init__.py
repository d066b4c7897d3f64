"""Large-scale data-pipeline operators (engine extension beyond the
reference surface): dedup, similarity search, text analysis, multimodal
column plumbing."""

from . import (buckets, dedup, graph, jpeg, multimodal,  # noqa: F401
               riff, similarity, text)
