"""Large-scale data-pipeline operators (engine extension beyond the
reference surface): dedup, similarity search, text analysis, multimodal
column plumbing."""

from . import (buckets, dedup, graph, multimodal,  # noqa: F401
               similarity, text)
