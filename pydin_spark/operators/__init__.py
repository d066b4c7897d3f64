"""Large-scale data-pipeline operators (engine extension beyond the
reference surface): dedup, similarity search, text analysis, multimodal
column plumbing."""

from . import dedup, graph, multimodal, similarity, text  # noqa: F401
