"""Declarative pipeline construction from stored config.

Parity target: reference config-driven pipelines — ``pd_pipeline_config``
/ ``pd_node_config`` rows are instantiated into model objects by
``node_type`` name and bound in sequence (``pydin/core.py:1418-1466``;
tables ``db/sqlite.sql:52-86``). Here the same shape works from plain
dicts (JSON/YAML-friendly) or from the metadata DB.

Example::

    nodes = [
        {"node_type": "Select", "text": "SELECT * FROM orders",
         "date_field": "o_orderdate"},
        {"node_type": "Mapper", "rename": {"o_totalprice": "price"}},
        {"node_type": "Table", "source_name": "lake",
         "schema_name": "mart", "table_name": "orders"},
    ]
    pipeline_from_config(nodes, spark=spark, registry=reg).run()

A ``"branch"`` entry (list of node dicts) forks writers, mirroring the
reference's nested-list bind.
"""

from __future__ import annotations

import json

from . import models as _models
from .pipeline import Pipeline

#: node_type name → model class (the reference resolves constructors the
#: same way, core.py:1443-1458)
NODE_TYPES = {
    name: getattr(_models, name)
    for name in ("Table", "Select", "Insert", "SQL", "CSV", "JSON", "XML",
                 "Parquet", "Mapper", "Transform", "Filenames",
                 "FileManager", "Command")
}

def build_node(config: dict) -> _models.Model:
    conf = dict(config)
    node_type = conf.pop("node_type")
    try:
        cls = NODE_TYPES[node_type]
    except KeyError:
        raise ValueError(
            f"unknown node_type {node_type!r}; known: "
            f"{sorted(NODE_TYPES)}") from None
    return cls(**conf)


def pipeline_from_config(nodes: list, **pipeline_kwargs) -> Pipeline:
    """Build a Pipeline from a list of node-config dicts.

    A list element that is itself a list of dicts becomes a branch fork
    (one upstream feeding several downstream models).
    """
    built = []
    for item in nodes:
        if isinstance(item, list):
            built.append([build_node(c) for c in item])
        else:
            built.append(build_node(item))
    return Pipeline(*built, **pipeline_kwargs)


# -- metadata-DB storage (optional) -----------------------------------------

def save_pipeline_config(history, pipeline_name: str, nodes: list,
                         job_id: int | None = None,
                         error_limit: int = 1) -> int:
    """Persist a declarative pipeline into pd_pipeline_config/pd_node_config
    (tables created with the rest of the metadata schema — both the
    sqlite and JDBC backends host them)."""
    with history.lock:
        pipeline_id = history.db.insert(
            "pd_pipeline_config",
            ["pipeline_name", "job_id", "error_limit"],
            [pipeline_name, job_id, error_limit])
        for seq, item in enumerate(nodes):
            branch_items = item if isinstance(item, list) else [item]
            for b, conf in enumerate(branch_items):
                conf = dict(conf)
                node_type = conf.pop("node_type")
                history.db.insert(
                    "pd_node_config",
                    ["pipeline_id", "seqno", "branch", "node_type",
                     "node_config"],
                    [pipeline_id, seq,
                     b if isinstance(item, list) else -1,
                     node_type, json.dumps(conf)])
    return pipeline_id


def load_pipeline_config(history, pipeline_id: int) -> list:
    """Load the node-config list previously saved for ``pipeline_id``."""
    with history.lock:
        rows = history.db.select(
            "SELECT * FROM pd_node_config WHERE pipeline_id = ? "
            "ORDER BY seqno, branch", (pipeline_id,))
    nodes: list = []
    by_seq: dict[int, list] = {}
    for row in rows:
        conf = {"node_type": row["node_type"], **json.loads(row["node_config"])}
        by_seq.setdefault(row["seqno"], []).append((row["branch"], conf))
    for seq in sorted(by_seq):
        items = by_seq[seq]
        if len(items) == 1 and items[0][0] == -1:
            nodes.append(items[0][1])
        else:
            nodes.append([c for _, c in sorted(items)])
    return nodes
