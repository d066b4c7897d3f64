"""Job script execution: run a user script.py inside a tracked run.

Parity target: reference ``Job`` loading ``jobs/<id>/script.py`` as a
module inside the run process with the job context available
(``pydin/core.py:1640-1654``; README.md:142-152). Here the script gets a
``pydin`` namespace object (job metadata + run info + optional
SparkSession) injected, runs under the run-history state machine, and
its uncaught exceptions become run status 'E'.
"""

from __future__ import annotations

import importlib.util
import sys
import types
import uuid


class JobContext(types.SimpleNamespace):
    """What a job script sees as its ``pydin`` object."""


def run_script(path: str, run: dict | None = None, spark=None,
               data: dict | None = None) -> JobContext:
    """Execute a job script file with an injected context.

    The script can read ``pydin.run`` (the run-history row), ``pydin.spark``
    (a live SparkSession or None), ``pydin.data`` (inherited trigger
    data, reference data_dump), and set ``pydin.result`` to expose a
    value to the caller.
    """
    context = JobContext(run=run or {}, spark=spark, data=data or {},
                         result=None)
    name = f"pydin_job_{uuid.uuid4().hex[:8]}"
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    module.pydin = context
    sys.modules[name] = module
    try:
        spec.loader.exec_module(module)
    finally:
        sys.modules.pop(name, None)
    return context


def script_job(path: str, spark=None):
    """Adapter: a scheduler-registrable callable that runs ``path``.

    The run's ``data_dump`` (inherited from a triggering parent job)
    is decoded and exposed as ``pydin.data``.
    """
    import json

    def runner(run: dict) -> None:
        try:
            data = json.loads(run.get("data_dump") or "{}")
        except (TypeError, ValueError):
            data = {}
        run_script(path, run=run, spark=spark, data=data)

    return runner
