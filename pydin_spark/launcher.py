"""Process-per-job launcher: each run is its OWN driver process.

Parity target: the reference executor spawns
``<env_python> jobs/<id>/job.py run -a --record <id>`` as a subprocess
and maps exit status to run state (``pydin/core.py:1051-1095``). Here a
job's pipeline config runs through ``python -m pydin_spark.cli
run-pipeline`` in a fresh interpreter that owns its own SparkSession —
one job's OOM/crash/hang can never take the scheduler or a sibling job
down, and ``timeout`` kills the whole process tree ('T').

On a cluster, pass ``spark_submit=`` (+ ``master=``) to wrap the same
entry point in ``spark-submit`` so the job's driver runs wherever the
cluster manager places it; locally the plain interpreter is the
identical code path (pyspark bootstraps the JVM itself).
"""

from __future__ import annotations

import os
import sys


def pipeline_command(config_path: str, db: str | None = None,
                     views: str | None = None, date: str | None = None,
                     lake: str | None = None,
                     python: str | None = None,
                     spark_submit: str | None = None,
                     master: str | None = None,
                     submit_args: list[str] | None = None) -> list[str]:
    """argv list that runs a JSON pipeline config as its own driver.

    - default: ``<python> -m pydin_spark.cli [--db ..] run-pipeline ...``
    - ``spark_submit='spark-submit'``: wraps the module entry in a
      spark-submit invocation (a shim script, because spark-submit takes
      a file, not ``-m``) for cluster-managed drivers.
    """
    cli_args: list[str] = []
    if db:
        cli_args += ["--db", db]
    cli_args += ["run-pipeline", config_path]
    if views:
        cli_args += ["--views", views]
    if date:
        cli_args += ["--date", date]
    if lake:
        cli_args += ["--lake", lake]
    if spark_submit:
        cmd = [spark_submit]
        if master:
            cmd += ["--master", master]
        cmd += list(submit_args or [])
        cmd += [_shim_path(), *cli_args]
        return cmd
    return [python or sys.executable, "-m", "pydin_spark.cli", *cli_args]


def _shim_path() -> str:
    """Path of a tiny script file for spark-submit (which accepts a file,
    not a module); created next to the package, once."""
    here = os.path.dirname(os.path.abspath(__file__))
    shim = os.path.join(here, "_submit_shim.py")
    if not os.path.exists(shim):
        with open(shim, "w") as f:
            f.write("import sys, os\n"
                    "sys.path.insert(0, os.path.dirname(os.path.dirname("
                    "os.path.abspath(__file__))))\n"
                    "from pydin_spark.cli import main\n"
                    "raise SystemExit(main())\n")
    return shim


def register_pipeline_job(scheduler, job_name: str, config_path: str,
                          timeout: float | None = None,
                          **launcher_and_schedule) -> int:
    """Register a schedule entry whose runs execute the config pipeline
    as an isolated subprocess (reference process-per-job execution).

    Launcher kwargs (db/views/date/lake/python/spark_submit/master) are
    split out; the rest pass through as schedule fields (cron fields,
    parallelism, rerun_*, email_list...). Exit status maps to run state:
    0 → 'D', nonzero → 'E' with stderr captured, overrun → 'T'.
    """
    launcher_keys = ("db", "views", "date", "lake", "python",
                     "spark_submit", "master", "submit_args")
    launcher_kw = {k: launcher_and_schedule.pop(k)
                   for k in list(launcher_and_schedule)
                   if k in launcher_keys}
    command = pipeline_command(config_path, **launcher_kw)
    return scheduler.register(job_name, command=command, timeout=timeout,
                              **launcher_and_schedule)
