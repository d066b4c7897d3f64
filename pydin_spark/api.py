"""Driver: programmatic admin API over the scheduler + metadata DB.

Parity target: reference ``pydin/api.py:23-611`` — create/configure/
enable/disable/delete jobs, run/cancel runs, introspect history, plus
the repo-sync verbs (``create_repo``/``push_repo``/``pull_repo``,
reference ``api.py:517-611`` with the ``check_repo`` guard from
``wrap.py:40-48``) and ``create_config`` (``api.py:464-515``). The
shape is kept 1:1 so reference users can switch; repo sync shells out
to the ``git`` CLI instead of depending on gitpython.
"""

from __future__ import annotations

import os
import subprocess
import time

from .scheduler import History, Scheduler


class RepoError(RuntimeError):
    """No git repo where one is required (reference check_repo guard)."""


class Driver:
    def __init__(self, scheduler: Scheduler | None = None,
                 history: History | None = None,
                 jobs_dir: str | None = None):
        self.scheduler = scheduler or Scheduler(history or History())
        #: folder holding job scripts/configs, synced via the repo verbs
        self.jobs_dir = jobs_dir or os.path.join(os.getcwd(), "jobs")

    @property
    def history(self) -> History:
        return self.scheduler.history

    # -- job management (api.py create_job/configure_job/...) ---------------
    #: scaffold templates written into jobs/<id>/ (reference
    #: api.py:195-215 copies samples/job.txt + samples/script.txt the
    #: same way; the runner here is the pydin_spark process-per-job
    #: entry so the scaffold is executable as created)
    JOB_RUNNER_TEMPLATE = '''\
"""Job runner: executes this folder's script.py as a tracked run.

Launched by the scheduler's process-per-job executor (or by hand:
``python job.py``). The script sees an injected ``pydin`` context.
"""

import json
import os
import sys

from pydin_spark.scheduler.job import run_script

if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    run = json.loads(os.environ.get("PYDIN_RUN", "{}"))
    ctx = run_script(os.path.join(here, "script.py"), run=run)
    sys.exit(0)
'''

    JOB_SCRIPT_TEMPLATE = '''\
"""Job script. The injected ``pydin`` object carries:

- ``pydin.run``    the run-history row (id, job_id, added, ...)
- ``pydin.spark``  a live SparkSession, or None outside the scheduler
- ``pydin.data``   data inherited from a triggering parent job
- ``pydin.result`` set it to expose a value to the caller
"""

pydin.result = f"hello from run {pydin.run.get('id')}"  # noqa: F821
'''

    def create_job(self, job_name: str, desc: str | None = None,
                   func=None, command: str | None = None,
                   scaffold: bool = False,
                   **schedule_fields) -> int:
        """Register a job; with ``scaffold=True`` also create the
        reference-layout ``jobs/<id>/`` folder holding an executable
        ``job.py`` runner and a ``script.py`` body (refusing to
        overwrite anything, like the reference — a half-created job
        folder should fail loudly, not silently reuse files)."""
        job_id = self.scheduler.register(
            job_name, func=func, command=command,
            job_description=desc, **schedule_fields)
        if scaffold:
            folder = os.path.join(self.jobs_dir, str(job_id))
            if os.path.exists(folder):
                raise FileExistsError(f"folder {folder} already exists")
            os.makedirs(folder)
            for filename, content in (
                    ("job.py", self.JOB_RUNNER_TEMPLATE),
                    ("script.py", self.JOB_SCRIPT_TEMPLATE)):
                dest = os.path.join(folder, filename)
                if os.path.exists(dest):
                    raise FileExistsError(f"file {dest} already exists")
                with open(dest, "w") as fh:
                    fh.write(content)
        return job_id

    def configure_job(self, job_id: int, **fields) -> None:
        self.history.set_job(job_id, **fields)

    def enable_job(self, job_id: int) -> None:
        self.history.set_job(job_id, status="Y")

    def disable_job(self, job_id: int) -> None:
        self.history.set_job(job_id, status="N")

    def delete_job(self, job_id: int, hard: bool = False) -> None:
        """Default: deactivate (safe, reversible). ``hard=True`` is
        the reference semantics (api.py:321-336): the schedule row is
        deleted, the ``jobs/<id>/`` folder is removed if present, and
        a repo-backed jobs dir gets the removal pushed — run-history
        rows survive in both modes (the audit trail)."""
        if not hard:
            self.history.set_job(job_id, status="N",
                                 end_date=time.strftime(
                                     "%Y-%m-%d %H:%M:%S"))
            return
        self.history.delete_job(job_id)
        folder = os.path.join(self.jobs_dir, str(job_id))
        if os.path.isdir(folder):
            import shutil
            shutil.rmtree(folder)
        if os.path.isdir(os.path.join(self.jobs_dir, ".git")):
            self.push_repo(job_id=job_id,
                           message=f"delete job {job_id}")

    def list_jobs(self, active_only: bool = False) -> list[dict]:
        return self.history.jobs(active_only=active_only)

    # -- run management (api.py run_job/cancel_run/deactivate_run) ----------
    def run_job(self, job_id: int, wait: bool = True) -> int:
        return self.scheduler.run_job_now(job_id, wait=wait)

    def cancel_run(self, run_id: int) -> None:
        self.scheduler.cancel_run(run_id)

    def cancel_job(self, job_id: int) -> int:
        """Cancel every non-terminal run of one job (reference
        cli.py:361-369 'cancel all Job[id] runs'). Returns the count."""
        n = 0
        for run in self.history.runs(job_id=job_id):
            if run["status"] in ("Q", "W", "S", "R"):
                self.scheduler.cancel_run(run["id"])
                n += 1
        return n

    def cancel_jobs(self) -> int:
        """Cancel every currently pending/running run of every job
        (reference cli.py:371-377). Returns the count."""
        n = 0
        for run in self.history.runs():
            if run["status"] in ("Q", "W", "S", "R"):
                self.scheduler.cancel_run(run["id"])
                n += 1
        return n

    def deactivate_run(self, run_id: int) -> None:
        self.history.set_run(run_id, deactivated="Y")

    def get_run(self, run_id: int) -> dict | None:
        return self.history.run(run_id)

    def list_runs(self, job_id: int | None = None,
                  status: str | None = None) -> list[dict]:
        return self.history.runs(job_id=job_id, status=status)

    # -- scheduler control (api.py start/stop scheduler) --------------------
    #: scheduler.py scaffold — the process-level scheduler entry the
    #: reference deploys from samples/scheduler.txt (api.py:34-54) and
    #: drives with ``--start``/``stop`` (api.py:87-131). The stop verb
    #: signals the recorded pid; state lives in pd_components.
    SCHEDULER_TEMPLATE = '''\
"""Scheduler entry point — runs as its own process.

``python scheduler.py --start``   run until stopped
``python scheduler.py stop``      signal the running scheduler

The metadata DB path comes from $PYDIN_DB (default: pydin.db next to
this file). Liveness is recorded in the pd_components table.
"""

import os
import signal
import sys
import time

from pydin_spark.scheduler import History, Scheduler

DB = os.environ.get("PYDIN_DB", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "pydin.db"))


def main() -> int:
    history = History(DB)
    if "stop" in sys.argv:
        row = history.component("SCHEDULER") or {}
        if row.get("status") == "Y" and row.get("pid"):
            os.kill(int(row["pid"]), signal.SIGTERM)
            return 0
        print("scheduler is not running")
        return 1
    scheduler = Scheduler(history)
    stopping = []
    signal.signal(signal.SIGTERM, lambda *_: stopping.append(1))
    signal.signal(signal.SIGINT, lambda *_: stopping.append(1))
    history.set_component(
        "SCHEDULER", status="Y", pid=os.getpid(),
        start_date=time.strftime("%Y-%m-%d %H:%M:%S"), stop_date=None)
    scheduler.start()
    try:
        while not stopping:
            time.sleep(0.2)
    finally:
        scheduler.stop()
        history.set_component(
            "SCHEDULER", status="N", pid=None,
            stop_date=time.strftime("%Y-%m-%d %H:%M:%S"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
'''

    def create_scheduler(self, path: str | None = None) -> str:
        """Scaffold ``scheduler.py`` (reference api.py:34-54: deploy
        the scheduler entry + the jobs folder; refuses to overwrite an
        existing scheduler.py)."""
        root = os.path.abspath(path or os.path.dirname(self.jobs_dir)
                               or ".")
        dest = os.path.join(root, "scheduler.py")
        if os.path.exists(dest):
            raise FileExistsError(f"file {dest} already exists")
        os.makedirs(self.jobs_dir, exist_ok=True)
        os.makedirs(root, exist_ok=True)
        with open(dest, "w") as fh:
            fh.write(self.SCHEDULER_TEMPLATE)
        return dest

    def launch_scheduler(self, path: str | None = None,
                         db: str | None = None) -> int | None:
        """Start the scaffolded scheduler as its OWN process (reference
        api.py:87-113): spawn ``scheduler.py --start``, give it a
        moment, return the pid if it stayed up (None otherwise)."""
        root = os.path.abspath(path or os.path.dirname(self.jobs_dir)
                               or ".")
        script = os.path.join(root, "scheduler.py")
        if not os.path.exists(script):
            raise FileNotFoundError(f"file {script} does not exist")
        db = db or getattr(self.history, "path", None)
        if not db or db == ":memory:":
            raise ValueError("launch_scheduler needs a file-backed DB "
                             "(db=... or a History(path))")
        env = dict(os.environ, PYDIN_DB=db)
        # the scaffold must import pydin_spark from wherever THIS
        # process found it (a path-based dev checkout is not on the
        # child's default sys.path once cwd moves to the deploy root)
        pkg_parent = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in [pkg_parent, env.get("PYTHONPATH")] if p)
        import sys as _sys
        # detach: own session + own log file. Inheriting the caller's
        # stdout/stderr pipes makes any pipe-reading parent (CLI under
        # subprocess.run, CI harnesses) block until the DAEMON exits.
        log = open(os.path.join(root, "scheduler.log"), "ab")
        proc = subprocess.Popen([_sys.executable, script, "--start"],
                                env=env, cwd=root,
                                stdin=subprocess.DEVNULL,
                                stdout=log, stderr=log,
                                start_new_session=True)
        log.close()
        deadline = time.time() + 3.0
        while time.time() < deadline:
            if proc.poll() is not None:
                return None          # died during startup
            row = History(db).component("SCHEDULER") or {}
            if row.get("status") == "Y" and row.get("pid") == proc.pid:
                return proc.pid
            time.sleep(0.05)
        return proc.pid if proc.poll() is None else None

    def stop_scheduler_process(self, path: str | None = None,
                               db: str | None = None) -> None:
        """Signal the running scheduler process via its recorded pid
        (reference api.py:115-125 drives ``scheduler.py stop``)."""
        db = db or getattr(self.history, "path", None)
        row = (History(db).component("SCHEDULER")
               if db and db != ":memory:"
               else self.history.component("SCHEDULER")) or {}
        if row.get("status") == "Y" and row.get("pid"):
            import signal as _signal
            try:
                os.kill(int(row["pid"]), _signal.SIGTERM)
            except ProcessLookupError:
                pass

    def _component_pid(self, comp_id: str,
                       db: str | None = None) -> int | None:
        """pid when the component row says up AND the process is
        actually alive, else None (the liveness probe guards against a
        stale row after a crash)."""
        db = db or getattr(self.history, "path", None)
        hist = History(db) if db and db != ":memory:" else self.history
        row = hist.component(comp_id) or {}
        if row.get("status") != "Y" or not row.get("pid"):
            return None
        try:
            os.kill(int(row["pid"]), 0)
        except (ProcessLookupError, PermissionError):
            return None
        return int(row["pid"])

    def report_scheduler(self, db: str | None = None) -> int | None:
        """Reference api.py:132-152: the scheduler's pid or None."""
        return self._component_pid("SCHEDULER", db)

    def launch_web(self, host: str = "127.0.0.1", port: int = 5000,
                   token: str | None = None,
                   db: str | None = None) -> int | None:
        """Start the REST API as its own detached process (reference
        web.py:71-107); returns the pid once the RESTAPI component
        reports up, None if startup failed."""
        db = db or getattr(self.history, "path", None)
        if not db or db == ":memory:":
            raise ValueError("launch_web needs a file-backed DB")
        import sys as _sys
        argv = [_sys.executable, "-m", "pydin_spark.web", "start",
                "--db", db, "--host", host, "--port", str(port)]
        if token:
            argv += ["--token", token]
        pkg_parent = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        env = dict(os.environ)
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in [pkg_parent, env.get("PYTHONPATH")] if p)
        log = open(os.path.join(os.path.dirname(db) or ".",
                                "webserver.log"), "ab")
        proc = subprocess.Popen(argv, env=env,
                                stdin=subprocess.DEVNULL,
                                stdout=log, stderr=log,
                                start_new_session=True)
        log.close()
        deadline = time.time() + 5.0
        while time.time() < deadline:
            if proc.poll() is not None:
                return None
            if self._component_pid("RESTAPI", db) == proc.pid:
                return proc.pid
            time.sleep(0.05)
        return proc.pid if proc.poll() is None else None

    def stop_web_process(self, db: str | None = None) -> None:
        """Signal the running REST API via its recorded pid (reference
        web.py:109-127)."""
        pid = self._component_pid("RESTAPI", db)
        if pid:
            import signal as _signal
            try:
                os.kill(pid, _signal.SIGTERM)
            except ProcessLookupError:
                pass

    def report_web(self, db: str | None = None) -> int | None:
        """The REST API's pid or None."""
        return self._component_pid("RESTAPI", db)

    def restart_scheduler(self, path: str | None = None,
                          db: str | None = None) -> int | None:
        """stop + start (reference api.py:127-130)."""
        self.stop_scheduler_process(path, db)
        deadline = time.time() + 3.0
        while self.report_scheduler(db) and time.time() < deadline:
            time.sleep(0.05)
        return self.launch_scheduler(path, db)

    def start_scheduler(self) -> None:
        self.scheduler.start()

    def stop_scheduler(self) -> None:
        self.scheduler.stop()

    # -- config bootstrap (reference api.py:464-515 create_config) ----------
    def create_config(self, path: str | None = None) -> str:
        """Write a template sources/config INI; refuses to overwrite."""
        from .sources import SourceRegistry
        path = os.path.expanduser(path or SourceRegistry.DEFAULT_INI)
        if os.path.exists(path):
            raise FileExistsError(f"config {path} already exists")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        import configparser
        parser = configparser.ConfigParser()
        parser.read_dict({
            "lake": {"kind": "filesystem", "base": ""},
            "warehouse_db": {"kind": "database", "url": "", "user": "",
                             "password": "", "driver": ""},
            "file_server": {"kind": "server", "host": "", "port": "22",
                            "protocol": "sftp", "user": "", "password": ""},
        })
        with open(path, "w") as fh:
            fh.write("# pydin_spark sources registry — every section is a\n"
                     "# named connection; secrets may instead come from\n"
                     "# PYDIN_SOURCE_<NAME>_<KEY> environment variables\n")
            parser.write(fh, space_around_delimiters=False)
        return path

    # -- repo sync (reference api.py:517-611 + wrap.py check_repo) ----------
    def _git(self, *args: str, check: bool = True):
        proc = subprocess.run(["git", "-C", self.jobs_dir, *args],
                              capture_output=True, text=True)
        if check and proc.returncode != 0:
            raise RepoError(proc.stderr.strip() or proc.stdout.strip())
        return proc

    def _check_repo(self) -> None:
        probe = self._git("rev-parse", "--git-dir", check=False)
        if probe.returncode != 0:
            raise RepoError(f"no git repo in {self.jobs_dir} found")

    def create_repo(self, url: str | None = None) -> str:
        """Init the jobs folder as a git repo with an initial commit
        (reference api.py:517-546); refuses if one already exists."""
        os.makedirs(self.jobs_dir, exist_ok=True)
        probe = self._git("rev-parse", "--git-dir", check=False)
        if probe.returncode == 0:
            raise RepoError(f"git repo in {self.jobs_dir} already exists")
        self._git("init")
        gitignore = os.path.join(self.jobs_dir, ".gitignore")
        if not os.path.exists(gitignore):
            with open(gitignore, "w") as fh:
                fh.write("__pycache__/\n*.pyc\n*.log\n")
        self._git("add", "-A")
        self._git("-c", "user.email=pydin@localhost",
                  "-c", "user.name=pydin", "commit", "-m", "Initial commit",
                  "--allow-empty")
        if url:
            self._git("remote", "add", "origin", url)
            self._git("push", "--set-upstream", "origin", "HEAD")
        return self.jobs_dir

    def push_repo(self, job_id: int | None = None,
                  message: str | None = None) -> str | None:
        """Commit (all changes, or only ``jobs/<id>``'s subtree) and push
        when a remote exists (reference api.py:548-597)."""
        self._check_repo()
        if job_id is None:
            self._git("add", "-A")
        else:
            # check=False: the pathspec must also stage a DELETED job
            # folder (hard delete_job pushes the removal); an id that
            # never had tracked files is a no-op, not an error
            self._git("add", "-A", "--", str(job_id), check=False)
        staged = self._git("diff", "--cached", "--name-only").stdout.strip()
        if not staged:
            return None
        message = message or f"pydin[{int(time.time())}]"
        self._git("-c", "user.email=pydin@localhost",
                  "-c", "user.name=pydin", "commit", "-m", message)
        if self._git("remote", check=False).stdout.strip():
            self._git("push")
        return message

    def pull_repo(self) -> str:
        """Pull external changes from the remote (api.py:599-611)."""
        self._check_repo()
        return self._git("pull").stdout
