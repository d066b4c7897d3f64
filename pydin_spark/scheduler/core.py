"""Scheduler: 1-second tick loop, charger/executor pools, run states.

Parity target: reference ``Scheduler`` (``pydin/core.py:47-1214``):

- drift-corrected 1 s tick (``core.py:812-833``)
- cron matching per schedule row (``core.py:905-912``)
- charger threads postpone sleeping/capped jobs as 'W', queue ready runs
  as 'Q' (``core.py:964-1036``); executor threads run them
  (``core.py:1038-1095``)
- parallelism cap: 'Y' → 999 concurrent runs, 'N' → 1, or an integer
  (``core.py:429-442``)
- sleep windows: a job whose current hour matches ``sleep_period`` is
  postponed (``core.py:485-528``)
- rerun scan: failed runs are retried every ``rerun_interval`` up to
  ``rerun_limit`` times within ``rerun_days`` (``core.py:451-483``,
  ``926-946``)
- job triggering: when a run finishes 'D', jobs with ``trigger_id`` equal
  to the finished job start with the parent's tag and data
  (``core.py:1765-1818``)

The executor runs a Python callable (job registry) or a subprocess
command; per-job ``timeout`` kills and marks 'T'. Spark is never touched
here — the control plane is engine-agnostic by design, exactly like the
reference.
"""

from __future__ import annotations

import queue
import subprocess
import threading
import time

from .cron import Schedule, matches, parse_moment
from .history import History

QUEUED, WAITING, STARTED, RUNNING = "Q", "W", "S", "R"
DONE, ERROR, CANCELED, TIMEOUT = "D", "E", "C", "T"


class Scheduler:
    def __init__(self, history: History | None = None, chargers: int = 5,
                 executors: int = 20, tick: float = 1.0):
        self.history = history or History()
        self.n_chargers = chargers      # reference default 5 (config.py:147)
        self.n_executors = executors    # reference default 20 (config.py:148)
        self.tick = tick
        self.entry_queue: queue.Queue = queue.Queue()
        self.exec_queue: queue.Queue = queue.Queue()
        self.jobs: dict[int, callable] = {}   # job_id -> python callable
        self.running = False
        self.threads: list[threading.Thread] = []
        self.moment: float | None = None

    # -- registration --------------------------------------------------------
    def register(self, job_name: str, func=None, command: str | None = None,
                 **schedule_fields) -> int:
        """Create a schedule row; ``func`` is an in-process callable
        (receives the run dict), ``command`` an argv list for subprocess."""
        job_id = self.history.add_job(
            job_name, status="Y",
            arguments=command, **schedule_fields)
        if func is not None:
            self.jobs[job_id] = func
        return job_id

    # -- schedule decisions --------------------------------------------------
    def _is_due(self, job: dict, timestamp: float) -> bool:
        if job.get("trigger_id") is not None:
            return False
        units = parse_moment(timestamp)
        return all(matches(job.get(f), units[f])
                   for f in ("mday", "hour", "min", "sec", "wday", "yday"))

    def _parallelism_cap(self, job: dict) -> int:
        raw = job.get("parallelism") or "N"
        if raw == "Y":
            return 999     # reference core.py:433
        if raw == "N":
            return 1
        try:
            return max(int(raw), 1)
        except (TypeError, ValueError):
            return 1

    def _is_sleeping(self, job: dict, timestamp: float) -> bool:
        period = job.get("sleep_period")
        if not period:
            return False
        return matches(period, parse_moment(timestamp)["hour"])

    # -- thread bodies -------------------------------------------------------
    def _ticker(self) -> None:
        # drift-corrected 1 s loop (reference core.py:812-833)
        self.moment = time.time()
        while self.running:
            delay = time.time() - self.moment
            wait = max(self.tick - delay, 0)
            time.sleep(wait)
            self.moment = (self.moment or time.time()) + self.tick
            for job in self.history.jobs(active_only=True):
                if self._is_due(job, self.moment):
                    self.entry_queue.put((job["id"], self.moment))

    def _charger(self) -> None:
        while self.running:
            try:
                job_id, tag = self.entry_queue.get(timeout=0.2)
            except queue.Empty:
                continue
            job = self.history.job(job_id)
            if job is None:
                continue
            if (self._is_sleeping(job, tag)
                    or self.history.running_count(job_id)
                    >= self._parallelism_cap(job)):
                self.history.add_run(job_id, WAITING, tag)  # core.py:1013-1036
                continue
            run_id = self.history.add_run(job_id, QUEUED, tag)
            self.exec_queue.put(run_id)

    def _executor(self) -> None:
        while self.running:
            try:
                run_id = self.exec_queue.get(timeout=0.2)
            except queue.Empty:
                continue
            self._execute(run_id)

    def _execute(self, run_id: int) -> None:
        run = self.history.run(run_id)
        if run is None or run["status"] not in (QUEUED, WAITING):
            return
        job = self.history.job(run["job_id"]) or {}
        self.history.set_run(run_id, status=STARTED)
        func = self.jobs.get(run["job_id"])
        timeout = job.get("timeout")
        try:
            self.history.set_run(run_id, status=RUNNING)
            if func is not None:
                self._run_callable(func, run, timeout)
            elif job.get("arguments"):
                self._run_command(job["arguments"], timeout)
            self.history.set_run(run_id, status=DONE)
            self._fire_triggers(run)
        except subprocess.TimeoutExpired:
            self.history.set_run(run_id, status=TIMEOUT)  # core.py:1065-1077
        except TimeoutError:
            self.history.set_run(run_id, status=TIMEOUT)
        except Exception as exc:  # noqa: BLE001 - job error boundary
            self.history.set_run(run_id, status=ERROR, error_list=str(exc))

    @staticmethod
    def _run_callable(func, run: dict, timeout: float | None) -> None:
        if timeout is None:
            func(run)
            return
        result: list = []
        worker = threading.Thread(target=lambda: result.append(func(run)),
                                  daemon=True)
        worker.start()
        worker.join(timeout)
        if worker.is_alive():
            raise TimeoutError(f"job exceeded {timeout}s")

    @staticmethod
    def _run_command(command: str, timeout: float | None) -> None:
        proc = subprocess.run(command, shell=True, capture_output=True,
                              timeout=timeout)
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr.decode(errors="replace")[:2000])

    def _fire_triggers(self, parent_run: dict) -> None:
        # DAG-of-jobs with data inheritance (reference core.py:1765-1826:
        # the child receives the parent's tag and its pickled data dump —
        # JSON here)
        import json as _json
        parent = self.history.run(parent_run["id"]) or parent_run
        try:
            data = _json.loads(parent.get("data_dump") or "{}")
        except (TypeError, ValueError):
            data = {}
        for job in self.history.jobs(active_only=True):
            if job.get("trigger_id") == parent_run["job_id"]:
                run_id = self.history.add_run(
                    job["id"], QUEUED, parent_run["run_tag"],
                    data=data, rerun_id=parent_run["id"])
                self.exec_queue.put(run_id)

    def rerun_scan(self, now: float | None = None) -> int:
        """Queue eligible failed runs for retry (reference core.py:926-946).

        Called periodically (reference interval 60 s); returns the number
        of runs queued.
        """
        now = now or time.time()
        queued = 0
        for run in self.history.runs(status=ERROR):
            job = self.history.job(run["job_id"]) or {}
            limit = job.get("rerun_limit") or 0
            interval = job.get("rerun_interval") or 0
            times = run.get("rerun_times") or 0
            if times >= limit:
                continue
            if now - run["run_tag"] < interval * (times + 1):
                continue
            self.history.set_run(run["id"], rerun_times=times + 1,
                                 rerun_now="Y", status=QUEUED)
            self.exec_queue.put(run["id"])
            queued += 1
        return queued

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> None:
        self.running = True
        self.threads = [threading.Thread(target=self._ticker, daemon=True)]
        self.threads += [threading.Thread(target=self._charger, daemon=True)
                         for _ in range(self.n_chargers)]
        self.threads += [threading.Thread(target=self._executor, daemon=True)
                         for _ in range(self.n_executors)]
        for t in self.threads:
            t.start()

    def stop(self) -> None:
        self.running = False
        for t in self.threads:
            t.join(timeout=2)
        self.threads = []

    def run_job_now(self, job_id: int, wait: bool = False,
                    timeout: float = 60.0) -> int:
        """Manual run (Driver API surface, reference api.py run_job)."""
        run_id = self.history.add_run(job_id, QUEUED, time.time())
        if wait:
            self._execute(run_id)
        else:
            self.exec_queue.put(run_id)
        return run_id

    def cancel_run(self, run_id: int) -> None:
        run = self.history.run(run_id)
        if run and run["status"] in (QUEUED, WAITING):
            self.history.set_run(run_id, status=CANCELED)
