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
DONE, ERROR, CANCELED, TIMEOUT, UNKNOWN = "D", "E", "C", "T", "U"


class Scheduler:
    def __init__(self, history: History | None = None, chargers: int = 5,
                 executors: int = 20, tick: float = 1.0,
                 maintenance_interval: float = 60.0,
                 notifier=None):
        """``notifier``: optional callable invoked on every failed run
        ('E'/'T'/'U') with a dict carrying job_name, email_list, run_id,
        status and error_list — the pluggable equivalent of the
        reference's SMTP alarming (logger.py:20-27 + ``email_list`` on
        the schedule, api.py:160/254). Wire an SMTP sender, a pager, or
        a test double; notifier errors never break the executor."""
        self.history = history or History()
        self.notifier = notifier
        self.n_chargers = chargers      # reference default 5 (config.py:147)
        self.n_executors = executors    # reference default 20 (config.py:148)
        self.tick = tick
        # wake-up/rerun scan cadence (reference runs both every 60 s,
        # core.py:948-962 / 926-946)
        self.maintenance_interval = maintenance_interval
        self.entry_queue: queue.Queue = queue.Queue()
        self.exec_queue: queue.Queue = queue.Queue()
        self.jobs: dict[int, callable] = {}   # job_id -> python callable
        self.running = False
        self.threads: list[threading.Thread] = []
        self.moment: float | None = None
        self._last_maintenance: float = 0.0

    # -- registration --------------------------------------------------------
    def register(self, job_name: str, func=None,
                 command: str | list | None = None,
                 **schedule_fields) -> int:
        """Create a schedule row; ``func`` is an in-process callable
        (receives the run dict), ``command`` a shell string or an argv
        list (lists are shlex-joined for storage and run without a
        shell)."""
        if isinstance(command, (list, tuple)):
            import shlex
            command = shlex.join(str(c) for c in command)
        job_id = self.history.add_job(
            job_name, status="Y",
            arguments=command, **schedule_fields)
        if func is not None:
            self.jobs[job_id] = func
        return job_id

    # -- schedule decisions --------------------------------------------------
    @staticmethod
    def _is_active(job: dict, timestamp: float) -> bool:
        """Schedule activity window: start_date/end_date bound when a
        job may fire at all (reference ``was_active``, core.py:375-384;
        either bound may be absent)."""
        import datetime as _dt

        def _ts(value):
            if not value:
                return None
            try:
                return _dt.datetime.fromisoformat(str(value)).timestamp()
            except ValueError:
                return None

        start, end = _ts(job.get("start_date")), _ts(job.get("end_date"))
        if start is not None and timestamp <= start:
            return False
        if end is not None and timestamp >= end:
            return False
        return True

    def _is_due(self, job: dict, timestamp: float) -> bool:
        if job.get("trigger_id") is not None:
            return False
        if not self._is_active(job, timestamp):
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

    def _is_awakening(self, job: dict, timestamp: float) -> bool:
        """Wake-up window: minute-matched ``wake_up_period``; absent
        means always awakenable (reference ``was_awakening``,
        core.py:1004-1012)."""
        period = job.get("wake_up_period")
        if not period:
            return True
        return matches(period, parse_moment(timestamp)["min"])

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
            if self.moment - self._last_maintenance >= self.maintenance_interval:
                self._last_maintenance = self.moment
                try:
                    self.wake_up_scan(self.moment)
                    self.rerun_scan(self.moment)
                except Exception:  # noqa: BLE001 - keep the tick alive
                    pass

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
                # persist the job's data mutations so downstream
                # triggered jobs AND history readers see them
                # (reference pickles the data dump after every run;
                # trigger inheritance below already reads data_dump)
                if run.get("data"):
                    import json as _json
                    self.history.set_run(
                        run_id, data_dump=_json.dumps(run["data"]))
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
        finally:
            final = self.history.run(run_id) or {}
            # a run that somehow slipped through without reaching a
            # terminal status ended unexpectedly → 'U' (reference
            # core.py:2437-2441 marks non-D/E ends the same way)
            if final.get("status") in (STARTED, RUNNING):
                self.history.set_run(run_id, status=UNKNOWN)
                final["status"] = UNKNOWN
            if run.get("rerun_id"):
                # rerun bookkeeping on the initiator (reference
                # core.py:1669-1673): bump rerun_times, clear the
                # in-flight flag, set rerun_done only when the rerun
                # actually succeeded
                self.history.set_run(
                    run["rerun_id"],
                    rerun_times=run.get("rerun_seqno") or 1,
                    rerun_now=None,
                    rerun_done="Y" if final.get("status") == DONE else None)
            if (self.notifier is not None
                    and final.get("status") in (ERROR, TIMEOUT, UNKNOWN)):
                try:
                    self.notifier({
                        "job_id": run["job_id"],
                        "job_name": job.get("job_name"),
                        "email_list": job.get("email_list"),
                        "run_id": run_id,
                        "status": final.get("status"),
                        "error_list": final.get("error_list"),
                    })
                except Exception:  # noqa: BLE001 - alarms must not kill runs
                    pass

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
    def _run_command(command: str | list, timeout: float | None) -> None:
        # strings run through the shell; argv lists run directly (no
        # shell) so list arguments are never silently re-split
        shell = not isinstance(command, (list, tuple))
        proc = subprocess.run(command if shell else list(command),
                              shell=shell, capture_output=True,
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
                    data=data, trigger_run_id=parent_run["id"])
                self.exec_queue.put(run_id)

    @staticmethod
    def _added_ts(run: dict) -> float:
        """Timestamp of the run's ``added`` ISO string (falls back to
        the run tag)."""
        import datetime as _dt
        added = run.get("added")
        if added:
            try:
                return _dt.datetime.fromisoformat(added).timestamp()
            except ValueError:
                pass
        return float(run.get("run_tag") or 0)

    def wake_up_scan(self, now: float | None = None) -> int:
        """Re-queue postponed 'W' runs whose blocker cleared (reference
        ``_wake_up`` + ``_regain_sleeping_job``, core.py:948-962 /
        1121-1140): the job's wake-up window (minute-matched
        ``wake_up_period``, default always) is active, the sleep window
        has ended, and the parallelism cap has capacity. Called every
        ``maintenance_interval`` seconds by the tick loop; returns the
        number of runs re-queued.
        """
        now = now or time.time()
        woken = 0
        for run in self.history.runs(status=WAITING):
            if run.get("deactivated"):
                continue
            job = self.history.job(run["job_id"])
            if job is None or job.get("status") != "Y":
                continue
            if not self._is_awakening(job, now):
                continue
            if self._is_sleeping(job, now):
                continue
            if (self.history.running_count(run["job_id"])
                    >= self._parallelism_cap(job)):
                continue
            self.history.set_run(run["id"], status=QUEUED)
            self.exec_queue.put(run["id"])
            woken += 1
        return woken

    def rerun_scan(self, now: float | None = None) -> int:
        """Start reruns of eligible failed runs (reference core.py:926-946
        + ``was_rerun_available`` core.py:966-986).

        A failed parent run ('E'/'T', itself not a rerun, no rerun in
        flight, never completed by a rerun) is eligible when the job has a
        ``rerun_interval``, fewer than ``rerun_limit`` reruns were tried,
        the run was added within the last ``rerun_days`` days (outside
        the window the run stops retrying forever), and at least
        ``rerun_interval`` seconds have passed per attempt. Each rerun is
        a NEW child run carrying ``rerun_id``/``rerun_seqno`` (reference
        ``_start_as_rerun`` core.py:1616-1638); the parent is flagged
        ``rerun_now='Y'`` while the child is in flight and earns
        ``rerun_done='Y'`` when a child finishes 'D'.

        Called every ``maintenance_interval`` seconds by the tick loop;
        returns the number of reruns started.
        """
        now = now or time.time()
        started = 0
        failed = (self.history.runs(status=ERROR)
                  + self.history.runs(status=TIMEOUT))
        for run in failed:
            if (run.get("rerun_id") or run.get("rerun_now")
                    or run.get("rerun_done") or run.get("deactivated")):
                continue
            job = self.history.job(run["job_id"]) or {}
            interval = job.get("rerun_interval") or 0
            limit = job.get("rerun_limit") or 0
            days = job.get("rerun_days") or 1
            times = run.get("rerun_times") or 0
            if not interval or times >= limit:
                continue
            added = self._added_ts(run)
            if now - added > days * 86400:       # out of the rerun window
                continue
            if now - added < interval * (times + 1):
                continue
            seqno = times + 1
            child_id = self.history.add_run(
                run["job_id"], QUEUED, run["run_tag"],
                run_date=run.get("run_date"),
                rerun_id=run["id"], rerun_seqno=seqno)
            self.history.set_run(run["id"], rerun_now="Y")
            self.exec_queue.put(child_id)
            started += 1
        return started

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> None:
        # startup recovery: runs left 'S'/'R' by a previous scheduler
        # life ended unexpectedly — mark them 'U' (the in-process
        # equivalent of the reference's Job._exit 'U' marking,
        # core.py:2437-2441)
        for status in (STARTED, RUNNING):
            for run in self.history.runs(status=status):
                self.history.set_run(run["id"], status=UNKNOWN)
        self.running = True
        self._last_maintenance = time.time()
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
