"""Driver: programmatic admin API over the scheduler + metadata DB.

Parity target: reference ``pydin/api.py:23-591`` — create/configure/
enable/disable/delete jobs, run/cancel runs, introspect history. The
shape is kept 1:1 so reference users can switch; the implementation sits
on the engine's ``scheduler.History``/``Scheduler``.
"""

from __future__ import annotations

import time

from .scheduler import History, Scheduler


class Driver:
    def __init__(self, scheduler: Scheduler | None = None,
                 history: History | None = None):
        self.scheduler = scheduler or Scheduler(history or History())

    @property
    def history(self) -> History:
        return self.scheduler.history

    # -- job management (api.py create_job/configure_job/...) ---------------
    def create_job(self, job_name: str, desc: str | None = None,
                   func=None, command: str | None = None,
                   **schedule_fields) -> int:
        return self.scheduler.register(
            job_name, func=func, command=command,
            job_description=desc, **schedule_fields)

    def configure_job(self, job_id: int, **fields) -> None:
        self.history.set_job(job_id, **fields)

    def enable_job(self, job_id: int) -> None:
        self.history.set_job(job_id, status="Y")

    def disable_job(self, job_id: int) -> None:
        self.history.set_job(job_id, status="N")

    def delete_job(self, job_id: int) -> None:
        """Deactivate rather than hard-delete (reference keeps history)."""
        self.history.set_job(job_id, status="N",
                             end_date=time.strftime("%Y-%m-%d %H:%M:%S"))

    def list_jobs(self, active_only: bool = False) -> list[dict]:
        return self.history.jobs(active_only=active_only)

    # -- run management (api.py run_job/cancel_run/deactivate_run) ----------
    def run_job(self, job_id: int, wait: bool = True) -> int:
        return self.scheduler.run_job_now(job_id, wait=wait)

    def cancel_run(self, run_id: int) -> None:
        self.scheduler.cancel_run(run_id)

    def deactivate_run(self, run_id: int) -> None:
        self.history.set_run(run_id, deactivated="Y")

    def get_run(self, run_id: int) -> dict | None:
        return self.history.run(run_id)

    def list_runs(self, job_id: int | None = None,
                  status: str | None = None) -> list[dict]:
        return self.history.runs(job_id=job_id, status=status)

    # -- scheduler control (api.py start/stop scheduler) --------------------
    def start_scheduler(self) -> None:
        self.scheduler.start()

    def stop_scheduler(self) -> None:
        self.scheduler.stop()
