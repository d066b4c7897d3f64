"""Per-query / per-file audit logging into the metadata DB.

Parity target: reference ``QueryLog`` (``pydin/utils.py:714-801``) and
``FileLog`` (``utils.py:804-869``) populating ``pd_query_log`` /
``pd_file_log`` (``db/sqlite.sql:174-205``). Here a thin recorder wraps
the scheduler ``History``; models call it through the pipeline when one
is attached — zero cost when absent.
"""

from __future__ import annotations

import datetime as dt

from .scheduler.history import History


def _now() -> str:
    return dt.datetime.now().isoformat(sep=" ", timespec="seconds")


class AuditLog:
    def __init__(self, history: History, run_id: int | None = None):
        self.history = history
        self.run_id = run_id

    def query(self, text: str, status: str, records: int | None = None,
              error: str | None = None, started: str | None = None) -> None:
        with self.history.lock:
            self.history.db.insert(
                "pd_query_log",
                ["run_id", "query_text", "status", "start_date",
                 "end_date", "records", "error_text"],
                [self.run_id, text, status, started or _now(), _now(),
                 records, error])

    def file(self, server: str, path: str, action: str, status: str,
             n_bytes: int | None = None) -> None:
        with self.history.lock:
            self.history.db.insert(
                "pd_file_log",
                ["run_id", "server", "file_path", "action", "status",
                 "start_date", "bytes"],
                [self.run_id, server, path, action, status, _now(),
                 n_bytes])

    def queries(self) -> list[dict]:
        with self.history.lock:
            return self.history.db.select("SELECT * FROM pd_query_log")

    def files(self) -> list[dict]:
        with self.history.lock:
            return self.history.db.select("SELECT * FROM pd_file_log")
