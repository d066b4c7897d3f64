"""App-metadata store: schedule + run history tables.

Parity target: reference ``pydin/db.py`` + ``db/sqlite.sql`` — a
``schedule`` table describing jobs and a ``run_history`` table recording
every run with the Q/W/S/R/D/E/C/T/U state machine
(``db/sqlite.sql:6-36``, ``88-114``). Implemented on stdlib sqlite3 (the
reference's default backend); the DDL is engine-agnostic so a JDBC
database can host the same tables for a multi-node control plane.
"""

from __future__ import annotations

import datetime as dt
import json
import sqlite3
import threading

DDL = """
CREATE TABLE IF NOT EXISTS pd_schedule (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    job_name TEXT,
    job_description TEXT,
    status TEXT DEFAULT 'N',          -- Y active / N inactive
    mday TEXT, hour TEXT, min TEXT, sec TEXT, wday TEXT, yday TEXT,
    trigger_id INTEGER,
    start_date TEXT, end_date TEXT,
    environment TEXT, arguments TEXT, timeout INTEGER,
    parallelism TEXT DEFAULT 'N',
    rerun_interval INTEGER, rerun_limit INTEGER, rerun_days INTEGER,
    sleep_period TEXT, wake_up_period TEXT,
    email_list TEXT
);
CREATE TABLE IF NOT EXISTS pd_run_history (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    job_id INTEGER, run_mode TEXT,
    run_tag REAL, run_date TEXT,
    added TEXT, start_date TEXT, end_date TEXT,
    status TEXT,                      -- Q W S R D E C T U
    server TEXT, user TEXT, pid INTEGER,
    error_list TEXT,
    rerun_id INTEGER, rerun_seqno INTEGER,
    rerun_times INTEGER, rerun_now TEXT, rerun_done TEXT,
    trigger_run_id INTEGER,           -- run that fired this triggered run
    deactivated TEXT,
    data_dump TEXT                    -- JSON (reference used pickle)
);
CREATE TABLE IF NOT EXISTS pd_task_history (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    run_id INTEGER, task_name TEXT, status TEXT,
    start_date TEXT, end_date TEXT,
    records_read INTEGER, records_written INTEGER, records_error INTEGER,
    result_value INTEGER, result_long TEXT
);
CREATE TABLE IF NOT EXISTS pd_step_history (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    run_id INTEGER, task_id INTEGER, step_name TEXT, step_type TEXT,
    status TEXT, start_date TEXT, end_date TEXT,
    records_read INTEGER, records_written INTEGER, records_error INTEGER,
    result_value INTEGER, seconds REAL
);
CREATE TABLE IF NOT EXISTS pd_query_log (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    run_id INTEGER, query_text TEXT, status TEXT,
    start_date TEXT, end_date TEXT, records INTEGER, error_text TEXT
);
CREATE TABLE IF NOT EXISTS pd_file_log (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    run_id INTEGER, server TEXT, file_path TEXT, action TEXT,
    status TEXT, start_date TEXT, bytes INTEGER
);
CREATE TABLE IF NOT EXISTS pd_components (
    id TEXT PRIMARY KEY,              -- SCHEDULER / RESTAPI
    server_name TEXT, user_name TEXT, pid INTEGER, url TEXT,
    debug TEXT, start_date TEXT, stop_date TEXT, status TEXT
);
INSERT OR IGNORE INTO pd_components(id) VALUES ('SCHEDULER');
INSERT OR IGNORE INTO pd_components(id) VALUES ('RESTAPI');
"""


def _now() -> str:
    return dt.datetime.now().isoformat(sep=" ", timespec="seconds")


class History:
    """Thread-safe facade over the metadata DB."""

    def __init__(self, path: str = ":memory:"):
        self.path = path
        self.conn = sqlite3.connect(path, check_same_thread=False)
        self.conn.row_factory = sqlite3.Row
        self.conn.executescript(DDL)
        self.lock = threading.Lock()

    def _exec(self, sql: str, params=()):
        with self.lock:
            cur = self.conn.execute(sql, params)
            self.conn.commit()
            return cur

    # -- schedule -----------------------------------------------------------
    def add_job(self, job_name: str, **fields) -> int:
        cols = ["job_name", *fields.keys()]
        sql = (f"INSERT INTO pd_schedule ({', '.join(cols)}) VALUES "
               f"({', '.join('?' * len(cols))})")
        return self._exec(sql, [job_name, *fields.values()]).lastrowid

    def set_job(self, job_id: int, **fields) -> None:
        sets = ", ".join(f"{k} = ?" for k in fields)
        self._exec(f"UPDATE pd_schedule SET {sets} WHERE id = ?",
                   [*fields.values(), job_id])

    # -- components (reference db/sqlite.sql:207-221) -----------------------
    def set_component(self, comp_id: str, **fields) -> None:
        sets = ", ".join(f"{k} = ?" for k in fields)
        self._exec(f"UPDATE pd_components SET {sets} WHERE id = ?",
                   [*fields.values(), comp_id])

    def component(self, comp_id: str):
        with self.lock:
            row = self.conn.execute(
                "SELECT * FROM pd_components WHERE id = ?",
                (comp_id,)).fetchone()
            return dict(row) if row else None

    def delete_job(self, job_id: int) -> None:
        """Remove the schedule row (reference hard delete,
        api.py:321-336); the run history rows stay — they are the
        audit trail, keyed by job_id, and the reference keeps them
        too (it deletes only from the schedule table)."""
        self._exec("DELETE FROM pd_schedule WHERE id = ?", [job_id])

    def jobs(self, active_only: bool = False):
        sql = "SELECT * FROM pd_schedule"
        if active_only:
            sql += " WHERE status = 'Y'"
        with self.lock:
            return [dict(r) for r in self.conn.execute(sql)]

    def job(self, job_id: int):
        with self.lock:
            row = self.conn.execute(
                "SELECT * FROM pd_schedule WHERE id = ?", (job_id,)
            ).fetchone()
        return dict(row) if row else None

    # -- run history --------------------------------------------------------
    def add_run(self, job_id: int, status: str, run_tag: float,
                run_date: str | None = None, data: dict | None = None,
                **fields) -> int:
        cols = ["job_id", "status", "run_tag", "run_date", "added",
                "data_dump", *fields.keys()]
        vals = [job_id, status, run_tag, run_date or _now(), _now(),
                json.dumps(data or {}), *fields.values()]
        sql = (f"INSERT INTO pd_run_history ({', '.join(cols)}) VALUES "
               f"({', '.join('?' * len(cols))})")
        return self._exec(sql, vals).lastrowid

    def set_run(self, run_id: int, **fields) -> None:
        sets = ", ".join(f"{k} = ?" for k in fields)
        self._exec(f"UPDATE pd_run_history SET {sets} WHERE id = ?",
                   [*fields.values(), run_id])

    def run(self, run_id: int):
        with self.lock:
            row = self.conn.execute(
                "SELECT * FROM pd_run_history WHERE id = ?", (run_id,)
            ).fetchone()
        return dict(row) if row else None

    def runs(self, job_id: int | None = None, status: str | None = None):
        sql, params = "SELECT * FROM pd_run_history WHERE 1=1", []
        if job_id is not None:
            sql += " AND job_id = ?"
            params.append(job_id)
        if status is not None:
            sql += " AND status = ?"
            params.append(status)
        with self.lock:
            return [dict(r) for r in self.conn.execute(sql, params)]

    def running_count(self, job_id: int) -> int:
        with self.lock:
            row = self.conn.execute(
                "SELECT COUNT(*) AS n FROM pd_run_history "
                "WHERE job_id = ? AND status IN ('Q','S','R')",
                (job_id,)).fetchone()
        return row["n"]

    # -- task/step metrics (populated from Pipeline.summary()) --------------
    def record_pipeline(self, run_id: int, pipeline) -> None:
        summary = pipeline.summary()
        self._exec(
            "INSERT INTO pd_task_history (run_id, task_name, status, "
            "start_date, end_date, records_read, records_written, "
            "records_error) VALUES (?,?,?,?,?,?,?,?)",
            (run_id, summary["name"], summary["status"], _now(), _now(),
             pipeline.records_read, pipeline.records_written,
             pipeline.records_error))
        for step in summary["steps"]:
            self._exec(
                "INSERT INTO pd_step_history (run_id, step_name, step_type,"
                " status, records_read, records_written, records_error, "
                "result_value, seconds) VALUES (?,?,?,?,?,?,?,?,?)",
                (run_id, step["step"], step["step"].split(":")[1][:3].strip("]"),
                 step["status"], step["records_read"],
                 step["records_written"], step["records_error"],
                 step["result_value"], step["seconds"]))
