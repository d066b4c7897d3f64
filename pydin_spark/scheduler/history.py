"""App-metadata store: schedule + run history tables.

Parity target: reference ``pydin/db.py`` + ``db/sqlite.sql`` +
``db/oracle.sql`` — a ``schedule`` table describing jobs and a
``run_history`` table recording every run with the Q/W/S/R/D/E/C/T/U
state machine (``db/sqlite.sql:6-36``, ``88-114``), hostable either in
an embedded file DB or a shared RDBMS so a multi-node control plane
can point every scheduler/CLI/REST process at the same metadata
(reference ``pydin/db.py:16-48`` chooses sqlite vs Oracle from config).

Two backends behind one facade:

- sqlite3 (stdlib, the default): ``History(path)`` — single-node.
- JDBC via the Spark driver JVM: ``History("jdbc:derby:...")`` or
  ``History(url=..., spark=...)`` — the control plane lives in
  whatever RDBMS the JDBC URL names (embedded Derby in tests; the
  same code path speaks to Postgres/Oracle given their driver jar).
  No extra Python driver is needed: the scheduler already owns a
  SparkSession, and ``java.sql`` rides its JVM.
"""

from __future__ import annotations

import datetime as dt
import json
import sqlite3
import threading

#: column model shared by both backends: (name, kind) where kind is
#: one of id/int/real/text/key — each backend renders its own DDL from
#: this, so the schema cannot drift between engines
TABLES: dict[str, list[tuple[str, str]]] = {
    "pd_schedule": [
        ("id", "id"),
        ("job_name", "text"), ("job_description", "text"),
        ("status", "text"),               # Y active / N inactive
        ("mday", "text"), ("hour", "text"), ("min", "text"),
        ("sec", "text"), ("wday", "text"), ("yday", "text"),
        ("trigger_id", "int"),
        ("start_date", "text"), ("end_date", "text"),
        ("environment", "text"), ("arguments", "text"),
        ("timeout", "int"), ("parallelism", "text"),
        ("rerun_interval", "int"), ("rerun_limit", "int"),
        ("rerun_days", "int"),
        ("sleep_period", "text"), ("wake_up_period", "text"),
        ("email_list", "text"),
    ],
    "pd_run_history": [
        ("id", "id"),
        ("job_id", "int"), ("run_mode", "text"),
        ("run_tag", "real"), ("run_date", "text"),
        ("added", "text"), ("start_date", "text"), ("end_date", "text"),
        ("status", "text"),               # Q W S R D E C T U
        ("server", "text"), ("user", "text"), ("pid", "int"),
        ("error_list", "text"),
        ("rerun_id", "int"), ("rerun_seqno", "int"),
        ("rerun_times", "int"), ("rerun_now", "text"),
        ("rerun_done", "text"),
        ("trigger_run_id", "int"),        # run that fired this one
        ("deactivated", "text"),
        ("data_dump", "text"),            # JSON (reference used pickle)
    ],
    "pd_task_history": [
        ("id", "id"),
        ("run_id", "int"), ("task_name", "text"), ("status", "text"),
        ("start_date", "text"), ("end_date", "text"),
        ("records_read", "int"), ("records_written", "int"),
        ("records_error", "int"),
        ("result_value", "int"), ("result_long", "text"),
    ],
    "pd_step_history": [
        ("id", "id"),
        ("run_id", "int"), ("task_id", "int"), ("step_name", "text"),
        ("step_type", "text"), ("status", "text"),
        ("start_date", "text"), ("end_date", "text"),
        ("records_read", "int"), ("records_written", "int"),
        ("records_error", "int"),
        ("result_value", "int"), ("seconds", "real"),
    ],
    "pd_query_log": [
        ("id", "id"),
        ("run_id", "int"), ("query_text", "text"), ("status", "text"),
        ("start_date", "text"), ("end_date", "text"),
        ("records", "int"), ("error_text", "text"),
    ],
    "pd_file_log": [
        ("id", "id"),
        ("run_id", "int"), ("server", "text"), ("file_path", "text"),
        ("action", "text"), ("status", "text"), ("start_date", "text"),
        ("bytes", "int"),
    ],
    "pd_components": [
        ("id", "key"),                    # SCHEDULER / RESTAPI
        ("server_name", "text"), ("user_name", "text"), ("pid", "int"),
        ("url", "text"), ("debug", "text"),
        ("start_date", "text"), ("stop_date", "text"),
        ("status", "text"),
    ],
    # declarative pipelines (config.py save/load_pipeline_config)
    "pd_pipeline_config": [
        ("id", "id"),
        ("pipeline_name", "text"), ("job_id", "int"),
        ("error_limit", "int"),
    ],
    "pd_node_config": [
        ("id", "id"),
        ("pipeline_id", "int"), ("seqno", "int"), ("branch", "int"),
        ("node_type", "text"), ("node_config", "text"),
    ],
}

#: columns carrying a DEFAULT on insert (both backends render it)
_DEFAULTS = {("pd_schedule", "status"): "N",
             ("pd_schedule", "parallelism"): "N"}


class _SqliteBackend:
    """stdlib sqlite3 — the reference's default engine."""

    _TYPES = {"id": "INTEGER PRIMARY KEY AUTOINCREMENT",
              "int": "INTEGER", "real": "REAL", "text": "TEXT",
              "key": "TEXT PRIMARY KEY"}

    def __init__(self, path: str = ":memory:"):
        self.conn = sqlite3.connect(path, check_same_thread=False)
        self.conn.row_factory = sqlite3.Row
        for table, cols in TABLES.items():
            defs = []
            for name, kind in cols:
                d = _DEFAULTS.get((table, name))
                defs.append(f"{name} {self._TYPES[kind]}"
                            + (f" DEFAULT '{d}'" if d else ""))
            self.conn.execute(f"CREATE TABLE IF NOT EXISTS {table} "
                              f"({', '.join(defs)})")
        for comp in ("SCHEDULER", "RESTAPI"):
            self.conn.execute(
                "INSERT OR IGNORE INTO pd_components(id) VALUES (?)",
                (comp,))
        self.conn.commit()

    def insert(self, table: str, cols, vals) -> int:
        sql = (f"INSERT INTO {table} ({', '.join(cols)}) VALUES "
               f"({', '.join('?' * len(cols))})")
        cur = self.conn.execute(sql, list(vals))
        self.conn.commit()
        return cur.lastrowid

    def update(self, table: str, sets: dict, where: str, params) -> None:
        assign = ", ".join(f"{k} = ?" for k in sets)
        self.conn.execute(f"UPDATE {table} SET {assign} WHERE {where}",
                          [*sets.values(), *params])
        self.conn.commit()

    def delete(self, table: str, where: str, params) -> None:
        self.conn.execute(f"DELETE FROM {table} WHERE {where}",
                          list(params))
        self.conn.commit()

    def select(self, sql: str, params=()):
        return [dict(r) for r in self.conn.execute(sql, list(params))]


class _JdbcBackend:
    """``java.sql`` over the driver JVM (py4j) — the shared-RDBMS
    control plane (reference ``db/oracle.sql`` role). Identifiers are
    created and addressed QUOTED-UPPERCASE so reserved column names
    from the reference schema (``min``/``hour``/``sec``/``user``) stay
    legal on strict engines, while unquoted references in fixed
    queries (``status``, ``id``, ``job_id``) still resolve; result
    keys are normalized to lowercase for dict parity with sqlite."""

    _TYPES = {"id": "INTEGER GENERATED ALWAYS AS IDENTITY PRIMARY KEY",
              "int": "BIGINT", "real": "DOUBLE",
              "text": "VARCHAR(32000)",
              "key": "VARCHAR(64) PRIMARY KEY"}

    def __init__(self, url: str, spark=None, driver: str | None = None):
        if spark is None:
            from pyspark.sql import SparkSession
            spark = SparkSession.getActiveSession()
            if spark is None:
                from ..session import get_session
                spark = get_session("pydin-history")
        self._jvm = spark._jvm
        if driver:
            self._jvm.java.lang.Class.forName(driver)
        self.conn = self._jvm.java.sql.DriverManager.getConnection(url)
        self.conn.setAutoCommit(True)
        self._ensure_schema()

    def _ensure_schema(self) -> None:
        st = self.conn.createStatement()
        try:
            for table, cols in TABLES.items():
                defs = []
                for name, kind in cols:
                    d = _DEFAULTS.get((table, name))
                    defs.append(f'"{name.upper()}" {self._TYPES[kind]}'
                                + (f" DEFAULT '{d}'" if d else ""))
                try:
                    st.executeUpdate(f"CREATE TABLE {table} "
                                     f"({', '.join(defs)})")
                except Exception as exc:  # table exists (Derby X0Y32)
                    if "X0Y32" not in str(exc) \
                            and "already exists" not in str(exc):
                        raise
            for comp in ("SCHEDULER", "RESTAPI"):
                try:
                    st.executeUpdate("INSERT INTO pd_components (\"ID\")"
                                     f" VALUES ('{comp}')")
                except Exception as exc:  # seeded already (dup key)
                    if "23505" not in str(exc) \
                            and "duplicate" not in str(exc).lower():
                        raise
        finally:
            st.close()

    def _bind(self, st, vals) -> None:
        for i, v in enumerate(vals, start=1):
            if isinstance(v, bool):
                v = int(v)  # schema stores flags as ints/strings
            st.setObject(i, v)

    def insert(self, table: str, cols, vals) -> int:
        q = ", ".join(f'"{c.upper()}"' for c in cols)
        ph = ", ".join("?" * len(cols))
        st = self.conn.prepareStatement(
            f"INSERT INTO {table} ({q}) VALUES ({ph})",
            self._jvm.java.sql.Statement.RETURN_GENERATED_KEYS)
        try:
            self._bind(st, vals)
            st.executeUpdate()
            rs = st.getGeneratedKeys()
            rid = int(rs.getLong(1)) if rs.next() else 0
            rs.close()
            return rid
        finally:
            st.close()

    def update(self, table: str, sets: dict, where: str, params) -> None:
        assign = ", ".join(f'"{k.upper()}" = ?' for k in sets)
        st = self.conn.prepareStatement(
            f"UPDATE {table} SET {assign} WHERE {where}")
        try:
            self._bind(st, [*sets.values(), *params])
            st.executeUpdate()
        finally:
            st.close()

    def delete(self, table: str, where: str, params) -> None:
        st = self.conn.prepareStatement(
            f"DELETE FROM {table} WHERE {where}")
        try:
            self._bind(st, params)
            st.executeUpdate()
        finally:
            st.close()

    def select(self, sql: str, params=()):
        st = self.conn.prepareStatement(sql)
        try:
            self._bind(st, params)
            rs = st.executeQuery()
            md = rs.getMetaData()
            names = [md.getColumnLabel(i + 1).lower()
                     for i in range(md.getColumnCount())]
            out = []
            while rs.next():
                out.append({nm: rs.getObject(i + 1)
                            for i, nm in enumerate(names)})
            rs.close()
            return out
        finally:
            st.close()


#: dialect → column-kind type map for :func:`render_ddl`. sqlite and
#: derby mirror what the two LIVE backends execute; oracle/postgres
#: are the deployment scripts the reference ships as ``db/oracle.sql``
#: (VERDICT r9 #5) — rendered from the SAME column model so the
#: schema cannot drift between what tests run and what a DBA deploys.
_DDL_TYPES: dict[str, dict[str, str]] = {
    "sqlite": _SqliteBackend._TYPES,
    "derby": _JdbcBackend._TYPES,
    "oracle": {
        # identity (12c+) replaces the reference's sequence+trigger
        # trio (db/oracle.sql:39-66) with identical insert semantics
        "id": "NUMBER(19, 0) GENERATED ALWAYS AS IDENTITY PRIMARY KEY",
        "int": "NUMBER(19, 0)",
        "real": "BINARY_DOUBLE",
        # dates/tags travel as ISO text in the shared model (both
        # live backends store text); VARCHAR2 char-semantics as in
        # the reference script
        "text": "VARCHAR2(4000 CHAR)",
        "key": "VARCHAR2(64 CHAR) PRIMARY KEY",
    },
    "postgres": {
        "id": "BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY",
        "int": "BIGINT",
        "real": "DOUBLE PRECISION",
        "text": "TEXT",
        "key": "VARCHAR(64) PRIMARY KEY",
    },
}


def render_ddl(dialect: str = "sqlite") -> str:
    """Render the full metadata-DB deployment script for ``dialect``
    (sqlite / derby / oracle / postgres) from the shared column model
    (:data:`TABLES` + :data:`_DEFAULTS`) — reference parity for the
    shipped ``db/oracle.sql`` (reference db/oracle.sql:1-332), kept
    drift-proof by deriving every engine's DDL from one source.

    Identifier quoting matches how each backend ADDRESSES the tables:
    oracle/derby render quoted-UPPERCASE (what :class:`_JdbcBackend`
    binds — reserved reference names like ``min``/``sec``/``user``
    stay legal); postgres renders quoted-lowercase (PostgreSQL folds
    unquoted identifiers to lowercase, so unquoted queries still
    resolve); sqlite needs no quoting. The component seed rows ship
    with the script, as in the reference deployment."""
    if dialect not in _DDL_TYPES:
        raise ValueError(f"unknown dialect {dialect!r}; one of "
                         f"{sorted(_DDL_TYPES)}")
    types = _DDL_TYPES[dialect]

    def ident(name: str) -> str:
        if dialect in ("oracle", "derby"):
            return f'"{name.upper()}"'
        if dialect == "postgres":
            return f'"{name}"'
        return name

    stmts = []
    for table, cols in TABLES.items():
        defs = []
        for name, kind in cols:
            d = _DEFAULTS.get((table, name))
            defs.append(f"  {ident(name)} {types[kind]}"
                        + (f" DEFAULT '{d}'" if d else ""))
        stmts.append(f"CREATE TABLE {table} (\n"
                     + ",\n".join(defs) + "\n);")
    for comp in ("SCHEDULER", "RESTAPI"):
        stmts.append(f"INSERT INTO pd_components ({ident('id')}) "
                     f"VALUES ('{comp}');")
    header = (f"-- pydin_spark metadata schema ({dialect})\n"
              f"-- GENERATED by pydin_spark.scheduler.history."
              f"render_ddl({dialect!r}) from the shared column model;\n"
              f"-- edit TABLES/_DEFAULTS there, never this file.\n")
    return header + "\n\n".join(stmts) + "\n"


def _now() -> str:
    return dt.datetime.now().isoformat(sep=" ", timespec="seconds")


class History:
    """Thread-safe facade over the metadata DB.

    ``History()`` / ``History(path)`` → sqlite3 (embedded default);
    ``History("jdbc:...")`` / ``History(url=..., spark=...)`` → the
    JDBC backend hosting the identical tables in a shared RDBMS.
    """

    def __init__(self, path: str = ":memory:", url: str | None = None,
                 spark=None, driver: str | None = None):
        if url is None and isinstance(path, str) \
                and path.startswith("jdbc:"):
            url, path = path, ":memory:"
        self.path = url or path
        self.db = (_JdbcBackend(url, spark, driver) if url
                   else _SqliteBackend(path))
        self.lock = threading.Lock()

    # -- schedule -----------------------------------------------------------
    def add_job(self, job_name: str, **fields) -> int:
        defaults = {k[1]: v for k, v in _DEFAULTS.items()
                    if k[0] == "pd_schedule" and k[1] not in fields}
        cols = ["job_name", *fields.keys(), *defaults.keys()]
        vals = [job_name, *fields.values(), *defaults.values()]
        with self.lock:
            return self.db.insert("pd_schedule", cols, vals)

    def set_job(self, job_id: int, **fields) -> None:
        with self.lock:
            self.db.update("pd_schedule", fields, "id = ?", [job_id])

    # -- components (reference db/sqlite.sql:207-221) -----------------------
    def set_component(self, comp_id: str, **fields) -> None:
        with self.lock:
            self.db.update("pd_components", fields, "id = ?", [comp_id])

    def component(self, comp_id: str):
        with self.lock:
            rows = self.db.select(
                "SELECT * FROM pd_components WHERE id = ?", (comp_id,))
        return rows[0] if rows else None

    def delete_job(self, job_id: int) -> None:
        """Remove the schedule row (reference hard delete,
        api.py:321-336); the run history rows stay — they are the
        audit trail, keyed by job_id, and the reference keeps them
        too (it deletes only from the schedule table)."""
        with self.lock:
            self.db.delete("pd_schedule", "id = ?", [job_id])

    def jobs(self, active_only: bool = False):
        sql = "SELECT * FROM pd_schedule"
        if active_only:
            sql += " WHERE status = 'Y'"
        with self.lock:
            return self.db.select(sql)

    def job(self, job_id: int):
        with self.lock:
            rows = self.db.select(
                "SELECT * FROM pd_schedule WHERE id = ?", (job_id,))
        return rows[0] if rows else None

    # -- run history --------------------------------------------------------
    def add_run(self, job_id: int, status: str, run_tag: float,
                run_date: str | None = None, data: dict | None = None,
                **fields) -> int:
        cols = ["job_id", "status", "run_tag", "run_date", "added",
                "data_dump", *fields.keys()]
        vals = [job_id, status, float(run_tag), run_date or _now(),
                _now(), json.dumps(data or {}), *fields.values()]
        with self.lock:
            return self.db.insert("pd_run_history", cols, vals)

    def set_run(self, run_id: int, **fields) -> None:
        with self.lock:
            self.db.update("pd_run_history", fields, "id = ?", [run_id])

    def run(self, run_id: int):
        with self.lock:
            rows = self.db.select(
                "SELECT * FROM pd_run_history WHERE id = ?", (run_id,))
        return rows[0] if rows else None

    def runs(self, job_id: int | None = None, status: str | None = None):
        sql, params = "SELECT * FROM pd_run_history WHERE 1=1", []
        if job_id is not None:
            sql += " AND job_id = ?"
            params.append(job_id)
        if status is not None:
            sql += " AND status = ?"
            params.append(status)
        with self.lock:
            return self.db.select(sql, params)

    def running_count(self, job_id: int) -> int:
        with self.lock:
            rows = self.db.select(
                "SELECT COUNT(*) AS n FROM pd_run_history "
                "WHERE job_id = ? AND status IN ('Q','S','R')",
                (job_id,))
        return int(rows[0]["n"])

    # -- task/step metrics (populated from Pipeline.summary()) --------------
    def record_pipeline(self, run_id: int, pipeline) -> None:
        summary = pipeline.summary()
        with self.lock:
            self.db.insert(
                "pd_task_history",
                ["run_id", "task_name", "status", "start_date",
                 "end_date", "records_read", "records_written",
                 "records_error"],
                [run_id, summary["name"], summary["status"], _now(),
                 _now(), pipeline.records_read,
                 pipeline.records_written, pipeline.records_error])
            for step in summary["steps"]:
                self.db.insert(
                    "pd_step_history",
                    ["run_id", "step_name", "step_type", "status",
                     "records_read", "records_written",
                     "records_error", "result_value", "seconds"],
                    [run_id, step["step"],
                     step["step"].split(":")[1][:3].strip("]"),
                     step["status"], step["records_read"],
                     step["records_written"], step["records_error"],
                     step["result_value"], step["seconds"]])
