"""Audit-log population: pd_query_log from Select/SQL, pd_file_log from
FileManager, pd_task/step_history from Pipeline metrics."""

from pydin_spark import CSV, FileManager, Parquet, Pipeline, Select, SQL, Table
from pydin_spark.audit import AuditLog
from pydin_spark.scheduler import History


def test_query_log_records_select_and_sql(spark, views, tmp_path):
    audit = AuditLog(History(), run_id=7)
    Pipeline(Select(text="SELECT r_regionkey FROM region"),
             Parquet(file_name="out.parquet", path=str(tmp_path)),
             spark=spark, audit=audit).run()
    Pipeline(SQL(text="SELECT COUNT(*) AS n FROM nation"),
             spark=spark, audit=audit).run()
    rows = audit.queries()
    assert len(rows) == 2
    assert all(r["status"] == "D" and r["run_id"] == 7 for r in rows)
    assert "region" in rows[0]["query_text"]
    assert rows[1]["records"] == 1


def test_query_log_records_errors(spark, views, tmp_path):
    audit = AuditLog(History())
    try:
        Pipeline(SQL(text="SELECT * FROM missing_table"),
                 spark=spark, audit=audit).run()
    except Exception:
        pass
    rows = audit.queries()
    assert rows and rows[0]["status"] == "E"
    assert "missing_table" in rows[0]["error_text"]


def test_file_log_records_transfers(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("abc")
    audit = AuditLog(History(), run_id=3)
    fm = FileManager(path=str(src), mask=r"\.txt$", action="copy",
                     destination=str(tmp_path / "out"))
    p = Pipeline(fm, audit=audit)
    p.spark = True  # no Spark needed for EX file steps
    fm.pipeline = p
    fm.execute()
    rows = audit.files()
    assert len(rows) == 1
    assert rows[0]["action"] == "copy" and rows[0]["bytes"] == 3


def test_file_log_records_sink_writes(spark, views, tmp_path):
    audit = AuditLog(History(), run_id=9)
    Pipeline(Select(text="SELECT r_regionkey, r_name FROM region"),
             CSV(file_name="out.csv", path=str(tmp_path), single_file=True),
             spark=spark, audit=audit).run()
    rows = audit.files()
    assert len(rows) == 1
    assert rows[0]["action"] == "W" and rows[0]["status"] == "D"
    assert rows[0]["file_path"].endswith("out.csv")
    assert rows[0]["bytes"] and rows[0]["run_id"] == 9


def test_query_log_records_budget_load(spark, views, tmp_path):
    import functools
    import sqlite3

    db = str(tmp_path / "a.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE tgt (k INTEGER, name TEXT)")
    con.commit()
    con.close()
    audit = AuditLog(History(), run_id=4)
    Pipeline(Select(text="SELECT n_nationkey AS k, n_name AS name "
                         "FROM nation"),
             Table(table_name="tgt", paramstyle="qmark",
                   connection_factory=functools.partial(sqlite3.connect, db),
                   num_partitions=1),
             spark=spark, audit=audit, error_limit=1).run()
    rows = audit.queries()
    inserts = [r for r in rows if r["query_text"].startswith("INSERT")]
    assert inserts and inserts[0]["status"] == "D"
    assert inserts[0]["records"] == 25


def test_pipeline_metrics_into_history(spark, views, tmp_path):
    hist = History()
    p = Pipeline(Select(text="SELECT * FROM region"),
                 Parquet(file_name="r.parquet", path=str(tmp_path)),
                 spark=spark).run()
    hist.record_pipeline(run_id=11, pipeline=p)
    with hist.lock:
        tasks = hist.db.select("SELECT * FROM pd_task_history")
        steps = hist.db.select("SELECT * FROM pd_step_history")
    assert tasks[0]["records_written"] == 5
    assert steps[0]["status"] == "D" and steps[0]["records_read"] == 5


def test_query_log_records_action_time_failure(spark, views, tmp_path):
    """A Select whose ACTION fails must log 'E', not 'D' — lazy plans
    pass analysis, then die in the job (e.g. a corrupt sink path). The
    success row is written only when the step completes."""
    from pydin_spark import Mapper
    audit = AuditLog(History(), run_id=11)
    # division by zero inside an expression evaluated only at action time
    # passes analysis but fails the job under ANSI mode; use a UDF raise
    # to be mode-independent
    from pyspark.sql import functions as F
    import pyspark.sql.types as T

    @F.udf(T.LongType())
    def boom(x):
        raise RuntimeError("action-time failure")

    def explode(df):
        return df.withColumn("bad", boom(df.r_regionkey))

    try:
        Pipeline(Select(text="SELECT r_regionkey FROM region"),
                 Mapper(func=explode),
                 Parquet(file_name="nope.parquet", path=str(tmp_path)),
                 spark=spark, audit=audit).run()
        raised = False
    except Exception:
        raised = True
    assert raised
    rows = audit.queries()
    assert len(rows) == 1
    assert rows[0]["status"] == "E"
    assert "region" in rows[0]["query_text"]
    # and no phantom 'D' row exists for the failed action
    assert all(r["status"] != "D" for r in rows)
