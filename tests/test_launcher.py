"""Process-per-job launcher: a scheduler job runs its pipeline config in
an isolated subprocess driver and the exit status maps to run state
(reference core.py:1051-1095 to_process execution)."""

import json
import sys

from pydin_spark.launcher import pipeline_command, register_pipeline_job
from pydin_spark.scheduler import History, Scheduler


def test_pipeline_command_shapes(tmp_path):
    cmd = pipeline_command("cfg.json", views="/data/sf", date="2024-01-02",
                           lake="/lake", db="meta.db")
    assert cmd[:3] == [sys.executable, "-m", "pydin_spark.cli"]
    assert "--db" in cmd and "run-pipeline" in cmd and "--lake" in cmd
    sub = pipeline_command("cfg.json", spark_submit="spark-submit",
                           master="yarn")
    assert sub[0] == "spark-submit" and sub[1:3] == ["--master", "yarn"]
    assert sub[3].endswith("_submit_shim.py")


def test_subprocess_job_records_done(tmp_path, sf_dir):
    cfg = tmp_path / "pipe.json"
    cfg.write_text(json.dumps([
        {"node_type": "Select", "text": "SELECT * FROM region"},
        {"node_type": "Mapper", "rename": {"r_name": "region_name"}},
        {"node_type": "Table", "source_name": "lake",
         "schema_name": "mart", "table_name": "regions"},
    ]))
    s = Scheduler(History())
    job_id = register_pipeline_job(
        s, "etl-subprocess", str(cfg), views=sf_dir,
        lake=str(tmp_path / "lake"), timeout=240)
    run_id = s.run_job_now(job_id, wait=True)
    run = s.history.run(run_id)
    assert run["status"] == "D", run["error_list"]
    # the subprocess driver actually wrote the sink
    out = tmp_path / "lake" / "mart" / "regions"
    assert out.exists()


def test_subprocess_job_records_error(tmp_path, sf_dir):
    cfg = tmp_path / "bad.json"
    cfg.write_text(json.dumps([
        {"node_type": "Select", "text": "SELECT * FROM no_such_table"},
        {"node_type": "Parquet", "file_name": "x.parquet",
         "path": str(tmp_path)},
    ]))
    s = Scheduler(History())
    job_id = register_pipeline_job(s, "etl-broken", str(cfg),
                                   views=sf_dir, timeout=240)
    run_id = s.run_job_now(job_id, wait=True)
    run = s.history.run(run_id)
    assert run["status"] == "E"
    assert "no_such_table" in (run["error_list"] or "")


def test_subprocess_job_timeout(tmp_path):
    s = Scheduler(History())
    job_id = s.register("sleeper", command=[sys.executable, "-c",
                                            "import time; time.sleep(60)"],
                        timeout=2)
    run_id = s.run_job_now(job_id, wait=True)
    assert s.history.run(run_id)["status"] == "T"
