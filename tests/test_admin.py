"""Driver API / CLI / REST surface tests (reference api.py, cli.py,
web.py parity)."""

import json

from pydin_spark.api import Driver
from pydin_spark.cli import main as cli_main
from pydin_spark.scheduler import History, Scheduler


def test_driver_job_lifecycle():
    d = Driver(Scheduler(History()))
    job_id = d.create_job("etl_daily", desc="daily load",
                          func=lambda run: None, hour="2", min="0")
    assert d.list_jobs()[0]["job_name"] == "etl_daily"
    d.disable_job(job_id)
    assert d.list_jobs(active_only=True) == []
    d.enable_job(job_id)
    run_id = d.run_job(job_id)
    assert d.get_run(run_id)["status"] == "D"
    d.delete_job(job_id)
    assert d.list_jobs(active_only=True) == []


def test_cli_verbs(tmp_path, capsys):
    db = str(tmp_path / "jobs.db")
    cli_main(["--db", db, "create-job", "j1", "--command", "true",
              "--hour", "3"])
    job = json.loads(capsys.readouterr().out)
    cli_main(["--db", db, "list-jobs"])
    jobs = json.loads(capsys.readouterr().out)
    assert jobs[0]["id"] == job["job_id"] and jobs[0]["hour"] == "3"
    cli_main(["--db", db, "run-job", str(job["job_id"])])
    run = json.loads(capsys.readouterr().out)
    assert run["status"] == "D"
    cli_main(["--db", db, "history", "--status", "D"])
    hist = json.loads(capsys.readouterr().out)
    assert len(hist) == 1


def test_rest_api_routes():
    import pytest
    try:
        from pydin_spark.web import create_app
        app = create_app(Driver(Scheduler(History())), token="t0k")
    except RuntimeError:
        pytest.skip("flask not installed")
    client = app.test_client()
    assert client.get("/api/jobs").status_code == 401
    auth = {"Authorization": "Bearer t0k"}
    r = client.post("/api/jobs", json={"job_name": "restjob",
                                       "command": "true"}, headers=auth)
    job_id = r.get_json()["job_id"]
    assert client.get("/api/jobs", headers=auth).get_json()[0][
        "job_name"] == "restjob"
    run_id = client.post(f"/api/jobs/{job_id}/run",
                         headers=auth).get_json()["run_id"]
    assert client.post(f"/api/runs/{run_id}/cancel",
                       headers=auth).get_json()["status"] in ("C", "Q", "D")
    assert client.get(f"/api/runs/{run_id}", headers=auth).status_code == 200
