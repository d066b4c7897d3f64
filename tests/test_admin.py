"""Driver API / CLI / REST surface tests (reference api.py, cli.py,
web.py parity). In-process tests run twice — sqlite3 AND embedded
Derby over JDBC (VERDICT r8 #3; the autouse fixture rebinds this
module's ``History``); subprocess-lifecycle tests import History
locally inside the test and stay on sqlite, since an embedded Derby
database admits one JVM — multi-process control planes point the same
JDBC backend at a server RDBMS URL instead."""

import json
import os
import sys

import pytest

from pydin_spark.api import Driver
from pydin_spark.cli import main as cli_main
from pydin_spark.scheduler import History, Scheduler


@pytest.fixture(autouse=True)
def _metadata_backend(history_backend, monkeypatch):
    if history_backend is not None:
        monkeypatch.setattr(sys.modules[__name__], "History",
                            history_backend)


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


def test_create_config_template(tmp_path):
    from pydin_spark.api import Driver
    d = Driver()
    path = str(tmp_path / "conf" / "sources.ini")
    created = d.create_config(path)
    assert created == path
    text = open(path).read()
    assert "[lake]" in text and "[file_server]" in text
    import pytest
    with pytest.raises(FileExistsError):
        d.create_config(path)
    # the written template loads cleanly into a registry
    from pydin_spark.sources import SourceRegistry, Server
    reg = SourceRegistry(ini_path=path)
    assert isinstance(reg.resolve("file_server"), Server)


def test_repo_sync_verbs(tmp_path):
    """create/push/pull_repo parity (reference api.py:517-611) against a
    local bare remote — no network."""
    import subprocess
    from pydin_spark.api import Driver, RepoError
    import pytest
    remote = str(tmp_path / "origin.git")
    subprocess.run(["git", "init", "--bare", remote], check=True,
                   capture_output=True)
    jobs = str(tmp_path / "jobs")
    d = Driver(jobs_dir=jobs)
    # guard: push/pull before create fail loudly
    with pytest.raises(RepoError, match="no git repo"):
        d.push_repo()
    d.create_repo(url=remote)
    with pytest.raises(RepoError, match="already exists"):
        d.create_repo()
    # job-scoped push stages only that job's folder
    (tmp_path / "jobs" / "7").mkdir(parents=True)
    (tmp_path / "jobs" / "7" / "script.py").write_text("print('hi')\n")
    (tmp_path / "jobs" / "stray.txt").write_text("not staged\n")
    msg = d.push_repo(job_id=7, message="job 7 script")
    assert msg == "job 7 script"
    log = subprocess.run(["git", "-C", remote, "log", "--name-only",
                          "--pretty=%s"], capture_output=True, text=True)
    assert "job 7 script" in log.stdout
    assert "7/script.py" in log.stdout
    assert "stray.txt" not in log.stdout
    # nothing staged → no commit
    assert d.push_repo(job_id=7) is None
    # pull works against the remote
    d.push_repo(message="rest")          # stage the stray file too
    assert d.pull_repo() is not None


def test_console_dispatches_verbs(tmp_path):
    from pydin_spark.cli import console
    lines = iter(["list-jobs", "definitely-not-a-verb", "exit"])
    outputs = []
    rc = console(str(tmp_path / "c.db"), input_fn=lambda _: next(lines),
                 echo=outputs.append)
    assert rc == 0
    assert any("error" in str(o) for o in outputs)


def test_rest_test_help_deactivate_sync(tmp_path):
    """Reference web.py route parity: /api/test, /api/help,
    deactivate-run, sync-repo."""
    import subprocess
    import pytest
    flask = pytest.importorskip("flask")  # noqa: F841
    from pydin_spark.api import Driver
    from pydin_spark.web import create_app
    import time as _t
    d = Driver(jobs_dir=str(tmp_path / "jobs"))
    app = create_app(d, token="t0k")
    client = app.test_client()
    hdr = {"Authorization": "Bearer t0k"}
    assert client.get("/api/test").status_code == 401   # auth gates all
    assert client.get("/api/test", headers=hdr).get_json() == {"ok": True}
    routes = client.get("/api/help", headers=hdr).get_json()
    assert any("/api/repo/sync" in r for r in routes)
    # deactivate a failed run -> excluded from rerun scans
    job = d.create_job("f", func=lambda run: 1 / 0, rerun_limit=3,
                       rerun_interval=1)
    run_id = d.run_job(job, wait=True)
    r = client.post(f"/api/runs/{run_id}/deactivate", headers=hdr)
    assert r.get_json()["deactivated"] == "Y"
    assert d.scheduler.rerun_scan(now=_t.time() + 10) == 0
    # repo sync over a local bare remote
    remote = str(tmp_path / "o.git")
    subprocess.run(["git", "init", "--bare", remote], check=True,
                   capture_output=True)
    d.create_repo(url=remote)
    (tmp_path / "jobs" / "x.py").write_text("pass\n")
    r = client.post("/api/repo/sync", headers=hdr,
                    json={"message": "sync it"})
    assert r.get_json()["pushed"] == "sync it"


def test_create_job_scaffold_refuses_overwrite(tmp_path):
    """Reference parity (api.py:195-215): create_job(scaffold=True)
    writes jobs/<id>/{job.py,script.py} and FAILS LOUDLY when the job
    folder already exists instead of silently reusing files."""
    import pytest

    from pydin_spark.api import Driver
    from pydin_spark.scheduler import History, Scheduler

    d = Driver(Scheduler(History()), jobs_dir=str(tmp_path / "jobs"))
    job_id = d.create_job("scaffolded", desc="demo", scaffold=True)
    folder = tmp_path / "jobs" / str(job_id)
    assert (folder / "job.py").exists() and (folder / "script.py").exists()
    # occupy the NEXT id's folder up front: the scaffold must refuse
    (tmp_path / "jobs" / str(job_id + 1)).mkdir()
    with pytest.raises(FileExistsError):
        d.create_job("collides", scaffold=True)


def test_create_job_scaffold_script_executes(tmp_path):
    from pydin_spark.api import Driver
    from pydin_spark.scheduler import History, Scheduler
    from pydin_spark.scheduler.job import script_job

    d = Driver(Scheduler(History()), jobs_dir=str(tmp_path / "jobs"))
    job_id = d.create_job("runnable", scaffold=True)
    script = str(tmp_path / "jobs" / str(job_id) / "script.py")
    # run the scaffolded script under the tracked-run machinery
    runner_id = d.scheduler.register("exec-scaffold",
                                     func=script_job(script))
    run_id = d.scheduler.run_job_now(runner_id, wait=True)
    assert d.history.run(run_id)["status"] == "D"
    # and directly, to read the exposed result
    from pydin_spark.scheduler.job import run_script
    ctx = run_script(script, run={"id": 42})
    assert ctx.result == "hello from run 42"


def test_delete_job_hard_removes_row_folder_and_pushes(tmp_path):
    """Reference hard-delete semantics (api.py:321-336): schedule row
    gone, jobs/<id>/ folder gone, removal committed when the jobs dir
    is a repo; run history survives."""
    from pydin_spark.api import Driver
    from pydin_spark.scheduler import History, Scheduler

    d = Driver(Scheduler(History()), jobs_dir=str(tmp_path / "jobs"))
    d.create_repo()
    job_id = d.create_job("doomed", scaffold=True)
    d.push_repo(job_id=job_id, message="add job")
    run_id = d.scheduler.run_job_now(job_id, wait=True)
    folder = tmp_path / "jobs" / str(job_id)
    assert folder.exists()

    d.delete_job(job_id, hard=True)
    assert d.history.job(job_id) is None
    assert not folder.exists()
    assert d.history.run(run_id) is not None  # audit trail kept
    # the removal is committed in the jobs repo
    import subprocess
    log = subprocess.run(["git", "-C", str(tmp_path / "jobs"), "log",
                          "--oneline"], capture_output=True, text=True)
    assert f"delete job {job_id}" in log.stdout

    # soft path still deactivates
    other = d.create_job("kept")
    d.delete_job(other)
    assert d.history.job(other)["status"] == "N"


def test_scheduler_daemon_lifecycle(tmp_path):
    """Process-level scheduler parity (reference api.py:34-152):
    create_scheduler scaffolds scheduler.py, launch starts it as its
    own process (pid in pd_components), a db-registered command job
    FIRES inside the daemon, report sees it alive, stop tears it
    down and clears the component row."""
    import time

    from pydin_spark.api import Driver
    from pydin_spark.scheduler import History, Scheduler

    db = str(tmp_path / "pydin.db")
    d = Driver(Scheduler(History(db)), jobs_dir=str(tmp_path / "jobs"))
    script = d.create_scheduler(path=str(tmp_path))
    assert script.endswith("scheduler.py")
    import pytest
    with pytest.raises(FileExistsError):
        d.create_scheduler(path=str(tmp_path))

    marker = tmp_path / "fired.marker"
    d.create_job("toucher", command=f"touch {marker}", sec="*")
    pid = d.launch_scheduler(path=str(tmp_path))
    try:
        assert pid is not None
        assert d.report_scheduler() == pid
        deadline = time.time() + 15
        while not marker.exists() and time.time() < deadline:
            time.sleep(0.2)
        assert marker.exists(), "db-registered job never fired in daemon"
    finally:
        d.stop_scheduler_process(path=str(tmp_path))
    deadline = time.time() + 5
    while d.report_scheduler() is not None and time.time() < deadline:
        time.sleep(0.1)
    assert d.report_scheduler() is None
    row = History(db).component("SCHEDULER")
    assert row["status"] == "N" and row["pid"] is None


def test_cli_scheduler_lifecycle_verbs(tmp_path, capsys):
    """CLI parity for the process-level scheduler verbs."""
    import json as _json
    import time

    from pydin_spark.cli import main as cli_main

    db = str(tmp_path / "s.db")
    cli_main(["--db", db, "create-scheduler", "--path", str(tmp_path)])
    created = _json.loads(capsys.readouterr().out)
    assert created["created"].endswith("scheduler.py")
    cli_main(["--db", db, "report-scheduler"])
    assert _json.loads(capsys.readouterr().out) == {"running": False,
                                                    "pid": None}
    cli_main(["--db", db, "launch-scheduler", "--path", str(tmp_path)])
    pid = _json.loads(capsys.readouterr().out)["pid"]
    try:
        assert pid
        cli_main(["--db", db, "report-scheduler"])
        assert _json.loads(capsys.readouterr().out)["pid"] == pid
        cli_main(["--db", db, "restart-scheduler", "--path",
                  str(tmp_path)])
        pid2 = _json.loads(capsys.readouterr().out)["pid"]
        assert pid2 and pid2 != pid
        pid = pid2
    finally:
        cli_main(["--db", db, "stop-scheduler", "--path", str(tmp_path)])
        capsys.readouterr()
    deadline = time.time() + 5
    from pydin_spark.api import Driver
    while Driver().report_scheduler(db=db) and time.time() < deadline:
        time.sleep(0.1)
    cli_main(["--db", db, "report-scheduler"])
    assert _json.loads(capsys.readouterr().out)["running"] is False


def test_cli_bulk_edit_install_verbs(tmp_path, capsys, monkeypatch):
    """run-jobs / cancel-job / edit-script / install CLI parity."""
    import json as _json
    import os
    import stat

    from pydin_spark.cli import main as cli_main

    db = str(tmp_path / "b.db")
    monkeypatch.chdir(tmp_path)
    # install: config + scheduler + db in one step; idempotent report
    cli_main(["--db", db, "install", "--path", str(tmp_path)])
    rep = _json.loads(capsys.readouterr().out)
    assert rep["config"].endswith("sources.ini")
    assert rep["scheduler"].endswith("scheduler.py")
    cli_main(["--db", db, "install", "--path", str(tmp_path)])
    rep2 = _json.loads(capsys.readouterr().out)
    assert rep2["config"] == "exists" and rep2["scheduler"] == "exists"

    # bulk run from a run.list file
    for name in ("a", "b"):
        cli_main(["--db", db, "create-job", name, "--command", "true"])
        capsys.readouterr()
    (tmp_path / "run.list").write_text("1\n2\n")
    cli_main(["--db", db, "run-jobs", "--path",
              str(tmp_path / "run.list"), "--clean"])
    runs = _json.loads(capsys.readouterr().out)
    assert [r["status"] for r in runs] == ["D", "D"]
    assert (tmp_path / "run.list").read_text() == ""

    # cancel-job / cancel-jobs (nothing running -> 0, shape check)
    cli_main(["--db", db, "cancel-job", "1"])
    assert _json.loads(capsys.readouterr().out) == {"canceled": 0}
    cli_main(["--db", db, "cancel-jobs"])
    assert _json.loads(capsys.readouterr().out) == {"canceled": 0}

    # edit-script launches $EDITOR on the scaffolded script
    jobs = tmp_path / "jobs" / "9"
    jobs.mkdir(parents=True)
    (jobs / "script.py").write_text("# body\n")
    editor = tmp_path / "fake_editor.sh"
    editor.write_text("#!/bin/sh\necho '# edited' >> \"$1\"\n")
    editor.chmod(editor.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("EDITOR", str(editor))
    cli_main(["--db", db, "edit-script", "9", "--jobs-dir",
              str(tmp_path / "jobs")])
    assert "# edited" in (jobs / "script.py").read_text()
    # missing script -> error exit
    assert cli_main(["--db", db, "edit-script", "404", "--jobs-dir",
                     str(tmp_path / "jobs")]) == 1


def test_cli_deactivate_run(tmp_path, capsys):
    import json as _json

    from pydin_spark.cli import main as cli_main

    db = str(tmp_path / "d.db")
    cli_main(["--db", db, "create-job", "f", "--command", "false"])
    job = _json.loads(capsys.readouterr().out)
    cli_main(["--db", db, "run-job", str(job["job_id"])])
    run = _json.loads(capsys.readouterr().out)
    assert run["status"] == "E"
    cli_main(["--db", db, "deactivate-run", str(run["id"])])
    out = _json.loads(capsys.readouterr().out)
    assert out["deactivated"] == "Y"


def test_web_server_process_lifecycle(tmp_path):
    """REST API as its own process (reference web.py:60-127): launch
    records the RESTAPI component row, the server answers over HTTP
    with token auth, double-launch refuses, stop signals the pid and
    clears the row."""
    import json as _json
    import time
    import urllib.request

    import pytest
    pytest.importorskip("flask")

    from pydin_spark.api import Driver
    from pydin_spark.scheduler import History, Scheduler

    db = str(tmp_path / "w.db")
    d = Driver(Scheduler(History(db)))
    port = 5000 + (os.getpid() % 1000)
    pid = d.launch_web(port=port, token="t0k", db=db)
    try:
        assert pid is not None
        assert d.report_web(db=db) == pid
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/test",
            headers={"Authorization": "Bearer t0k"})
        deadline = time.time() + 10
        body = None
        while time.time() < deadline:
            try:
                body = _json.loads(urllib.request.urlopen(
                    req, timeout=2).read())
                break
            except Exception:
                time.sleep(0.2)
        assert body == {"ok": True}
        # a second launch must refuse while the first is alive
        assert d.launch_web(port=port + 1, db=db) is None
    finally:
        d.stop_web_process(db=db)
    deadline = time.time() + 5
    while d.report_web(db=db) is not None and time.time() < deadline:
        time.sleep(0.1)
    assert d.report_web(db=db) is None
    row = History(db).component("RESTAPI")
    assert row["status"] == "N" and row["pid"] is None


def test_console_menu_guided_dialogue():
    """Reference Manager parity (pydin/cli.py:22-662): the guided
    numbered-menu dialogue — create a job field-by-field, run it,
    disable, edit the schedule, refuse a mistyped delete, delete on
    name confirmation — all through scripted input."""
    from pydin_spark.cli import menu

    d = Driver(Scheduler(History()))
    lines = []
    feed = iter([
        "n", "greet",                 # new job + name
        "", "echo hi",                # desc (skip), command
        "", "", "", "*", "",          # mday hour min sec wday
        "1",                          # pick job 1
        "1",                          # run now
        "4",                          # history
        "3",                          # disable
        "5", "", "2", "0", "", "",    # edit: hour=2 min=0
        "6", "nope",                  # delete refused (name mismatch)
        "6", "greet",                 # delete confirmed
        "q",                          # leave jobs list
    ])
    menu(d, input_fn=lambda prompt="": next(feed),
         echo=lines.append)
    out = "\n".join(str(x) for x in lines)
    assert "created job #" in out
    assert "run #" in out and "[D]" in out or "status" in out
    assert "disabled" in out
    assert "updated ['hour', 'min']" in out
    assert "(name mismatch — not deleted)" in out
    assert "deleted" in out
    assert d.list_jobs() == []
