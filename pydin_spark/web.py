"""REST API over the Driver (reference ``pydin/web.py:35-322`` parity).

Token-authenticated JSON routes: scheduler start/stop, job CRUD,
run-job, cancel-run, history. Flask is imported lazily so the engine
works without it; ``create_app`` raises a clear error otherwise.
"""

from __future__ import annotations

import secrets

from .api import Driver


def create_app(driver: Driver | None = None, token: str | None = None):
    try:
        from flask import Flask, jsonify, request
    except ImportError as exc:  # pragma: no cover - env without flask
        raise RuntimeError("REST API requires flask") from exc

    driver = driver or Driver()
    token = token or secrets.token_hex(16)
    app = Flask("pydin_spark")
    app.config["API_TOKEN"] = token

    def authed():
        header = request.headers.get("Authorization", "")
        return header == f"Bearer {app.config['API_TOKEN']}"

    @app.before_request
    def gate():  # noqa: ANN202
        if not authed():
            return jsonify({"error": "unauthorized"}), 401

    @app.post("/api/scheduler/start")
    def start_scheduler():
        driver.start_scheduler()
        return jsonify({"running": True})

    @app.post("/api/scheduler/stop")
    def stop_scheduler():
        driver.stop_scheduler()
        return jsonify({"running": False})

    @app.get("/api/jobs")
    def list_jobs():
        return jsonify(driver.list_jobs())

    @app.post("/api/jobs")
    def create_job():
        body = request.get_json(force=True)
        name = body.pop("job_name")
        return jsonify({"job_id": driver.create_job(name, **body)})

    @app.post("/api/jobs/<int:job_id>/enable")
    def enable_job(job_id: int):
        driver.enable_job(job_id)
        return jsonify({"status": "Y"})

    @app.post("/api/jobs/<int:job_id>/disable")
    def disable_job(job_id: int):
        driver.disable_job(job_id)
        return jsonify({"status": "N"})

    @app.post("/api/jobs/<int:job_id>/run")
    def run_job(job_id: int):
        run_id = driver.run_job(job_id, wait=False)
        return jsonify({"run_id": run_id})

    @app.post("/api/runs/<int:run_id>/cancel")
    def cancel_run(run_id: int):
        driver.cancel_run(run_id)
        return jsonify(driver.get_run(run_id))

    @app.get("/api/runs")
    def list_runs():
        job_id = request.args.get("job_id", type=int)
        status = request.args.get("status")
        return jsonify(driver.list_runs(job_id=job_id, status=status))

    @app.get("/api/runs/<int:run_id>")
    def get_run(run_id: int):
        run = driver.get_run(run_id)
        return (jsonify(run), 200) if run else (jsonify({}), 404)

    @app.post("/api/runs/<int:run_id>/deactivate")
    def deactivate_run(run_id: int):
        # reference /api/deactivate-run (web.py:293-308): exclude a
        # failed/waiting run from future rerun/wake-up scans
        driver.deactivate_run(run_id)
        return jsonify(driver.get_run(run_id))

    @app.get("/api/test")
    def ping():
        # reference /api/test (web.py:154-159): auth + liveness probe
        return jsonify({"ok": True})

    @app.get("/api/help")
    def help_routes():
        # reference /api/help (web.py:161-169): discoverable surface
        rules = sorted(
            f"{','.join(sorted(r.methods - {'HEAD', 'OPTIONS'}))} {r.rule}"
            for r in app.url_map.iter_rules() if r.rule.startswith("/api"))
        return jsonify(rules)

    @app.post("/api/repo/sync")
    def sync_repo():
        # reference /api/sync-repo (web.py:310-322): pull then push
        body = request.get_json(silent=True) or {}
        if body.get("jobs_dir"):
            driver.jobs_dir = body["jobs_dir"]
        driver.pull_repo()
        pushed = driver.push_repo(job_id=body.get("job_id"),
                                  message=body.get("message"))
        return jsonify({"pushed": pushed})

    return app


def main(argv: list[str] | None = None) -> int:
    """Run the REST API as its own process (reference web.py:60-127:
    the RESTAPI component row carries status/pid/url; ``stop`` signals
    the recorded pid).

    ``python -m pydin_spark.web --db pydin.db [--host H] [--port P]
    [--token T]``  /  ``... stop``
    """
    import argparse
    import datetime as dt
    import os
    import signal
    import sys

    from .scheduler import History, Scheduler

    parser = argparse.ArgumentParser(prog="pydin-spark-web")
    parser.add_argument("action", nargs="?", default="start",
                        choices=["start", "stop"])
    parser.add_argument("--db", default="pydin_spark.db")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=5000)
    parser.add_argument("--token")
    args = parser.parse_args(argv)
    history = History(args.db)
    if args.action == "stop":
        row = history.component("RESTAPI") or {}
        if row.get("status") == "Y" and row.get("pid"):
            try:
                os.kill(int(row["pid"]), signal.SIGTERM)
            except ProcessLookupError:
                pass
            return 0
        print("server is not running", file=sys.stderr)
        return 1
    row = history.component("RESTAPI") or {}
    if row.get("status") == "Y" and row.get("pid"):
        try:
            os.kill(int(row["pid"]), 0)
            print(f"server already working on PID[{row['pid']}]",
                  file=sys.stderr)
            return 1
        except (ProcessLookupError, PermissionError):
            pass  # stale row after a crash — take over
    driver = Driver(Scheduler(history))
    app = create_app(driver, token=args.token)
    url = f"http://{args.host}:{args.port}"
    now = dt.datetime.now().isoformat(sep=" ", timespec="seconds")
    history.set_component("RESTAPI", status="Y", pid=os.getpid(),
                          url=url, start_date=now, stop_date=None)

    def _down(*_):
        history.set_component(
            "RESTAPI", status="N", pid=None,
            stop_date=dt.datetime.now().isoformat(sep=" ",
                                                  timespec="seconds"))
        os._exit(0)

    signal.signal(signal.SIGTERM, _down)
    signal.signal(signal.SIGINT, _down)
    try:
        app.run(host=args.host, port=args.port)
    finally:
        _down()
    return 0


if __name__ == "__main__":
    import sys as _sys
    _sys.exit(main())
