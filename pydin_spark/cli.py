"""Manager CLI: admin verbs over the Driver API.

Parity target: reference ``pydin/cli.py:22-662`` (help / create job /
list jobs / enable / disable / run job / cancel run / history). Built on
argparse instead of an interactive console loop; every verb maps to one
Driver call so the surface stays scriptable.

Usage:  python -m pydin_spark.cli --db jobs.db <verb> [args]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

from .api import Driver
from .scheduler import History, Scheduler


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="pydin-spark",
                                     description=__doc__)
    parser.add_argument("--db", default="pydin_spark.db",
                        help="metadata sqlite path")
    sub = parser.add_subparsers(dest="verb", required=True)

    create = sub.add_parser("create-job", help="create a schedule entry")
    create.add_argument("name")
    create.add_argument("--desc")
    create.add_argument("--command", help="shell command the job runs")
    for field in ("mday", "hour", "min", "sec", "wday", "yday"):
        create.add_argument(f"--{field}")
    create.add_argument("--timeout", type=int)
    create.add_argument("--parallelism", default="N")

    sub.add_parser("list-jobs", help="list schedule entries")

    for verb in ("enable-job", "disable-job", "delete-job", "run-job"):
        p = sub.add_parser(verb)
        p.add_argument("job_id", type=int)

    cancel = sub.add_parser("cancel-run")
    cancel.add_argument("run_id", type=int)

    deact = sub.add_parser("deactivate-run", help="exclude a failed "
                           "run from rerun scans")
    deact.add_argument("run_id", type=int)

    cj = sub.add_parser("cancel-job",
                        help="cancel all pending/running runs of a job")
    cj.add_argument("job_id", type=int)
    sub.add_parser("cancel-jobs",
                   help="cancel every pending/running run")

    rj = sub.add_parser("run-jobs", help="run the job ids listed in a "
                        "file, one per line (reference run.list)")
    rj.add_argument("--path", default="run.list")
    rj.add_argument("--clean", action="store_true",
                    help="truncate the list file afterwards")

    es = sub.add_parser("edit-script", help="open jobs/<id>/script.py "
                        "in $EDITOR")
    es.add_argument("job_id", type=int)
    es.add_argument("--jobs-dir", default="jobs")
    ec = sub.add_parser("edit-config", help="open the sources INI in "
                        "$EDITOR")
    ec.add_argument("--path")

    inst = sub.add_parser("install", help="deploy config + scheduler "
                          "+ metadata DB in one step")
    inst.add_argument("--path", help="deploy root (default: cwd)")

    hist = sub.add_parser("history", help="list run history")
    hist.add_argument("--job-id", type=int)
    hist.add_argument("--status")

    runp = sub.add_parser("run-pipeline",
                          help="run a declarative pipeline from JSON")
    runp.add_argument("config", help="JSON file: list of node dicts")
    runp.add_argument("--views", help="parquet dir to register as views")
    runp.add_argument("--date", help="business date YYYY-MM-DD")
    runp.add_argument("--lake", help="base dir for a 'lake' filesystem source")

    sub.add_parser("start-scheduler", help="run the scheduler loop")

    for verb in ("create-scheduler", "launch-scheduler",
                 "stop-scheduler", "restart-scheduler",
                 "report-scheduler"):
        p = sub.add_parser(
            verb, help=f"{verb.replace('-', ' ')} (process-level "
            "lifecycle: scheduler.py + pd_components pid)")
        if verb != "report-scheduler":
            p.add_argument("--path", help="deploy root (scheduler.py "
                           "location)")

    cfg = sub.add_parser("create-config",
                         help="write a template sources INI")
    cfg.add_argument("--path")

    for verb in ("create-repo", "push-repo", "pull-repo"):
        p = sub.add_parser(verb, help=f"{verb.replace('-', ' ')} "
                           "(job-scripts folder sync)")
        p.add_argument("--jobs-dir", default="jobs")
        if verb == "create-repo":
            p.add_argument("--url")
        if verb == "push-repo":
            p.add_argument("--job-id", type=int)
            p.add_argument("--message")

    sub.add_parser("console", help="interactive console (reference "
                   "Manager shell): type verbs as you would on the "
                   "command line; 'exit' quits")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    driver = Driver(Scheduler(History(args.db)))
    out: object = None
    if args.verb == "create-job":
        fields = {f: getattr(args, f) for f in
                  ("mday", "hour", "min", "sec", "wday", "yday",
                   "timeout", "parallelism")
                  if getattr(args, f) is not None}
        out = {"job_id": driver.create_job(args.name, desc=args.desc,
                                           command=args.command, **fields)}
    elif args.verb == "list-jobs":
        out = driver.list_jobs()
    elif args.verb == "enable-job":
        driver.enable_job(args.job_id)
        out = {"status": "Y"}
    elif args.verb == "disable-job":
        driver.disable_job(args.job_id)
        out = {"status": "N"}
    elif args.verb == "delete-job":
        driver.delete_job(args.job_id)
        out = {"deleted": args.job_id}
    elif args.verb == "run-job":
        run_id = driver.run_job(args.job_id, wait=True)
        out = driver.get_run(run_id)
    elif args.verb == "cancel-run":
        driver.cancel_run(args.run_id)
        out = driver.get_run(args.run_id)
    elif args.verb == "deactivate-run":
        driver.deactivate_run(args.run_id)
        out = driver.get_run(args.run_id)
    elif args.verb == "cancel-job":
        out = {"canceled": driver.cancel_job(args.job_id)}
    elif args.verb == "cancel-jobs":
        out = {"canceled": driver.cancel_jobs()}
    elif args.verb == "run-jobs":
        # reference cli.py:345-359: a run.list file of job ids
        results = []
        path = os.path.abspath(args.path)
        for line in open(path):
            line = line.split()
            if line:
                run_id = driver.run_job(int(line[0]), wait=True)
                results.append(driver.get_run(run_id))
        if args.clean:
            open(path, "w").close()
        out = results
    elif args.verb == "edit-script":
        # reference cli.py:212-224: launch the editor on the job script
        path = os.path.join(args.jobs_dir, str(args.job_id), "script.py")
        if not os.path.exists(path):
            print(f"file {path} does not exist", file=sys.stderr)
            return 1
        subprocess.run([os.environ.get("EDITOR", "vi"), path])
        out = {"edited": path}
    elif args.verb == "edit-config":
        from .sources import SourceRegistry
        path = os.path.expanduser(args.path or SourceRegistry.DEFAULT_INI)
        if not os.path.exists(path):
            print(f"file {path} does not exist", file=sys.stderr)
            return 1
        subprocess.run([os.environ.get("EDITOR", "vi"), path])
        out = {"edited": path}
    elif args.verb == "install":
        # reference cli.py:131-146 wizard, non-interactive: config +
        # scheduler scaffold + metadata DB in one step (each part
        # skipped with a note when it already exists)
        root = os.path.abspath(args.path or os.getcwd())
        report = {}
        try:
            report["config"] = driver.create_config(
                os.path.join(root, "sources.ini"))
        except FileExistsError:
            report["config"] = "exists"
        try:
            driver.jobs_dir = os.path.join(root, "jobs")
            report["scheduler"] = driver.create_scheduler(root)
        except FileExistsError:
            report["scheduler"] = "exists"
        report["db"] = args.db
        out = report
    elif args.verb == "history":
        out = driver.list_runs(job_id=args.job_id, status=args.status)
    elif args.verb == "run-pipeline":
        import datetime as dt

        from . import get_session, register_tables
        from .calendar import Day
        from .config import pipeline_from_config
        from .sources import Filesystem, SourceRegistry

        nodes = json.load(open(args.config))
        spark = get_session("cli-pipeline")
        if args.views:
            register_tables(spark, args.views)
        registry = None
        if args.lake:
            registry = SourceRegistry(autoload=False)
            registry.register(Filesystem("lake", args.lake))
        date = Day(dt.datetime.fromisoformat(args.date)) if args.date else None
        pipeline = pipeline_from_config(nodes, spark=spark,
                                        registry=registry, date=date)
        pipeline.run()
        out = pipeline.summary()
    elif args.verb == "start-scheduler":
        driver.start_scheduler()
        print("scheduler running; Ctrl-C to stop", file=sys.stderr)
        try:
            import time
            while True:
                time.sleep(1)
        except KeyboardInterrupt:
            driver.stop_scheduler()
            out = {"stopped": True}
    elif args.verb == "create-scheduler":
        out = {"created": driver.create_scheduler(args.path)}
    elif args.verb == "launch-scheduler":
        out = {"pid": driver.launch_scheduler(args.path, db=args.db)}
    elif args.verb == "stop-scheduler":
        driver.stop_scheduler_process(args.path, db=args.db)
        out = {"stopped": True}
    elif args.verb == "restart-scheduler":
        out = {"pid": driver.restart_scheduler(args.path, db=args.db)}
    elif args.verb == "report-scheduler":
        pid = driver.report_scheduler(db=args.db)
        out = {"running": pid is not None, "pid": pid}
    elif args.verb == "create-config":
        out = {"created": driver.create_config(args.path)}
    elif args.verb == "create-repo":
        driver.jobs_dir = args.jobs_dir
        out = {"repo": driver.create_repo(args.url)}
    elif args.verb == "push-repo":
        driver.jobs_dir = args.jobs_dir
        out = {"pushed": driver.push_repo(args.job_id, args.message)}
    elif args.verb == "pull-repo":
        driver.jobs_dir = args.jobs_dir
        out = {"pulled": driver.pull_repo()}
    elif args.verb == "console":
        return console(args.db)
    print(json.dumps(out, indent=2, default=str))
    return 0


def _prompt_fields(input_fn, echo, fields: tuple) -> dict:
    """Guided field prompts: empty input keeps the default/skips."""
    out = {}
    for name, label in fields:
        raw = input_fn(f"  {label} [skip]: ").strip()
        if raw:
            out[name] = raw
    return out


def menu(driver, input_fn=input, echo=print) -> int:
    """Guided numbered-menu dialogue over the Driver API — the
    reference Manager's interactive flow (``pydin/cli.py:22-662``):
    jobs listed with numbers, a picked job offers numbered actions
    (run / enable / disable / history / edit schedule / delete), and
    job creation walks field-by-field with skippable prompts. The
    same Driver methods back the argv console and the REST API, so
    every surface stays in lockstep."""
    while True:
        jobs = driver.list_jobs()
        echo("— jobs —")
        for i, j in enumerate(jobs, 1):
            echo(f"{i:3d}. [{j.get('status') or '-'}] "
                 f"#{j['id']} {j.get('job_name')} "
                 f"(mday={j.get('mday') or '*'} hour={j.get('hour') or '*'}"
                 f" min={j.get('min') or '*'} sec={j.get('sec') or '*'})")
        echo("  n. new job    q. back")
        try:
            choice = input_fn("menu> ").strip().lower()
        except (EOFError, KeyboardInterrupt):
            return 0
        if choice in ("q", "quit", "exit", ""):
            return 0
        if choice == "n":
            name = input_fn("  job name: ").strip()
            if not name:
                echo("(cancelled: a job needs a name)")
                continue
            fields = _prompt_fields(input_fn, echo, (
                ("desc", "description"), ("command", "shell command"),
                ("mday", "month day"), ("hour", "hour"),
                ("min", "minute"), ("sec", "second"),
                ("wday", "week day")))
            jid = driver.create_job(name, **fields)
            echo(f"created job #{jid}")
            continue
        if not choice.isdigit() or not 1 <= int(choice) <= len(jobs):
            echo("(pick a listed number, 'n' or 'q')")
            continue
        job = jobs[int(choice) - 1]
        jid = job["id"]
        while True:
            echo(f"— job #{jid} {job.get('job_name')} —")
            for line in ("  1. run now", "  2. enable", "  3. disable",
                         "  4. history", "  5. edit schedule",
                         "  6. delete", "  q. back"):
                echo(line)
            act = input_fn(f"job {jid}> ").strip().lower()
            if act in ("q", ""):
                break
            if act == "1":
                rid = driver.run_job(jid)
                run = driver.get_run(rid) or {}
                echo(f"run #{rid}: {run.get('status')}")
            elif act == "2":
                driver.enable_job(jid)
                echo("enabled")
            elif act == "3":
                driver.disable_job(jid)
                echo("disabled")
            elif act == "4":
                for r in driver.list_runs(job_id=jid)[-10:]:
                    echo(f"  run #{r['id']} [{r.get('status')}] "
                         f"added={r.get('added')} "
                         f"start={r.get('start_date')} "
                         f"end={r.get('end_date')}")
            elif act == "5":
                fields = _prompt_fields(input_fn, echo, (
                    ("mday", "month day"), ("hour", "hour"),
                    ("min", "minute"), ("sec", "second"),
                    ("wday", "week day")))
                if fields:
                    driver.configure_job(jid, **fields)
                    echo(f"updated {sorted(fields)}")
            elif act == "6":
                confirm = input_fn(
                    f"  delete job #{jid}? type its name to "
                    "confirm: ").strip()
                if confirm == job.get("job_name"):
                    driver.delete_job(jid, hard=True)
                    echo("deleted")
                    break
                echo("(name mismatch — not deleted)")
            else:
                echo("(pick 1-6 or q)")


def console(db: str, input_fn=input, echo=print) -> int:
    """Interactive console: the reference Manager's shell loop
    (``pydin/cli.py:22-662``) over the same verbs as the CLI — each line
    is parsed exactly like an argv, so scripts and the console share one
    surface. ``menu`` enters the guided numbered-menu dialogue
    (reference Manager parity); ``exit``/``quit``/EOF leaves."""
    import shlex
    echo("pydin-spark console — type a verb (e.g. 'list-jobs'), "
         "'menu' for the guided dialogue, 'help' for the list, "
         "'exit' to quit")
    while True:
        try:
            line = input_fn("pydin> ").strip()
        except (EOFError, KeyboardInterrupt):
            echo("")
            return 0
        if not line:
            continue
        if line in ("exit", "quit"):
            return 0
        if line == "help":
            build_parser().print_help()
            continue
        if line == "menu":
            from .api import Driver
            from .scheduler import History, Scheduler
            menu(Driver(Scheduler(History(db))), input_fn, echo)
            continue
        try:
            main(["--db", db, *shlex.split(line)])
        except BrokenPipeError:     # stdout closed (e.g. piped to head)
            return 0
        except SystemExit as exc:   # argparse error for a bad verb
            if exc.code not in (0, None):
                echo("(error: invalid input — try 'help')")
        except Exception as exc:  # noqa: BLE001 - console survives errors
            echo(f"(error: {exc})")


if __name__ == "__main__":
    raise SystemExit(main())
