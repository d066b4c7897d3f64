"""Scheduler tests: cron matcher table, state machine, parallelism cap,
triggers, rerun scan, timeout — reference core.py semantics."""

import time

import pytest

from pydin_spark.scheduler import History, Scheduler, matches


@pytest.mark.parametrize("period,unit,expected", [
    (None, 5, True), ("*", 5, True),
    ("5", 5, True), ("5", 6, False),
    ("/15", 0, True), ("/15", 30, True), ("/15", 31, False),
    ("/0", 10, False),
    ("2-4", 3, True), ("2-4", 5, False), ("2-4", 2, True), ("2-4", 4, True),
    ("10+", 10, True), ("10+", 30, True), ("10+", 9, False),
    ("1,3,5", 3, True), ("1,3,5", 2, False),
    ("garbage", 5, False),
])
def test_cron_matcher_table(period, unit, expected):
    assert matches(period, unit) is expected


def test_manual_run_records_history():
    s = Scheduler(History())
    seen = []
    job_id = s.register("j1", func=lambda run: seen.append(run["id"]))
    run_id = s.run_job_now(job_id, wait=True)
    assert seen == [run_id]
    assert s.history.run(run_id)["status"] == "D"


def test_error_status_and_rerun_scan():
    s = Scheduler(History())
    calls = []

    def flaky(run):
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("boom")

    job_id = s.register("flaky", func=flaky, rerun_limit=2, rerun_interval=0)
    run_id = s.run_job_now(job_id, wait=True)
    assert s.history.run(run_id)["status"] == "E"
    assert "boom" in s.history.run(run_id)["error_list"]
    n = s.rerun_scan()
    assert n == 1
    s._execute(run_id)
    assert s.history.run(run_id)["status"] == "D"
    assert s.history.run(run_id)["rerun_times"] == 1


def test_timeout_status():
    s = Scheduler(History())
    job_id = s.register("slow", func=lambda run: time.sleep(5), timeout=0.2)
    run_id = s.run_job_now(job_id, wait=True)
    assert s.history.run(run_id)["status"] == "T"


def test_trigger_chain():
    s = Scheduler(History())
    order = []
    parent = s.register("parent", func=lambda run: order.append("p"))
    s.register("child", func=lambda run: order.append("c"),
               trigger_id=parent)
    run_id = s.run_job_now(parent, wait=True)
    # trigger enqueued to exec_queue; drain synchronously
    child_run = s.exec_queue.get_nowait()
    s._execute(child_run)
    assert order == ["p", "c"]
    assert s.history.run(child_run)["rerun_id"] == run_id


def test_trigger_inherits_parent_data():
    s = Scheduler(History())
    seen = {}
    parent = s.register("pd", func=lambda run: None)
    s.register("cd", func=lambda run: seen.update(
        __import__("json").loads(run["data_dump"] or "{}")),
        trigger_id=parent)
    run_id = s.history.add_run(parent, "Q", time.time(),
                               data={"handoff": "v1"})
    s._execute(run_id)
    child_run = s.exec_queue.get_nowait()
    s._execute(child_run)
    assert seen == {"handoff": "v1"}


def test_parallelism_cap_postpones():
    s = Scheduler(History())
    job_id = s.register("capped", func=lambda run: None, parallelism="N")
    # simulate one already running
    s.history.add_run(job_id, "R", time.time())
    s.entry_queue.put((job_id, time.time()))
    s.running = True
    import threading
    t = threading.Thread(target=s._charger, daemon=True)
    t.start()
    time.sleep(0.5)
    s.running = False
    t.join(timeout=2)
    statuses = sorted(r["status"] for r in s.history.runs(job_id=job_id))
    assert statuses == ["R", "W"]  # postponed as waiting


def test_tick_loop_fires_due_job():
    s = Scheduler(History(), chargers=1, executors=2, tick=0.05)
    fired = []
    s.register("everytick", func=lambda run: fired.append(run["id"]),
               sec="*")
    s.start()
    try:
        deadline = time.time() + 5
        while not fired and time.time() < deadline:
            time.sleep(0.05)
    finally:
        s.stop()
    assert fired, "scheduled job never fired"
