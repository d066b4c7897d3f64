"""Scheduler tests: cron matcher table, state machine, parallelism cap,
triggers, rerun scan, timeout — reference core.py semantics. The whole
module runs twice: once on the sqlite3 metadata backend and once on
embedded Derby over JDBC (the shared-RDBMS control plane, VERDICT r8
#3) — the autouse fixture rebinds this module's ``History``."""

import sys
import time

import pytest

from pydin_spark.scheduler import History, Scheduler, matches


@pytest.fixture(autouse=True)
def _metadata_backend(history_backend, monkeypatch):
    if history_backend is not None:
        monkeypatch.setattr(sys.modules[__name__], "History",
                            history_backend)


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
    """Reruns spawn a child run (rerun_id/rerun_seqno) and the parent
    earns rerun_done='Y' when the child completes — reference
    core.py:1616-1638, 1669-1673."""
    s = Scheduler(History())
    calls = []

    def flaky(run):
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("boom")

    job_id = s.register("flaky", func=flaky, rerun_limit=2, rerun_interval=1)
    run_id = s.run_job_now(job_id, wait=True)
    assert s.history.run(run_id)["status"] == "E"
    assert "boom" in s.history.run(run_id)["error_list"]
    n = s.rerun_scan(now=time.time() + 2)
    assert n == 1
    assert s.history.run(run_id)["rerun_now"] == "Y"
    child_id = s.exec_queue.get_nowait()
    child = s.history.run(child_id)
    assert child["rerun_id"] == run_id and child["rerun_seqno"] == 1
    s._execute(child_id)
    assert s.history.run(child_id)["status"] == "D"
    parent = s.history.run(run_id)
    assert parent["rerun_done"] == "Y"
    assert parent["rerun_times"] == 1
    assert parent["rerun_now"] is None
    # a parent completed by a rerun never retries again
    assert s.rerun_scan(now=time.time() + 10) == 0


def test_rerun_stops_outside_rerun_days():
    """rerun_days bounds the retry window — a failed run older than the
    window stops retrying forever (reference was_rerun_available,
    core.py:966-986)."""
    s = Scheduler(History())
    job_id = s.register("always_fails", func=lambda run: 1 / 0,
                        rerun_limit=5, rerun_interval=1, rerun_days=2)
    run_id = s.run_job_now(job_id, wait=True)
    assert s.history.run(run_id)["status"] == "E"
    # inside the window: one rerun starts (and fails again)
    assert s.rerun_scan(now=time.time() + 3600) == 1
    child_id = s.exec_queue.get_nowait()
    s._execute(child_id)
    assert s.history.run(child_id)["status"] == "E"
    assert s.history.run(run_id)["rerun_times"] == 1
    # beyond rerun_days: never again, despite rerun_limit remaining
    assert s.rerun_scan(now=time.time() + 3 * 86400) == 0
    # child runs themselves are never rerun initiators
    assert s.history.run(child_id)["rerun_id"] == run_id


def test_wake_up_scan_promotes_postponed_run():
    """A 'W' run postponed by a sleep window executes once the window
    ends (reference _wake_up / _regain_sleeping_job core.py:948-962,
    1121-1140)."""
    import datetime as dt
    s = Scheduler(History())
    done = []
    job_id = s.register("sleepy", func=lambda run: done.append(1),
                        sleep_period="10-11")
    asleep = dt.datetime(2024, 1, 1, 10, 30).timestamp()
    awake = dt.datetime(2024, 1, 1, 12, 5).timestamp()
    run_id = s.history.add_run(job_id, "W", asleep)
    # still inside the sleep window: not promoted
    assert s.wake_up_scan(now=asleep + 60) == 0
    assert s.history.run(run_id)["status"] == "W"
    # window over: promoted, queued, and runnable
    assert s.wake_up_scan(now=awake) == 1
    assert s.history.run(run_id)["status"] == "Q"
    assert s.exec_queue.get_nowait() == run_id
    s._execute(run_id)
    assert done and s.history.run(run_id)["status"] == "D"


def test_wake_up_scan_waits_for_capacity_and_window():
    """'W' runs stay postponed while the parallelism cap is saturated,
    and wake_up_period gates the minute of promotion."""
    import datetime as dt
    s = Scheduler(History())
    job_id = s.register("capped", func=lambda run: None, parallelism="N",
                        wake_up_period="30")
    blocker = s.history.add_run(job_id, "R", time.time())
    run_id = s.history.add_run(job_id, "W", time.time())
    at_30 = dt.datetime(2024, 1, 1, 12, 30).timestamp()
    at_05 = dt.datetime(2024, 1, 1, 12, 5).timestamp()
    assert s.wake_up_scan(now=at_30) == 0      # capacity saturated
    s.history.set_run(blocker, status="D")
    assert s.wake_up_scan(now=at_05) == 0      # outside wake_up_period
    assert s.wake_up_scan(now=at_30) == 1      # window + capacity OK
    assert s.history.run(run_id)["status"] == "Q"


def test_start_marks_orphaned_runs_unknown():
    """Runs left 'S'/'R' by a dead scheduler life are marked 'U' on
    startup (reference Job._exit core.py:2437-2441)."""
    h = History()
    s = Scheduler(h, chargers=1, executors=1, tick=0.05)
    job_id = s.register("zombie", func=lambda run: None)
    r1 = h.add_run(job_id, "R", time.time())
    r2 = h.add_run(job_id, "S", time.time())
    s.start()
    try:
        assert h.run(r1)["status"] == "U"
        assert h.run(r2)["status"] == "U"
    finally:
        s.stop()


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
    assert s.history.run(child_run)["trigger_run_id"] == run_id


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


def test_notifier_fires_on_failure_with_email_list():
    """Failed runs invoke the pluggable notifier with the job's
    email_list (reference alarming: logger.py:20-27, email_list on the
    schedule); successes stay silent and notifier errors never break
    the executor."""
    alerts = []
    s = Scheduler(History(), notifier=alerts.append)
    ok = s.register("fine", func=lambda run: None)
    bad = s.register("broken", func=lambda run: 1 / 0,
                     email_list="oncall@example.com")
    s.run_job_now(ok, wait=True)
    assert alerts == []
    run_id = s.run_job_now(bad, wait=True)
    assert len(alerts) == 1
    a = alerts[0]
    assert a["email_list"] == "oncall@example.com"
    assert a["run_id"] == run_id and a["status"] == "E"
    assert "division" in a["error_list"]

    # a notifier that throws must not affect run bookkeeping
    def explode(alert):
        raise RuntimeError("smtp down")
    s2 = Scheduler(History(), notifier=explode)
    bad2 = s2.register("broken2", func=lambda run: 1 / 0)
    rid = s2.run_job_now(bad2, wait=True)
    assert s2.history.run(rid)["status"] == "E"


def test_schedule_active_window(monkeypatch):
    """start_date/end_date bound when a job may fire (reference
    was_active core.py:375-384); either bound may be absent."""
    import datetime as dt
    s = Scheduler(History())
    job_id = s.register("windowed", func=lambda run: None, sec="*",
                        start_date="2024-06-01 00:00:00",
                        end_date="2024-06-30 00:00:00")
    job = s.history.job(job_id)
    inside = dt.datetime(2024, 6, 15, 12, 0).timestamp()
    before = dt.datetime(2024, 5, 1).timestamp()
    after = dt.datetime(2024, 7, 1).timestamp()
    assert s._is_due(job, inside)
    assert not s._is_due(job, before)
    assert not s._is_due(job, after)
    # open-ended job fires any time
    open_id = s.register("open", func=lambda run: None, sec="*")
    assert s._is_due(s.history.job(open_id), before)


class _FakeSMTP:
    """Recording smtplib.SMTP double."""
    instances = []

    def __init__(self, host, port):
        self.host, self.port = host, port
        self.tls = False
        self.login_as = None
        self.sent = []
        _FakeSMTP.instances.append(self)

    def starttls(self):
        self.tls = True

    def login(self, user, password):
        self.login_as = (user, password)

    def send_message(self, msg):
        self.sent.append(msg)

    def quit(self):
        pass


def test_smtp_notifier_delivers_failure_report():
    from pydin_spark.notify import SmtpNotifier
    _FakeSMTP.instances.clear()
    n = SmtpNotifier(host="mail.test", port=2525, tls=True,
                     address="pydin@test", username="u", password="p",
                     recipients=("owner@test",),
                     smtp_factory=_FakeSMTP)
    ok = n({"job_id": 7, "job_name": "nightly", "run_id": 42,
            "status": "E",
            "email_list": "a@test, b@test",
            "error_list": ["StepError: boom"]})
    assert ok
    (client,) = _FakeSMTP.instances
    assert (client.host, client.port) == ("mail.test", 2525)
    assert client.tls and client.login_as == ("u", "p")
    (msg,) = client.sent
    assert msg["To"] == "a@test, b@test"
    assert "ERROR" in msg["Subject"] and "nightly" in msg["Subject"]
    assert "StepError: boom" in msg.get_content()
    # no email_list -> configured default recipients (the owner)
    _FakeSMTP.instances.clear()
    assert n({"job_id": 7, "run_id": 43, "status": "T",
              "email_list": None})
    (client,) = _FakeSMTP.instances
    assert client.sent[0]["To"] == "owner@test"
    # no recipients anywhere -> skipped, nothing connected
    n2 = SmtpNotifier(host="mail.test", smtp_factory=_FakeSMTP)
    _FakeSMTP.instances.clear()
    assert not n2({"job_id": 1, "run_id": 1, "status": "E"})
    assert not _FakeSMTP.instances


def test_smtp_notifier_from_config(tmp_path, monkeypatch):
    from pydin_spark.notify import SmtpNotifier
    # unconfigured -> None (alarming simply off)
    assert SmtpNotifier.from_config(str(tmp_path / "none.ini")) is None
    ini = tmp_path / "sources.ini"
    ini.write_text("[email]\nhost = relay.test\nport = 587\n"
                   "tls = yes\naddress = from@test\n"
                   "recipients = owner@test, oncall@test\n")
    n = SmtpNotifier.from_config(str(ini), smtp_factory=_FakeSMTP)
    assert (n.host, n.port, n.tls) == ("relay.test", 587, True)
    assert n.recipients == ("owner@test", "oncall@test")
    # env overlay wins (same layering as SourceRegistry)
    monkeypatch.setenv("PYDIN_EMAIL_HOST", "env.test")
    n2 = SmtpNotifier.from_config(str(ini), smtp_factory=_FakeSMTP)
    assert n2.host == "env.test"


def test_scheduler_with_smtp_notifier_end_to_end():
    """The Scheduler's failure hook and the SMTP notifier compose: a
    failing registered job produces exactly one mail to its
    email_list."""
    from pydin_spark.notify import SmtpNotifier
    _FakeSMTP.instances.clear()
    n = SmtpNotifier(host="mail.test", smtp_factory=_FakeSMTP,
                     recipients=("owner@test",))
    s = Scheduler(History(), notifier=n)

    def boom(run):
        raise RuntimeError("kaput")

    bad = s.register("flaky", func=boom, email_list="oncall@test")
    s.run_job_now(bad, wait=True)
    sent = [m for c in _FakeSMTP.instances for m in c.sent]
    assert len(sent) == 1
    assert sent[0]["To"] == "oncall@test"
    assert "kaput" in sent[0].get_content()
