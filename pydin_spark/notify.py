"""SMTP failure alarms for scheduled jobs.

Reference parity: pydin wires a pepperoni logger with an SMTP alarm
channel (reference logger.py:20-27 — host/port/tls/address/user/
password from the [EMAIL] config section, default recipients = the
app owner) and each schedule row carries ``alarm`` and ``email_list``
(reference core.py:1283-1293, api.py:160/254). Here the same surface
is an explicit object: :class:`SmtpNotifier` plugs into
``Scheduler(notifier=...)`` and mails the failure report for every
'E'/'T'/'U' run to the job's ``email_list`` (or the configured default
recipients). Delivery uses the stdlib ``smtplib`` — the SMTP client
factory is injectable so tests (and SMTP-less sandboxes) run against
a recording double instead of a live relay.
"""

from __future__ import annotations

import configparser
import os


class SmtpNotifier:
    """Callable notifier: mails one failure report per failed run.

    Parameters mirror the reference's [EMAIL] section: ``host``,
    ``port``, ``tls``, ``address`` (the From line), ``username`` /
    ``password`` (optional login), ``recipients`` (default To when the
    job has no ``email_list``). ``smtp_factory(host, port)`` must
    return an smtplib.SMTP-compatible object; defaults to
    ``smtplib.SMTP``.

    Notifier exceptions are swallowed by the Scheduler by contract
    (alarms must never kill runs), so delivery failures surface only
    through the returned/raised error of a direct call.
    """

    def __init__(self, host: str = "localhost", port: int = 25,
                 tls: bool = False, address: str = "pydin@localhost",
                 username: str | None = None,
                 password: str | None = None,
                 recipients: tuple[str, ...] = (),
                 smtp_factory=None):
        self.host = host
        self.port = int(port)
        self.tls = bool(tls)
        self.address = address
        self.username = username
        self.password = password
        self.recipients = tuple(recipients)
        if smtp_factory is None:
            import smtplib

            smtp_factory = smtplib.SMTP
        self.smtp_factory = smtp_factory

    # -- config --------------------------------------------------------------
    DEFAULT_INI = "~/.pydin_spark/sources.ini"

    @classmethod
    def from_config(cls, ini_path: str | None = None,
                    smtp_factory=None) -> "SmtpNotifier | None":
        """Build from the [email] INI section overlaid with
        ``PYDIN_EMAIL_*`` env vars (same layering as SourceRegistry).
        Returns None when no host is configured — callers pass the
        result straight to ``Scheduler(notifier=...)`` and alarming is
        simply off in unconfigured environments, like the reference's
        EMAIL toggle."""
        conf: dict[str, str] = {}
        path = os.path.expanduser(ini_path or cls.DEFAULT_INI)
        if os.path.exists(path):
            parser = configparser.ConfigParser()
            parser.read(path)
            if parser.has_section("email"):
                conf.update(parser.items("email"))
        prefix = "PYDIN_EMAIL_"
        for key, value in os.environ.items():
            if key.startswith(prefix):
                conf[key[len(prefix):].lower()] = value
        if "host" not in conf:
            return None
        recipients = tuple(
            r.strip() for r in conf.get("recipients", "").replace(
                ";", ",").split(",") if r.strip())
        return cls(host=conf["host"], port=int(conf.get("port", 25)),
                   tls=str(conf.get("tls", "")).lower()
                   in ("1", "true", "yes", "y"),
                   address=conf.get("address", "pydin@localhost"),
                   username=conf.get("username"),
                   password=conf.get("password"),
                   recipients=recipients, smtp_factory=smtp_factory)

    # -- delivery ------------------------------------------------------------
    @staticmethod
    def _parse_email_list(email_list) -> list[str]:
        # reference core.py:1743-1752: str ("a, b"), list, or None
        if not email_list:
            return []
        if isinstance(email_list, str):
            return [e for e in email_list.replace(" ", "").replace(
                ";", ",").split(",") if e]
        return [str(e) for e in email_list]

    def render(self, event: dict) -> tuple[str, str]:
        """(subject, body) for a failure event — the run report the
        reference mails through its alarm channel."""
        status = {"E": "ERROR", "T": "TIMEOUT",
                  "U": "UNKNOWN"}.get(event.get("status"),
                                      str(event.get("status")))
        subject = (f"[pydin] {status}: job "
                   f"{event.get('job_name') or event.get('job_id')} "
                   f"run {event.get('run_id')}")
        errors = event.get("error_list") or []
        if isinstance(errors, str):
            errors = [errors]
        lines = [f"job_id: {event.get('job_id')}",
                 f"job_name: {event.get('job_name')}",
                 f"run_id: {event.get('run_id')}",
                 f"status: {status}", ""]
        lines += [f"- {e}" for e in errors] or ["(no error detail)"]
        return subject, "\n".join(lines)

    def __call__(self, event: dict) -> bool:
        """Send the failure mail; returns True when a message was
        handed to the SMTP client (False when there is no recipient —
        parity with the reference, which silently skips jobs with no
        email_list and no owner)."""
        from email.message import EmailMessage

        to = self._parse_email_list(event.get("email_list")) \
            or list(self.recipients)
        if not to:
            return False
        subject, body = self.render(event)
        msg = EmailMessage()
        msg["From"] = self.address
        msg["To"] = ", ".join(to)
        msg["Subject"] = subject
        msg.set_content(body)
        client = self.smtp_factory(self.host, self.port)
        try:
            if self.tls:
                client.starttls()
            if self.username:
                client.login(self.username, self.password or "")
            client.send_message(msg)
        finally:
            try:
                client.quit()
            except Exception:  # noqa: BLE001 - best-effort teardown
                pass
        return True
