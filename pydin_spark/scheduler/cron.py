"""Cron-style schedule matching — reference parity.

Parity target: the reference scheduler's field matcher
(``pydin/core.py:705-734``) and timestamp parser (``core.py:691-703``).
A schedule is six period fields over local-time units:

    mday (1-31), hour (0-23), min (0-59), sec (0-59),
    wday (1-7, Monday=1), yday (1-366)

Each field accepts: ``None``/``*`` (always), ``n`` (exact), ``/n``
(every n units — modulo), ``a-b`` (inclusive range), ``n+`` (at least n),
``n,m,...`` (list). Anything else never matches.
"""

from __future__ import annotations

import re
import time as _time
from dataclasses import dataclass


def parse_moment(timestamp: float) -> dict:
    """Decompose a unix timestamp into the matcher's time units."""
    s = _time.localtime(timestamp)
    return {
        "timestamp": timestamp,
        "mday": s.tm_mday,
        "hour": s.tm_hour,
        "min": s.tm_min,
        "sec": s.tm_sec,
        "wday": s.tm_wday + 1,
        "yday": s.tm_yday,
    }


def matches(period: str | None, unit: int) -> bool:
    """Does one schedule field match one time unit value?"""
    if period is None or re.fullmatch(r"\*", str(period)):
        return True
    period = str(period)
    if re.fullmatch(r"\d+", period):
        return unit == int(period)
    if re.fullmatch(r"/\d+", period):
        step = int(period[1:])
        return step != 0 and unit % step == 0
    if re.fullmatch(r"\d+-\d+", period):
        lo, hi = (int(x) for x in period.split("-"))
        return lo <= unit <= hi
    if re.fullmatch(r"\d+\+", period):
        return unit >= int(period[:-1])
    if re.match(r"^\d+,\s*\d+", period):
        return unit in [int(x) for x in re.findall(r"\d+", period)]
    return False


@dataclass
class Schedule:
    """One job's schedule row (fields as in the reference schedule table,
    db/sqlite.sql:6-36)."""

    mday: str | None = None
    hour: str | None = None
    min: str | None = None
    sec: str | None = None
    wday: str | None = None
    yday: str | None = None
    trigger_id: int | None = None  # event-triggered jobs never time-match

    def is_due(self, timestamp: float) -> bool:
        if self.trigger_id is not None:
            return False
        units = parse_moment(timestamp)
        return all(matches(getattr(self, f), units[f])
                   for f in ("mday", "hour", "min", "sec", "wday", "yday"))
