"""Business-date calendar: periods with inclusive start/end bounds.

Parity target: the reference ``Calendar`` hierarchy
(``pydin/utils.py:872-1191``) — ``Day/Hour/Month/Year/Today/Yesterday/
Tomorrow`` objects whose ``.start``/``.end`` delimit the period at
one-second granularity (Day end = 23:59:59, reference
``utils.py:1096-1104``), with integer-hour timezone shifting
(``utils.py:936-956``) and relative navigation ``days_back/hours_back/
months_back`` (``utils.py:1047-1072``).

These bounds feed the date-window filter: the engine produces
``col BETWEEN period.start AND period.end`` (inclusive both ends,
reference ``models.py:856-860``).
"""

from __future__ import annotations

import calendar as _cal
import datetime as dt


def _coerce_tz(value) -> dt.timezone | None:
    """Accept None / 'UTC' / int hours / (hours, minutes) like the reference."""
    if value is None or isinstance(value, dt.timezone):
        return value
    if isinstance(value, int):
        return dt.timezone(dt.timedelta(hours=value))
    if isinstance(value, str):
        if value.upper() == "UTC":
            return dt.timezone.utc
        if value.lstrip("+-").isdigit():
            return dt.timezone(dt.timedelta(hours=int(value)))
        raise ValueError(f"unsupported timezone spec: {value!r}")
    if isinstance(value, (list, tuple)):
        return dt.timezone(dt.timedelta(hours=value[0], minutes=value[1]))
    raise ValueError(f"unsupported timezone spec: {value!r}")


class Period:
    """A calendar period anchored at a moment, with inclusive bounds."""

    def __init__(self, now: dt.datetime, timezone=None):
        self.now = now.replace(microsecond=0)
        self.timezone = _coerce_tz(timezone)

    def __repr__(self):
        return f"{type(self).__name__}({self.now.isoformat()})"

    def _shift(self, moment: dt.datetime) -> dt.datetime:
        if self.timezone is not None:
            return moment.astimezone(tz=self.timezone)
        return moment

    @property
    def start(self) -> dt.datetime:
        return self._shift(self._start())

    @property
    def end(self) -> dt.datetime:
        return self._shift(self._end())

    def _start(self) -> dt.datetime:  # pragma: no cover - abstract
        raise NotImplementedError

    def _end(self) -> dt.datetime:  # pragma: no cover - abstract
        raise NotImplementedError

    def with_timezone(self, timezone) -> "Period":
        return type(self)(self.now, timezone)

    # Relative navigation (reference utils.py:1047-1072).
    def days_back(self, delta: int) -> "Day":
        return Day(self.now - dt.timedelta(days=delta), self.timezone)

    def hours_back(self, delta: int) -> "Hour":
        return Hour(self.now - dt.timedelta(hours=delta), self.timezone)

    def minutes_back(self, delta: int) -> "Day":
        return Day(self.now - dt.timedelta(minutes=delta), self.timezone)

    def months_back(self, delta: int) -> "Month":
        now = self.now
        for _ in range(delta):
            now = now.replace(day=1) - dt.timedelta(days=1)
        return Month(now, self.timezone)

    @property
    def prev(self) -> "Period":
        return type(self)(self.now - dt.timedelta(days=1), self.timezone)

    @property
    def next(self) -> "Period":
        return type(self)(self.now + dt.timedelta(days=1), self.timezone)

    @property
    def yesterday(self) -> "Day":
        return Day(self.now - dt.timedelta(days=1), self.timezone)

    @property
    def tomorrow(self) -> "Day":
        return Day(self.now + dt.timedelta(days=1), self.timezone)

    @property
    def day(self) -> "Day":
        return Day(self.now, self.timezone)

    @property
    def hour(self) -> "Hour":
        return Hour(self.now, self.timezone)

    @property
    def week(self) -> "Week":
        return Week(self.now, self.timezone)

    @property
    def month(self) -> "Month":
        return Month(self.now, self.timezone)

    @property
    def year(self) -> "Year":
        return Year(self.now, self.timezone)


class Day(Period):
    """One calendar day: [00:00:00, 23:59:59]."""

    def _start(self):
        return self.now.replace(hour=0, minute=0, second=0)

    def _end(self):
        return self.now.replace(hour=23, minute=59, second=59)


class Hour(Period):
    """One clock hour: [HH:00:00, HH:59:59]."""

    def _start(self):
        return self.now.replace(minute=0, second=0)

    def _end(self):
        return self.now.replace(minute=59, second=59)

    @property
    def prev(self):
        return Hour(self.now - dt.timedelta(hours=1), self.timezone)

    @property
    def next(self):
        return Hour(self.now + dt.timedelta(hours=1), self.timezone)


class Month(Period):
    """One calendar month."""

    def _start(self):
        return self.now.replace(day=1, hour=0, minute=0, second=0)

    def _end(self):
        last = _cal.monthrange(self.now.year, self.now.month)[1]
        return self.now.replace(day=last, hour=23, minute=59, second=59)

    @property
    def prev(self):
        return Month(self.now.replace(day=1) - dt.timedelta(days=1),
                     self.timezone)


class Week(Period):
    """One ISO week: Monday 00:00:00 through Sunday 23:59:59 (reference
    declares ``Calendar.Week`` (utils.py:1169-1170) without bounds; the
    ISO convention makes it usable for weekly date-window loads)."""

    def _start(self):
        monday = self.now - dt.timedelta(days=self.now.weekday())
        return monday.replace(hour=0, minute=0, second=0)

    def _end(self):
        sunday = self.now + dt.timedelta(days=6 - self.now.weekday())
        return sunday.replace(hour=23, minute=59, second=59)

    @property
    def prev(self):
        return Week(self.now - dt.timedelta(days=7), self.timezone)

    @property
    def next(self):
        return Week(self.now + dt.timedelta(days=7), self.timezone)


class Year(Period):
    """One calendar year."""

    def _start(self):
        return self.now.replace(month=1, day=1, hour=0, minute=0, second=0)

    def _end(self):
        return self.now.replace(month=12, day=31, hour=23, minute=59,
                                second=59)


class Today(Day):
    def __init__(self, timezone=None):
        super().__init__(dt.datetime.now(), timezone)


class Yesterday(Day):
    def __init__(self, now: dt.datetime | None = None, timezone=None):
        super().__init__((now or dt.datetime.now()) - dt.timedelta(days=1),
                         timezone)


class Tomorrow(Day):
    def __init__(self, now: dt.datetime | None = None, timezone=None):
        super().__init__((now or dt.datetime.now()) + dt.timedelta(days=1),
                         timezone)
