"""Calendar boundary tests (reference utils.py:1090-1191 semantics)."""

import datetime as dt

from pydin_spark.calendar import Day, Hour, Month, Year


def test_day_bounds():
    d = Day(dt.datetime(2024, 3, 15, 13, 45, 7))
    assert d.start == dt.datetime(2024, 3, 15, 0, 0, 0)
    assert d.end == dt.datetime(2024, 3, 15, 23, 59, 59)


def test_hour_bounds():
    h = Hour(dt.datetime(2024, 3, 15, 13, 45, 7))
    assert h.start == dt.datetime(2024, 3, 15, 13, 0, 0)
    assert h.end == dt.datetime(2024, 3, 15, 13, 59, 59)
    assert h.prev.start == dt.datetime(2024, 3, 15, 12, 0, 0)


def test_month_bounds_leap():
    m = Month(dt.datetime(2024, 2, 10))
    assert m.start == dt.datetime(2024, 2, 1, 0, 0, 0)
    assert m.end == dt.datetime(2024, 2, 29, 23, 59, 59)
    assert m.prev.start == dt.datetime(2024, 1, 1)


def test_year_bounds():
    y = Year(dt.datetime(2024, 6, 1))
    assert y.start == dt.datetime(2024, 1, 1)
    assert y.end == dt.datetime(2024, 12, 31, 23, 59, 59)


def test_relative_navigation():
    d = Day(dt.datetime(2024, 3, 15, 13, 0, 0))
    assert d.days_back(3).start == dt.datetime(2024, 3, 12)
    assert d.hours_back(14).start == dt.datetime(2024, 3, 14, 23, 0, 0)
    assert d.months_back(2).start == dt.datetime(2024, 1, 1)
    assert d.yesterday.start == dt.datetime(2024, 3, 14)
    assert d.tomorrow.start == dt.datetime(2024, 3, 16)


def test_timezone_shift():
    d = Day(dt.datetime(2024, 3, 15, 12, 0, 0, tzinfo=dt.timezone.utc),
            timezone=3)
    assert d.start.utcoffset() == dt.timedelta(hours=3)


def test_week_boundaries_and_navigation():
    import datetime as dt
    from pydin_spark import Week
    # 2024-06-12 is a Wednesday
    w = Week(dt.datetime(2024, 6, 12, 15, 30))
    assert w.start.date() == dt.date(2024, 6, 10)       # Monday
    assert w.start.hour == 0 and w.start.minute == 0
    assert w.end.date() == dt.date(2024, 6, 16)         # Sunday
    assert w.end.hour == 23 and w.end.second == 59
    assert w.prev.start.date() == dt.date(2024, 6, 3)
    assert w.next.start.date() == dt.date(2024, 6, 17)
    # year-boundary week spans the new year
    ny = Week(dt.datetime(2024, 12, 31))
    assert ny.start.date() == dt.date(2024, 12, 30)
    assert ny.end.date() == dt.date(2025, 1, 5)
    # accessor from any period
    from pydin_spark import Day
    assert Day(dt.datetime(2024, 6, 12)).week.start.date() == \
        dt.date(2024, 6, 10)
