"""DateMathParser — Solr date-math expressions over UTC instants.

Reference: solr/core/src/java/org/apache/solr/util/DateMathParser.java:
an expression is an optional anchor (``NOW`` or an ISO-8601 instant
followed by ``Z``) and a sequence of operations:

    /UNIT      round DOWN to unit start (DateMathParser.round, :159-207)
    +N UNIT    add          (DateMathParser.add, :144-156)
    -N UNIT    subtract

Units (CALENDAR_UNITS, :90-121): YEAR(S), MONTH(S), DAY(S)/DATE,
HOUR(S), MINUTE(S), SECOND(S), MILLI(S)/MILLISECOND(S). All math in
UTC (DEFAULT_MATH_TZ, :85).

The parser resolves an expression to a concrete ``datetime`` at query
COMPILE time; the engine then uses the literal in an ordinary Catalyst
timestamp predicate (pushed to the parquet scan), and the SQL oracle
embeds the identical literal — Spark never evaluates wall-clock NOW,
which keeps gate runs deterministic when an explicit ``now`` anchor is
supplied.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_UNIT_ALIASES = {
    "YEAR": "YEAR", "YEARS": "YEAR",
    "MONTH": "MONTH", "MONTHS": "MONTH",
    "DAY": "DAY", "DAYS": "DAY", "DATE": "DAY",
    "HOUR": "HOUR", "HOURS": "HOUR",
    "MINUTE": "MINUTE", "MINUTES": "MINUTE",
    "SECOND": "SECOND", "SECONDS": "SECOND",
    "MILLI": "MILLI", "MILLIS": "MILLI",
    "MILLISECOND": "MILLI", "MILLISECONDS": "MILLI",
}

_OP_RX = re.compile(
    r"/(?P<runit>[A-Z]+)|(?P<sign>[+-])(?P<n>\d+)(?P<aunit>[A-Z]+)"
)


class DateMathParseError(ValueError):
    pass


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "YEAR":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "MONTH":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "DAY":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "HOUR":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "MINUTE":
        return dt.replace(second=0, microsecond=0)
    if unit == "SECOND":
        return dt.replace(microsecond=0)
    if unit == "MILLI":
        return dt.replace(microsecond=(dt.microsecond // 1000) * 1000)
    raise DateMathParseError(f"unknown unit {unit!r}")


def _add(dt: datetime, n: int, unit: str) -> datetime:
    if unit == "YEAR":
        return _add_months(dt, 12 * n)
    if unit == "MONTH":
        return _add_months(dt, n)
    delta = {
        "DAY": timedelta(days=n),
        "HOUR": timedelta(hours=n),
        "MINUTE": timedelta(minutes=n),
        "SECOND": timedelta(seconds=n),
        "MILLI": timedelta(milliseconds=n),
    }.get(unit)
    if delta is None:
        raise DateMathParseError(f"unknown unit {unit!r}")
    return dt + delta


def _add_months(dt: datetime, n: int) -> datetime:
    # java.util.Calendar month add: clamp day to the target month's end
    y = dt.year + (dt.month - 1 + n) // 12
    m = (dt.month - 1 + n) % 12 + 1
    last = [31, 29 if _leap(y) else 28, 31, 30, 31, 30,
            31, 31, 30, 31, 30, 31][m - 1]
    return dt.replace(year=y, month=m, day=min(dt.day, last))


def _leap(y: int) -> bool:
    return y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)


def parse_date_math(
    expr: str, now: datetime | str | None = None
) -> datetime:
    """Resolve a date-math expression to a concrete UTC datetime.

    ``expr`` is either ``NOW...math...`` or ``<ISO-8601>Z...math...``
    (DateMathParser.parseMath consumes the math tail; Solr's
    DateField splits on the first non-date char)."""
    if isinstance(now, str):
        now = datetime.fromisoformat(now.replace("Z", "+00:00"))
    if expr.startswith("NOW"):
        base = now or datetime.now(timezone.utc)
        rest = expr[3:]
    else:
        m = re.match(r"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?)Z", expr)
        if not m:
            raise DateMathParseError(f"bad anchor in {expr!r}")
        base = datetime.fromisoformat(m.group(1)).replace(
            tzinfo=timezone.utc
        )
        rest = expr[m.end():]
    dt = base.astimezone(timezone.utc)
    pos = 0
    while pos < len(rest):
        m = _OP_RX.match(rest, pos)
        if not m:
            raise DateMathParseError(f"bad math at {rest[pos:]!r}")
        if m.group("runit"):
            unit = _UNIT_ALIASES.get(m.group("runit"))
            if unit is None:
                raise DateMathParseError(m.group("runit"))
            dt = _round_down(dt, unit)
        else:
            unit = _UNIT_ALIASES.get(m.group("aunit"))
            if unit is None:
                raise DateMathParseError(m.group("aunit"))
            n = int(m.group("n"))
            dt = _add(dt, n if m.group("sign") == "+" else -n, unit)
        pos = m.end()
    return dt


def sql_ts(dt: datetime) -> str:
    """The datetime as a 'YYYY-MM-DD HH:MM:SS.ffffff' literal, the form
    both Spark and DuckDB parse as a (naive UTC) timestamp."""
    return dt.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
