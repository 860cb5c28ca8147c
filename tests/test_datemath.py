"""DateMathParser unit tests (S/util/DateMathParser.java semantics)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from lucene_solr_spark.functions.datemath import (
    DateMathParseError,
    parse_date_math,
    sql_ts,
)

NOW = "2024-03-15T10:30:45.123456Z"


def _dt(*args):
    return datetime(*args, tzinfo=timezone.utc)


def test_round_day():
    assert parse_date_math("NOW/DAY", NOW) == _dt(2024, 3, 15)


def test_round_plus_days():
    assert parse_date_math("NOW/DAY+7DAYS", NOW) == _dt(2024, 3, 22)


def test_minus_hours_then_round():
    assert parse_date_math("NOW-12HOURS/DAY", NOW) == _dt(2024, 3, 14)


def test_explicit_anchor():
    assert parse_date_math(
        "2024-01-31T23:59:59Z/MONTH", None
    ) == _dt(2024, 1, 1)


def test_month_add_clamps_day():
    # Jan 31 + 1 MONTH -> Feb 29 (2024 is a leap year), like
    # java.util.Calendar month arithmetic
    assert parse_date_math(
        "2024-01-31T00:00:00Z+1MONTH", None
    ) == _dt(2024, 2, 29)


def test_year_round_and_add():
    assert parse_date_math("NOW/YEAR+1YEAR", NOW) == _dt(2025, 1, 1)


def test_chained_ops():
    assert parse_date_math("NOW/HOUR+30MINUTES-1DAY", NOW) == _dt(
        2024, 3, 14, 10, 30
    )


def test_bad_unit_raises():
    with pytest.raises(DateMathParseError):
        parse_date_math("NOW/FORTNIGHT", NOW)
    with pytest.raises(DateMathParseError):
        parse_date_math("NOW+3", NOW)


def test_sql_ts_format():
    assert sql_ts(_dt(2024, 3, 15)) == "2024-03-15 00:00:00.000000"
