"""Solr date-math parser (functions/datemath.py): the public DateMathParser
syntax — NOW resolution, /UNIT rounding, ±N UNIT offsets, chains, clamping."""

from datetime import datetime, timezone

import pytest

from solr_map_reduce_spark.functions.datemath import (
    DateMathError,
    add_months,
    fixed_now,
    parse_datemath,
    parse_gap,
    parse_now_param,
    resolve_now,
    utc_epoch,
)

NOW = datetime(2024, 3, 15, 10, 30, 45, 123456)


class TestParse:
    def test_plain_iso_passthrough(self):
        assert parse_datemath("2024-01-02") == datetime(2024, 1, 2)
        assert parse_datemath("2024-01-02T03:04:05Z") == datetime(2024, 1, 2, 3, 4, 5)
        assert parse_datemath("2024-01-02 03:04:05") == datetime(2024, 1, 2, 3, 4, 5)

    def test_offset_iso_normalizes_to_utc(self):
        assert parse_datemath("2024-01-02T05:00:00+02:00") == datetime(2024, 1, 2, 3)

    def test_now_and_rounding(self):
        assert parse_datemath("NOW", now=NOW) == NOW
        assert parse_datemath("NOW/DAY", now=NOW) == datetime(2024, 3, 15)
        assert parse_datemath("NOW/HOUR", now=NOW) == datetime(2024, 3, 15, 10)
        assert parse_datemath("NOW/MINUTE", now=NOW) == datetime(2024, 3, 15, 10, 30)
        assert parse_datemath("NOW/MONTH", now=NOW) == datetime(2024, 3, 1)
        assert parse_datemath("NOW/YEAR", now=NOW) == datetime(2024, 1, 1)

    def test_offsets(self):
        assert parse_datemath("NOW-7DAYS", now=NOW) == NOW.replace(day=8)
        assert parse_datemath("NOW+2HOURS", now=NOW) == NOW.replace(hour=12)
        assert parse_datemath("NOW-45SECONDS", now=NOW) == NOW.replace(second=0)
        assert parse_datemath("NOW+1MONTH", now=NOW) == NOW.replace(month=4)
        assert parse_datemath("NOW-1YEAR", now=NOW) == NOW.replace(year=2023)

    def test_chains(self):
        # the documented composite: round then offset then round again
        assert parse_datemath("NOW/DAY+6MONTHS+3DAYS/DAY", now=NOW) == datetime(
            2024, 9, 18
        )
        assert parse_datemath(
            "1972-05-20T17:33:18.772Z+6MONTHS+3DAYS/DAY"
        ) == datetime(1972, 11, 23)

    def test_month_end_clamps_like_java_calendar(self):
        jan31 = datetime(2024, 1, 31, 12)
        assert add_months(jan31, 1) == datetime(2024, 2, 29, 12)  # leap
        assert add_months(datetime(2023, 1, 31), 1) == datetime(2023, 2, 28)
        assert parse_datemath("2024-01-31T00:00:00Z+1MONTH") == datetime(2024, 2, 29)

    def test_errors_are_loud(self):
        for bad in ("NOW/", "NOW+DAY", "NOW/3DAYS", "NOW-7FORTNIGHTS",
                    "notadate", "NOW+7"):
            with pytest.raises(DateMathError):
                parse_datemath(bad, now=NOW)


class TestNowResolution:
    def test_explicit_beats_context_beats_clock(self):
        with fixed_now(datetime(2020, 1, 1)):
            assert resolve_now() == datetime(2020, 1, 1)
            assert resolve_now(NOW) == NOW
        # outside the context: wall clock (sanity: recent year)
        assert resolve_now().year >= 2024

    def test_fixed_now_pins_parse(self):
        with fixed_now(datetime(2020, 6, 15, 12)):
            assert parse_datemath("NOW/DAY") == datetime(2020, 6, 15)

    def test_aware_datetime_normalized(self):
        aware = datetime(2024, 1, 1, 2, tzinfo=timezone.utc)
        assert resolve_now(aware) == datetime(2024, 1, 1, 2)

    def test_now_param_epoch_millis_and_iso(self):
        assert parse_now_param(1704067200000) == datetime(2024, 1, 1)
        assert parse_now_param("1704067200000") == datetime(2024, 1, 1)
        assert parse_now_param("2024-01-01T00:00:00Z") == datetime(2024, 1, 1)
        with pytest.raises(DateMathError):
            parse_now_param("garbage")


class TestGap:
    def test_units_and_counts(self):
        assert parse_gap("+1DAY") == (1, "DAY")
        assert parse_gap("+6HOURS") == (6, "HOUR")
        assert parse_gap("+3months") == (3, "MONTH")
        assert parse_gap("+2YEARS") == (2, "YEAR")
        assert parse_gap("+30MINUTES") == (30, "MINUTE")

    def test_rejects_bad_gaps(self):
        for bad in ("1DAY", "+DAY", "+0DAYS", "-1DAY", "+5MILLIS"):
            with pytest.raises(DateMathError):
                parse_gap(bad)


def test_utc_epoch_is_tz_independent():
    assert utc_epoch(datetime(2024, 1, 1)) == 1704067200
