"""Solr date-math — the public ``DateMathParser`` syntax Solr users write
in range bounds, facet gaps, and timeseries boundaries.

Grammar (Solr reference guide, "Working with Dates"):

    value := ("NOW" | iso8601 "Z") math*
    math  := "/" UNIT            -- round DOWN to the start of UNIT
           | ("+" | "-") N UNIT  -- offset by N units (calendar-aware)
    UNIT  := YEAR(S) | MONTH(S) | DAY(S) | DATE | HOUR(S) | MINUTE(S) |
             SECOND(S) | MILLI(S) | MILLISECOND(S)

Examples: ``NOW-7DAYS``, ``NOW/DAY+6MONTHS``, ``NOW/HOUR``,
``1972-05-20T17:33:18.772Z+6MONTHS+3DAYS/DAY``.

All arithmetic is UTC — Solr dates are UTC-only, and the engine pins its
Spark session timezone to UTC, so the naive ``datetime`` values returned
here ARE the UTC instants.  Month/year offsets clamp the day-of-month the
way Java's Calendar does (Jan 31 + 1MONTH = Feb 28/29).

``NOW`` resolves from (in order): an explicit ``now=`` argument, the
:func:`fixed_now` context (the deterministic hook mirroring Solr's public
``NOW=epoch-millis`` request parameter — what keeps date-math queries
DuckDB-oracle-testable), else the wall clock.
"""

from __future__ import annotations

import calendar
import re
from contextlib import contextmanager
from contextvars import ContextVar
from datetime import datetime, timedelta, timezone


class DateMathError(ValueError):
    """A malformed date-math string (message names the bad token)."""


_FIXED_NOW: ContextVar[datetime | None] = ContextVar("solr_fixed_now", default=None)


@contextmanager
def fixed_now(now: datetime):
    """Pin ``NOW`` for every date-math evaluation in the block — the
    deterministic equivalent of Solr's ``NOW=`` request param.  Queries
    compile their date literals eagerly, so wrapping query CONSTRUCTION
    is enough; lazy execution sees the captured instants."""
    tok = _FIXED_NOW.set(_naive_utc(now))
    try:
        yield
    finally:
        _FIXED_NOW.reset(tok)


def _naive_utc(dt: datetime) -> datetime:
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def resolve_now(now: "datetime | None" = None) -> datetime:
    """The ``NOW`` instant: explicit arg > :func:`fixed_now` context >
    wall clock — always a naive UTC datetime."""
    if now is not None:
        return _naive_utc(now)
    ctx = _FIXED_NOW.get()
    if ctx is not None:
        return ctx
    return datetime.now(timezone.utc).replace(tzinfo=None)


def parse_now_param(raw: "str | int | float") -> datetime:
    """Solr's ``NOW=`` request parameter: epoch MILLIS, or (engine
    extension) an ISO-8601 instant string."""
    if isinstance(raw, (int, float)):
        return datetime.fromtimestamp(raw / 1000.0, tz=timezone.utc).replace(
            tzinfo=None
        )
    s = str(raw).strip()
    if re.fullmatch(r"\d{12,}", s):
        return datetime.fromtimestamp(int(s) / 1000.0, tz=timezone.utc).replace(
            tzinfo=None
        )
    try:
        return _naive_utc(datetime.fromisoformat(s[:-1] if s.endswith("Z") else s))
    except ValueError:
        raise DateMathError(
            f"NOW={raw!r} must be epoch millis or an ISO-8601 instant"
        ) from None


# canonical unit per accepted spelling (Solr accepts singular and plural;
# DATE is Solr's alias for DAY)
_UNITS = {}
for _u in ("YEAR", "MONTH", "DAY", "HOUR", "MINUTE", "SECOND", "MILLI",
           "MILLISECOND"):
    _UNITS[_u] = _u if _u != "MILLISECOND" else "MILLI"
    _UNITS[_u + "S"] = _UNITS[_u]
_UNITS["DATE"] = "DAY"

_MATH_TOKEN = re.compile(r"([+\-/])(\d*)([A-Z]+)")

_FIXED_SECONDS = {"DAY": 86400, "HOUR": 3600, "MINUTE": 60, "SECOND": 1}


def _days_in_month(year: int, month: int) -> int:
    return calendar.monthrange(year, month)[1]


def add_months(dt: datetime, n: int) -> datetime:
    """Calendar month offset with Java-Calendar day clamping."""
    total = dt.year * 12 + (dt.month - 1) + n
    y, m0 = divmod(total, 12)
    day = min(dt.day, _days_in_month(y, m0 + 1))
    return dt.replace(year=y, month=m0 + 1, day=day)


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
    raise DateMathError(f"cannot round to unit {unit!r}")


def _offset(dt: datetime, sign: int, n: int, unit: str) -> datetime:
    if unit == "YEAR":
        return add_months(dt, sign * n * 12)
    if unit == "MONTH":
        return add_months(dt, sign * n)
    if unit == "MILLI":
        return dt + timedelta(milliseconds=sign * n)
    return dt + timedelta(seconds=sign * n * _FIXED_SECONDS[unit])


def apply_math(base: datetime, math: str, where: str = "date math") -> datetime:
    """Apply a chain of ``/UNIT`` and ``±N UNIT`` operations to ``base``."""
    pos = 0
    dt = base
    while pos < len(math):
        m = _MATH_TOKEN.match(math, pos)
        if not m:
            raise DateMathError(
                f"{where}: bad date-math token at {math[pos:]!r} "
                "(expected /UNIT or +N UNIT or -N UNIT)"
            )
        op, num, unit_raw = m.groups()
        unit = _UNITS.get(unit_raw)
        if unit is None:
            raise DateMathError(
                f"{where}: unknown date-math unit {unit_raw!r}"
            )
        if op == "/":
            if num:
                raise DateMathError(
                    f"{where}: rounding takes no count ({m.group(0)!r})"
                )
            dt = _round_down(dt, unit)
        else:
            if not num:
                raise DateMathError(
                    f"{where}: offset needs a count ({m.group(0)!r})"
                )
            dt = _offset(dt, 1 if op == "+" else -1, int(num), unit)
        pos = m.end()
    return dt


def parse_datemath(
    raw: str, now: "datetime | None" = None, where: str = "date math"
) -> datetime:
    """A full Solr date value — plain ISO-8601, ``NOW``-based math, or an
    ISO instant followed by math (``...Z+6MONTHS/DAY``) — as a naive UTC
    datetime."""
    s = raw.strip()
    if s.startswith("NOW"):
        return apply_math(resolve_now(now), s[3:], where)
    # an explicit instant carries math only after its 'Z' terminator
    # (Solr's documented form); otherwise the whole string is plain ISO
    if "Z" in s:
        base_s, _, math = s.partition("Z")
    else:
        base_s, math = s, ""
    try:
        base = datetime.fromisoformat(base_s)
    except ValueError:
        raise DateMathError(
            f"{where}: {raw!r} is not ISO-8601 or NOW-based date math"
        ) from None
    if base.tzinfo is not None:
        base = _naive_utc(base)
    return apply_math(base, math, where) if math else base


_GAP = re.compile(r"^\+(\d+)([A-Z]+)$")


def parse_gap(raw: str, where: str = "gap") -> tuple[int, str]:
    """A Solr range/timeseries gap ``+N UNIT`` -> (N, canonical unit).
    Units: YEAR/MONTH/DAY/HOUR/MINUTE/SECOND (plural accepted)."""
    m = _GAP.match(raw.strip().upper())
    unit = _UNITS.get(m.group(2)) if m else None
    if m is None or unit is None or unit == "MILLI":
        raise DateMathError(
            f"{where}: unsupported gap {raw!r} (expected +N UNIT, e.g. "
            "+1DAY, +6HOURS, +3MONTHS)"
        )
    n = int(m.group(1))
    if n < 1:
        raise DateMathError(f"{where}: gap count must be >= 1 in {raw!r}")
    return n, unit


def utc_epoch(dt: datetime) -> int:
    """Naive-UTC datetime -> epoch seconds (timezone-independent)."""
    return calendar.timegm(dt.timetuple())
