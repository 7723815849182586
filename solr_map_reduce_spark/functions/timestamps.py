"""Multi-format timestamp conversion — ``convertTimestamp`` (SURVEY §2 B8).

Reference usage (test-morphlines/tutorialReadAvroContainer.conf:113-119): try a
list of input formats in order, parse in an input timezone, emit in a canonical
output format (Solr's ``yyyy-MM-dd'T'HH:mm:ss.SSS'Z'``).

Spark-first: a ``coalesce`` of ``to_timestamp`` attempts — all JVM-side,
codegen'd, and null-safe (a format that doesn't match yields null and falls
through to the next).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column

SOLR_OUTPUT_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
SOLR_OUTPUT_FORMAT_SECONDS = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def parse_timestamp(
    col: Column,
    input_formats: Sequence[str] = ("yyyy-MM-dd'T'HH:mm:ss'Z'",),
    input_timezone: str | None = None,
) -> Column:
    """Parse trying each format in order; first success wins."""
    attempts = [F.try_to_timestamp(col, F.lit(fmt)) for fmt in input_formats]
    parsed = F.coalesce(*attempts) if len(attempts) > 1 else attempts[0]
    if input_timezone and input_timezone.upper() != "UTC":
        parsed = F.to_utc_timestamp(parsed, input_timezone)
    return parsed


def format_timestamp(col: Column, output_format: str = SOLR_OUTPUT_FORMAT) -> Column:
    return F.date_format(col, output_format)


def convert_timestamp(
    col: Column,
    input_formats: Sequence[str] = ("yyyy-MM-dd'T'HH:mm:ss'Z'",),
    input_timezone: str | None = None,
    output_format: str = SOLR_OUTPUT_FORMAT,
) -> Column:
    """Full convertTimestamp: multi-format parse → canonical string."""
    return format_timestamp(parse_timestamp(col, input_formats, input_timezone), output_format)


def epoch_seconds(col: Column) -> Column:
    """Seconds-since-epoch for any timestamp flavor.

    Parquet fixtures arrive as TIMESTAMP or TIMESTAMP_NTZ depending on how
    they were written; ``cast("long")`` rejects NTZ outright
    (DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION).  Casting through
    ``timestamp`` first is exact for both: NTZ→TIMESTAMP interprets the wall
    clock in the session timezone (pinned UTC by ``session.py``) and
    TIMESTAMP→TIMESTAMP is a no-op.  Stays JVM-side/codegen'd.
    """
    return col.cast("timestamp").cast("long")


def ensure_instant(df, *cols):
    """Cast any TIMESTAMP_NTZ column among ``cols`` to TIMESTAMP.

    Event-time operators (``withWatermark``, window functions over instants)
    require TimestampType; fixture parquet may carry isAdjustedToUTC=false
    (read as NTZ).  With the session timezone pinned UTC the cast preserves
    the wall clock exactly.  Unknown / already-instant columns pass through.
    """
    import pyspark.sql.types as T

    by_name = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if c and isinstance(by_name.get(c), T.TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
