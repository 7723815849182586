"""Reader matrix — the morphline extraction surface as Spark sources
(SURVEY §2 B5-B13).

| morphline command      | here                                  |
|------------------------|---------------------------------------|
| readAvroContainer (B5) | ``format="avro"``                     |
| readCSV (B9)           | ``format="csv"`` (sep/header/charset) |
| readJson* (B10)        | ``format="json"``                     |
| readLine/readText      | ``format="text"``                     |
| solrCell/Tika (B11)    | ``format="binary"`` + extract UDF     |
| decompress (B13)       | Spark codecs (``.gz`` transparent)    |
| parquet (engine native)| ``format="parquet"``                  |

Fault-tolerance policy (B22: isProductionMode / ignore recoverable
exceptions — mr/morphline/MorphlineMapRunner.java:110-114) maps to
``mode=PERMISSIVE`` + ``_corrupt_record`` for self-describing formats and
``ignoreCorruptFiles`` for binary scans.

Hidden files: the reference skips ``.``/``_``-prefixed inputs
(MapReduceIndexerTool.java:892-959 PathFilter); Spark's file index does the
same by default — noted here as contract, not code.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMAT_ALIASES = {
    "avro": "avro",
    "readavrocontainer": "avro",
    "csv": "csv",
    "readcsv": "csv",
    "json": "json",
    "readjson": "json",
    "text": "text",
    "readline": "text",
    "binary": "binaryFile",
    "binaryfile": "binaryFile",
    "solrcell": "binaryFile",
    "parquet": "parquet",
}


def split_corrupt(df: DataFrame, corrupt_col: str = "_corrupt_record"):
    """B22 fault-tolerance policy: split a PERMISSIVE-parsed input into
    (good, bad) — bad records flow to a side output instead of failing the
    job (the reference's isProductionMode / recoverableExceptionClasses
    stance, mr/morphline/MorphlineMapRunner.java:110-114).

    The input must be cached or re-readable: Spark computes the corrupt
    column only when selected, so both branches re-scan.
    """
    if corrupt_col not in df.columns:
        return df, None
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad


def _avro_available(spark: SparkSession) -> bool:
    """True when the external spark-avro DataSource module is registered
    (it is not part of core Spark; some of its classes ARE bundled, so a
    Class.forName probe lies — ask the DataSource registry instead)."""
    try:
        spark.read.format("avro").schema("probe int").load("/__avro_probe__")
        return True
    except Exception as ex:  # PATH_NOT_FOUND → source exists; lookup error → missing
        return "Failed to find data source" not in str(ex)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table, normalizing timestamp flavor at the boundary.

    The engine must be robust to whatever the fixture parquet carries:

    - nanosecond int64 (read as long via ``nanosAsLong``) → µs timestamp;
      integer division keeps full int64 precision, truncation matches how
      µs engines (DuckDB) read the same files;
    - TIMESTAMP_NTZ (µs, isAdjustedToUTC=false) → TIMESTAMP; exact because
      the session timezone is pinned UTC (``session.py``), and required by
      every event-time operator (``withWatermark`` rejects NTZ, as does
      ``cast("long")`` arithmetic).
    """
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    from solr_map_reduce_spark.functions.timestamps import ensure_instant

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ensure_instant(df, *[f.name for f in df.schema.fields])


def read_input(
    spark: SparkSession,
    paths: str | Sequence[str],
    format: str = "parquet",
    schema=None,
    with_metadata: bool = False,
    permissive: bool = True,
    **options,
) -> DataFrame:
    """Load input files for the index pipeline.

    ``with_metadata=True`` selects the ``_metadata`` struct alongside the data
    so A6 enrichment can run without re-scanning.  ``permissive`` applies the
    reference's fault-tolerance stance (keep bad records, don't fail the job).
    """
    fmt = _FORMAT_ALIASES.get(format.lower())
    if fmt is None:
        raise ValueError(f"unknown input format {format!r}")
    if fmt == "avro" and not _avro_available(spark):
        # spark-avro is an external module; when absent, fall back to the
        # pure-Python container decoder (binaryFile scan + mapInPandas) so
        # the reference's flagship tutorial path stays runnable
        from solr_map_reduce_spark.sources.avro_fallback import read_avro

        # the fallback decoder reconstructs the _metadata struct from its
        # binaryFile scan row, so A6 enrichment works without spark-avro
        return read_avro(
            spark, paths, schema=schema, with_metadata=with_metadata, **options
        )
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt in ("csv", "json") and permissive:
        options.setdefault("mode", "PERMISSIVE")
        options.setdefault("columnNameOfCorruptRecord", "_corrupt_record")
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", schema is None)
    reader = reader.options(**{k: str(v) for k, v in options.items()})
    if isinstance(paths, str):
        paths = [paths]
    df = reader.load(list(paths))
    if with_metadata:
        df = df.select("*", "_metadata")
    return df
