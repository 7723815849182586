"""A2/A3 input randomization and B8 multi-format timestamp conversion."""

import pyspark.sql.functions as F

from solr_map_reduce_spark.functions.timestamps import (
    convert_timestamp,
    parse_timestamp,
)
from solr_map_reduce_spark.operators.randomize import (
    REFERENCE_SEED,
    randomize,
    randomize_file_list,
)


def test_randomize_file_list_seeded_deterministic():
    files = [f"f{i}" for i in range(50)]
    a = randomize_file_list(files)
    b = randomize_file_list(files)
    assert a == b  # fixed reference seed -> reproducible
    assert sorted(a) == sorted(files) and a != files
    assert randomize_file_list(files, seed=7) != a  # seed changes order


def test_randomize_rows_deterministic(spark):
    df = spark.range(100)
    a = [r["id"] for r in randomize(df).collect()]
    b = [r["id"] for r in randomize(df).collect()]
    assert a == b
    assert sorted(a) == list(range(100)) and a != list(range(100))
    c = [r["id"] for r in randomize(df, seed=REFERENCE_SEED + 1).collect()]
    assert c != a


def test_parse_timestamp_multi_format_fallthrough(spark):
    df = spark.createDataFrame(
        [
            ("2024-03-01T10:00:00Z",),
            ("2024-03-01 10:00:00",),
            ("03/01/2024 10:00",),
            ("not a date",),
            (None,),
        ],
        "raw string",
    )
    parsed = df.select(
        parse_timestamp(
            F.col("raw"),
            input_formats=(
                "yyyy-MM-dd'T'HH:mm:ss'Z'",
                "yyyy-MM-dd HH:mm:ss",
                "MM/dd/yyyy HH:mm",
            ),
        ).alias("ts")
    ).collect()
    vals = [r["ts"] for r in parsed]
    assert vals[0] == vals[1] == vals[2]  # all three formats hit the same instant
    assert vals[3] is None and vals[4] is None  # unparseable -> null, no crash


def test_convert_timestamp_timezone_and_output(spark):
    df = spark.createDataFrame([("2024-06-01 12:00:00",)], "raw string")
    out = df.select(
        convert_timestamp(
            F.col("raw"),
            input_formats=("yyyy-MM-dd HH:mm:ss",),
            input_timezone="America/New_York",  # EDT = UTC-4 in June
        ).alias("iso")
    ).first()["iso"]
    assert out == "2024-06-01T16:00:00.000Z"
