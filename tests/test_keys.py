from solr_map_reduce_spark.operators.keys import generate_sequence_key, require_unique_key

import pytest
from pyspark.errors import PySparkRuntimeError
from pyspark.sql.utils import AnalysisException  # noqa: F401


def test_generate_sequence_key_format(spark):
    df = spark.createDataFrame(
        [("f1", 10), ("f1", 20), ("f2", 30)], "base_id string, seq long"
    )
    out = generate_sequence_key(
        df, "base_id", key="id", session_col="base_id", order_col="seq",
        preserve_existing=False,
    )
    got = sorted(r["id"] for r in out.collect())
    assert got == ["f1#0", "f1#1", "f2#0"]


def test_preserve_existing(spark):
    df = spark.createDataFrame(
        [("x", "f", 1), (None, "f", 2)], "id string, base_id string, seq long"
    )
    out = generate_sequence_key(df, "base_id", session_col="base_id", order_col="seq")
    got = sorted(r["id"] for r in out.collect())
    assert got == ["f#1", "x"]


def test_require_unique_key_raises_on_null(spark):
    df = spark.createDataFrame([("a",), (None,)], "id string")
    with pytest.raises(Exception) as exc:
        require_unique_key(df, "id").collect()
    assert "Missing unique key" in str(exc.value)


def test_require_unique_key_passes(spark):
    df = spark.createDataFrame([("a",), ("b",)], "id string")
    assert require_unique_key(df, "id").count() == 2
