import pyspark.sql.functions as F

from solr_map_reduce_spark.plans import compile_pipeline
from solr_map_reduce_spark.schema import Field, IndexSchema


def test_pipeline_end_to_end(spark):
    schema = IndexSchema(
        fields=(
            Field("id", "string", required=True),
            Field("title", "string"),
            Field("title_tokens", "string", multi_valued=True),
            Field("created", "string"),
        ),
        unique_key="id",
    )
    df = spark.createDataFrame(
        [
            ("f1", "Hello World", "2021-01-02T03:04:05Z", "junk"),
            ("f1", "Another Doc", "2021-06-07T08:09:10Z", "junk"),
        ],
        "base string, title string, created string, unknown string",
    )
    pipe = compile_pipeline(
        [
            {"op": "generate_key", "base_id_col": "base", "key": "id",
             "session_col": "base", "order_col": "created", "preserve_existing": False},
            {"op": "convert_timestamp", "field": "created"},
            {"op": "tokenize", "input_field": "title", "output_field": "title_tokens",
             "analyzer": "text_general"},
            {"op": "sanitize", "schema": schema},
        ]
    )
    out = pipe.run(df).orderBy("id").collect()
    assert [r["id"] for r in out] == ["f1#0", "f1#1"]
    assert out[0]["title_tokens"] == ["hello", "world"]
    assert out[0]["created"] == "2021-01-02T03:04:05.000Z"
    assert "unknown" not in out[0].asDict()


def test_flatten_and_extract_paths(spark):
    df = spark.createDataFrame(
        [((("x", 1), "top"),)], "root struct<inner: struct<a: string, b: int>, top: string>"
    )
    flat = compile_pipeline([{"op": "flatten"}]).run(df)
    assert flat.columns == ["root_inner_a", "root_inner_b", "root_top"]
    ext = compile_pipeline(
        [{"op": "extract_paths", "paths": {"a": "/root/inner/a", "t": "/root/top"}}]
    ).run(df)
    row = ext.first()
    assert row["a"] == "x" and row["t"] == "top"


def test_extract_json_paths(spark):
    df = spark.createDataFrame(
        [('{"a": {"b": 7}, "tag": "x"}',), ('{"tag": "y"}',), (None,)],
        "props string",
    )
    out = compile_pipeline(
        [{"op": "extract_json", "field": "props",
          "paths": {"ab": "/a/b", "tag": "/tag"}}]
    ).run(df)
    assert "props" not in out.columns  # drop=True default
    rows = out.collect()
    assert (rows[0]["ab"], rows[0]["tag"]) == ("7", "x")
    assert (rows[1]["ab"], rows[1]["tag"]) == (None, "y")
    assert (rows[2]["ab"], rows[2]["tag"]) == (None, None)
    kept = compile_pipeline(
        [{"op": "extract_json", "field": "props", "paths": {"tag": "/tag"},
          "drop": False}]
    ).run(df)
    assert "props" in kept.columns


def test_when_rules_routing(spark):
    df = spark.createDataFrame(
        [("a.csv", "1"), ("b.json", "2"), ("c.bin", "3")], "name string, v string"
    )
    pipe = compile_pipeline(
        [
            {
                "op": "when_rules",
                "rules": [
                    (F.col("name").endswith(".csv"), lambda d: d.withColumn("kind", F.lit("csv"))),
                    (F.col("name").endswith(".json"), lambda d: d.withColumn("kind", F.lit("json"))),
                ],
                "otherwise": lambda d: d.withColumn("kind", F.lit("other")),
            }
        ]
    )
    got = {r["name"]: r["kind"] for r in pipe.run(df).collect()}
    assert got == {"a.csv": "csv", "b.json": "json", "c.bin": "other"}


def test_set_values_uuid_explode(spark):
    df = spark.createDataFrame([(["x", "y"],)], "atts array<string>")
    pipe = compile_pipeline(
        [
            {"op": "explode", "field": "atts"},
            {"op": "set_values", "values": {"flag": True}},
            {"op": "generate_uuid", "field": "uid"},
        ]
    )
    rows = pipe.run(df).collect()
    assert len(rows) == 2
    assert all(r["flag"] for r in rows)
    assert len({r["uid"] for r in rows}) == 2


def test_observe_metrics(spark):
    from pyspark.sql import Observation

    # use the raw DataFrame.observe via our op factory path
    df = spark.range(10)
    pipe = compile_pipeline([{"op": "observe", "name": "m1"}])
    out = pipe.run(df)
    assert out.count() == 10


def test_split_corrupt_side_output(spark, tmp_path):
    """B22 fault tolerance: bad records flow to a side output, not a crash."""
    from solr_map_reduce_spark.sources.readers import split_corrupt

    p = tmp_path / "mixed.json"
    p.write_text('{"a": 1}\n{"a": 2}\nNOT JSON AT ALL\n{"a": 3}\n')
    df = spark.read.schema("a long, _corrupt_record string").json(str(p)).cache()
    good, bad = split_corrupt(df)
    assert sorted(r["a"] for r in good.collect()) == [1, 2, 3]
    assert bad.count() == 1
    assert "NOT JSON" in bad.first()["_corrupt_record"]


def test_split_corrupt_noop_without_column(spark):
    from solr_map_reduce_spark.sources.readers import split_corrupt

    df = spark.range(3)
    good, bad = split_corrupt(df)
    assert bad is None and good.count() == 3


def test_avro_falls_back_without_spark_avro(spark, tmp_path):
    """B5 avro no longer env-gates: with spark-avro absent, read_input routes
    to the pure-Python container decoder (tests/test_avro.py covers decode
    correctness; here only the dispatch), and a path with no avro files
    raises a clear error instead of silently returning nothing."""
    import pytest as _pt

    from solr_map_reduce_spark.sources.readers import _avro_available, read_input

    if _avro_available(spark):
        _pt.skip("spark-avro present in this environment")
    with _pt.raises(Exception, match="avro|PATH_NOT_FOUND|no .*files"):
        read_input(spark, str(tmp_path / "missing"), format="avro").collect()


def test_extract_json_in_place_and_multi_path(spark):
    """Extract-in-place ({out == field}) and multiple paths all read the
    ORIGINAL JSON column — no path sees an already-replaced value."""
    df = spark.createDataFrame(
        [('{"k": 7, "tag": "x"}',)], "props string"
    )
    out = compile_pipeline(
        [{"op": "extract_json", "field": "props",
          "paths": {"props": "/k", "tag": "/tag"}}]
    ).run(df)
    row = out.first()
    assert row["props"] == "7" and row["tag"] == "x"
    assert set(out.columns) == {"props", "tag"}
