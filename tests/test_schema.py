import pyspark.sql.types as T
import pytest

from solr_map_reduce_spark.schema import DynamicField, Field, IndexSchema


@pytest.fixture
def schema():
    return IndexSchema(
        fields=(
            Field("id", "string", required=True),
            Field("text", "text_en"),
            Field("count", "tint"),
            Field("tags", "string", multi_valued=True),
        ),
        unique_key="id",
        dynamic_fields=(
            DynamicField("ignored_*", ignored=True),
            DynamicField("*_s", "string"),
        ),
    )


def test_unique_key_must_exist():
    with pytest.raises(ValueError, match="unique key"):
        IndexSchema(fields=(Field("x"),), unique_key="id")


def test_sanitize_drops_unknown(spark, schema):
    df = spark.createDataFrame([("1", "hi", "junk")], "id string, text string, mystery string")
    out = schema.sanitize(df)
    assert out.columns == ["id", "text"]


def test_sanitize_rename_prefix(spark, schema):
    df = spark.createDataFrame([("1", "junk")], "id string, mystery string")
    out = schema.sanitize(df, rename_prefix="ignored_")
    # renamed to ignored_mystery which matches an *ignored* dynamic field → dropped
    assert out.columns == ["id"]
    out2 = schema.sanitize(df.withColumnRenamed("mystery", "extra"), rename_prefix="")
    assert out2.columns == ["id"]


def test_sanitize_dynamic_field_kept(spark, schema):
    df = spark.createDataFrame([("1", "v")], "id string, note_s string")
    assert schema.sanitize(df).columns == ["id", "note_s"]


def test_apply_types(spark, schema):
    df = spark.createDataFrame([("1", "5")], "id string, count string")
    out = schema.apply_types(df)
    assert dict(out.dtypes)["count"] == "int"


def test_struct_type_multivalued(schema):
    st = schema.struct_type()
    assert st["tags"].dataType == T.ArrayType(T.StringType())
    assert st["count"].dataType == T.IntegerType()


class TestSpatial:
    def test_latlon_type_maps_to_struct(self):
        from solr_map_reduce_spark.schema import Field, spark_type

        t = spark_type("latlon")
        assert [f.name for f in t.fields] == ["lat", "lon"]
        assert Field("loc", "latlon").spark_type == t

    def test_within_box_filters_and_pushes_down(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from solr_map_reduce_spark.schema import within_box

        df = spark.createDataFrame(
            [(1, (10.0, 20.0)), (2, (50.0, 60.0)), (3, (10.5, 19.0))],
            "id long, loc struct<lat: double, lon: double>",
        )
        p = str(tmp_path / "geo")
        df.write.parquet(p)
        back = spark.read.parquet(p)
        hit = back.filter(within_box("loc", 9.0, 11.0, 18.0, 21.0))
        assert sorted(r["id"] for r in hit.collect()) == [1, 3]
        plan = hit._jdf.queryExecution().executedPlan().toString()
        # bbox = range predicates on the nested fields, pushed to the scan
        assert "GreaterThanOrEqual(loc.lat,9.0)" in plan
