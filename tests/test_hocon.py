"""HOCON morphline configs compiled and executed against this engine —
including the reference's own flagship tutorial config, end-to-end from its
own Avro fixture (tutorialReadAvroContainer.conf + MorphlineBasicMiniMRTest
counts)."""

import os

import pytest

from solr_map_reduce_spark.plans.hocon import compile_morphline, parse_hocon
from solr_map_reduce_spark.schema import Field, IndexSchema

REF_MORPHLINES = "/root/reference/morphlines-core/src/test/resources/test-morphlines"
REF_DOCS = "/root/reference/morphlines-core/src/test/resources/test-documents"


def test_parse_hocon_subset():
    text = """
# comment
SOLR_LOCATOR : {
  collection : collection1          # trailing comment
  zkHost : "127.0.0.1:2181/solr"
}
flags { nested : true }
n : 42
f : 1.5
arr : [1, 2,
       3]
strs : ["a", b, "c,d"]
big : \"\"\"multi "quoted" text\"\"\"
sub : ${SOLR_LOCATOR.collection}
obj : { loc : ${SOLR_LOCATOR} }
"""
    got = parse_hocon(text)
    assert got["SOLR_LOCATOR"]["collection"] == "collection1"
    assert got["SOLR_LOCATOR"]["zkHost"] == "127.0.0.1:2181/solr"
    assert got["flags"] == {"nested": True}
    assert got["n"] == 42 and got["f"] == 1.5
    assert got["arr"] == [1, 2, 3]
    assert got["strs"] == ["a", "b", "c,d"]
    assert got["big"] == 'multi "quoted" text'
    assert got["sub"] == "collection1"
    assert got["obj"]["loc"]["collection"] == "collection1"


TUTORIAL_SCHEMA = IndexSchema(
    fields=(
        Field("id", "string", required=True),
        Field("text", "string"),
        Field("user_screen_name", "string"),
        Field("created_at", "string"),
        Field("user_statuses_count", "int"),
    ),
    unique_key="id",
)


@pytest.mark.skipif(not os.path.isdir(REF_MORPHLINES), reason="reference absent")
def test_compile_tutorial_conf():
    with open(os.path.join(REF_MORPHLINES, "tutorialReadAvroContainer.conf")) as f:
        compiled = compile_morphline(f.read(), schema=TUTORIAL_SCHEMA)
    assert compiled.morphline_id == "morphline1"
    assert compiled.input_format == "avro"
    assert compiled.load_solr is True
    assert not compiled.skipped


@pytest.mark.skipif(not os.path.isdir(REF_MORPHLINES), reason="reference absent")
def test_tutorial_conf_end_to_end(spark, tmp_path):
    """The reference's tutorial, whole hog on this engine: HOCON config →
    compiled pipeline → its own Avro fixture → sharded index artifact.
    Record count pinned by MorphlineBasicMiniMRTest.java:92 (2 docs)."""
    from zoneinfo import ZoneInfo

    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig, read_index
    from solr_map_reduce_spark.sources.avro_fallback import iter_records
    from solr_map_reduce_spark.sources.readers import read_input

    with open(os.path.join(REF_MORPHLINES, "tutorialReadAvroContainer.conf")) as f:
        compiled = compile_morphline(f.read(), schema=TUTORIAL_SCHEMA)

    fixture = os.path.join(REF_DOCS, "sample-statuses-20120906-141433.avro")
    df = read_input(spark, fixture, format=compiled.input_format)
    out = compiled.pipeline.run(df)
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 2
    # sanitize dropped everything outside the schema
    assert set(next(iter(rows.values())).asDict()) == {
        "id", "text", "user_screen_name", "created_at", "user_statuses_count"
    }
    # convertTimestamp: parsed as UTC, emitted as LA wall clock in the Solr
    # format (outputTimezone : America/Los_Angeles in the conf)
    raw = {r["id"]: r for r in iter_records(open(fixture, "rb").read())}
    import datetime as dt

    for rid, row in rows.items():
        src = dt.datetime.strptime(
            raw[rid]["created_at"], "%Y-%m-%dT%H:%M:%SZ"
        ).replace(tzinfo=dt.timezone.utc)
        want = src.astimezone(ZoneInfo("America/Los_Angeles")).strftime(
            "%Y-%m-%dT%H:%M:%S.000Z"
        )
        assert row["created_at"] == want, rid

    # loadSolr terminal: feed the pipeline output to the index writer
    assert compiled.load_solr
    art = str(tmp_path / "tutorial_index")
    job = IndexJob(IndexJobConfig(schema=TUTORIAL_SCHEMA, shards=2, dedup="none"))
    job.build(out, art)
    assert read_index(spark, art).count() == 2


def test_unknown_command_strictness():
    text = """
morphlines : [ { id : m1
  commands : [ { frobnicate { x : 1 } } ]
} ]
"""
    with pytest.raises(ValueError, match="frobnicate"):
        compile_morphline(text)
    compiled = compile_morphline(text, strict=False)
    assert compiled.skipped == ["frobnicate"]


def test_readcsv_columns_and_ignore_first_line(spark, tmp_path):
    """readCSV columns→positional names + ignoreFirstLine→header skip
    (solrCellDocumentTypes.conf:105-110): downstream field-addressed
    commands see the declared names, not _c0/_c1, and no header row."""
    from solr_map_reduce_spark.sources.readers import read_input

    csv = tmp_path / "in.csv"
    csv.write_text("colA\tcolB\n1\tann\n2\tbob\n")
    text = """
morphlines : [ { id : m1, commands : [
  { readCSV { separator : "\\t", ignoreFirstLine : true,
              columns : [id, name], charset : UTF-8 } }
  { setValues { source : csv } }
] } ]
"""
    compiled = compile_morphline(text)
    assert compiled.input_format == "csv"
    assert compiled.read_options["header"] == "true"
    df = read_input(
        spark, str(csv), format="csv", **compiled.read_options
    )
    out = compiled.pipeline.run(df)
    rows = sorted((r["id"], r["name"], r["source"]) for r in out.collect())
    assert rows == [(1, "ann", "csv"), (2, "bob", "csv")]


def test_readcsv_columns_without_header_row(spark, tmp_path):
    """ignoreFirstLine absent → every line is data; columns still rename the
    default _c0/_c1 names positionally."""
    from solr_map_reduce_spark.sources.readers import read_input

    csv = tmp_path / "noheader.csv"
    csv.write_text("1,ann\n2,bob\n")
    text = """
morphlines : [ { id : m1, commands : [
  { readCSV { separator : ",", columns : [id, name] } }
] } ]
"""
    compiled = compile_morphline(text)
    assert compiled.read_options["header"] == "false"
    df = read_input(spark, str(csv), format="csv", **compiled.read_options)
    out = compiled.pipeline.run(df)
    rows = sorted((r["id"], r["name"]) for r in out.collect())
    assert rows == [(1, "ann"), (2, "bob")]


def test_extract_json_paths_command(spark):
    """extractJsonPaths (kite-morphlines JSON command): path expressions
    over a JSON string column compile to the JVM-side extract_json op."""
    text = """
morphlines : [ { id : m1, commands : [
  { extractJsonPaths { field : payload, paths : { uid : /user/id, tag : /tag } } }
] } ]
"""
    compiled = compile_morphline(text)
    assert compiled.skipped == []
    df = spark.createDataFrame(
        [('{"user": {"id": 9}, "tag": "t1"}',)], "payload string"
    )
    row = compiled.pipeline.run(df).first()
    assert (row["uid"], row["tag"]) == ("9", "t1")
    assert "payload" not in compiled.pipeline.run(df).columns
