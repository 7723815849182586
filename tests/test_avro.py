"""B5 readAvroContainer without spark-avro: the pure-Python fallback decoder.

Golden inputs are the reference's own tutorial fixtures
(morphlines-core/src/test/resources/test-documents/sample-statuses-*.avro),
with record counts pinned by the reference's own test matrix
(MorphlineBasicMiniMRTest.java:90-104: 2 / 20 / 2104 records).  An
independent encoder written here from the Avro spec round-trips the richer
types the fixtures don't cover.
"""

import json
import os
import struct

import pytest

from solr_map_reduce_spark.sources.avro_fallback import (
    avro_to_spark_type,
    iter_records,
    read_avro,
)
from solr_map_reduce_spark.sources.readers import read_input

FIXTURES = "/root/reference/morphlines-core/src/test/resources/test-documents"
GOLDEN = {
    "sample-statuses-20120906-141433.avro": 2,
    "sample-statuses-20120521-100919.avro": 20,
    "sample-statuses-20120906-141433-medium.avro": 2104,
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not present"
)


# -- independent spec-derived encoder (test-only) ----------------------------

def _zz(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return _zz(len(b)) + b


def _container(schema: dict, encoded_records: list[bytes]) -> bytes:
    sync = b"S" * 16
    header = b"Obj\x01"
    header += _zz(2)
    header += _enc_str("avro.schema") + _zz(len(json.dumps(schema))) + json.dumps(schema).encode()
    header += _enc_str("avro.codec") + _zz(4) + b"null"
    header += _zz(0)
    header += sync
    body = b"".join(encoded_records)
    return header + _zz(len(encoded_records)) + _zz(len(body)) + body + sync


def test_golden_record_counts():
    for name, want in GOLDEN.items():
        with open(os.path.join(FIXTURES, name), "rb") as f:
            rows = list(iter_records(f.read()))
        assert len(rows) == want, name
        assert all(r["id"] for r in rows)


def test_golden_field_values():
    with open(os.path.join(FIXTURES, "sample-statuses-20120906-141433.avro"), "rb") as f:
        rows = list(iter_records(f.read()))
    # twitter status ids are numeric strings; every record carries text
    assert all(r["id"].isdigit() for r in rows)
    assert all(isinstance(r["text"], str) and r["text"] for r in rows)
    assert {"user_screen_name", "created_at"} <= set(rows[0])


def test_roundtrip_rich_types():
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "maybe", "type": ["null", "long"]},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["X", "Y"]}},
        ],
    }
    rec = (
        _enc_str("hi")
        + _zz(-7)
        + _zz(1 << 40)
        + struct.pack("<d", 2.5)
        + b"\x01"
        + _zz(1) + _zz(99)              # union branch 1 (long) = 99
        + _zz(2) + _zz(3) + _zz(4) + _zz(0)   # arr [3, 4]
        + _zz(1) + _enc_str("k") + _enc_str("v") + _zz(0)  # map {k: v}
        + _zz(1)                          # enum Y
    )
    rows = list(iter_records(_container(schema, [rec, rec])))
    assert len(rows) == 2
    assert rows[0] == {
        "s": "hi", "i": -7, "l": 1 << 40, "d": 2.5, "b": True,
        "maybe": 99, "arr": [3, 4], "m": {"k": "v"}, "e": "Y",
    }
    st = avro_to_spark_type(schema)
    assert [f.name for f in st.fields] == ["s", "i", "l", "d", "b", "maybe", "arr", "m", "e"]


def test_union_null_decodes_none():
    schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "maybe", "type": ["null", "string"]}],
    }
    rec_null = _zz(0)
    rec_val = _zz(1) + _enc_str("x")
    rows = list(iter_records(_container(schema, [rec_null, rec_val])))
    assert rows == [{"maybe": None}, {"maybe": "x"}]


def test_read_input_avro_dataframe(spark):
    """read_input(format='avro') returns correct rows in this container even
    though spark-avro is absent (tutorialReadAvroContainer.conf:57-66)."""
    path = os.path.join(FIXTURES, "sample-statuses-20120906-141433.avro")
    df = read_input(spark, path, format="avro")
    rows = df.collect()
    assert len(rows) == 2
    assert sorted(r["id"] for r in rows) == sorted(
        r["id"] for r in iter_records(open(path, "rb").read())
    )
    assert df.schema["user_statuses_count"].dataType.typeName() == "integer"


def test_read_avro_distributed_over_files(spark, tmp_path):
    """Multiple container files decode in one DataFrame (one task each)."""
    import shutil

    for i, name in enumerate(["a.avro", "b.avro"]):
        shutil.copy(
            os.path.join(FIXTURES, "sample-statuses-20120521-100919.avro"),
            tmp_path / name,
        )
    df = read_avro(spark, str(tmp_path))
    assert df.count() == 40


def test_deflate_codec_container():
    import zlib

    schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "s", "type": "string"}, {"name": "n", "type": "long"}],
    }
    recs = [_enc_str(f"row{i}") + _zz(i * 10) for i in range(50)]
    body = b"".join(recs)
    compressed = zlib.compress(body)[2:-4]  # raw deflate: strip zlib header+adler
    sync = b"S" * 16
    header = b"Obj\x01"
    header += _zz(2)
    header += _enc_str("avro.schema") + _enc_str(json.dumps(schema))
    header += _enc_str("avro.codec") + _zz(7) + b"deflate"
    header += _zz(0) + sync
    data = header + _zz(50) + _zz(len(compressed)) + compressed + sync
    rows = list(iter_records(data))
    assert len(rows) == 50
    assert rows[7] == {"s": "row7", "n": 70}


def test_unsupported_codec_raises():
    schema = {"type": "record", "name": "R", "fields": [{"name": "s", "type": "string"}]}
    sync = b"S" * 16
    header = b"Obj\x01" + _zz(2)
    header += _enc_str("avro.schema") + _enc_str(json.dumps(schema))
    header += _enc_str("avro.codec") + _zz(6) + b"snappy"
    header += _zz(0) + sync
    data = header + _zz(1) + _zz(3) + b"xxx" + sync
    with pytest.raises(ValueError, match="snappy"):
        list(iter_records(data))


def test_read_avro_path_glob_filter(spark, tmp_path):
    """Scan-level options reach the binaryFile scan (a stray non-avro file
    is filtered out instead of crashing the decode)."""
    import shutil

    shutil.copy(
        os.path.join(FIXTURES, "sample-statuses-20120906-141433.avro"),
        tmp_path / "good.avro",
    )
    (tmp_path / "stray.txt").write_text("not avro")
    df = read_avro(spark, str(tmp_path), pathGlobFilter="*.avro")
    assert df.count() == 2


# -- property-based round-trip (hypothesis) ----------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _enc_value(v, typ):
    """Encode one value per the Avro spec (independent of the decoder)."""
    if typ == "string":
        return _enc_str(v)
    if typ == "long":
        return _zz(v)
    if typ == "double":
        return struct.pack("<d", v)
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ == "bytes":
        return _zz(len(v)) + v
    raise AssertionError(typ)


_FIELD_TYPES = {
    "string": st.text(max_size=40),
    "long": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    "double": st.floats(allow_nan=False, allow_infinity=False),
    "boolean": st.booleans(),
    "bytes": st.binary(max_size=30),
}


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_roundtrip_random_records(data):
    n_fields = data.draw(st.integers(min_value=1, max_value=6))
    types = [data.draw(st.sampled_from(sorted(_FIELD_TYPES))) for _ in range(n_fields)]
    schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": f"f{i}", "type": t} for i, t in enumerate(types)],
    }
    n_records = data.draw(st.integers(min_value=0, max_value=8))
    records = [
        {f"f{i}": data.draw(_FIELD_TYPES[t]) for i, t in enumerate(types)}
        for _ in range(n_records)
    ]
    encoded = [
        b"".join(_enc_value(r[f"f{i}"], t) for i, t in enumerate(types))
        for r in records
    ]
    got = list(iter_records(_container(schema, encoded)))
    assert got == records


def test_read_input_avro_with_metadata_enrichment(spark):
    """A6-over-Avro without spark-avro: the fallback reconstructs the
    _metadata struct from its binaryFile scan, so file enrichment works."""
    from solr_map_reduce_spark.operators.metadata import enrich_file_metadata

    path = os.path.join(FIXTURES, "sample-statuses-20120521-100919.avro")
    df = read_input(spark, path, format="avro", with_metadata=True)
    assert "_metadata" in df.columns
    out = enrich_file_metadata(df)
    assert out.count() == GOLDEN["sample-statuses-20120521-100919.avro"]
    row = out.select("file_name", "file_length", "file_last_modified").first()
    assert row["file_name"] == "sample-statuses-20120521-100919.avro"
    assert row["file_length"] == os.path.getsize(path)
    assert row["file_last_modified"] > 0


# -- adversarial decode (r13 review) -----------------------------------------
# Negative enum/union indexes previously hit Python negative indexing and
# silently decoded the WRONG symbol/branch; zero-width item types (null)
# let a corrupt block count claim 2^40 elements that "decode" without
# touching the buffer (unbounded allocation); a negative top-level record
# count made range() silently skip the block; truncated varints leaked
# IndexError.

def test_corrupt_enum_index_is_loud_not_wrong():
    schema = {"type": "enum", "name": "E", "symbols": ["a", "b", "c"]}
    for idx in (-1, 3, 100):
        data = _container(schema, [_zz(idx)])
        with pytest.raises(ValueError, match="enum index"):
            list(iter_records(data))


def test_corrupt_union_branch_is_loud_not_wrong():
    schema = ["null", "string"]
    data = _container(schema, [_zz(-1)])
    with pytest.raises(ValueError, match="union branch"):
        list(iter_records(data))


def test_zero_width_record_count_bounded():
    data = _container("null", [])
    # patch the block record count to 2^40 with an empty body
    head, _tail = data.rsplit(_zz(0) + _zz(0), 1)
    data = head + _zz(1 << 40) + _zz(0) + b"S" * 16
    with pytest.raises(ValueError, match="record count"):
        list(iter_records(data))


def test_zero_width_array_block_bounded():
    schema = {"type": "array", "items": "null"}
    data = _container(schema, [_zz(1 << 40)])
    with pytest.raises(ValueError, match="array block count"):
        list(iter_records(data))


def test_negative_record_count_is_loud_not_skipped():
    schema = "string"
    rec = _enc_str("x")
    data = _container(schema, [rec])
    head, _tail = data.rsplit(_zz(1) + _zz(len(rec)), 1)
    data = head + _zz(-1) + _zz(len(rec)) + rec + b"S" * 16
    with pytest.raises(ValueError, match="record count"):
        list(iter_records(data))


def test_truncated_varint_typed_eoferror():
    schema = "long"
    data = _container(schema, [b"\x80"])  # continuation byte, then sync
    # the trailing sync bytes continue the varint; truncate mid-stream
    with pytest.raises((EOFError, ValueError)):
        list(iter_records(data[: len(data) - 17] + b"\x80"))


def test_endless_varint_rejected():
    schema = "long"
    data = _container(schema, [b"\xff" * 11 + b"\x00"])
    with pytest.raises(ValueError, match="varint"):
        list(iter_records(data))
