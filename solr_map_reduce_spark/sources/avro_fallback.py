"""Pure-Python Avro Object Container File reader (B5 readAvroContainer
fallback).

The reference's flagship tutorial path is Avro ingestion
(morphlines-core/src/test/resources/test-morphlines/tutorialReadAvroContainer.conf:57-66,
driven by map-reduce/src/test/java/com/riskiq/solr/hadoop/MorphlineBasicMiniMRTest.java:90-104).
Spark's Avro source is an external module (spark-avro) that is not always on
the classpath; rather than fail, this decoder — written from the public
Apache Avro 1.11 specification ("Object Container Files" + binary encoding
sections) — makes ``read_input(format="avro")`` work anywhere.

Spark-first plumbing: container files are scanned with the ``binaryFile``
source (one task per file, content never touches the driver except one
header read for schema inference) and decoded executor-side in
``mapInPandas`` (Arrow-batched output).  A whole container file is one
split — the same granularity as the reference's one-morphline-call-per-file
mapper — so parallelism comes from file count; at real scale prefer many
files or the native spark-avro module, which this fallback defers to when
present.

Supported: null/boolean/int/long/float/double/bytes/string, records, enums,
arrays, maps, fixed, unions with one non-null branch; ``null`` and
``deflate`` codecs.  Unsupported (raises cleanly): multi-branch non-null
unions, snappy/zstandard codecs (libraries absent here).
"""

from __future__ import annotations

import json
import struct
import zlib
from collections.abc import Iterator, Sequence

import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"Obj\x01"

# per-block item-count ceiling (matches the spirit of Apache Avro's
# system limits, AVRO-3819): items of zero encoded width (null, empty
# records) let a corrupt count claim 2^60 elements that "decode"
# without ever touching the buffer — an unbounded allocation loop, not
# an EOFError.  No realistic container packs more items in one block.
_MAX_BLOCK_ITEMS = 1 << 24


class _Cursor:
    """Byte cursor implementing Avro binary primitive decoding."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def long(self) -> int:
        acc = 0
        shift = 0
        buf = self.buf
        pos = self.pos
        end = len(buf)
        while True:
            if pos >= end:
                # typed like raw(): a truncated varint is the same
                # corruption as truncated fixed-width data, not an
                # IndexError five frames deep
                raise EOFError("truncated avro varint")
            b = buf[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 63:
                # spec: a long is at most 10 varint bytes; an endless
                # 0x80 run is corruption, not a big number
                raise ValueError("avro varint longer than 10 bytes")
        self.pos = pos
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def raw(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        if len(out) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return out

    def bytes_(self) -> bytes:
        return self.raw(self.long())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")

    def boolean(self) -> bool:
        return self.raw(1) != b"\x00"

    def float_(self) -> float:
        return struct.unpack("<f", self.raw(4))[0]

    def double(self) -> float:
        return struct.unpack("<d", self.raw(8))[0]

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def parse_header(buf: bytes) -> tuple[dict, str, bytes, int]:
    """Returns (writer schema, codec, 16-byte sync marker, body offset)."""
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    cur = _Cursor(buf, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = cur.long()
        if n == 0:
            break
        if n < 0:  # negative block count is followed by a byte size
            cur.long()
            n = -n
        for _ in range(n):
            key = cur.string()
            meta[key] = cur.bytes_()
    sync = cur.raw(16)
    if "avro.schema" not in meta:
        # typed: a magic-valid container without the mandatory schema
        # key is corrupt — KeyError here reads as a code bug upstream
        raise ValueError("avro container header has no avro.schema")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync, cur.pos


def _named(schema):
    """Resolve {"type": "record", ...} / plain-string forms uniformly."""
    if isinstance(schema, str):
        return schema, schema
    if isinstance(schema, dict):
        return schema["type"], schema
    if isinstance(schema, list):
        return "union", schema
    raise ValueError(f"unsupported avro schema node: {schema!r}")


def _union_branches(schema: list) -> list:
    return [b for b in schema if b != "null"]


def avro_to_spark_type(schema) -> T.DataType:
    kind, node = _named(schema)
    simple = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "fixed": T.BinaryType(),
        "string": T.StringType(),
        "enum": T.StringType(),
        "null": T.NullType(),
    }
    if kind in simple:
        return simple[kind]
    if kind == "union":
        branches = _union_branches(node)
        if len(branches) != 1:
            raise ValueError(
                f"multi-branch avro union not supported: {node!r}"
            )
        return avro_to_spark_type(branches[0])
    if kind == "record":
        return T.StructType(
            [
                T.StructField(f["name"], avro_to_spark_type(f["type"]), True)
                for f in node["fields"]
            ]
        )
    if kind == "array":
        return T.ArrayType(avro_to_spark_type(node["items"]), True)
    if kind == "map":
        return T.MapType(T.StringType(), avro_to_spark_type(node["values"]), True)
    raise ValueError(f"unsupported avro type: {kind!r}")


def decode_value(cur: _Cursor, schema):
    kind, node = _named(schema)
    if kind == "null":
        return None
    if kind == "boolean":
        return cur.boolean()
    if kind in ("int", "long"):
        return cur.long()
    if kind == "float":
        return cur.float_()
    if kind == "double":
        return cur.double()
    if kind == "bytes":
        return cur.bytes_()
    if kind == "string":
        return cur.string()
    if kind == "fixed":
        return cur.raw(node["size"])
    if kind == "enum":
        # explicit bounds check: Python's negative indexing would
        # silently map a corrupt index of -1 to the LAST symbol —
        # wrong data, no error
        i = cur.long()
        symbols = node["symbols"]
        if not 0 <= i < len(symbols):
            raise ValueError(f"avro enum index {i} out of range")
        return symbols[i]
    if kind == "union":
        i = cur.long()
        if not 0 <= i < len(node):  # same negative-index trap as enum
            raise ValueError(f"avro union branch {i} out of range")
        return decode_value(cur, node[i])
    if kind == "record":
        return {f["name"]: decode_value(cur, f["type"]) for f in node["fields"]}
    if kind == "array":
        out = []
        while True:
            n = cur.long()
            if n == 0:
                break
            if n < 0:
                cur.long()  # block byte size — unused for sequential decode
                n = -n
            if n > _MAX_BLOCK_ITEMS:
                raise ValueError(f"avro array block count {n} exceeds limit")
            out.extend(decode_value(cur, node["items"]) for _ in range(n))
        return out
    if kind == "map":
        out = {}
        while True:
            n = cur.long()
            if n == 0:
                break
            if n < 0:
                cur.long()
                n = -n
            if n > _MAX_BLOCK_ITEMS:
                raise ValueError(f"avro map block count {n} exceeds limit")
            for _ in range(n):
                # key must decode before the value (assignment would
                # evaluate the right-hand side first)
                k = cur.string()
                out[k] = decode_value(cur, node["values"])
        return out
    raise ValueError(f"unsupported avro type: {kind!r}")


def iter_records(data: bytes) -> Iterator[dict]:
    """Decode every record of one container file (header + data blocks)."""
    schema, codec, sync, pos = parse_header(data)
    if codec not in ("null", "deflate"):
        raise ValueError(
            f"avro codec {codec!r} not supported by the fallback decoder "
            "(install spark-avro for snappy/zstandard containers)"
        )
    cur = _Cursor(data, pos)
    while not cur.at_end():
        n_records = cur.long()
        if n_records < 0 or n_records > _MAX_BLOCK_ITEMS:
            # a negative count would make range() silently skip the
            # block (dropped records, no error); a huge one with a
            # zero-width schema would yield it 2^60 times
            raise ValueError(f"avro block record count {n_records} invalid")
        block = cur.raw(cur.long())
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate, no zlib header
        if cur.raw(16) != sync:
            raise ValueError("avro sync marker mismatch (corrupt block)")
        bcur = _Cursor(block)
        for _ in range(n_records):
            yield decode_value(bcur, schema)


def read_avro_schema(
    spark: SparkSession, paths: str | Sequence[str], **options
) -> T.StructType:
    """Writer schema of the lexicographically-first container file, as a
    Spark schema.

    Two cheap passes so inference never reads every file's bytes: a
    paths-only scan picks min(path) (column pruning drops ``content``, so
    the listing reads no file data), then ONLY that one file's content is
    loaded.  The min-path choice makes the inferred schema deterministic
    across runs; with schema evolution across files, records decode with
    their OWN writer schema but only the inferred file's fields are
    projected — pass ``schema=`` explicitly to read a union of fields."""
    min_path = (
        _binary_scan(spark, paths, **options)
        .agg(F.min("path").alias("p"))
        .collect()[0]["p"]
    )
    if min_path is None:
        raise FileNotFoundError(f"no avro files under {paths!r}")
    first = _binary_scan(spark, [min_path]).select("content").collect()
    schema, _, _, _ = parse_header(bytes(first[0]["content"]))
    spark_type = avro_to_spark_type(schema)
    if not isinstance(spark_type, T.StructType):
        spark_type = T.StructType([T.StructField("value", spark_type, True)])
    return spark_type


def _binary_scan(spark: SparkSession, paths: str | Sequence[str], **options) -> DataFrame:
    reader = spark.read.format("binaryFile")
    if options:
        # scan-level options the native source would honour (pathGlobFilter,
        # recursiveFileLookup, modifiedAfter/Before, ...) apply to the
        # binaryFile scan; avro-specific reader options have no equivalent
        reader = reader.options(**{k: str(v) for k, v in options.items()})
    if isinstance(paths, str):
        paths = [paths]
    return reader.load(list(paths))


_METADATA_TYPE = T.StructType(
    [
        T.StructField("file_path", T.StringType()),
        T.StructField("file_name", T.StringType()),
        T.StructField("file_size", T.LongType()),
        T.StructField("file_modification_time", T.TimestampType()),
    ]
)


def read_avro(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: T.StructType | None = None,
    with_metadata: bool = False,
    **options,
) -> DataFrame:
    """readAvroContainer without spark-avro: distributed per-file decode.

    ``with_metadata=True`` carries a ``_metadata`` struct equivalent to the
    native scan's hidden column (file_path/file_name/file_size/
    file_modification_time, from the binaryFile row) through the decode so
    A6 enrichment works on the fallback path too."""
    out_schema = schema or read_avro_schema(spark, paths, **options)
    names = out_schema.fieldNames()
    if with_metadata:
        out_schema = T.StructType(
            list(out_schema.fields) + [T.StructField("_metadata", _METADATA_TYPE)]
        )

    def _decode(batches):
        import os

        import pandas as pd

        for pdf in batches:
            for i, content in enumerate(pdf["content"]):
                rows = list(iter_records(bytes(content)))
                if rows and not isinstance(rows[0], dict):
                    rows = [{"value": v} for v in rows]  # non-record top level
                cols = {n: [r.get(n) for r in rows] for n in names}
                if with_metadata:
                    path = pdf["path"].iloc[i]
                    meta = {
                        "file_path": path,
                        "file_name": os.path.basename(path),
                        "file_size": int(pdf["length"].iloc[i]),
                        "file_modification_time": pdf["modificationTime"].iloc[i],
                    }
                    cols["_metadata"] = [meta] * len(rows)
                yield pd.DataFrame(cols, columns=list(out_schema.fieldNames()))

    scan_cols = ["path", "length", "modificationTime", "content"] if with_metadata else ["content"]
    return (
        _binary_scan(spark, paths, **options)
        .select(*scan_cols)
        .mapInPandas(_decode, schema=out_schema)
    )
