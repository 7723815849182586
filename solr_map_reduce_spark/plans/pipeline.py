"""Morphline-style pipeline compiler (SURVEY §3.3).

The reference compiles a HOCON config into a linked chain of ``Command``
objects, each processing records synchronously
(mr/morphline/MorphlineMapRunner.java:99-170; command chain = IR).  The Spark
analog: a declarative list of command dicts compiled into a chain of
DataFrame transformations — the DataFrame plan IS the IR, and Catalyst
optimizes across command boundaries (e.g. a ``sanitize`` projection pushes
column pruning into the upstream scan, which the reference cannot do).

Supported commands (morphline name → here):

| morphline                    | spec op               |
|------------------------------|-----------------------|
| readAvroContainer/readCSV/...| handled by sources.read_input (B5-B10) |
| extractAvroPaths (B6)        | ``extract_paths``     |
| extractAvroTree (B7)         | ``flatten``           |
| sanitizeUnknownSolrFields(B2)| ``sanitize``          |
| generateSolrSequenceKey (B3) | ``generate_key``      |
| convertTimestamp (B8)        | ``convert_timestamp`` |
| tokenizeText (B4)            | ``tokenize``          |
| setValues (B16)              | ``set_values``        |
| generateUUID (B17)           | ``generate_uuid``     |
| java / arbitrary UDF (B18)   | ``transform`` (callable) |
| separateAttachments (B14)    | ``explode``           |
| tryRules (B15)               | ``when_rules``        |
| logDebug (B19)               | ``observe``           |
| loadSolr (B1)                | terminal — IndexJob.write |
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame

from solr_map_reduce_spark.functions.analyzers import tokenize_text
from solr_map_reduce_spark.functions.timestamps import (
    SOLR_OUTPUT_FORMAT,
    convert_timestamp,
    parse_timestamp,
)
from solr_map_reduce_spark.operators.keys import generate_sequence_key
from solr_map_reduce_spark.schema import IndexSchema

Transform = Callable[[DataFrame], DataFrame]


def _flatten_schema(schema: T.StructType, prefix: str = "") -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        if isinstance(f.dataType, T.StructType):
            out.extend(_flatten_schema(f.dataType, path + "."))
        else:
            out.append((path, path.replace(".", "_")))
    return out


def op_extract_paths(paths: dict[str, str]) -> Transform:
    """extractAvroPaths: ``{out_field: "/a/b"}`` path expressions → columns
    (tutorialReadAvroContainer.conf:72-102; '/' descends structs)."""

    def _t(df: DataFrame) -> DataFrame:
        cols = []
        for out, path in paths.items():
            dotted = path.strip("/").replace("/", ".")
            cols.append(F.col(dotted).alias(out))
        return df.select(cols)

    return _t


def op_flatten() -> Transform:
    """extractAvroTree: recursively flatten nested structs into ``a_b_c``
    columns (solrCellDocumentTypes.conf:138)."""

    def _t(df: DataFrame) -> DataFrame:
        flat = _flatten_schema(df.schema)
        return df.select([F.col(p).alias(n) for p, n in flat])

    return _t


def op_sanitize(schema: IndexSchema, rename_prefix: str | None = None) -> Transform:
    return lambda df: schema.sanitize(df, rename_prefix)


def op_generate_key(base_id_col: str, key: str = "id", **kw) -> Transform:
    return lambda df: generate_sequence_key(df, base_id_col, key=key, **kw)


def op_convert_timestamp(
    field: str,
    input_formats: tuple[str, ...] = ("yyyy-MM-dd'T'HH:mm:ss'Z'",),
    input_timezone: str | None = None,
    output_format: str = SOLR_OUTPUT_FORMAT,
    output_timezone: str | None = None,
) -> Transform:
    """convertTimestamp (B8); ``output_timezone`` shifts the formatted wall
    clock like the morphline's outputTimezone
    (tutorialReadAvroContainer.conf:113-119)."""

    def _t(df: DataFrame) -> DataFrame:
        col = parse_timestamp(F.col(field), input_formats, input_timezone)
        if output_timezone and output_timezone.upper() != "UTC":
            col = F.from_utc_timestamp(col, output_timezone)
        return df.withColumn(field, F.date_format(col, output_format))

    return _t


def op_tokenize(input_field: str, output_field: str, analyzer: str = "text_general") -> Transform:
    return lambda df: tokenize_text(df, input_field, output_field, analyzer)


def op_rename_positional(names: list[str]) -> Transform:
    """readCSV ``columns``: rename the first N columns positionally (covers
    Spark's header-less ``_c0/_c1`` defaults AND file-header names —
    solrCellDocumentTypes.conf:105-110)."""

    def _t(df: DataFrame) -> DataFrame:
        current = df.columns
        if len(names) > len(current):
            raise ValueError(
                f"readCSV columns gives {len(names)} names but the input has "
                f"only {len(current)} columns"
            )
        mapping = dict(zip(current, names))
        return df.select(
            [F.col(c).alias(mapping.get(c, c)) for c in current]
        )

    return _t


def op_set_values(values: dict[str, object]) -> Transform:
    def _t(df: DataFrame) -> DataFrame:
        out = df
        for k, v in values.items():
            out = out.withColumn(k, v if isinstance(v, Column) else F.lit(v))
        return out

    return _t


def op_generate_uuid(field: str = "id") -> Transform:
    return lambda df: df.withColumn(field, F.expr("uuid()"))


def op_explode(field: str) -> Transform:
    """separateAttachments: one record per element (B14)."""
    return lambda df: df.withColumn(field, F.explode_outer(F.col(field)))


def op_when_rules(rules: list[tuple[Column, Transform]], otherwise: Transform | None = None) -> Transform:
    """tryRules (B15): route rows through the first matching rule's pipeline;
    compiled as per-branch filtered pipelines unioned back together."""

    def _t(df: DataFrame) -> DataFrame:
        remaining = df
        outputs = []
        for cond, transform in rules:
            matched = remaining.filter(cond)
            remaining = remaining.filter(~F.coalesce(cond, F.lit(False)))
            outputs.append(transform(matched))
        if otherwise is not None:
            outputs.append(otherwise(remaining))
        result = outputs[0]
        for o in outputs[1:]:
            result = result.unionByName(o, allowMissingColumns=True)
        return result

    return _t


def op_observe(name: str, *metrics: Column) -> Transform:
    """logDebug/metrics (B19/A27): attach named observation metrics; read
    them from the QueryExecutionListener or ``Observation`` afterwards."""
    return lambda df: df.observe(name, *(metrics or (F.count(F.lit(1)).alias("n_records"),)))


def op_extract_json(field: str, paths: dict[str, str], drop: bool = True) -> Transform:
    """extractJsonPaths (the kite-morphlines JSON sibling of B6's
    extractAvroPaths): ``{out_field: "/a/b"}`` path expressions evaluated
    against a JSON string column, JVM-side via ``get_json_object`` —
    stays in whole-stage codegen, no UDF.  ``drop`` removes the raw JSON
    column afterwards (sanitize-to-schema stance)."""

    def _t(df: DataFrame) -> DataFrame:
        # one select, every path evaluated against the ORIGINAL column —
        # extract-in-place ({out: path} where out == field) and multiple
        # paths therefore never read an already-replaced value
        exprs = [
            F.get_json_object(F.col(field), "$." + p.strip("/").replace("/", "."))
            .alias(name)
            for name, p in paths.items()
        ]
        keep = [
            F.col(c)
            for c in df.columns
            if c not in paths and not (drop and c == field)
        ]
        return df.select(*keep, *exprs)

    return _t


_OPS: dict[str, Callable[..., Transform]] = {
    "extract_paths": op_extract_paths,
    "extract_json": op_extract_json,
    "flatten": op_flatten,
    "sanitize": op_sanitize,
    "generate_key": op_generate_key,
    "convert_timestamp": op_convert_timestamp,
    "tokenize": op_tokenize,
    "rename_positional": op_rename_positional,
    "set_values": op_set_values,
    "generate_uuid": op_generate_uuid,
    "explode": op_explode,
    "when_rules": op_when_rules,
    "observe": op_observe,
}


@dataclass
class Pipeline:
    """Compiled command chain; apply with ``run(df)``."""

    transforms: list[Transform]

    def run(self, df: DataFrame) -> DataFrame:
        for t in self.transforms:
            df = t(df)
        return df


def compile_pipeline(spec: list[dict | Transform]) -> Pipeline:
    """Compile a list of command dicts ``{"op": name, **params}`` (or raw
    callables, the ``java``-command analog) into a Pipeline."""
    transforms: list[Transform] = []
    for cmd in spec:
        if callable(cmd):
            transforms.append(cmd)
            continue
        params = dict(cmd)
        op = params.pop("op")
        try:
            factory = _OPS[op]
        except KeyError:
            raise ValueError(f"unknown pipeline op {op!r}; known: {sorted(_OPS)}")
        transforms.append(factory(**params))
    return Pipeline(transforms)
