"""External fixed schema + sanitize-to-schema (SURVEY §1.2, §2 B2).

The reference's data model: a fixed, externally declared schema (Solr
``schema.xml``) with a required unique key (ml/SolrLocator.java:177-184),
static fields, pattern-typed **dynamic fields** (``<dynamicField
name="ignored_*" .../>``), and ``multiValued`` fields (arrays).  Documents are
projected down to the schema by ``sanitizeUnknownSolrFields`` — unknown fields
are dropped, or renamed to ``renameToPrefix + name``
(ml/SanitizeUnknownSolrFieldsBuilder.java:79-94).

Here the schema is a plain dataclass; sanitize is a pure projection
(``select`` + ``withColumnsRenamed``) so Catalyst folds it into column pruning
at the scan — at 100 TB the dropped columns are never read off disk.
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass, field as dc_field

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

_TYPE_ALIASES: dict[str, T.DataType] = {
    # Solr fieldType class → Spark type (SURVEY §1.3 table)
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
    "int": T.IntegerType(),
    "tint": T.IntegerType(),
    "long": T.LongType(),
    "tlong": T.LongType(),
    "float": T.FloatType(),
    "tfloat": T.FloatType(),
    "double": T.DoubleType(),
    "tdouble": T.DoubleType(),
    "date": T.TimestampType(),
    "tdate": T.TimestampType(),
    "text_en": T.StringType(),
    "text_general": T.StringType(),
    "lowercase": T.StringType(),
    "text_fr": T.StringType(),
    "text_de": T.StringType(),
    "text_es": T.StringType(),
    "text_it": T.StringType(),
    "text_pt": T.StringType(),
    "text_sv": T.StringType(),
    "text_no": T.StringType(),
    "text_da": T.StringType(),
    "text_nl": T.StringType(),
    "text_fi": T.StringType(),
    "text_ru": T.StringType(),
    "text_ro": T.StringType(),
    "text_hu": T.StringType(),
    "text_tr": T.StringType(),
    # round 8: the remainder of the reference's declared text_* types
    "text_ar": T.StringType(),
    "text_bg": T.StringType(),
    "text_ca": T.StringType(),
    "text_cz": T.StringType(),
    "text_el": T.StringType(),
    "text_greek": T.StringType(),
    "text_eu": T.StringType(),
    "text_fa": T.StringType(),
    "text_ga": T.StringType(),
    "text_gl": T.StringType(),
    "text_hi": T.StringType(),
    "text_hy": T.StringType(),
    "text_id": T.StringType(),
    "text_lv": T.StringType(),
    "text_th": T.StringType(),
    "text_ws": T.StringType(),
    "text_char_norm": T.StringType(),
    "text_cjk": T.StringType(),
    "text_en_splitting": T.StringType(),
    "text_en_splitting_tight": T.StringType(),
    "text_general_rev": T.StringType(),
    # spatial (solr.LatLonType / PointType — declared in the reference's
    # schemas, minimr/conf/schema.xml fieldTypes location/point, never
    # exercised by its tests; SURVEY §1.3): a plain (lat, lon) struct —
    # bounding-box queries are two range predicates, fully pushdown-able
    "latlon": T.StructType(
        [T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]
    ),
    "point": T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
    ),
}


def within_box(
    col: str | F.Column,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
) -> F.Column:
    """Bounding-box predicate over a ``latlon`` struct column — the Solr
    spatial bbox filter as two range predicates (both reach the parquet
    scan as pushed filters; no geo library needed for rectangles)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        (c["lat"] >= lat_min)
        & (c["lat"] <= lat_max)
        & (c["lon"] >= lon_min)
        & (c["lon"] <= lon_max)
    )


EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius, Solr's default


def geo_distance_km(
    col: str | F.Column, lat: float, lon: float
) -> F.Column:
    """Great-circle distance (km) from a ``latlon`` struct column to a
    fixed point — the Solr ``geodist()`` function (haversine over the
    mean Earth radius, Solr's own model).  Pure JVM trigonometry in one
    codegen expression; composes as a filter (``{!geofilt}``), a sort
    key, or a returned pseudo-field."""
    c = F.col(col) if isinstance(col, str) else col
    lat1, lat2 = F.radians(c["lat"]), F.radians(F.lit(float(lat)))
    dlat = F.radians(F.lit(float(lat)) - c["lat"]) / 2
    dlon = F.radians(F.lit(float(lon)) - c["lon"]) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(lat1) * F.cos(lat2) * F.sin(dlon) * F.sin(dlon)
    )
    # clamp: near-antipodal points can round a epsilon past 1.0, and
    # asin(>1) is NaN — which would silently DROP rows from a radius
    # filter (Lucene's haversin clamps the same way)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(
        F.least(F.sqrt(a), F.lit(1.0))
    )


def within_radius(
    col: str | F.Column, lat: float, lon: float, km: float
) -> F.Column:
    """Solr ``{!geofilt pt=lat,lon d=km}``: true where the point lies
    within ``km`` of the centre (haversine)."""
    return geo_distance_km(col, lat, lon) <= F.lit(float(km))


def spark_type(name: str | T.DataType) -> T.DataType:
    if isinstance(name, T.DataType):
        return name
    if name in _TYPE_ALIASES:
        return _TYPE_ALIASES[name]
    return T._parse_datatype_string(name)  # e.g. "array<long>"


@dataclass(frozen=True)
class Field:
    name: str
    type: str | T.DataType = "string"
    multi_valued: bool = False
    required: bool = False
    indexed: bool = True
    stored: bool = True

    @property
    def spark_type(self) -> T.DataType:
        base = spark_type(self.type)
        return T.ArrayType(base) if self.multi_valued else base


@dataclass(frozen=True)
class DynamicField:
    """Pattern-typed field (``ignored_*`` etc.).  ``ignored=True`` fields are
    dropped on sanitize (schema.xml type ``ignored``: unindexed, unstored)."""

    pattern: str
    type: str | T.DataType = "string"
    multi_valued: bool = False
    ignored: bool = False

    def matches(self, name: str) -> bool:
        return fnmatch.fnmatchcase(name, self.pattern)


@dataclass(frozen=True)
class IndexSchema:
    """The fixed external schema the artifact is built against."""

    fields: tuple[Field, ...]
    unique_key: str = "id"
    dynamic_fields: tuple[DynamicField, ...] = dc_field(default_factory=tuple)

    def __post_init__(self) -> None:
        if not any(f.name == self.unique_key for f in self.fields):
            raise ValueError(
                f"schema must declare its unique key field {self.unique_key!r} "
                "(reference: SolrLocator.java:177-184)"
            )

    def field_or_none(self, name: str) -> Field | DynamicField | None:
        """Static-first, then dynamic-pattern lookup — mirrors Solr's
        ``IndexSchema.getFieldOrNull`` resolution used by sanitize."""
        for f in self.fields:
            if f.name == name:
                return f
        for d in self.dynamic_fields:
            if d.matches(name):
                return d
        return None

    def sanitize(self, df: DataFrame, rename_prefix: str | None = None) -> DataFrame:
        """Project a DataFrame down to this schema (B2).

        Unknown columns are dropped, or renamed ``rename_prefix + name`` when
        a prefix is given AND the renamed name resolves in the schema —
        matching SanitizeUnknownSolrFieldsBuilder (rename only works when an
        ``ignored_*``-style dynamicField catches the new name).
        """
        keep: list[F.Column] = []
        for name in df.columns:
            resolved = self.field_or_none(name)
            if resolved is not None:
                if isinstance(resolved, DynamicField) and resolved.ignored:
                    continue
                keep.append(F.col(name))
                continue
            if rename_prefix:
                renamed = rename_prefix + name
                target = self.field_or_none(renamed)
                if target is not None and not (
                    isinstance(target, DynamicField) and target.ignored
                ):
                    keep.append(F.col(name).alias(renamed))
        return df.select(keep)

    def apply_types(self, df: DataFrame) -> DataFrame:
        """Cast present schema columns to their declared Spark types."""
        casts = {}
        for f in self.fields:
            if f.name in df.columns:
                casts[f.name] = F.col(f.name).cast(f.spark_type)
        return df.withColumns(casts) if casts else df

    def struct_type(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(f.name, f.spark_type, nullable=not f.required)
                for f in self.fields
            ]
        )
