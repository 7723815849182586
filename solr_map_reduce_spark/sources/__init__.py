"""Input sources (SURVEY §2 B5-B13): the reader matrix."""

from solr_map_reduce_spark.sources.readers import read_input  # noqa: F401
