"""Pipeline-spec → DataFrame-transform compiler (SURVEY §3.3)."""

from solr_map_reduce_spark.plans.pipeline import Pipeline, compile_pipeline  # noqa: F401
