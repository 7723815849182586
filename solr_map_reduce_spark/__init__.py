"""solr_map_reduce_spark — a PySpark-native engine with the query and
data-processing capabilities of RiskIQ/solr-map-reduce.

The reference (/root/reference) is a Hadoop MapReduce driver that builds
sharded, deduplicated, key-sorted Solr/Lucene index artifacts from raw files
(MapReduceIndexerTool.java:116-149: randomize -> extract -> shuffle/index ->
mtree merge -> go-live).  This package re-expresses that dataflow — and the
query surface of the produced artifact — as idiomatic Spark DataFrame plans:

- ``session``            SparkSession factory tuned for the engine
- ``schema``             external fixed schema + sanitize-to-schema (B2)
- ``operators.routing``  SolrCloud-compatible murmur3 shard routing (A8/C8)
- ``operators.dedup``    update-conflict resolvers (A10-A14)
- ``operators.keys``     unique-key enforcement + sequence key synthesis (A7/B3)
- ``operators.metadata`` file-metadata enrichment (A6)
- ``sources``            reader matrix: avro/csv/json/text/parquet/binary (B5-B13)
- ``functions``          analyzers (B4), timestamp conversion (B8)
- ``indexing``           the end-to-end index build pipeline (A17-A21)
- ``plans``              morphline-style pipeline spec -> DataFrame compiler (§3.3)
- ``extensions``         LLM-data-pipeline ops: dedup, similarity, text analysis,
                         multimodal plumbing
- ``streaming``          Structured Streaming ingest (extension; reference is
                         batch-only)

Everything here is derived from public knowledge only: the Apache Spark API and
the reference repo's observable behavior (cited by file:line in docstrings).
"""

__version__ = "0.1.0"

from solr_map_reduce_spark.index_reader import SearchIndex  # noqa: E402
from solr_map_reduce_spark.indexing import (  # noqa: E402
    IndexJob,
    IndexJobConfig,
    compact,
    merge_driver,
    publish,
    read_index,
)
from solr_map_reduce_spark.schema import DynamicField, Field, IndexSchema  # noqa: E402
from solr_map_reduce_spark.session import get_spark  # noqa: E402

__all__ = [
    "DynamicField",
    "Field",
    "IndexJob",
    "IndexJobConfig",
    "IndexSchema",
    "SearchIndex",
    "compact",
    "get_spark",
    "merge_driver",
    "publish",
    "read_index",
    "__version__",
]
