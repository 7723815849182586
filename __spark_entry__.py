"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full reference pipeline shape (ingest →
key → sanitize → route → dedup → sorted sharded artifact) on sf0.001, summarized
per shard.  ``queries()``/``oracle_sql()`` — the declared query surface from
SURVEY.md §2 with DuckDB oracles (solr_map_reduce_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMOKE = "/root/testdata/sf0.001"

_SHIPPED_SESSIONS: set[int] = set()


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Pandas UDFs unpickle by module reference, so the harness session's
    Python workers must be able to import ``solr_map_reduce_spark`` — even
    when the session was NOT created by our ``get_spark`` (which handles
    this via PYTHONPATH).  ``addPyFile`` with a zip of the package
    propagates to workers of an already-running session."""
    key = id(spark)
    if key in _SHIPPED_SESSIONS:
        return
    # a harness-created session may lack the engine defaults; these two are
    # runtime-settable and keep timestamp semantics identical to a DuckDB
    # oracle reading the same parquet: UTC session tz (epoch arithmetic
    # must not cross a DST-observing zone) and instant-typed reads of
    # untimezoned parquet timestamps (event-time ops reject NTZ)
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass  # immutable conf on some session types; load_table still copes
    repo = os.path.dirname(os.path.abspath(__file__))
    os.environ["PYTHONPATH"] = (
        repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    )
    try:
        import zipfile

        zip_path = os.path.join(tempfile.gettempdir(), "smrs_pkg.zip")
        pkg = os.path.join(repo, "solr_map_reduce_spark")
        sources = [
            os.path.join(dirpath, fn)
            for dirpath, _dirnames, filenames in os.walk(pkg)
            for fn in filenames
            if fn.endswith(".py")
        ]
        newest = max(os.path.getmtime(f) for f in sources)
        # rebuild when any source is newer than the zip — a cached stale zip
        # would ship outdated code to the workers of a foreign session
        if not os.path.exists(zip_path) or os.path.getmtime(zip_path) <= newest:
            tmp = f"{zip_path}.{os.getpid()}.tmp"
            with zipfile.ZipFile(tmp, "w") as zf:
                for full in sources:
                    zf.write(full, os.path.relpath(full, repo))
            os.replace(tmp, zip_path)
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # PYTHONPATH fallback above still covers driver-spawned workers
    _SHIPPED_SESSIONS.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the sharded/deduped/key-sorted index artifact from the
    sf0.001 documents table and return the per-shard summary."""
    import pyspark.sql.functions as F

    _ensure_workers_can_import(spark)

    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig, read_index
    from solr_map_reduce_spark.schema import Field, IndexSchema

    schema = IndexSchema(
        fields=(
            Field("id", "string", required=True),
            Field("text", "text_en"),
            Field("lang", "string"),
            Field("source", "string"),
            Field("n_chars", "long"),
        ),
        unique_key="id",
    )
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").withColumn(
        "id", F.col("doc_id").cast("string")
    )
    job = IndexJob(
        IndexJobConfig(
            schema=schema,
            shards=4,
            micro_shards=16,
            dedup="retain_most_recent",
            order_field="n_chars",
            tiebreak=("id",),
        )
    )
    out = os.path.join(tempfile.mkdtemp(prefix="smrs_entry_"), "index")
    job.build(docs, out)
    idx = read_index(spark, out)
    return (
        idx.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        .orderBy("shard")
    )


# Rotating verdict window (the harness checks the first 50 registry
# entries per round), r07 rotation — exactly the r06 verdict's ask: lead
# with (a) the 16 entries lacking a CURRENT driver-green row — the 7
# r6-new queries (never externally checked), the 8-entry cohort whose
# last check is r04, and ext_cosine_pairs_lsh (its all-pairs exact
# oracle landed AFTER its last driver check, so it is green only as
# no_oracle); then (b) entries NEW this round (r7) so they get a
# first-class external check immediately; then (c) the 47-entry cohort
# last checked in r05, in its r05 order (the first ~32 fit; the
# overflow — plus everything r06-checked — leads the r08 rotation).
# The repo's own oracle suite covers all entries every pytest run
# regardless (tests/test_queries_oracle.py).
_VERDICT_PRIORITY = [
    # (a1) r6-new, never externally checked
    "c9_boolean_query", "c9_fielded_query", "c9_range_query",
    "c9_search_request", "c9_facet_query", "ext_bm25_filtered",
    "ext_chunk_docs",
    # (a2) last checked r04
    "ext_ivf_topk", "ext_passage_dedup", "ext_knn_join", "ext_pq_topk",
    "ext_ivfpq_topk", "b6_extract_json", "ext_knn_classify",
    "ext_source_cap",
    # (a3) oracle added after last driver check
    "ext_cosine_pairs_lsh",
    # (b) new in r7
    "c9_phrase_slop", "c9_date_range", "c9_boosted_query",
    "c9_fuzzy_query", "c9_field_group",
    # (c) last checked r05, r05 order (overflow + r06 cohort lead r08)
    "c2_segment_lookup", "c2_key_range", "ext_pixel_stats",
    "ext_url_dedup", "ext_c4_clean", "ext_spatial_bbox",
    "c6_atomic_update", "ext_hash_split", "c1_count_all",
    "c2_point_lookup", "c3_delete_by_query", "c4_sort_page",
    "c5_projection", "c6_upsert_latest", "a10_dedup_retain_most_recent",
    "a11_dedup_sort_updates", "a12_collision_report", "b3_sequence_key",
    "b2_sanitize_fields", "b4_tokenize_general", "b4_tokenize_lowercase",
    "c7_segment_contract", "a8_routing_shards", "ext_decontaminate",
    "q4_order_priority", "q14_promo_revenue", "q18_large_orders",
    "facet_cube_counts", "agg_distinct_users",
]


def _ordered_names() -> list[str]:
    from solr_map_reduce_spark.queries import registry

    names = list(registry().keys())
    lead = [n for n in _VERDICT_PRIORITY if n in names]
    return lead + [n for n in names if n not in set(lead)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from solr_map_reduce_spark.queries import registry

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_workers_can_import(spark)
            return fn(spark, sf_dir)

        return run

    reg = registry()
    return {name: _wrap(reg[name].spark) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    from solr_map_reduce_spark.queries import registry

    reg = registry()
    return {
        name: reg[name].oracle
        for name in _ordered_names()
        if reg[name].oracle is not None
    }
