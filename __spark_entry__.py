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
        import hashlib
        import zipfile

        pkg = os.path.join(repo, "solr_map_reduce_spark")
        sources = sorted(
            os.path.join(dirpath, fn)
            for dirpath, _dirnames, filenames in os.walk(pkg)
            for fn in filenames
            if fn.endswith(".py")
        )
        # CONTENT-ADDRESSED name — a digest over the full sorted
        # (path, mtime, size) list, not just the newest mtime: a stale
        # cached zip would ship outdated code (deleting a source file,
        # or any change that doesn't raise the max mtime, must produce a
        # NEW name), and rebuilding under one fixed name breaks a live
        # SparkContext's file cache ("exists and does not match
        # contents") when sources change mid-session — a fresh name per
        # source state sidesteps both
        h = hashlib.sha256()
        for f in sources:
            st = os.stat(f)
            h.update(
                f"{os.path.relpath(f, repo)}|{st.st_mtime_ns}|{st.st_size}\n"
                .encode()
            )
        zip_path = os.path.join(
            tempfile.gettempdir(), f"smrs_pkg_{h.hexdigest()[:20]}.zip"
        )
        if not os.path.exists(zip_path):
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
# entries per round), r12 rotation per the r11 verdict's #1 directive,
# recounted from CORRECTNESS_r01..r11 at round start (ledger after
# r11: never-checked 0; cohorts r7=28, r8=50, r9=50, r10=48, r11=50):
# (a) the FULL 28-entry r07-stale cohort — the only thing older than
# r8, four rounds without an external check, including the
# LLM-pipeline staples (ext_passage_dedup, ext_decontaminate,
# ext_knn_join, ext_c4_clean) and the core text-surface queries
# (c9_search_request, c9_fielded_query); (b) 22 of the 50-entry r08
# cohort (alphabetical within the equally-stale cohort) — the
# remaining 28 r08 entries (c9_spellcheck, c9_stats_field,
# c9_stats_percentiles, c9_synonym_query, c9_term_vectors,
# c9_terms_component, c9_terms_filter, c9_wildcard_general,
# ext_bigram_surprisal, ext_dismax_mm, ext_dismax_topk, ext_geofilt,
# ext_hybrid_rrf, ext_mmr_rerank, ext_rerank_query, ext_semdedup,
# ext_sq_topk, ext_stream_complement, ext_stream_hashjoin,
# ext_stream_having, ext_stream_nodes, ext_stream_rollup,
# ext_stream_select_eval, ext_stream_shortest_path,
# ext_stream_sigterms, ext_stream_timeseries, ext_topic_pull,
# ext_unigram_surprisal) lead the r13 rotation.  After this round the
# staleness floor is r8 (28 entries left at r8) and never-checked
# stays 0 (minus any r12-close additions).  The repo's own oracle
# suite covers all entries every pytest run regardless
# (tests/test_queries_oracle.py).
_VERDICT_PRIORITY = [
    # (a) r07-stale cohort, all 28 — unchecked since round 7
    "c7_segment_contract", "c9_facet_query", "c9_field_group",
    "c9_fielded_query", "c9_fuzzy_query", "c9_phrase_slop",
    "c9_range_query", "c9_search_request", "ext_bm25_filtered",
    "ext_c4_clean", "ext_chunk_docs", "ext_cosine_pairs_lsh",
    "ext_decontaminate", "ext_hash_split", "ext_ivf_topk",
    "ext_ivfpq_topk", "ext_knn_classify", "ext_knn_join",
    "ext_passage_dedup", "ext_pixel_stats", "ext_pq_topk",
    "ext_source_cap", "ext_spatial_bbox", "ext_url_dedup",
    "facet_cube_counts", "q14_promo_revenue", "q18_large_orders",
    "q4_order_priority",
    # (b) r08 cohort, 22 of 50 (alphabetical; rest lead r13)
    "c6_atomic_inc", "c9_alias_query", "c9_block_join_child",
    "c9_block_join_parent", "c9_boost_function", "c9_cursor_page",
    "c9_elevated_query", "c9_facet_prefix", "c9_facet_stats",
    "c9_frange", "c9_frange_func", "c9_grouped", "c9_interval_facet",
    "c9_join_query", "c9_leading_wildcard", "c9_multiselect_facet",
    "c9_parsed_boost", "c9_pivot_facet", "c9_qop_and",
    "c9_query_facets", "c9_range_facet", "c9_sort_function",
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
