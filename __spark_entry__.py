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
# entries per round), r10 rotation per the r9 verdict's #1 directive:
# (a) the 21 entries that have NEVER had an external CORRECTNESS row
# (the late-r9 additions the r9 window couldn't fit: the bool/surround/
# complexphrase/spellcheck-collate qparsers, the facet range-other/
# matches long tail, infix suggest, atomic removeregex, the dismax
# pf/boost extensions, the drill/unique/merge/intersect/stats stream
# decorators, the math tier, scoreNodes, and the ML tier
# features/train/classify); then (b) 29 of the 49-entry cohort whose
# last external check is oldest (r06) — TPC-H heads, joins, the dedup
# family, curation.  The remaining 20 r06-stale entries
# (ext_simhash … ext_repetition, listed in the overflow comment below)
# plus any r10 additions lead the r11 rotation, aging out everything
# older than r8 by r11 per the verdict's #7.  The repo's own oracle
# suite covers all entries every pytest run regardless
# (tests/test_queries_oracle.py).
_VERDICT_PRIORITY = [
    # (a) never externally checked — all 21, verbatim from VERDICT r9 #1
    "c9_bool_query", "c9_surround_w", "c9_complex_phrase",
    "c9_spellcheck_collate", "c9_facet_range_other", "c9_facet_matches",
    "c9_suggest_infix", "c6_atomic_removeregex", "ext_dismax_pf",
    "ext_dismax_boost", "ext_stream_drill", "ext_stream_unique",
    "ext_stream_merge", "ext_stream_intersect", "ext_stream_stats",
    "ext_math_describe", "ext_math_regress", "ext_score_nodes",
    "ext_features_ig", "ext_classify", "ext_train_lr",
    # (b) r06-stale cohort, 29 of 49
    "b12_detect_mime", "c9_suggest", "ext_bm25_topk",
    "facet_event_counts", "ext_funnel_conversion",
    "ext_cohort_retention", "facet_range_value",
    "pipeline_etl_events", "window_hourly_counts",
    "q1_pricing_summary", "q3_top_revenue",
    "q5_local_supplier", "q6_revenue_change",
    "exists_big_order_customers", "window_topn_orders", "ext_asof_join",
    "ext_range_join", "skew_salted_join", "star_join_enrich",
    "ext_exact_dedup", "ext_token_count", "ext_curation_pipeline",
    "ext_bpe_token_count", "ext_quality_features", "ext_gopher_rules",
    "ext_lang_id", "ext_fingerprint", "ext_ann_topk", "ext_minhash_dedup",
    # r11 window plan: the 5 r10 additions (c9_surround_n, c9_luke,
    # c9_backup_restore, c9_knn_routed, c9_join_from_index — never
    # externally checked) + the r06-stale
    # overflow (20): ext_simhash, ext_ngram_jaccard, ext_simhash_pairs,
    # ext_cosine_pairs, ext_dedup_clusters, ext_sessionize,
    # c9_contains_all, c9_contains_any, c9_match_phrase,
    # c9_prefix_match, c9_contains_none, c9_term_facet, c9_highlight,
    # ext_quantile_filter, ext_pack_sequences, ext_redact_pii,
    # ext_profile, ext_source_mixture, window_sliding_counts,
    # ext_repetition — then the r07 cohort (oldest-first)
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
