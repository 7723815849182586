"""Stored BM25 corpus statistics — serve ranking from the artifact.

Lucene keeps per-field collection statistics (doc count, total term
frequency) and a term dictionary with document frequencies; BM25 serving
reads them instead of re-aggregating the corpus per query.  This sidecar
gives the parquet artifact the same property:

    out/_SEARCH_STATS.json      {field: {n_docs, sum_dl, n_dl}}
    out/_vocab/<field>/         parquet (term, df)   [underscore dir —
                                 invisible to the artifact's own scans]

Build: one pass over the stored token column — ``n_docs`` (all rows),
``sum_dl``/``n_dl`` (token-array lengths), and the term dictionary via
``explode(array_distinct) → groupBy(term).count()``.

Query: ``SearchIndex.bm25`` reads the |Q| needed df values with a
predicate-pushdown vocab scan and embeds all statistics as literals — the
query plan is then ONE corpus pass + TakeOrdered, with no stats aggregate
and no checkpoint.  Scores are bit-identical to the computed path: every
stored quantity is an integer (exact in IEEE doubles), and
``avgdl = sum_dl / n_dl`` is exactly what ``avg(dl)`` evaluates to.

Mutation: ``merge_into``/``delete_where`` change global statistics, so the
sidecar is deleted on mutation (queries fall back to computing stats);
rebuild with :func:`write_search_stats` after a batch of mutations.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

STATS = "_SEARCH_STATS.json"
VOCAB_DIR = "_vocab"


def write_search_stats(spark: SparkSession, path: str) -> dict | None:
    """Compute and persist BM25 statistics + the term dictionary for every
    analyzed field of the artifact at ``path``.  Returns the stats dict
    (None when the artifact has no analyzed fields)."""
    from solr_map_reduce_spark.fs import get_fs
    from solr_map_reduce_spark.fs import join as fs_join
    from solr_map_reduce_spark.indexing import MANIFEST, read_index

    fs = get_fs(path, spark)
    manifest = json.loads(fs.read_text(fs_join(path, MANIFEST)))
    analyzed: dict = manifest.get("analyzed", {})
    if not analyzed:
        return None
    idx = read_index(spark, path)
    stats: dict = {}
    for field, info in analyzed.items():
        tokens_col = info["tokens_col"]
        row = idx.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.col(tokens_col))).alias("sum_dl"),
            F.count(F.size(F.col(tokens_col))).alias("n_dl"),
        ).collect()[0]
        stats[field] = {
            "n_docs": int(row["n_docs"]),
            "sum_dl": int(row["sum_dl"] or 0),
            "n_dl": int(row["n_dl"]),
        }
        (
            idx.select(F.explode(F.array_distinct(F.col(tokens_col))).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .write.mode("overwrite")
            .parquet(fs_join(path, f"{VOCAB_DIR}/{field}"))
        )
    fs.write_text(fs_join(path, STATS), json.dumps(stats))
    return stats


def load_search_stats(spark: SparkSession, path: str) -> dict | None:
    from solr_map_reduce_spark.fs import get_fs
    from solr_map_reduce_spark.fs import join as fs_join

    fs = get_fs(path, spark)
    full = fs_join(path, STATS)
    if not fs.exists(full):
        return None
    return json.loads(fs.read_text(full))


def drop_search_stats(spark: SparkSession, path: str) -> None:
    """Invalidate after a mutation — stale global statistics would silently
    skew scores, so queries must fall back to computing them."""
    from solr_map_reduce_spark.fs import get_fs
    from solr_map_reduce_spark.fs import join as fs_join

    fs = get_fs(path, spark)
    for sub in (STATS, VOCAB_DIR):
        full = fs_join(path, sub)
        if fs.exists(full):
            fs.delete(full)


def term_dfs(
    spark: SparkSession, path: str, field: str, terms: list[str]
) -> dict[str, int]:
    """df for each query term from the stored vocabulary — a |terms|-row
    predicate-pushdown scan of the term dictionary; absent terms get 0."""
    from solr_map_reduce_spark.fs import join as fs_join

    vocab = spark.read.parquet(fs_join(path, f"{VOCAB_DIR}/{field}"))
    rows = vocab.filter(F.col("term").isin(list(terms))).collect()
    out = {t: 0 for t in terms}
    out.update({r["term"]: int(r["df"]) for r in rows})
    return out
