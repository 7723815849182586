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

Mutation: ``merge_into`` and ``delete_where`` DELTA-MAINTAIN the sidecar
(:func:`prepare_stats_delta`): n_docs/sum_dl/n_dl are adjusted by the
touched shards' before/after difference and the term dictionary gets a
df-delta merge — the incremental path scans only the touched shards plus
the (small) stored vocabulary, never the corpus.  ``compact`` preserves it
unchanged (content is identical).  Invalidation (queries fall back to
computing stats) remains the fallback when a sidecar is found incomplete.
At 100 TB this is the difference between a 1 GB batch paying a 1 GB stats
pass and paying a 100 TB one.
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
        n_docs, sum_dl, n_dl = _field_aggregates(idx, tokens_col)
        stats[field] = {"n_docs": n_docs, "sum_dl": sum_dl, "n_dl": n_dl}
        (
            _term_df(idx, tokens_col, "df")
            .write.mode("overwrite")
            .parquet(fs_join(path, f"{VOCAB_DIR}/{field}"))
        )
    fs.write_text(fs_join(path, STATS), json.dumps(stats))
    return stats


def _field_aggregates(df, tokens_col: str) -> tuple[int, int, int]:
    """(n_docs, sum_dl, n_dl) of one token column over ``df``."""
    row = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.col(tokens_col))).alias("sum_dl"),
        F.count(F.size(F.col(tokens_col))).alias("n_dl"),
    ).collect()[0]
    return (int(row["n_docs"]), int(row["sum_dl"] or 0), int(row["n_dl"]))


def _term_df(df, tokens_col: str, out_name: str):
    return (
        df.select(F.explode(F.array_distinct(F.col(tokens_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias(out_name))
    )


def prepare_stats_delta(spark: SparkSession, path: str, old_subset, new_subset):
    """O(touched) delta maintenance for a touched-shard rewrite (the
    ``merge_into`` path).  ``old_subset`` is the artifact content of the
    touched shards BEFORE the swap (still readable); ``new_subset`` is the
    rewritten content (read back from the staging dir, already
    materialized).  All scans run HERE, pre-swap:

    - per analyzed field, ``stats' = stats - agg(old) + agg(new)`` (exact
      integer arithmetic — identical to a full rebuild by associativity of
      count/sum);
    - the term dictionary gets a df-delta merge: ``df'(t) = df_stored(t)
      - df_old(t) + df_new(t)``, terms reaching 0 dropped — written to a
      ``<field>__pending`` staging dir inside ``_vocab/``.

    Returns a ``finalize()`` closure to call AFTER the artifact swap; it
    promotes the pending vocab dirs (rename-aside, crash-safe: the old
    vocab survives in a trash dir until the new one is in place) and writes
    the updated ``_SEARCH_STATS.json``.  Returns None when the artifact has
    no (complete) stats sidecar — the caller should fall back to
    ``write_search_stats`` or skip.

    Crash window: the stats file and the vocab dirs are two objects, so a
    crash inside ``finalize`` can leave new vocab with old scalar stats (a
    small score skew, not a wrong result set).  ``write_search_stats``
    repairs it; a mutation that crashed mid-operation needs operator
    attention anyway (the artifact swap itself is the earlier, bigger
    non-atomic step)."""
    from solr_map_reduce_spark.fs import get_fs
    from solr_map_reduce_spark.fs import join as fs_join
    from solr_map_reduce_spark.indexing import MANIFEST

    fs = get_fs(path, spark)
    stats = load_search_stats(spark, path)
    if not stats:
        return None
    manifest = json.loads(fs.read_text(fs_join(path, MANIFEST)))
    analyzed: dict = manifest.get("analyzed", {})
    if not analyzed or set(stats) != set(analyzed):
        return None  # sidecar out of step with the schema: full rebuild
    for field in analyzed:
        if not fs.exists(fs_join(path, f"{VOCAB_DIR}/{field}")):
            return None  # vocab missing (corrupt/partial): full rebuild

    new_stats: dict = {}
    pending: list[str] = []
    for field, info in analyzed.items():
        tokens_col = info["tokens_col"]
        o = _field_aggregates(old_subset, tokens_col)
        n = _field_aggregates(new_subset, tokens_col)
        s = stats[field]
        new_stats[field] = {
            "n_docs": int(s["n_docs"]) - o[0] + n[0],
            "sum_dl": int(s["sum_dl"]) - o[1] + n[1],
            "n_dl": int(s["n_dl"]) - o[2] + n[2],
        }
        vocab = spark.read.parquet(fs_join(path, f"{VOCAB_DIR}/{field}"))
        delta = _term_df(old_subset, tokens_col, "_df_old").join(
            _term_df(new_subset, tokens_col, "_df_new"), "term", "full_outer"
        )
        merged = (
            vocab.join(delta, "term", "full_outer")
            .select(
                "term",
                (
                    F.coalesce(F.col("df"), F.lit(0))
                    - F.coalesce(F.col("_df_old"), F.lit(0))
                    + F.coalesce(F.col("_df_new"), F.lit(0))
                ).alias("df"),
            )
            .filter(F.col("df") > 0)
        )
        # materialize NOW (reads old shard files + stored vocab, both of
        # which move/disappear at swap time)
        merged.write.mode("overwrite").parquet(
            fs_join(path, f"{VOCAB_DIR}/{field}__pending")
        )
        pending.append(field)

    def finalize() -> dict:
        trash = fs_join(path, VOCAB_DIR, "__trash")
        if fs.exists(trash):
            fs.delete(trash)
        fs.mkdirs(trash)
        for field in pending:
            cur = fs_join(path, f"{VOCAB_DIR}/{field}")
            if fs.exists(cur):
                fs.rename(cur, fs_join(trash, field))
            fs.rename(fs_join(path, f"{VOCAB_DIR}/{field}__pending"), cur)
        fs.delete(trash)
        fs.write_text(fs_join(path, STATS), json.dumps(new_stats))
        return new_stats

    return finalize


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
