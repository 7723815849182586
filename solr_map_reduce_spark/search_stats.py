"""Stored BM25 corpus statistics — serve ranking from the artifact.

Lucene keeps per-field collection statistics (doc count, total term
frequency) and a term dictionary with document frequencies; BM25 serving
reads them instead of re-aggregating the corpus per query.  This sidecar
gives the parquet artifact the same property:

    out/_SEARCH_STATS.json       {field: {n_docs, sum_dl, n_dl}}
    out/_vocab/_VOCAB_META.json  {n_buckets, hash}
    out/_vocab/<field>/bucket=N/ parquet (term, df), N = crc32(term) %
                                 n_buckets  [underscore dir — invisible
                                 to the artifact's own scans]

Rows are TERM-SORTED within each bucket file (repartition by bucket +
sortWithinPartitions), so parquet row-group min/max statistics turn a
prefix scan (``SearchIndex.suggest`` / autocomplete) into a seek: only
the row groups whose [min, max] overlap the prefix range are read — the
Lucene sorted-term-dictionary/FST-prefix-seek cost model.  Hash
bucketing prunes POINT df lookups to |Q| buckets; in-bucket term order
prunes PREFIX scans within every bucket.  The repartition also yields
one file per bucket dir instead of one per writing task.

Build: one pass over the stored token column — ``n_docs`` (all rows),
``sum_dl``/``n_dl`` (token-array lengths), and the term dictionary via
``explode(array_distinct) → groupBy(term).count()``.

Query: ``SearchIndex.bm25`` reads the |Q| needed df values with a
bucket-partition-pruned + predicate-pushdown vocab scan (the query
terms' buckets are computed driver-side with the same crc32) and embeds
all statistics as literals — the query plan is then ONE corpus pass +
TakeOrdered, with no stats aggregate and no checkpoint.  Scores are
bit-identical to the computed path: every stored quantity is an integer
(exact in IEEE doubles), and ``avgdl = sum_dl / n_dl`` is exactly what
``avg(dl)`` evaluates to.

Mutation: ``merge_into`` and ``delete_where`` DELTA-MAINTAIN the sidecar
(:func:`prepare_stats_delta`): n_docs/sum_dl/n_dl are adjusted by the
touched shards' before/after difference and the term dictionary gets a
df-delta merge that READS and REWRITES only the hash buckets containing
changed terms — the incremental path is O(touched shards + changed-term
buckets) end to end, never O(corpus) and never O(|vocab|).  At 100 TB a
term dictionary is billions of rows; a 1 GB batch touches a bounded set
of buckets instead of rewriting the whole dictionary.  ``compact``
preserves the sidecar unchanged (content is identical).

Crash consistency: ``_SEARCH_STATS.json`` doubles as the COMMIT MARKER.
Every reader gates stored-vocab use on the stats file, so finalize
deletes it FIRST, promotes the vocab buckets, and rewrites it LAST — a
crash anywhere between leaves readers on the computed-stats fallback
(correct scores from the post-swap corpus, merely slower) instead of the
old skew state (new vocab served against old scalars).
``write_search_stats`` repairs a torn sidecar from scratch.
"""

from __future__ import annotations

import json
import zlib

import pyspark.sql.functions as F
from pyspark.sql import Observation, SparkSession

STATS = "_SEARCH_STATS.json"
VOCAB_DIR = "_vocab"
VOCAB_META = "_VOCAB_META.json"
# Legacy/default bucket count: reads of a meta-less vocab dir assume it, and
# callers may pass it explicitly.  WRITES size the count adaptively instead
# (``_auto_buckets``) — a fixed 64 writes 64 near-empty files per field at
# fixture scale and multi-GB bucket files at 100 TB; the right count scales
# with the corpus.  Readers take the count from _VOCAB_META.json, so any
# value is served correctly.
N_VOCAB_BUCKETS = 64
_VOCAB_SCHEMA = "term string, df bigint, bucket int"

# ~bytes of SOURCE artifact per vocab bucket.  The vocab is a sublinear
# projection of the corpus, so this is an order-of-magnitude dial, not a
# file-size promise: 8 MB/bucket puts a ~0.5 GB artifact at the old default
# (64) and covers [floor 8 .. cap 4096] over fixture scale to 100 TB-ish
# estimates.  Env-overridable (deployments with atypically rich vocabularies
# can lower it) — parameterised, not a local[32] constant.
_VOCAB_BUCKET_TARGET_BYTES = int(
    __import__("os").environ.get("SMRS_VOCAB_BUCKET_TARGET_BYTES", 8 << 20)
)


def _auto_buckets(idx) -> int:
    """Scale-adaptive vocab bucket count from Catalyst's scan-size estimate
    of the artifact (same estimator the fused-build gate uses): the smallest
    power of two n in [8, 4096] with n * target >= estimate.  Power-of-two
    steps keep the count stable under small estimate drift; the floor stops
    fixture-scale builds from writing dozens of near-empty files (measured
    r13: 64 -> 8 buckets cut the sf0.1 docs vocab write ~32%); the cap
    bounds the partition-dir fanout a point lookup must list."""
    raw = idx._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    est = raw if isinstance(raw, int) else int(raw.toString())
    n = 8
    while n < 4096 and est > n * _VOCAB_BUCKET_TARGET_BYTES:
        n *= 2
    return n


def _bucket_expr(n_buckets: int):
    """JVM-side bucket id of the ``term`` column: crc32 of the UTF-8
    bytes mod n_buckets — reproducible driver-side (:func:`term_bucket`),
    which is what lets point df-lookups prune to |Q| partition dirs."""
    return F.pmod(
        F.crc32(F.encode(F.col("term"), "UTF-8")), F.lit(n_buckets)
    ).cast("int")


def term_bucket(term: str, n_buckets: int) -> int:
    """Driver-side twin of :func:`_bucket_expr` (zlib.crc32 == Hadoop's
    CRC-32 over the same bytes)."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def load_vocab_meta(fs, path: str) -> dict | None:
    """The vocab layout descriptor, or None for a legacy unbucketed dir."""
    from solr_map_reduce_spark.fs import join as fs_join

    full = fs_join(path, VOCAB_DIR, VOCAB_META)
    if not fs.exists(full):
        return None
    return json.loads(fs.read_text(full))


def write_search_stats(
    spark: SparkSession, path: str, n_buckets: int | None = None
) -> dict | None:
    """Compute and persist BM25 statistics + the term dictionary for every
    analyzed field of the artifact at ``path``.  Returns the stats dict
    (None when the artifact has no analyzed fields).  ``n_buckets=None``
    sizes the bucket count from the artifact's scan estimate
    (:func:`_auto_buckets`); an explicit count is honored as given."""
    from solr_map_reduce_spark.fs import get_fs
    from solr_map_reduce_spark.fs import join as fs_join
    from solr_map_reduce_spark.indexing import MANIFEST, read_index

    fs = get_fs(path, spark)
    manifest = json.loads(fs.read_text(fs_join(path, MANIFEST)))
    analyzed: dict = manifest.get("analyzed", {})
    if not analyzed:
        return None
    # commit marker DOWN while the vocab dirs are in flux (a rebuild over
    # an existing sidecar would otherwise serve old scalars + new vocab)
    if fs.exists(fs_join(path, STATS)):
        fs.delete(fs_join(path, STATS))
    idx = read_index(spark, path)
    if n_buckets is None:
        n_buckets = _auto_buckets(idx)
    stats: dict = {}
    for field, info in analyzed.items():
        tokens_col = info["tokens_col"]
        # The scalar aggregates ride the vocab-write job as an Observation
        # on the pre-explode rows instead of running their own corpus scan
        # (r13: 2 scans/field -> 1; at 100 TB one full corpus pass per
        # analyzed field).  The observed expressions are byte-identical to
        # _field_aggregates' (count all rows / sum+count of visible token
        # lengths), and they see exactly the rows that job scans: the
        # observe node sits ABOVE the scan and BELOW the explode, and this
        # is a full unfiltered read of the artifact, same as before.
        toks = _real_toks(tokens_col)
        obs = Observation()
        observed = idx.observe(
            obs,
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(toks)).alias("sum_dl"),
            F.count(F.size(toks)).alias("n_dl"),
        )
        (
            _term_df(observed, tokens_col, "df")
            .withColumn("bucket", _bucket_expr(n_buckets))
            .repartition(F.col("bucket"))
            .sortWithinPartitions("bucket", "term")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(fs_join(path, f"{VOCAB_DIR}/{field}"))
        )
        row = obs.get
        stats[field] = {
            "n_docs": int(row["n_docs"]),
            "sum_dl": int(row["sum_dl"] or 0),
            "n_dl": int(row["n_dl"]),
        }
    fs.write_text(
        fs_join(path, VOCAB_DIR, VOCAB_META),
        json.dumps({"n_buckets": int(n_buckets), "hash": "crc32"}),
    )
    fs.write_text(fs_join(path, STATS), json.dumps(stats))  # marker UP last
    return stats


# Corpus-size gate for the fused sidecar build: below this many bytes of
# artifact data the separate writers win (the fused plan's extra exchange
# + persisted (term, shard) aggregate cost more than the corpus scan they
# save — measured r13: 1.2 MB docs fixture −3.5% for fused, 86 MB a wash,
# 323 MB fused wins 25%, and at 100 TB the saved corpus pass dominates by
# orders of magnitude).  Env-overridable so deployments can move the
# crossover without a code change; the default keeps fixture-scale builds
# (and the driver's bench) on the measured-faster path at each scale.
_FUSED_MIN_BYTES = int(
    __import__("os").environ.get("SMRS_FUSED_SIDECAR_MIN_BYTES", 128 << 20)
)


def write_search_sidecars(
    spark: SparkSession,
    path: str,
    n_buckets: int | None = None,
    m: int | None = None,
    k: int | None = None,
    min_bytes: int | None = None,
) -> tuple[dict | None, dict | None]:
    """Full rebuild of BOTH serving sidecars (term blooms + BM25
    stats/vocab) from ONE tokenized corpus pass per analyzed field —
    when the corpus is big enough for that pass to matter (the
    ``min_bytes`` gate above, Catalyst's scan-size estimate); smaller
    artifacts delegate to the separate writers, which measure faster
    there.  Outputs are byte-identical on every path.

    ``write_term_blooms`` and ``write_search_stats`` each scan + explode
    the stored token column; when a full build wants both, the shared
    per-``(term, shard)`` doc-count aggregate below serves the two of
    them — the bloom bitmaps need term PRESENCE per shard (all tokens,
    reversed-copy markers included), the vocab needs the per-term doc
    count (visible tokens only), and both are projections of that one
    aggregate.  The scalar BM25 stats ride the same job as an
    ``Observation`` on the pre-explode rows, exactly as in
    ``write_search_stats``.  Per analyzed field the build pays one
    corpus scan + explode instead of two; the aggregate itself (|vocab|
    x |shards| rows, far smaller than the corpus) is persisted across
    the two projections and unpersisted before the next field.

    Equivalences (vs the separate writers, verified byte-identical in
    tests): a visible term appears in ``array_distinct(tokens)`` iff it
    appears in ``array_distinct(visible(tokens))`` — the reversed copies
    are DISTINCT marked tokens, so filtering visibility on the exploded
    term column commutes with filtering the array before exploding; and
    ``sum_shards(count_docs(term, shard)) == count_docs(term)`` because
    every doc lives in exactly one shard.

    Subset refreshes (``write_term_blooms(shards=...)``) and delta
    maintenance keep the dedicated writers — this is the full-rebuild
    fast path only.  Crash consistency is the stats writer's: the
    ``_SEARCH_STATS.json`` commit marker goes DOWN before any vocab dir
    is in flux and UP last; the blooms JSON stays a single atomic write.

    Returns ``(blooms_sidecar, stats)`` (both None when the artifact has
    no analyzed fields)."""
    import base64

    from solr_map_reduce_spark.fs import get_fs
    from solr_map_reduce_spark.fs import join as fs_join
    from solr_map_reduce_spark.indexing import MANIFEST, SHARD_COL, read_index
    from solr_map_reduce_spark.term_blooms import (
        BLOOMS,
        DEFAULT_K,
        DEFAULT_M,
        _positions_col,
    )

    from solr_map_reduce_spark import term_blooms as _tb
    from solr_map_reduce_spark.term_blooms import write_term_blooms

    explicit_m = m is not None
    k = DEFAULT_K if k is None else k
    fs = get_fs(path, spark)
    manifest = json.loads(fs.read_text(fs_join(path, MANIFEST)))
    analyzed: dict = manifest.get("analyzed", {})
    if not analyzed:
        return None, None
    idx = read_index(spark, path)
    if n_buckets is None:
        n_buckets = _auto_buckets(idx)  # same estimator on both paths below
    raw = idx._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    est = raw if isinstance(raw, int) else int(raw.toString())
    threshold = _FUSED_MIN_BYTES if min_bytes is None else min_bytes
    if threshold > 0 and est < threshold:
        blooms = write_term_blooms(
            spark, path, m=(m if explicit_m else None), k=k
        )
        stats_only = write_search_stats(spark, path, n_buckets)
        return blooms, stats_only
    # bloom width for the auto path: gate + data-driven sizing IDENTICAL
    # to write_term_blooms (same Catalyst estimate, and the per-shard
    # distinct-term counts below come from the same distinct (term, shard)
    # set) — the fused and delegated builds stay byte-equal at every scale
    auto_small_m = (not explicit_m) and est < _tb._ADAPTIVE_BLOOM_MIN_BYTES
    # commit marker DOWN while the vocab dirs are in flux (same protocol
    # as write_search_stats)
    if fs.exists(fs_join(path, STATS)):
        fs.delete(fs_join(path, STATS))
    from solr_map_reduce_spark.extensions.search import REV_MARK

    blooms_sidecar: dict = {}
    stats: dict = {}
    for field, info in analyzed.items():
        tokens_col = info["tokens_col"]
        toks = _real_toks(tokens_col)
        obs = Observation()
        observed = idx.observe(
            obs,
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(toks)).alias("sum_dl"),
            F.count(F.size(toks)).alias("n_dl"),
        )
        placement = (
            observed.select(
                F.col(SHARD_COL).alias("_s"),
                F.explode(F.array_distinct(F.col(tokens_col))).alias("term"),
            )
            .groupBy("term", "_s")
            .agg(F.count(F.lit(1)).alias("_n"))
            .persist()
        )
        try:
            (
                placement.filter(~F.col("term").startswith(REV_MARK))
                .groupBy("term")
                .agg(F.sum("_n").alias("df"))
                .withColumn("bucket", _bucket_expr(n_buckets))
                .repartition(F.col("bucket"))
                .sortWithinPartitions("bucket", "term")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(fs_join(path, f"{VOCAB_DIR}/{field}"))
            )
            row = obs.get
            stats[field] = {
                "n_docs": int(row["n_docs"]),
                "sum_dl": int(row["sum_dl"] or 0),
                "n_dl": int(row["n_dl"]),
            }
            if explicit_m:
                m_f = m
            elif auto_small_m:
                m_f = DEFAULT_M
            else:
                # per-shard distinct-term count is a cheap job over the
                # already-persisted aggregate (|vocab| x |shards| rows)
                m_f = _tb._auto_bloom_m(
                    max(
                        (
                            int(r["count"])
                            for r in placement.groupBy("_s").count().collect()
                        ),
                        default=0,
                    )
                )
            per_shard_pos = (
                placement.select(
                    "_s", F.explode(_positions_col(F.col("term"), m_f, k)).alias("_p")
                )
                .distinct()
                .collect()
            )
        finally:
            placement.unpersist()
        bitmaps: dict[str, bytearray] = {}
        for r in per_shard_pos:
            s = str(int(r["_s"]))
            bm = bitmaps.get(s)
            if bm is None:
                bm = bitmaps[s] = bytearray(m_f // 8)
            p = r["_p"]
            bm[p // 8] |= 1 << (p % 8)
        blooms_sidecar[field] = {
            "m": m_f,
            "k": k,
            "shards": {
                s: base64.b64encode(bytes(bm)).decode()
                for s, bm in bitmaps.items()
            },
        }
    fs.write_text(fs_join(path, BLOOMS), json.dumps(blooms_sidecar))
    fs.write_text(
        fs_join(path, VOCAB_DIR, VOCAB_META),
        json.dumps({"n_buckets": int(n_buckets), "hash": "crc32"}),
    )
    fs.write_text(fs_join(path, STATS), json.dumps(stats))  # marker UP last
    return blooms_sidecar, stats


def _real_toks(tokens_col: str) -> F.Column:
    """The REAL tokens: text_general_rev interleaves marked reversed
    copies for the leading-wildcard seek; BM25 statistics (document
    lengths, term dfs) and the term dictionary must ignore them or
    scores skew and suggest/spellcheck surface reversed garbage.
    Delegates to the ONE canonical filter (search._visible_toks)."""
    from solr_map_reduce_spark.extensions.search import _visible_toks

    return _visible_toks(F.col(tokens_col))


def _field_aggregates(df, tokens_col: str) -> tuple[int, int, int]:
    """(n_docs, sum_dl, n_dl) of one token column over ``df``."""
    toks = _real_toks(tokens_col)
    row = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("sum_dl"),
        F.count(F.size(toks)).alias("n_dl"),
    ).collect()[0]
    return (int(row["n_docs"]), int(row["sum_dl"] or 0), int(row["n_dl"]))


def _term_df(df, tokens_col: str, out_name: str):
    return (
        df.select(F.explode(F.array_distinct(_real_toks(tokens_col))).alias("term"))
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
      - df_old(t) + df_new(t)``, terms reaching 0 dropped.  Only terms in
      the old/new subsets can change, so the merge reads the stored vocab
      with a BUCKET-PRUNED scan (partition filter on the changed terms'
      buckets) and writes only those buckets to a ``<field>__pending``
      staging dir — the vocab write is O(changed-term buckets), not
      O(|vocab|).  A legacy unbucketed vocab is migrated to the bucketed
      layout in the same operation (one full rewrite, then O(changed)
      forever after).

    Returns a ``finalize()`` closure to call AFTER the artifact swap; it
    takes the ``_SEARCH_STATS.json`` commit marker DOWN (readers fall
    back to computed stats — correct, never skewed), swaps in the pending
    bucket dirs (rename-aside, old buckets survive in a trash dir until
    the new ones are in place), and writes the updated stats file LAST.
    Returns None when the artifact has no (complete) stats sidecar — the
    caller should fall back to ``write_search_stats`` or skip."""
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

    meta = load_vocab_meta(fs, path)
    n_buckets = int(meta["n_buckets"]) if meta else N_VOCAB_BUCKETS
    migrating = meta is None  # legacy unbucketed vocab: full rewrite once

    new_stats: dict = {}
    pending: dict[str, list[int] | None] = {}  # field -> touched buckets
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
        delta = (
            _term_df(old_subset, tokens_col, "_df_old")
            .join(_term_df(new_subset, tokens_col, "_df_new"), "term", "full_outer")
            # a term whose df is identical before and after the rewrite
            # contributes nothing — dropping it here is what makes the
            # bucket set O(genuinely-changed terms), not O(shard vocab)
            .filter(
                F.coalesce(F.col("_df_old"), F.lit(0))
                != F.coalesce(F.col("_df_new"), F.lit(0))
            )
        )
        vocab_dir = fs_join(path, f"{VOCAB_DIR}/{field}")
        if migrating:
            vocab = spark.read.parquet(vocab_dir).select("term", "df")
            touched: list[int] | None = None  # whole-dir swap
        else:
            delta = delta.withColumn("bucket", _bucket_expr(n_buckets))
            touched = sorted(
                int(r["bucket"])
                for r in delta.select("bucket").distinct().collect()
            )
            # explicit schema: planning never opens data-file footers, so
            # untouched buckets are never read even at analysis time
            vocab = (
                spark.read.schema(_VOCAB_SCHEMA)
                .parquet(vocab_dir)
                .filter(F.col("bucket").isin(touched))
                .select("term", "df")
            )
        merged = (
            vocab.join(delta.select("term", "_df_old", "_df_new"), "term", "full_outer")
            .select(
                "term",
                (
                    F.coalesce(F.col("df"), F.lit(0))
                    - F.coalesce(F.col("_df_old"), F.lit(0))
                    + F.coalesce(F.col("_df_new"), F.lit(0))
                ).alias("df"),
            )
            .filter(F.col("df") > 0)
            .withColumn("bucket", _bucket_expr(n_buckets))
        )
        # materialize NOW (reads old shard files + stored vocab buckets,
        # both of which move/disappear at swap time)
        (
            merged.repartition(F.col("bucket"))
            .sortWithinPartitions("bucket", "term")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(fs_join(path, f"{VOCAB_DIR}/{field}__pending"))
        )
        pending[field] = touched

    def finalize() -> dict:
        # marker DOWN: from here until the final write, readers see no
        # stats file and fall back to computing statistics — correct
        # post-swap scores, never new-vocab-with-old-scalars skew
        if fs.exists(fs_join(path, STATS)):
            fs.delete(fs_join(path, STATS))
        trash = fs_join(path, VOCAB_DIR, "__trash")
        if fs.exists(trash):
            fs.delete(trash)
        fs.mkdirs(trash)
        for field, touched in pending.items():
            cur = fs_join(path, f"{VOCAB_DIR}/{field}")
            pend = fs_join(path, f"{VOCAB_DIR}/{field}__pending")
            if touched is None:
                # legacy migration: whole-dir swap into the bucketed layout
                if fs.exists(cur):
                    fs.rename(cur, fs_join(trash, field))
                fs.rename(pend, cur)
                continue
            # bucketed: swap ONLY the touched buckets' partition dirs; a
            # touched bucket with no pending dir lost all its terms —
            # remove it (its old contents would otherwise serve stale dfs)
            fs.mkdirs(fs_join(trash, field))
            for b in touched:
                bname = f"bucket={b}"
                cur_b = fs_join(cur, bname)
                if fs.exists(cur_b):
                    fs.rename(cur_b, fs_join(trash, field, bname))
                pend_b = fs_join(pend, bname)
                if fs.exists(pend_b):
                    fs.rename(pend_b, cur_b)
            fs.delete(pend)
        fs.delete(trash)
        if migrating:
            fs.write_text(
                fs_join(path, VOCAB_DIR, VOCAB_META),
                json.dumps({"n_buckets": int(n_buckets), "hash": "crc32"}),
            )
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
    predicate-pushdown scan, partition-pruned to the |Q| buckets the query
    terms hash into (computed driver-side); absent terms get 0.  At 100 TB
    the term dictionary is billions of rows across the bucket dirs; a
    query touches only its own terms' buckets."""
    from solr_map_reduce_spark.fs import get_fs
    from solr_map_reduce_spark.fs import join as fs_join

    fs = get_fs(path, spark)
    meta = load_vocab_meta(fs, path)
    vocab_dir = fs_join(path, f"{VOCAB_DIR}/{field}")
    if meta is None:  # legacy unbucketed layout
        vocab = spark.read.parquet(vocab_dir)
    else:
        n = int(meta["n_buckets"])
        buckets = sorted({term_bucket(t, n) for t in terms})
        vocab = (
            spark.read.schema(_VOCAB_SCHEMA)
            .parquet(vocab_dir)
            .filter(F.col("bucket").isin(buckets))
        )
    rows = vocab.filter(F.col("term").isin(list(terms))).select("term", "df").collect()
    out = {t: 0 for t in terms}
    out.update({r["term"]: int(r["df"]) for r in rows})
    return out
