"""Streaming index ingest: the A10 retain-most-recent dedup as a continuous
pipeline (readStream → watermark → per-batch upsert into the artifact).

The reference has no streaming surface; this is the natural Structured
Streaming extension of its build-time dedup semantics (SURVEY §7 M4):

- late data handled by ``withWatermark`` on the event-time column;
- within-stream duplicate keys collapsed by ``dropDuplicatesWithinWatermark``;
- cross-batch upsert = per-microbatch ``retain_most_recent`` against the
  current artifact via ``foreachBatch`` (same resolver the batch writer
  uses), writing back shard-partitioned parquet.

At scale the foreachBatch rewrite touches only the shards containing batch
keys (dynamic partition overwrite).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from solr_map_reduce_spark.functions.timestamps import ensure_instant
from solr_map_reduce_spark.indexing import SHARD_COL, IndexJob, IndexJobConfig, read_index


def stream_ingest(
    spark: SparkSession,
    input_path: str,
    input_schema,
    config: IndexJobConfig,
    output_path: str,
    checkpoint: str,
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously index files appearing under ``input_path`` (parquet).

    ``available_now=True`` drains what exists and stops — the testable batch
    analog; ``False`` runs continuously.
    """
    job = IndexJob(config)
    stream = spark.readStream.schema(input_schema).parquet(input_path)
    if event_time_col:
        stream = ensure_instant(stream, event_time_col)
        stream = stream.withWatermark(event_time_col, watermark)
        # dedupe on (key, order_field), NOT key alone: within-watermark
        # dropDuplicates keeps the FIRST ARRIVAL, so deduping by key would
        # discard a newer update that arrives after an older one — distinct
        # versions must all reach merge_into's resolver (A10 recency wins)
        dedup_cols = [config.schema.unique_key]
        if config.order_field in [f.name for f in input_schema.fields]:
            dedup_cols.append(config.order_field)
        stream = stream.dropDuplicatesWithinWatermark(dedup_cols)

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        # per-batch incremental re-index: same-key docs replaced per the
        # resolver, new keys appended (staging dir + atomic swap inside).
        # Self-healing for the at-least-once replay: a hard crash
        # mid-merge deliberately leaves the mutation lock on disk, and
        # the replayed batch would otherwise raise ArtifactLockedError
        # on every restart — permanently wedging the stream behind its
        # own dead lock.  When the lock's owner is provably dead ON THIS
        # HOST (pid liveness check), clear it and retry once; a foreign
        # or live owner still raises (a real concurrent mutator).
        from solr_map_reduce_spark.indexing import (
            ArtifactLockedError,
            clear_mutation_lock,
            inspect_mutation_lock,
        )

        try:
            job.merge_into(batch_df, output_path)
        except ArtifactLockedError:
            info = inspect_mutation_lock(output_path, batch_df.sparkSession)
            if info is not None and info.get("pid_alive_here") is False:
                clear_mutation_lock(output_path, batch_df.sparkSession)
                job.merge_into(batch_df, output_path)
            else:
                raise

    writer = stream.writeStream.foreachBatch(_upsert).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to each
    streaming row (the morphline setValues/extract analog when the values
    live in a lookup table, and the streaming face of the C5/star-join
    shapes).

    With ``broadcast_dim`` the dimension is hash-broadcast to every executor
    once per micro-batch, so the stream side never shuffles and needs no
    streaming state — the join stays stateless and append-mode-safe for any
    `how` that doesn't need the unmatched dim side. At 100 TB the stream is
    the big side by construction; a dim too large to broadcast should be
    pre-bucketed on the join key instead (pass ``broadcast_dim=False``).
    """
    if broadcast_dim:
        dim = F.broadcast(dim)
    return stream.join(dim, on=on, how=how)


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
    suffix: str = "_r",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event with
    the right events of the same key arriving within ``[left_ts, left_ts +
    max_delay]`` — the impressions⋈clicks attribution pattern, and the
    streaming face of the batch :func:`~..operators.range_join.range_join`.

    Both sides carry watermarks AND the join predicate bounds event-time
    distance, so Spark's state store evicts buffered rows once the
    watermark passes the join window — state is O(in-flight window), not
    O(stream).  Right-side columns come back suffixed (the two streams
    usually share ``ts``/key names)."""
    l = ensure_instant(left, left_ts).withWatermark(left_ts, watermark)
    renamed = right
    for c in right.columns:
        renamed = renamed.withColumnRenamed(c, f"{c}{suffix}")
    r = ensure_instant(renamed, f"{right_ts}{suffix}").withWatermark(
        f"{right_ts}{suffix}", watermark
    )
    cond = (
        (F.col(on) == F.col(f"{on}{suffix}"))
        & (F.col(f"{right_ts}{suffix}") >= F.col(left_ts))
        & (
            F.col(f"{right_ts}{suffix}")
            <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return l.join(r, cond, "inner").drop(f"{on}{suffix}")


def windowed_event_counts(
    stream: DataFrame,
    event_time_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    group_col: str | None = "event_type",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked window aggregation — the facet-count analog as a
    streaming query (late rows beyond the watermark are dropped).

    ``slide`` < ``window_duration`` makes the windows hopping/sliding: each
    row lands in duration/slide windows (that factor, not row count, is the
    state-size multiplier — keep it small at scale)."""
    grouped = [F.window(F.col(event_time_col), window_duration, slide or window_duration)]
    if group_col:
        grouped.append(F.col(group_col))
    return (
        ensure_instant(stream, event_time_col)
        .withWatermark(event_time_col, watermark)
        .groupBy(*grouped)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *([F.col(group_col)] if group_col else []),
            F.col("cnt"),
        )
    )


def stream_dedup_ingest(
    spark: SparkSession,
    input_path: str,
    input_schema,
    index_path: str,
    corpus_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    params=None,
    available_now: bool = True,
) -> StreamingQuery:
    """Near-duplicate dedup AT INGEST: continuously consume document files,
    drop each microbatch's near-dups (against everything indexed so far AND
    within the batch, min-id-wins), append the survivors to ``corpus_path``
    and their signatures to the persistent MinHash index at ``index_path``.

    This is the streaming composition of the incremental
    :class:`~solr_map_reduce_spark.extensions.minhash_index.MinHashIndex`
    (``add_unique`` per microbatch): each batch costs O(batch + matching
    buckets) — the stored band table is probed via a broadcast of the
    batch's bands and history never shuffles, so steady-state ingest cost is
    independent of corpus size.  Restart safety: source offsets are
    checkpointed; the corpus sink writes ``partitionBy(_ingest_batch)``
    with dynamic partition overwrite so a replayed microbatch REPLACES its
    own partition instead of double-appending; duplicate band/feature rows
    from a replayed ``add`` are tolerated by ``match``'s unordered-pair
    dedup and per-id feature dedup (its documented retry contract).

    Returns the StreamingQuery; with ``available_now=True`` it drains the
    existing files and stops (the testable batch analog).
    """
    from solr_map_reduce_spark.extensions.minhash_index import (
        MinHashIndex,
        MinHashParams,
    )
    from solr_map_reduce_spark.fs import get_fs
    from solr_map_reduce_spark.fs import join as fs_join

    fs = get_fs(index_path, spark)
    if fs.exists(fs_join(index_path, "_MINHASH_MANIFEST.json")):
        index = MinHashIndex.open(spark, index_path)
    else:
        index = MinHashIndex.create(
            spark, index_path, params or MinHashParams()
        )

    def _dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        batch_df = batch_df.localCheckpoint(eager=True)
        _n, pairs = index.add_unique(
            batch_df, text_col=text_col, id_col=id_col, threshold=threshold
        )
        dup_ids = pairs.select(
            F.when(F.col("match_kind") == "corpus", F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias(id_col)
        ).distinct()
        survivors = batch_df.join(F.broadcast(dup_ids), id_col, "left_anti")
        (
            survivors.withColumn("_ingest_batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_ingest_batch")
            .parquet(corpus_path)
        )

    stream = spark.readStream.schema(input_schema).parquet(input_path)
    writer = stream.writeStream.foreachBatch(_dedup_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ivf_ingest(
    spark: SparkSession,
    input_path: str,
    input_schema,
    index_path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming ANN ingest: continuously append arriving vectors (parquet
    files under ``input_path``) into a persisted :class:`IvfIndex` at
    ``index_path`` — assign to the STORED centroids, bucket-directory
    append, O(batch) per micro-batch.

    Replay idempotence: each micro-batch appends under a file-name tag
    of ``<checkpoint-hash>-<batch id>`` (``IvfIndex.add(batch_tag=...)``)
    — a batch re-delivered after a crash (foreachBatch's at-least-once
    contract) first sweeps its own partial files, so the index holds
    exactly one copy of every vector.  The checkpoint-hash component is
    STABLE across restarts of the same checkpointed query (the replay
    the sweep exists for) but distinct for a fresh checkpoint or a
    second stream into the same index — a bare batch id would restart
    at 0 there and the sweep would delete the EARLIER stream's batch-0
    files.  Stored searches see each batch as soon as its append
    completes."""
    import hashlib

    from solr_map_reduce_spark.extensions.similarity import IvfIndex

    ivf = IvfIndex.load(spark, index_path)
    stream = spark.readStream.schema(input_schema).parquet(input_path)
    stream_tag = hashlib.sha1(checkpoint.encode("utf-8")).hexdigest()[:8]

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        ivf.add(batch_df, index_path, batch_tag=f"{stream_tag}-{batch_id}")

    writer = stream.writeStream.foreachBatch(_append).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
