"""Persistent MinHash/LSH index — INCREMENTAL near-dup detection for a
growing corpus.

``minhash_dedup`` (text_dedup.py) re-bands the whole input per run; at
100 TB with a daily ingest that is the wrong cost model — each new batch
should pay O(batch + matching buckets), never O(corpus).  This index
persists the banding artifact between runs:

    path/bands/     parquet (doc_id, band, band_hash)   — the LSH buckets
    path/features/  parquet (doc_id, shingle_hashes)    — for exact verify
    path/_MINHASH_MANIFEST.json                          — params (must match
                                                           across batches)

Per-batch shapes (the whole point):

- ``match``: the BATCH's band rows broadcast (a batch is small next to the
  corpus); the stored band table is probed with a broadcast hash join and
  never shuffles.  Verification joins only the candidate ids' feature rows.
- ``add``: appends the batch's bands/features — no rewrite of history.
- ``add_unique``: the dedup-ingest pattern — match, drop batch docs that
  duplicate the corpus (or an earlier batch doc), index the survivors.

Determinism: same (num_perm, bands, shingle_k, seed) ⇒ identical signatures
to the one-shot pipeline, so incremental match == batch ``minhash_dedup``
restricted to the same pairs (tested).

Reference anchor: dedup is the reference's reducer-side contract
(mr/dedup/RetainMostRecentUpdateConflictResolver.java:71-112); this extends
it to near-duplicates across ingest batches.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from solr_map_reduce_spark.extensions.text_dedup import (
    ensure_parallelism,
    minhash_features,
    verified_jaccard,
)
from solr_map_reduce_spark.fs import get_fs
from solr_map_reduce_spark.fs import join as fs_join

MANIFEST = "_MINHASH_MANIFEST.json"


@dataclass(frozen=True)
class MinHashParams:
    num_perm: int = 128
    bands: int = 16
    shingle_k: int = 3
    seed: int = 42


class MinHashIndex:
    """A corpus-scale LSH band index on disk; see module docstring."""

    def __init__(self, spark: SparkSession, path: str, params: MinHashParams):
        self.spark = spark
        self.path = path
        self.params = params
        self._bands_path = fs_join(path, "bands")
        self._features_path = fs_join(path, "features")

    # -- lifecycle -----------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        params: MinHashParams | None = None,
        overwrite: bool = False,
    ) -> "MinHashIndex":
        """Create a fresh index at ``path``.  Refuses to clobber an existing
        index unless ``overwrite=True`` — overwriting only the manifest while
        old bands/features parquet stays behind would silently compare
        signatures computed under incompatible parameters."""
        params = params or MinHashParams()
        fs = get_fs(path, spark)
        if fs.exists(fs_join(path, MANIFEST)):
            if not overwrite:
                raise FileExistsError(
                    f"MinHash index already exists at {path!r}; open() it, or "
                    "pass overwrite=True to discard it (bands/features included)"
                )
            for sub in ("bands", "features"):
                full = fs_join(path, sub)
                if fs.exists(full):
                    fs.delete(full)
        fs.mkdirs(path)
        fs.write_text(fs_join(path, MANIFEST), json.dumps(params.__dict__, indent=2))
        return cls(spark, path, params)

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "MinHashIndex":
        fs = get_fs(path, spark)
        params = MinHashParams(**json.loads(fs.read_text(fs_join(path, MANIFEST))))
        return cls(spark, path, params)

    def _has_data(self) -> bool:
        fs = get_fs(self.path, self.spark)
        return fs.exists(self._bands_path)

    # -- feature computation (shared with the one-shot pipeline) -------
    def _features(self, docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
        p = self.params
        return minhash_features(
            ensure_parallelism(docs), text_col, id_col,
            p.num_perm, p.bands, p.shingle_k, p.seed,
        )

    @staticmethod
    def _banded(feats: DataFrame, id_col: str) -> DataFrame:
        return feats.select(
            F.col(id_col), F.posexplode("band_hashes").alias("band", "band_hash")
        )

    # -- operations ----------------------------------------------------
    def add(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        _feats: DataFrame | None = None,
    ) -> int:
        """Index a batch: append its bands + features.  Returns rows added.

        ``_feats`` lets :meth:`add_unique` reuse the feature table match()
        already computed instead of re-running the shingle+permutation
        stage (the dominant per-batch cost)."""
        feats = (
            _feats
            if _feats is not None
            else self._features(docs, text_col, id_col).localCheckpoint(eager=True)
        )
        n = feats.count()
        # FEATURES first, bands LAST: a crash between the writes must
        # fail SAFE.  Band rows without features would generate
        # candidates that verified_jaccard's inner feature join silently
        # drops forever; feature rows without bands are merely invisible
        # until a replay re-adds the doc (add_unique's replay guard keys
        # on the BANDS table for exactly this reason, and match()
        # dedupes the then-duplicated feature rows per id).
        feats.select(
            F.col(id_col).alias("doc_id"), "shingle_hashes"
        ).write.mode("append").parquet(self._features_path)
        self._banded(feats, id_col).withColumnRenamed(id_col, "doc_id").write.mode(
            "append"
        ).parquet(self._bands_path)
        return n

    def match(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.5,
        include_intra_batch: bool = True,
        _feats: DataFrame | None = None,
    ) -> DataFrame:
        """Near-dup pairs between a NEW batch and the indexed corpus (plus,
        optionally, within the batch itself).

        Returns ``(id_a, id_b, jaccard, match_kind)``: ``match_kind`` is
        ``"intra"`` (both ids in the batch, ``id_a`` < ``id_b``) or
        ``"corpus"`` (``id_a`` = batch id, ``id_b`` = indexed id).  The
        corpus band table is probed via a broadcast of the batch's bands —
        history never shuffles."""
        from solr_map_reduce_spark.extensions.text_dedup import (
            _warn_banding_gap,
        )

        _warn_banding_gap(
            threshold, self.params.bands,
            self.params.num_perm // self.params.bands, "MinHashIndex.match",
        )
        if _feats is not None:
            feats = _feats
        else:
            feats = self._features(docs, text_col, id_col).localCheckpoint(eager=True)
        batch_bands = self._banded(feats, id_col)

        cand_parts = []
        if include_intra_batch:
            l, r = batch_bands.alias("l"), batch_bands.alias("r")
            cand_parts.append(
                l.join(
                    r,
                    on=[
                        F.col("l.band") == F.col("r.band"),
                        F.col("l.band_hash") == F.col("r.band_hash"),
                        F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
                    ],
                ).select(
                    F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"),
                    F.lit("intra").alias("match_kind"),
                )
            )
        stored_feats = None
        if self._has_data():
            stored = self.spark.read.parquet(self._bands_path)
            # the stored table also uses "doc_id" — rename the batch side
            qb = batch_bands.withColumnRenamed(id_col, "_query_id")
            cand_parts.append(
                F.broadcast(qb)
                .join(stored, on=["band", "band_hash"])
                .filter(F.col("_query_id") != F.col("doc_id"))
                .select(
                    F.col("_query_id").alias("id_a"),
                    F.col("doc_id").alias("id_b"),
                    F.lit("corpus").alias("match_kind"),
                )
            )
            stored_feats = self.spark.read.parquet(self._features_path)

        if not cand_parts:
            import pyspark.sql.types as T

            id_type = docs.schema[id_col].dataType
            return self.spark.createDataFrame(
                [],
                T.StructType([
                    T.StructField("id_a", id_type),
                    T.StructField("id_b", id_type),
                    T.StructField("jaccard", T.DoubleType()),
                    T.StructField("match_kind", T.StringType()),
                ]),
            )
        cands = cand_parts[0]
        for part in cand_parts[1:]:
            cands = cands.unionByName(part)
        # one row per UNORDERED pair: an ingest retry can surface the same
        # pair under both orientations — intra as (min,max) and corpus as
        # (batch_id, indexed_id) — so dedupe on (least, greatest), keeping
        # the corpus row's orientation when present ("corpus" < "intra",
        # then id_a, both deterministic)
        cands = (
            cands.groupBy(
                F.least("id_a", "id_b").alias("_lo"),
                F.greatest("id_a", "id_b").alias("_hi"),
            )
            .agg(
                F.min_by(
                    F.struct("id_a", "id_b", "match_kind"),
                    F.struct("match_kind", "id_a"),
                ).alias("_s")
            )
            .select("_s.id_a", "_s.id_b", "_s.match_kind")
        )

        all_feats = feats.select(F.col(id_col).alias("doc_id"), "shingle_hashes")
        if stored_feats is not None:
            # only candidates' corpus features move: semi-join before union;
            # a batch id that is ALSO already indexed (ingest retry) would
            # contribute two identical feature rows — keep one per id
            needed = cands.select(F.col("id_b").alias("doc_id")).distinct()
            all_feats = all_feats.unionByName(
                stored_feats.join(F.broadcast(needed), "doc_id", "left_semi")
            ).dropDuplicates(["doc_id"])
        verified = verified_jaccard(
            cands.select("id_a", "id_b"), all_feats, "doc_id"
        ).filter(F.col("jaccard") >= threshold)
        out = verified.join(F.broadcast(cands), ["id_a", "id_b"])
        return out.localCheckpoint(eager=True)

    def add_unique(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.5,
    ) -> tuple[int, DataFrame]:
        """Dedup-ingest: index only batch docs that duplicate neither the
        corpus nor a smaller-id doc of the same batch (one greedy pass:
        min-id-wins within the batch, corpus-wins across).  Returns
        ``(n_indexed, dup_pairs)``."""
        feats = self._features(docs, text_col, id_col).localCheckpoint(eager=True)
        if self._has_data():
            # REPLAY GUARD (at-least-once ingest): a batch doc whose id
            # is already indexed was absorbed by a previous attempt of
            # this batch — re-adding would duplicate its band/feature
            # rows, and the corpus-candidate filter cannot flag it (the
            # identity pair is exactly what _query_id != doc_id
            # suppresses).  Keyed on the BANDS table: bands are written
            # LAST (see add()), so presence there means fully indexed.
            # The probe is a column-pruned scan semi-joined against the
            # broadcast batch ids — the bounded result (<= batch) then
            # anti-joins the batch.
            batch_ids = feats.select(F.col(id_col)).distinct()
            already = (
                self.spark.read.parquet(self._bands_path)
                .select(F.col("doc_id").alias(id_col)).distinct()
                .join(F.broadcast(batch_ids), id_col, "left_semi")
                .localCheckpoint(eager=True)
            )
            feats = feats.join(
                F.broadcast(already), id_col, "left_anti"
            ).localCheckpoint(eager=True)
        pairs = self.match(docs, text_col, id_col, threshold=threshold, _feats=feats)
        dup_ids = (
            pairs.select(
                F.when(F.col("match_kind") == "corpus", F.col("id_a"))
                .otherwise(F.col("id_b"))  # intra: the larger id loses
                .alias(id_col)
            )
        ).distinct()
        surviving_feats = feats.join(F.broadcast(dup_ids), id_col, "left_anti")
        return self.add(docs, text_col, id_col, _feats=surviving_feats), pairs
