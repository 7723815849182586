"""Per-shard term Bloom filters — shard pruning for term queries.

The reference's artifact is a Lucene index: a term query touches only the
postings of that term.  This engine's artifact is sharded parquet whose
stored token arrays answer term queries with a scan; at 100 TB even a
column-pruned scan of every shard is the wrong cost when the term lives in
a handful of shards.  The sidecar closes that gap:

    out/_TERM_BLOOMS.json    {field: {m, k, shards: {"0": base64 bitmap}}}

Build: one pass over the stored token column — ``(shard, token)`` distinct,
k positions per token via ``xxhash64(token, i) % m`` (JVM-side), distinct
positions per shard collected (bounded by m, default 2^16 bits = 8 KiB per
shard) and packed into a bitmap driver-side.

Query: ``SearchIndex.contains_all/any/phrase`` intersect the query terms
with each shard's bitmap and add a ``shard IN (candidates)`` partition
filter before the scan — Bloom semantics guarantee NO false negatives, so
results are identical; false positives only cost scanning an extra shard.

Mutation safety: deleting rows leaves bitmaps a superset (still correct);
``merge_into`` ADDS tokens, so it refreshes the touched shards' bitmaps
when a sidecar exists (a stale bitmap there would be a false negative).
"""

from __future__ import annotations

import base64
import json

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

BLOOMS = "_TERM_BLOOMS.json"
DEFAULT_M = 1 << 16  # bits per shard bitmap (8 KiB)
DEFAULT_K = 4


def _positions_col(token: F.Column, m: int, k: int) -> F.Column:
    """k bloom positions for a token, all JVM-side (xxhash64 with the probe
    index as a second hashed column acts as the seed)."""
    return F.array(
        *[F.pmod(F.xxhash64(token, F.lit(i)), F.lit(m)).cast("int") for i in range(k)]
    )


_POSITIONS_MEMO: dict[tuple[int, int, str], list[int]] = {}


def _terms_positions(
    spark: SparkSession, terms: list[str], m: int, k: int
) -> dict[str, list[int]]:
    """Positions for query terms, computed by the SAME JVM expression used
    at build time (one tiny local job on a |terms|-row DataFrame).
    Memoized per (m, k, term): repeated queries — the serving pattern —
    skip the job entirely."""
    missing = [t for t in terms if (m, k, t) not in _POSITIONS_MEMO]
    if missing:
        df = spark.createDataFrame([(t,) for t in missing], "term string")
        rows = df.select(
            "term", _positions_col(F.col("term"), m, k).alias("pos")
        ).collect()
        for r in rows:
            _POSITIONS_MEMO[(m, k, r["term"])] = list(r["pos"])
    return {t: _POSITIONS_MEMO[(m, k, t)] for t in terms}


def write_term_blooms(
    spark: SparkSession,
    path: str,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    shards: list[int] | None = None,
) -> dict | None:
    """Compute and persist per-shard bitmaps for every analyzed field of the
    artifact at ``path``.  ``shards`` restricts the recompute to those shard
    dirs (partition-pruned scan) and merges into the existing sidecar — the
    ``merge_into`` refresh path.  Returns the sidecar dict (None when the
    artifact has no analyzed fields)."""
    from solr_map_reduce_spark.fs import get_fs
    from solr_map_reduce_spark.fs import join as fs_join
    from solr_map_reduce_spark.indexing import MANIFEST, SHARD_COL, read_index

    fs = get_fs(path, spark)
    manifest = json.loads(fs.read_text(fs_join(path, MANIFEST)))
    analyzed: dict = manifest.get("analyzed", {})
    if not analyzed:
        return None

    existing: dict = {}
    if shards is not None:
        if fs.exists(fs_join(path, BLOOMS)):
            existing = json.loads(fs.read_text(fs_join(path, BLOOMS)))
        # a subset refresh can only MERGE into a compatible sidecar: if the
        # sidecar is absent or any field's (m, k) differ, the untouched
        # shards' bitmaps can't be kept (params changed) nor recomputed from
        # the filtered scan — escalate to a full rebuild, else the missing
        # shards would silently become query false negatives
        if not existing or any(
            existing.get(f, {}).get("m") != m or existing.get(f, {}).get("k") != k
            for f in analyzed
        ):
            shards = None
            existing = {}

    idx = read_index(spark, path)
    if shards is not None:
        idx = idx.filter(F.col(SHARD_COL).isin([int(s) for s in shards]))

    sidecar: dict = {}
    for field, info in analyzed.items():
        tokens_col = info["tokens_col"]
        # The distinct (shard, position) pairs are collected directly and
        # grouped into bitmaps driver-side (r13): the former
        # groupBy(shard).collect_set added a THIRD full exchange of the
        # position set only to reshape rows the driver unpacks anyway —
        # the collected volume is identical either way (bounded by
        # shards x m positions, the same bound the bitmap itself has).
        per_shard_pos = (
            idx.select(
                F.col(SHARD_COL).alias("_s"),
                F.explode(F.array_distinct(F.col(tokens_col))).alias("_t"),
            )
            .distinct()
            .select("_s", F.explode(_positions_col(F.col("_t"), m, k)).alias("_p"))
            .distinct()
            .collect()
        )
        prev = existing.get(field, {})
        if prev and (prev.get("m") != m or prev.get("k") != k):
            prev = {}  # parameter change: full rebuild semantics
        shard_maps: dict = dict(prev.get("shards", {})) if prev else {}
        bitmaps: dict[str, bytearray] = {}
        for row in per_shard_pos:
            s = str(int(row["_s"]))
            bm = bitmaps.get(s)
            if bm is None:
                bm = bitmaps[s] = bytearray(m // 8)
            p = row["_p"]
            bm[p // 8] |= 1 << (p % 8)
        for s, bm in bitmaps.items():
            shard_maps[s] = base64.b64encode(bytes(bm)).decode()
        sidecar[field] = {"m": m, "k": k, "shards": shard_maps}

    fs.write_text(fs_join(path, BLOOMS), json.dumps(sidecar))
    return sidecar


def load_term_blooms(spark: SparkSession, path: str) -> dict | None:
    from solr_map_reduce_spark.fs import get_fs
    from solr_map_reduce_spark.fs import join as fs_join

    fs = get_fs(path, spark)
    full = fs_join(path, BLOOMS)
    if not fs.exists(full):
        return None
    return json.loads(fs.read_text(full))


def candidate_shards(
    spark: SparkSession,
    blooms: dict,
    field: str,
    terms: list[str],
    mode: str = "all",
) -> list[int] | None:
    """Shards that can possibly satisfy the term query, or None when the
    sidecar doesn't cover the field (no pruning).  ``mode='all'`` keeps a
    shard when EVERY term might be present (AND/phrase), ``'any'`` when ANY
    might be (OR)."""
    info = blooms.get(field)
    if not info or not terms:
        return None
    m, k = int(info["m"]), int(info["k"])
    positions = _terms_positions(spark, list(terms), m, k)
    bitmaps = {
        int(s): base64.b64decode(b64) for s, b64 in info["shards"].items()
    }
    for s, bm in bitmaps.items():
        if len(bm) != m // 8:
            # loud, typed: a truncated/tampered bitmap previously hit a
            # bare IndexError mid-probe — and a silently-short bitmap
            # read as "bit clear" would PRUNE a matching shard (a false
            # negative, the one thing the Bloom contract forbids)
            raise ValueError(
                f"term-bloom bitmap for field {field!r} shard {s} is "
                f"{len(bm)} bytes, expected {m // 8} — sidecar corrupt; "
                "rebuild with write_term_blooms"
            )

    def has(bm: bytes, term: str) -> bool:
        return all(bm[p // 8] & (1 << (p % 8)) for p in positions[term])

    out = []
    for shard, bm in bitmaps.items():
        hits = [has(bm, t) for t in terms]
        if (mode == "all" and all(hits)) or (mode == "any" and any(hits)):
            out.append(shard)
    return sorted(out)
