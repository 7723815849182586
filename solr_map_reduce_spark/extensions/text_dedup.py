"""Document deduplication operators.

Design for 100 TB: every stage is a DataFrame op that shuffles only small
derived columns (hashes, signatures, band keys) — never full documents — and
the only Python-side work is a numpy min-reduction over integer arrays
(Arrow-batched).  Shingle/token hashing stays JVM-side via ``xxhash64``.

- ``exact_dedup`` — hash-groupBy on content digest (md5), keep min id.
- ``minhash_signatures`` + ``lsh_candidates`` + ``minhash_dedup`` — classic
  MinHash+LSH near-dup detection (Broder 1997; banding per Leskovec/Rajaraman/
  Ullman "Mining of Massive Datasets" ch.3): shingle → 128 permutations →
  16 bands × 8 rows → band-hash join → verified Jaccard.
- ``simhash64`` + ``simhash_candidates`` — Charikar 2002 sign-random-
  projection over token hashes; hamming-ball candidates via 4×16-bit band
  blocking, verified with ``bit_count(xor)`` (JVM-side).
- ``ngram_jaccard`` — exact Jaccard on n-gram shingle sets for candidate
  pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf

MERSENNE_PRIME = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-content dedup: one row per distinct content digest with the
    surviving (minimum) id and the duplicate count.  Single hash aggregation;
    only the 32-char digest + id shuffle."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            (F.count(F.lit(1)) - F.lit(1)).cast("long").alias("n_dupes"),
        )
    )


# ---------------------------------------------------------------------------
# shingling (JVM-side)
# ---------------------------------------------------------------------------

def tokens_column(col: F.Column) -> F.Column:
    """Lowercased word tokens (letter/digit runs)."""
    return F.filter(F.split(F.lower(col), r"[^\p{L}\p{N}]+"), lambda t: t != F.lit(""))


def shingles_column(tokens: F.Column, k: int = 3) -> F.Column:
    """Word k-gram shingles from a token array — pure builtin ops."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k))),
        ).otherwise(F.array(F.concat_ws(" ", tokens)))
    )


def shingle_hashes(df: DataFrame, text_col: str, k: int = 3, out_col: str = "shingle_hashes") -> DataFrame:
    """text → array of 64-bit shingle hashes, all JVM-side (xxhash64)."""
    toks = tokens_column(F.col(text_col))
    sh = shingles_column(toks, k)
    return df.withColumn(out_col, F.transform(sh, lambda s: F.xxhash64(s)))


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE_PRIME, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, MERSENNE_PRIME, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    shingle_k: int = 3,
    seed: int = 42,
    sig_col: str = "signature",
) -> DataFrame:
    """id → minhash signature (array<long> of length num_perm).

    Shingle hashing is JVM-side; the Python stage is a vectorized numpy
    ``min((a*x + b) mod p)`` over an int array per row — Arrow in, Arrow out.
    """
    a, b = _perm_params(num_perm, seed)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _minhash(hashes: pd.Series) -> pd.Series:
        out = []
        for arr in hashes:
            if arr is None or len(arr) == 0:
                out.append([0] * len(a))
                continue
            x = np.asarray(arr, dtype=np.int64).astype(np.uint64) & _MAX_HASH
            # (num_perm, n) broadcast; mod-prime then clamp to 32-bit universe
            phv = (np.outer(a, x) + b[:, None]) % MERSENNE_PRIME
            out.append((phv.min(axis=1) & _MAX_HASH).astype(np.int64).tolist())
        return pd.Series(out)

    hashed = shingle_hashes(df, text_col, shingle_k, "_sh")
    return hashed.select(F.col(id_col), _minhash(F.col("_sh")).alias(sig_col))


def lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "signature",
    bands: int = 16,
) -> DataFrame:
    """Band the signatures and self-join on (band, band_hash) → candidate
    pairs (a < b).  Only (id, band_hash) rows shuffle — at 100 TB the
    signature table is orders of magnitude smaller than the corpus."""
    num_perm_col = F.size(F.col(sig_col))
    rows_per_band = (num_perm_col / bands).cast("int")
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                band_idx,
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col(sig_col), i * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("bh"),
    ).select(id_col, "bh.band", "bh.band_hash")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            on=[
                F.col(f"l.band") == F.col("r.band"),
                F.col(f"l.band_hash") == F.col("r.band_hash"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return pairs


def verified_jaccard(
    pairs: DataFrame,
    docs_hashed: DataFrame,
    id_col: str = "doc_id",
    hashes_col: str = "shingle_hashes",
) -> DataFrame:
    """Join candidate pairs back to shingle-hash sets and compute exact
    Jaccard JVM-side (array_intersect/array_union on hash arrays)."""
    a = docs_hashed.select(
        F.col(id_col).alias("id_a"), F.col(hashes_col).alias("_ha")
    )
    b = docs_hashed.select(
        F.col(id_col).alias("id_b"), F.col(hashes_col).alias("_hb")
    )
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("_ha", "_hb"))
    union = F.size(F.array_union("_ha", "_hb"))
    return joined.select(
        "id_a",
        "id_b",
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Full near-dup pipeline: pairs (id_a < id_b, jaccard) with verified
    Jaccard >= threshold."""
    hashed = shingle_hashes(df, text_col, shingle_k, "shingle_hashes").select(
        id_col, "shingle_hashes"
    )
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_k, seed)
    cands = lsh_candidates(sigs, id_col, "signature", bands)
    return verified_jaccard(cands, hashed, id_col).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "simhash",
) -> DataFrame:
    """64-bit SimHash over token hashes (Charikar sign-random-projection):
    bit j of the result = majority vote of bit j across token hashes."""

    @pandas_udf(T.LongType())
    def _simhash(hashes: pd.Series) -> pd.Series:
        out = []
        for arr in hashes:
            if arr is None or len(arr) == 0:
                out.append(0)
                continue
            x = np.asarray(arr, dtype=np.int64).view(np.uint64)
            bits = ((x[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
            votes = bits.sum(axis=0) * 2 > len(x)
            val = np.uint64(0)
            for j in np.nonzero(votes)[0]:
                val |= np.uint64(1) << np.uint64(j)
            out.append(int(val.astype(np.int64)))
        return pd.Series(out, dtype="int64")

    toks = tokens_column(F.col(text_col))
    hashed = df.withColumn("_th", F.transform(toks, lambda t: F.xxhash64(t)))
    return hashed.withColumn(out_col, _simhash(F.col("_th"))).drop("_th")


def simhash_candidates(
    sims: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Blocking: split the 64-bit hash into 4 16-bit chunks; any pair within
    hamming distance 3 must agree on >= 1 chunk (pigeonhole), so a self-join
    per chunk finds all candidates without a cross join.  Verification is
    ``bit_count(a XOR b)`` — pure JVM."""
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col(sim_col), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(f"c{i}")
            for i in range(4)
        ]
    )
    blocked = sims.select(
        F.col(id_col), F.col(sim_col), F.posexplode(chunks).alias("chunk_pos", "chunk_val")
    )
    l, r = blocked.alias("l"), blocked.alias("r")
    pairs = (
        l.join(
            r,
            on=[
                F.col("l.chunk_pos") == F.col("r.chunk_pos"),
                F.col("l.chunk_val") == F.col("r.chunk_val"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"l.{sim_col}").alias("_sa"),
            F.col(f"r.{sim_col}").alias("_sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return pairs.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# n-gram jaccard (exact, for candidate pairs)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    block_bands: int = 8,
) -> DataFrame:
    """Exact n-gram Jaccard >= threshold, LSH-blocked so it never cross-joins
    the corpus (block_bands minhash bands generate candidates; a lower
    threshold needs more bands)."""
    hashed = shingle_hashes(df, text_col, k, "shingle_hashes").select(id_col, "shingle_hashes")
    sigs = minhash_signatures(df, text_col, id_col, num_perm=64, shingle_k=k)
    cands = lsh_candidates(sigs, id_col, "signature", bands=block_bands)
    return verified_jaccard(cands, hashed, id_col).filter(F.col("jaccard") >= threshold)
