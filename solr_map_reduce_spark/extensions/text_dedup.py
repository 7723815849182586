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
- ``dedup_passages`` — corpus-wide passage-level exact dedup (the C4/CCNet
  line-dedup pass): first occurrence of each distinct passage wins,
  documents reassembled from survivors.
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


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Spread a low-partition input (e.g. one small parquet file) across the
    cluster before heavy per-row work.  At real scale inputs already have
    many splits and this is a no-op; without it a single-file input pins the
    whole shingling stage to one or two cores (observed 3.3x at sf0.1)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


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
    """Lowercased word tokens (letter/digit runs).  Strip-then-split keeps
    the expression in whole-stage codegen (an interpreted higher-order
    filter() measured 3.7x slower at sf0.1)."""
    pat = r"[^\p{L}\p{N}]+"
    stripped = F.regexp_replace(F.lower(col), rf"^{pat}|{pat}$", "")
    return F.when(stripped == "", F.array().cast("array<string>")).otherwise(
        F.split(stripped, pat)
    )


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


def _rot64(col: F.Column, r: int) -> F.Column:
    """Bitwise rotate-left on long — shift ops are overflow-free under ANSI."""
    return F.shiftleft(col, r).bitwiseOR(F.shiftrightunsigned(col, 64 - r))


def shingle_hashes(df: DataFrame, text_col: str, k: int = 3, out_col: str = "shingle_hashes") -> DataFrame:
    """text → array of 64-bit shingle hashes, all JVM-side.

    Two performance-critical choices (observed at sf0.1):
    - Tokens are materialized in their own projection: higher-order array
      functions are interpreted (no codegen), and inlining the split/filter
      expression into every consumer re-evaluates it per use (2-3x).
    - Shingle hashes are computed WITHOUT materializing shingle strings:
      hash each token once (xxhash64), then combine k consecutive token
      hashes with position-dependent rotations + xor — pure integer ops
      instead of per-shingle slice+concat+hash of strings (another ~2x).
      Jaccard over these hash sets equals Jaccard over shingle sets modulo
      64-bit collisions.
    """
    staged = df.withColumn("_toks", tokens_column(F.col(text_col)))
    staged = staged.withColumn(
        "_th", F.transform(F.col("_toks"), lambda t: F.xxhash64(t))
    )
    th = F.col("_th")
    n = F.size(th)

    def combine(i: F.Column) -> F.Column:
        # xor of rotated token hashes for positions i .. i+k-1 (1-based
        # element_at); try_element_at gives null past the end (short docs)
        acc = None
        for j in range(k):
            part = _rot64(
                F.coalesce(F.try_element_at(th, i + F.lit(j + 1)), F.lit(0)),
                (j * 21) % 63 + 1,
            )
            acc = part if acc is None else acc.bitwiseXOR(part)
        return acc

    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    hashes = F.when(n > 0, F.array_distinct(F.transform(idx, combine))).otherwise(
        F.array().cast("array<bigint>")
    )
    return staged.withColumn(out_col, hashes).drop("_toks", "_th")


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE_PRIME, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, MERSENNE_PRIME, size=num_perm, dtype=np.uint64)
    return a, b


def _minhash_batch(hashes: pd.Series, a: np.ndarray, b: np.ndarray) -> pd.Series:
    """Whole-batch minhash: one chunked (num_perm, n) permutation matrix +
    minimum.reduceat over the flattened batch — no per-row Python.  Rows
    with no hashes get the all-zero signature."""
    num_perm = len(a)
    nrows = len(hashes)
    lists = [v if v is not None else [] for v in hashes]
    lens = np.fromiter((len(v) for v in lists), dtype=np.int64, count=nrows)
    total = int(lens.sum())
    sig = np.zeros((nrows, num_perm), dtype=np.uint64)
    if total:
        flat = (
            np.concatenate([np.asarray(v, dtype=np.int64) for v in lists if len(v)])
            .astype(np.uint64)
            & _MAX_HASH
        )
        starts = np.zeros(nrows + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        nonzero = lens > 0
        max_hash = np.uint64(_MAX_HASH)
        chunk_budget = 200_000  # keep the permutation matrix ~200 MB
        i0 = 0
        while i0 < nrows:
            i1 = i0 + 1
            while i1 < nrows and starts[i1 + 1] - starts[i0] <= chunk_budget:
                i1 += 1
            seg = flat[starts[i0] : starts[i1]]
            if seg.size:
                phv = (np.outer(a, seg) + b[:, None]) % MERSENNE_PRIME
                # reduceat over NON-EMPTY rows only: an empty row's offset
                # equals the next row's start, and clipping it instead would
                # split the preceding row's segment (dropping hashes from
                # its min) — caught by the hypothesis kernel-parity test
                nz = np.flatnonzero(nonzero[i0:i1])
                offs = starts[i0:i1][nz] - starts[i0]
                red = np.minimum.reduceat(phv, offs, axis=1)
                sig[i0 + nz] = (red & max_hash).T
            i0 = i1
    return pd.Series(list(sig.view(np.int64)))


def signatures_from_hashes(
    hashed: DataFrame,
    id_col: str = "doc_id",
    hashes_col: str = "shingle_hashes",
    num_perm: int = 128,
    seed: int = 42,
    sig_col: str = "signature",
) -> DataFrame:
    """(id, shingle_hashes) → (id, signature) — reuses an already-hashed
    input so pipelines that need both sets and signatures compute the
    shingling once."""
    a, b = _perm_params(num_perm, seed)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _minhash(hashes: pd.Series) -> pd.Series:
        return _minhash_batch(hashes, a, b)

    return hashed.select(F.col(id_col), _minhash(F.col(hashes_col)).alias(sig_col))


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

    Shingle hashing is JVM-side; the Python stage is the whole-batch
    vectorized ``min(((a*x + b) mod 2^64) mod p)`` kernel — Arrow in,
    Arrow out.  (a*x wraps uint64 BEFORE the Mersenne mod — the same
    family datasketch computes: deterministic and consistent across the
    one-shot and incremental kernels, but not the textbook universal
    hash; the banding curve is empirical, not a pairwise-independence
    theorem.)
    """
    a, b = _perm_params(num_perm, seed)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _minhash(hashes: pd.Series) -> pd.Series:
        return _minhash_batch(hashes, a, b)

    hashed = shingle_hashes(df, text_col, shingle_k, "_sh")
    return hashed.select(F.col(id_col), _minhash(F.col("_sh")).alias(sig_col))


def _warn_banding_gap(threshold: float, bands: int, rows: int,
                      where: str) -> None:
    """Loud (but non-fatal) when the verify threshold sits far below the
    LSH banding operating point (1/b)^(1/r): candidate RECALL collapses
    there — a true pair at jaccard = threshold rarely shares any band —
    and the silent miss reads as 'no duplicates found'."""
    import warnings

    op = (1.0 / bands) ** (1.0 / rows)
    if threshold < op - 0.1:
        warnings.warn(
            f"{where}: threshold={threshold} is well below the "
            f"{bands}x{rows} banding operating point (~{op:.2f}); most "
            "true pairs near the threshold never become candidates — "
            "raise bands (fewer rows per band) to match the threshold",
            stacklevel=3,
        )


def lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "signature",
    bands: int = 16,
) -> DataFrame:
    """Band the signatures and self-join on (band, band_hash) → candidate
    pairs (a < b).  Only (id, band_hash) rows shuffle — at 100 TB the
    signature table is orders of magnitude smaller than the corpus.

    ``bands`` must divide the signature length (checked against the
    first row): a silent floor would band only a prefix of the
    signature (a very different threshold curve), and bands > num_perm
    would give every doc an EMPTY band slice — identical band hashes
    corpus-wide, an O(n²) self-join."""
    first = sigs.select(F.size(F.col(sig_col)).alias("_n")).first()
    if first is not None:
        num_perm = int(first["_n"])
        if bands > num_perm or num_perm % bands:
            raise ValueError(
                f"bands={bands} must divide the signature length "
                f"({num_perm}) — same contract as minhash_features"
            )
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
    broadcast_pairs: bool = True,
) -> DataFrame:
    """Join candidate pairs back to shingle-hash sets and compute exact
    Jaccard JVM-side (array_intersect/array_union on hash arrays).

    ``broadcast_pairs`` builds the hash table from the (id_a, id_b) pair list
    and probes with the much larger feature table, so the feature table never
    shuffles (measured ~1.8x at sf0.1).  LSH-banded candidates are a small
    fraction of the corpus by construction; disable only if a low threshold /
    many bands makes the pair list itself too large to broadcast — AQE then
    picks the join strategy from runtime sizes."""
    a = docs_hashed.select(
        F.col(id_col).alias("id_a"), F.col(hashes_col).alias("_ha")
    )
    b = docs_hashed.select(
        F.col(id_col).alias("id_b"), F.col(hashes_col).alias("_hb")
    )
    p = F.broadcast(pairs) if broadcast_pairs else pairs
    joined = a.join(p, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("_ha", "_hb"))
    union = F.size(F.array_union("_ha", "_hb"))
    # two EMPTY shingle sets (punctuation-only / empty docs — they all
    # share identical zero signatures, so they always become candidates)
    # would divide 0.0/0.0 = NaN, and Spark's NaN-is-greatest ordering
    # makes NaN >= threshold TRUE — every pair of empty docs would be
    # reported a near-dup, a QUADRATIC blowup on boilerplate-stripped
    # web corpora.  Empty vs empty is jaccard 0 here: no shingles, no
    # textual evidence of duplication.
    jac = F.when(
        union > 0, inter.cast("double") / union.cast("double")
    ).otherwise(F.lit(0.0))
    return joined.select("id_a", "id_b", jac.alias("jaccard"))


def minhash_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """One-pass (id, shingle_hashes, signature, band_hashes) per document.

    Tokenization stays JVM-side (one split/filter projection); everything
    downstream happens in a SINGLE batch-vectorized pandas UDF: token
    hashing (``pd.util.hash_array`` over the whole flattened batch — C
    speed, fixed key, deterministic across workers; measured ~2x faster
    than a per-token ``xxhash64`` higher-order projection), shingle
    combination (rotate-xor of k consecutive token hashes), the num_perm
    minhash permutations (``min((a·x+b) mod p)`` via one reduceat over the
    whole Arrow batch, no per-row Python), and the LSH band hashes (FNV
    fold over signature segments).  Replaces three separate stages — two
    interpreted higher-order-function projections and a per-row-loop UDF —
    with one.  Shingle arrays are NOT deduplicated: min() is
    duplicate-insensitive and ``array_intersect``/``array_union`` dedup
    internally, so set-Jaccard is unaffected.
    """
    if num_perm % bands != 0:
        raise ValueError(f"num_perm={num_perm} not divisible by bands={bands}")
    a, b = _perm_params(num_perm, seed)
    rows_per_band = num_perm // bands
    rots = [(j * 21) % 63 + 1 for j in range(shingle_k)]
    k = shingle_k
    max_hash = np.uint64(_MAX_HASH)

    out_type = T.StructType(
        [
            T.StructField("shingle_hashes", T.ArrayType(T.LongType())),
            T.StructField("signature", T.ArrayType(T.LongType())),
            T.StructField("band_hashes", T.ArrayType(T.LongType())),
        ]
    )

    def _rotl(v: np.ndarray, s: int) -> np.ndarray:
        return (v << np.uint64(s)) | (v >> np.uint64(64 - s))

    @pandas_udf(out_type)
    def _feat(toks: pd.Series) -> pd.DataFrame:
        import itertools

        nrows = len(toks)
        tok_lists = [v if v is not None else [] for v in toks]
        lens = np.fromiter((len(v) for v in tok_lists), dtype=np.int64, count=nrows)
        total_tokens = int(lens.sum())
        flat = np.empty(total_tokens, dtype=object)
        if total_tokens:
            flat[:] = list(itertools.chain.from_iterable(tok_lists))
        th = pd.util.hash_array(flat)  # uint64, fixed key → run-deterministic
        pad = k - 1
        starts = np.zeros(nrows + 1, dtype=np.int64)
        np.cumsum(lens + pad, out=starts[1:])
        tok_starts = np.zeros(nrows + 1, dtype=np.int64)
        np.cumsum(lens, out=tok_starts[1:])
        x = np.zeros(int(starts[-1]), dtype=np.uint64)
        if total_tokens:
            # scatter each row's token hashes into its zero-padded block
            pos = np.arange(total_tokens) + np.repeat(
                starts[:-1] - tok_starts[:-1], lens
            )
            x[pos] = th
        # sh_full[j] = xor_i rotl(x[j+i], rot_i); per-row zero padding keeps
        # shifts from crossing row boundaries (and matches coalesce-to-0 for
        # docs shorter than k tokens)
        total = x.size
        if total >= k:
            sh_full = _rotl(x[: total - pad], rots[0])
            for j in range(1, k):
                sh_full = sh_full ^ _rotl(x[j : total - pad + j], rots[j])
        else:
            sh_full = np.empty(0, dtype=np.uint64)
        m_rows = np.where(lens > 0, np.maximum(lens - pad, 1), 0)
        n_sh = int(m_rows.sum())
        sh_starts = np.zeros(nrows + 1, dtype=np.int64)
        np.cumsum(m_rows, out=sh_starts[1:])
        # gather each row's shingle slice out of sh_full
        gidx = np.repeat(starts[:-1], m_rows) + (
            np.arange(n_sh) - np.repeat(sh_starts[:-1], m_rows)
        )
        sh_all = sh_full[gidx] if n_sh else np.empty(0, dtype=np.uint64)

        sig = np.zeros((nrows, num_perm), dtype=np.uint64)
        # chunk rows so the (num_perm, n_shingles) permutation matrix stays
        # ~200 MB regardless of Arrow batch size
        chunk_budget = 200_000
        i0 = 0
        while i0 < nrows:
            i1 = i0 + 1
            while i1 < nrows and sh_starts[i1 + 1] - sh_starts[i0] <= chunk_budget:
                i1 += 1
            seg = sh_all[sh_starts[i0] : sh_starts[i1]]
            if seg.size:
                phv = (np.outer(a, seg & max_hash) + b[:, None]) % MERSENNE_PRIME
                # reduceat over NON-EMPTY rows only (an empty row's clipped
                # offset would split the preceding row's segment)
                nz = np.flatnonzero(m_rows[i0:i1] > 0)
                offs = sh_starts[i0:i1][nz] - sh_starts[i0]
                red = np.minimum.reduceat(phv, offs, axis=1)
                sig[i0 + nz] = (red & max_hash).T
            i0 = i1

        # FNV-1a fold over each band's signature columns, vectorized per band
        bh = np.empty((nrows, bands), dtype=np.uint64)
        fnv_offset = np.uint64(1469598103934665603)
        fnv_prime = np.uint64(1099511628211)
        for bi in range(bands):
            h = np.full(nrows, fnv_offset ^ np.uint64(bi), dtype=np.uint64)
            for c in range(bi * rows_per_band, (bi + 1) * rows_per_band):
                h = (h ^ sig[:, c]) * fnv_prime
            bh[:, bi] = h

        sh_i64 = sh_all.view(np.int64)
        return pd.DataFrame(
            {
                "shingle_hashes": np.split(sh_i64, sh_starts[1:-1]),
                "signature": list(sig.view(np.int64)),
                "band_hashes": list(bh.view(np.int64)),
            }
        )

    staged = df.withColumn("_toks", tokens_column(F.col(text_col)))
    return staged.select(F.col(id_col), _feat("_toks").alias("mh")).select(
        id_col, "mh.shingle_hashes", "mh.signature", "mh.band_hashes"
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
    Jaccard >= threshold.

    The feature table (shingle hashes + band hashes) is computed ONCE by
    :func:`minhash_features` and persisted: the LSH self-join reuses it on
    both sides and verification joins back to it.  The signature column is
    consumed inside the feature kernel and never read again, so it is
    projected OUT before the persist (num_perm longs/doc of storage that
    only squeezed execution memory — guide §5).  Only (id, band_hash)
    rows shuffle for candidate generation — at 100 TB the feature table
    is orders of magnitude smaller than the corpus.  The band index is
    already folded into each band hash (the FNV offset is seeded with the
    band number), so the self-join keys on the single 8-byte hash — the
    former separate band column was redundant exchange payload and a
    second join key (guide §2.2/§2.3); a cross-band FNV collision could
    only ADD a candidate, which exact-Jaccard verification then filters
    like any other false positive."""
    df = ensure_parallelism(df)
    feats = (
        minhash_features(df, text_col, id_col, num_perm, bands, shingle_k, seed)
        .select(id_col, "shingle_hashes", "band_hashes")
        .persist()
    )
    try:
        banded = feats.select(
            F.col(id_col), F.explode("band_hashes").alias("band_hash")
        )
        left = banded.alias("l")
        right = banded.alias("r")
        cands = (
            left.join(
                right,
                on=[
                    F.col("l.band_hash") == F.col("r.band_hash"),
                    F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
                ],
            )
            .select(
                F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
            )
            .distinct()
        )
        out = verified_jaccard(cands, feats, id_col).filter(
            F.col("jaccard") >= threshold
        )
        out = out.localCheckpoint(eager=True)
    finally:
        # blocking: repeated calls (bench reps, batch loops) must not
        # accumulate storage blocks that squeeze execution memory until
        # an eventual async ContextCleaner pass
        feats.unpersist(blocking=True)
    return out


# ---------------------------------------------------------------------------
# cluster resolution: near-dup pairs → canonical clusters
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(id, cluster_id) for every vertex in the pair graph — cluster_id is
    the minimum vertex id of the component (canonical representative, the
    "keep this doc" choice of a dedup pipeline).

    Iterative min-label propagation WITH pointer jumping (each round a
    vertex takes min(own, neighbors') label, then follows its label's label
    — path halving), the standard distributed CC recipe: O(log n) rounds
    instead of O(diameter).  Per round: one edges×labels shuffle join +
    groupBy-min, one labels×labels jump join, and a single-scalar
    convergence check.  ``localCheckpoint`` truncates the lineage each round
    so plan size stays constant regardless of iteration count.
    """
    fwd = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = fwd.unionByName(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(
                labels.select(F.col("node").alias("b"), F.col("label").alias("_nl")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("_nl").alias("_nbr_label"))
        )
        cand = labels.join(nbr_min, labels["node"] == nbr_min["a"], "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("_nbr_label"), F.col("label"))
            ).alias("label"),
        )
        # pointer jump: label ← label(label).  Every label is itself a vertex
        # id, so the self-join resolves one more hop per round (path halving)
        parent = cand.select(
            F.col("node").alias("_pn"), F.col("label").alias("_pl")
        )
        new_labels = (
            cand.join(parent, cand["label"] == parent["_pn"], "left")
            .select(
                "node", F.coalesce(F.col("_pl"), F.col("label")).alias("label")
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("id"), F.col("label").alias("cluster_id"))


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "simhash",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash over token hashes (Charikar sign-random-projection):
    bit j of the result = majority vote of bit j across token hashes.

    ``hash_fn``: ``"xxhash64"`` (default — the fastest JVM hash, the right
    choice at 100 TB) or ``"md5_60"`` (60-bit integer from the md5 hex
    prefix via ``conv``; slower, but reproducible in ANSI SQL, which lets
    an external engine cross-check the whole majority-vote bit pipeline —
    the profile the DuckDB correctness oracle runs)."""

    @pandas_udf(T.LongType())
    def _simhash(hashes: pd.Series) -> pd.Series:
        # batch-vectorized: flatten all token hashes, then for each of the
        # 64 bits one masked reduceat sums the bit across every row at once
        # (64 passes over the flat array, zero per-row Python)
        nrows = len(hashes)
        lists = [v if v is not None else [] for v in hashes]
        lens = np.fromiter((len(v) for v in lists), dtype=np.int64, count=nrows)
        total = int(lens.sum())
        if total == 0:
            return pd.Series(np.zeros(nrows, dtype=np.int64))
        flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in lists if len(v)]).view(np.uint64)
        starts = np.zeros(nrows, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        # reduceat over the NON-EMPTY rows' start offsets only: empty rows
        # (and especially trailing empties, whose start == total) would
        # otherwise need clipping, which silently merges the last non-empty
        # row's final token into the wrong segment and corrupts its vote
        nonzero_idx = np.flatnonzero(lens > 0)
        offs = starts[nonzero_idx]  # strictly increasing, all < total
        half = lens[nonzero_idx]  # votes*2 > len  <=>  2*ones > len
        result = np.zeros(nrows, dtype=np.uint64)
        for j in range(64):
            bit = ((flat >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
            ones = np.add.reduceat(bit, offs)
            result[nonzero_idx] |= ((ones * 2 > half).astype(np.uint64)) << np.uint64(j)
        return pd.Series(result.view(np.int64))

    if hash_fn == "xxhash64":
        def token_hash(t):
            return F.xxhash64(t)
    elif hash_fn == "md5_60":
        def token_hash(t):
            return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5_60', got {hash_fn!r}")
    df = ensure_parallelism(df)
    staged = df.withColumn("_toks", tokens_column(F.col(text_col)))
    hashed = staged.withColumn(
        "_th", F.transform(F.col("_toks"), token_hash)
    )
    return hashed.withColumn(out_col, _simhash(F.col("_th"))).drop("_toks", "_th")


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
    ``bit_count(a XOR b)`` — pure JVM.

    The 4-chunk pigeonhole is COMPLETE only for ``max_hamming <= 3`` (4
    differing bits can land one per chunk and agree nowhere); larger
    values still run — the chunk-agreement blocking then finds MOST but
    not provably all qualifying pairs — with a loud warning, since the
    docstring contract weakens to best-effort there."""
    if max_hamming > 3:
        import warnings

        warnings.warn(
            f"simhash_candidates(max_hamming={max_hamming}): the 4x16-bit "
            "pigeonhole blocking is complete only for distances <= 3 — "
            "pairs whose differing bits spread across all four chunks "
            "will be missed (best-effort candidates at this distance)",
            stacklevel=2,
        )
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
    _warn_banding_gap(threshold, block_bands, 64 // block_bands,
                      "ngram_jaccard_pairs")
    df = ensure_parallelism(df)
    hashed = (
        shingle_hashes(df, text_col, k, "shingle_hashes")
        .select(id_col, "shingle_hashes")
        .persist()
    )
    try:
        sigs = signatures_from_hashes(hashed, id_col, "shingle_hashes", num_perm=64)
        cands = lsh_candidates(sigs, id_col, "signature", bands=block_bands)
        out = verified_jaccard(cands, hashed, id_col).filter(
            F.col("jaccard") >= threshold
        )
        out = out.localCheckpoint(eager=True)
    finally:
        hashed.unpersist(blocking=True)  # deterministic release (see above)
    return out


# ---------------------------------------------------------------------------
# train/test decontamination
# ---------------------------------------------------------------------------

def decontaminate(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Flag training documents that share any token n-gram with an eval/test
    corpus — the standard pre-training decontamination pass (n=13 is the
    common benchmark-overlap window).

    Returns ``(id_col, n_hits, contaminated)`` for every train doc, where
    ``n_hits`` counts the distinct contaminated n-grams.  Filter on
    ``~contaminated`` for the clean corpus.

    Scale shape: the test corpus (benchmarks) is tiny next to a 100 TB train
    set, so its distinct n-gram hashes BROADCAST; the train side explodes
    to (id, gram_hash) rows — 8-byte hashes, never text — and the broadcast
    inner join + per-id count never shuffles documents.  Docs shorter than
    ``n`` tokens fall back to their whole-token-sequence gram (matching an
    equally short test doc verbatim still counts); empty docs produce no
    grams and are never contaminated.
    """

    def gram_hashes() -> F.Column:
        toks = tokens_column(F.col(text_col))
        sh = shingles_column(toks, n)
        sh = F.when(F.size(toks) > 0, sh).otherwise(F.array().cast("array<string>"))
        return F.array_distinct(F.transform(sh, lambda s: F.xxhash64(s)))

    tr = ensure_parallelism(train).select(
        F.col(id_col), F.explode(gram_hashes()).alias("_g")
    )
    te = test.select(F.explode(gram_hashes()).alias("_g")).distinct()
    hits = (
        tr.join(F.broadcast(te), "_g")
        .groupBy(id_col)
        .agg(F.count_distinct("_g").alias("n_hits"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# passage-level (line/chunk) corpus-wide exact dedup
# ---------------------------------------------------------------------------

def dedup_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
    delimiter: str = " ",
) -> DataFrame:
    """Corpus-wide passage-level exact dedup — the C4/CCNet "line dedup"
    pass, generalized to fixed ``chunk_words``-word chunks split on
    ``delimiter`` (for true LINE dedup pass ``delimiter="\n"`` with
    ``chunk_words=1`` — there is no implicit newline mode).  Keep each
    distinct passage only at its FIRST occurrence in corpus order
    (min ``(id, position)``), and reassemble the surviving text per doc.

    Returns ``(id_col, dedup_text, n_kept, n_total)`` — one row per input
    document (documents whose every passage was seen earlier come back with
    an empty ``dedup_text`` and ``n_kept = 0``, mirroring the reference
    pipelines that then drop empties with a filter).

    Scale shape: one shuffle keyed on the passage string for the
    first-occurrence window (equivalently a groupBy over ~total-passage
    cardinality), one shuffle back on id for reassembly.  Passages are the
    natural unit here — a 100 TB corpus has ~1e10 passages, far beyond a
    broadcast, and the window/groupBy formulation lets AQE handle the skew
    of boilerplate passages that occur millions of times.  No Python in the
    plan: split/slice/window/array_join are all codegen'd.
    """
    from pyspark.sql import Window

    words = F.split(F.col(text_col), delimiter)
    n_chunks = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.array_join(
            F.slice(words, i * chunk_words + 1, chunk_words), delimiter
        ),
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("_pos", "_passage")
    )
    first = F.row_number().over(
        Window.partitionBy("_passage").orderBy(id_col, "_pos")
    )
    kept = exploded.withColumn("_rn", first).withColumn(
        "_keep", F.col("_rn") == 1
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_keep"), F.struct("_pos", "_passage"))
                        )
                    ),
                    lambda s: s["_passage"],
                ),
                delimiter,
            ).alias("dedup_text"),
            F.sum(F.col("_keep").cast("long")).alias("n_kept"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
        )
    )
