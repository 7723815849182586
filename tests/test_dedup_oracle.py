"""Exact ground-truth oracles for the approximate dedup/similarity family.

These four operators (MinHash+LSH, SimHash blocking, LSH-blocked n-gram
Jaccard, sign-LSH cosine) have no SQL oracle in the driver gate because LSH
banding is not SQL-expressible.  Here the fixture is small enough to compute
EXACT all-pairs ground truth (pure Python / numpy, independent of the Spark
kernels), so each gets:

- a PRECISION assertion: every emitted pair's score matches the exact
  ground-truth score (no false positives above threshold), and
- a RECALL assertion: every ground-truth pair far above threshold —
  including the injected exact copies — is found.  All kernels are seeded,
  so these checks are deterministic, not flaky.

Reference anchor: dedup is the reducer contract
(mr/dedup/RetainMostRecentUpdateConflictResolver.java:71-112); these
extensions generalize it to near-duplicates.
"""

import re
from itertools import combinations

import numpy as np
import pyspark.sql.functions as F
import pytest

from solr_map_reduce_spark.extensions import similarity, text_dedup


# -- pure-Python mirrors of the documented shingling semantics ---------------

def _py_tokens(text: str) -> list[str]:
    # tokens_column: lowercase, split on non-letter/digit runs
    return re.findall(r"[^\W_]+", text.lower(), flags=re.UNICODE)


def _py_shingles(text: str, k: int) -> frozenset:
    toks = _py_tokens(text)
    if len(toks) >= k:
        return frozenset(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))
    return frozenset({" ".join(toks)})


def _py_jaccard(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


@pytest.fixture(scope="module")
def doc_corpus(spark, sf_dir):
    """documents ∪ exact copies of every 7th doc — the query fixture shape."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    copies = d.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    both = d.unionByName(copies)
    rows = both.collect()
    return both, {r["doc_id"]: r["text"] for r in rows}


def _exact_pairs(texts: dict, k: int) -> dict:
    sh = {i: _py_shingles(t, k) for i, t in texts.items()}
    return {
        (a, b): _py_jaccard(sh[a], sh[b])
        for a, b in combinations(sorted(sh), 2)
    }


def test_minhash_dedup_precision_and_recall(doc_corpus):
    df, texts = doc_corpus
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in text_dedup.minhash_dedup(
            df, "text", "doc_id", threshold=0.5
        ).collect()
    }
    exact = _exact_pairs(texts, k=3)
    # precision: every emitted pair's verified jaccard equals the exact
    # shingle-set jaccard (the hash-set formulation collides with prob ~2^-64)
    assert got, "fixture must contain near-dup pairs"
    for pair, j in got.items():
        assert j >= 0.5
        assert j == pytest.approx(exact[pair], abs=1e-9), pair
    # recall: far-above-threshold pairs (the injected exact copies at 1.0)
    # must all be found — at jaccard >= 0.95 a 16-band/8-row scheme's miss
    # probability is < 1e-8, and the seeded kernel is deterministic
    strong = {p for p, j in exact.items() if j >= 0.95}
    assert strong, "fixture must contain exact copies"
    assert strong <= set(got), sorted(strong - set(got))[:5]


def test_ngram_jaccard_precision_and_recall(doc_corpus):
    df, texts = doc_corpus
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in text_dedup.ngram_jaccard_pairs(
            df, "text", "doc_id", k=2, threshold=0.4
        ).collect()
    }
    exact = _exact_pairs(texts, k=2)
    assert got
    for pair, j in got.items():
        assert j >= 0.4
        assert j == pytest.approx(exact[pair], abs=1e-9), pair
    strong = {p for p, j in exact.items() if j >= 0.95}
    assert strong
    assert strong <= set(got), sorted(strong - set(got))[:5]


def test_simhash_blocking_is_complete(doc_corpus):
    """The 4×16-bit chunk blocking is provably complete for hamming <= 3
    (pigeonhole: at most 3 differing chunks leaves one equal).  Verify the
    pipeline emits EXACTLY the all-pairs hamming ball over the simhash
    values — no candidate lost to blocking, none invented."""
    df, _ = doc_corpus
    sims = text_dedup.simhash64(df)
    vals = {r["doc_id"]: r["simhash"] for r in sims.collect()}
    got = {
        (r["id_a"], r["id_b"])
        for r in text_dedup.simhash_candidates(sims, max_hamming=3).collect()
    }
    want = {
        (a, b)
        for a, b in combinations(sorted(vals), 2)
        if bin((vals[a] ^ vals[b]) & 0xFFFFFFFFFFFFFFFF).count("1") <= 3
    }
    assert got == want


def test_cosine_pairs_lsh_precision_and_recall(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    copies = e.filter(F.col("vec_id") % 11 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    both = e.unionByName(copies)
    rows = both.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    gram = m @ m.T
    idx = {v: i for i, v in enumerate(ids)}

    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.cosine_pairs_lsh(both, threshold=0.99).collect()
    }
    assert got, "injected copies guarantee cosine-1.0 pairs"
    for (a, b), c in got.items():
        assert c >= 0.99
        assert c == pytest.approx(gram[idx[a], idx[b]], abs=1e-9), (a, b)
    # identical vectors share the full LSH signature → both half-signature
    # blocks collide → recall of exact copies is 1 by construction
    strong = {
        (min(a, b), max(a, b))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if gram[idx[a], idx[b]] >= 0.9999
    }
    assert strong
    assert strong <= set(got), sorted(strong - set(got))[:5]
