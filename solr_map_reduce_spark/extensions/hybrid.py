"""Hybrid retrieval: fuse lexical (BM25) and vector (cosine) rankings.

The modern serving shape for a corpus that carries both stored token
arrays (the search artifact, ``extensions/search.py``) and an embedding
column (``extensions/similarity.py``): run both retrievers to a bounded
candidate pool and fuse by Reciprocal Rank Fusion

    ``RRF(d) = sum over rankings r of 1 / (k_rrf + rank_r(d))``

(Cormack, Clarke & Buettcher, SIGIR 2009 — the parameter-free fusion that
consistently beats score interpolation because it never compares
incommensurable score scales).

Scale shape: each retriever is already a top-``pool`` TakeOrdered (BM25's
one-scan artifact plan, cosine's single-stage scan) — the fusion then
touches only ``n_rankings * pool`` rows, independent of corpus size.  The
rank assignment is a window over an already-bounded pool, not the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def with_rank(
    df: DataFrame, score_col: str = "score", id_col: str = "doc_id"
) -> DataFrame:
    """1-based dense ordering by (score desc, id) — the deterministic rank
    RRF consumes.  Call this on an already-bounded top-k pool: the window
    is global (single partition), which is exactly right for <= a few
    hundred candidate rows and wrong for a corpus."""
    w = Window.orderBy(F.desc(score_col), F.col(id_col))
    return df.select(id_col, F.row_number().over(w).alias("rank"))


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuse ranked candidate pools (each ``(id_col, rank)``, rank 1-based)
    into ``(id_col, rrf_score)`` top-``k``.

    A doc absent from a ranking contributes nothing for it (the standard
    RRF convention).  Union + groupBy keeps the plan shape flat in the
    number of rankings (no join ladder); with two rankings the double sum
    is order-independent (IEEE addition is commutative), so the score is
    bit-deterministic.

    The rankings' id columns must share one type — the union coerces
    silently otherwise ("07" and 7 would fuse as different docs).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contribs = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(k_rrf) + F.col("rank"))).alias("contrib"),
        )
        for r in rankings
    ]
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    return (
        allc.groupBy(id_col)
        .agg(F.sum("contrib").alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.col(id_col))
        .limit(k)
    )


def hybrid_rrf(
    index,
    terms: Sequence[str],
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    pool: int = 50,
    k_rrf: int = 60,
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id_col: str = "doc_id",
    **bm25_kwargs,
) -> DataFrame:
    """BM25 + cosine hybrid top-``k`` over a corpus whose artifact key and
    embedding id coincide.

    ``index`` is a :class:`~solr_map_reduce_spark.index_reader.SearchIndex`
    (BM25 served from stored tokens + stats sidecar — one corpus scan);
    ``embeddings`` carries ``(emb_id_col, vec_col)``.  Both retrievers run
    to ``pool`` candidates, then RRF-fuse.  Returns
    ``(out_id_col, rrf_score)``.
    """
    from solr_map_reduce_spark.extensions.similarity import cosine_topk

    lex = index.bm25(list(terms), k=pool, **bm25_kwargs)
    lex_ranked = with_rank(lex, "score", index.unique_key).withColumnRenamed(
        index.unique_key, out_id_col
    )
    vec = cosine_topk(
        embeddings, query_vec, k=pool, id_col=emb_id_col, vec_col=vec_col
    )
    vec_ranked = with_rank(vec, "score", emb_id_col).withColumnRenamed(
        emb_id_col, out_id_col
    )
    return rrf_fuse([lex_ranked, vec_ranked], k=k, k_rrf=k_rrf, id_col=out_id_col)
