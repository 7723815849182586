"""Round-13 review regressions.

Perf claw-back (r12 verdict "what's wrong #1"): the finite-score kNN
guards cost ~2x on the exact-cosine scans because (a) the single-Column
``cosine_to_query`` evaluated the norm fold twice (guard + denominator)
and (b) Catalyst pushes a Filter through a Project by substituting the
aliased score's whole fold expression into the predicate.  The fix is
the two-projection ``attach_cosine_score`` shape (folds in the inner
project as scalar columns, guard on the scalars) used by every
corpus-wide exact scan — ``cosine_topk``, the mmr pool, and both exact
``{!knn}`` paths.  Plus the ADVICE items: a zero-magnitude cosine QUERY
vector is rejected loudly (Lucene raises; a NULL-everywhere score column
would serve a silently empty page instead).
"""

import math

import pytest
import pyspark.sql.functions as F

from solr_map_reduce_spark.extensions import similarity as sim


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.8, 0.6, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 0.0]),          # zero-norm: NULL score, dropped
        (5, [float("nan"), 1.0, 0.0, 0.0]),  # NaN component: dropped
        (6, [-1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_attach_cosine_score_matches_column_form(spark, vecs):
    q = [1.0, 1.0, 0.0, 0.0]
    got = {
        r["vec_id"]: r["score"]
        for r in sim.attach_cosine_score(vecs, q).collect()
    }
    # rows 4 (zero-norm -> NULL) and 5 (NaN) are dropped
    assert set(got) == {1, 2, 3, 6}
    import numpy as np

    for vid, v in [(1, [1, 0, 0, 0]), (2, [0.8, 0.6, 0, 0]),
                   (3, [0, 1, 0, 0]), (6, [-1, 0, 0, 0])]:
        a, b = np.asarray(v, float), np.asarray(q, float)
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert math.isclose(got[vid], want, rel_tol=1e-12), vid


def test_attach_cosine_score_keeps_nonfinite_when_asked(spark, vecs):
    q = [1.0, 0.0, 0.0, 0.0]
    out = sim.attach_cosine_score(vecs, q, drop_nonfinite=False).collect()
    by_id = {r["vec_id"]: r["score"] for r in out}
    assert len(out) == 6              # nothing dropped
    assert by_id[4] is None           # zero-norm stored vector -> NULL
    assert math.isnan(by_id[5])       # NaN component flows through


def test_cosine_topk_unchanged_by_fast_shape(spark, vecs):
    q = [1.0, 1.0, 0.0, 0.0]
    got = [r["vec_id"] for r in sim.cosine_topk(vecs, q, k=3).collect()]
    # cos: 2 -> 0.9899.., 1 and 3 tie at 0.7071.. (id tiebreak), 6 last
    assert got == [2, 1, 3]


def test_zero_query_vector_raises_in_similarity(spark, vecs):
    with pytest.raises(ValueError, match="zero-magnitude"):
        sim.cosine_topk(vecs, [0.0, 0.0, 0.0, 0.0], k=3)
    with pytest.raises(ValueError, match="zero-magnitude"):
        sim.attach_cosine_score(vecs, [0.0, 0.0, 0.0, 0.0])
    with pytest.raises(ValueError, match="zero-magnitude"):
        sim.cosine_to_query(F.col("embedding"), [0.0, 0.0])


def test_zero_query_vector_raises_in_knn_parser(spark, vecs, tmp_path):
    from solr_map_reduce_spark.extensions.search import QuerySyntaxError
    from solr_map_reduce_spark.index_reader import SearchIndex
    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
    from solr_map_reduce_spark.schema import Field, IndexSchema

    schema = IndexSchema(
        fields=(
            Field("id", "string", required=True),
            Field("embedding", "array<double>"),
        ),
        unique_key="id",
    )
    out = str(tmp_path / "idx")
    IndexJob(IndexJobConfig(schema=schema, shards=2)).build(
        vecs.select(
            F.col("vec_id").cast("string").alias("id"), "embedding"
        ),
        out,
    )
    idx = SearchIndex.open(spark, out)
    with pytest.raises(QuerySyntaxError, match="zero-magnitude"):
        idx.query("{!knn f=embedding topK=3}[0.0, 0.0, 0.0, 0.0]")
    # dot similarity still accepts a zero query (a legal, all-zero score)
    idx.query(
        "{!knn f=embedding topK=3 similarity=dot}[0.0, 0.0, 0.0, 0.0]"
    ).collect()


def test_exact_knn_page_still_drops_poisoned_rows(spark, vecs, tmp_path):
    """The refactored exact {!knn} path keeps the r12 hygiene contract:
    zero-norm and NaN-component stored vectors never appear on a page."""
    from solr_map_reduce_spark.extensions.search import QuerySyntaxError
    from solr_map_reduce_spark.index_reader import SearchIndex
    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
    from solr_map_reduce_spark.schema import Field, IndexSchema

    schema = IndexSchema(
        fields=(
            Field("id", "string", required=True),
            Field("embedding", "array<double>"),
        ),
        unique_key="id",
    )
    out = str(tmp_path / "idx")
    IndexJob(IndexJobConfig(schema=schema, shards=2)).build(
        vecs.select(
            F.col("vec_id").cast("string").alias("id"), "embedding"
        ),
        out,
    )
    idx = SearchIndex.open(spark, out)
    page = [
        r["id"]
        for r in idx.query(
            "{!knn f=embedding topK=10}[1.0, 1.0, 0.0, 0.0]"
        ).collect()
    ]
    assert "4" not in page and "5" not in page
    assert page[0] == "2"
