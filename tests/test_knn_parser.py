"""{!knn} local-params query parser (Solr 9 KnnQParser): exact
brute-force vector search inside the query language."""

import math

import pytest

from solr_map_reduce_spark.extensions.search import QuerySyntaxError
from solr_map_reduce_spark.index_reader import SearchIndex
from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
from solr_map_reduce_spark.schema import Field, IndexSchema


@pytest.fixture(scope="module")
def vidx(spark, tmp_path_factory):
    schema = IndexSchema(
        fields=(Field("vec_id", "long", required=True),
                Field("embedding", "array<float>"),
                Field("label", "string")),
        unique_key="vec_id",
    )
    rows = [
        (1, [1.0, 0.0], "x"),     # cos to [1,0] = 1.0
        (2, [0.9, 0.1], "x"),
        (3, [0.0, 1.0], "y"),     # orthogonal
        (4, [-1.0, 0.0], "y"),    # opposite
        (5, [2.0, 0.0], "x"),     # same direction, bigger norm
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    out = str(tmp_path_factory.mktemp("knn") / "idx")
    IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none")).build(df, out)
    return SearchIndex.open(spark, out)


class TestKnnParser:
    def test_cosine_topk_order_and_tiebreak(self, vidx):
        got = [r["vec_id"] for r in
               vidx.query("{!knn f=embedding topK=3}[1.0, 0.0]").collect()]
        # cos: 1->1.0, 5->1.0, 2->~0.9939, 3->0, 4->-1; tie on 1 vs 5
        # breaks by unique key asc
        assert got == [1, 5, 2]

    def test_dot_similarity(self, vidx):
        got = [r["vec_id"] for r in vidx.query(
            "{!knn f=embedding topK=2 similarity=dot}[1.0, 0.0]"
        ).collect()]
        assert got == [5, 1]  # dot: 5->2.0 beats 1->1.0

    def test_search_fq_postfilters(self, vidx):
        # {!knn} as the main query: topK first, fq filters AFTER
        # (Solr's default post-filtering)
        out = vidx.search(
            q="{!knn f=embedding topK=3}[1.0, 0.0]",
            filters={"label": "x"}, select=["vec_id"],
        )
        assert sorted(r["vec_id"] for r in out.collect()) == [1, 2, 5]

    def test_prefilter_restricts_before_topk(self, vidx):
        # Solr 9.1 preFilter: candidates restrict BEFORE topK — with
        # label:y only the orthogonal/opposite vectors remain, and the
        # page fills from them (post-filtering would return nothing:
        # the global top-3 are all label x)
        got = [r["vec_id"] for r in vidx.query(
            "{!knn f=embedding topK=2 preFilter='label:y'}[1.0, 0.0]"
        ).collect()]
        assert got == [3, 4]

    def test_errors_are_loud(self, vidx):
        with pytest.raises(QuerySyntaxError, match="needs the f="):
            vidx.query("{!knn topK=3}[1.0, 0.0]")
        with pytest.raises(QuerySyntaxError, match="bracketed vector"):
            vidx.query("{!knn f=embedding}1.0, 0.0")
        with pytest.raises(QuerySyntaxError, match="non-numeric"):
            vidx.query("{!knn f=embedding}[a, b]")
        with pytest.raises(QuerySyntaxError, match="similarity"):
            vidx.query("{!knn f=embedding similarity=euclid}[1.0, 0.0]")
