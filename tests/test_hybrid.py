"""Hybrid retrieval (extensions/hybrid.py): RRF fusion semantics.

The end-to-end hybrid path (BM25 artifact + cosine pool + fusion) is
DuckDB-oracled in tests/test_queries_oracle.py (ext_hybrid_rrf); here the
fusion operator itself is checked against hand-computed values.
"""

import pytest


class TestRrfFuse:
    def _fuse(self, spark, lists, **kw):
        from solr_map_reduce_spark.extensions.hybrid import rrf_fuse

        dfs = [
            spark.createDataFrame(rows, "doc_id long, rank int")
            for rows in lists
        ]
        return {
            r["doc_id"]: r["rrf_score"]
            for r in rrf_fuse(dfs, **kw).collect()
        }

    def test_hand_computed(self, spark):
        # doc 1: rank 1 + rank 2;  doc 2: rank 2 only;  doc 3: rank 1 only
        got = self._fuse(
            spark, [[(1, 1), (2, 2)], [(3, 1), (1, 2)]], k=10, k_rrf=60
        )
        assert got[1] == pytest.approx(1 / 61 + 1 / 62, abs=0)
        assert got[2] == pytest.approx(1 / 62, abs=0)
        assert got[3] == pytest.approx(1 / 61, abs=0)
        # both-list doc outranks either single-list doc
        assert got[1] > got[3] > got[2]

    def test_k_limits_and_tiebreak(self, spark):
        # docs 5 and 6 tie exactly (same single rank) -> id ascending wins
        got = self._fuse(spark, [[(6, 3), (5, 3), (4, 1)]], k=2, k_rrf=60)
        assert sorted(got) == [4, 5]

    def test_with_rank_orders_by_score_then_id(self, spark):
        from solr_map_reduce_spark.extensions.hybrid import with_rank

        df = spark.createDataFrame(
            [(10, 0.5), (11, 0.9), (12, 0.5)], "doc_id long, score double"
        )
        ranks = {r["doc_id"]: r["rank"] for r in with_rank(df).collect()}
        assert ranks == {11: 1, 10: 2, 12: 3}

    def test_empty_rankings_rejected(self, spark):
        import pytest

        from solr_map_reduce_spark.extensions.hybrid import rrf_fuse

        with pytest.raises(ValueError, match="at least one"):
            rrf_fuse([])
