"""Round-8 text-analysis additions."""

import pytest




class TestUnigramSurprisal:
    """Round-8 perplexity proxy: mean negative log Laplace-smoothed
    corpus-unigram probability; cross-corpus scoring gives unseen tokens
    the OOV mass."""

    def test_rare_vocabulary_scores_higher(self, spark):
        import math

        from solr_map_reduce_spark.extensions.text_analysis import (
            unigram_surprisal,
        )

        df = spark.createDataFrame(
            [(1, "common common common common"), (2, "common rareword")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in unigram_surprisal(df).collect()}
        # manual Laplace: N=6 tokens, V=2; p(common)=(5+1)/8, p(rare)=(1+1)/8
        p_c, p_r = 6 / 8, 2 / 8
        assert got[1]["surprisal"] == pytest.approx(-math.log(p_c), rel=1e-12)
        assert got[2]["surprisal"] == pytest.approx(
            (-math.log(p_c) - math.log(p_r)) / 2, rel=1e-12
        )
        assert got[2]["surprisal"] > got[1]["surprisal"]
        assert got[1]["n_tokens"] == 4

    def test_cross_corpus_oov_mass(self, spark):
        import math

        from solr_map_reduce_spark.extensions.text_analysis import (
            unigram_surprisal,
        )

        lm = spark.createDataFrame([(1, "alpha beta alpha")], "doc_id long, text string")
        score = spark.createDataFrame([(9, "alpha unseen")], "doc_id long, text string")
        got = unigram_surprisal(score, lm_df=lm).collect()[0]
        # LM: N=3, V=2; p(alpha)=(2+1)/5, p(unseen OOV)=(0+1)/5
        want = (-math.log(3 / 5) - math.log(1 / 5)) / 2
        assert got["surprisal"] == pytest.approx(want, rel=1e-12)
