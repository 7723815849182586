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


class TestBigramSurprisal:
    def test_matches_manual_laplace(self, spark):
        import math

        from solr_map_reduce_spark.extensions.text_analysis import (
            bigram_surprisal,
        )

        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "b a")], "doc_id long, text string"
        )
        got = {r["doc_id"]: r for r in bigram_surprisal(df).collect()}
        # unigrams a:3 b:3, V=2; c(a,b)=2, c(b,a)=2
        # doc1 bigrams (a,b),(b,a),(a,b): each p = (2+1)/(3+2)
        assert got[1]["n_bigrams"] == 3
        assert got[1]["surprisal"] == pytest.approx(-math.log(3 / 5), rel=1e-12)
        assert got[2]["n_bigrams"] == 1

    def test_word_salad_ranks_higher_than_repetition(self, spark):
        from solr_map_reduce_spark.extensions.text_analysis import (
            bigram_surprisal,
        )

        df = spark.createDataFrame(
            [(1, "the cat sat on the mat " * 5),
             (2, "mat the on sat the cat " * 5)],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["surprisal"] for r in bigram_surprisal(df).collect()}
        # both docs share the unigram distribution; doc 2's transitions
        # are rarer (they only occur in doc 2) -> higher surprisal...
        # actually both contribute transitions to the LM equally here, so
        # assert the SIGNAL instead: against an external LM of doc 1 only
        lm = df.filter("doc_id = 1")
        got = {r["doc_id"]: r["surprisal"]
               for r in bigram_surprisal(df, lm_df=lm).collect()}
        assert got[2] > got[1]

    def test_single_token_docs_drop(self, spark):
        from solr_map_reduce_spark.extensions.text_analysis import (
            bigram_surprisal,
        )

        df = spark.createDataFrame(
            [(1, "word"), (2, "two words")], "doc_id long, text string"
        )
        assert [r["doc_id"] for r in bigram_surprisal(df).collect()] == [2]


def test_bigram_surprisal_survives_empty_documents(spark):
    """Review finding: slice() throws on negative length — an empty or
    punctuation-only doc must not crash the whole job."""
    from solr_map_reduce_spark.extensions.text_analysis import bigram_surprisal

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, ""), (3, "!!!"), (4, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in bigram_surprisal(df).collect()}
    assert got == {1}  # token-less docs contribute nothing, no crash
