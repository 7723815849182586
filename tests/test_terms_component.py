"""Solr TermsComponent (SearchIndex.terms): raw term enumeration with df
from the term dictionary — prefix/bounds/regex/mincount/maxcount/sort —
identical answers with and without the ``_vocab/`` sidecar (dictionary
read vs corpus fallback)."""

import pytest


@pytest.fixture(scope="module", params=[True, False], ids=["vocab", "scan"])
def idx(request, spark, tmp_path_factory):
    from solr_map_reduce_spark.index_reader import SearchIndex
    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
    from solr_map_reduce_spark.schema import Field, IndexSchema

    schema = IndexSchema(
        fields=(Field("id", "string", required=True), Field("text", "text_general")),
        unique_key="id",
    )
    df = spark.createDataFrame(
        [
            ("1", "sun sand surf"),
            ("2", "sun sets slowly"),
            ("3", "sun and moon"),
            ("4", "tide tables"),
            ("5", "moon tide"),
        ],
        "id string, text string",
    )
    out = str(tmp_path_factory.mktemp("terms") / f"idx_{request.param}")
    IndexJob(
        IndexJobConfig(schema=schema, shards=2, dedup="none",
                       search_stats=request.param)
    ).build(df, out)
    return SearchIndex.open(spark, out)


def _rows(df):
    return [(r["term"], r["df"]) for r in df.collect()]


class TestTermsComponent:
    def test_default_count_sort(self, idx):
        # df desc, term asc — Solr's terms.sort=count default
        got = _rows(idx.terms(limit=3))
        assert got[0] == ("sun", 3)
        assert got[1:] == [("moon", 2), ("tide", 2)]

    def test_index_sort_and_bounds(self, idx):
        # lower inclusive, upper exclusive (Solr defaults)
        got = _rows(idx.terms(lower="s", upper="t", sort="index", limit=10))
        assert got == [("sand", 1), ("sets", 1), ("slowly", 1),
                       ("sun", 3), ("surf", 1)]
        # flipped inclusivity: (s, sun] keeps sun, drops sand..surf > sun
        got = _rows(idx.terms(lower="sand", upper="sun", lower_incl=False,
                              upper_incl=True, sort="index", limit=10))
        assert got == [("sets", 1), ("slowly", 1), ("sun", 3)]

    def test_prefix_regex_counts(self, idx):
        assert _rows(idx.terms(prefix="su", sort="index", limit=10)) == [
            ("sun", 3), ("surf", 1)
        ]
        assert _rows(idx.terms(regex="^.{4}$", mincount=2, sort="index",
                               limit=10)) == [("moon", 2), ("tide", 2)]
        # maxcount excludes the df-3 term
        got = _rows(idx.terms(maxcount=2, prefix="s", sort="index", limit=10))
        assert ("sun", 3) not in got and ("sand", 1) in got

    def test_bad_sort_rejected(self, idx):
        with pytest.raises(ValueError, match="terms.sort"):
            idx.terms(sort="df")


def test_regex_is_full_match(idx):
    # Lucene Pattern.matches(): 'oo' must NOT match 'moon' as a substring
    got = _rows(idx.terms(regex="oo", limit=10))
    assert got == []
    got = _rows(idx.terms(regex=".*oo.*", sort="index", limit=10))
    assert [t for t, _ in got] == ["moon"]
