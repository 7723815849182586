"""Solr GraphQueryParser ({!graph}) over the artifact: breadth-first
cyclic-aware reachability from a root query, with maxDepth/returnRoot/
returnOnlyLeaf/traversalFilter — per Solr's public graph-query contract
(beyond-reference surface; the reference repo has no query parsers)."""

import pytest

from solr_map_reduce_spark.extensions.search import QuerySyntaxError
from solr_map_reduce_spark.index_reader import SearchIndex
from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
from solr_map_reduce_spark.schema import Field, IndexSchema


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    # a small forest + a cycle + a multivalued-link node:
    #   a -> b -> c -> d        (chain)
    #   b -> e                  (branch)
    #   x -> y -> x             (cycle)
    #   m -> [c, y]             (multivalued out-edges)
    #   z                       (isolated)
    # each doc: node_id = its own id, edge_ids = outgoing link targets
    schema = IndexSchema(
        fields=(Field("id", "string", required=True),
                Field("node_id", "string"),
                Field("edge_ids", "string", multi_valued=True),
                Field("kind", "string")),
        unique_key="id",
    )
    rows = [
        ("a", "a", ["b"], "root"),
        ("b", "b", ["c", "e"], "mid"),
        ("c", "c", ["d"], "mid"),
        ("d", "d", None, "leaf"),
        ("e", "e", [], "leaf"),
        ("x", "x", ["y"], "cyc"),
        ("y", "y", ["x"], "cyc"),
        ("m", "m", ["c", "y"], "multi"),
        ("z", "z", None, "leaf"),
    ]
    df = spark.createDataFrame(
        rows, "id string, node_id string, edge_ids array<string>, kind string"
    )
    out = str(tmp_path_factory.mktemp("graph") / "idx")
    IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none")).build(
        df, out
    )
    return SearchIndex.open(spark, out)


def ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


class TestGraphQuery:
    def test_full_reachability_defaults(self, idx):
        # defaults from=edge_ids to=node_id: follow out-links to docs
        # whose node_id matches, unbounded depth
        got = ids(idx.query("{!graph}id:a"))
        assert got == ["a", "b", "c", "d", "e"]

    def test_max_depth_bounds_the_walk(self, idx):
        assert ids(idx.query("{!graph maxDepth=1}id:a")) == ["a", "b"]
        assert ids(idx.query("{!graph maxDepth=2}id:a")) == [
            "a", "b", "c", "e"]

    def test_cycle_terminates_and_includes_both(self, idx):
        assert ids(idx.query("{!graph}id:x")) == ["x", "y"]

    def test_return_root_false(self, idx):
        assert ids(idx.query("{!graph returnRoot=false}id:a")) == [
            "b", "c", "d", "e"]

    def test_return_only_leaf(self, idx):
        # leaves = docs with no out-edges (null OR empty edge_ids)
        got = ids(idx.query("{!graph returnOnlyLeaf=true}id:a"))
        assert got == ["d", "e"]

    def test_multivalued_from_fans_out(self, idx):
        got = ids(idx.query("{!graph}id:m"))
        assert got == ["c", "d", "m", "x", "y"]

    def test_traversal_filter_restricts_hops(self, idx):
        # traversal may only pass through kind:mid docs — e is cut, but
        # the walk continues through b and c to d?  No: d is kind:leaf,
        # so it is cut too; only the mid chain survives beyond the root
        got = ids(idx.query(
            "{!graph traversalFilter='kind:mid'}id:a"))
        assert got == ["a", "b", "c"]

    def test_reverse_direction(self, idx):
        # ancestors: from=node_id to=edge_ids walks the edges backwards
        got = ids(idx.query("{!graph from=node_id to=edge_ids}id:d"))
        assert got == ["a", "b", "c", "d", "m"]

    def test_root_set_can_be_a_real_query(self, idx):
        got = ids(idx.query("{!graph maxDepth=1}kind:cyc"))
        assert got == ["x", "y"]

    def test_isolated_root_is_just_itself(self, idx):
        assert ids(idx.query("{!graph}id:z")) == ["z"]

    def test_unknown_field_is_loud(self, idx):
        with pytest.raises(QuerySyntaxError, match="graph"):
            idx.query("{!graph from=nope}id:a").collect()

    def test_empty_body_is_loud(self, idx):
        with pytest.raises(QuerySyntaxError, match="root query"):
            idx.query("{!graph}").collect()
