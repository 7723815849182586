import pytest

from solr_map_reduce_spark.operators import dedup


@pytest.fixture
def updates(spark):
    rows = [
        ("a", 1, "a-old"),
        ("a", 3, "a-new"),
        ("a", 2, "a-mid"),
        ("b", 5, "b-only"),
        ("c", 7, "c-1"),
        ("c", 7, "c-2"),  # exact tie on order field
    ]
    return spark.createDataFrame(rows, "id string, ts long, payload string")


def test_retain_most_recent(updates):
    out = dedup.retain_most_recent(updates, "id", "ts", tiebreak=["payload"])
    got = {r["id"]: (r["ts"], r["payload"]) for r in out.collect()}
    assert got == {"a": (3, "a-new"), "b": (5, "b-only"), "c": (7, "c-2")}


def test_sort_updates(updates):
    out = dedup.sort_updates(updates, "id", "ts", tiebreak=["payload"])
    got = {r["id"]: [u["payload"] for u in r["updates"]] for r in out.collect()}
    assert got["a"] == ["a-old", "a-mid", "a-new"]
    assert got["c"] == ["c-1", "c-2"]


def test_reject_collisions_raises(updates):
    with pytest.raises(ValueError, match="duplicate unique key"):
        dedup.reject_collisions(updates, "id")


def test_reject_passes_unique(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "id string, ts long")
    assert dedup.reject_collisions(df, "id").count() == 2


def test_resolve_none_is_identity(updates):
    assert dedup.resolve(updates, "id", "none").count() == updates.count()


def test_collision_report(updates):
    got = {r["id"]: r["n_docs"] for r in dedup.collision_report(updates, "id").collect()}
    assert got == {"a": 3, "c": 2}


def test_minhash_features_empty_doc_does_not_corrupt_neighbors(spark):
    """Regression: an empty doc's reduceat offset must not split the
    preceding doc's shingle segment (would silently weaken its signature)."""
    from solr_map_reduce_spark.extensions.text_dedup import minhash_features

    text = "the quick brown fox jumps over the lazy dog again and again"
    with_empty = spark.createDataFrame(
        [(1, text), (2, ""), (3, text)], "doc_id long, text string"
    ).coalesce(1)
    alone = spark.createDataFrame([(1, text)], "doc_id long, text string")
    sig_with = {
        r["doc_id"]: r["signature"] for r in minhash_features(with_empty).collect()
    }
    sig_alone = minhash_features(alone).collect()[0]["signature"]
    assert sig_with[1] == sig_alone
    assert sig_with[3] == sig_alone
    assert sig_with[2] == [0] * len(sig_alone)


def test_connected_components_known_graph(spark):
    """Chain 1-2-3-4 (one component), pair 10-11, triangle 20-21-22 with a
    redundant edge — labels converge to the min vertex of each component."""
    from solr_map_reduce_spark.extensions.text_dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_reject_lazy_guard_fires(updates):
    """Regression: the eager=False guard must survive column pruning — it
    lives inside the key column, so consuming the plan trips it."""
    from py4j.protocol import Py4JJavaError

    lazy = dedup.reject_collisions(updates, "id", eager=False)
    with pytest.raises(Exception, match="duplicate unique key") as exc_info:
        lazy.collect()
    assert isinstance(exc_info.value, Py4JJavaError) or "duplicate" in str(exc_info.value)


def test_reject_lazy_passes_unique(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "id string, ts long")
    out = dedup.reject_collisions(df, "id", eager=False)
    assert sorted(r["id"] for r in out.collect()) == ["a", "b"]
    assert out.columns == ["id", "ts"]


def test_simhash_trailing_empty_rows_do_not_corrupt_last_doc(spark):
    """Regression: trailing empty-token rows used to clip the reduceat
    offsets to total-1, dropping the last non-empty row's final token from
    its majority vote.  Per-doc simhash must be independent of batch
    composition."""
    from solr_map_reduce_spark.extensions.text_dedup import simhash64

    text = "alpha beta"  # 2 tokens: losing one forces every vote to lose
    with_empties = spark.createDataFrame(
        [(1, text), (2, ""), (3, "")], "doc_id long, text string"
    ).coalesce(1)
    alone = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"] for r in simhash64(with_empties).collect()}
    want = simhash64(alone).collect()[0]["simhash"]
    assert got[1] == want
    assert want != 0
    assert got[2] == 0 and got[3] == 0


class TestSemanticDedup:
    """Round-8 SemDeDup: embedding near-dup clusters keep one
    representative; the LSH-blocked path must agree with the exact
    blocked gram-matrix path."""

    def _emb(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        base = rng.normal(size=(6, 8))
        rows = []
        for i, v in enumerate(base):
            rows.append((i, [float(x) for x in v]))
        # 10/11: near-copies of vec 0 (same direction, scaled/noised)
        rows.append((10, [float(x * 2.0) for x in base[0]]))
        rows.append((11, [float(x) for x in base[0] + 1e-4 * base[1]]))
        # 12: near-copy of vec 3
        rows.append((12, [float(x * 0.5) for x in base[3]]))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_keeps_min_id_per_cluster(self, spark):
        from solr_map_reduce_spark.extensions.similarity import semantic_dedup

        emb = self._emb(spark)
        kept = sorted(
            r["vec_id"]
            for r in semantic_dedup(emb, threshold=0.99, use_lsh=False).collect()
        )
        # clusters {0,10,11} and {3,12} keep their min ids; singletons stay
        assert kept == [0, 1, 2, 3, 4, 5]

    def test_lsh_path_agrees_with_exact(self, spark):
        from solr_map_reduce_spark.extensions.similarity import semantic_dedup

        emb = self._emb(spark)
        exact = sorted(
            r["vec_id"]
            for r in semantic_dedup(emb, threshold=0.99, use_lsh=False).collect()
        )
        lsh = sorted(
            r["vec_id"]
            for r in semantic_dedup(
                emb, threshold=0.99, use_lsh=True, n_planes=8
            ).collect()
        )
        assert lsh == exact
