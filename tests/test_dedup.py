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
