"""Local mirror of the driver's correctness gate: run every ``queries()``
entry against its ``oracle_sql()`` via DuckDB at sf0.001 and compare
row-count, column names, and order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    import numpy as np

    if isinstance(v, np.ndarray):
        return tuple(_norm(x) for x in v.tolist())
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _row_key(row, cols):
    return tuple(_norm(row[c]) for c in sorted(cols))


def _sort_key(key_tuple):
    # null-safe ORDERING only (equality still compares the normalized
    # values): str() of equal values is identical across the Spark and
    # pandas sides (datetime vs Timestamp both render ISO), so equal
    # multisets sort identically and the positional zip stays aligned;
    # mixed None/int columns must not TypeError the sort
    return tuple((v is None, str(v)) for v in key_tuple)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    got_df = QUERIES[name](spark, sf_dir)
    got = got_df.collect()
    if name not in ORACLES:
        # rows-only contract: it must run and produce a stable schema
        assert got_df.columns
        return
    want_pdf = duck.sql(ORACLES[name]).df()
    assert len(got) == len(want_pdf), f"{name}: row count {len(got)} != {len(want_pdf)}"
    got_cols = sorted(got_df.columns)
    want_cols = sorted(want_pdf.columns)
    assert got_cols == want_cols, f"{name}: columns {got_cols} != {want_cols}"
    got_keys = sorted(
        (_row_key(r.asDict(), got_cols) for r in got), key=_sort_key
    )
    want_keys = sorted(
        (_row_key(rec, want_cols) for rec in want_pdf.to_dict("records")),
        key=_sort_key,
    )
    mismatches = [
        (g, w) for g, w in zip(got_keys, want_keys) if g != w
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert sum(r["docs"] for r in rows) == 500


def test_worker_zip_is_content_addressed(spark, tmp_path, monkeypatch):
    """The addPyFile zip must track package sources WITHOUT reusing a
    name: a stale zip ships outdated code, and rebuilding under one fixed
    name breaks a live SparkContext's file cache ('exists and does not
    match contents') when sources change mid-session."""
    import os

    monkeypatch.setattr(entry_mod.tempfile, "gettempdir", lambda: str(tmp_path))
    entry_mod._SHIPPED_SESSIONS.clear()
    entry_mod._ensure_workers_can_import(spark)
    zips = sorted(tmp_path.glob("smrs_pkg_*.zip"))
    assert len(zips) == 1
    # unchanged sources -> same name reused, nothing rebuilt
    entry_mod._SHIPPED_SESSIONS.clear()
    entry_mod._ensure_workers_can_import(spark)
    assert sorted(tmp_path.glob("smrs_pkg_*.zip")) == zips
    # DELETING a source — a change that can never raise the max mtime —
    # must still produce a NEW name: the digest covers the full sorted
    # (path, mtime, size) list, so a stale zip with the removed module
    # is never reused (the old name, possibly cached by a live
    # SparkContext, is never overwritten either)
    real_walk = os.walk

    def walk_without_datemath(top, *args, **kwargs):
        for dirpath, dirnames, filenames in real_walk(top, *args, **kwargs):
            yield dirpath, dirnames, [
                f for f in filenames if f != "datemath.py"
            ]

    monkeypatch.setattr(entry_mod.os, "walk", walk_without_datemath)
    entry_mod._SHIPPED_SESSIONS.clear()
    entry_mod._ensure_workers_can_import(spark)
    assert len(list(tmp_path.glob("smrs_pkg_*.zip"))) == 2
    entry_mod._SHIPPED_SESSIONS.clear()


def test_verdict_window_is_consistent():
    """The rotating external-check window must stay exactly 50 unique
    registry names (the harness checks the first 50 queries() entries);
    a typo'd or stale name would silently shrink external coverage."""
    import __spark_entry__ as e

    window = e._VERDICT_PRIORITY
    assert len(window) == 50
    assert len(set(window)) == 50
    reg = set(QUERIES)
    missing = [n for n in window if n not in reg]
    assert not missing, f"window names absent from registry: {missing}"
    # ordering contract: queries() leads with the window, in order
    assert list(QUERIES)[:50] == window


def test_oracle_sql_runs_for_every_entry(duck):
    """Every oracle string must at least be executable DuckDB SQL against
    the registered views (a syntax error would fail the external gate)."""
    for name, sql in ORACLES.items():
        try:
            duck.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"oracle for {name} is not runnable: {exc}")
