"""CLI driver: argument validation matrix (the ArgumentParserTest analog,
mrt/MapReduceIndexerToolArgumentParserTest.java) + end-to-end runs in-process."""

import json

import pytest

from solr_map_reduce_spark import cli

SCHEMA_SPEC = {
    "unique_key": "id",
    "fields": [
        {"name": "id", "type": "string", "required": True},
        {"name": "text", "type": "text_en"},
        {"name": "lang", "type": "string"},
        {"name": "source", "type": "string"},
        {"name": "n_chars", "type": "long"},
        {"name": "doc_id", "type": "long"},
    ],
    "dynamic_fields": [{"pattern": "extra_*", "type": "string"}],
}


@pytest.fixture(scope="module")
def schema_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "schema.json"
    p.write_text(json.dumps(SCHEMA_SPEC))
    return str(p)


# -- validation matrix -------------------------------------------------------

def _index_args(**over):
    base = {
        "--input": ["in.parquet"], "--output": "out", "--schema": "s.json",
    }
    args = []
    for k, v in {**base}.items():
        args.append(k)
        args.extend(v if isinstance(v, list) else [v])
    for k, v in over.items():
        args.append(k)
        if v is not None:
            args.extend(v if isinstance(v, list) else [str(v)])
    return ["index"] + args


@pytest.mark.parametrize(
    "argv,msg",
    [
        (_index_args(**{"--shards": 0}), "--shards"),
        (_index_args(**{"--shards": 4, "--micro-shards": 6}), "multiple"),
        (_index_args(**{"--max-segments": 0}), "--max-segments"),
        (_index_args(**{"--micro-shards": 0}), "--micro-shards"),
        (_index_args(**{"--max-records-per-file": 0}), "--max-records-per-file"),
        (_index_args(**{"--dry-run-rows": 0}), "--dry-run-rows"),
        (_index_args(**{"--dry-run": None, "--publish-to": "live"}), "publish"),
        (_index_args(**{"--dry-run": None, "--merge": None}), "merge"),
        (["merge", "--path", "p", "--fanout", "1"], "--fanout"),
        (["merge", "--path", "p", "--max-segments", "0"], "--max-segments"),
    ],
)
def test_validation_rejects(argv, msg):
    with pytest.raises(SystemExit, match=msg):
        cli.main(argv)


def test_unknown_dedup_rejected(capsys):
    with pytest.raises(SystemExit):
        cli.main(_index_args(**{"--dedup": "bogus"}))
    assert "invalid choice" in capsys.readouterr().err


def test_missing_required_args():
    with pytest.raises(SystemExit):
        cli.main(["index", "--input", "x"])  # no --output/--schema


def test_valid_micro_shard_multiples_pass_validation():
    args = cli.build_parser().parse_args(
        _index_args(**{"--shards": 4, "--micro-shards": 16})
    )
    cli.validate(args)  # should not raise


# -- end-to-end --------------------------------------------------------------

@pytest.mark.slow  # CLI index/merge medium variant; library merge covered by test_indexing_e2e, CLI surface by the query/update/publish tests
def test_cli_index_build_and_merge(spark, sf_dir, schema_file, tmp_path, capsys):
    out = str(tmp_path / "cli_idx")
    rc = cli.main([
        "index",
        "--input", f"{sf_dir}/documents.parquet",
        "--format", "parquet",
        "--output", out,
        "--schema", schema_file,
        "--shards", "2",
        "--micro-shards", "8",
        "--dedup", "none",
        "--generate-keys-from", "source",
        "--max-records-per-file", "50",
    ])
    assert rc == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert manifest["shards"] == 2

    from solr_map_reduce_spark.indexing import read_index, segment_counts

    assert read_index(spark, out).count() == 500
    assert max(segment_counts(out).values()) > 1

    rc = cli.main(["merge", "--path", out, "--max-segments", "1", "--fanout", "2"])
    assert rc == 0
    merged = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(merged["segments"].values()) == {1}


@pytest.mark.slow  # CLI --merge medium variant; merge_into covered by test_indexing_e2e::test_merge_into_rewrites_only_touched_shards
def test_cli_index_merge_into_existing(spark, sf_dir, schema_file, tmp_path, capsys):
    """`index --merge` against an existing artifact: the reference tool's
    rerun-over-existing-output behavior — same keys replaced, count stable."""
    import pyspark.sql.functions as F

    out = str(tmp_path / "cli_merge_idx")
    src = str(tmp_path / "keyed.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "id", F.col("doc_id").cast("string")
    )
    docs.write.parquet(src)
    base_args = [
        "index", "--input", src, "--format", "parquet", "--output", out,
        "--schema", schema_file, "--shards", "2",
        "--dedup", "retain_most_recent", "--order-field", "n_chars",
        "--tiebreak", "id",
    ]
    assert cli.main(base_args) == 0
    capsys.readouterr()

    from solr_map_reduce_spark.indexing import read_index

    assert read_index(spark, out).count() == 500
    assert cli.main(base_args + ["--merge"]) == 0
    capsys.readouterr()
    assert read_index(spark, out).count() == 500  # replaced, not duplicated


def test_cli_dry_run_writes_nothing(spark, sf_dir, schema_file, tmp_path, capsys):
    out = str(tmp_path / "never_created")
    rc = cli.main([
        "index",
        "--input", f"{sf_dir}/documents.parquet",
        "--output", out,
        "--schema", schema_file,
        "--generate-keys-from", "source",
        "--dry-run", "--dry-run-rows", "3",
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 3
    assert "id" in json.loads(lines[0])
    import os

    assert not os.path.exists(out)


def test_cli_publish(spark, sf_dir, schema_file, tmp_path, capsys):
    staging = str(tmp_path / "staging")
    live = str(tmp_path / "live")
    rc = cli.main([
        "index",
        "--input", f"{sf_dir}/documents.parquet",
        "--output", staging,
        "--schema", schema_file,
        "--generate-keys-from", "source",
        "--dedup", "none",
        "--publish-to", live,
    ])
    assert rc == 0
    import os

    from solr_map_reduce_spark.indexing import read_index

    assert not os.path.exists(staging)
    assert read_index(spark, live).count() == 500


def test_cli_query_surface(spark, sf_dir, schema_file, tmp_path, capsys):
    out = str(tmp_path / "qidx")
    cli.main([
        "index", "--input", f"{sf_dir}/documents.parquet", "--output", out,
        "--schema", schema_file, "--shards", "2", "--dedup", "none",
        "--generate-keys-from", "source",
    ])
    capsys.readouterr()

    assert cli.main(["query", "--path", out, "--count"]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["count"] == 500

    assert cli.main(["query", "--path", out, "--facet", "lang"]) == 0
    facets = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert sum(f["cnt"] for f in facets) == 500

    assert cli.main(["query", "--path", out, "--filter", "lang=en",
                     "--sort", "n_chars:desc", "--limit", "3",
                     "--select", "id", "n_chars"]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert len(rows) == 3
    lens = [r["n_chars"] for r in rows]
    assert lens == sorted(lens, reverse=True)

    assert cli.main(["query", "--path", out, "--segments"]) == 0
    seg = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["segments"]
    assert sorted(seg) == ["shard=0", "shard=1"]


def test_cli_query_components_r8(spark, sf_dir, schema_file, tmp_path, capsys):
    """The round-8 response-writer components through the CLI: range
    facets, pivots, stats, grouping, and a two-page cursor sweep."""
    out = str(tmp_path / "qidx8")
    cli.main([
        "index", "--input", f"{sf_dir}/documents.parquet", "--output", out,
        "--schema", schema_file, "--shards", "2", "--dedup", "none",
        "--generate-keys-from", "source",
    ])
    capsys.readouterr()

    assert cli.main(["query", "--path", out, "--range-facet",
                     "n_chars", "0", "2000", "500"]) == 0
    buckets = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
               if l.startswith("{")]
    assert len(buckets) == 4
    assert all("bucket_start" in b and "cnt" in b for b in buckets)

    assert cli.main(["query", "--path", out, "--pivot", "lang", "source",
                     "--limit", "2"]) == 0
    pv = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
          if l.startswith("{")]
    assert pv and len({p["lang"] for p in pv}) <= 2

    assert cli.main(["query", "--path", out, "--stats", "n_chars"]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["count"] == 500 and st["missing"] == 0

    assert cli.main(["query", "--path", out, "--group", "lang",
                     "--sort", "n_chars:desc", "--limit", "1"]) == 0
    grp = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
           if l.startswith("{")]
    assert all(g["_rk"] == 1 for g in grp)

    assert cli.main(["query", "--path", out, "--cursor", "*",
                     "--sort", "n_chars:desc", "--limit", "5",
                     "--select", "id", "n_chars"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    mark = json.loads(lines[-1])["nextCursorMark"]
    assert mark
    page1 = [json.loads(l)["id"] for l in lines[:-1] if l.startswith("{")]
    assert cli.main(["query", "--path", out, "--cursor", mark,
                     "--sort", "n_chars:desc", "--limit", "5",
                     "--select", "id", "n_chars"]) == 0
    lines2 = capsys.readouterr().out.strip().splitlines()
    page2 = [json.loads(l)["id"] for l in lines2[:-1] if l.startswith("{")]
    assert len(page2) == 5 and not set(page1) & set(page2)

    # --cursor without --sort is a loud usage error
    assert cli.main(["query", "--path", out, "--cursor", "*"]) == 2


def test_cli_alias_query(spark, sf_dir, schema_file, tmp_path, capsys):
    """A comma-separated --path is a collection alias: counts sum, a
    boolean query unions per-member pruned scans; per-artifact
    components refuse with a usage error."""
    outs = []
    for part in (0, 1):
        out = str(tmp_path / f"slice{part}")
        cli.main([
            "index", "--input", f"{sf_dir}/documents.parquet",
            "--output", out, "--schema", schema_file, "--shards", "2",
            "--dedup", "none", "--generate-keys-from", "source",
        ])
        outs.append(out)
    capsys.readouterr()
    alias = ",".join(outs)

    assert cli.main(["query", "--path", alias, "--count"]) == 0
    n = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["count"]
    assert n == 1000  # both slices indexed the full table here: 2 x 500

    assert cli.main(["query", "--path", alias, "--facet", "lang"]) == 0
    facets = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
              if l.startswith("{")]
    assert sum(f["cnt"] for f in facets) == 1000

    assert cli.main(["query", "--path", alias, "--stats", "n_chars"]) == 2


def test_cli_profile(capsys, sf_dir):
    import json as _json

    from solr_map_reduce_spark.cli import main

    rc = main([
        "profile", "--input", f"{sf_dir}/events.parquet",
        "--columns", "user_id", "--exact",
    ])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][0]
    rec = _json.loads(line)
    assert rec["column"] == "user_id" and rec["nulls"] == 0
    assert int(rec["distinct_cnt"]) > 0


def test_cli_index_with_morphline_file(spark, tmp_path, capsys):
    """The reference tool's --morphline-file flag: the tutorial HOCON config
    drives format + ETL, end-to-end through the CLI onto its avro fixture."""
    import os

    fixture = (
        "/root/reference/morphlines-core/src/test/resources/test-documents/"
        "sample-statuses-20120906-141433.avro"
    )
    conf = (
        "/root/reference/morphlines-core/src/test/resources/test-morphlines/"
        "tutorialReadAvroContainer.conf"
    )
    if not os.path.exists(fixture):
        import pytest

        pytest.skip("reference fixtures absent")
    schema_path = tmp_path / "tutorial_schema.json"
    schema_path.write_text(json.dumps({
        "unique_key": "id",
        "fields": [
            {"name": "id", "required": True},
            {"name": "text"},
            {"name": "user_screen_name"},
            {"name": "created_at"},
        ],
    }))
    out = str(tmp_path / "tutorial_idx")
    rc = cli.main([
        "index", "--input", fixture, "--schema", str(schema_path),
        "--output", out, "--morphline-file", conf,
        "--morphline-id", "morphline1", "--shards", "2", "--dedup", "none",
    ])
    assert rc == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert manifest["unique_key"] == "id"
    from solr_map_reduce_spark.indexing import read_index

    idx = read_index(spark, out)
    assert idx.count() == 2
    assert set(idx.columns) >= {"id", "text", "created_at"}


def test_cli_morphline_csv_read_options(spark, tmp_path, capsys):
    """A readCSV morphline's separator must reach the reader."""
    (tmp_path / "data.csv").write_text("id\tname\nr1\talpha\nr2\tbeta\n")
    conf = tmp_path / "csv.conf"
    conf.write_text("""
morphlines : [ { id : m1
  commands : [
    { readCSV { separator : "\\t" } }
    { loadSolr { } }
  ]
} ]
""")
    schema_path = tmp_path / "csv_schema.json"
    schema_path.write_text(json.dumps({
        "unique_key": "id",
        "fields": [{"name": "id", "required": True}, {"name": "name"}],
    }))
    out = str(tmp_path / "csv_idx")
    rc = cli.main([
        "index", "--input", str(tmp_path / "data.csv"),
        "--schema", str(schema_path), "--output", out,
        "--morphline-file", str(conf), "--dedup", "none",
    ])
    assert rc == 0
    from solr_map_reduce_spark.indexing import read_index

    got = {r["id"]: r["name"] for r in read_index(spark, out).collect()}
    assert got == {"r1": "alpha", "r2": "beta"}


def test_cli_index_with_search_structures(spark, sf_dir, schema_file, tmp_path):
    import os

    out = str(tmp_path / "cli_idx_search")
    rc = cli.main([
        "index",
        "--input", f"{sf_dir}/documents.parquet",
        "--output", out,
        "--schema", schema_file,
        "--shards", "2",
        "--dedup", "none",
        "--generate-keys-from", "source",
        "--term-blooms", "--search-stats", "--codec", "zstd",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "_TERM_BLOOMS.json"))
    assert os.path.exists(os.path.join(out, "_SEARCH_STATS.json"))
    assert os.path.isdir(os.path.join(out, "_vocab", "text"))

    from solr_map_reduce_spark.index_reader import SearchIndex

    idx = SearchIndex.open(spark, out)
    # text_en stores stemmed tokens; analyze_terms maps the raw query word
    # through the same analyzer ("table" -> "tabl") — Solr's query-time
    # analysis contract
    terms = idx.analyze_terms(["table"])
    assert terms == ["tabl"]
    assert idx.bm25(terms, k=3).count() == 3


def test_cli_update_subcommand(spark, tmp_path):
    """`update` applies atomic field updates through the CLI."""
    import json as _json

    from solr_map_reduce_spark.cli import main
    from solr_map_reduce_spark.index_reader import SearchIndex
    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
    from solr_map_reduce_spark.schema import Field, IndexSchema

    schema = IndexSchema(
        fields=(Field("id", "string", required=True), Field("rank", "long")),
        unique_key="id",
    )
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(_json.dumps({
        "unique_key": "id",
        "fields": [
            {"name": "id", "type": "string", "required": True},
            {"name": "rank", "type": "long"},
        ],
    }))
    art = str(tmp_path / "idx")
    IndexJob(
        IndexJobConfig(schema=schema, shards=2, dedup="none", routing="native")
    ).build(
        spark.createDataFrame([(str(i), i) for i in range(20)], "id string, rank long"),
        art,
    )
    upd_path = str(tmp_path / "upd.parquet")
    spark.createDataFrame([("7", 700)], "id string, rank long").write.parquet(upd_path)
    rc = main([
        "update", "--input", upd_path, "--path", art,
        "--schema", str(schema_file), "--shards", "2", "--routing", "native",
    ])
    assert rc == 0
    idx = SearchIndex.open(spark, art)
    assert idx.get("7").collect()[0]["rank"] == 700
    assert idx.count() == 20

    # round-8: --op col=inc routes through the atomic-op path
    upd2 = str(tmp_path / "upd2.parquet")
    spark.createDataFrame([("7", 30)], "id string, rank long").write.parquet(upd2)
    rc = main([
        "update", "--input", upd2, "--path", art,
        "--schema", str(schema_file), "--shards", "2", "--routing", "native",
        "--op", "rank=inc",
    ])
    assert rc == 0
    assert SearchIndex.open(spark, art).get("7").collect()[0]["rank"] == 730


def test_cli_boolean_query_and_scoped_facet(spark, sf_dir, schema_file, tmp_path, capsys):
    """Round-6: `query --q` runs the Solr-syntax boolean query through the
    CLI; `--facet FIELD --q ...` scopes the counts to the query's result
    set (q + facet.field)."""
    import json as _json

    out = str(tmp_path / "cli_idx_q")
    rc = cli.main([
        "index",
        "--input", f"{sf_dir}/documents.parquet",
        "--output", out,
        "--schema", schema_file,
        "--shards", "2",
        "--dedup", "none",
        "--generate-keys-from", "source",
        "--term-blooms", "--search-stats",
    ])
    assert rc == 0
    capsys.readouterr()
    assert cli.main([
        "query", "--path", out, "--q", "table OR vector",
        "--select", "id", "--limit", "5",
    ]) == 0
    rows = [_json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(rows) <= 5 and all("id" in r for r in rows)
    assert cli.main([
        "query", "--path", out, "--facet", "lang", "--q", "table OR vector",
    ]) == 0
    facets = [_json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert facets and all(f["cnt"] > 0 for f in facets)


def test_cli_count_respects_q_and_get_rejects_q(spark, sf_dir, schema_file, tmp_path, capsys):
    import json as _json

    out = str(tmp_path / "cli_idx_cq")
    assert cli.main([
        "index", "--input", f"{sf_dir}/documents.parquet", "--output", out,
        "--schema", schema_file, "--shards", "2", "--dedup", "none",
        "--generate-keys-from", "source",
    ]) == 0
    capsys.readouterr()
    assert cli.main(["query", "--path", out, "--count"]) == 0
    total = _json.loads(capsys.readouterr().out)["count"]
    assert cli.main(["query", "--path", out, "--count", "--q", "table OR vector"]) == 0
    scoped = _json.loads(capsys.readouterr().out)["count"]
    assert 0 < scoped < total  # --q actually scopes the count
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="--get"):
        cli.main(["query", "--path", out, "--get", "k1", "--q", "x"])


def test_cli_analyze_endpoint(capsys):
    """`analyze` is the Solr /analysis debug endpoint: driver-side
    tokenization, no Spark session."""
    assert cli.main(["analyze", "--type", "text_en", "--text", "Running", "Tables"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["tokens"] == ["run", "tabl"]
    assert cli.main(["analyze", "--type", "nope", "--text", "x"]) == 2


def test_cli_query_write_export(spark, sf_dir, schema_file, tmp_path, capsys):
    """`query --write parquet:PATH` exports the FULL result set
    distributed (no --limit cap, nothing collected to the driver)."""
    art = str(tmp_path / "exp_idx")
    cli.main([
        "index", "--input", f"{sf_dir}/documents.parquet", "--output", art,
        "--schema", schema_file, "--shards", "2", "--dedup", "none",
        "--generate-keys-from", "source",
    ])
    capsys.readouterr()
    dest = str(tmp_path / "export")
    rc = cli.main(["query", "--path", art, "--filter", "lang=en",
                   "--select", "id", "n_chars", "--write", f"parquet:{dest}"])
    assert rc == 0
    got = spark.read.parquet(dest)
    assert got.columns == ["id", "n_chars"]
    assert got.count() > 10  # the full filtered set, not --limit-capped
    # malformed spec is a usage error
    assert cli.main(["query", "--path", art, "--write", "xml:/nope"]) == 2


def test_cli_terms_and_local_params_query(spark, sf_dir, schema_file, tmp_path, capsys):
    """Round-8: `--terms` enumerates the term dictionary; local-params
    queries ({!terms}/{!join}) pass straight through `--q`."""
    import json as _json

    out = str(tmp_path / "cli_idx_terms")
    assert cli.main([
        "index", "--input", f"{sf_dir}/documents.parquet", "--output", out,
        "--schema", schema_file, "--shards", "2", "--dedup", "none",
        "--generate-keys-from", "source", "--search-stats",
    ]) == 0
    capsys.readouterr()
    # TermsComponent: prefix-filtered, df-ranked
    assert cli.main(["query", "--path", out, "--terms", "s", "--limit", "5"]) == 0
    rows = [_json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(rows) <= 5
    assert all(r["term"].startswith("s") and r["df"] > 0 for r in rows)
    # bare --terms (no prefix) enumerates from the top
    assert cli.main(["query", "--path", out, "--terms", "--limit", "3"]) == 0
    allrows = [_json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(allrows) == 3
    # local-params through --q: raw column terms filter + count
    assert cli.main([
        "query", "--path", out, "--count", "--q", "{!terms f=lang}de,fr",
    ]) == 0
    n = _json.loads(capsys.readouterr().out)["count"]
    assert n > 0


def test_cli_stream_expression(capsys, sf_dir):
    import json as _json

    from solr_map_reduce_spark.cli import main

    rc = main([
        "stream",
        "--expr",
        'top(hashJoin(search(orders, fl="o_orderkey,o_custkey,'
        'o_totalprice"), hashed=search(customer, fl="c_custkey,c_name"), '
        'on="o_custkey=c_custkey"), n=3, sort="o_totalprice desc")',
        "--collection",
        f"orders={sf_dir}/orders.parquet",
        f"customer={sf_dir}/customer.parquet",
    ])
    assert rc == 0
    rows = [_json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")]
    assert len(rows) == 3
    assert rows[0]["o_totalprice"] >= rows[1]["o_totalprice"]
    assert "c_name" in rows[0] and "c_custkey" not in rows[0]

    with pytest.raises(SystemExit, match="NAME=PATH"):
        main(["stream", "--expr", "search(x)", "--collection", "nope"])


def test_cli_stream_math_expression(capsys, sf_dir):
    # the math tier (let/col/evaluators) is reachable from the CLI
    import json as _json

    from solr_map_reduce_spark.cli import main

    rc = main([
        "stream",
        "--expr",
        "let(a=search(documents), b=col(a, n_chars), "
        "tuple(n=length(b), m=mean(b)))",
        "--collection",
        f"documents={sf_dir}/documents.parquet",
    ])
    assert rc == 0
    rows = [_json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")]
    assert len(rows) == 1 and rows[0]["n"] > 0 and rows[0]["m"] > 0


def test_cli_stream_now_and_topic_checkpoint(capsys, spark, sf_dir, tmp_path):
    """--now pins date math for the expression; --checkpoint-dir enables
    topic() with commit-after-print (a second invocation sees nothing)."""
    import json as _json

    from solr_map_reduce_spark.cli import main
    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
    from solr_map_reduce_spark.schema import Field, IndexSchema

    # --now reaches timeseries bounds
    rc = main([
        "stream", "--expr",
        'timeseries(events, field=ts, gap="+1DAY", start="NOW-21DAYS/DAY", '
        'end="NOW-19DAYS/DAY", count(*))',
        "--now", "2024-01-31T00:00:00Z",
        "--collection", f"events={sf_dir}/events.parquet",
    ])
    assert rc == 0
    rows = [_json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")]
    assert len(rows) == 2  # [Jan 10, Jan 12): two day buckets

    # topic() via --checkpoint-dir: first pull delivers, commit-after-
    # print makes the second pull empty
    schema = IndexSchema(
        fields=(Field("id", "string", required=True), Field("n", "long")),
        unique_key="id",
    )
    df = spark.createDataFrame([("1", 1), ("2", 2)], "id string, n long")
    art = str(tmp_path / "vidx")
    IndexJob(IndexJobConfig(schema=schema, shards=1, dedup="none",
                            doc_versions=True)).build(df, art)
    argv = [
        "stream", "--expr", 'topic(ck, src, id="t1", fl="id")',
        "--collection", f"src={art}",
        "--checkpoint-dir", str(tmp_path / "ckpts"),
    ]
    (tmp_path / "ckpts").mkdir()
    assert main(argv) == 0
    first = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(first) == 2
    assert main(argv) == 0
    second = [l for l in capsys.readouterr().out.splitlines()
              if l.startswith("{")]
    assert second == []


def test_cli_topic_pull_commit(capsys, spark, sf_dir, tmp_path):
    import json as _json

    import pyspark.sql.functions as F

    from solr_map_reduce_spark.cli import main
    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
    from solr_map_reduce_spark.schema import Field, IndexSchema

    schema = IndexSchema(
        fields=(Field("doc_id", "long", required=True),
                Field("text", "text_general")),
        unique_key="doc_id",
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt.json")
    job = IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none",
                                  doc_versions=True))
    job.build(docs.filter(F.col("doc_id") % 2 == 0), path)
    rc = main(["topic", "--path", path, "--checkpoint", ckpt,
               "--select", "doc_id", "--commit"])
    assert rc == 0
    first = [_json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert all(r["doc_id"] % 2 == 0 for r in first) and first

    job.merge_into(docs.filter(F.col("doc_id") % 100 == 0), path)
    rc = main(["topic", "--path", path, "--checkpoint", ckpt,
               "--select", "doc_id"])
    assert rc == 0
    second = sorted(_json.loads(l)["doc_id"]
                    for l in capsys.readouterr().out.splitlines()
                    if l.startswith("{"))
    want = sorted(r["doc_id"] for r in
                  docs.filter(F.col("doc_id") % 100 == 0).collect())
    assert second == want


def test_cli_backup_restore(capsys, spark, tmp_path):
    import json as _json

    from solr_map_reduce_spark.cli import main
    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
    from solr_map_reduce_spark.schema import Field, IndexSchema

    schema = IndexSchema(
        fields=(Field("id", "string", required=True),
                Field("text", "text_general")),
        unique_key="id",
    )
    live = str(tmp_path / "live")
    bak = str(tmp_path / "bak")
    IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none")).build(
        spark.createDataFrame([(str(i), "spark doc") for i in range(12)],
                              "id string, text string"), live)
    assert main(["backup", "--path", live, "--dest", bak]) == 0
    meta = _json.loads([l for l in capsys.readouterr().out.splitlines()
                        if l.startswith("{")][-1])
    assert meta["generation"] == 1 and meta["files"] > 0

    import shutil
    shutil.rmtree(live)
    assert main(["restore", "--backup", bak, "--path", live]) == 0
    capsys.readouterr()
    assert main(["query", "--path", live, "--count"]) == 0
    count = _json.loads([l for l in capsys.readouterr().out.splitlines()
                         if l.startswith("{")][-1])
    assert count["count"] == 12


def test_cli_topic_limit_commit_rejected():
    from solr_map_reduce_spark.cli import main

    with pytest.raises(SystemExit, match="limit"):
        main(["topic", "--path", "x", "--checkpoint", "c",
              "--limit", "5", "--commit"])


def test_cli_json_facet_and_collapse(spark, sf_dir, schema_file, tmp_path,
                                     capsys):
    out = str(tmp_path / "jfidx")
    cli.main([
        "index", "--input", f"{sf_dir}/documents.parquet", "--output", out,
        "--schema", schema_file, "--shards", "2", "--dedup", "none",
        "--generate-keys-from", "source",
    ])
    capsys.readouterr()

    # --json-facet: Solr's json.facet= request shape, one row per bucket
    spec = ('{"type": "terms", "field": "lang", "sort": "index asc", '
            '"limit": 100, "facet": {"mx": "max(n_chars)"}}')
    assert cli.main(["query", "--path", out, "--json-facet", spec]) == 0
    rows = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert sum(r["count"] for r in rows) == 500
    assert all(r["mx"] >= 1 for r in rows)

    # malformed JSON is a loud exit 2, not a stack trace
    assert cli.main(["query", "--path", out, "--json-facet", "{nope"]) == 2
    assert "not valid JSON" in capsys.readouterr().err

    # {!collapse} rides the existing --q surface
    assert cli.main(["query", "--path", out, "--count",
                     "--q", "{!collapse field=lang max=n_chars}"]) == 0
    n = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["count"]
    assert n == 5  # one head per lang


def test_cli_luke(spark, sf_dir, schema_file, tmp_path, capsys):
    out = str(tmp_path / "lkidx")
    cli.main([
        "index", "--input", f"{sf_dir}/documents.parquet", "--output", out,
        "--schema", schema_file, "--shards", "2", "--dedup", "none",
        "--generate-keys-from", "source",
    ])
    capsys.readouterr()
    assert cli.main(["query", "--path", out, "--luke"]) == 0
    rpt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rpt["num_docs"] == 500 and "lang" in rpt["fields"]
    assert "top_terms" not in rpt  # only with an explicit count
