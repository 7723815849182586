#!/usr/bin/env python
"""Tour of the Solr streaming-expression DSL (extensions/stream_expr.py):
one expression string per section, each compiling to the DataFrame plan
it already is — search over a built artifact (q= pushdown), rollup,
hashJoin (broadcast), having, set ops, timeseries, fetch enrichment.

Run:  python examples/stream_expressions.py [sf_dir]
      (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pyspark.sql.functions as F

from solr_map_reduce_spark import (
    Field,
    IndexJob,
    IndexJobConfig,
    IndexSchema,
    SearchIndex,
    get_spark,
)
from solr_map_reduce_spark.extensions.stream_expr import StreamCompiler


def show(title: str, df, n: int = 5) -> None:
    print(f"\n== {title}")
    for r in df.limit(n).collect():
        print("  ", r.asDict())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="smrs-stream-tour")
    spark.sparkContext.setLogLevel("ERROR")

    # a docs ARTIFACT so search(q=...) rides the compiled, Bloom-prunable
    # scan; the star-schema tables bind as plain parquet collections
    schema = IndexSchema(
        fields=(Field("doc_id", "long", required=True),
                Field("text", "text_general"),
                Field("lang", "string"),
                Field("n_chars", "long")),
        unique_key="doc_id",
    )
    work = tempfile.mkdtemp(prefix="smrs_stream_tour_")
    IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none")).build(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text", "lang", "n_chars"
        ),
        f"{work}/docs",
    )
    comp = StreamCompiler({
        "docs": SearchIndex.open(spark, f"{work}/docs"),
        "orders": spark.read.parquet(f"{sf_dir}/orders.parquet"),
        "customer": spark.read.parquet(f"{sf_dir}/customer.parquet"),
        "events": spark.read.parquet(f"{sf_dir}/events.parquet"),
    })

    show("rollup over a query's result (q= hits the artifact scan)", comp.run(
        'rollup(search(docs, q="spark"), over=lang, count(*), avg(n_chars))'
    ))

    show("hashJoin: the hashed side is a broadcast", comp.run(
        'top(hashJoin(search(orders, fl="o_orderkey,o_custkey,o_totalprice"), '
        'hashed=search(customer, fl="c_custkey,c_name"), '
        'on="o_custkey=c_custkey"), n=3, sort="o_totalprice desc")'
    ), n=3)

    show("having over a facet", comp.run(
        'having(facet(docs, q="*:*", buckets="lang", count(*)), '
        "gt(count(*), 50))"
    ))

    show("complement: customers with no 400k+ order (having filters the "
         "inner stream)", comp.run(
        'complement(search(customer, fl="c_custkey,c_name"), '
        'having(search(orders, fl="o_custkey,o_totalprice"), '
        'gt(o_totalprice, 400000)), on="c_custkey=o_custkey")'
    ), n=3)

    show("timeseries: daily event buckets", comp.run(
        'timeseries(events, field=ts, gap="+1DAY", count(*), avg(value))'
    ))

    show("unique: first doc per lang in n_chars desc order", comp.run(
        'unique(search(docs, fl="doc_id,lang,n_chars", '
        'sort="n_chars desc"), over=lang)'
    ))

    show("fetch: enrich order tuples with customer fields", comp.run(
        'fetch(customer, top(search(orders, fl="o_orderkey,o_custkey"), '
        'n=3, sort="o_orderkey asc"), fl="c_name", on="o_custkey=c_custkey")'
    ), n=3)

    show("select evaluators: computed tuple fields", comp.run(
        'top(select(search(orders, fl="o_orderkey,o_totalprice"), '
        "o_orderkey, if(gt(o_totalprice, 300000), div(o_totalprice, 1000), "
        '0) as bucket_k), n=3, sort="bucket_k desc, o_orderkey asc")'
    ), n=3)

    show("significantTerms: German-doc terms vs the collection", comp.run(
        'significantTerms(docs, q="lang:de", limit=5, minDocFreq=3)'
    ))

    show("nodes: customers of nation 1 -> their orders (one graph hop)",
         comp.run(
             'nodes(orders, having(search(customer, '
             'fl="c_custkey,c_nationkey"), eq(c_nationkey, 1)), '
             'walk="c_custkey->o_custkey", gather="o_orderkey", count(*))'
         ), n=3)

    # shortestPath over a customer->nation->supplier bipartite edge set
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("from_id"),
        F.concat(F.lit("n"), F.col("c_nationkey")).alias("to_id"),
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.concat(F.lit("n"), F.col("s_nationkey")).alias("from_id"),
        F.concat(F.lit("s"), F.col("s_suppkey")).alias("to_id"),
    )
    gcomp = StreamCompiler({"graph": c.unionByName(sup)})
    show("shortestPath: customer c1 to a same-nation supplier", gcomp.run(
        'shortestPath(graph, from="c1", to="s1", edge="from_id=to_id", '
        "maxDepth=4)"
    ).select(F.array_join("path", "->").alias("path")), n=3)

    # round-9 tail: the ML tier — IG features -> logistic regression ->
    # map-only classification, all from expression strings
    show("features: top IG terms for predicting lang=en", comp.run(
        "features(docs, field=text, outcome=lang, positiveLabel=en, "
        "numTerms=5)"
    ), n=5)
    show("train: 3 GD iterations over those features", comp.run(
        "train(docs, features(docs, field=text, outcome=lang, "
        "positiveLabel=en, numTerms=5), field=text, outcome=lang, "
        'positiveLabel=en, maxIterations=3, name="quality")'
    ).select("name", "iteration", "error", "accuracy"), n=3)

    # math expressions: driver-side numeric tier over bounded pulls
    show("let/col: descriptive stats of n_chars", comp.run(
        'let(a=search(docs, fl="n_chars"), b=col(a, n_chars), '
        "tuple(n=length(b), mean=mean(b), p95=percentile(b, 95)))"
    ))

    print("\nstream-expression tour complete")


if __name__ == "__main__":
    main()
