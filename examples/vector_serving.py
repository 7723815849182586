#!/usr/bin/env python
"""Vector-serving tour: the ANN sidecar lifecycle — build, routed
cosine/dot/filtered queries, per-query adaptive probing, delta
maintenance under upserts, and compaction.

Run:  python examples/vector_serving.py [sf_dir]
      (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pyspark.sql.functions as F

from solr_map_reduce_spark import Field, IndexJob, IndexJobConfig, IndexSchema, get_spark
from solr_map_reduce_spark.index_reader import SearchIndex


def vec_literal(v):
    return "[" + ", ".join(f"{float(x):.6f}" for x in v) + "]"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="smrs-vector-tour")
    spark.sparkContext.setLogLevel("ERROR")
    out = os.path.join(tempfile.mkdtemp(prefix="smrs_vec_"), "idx")

    schema = IndexSchema(
        fields=(Field("vec_id", "long", required=True),
                Field("embedding", "array<double>"),
                Field("label", "int")),
        unique_key="vec_id",
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>"), "label"
    )
    IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none")).build(emb, out)
    idx = SearchIndex.open(spark, out)
    q = emb.select("embedding").first()["embedding"]

    # 1. no sidecar yet: {!knn} serves the exact brute-force plan
    exact = [r["vec_id"] for r in idx.query(
        f"{{!knn f=embedding topK=5}}{vec_literal(q)}").collect()]
    print("exact top-5:", exact)

    # 2. build the IVF sidecar with a PER-QUERY adaptive serving default:
    #    each query probes the buckets within tau x its nearest-centroid
    #    distance (calibrated from a held-out sample at build)
    side = idx.build_ann("embedding", kind="ivf", n_centroids=8,
                         nprobe="adaptive", target_recall=0.9)
    import json
    meta = json.loads(open(os.path.join(side, "_ANN_META.json")).read())
    print("adaptive calibration:", meta["adaptive"])

    # 3. routed queries: cosine (adaptive), explicit nprobe, full probe
    routed = [r["vec_id"] for r in idx.query(
        f"{{!knn f=embedding topK=5}}{vec_literal(q)}").collect()]
    full = [r["vec_id"] for r in idx.query(
        f"{{!knn f=embedding topK=5 nprobe=8}}{vec_literal(q)}").collect()]
    print("routed (adaptive):", routed, "| full probe == exact:", full == exact)

    # 4. similarity=dot routes even on this NON-unit corpus: the sidecar
    #    stores per-bucket norm stats and ranks probes by the
    #    norm-augmented centroids (the MIPS->cosine reduction); probed
    #    candidates score true dot, so full probe is provably exact
    dot_full = [r["vec_id"] for r in idx.query(
        f"{{!knn f=embedding topK=5 similarity=dot nprobe=8}}"
        f"{vec_literal(q)}").collect()]
    print("routed MIPS dot top-5 (full probe, exact):", dot_full)

    # 5. preFilter routes too: the filter becomes a column-pruned key-set
    #    semi-join BEFORE the top-k; an underfilled page widens nprobe
    filt = [r["vec_id"] for r in idx.query(
        f"{{!knn f=embedding topK=5 nprobe=2 preFilter='label:[0 TO 4]'}}"
        f"{vec_literal(q)}").collect()]
    print("routed filtered top-5:", filt)

    # 6. delta maintenance: an upsert tombstones + epoch-appends; the
    #    query stays routed and serves the new doc immediately
    job = IndexJob(IndexJobConfig(schema=schema, shards=2,
                                  dedup="retain_most_recent"))
    batch = spark.createDataFrame(
        [(9999, [float(x) for x in q], 3)],
        "vec_id long, embedding array<double>, label int",
    )
    job.merge_into(batch, out)
    assert idx._ann_sidecar("embedding") is not None  # still routed
    after = [r["vec_id"] for r in idx.query(
        f"{{!knn f=embedding topK=3 nprobe=8}}{vec_literal(q)}").collect()]
    print("after upsert (9999 = exact duplicate of q):", after)

    # 7. compaction folds the delta back into the bucket dirs (only
    #    affected buckets rewrite) — the ANN analog of segment optimize
    stats = idx.compact_ann("embedding")
    print("compacted buckets:", stats["affected_buckets"])
    again = [r["vec_id"] for r in idx.query(
        f"{{!knn f=embedding topK=3 nprobe=8}}{vec_literal(q)}").collect()]
    print("post-compact page unchanged:", again == after)

    print("\nvector-serving tour complete")


if __name__ == "__main__":
    main()
