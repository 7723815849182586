#!/usr/bin/env python
"""Operations tour: the artifact LIFECYCLE a production deployment runs —
versioned build, consistent backup, incremental merge, checkpointed
Topic consumption, and point-in-time restore.

Run:  python examples/ops_tour.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pyspark.sql.functions as F

from solr_map_reduce_spark import Field, IndexJob, IndexJobConfig, IndexSchema, get_spark
from solr_map_reduce_spark.index_reader import SearchIndex, Topic
from solr_map_reduce_spark.indexing import backup, read_index, restore


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="smrs-ops-tour")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="smrs_ops_")
    live = os.path.join(work, "live")

    schema = IndexSchema(
        fields=(Field("doc_id", "long", required=True),
                Field("text", "text_general"),
                Field("lang", "string")),
        unique_key="doc_id",
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )

    # 1. versioned build: every doc stamped _version_ = 1
    job = IndexJob(IndexJobConfig(schema=schema, shards=2, dedup="none",
                                  doc_versions=True, term_blooms=True))
    job.build(docs.filter(F.col("doc_id") % 2 == 0), live)
    print("built:", read_index(spark, live).count(), "docs (gen 1)")

    # 2. consistent snapshot before mutating
    meta = backup(live, os.path.join(work, "bak"))
    print("backup:", meta)

    # 3. a consumer subscribes, processes everything, commits
    topic = Topic(spark, live, os.path.join(work, "ckpt.json"))
    batch, wm = topic.pull()
    print("topic pull #1:", batch.count(), "docs; commit watermark", wm)
    topic.commit(wm)

    # 4. incremental merge: replaced evens bump, odd multiples of 5 are new
    job.merge_into(docs.filter(F.col("doc_id") % 5 == 0), live)
    batch2, wm2 = topic.pull()
    print("topic pull #2 after merge:", batch2.count(),
          "docs (exactly the merged batch); versions:",
          batch2.select("_version_").distinct().collect())
    topic.commit(wm2)

    # 5. the live artifact still serves queries mid-lifecycle
    idx = SearchIndex.open(spark, live)
    print("live count:", idx.count(), "| spark-term hits:",
          idx.query("spark").count())

    # 6. roll back to the snapshot: restore never consumes the backup
    rmeta = restore(os.path.join(work, "bak"), live)
    print("restored to generation", rmeta["generation"], "->",
          read_index(spark, live).count(), "docs")
    print("backup still intact:",
          SearchIndex.open(spark, os.path.join(work, "bak")).count(), "docs")

    print("\nops tour complete")


if __name__ == "__main__":
    main()
