"""Capture the INNER plan of ext_minhash_dedup (the pipeline up to, but
not including, the localCheckpoint that minhash_dedup returns — the
checkpoint makes the registry-level explain a one-line scan stub).

"before" replicates the r13 library shape verbatim (full feature persist,
posexplode, two-key band join); "after" builds the same pre-checkpoint
DataFrame the r14 library code builds (projected persist, explode,
single-key join).  Equality of outputs is pinned by
plans/r14/bench/ab_minhash_shapes.py and the DuckDB oracle test.
"""
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, repo)

import pyspark.sql.functions as F

from solr_map_reduce_spark.extensions import text_dedup
from solr_map_reduce_spark.session import get_spark

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="plancap-minhash")
spark.sparkContext.setLogLevel("ERROR")

d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
c = d.filter(F.col("doc_id") % 7 == 0).withColumn(
    "doc_id", F.col("doc_id") + F.lit(1_000_000)
)
df = text_dedup.ensure_parallelism(d.unionByName(c))
feats = text_dedup.minhash_features(df, "text", "doc_id", 128, 16, 3, 42)
if TAG == "after":
    feats = feats.select("doc_id", "shingle_hashes", "band_hashes")
feats = feats.persist()
if TAG == "before":
    banded = feats.select(
        F.col("doc_id"), F.posexplode("band_hashes").alias("band", "band_hash")
    )
    on = [
        F.col("l.band") == F.col("r.band"),
        F.col("l.band_hash") == F.col("r.band_hash"),
        F.col("l.doc_id") < F.col("r.doc_id"),
    ]
else:
    banded = feats.select(
        F.col("doc_id"), F.explode("band_hashes").alias("band_hash")
    )
    on = [
        F.col("l.band_hash") == F.col("r.band_hash"),
        F.col("l.doc_id") < F.col("r.doc_id"),
    ]
cands = (
    banded.alias("l")
    .join(banded.alias("r"), on=on)
    .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
    .distinct()
)
out = text_dedup.verified_jaccard(cands, feats, "doc_id").filter(
    F.col("jaccard") >= 0.5
)
plan = out._sc._jvm.PythonSQLUtils.explainString(
    out._jdf.queryExecution(), "formatted"
)
dest = os.path.join(repo, "plans", "r14", f"ext_minhash_dedup_inner_{TAG}.txt")
with open(dest, "w") as f:
    f.write(plan)
print("wrote", dest)
spark.stop()
