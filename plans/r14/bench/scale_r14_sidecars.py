"""r14 scale evidence (VERDICT #6): at a >=1 GB synthetic corpus,
(a) the fused sidecar rebuild engages and saves one tokenized corpus pass
    per analyzed field vs the separate writers (job/pass count + wall),
(b) the adaptive bloom width engages (m > 2^16, power of two) and
    candidate_shards still prunes rare terms to few shards,
(c) fused and delegated artifacts stay byte-identical at this scale.

Corpus: 3.5M docs, ~300 chars each (~1.05 GB of text), vocabulary of
400k distinct terms so per-shard distinct terms (~hundreds of thousands)
sit far above the 2^16-bit floor's 4096-term design point, plus one rare
term in exactly 3 docs for the pruning check.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F

from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
from solr_map_reduce_spark.schema import Field, IndexSchema
from solr_map_reduce_spark.session import get_spark
import solr_map_reduce_spark.term_blooms as tb
import solr_map_reduce_spark.search_stats as ss

BASE = "/tmp/r14_scale"
CORPUS = f"{BASE}/corpus.parquet"
spark = get_spark(app_name="r14-scale", extra_conf={
    "spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

if not os.path.exists(CORPUS):
    n = 3_500_000
    # ~40 tokens/doc from a 400k-term vocabulary, deterministic
    df = spark.range(n).select(
        F.col("id").cast("string").alias("id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(400_000)).cast("string"),
                )
                for i in range(40)
            ],
        ).alias("text"),
    ).withColumn(
        "text",
        F.when(F.col("id").isin("17", "1700017", "3400017"),
               F.concat(F.col("text"), F.lit(" zanzibarunique")))
        .otherwise(F.col("text")),
    )
    df.repartition(32).write.mode("overwrite").parquet(CORPUS)
sz = sum(
    os.path.getsize(os.path.join(CORPUS, f))
    for f in os.listdir(CORPUS) if f.endswith(".parquet")
)
print(f"corpus bytes on disk: {sz/1e9:.2f} GB (parquet-compressed)", flush=True)

SCHEMA = IndexSchema(
    fields=(Field("id", "string", required=True), Field("text", "text_general")),
    unique_key="id",
)
docs = spark.read.parquet(CORPUS)

tracker = spark.sparkContext.statusTracker()

def build(path, fused: bool):
    """Full build with both sidecars; fused gate forced on/off via the
    dispatcher's env knob (the gate itself is scan-size-driven and this
    corpus is far above 128 MB either way — forcing OFF gives the
    separate-writers comparison arm)."""
    if os.path.exists(path):
        shutil.rmtree(path)
    ss._FUSED_MIN_BYTES = 0 if fused else (1 << 60)
    job = IndexJob(IndexJobConfig(
        schema=SCHEMA, shards=8, micro_shards=32, dedup="none",
        routing="native", term_blooms=True, search_stats=True,
    ))
    before_jobs = set(tracker.getJobIdsForGroup(None))
    t0 = time.perf_counter()
    job.build(docs, path)
    wall = time.perf_counter() - t0
    n_jobs = len(set(tracker.getJobIdsForGroup(None)) - before_jobs)
    return wall, n_jobs

res = {}
for tag, fused in (("separate", False), ("fused", True), ("separate2", False), ("fused2", True)):
    wall, n_jobs = build(f"{BASE}/idx_{tag}", fused)
    res[tag] = {"wall_sec": round(wall, 1), "spark_jobs": n_jobs}
    print(f"{tag:10s} wall {wall:7.1f}s  jobs {n_jobs}", flush=True)

# adaptive bloom width engaged?
blooms = json.loads(open(f"{BASE}/idx_fused/_TERM_BLOOMS.json").read())
info = blooms["text"]
m, k = info["m"], info["k"]
print(f"bloom m={m} (2^{m.bit_length()-1}), k={k}; floor was 2^16={1<<16}", flush=True)
assert m > (1 << 16) and (m & (m - 1)) == 0

# pruning still works at this width: the rare term lives in <= 3 shards
cand = tb.candidate_shards(spark, blooms, "text", ["zanzibarunique"], "all")
print("candidate shards for rare term:", cand, "of 8", flush=True)
# a common term should hit all shards (sanity that bitmaps are populated)
cand_common = tb.candidate_shards(spark, blooms, "text", ["w7"], "all")
print("candidate shards for common term:", cand_common, flush=True)

# byte-equality of the two paths' sidecars at this scale
import filecmp
same_blooms = open(f"{BASE}/idx_fused/_TERM_BLOOMS.json").read() == open(
    f"{BASE}/idx_separate/_TERM_BLOOMS.json").read()
same_stats = open(f"{BASE}/idx_fused/_SEARCH_STATS.json").read() == open(
    f"{BASE}/idx_separate/_SEARCH_STATS.json").read()
print("blooms byte-equal:", same_blooms, " stats byte-equal:", same_stats, flush=True)

json.dump(res, open(f"{BASE}/results.json", "w"), indent=1)
print("DONE", flush=True)
spark.stop()
