import json, os, sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from solr_map_reduce_spark.extensions import text_dedup
from solr_map_reduce_spark.session import get_spark

SF = "/root/testdata/sf0.1"
def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    c = d.filter(F.col("doc_id") % 7 == 0).withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    return d.unionByName(c)

def shape(spark, variant):
    df = text_dedup.ensure_parallelism(docs(spark))
    feats = text_dedup.minhash_features(df, "text", "doc_id", 128, 16, 3, 42)
    if variant in ("P", "PJ"):
        feats = feats.select("doc_id", "shingle_hashes", "band_hashes")
    feats = feats.persist()
    try:
        if variant in ("J", "PJ"):
            banded = feats.select(F.col("doc_id"), F.explode("band_hashes").alias("band_hash"))
            on = [F.col("l.band_hash") == F.col("r.band_hash"), F.col("l.doc_id") < F.col("r.doc_id")]
        else:
            banded = feats.select(F.col("doc_id"), F.posexplode("band_hashes").alias("band", "band_hash"))
            on = [F.col("l.band") == F.col("r.band"), F.col("l.band_hash") == F.col("r.band_hash"), F.col("l.doc_id") < F.col("r.doc_id")]
        cands = (banded.alias("l").join(banded.alias("r"), on=on)
                 .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")).distinct())
        out = text_dedup.verified_jaccard(cands, feats, "doc_id").filter(F.col("jaccard") >= 0.5)
        out = out.localCheckpoint(eager=True)
    finally:
        feats.unpersist(blocking=True)
    return out

def force(df): df.write.mode("overwrite").format("noop").save()
def release(spark):
    import gc; gc.collect()
    try: spark.sparkContext._jvm.System.gc()
    except Exception: pass

spark = get_spark(app_name="ab3", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
ARMS = ["A", "P", "J", "PJ"]
for _ in range(2):
    for a in ARMS: force(shape(spark, a))
res = {a: [] for a in ARMS}
N = 10
import itertools
for i in range(N):
    order = ARMS if i % 2 == 0 else ARMS[::-1]
    for a in order:
        release(spark)
        t0 = time.perf_counter(); force(shape(spark, a)); res[a].append(time.perf_counter() - t0)
meds = {a: sorted(v)[len(v)//2] for a, v in res.items()}
print(json.dumps({"reps": {a: [round(x,3) for x in v] for a,v in res.items()},
                  "medians": {a: round(m,3) for a,m in meds.items()},
                  "vsA_pct": {a: round(100*(meds[a]-meds["A"])/meds["A"],1) for a in ARMS}}))
spark.stop()
