"""Same-session minhash shape A/B at a corpus size where the banded
shuffle and the feature persist are real costs (300k docs x 40 tokens
from the r14 scale corpus), alternating single reps."""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from solr_map_reduce_spark.extensions import text_dedup
from solr_map_reduce_spark.session import get_spark

CORPUS = "/tmp/r14_scale/corpus.parquet"
PAIRS = int(os.environ.get("SMRS_AB_PAIRS", 7))

def docs(spark):
    return (spark.read.parquet(CORPUS)
            .filter(F.col("id").cast("long") < 300_000)
            .select(F.col("id").cast("long").alias("doc_id"), "text"))

def shape(spark, variant):
    df = text_dedup.ensure_parallelism(docs(spark))
    feats = text_dedup.minhash_features(df, "text", "doc_id", 128, 16, 3, 42)
    if variant == "B":
        feats = feats.select("doc_id", "shingle_hashes", "band_hashes")
    feats = feats.persist()
    try:
        if variant == "A":
            banded = feats.select(F.col("doc_id"), F.posexplode("band_hashes").alias("band", "band_hash"))
            on = [F.col("l.band") == F.col("r.band"), F.col("l.band_hash") == F.col("r.band_hash"), F.col("l.doc_id") < F.col("r.doc_id")]
        else:
            banded = feats.select(F.col("doc_id"), F.explode("band_hashes").alias("band_hash"))
            on = [F.col("l.band_hash") == F.col("r.band_hash"), F.col("l.doc_id") < F.col("r.doc_id")]
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

spark = get_spark(app_name="ab-minhash-big", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
na = shape(spark, "A").count(); nb = shape(spark, "B").count()
assert na == nb, (na, nb)
print(f"outputs same cardinality: {na} pairs", flush=True)
for _ in range(1):
    force(shape(spark, "A")); force(shape(spark, "B"))
res = {"A": [], "B": [], "load": []}
for p in range(PAIRS):
    order = ["A", "B"] if p % 2 == 0 else ["B", "A"]
    for v in order:
        release(spark)
        t0 = time.perf_counter(); force(shape(spark, v)); res[v].append(time.perf_counter() - t0)
    res["load"].append(round(os.getloadavg()[0], 2))
    print(f"pair {p}: A {res['A'][-1]:.2f} B {res['B'][-1]:.2f}", flush=True)
deltas = sorted((b - a) / a for a, b in zip(res["A"], res["B"]))
med = deltas[len(deltas) // 2]
print(json.dumps({"A": [round(x,3) for x in res["A"]], "B": [round(x,3) for x in res["B"]],
                  "load": res["load"], "median_pair_delta_pct": round(100*med,1),
                  "neg_pairs": sum(1 for d in deltas if d < 0), "pairs": PAIRS}), flush=True)
spark.stop()
