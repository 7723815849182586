"""Interleaved same-session shape A/B for the r14 minhash_dedup changes:

  A (r13 shape): persist full feature table (id, shingle_hashes,
     signature, band_hashes); LSH self-join on (band, band_hash).
  B (r14 shape): persist only (id, shingle_hashes, band_hashes) — the
     signature column is consumed inside the UDF and never read again;
     self-join on band_hash ALONE (the band index is already folded into
     the FNV offset, so the extra join column is redundant payload).

Alternating single reps (A,B,B,A,...) so both arms share each ambient
draw; per-pair delta = (B-A)/A, median reported.  Outputs verified
identical (sorted collect) before timing.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F

from solr_map_reduce_spark.extensions import text_dedup
from solr_map_reduce_spark.session import get_spark

SF = os.environ.get("SMRS_AB_SF", "/root/testdata/sf0.1")
PAIRS = int(os.environ.get("SMRS_AB_PAIRS", 9))


def docs_with_dupes(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    c = d.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    return d.unionByName(c)


def shape(spark, variant):
    df = text_dedup.ensure_parallelism(docs_with_dupes(spark))
    feats = text_dedup.minhash_features(df, "text", "doc_id", 128, 16, 3, 42)
    if variant == "B":
        feats = feats.select("doc_id", "shingle_hashes", "band_hashes")
    feats = feats.persist()
    try:
        if variant == "A":
            banded = feats.select(
                F.col("doc_id"),
                F.posexplode("band_hashes").alias("band", "band_hash"),
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
            .select(
                F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
            )
            .distinct()
        )
        out = text_dedup.verified_jaccard(cands, feats, "doc_id").filter(
            F.col("jaccard") >= 0.5
        )
        out = out.localCheckpoint(eager=True)
    finally:
        feats.unpersist(blocking=True)
    return out


def force(df):
    df.write.mode("overwrite").format("noop").save()


def release(spark):
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def main():
    spark = get_spark(app_name="ab-minhash", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    # equality check
    a = sorted(map(tuple, shape(spark, "A").collect()))
    b = sorted(map(tuple, shape(spark, "B").collect()))
    assert a == b, f"OUTPUT MISMATCH: {len(a)} vs {len(b)} rows"
    print(f"outputs identical: {len(a)} pairs", flush=True)
    # warmups
    for _ in range(2):
        force(shape(spark, "A"))
        force(shape(spark, "B"))
    res = {"A": [], "B": [], "load": []}
    for p in range(PAIRS):
        order = ["A", "B"] if p % 2 == 0 else ["B", "A"]
        for v in order:
            release(spark)
            t0 = time.perf_counter()
            force(shape(spark, v))
            res[v].append(time.perf_counter() - t0)
        res["load"].append(round(os.getloadavg()[0], 2))
    deltas = sorted((bb - aa) / aa for aa, bb in zip(res["A"], res["B"]))
    med = deltas[len(deltas) // 2]
    out = {
        "A": [round(x, 3) for x in res["A"]],
        "B": [round(x, 3) for x in res["B"]],
        "load": res["load"],
        "median_pair_delta_pct": round(100 * med, 1),
        "neg_pairs": sum(1 for d in deltas if d < 0),
        "pairs": PAIRS,
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
