#!/usr/bin/env python
"""LLM training-data curation, end to end — the pipeline a 100 TB pretraining
corpus runs, at toy scale:

  1. passage-level exact dedup (C4/CCNet line-dedup pass)
  2. corpus near-dup removal (MinHash+LSH, min-id-wins)
  3. quality + language + repetition filtering
  4. train/test decontamination (benchmark n-gram overlap)
  5. PII redaction + greedy sequence packing into fixed token budgets
  6. embedding side: near-dup pairs by cosine (sign-LSH) and an IVF+PQ
     ANN index built and probed (partition-pruned, 32x-compressed)

Every stage is a DataFrame op whose shuffle carries only ids/hashes/
signatures — documents and vectors cross the network once at most.

Run:  python examples/llm_data_pipeline.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pyspark.sql.functions as F

from solr_map_reduce_spark.extensions import text_analysis, text_dedup
from solr_map_reduce_spark.extensions.similarity import IvfPqIndex, cosine_pairs_lsh
from solr_map_reduce_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="llm-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n0 = docs.count()

    # 0. URL-keyed dedup (the cheapest pass runs FIRST — before any content
    #    work): canonicalize crawl URLs (case, tracking params, fragments)
    #    and keep one doc per canonical URL.  Toy URLs synthesized here; a
    #    real crawl carries them natively.
    with_urls = docs.withColumn(
        "url",
        F.concat(
            F.lit("HTTPS://Example.COM/"), F.col("source"), F.lit("/"),
            (F.col("doc_id") % 200).cast("string"),
            F.lit("?utm_source=crawl#top"),
        ),
    )
    keep = text_analysis.url_dedup(with_urls, "url", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    docs = docs.join(keep, "doc_id")
    n_url = docs.count()
    print(f"url dedup: {n0} -> {n_url} docs (one per canonical URL)")

    # 0b. C4 line-level cleaning: drop boilerplate lines (terminal
    #     punctuation / min-words / javascript-cookie rules), drop docs
    #     left empty.  The synthetic corpus is unpunctuated, so re-line and
    #     punctuate it first; a real crawl applies the rules directly.
    relined = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit("."))
    )
    cleaned = text_analysis.c4_line_filter(relined, "text", "doc_id")
    docs = docs.drop("text").join(
        cleaned.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
    )
    print(f"c4 clean: {n_url} -> {docs.count()} docs with surviving lines")

    # 1. passage dedup: drop repeated 10-word chunks corpus-wide, keep docs
    #    that still have content
    passages = text_dedup.dedup_passages(docs, "doc_id", "text", chunk_words=10)
    docs = (
        docs.join(passages.select("doc_id", "dedup_text", "n_kept"), "doc_id")
        .filter(F.col("n_kept") > 0)
        .drop("text")
        .withColumnRenamed("dedup_text", "text")
    )

    # 2. near-dup removal: MinHash+LSH pairs, larger id loses
    pairs = text_dedup.minhash_dedup(docs, "text", "doc_id", threshold=0.5)
    losers = pairs.select(F.greatest("id_a", "id_b").alias("doc_id")).distinct()
    docs = docs.join(losers, "doc_id", "left_anti")

    # 3. quality gates: composite score, language, intra-doc repetition
    quality = text_analysis.quality_features(docs, "text", "doc_id")
    lang = text_analysis.lang_id(docs, "text", "doc_id")
    rep = text_analysis.repetition_score(docs, "text", "doc_id", n=3)
    docs = (
        docs.join(quality.select("doc_id", "quality_score"), "doc_id")
        .join(lang.select("doc_id", "lang_pred"), "doc_id")
        .join(rep.select("doc_id", "dup_frac"), "doc_id")
        .filter(
            (F.col("quality_score") > 0.2)
            & (F.col("dup_frac") < 0.9)
            & (F.col("lang_pred") == "en")
        )
    )

    # 3a. model-based quality: distill the heuristic gate into a
    # logistic classifier over text features (the fasttext-style
    # quality-classifier recipe) — IG feature selection + batch GD
    # training (one map pass + one tiny groupBy per iteration), then a
    # MAP-ONLY classify over every doc; at 100 TB the classifier costs
    # one codegen Column per row
    import tempfile as _tf

    from solr_map_reduce_spark.extensions import text_ml
    from solr_map_reduce_spark.index_reader import SearchIndex
    from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
    from solr_map_reduce_spark.schema import Field, IndexSchema

    lbl = docs.withColumn(
        "label", (F.col("quality_score") > 0.3).cast("long")
    ).select("doc_id", "text", "label")
    qidx_path = _tf.mkdtemp(prefix="llm_quality_idx_") + "/idx"
    IndexJob(IndexJobConfig(
        schema=IndexSchema(
            fields=(Field("doc_id", "long", required=True),
                    Field("text", "text_general"),
                    Field("label", "long")),
            unique_key="doc_id"),
        shards=2, dedup="none",
    )).build(lbl, qidx_path)
    qidx = SearchIndex.open(spark, qidx_path)
    feats = text_ml.select_features(qidx, outcome="label", num_terms=30)
    model_rows = text_ml.train_logistic(
        qidx, feats, outcome="label", max_iterations=5, name="quality"
    ).orderBy("iteration").collect()
    final = model_rows[-1]
    print(f"quality classifier: error {final['error']:.4f}, "
          f"accuracy {final['accuracy']:.3f} after {len(model_rows)} iters")
    scored = text_ml.classify_df(
        qidx.df(), qidx._real_toks(qidx._tokens_col()),
        {"name": "quality", "terms": list(final["terms"]),
         "weights": list(final["weights"]), "idfs": list(final["idfs"])},
    ).select("doc_id", "probability")
    docs = docs.join(scored, "doc_id").filter(F.col("probability") > 0.5) \
        .drop("probability")

    # 3b. per-source cap: keep at most 15 best docs per source (the
    # per-domain cap of web curation — deterministic, unlike sampling)
    docs = text_analysis.cap_per_group(
        docs, "source", "quality_score", 15, tiebreak_col="doc_id"
    )

    # 4. decontamination against a held-out "benchmark" (here: a slice)
    bench = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") % 97 == 0
    )
    contam = text_dedup.decontaminate(docs, bench, "text", "doc_id", n=13)
    docs = docs.join(
        contam.filter("contaminated").select("doc_id"), "doc_id", "left_anti"
    )

    # 5. redact PII, pack into 512-char training sequences per source
    docs = docs.withColumn("text", text_analysis.redact_pii(F.col("text")))
    packed = text_analysis.pack_sequences(
        docs.withColumn("n_chars", F.length("text")),
        weight_col="n_chars",
        budget=512,
        group_cols=("source",),
    )

    out = tempfile.mkdtemp(prefix="llm_corpus_")
    packed.write.mode("overwrite").parquet(os.path.join(out, "packed"))
    n_seq = (
        spark.read.parquet(os.path.join(out, "packed"))
        .select("source", "chunk")
        .distinct()
        .count()
    )
    print(f"docs {n0} -> {docs.count()} curated -> {n_seq} packed sequences")

    # 5b. Gopher quality rules: the published heuristic battery (word
    # count, mean word length, symbol/bullet/ellipsis ratios, alpha
    # fraction, stop probe) as one map-only pass — inspect the per-rule
    # measurements, gate on `passes` for real crawls
    gq = text_analysis.gopher_rules(docs)
    print("gopher rules:", gq.filter("passes").count(), "of", gq.count(),
          "docs pass the published thresholds")

    # 5c. long-document chunking: overlapping token windows (stride =
    # chunk - overlap) upstream of packing, so no span is lost at a
    # window boundary
    chunks = text_analysis.chunk_documents(docs, chunk_tokens=64, overlap=16)
    print("chunking:", docs.count(), "docs ->", chunks.count(),
          "64-token windows (16-token overlap)")

    # 6. embeddings: near-dup pairs without a cross join + IVF+PQ index
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    near = cosine_pairs_lsh(emb, threshold=0.99).count()
    idx = IvfPqIndex.fit(emb, n_centroids=8, m=8, ksub=16)
    idx_path = os.path.join(out, "ivfpq")
    idx.build(emb, idx_path)
    q = emb.orderBy("vec_id").first()["embedding"]
    top = IvfPqIndex.load(spark, idx_path).search_stored(
        spark, idx_path, q, k=5, nprobe=3
    )
    print(f"embedding near-dup pairs: {near}; ANN top-5 for vec 0:")
    top.show()

    # 7. kNN label propagation: extend the labeled slice's tags over the
    # unlabeled vectors (embedding-space quality/domain classifier)
    from solr_map_reduce_spark.extensions.similarity import knn_classify

    pred = knn_classify(
        emb.filter(F.col("label") == 0), emb.filter(F.col("label") != 0), k=5
    )
    print("label propagation over unlabeled vectors:")
    pred.groupBy("predicted_label").count().orderBy("predicted_label").show()
    spark.stop()


if __name__ == "__main__":
    main()
